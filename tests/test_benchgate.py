"""Sanity gates that make r4's impossible bench numbers unrepeatable.

r4 shipped 3268.6% MFU in BENCH_r04.json and 1440.1% MFU in the chip-queue
SUMMARY because jax.block_until_ready stopped blocking through the axon
relay — the bench timed dispatch, not execution. These tests pin the two
defense layers: bench-side quarantine (apply_sanity_gate, used by bench.py
and scripts/bench_cat_train.py before printing) and post-hoc flagging
(flag_impossible, used by scripts/summarize_chip_logs.py).
"""
import json
import os
import sys

from favae_tpu.utils.benchgate import (apply_sanity_gate, flag_impossible,
                                       roofline_min_step_ms)

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"))

EXPE5_GFLOP = 2081.0
BATCH = 16


def _valid_line():
    # the judge's fixed r4 re-run: 60.16 imgs/s, step 266 ms, 63.5% MFU
    return {"metric": "imgs/sec/chip VQGAN(expe_5) train step @256px",
            "value": 60.16, "step_ms": 266.0, "mfu_pct": 63.5,
            "tflops": 125.2, "vs_baseline": 2.406,
            "loader_fed": {"value": 59.0, "step_ms": 271.2}}


def _r4_garbage_line():
    # BENCH_r04.json verbatim numbers
    return {"metric": "imgs/sec/chip VQGAN(expe_5) train step @256px",
            "value": 3094.24, "step_ms": 5.2, "mfu_pct": 3268.6,
            "tflops": 6439.1, "vs_baseline": 123.77}


def test_roofline_floor_is_plausible():
    # 2081 GFLOP/image * 16 images at 197 TFLOP/s = 169 ms; the real step
    # measures ~266 ms (63.5% MFU), safely above the floor
    floor = roofline_min_step_ms(EXPE5_GFLOP, BATCH)
    assert 160 < floor < 180
    assert 266.0 > floor


def test_valid_result_passes_unchanged():
    r = _valid_line()
    assert apply_sanity_gate(dict(r), EXPE5_GFLOP, BATCH) == r


def test_r4_garbage_is_quarantined():
    gated = apply_sanity_gate(_r4_garbage_line(), EXPE5_GFLOP, BATCH)
    assert gated["value"] is None and gated["vs_baseline"] is None
    assert "timing invalid" in gated["error"]
    # raw numbers preserved for forensics, not citable as results
    assert gated["suspect"]["value"] == 3094.24
    assert gated["suspect"]["mfu_pct"] == 3268.6
    assert "mfu_pct" not in gated and "tflops" not in gated
    # the gated line still round-trips as the one-JSON-line contract
    assert json.loads(json.dumps(gated))["value"] is None


def test_corrupted_loader_fed_row_alone_trips_the_gate():
    # r4's loader_fed row read 213.7 imgs/s (device time ~0) while some
    # future synthetic number could be sane — the sub-row must still gate
    r = _valid_line()
    r["loader_fed"] = {"value": 213.7, "step_ms": 74.9}
    gated = apply_sanity_gate(r, EXPE5_GFLOP, BATCH)
    assert gated["value"] is None
    assert gated["suspect"]["loader_fed"]["value"] == 213.7


def test_pipelined_step_ms_is_checked_too():
    # CAT bench reports a second, faster timing; it must not slip through
    r = {"metric": "CAT", "step_ms": 500.0, "mfu_pct": 40.0,
         "pipelined_step_ms": 1.0}
    gated = apply_sanity_gate(r, 300.0, 16)
    assert gated["value"] is None and "suspect" in gated


def test_unknown_flops_passes_through():
    r = {"metric": "x", "value": 1.0, "step_ms": 0.001}
    assert apply_sanity_gate(dict(r), None, BATCH) == r


def test_flag_impossible():
    assert flag_impossible(_valid_line()) is None
    assert "mfu_pct" in flag_impossible(_r4_garbage_line())
    assert "tflops" in flag_impossible({"tflops": 300.0})
    assert flag_impossible({"value": None, "error": "relay down"}) is None
    assert flag_impossible("not a dict") is None


def test_summarizer_marks_impossible_lines(tmp_path):
    from summarize_chip_logs import parse_metric_lines, to_markdown
    log = tmp_path / "bench_expe5.log"
    log.write_text(json.dumps(_r4_garbage_line()) + "\n"
                   + json.dumps(_valid_line()) + "\n")
    res = parse_metric_lines(str(log))
    assert len(res) == 2
    assert "mfu_pct=3268.6" in res[0]["timing_invalid"]
    assert "timing_invalid" not in res[1]
    md = to_markdown([{"name": "bench_expe5", "exit": 0, "results": res}])
    assert "TIMING-INVALID" in md and "do not cite" in md
    # the valid line still renders normally
    assert "60.16" in md
