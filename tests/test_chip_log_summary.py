"""scripts/summarize_chip_logs.py: queue-log parsing -> judge-readable table.

The chip queue runs unattended (fired by the relay probe loop, possibly with
no builder session alive); its preserve() step calls the summarizer before
committing logs, so a parsing bug would silently strip results from the
committed artifact. Pin the parser against the exact formats the queue and
bench scripts emit.
"""
import json
import os
import sys

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"))

from summarize_chip_logs import (main, parse_metric_lines, parse_queue_log,
                                 summarize, to_markdown)

QUEUE_LOG = """\
=== bench_expe5 start 14:02:11
=== bench_expe5 exit=0 14:19:40
=== bench_imagenet_f16 start 14:19:45
=== bench_imagenet_f16 exit=124 14:59:45
=== relay lost — re-arming probe loop 15:00:02
=== bench_expe5 skip (done) 16:10:00
=== bench_ffhq_table1 start 16:10:05
"""

BENCH_LOG = """\
# backend probe ok
WARNING:jax stuff
{"metric": "imgs/sec/chip VQGAN(expe_5) train step @256px", "value": 60.54, \
"unit": "imgs/sec/chip", "step_ms": 264.3, "mfu_pct": 63.9, \
"vs_baseline": 2.422, "loader_fed": {"value": 59.06}}
not json { at all
{"no_metric_key": 1}
"""


def _mkdir(tmp_path):
    d = tmp_path / "r4_chip"
    d.mkdir()
    (d / "queue.log").write_text(QUEUE_LOG)
    (d / "bench_expe5.log").write_text(BENCH_LOG)
    (d / "bench_imagenet_f16.log").write_text("hung; killed by timeout\n")
    # ffhq row started but was cut off mid-run: no log yet
    return d


def test_parse_queue_log_statuses(tmp_path):
    d = _mkdir(tmp_path)
    rows = parse_queue_log(str(d / "queue.log"))
    assert rows["bench_expe5"]["exit"] == 0
    assert rows["bench_expe5"]["status"] == "skipped (already done)"
    assert rows["bench_imagenet_f16"]["exit"] == 124
    assert "exit" not in rows["bench_ffhq_table1"]  # cut off mid-run
    assert rows["bench_ffhq_table1"]["start"] == "16:10:05"


def test_metric_lines_skip_garbage(tmp_path):
    d = _mkdir(tmp_path)
    res = parse_metric_lines(str(d / "bench_expe5.log"))
    assert len(res) == 1
    assert res[0]["value"] == 60.54 and res[0]["mfu_pct"] == 63.9


def test_markdown_and_json_outputs(tmp_path):
    d = _mkdir(tmp_path)
    rows = summarize(str(d))
    md = to_markdown(rows)
    assert "| bench_expe5 |" in md
    assert "60.54" in md and "mfu_pct=63.9" in md
    assert "RUNNING/CUT" in md  # the cut-off ffhq row is visible, not dropped
    assert main([str(d), "--write"]) == 0
    written = json.loads((d / "summary.json").read_text())
    assert written["rows"][0]["results"][0]["value"] == 60.54
    assert (d / "SUMMARY.md").read_text().startswith("# Chip-queue results")


def test_empty_dir_is_graceful(tmp_path):
    d = tmp_path / "empty"
    d.mkdir()
    assert summarize(str(d)) == []
    assert main([str(d)]) == 0


def test_cat_rows_format_samples_per_sec(tmp_path):
    """CAT bench lines have samples_per_sec instead of value — the cell must
    show them, not 'None' (r5 SUMMARY.md regression)."""
    import importlib
    scl = importlib.import_module("summarize_chip_logs")
    cell = scl._fmt_result({
        "metric": "CAT gpt2_medium train step", "samples_per_sec": 78.57,
        "pipelined_samples_per_sec": 94.43, "step_ms": 203.6,
        "mfu_pct": 44.3, "tflops": 87.4})
    assert "78.57 samples/s" in cell
    assert "94.43 pipelined" in cell
    assert "None" not in cell


def test_adhoc_logs_outside_queue_are_listed(tmp_path):
    """Measurement logs dropped in the dir WITHOUT a queue.log entry (the r5
    remat grid / grad-accum / post-rewrite re-benches were run builder-driven,
    not as queue rows) must still appear in SUMMARY.md — but only if they
    carry a metric line (scratch logs stay invisible)."""
    d = _mkdir(tmp_path)
    (d / "bench_expe5_postpool.log").write_text(BENCH_LOG)
    (d / "scratch_no_metrics.log").write_text("compile warnings only\n")
    rows = summarize(str(d))
    by_name = {r["name"]: r for r in rows}
    assert by_name["bench_expe5_postpool"]["status"] == \
        "ad-hoc (not a queue row)"
    assert by_name["bench_expe5_postpool"]["results"][0]["value"] == 60.54
    assert "scratch_no_metrics" not in by_name
    md = to_markdown(rows)
    assert "| bench_expe5_postpool | ad-hoc (not a queue row) |" in md
