"""Hard sanity gates for self-reported benchmark numbers.

Round-4 postmortem: `jax.block_until_ready` stopped blocking through the
experimental axon relay, so the bench timed dispatch instead of execution
and published a physically impossible 3268.6% MFU (BENCH_r04.json) — and
nothing in the pipeline caught it. These gates make that unrepeatable:

* a measurement implying >100% MFU (equivalently, a step faster than the
  chip's bf16 roofline permits) is quarantined under a "suspect" field and
  the JSON line carries an "error" instead of a value;
* `flag_impossible` lets post-hoc log consumers (scripts/
  summarize_chip_logs.py) mark already-captured metric lines the same way.

The truthful sync itself is NOT here — it is a host fetch of the scalar
loss after the timed loop (`float(m["loss_g"])`): the bytes must cross the
relay, and the donated-state chain makes that scalar depend on every timed
step, so unlike block_until_ready a value fetch cannot report early.

The reference's only perf telemetry is `torch.cuda.max_memory_reserved()`
(reference: favae_scripts/train_favae.py:122); we replace it wholesale, so
ours must be trustworthy.
"""

V5E_BF16_PEAK_TFLOPS = 197.0


def roofline_min_step_ms(gflop_per_item, batch):
    """Fastest physically possible step on one v5e chip (100% bf16 MFU).

    gflop_per_item [GFLOP] * batch / 197 [TFLOP/s] happens to read out in
    milliseconds (G/T = 1e-3).
    """
    return gflop_per_item * batch / V5E_BF16_PEAK_TFLOPS


def apply_sanity_gate(result, gflop_per_item, batch,
                      loader_fed_key="loader_fed"):
    """Gate a bench result dict before it is printed.

    If the headline `step_ms`/`mfu_pct` (or the loader-fed sub-row's
    step_ms) beats the roofline, the perf fields move into `suspect`,
    `value`/`vs_baseline` become None and an `error` field explains why.
    Returns the (possibly gated) dict; no mutation of the input.
    """
    if gflop_per_item is None:
        return result
    floor_ms = roofline_min_step_ms(gflop_per_item, batch)
    bad = (result.get("mfu_pct", 0) > 100.0
           or result.get("step_ms", floor_ms) < floor_ms
           or result.get("pipelined_step_ms", floor_ms) < floor_ms)
    lf = result.get(loader_fed_key)
    lf_bad = bool(lf) and lf.get("step_ms", floor_ms) < floor_ms
    if not (bad or lf_bad):
        return result
    suspect_keys = ("value", "step_ms", "vs_baseline", "tflops", "mfu_pct",
                    "samples_per_sec", "tokens_per_sec", "pipelined_step_ms",
                    "pipelined_samples_per_sec", loader_fed_key)
    suspect = {k: result[k] for k in suspect_keys if k in result}
    gated = {k: v for k, v in result.items() if k not in suspect_keys}
    gated.update(
        value=None, vs_baseline=None,
        error=("timing invalid (non-blocking backend sync?): measured "
               f"step_ms={result.get('step_ms')} vs roofline minimum "
               f"{round(floor_ms, 1)} ms at 100% MFU"),
        suspect=suspect)
    return gated


def flag_impossible(metric):
    """Post-hoc check of an already-captured metric line.

    Returns a short reason string if the line is physically impossible on
    one v5e chip, else None. Used by scripts/summarize_chip_logs.py so a
    log captured by an unguarded bench can never be reformatted into a
    deadpan SUMMARY.md row again (that happened in r4: 1440.1% MFU).
    """
    if not isinstance(metric, dict):
        return None
    mfu = metric.get("mfu_pct")
    if isinstance(mfu, (int, float)) and mfu > 100.0:
        return f"mfu_pct={mfu} > 100"
    tflops = metric.get("tflops")
    if isinstance(tflops, (int, float)) and tflops > V5E_BF16_PEAK_TFLOPS:
        return f"tflops={tflops} > v5e bf16 peak {V5E_BF16_PEAK_TFLOPS}"
    return None
