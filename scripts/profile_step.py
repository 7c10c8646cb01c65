"""Capture a device trace of the FA-VAE (or CAT) train step and print the
top op-level time slabs.

Runs a few donated-state steps under jax.profiler.start_trace and parses the
chrome-trace dump (plugins/profile/ subdirs, trace.json.gz) on the "XLA Ops"
device lane, aggregating by op name and by subsystem (convolutions, MXU-DFT,
optimizer, loop fusions, layout copies). This is the evidence source for
"where do the remaining non-MFU milliseconds go" claims (r3's roofline
decomposition used the same mechanism; the reference has no profiler at all —
its only telemetry is the memory print at favae_scripts/train_favae.py:122).

    python scripts/profile_step.py [favae|cat] [outdir]
"""
import glob
import gzip
import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from favae_tpu.utils.xla_cache import enable_persistent_cache
enable_persistent_cache()


def _run_favae(n_steps):
    from favae_tpu.config import (TrainConfig, celebahq_expe5,
                                  celebahq_expe5_losses)
    from favae_tpu.models.lpips import LPIPS
    from favae_tpu.train.favae_state import FavaeTrainState
    from favae_tpu.train.favae_step import make_train_step

    model_cfg, loss_cfg = celebahq_expe5(), celebahq_expe5_losses()
    train_cfg = TrainConfig(batch_size=16)
    state, model, tx_g, tx_d = FavaeTrainState.create(
        model_cfg, loss_cfg, train_cfg, jax.random.PRNGKey(0),
        lr=train_cfg.base_lr * train_cfg.batch_size)
    step = jax.jit(make_train_step(model, LPIPS(), tx_g, tx_d, model_cfg,
                                   loss_cfg, train_cfg, disc_on=True,
                                   ffl_on=True), donate_argnums=0)
    x = jnp.asarray(np.random.RandomState(0).rand(16, 256, 256, 3)
                    .astype(np.float32) * 2 - 1)

    def run(k):
        nonlocal state
        m = None
        for i in range(k):
            state, m = step(state, x, jax.random.PRNGKey(i))
        return float(m["loss_g"])  # host fetch = the only honest sync here

    return run


def _run_cat(n_steps):
    import dataclasses
    from favae_tpu.config import cat_celebahq
    from favae_tpu.models.txt_cond import build_cat
    from favae_tpu.train.cat_step import (create_cat_state,
                                          make_cat_optimizer,
                                          make_cat_train_step)
    import optax

    # production shape: B=16, bf16 Adam-mu, dots_nb remat, unrolled scan
    cfg = cat_celebahq()
    cfg = dataclasses.replace(
        cfg, adam_mu_dtype="bfloat16",
        gpt=dataclasses.replace(cfg.gpt, remat="dots_nb", train_unroll=24))
    cat, gpt_params = build_cat(cfg, jax.random.PRNGKey(0))
    tx = make_cat_optimizer(cfg, optax.constant_schedule(1e-4))
    state = create_cat_state(cat, gpt_params, tx)
    frozen = cat.frozen_params()
    step = jax.jit(make_cat_train_step(cat, tx), donate_argnums=0)
    x = jnp.asarray(np.random.RandomState(0).rand(16, 256, 256, 3)
                    .astype(np.float32) * 2 - 1)
    ids = jnp.asarray(np.random.RandomState(1)
                      .randint(1, 49000, (16, 77)).astype(np.int32))

    def run(k):
        nonlocal state
        m = None
        for i in range(k):
            state, m = step(state, frozen, x, ids, jax.random.PRNGKey(i))
        return float(m["loss_gpt"])

    return run


def _subsystem(category, long_name):
    """Tag an XLA-Ops-lane event with the subsystem it belongs to.

    hlo_category comes first (a conv fusion is MXU work even when XLA also
    folded a GroupNorm epilogue or the Adam update of that kernel into it —
    observed on the r5 trace: the 256x256-level dW convs carry the optimizer
    state as extra fusion outputs). Within the non-conv remainder, tag the
    pure-optimizer loop fusions and the MXU-DFT (FFL) family so the report
    answers "where do the non-MFU milliseconds go".
    """
    if "convolution" in category:
        if "512,256]" in long_name or "256,512]" in long_name:
            return "dft_matmul (FFL 256-tap)"
        return "convolution (model+LPIPS fwd/bwd)"
    if "state_opt_" in long_name:
        return "optimizer update"
    if category == "loop fusion":
        return "loop fusion (GN/blur/losses elementwise)"
    if category in ("data formatting", "copy-start", "copy-done"):
        return "layout copies / formatting"
    if category == "custom fusion":
        return "custom fusion (pallas)"
    return category


def parse_trace(outdir, n_steps):
    """Aggregate the XLA Ops device lane by op name and by subsystem."""
    paths = glob.glob(os.path.join(
        outdir, "plugins", "profile", "*", "*.trace.json.gz"))
    if not paths:
        return None, "no trace.json.gz produced"
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    # Find the op-level device lane: pid named like a device, thread named
    # "XLA Ops" (the "Steps"/"XLA Modules" lanes aggregate whole steps and
    # would double-count).
    pid_names, tid_names = {}, defaultdict(dict)
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e.get("pid")] = e.get("args", {}).get("name", "")
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tid_names[e.get("pid")][e.get("tid")] = (
                e.get("args", {}).get("name", ""))
    lanes = [(p, t) for p, tids in tid_names.items()
             for t, n in tids.items()
             if n == "XLA Ops" and "host" not in pid_names.get(p, "").lower()]
    if not lanes:
        return None, "no 'XLA Ops' device lane in trace"
    lanes = set(lanes)
    agg = defaultdict(float)
    sub = defaultdict(float)
    sub_bytes = defaultdict(float)
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        if (e.get("pid"), e.get("tid")) not in lanes:
            continue
        args = e.get("args", {})
        name = e.get("name", "?")
        agg[name] += e["dur"]  # microseconds
        s = _subsystem(args.get("hlo_category", "?"),
                       args.get("long_name", ""))
        sub[s] += e["dur"]
        try:
            sub_bytes[s] += float(args.get("bytes_accessed", 0))
        except (TypeError, ValueError):
            pass
        total += e["dur"]
    if not agg:
        return None, f"no complete events in {os.path.basename(path)}"
    rows = sorted(agg.items(), key=lambda kv: -kv[1])
    subsystems = [
        {"subsystem": k, "per_step_ms": round(v / n_steps / 1000.0, 2),
         "pct": round(100.0 * v / total, 2),
         "gbps": round(sub_bytes[k] / (v * 1e-6) / 1e9, 0) if v else 0.0}
        for k, v in sorted(sub.items(), key=lambda kv: -kv[1])]
    return {"trace": path, "total_us": total,
            "per_step_ms": round(total / n_steps / 1000.0, 2),
            "subsystems": subsystems,
            "top": [
                {"name": k[:120], "total_us": round(v, 1),
                 "per_step_ms": round(v / n_steps / 1000.0, 3),
                 "pct": round(100.0 * v / total, 2)}
                for k, v in rows[:25]]}, None


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "favae"
    outdir = sys.argv[2] if len(sys.argv) > 2 else f"/tmp/profile_{which}"
    n_steps = int(os.environ.get("PROFILE_STEPS", "5"))
    run = (_run_cat if which == "cat" else _run_favae)(n_steps)
    print(f"# warmup (compile + 2 steps)", flush=True)
    run(2)
    print(f"# tracing {n_steps} steps -> {outdir}", flush=True)
    jax.profiler.start_trace(outdir)
    loss = run(n_steps)
    jax.profiler.stop_trace()
    print(f"# traced; final loss fetch = {loss:.4f}", flush=True)
    result, err = parse_trace(outdir, n_steps)
    if err:
        print(json.dumps({"error": err}))
        return 1
    print(json.dumps(result, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
