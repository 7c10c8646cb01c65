"""Full-size CAT training throughput: gpt2_medium train step on the TPU.

The reference trains CAT on 2 GPUs via DDP (cat_scripts/script_cat_celeba.sh)
but publishes no throughput; this bench gives our number the same rigor as
the FA-VAE step bench: the COMPLETE hot loop (frozen FA-VAE encode @256px +
frozen CLIP text encode + gpt2_medium fwd/bwd/AdamW, one jit —
cat_scripts/train_cat.py:69-109), state-chained timing, sync on the scalar
loss.

Reports samples/s, tokens/s (256 image tokens per sample), achieved TFLOP/s
and MFU (analytic GPT fwd+bwd FLOPs + CPU-cost-analysis frozen-tower
constant; see gpt_train_gflops_per_sample).

    B=16 REMAT=dots_nb UNROLL=24 python scripts/bench_cat_train.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from favae_tpu.utils.xla_cache import enable_persistent_cache

enable_persistent_cache()

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import optax  # noqa: E402

from favae_tpu.config import cat_celebahq  # noqa: E402
from favae_tpu.models.txt_cond import build_cat  # noqa: E402
from favae_tpu.train.cat_step import (  # noqa: E402
    create_cat_state, make_cat_latent_train_step, make_cat_optimizer,
    make_cat_train_step)

from favae_tpu.utils.benchgate import (  # noqa: E402
    V5E_BF16_PEAK_TFLOPS, apply_sanity_gate)

WARMUP = 2
ITERS = 10

# Frozen towers (FA-VAE encode @256px + CLIP text ViT-L/14 + quantize), one
# forward, per sample: XLA cost analysis on CPU of exactly that subgraph —
# scan-free, so the number is exact (scripts/measure_step_flops.py 8 frozen:
# 1.218e12 flops at batch 8 = 152.2 GFLOP/sample).
FROZEN_GFLOP_PER_SAMPLE = float(os.environ.get("FROZEN_GFLOP", "152.2"))


def gpt_train_gflops_per_sample(g):
    """Analytic GPT fwd+bwd matmul FLOPs per sample (standard MFU
    convention: model FLOPs only, remat recompute NOT counted; XLA cost
    analysis undercounts here because it counts the nn.scan body once).

    Sequence: inp = z[:, :-1] (255 ids) + start token -> n = 256 query
    positions; self-attention keys n+1 (null kv), cross keys 77 text + null.
    """
    d, inner, dh = g.n_embed, g.n_head * g.dim_head, g.dim_head
    n = g.image_encoded_dim ** 2
    m_txt = 77
    per_layer = (
        # projections: self q/kv/out, cross q/out over n tokens; cross kv
        # over the 77 text tokens; feed-forward
        2 * n * (d * inner + d * dh + inner * d + d * inner + inner * d
                 + 8 * d * d)
        + 2 * m_txt * g.n_cond_embed * dh
        # attention einsums: sim + weighted sum, q (n,heads,dh) vs shared
        # single-head kv (m,dh)
        + 4 * g.n_head * n * (n + 1) * dh
        + 4 * g.n_head * n * (m_txt + 1) * dh)
    logits = 2 * n * d * g.vocab_size
    fwd = g.n_layer * per_layer + logits
    return 3.0 * fwd / 1e9  # fwd + 2x bwd


def main():
    import dataclasses

    b = int(os.environ.get("B", "8"))
    ga = int(os.environ.get("GA", "1"))  # grad accumulation: b = GA x (b/GA)
    cfg = cat_celebahq()
    remat = os.environ.get("REMAT", "dots_nb")
    unroll = int(os.environ.get("UNROLL", "1"))
    mu_dtype = os.environ.get("MU_DTYPE", "float32")
    nu_dtype = os.environ.get("NU_DTYPE", "float32")
    fold_ln = os.environ.get("FOLD_LN", "0") == "1"
    cfg = dataclasses.replace(
        cfg, adam_mu_dtype=mu_dtype, adam_nu_dtype=nu_dtype,
        gpt=dataclasses.replace(cfg.gpt, remat=remat,
                                train_unroll=unroll,
                                fold_ln_scale=fold_ln))
    # CACHE_LATENTS=1: bench the precomputed-latent step (--cache_latents in
    # the CLI) — the frozen towers never enter the jit (see
    # favae_tpu/data/latent_cache.py). MFU numerator then counts GPT
    # fwd+bwd only (no frozen-tower FLOPs are executed).
    cache_latents = os.environ.get("CACHE_LATENTS", "0") == "1"

    cat, gpt_params = build_cat(cfg, jax.random.PRNGKey(0))
    tx = make_cat_optimizer(cfg, optax.constant_schedule(1e-4))
    state = create_cat_state(cat, gpt_params, tx)
    rng = jax.random.PRNGKey(2)

    if cache_latents:
        seq = cfg.gpt.image_encoded_dim ** 2
        z = jnp.asarray(np.random.RandomState(0).randint(
            0, cfg.vqgan.quantizer.codebook_size, (b, seq)), jnp.int32)
        embeds = jnp.asarray(np.random.RandomState(1).randn(
            b, 77, cfg.gpt.n_cond_embed).astype(np.float32))
        mask = jnp.asarray(np.random.RandomState(2).rand(b, 77) < 0.5)
        step_fn = jax.jit(make_cat_latent_train_step(cat, tx, grad_accum=ga),
                          donate_argnums=0)
        step = lambda state, rng: step_fn(state, z, embeds, mask, rng)
    else:
        frozen = cat.frozen_params()
        x = jnp.asarray(np.random.RandomState(0).rand(b, 256, 256, 3)
                        .astype(np.float32) * 2 - 1)
        ids = jnp.asarray(np.random.RandomState(1).randint(1, 40000, (b, 77)),
                          jnp.int32)
        step_fn = jax.jit(make_cat_train_step(cat, tx, grad_accum=ga),
                          donate_argnums=0)
        step = lambda state, rng: step_fn(state, frozen, x, ids, rng)

    for _ in range(WARMUP):
        state, m = step(state, rng)
        _ = float(m["loss_gpt"])

    # per-step host fetch of the scalar loss: the conservative sync on this
    # backend (end-of-loop block_until_ready reports ready far too early
    # through the relay; see .claude/skills/verify/SKILL.md). It charges one
    # relay round trip to every step, which a real training loop does not
    # pay (the trainer fetches metrics every print_steps).
    t0 = time.perf_counter()
    for _ in range(ITERS):
        state, m = step(state, rng)
        _ = float(m["loss_gpt"])
    dt = (time.perf_counter() - t0) / ITERS

    # production-cadence timing: chain ITERS donated steps and fetch ONE
    # final scalar. Sound even on the relay: the fetched loss depends on the
    # entire step chain, so the wall clock covers all ITERS steps (unlike
    # block_until_ready, a value fetch cannot report early).
    t0 = time.perf_counter()
    last = None
    for _ in range(ITERS):
        state, last = step(state, rng)
    _ = float(last["loss_gpt"])
    dt_pipelined = (time.perf_counter() - t0) / ITERS

    samples_per_sec = b / dt
    seq = cfg.gpt.image_encoded_dim ** 2
    out = {
        "metric": ("CAT gpt2_medium train step (cached latents)"
                   if cache_latents else
                   "CAT gpt2_medium train step (full pipeline @256px)"),
        "cache_latents": cache_latents,
        "batch": b,
        "grad_accum": ga,
        "remat": remat,
        "unroll": unroll,
        "adam_mu_dtype": mu_dtype,
        "adam_nu_dtype": nu_dtype,
        "fold_ln_scale": fold_ln,
        "step_ms": round(dt * 1e3, 1),
        "samples_per_sec": round(samples_per_sec, 2),
        "tokens_per_sec": round(samples_per_sec * seq, 0),
        "pipelined_step_ms": round(dt_pipelined * 1e3, 1),
        "pipelined_samples_per_sec": round(b / dt_pipelined, 2),
    }
    gflop = gpt_train_gflops_per_sample(cfg.gpt) + (
        0.0 if cache_latents else FROZEN_GFLOP_PER_SAMPLE)
    tflops = samples_per_sec * gflop / 1e3
    out["gflop_per_sample"] = round(gflop, 1)
    out["tflops"] = round(tflops, 1)
    out["mfu_pct"] = round(100.0 * tflops / V5E_BF16_PEAK_TFLOPS, 1)
    out["mfu_convention"] = ("analytic model FLOPs fwd+bwd, remat recompute "
                             "excluded; frozen towers "
                             + ("not executed (cached latents), excluded"
                                if cache_latents else
                                "measured via CPU cost analysis"))
    # >100% MFU / sub-roofline step_ms -> error + quarantined "suspect"
    # (r4 postmortem; see favae_tpu/utils/benchgate.py)
    out = apply_sanity_gate(out, gflop, b)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
