"""Full-size int8 decode quality bound: fused-int8 vs bf16 serving engine.

Bounds the lossy int8 serving path at REAL scale (gpt2_medium, the CAT
config the reference trains — cat_scripts/script_cat_celeba.sh), not the
2-layer toy of tests/test_decode_step_kernel.py. Random-init weights (the
released CAT checkpoint is egress-blocked), batch 8, identical
teacher-forced contexts:

  1. bf16 engine samples a 256-token grid (production knobs: top_k=500,
     top_p=0.95, cond_scale=3).
  2. the fused int8 engine replays the SAME token prefix (forced_tokens) with
     the SAME rng, so every position's logits are context-matched.
  3. report: token agreement (fused engine's free samples vs bf16's),
     greedy-argmax agreement, and KL(bf16 || int8) over the CFG-combined
     logits (mean / p99 / max over all b*256 positions).

    python scripts/int8_decode_quality.py        # B=8 default
"""

import functools
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from favae_tpu.utils.xla_cache import enable_persistent_cache

enable_persistent_cache()

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from favae_tpu.config import cat_celebahq  # noqa: E402
from favae_tpu.models.decode_engine import sample_tokens  # noqa: E402
from favae_tpu.models.txt_cond import build_cat  # noqa: E402
from favae_tpu.ops.decode_step_kernel import (  # noqa: E402
    prepare_fused_decode, supports)

KNOBS = dict(temperature=1.0, top_k=500, top_p=0.95, cond_scale=3.0)


def main():
    b = int(os.environ.get("B", "8"))
    cfg = cat_celebahq()
    assert supports(cfg.gpt, 2 * b), "fused kernel does not support this shape"
    model, gpt_params = build_cat(cfg, jax.random.PRNGKey(0))
    fused = prepare_fused_decode(gpt_params, cfg.gpt)

    text_ids = jnp.asarray(
        np.random.RandomState(0).randint(1, 40000, (b, 77)), jnp.int32)
    rng = jax.random.PRNGKey(1)

    @jax.jit
    def run_bf16(gpt_params, clip_params, text_ids, rng):
        embeds, mask = model.encode_text_ids(text_ids, clip_params)
        return sample_tokens(cfg.gpt, gpt_params, embeds, mask, rng=rng,
                             return_logits=True, **KNOBS)

    @jax.jit
    def run_int8_forced(gpt_params, fused, clip_params, text_ids, rng,
                        forced):
        embeds, mask = model.encode_text_ids(text_ids, clip_params)
        grid, logits = sample_tokens(
            cfg.gpt, gpt_params, embeds, mask, rng=rng, fused=fused,
            forced_tokens=forced, return_logits=True, **KNOBS)
        return grid, logits

    @jax.jit
    def compare(la, lb):
        pa = jax.nn.log_softmax(la.astype(jnp.float32), -1)
        pb = jax.nn.log_softmax(lb.astype(jnp.float32), -1)
        kl = jnp.sum(jnp.exp(pa) * (pa - pb), -1)          # (b, S)
        greedy = jnp.mean((jnp.argmax(la, -1) == jnp.argmax(lb, -1))
                          .astype(jnp.float32))
        return kl.mean(), jnp.percentile(kl, 99), kl.max(), greedy

    grid_a, logits_a = run_bf16(gpt_params, model.clip_params, text_ids, rng)
    forced = grid_a.reshape(b, -1)
    grid_b, logits_b = run_int8_forced(gpt_params, fused, model.clip_params,
                                       text_ids, rng, forced)
    kl_mean, kl_p99, kl_max, greedy = compare(logits_a, logits_b)
    agree = float(jnp.mean((grid_a == grid_b).astype(jnp.float32)))

    out = {
        "config": "gpt2_medium (cat_celebahq), random init",
        "batch": b,
        "positions": int(np.prod(grid_a.shape)),
        "token_agreement_same_rng": round(agree, 4),
        "greedy_argmax_agreement": round(float(greedy), 4),
        "kl_bf16_vs_int8_mean": float(kl_mean),
        "kl_bf16_vs_int8_p99": float(kl_p99),
        "kl_bf16_vs_int8_max": float(kl_max),
    }
    print(json.dumps(out, indent=2))
    return out


if __name__ == "__main__":
    main()
