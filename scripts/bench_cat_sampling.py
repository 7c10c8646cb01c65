"""CAT text-to-image sampling throughput (bf16 engine vs fused int8 kernel).

Measures the FULL pipeline (CLIP encode -> 256-token CFG KV-cache decode ->
FA-VAE decode) with the only trustworthy methodology on this backend:
state-chained calls, synced per iteration on the small token grid
(`int(jnp.sum(grid))`) — never on the image tensor, whose host fetch through
the relay inflates timings by seconds (see .claude/skills/verify/SKILL.md).

    B=4 python scripts/bench_cat_sampling.py
    B=16 python scripts/bench_cat_sampling.py

Reference numbers (random-init weights, v5e-1, 2026-08-17):
    quantized=False B=4:  ~569 ms/call ->  7.0 imgs/s (2.22 ms/token)
    quantized=True  B=4:  ~373 ms/call -> 10.7 imgs/s (1.46 ms/token)
    quantized=False B=16: ~709 ms/call -> 22.6 imgs/s
    quantized=True  B=16: ~627 ms/call -> 25.5 imgs/s
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from favae_tpu.utils.xla_cache import enable_persistent_cache

enable_persistent_cache()

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from favae_tpu.config import cat_celebahq  # noqa: E402
from favae_tpu.models.txt_cond import build_cat  # noqa: E402


def main():
    b = int(os.environ.get("B", "4"))
    cfg = cat_celebahq()
    model, gpt_params = build_cat(cfg, jax.random.PRNGKey(0))
    text_ids = jnp.asarray(
        np.random.RandomState(0).randint(1, 40000, (b, 77)), jnp.int32)
    rng = jax.random.PRNGKey(1)

    for quant in (False, True):
        imgs, grid = model.sample_images(
            gpt_params, text_ids, rng=rng, top_k=2048, top_p=0.95,
            cond_scale=3.0, quantized=quant)
        jax.block_until_ready(grid)
        times = []
        for i in range(3):
            t0 = time.perf_counter()
            imgs, grid = model.sample_images(
                gpt_params, text_ids, rng=jax.random.fold_in(rng, i),
                top_k=2048, top_p=0.95, cond_scale=3.0, quantized=quant)
            _ = int(jnp.sum(grid))  # sync on the SMALL output
            times.append(time.perf_counter() - t0)
        dt = min(times)
        seq = cfg.gpt.image_encoded_dim ** 2
        print(f"quantized={quant} B={b}: {dt*1e3:.0f} ms/call -> "
              f"{b/dt:.2f} imgs/s, {dt/seq*1e3:.2f} ms/token")
        # machine-readable line for scripts/summarize_chip_logs.py
        import json
        print(json.dumps({
            "metric": f"CAT sampling pipeline (quantized={quant})",
            "value": round(b / dt, 2), "unit": "imgs/s",
            "batch": b, "ms_per_call": round(dt * 1e3, 1),
            "ms_per_token": round(dt / seq * 1e3, 2),
            "sync": "int(jnp.sum(grid)) host fetch of the token grid"}))


if __name__ == "__main__":
    main()
