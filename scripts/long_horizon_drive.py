"""Long-horizon stability drive (VERDICT r3 #3): ~1.5k steps of
celebahq_expe5 on the real chip, loader-fed, logging codebook health
(usage %, perplexity), weight_d, and all sigma trajectories.

Uses the synthetic JPEG corpus bench.py builds (256 images) so the loader
path is the real one (process-pool decode, uint8 transfer). The point is
TRAINING-DYNAMICS health over thousands of steps — no collapse, healthy
codebook churn — not image quality (the corpus is noise).

    STEPS=1500 BATCH=16 python scripts/long_horizon_drive.py
Emits one JSON line per PRINT_EVERY steps plus a final summary line:
    {"metric": "long-horizon stability drive", "steps": N, ...}
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

STEPS = int(os.environ.get("STEPS", "1500"))
BATCH = int(os.environ.get("BATCH", "16"))
PRINT_EVERY = int(os.environ.get("PRINT_EVERY", "50"))
TRACK = ("loss_g", "loss_l1", "loss_q", "loss_d", "weight_d",
         "cb_batch_usage_pct", "cb_perplexity")


def main():
    from bench import _make_loader  # reuse the synthetic JPEG corpus
    from favae_tpu.config import (TrainConfig, celebahq_expe5,
                                  celebahq_expe5_losses)
    from favae_tpu.models.lpips import LPIPS
    from favae_tpu.train.favae_state import FavaeTrainState
    from favae_tpu.train.favae_step import make_train_step

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    model_cfg, loss_cfg = celebahq_expe5(), celebahq_expe5_losses()
    train_cfg = TrainConfig(batch_size=BATCH)
    lr = train_cfg.base_lr * BATCH
    state, model, tx_g, tx_d = FavaeTrainState.create(
        model_cfg, loss_cfg, train_cfg, jax.random.PRNGKey(0), lr=lr)
    step = jax.jit(make_train_step(model, LPIPS(), tx_g, tx_d, model_cfg,
                                   loss_cfg, train_cfg, disc_on=True,
                                   ffl_on=True), donate_argnums=0)

    dl = _make_loader(BATCH)
    dl.set_epoch(0)
    it = iter(dl)
    rng = jax.random.PRNGKey(1)
    history = []
    t0 = time.time()
    t_last, n_since = t0, 0
    i = 0
    while i < STEPS:
        try:
            xb = next(it)
        except StopIteration:
            dl.set_epoch(dl.epoch + 1)
            it = iter(dl)
            xb = next(it)
        if xb.shape[0] != BATCH:
            continue
        state, m = step(state, jnp.asarray(xb), rng)
        n_since += xb.shape[0]
        i += 1
        if i % PRINT_EVERY == 0 or i == STEPS:
            now = time.time()
            row = {"step": i,
                   "imgs_per_sec": round(n_since / (now - t_last), 2)}
            t_last, n_since = now, 0
            for k in TRACK:
                if k in m:
                    row[k] = round(float(m[k]), 4)
            # sigma trajectories (encoder/decoder DSL sigmas)
            for mod in ("encoder", "decoder"):
                sig = state.params_g.get(mod, {}).get("sigmas")
                if sig is not None:
                    for j, v in enumerate(np.asarray(sig).tolist()):
                        row[f"{mod[:3]}_sigma_{j}"] = round(v, 4)
            history.append(row)
            print(json.dumps(row), flush=True)
    dl.close()

    finite = all(np.isfinite(v) for r in history for v in r.values()
                 if isinstance(v, float))
    final = history[-1]
    usage = [r.get("cb_batch_usage_pct") for r in history
             if "cb_batch_usage_pct" in r]
    print(json.dumps({
        "metric": "long-horizon stability drive (celebahq_expe5, loader-fed)",
        "steps": STEPS, "batch": BATCH,
        "wall_min": round((time.time() - t0) / 60, 1),
        "all_finite": bool(finite),
        "final": final,
        "cb_usage_min_pct": min(usage) if usage else None,
        "cb_usage_max_pct": max(usage) if usage else None,
    }), flush=True)


if __name__ == "__main__":
    from favae_tpu.utils.backend import (call_with_backend_retry,
                                         wait_for_backend)
    log = lambda m: print(f"# {m}", file=sys.stderr, flush=True)
    if not wait_for_backend(tries=4, delay_s=90.0, log=log):
        print(json.dumps({"metric": "long-horizon stability drive",
                          "error": "TPU backend unavailable"}))
        sys.exit(1)
    call_with_backend_retry(main, tries=3, delay_s=60.0, log=log)
