"""Benchmark: FA-VAE VQGAN train-step throughput (imgs/sec/chip) at 256px.

Runs the published CelebA-HQ expe_5 configuration (FCM(Res) + non-pairwise
DSL, full loss stack with discriminator) — the reference's hot loop
(reference: favae_scripts/train_favae.py:56-116) — on the available TPU
chip(s) and prints ONE JSON line.

Baseline: the reference publishes no throughput numbers (BASELINE.md). We
compare against an estimated PyTorch/A100 figure for the same model and batch
size derived from the reference's V100 batch-8 hint and standard A100/V100
scaling: ~25 imgs/sec/chip. vs_baseline = ours / 25.0.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np
import jax

from favae_tpu.utils.xla_cache import enable_persistent_cache
enable_persistent_cache()
import jax.numpy as jnp

from favae_tpu.config import TrainConfig, celebahq_expe5, celebahq_expe5_losses
from favae_tpu.models.lpips import LPIPS
from favae_tpu.train.favae_state import FavaeTrainState
from favae_tpu.train.favae_step import make_train_step

A100_BASELINE_IMGS_PER_SEC = 25.0
BATCH_PER_CHIP = int(os.environ.get("FAVAE_BENCH_BATCH", "16"))
WARMUP = 3
ITERS = 20
# FAVAE_BENCH_MODE: "synthetic" (default, fixed device batch),
# "loader" (loader-only throughput: JPEG decode+transform on this host),
# "real" (train step fed from the loader — end-to-end incl. input pipeline)
MODE = os.environ.get("FAVAE_BENCH_MODE", "synthetic")


def _jpeg_dataset(tmp_dir: str, n: int = 256, resolution: int = 256):
    """Write a one-time synthetic JPEG corpus + pkl manifest so the loader
    benchmark measures real decode/transform cost."""
    import pickle
    from PIL import Image
    os.makedirs(tmp_dir, exist_ok=True)
    manifest_path = os.path.join(tmp_dir, "bench.pkl")
    if not os.path.exists(manifest_path):
        rng = np.random.RandomState(0)
        paths = []
        for i in range(n):
            p = os.path.join(tmp_dir, f"img_{i:04d}.jpg")
            Image.fromarray((rng.rand(resolution + 32, resolution + 32, 3)
                             * 255).astype(np.uint8)).save(p, quality=92)
            paths.append(p)
        with open(manifest_path, "wb") as f:
            pickle.dump(paths, f)
    return manifest_path


def _make_loader(batch: int):
    from favae_tpu.data.pipeline import DataLoader, PklImageDataset
    manifest = _jpeg_dataset(os.path.expanduser("~/.cache/favae_bench_jpegs"))
    ds = PklImageDataset(manifest, resolution=256)
    return DataLoader(ds, batch_size=batch, num_workers=8, drop_last=False)


def bench_loader():
    """Loader-only imgs/s: PIL JPEG decode + resize + normalize on this host
    (the input pipeline must outrun the train step to keep the chip busy)."""
    batch = BATCH_PER_CHIP * max(jax.device_count(), 1)
    dl = _make_loader(batch)
    dl.set_epoch(0)
    n = 0
    it = iter(dl)
    next(it)  # warm the thread pool / page cache
    t0 = time.perf_counter()
    for x in it:
        n += x.shape[0]
    dt = time.perf_counter() - t0
    imgs_per_sec = n / dt
    print(json.dumps({
        "metric": "imgs/sec input pipeline (JPEG decode @256px)",
        "value": round(imgs_per_sec, 2),
        "unit": "imgs/sec",
        "vs_baseline": round(imgs_per_sec / A100_BASELINE_IMGS_PER_SEC, 3),
    }))


def main():
    n_chips = jax.device_count()
    batch = BATCH_PER_CHIP * n_chips

    model_cfg = celebahq_expe5()
    loss_cfg = celebahq_expe5_losses()
    train_cfg = TrainConfig(batch_size=BATCH_PER_CHIP)
    lr = train_cfg.base_lr * BATCH_PER_CHIP * n_chips

    state, model, tx_g, tx_d = FavaeTrainState.create(
        model_cfg, loss_cfg, train_cfg, jax.random.PRNGKey(0), lr=lr)

    lpips = LPIPS()
    step = jax.jit(
        make_train_step(model, lpips, tx_g, tx_d, model_cfg, loss_cfg,
                        train_cfg, disc_on=True, ffl_on=True),
        donate_argnums=0)

    if n_chips > 1:
        from favae_tpu.parallel.mesh import make_mesh, replicate_tree, shard_batch
        mesh = make_mesh()
        state = replicate_tree(state, mesh)
        x = shard_batch(jnp.asarray(
            np.random.RandomState(0).rand(batch, 256, 256, 3)
            .astype(np.float32) * 2 - 1), mesh)
    else:
        x = jnp.asarray(np.random.RandomState(0).rand(batch, 256, 256, 3)
                        .astype(np.float32) * 2 - 1)

    rng = jax.random.PRNGKey(1)
    for _ in range(WARMUP):
        state, m = step(state, x, rng)
    jax.block_until_ready(m["loss_g"])

    if MODE == "real":
        # feed each step from the input pipeline (JPEG decode on this host)
        dl = _make_loader(batch)
        dl.set_epoch(0)
        it = iter(dl)
        n_done = 0
        t0 = time.perf_counter()
        for _ in range(ITERS):
            try:
                xb = next(it)
            except StopIteration:
                dl.set_epoch(1)
                it = iter(dl)
                xb = next(it)
            if xb.shape[0] != batch:
                continue
            state, m = step(state, jnp.asarray(xb), rng)
            n_done += xb.shape[0]
        jax.block_until_ready(m["loss_g"])
        dt = time.perf_counter() - t0
        imgs_per_sec_chip = n_done / dt / n_chips
        label = "imgs/sec/chip VQGAN(expe_5) train step @256px (loader-fed)"
    else:
        t0 = time.perf_counter()
        for _ in range(ITERS):
            state, m = step(state, x, rng)
        jax.block_until_ready(m["loss_g"])
        dt = (time.perf_counter() - t0) / ITERS
        imgs_per_sec_chip = batch / dt / n_chips
        label = "imgs/sec/chip VQGAN(expe_5) train step @256px"

    print(json.dumps({
        "metric": label,
        "value": round(imgs_per_sec_chip, 2),
        "unit": "imgs/sec/chip",
        "vs_baseline": round(imgs_per_sec_chip / A100_BASELINE_IMGS_PER_SEC, 3),
    }))


if __name__ == "__main__":
    if MODE == "loader":
        bench_loader()
    else:
        main()
