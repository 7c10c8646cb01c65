"""Metrics/observability: TensorBoard scalars + image grids, process-0 gating.

reference: favae_scripts/train_favae.py:121-177 (≈20 scalar channels incl. all
learned sigmas and per-tap DSL losses, image grids of [x; x_recon]) and
utils.py:122-124 (rank-0-only print). The TB backend is torch's
SummaryWriter (available in the image) behind a no-op fallback.
"""

from __future__ import annotations

import builtins
from typing import Dict, Optional

import jax
import numpy as np


def is_main_process() -> bool:
    return jax.process_index() == 0


def print0(*args, **kwargs):
    if is_main_process():
        builtins.print(*args, **kwargs, flush=True)


class MetricWriter:
    def __init__(self, log_dir: Optional[str]):
        self._writer = None
        if log_dir and is_main_process():
            try:
                from torch.utils.tensorboard import SummaryWriter
                self._writer = SummaryWriter(log_dir)
            except Exception:
                self._writer = None

    def scalars(self, prefix: str, metrics: Dict[str, float], step: int):
        if self._writer is None:
            return
        for k, v in metrics.items():
            try:
                self._writer.add_scalar(f"{prefix}/{k}", float(v), step)
            except (TypeError, ValueError):
                pass
        self._writer.flush()

    def recon_grid(self, name: str, x: np.ndarray, x_recon: np.ndarray,
                   step: int):
        """[x; x_recon] grid, denormalized from [-1,1]
        (reference: train_favae.py:42-53). NHWC float."""
        if self._writer is None:
            return
        img = np.concatenate([np.asarray(x), np.asarray(x_recon)], axis=0)
        img = np.clip(img * 0.5 + 0.5, 0.0, 1.0)
        n, h, w, c = img.shape
        cols = max(1, n // 2)
        rows = -(-n // cols)
        grid = np.zeros((rows * h, cols * w, c), img.dtype)
        for i in range(n):
            r, col = divmod(i, cols)
            grid[r * h:(r + 1) * h, col * w:(col + 1) * w] = img[i]
        self._writer.add_image(name, grid, step, dataformats="HWC")
        self._writer.flush()

    def close(self):
        if self._writer is not None:
            self._writer.close()


def device_memory_mib() -> float:
    """Peak device memory in MiB (the reference logs
    torch.cuda.max_memory_reserved per interval, train_favae.py:122)."""
    try:
        stats = jax.local_devices()[0].memory_stats() or {}
        return stats.get("peak_bytes_in_use", 0) / (1 << 20)
    except Exception:
        return 0.0
