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

    def caption_grid(self, name: str, x: np.ndarray, samples: np.ndarray,
                     captions, step: int):
        """One column per sample: [input; generated] with the caption drawn
        underneath (reference: cat_scripts/train_cat.py:44-66 renders captions
        as matplotlib subplot titles; here drawn into the image with PIL so it
        works headless). Falls back to a bare grid without PIL."""
        if self._writer is None:
            return
        x = np.clip(np.asarray(x) * 0.5 + 0.5, 0.0, 1.0)
        samples = np.clip(np.asarray(samples) * 0.5 + 0.5, 0.0, 1.0)
        n, h, w, c = x.shape
        try:
            from textwrap import wrap
            from PIL import Image, ImageDraw
            line_h, pad = 12, 4
            wrapped = [wrap(str(cap), max(8, w // 7))[:4] or [""]
                       for cap in captions[:n]]
            strip_h = pad * 2 + line_h * max(len(ls) for ls in wrapped)
            grid = np.zeros((2 * h + strip_h, n * w, c), np.float32)
            for i in range(n):
                grid[:h, i * w:(i + 1) * w] = x[i]
                grid[h:2 * h, i * w:(i + 1) * w] = samples[i]
            img = Image.fromarray((grid * 255).astype(np.uint8))
            draw = ImageDraw.Draw(img)
            for i, lines in enumerate(wrapped):
                for j, line in enumerate(lines):
                    draw.text((i * w + 2, 2 * h + pad + j * line_h), line,
                              fill=(255, 255, 255))
            out = np.asarray(img, np.float32) / 255.0
        except Exception:
            out = np.concatenate([np.concatenate(list(x), axis=1),
                                  np.concatenate(list(samples), axis=1)],
                                 axis=0)
        self._writer.add_image(name, out, step, dataformats="HWC")
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
