"""2-D DFT as MXU matrix multiplications.

The axon TPU backend has no FFT primitive, and at the spatial sizes FA-VAE uses
(16..256) a dense DFT-by-matmul on the MXU beats a generic FFT anyway: the DFT
matrices are tiny constants that XLA folds, and the contraction is a perfectly
tiled matmul. For real input x, fft2(x) factorizes as D_H @ x @ D_W with
D_N[k, m] = exp(-2*pi*i*k*m/N):

    Y  = D_H x           (Y_re = C_H x, Y_im = S_H x)
    F  = Y D_W           (F_re = Y_re C_W - Y_im S_W,  F_im = Y_re S_W + Y_im C_W)

Gradients are the transposed matmuls — also MXU work.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=32)
def _dft_mats(n: int, norm: str):
    # NOTE: cache plain numpy (never jnp) — a jnp constant created inside a
    # jit trace is a tracer, and caching it would leak it across traces.
    k = np.arange(n)
    ang = -2.0 * np.pi * np.outer(k, k) / n
    c = np.cos(ang)
    s = np.sin(ang)
    if norm == "ortho":
        c = c / np.sqrt(n)
        s = s / np.sqrt(n)
    return np.asarray(c, np.float32), np.asarray(s, np.float32)


def dft2_real_nhwc(x, norm: str = "ortho", compute_dtype=None):
    """2-D DFT over (H, W) of a real NHWC tensor. Returns (real, imag), each
    NHWC in `compute_dtype` (float32 default). Matches
    jnp.fft.fft2(x, axes=(1, 2), norm=norm) up to that dtype.

    `compute_dtype` sets the matmul input dtype (accumulation stays float32
    via preferred_element_type). bfloat16 halves the HBM traffic of the
    (N, H, W, C) intermediates and keeps the contraction single-pass on the
    MXU — on the train-step profile the f32 DFT matmuls were ~8% of device
    time. Loss-level math downstream stays float32."""
    cdt = jnp.dtype(compute_dtype) if compute_dtype is not None else jnp.float32
    x = x.astype(cdt)
    _, h, w, _ = x.shape
    ch, sh = _dft_mats(h, norm)
    cw, sw = _dft_mats(w, norm)
    # transform along H with the stacked [C; S] matrix — one bigger matmul
    # tiles the MXU better than two: Y[k, w] = sum_m D_H[k, m] x[m, w].
    # Accumulate f32 inside the dot but MATERIALIZE in cdt: at 256px a
    # 128-channel tap's intermediate is 537 MB in f32 — the casts fuse into
    # the dot outputs so the f32 copies never reach HBM.
    # Both stages run as ONE stacked matmul each (two einsums total; the
    # previous formulation read the stage-1 intermediate four times):
    #   stage W:  Z = X D_W^T with [C; S] stacked on the OUTPUT axis
    #             -> z[:, :, :w] = X C^T (z_re), z[:, :, w:] = X S^T (z_im)
    #   stage H:  T = D_H Z with [C; S] stacked on the output axis
    #             -> T blocks = {C,S} x {z_re,z_im}; the complex combine
    #                F_re = C z_re - S z_im, F_im = S z_re + C z_im is a
    #                pair of slice-adds that fuse into the consumers.
    dws = jnp.asarray(np.concatenate([cw, sw], axis=0), cdt)   # (2w, w)
    z = jnp.einsum("lm,nhmc->nhlc", dws, x,
                   preferred_element_type=jnp.float32).astype(cdt)
    dhs = jnp.asarray(np.concatenate([ch, sh], axis=0), cdt)   # (2h, h)
    t = jnp.einsum("km,nmlc->nklc", dhs, z,
                   preferred_element_type=jnp.float32).astype(cdt)
    f_re = t[:, :h, :w] - t[:, h:, w:]
    f_im = t[:, h:, :w] + t[:, :h, w:]
    return f_re, f_im
