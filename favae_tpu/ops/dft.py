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


def dft2_real_nhwc(x, norm: str = "ortho"):
    """2-D DFT over (H, W) of a real NHWC tensor. Returns (real, imag), each
    NHWC float32. Matches jnp.fft.fft2(x, axes=(1, 2), norm=norm)."""
    x = x.astype(jnp.float32)
    _, h, w, _ = x.shape
    ch, sh = _dft_mats(h, norm)
    cw, sw = _dft_mats(w, norm)
    # transform along H: Y[k, w] = sum_m D_H[k, m] x[m, w]
    y_re = jnp.einsum("km,nmwc->nkwc", ch, x)
    y_im = jnp.einsum("km,nmwc->nkwc", sh, x)
    # transform along W: F[k, l] = sum_n Y[k, n] D_W[l, n]  (D symmetric)
    f_re = jnp.einsum("nkmc,lm->nklc", y_re, cw) - jnp.einsum("nkmc,lm->nklc", y_im, sw)
    f_im = jnp.einsum("nkmc,lm->nklc", y_re, sw) + jnp.einsum("nkmc,lm->nklc", y_im, cw)
    return f_re, f_im
