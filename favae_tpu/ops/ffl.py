"""Focal Frequency Loss (Jiang et al., ICCV 2021) in pure XLA.

The reference consumes the pip package `focal-frequency-loss==0.3.0`
(reference: favae_scripts/train_favae.py:27,311-330, environment.yaml:139) with
`alpha=1.0` and default `patch_factor=1, ave_spectrum=False, log_matrix=False,
batch_matrix=False`. Semantics reproduced here:

  F = fft2(x, norm="ortho") over the spatial dims
  d = |F_pred - F_true|^2                       (per-frequency squared distance)
  w = |F_pred - F_true|^alpha                   (spectrum weight)
  w = w / max(w over spatial dims)              (per-(batch, channel) max)
  w = nan_to_num(w), clip to [0, 1], detached
  loss = mean(w * d) * loss_weight

TPU-native twists vs the package:
* the DFT runs as MXU matmuls (`favae_tpu.ops.dft`) — the axon TPU backend has
  no FFT primitive, and dense DFT-by-matmul is faster at these sizes anyway;
* FFL only ever consumes F_pred - F_true, and the DFT is linear, so we
  transform the *difference* once instead of transforming both inputs.

Runs in float32 on NHWC tensors.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from favae_tpu.ops.dft import dft2_real_nhwc


def focal_frequency_loss(
    pred: jax.Array,
    target: jax.Array,
    loss_weight: float = 1.0,
    alpha: float = 1.0,
    log_matrix: bool = False,
    batch_matrix: bool = False,
    matrix: Optional[jax.Array] = None,
    compute_dtype=None,
) -> jax.Array:
    """FFL between NHWC `pred` and `target`. Returns a scalar.

    `matrix` optionally supplies a precomputed spectrum weight (detached).
    `compute_dtype` routes the DFT matmuls (None = float32, the reference's
    FFT precision; production configs pass LossConfig.spectral_dtype=bf16 —
    the distance/weight math downstream is always float32).
    """
    pred = pred.astype(jnp.float32)
    target = target.astype(jnp.float32)
    if compute_dtype is None:
        compute_dtype = jnp.float32

    # DFT is linear: F_pred - F_true = DFT(pred - target). One transform.
    # The spectra come back in compute_dtype (bf16 on TPU); the distance and
    # weight math promotes to f32.
    diff_re, diff_im = dft2_real_nhwc(pred - target, norm="ortho",
                                      compute_dtype=compute_dtype)
    diff_re = diff_re.astype(jnp.float32)
    diff_im = diff_im.astype(jnp.float32)
    dist = diff_re * diff_re + diff_im * diff_im  # (N, H, W, C)

    if matrix is not None:
        w = jax.lax.stop_gradient(matrix)
    elif log_matrix:
        w = jnp.log(jnp.power(jnp.sqrt(dist), alpha) + 1.0)
        denom = (jnp.max(w) if batch_matrix
                 else jnp.max(w, axis=(1, 2), keepdims=True))
        w = jnp.nan_to_num(w / denom, nan=0.0)
        w = jax.lax.stop_gradient(jnp.clip(w, 0.0, 1.0))
    else:
        # |dF|^alpha / max(|dF|^alpha) == (dist / max(dist))^(alpha/2):
        # x^(a/2) is monotone, so normalizing AFTER the max avoids
        # materializing the sqrt/power array just to reduce it — dist is
        # cheap enough that XLA recomputes it in each consumer instead of
        # storing the (N, H, W, C) f32 intermediates.
        denom = (jnp.max(dist) if batch_matrix
                 else jnp.max(dist, axis=(1, 2), keepdims=True))
        ratio = dist / denom
        w = jnp.sqrt(ratio) if alpha == 1.0 else jnp.power(ratio, alpha * 0.5)
        w = jnp.nan_to_num(w, nan=0.0)
        w = jax.lax.stop_gradient(jnp.clip(w, 0.0, 1.0))

    return jnp.mean(w * dist) * loss_weight


def feature_tap_ffl(
    enc_feats,
    dec_feats,
    loss_weight: float = 1.0,
    alpha: float = 1.0,
    compute_dtype=None,
):
    """FFL over mirror-paired feature taps.

    Pairs encoder tap i with decoder tap (n-1-i) — the reference reverses the
    decoder list in place then zips (reference: losses/vqgan_losses.py:18-30).
    Returns (mean loss, per-pair losses list).
    """
    n = len(enc_feats)
    losses = []
    total = jnp.float32(0.0)
    for i in range(n):
        li = focal_frequency_loss(
            dec_feats[n - 1 - i], enc_feats[i], loss_weight=loss_weight,
            alpha=alpha, compute_dtype=compute_dtype)
        losses.append(li)
        total = total + li
    return total / n, losses
