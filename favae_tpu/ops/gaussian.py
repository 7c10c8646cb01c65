"""Differentiable Gaussian blur as a depthwise convolution (NHWC).

TPU-native replacement for the reference's per-tap blur
(reference: models/codec.py:255-277 `_get_gaussian_kernel1d/_gaussian_blur`):
the 2-D kernel is built from a (learnable) sigma, the input is reflect-padded,
and the blur runs as a depthwise `lax.conv_general_dilated` that XLA fuses with
the surrounding elementwise work. Gradients flow into sigma, which is what makes
the Dynamic Spectrum Loss "dynamic".
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def gaussian_kernel_1d(kernel_size: int, sigma: jax.Array) -> jax.Array:
    """Normalized 1-D Gaussian taps; matches torchvision/reference semantics
    (reference: models/codec.py:255-261): x = linspace(-k/2, k/2, k),
    pdf = exp(-0.5 (x/sigma)^2), normalized to sum 1."""
    half = (kernel_size - 1) * 0.5
    x = jnp.linspace(-half, half, kernel_size, dtype=jnp.float32)
    pdf = jnp.exp(-0.5 * jnp.square(x / sigma))
    return pdf / jnp.sum(pdf)


def gaussian_kernel_2d(kernel_size: int, sigma: jax.Array) -> jax.Array:
    """Separable outer product (reference: models/codec.py:264-268)."""
    k1 = gaussian_kernel_1d(kernel_size, sigma)
    return jnp.outer(k1, k1)


def gaussian_blur_nhwc(x: jax.Array, kernel_size: int, sigma: jax.Array) -> jax.Array:
    """Depthwise Gaussian blur with reflect padding over an NHWC tensor.

    Equivalent to the reference's grouped conv2d blur with reflect pad
    (models/codec.py:271-277) but NHWC and dtype-preserving. The blur is
    separable; running it as two 1-D depthwise convs keeps FLOPs at 2k
    instead of k^2 per pixel — identical output up to float rounding.
    """
    if kernel_size <= 1:
        return x
    c = x.shape[-1]
    orig_dtype = x.dtype
    # Blur in the input's own dtype (bf16 for production taps — halves the
    # HBM traffic of the materialized reflect-pad copy and the two depthwise
    # passes); the kernel taps and accumulation stay float32.
    xf = x
    pad = kernel_size // 2
    xf = jnp.pad(xf, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="reflect")

    k1 = gaussian_kernel_1d(kernel_size, sigma).astype(xf.dtype)
    # Horizontal pass: kernel (1, k, 1, C) in HWIO with feature_group_count=C.
    # (No preferred_element_type: its transpose rule rejects the mixed-dtype
    # cotangent, and the TPU accumulates the 9-tap dot in f32 internally.)
    kh = jnp.tile(k1.reshape(1, kernel_size, 1, 1), (1, 1, 1, c))
    kv = jnp.tile(k1.reshape(kernel_size, 1, 1, 1), (1, 1, 1, c))
    dn = jax.lax.conv_dimension_numbers(xf.shape, kh.shape, ("NHWC", "HWIO", "NHWC"))
    y = jax.lax.conv_general_dilated(
        xf, kh, window_strides=(1, 1), padding="VALID",
        dimension_numbers=dn, feature_group_count=c)
    y = jax.lax.conv_general_dilated(
        y, kv, window_strides=(1, 1), padding="VALID",
        dimension_numbers=dn, feature_group_count=c)
    return y.astype(orig_dtype)
