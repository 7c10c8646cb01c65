"""Fused nearest-codebook-entry lookup as a Pallas TPU kernel.

The XLA path materializes the (N, K) score matrix before the argmax — at
ImageNet scale (K=16384 codes, N=16k tokens) that is a 1 GB float32
intermediate that exists only to be reduced. This kernel tiles N on the grid
and streams K through VMEM, keeping a running (best score, best index) pair
per token: the matmul tiles ride the MXU, the argmax rides the VPU, and HBM
traffic drops to the inputs plus an (N,) index vector.

Works for both metrics of the reference quantizer
(reference: models/l2_quantize.py:280,410):
  cosine:    score = x_hat . e_hat                (inputs pre-l2-normalized)
  euclidean: score = 2 x . e - ||e||^2            (rank-equal to -cdist)

Falls back to the XLA formulation for shapes that don't tile.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_N = 256
TILE_K = 1024


def _vq_argmax_kernel(x_ref, e_ref, bias_ref, idx_ref, best_ref):
    """Grid (n_tiles, k_tiles). x (TILE_N, D); e (TILE_K, D); bias (1, TILE_K);
    idx out (TILE_N, 1); best scratch (TILE_N, 1) persists across the K loop."""
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        best_ref[:] = jnp.full_like(best_ref, -jnp.inf)
        idx_ref[:] = jnp.zeros_like(idx_ref)

    scores = jnp.dot(x_ref[:], e_ref[:].T,
                     preferred_element_type=jnp.float32)
    scores = scores + bias_ref[:]  # (TILE_N, TILE_K)

    local_best = jnp.max(scores, axis=1, keepdims=True)
    local_idx = jnp.argmax(scores, axis=1)[:, None].astype(jnp.int32)
    global_idx = local_idx + k * TILE_K

    improved = local_best > best_ref[:]
    idx_ref[:] = jnp.where(improved, global_idx, idx_ref[:])
    best_ref[:] = jnp.where(improved, local_best, best_ref[:])


def _pad_to(x, n, axis, value=0.0):
    pad = n - x.shape[axis]
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=value)


def vq_nearest_pallas(flatten: jax.Array, embed: jax.Array,
                      bias: Optional[jax.Array] = None,
                      interpret: bool = False) -> jax.Array:
    """argmax_k (flatten @ embed.T + bias). flatten (N, D) f32, embed (K, D)
    f32, bias (K,) or None. Returns (N,) int32."""
    n, d = flatten.shape
    k = embed.shape[0]
    n_pad = -(-n // TILE_N) * TILE_N
    k_pad = -(-k // TILE_K) * TILE_K

    x = _pad_to(flatten.astype(jnp.float32), n_pad, 0)
    e = _pad_to(embed.astype(jnp.float32), k_pad, 0)
    if bias is None:
        bias = jnp.zeros((k,), jnp.float32)
    # padded codes must never win
    b = _pad_to(bias.astype(jnp.float32), k_pad, 0, value=-jnp.inf)
    b = b.reshape(1, k_pad)

    grid = (n_pad // TILE_N, k_pad // TILE_K)
    idx = pl.pallas_call(
        _vq_argmax_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE_N, d), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_K, d), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE_K), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE_N, 1), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, 1), jnp.int32),
        scratch_shapes=[pltpu.VMEM((TILE_N, 1), jnp.float32)],
        interpret=interpret,
    )(x, e, b)
    return idx[:n, 0]


def vq_nearest_cosine(flatten: jax.Array, embed_normed: jax.Array,
                      interpret: bool = False) -> jax.Array:
    """Cosine metric: caller pre-l2-normalizes both sides
    (reference: models/l2_quantize.py:403-411)."""
    return vq_nearest_pallas(flatten, embed_normed, None, interpret=interpret)


def vq_nearest_euclidean(flatten: jax.Array, embed: jax.Array,
                         interpret: bool = False) -> jax.Array:
    """Euclidean metric via the rank-equal expansion 2 x.e - ||e||^2."""
    e2 = jnp.sum(embed * embed, axis=-1)
    return vq_nearest_pallas(2.0 * flatten, embed, -e2, interpret=interpret)
