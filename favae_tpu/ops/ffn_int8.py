"""Fused int8 feed-forward block for CAT decode (Pallas TPU kernel).

One launch per layer per token computes the whole FeedForward block
(reference: gpt_ca.py:140-148 — LN -> fc1 -> GELU -> LN -> fc2 -> residual)
with both projection matrices streamed as int8 tiles. The FF holds ~75% of a
CAT layer's weight bytes, and the XLA decode path additionally pays a
per-token staging copy for each weight slice plus two separate (rows, dim)
LayerNorm reductions; here everything happens in VMEM in a single pass.

The mid LayerNorm would be a barrier (fc2 needs the full normalized h1), but
it folds away: with W2' := gamma_mid[:, None] * W2 and c := colsum(W2'),

    fc2(LN(h1)) = inv * (h1 @ W2' - mu * c)

where (mu, inv) are h1's row stats — so the kernel accumulates `h1 @ W2'`
tile-by-tile (grid-pipelined weight DMA) together with h1's running
sum/sum-of-squares, and applies the correction once after the last tile.

Used by the quantized serving sampler (models/decode_engine.py); the exact
bf16 path is unaffected. No reference analogue (the torch sampler has no
quantized mode).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from favae_tpu.ops.int8_matmul import quantize_weight

TILE = 512


def prepare_ffn_weights(w1, gamma_mid, w2):
    """Host/trace-time prep: quantize W1 and gamma-folded W2', plus the
    colsum correction vector. w1 (K, F), w2 (F, K), gamma_mid (F,)."""
    w1q, s1 = quantize_weight(w1)
    w2f = gamma_mid[:, None].astype(jnp.float32) * w2.astype(jnp.float32)
    w2q, s2 = quantize_weight(w2f)
    # colsum of the *dequantized* W2' so the kernel's correction matches the
    # int8 weights exactly
    c = jnp.sum(w2q.astype(jnp.float32), axis=0, keepdims=True) * s2
    return dict(w1q=w1q, s1=s1, w2q=w2q, s2=s2, c=c)


def _ffn_kernel(x_ref, g_in_ref, w1_ref, s1_ref, w2_ref, s2_ref, c_ref,
                y_ref, xn_ref, acc_ref, m1_ref, m2_ref, *, eps: float,
                n_tiles: int):
    j = pl.program_id(0)

    @pl.when(j == 0)
    def _():
        # norm_in once: f32 LayerNorm (learned scale, zero bias)
        xf = x_ref[:].astype(jnp.float32)
        mu = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
        xn = (xf - mu) * jax.lax.rsqrt(var + eps) * g_in_ref[:].astype(
            jnp.float32)
        xn_ref[:] = xn.astype(xn_ref.dtype)
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m1_ref[:] = jnp.zeros_like(m1_ref)
        m2_ref[:] = jnp.zeros_like(m2_ref)

    w1 = w1_ref[:].astype(jnp.bfloat16)
    h = jnp.dot(xn_ref[:], w1, preferred_element_type=jnp.float32)
    h = h * s1_ref[:]
    # tanh-approximate GELU: exact erf has no Pallas TPU lowering; the
    # approximation error (~1e-3 rel) is far below the int8 weight error
    h = jax.nn.gelu(h, approximate=True)
    m1_ref[:] += jnp.sum(h, axis=-1, keepdims=True)
    m2_ref[:] += jnp.sum(h * h, axis=-1, keepdims=True)
    w2 = w2_ref[:].astype(jnp.bfloat16)
    acc_ref[:] += jnp.dot(h.astype(jnp.bfloat16), w2,
                          preferred_element_type=jnp.float32) * s2_ref[:]

    @pl.when(j == n_tiles - 1)
    def _():
        f = n_tiles * w1_ref.shape[1]  # ffn width
        mu = m1_ref[:] / f
        var = jnp.maximum(m2_ref[:] / f - mu * mu, 0.0)
        inv = jax.lax.rsqrt(var + eps)
        out = inv * (acc_ref[:] - mu * c_ref[:])
        y_ref[:] = (x_ref[:].astype(jnp.float32) + out).astype(y_ref.dtype)


def ffn_block_int8(x: jax.Array, gamma_in: jax.Array, prep: dict, *,
                   eps: float = 1e-5, interpret: bool = False) -> jax.Array:
    """x (rows, K) bf16 -> LN(gamma_in) -> int8 fc1 -> GELU -> folded mid-LN
    -> int8 fc2 -> + x. Returns (rows, K) in x.dtype."""
    rows, k = x.shape
    f = prep["w1q"].shape[1]
    tile = min(TILE, f)
    assert f % tile == 0, (f, tile)
    n_tiles = f // tile

    rows_pad = max(8, -(-rows // 8) * 8)
    xp = jnp.pad(x, ((0, rows_pad - rows), (0, 0))) if rows_pad != rows else x

    y = pl.pallas_call(
        functools.partial(_ffn_kernel, eps=eps, n_tiles=n_tiles),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((rows_pad, k), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),       # x
            pl.BlockSpec((1, k), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),       # gamma_in
            pl.BlockSpec((k, tile), lambda j: (0, j),
                         memory_space=pltpu.VMEM),       # w1q tile
            pl.BlockSpec((1, tile), lambda j: (0, j),
                         memory_space=pltpu.VMEM),       # s1 tile
            pl.BlockSpec((tile, k), lambda j: (j, 0),
                         memory_space=pltpu.VMEM),       # w2q tile
            pl.BlockSpec((1, k), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),       # s2
            pl.BlockSpec((1, k), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),       # c
        ],
        out_specs=pl.BlockSpec((rows_pad, k), lambda j: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows_pad, k), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((rows_pad, k), jnp.bfloat16),     # xn
            pltpu.VMEM((rows_pad, k), jnp.float32),      # acc
            pltpu.VMEM((rows_pad, 1), jnp.float32),      # m1
            pltpu.VMEM((rows_pad, 1), jnp.float32),      # m2
        ],
        interpret=interpret,
    )(xp, gamma_in.reshape(1, k), prep["w1q"], prep["s1"], prep["w2q"],
      prep["s2"], prep["c"])
    return y[:rows]
