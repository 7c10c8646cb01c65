"""Weight-only int8 matmul for the CAT decode path (Pallas TPU kernel).

Autoregressive decode of gpt2_medium (1536 wide, 24 layers) is bound by
weight streaming: ~1.4 GB of bf16 weights per token -> a ~1.7 ms/token
roofline on one v5e chip. Quantizing the big projection matrices to int8
(per-output-channel scales) halves the bytes per token; the dequantize
happens in VMEM inside the kernel so the bf16 copy never exists in HBM.
XLA cannot express this: a `wq.astype(bf16)` in the graph is loop-invariant
and gets hoisted out of the token scan, materializing the full bf16 weights.

Used by the opt-in quantized sampler (models/gpt.py sample(..., use int8
path via CATModel.sample_images(quantized=True)); the exact bf16 path stays
the default and the KV-cache equivalence tests pin it.

reference: the torch sampler (gpt_ca.py:343-367) has no quantized path —
this is a TPU-serving addition, not a parity surface.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_N = 512


def quantize_weight(w: jax.Array):
    """Per-output-channel symmetric int8 quantization of a (K, N) matrix.
    Returns (wq int8 (K, N), scale f32 (1, N))."""
    w = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(w), axis=0, keepdims=True)
    scale = jnp.where(amax > 0, amax / 127.0, 1.0)
    wq = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    return wq, scale


def _matmul_kernel(x_ref, wq_ref, s_ref, o_ref):
    xf = x_ref[:]                                     # (M, K) bf16
    wf = wq_ref[:].astype(jnp.bfloat16)               # (K, TN) dequant in VMEM
    acc = jnp.dot(xf, wf, preferred_element_type=jnp.float32)
    o_ref[:] = (acc * s_ref[:]).astype(o_ref.dtype)


def matmul_int8(x: jax.Array, wq: jax.Array, scale: jax.Array,
                out_dtype=jnp.bfloat16, interpret: bool = False) -> jax.Array:
    """x (M, K) bf16/f32 @ dequant(wq (K, N), scale (1, N)) -> (M, N).

    M is padded to the sublane minimum; N must be a multiple of 128 (all CAT
    projection widths are). K is kept whole — at gpt2 sizes a (K, TILE_N)
    int8 tile is <= 3 MB of VMEM and the grid pipelines the weight DMA."""
    m, k = x.shape
    k2, n = wq.shape
    assert k == k2 and scale.shape == (1, n)
    tile_n = min(TILE_N, n)
    assert n % tile_n == 0, (n, tile_n)

    m_pad = max(8, -(-m // 8) * 8)
    if m_pad != m:
        x = jnp.pad(x, ((0, m_pad - m), (0, 0)))

    out = pl.pallas_call(
        _matmul_kernel,
        grid=(n // tile_n,),
        in_specs=[
            pl.BlockSpec((m_pad, k), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, tile_n), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_n), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((m_pad, tile_n), lambda j: (0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m_pad, n), jnp.dtype(out_dtype)),
        interpret=interpret,
    )(x.astype(jnp.bfloat16), wq, scale.astype(jnp.float32))
    return out[:m]
