"""Fused GroupNorm(+SiLU) as Pallas TPU kernels with a custom VJP.

The FA-VAE train step is HBM-bandwidth-bound and the profiler shows ~20% of
device time in GroupNorm convert+reduce fusions (bf16 activations promoted to
f32, reduced, normalized, converted back). These kernels stream bf16 row
chunks of the (N, H*W, C) activation through VMEM once per pass, accumulate
the statistics in f32 registers, and fuse the normalize + affine + SiLU into
a single elementwise pass — the f32 copies of the activation never exist in
HBM.

Semantics match flax.linen.GroupNorm exactly (fast variance
E[x^2] - E[x]^2 in f32, negative variance clipped to 0, eps inside rsqrt
— flax/linen/normalization.py::_compute_stats/_normalize), followed by an
optional SiLU, as used by every codec block
(reference: models/codec.py:34-122 `Normalize` + `nonlinearity`).

HBM traffic per forward: 2 reads of x + 1 write of y (stats pass + apply
pass). Backward: 2 reads of (x, dy) + 1 write of dx. All cross-group /
cross-batch reductions happen on (N, C) f32 arrays in plain XLA — they are
a few KB.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# target bytes for one (R, C) row-chunk of x in VMEM (double-buffered by the
# pallas pipeline; backward holds three such chunks: x, dy, dx)
_CHUNK_BYTES = 1 << 20


def _row_chunk(hw: int, c: int, itemsize: int) -> int:
    """Largest power-of-2 divisor of hw with chunk size <= _CHUNK_BYTES."""
    r = 1
    while (hw % (r * 2) == 0) and (r * 2 * c * itemsize <= _CHUNK_BYTES):
        r *= 2
    return r


def can_fuse_group_norm(shape, num_groups: int, itemsize: int = 2) -> bool:
    """Static shape gate for the Pallas path: NHWC with a lane-aligned channel
    dim and power-of-2-chunkable spatial extent. `itemsize` must match the
    input dtype (2 = bf16 default) — the kernel computes its row chunk from
    the real dtype, so the gate has to validate the same chunk size."""
    if len(shape) != 4:
        return False
    n, h, w, c = shape
    hw = h * w
    return (c % 128 == 0 and c % num_groups == 0
            and _row_chunk(hw, c, itemsize) >= 8)


def _silu_grad_from(ypre, dy):
    s = jax.nn.sigmoid(ypre)
    return dy * s * (1.0 + ypre * (1.0 - s))


# ---------------------------------------------------------------------------
# kernels (grid = (N, K) over row chunks of the (N, HW, C) view)
# ---------------------------------------------------------------------------

def _stats_kernel(x_ref, s1_ref, s2_ref):
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        s1_ref[:] = jnp.zeros_like(s1_ref)
        s2_ref[:] = jnp.zeros_like(s2_ref)

    xf = x_ref[0].astype(jnp.float32)
    s1_ref[0] += jnp.sum(xf, axis=0, keepdims=True)
    s2_ref[0] += jnp.sum(xf * xf, axis=0, keepdims=True)


def _apply_kernel(x_ref, a_ref, b_ref, y_ref, *, act: Optional[str]):
    xf = x_ref[0].astype(jnp.float32)
    y = xf * a_ref[0] + b_ref[0]
    if act == "silu":
        y = y * jax.nn.sigmoid(y)
    y_ref[0] = y.astype(y_ref.dtype)


def _bwd_sums_kernel(x_ref, dy_ref, a_ref, b_ref, p_ref, q_ref,
                     gs_ref, gx_ref, *, act: Optional[str]):
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        gs_ref[:] = jnp.zeros_like(gs_ref)
        gx_ref[:] = jnp.zeros_like(gx_ref)

    xf = x_ref[0].astype(jnp.float32)
    dyf = dy_ref[0].astype(jnp.float32)
    if act == "silu":
        g = _silu_grad_from(xf * a_ref[0] + b_ref[0], dyf)
    else:
        g = dyf
    xhat = xf * p_ref[0] + q_ref[0]
    gs_ref[0] += jnp.sum(g, axis=0, keepdims=True)
    gx_ref[0] += jnp.sum(g * xhat, axis=0, keepdims=True)


def _bwd_dx_kernel(x_ref, dy_ref, a_ref, b_ref, c1_ref, c2_ref, c3_ref,
                   dx_ref, *, act: Optional[str]):
    xf = x_ref[0].astype(jnp.float32)
    dyf = dy_ref[0].astype(jnp.float32)
    if act == "silu":
        g = _silu_grad_from(xf * a_ref[0] + b_ref[0], dyf)
    else:
        g = dyf
    dx = c1_ref[0] * g + c2_ref[0] + c3_ref[0] * xf
    dx_ref[0] = dx.astype(dx_ref.dtype)


# ---------------------------------------------------------------------------
# host-side orchestration
# ---------------------------------------------------------------------------

def _x_spec(r, c):
    return pl.BlockSpec((1, r, c), lambda n, k: (n, k, 0),
                        memory_space=pltpu.VMEM)


def _vec_spec(c):
    # per-batch (N, 1, C) coefficient rows, broadcast over the chunk's rows;
    # (1, 1, C) keeps the last-two block dims equal to the array dims
    return pl.BlockSpec((1, 1, c), lambda n, k: (n, 0, 0),
                        memory_space=pltpu.VMEM)


def _col_stats(x3, r, interpret):
    """(N, 1, C) f32 per-channel sum and sum-of-squares in one streaming pass."""
    n, hw, c = x3.shape
    grid = (n, hw // r)
    return pl.pallas_call(
        _stats_kernel,
        grid=grid,
        in_specs=[_x_spec(r, c)],
        out_specs=(_vec_spec(c), _vec_spec(c)),
        out_shape=(jax.ShapeDtypeStruct((n, 1, c), jnp.float32),
                   jax.ShapeDtypeStruct((n, 1, c), jnp.float32)),
        interpret=interpret,
    )(x3)


def _affine_from_stats(s1, s2, scale, bias, num_groups, hw, eps):
    """Fold group statistics into per-channel affine vectors a, b (so the
    apply pass is y = act(x*a + b)), plus (mu_c, inv_c) for the backward.
    All vectors are (N, 1, C)."""
    n, _, c = s1.shape
    cg = c // num_groups
    m = hw * cg
    gs1 = s1.reshape(n, num_groups, cg).sum(-1)
    gs2 = s2.reshape(n, num_groups, cg).sum(-1)
    mean = gs1 / m
    var = jnp.maximum(gs2 / m - mean * mean, 0.0)
    inv = jax.lax.rsqrt(var + eps)
    mu_c = jnp.repeat(mean, cg, axis=1).reshape(n, 1, c)
    inv_c = jnp.repeat(inv, cg, axis=1).reshape(n, 1, c)
    a = inv_c * scale[None, None, :].astype(jnp.float32)
    b = bias[None, None, :].astype(jnp.float32) - mu_c * a
    return a, b, mu_c, inv_c


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def _gn_act_pallas(x, scale, bias, num_groups, eps, act, out_dtype, interpret):
    y, _ = _gn_act_fwd(x, scale, bias, num_groups, eps, act, out_dtype,
                       interpret)
    return y


def _gn_act_fwd(x, scale, bias, num_groups, eps, act, out_dtype, interpret):
    n, h, w, c = x.shape
    hw = h * w
    x3 = x.reshape(n, hw, c)
    r = _row_chunk(hw, c, x3.dtype.itemsize)
    s1, s2 = _col_stats(x3, r, interpret)
    a, b, mu_c, inv_c = _affine_from_stats(s1, s2, scale, bias, num_groups,
                                           hw, eps)
    y = pl.pallas_call(
        functools.partial(_apply_kernel, act=act),
        grid=(n, hw // r),
        in_specs=[_x_spec(r, c), _vec_spec(c), _vec_spec(c)],
        out_specs=_x_spec(r, c),
        out_shape=jax.ShapeDtypeStruct((n, hw, c), out_dtype),
        interpret=interpret,
    )(x3, a, b).reshape(n, h, w, c)
    return y, (x, scale, a, b, mu_c, inv_c)


def _gn_act_bwd(num_groups, eps, act, out_dtype, interpret, residuals, dy):
    x, scale, a, b, mu_c, inv_c = residuals
    n, h, w, c = x.shape
    hw = h * w
    cg = c // num_groups
    m = hw * cg
    x3 = x.reshape(n, hw, c)
    dy3 = dy.reshape(n, hw, c)
    r = _row_chunk(hw, c, x3.dtype.itemsize)
    p = inv_c
    q = -mu_c * inv_c

    gs, gx = pl.pallas_call(
        functools.partial(_bwd_sums_kernel, act=act),
        grid=(n, hw // r),
        in_specs=[_x_spec(r, c), _x_spec(r, c)] + [_vec_spec(c)] * 4,
        out_specs=(_vec_spec(c), _vec_spec(c)),
        out_shape=(jax.ShapeDtypeStruct((n, 1, c), jnp.float32),
                   jax.ShapeDtypeStruct((n, 1, c), jnp.float32)),
        interpret=interpret,
    )(x3, dy3, a, b, p, q)

    dbias = gs.sum(axis=(0, 1))
    dscale = gx.sum(axis=(0, 1))
    sg = scale[None, None, :].astype(jnp.float32)
    m1 = (sg * gs).reshape(n, num_groups, cg).sum(-1)
    m2 = (sg * gx).reshape(n, num_groups, cg).sum(-1)
    m1_c = jnp.repeat(m1, cg, axis=1).reshape(n, 1, c)
    m2_c = jnp.repeat(m2, cg, axis=1).reshape(n, 1, c)
    c1 = a
    c3 = -(inv_c * inv_c) * m2_c / m
    c2 = -(inv_c * m1_c) / m - c3 * mu_c

    dx = pl.pallas_call(
        functools.partial(_bwd_dx_kernel, act=act),
        grid=(n, hw // r),
        in_specs=[_x_spec(r, c), _x_spec(r, c)] + [_vec_spec(c)] * 5,
        out_specs=_x_spec(r, c),
        out_shape=jax.ShapeDtypeStruct((n, hw, c), x.dtype),
        interpret=interpret,
    )(x3, dy3, a, b, c1, c2, c3)

    return (dx.reshape(n, h, w, c),
            dscale.astype(jnp.float32), dbias.astype(jnp.float32))


_gn_act_pallas.defvjp(_gn_act_fwd, _gn_act_bwd)


def _gn_act_reference(x, scale, bias, num_groups, eps, act, out_dtype):
    """Plain-XLA path numerically identical to flax nn.GroupNorm (+ SiLU on
    the cast output, matching the previous `group_norm(...)(x); nn.silu(...)`
    composition)."""
    n, h, w, c = x.shape
    xf = x.astype(jnp.float32).reshape(n, h * w, num_groups, c // num_groups)
    mean = jnp.mean(xf, axis=(1, 3), keepdims=True)
    var = jnp.maximum(jnp.mean(xf * xf, axis=(1, 3), keepdims=True)
                      - mean * mean, 0.0)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y.reshape(n, h, w, c)
    y = y * scale[None, None, None, :] + bias[None, None, None, :]
    y = y.astype(out_dtype)
    if act == "silu":
        y = jax.nn.silu(y)
    return y


def group_norm_act(x: jax.Array, scale: jax.Array, bias: jax.Array,
                   num_groups: int, *, eps: float = 1e-5,
                   act: Optional[str] = None, out_dtype=None,
                   use_pallas: Optional[bool] = None,
                   interpret: bool = False) -> jax.Array:
    """GroupNorm with optional fused SiLU.

    Default route is the XLA path: profiling the full expe_5 train step showed
    the standalone Pallas kernels LOSE end-to-end (34 vs 51 imgs/s) — XLA keeps
    codec activations in permuted tiled layouts ({3,0,2,1:T(8,128)}) chosen for
    the convolutions and already fuses the normalize+SiLU elementwise chain
    into neighboring ops; a custom-call boundary forces ~200 ms/step of layout
    copies. In isolation the kernels match XLA forward and beat it ~14% on
    fwd+bwd (447 GB/s effective). Set FAVAE_GN_PALLAS=1 (or use_pallas=True)
    to route through them, e.g. for standalone-GN workloads."""
    import os
    out_dtype = out_dtype or x.dtype
    if use_pallas is None:
        use_pallas = (os.environ.get("FAVAE_GN_PALLAS", "0") == "1"
                      and jax.default_backend() == "tpu"
                      and can_fuse_group_norm(x.shape, num_groups,
                                              x.dtype.itemsize))
    if use_pallas:
        return _gn_act_pallas(x, scale, bias, num_groups, eps, act,
                              jnp.dtype(out_dtype), interpret)
    return _gn_act_reference(x, scale, bias, num_groups, eps, act, out_dtype)
