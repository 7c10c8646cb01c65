"""Whole-decode-step CAT kernel: all transformer layers in ONE Pallas launch.

Profiling the XLA token loop (models/decode_engine.py docstring, ROADMAP)
shows autoregressive decode is launch/latency-bound: ~0.8 ms/token of weight
slice staging copies plus ~0.6 ms of tiny LayerNorm fusions, against a
~0.74 ms/token int8 weight-streaming floor. Per-matmul and even per-layer
Pallas kernels LOSE because each pallas_call costs ~30 us on this backend.
This kernel runs the entire L-layer stack for one token in a single launch:

* grid (L, n_phases): the first phases stream the packed self/cross
  projection tiles and run attention; the remaining phases stream the FFN
  tiles with the folded mid-LayerNorm algebra of ops/ffn_int8.py. The Pallas
  pipeline double-buffers every weight tile DMA behind compute.
* every large projection is int8 with per-output-channel scales, packed into
  ONE (L, T, d, w) tile array so only three weight streams (attn tiles, fc1
  tiles, fc2 tiles) are resident in VMEM at a time.
* the KV cache block rides in/out of VMEM per layer and is updated in-kernel
  (a masked row select — Mosaic cannot store at a dynamic sublane index).
* attention runs in a head-major (H*8, dh) staging layout, 8 batch rows per
  group: scores for a whole group come from one (H*8, 8*M) MXU matmul with
  off-block entries masked to -inf before the softmax (multi-query attention
  makes the x8 score waste free at these sizes). The inverse layout change
  is folded into the out-projection: the attention output og (H*8, dh) is
  lane-tiled and masked into P (H*8, d) with og in each row's own head block
  and zeros elsewhere, so P @ Wo_tile followed by a sublane (H, 8, w)
  reshape-sum lands directly in batch-major rows. Lane-splitting reshapes
  ((rows, H*dh) -> (rows, H, dh)) never occur — Mosaic cannot lower them.

The hidden state x is carried across all grid steps in a VMEM scratch in
f32. The sampling head (final norm, tied-embedding logits, CFG mixing,
top-k/top-p, gumbel) stays in XLA — it is a handful of ops per token.

Serving-only (int8 is lossy); the reference sampler has no such mode.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e9
G = 8  # batch rows per attention group


def _quantize_cols(w):
    """(K, N) -> int8 with per-column scales (matches ops/int8_matmul)."""
    w = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(w), axis=0, keepdims=True)
    scale = jnp.where(amax > 0, amax / 127.0, 1.0)
    wq = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    return wq, scale


def plan(cfg):
    """Static tiling plan from the GPT config."""
    d = cfg.n_embed
    inner = cfg.n_head * cfg.dim_head
    f = 4 * d
    w = min(512, inner, d)
    assert d % 128 == 0 and inner % w == 0 and d % w == 0 and f % w == 0
    nq = inner // w   # tiles per to_q
    no = d // w       # tiles per to_out
    n_attn = 2 * (nq + no)
    n_ff = f // w
    return dict(d=d, inner=inner, f=f, w=w, nq=nq, no=no,
                n_attn=n_attn, n_ff=n_ff, n_phase=n_attn + n_ff)


def supports(cfg, rows: int) -> bool:
    try:
        p = plan(cfg)
    except AssertionError:
        return False
    inner = cfg.n_head * cfg.dim_head
    return (rows % G == 0 and inner <= cfg.n_embed
            and cfg.dim_head % 64 == 0 and p["w"] % cfg.dim_head == 0)


def prepare_fused_decode(gpt_params, cfg) -> dict:
    """Pack all large projections into int8 tile arrays.

    attn tiles (L, T, d, w): [to_q_self x nq | to_out_self x no (K zero-padded
    from `inner` to d) | to_q_cross x nq | to_out_cross x no], with matching
    (L, T, 1, w) scales. FFN uses the folded-gamma algebra of ffn_int8."""
    p = plan(cfg)
    d, w = p["d"], p["w"]
    blocks = gpt_params["blocks"]

    def pack_layer(sa_q, sa_o, ca_q, ca_o):
        tiles, scales = [], []
        for mat in (sa_q, sa_o, ca_q, ca_o):
            k = mat.shape[0]
            if k < d:
                mat = jnp.pad(mat, ((0, d - k), (0, 0)))
            for j in range(mat.shape[1] // w):
                wq, s = _quantize_cols(mat[:, j * w:(j + 1) * w])
                tiles.append(wq)
                scales.append(s)
        return jnp.stack(tiles), jnp.stack(scales)

    attn_t, attn_s = jax.vmap(pack_layer)(
        blocks["self_attn"]["to_q"]["kernel"],
        blocks["self_attn"]["to_out"]["kernel"],
        blocks["cross_attn"]["to_q"]["kernel"],
        blocks["cross_attn"]["to_out"]["kernel"])

    def pack_ffn(w1, gmid, w2):
        w2f = gmid[:, None].astype(jnp.float32) * w2.astype(jnp.float32)
        w1q, s1 = _quantize_cols(w1)
        w2q, s2 = _quantize_cols(w2f)
        c2 = jnp.sum(w2q.astype(jnp.float32), axis=0, keepdims=True) * s2
        return w1q, s1, w2q, s2, c2

    ff = blocks["ff"]
    w1q, s1, w2q, s2, c2 = jax.vmap(pack_ffn)(
        ff["fc1"]["kernel"], ff["norm_mid"]["ln"]["scale"],
        ff["fc2"]["kernel"])

    norms = jnp.stack([
        blocks["self_attn"]["norm"]["ln"]["scale"],
        blocks["self_attn"]["out_norm"]["ln"]["scale"],
        blocks["cross_attn"]["norm"]["ln"]["scale"],
        blocks["cross_attn"]["out_norm"]["ln"]["scale"],
        ff["norm_in"]["ln"]["scale"],
    ], axis=1)  # (L, 5, d)

    return dict(
        attn_t=attn_t, attn_s=attn_s,
        wkv=blocks["self_attn"]["to_kv"]["kernel"].astype(jnp.bfloat16),
        null_s=blocks["self_attn"]["null_kv"].astype(jnp.float32)[:, None, :],
        w1q=w1q, s1=s1, w2q=w2q, s2=s2, c2=c2, norms=norms)


def _ln_rows(x, scale, eps=1e-5):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * scale


def _attend_group(qg, kv_g, m, bias_rows=None, bias_cols=None):
    """qg (H*G, dh) head-major; kv_g (G*m, dh) flattened group kv.
    Returns og (H*G, dh) f32. Only entries with (row % G) == (col // m)
    are real (each batch row attends its own kv); the rest are masked.

    bias_rows (H*G, m): per-(head,row) bias, lane-tiled G times in here.
    bias_cols (1, G*m): per-kv-slot bias (cross text mask)."""
    scores = jax.lax.dot_general(
        qg.astype(jnp.bfloat16), kv_g, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)            # (H*G, G*m)
    rows_i = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 0)
    cols_i = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
    if bias_rows is not None:
        scores = scores + jnp.concatenate([bias_rows] * G, axis=1)
    if bias_cols is not None:
        scores = scores + bias_cols
    keep = (rows_i % G) == (cols_i // m)
    scores = jnp.where(keep, scores, NEG_INF)
    probs = jax.nn.softmax(scores, axis=-1)
    return jax.lax.dot_general(
        probs.astype(kv_g.dtype), kv_g, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)            # (H*G, dh)


def _stage_p(og, d, inner, dh):
    """Fold the head-major attention output into the out-projection input:
    P (H*G, d) with og's dh values in each row's own head block, zeros
    elsewhere — P @ Wo_tile then an (H, G, w) reshape-sum is batch-major."""
    n_rep = d // dh
    tiled = jnp.concatenate([og] * n_rep, axis=1)      # (H*G, d)
    rows_i = jax.lax.broadcasted_iota(jnp.int32, tiled.shape, 0)
    cols_i = jax.lax.broadcasted_iota(jnp.int32, tiled.shape, 1)
    return jnp.where(cols_i // dh == rows_i // G, tiled, 0.0)


def _decode_kernel(pos_ref, x_ref, cross_kv_ref, cbias_ref, sbias_ref,
                   attn_t_ref, attn_s_ref, wkv_ref, null_ref, norms_ref,
                   w1_ref, s1_ref, w2_ref, s2_ref, c2_ref, cache_in_ref,
                   x_out_ref, cache_out_ref,
                   x_st, xn_st, q2_st, p_st, of_st, acc_st, m1_st, m2_st,
                   *, p: dict, rows: int, heads: int, dh: int, seq: int,
                   m_cross: int, eps: float = 1e-5):
    l = pl.program_id(0)
    s = pl.program_id(1)
    d, inner, w, nq, no = p["d"], p["inner"], p["w"], p["nq"], p["no"]
    n_attn, n_ff = p["n_attn"], p["n_ff"]
    pos = pos_ref[0, 0]
    ng = rows // G
    hpt = w // dh  # heads per projection tile

    SA_Q_END = nq
    SA_O_END = nq + no
    CA_Q_END = 2 * nq + no
    CA_O_END = n_attn

    @pl.when(jnp.logical_and(l == 0, s == 0))
    def _():
        x_st[:] = x_ref[:].astype(jnp.float32)

    def q_tiles_to_head_major(qt, tile_idx):
        """qt (rows, w) -> q2_st[g, (tile_idx*hpt+hh)*G:(+G), :] slices."""
        for hh in range(hpt):
            chunk = qt[:, hh * dh:(hh + 1) * dh]       # (rows, dh)
            q2_st[:, pl.ds((tile_idx * hpt + hh) * G, G), :] = (
                chunk.reshape(ng, G, dh))

    def out_tiles_from_p(j, scale_w):
        """of[:, j*w:(j+1)*w] = sum_h P @ Wo_tile, per group."""
        tile = attn_t_ref[0, 0].astype(jnp.bfloat16)   # (d, w)
        for g in range(ng):
            part = jax.lax.dot_general(
                p_st[g], tile, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)    # (H*G, w)
            part = jnp.sum(part.reshape(heads, G, w), axis=0)
            of_st[pl.ds(g * G, G), pl.ds(j * w, w)] = part * scale_w

    # ---------------- self-attention: q/kv projection ----------------
    @pl.when(s < SA_Q_END)
    def _():
        @pl.when(s == 0)
        def _():
            xn_st[:] = _ln_rows(x_st[:], norms_ref[0, 0].astype(jnp.float32),
                                eps).astype(jnp.bfloat16)
            kv_t = jnp.dot(xn_st[:], wkv_ref[0],
                           preferred_element_type=jnp.float32)
            rowsel = (jax.lax.broadcasted_iota(jnp.int32, (1, seq, 1), 1)
                      == pos)
            cache_out_ref[0] = jnp.where(
                rowsel, kv_t[:, None, :].astype(cache_out_ref.dtype),
                cache_in_ref[0])
        qt = jnp.dot(xn_st[:], attn_t_ref[0, 0].astype(jnp.bfloat16),
                     preferred_element_type=jnp.float32)
        qt = qt * attn_s_ref[0, 0, 0] * (dh ** -0.5)
        q_tiles_to_head_major(qt, s)

    # ---------------- self-attention + out projection ----------------
    @pl.when(jnp.logical_and(s >= SA_Q_END, s < SA_O_END))
    def _():
        @pl.when(s == SA_Q_END)
        def _():
            cache = cache_out_ref[0]                   # (rows, seq, dh) bf16
            null = jnp.broadcast_to(
                null_ref[0].astype(cache.dtype)[None], (rows, 1, dh))
            m_pad = -(-(seq + 1) // G) * G
            pad = jnp.zeros((rows, m_pad - (seq + 1), dh), cache.dtype)
            # pad the kv axis to a sublane multiple: Mosaic cannot merge
            # (G, m, dh) -> (G*m, dh) unless m is 8-aligned; the pad slots
            # carry -inf bias (sbias is pre-padded outside)
            kv = jnp.concatenate([null, cache, pad], axis=1)
            bias_rows = sbias_ref[0].astype(jnp.float32)   # (H*G, m_pad)
            for g in range(ng):
                kv_g = kv[g * G:(g + 1) * G].reshape(G * m_pad, dh)
                og = _attend_group(q2_st[g], kv_g, m_pad,
                                   bias_rows=bias_rows)
                p_st[g] = _stage_p(og, d, inner, dh).astype(p_st.dtype)
        out_tiles_from_p(s - SA_Q_END, attn_s_ref[0, 0, 0])

        @pl.when(s == SA_O_END - 1)
        def _():
            x_st[:] += _ln_rows(of_st[:],
                                norms_ref[0, 1].astype(jnp.float32), eps)

    # ---------------- cross-attention: q projection ----------------
    @pl.when(jnp.logical_and(s >= SA_O_END, s < CA_Q_END))
    def _():
        @pl.when(s == SA_O_END)
        def _():
            xn_st[:] = _ln_rows(x_st[:], norms_ref[0, 2].astype(jnp.float32),
                                eps).astype(jnp.bfloat16)
        qt = jnp.dot(xn_st[:], attn_t_ref[0, 0].astype(jnp.bfloat16),
                     preferred_element_type=jnp.float32)
        qt = qt * attn_s_ref[0, 0, 0] * (dh ** -0.5)
        q_tiles_to_head_major(qt, s - SA_O_END)

    # ---------------- cross-attention + out projection ----------------
    @pl.when(jnp.logical_and(s >= CA_Q_END, s < CA_O_END))
    def _():
        @pl.when(s == CA_Q_END)
        def _():
            kv = cross_kv_ref[0].astype(jnp.bfloat16)  # (rows, m_c, dh)
            for g in range(ng):
                kv_g = kv[g * G:(g + 1) * G].reshape(G * m_cross, dh)
                og = _attend_group(q2_st[g], kv_g, m_cross,
                                   bias_cols=cbias_ref[g].astype(jnp.float32))
                p_st[g] = _stage_p(og, d, inner, dh).astype(p_st.dtype)
        out_tiles_from_p(s - CA_Q_END, attn_s_ref[0, 0, 0])

        @pl.when(s == CA_O_END - 1)
        def _():
            x_st[:] += _ln_rows(of_st[:],
                                norms_ref[0, 3].astype(jnp.float32), eps)
            xn_st[:] = _ln_rows(x_st[:], norms_ref[0, 4].astype(jnp.float32),
                                eps).astype(jnp.bfloat16)
            acc_st[:] = jnp.zeros_like(acc_st)
            m1_st[:] = jnp.zeros_like(m1_st)
            m2_st[:] = jnp.zeros_like(m2_st)

    # ---------------- feed-forward tiles ----------------
    @pl.when(s >= n_attn)
    def _():
        h = jnp.dot(xn_st[:], w1_ref[0].astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32)
        h = h * s1_ref[0, 0]
        h = jax.nn.gelu(h, approximate=True)
        m1_st[:] += jnp.sum(h, axis=-1, keepdims=True)
        m2_st[:] += jnp.sum(h * h, axis=-1, keepdims=True)
        acc_st[:] += jnp.dot(h.astype(jnp.bfloat16),
                             w2_ref[0].astype(jnp.bfloat16),
                             preferred_element_type=jnp.float32)

        @pl.when(s == n_attn + n_ff - 1)
        def _():
            f = p["f"]
            mu = m1_st[:] / f
            var = jnp.maximum(m2_st[:] / f - mu * mu, 0.0)
            inv = jax.lax.rsqrt(var + eps)
            x_st[:] += inv * (acc_st[:] * s2_ref[0, 0] - mu * c2_ref[0, 0])
            x_out_ref[:] = x_st[:].astype(x_out_ref.dtype)


def decode_step_fused(x, pos, caches, cross_kv, cross_bias, rel_rows,
                      fused: dict, cfg, interpret: bool = False):
    """One token step through all layers.

    x (rows, d) bf16; pos () int32; caches (L, rows, S, dh) bf16;
    cross_kv (L, rows, M, dh) bf16 (slot 0 = null kv); cross_bias (rows, M)
    f32 (0 / -1e9); rel_rows (L, H, S+1) f32 (this position's rel-pos bias
    row per layer, col 0 = null). Returns (x_new, caches_new)."""
    p = plan(cfg)
    d, w, n_attn, n_ff = p["d"], p["w"], p["n_attn"], p["n_ff"]
    L = cfg.n_layer
    rows = x.shape[0]
    heads, dh = cfg.n_head, cfg.dim_head
    seq = caches.shape[2]
    m_cross = cross_kv.shape[2]
    n_phase = p["n_phase"]

    def attn_tile_idx(l, s):
        return (l, jnp.clip(s, 0, n_attn - 1), 0, 0)

    def ff1_idx(l, s):
        return (l, 0, jnp.clip(s - n_attn, 0, n_ff - 1))

    def ff2_idx(l, s):
        return (l, jnp.clip(s - n_attn, 0, n_ff - 1), 0)

    ng = rows // G
    # self bias (rel-pos row + causal), expanded to head-major rows in XLA
    # ((L, H, S+1) -> (L, H*G, m_pad)); Mosaic has no sublane repeat, and the
    # kv axis is padded to a sublane multiple with -inf bias slots
    m_self_pad = -(-(seq + 1) // G) * G
    cols = jnp.arange(seq + 1)[None, :]
    causal = jnp.where((cols <= pos + 1) | (cols == 0), 0.0, NEG_INF)
    sbias = jnp.pad(rel_rows + causal[None],
                    ((0, 0), (0, 0), (0, m_self_pad - (seq + 1))),
                    constant_values=NEG_INF)
    sbias = jnp.repeat(sbias, G, axis=1)
    # cross: pad kv slots to a sublane multiple, flatten the per-group bias
    m_cross_pad = -(-m_cross // G) * G
    cross_kv = jnp.pad(cross_kv, ((0, 0), (0, 0),
                                  (0, m_cross_pad - m_cross), (0, 0)))
    cbias = jnp.pad(cross_bias, ((0, 0), (0, m_cross_pad - m_cross)),
                    constant_values=NEG_INF).reshape(ng, 1, G * m_cross_pad)
    m_cross = m_cross_pad

    kernel = functools.partial(
        _decode_kernel, p=p, rows=rows, heads=heads, dh=dh, seq=seq,
        m_cross=m_cross)

    x_new, caches_new = pl.pallas_call(
        kernel,
        grid=(L, n_phase),
        in_specs=[
            pl.BlockSpec((1, 1), lambda l, s: (0, 0),
                         memory_space=pltpu.SMEM),              # pos
            pl.BlockSpec((rows, d), lambda l, s: (0, 0),
                         memory_space=pltpu.VMEM),              # x
            pl.BlockSpec((1, rows, m_cross, dh),
                         lambda l, s: (l, 0, 0, 0),
                         memory_space=pltpu.VMEM),              # cross_kv
            pl.BlockSpec((ng, 1, G * m_cross), lambda l, s: (0, 0, 0),
                         memory_space=pltpu.VMEM),              # cross bias
            pl.BlockSpec((1, heads * G, m_self_pad),
                         lambda l, s: (l, 0, 0),
                         memory_space=pltpu.VMEM),              # self bias
            pl.BlockSpec((1, 1, d, w), attn_tile_idx,
                         memory_space=pltpu.VMEM),              # attn tiles
            pl.BlockSpec((1, 1, 1, w), attn_tile_idx,
                         memory_space=pltpu.VMEM),              # attn scales
            pl.BlockSpec((1, d, dh), lambda l, s: (l, 0, 0),
                         memory_space=pltpu.VMEM),              # wkv
            pl.BlockSpec((1, 1, dh), lambda l, s: (l, 0, 0),
                         memory_space=pltpu.VMEM),              # null kv
            pl.BlockSpec((1, 5, d), lambda l, s: (l, 0, 0),
                         memory_space=pltpu.VMEM),              # ln scales
            pl.BlockSpec((1, d, w), ff1_idx,
                         memory_space=pltpu.VMEM),              # w1 tile
            pl.BlockSpec((1, 1, w), ff1_idx,
                         memory_space=pltpu.VMEM),              # s1 tile
            pl.BlockSpec((1, w, d), ff2_idx,
                         memory_space=pltpu.VMEM),              # w2 tile
            pl.BlockSpec((1, 1, d), lambda l, s: (l, 0, 0),
                         memory_space=pltpu.VMEM),              # s2
            pl.BlockSpec((1, 1, d), lambda l, s: (l, 0, 0),
                         memory_space=pltpu.VMEM),              # c2
            pl.BlockSpec((1, rows, seq, dh), lambda l, s: (l, 0, 0, 0),
                         memory_space=pltpu.VMEM),              # cache in
        ],
        out_specs=(
            pl.BlockSpec((rows, d), lambda l, s: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rows, seq, dh), lambda l, s: (l, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((rows, d), x.dtype),
            jax.ShapeDtypeStruct(caches.shape, caches.dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((rows, d), jnp.float32),            # x state
            pltpu.VMEM((rows, d), jnp.bfloat16),           # xn staging
            pltpu.VMEM((rows // G, heads * G, dh), jnp.float32),   # q2
            pltpu.VMEM((rows // G, heads * G, d), jnp.bfloat16),   # P
            pltpu.VMEM((rows, d), jnp.float32),            # out-proj acc
            pltpu.VMEM((rows, d), jnp.float32),            # ffn acc
            pltpu.VMEM((rows, 1), jnp.float32),            # m1
            pltpu.VMEM((rows, 1), jnp.float32),            # m2
        ],
        interpret=interpret,
    )(jnp.asarray(pos, jnp.int32).reshape(1, 1), x, cross_kv, cbias,
      sbias, fused["attn_t"], fused["attn_s"], fused["wkv"],
      fused["null_s"], fused["norms"], fused["w1q"], fused["s1"],
      fused["w2q"], fused["s2"], fused["c2"], caches)
    return x_new, caches_new
