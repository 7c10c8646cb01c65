"""Serving-path CAT sampler: token loop over the scan-stacked GPT params.

`GPT.sample` (models/gpt.py) is the reference-faithful KV-cache sampler; this
module is the TPU serving engine built on the same parameter tree:

* the 24-layer loop is Python-unrolled inside the token `lax.scan`, working
  directly on the `nn.scan`-stacked (L, ...) parameter arrays;
* optionally the six large projection matrices per layer (self/cross to_q,
  to_out, ff fc1/fc2) run through the weight-only int8 Pallas matmul
  (ops/int8_matmul.py). Decode is weight-streaming-bound (~1.4 GB bf16 per
  token for gpt2_medium => ~1.7 ms/token roofline on v5e); int8 halves the
  bytes. XLA alone cannot do this: an `astype` of the quantized weights is
  loop-invariant and gets hoisted out of the scan, rematerializing bf16.

The bf16 engine is pinned token-exact against `GPT.sample`
(tests/test_decode_engine.py); the int8 path is a lossy opt-in
(CATModel.sample_images(quantized=True)) — the reference sampler
(gpt_ca.py:343-367) has no quantized mode, so this is a serving addition,
not a parity surface.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp

from favae_tpu.config import GPTConfig
from favae_tpu.models.gpt import (
    NEG_INF,
    _rel_pos_indices,
    gumbel_sample,
    top_k_top_p_filter,
)
from favae_tpu.ops.ffn_int8 import ffn_block_int8, prepare_ffn_weights


def quantize_decode_params(gpt_params) -> dict:
    """Quantize the feed-forward block of every layer for the fused int8 FFN
    kernel (~75% of a layer's weight bytes). The attention projections stay
    bf16 through XLA: routing them through per-matmul int8 kernels was
    measured SLOWER end-to-end (~144 kernel launches/token at ~6us each eat
    the bandwidth win); the FFN fuses a whole block into one launch/layer.
    Returns {"ffn": pytree of (L, ...)-stacked prep arrays}."""
    blocks = gpt_params["blocks"]
    ff = blocks["ff"]
    prep = jax.vmap(prepare_ffn_weights)(
        ff["fc1"]["kernel"], ff["norm_mid"]["ln"]["scale"],
        ff["fc2"]["kernel"])
    return {"ffn": prep}


def _ln(x, scale, eps=1e-5):
    """FixedBetaLayerNorm: learned scale, zero bias, f32 math
    (reference: gpt_ca.py:102-109)."""
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    return (xf - mu) * jax.lax.rsqrt(var + eps) * scale.astype(jnp.float32)


class _Matmuls:
    """bf16 projection: static per-layer slice of the stacked kernels."""

    def __init__(self, blocks, dtype):
        self.blocks = blocks
        self.dtype = dtype

    def __call__(self, layer: int, mod: str, dense: str, x):
        w = self.blocks[mod][dense]["kernel"][layer].astype(self.dtype)
        return jnp.dot(x.astype(self.dtype), w)


def _attend(q, kv_full, sim_bias_or_mask, heads, dim_head, dtype):
    """q (b, h*dh) against kv_full (b, m, dh) (null kv already prepended).
    sim gets `sim_bias_or_mask` (f32, broadcastable to (b, h, m)) added."""
    b = q.shape[0]
    q = q.reshape(b, heads, dim_head)
    sim = jnp.einsum("bhd,bmd->bhm", q, kv_full).astype(jnp.float32)
    sim = sim + sim_bias_or_mask
    attn = jax.nn.softmax(sim, axis=-1)
    out = jnp.einsum("bhm,bmd->bhd", attn.astype(kv_full.dtype), kv_full)
    return out.reshape(b, heads * dim_head)


def sample_tokens(cfg: GPTConfig, gpt_params, text_embeds, text_mask, *,
                  rng, temperature: float = 1.0, top_k: Optional[int] = None,
                  top_p: float = 1.0, cond_scale: float = 3.0,
                  qparams: Optional[dict] = None,
                  fused: Optional[dict] = None,
                  dtype: Any = jnp.bfloat16,
                  forced_tokens: Optional[jax.Array] = None,
                  return_logits: bool = False) -> jax.Array:
    """CFG sampling loop equivalent to GPT.sample (models/gpt.py:376-429),
    layer loop unrolled over the stacked params. Returns (b, grid, grid).

    `fused` (from ops.decode_step_kernel.prepare_fused_decode) routes every
    token's full layer stack through ONE Pallas launch with int8 weights.

    Quality-audit hooks (scripts/int8_decode_quality.py): `forced_tokens`
    (b, S) teacher-forces the autoregressive context (so two engines see
    identical prefixes and their logits are directly comparable) and
    `return_logits=True` additionally returns the per-position CFG-combined
    logits (b, S, vocab) before top-k/top-p filtering."""
    c = cfg
    p = gpt_params
    blocks = p["blocks"]
    b = text_embeds.shape[0]
    seq_len = c.image_encoded_dim ** 2
    heads, dh = c.n_head, c.dim_head
    mm = _Matmuls(blocks, dtype)
    # interpret mode lets the int8 FFN kernel run (slowly) off-TPU in tests
    interpret = jax.default_backend() != "tpu"

    text_embeds = text_embeds[:, : c.max_text_len].astype(jnp.float32)
    text_mask = text_mask[:, : c.max_text_len]
    ctx2 = jnp.concatenate([text_embeds, text_embeds], 0).astype(dtype)
    mask2 = jnp.concatenate([text_mask, jnp.zeros_like(text_mask)], 0)

    # per-layer cross-attention kv (computed once) + null prepend
    cross_kv = []
    for l in range(c.n_layer):
        kv = jnp.dot(ctx2, blocks["cross_attn"]["to_kv"]["kernel"][l]
                     .astype(dtype))
        null = jnp.broadcast_to(
            blocks["cross_attn"]["null_kv"][l].astype(dtype), (2 * b, 1, dh))
        cross_kv.append(jnp.concatenate([null, kv], axis=1))
    # cross mask bias (static over steps): null slot always visible
    cm = jnp.pad(mask2, ((0, 0), (1, 0)), constant_values=True)
    # (2b, 1, m+1), broadcasts over heads in _attend
    cross_bias = jnp.where(cm[:, None, :], 0.0, NEG_INF).astype(jnp.float32)

    rel_idx = jnp.asarray(_rel_pos_indices(c.image_encoded_dim))  # (S, S)
    axial = (p["axial_width_pos"][None, :, :]
             + p["axial_height_pos"][:, None, :]).reshape(-1, c.n_embed)

    caches = jnp.zeros((c.n_layer, 2 * b, seq_len, dh), dtype)
    scale = dh ** -0.5

    def _embed_step(tok_prev, pos):
        emb_tok = p["tok_emb"]["embedding"][tok_prev] + axial[
            jnp.maximum(pos - 1, 0)]
        start = jnp.broadcast_to(p["start_token"][None, :],
                                 (2 * b, c.n_embed))
        x = jnp.where(pos == 0, start, emb_tok.astype(start.dtype))
        return _ln(x, p["init_norm"]["ln"]["scale"]).astype(dtype)

    def _head(x):
        x = _ln(x, p["final_norm"]["ln"]["scale"])
        emb = p["tok_emb"]["embedding"]  # weight tying
        return jnp.dot(x.astype(jnp.float32), emb.astype(jnp.float32).T)

    if fused is not None:
        from favae_tpu.ops.decode_step_kernel import decode_step_fused
        cross_kv_st = jnp.stack(cross_kv)                 # (L, 2b, m+1, dh)
        cross_bias_rm = cross_bias[:, 0, :]               # (2b, m+1)
        rel_table = blocks["self_attn"]["rel_pos_bias"]["pos_bias"][
            "embedding"]                                  # (L, S^2, heads)

        def step_logits_fused(tok_prev, pos, caches):
            x = _embed_step(tok_prev, pos)
            sel = jax.lax.dynamic_slice(rel_idx, (pos, 0), (1, seq_len))[0]
            rel = rel_table[:, sel, :]                    # (L, S, heads)
            rel_rows = jnp.pad(jnp.transpose(rel, (0, 2, 1)),
                               ((0, 0), (0, 0), (1, 0))).astype(jnp.float32)
            x, caches = decode_step_fused(
                x, pos, caches, cross_kv_st, cross_bias_rm, rel_rows, fused,
                c, interpret=interpret)
            return _head(x), caches

    def step_logits(tok_prev, pos, caches):
        x = _embed_step(tok_prev, pos)

        # self-attention mask bias (cols <= pos; col 0 = null kv, visible)
        cols = jnp.arange(seq_len)
        self_bias = jnp.where(cols[None, :] <= pos, 0.0, NEG_INF)
        self_bias = jnp.pad(self_bias, ((0, 0), (1, 0)))  # null kv col
        new_caches = []
        for l in range(c.n_layer):
            sa = blocks["self_attn"]
            # --- causal self-attention over the KV cache ---
            x_n = _ln(x, sa["norm"]["ln"]["scale"][l]).astype(dtype)
            q = mm(l, "self_attn", "to_q", x_n) * scale
            kv_t = jnp.dot(x_n, sa["to_kv"]["kernel"][l].astype(dtype))
            cache_l = jax.lax.dynamic_update_slice(
                caches[l], kv_t[:, None, :].astype(dtype), (0, pos, 0))
            null = jnp.broadcast_to(sa["null_kv"][l].astype(dtype),
                                    (2 * b, 1, dh))
            kv_full = jnp.concatenate([null, cache_l], axis=1)
            # 2-D relative position bias row at `pos` (null col = 0 bias)
            sel = jax.lax.dynamic_slice(rel_idx, (pos, 0), (1, seq_len))[0]
            rb = p["blocks"]["self_attn"]["rel_pos_bias"]["pos_bias"][
                "embedding"][l][sel]                      # (S, heads)
            rb = jnp.pad(rb.T, ((0, 0), (1, 0)))          # (heads, S+1)
            bias = self_bias[None, None, 0] + rb[None]    # (1, h, S+1)
            h = _attend(q, kv_full, bias, heads, dh, dtype)
            h = mm(l, "self_attn", "to_out", h)
            h = _ln(h, sa["out_norm"]["ln"]["scale"][l])
            x = h.astype(x.dtype) + x
            new_caches.append(cache_l)

            # --- cross-attention to the text tokens ---
            ca = blocks["cross_attn"]
            x_n = _ln(x, ca["norm"]["ln"]["scale"][l]).astype(dtype)
            q = mm(l, "cross_attn", "to_q", x_n) * scale
            h = _attend(q, cross_kv[l], cross_bias, heads, dh, dtype)
            h = mm(l, "cross_attn", "to_out", h)
            h = _ln(h, ca["out_norm"]["ln"]["scale"][l])
            x = h.astype(x.dtype) + x

            # --- feed-forward ---
            ff = blocks["ff"]
            if qparams is not None:
                prep = jax.tree.map(lambda a: a[l], qparams["ffn"])
                x = ffn_block_int8(x, ff["norm_in"]["ln"]["scale"][l], prep,
                                   interpret=interpret)
            else:
                h = _ln(x, ff["norm_in"]["ln"]["scale"][l]).astype(dtype)
                h = mm(l, "ff", "fc1", h)
                h = jax.nn.gelu(h, approximate=False)
                h = _ln(h, ff["norm_mid"]["ln"]["scale"][l]).astype(dtype)
                h = mm(l, "ff", "fc2", h)
                x = h.astype(x.dtype) + x

        return _head(x), jnp.stack(new_caches)

    step_fn = step_logits_fused if fused is not None else step_logits

    def body(carry, pos):
        tok_prev, caches, key = carry
        logits2, caches = step_fn(tok_prev, pos, caches)
        cond, null = logits2[:b], logits2[b:]
        logits = (cond if cond_scale == 1
                  else null + (cond - null) * cond_scale)
        filtered = top_k_top_p_filter(logits, top_k, top_p)
        key, sub = jax.random.split(key)
        tok = gumbel_sample(filtered, sub, temperature)
        # teacher-force the carried context AFTER recording the free sample
        tok_carry = (tok if forced_tokens is None
                     else forced_tokens[:, pos].astype(tok.dtype))
        tok2 = jnp.concatenate([tok_carry, tok_carry], 0)
        out = (tok, logits) if return_logits else tok
        return (tok2, caches, key), out

    (_, _, _), outs = jax.lax.scan(
        body, (jnp.zeros((2 * b,), jnp.int32), caches, rng),
        jnp.arange(seq_len))
    g = c.image_encoded_dim
    if return_logits:
        tokens, logits = outs
        return (jnp.transpose(tokens).reshape(b, g, g),
                jnp.transpose(logits, (1, 0, 2)))
    return jnp.transpose(outs).reshape(b, g, g)
