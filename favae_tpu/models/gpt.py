"""CAT — Cross-attention Autoregressive Transformer (flax.linen).

reference: models/gpt_ca.py. Decoder-only GPT over the FA-VAE token grid with:

* axial 2-D positional embedding + learned start token (:257-264,291-301);
* per-layer [causal self-attention, cross-attention to CLIP text tokens,
  feed-forward] with residuals (:268-274,320-323);
* multi-query attention: multi-head Q, single-head K/V (:186-191);
* learned null key/value enabling classifier-free guidance (:184,224-225);
* 2-D relative position bias on self-attention (:113-136);
* weight-tied logits head (:278-279);
* LayerNorm with learned gamma and fixed zero beta (:102-109);
* dropout applied to the inputs of the q and kv projections only (:175-191 —
  the reference's FeedForward ignores its dropout argument).

TPU-native design choices:
* the layer stack is an `nn.scan` over one CATBlock with stacked parameters —
  XLA compiles a single block body instead of n_layer copies (the 24-layer
  reference graph otherwise takes many minutes through the compile service);
* `sample` runs a `lax.scan` over positions with per-layer KV caches (the
  reference re-forwards the whole prefix per token, gpt_ca.py:352-363) and
  batches the two CFG branches into one 2B forward, while remaining
  output-equivalent under CFG + top-k/top-p + gumbel sampling.
"""

from __future__ import annotations

import functools
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from favae_tpu.config import GPTConfig

NEG_INF = -1e9  # large negative in place of -finfo.max (bf16-safe)


class _ScaleParam(nn.Module):
    """Bare LayerNorm scale parameter. Named "ln" with param "scale" so the
    param tree is IDENTICAL to nn.LayerNorm's — fold/unfold checkpoints are
    interchangeable."""

    features: int

    @nn.compact
    def __call__(self):
        return self.param("scale", nn.initializers.ones_init(),
                          (self.features,))


class FixedBetaLayerNorm(nn.Module):
    """LayerNorm with learned scale, zero (non-learned) bias
    (reference: models/gpt_ca.py:102-109).

    With fold=True (GPTConfig.fold_ln_scale) the scale param still lives at
    the same tree path, but `__call__(x, return_parts=True)` hands the
    UNscaled normalized activations plus the scale to the caller, which
    folds the scale into the following projection kernel — turning the
    scale's activation-sized gradient reduction into a weight-sized one."""

    fold: bool = False

    @nn.compact
    def __call__(self, x, return_parts: bool = False):
        if not self.fold:
            assert not return_parts
            return nn.LayerNorm(use_bias=False, use_scale=True, epsilon=1e-5,
                                dtype=jnp.float32, name="ln")(x)
        scale = _ScaleParam(x.shape[-1], name="ln")()
        # same computation as nn.LayerNorm(use_fast_variance=True, eps=1e-5)
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.maximum(
            jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
            - jnp.square(mean), 0.0)
        xh = (xf - mean) * jax.lax.rsqrt(var + 1e-5)
        if return_parts:
            return xh, scale
        return xh * scale


class ScaledDense(nn.Module):
    """nn.Dense(use_bias=False) with an optional per-input-feature scale
    folded into the kernel: y = x @ (scale[:, None] * kernel). Param name
    and init match nn.Dense, so the tree is interchangeable."""

    features: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, scale=None):
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (x.shape[-1], self.features))
        if scale is not None:
            kernel = scale[:, None] * kernel
        return x.astype(self.dtype) @ kernel.astype(self.dtype)


def _rel_pos_indices(size: int) -> np.ndarray:
    """(size^2, size^2) index table into the (2*size-1)^2 bias embedding
    (reference: models/gpt_ca.py:116-127)."""
    ar = np.arange(size)
    pos = np.stack(np.meshgrid(ar, ar, indexing="ij"), -1).reshape(-1, 2)
    rel = pos[:, None, :] - pos[None, :, :] + size - 1
    return rel[..., 0] * (2 * size - 1) + rel[..., 1]


@jax.custom_vjp
def _gather_bias_mxu(emb, sel):
    """`emb[sel]` with a matmul backward.

    The VJP of a gather is a scatter-add; XLA's serial scatter of the
    (i, j, heads) f32 cotangent into the tiny (961, heads) table costs
    ~13 ms/step at gpt2_medium batch 16 (profiled: 5% of the whole train
    step, 24 layers). The same segment-sum expressed as
    one_hot(sel)^T @ g runs on the MXU in ~0.4 ms. one_hot is built in
    f32 so every product is exact — numerics match the scatter up to
    f32 summation order."""
    return jnp.take(emb, sel, axis=0)


def _gather_bias_mxu_fwd(emb, sel):
    return jnp.take(emb, sel, axis=0), (sel, emb.shape[0])


# Per-one-hot transient budget for the matmul backward below. The transient
# is batch-INDEPENDENT: it scales with the rel-pos grid (rows = i*(j-1) ~
# image_encoded_dim^4, cols = (2*size-1)^2) — 65536 x 961 f32 = 252 MB at the
# gpt2_medium training shape. The multiplicity risk is train_unroll keeping
# several layer backwards live at once, and the size risk is a resolution
# bump (image_encoded_dim 16->32 would be ~16 GB unchunked). Above the
# budget the backward scans over row chunks so each one-hot stays bounded;
# grads are identical up to f32 summation order (pinned by test).
_ONEHOT_BYTES_BUDGET = 128 * 1024 * 1024


def _gather_bias_mxu_bwd(res, g):
    sel, n = res
    flat = sel.reshape(-1)
    rows = flat.shape[0]
    gf = g.reshape(rows, -1).astype(jnp.float32)
    iota = jnp.arange(n)[None, :]
    if rows * n * 4 <= _ONEHOT_BYTES_BUDGET:
        onehot = (flat[:, None] == iota).astype(jnp.float32)
        demb = jax.lax.dot_general(onehot, gf, (((0,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)
    else:
        chunk = max(1024, _ONEHOT_BYTES_BUDGET // (n * 4) // 1024 * 1024)
        pad = (-rows) % chunk
        # pad sel with n (matches nothing -> all-zero one-hot row)
        flat_p = jnp.pad(flat, (0, pad), constant_values=n)
        gf_p = jnp.pad(gf, ((0, pad), (0, 0)))
        n_chunks = flat_p.shape[0] // chunk

        def body(acc, xs):
            f, gg = xs
            oh = (f[:, None] == iota).astype(jnp.float32)
            return acc + jax.lax.dot_general(
                oh, gg, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32), None

        demb, _ = jax.lax.scan(
            body, jnp.zeros((n, gf.shape[1]), jnp.float32),
            (flat_p.reshape(n_chunks, chunk),
             gf_p.reshape(n_chunks, chunk, -1)))
    return demb, None


_gather_bias_mxu.defvjp(_gather_bias_mxu_fwd, _gather_bias_mxu_bwd)


class RelPosBias2d(nn.Module):
    """2-D relative position bias (reference: models/gpt_ca.py:113-136)."""

    size: int
    heads: int

    @nn.compact
    def __call__(self, i: int, j: int, row_offset: Optional[jax.Array] = None):
        """Bias (heads, i, j) for sim of shape (..., i, j); key slot 0 is the
        null kv and gets zero bias (the reference left-pads, :135).

        With `row_offset` (incremental decoding, i == 1) the single query row
        is taken at dynamic position `row_offset`."""
        table = nn.Embed((2 * self.size - 1) ** 2, self.heads,
                         embedding_init=nn.initializers.normal(1.0),
                         name="pos_bias")
        idx = jnp.asarray(_rel_pos_indices(self.size))
        if row_offset is None:
            sel = idx[:i, : (j - 1)]
            bias = _gather_bias_mxu(table.embedding, sel)  # (i, j-1, heads)
        else:
            sel = jax.lax.dynamic_slice(idx, (row_offset, 0), (1, idx.shape[1]))
            sel = sel[:, : (j - 1)]
            bias = table(sel)                  # (1, j-1, heads)
        bias = jnp.transpose(bias, (2, 0, 1))  # (heads, i, j-1)
        return jnp.pad(bias, ((0, 0), (0, 0), (1, 0)))


class MultiQueryAttention(nn.Module):
    """Multi-head-Q / 1-head-KV attention with learned null kv
    (reference: models/gpt_ca.py:152-248)."""

    dim: int
    heads: int
    dim_head: int = 64
    causal: bool = False
    dropout: float = 0.0
    rel_pos_size: Optional[int] = None  # enables RelPosBias2d
    dtype: Any = jnp.bfloat16
    fold_ln_scale: bool = False

    def setup(self):
        inner = self.heads * self.dim_head
        self.norm = FixedBetaLayerNorm(fold=self.fold_ln_scale)
        if self.fold_ln_scale:
            # same param paths as nn.Dense; scale folded at call sites
            self.to_q = ScaledDense(inner, dtype=self.dtype)
            self.to_kv = ScaledDense(self.dim_head, dtype=self.dtype)
        else:
            self.to_q = nn.Dense(inner, use_bias=False, dtype=self.dtype)
            self.to_kv = nn.Dense(self.dim_head, use_bias=False,
                                  dtype=self.dtype)
        self.null_kv = self.param("null_kv", nn.initializers.normal(1.0),
                                  (self.dim_head,))
        self.to_out = nn.Dense(self.dim, use_bias=False, dtype=self.dtype)
        self.out_norm = FixedBetaLayerNorm()
        if self.dropout > 0.0:
            self.drop_q = nn.Dropout(self.dropout)
            self.drop_kv = nn.Dropout(self.dropout)
        if self.rel_pos_size is not None:
            self.rel_pos_bias = RelPosBias2d(self.rel_pos_size, self.heads)

    def _attend(self, q, kv, *, context_mask=None, causal_offset=None,
                rel_bias=None):
        """q (b, n, h, d); kv (b, m, d) WITHOUT null; returns (b, n, h*d)."""
        b = q.shape[0]
        null = jnp.broadcast_to(self.null_kv.astype(kv.dtype),
                                (b, 1, self.dim_head))
        kv_full = jnp.concatenate([null, kv], axis=1)  # (b, m+1, d)
        sim = jnp.einsum("bnhd,bmd->bhnm", q, kv_full).astype(jnp.float32)

        if rel_bias is not None:
            sim = sim + rel_bias

        if context_mask is not None:
            cm = jnp.pad(context_mask, ((0, 0), (1, 0)), constant_values=True)
            sim = jnp.where(cm[:, None, None, :], sim, NEG_INF)

        if causal_offset is not None:
            n, m = sim.shape[-2], sim.shape[-1]
            rows = jnp.arange(n)[:, None] + causal_offset  # absolute position
            cols = jnp.arange(m)[None, :]                  # 0 = null kv
            keep = cols <= rows + 1
            sim = jnp.where(keep[None, None], sim, NEG_INF)

        attn = jax.nn.softmax(sim, axis=-1)
        out = jnp.einsum("bhnm,bmd->bnhd", attn.astype(kv_full.dtype), kv_full)
        return out.reshape(b, q.shape[1], self.heads * self.dim_head)

    def __call__(self, x, *, context=None, context_mask=None,
                 deterministic: bool = True):
        if self.fold_ln_scale:
            # fold the LN scale into the projection kernels: dropout is a
            # per-element mask multiply, so drop(x_hat*g) == drop(x_hat)*g
            # and the fold is exact up to where bf16 rounding lands
            x_n, g = self.norm(x, return_parts=True)
            q_scale, kv_scale = g, (g if context is None else None)
        else:
            x_n = self.norm(x).astype(self.dtype)
            q_scale = kv_scale = None
        x_q = (self.drop_q(x_n, deterministic=deterministic)
               if self.dropout > 0.0 else x_n)
        q = (self.to_q(x_q, q_scale) if self.fold_ln_scale
             else self.to_q(x_q)) * (self.dim_head ** -0.5)
        b, n, _ = q.shape
        q = q.reshape(b, n, self.heads, self.dim_head)

        ctx = x_n if context is None else context.astype(
            jnp.float32 if self.fold_ln_scale else self.dtype)
        if self.dropout > 0.0:
            ctx = self.drop_kv(ctx, deterministic=deterministic)
        kv = (self.to_kv(ctx, kv_scale) if self.fold_ln_scale
              else self.to_kv(ctx))  # (b, m, dim_head) single head

        rel_bias = None
        if self.rel_pos_size is not None:
            rel_bias = self.rel_pos_bias(n, kv.shape[1] + 1)[None]
        out = self._attend(
            q, kv, context_mask=context_mask,
            causal_offset=0 if self.causal else None, rel_bias=rel_bias)
        return self.out_norm(self.to_out(out)).astype(x.dtype)

    # ---- incremental decoding -------------------------------------------
    def project_kv(self, context):
        """kv for a static context (cross-attention cache)."""
        return self.to_kv(context.astype(self.dtype))

    def decode_step(self, x_t, kv_cache, pos):
        """One causal self-attention step. x_t (b, 1, dim); kv_cache
        (b, L, dim_head) with rows >= pos unfilled; returns (out, new_cache)."""
        x_n = self.norm(x_t).astype(self.dtype)
        q = self.to_q(x_n) * (self.dim_head ** -0.5)
        b = q.shape[0]
        q = q.reshape(b, 1, self.heads, self.dim_head)
        kv_t = self.to_kv(x_n)  # (b, 1, d)
        kv_cache = jax.lax.dynamic_update_slice(
            kv_cache, kv_t.astype(kv_cache.dtype), (0, pos, 0))
        rel_bias = None
        if self.rel_pos_size is not None:
            m = kv_cache.shape[1] + 1
            rel_bias = self.rel_pos_bias(1, m, row_offset=pos)[None]
        mask = jnp.arange(kv_cache.shape[1])[None, :] <= pos
        mask = jnp.broadcast_to(mask, (b, kv_cache.shape[1]))
        out = self._attend(q, kv_cache, context_mask=mask, rel_bias=rel_bias)
        out = self.out_norm(self.to_out(out))
        return out.astype(x_t.dtype), kv_cache

    def cross_step(self, x_t, kv, context_mask):
        """One cross-attention step against precomputed kv."""
        x_n = self.norm(x_t).astype(self.dtype)
        q = self.to_q(x_n) * (self.dim_head ** -0.5)
        b = q.shape[0]
        q = q.reshape(b, 1, self.heads, self.dim_head)
        out = self._attend(q, kv, context_mask=context_mask)
        return self.out_norm(self.to_out(out)).astype(x_t.dtype)


class FeedForward(nn.Module):
    """LN -> Dense 4x -> GELU -> LN -> Dense (reference: gpt_ca.py:140-148;
    the dropout arg is unused there, preserved here)."""

    dim: int
    mult: int = 4
    dtype: Any = jnp.bfloat16
    fold_ln_scale: bool = False

    @nn.compact
    def __call__(self, x):
        if self.fold_ln_scale:
            h, g1 = FixedBetaLayerNorm(fold=True, name="norm_in")(
                x, return_parts=True)
            h = ScaledDense(self.dim * self.mult, dtype=self.dtype,
                            name="fc1")(h, g1)
            h = nn.gelu(h, approximate=False)
            h, g2 = FixedBetaLayerNorm(fold=True, name="norm_mid")(
                h, return_parts=True)
            h = ScaledDense(self.dim, dtype=self.dtype, name="fc2")(h, g2)
            return h.astype(x.dtype)
        h = FixedBetaLayerNorm(name="norm_in")(x).astype(self.dtype)
        h = nn.Dense(self.dim * self.mult, use_bias=False, dtype=self.dtype,
                     name="fc1")(h)
        h = nn.gelu(h, approximate=False)
        h = FixedBetaLayerNorm(name="norm_mid")(h).astype(self.dtype)
        h = nn.Dense(self.dim, use_bias=False, dtype=self.dtype, name="fc2")(h)
        return h.astype(x.dtype)


class CATBlock(nn.Module):
    """One transformer layer: causal self-attn, cross-attn, feed-forward
    (reference: gpt_ca.py:268-274,320-323). Scanned over n_layer with stacked
    parameters; `deterministic` gates the projection-input dropout."""

    cfg: GPTConfig
    deterministic: bool = True
    dtype: Any = jnp.bfloat16

    def setup(self):
        c = self.cfg
        fold = getattr(c, "fold_ln_scale", False)
        self.self_attn = MultiQueryAttention(
            c.n_embed, c.n_head, c.dim_head, causal=True,
            rel_pos_size=c.image_encoded_dim, dropout=c.dropout,
            dtype=self.dtype, fold_ln_scale=fold)
        self.cross_attn = MultiQueryAttention(
            c.n_embed, c.n_head, c.dim_head, causal=False,
            dropout=c.dropout, dtype=self.dtype, fold_ln_scale=fold)
        self.ff = FeedForward(c.n_embed, dtype=self.dtype, fold_ln_scale=fold)

    def __call__(self, x, context, context_mask):
        det = self.deterministic
        x = self.self_attn(x, deterministic=det) + x
        x = self.cross_attn(x, context=context, context_mask=context_mask,
                            deterministic=det) + x
        x = self.ff(x) + x
        return x, None

    def decode(self, x, cache, cross_kv, context_mask, pos):
        """Incremental step: carry x (b, 1, dim); scanned cache (b, L, d) and
        cross_kv (b, m, d); returns (x, new_cache)."""
        h, cache = self.self_attn.decode_step(x, cache, pos)
        x = h + x
        x = self.cross_attn.cross_step(x, cross_kv, context_mask) + x
        x = self.ff(x) + x
        return x, cache

    def kv(self, carry, context):
        """Per-layer cross-attention kv precompute (scanned output)."""
        return carry, self.cross_attn.project_kv(context)


def _scan_blocks(cfg: GPTConfig, deterministic: bool, dtype, name=None,
                 remat: str = "none"):
    common = dict(variable_axes={"params": 0},
                  split_rngs={"params": True, "dropout": True},
                  length=cfg.n_layer)
    # remat on the training path: scan-over-remat recomputes block activations
    # in the backward pass instead of stashing all n_layer of them (a 24x1536
    # stack at batch 4 alone is ~600MB per saved tensor -> HBM OOM without
    # it). "dots" keeps the matmul outputs (the expensive recompute) and
    # re-runs only elementwise ops — same math, ~1.5GB more HBM at batch 8.
    if remat == "full":
        target = nn.remat(CATBlock, prevent_cse=False)
    elif remat == "dots":
        target = nn.remat(CATBlock, prevent_cse=False,
                          policy=jax.checkpoint_policies.dots_saveable)
    elif remat == "dots_nb":
        # saves Dense outputs (dot_generals without batch dims) but
        # recomputes the attention einsums — drops the f32 (b,h,n,m)
        # probability tensors (the largest "dots" saves) for negligible
        # recompute at seq 257
        target = nn.remat(
            CATBlock, prevent_cse=False,
            policy=jax.checkpoint_policies.dots_with_no_batch_dims_saveable)
    elif remat == "none":
        target = CATBlock
    else:
        raise ValueError(f"unknown remat policy {remat!r}")
    Scanned = nn.scan(
        target,
        methods={
            "__call__": dict(in_axes=(nn.broadcast, nn.broadcast),
                             unroll=cfg.train_unroll, **common),
            # decode fully unrolls the layer loop: the per-token body is tiny
            # (dozens of (2b, d) matmuls) and a rolled 24-iteration while loop
            # leaves the MXU idle on loop overhead; unrolled, XLA prefetches
            # each layer's weights during the previous layer's compute
            "decode": dict(in_axes=(0, 0, nn.broadcast, nn.broadcast),
                           out_axes=0, unroll=cfg.n_layer, **common),
            "kv": dict(in_axes=(nn.broadcast,), out_axes=0, **common),
        })
    return Scanned(cfg, deterministic=deterministic, dtype=dtype, name=name)


class GPT(nn.Module):
    """reference: models/gpt_ca.py:250-393."""

    cfg: GPTConfig
    dtype: Any = jnp.bfloat16

    def setup(self):
        c = self.cfg
        self.tok_emb = nn.Embed(c.vocab_size, c.n_embed,
                                embedding_init=nn.initializers.normal(0.02))
        self.axial_height_pos = self.param(
            "axial_height_pos", nn.initializers.normal(1.0),
            (c.image_encoded_dim, c.n_embed))
        self.axial_width_pos = self.param(
            "axial_width_pos", nn.initializers.normal(1.0),
            (c.image_encoded_dim, c.n_embed))
        self.start_token = self.param(
            "start_token", nn.initializers.normal(1.0), (c.n_embed,))
        self.init_norm = FixedBetaLayerNorm()
        self.final_norm = FixedBetaLayerNorm()

        # one block, scanned; train/eval/decode variants share the scope
        self.blocks = _scan_blocks(c, deterministic=False, dtype=self.dtype,
                                   name="blocks", remat=c.remat)
        self.blocks_eval = _scan_blocks(c, deterministic=True, dtype=self.dtype)
        self.blocks_decode = _scan_blocks(c, deterministic=True,
                                          dtype=self.dtype)
        self.blocks_kv = _scan_blocks(c, deterministic=True, dtype=self.dtype)
        nn.share_scope(self.blocks_eval, self.blocks)
        nn.share_scope(self.blocks_decode, self.blocks)
        nn.share_scope(self.blocks_kv, self.blocks)

    # ------------------------------------------------------------------
    def _axial_pos(self):
        pos = (self.axial_width_pos[None, :, :]
               + self.axial_height_pos[:, None, :])
        return pos.reshape(-1, self.cfg.n_embed)

    def _embed_tokens(self, image_token_ids):
        """[start] + tok_emb(ids) + axial pos (reference: gpt_ca.py:287-301)."""
        b, n = image_token_ids.shape
        emb = self.tok_emb(image_token_ids)
        emb = emb + self._axial_pos()[:n][None]
        start = jnp.broadcast_to(self.start_token[None, None, :],
                                 (b, 1, self.cfg.n_embed))
        return jnp.concatenate([start, emb.astype(start.dtype)], axis=1)

    def _logits(self, x):
        emb = self.tok_emb.embedding  # weight tying (gpt_ca.py:278-279)
        return jnp.einsum("bnd,vd->bnv", x.astype(jnp.float32),
                          emb.astype(jnp.float32))

    def __call__(self, image_token_ids, text_token_embeds, text_mask, *,
                 cond_drop_prob: Optional[float] = None, train: bool = False,
                 rng: Optional[jax.Array] = None):
        """Teacher-forced forward -> logits (b, n+1, vocab)
        (reference: gpt_ca.py:284-331)."""
        c = self.cfg
        cond_drop_prob = (c.cond_drop_prob if cond_drop_prob is None
                          else cond_drop_prob)
        x = self._embed_tokens(image_token_ids)

        text_token_embeds = text_token_embeds[:, : c.max_text_len]
        text_mask = text_mask[:, : c.max_text_len]

        if cond_drop_prob >= 1:
            text_mask = jnp.zeros_like(text_mask)
        elif cond_drop_prob > 0:
            assert rng is not None
            keep = jax.random.uniform(
                jax.random.fold_in(rng, 17), (x.shape[0],)) < 1.0 - cond_drop_prob
            text_mask = keep[:, None] & text_mask

        # NOTE: the reference defines a cond_proj Linear but never calls it
        # (gpt_ca.py:259 vs :322) — context enters to_kv raw. That dead param
        # is omitted here; the checkpoint converter skips it.

        x = self.init_norm(x).astype(self.dtype)
        blocks = self.blocks if train else self.blocks_eval
        x, _ = blocks(x, text_token_embeds.astype(jnp.float32), text_mask)
        x = self.final_norm(x)
        return self._logits(x)

    def forward_with_cond_scale(self, image_token_ids, text_token_embeds,
                                text_mask, cond_scale: float = 3.0):
        """CFG-combined logits (reference: gpt_ca.py:334-341)."""
        logits = self(image_token_ids, text_token_embeds, text_mask,
                      cond_drop_prob=0.0, train=False)
        if cond_scale == 1:
            return logits
        null_logits = self(image_token_ids, text_token_embeds,
                           jnp.zeros_like(text_mask),
                           cond_drop_prob=0.0, train=False)
        return null_logits + (logits - null_logits) * cond_scale

    # ------------------------------------------------------------------
    def sample(self, text_token_embeds, text_mask, *, rng,
               temperature: float = 1.0, top_k: Optional[int] = None,
               top_p: float = 1.0, cond_scale: float = 3.0):
        """Autoregressive sampling with KV caches via lax.scan
        (functionally equivalent to reference gpt_ca.py:343-367, which
        re-forwards the full prefix per token without a cache).

        CFG runs as a 2B batch: rows [0:B] conditional, [B:2B] null.
        Returns (b, grid, grid) int32 token grid."""
        c = self.cfg
        b = text_token_embeds.shape[0]
        seq_len = c.image_encoded_dim ** 2

        text_token_embeds = text_token_embeds[:, : c.max_text_len]
        text_mask = text_mask[:, : c.max_text_len]
        ctx2 = jnp.concatenate([text_token_embeds, text_token_embeds], 0)
        ctx2 = ctx2.astype(jnp.float32)
        mask2 = jnp.concatenate([text_mask, jnp.zeros_like(text_mask)], 0)

        # per-layer cross kv, stacked (L, 2b, m, d)
        _, cross_kv = self.blocks_kv.kv(jnp.zeros((), jnp.float32), ctx2)

        caches = jnp.zeros((c.n_layer, 2 * b, seq_len, c.dim_head), self.dtype)
        axial = self._axial_pos()

        def step_logits(tok_prev, pos, caches):
            emb_tok = self.tok_emb(tok_prev) + axial[jnp.maximum(pos - 1, 0)]
            start = jnp.broadcast_to(self.start_token[None, :],
                                     (2 * b, c.n_embed))
            x = jnp.where(pos == 0, start, emb_tok.astype(start.dtype))
            x = self.init_norm(x)[:, None, :].astype(self.dtype)
            x, caches = self.blocks_decode.decode(x, caches, cross_kv, mask2,
                                                  pos)
            x = self.final_norm(x[:, 0, :])
            return self._logits(x[:, None, :])[:, 0], caches

        def body(carry, pos):
            tok_prev, caches, key = carry
            logits2, caches = step_logits(tok_prev, pos, caches)
            cond, null = logits2[:b], logits2[b:]
            logits = (cond if cond_scale == 1
                      else null + (cond - null) * cond_scale)
            logits = top_k_top_p_filter(logits, top_k, top_p)
            key, sub = jax.random.split(key)
            tok = gumbel_sample(logits, sub, temperature)
            tok2 = jnp.concatenate([tok, tok], 0)
            return (tok2, caches, key), tok

        (_, _, _), tokens = jax.lax.scan(
            body, (jnp.zeros((2 * b,), jnp.int32), caches, rng),
            jnp.arange(seq_len))
        tokens = jnp.transpose(tokens)  # (b, seq_len)
        g = c.image_encoded_dim
        return tokens.reshape(b, g, g)


def gumbel_sample(logits, rng, temperature: float = 1.0):
    """(logits/T + gumbel).argmax (reference: gpt_ca.py:35-40)."""
    noise = jax.random.gumbel(rng, logits.shape, dtype=jnp.float32)
    return jnp.argmax(logits.astype(jnp.float32) / temperature + noise, axis=-1)


def top_k_top_p_filter(logits, top_k: Optional[int] = None,
                       top_p: float = 1.0):
    """reference: gpt_ca.py:370-393. logits (..., vocab)."""
    if top_k is not None:
        top_k = min(top_k, logits.shape[-1])
        kth = jax.lax.top_k(logits, top_k)[0][..., -1:]
        logits = jnp.where(logits < kth, NEG_INF, logits)
    if top_p < 1.0:
        sort_idx = jnp.argsort(-logits, axis=-1)
        sorted_logits = jnp.take_along_axis(logits, sort_idx, axis=-1)
        probs = jax.nn.softmax(sorted_logits, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        # shift right: always keep the first token above threshold
        mask = cum > top_p
        mask = jnp.concatenate(
            [jnp.zeros_like(mask[..., :1]), mask[..., :-1]], axis=-1)
        inv = jnp.argsort(sort_idx, axis=-1)
        mask = jnp.take_along_axis(mask, inv, axis=-1)
        logits = jnp.where(mask, NEG_INF, logits)
    return logits
