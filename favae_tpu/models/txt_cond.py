"""CAT composition: frozen FA-VAE + frozen CLIP text encoder + trainable GPT.

reference: models/txt_cond_transformer.py:29-265 (Net2NetTransformer). The
torch version wires Accelerate/optimizer construction into the model ctor;
here the composition is a plain dataclass of (module, params) pairs and pure
functions — the CAT train step closes over the frozen parts.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from favae_tpu.config import CATConfig
from favae_tpu.models.clip_text import BPETokenizer, CLIPTextEncoder, tokenize
from favae_tpu.models.gpt import GPT
from favae_tpu.models.quantizer import CodebookState
from favae_tpu.models.vqgan import VQGANFCM


@dataclasses.dataclass
class CATModel:
    cfg: CATConfig
    favae: VQGANFCM
    favae_variables: Any          # {"params": ..., possibly "batch_stats"}
    cb_state: CodebookState
    clip: CLIPTextEncoder
    clip_params: Any
    gpt: GPT
    tokenizer: Optional[BPETokenizer] = None
    # one jitted sampler per (top_k, top_p, temperature, cond_scale,
    # quantized) knob combination; bounded in practice by the handful of
    # sampling configs a process uses (each entry is a compiled executable,
    # so evicting would only force recompiles)
    _sample_cache: dict = dataclasses.field(default_factory=dict)

    # ------------------------------------------------------------------
    # NOTE: frozen params default to the attributes for host-side use, but
    # jitted steps MUST pass them explicitly (frozen=...) — arrays closed over
    # a jit become graph constants, and a 400MB constant payload overwhelms
    # the remote compile service.
    def frozen_params(self):
        return dict(favae_variables=self.favae_variables,
                    cb_state=self.cb_state, clip_params=self.clip_params)

    def encode_to_z(self, x, favae_variables=None, cb_state=None):
        """Frozen FA-VAE encode -> token ids (B, L)
        (reference: txt_cond_transformer.py:134-139)."""
        fv = self.favae_variables if favae_variables is None else favae_variables
        cb = self.cb_state if cb_state is None else cb_state
        _, _, indices, _, _ = self.favae.apply(
            fv, x, cb, train=False, inference=True, method=VQGANFCM.encode)
        b = indices.shape[0]
        return indices.reshape(b, -1)

    def encode_text_ids(self, text_ids, clip_params=None):
        """CLIP text ids -> (token embeds (B,77,D), mask (B,77))
        (reference: txt_cond_transformer.py:142-150: mask = ids > 0,
        embeddings cast to float32; optional L2 normalization per
        utils.py:29-37 CLIPWrapper)."""
        cp = self.clip_params if clip_params is None else clip_params
        embeds, pooled = self.clip.apply({"params": cp}, text_ids)
        embeds = embeds.astype(jnp.float32)
        if self.cfg.normalize_clip:
            embeds = embeds / jnp.linalg.norm(embeds, axis=-1, keepdims=True)
        mask = text_ids > 0
        return embeds, mask

    def tokenize(self, texts):
        assert self.tokenizer is not None, "no BPE merges file configured"
        return jnp.asarray(tokenize(self.tokenizer, texts,
                                    self.cfg.clip.context_length))

    def decode_to_img(self, index_grid):
        """Sampled (B, g, g) token grid -> image
        (reference: txt_cond_transformer.py:160-168)."""
        return self.favae.apply(
            self.favae_variables, index_grid, self.cb_state,
            method=VQGANFCM.decode_code)

    # ------------------------------------------------------------------
    def gpt_loss(self, gpt_params, x, text_ids, *, rng, train: bool = True,
                 frozen=None):
        """Teacher-forced CE loss (reference: txt_cond_transformer.py:112-125):
        input = z[:, :L-1] (start token prepended inside GPT), CE over all L
        positions against the full z sequence."""
        frozen = frozen or {}
        z = self.encode_to_z(x, frozen.get("favae_variables"),
                             frozen.get("cb_state"))
        embeds, mask = self.encode_text_ids(text_ids,
                                            frozen.get("clip_params"))
        return self.gpt_loss_from_latents(gpt_params, z, embeds, mask,
                                          rng=rng, train=train)

    def gpt_loss_from_latents(self, gpt_params, z, embeds, mask, *, rng,
                              train: bool = True):
        """`gpt_loss` from PRECOMPUTED frozen-tower outputs: z token ids
        (B, L) from `encode_to_z`, CLIP token embeds/mask from
        `encode_text_ids`. Bitwise-identical to `gpt_loss` given the same
        latents (the frozen towers are deterministic) — pinned by
        tests/test_cat_latent_cache.py. Beyond-reference capability: the
        torch trainer re-encodes every batch through the frozen towers each
        epoch (cat_scripts/train_cat.py:69-109 -> txt_cond_transformer.py:
        134-150); caching removes that recompute (~9% of the r5 on-chip
        step profile) and frees the frozen params + encoder activations
        from device memory."""
        inp = z[:, :-1]
        # eval: deterministic CE by default; cfg.eval_cond_drop reproduces the
        # reference's always-on cond drop (see CATConfig.eval_cond_drop)
        drop = (self.cfg.gpt.cond_drop_prob
                if (train or self.cfg.eval_cond_drop) else 0.0)
        drop_rng = None
        if train:
            drop_rng = jax.random.fold_in(rng, 1)
            impl = self.cfg.gpt.dropout_rng_impl
            if impl != "threefry":
                # re-key the dropout stream onto the TPU hardware RNG (see
                # GPTConfig.dropout_rng_impl); the threefry->bits bridge
                # keeps the stream a pure function of the step rng
                drop_rng = jax.random.wrap_key_data(
                    jax.random.bits(drop_rng, (4,), jnp.uint32), impl=impl)
        logits = self.gpt.apply(
            {"params": gpt_params}, inp, embeds, mask,
            cond_drop_prob=drop,
            train=train, rng=rng,
            rngs={"dropout": drop_rng} if train else None)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        nll = -jnp.take_along_axis(logp, z[..., None], axis=-1)[..., 0]
        return jnp.mean(nll)

    def sample_images(self, gpt_params, text_ids, *, rng,
                      top_k: Optional[int] = None, top_p: float = 1.0,
                      temperature: float = 1.0,
                      cond_scale: Optional[float] = None,
                      quantized: bool = False):
        """Text -> image (reference: txt_cond_transformer.py:171-185).

        The whole pipeline (CLIP encode -> CFG KV-cache sampling -> FA-VAE
        decode) runs as ONE jitted function with every parameter tree passed
        as an argument (eager dispatch through the compile relay is orders of
        magnitude slower, and closed-over params overwhelm it).

        `quantized=True` routes the GPT token loop through the weight-only
        int8 serving engine (models/decode_engine.py) — ~2x the decode
        weight-streaming bandwidth, slightly lossy (no reference analogue)."""
        cs = self.cfg.cond_scale if cond_scale is None else cond_scale
        key = (top_k, top_p, temperature, cs, quantized)
        if key not in self._sample_cache:
            def fn(gpt_params, frozen, text_ids, rng):
                embeds, mask = self.encode_text_ids(
                    text_ids, frozen.get("clip_params"))
                if quantized:
                    from favae_tpu.models.decode_engine import (
                        quantize_decode_params, sample_tokens)
                    from favae_tpu.ops.decode_step_kernel import (
                        prepare_fused_decode, supports)
                    b = text_ids.shape[0]
                    # the fused kernel needs 2b % 8 == 0; pad small batches
                    # with dummy prompts (the kernel is weight-streaming
                    # bound, so the wasted rows are ~free latency-wise)
                    b_pad = max(4, -(-b // 4) * 4)
                    kw = {}
                    if supports(self.cfg.gpt, 2 * b_pad):
                        if b_pad != b:
                            embeds = jnp.concatenate(
                                [embeds, jnp.broadcast_to(
                                    embeds[:1], (b_pad - b,) +
                                    embeds.shape[1:])], 0)
                            mask = jnp.concatenate(
                                [mask, jnp.broadcast_to(
                                    mask[:1], (b_pad - b,) + mask.shape[1:])],
                                0)
                        kw["fused"] = prepare_fused_decode(gpt_params,
                                                           self.cfg.gpt)
                    else:
                        b_pad = b
                        kw["qparams"] = quantize_decode_params(gpt_params)
                    grid = sample_tokens(
                        self.cfg.gpt, gpt_params, embeds, mask, rng=rng,
                        temperature=temperature, top_k=top_k, top_p=top_p,
                        cond_scale=cs, **kw)[:b]
                else:
                    grid = self.gpt.apply(
                        {"params": gpt_params}, embeds, mask, rng=rng,
                        temperature=temperature, top_k=top_k, top_p=top_p,
                        cond_scale=cs, method=GPT.sample)
                z = self.favae.apply(
                    frozen["favae_variables"], grid, frozen["cb_state"],
                    method=VQGANFCM.decode_code)
                return z, grid

            self._sample_cache[key] = jax.jit(fn)
        return self._sample_cache[key](gpt_params, self.frozen_params(),
                                       text_ids, rng)


def build_cat(cfg: CATConfig, rng: jax.Array,
              favae_variables=None, cb_state=None, clip_params=None,
              tokenizer: Optional[BPETokenizer] = None):
    """Construct CATModel + freshly initialized GPT params. Frozen components
    accept converted reference weights or fall back to random init (tests)."""
    from favae_tpu.models.quantizer import init_codebook_state

    k1, k2, k3, k4 = jax.random.split(rng, 4)
    favae = VQGANFCM(cfg.vqgan)
    res = cfg.vqgan.codec.resolution
    if cb_state is None:
        cb_state = init_codebook_state(cfg.vqgan.quantizer, k1)
    if favae_variables is None:
        dummy = jnp.zeros((1, res, res, 3), jnp.float32)
        favae_variables = favae.init({"params": k2, "dropout": k2}, dummy,
                                     cb_state, train=False, inference=True)
    clip = CLIPTextEncoder(cfg.clip)
    if clip_params is None:
        ids = jnp.zeros((1, cfg.clip.context_length), jnp.int32)
        clip_params = clip.init(k3, ids)["params"]

    gpt = GPT(cfg.gpt)
    n = cfg.gpt.image_encoded_dim ** 2
    dummy_ids = jnp.zeros((1, n - 1), jnp.int32)
    dummy_txt = jnp.zeros((1, cfg.clip.context_length, cfg.gpt.n_cond_embed),
                          jnp.float32)
    dummy_mask = jnp.ones((1, cfg.clip.context_length), bool)
    gpt_params = gpt.init(k4, dummy_ids, dummy_txt, dummy_mask,
                          cond_drop_prob=0.0)["params"]

    model = CATModel(cfg=cfg, favae=favae, favae_variables=favae_variables,
                     cb_state=cb_state, clip=clip, clip_params=clip_params,
                     gpt=gpt, tokenizer=tokenizer)
    return model, gpt_params
