"""Encoder/Decoder with Frequency Complement Modules (flax.linen, NHWC).

The reference implements 3 encoder and 8 decoder classes that are copy-pasted
variants of one trunk (reference: models/codec.py:125-1207). Here they collapse
into ONE parameterized `Encoder` and ONE `Decoder`:

* `fcm_kind` in {none, conv, res, attn} selects the Frequency Complement Module
  flavour (reference dispatch: models/vqgan_fcm.py:58-96);
* `dsl_mode` in {none, nonpair, pair} selects the Dynamic-Spectrum-Loss sigma
  topology: `nonpair` gives the encoder and the decoder 4 learned sigmas each
  and blurs the taps locally during training (reference: models/codec.py:215,
  280-314, 898, 972-1004); `pair` leaves taps raw — the model-level shared
  sigmas blur them in VQGANFCM.forward (reference: models/vqgan_fcm.py:131-134).

Same weight tree for a given config as the corresponding reference class, so
the torch->jax checkpoint converter maps 1:1.

Both return the result plus exactly 4 intermediate feature taps:
  encoder: after conv_in, after the down stack, after mid, after final;
  decoder: the 4 FCM outputs (or the stage outputs for fcm_kind == none).
"""

from __future__ import annotations

from typing import List, Tuple

import jax.numpy as jnp
from flax import linen as nn

from favae_tpu.config import CodecConfig, FCM_ATTN, FCM_CONV, FCM_NONE, FCM_RES
from favae_tpu.models.blocks import (
    AttnBlock,
    Downsample,
    NonResnetBlock,
    ResnetBlock,
    TransEncoderBlock,
    Upsample,
    conv1x1,
    conv3x3,
    group_norm_silu,
)
from favae_tpu.ops.gaussian import gaussian_blur_nhwc


class Encoder(nn.Module):
    """Taming-style encoder returning (z, 4 feature taps).

    reference: models/codec.py:125-188 (plain) and :193-314 (EncoderGauss —
    learned sigmas + per-tap blur during training).
    """

    cfg: CodecConfig
    dsl_nonpair: bool = False        # own 4 learned sigmas, blur taps in train
    gaussian_kernel: int = 9         # blur kernel size mu
    dsl_init_sigma: float = 3.0
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, *, train: bool = False, inference: bool = False):
        cfg = self.cfg
        taps: List[jnp.ndarray] = []

        blur_on = self.dsl_nonpair and not inference
        if self.dsl_nonpair:
            sigmas = self.param(
                "sigmas",
                lambda _k: jnp.full((4,), self.dsl_init_sigma, jnp.float32))

        def tap(h, i):
            # taps stay in compute dtype: the blur accumulates in f32
            # internally and the FFL upcasts at the loss — storing f32 copies
            # of the 256^2 taps only burns HBM bandwidth
            if blur_on:
                taps.append(gaussian_blur_nhwc(h, self.gaussian_kernel,
                                               sigmas[i]))
            else:
                taps.append(h)

        x = x.astype(self.dtype)
        h = conv3x3(cfg.base_channels, self.dtype, name="conv_in")(x)
        tap(h, 0)

        # down stack
        curr_res = cfg.resolution
        in_ch_mult = (1,) + tuple(cfg.ch_mult)
        blk = 0
        for level in range(len(cfg.ch_mult)):
            block_out = cfg.base_channels * cfg.ch_mult[level]
            for _ in range(cfg.num_res_blocks):
                h = ResnetBlock(block_out, cfg.dropout, dtype=self.dtype,
                                name=f"down_{blk}")(h, train=train)
                blk += 1
                if curr_res in cfg.attn_resolutions:
                    h = AttnBlock(block_out, dtype=self.dtype, name=f"down_{blk}")(h)
                    blk += 1
            if level != len(cfg.ch_mult) - 1:
                h = Downsample(block_out, dtype=self.dtype, name=f"down_{blk}")(h)
                blk += 1
                curr_res //= 2
        del in_ch_mult
        tap(h, 1)

        # middle
        block_in = h.shape[-1]
        h = ResnetBlock(block_in, cfg.dropout, dtype=self.dtype, name="mid_0")(h, train=train)
        h = AttnBlock(block_in, dtype=self.dtype, name="mid_1")(h)
        h = ResnetBlock(block_in, cfg.dropout, dtype=self.dtype, name="mid_2")(h, train=train)
        tap(h, 2)

        # final: GN -> SiLU -> 3x3 conv to z -> extra 1x1 conv
        # (reference: models/codec.py:170-175)
        zc = 2 * cfg.z_channels if cfg.double_z else cfg.z_channels
        h = group_norm_silu(32, name="final_norm", dtype=self.dtype)(h)
        h = conv3x3(zc, self.dtype, name="final_conv")(h)
        h = conv1x1(cfg.z_channels, self.dtype, name="final_proj")(h)
        tap(h, 3)

        return h, taps


class Decoder(nn.Module):
    """Decoder with optional FCM branches, returning (x_recon, 4 taps, h_pre).

    `h_pre` is the activation entering the final 3x3 RGB conv — exposed so the
    train step can compute the adaptive discriminator weight from grads of the
    final conv kernel alone (reference: favae_scripts/train_favae.py:32-39).

    reference classes folded in:
      fcm none            -> Decoder            (models/codec.py:400-465)
      fcm conv            -> DecoderFcm / DecoderFcmGauss / DecoderFcmGaussSame
                             (models/codec.py:471-551,557-694,700-788)
      fcm res             -> DecoderFcmResGauss / DecoderFcmGaussSameResblock
                             (models/codec.py:794-876,882-1004)
      fcm attn            -> DecoderFcmAttnGauss (models/codec.py:1011-1128)
    """

    cfg: CodecConfig
    fcm_kind: str = FCM_RES
    dsl_nonpair: bool = False
    gaussian_kernel: int = 9
    dsl_init_sigma: float = 3.0
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, z, *, train: bool = False, inference: bool = False):
        cfg = self.cfg
        taps: List[jnp.ndarray] = []

        blur_on = self.dsl_nonpair and not inference
        if self.dsl_nonpair:
            sigmas = self.param(
                "sigmas",
                lambda _k: jnp.full((4,), self.dsl_init_sigma, jnp.float32))

        def tap(h, i):
            if blur_on:
                taps.append(gaussian_blur_nhwc(h, self.gaussian_kernel,
                                               sigmas[i]))
            else:
                taps.append(h)

        def fcm(h, i):
            """Apply FCM branch i (1-based) and record its tap. Returns the
            features flowing onward, replicating each reference forward:
              conv: tap = fcm(h);     out = h + tap   (fcm_1 adds back onto z)
              res:  out = resblock(h); tap = out       (residual inside block)
              attn: out = transenc(h); tap = out  (fcm_4 is a ResnetBlock)
            """
            name = f"fcm_{i}"
            c = h.shape[-1]
            # the first conv-FCM block uses the configurable group count
            # (reference: models/codec.py:725, --num_groups)
            groups = cfg.num_groups if i == 1 else 32
            if self.fcm_kind == FCM_CONV:
                t = NonResnetBlock(c, cfg.dropout, num_groups=groups,
                                   dtype=self.dtype, name=name)(h, train=train)
                tap(t, i - 1)
                return h + t
            if self.fcm_kind == FCM_RES:
                out = ResnetBlock(c, cfg.dropout, dtype=self.dtype,
                                  name=name)(h, train=train)
                tap(out, i - 1)
                return out
            if self.fcm_kind == FCM_ATTN:
                if i < 4:
                    out = TransEncoderBlock(c, dropout=cfg.attn_fcm_dropout,
                                            dtype=self.dtype,
                                            name=name)(h, train=train)
                else:
                    out = ResnetBlock(c, dropout=cfg.attn_fcm_dropout,
                                      dtype=self.dtype,
                                      name=name)(h, train=train)
                tap(out, i - 1)
                return out
            raise ValueError(self.fcm_kind)

        z = z.astype(self.dtype)
        block_in = cfg.base_channels * cfg.ch_mult[-1]

        if self.fcm_kind == FCM_NONE:
            # plain taming decoder: extra 1x1 quant_conv_in, taps are the
            # stage outputs (reference: models/codec.py:453-465)
            h = conv1x1(cfg.z_channels, self.dtype, name="quant_conv_in")(z)
            tap(h, 0)
            h = conv3x3(block_in, self.dtype, name="conv_in")(h)
            tap(h, 1)
        else:
            h = fcm(z, 1)
            h = conv3x3(block_in, self.dtype, name="conv_in")(h)
            h = fcm(h, 2)

        # middle
        h = ResnetBlock(block_in, cfg.dropout, dtype=self.dtype, name="mid_0")(h, train=train)
        h = AttnBlock(block_in, dtype=self.dtype, name="mid_1")(h)
        h = ResnetBlock(block_in, cfg.dropout, dtype=self.dtype, name="mid_2")(h, train=train)
        if self.fcm_kind == FCM_NONE:
            tap(h, 2)
        else:
            h = fcm(h, 3)

        # up stack
        curr_res = cfg.resolution // 2 ** (len(cfg.ch_mult) - 1)
        blk = 0
        for level in reversed(range(len(cfg.ch_mult))):
            block_out = cfg.base_channels * cfg.ch_mult[level]
            for _ in range(cfg.num_res_blocks + 1):
                h = ResnetBlock(block_out, cfg.dropout, dtype=self.dtype,
                                name=f"up_{blk}")(h, train=train)
                blk += 1
                if curr_res in cfg.attn_resolutions:
                    h = AttnBlock(block_out, dtype=self.dtype, name=f"up_{blk}")(h)
                    blk += 1
            if level != 0:
                h = Upsample(block_out, dtype=self.dtype, name=f"up_{blk}")(h)
                blk += 1
                curr_res *= 2

        if self.fcm_kind == FCM_NONE:
            tap(h, 3)
        else:
            h = fcm(h, 4)

        # final: GN -> SiLU -> 3x3 conv to RGB
        h = group_norm_silu(32, name="final_norm", dtype=self.dtype)(h)
        h_pre = h
        x = conv3x3(cfg.out_channels, self.dtype, name="final_conv")(h_pre)
        return x.astype(jnp.float32), taps, h_pre
