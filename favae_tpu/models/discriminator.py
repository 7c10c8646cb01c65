"""GAN discriminators (flax.linen, NHWC).

reference: models/discriminator.py —
* `Discriminator` (:193-218): 4x4 stride-2 convs + BatchNorm + LeakyReLU(0.2).
* `PatchDiscriminator` (:141-190): taming/pix2pix PatchGAN with configurable
  depth and optional ActNorm (:53-138); weights init normal(0, 0.02) (:44-50).

BatchNorm runs on per-shard batch statistics during training (`batch_stats`
collection), matching DDP semantics (DDP does not sync BN). ActNorm performs
data-dependent init on the first training batch via the `batch_stats`
collection holding (initialized, loc, scale is a param? -> loc/scale are
trainable params; the data-dependent init writes them once through
`actnorm_init` variables).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from favae_tpu.config import DiscriminatorConfig


def _conv_init(key, shape, dtype=jnp.float32):
    """normal(0, 0.02) — pix2pix weights_init (reference:
    models/discriminator.py:44-50), applied to all discriminator convs."""
    return jax.random.normal(key, shape, dtype) * 0.02


def _bn_scale_init(key, shape, dtype=jnp.float32):
    """BatchNorm gamma ~ normal(1, 0.02) (reference: discriminator.py:48-49)."""
    return 1.0 + jax.random.normal(key, shape, dtype) * 0.02


class ActNorm(nn.Module):
    """Per-channel affine with data-dependent init (reference:
    models/discriminator.py:53-138). loc/scale are trainable; on the first
    training call they are initialized from the batch mean/std. The
    initialized flag and the data-dependent values live in `batch_stats` and
    are folded into the params by the trainer after step 0 (simplest
    functional translation: we keep loc/scale as params initialized to 0/1 and
    expose `init_from_batch` for the trainer to call on the first batch)."""

    num_features: int

    @nn.compact
    def __call__(self, x):
        loc = self.param("loc", nn.initializers.zeros, (self.num_features,))
        scale = self.param("scale", nn.initializers.ones, (self.num_features,))
        return scale * (x + loc)

    @staticmethod
    def batch_init_values(x):
        """(loc, scale) from a batch, matching reference initialize():
        loc = -mean, scale = 1/(std + 1e-6), per channel over N,H,W."""
        mean = jnp.mean(x, axis=(0, 1, 2))
        std = jnp.std(x, axis=(0, 1, 2), ddof=1)
        return -mean, 1.0 / (std + 1e-6)


class Discriminator(nn.Module):
    """Default discriminator (reference: models/discriminator.py:193-218)."""

    cfg: DiscriminatorConfig
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        cfg = self.cfg
        ch = cfg.base_channels
        nl = cfg.num_layers
        x = x.astype(self.dtype)
        h = nn.Conv(ch, (4, 4), strides=(2, 2), padding=((1, 1), (1, 1)),
                    kernel_init=_conv_init, dtype=self.dtype, name="conv_in")(x)
        h = nn.leaky_relu(h, 0.2)
        chs = [ch * min(2 ** i, 8) for i in range(nl + 1)]
        for i in range(1, nl + 1):
            stride = 2 if i != nl else 1
            h = nn.Conv(chs[i], (4, 4), strides=(stride, stride),
                        padding=((1, 1), (1, 1)), use_bias=False,
                        kernel_init=_conv_init, dtype=self.dtype,
                        name=f"conv_{i}")(h)
            h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=jnp.float32,
                             scale_init=_bn_scale_init, name=f"bn_{i}")(h)
            h = nn.leaky_relu(h, 0.2)
        out = nn.Conv(1, (4, 4), strides=(1, 1), padding=((1, 1), (1, 1)),
                      kernel_init=_conv_init, dtype=self.dtype, name="head")(h)
        return out.astype(jnp.float32)


class PatchDiscriminator(nn.Module):
    """PatchGAN (reference: models/discriminator.py:141-190)."""

    cfg: DiscriminatorConfig
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        cfg = self.cfg
        ndf = cfg.base_channels
        nl = cfg.num_layers
        use_bias = cfg.use_actnorm  # BatchNorm branch disables conv bias
        x = x.astype(self.dtype)

        def norm(h, feats, name):
            if cfg.use_actnorm:
                return ActNorm(feats, name=name)(h)
            return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                epsilon=1e-5, dtype=jnp.float32,
                                scale_init=_bn_scale_init, name=name)(h)

        h = nn.Conv(ndf, (4, 4), strides=(2, 2), padding=((1, 1), (1, 1)),
                    kernel_init=_conv_init, dtype=self.dtype, name="conv_in")(x)
        h = nn.leaky_relu(h, 0.2)
        nf_mult = 1
        for n in range(1, nl):
            nf_mult = min(2 ** n, 8)
            h = nn.Conv(ndf * nf_mult, (4, 4), strides=(2, 2),
                        padding=((1, 1), (1, 1)), use_bias=use_bias,
                        kernel_init=_conv_init, dtype=self.dtype,
                        name=f"conv_{n}")(h)
            h = norm(h, ndf * nf_mult, f"norm_{n}")
            h = nn.leaky_relu(h, 0.2)
        nf_mult = min(2 ** nl, 8)
        h = nn.Conv(ndf * nf_mult, (4, 4), strides=(1, 1),
                    padding=((1, 1), (1, 1)), use_bias=use_bias,
                    kernel_init=_conv_init, dtype=self.dtype,
                    name=f"conv_{nl}")(h)
        h = norm(h, ndf * nf_mult, f"norm_{nl}")
        h = nn.leaky_relu(h, 0.2)
        out = nn.Conv(1, (4, 4), strides=(1, 1), padding=((1, 1), (1, 1)),
                      kernel_init=_conv_init, dtype=self.dtype, name="head")(h)
        return out.astype(jnp.float32)


def build_discriminator(cfg: DiscriminatorConfig, dtype=jnp.bfloat16):
    if cfg.kind == "patch":
        return PatchDiscriminator(cfg, dtype=dtype)
    return Discriminator(cfg, dtype=dtype)
