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


class TorchBatchNorm(nn.Module):
    """BatchNorm2d with torch semantics (reference: models/discriminator.py
    BatchNorm layers). Differences vs flax nn.BatchNorm that matter for
    checkpoint parity:

    * the running variance is updated with the UNBIASED batch variance
      (torch multiplies by n/(n-1)); flax uses the biased one — a ~n/(n-1)
      relative drift per update that test_train_step_parity catches on small
      feature maps.
    * running stats always fp32; normalization math fp32 regardless of the
      compute dtype.

    Param/stat names match nn.BatchNorm (scale/bias, mean/var) so the torch
    checkpoint converter is unchanged.
    """

    momentum: float = 0.9       # torch momentum 0.1: new = 0.9*old + 0.1*batch
    epsilon: float = 1e-5
    dtype: Any = jnp.float32
    scale_init: Any = nn.initializers.ones

    @nn.compact
    def __call__(self, x, *, use_running_average: bool):
        feats = x.shape[-1]
        scale = self.param("scale", self.scale_init, (feats,))
        bias = self.param("bias", nn.initializers.zeros, (feats,))
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((feats,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((feats,), jnp.float32))
        x32 = x.astype(jnp.float32)
        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            axes = tuple(range(x.ndim - 1))
            mean = jnp.mean(x32, axis=axes)
            var = jnp.mean(jnp.square(x32 - mean), axis=axes)  # biased: normalization
            if not self.is_initializing():
                n = x32.size // feats
                unbiased = var * (n / max(n - 1, 1))
                m = self.momentum
                ra_mean.value = m * ra_mean.value + (1 - m) * mean
                ra_var.value = m * ra_var.value + (1 - m) * unbiased
        y = (x32 - mean) * jax.lax.rsqrt(var + self.epsilon)
        return (y * scale + bias).astype(self.dtype)


class ActNorm(nn.Module):
    """Per-channel affine with data-dependent init (reference:
    models/discriminator.py:53-138). loc/scale are trainable params; the
    reference initializes them from the FIRST forward's input (loc = -mean,
    scale = 1/(std + 1e-6) per channel, discriminator.py:67-86).

    Functional translation: calling with `data_init=True` computes the init
    values from this layer's input, uses them for the output (so downstream
    ActNorms see correctly-initialized activations, preserving the reference's
    sequential init semantics), and sows them into the `actnorm_init`
    collection. The trainer folds the sown values into the params before the
    first optimizer step (see FavaeTrainer._data_dependent_init)."""

    num_features: int

    @nn.compact
    def __call__(self, x, *, data_init: bool = False):
        loc = self.param("loc", nn.initializers.zeros, (self.num_features,))
        scale = self.param("scale", nn.initializers.ones, (self.num_features,))
        if data_init:
            loc, scale = ActNorm.batch_init_values(x)
            self.sow("actnorm_init", "loc", loc, reduce_fn=lambda _, v: v)
            self.sow("actnorm_init", "scale", scale, reduce_fn=lambda _, v: v)
        return scale * (x + loc)

    @staticmethod
    def batch_init_values(x):
        """(loc, scale) from a batch, matching reference initialize():
        loc = -mean, scale = 1/(std + 1e-6), per channel over N,H,W."""
        x = x.astype(jnp.float32)
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
            h = TorchBatchNorm(dtype=self.dtype, scale_init=_bn_scale_init,
                               name=f"bn_{i}")(
                h, use_running_average=not train)
            h = nn.leaky_relu(h, 0.2)
        out = nn.Conv(1, (4, 4), strides=(1, 1), padding=((1, 1), (1, 1)),
                      kernel_init=_conv_init, dtype=self.dtype, name="head")(h)
        return out.astype(jnp.float32)


class PatchDiscriminator(nn.Module):
    """PatchGAN (reference: models/discriminator.py:141-190)."""

    cfg: DiscriminatorConfig
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, *, train: bool = False, data_init: bool = False):
        cfg = self.cfg
        ndf = cfg.base_channels
        nl = cfg.num_layers
        use_bias = cfg.use_actnorm  # BatchNorm branch disables conv bias
        x = x.astype(self.dtype)

        def norm(h, feats, name):
            if cfg.use_actnorm:
                return ActNorm(feats, name=name)(h, data_init=data_init)
            return TorchBatchNorm(dtype=self.dtype, scale_init=_bn_scale_init,
                                  name=name)(h, use_running_average=not train)

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
