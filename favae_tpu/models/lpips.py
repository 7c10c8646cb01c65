"""LPIPS perceptual metric (VGG16 backbone) in flax.

reference: losses/lpips.py — ScalingLayer shift/scale, 5 VGG16 feature slices
(relu1_2, relu2_2, relu3_3, relu4_3, relu5_3), channel-unit-normalized feature
differences, 1x1 linear heads, spatial mean, summed over slices.

Weights: the reference loads a combined `vgg16_lpips.pt` (not shipped in the
repo; losses/lpips.py:14). `favae_tpu.utils.torch_convert.convert_lpips`
maps that torch state_dict onto this module's parameter tree. For tests and
synthetic benchmarks, random init is supported (the metric is then meaningless
but the compute graph is identical).
"""

from __future__ import annotations

from typing import Any, List

import jax.numpy as jnp
from flax import linen as nn

# VGG16 "features" conv layout: conv indices per slice, channels per conv.
# slice boundaries after relu1_2 (idx 3), relu2_2 (8), relu3_3 (15),
# relu4_3 (22), relu5_3 (29) of torchvision vgg16.features.
VGG_SLICES: List[List[int]] = [
    [64, 64],                 # slice1: conv1_1, conv1_2
    [128, 128],               # slice2
    [256, 256, 256],          # slice3
    [512, 512, 512],          # slice4
    [512, 512, 512],          # slice5
]
LPIPS_CHANNELS = [64, 128, 256, 512, 512]

# ImageNet-vs-[-1,1] shift/scale (reference: losses/lpips.py:55-62).
# Plain tuples, NOT jnp arrays: a module-level jnp constant is a device op at
# import time, which dials the TPU relay before any caller's backend
# probing/retry can run (this import crashed bench.py during a relay outage).
_SHIFT = (-0.030, -0.088, -0.188)
_SCALE = (0.458, 0.448, 0.450)


def max_pool_2x2(h):
    """2x2/stride-2 max pool via reshape + reduce, NHWC.

    Equivalent forward to `nn.max_pool(h, (2, 2), strides=(2, 2))` (floor
    semantics: odd trailing row/col dropped, like torch MaxPool2d). The point
    is the BACKWARD: reduce_window's VJP lowers to select-and-scatter, which
    is serial-ish on TPU (~4 ms/step in the r2 profile, the last recoverable
    fat in the faithful train step). jnp.max over an exposed window axis
    instead gets the eq-mask VJP — elementwise compare + broadcast that XLA
    fuses for free. Tie semantics differ only on exact float ties (eq-mask
    splits the cotangent across ties; select-and-scatter picks one) — measure
    zero after a conv, and irrelevant to the loss value itself.
    """
    n, H, W, c = h.shape
    h = h[:, : (H // 2) * 2, : (W // 2) * 2, :]
    h = h.reshape(n, H // 2, 2, W // 2, 2, c)
    return jnp.max(h, axis=(2, 4))


class VGG16Features(nn.Module):
    """VGG16 feature slices; input NHWC in [-1, 1]-normalized space already
    passed through the scaling layer. MaxPool between slices."""

    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        outs = []
        conv_idx = 0
        h = x.astype(self.dtype)
        for s, convs in enumerate(VGG_SLICES):
            if s > 0:
                h = max_pool_2x2(h)
            for c in convs:
                h = nn.Conv(c, (3, 3), padding=((1, 1), (1, 1)),
                            dtype=self.dtype, name=f"conv_{conv_idx}")(h)
                h = nn.relu(h)
                conv_idx += 1
            outs.append(h)
        return outs


def _scale_in(t):
    shift = jnp.asarray(_SHIFT, jnp.float32)
    scale = jnp.asarray(_SCALE, jnp.float32)
    return (t.astype(jnp.float32) - shift) / scale


def _unit_norm(t, eps=1e-10):
    t = t.astype(jnp.float32)
    n = jnp.sqrt(jnp.sum(t * t, axis=-1, keepdims=True))
    return t / (n + eps)


class LPIPS(nn.Module):
    """Learned perceptual metric. Returns per-sample distances (N,).

    `features(x)` / `dist(fx, y)` split the two VGG towers so a constant
    branch (the real image, fixed within a train step) can be computed once
    and shared between the stage-0 loss and the adaptive-weight tail —
    the train-step profile showed LPIPS at ~17% of device time, much of it
    duplicated VGG(x) evaluations."""

    dtype: Any = jnp.bfloat16

    def setup(self):
        self.vgg = VGG16Features(dtype=self.dtype, name="vgg")
        self.lin_heads = [
            nn.Conv(1, (1, 1), use_bias=False, dtype=jnp.float32,
                    name=f"lin{k}")
            for k in range(len(LPIPS_CHANNELS))
        ]

    def features(self, x):
        """Unit-normalized VGG feature pyramid of one image batch."""
        return [_unit_norm(f) for f in self.vgg(_scale_in(x))]

    def dist(self, fx_normed, y):
        """Distance given precomputed `features(x)` and a second image."""
        fy = self.vgg(_scale_in(y))
        total = 0.0
        for k in range(len(LPIPS_CHANNELS)):
            d = (fx_normed[k] - _unit_norm(fy[k])) ** 2
            total = total + jnp.mean(self.lin_heads[k](d), axis=(1, 2, 3))
        return total

    def __call__(self, x, y):
        return self.dist(self.features(x), y)
