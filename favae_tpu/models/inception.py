"""FID InceptionV3 (pool3 features) in flax + torch weight converter hooks.

reference: losses/inception.py:22-334 — the pytorch-fid InceptionV3 wrapper
(offline rFID evaluation utility; never wired into the reference trainers).
This is the standard torchvision InceptionV3 graph up to the final average
pool (2048-d "pool3" features), with the FID-specific quirks preserved:

* input resized to 299x299 (bilinear, no antialias in pytorch-fid),
  scaled from [-1, 1] (pytorch-fid's normalize_input maps [0,1] -> [-1,1];
  our pipeline already produces [-1, 1]);
* BatchNorm with eps 1e-3, no conv biases.

Weights come from the pytorch-fid checkpoint (pt_inception-2015-12-05) via
`favae_tpu.utils.torch_convert.convert_inception` — supply the file; there is
no network access in this environment.
"""

from __future__ import annotations

from typing import Any, List, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

FID_DIM = 2048


class ConvBN(nn.Module):
    features: int
    kernel: Sequence[int]
    strides: Sequence[int] = (1, 1)
    padding: Any = "SAME"
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.features, tuple(self.kernel), strides=tuple(self.strides),
                    padding=self.padding, use_bias=False, dtype=self.dtype,
                    name="conv")(x)
        x = nn.BatchNorm(use_running_average=True, epsilon=1e-3,
                         dtype=jnp.float32, name="bn")(x)
        return nn.relu(x)



def avg_pool_3x3_same(x, count_include_pad: bool):
    """3x3 stride-1 SAME average pool. pytorch-fid patches the in-block
    branch pools to count_include_pad=False (reference: losses/inception.py
    FIDInceptionA/C/E); torchvision default is True."""
    s = nn.avg_pool(x, (3, 3), (1, 1), "SAME", count_include_pad=count_include_pad)
    return s


def _pool(x, window, stride, padding="VALID", kind="max"):
    if kind == "max":
        return nn.max_pool(x, (window, window), (stride, stride), padding)
    return nn.avg_pool(x, (window, window), (stride, stride), padding)


class InceptionA(nn.Module):
    pool_features: int
    count_include_pad: bool = False
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        b1 = ConvBN(64, (1, 1), dtype=self.dtype, name="branch1x1")(x)
        b5 = ConvBN(48, (1, 1), dtype=self.dtype, name="branch5x5_1")(x)
        b5 = ConvBN(64, (5, 5), dtype=self.dtype, name="branch5x5_2")(b5)
        b3 = ConvBN(64, (1, 1), dtype=self.dtype, name="branch3x3dbl_1")(x)
        b3 = ConvBN(96, (3, 3), dtype=self.dtype, name="branch3x3dbl_2")(b3)
        b3 = ConvBN(96, (3, 3), dtype=self.dtype, name="branch3x3dbl_3")(b3)
        bp = avg_pool_3x3_same(x, self.count_include_pad)
        bp = ConvBN(self.pool_features, (1, 1), dtype=self.dtype,
                    name="branch_pool")(bp)
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        b3 = ConvBN(384, (3, 3), (2, 2), "VALID", dtype=self.dtype,
                    name="branch3x3")(x)
        bd = ConvBN(64, (1, 1), dtype=self.dtype, name="branch3x3dbl_1")(x)
        bd = ConvBN(96, (3, 3), dtype=self.dtype, name="branch3x3dbl_2")(bd)
        bd = ConvBN(96, (3, 3), (2, 2), "VALID", dtype=self.dtype,
                    name="branch3x3dbl_3")(bd)
        bp = _pool(x, 3, 2)
        return jnp.concatenate([b3, bd, bp], axis=-1)


class InceptionC(nn.Module):
    channels_7x7: int
    count_include_pad: bool = False
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        c7 = self.channels_7x7
        b1 = ConvBN(192, (1, 1), dtype=self.dtype, name="branch1x1")(x)
        b7 = ConvBN(c7, (1, 1), dtype=self.dtype, name="branch7x7_1")(x)
        b7 = ConvBN(c7, (1, 7), dtype=self.dtype, name="branch7x7_2")(b7)
        b7 = ConvBN(192, (7, 1), dtype=self.dtype, name="branch7x7_3")(b7)
        bd = ConvBN(c7, (1, 1), dtype=self.dtype, name="branch7x7dbl_1")(x)
        bd = ConvBN(c7, (7, 1), dtype=self.dtype, name="branch7x7dbl_2")(bd)
        bd = ConvBN(c7, (1, 7), dtype=self.dtype, name="branch7x7dbl_3")(bd)
        bd = ConvBN(c7, (7, 1), dtype=self.dtype, name="branch7x7dbl_4")(bd)
        bd = ConvBN(192, (1, 7), dtype=self.dtype, name="branch7x7dbl_5")(bd)
        bp = avg_pool_3x3_same(x, self.count_include_pad)
        bp = ConvBN(192, (1, 1), dtype=self.dtype, name="branch_pool")(bp)
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        b3 = ConvBN(192, (1, 1), dtype=self.dtype, name="branch3x3_1")(x)
        b3 = ConvBN(320, (3, 3), (2, 2), "VALID", dtype=self.dtype,
                    name="branch3x3_2")(b3)
        b7 = ConvBN(192, (1, 1), dtype=self.dtype, name="branch7x7x3_1")(x)
        b7 = ConvBN(192, (1, 7), dtype=self.dtype, name="branch7x7x3_2")(b7)
        b7 = ConvBN(192, (7, 1), dtype=self.dtype, name="branch7x7x3_3")(b7)
        b7 = ConvBN(192, (3, 3), (2, 2), "VALID", dtype=self.dtype,
                    name="branch7x7x3_4")(b7)
        bp = _pool(x, 3, 2)
        return jnp.concatenate([b3, b7, bp], axis=-1)


class InceptionE(nn.Module):
    """FID variant: the second E block uses max pooling in pytorch-fid
    (reference: losses/inception.py FIDInceptionE_2)."""

    pool_kind: str = "avg"
    count_include_pad: bool = False
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        b1 = ConvBN(320, (1, 1), dtype=self.dtype, name="branch1x1")(x)
        b3 = ConvBN(384, (1, 1), dtype=self.dtype, name="branch3x3_1")(x)
        b3a = ConvBN(384, (1, 3), dtype=self.dtype, name="branch3x3_2a")(b3)
        b3b = ConvBN(384, (3, 1), dtype=self.dtype, name="branch3x3_2b")(b3)
        b3 = jnp.concatenate([b3a, b3b], axis=-1)
        bd = ConvBN(448, (1, 1), dtype=self.dtype, name="branch3x3dbl_1")(x)
        bd = ConvBN(384, (3, 3), dtype=self.dtype, name="branch3x3dbl_2")(bd)
        bda = ConvBN(384, (1, 3), dtype=self.dtype, name="branch3x3dbl_3a")(bd)
        bdb = ConvBN(384, (3, 1), dtype=self.dtype, name="branch3x3dbl_3b")(bd)
        bd = jnp.concatenate([bda, bdb], axis=-1)
        if self.pool_kind == "avg":
            bp = avg_pool_3x3_same(x, self.count_include_pad)
        else:
            bp = nn.max_pool(x, (3, 3), (1, 1), "SAME")
        bp = ConvBN(192, (1, 1), dtype=self.dtype, name="branch_pool")(bp)
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class InceptionV3FID(nn.Module):
    """pool3 (2048-d) feature extractor. Input: NHWC in [-1, 1], any spatial
    size (resized to 299 internally)."""

    dtype: Any = jnp.bfloat16
    resize_input: bool = True
    # False = pytorch-fid semantics; True = plain torchvision inception
    count_include_pad: bool = False

    @nn.compact
    def __call__(self, x):
        x = x.astype(jnp.float32)
        if self.resize_input:
            n = x.shape[0]
            x = jax.image.resize(x, (n, 299, 299, 3), method="bilinear")
        x = x.astype(self.dtype)
        x = ConvBN(32, (3, 3), (2, 2), "VALID", dtype=self.dtype,
                   name="Conv2d_1a_3x3")(x)
        x = ConvBN(32, (3, 3), padding="VALID", dtype=self.dtype,
                   name="Conv2d_2a_3x3")(x)
        x = ConvBN(64, (3, 3), dtype=self.dtype, name="Conv2d_2b_3x3")(x)
        x = _pool(x, 3, 2)
        x = ConvBN(80, (1, 1), padding="VALID", dtype=self.dtype,
                   name="Conv2d_3b_1x1")(x)
        x = ConvBN(192, (3, 3), padding="VALID", dtype=self.dtype,
                   name="Conv2d_4a_3x3")(x)
        x = _pool(x, 3, 2)
        cip = self.count_include_pad
        x = InceptionA(32, cip, dtype=self.dtype, name="Mixed_5b")(x)
        x = InceptionA(64, cip, dtype=self.dtype, name="Mixed_5c")(x)
        x = InceptionA(64, cip, dtype=self.dtype, name="Mixed_5d")(x)
        x = InceptionB(dtype=self.dtype, name="Mixed_6a")(x)
        x = InceptionC(128, cip, dtype=self.dtype, name="Mixed_6b")(x)
        x = InceptionC(160, cip, dtype=self.dtype, name="Mixed_6c")(x)
        x = InceptionC(160, cip, dtype=self.dtype, name="Mixed_6d")(x)
        x = InceptionC(192, cip, dtype=self.dtype, name="Mixed_6e")(x)
        x = InceptionD(dtype=self.dtype, name="Mixed_7a")(x)
        x = InceptionE("avg", cip, dtype=self.dtype, name="Mixed_7b")(x)
        x = InceptionE("max", cip, dtype=self.dtype, name="Mixed_7c")(x)
        x = jnp.mean(x, axis=(1, 2))  # global average pool -> (N, 2048)
        return x.astype(jnp.float32)


def frechet_distance(mu1, sigma1, mu2, sigma2, eps: float = 1e-6):
    """FID between two Gaussians, numpy (host-side; needs sqrtm)."""
    import numpy as np
    import scipy.linalg

    diff = mu1 - mu2
    covmean, _ = scipy.linalg.sqrtm(sigma1 @ sigma2, disp=False)
    if not np.isfinite(covmean).all():
        offset = np.eye(sigma1.shape[0]) * eps
        covmean = scipy.linalg.sqrtm((sigma1 + offset) @ (sigma2 + offset))
    if np.iscomplexobj(covmean):
        covmean = covmean.real
    return float(diff @ diff + np.trace(sigma1) + np.trace(sigma2)
                 - 2 * np.trace(covmean))


def fid_from_features(feats_a, feats_b) -> float:
    import numpy as np
    a = np.asarray(feats_a, np.float64)
    b = np.asarray(feats_b, np.float64)
    return frechet_distance(a.mean(0), np.cov(a, rowvar=False),
                            b.mean(0), np.cov(b, rowvar=False))
