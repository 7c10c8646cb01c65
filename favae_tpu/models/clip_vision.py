"""CLIP vision backbones in flax: ViT + ModifiedResNet.

reference: CLIP/clip/model.py —

* `VisionTransformer` (:208-243) with the repo's MODIFIED forward: instead of
  pooling only the CLS token it projects ALL token embeddings and returns
  `(ln_post(x) @ proj, cls)` (:236-243) so a consumer can cross-attend over
  the full 1+grid^2 token sequence, mirroring the modified `encode_text`.
* `ModifiedResNet` (:96-158): 3-conv stem with avgpool, anti-aliased strided
  Bottlenecks (:10-55), and an `AttentionPool2d` head (:58-93). Unmodified
  upstream — returns the pooled embedding only.

Both are frozen encoders: BatchNorm always runs on the converted running
stats. Weights load via `favae_tpu.utils.torch_convert.convert_clip_vision`
(ViT) / `convert_clip_resnet`.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from favae_tpu.config import CLIPResNetConfig, CLIPVisionConfig
from favae_tpu.models.clip_text import ResidualAttentionBlock
from favae_tpu.models.discriminator import TorchBatchNorm


class CLIPVisionTransformer(nn.Module):
    cfg: CLIPVisionConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        """x (B, R, R, 3) CLIP-normalized -> (token_embeds (B, 1+g^2, out),
        cls (B, out)). Modified forward per reference model.py:236-243."""
        c = self.cfg
        h = nn.Conv(c.width, (c.patch_size, c.patch_size),
                    strides=(c.patch_size, c.patch_size), padding="VALID",
                    use_bias=False, dtype=self.dtype,
                    name="conv1")(x.astype(self.dtype))
        b, gh, gw, w = h.shape
        h = h.reshape(b, gh * gw, w)
        cls = self.param("class_embedding",
                         nn.initializers.normal(c.width ** -0.5), (c.width,))
        h = jnp.concatenate(
            [jnp.broadcast_to(cls.astype(h.dtype), (b, 1, w)), h], axis=1)
        pos = self.param("positional_embedding",
                         nn.initializers.normal(c.width ** -0.5),
                         (gh * gw + 1, c.width))
        h = h + pos[None].astype(h.dtype)
        h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="ln_pre")(h)
        for i in range(c.layers):
            h = ResidualAttentionBlock(c.width, c.heads, dtype=self.dtype,
                                       name=f"resblock_{i}")(h)
        h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="ln_post")(h)
        proj = self.param("proj", nn.initializers.normal(c.width ** -0.5),
                          (c.width, c.output_dim))
        out = h.astype(jnp.float32) @ proj
        return out, out[:, 0]


def _bn(name: str):
    return TorchBatchNorm(dtype=jnp.float32, name=name)


def _avg_pool(x, s: int):
    return nn.avg_pool(x, (s, s), strides=(s, s))


class Bottleneck(nn.Module):
    """Anti-aliased ResNet bottleneck (reference: model.py:10-55): all convs
    stride 1; when stride > 1 an avgpool runs after conv2 and prefixes the
    downsample branch."""

    planes: int
    stride: int = 1
    expansion: int = 4

    @nn.compact
    def __call__(self, x):
        out_c = self.planes * self.expansion
        h = nn.Conv(self.planes, (1, 1), use_bias=False, name="conv1")(x)
        h = nn.relu(_bn("bn1")(h, use_running_average=True))
        h = nn.Conv(self.planes, (3, 3), padding=((1, 1), (1, 1)),
                    use_bias=False, name="conv2")(h)
        h = nn.relu(_bn("bn2")(h, use_running_average=True))
        if self.stride > 1:
            h = _avg_pool(h, self.stride)
        h = nn.Conv(out_c, (1, 1), use_bias=False, name="conv3")(h)
        h = _bn("bn3")(h, use_running_average=True)

        identity = x
        if self.stride > 1 or x.shape[-1] != out_c:
            identity = x if self.stride == 1 else _avg_pool(x, self.stride)
            identity = nn.Conv(out_c, (1, 1), use_bias=False,
                               name="downsample_conv")(identity)
            identity = _bn("downsample_bn")(identity, use_running_average=True)
        return nn.relu(h + identity)


class AttentionPool2d(nn.Module):
    """QKV attention pooling head (reference: model.py:58-93): prepend the
    spatial mean token, add positional embedding, one MHA step with the mean
    token as the only query."""

    embed_dim: int
    num_heads: int
    output_dim: int

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        t = x.reshape(b, h * w, c)
        t = jnp.concatenate([jnp.mean(t, axis=1, keepdims=True), t], axis=1)
        pos = self.param("positional_embedding",
                         nn.initializers.normal(self.embed_dim ** -0.5),
                         (h * w + 1, self.embed_dim))
        t = t + pos[None]
        q = nn.Dense(self.embed_dim, name="q_proj")(t[:, :1])
        k = nn.Dense(self.embed_dim, name="k_proj")(t)
        v = nn.Dense(self.embed_dim, name="v_proj")(t)
        nh = self.num_heads
        dh = self.embed_dim // nh
        q = q.reshape(b, 1, nh, dh)
        k = k.reshape(b, h * w + 1, nh, dh)
        v = v.reshape(b, h * w + 1, nh, dh)
        sim = jnp.einsum("bqhd,bkhd->bhqk", q, k) * (dh ** -0.5)
        att = jax.nn.softmax(sim, axis=-1)
        out = jnp.einsum("bhqk,bkhd->bqhd", att, v).reshape(b, 1, self.embed_dim)
        out = nn.Dense(self.output_dim, name="c_proj")(out)
        return out[:, 0]


class CLIPModifiedResNet(nn.Module):
    """reference: model.py:96-158. Frozen/eval only (running BN stats)."""

    cfg: CLIPResNetConfig

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        w = c.width
        x = x.astype(jnp.float32)
        # 3-conv stem
        h = nn.Conv(w // 2, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                    use_bias=False, name="conv1")(x)
        h = nn.relu(_bn("bn1")(h, use_running_average=True))
        h = nn.Conv(w // 2, (3, 3), padding=((1, 1), (1, 1)),
                    use_bias=False, name="conv2")(h)
        h = nn.relu(_bn("bn2")(h, use_running_average=True))
        h = nn.Conv(w, (3, 3), padding=((1, 1), (1, 1)),
                    use_bias=False, name="conv3")(h)
        h = nn.relu(_bn("bn3")(h, use_running_average=True))
        h = _avg_pool(h, 2)

        planes = (w, w * 2, w * 4, w * 8)
        for li, (p, blocks) in enumerate(zip(planes, c.layers), start=1):
            stride = 1 if li == 1 else 2
            h = Bottleneck(p, stride, name=f"layer{li}_0")(h)
            for bi in range(1, blocks):
                h = Bottleneck(p, 1, name=f"layer{li}_{bi}")(h)

        return AttentionPool2d(w * 32, c.heads, c.output_dim,
                               name="attnpool")(h)
