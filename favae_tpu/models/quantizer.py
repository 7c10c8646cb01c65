"""Vector quantizer with EMA codebooks as explicit functional state.

TPU-native re-design of the vendored lucidrains quantizer
(reference: models/l2_quantize.py). Differences by design:

* Codebook EMA state (embed / cluster_size / embed_avg) is a pytree carried
  through the train step and returned updated — no mutable buffers. Under
  jit-SPMD the stats reductions over the sharded batch are inserted by XLA
  (the functional equivalent of the reference's raw torch.distributed
  all_reduce at models/l2_quantize.py:212,291-295,419,427).
* Dead-code expiry uses a static-size pool of candidate vectors drawn with a
  shared RNG key, so every replica computes the identical replacement —
  replacing the variably-sized all_gather/broadcast dance
  (models/l2_quantize.py:82-115).
* The vendored EuclideanCodebook never EMA-updates `embed_avg` before
  normalizing (models/l2_quantize.py:299 uses the stale init value). We
  default to the corrected update; `compat_stale_embed_avg=True` reproduces
  the reference behavior bit-for-bit.
* All math is float32 regardless of the codec compute dtype, matching the
  reference's @autocast(enabled=False) (models/l2_quantize.py:264,391).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn
from flax import struct

from favae_tpu.config import QuantizerConfig


def l2norm(t, eps: float = 1e-12):
    # torch F.normalize semantics: x / max(||x||, eps)
    n = jnp.linalg.norm(t, axis=-1, keepdims=True)
    return t / jnp.maximum(n, eps)


def laplace_smoothing(x, n_categories: int, eps: float = 1e-5):
    return (x + eps) / (jnp.sum(x, axis=-1, keepdims=True) + n_categories * eps)


def gumbel_sample(logits, rng, temperature: float = 0.0, axis: int = -1):
    """argmax when temperature == 0, else gumbel-perturbed argmax
    (reference: models/l2_quantize.py:39-43)."""
    if temperature == 0.0:
        return jnp.argmax(logits, axis=axis)
    noise = jax.random.gumbel(rng, logits.shape, dtype=logits.dtype)
    return jnp.argmax(logits / temperature + noise, axis=axis)


def orthogonal_loss_fn(codes):
    """((C_n C_n^T - I)^2).sum / n^2 over l2-normalized codes
    (reference: models/l2_quantize.py:174-179, single codebook)."""
    n = codes.shape[0]
    normed = l2norm(codes)
    sim = normed @ normed.T
    eye = jnp.eye(n, dtype=sim.dtype)
    return jnp.sum((sim - eye) ** 2) / (n * n)


def masked_orthogonal_loss_fn(codes, active_mask):
    """Orthogonal loss restricted to active codes with static shapes: sums
    (sim_ij - delta_ij)^2 over active x active pairs and divides by
    n_active^2 — equivalent to slicing out the active codes
    (reference: models/l2_quantize.py:566-577) without dynamic shapes."""
    normed = l2norm(codes)
    sim = normed @ normed.T
    k = codes.shape[0]
    eye = jnp.eye(k, dtype=sim.dtype)
    m = active_mask.astype(sim.dtype)
    pair_mask = m[:, None] * m[None, :]
    n_active = jnp.maximum(jnp.sum(m), 1.0)
    return jnp.sum(((sim - eye) ** 2) * pair_mask) / (n_active * n_active)


class CodebookState(struct.PyTreeNode):
    """Functional EMA state of one codebook (num_codebooks == 1 throughout the
    reference; kept as leading dim-free arrays here)."""

    embed: jax.Array          # (K, D) float32
    cluster_size: jax.Array   # (K,)  float32
    embed_avg: jax.Array      # (K, D) float32 (euclidean EMA numerator)


def init_codebook_state(cfg: QuantizerConfig, rng: jax.Array) -> CodebookState:
    d = cfg.codebook_dim or cfg.dim
    k = cfg.codebook_size
    # kaiming_uniform over (K, D): bound = sqrt(3) * sqrt(2/(1+5)) / sqrt(D)
    # = 1/sqrt(D) (torch kaiming_uniform_ default a=sqrt(5) on a (K, D) matrix,
    # reference: models/l2_quantize.py:30-33)
    bound = 1.0 / jnp.sqrt(jnp.float32(d))
    embed = jax.random.uniform(rng, (k, d), jnp.float32, -bound, bound)
    if cfg.use_cosine_sim:
        embed = l2norm(embed)  # (reference: models/l2_quantize.py:327)
    return CodebookState(
        embed=embed,
        cluster_size=jnp.zeros((k,), jnp.float32),
        embed_avg=embed.copy(),
    )


def kmeans(rng, samples, num_clusters: int, num_iters: int = 10,
           use_cosine_sim: bool = False):
    """Functional k-means for codebook init (reference:
    models/l2_quantize.py:124-164). `samples` is (N, D); returns (means, bins).
    Run eagerly on the first batch before training when kmeans_init=True."""
    n, d = samples.shape
    idx = jax.random.permutation(rng, n)[:num_clusters]
    means = samples[idx % n]

    def body(_, means):
        if use_cosine_sim:
            dists = samples @ means.T
        else:
            dists = -jnp.linalg.norm(
                samples[:, None, :] - means[None, :, :], axis=-1)
        buckets = jnp.argmax(dists, axis=-1)
        bins = jnp.zeros((num_clusters,), jnp.float32).at[buckets].add(1.0)
        sums = jnp.zeros_like(means).at[buckets].add(samples)
        new_means = sums / jnp.maximum(bins, 1.0)[:, None]
        if use_cosine_sim:
            new_means = l2norm(new_means)
        return jnp.where((bins == 0)[:, None], means, new_means)

    means = jax.lax.fori_loop(0, num_iters, body, means)
    if use_cosine_sim:
        dists = samples @ means.T
    else:
        dists = -jnp.linalg.norm(samples[:, None, :] - means[None, :, :], axis=-1)
    buckets = jnp.argmax(dists, axis=-1)
    bins = jnp.zeros((num_clusters,), jnp.float32).at[buckets].add(1.0)
    return means, bins


def _use_pallas_lookup(n: int, k: int) -> bool:
    """Auto-enable the fused Pallas lookup on TPU for large codebooks, where
    the XLA path would materialize an (N, K) score matrix."""
    if jax.default_backend() != "tpu":
        return False
    return n * k >= 1 << 22  # ~4M scores and up


def _nearest_codes(flatten: jax.Array, embed: jax.Array, use_cosine: bool,
                   rng: Optional[jax.Array], temperature: float) -> jax.Array:
    """Indices of nearest codebook entries. flatten (N, D), embed (K, D)."""
    n, _ = flatten.shape
    k = embed.shape[0]
    if temperature == 0.0 and _use_pallas_lookup(n, k):
        from favae_tpu.ops.vq_pallas import (vq_nearest_cosine,
                                             vq_nearest_euclidean)
        # argmax indices carry no gradient; stop_gradient keeps autodiff from
        # trying to build a JVP through the pallas_call
        f = jax.lax.stop_gradient(flatten)
        e = jax.lax.stop_gradient(embed)
        if use_cosine:
            return vq_nearest_cosine(f, e)
        return vq_nearest_euclidean(f, e)
    if use_cosine:
        dist = flatten @ embed.T  # both l2-normalized by caller
    else:
        # -||x - e||^2 ranks identically to -||x - e||; use the matmul form
        # (MXU) instead of cdist: ||x||^2 - 2 x.e + ||e||^2
        x2 = jnp.sum(flatten * flatten, axis=-1, keepdims=True)
        e2 = jnp.sum(embed * embed, axis=-1)
        dist = -(x2 - 2.0 * flatten @ embed.T + e2[None, :])
    if temperature > 0.0 and rng is not None:
        return gumbel_sample(dist, rng, temperature)
    return jnp.argmax(dist, axis=-1)


def _stats(flatten: jax.Array, idx: jax.Array, k: int):
    """Per-code counts and sums via scatter-add (N can exceed K; avoids the
    (N, K) one-hot matmul the reference uses at models/l2_quantize.py:412)."""
    bins = jnp.zeros((k,), jnp.float32).at[idx].add(1.0)
    sums = jnp.zeros((k, flatten.shape[-1]), jnp.float32).at[idx].add(flatten)
    return bins, sums


def _expire_dead_codes(cfg: QuantizerConfig, state: CodebookState,
                       flatten: jax.Array, rng: jax.Array) -> CodebookState:
    """Replace codes whose EMA cluster size fell below the threshold with
    random batch vectors (reference: models/l2_quantize.py:252-262,379-389).
    Static shapes: draw one candidate index per code from the local batch with
    a shared key; under SPMD each replica replaces with its local draw of the
    replicated decision mask (the subsequent EMA keeps books in sync since the
    mask is identical and candidates come from the same global-view batch)."""
    k = cfg.codebook_size
    expired = state.cluster_size < cfg.threshold_ema_dead_code
    n = flatten.shape[0]
    cand_idx = jax.random.randint(rng, (k,), 0, n)
    candidates = l2norm(flatten[cand_idx])  # reference l2norms replacements
    new_embed = jnp.where(expired[:, None], candidates, state.embed)
    new_cluster = jnp.where(expired, jnp.float32(cfg.threshold_ema_dead_code),
                            state.cluster_size)
    new_avg = jnp.where(expired[:, None],
                        candidates * cfg.threshold_ema_dead_code,
                        state.embed_avg)
    return state.replace(embed=new_embed, cluster_size=new_cluster,
                         embed_avg=new_avg)


def codebook_lookup(cfg: QuantizerConfig, state: CodebookState, x: jax.Array,
                    *, train: bool, rng: Optional[jax.Array] = None
                    ) -> Tuple[jax.Array, jax.Array, CodebookState]:
    """Quantize (N, D) float32 -> (quantize, indices, new_state).

    Cosine path: reference models/l2_quantize.py:391-444.
    Euclidean path: reference models/l2_quantize.py:264-306.
    """
    k = cfg.codebook_size
    x = x.astype(jnp.float32)
    decay = cfg.decay

    if cfg.use_cosine_sim:
        flatten = l2norm(x)
        embed_n = l2norm(state.embed)
        idx = _nearest_codes(flatten, embed_n, True, rng, cfg.sample_codebook_temp)
        quantize = state.embed[idx]

        if train:
            bins, embed_sum = _stats(flatten, idx, k)
            # under jit-SPMD these reductions over the (possibly sharded) token
            # axis are global automatically — no explicit psum needed.
            new_cluster = state.cluster_size * decay + bins * (1.0 - decay)
            zero_mask = bins == 0
            bins_safe = jnp.where(zero_mask, 1.0, bins)
            embed_normalized = l2norm(embed_sum / bins_safe[:, None])
            embed_normalized = jnp.where(zero_mask[:, None], embed_n,
                                         embed_normalized)
            new_embed = state.embed * decay + embed_normalized * (1.0 - decay)
            state = state.replace(embed=new_embed, cluster_size=new_cluster)
            if cfg.threshold_ema_dead_code > 0 and rng is not None:
                state = _expire_dead_codes(cfg, state, flatten,
                                           jax.random.fold_in(rng, 1))
    else:
        flatten = x
        idx = _nearest_codes(flatten, state.embed, False, rng,
                             cfg.sample_codebook_temp)
        quantize = state.embed[idx]

        if train:
            bins, embed_sum = _stats(flatten, idx, k)
            new_cluster = state.cluster_size * decay + bins * (1.0 - decay)
            if cfg.compat_stale_embed_avg:
                new_avg = state.embed_avg  # reference bug: never updated
            else:
                new_avg = state.embed_avg * decay + embed_sum * (1.0 - decay)
            smoothed = laplace_smoothing(new_cluster, k, cfg.eps) * jnp.sum(new_cluster)
            new_embed = new_avg / smoothed[:, None]
            state = state.replace(embed=new_embed, cluster_size=new_cluster,
                                  embed_avg=new_avg)
            if cfg.threshold_ema_dead_code > 0 and rng is not None:
                state = _expire_dead_codes(cfg, state, flatten,
                                           jax.random.fold_in(rng, 1))

    return quantize, idx, state


class VectorQuantize(nn.Module):
    """Image-fmap vector quantizer (reference: models/l2_quantize.py:448-595).

    Holds only the optional in/out projections as params; the codebook state
    flows through `__call__` explicitly. Input/output NHWC.
    """

    cfg: QuantizerConfig

    def setup(self):
        cfg = self.cfg
        needs_proj = cfg.codebook_dim is not None and cfg.codebook_dim != cfg.dim
        if needs_proj:
            self.project_in = nn.Dense(cfg.codebook_dim, dtype=jnp.float32)
            self.project_out = nn.Dense(cfg.dim, dtype=jnp.float32)
        else:
            self.project_in = None
            self.project_out = None

    def __call__(self, x, state: CodebookState, *, train: bool = False,
                 rng: Optional[jax.Array] = None):
        """x: (B, H, W, C=dim) -> (quantized (B,H,W,C), indices (B,H,W),
        loss (scalar), new_state)."""
        cfg = self.cfg
        b, h, w, c = x.shape
        x32 = x.astype(jnp.float32).reshape(b * h * w, c)

        z = self.project_in(x32) if self.project_in is not None else x32

        quantize, idx, new_state = codebook_lookup(cfg, state, z, train=train, rng=rng)

        loss = jnp.float32(0.0)
        if train:
            # straight-through (reference: models/l2_quantize.py:553-554)
            quantize = z + jax.lax.stop_gradient(quantize - z)
            if cfg.commitment_weight > 0:
                commit = jnp.mean((jax.lax.stop_gradient(quantize) - z) ** 2)
                loss = loss + commit * cfg.commitment_weight
            if cfg.orthogonal_reg_weight > 0:
                codes = new_state.embed
                if cfg.orthogonal_reg_active_codes_only:
                    active = jnp.zeros((cfg.codebook_size,), bool).at[idx].set(True)
                    ortho = masked_orthogonal_loss_fn(codes, active)
                elif (cfg.orthogonal_reg_max_codes is not None
                      and cfg.orthogonal_reg_max_codes < cfg.codebook_size
                      and rng is not None):
                    sel = jax.random.permutation(
                        jax.random.fold_in(rng, 2),
                        cfg.codebook_size)[: cfg.orthogonal_reg_max_codes]
                    ortho = orthogonal_loss_fn(codes[sel])
                else:
                    ortho = orthogonal_loss_fn(codes)
                loss = loss + ortho * cfg.orthogonal_reg_weight

        out = self.project_out(quantize) if self.project_out is not None else quantize
        out = out.reshape(b, h, w, cfg.dim)
        idx = idx.reshape(b, h, w)
        return out, idx, loss, new_state

    def decode_indices(self, indices, state: CodebookState):
        """Codebook entries for sampled indices, projected back to `dim`
        (reference: models/l2_quantize.py:518-530 get_codebook_entry, plus the
        missing project_out that the torch version skips because the published
        configs have no projection). indices: (B, H, W) -> (B, H, W, dim)."""
        z = state.embed[indices]
        if self.project_out is not None:
            z = self.project_out(z)
        return z
