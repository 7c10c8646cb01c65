"""Pallas fused VQ lookup vs the XLA reference formulation (interpret mode on
CPU; compiled path exercised on real TPU by bench/train)."""

import numpy as np
import jax.numpy as jnp
import pytest

from favae_tpu.models.quantizer import l2norm
from favae_tpu.ops.vq_pallas import (vq_nearest_cosine, vq_nearest_euclidean,
                                     vq_nearest_pallas)


@pytest.mark.parametrize("n,k,d", [(256, 1024, 64), (300, 1500, 32)])
def test_cosine_matches_xla(n, k, d):
    rng = np.random.RandomState(0)
    x = l2norm(jnp.asarray(rng.randn(n, d).astype(np.float32)))
    e = l2norm(jnp.asarray(rng.randn(k, d).astype(np.float32)))
    ref = np.asarray(jnp.argmax(x @ e.T, axis=-1))
    ours = np.asarray(vq_nearest_cosine(x, e, interpret=True))
    np.testing.assert_array_equal(ours, ref)


def test_euclidean_matches_cdist_argmin():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(256, 16).astype(np.float32))
    e = jnp.asarray(rng.randn(1024, 16).astype(np.float32))
    d2 = jnp.sum((x[:, None] - e[None]) ** 2, axis=-1)
    ref = np.asarray(jnp.argmin(d2, axis=-1))
    ours = np.asarray(vq_nearest_euclidean(x, e, interpret=True))
    np.testing.assert_array_equal(ours, ref)


def test_padding_codes_never_win():
    """With K not a tile multiple, padded (zero) codes must not be selected."""
    rng = np.random.RandomState(2)
    x = jnp.asarray(-np.abs(rng.randn(256, 8)).astype(np.float32))
    e = jnp.asarray(-np.abs(rng.randn(900, 8)).astype(np.float32))
    # all scores negative; a padded zero-code would score 0 and win wrongly
    ours = np.asarray(vq_nearest_pallas(x, e, interpret=True))
    assert ours.max() < 900
    ref = np.asarray(jnp.argmax(x @ e.T, axis=-1))
    np.testing.assert_array_equal(ours, ref)


def test_cosine_at_imagenet_f16_bench_shape():
    """The kernel's motivating scale (imagenet_f16: batch 16 x 16x16 grid =
    4096 tokens against K=16384 codes, D=256 — the (N, K) score matrix the
    fused kernel avoids materializing is 256 MB here): exact argmax parity
    with the XLA formulation, including the multi-tile K loop (16 K-tiles x
    16 N-tiles)."""
    rng = np.random.RandomState(7)
    x = l2norm(jnp.asarray(rng.randn(4096, 256).astype(np.float32)))
    e = l2norm(jnp.asarray(rng.randn(16384, 256).astype(np.float32)))
    ref = np.asarray(jnp.argmax(x @ e.T, axis=-1))
    ours = np.asarray(vq_nearest_cosine(x, e, interpret=True))
    np.testing.assert_array_equal(ours, ref)
