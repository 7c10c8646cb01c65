"""Serving decode engine vs GPT.sample (the reference-faithful sampler).

The bf16 engine must be token-exact: it replicates GPT.sample's math
op-for-op over the scan-stacked params. The int8 path is lossy by design;
it is pinned for shape/validity and for closeness of one step's logits.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from favae_tpu.config import GPTConfig
from favae_tpu.models.decode_engine import (
    quantize_decode_params,
    sample_tokens,
)
from favae_tpu.models.gpt import GPT


@pytest.fixture(scope="module")
def small_gpt():
    cfg = GPTConfig(vocab_size=64, n_layer=2, n_embed=64, n_head=4,
                    dim_head=16, n_cond_embed=32, image_encoded_dim=4,
                    max_text_len=7, dropout=0.0)
    gpt = GPT(cfg)
    n = cfg.image_encoded_dim ** 2
    ids = jnp.zeros((1, n - 1), jnp.int32)
    txt = jnp.zeros((1, 7, 32), jnp.float32)
    mask = jnp.ones((1, 7), bool)
    params = gpt.init(jax.random.PRNGKey(0), ids, txt, mask,
                      cond_drop_prob=0.0)["params"]
    return cfg, gpt, params


def _inputs(cfg, b=2, seed=1):
    rng = np.random.RandomState(seed)
    embeds = jnp.asarray(rng.randn(b, 7, 32).astype(np.float32))
    mask = jnp.asarray(rng.rand(b, 7) > 0.2)
    return embeds, mask


@pytest.mark.parametrize("top_k,top_p,cond_scale", [(None, 1.0, 3.0),
                                                    (8, 0.9, 1.0)])
def test_engine_matches_gpt_sample(small_gpt, top_k, top_p, cond_scale):
    cfg, gpt, params = small_gpt
    embeds, mask = _inputs(cfg)
    key = jax.random.PRNGKey(42)
    ref = gpt.apply({"params": params}, embeds, mask, rng=key,
                    temperature=1.0, top_k=top_k, top_p=top_p,
                    cond_scale=cond_scale, method=GPT.sample)
    eng = sample_tokens(cfg, params, embeds, mask, rng=key, temperature=1.0,
                        top_k=top_k, top_p=top_p, cond_scale=cond_scale)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(eng))


def test_engine_int8_runs_and_is_close(small_gpt):
    cfg, gpt, params = small_gpt
    embeds, mask = _inputs(cfg)
    key = jax.random.PRNGKey(7)
    qp = quantize_decode_params(params)
    toks = sample_tokens(cfg, params, embeds, mask, rng=key, qparams=qp,
                         top_k=None, top_p=1.0, cond_scale=3.0)
    assert toks.shape == (2, cfg.image_encoded_dim, cfg.image_encoded_dim)
    assert int(jnp.min(toks)) >= 0 and int(jnp.max(toks)) < cfg.vocab_size
    # int8 is lossy but the random-init logits are diffuse; most sampled
    # tokens should still agree with the bf16 engine under the same gumbel
    # noise (quantization rel err ~1e-2 per matmul)
    ref = sample_tokens(cfg, params, embeds, mask, rng=key, top_k=None,
                        top_p=1.0, cond_scale=3.0)
    agree = float(jnp.mean((toks == ref).astype(jnp.float32)))
    assert agree > 0.5, f"token agreement {agree}"


def test_sample_tokens_audit_hooks(small_gpt):
    """forced_tokens + return_logits (the int8-quality-audit hooks,
    scripts/int8_decode_quality.py): teacher-forcing the engine with its own
    sampled grid must reproduce identical logits and identical free samples
    (same contexts, same rng), and the logits trace carries (b, S, vocab)."""
    cfg, gpt, params = small_gpt
    embeds, mask = _inputs(cfg)
    key = jax.random.PRNGKey(11)
    grid, logits = sample_tokens(cfg, params, embeds, mask, rng=key,
                                 top_k=8, top_p=0.9, cond_scale=3.0,
                                 return_logits=True)
    s = cfg.image_encoded_dim ** 2
    assert logits.shape == (2, s, cfg.vocab_size)
    grid2, logits2 = sample_tokens(cfg, params, embeds, mask, rng=key,
                                   top_k=8, top_p=0.9, cond_scale=3.0,
                                   forced_tokens=grid.reshape(2, -1),
                                   return_logits=True)
    np.testing.assert_array_equal(np.asarray(grid), np.asarray(grid2))
    np.testing.assert_allclose(np.asarray(logits), np.asarray(logits2),
                               atol=1e-5)
    # plain call (no hooks) is unchanged by the plumbing
    plain = sample_tokens(cfg, params, embeds, mask, rng=key,
                          top_k=8, top_p=0.9, cond_scale=3.0)
    np.testing.assert_array_equal(np.asarray(grid), np.asarray(plain))


def test_quantize_decode_params_shapes(small_gpt):
    cfg, _, params = small_gpt
    qp = quantize_decode_params(params)
    wq, s = qp["ffn"]["w1q"], qp["ffn"]["s1"]
    L, K, N = wq.shape
    assert L == cfg.n_layer and K == cfg.n_embed and N == 4 * cfg.n_embed
    assert wq.dtype == jnp.int8 and s.shape == (L, 1, N)
    # dequantized fc1 weights close to the originals
    w = params["blocks"]["ff"]["fc1"]["kernel"]
    back = wq.astype(np.float32) * s
    np.testing.assert_allclose(np.asarray(back), np.asarray(w), atol=2e-2)


def test_ffn_int8_kernel_matches_reference():
    """Fused FFN kernel vs the plain composition (LN->fc1->gelu->LN->fc2->+x)
    with the same int8-dequantized weights — pins the folded-mid-LN algebra."""
    from favae_tpu.ops.ffn_int8 import ffn_block_int8, prepare_ffn_weights

    rng = np.random.RandomState(3)
    rows, k, f = 8, 256, 1024
    x = jnp.asarray(rng.randn(rows, k).astype(np.float32)).astype(jnp.bfloat16)
    g_in = jnp.asarray(rng.randn(k).astype(np.float32))
    g_mid = jnp.asarray(rng.randn(f).astype(np.float32))
    w1 = jnp.asarray(rng.randn(k, f).astype(np.float32) * 0.05)
    w2 = jnp.asarray(rng.randn(f, k).astype(np.float32) * 0.05)

    prep = prepare_ffn_weights(w1, g_mid, w2)
    y = ffn_block_int8(x, g_in, prep, interpret=True)

    def ln(t, scale, eps=1e-5):
        tf = t.astype(jnp.float32)
        mu = jnp.mean(tf, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(tf - mu), axis=-1, keepdims=True)
        return (tf - mu) * jax.lax.rsqrt(var + eps) * scale

    w1d = prep["w1q"].astype(jnp.float32) * prep["s1"]
    w2d = prep["w2q"].astype(jnp.float32) * prep["s2"]  # gamma_mid folded
    h = jnp.dot(ln(x, g_in).astype(jnp.bfloat16).astype(jnp.float32), w1d)
    h = jax.nn.gelu(h, approximate=False)
    # folded mid-LN: inv * (h @ W2' - mu * colsum(W2'))
    mu = jnp.mean(h, axis=-1, keepdims=True)
    var = jnp.mean(h * h, axis=-1, keepdims=True) - mu * mu
    inv = jax.lax.rsqrt(var + 1e-5)
    out = inv * (jnp.dot(h, w2d) - mu * jnp.sum(w2d, axis=0, keepdims=True))
    y_ref = (x.astype(jnp.float32) + out)

    err = np.max(np.abs(np.asarray(y, np.float32) - np.asarray(y_ref)))
    scale = np.max(np.abs(np.asarray(y_ref)))
    assert err / scale < 0.02, (err, scale)
