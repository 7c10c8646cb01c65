"""Whole-stack fused decode kernel vs the bf16 engine (interpret mode).

One Pallas launch per token runs all layers with int8 weights; at random
init the int8 error is small enough that the sampled tokens should match the
bf16 engine almost everywhere under identical gumbel noise.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from favae_tpu.config import GPTConfig
from favae_tpu.models.decode_engine import sample_tokens
from favae_tpu.ops.decode_step_kernel import (
    plan,
    prepare_fused_decode,
    supports,
)


@pytest.fixture(scope="module")
def gate_gpt():
    # smallest config satisfying the kernel gates: lane-aligned widths,
    # dim_head 64, rows % 8
    cfg = GPTConfig(vocab_size=64, n_layer=2, n_embed=128, n_head=2,
                    dim_head=64, n_cond_embed=32, image_encoded_dim=4,
                    max_text_len=7, dropout=0.0)
    from favae_tpu.models.gpt import GPT
    gpt = GPT(cfg)
    n = cfg.image_encoded_dim ** 2
    params = gpt.init(jax.random.PRNGKey(0), jnp.zeros((1, n - 1), jnp.int32),
                      jnp.zeros((1, 7, 32), jnp.float32),
                      jnp.ones((1, 7), bool), cond_drop_prob=0.0)["params"]
    return cfg, params


def test_supports_and_plan(gate_gpt):
    cfg, _ = gate_gpt
    assert supports(cfg, 8)
    assert not supports(cfg, 6)  # rows not a multiple of the group
    p = plan(cfg)
    assert p["n_phase"] == 2 * (p["nq"] + p["no"]) + p["n_ff"]


@pytest.mark.parametrize("top_k,top_p,cond_scale", [(None, 1.0, 3.0),
                                                    (8, 0.9, 1.0)])
def test_fused_matches_engine(gate_gpt, top_k, top_p, cond_scale):
    cfg, params = gate_gpt
    rng = np.random.RandomState(1)
    embeds = jnp.asarray(rng.randn(4, 7, 32).astype(np.float32))
    mask = jnp.asarray(rng.rand(4, 7) > 0.2)
    key = jax.random.PRNGKey(42)
    ref = sample_tokens(cfg, params, embeds, mask, rng=key, top_k=top_k,
                        top_p=top_p, cond_scale=cond_scale)
    fused = prepare_fused_decode(params, cfg)
    out = sample_tokens(cfg, params, embeds, mask, rng=key, top_k=top_k,
                        top_p=top_p, cond_scale=cond_scale, fused=fused)
    agree = float(jnp.mean((ref == out).astype(jnp.float32)))
    assert agree > 0.9, f"token agreement {agree}"


def test_prepared_weights_dequantize(gate_gpt):
    cfg, params = gate_gpt
    p = plan(cfg)
    fused = prepare_fused_decode(params, cfg)
    # first attn tile = first w-column chunk of self to_q
    w = params["blocks"]["self_attn"]["to_q"]["kernel"][0][:, : p["w"]]
    back = (fused["attn_t"][0, 0].astype(np.float32)
            * fused["attn_s"][0, 0])
    np.testing.assert_allclose(np.asarray(back), np.asarray(w), atol=2e-2)


def test_sample_images_quantized_pads_small_batches():
    """B=1 (2 CFG rows) is below the kernel's row-group size; sample_images
    pads the prompt batch to reach it and slices the outputs back."""
    from favae_tpu import config as C
    from favae_tpu.models.txt_cond import build_cat

    vq = C.VQGANConfig(
        codec=C.codec_for_downsample_factor(4, z_channels=8, base_channels=32,
                                            resolution=32),
        quantizer=C.QuantizerConfig(codebook_size=64, dim=8,
                                    use_cosine_sim=True),
        discriminator=C.DiscriminatorConfig(base_channels=32),
        fcm_kind="none", dsl_mode="none", compute_dtype="float32")
    gpt = C.GPTConfig(vocab_size=64, n_layer=2, n_embed=128, n_head=2,
                      dim_head=64, n_cond_embed=64, image_encoded_dim=8,
                      max_text_len=7, dropout=0.0)
    clip = C.CLIPTextConfig(context_length=7, vocab_size=100, width=64,
                            heads=2, layers=2, embed_dim=64)
    cfg = C.CATConfig(vqgan=vq, clip=clip, gpt=gpt)
    model, gpt_params = build_cat(cfg, jax.random.PRNGKey(0))
    ids = jnp.asarray(np.random.RandomState(0).randint(1, 90, (1, 7)),
                      jnp.int32)
    imgs, grid = model.sample_images(gpt_params, ids,
                                     rng=jax.random.PRNGKey(1),
                                     quantized=True)
    assert imgs.shape[0] == 1 and grid.shape == (1, 8, 8)
