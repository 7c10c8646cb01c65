"""End-to-end FA-VAE train-step tests on a tiny config, including SPMD over
the virtual 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from favae_tpu.config import (
    DSL_NONPAIR, DSL_PAIR, FCM_CONV, FCM_RES,
    CodecConfig, DiscriminatorConfig, LossConfig, QuantizerConfig,
    TrainConfig, VQGANConfig,
)
from favae_tpu.models.lpips import LPIPS
from favae_tpu.models.vqgan import VQGANFCM
from favae_tpu.parallel.mesh import make_mesh, shard_batch, replicate_tree
from favae_tpu.train.favae_state import FavaeTrainState
from favae_tpu.train.favae_step import make_eval_step, make_train_step


def tiny_cfg(fcm=FCM_RES, dsl=DSL_NONPAIR, disc_kind="conv"):
    return VQGANConfig(
        codec=CodecConfig(base_channels=32, ch_mult=(1, 2), num_res_blocks=1,
                          attn_resolutions=(), resolution=32, z_channels=64),
        quantizer=QuantizerConfig(codebook_size=64, dim=64, use_cosine_sim=True),
        discriminator=DiscriminatorConfig(kind=disc_kind, num_layers=2),
        fcm_kind=fcm,
        dsl_mode=dsl,
        compute_dtype="float32",
    )


def tiny_losses():
    return LossConfig(gaussian_kernel=3, dsl_init_sigma=1.0,
                      disc_start_epochs=0, ffl_start_epochs=0)


def build(model_cfg, loss_cfg, **step_kw):
    train_cfg = TrainConfig(batch_size=8)
    state, model, tx_g, tx_d = FavaeTrainState.create(
        model_cfg, loss_cfg, train_cfg, jax.random.PRNGKey(0), lr=1e-4)
    lpips = LPIPS(dtype=jnp.float32)
    step = make_train_step(model, lpips, tx_g, tx_d, model_cfg, loss_cfg,
                           train_cfg, **step_kw)
    return state, model, lpips, step


@pytest.mark.parametrize("fcm,dsl", [(FCM_RES, DSL_NONPAIR), (FCM_CONV, DSL_PAIR)])
def test_train_step_runs_and_updates(fcm, dsl):
    model_cfg, loss_cfg = tiny_cfg(fcm, dsl), tiny_losses()
    state, model, lpips, step = build(model_cfg, loss_cfg,
                                      disc_on=True, ffl_on=True)
    x = jnp.asarray(np.random.RandomState(0).rand(8, 32, 32, 3).astype(np.float32) * 2 - 1)
    step = jax.jit(step)
    new_state, metrics = step(state, x, jax.random.PRNGKey(1))

    for k in ("loss_g", "loss_l1", "loss_perceptual", "loss_q", "loss_disc",
              "loss_d", "loss_ffl", "loss_dsl_features", "weight_d"):
        v = float(metrics[k])
        assert np.isfinite(v), (k, v)

    # codebook health telemetry (long-horizon stability monitoring): batch
    # usage in (0, 100], perplexity in [1, K]
    usage = float(metrics["cb_batch_usage_pct"])
    perp = float(metrics["cb_perplexity"])
    k_codes = model_cfg.quantizer.codebook_size
    assert 0.0 < usage <= 100.0
    assert 1.0 <= perp <= k_codes + 1e-3
    # perplexity can't exceed the number of distinct codes actually used
    assert perp <= usage / 100.0 * k_codes + 1e-3

    # generator params changed
    w0 = state.params_g["decoder"]["final_conv"]["kernel"]
    w1 = new_state.params_g["decoder"]["final_conv"]["kernel"]
    assert not np.allclose(np.asarray(w0), np.asarray(w1))
    # discriminator params changed
    d0 = jax.tree_util.tree_leaves(state.params_d)[0]
    d1 = jax.tree_util.tree_leaves(new_state.params_d)[0]
    assert not np.allclose(np.asarray(d0), np.asarray(d1))
    # codebook EMA advanced
    assert not np.allclose(np.asarray(state.cb_state.cluster_size),
                           np.asarray(new_state.cb_state.cluster_size))
    # learned sigmas exist and moved (nonpair: inside encoder/decoder)
    if dsl == DSL_NONPAIR:
        s0 = state.params_g["encoder"]["sigmas"]
        s1 = new_state.params_g["encoder"]["sigmas"]
        assert s0.shape == (4,)
        assert not np.allclose(np.asarray(s0), np.asarray(s1))
    else:
        # pair sigmas train on the dedicated 2e-7 lr: expect a tiny move
        s0 = np.asarray(state.params_g["sigmas"])
        s1 = np.asarray(new_state.params_g["sigmas"])
        assert (s0 != s1).any()
        assert np.max(np.abs(s0 - s1)) < 1e-5
    assert int(new_state.step) == 1


def test_train_step_no_disc_no_ffl():
    model_cfg, loss_cfg = tiny_cfg(), tiny_losses()
    state, model, lpips, step = build(model_cfg, loss_cfg,
                                      disc_on=False, ffl_on=False)
    x = jnp.asarray(np.random.RandomState(1).rand(8, 32, 32, 3).astype(np.float32) * 2 - 1)
    new_state, metrics = jax.jit(step)(state, x, jax.random.PRNGKey(1))
    assert float(metrics["loss_d"]) == 0.0
    assert float(metrics["weight_d"]) == 0.0
    # discriminator untouched
    d0 = jax.tree_util.tree_leaves(state.params_d)[0]
    d1 = jax.tree_util.tree_leaves(new_state.params_d)[0]
    np.testing.assert_array_equal(np.asarray(d0), np.asarray(d1))


def test_train_step_sharded_over_mesh():
    """Global-view step with batch sharded over 'dp' must run and produce the
    same losses as single-device execution."""
    model_cfg, loss_cfg = tiny_cfg(), tiny_losses()
    state, model, lpips, step = build(model_cfg, loss_cfg,
                                      disc_on=True, ffl_on=True)
    x_np = np.random.RandomState(2).rand(8, 32, 32, 3).astype(np.float32) * 2 - 1

    mesh = make_mesh(8)
    state_r = replicate_tree(state, mesh)
    x_sh = shard_batch(jnp.asarray(x_np), mesh)
    new_state_sh, m_sh = jax.jit(step)(state_r, x_sh, jax.random.PRNGKey(1))

    new_state_1, m_1 = jax.jit(step)(state, jnp.asarray(x_np), jax.random.PRNGKey(1))

    for k in ("loss_g", "loss_l1", "loss_q", "loss_d"):
        assert abs(float(m_sh[k]) - float(m_1[k])) < 1e-3, k
    np.testing.assert_allclose(
        np.asarray(new_state_sh.cb_state.cluster_size),
        np.asarray(new_state_1.cb_state.cluster_size), atol=1e-4)


def test_train_step_uint8_input_matches_f32():
    """A uint8 batch through the in-step normalize must match the f32 batch
    path (the loader's uint8 fast path changes transport, not math)."""
    model_cfg, loss_cfg = tiny_cfg(), tiny_losses()
    state, model, lpips, step = build(model_cfg, loss_cfg,
                                      disc_on=True, ffl_on=True)
    u8 = np.random.RandomState(6).randint(0, 256, (8, 32, 32, 3), np.uint8)
    f32 = u8.astype(np.float32) / 127.5 - 1.0
    jstep = jax.jit(step)
    _, m8 = jstep(state, jnp.asarray(u8), jax.random.PRNGKey(1))
    _, m32 = jstep(state, jnp.asarray(f32), jax.random.PRNGKey(1))
    for k in ("loss_g", "loss_l1", "loss_q", "loss_d"):
        assert abs(float(m8[k]) - float(m32[k])) < 1e-5, k


def test_eval_step():
    model_cfg, loss_cfg = tiny_cfg(), tiny_losses()
    state, model, lpips, _ = build(model_cfg, loss_cfg, disc_on=False, ffl_on=False)
    ev = jax.jit(make_eval_step(model, lpips, loss_cfg))
    x = jnp.asarray(np.random.RandomState(3).rand(4, 32, 32, 3).astype(np.float32) * 2 - 1)
    out = ev(state, x)
    assert out["x_recon"].shape == x.shape
    assert np.isfinite(float(out["loss_recon"]))
    # ch_mult=(1,2) -> downsample factor 2 -> 16x16 token grid at 32px
    assert out["indices"].shape == (4, 16, 16)


def test_train_step_patch_discriminator():
    """ImageNet-f16-style PatchGAN discriminator through both GAN stages."""
    model_cfg = tiny_cfg(FCM_CONV, DSL_PAIR, disc_kind="patch")
    loss_cfg = tiny_losses()
    state, model, lpips, step = build(model_cfg, loss_cfg,
                                      disc_on=True, ffl_on=True)
    x = jnp.asarray(np.random.RandomState(9).rand(8, 32, 32, 3)
                    .astype(np.float32) * 2 - 1)
    new_state, metrics = jax.jit(step)(state, x, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss_d"]))
    assert np.isfinite(float(metrics["loss_g"]))
    # BN running stats in the patch D must have moved
    bs0 = jax.tree_util.tree_leaves(state.batch_stats)
    bs1 = jax.tree_util.tree_leaves(new_state.batch_stats)
    assert any(not np.allclose(np.asarray(a), np.asarray(b))
               for a, b in zip(bs0, bs1))


def test_eval_step_sharded_metrics_are_global():
    """Validation metrics from a dp-sharded batch must equal the
    single-device global-batch values (multi-host runs must not silently
    report one shard's numbers — reference gathers across ranks,
    train_favae.py:210-219)."""
    model_cfg, loss_cfg = tiny_cfg(), tiny_losses()
    state, model, lpips, _ = build(model_cfg, loss_cfg, disc_on=False,
                                   ffl_on=False)
    ev = jax.jit(make_eval_step(model, lpips, loss_cfg))
    x_np = (np.random.RandomState(4).rand(8, 32, 32, 3).astype(np.float32)
            * 2 - 1)

    mesh = make_mesh(8)
    out_sh = ev(replicate_tree(state, mesh),
                shard_batch(jnp.asarray(x_np), mesh))
    out_1 = ev(state, jnp.asarray(x_np))
    for k in ("loss_l1", "loss_perceptual", "loss_recon"):
        assert abs(float(out_sh[k]) - float(out_1[k])) < 1e-4, k


def test_train_step_projection_quantizer_f4_style():
    """imagenet_f4-shaped path at tiny scale (reference launch:
    favae_scripts/train_favae_other_datasets_public.sh:24-30): z_channels 3
    feeding a PROJECTION quantizer (dim 3 -> codebook_dim 32), conv-FCM +
    pairwise DSL, narrow GroupNorm (num_groups=3 on the FCM block). Pins the
    full train step (both GAN stages + EMA in projected space) before the
    real-chip f4 bench exercises it at scale."""
    model_cfg = VQGANConfig(
        codec=CodecConfig(base_channels=32, ch_mult=(1, 2), num_res_blocks=1,
                          attn_resolutions=(), resolution=32, z_channels=3,
                          num_groups=3),
        quantizer=QuantizerConfig(codebook_size=64, dim=3, codebook_dim=32,
                                  use_cosine_sim=True),
        discriminator=DiscriminatorConfig(kind="conv", num_layers=2),
        fcm_kind=FCM_CONV, dsl_mode=DSL_PAIR, compute_dtype="float32")
    loss_cfg = tiny_losses()
    state, model, lpips, step = build(model_cfg, loss_cfg,
                                      disc_on=True, ffl_on=True)
    x = jnp.asarray(np.random.RandomState(0).rand(8, 32, 32, 3)
                    .astype(np.float32) * 2 - 1)
    step = jax.jit(step)
    s1, m1 = step(state, x, jax.random.PRNGKey(1))
    s2, m2 = step(s1, x, jax.random.PRNGKey(2))
    for mm in (m1, m2):
        for k in ("loss_g", "loss_l1", "loss_q", "loss_d", "weight_d",
                  "loss_dsl_features"):
            assert np.isfinite(float(mm[k])), (k, float(mm[k]))
    # codebook EMA moved in PROJECTED space (codebook_dim wide)
    assert s2.cb_state.embed.shape == (64, 32)
    assert not np.allclose(np.asarray(s2.cb_state.embed),
                           np.asarray(state.cb_state.embed))
    # projection params updated
    w0 = state.params_g["quantizer"]
    w2 = s2.params_g["quantizer"]
    leaves0 = jax.tree_util.tree_leaves(w0)
    leaves2 = jax.tree_util.tree_leaves(w2)
    assert any(not np.allclose(a, b) for a, b in zip(leaves0, leaves2))


def test_train_step_dead_code_replacement_telemetry():
    """With dead-code expiry enabled the step reports cb_replaced (count of
    codes whose EMA count was reset to EXACTLY the threshold this step —
    models/quantizer.py:_expire_dead_codes fingerprint). Fresh zero
    cluster_size means every code starts below threshold -> first step
    replaces plenty."""
    import dataclasses
    model_cfg = tiny_cfg()
    model_cfg = dataclasses.replace(
        model_cfg, quantizer=dataclasses.replace(
            model_cfg.quantizer, threshold_ema_dead_code=0.5))
    state, model, lpips, step = build(model_cfg, tiny_losses(),
                                      disc_on=False, ffl_on=False)
    x = jnp.asarray(np.random.RandomState(3).rand(8, 32, 32, 3)
                    .astype(np.float32) * 2 - 1)
    _, m = jax.jit(step)(state, x, jax.random.PRNGKey(1))
    assert "cb_replaced" in m
    v = float(m["cb_replaced"])
    assert np.isfinite(v) and 0 <= v <= model_cfg.quantizer.codebook_size
    assert v > 0  # zero-initialized EMA counts -> expiry must fire


def test_train_step_fast_stage1_reuse():
    """faithful_stage1_recompute=False — the opt-in fast path the chip queue
    benches as FAVAE_BENCH_FAST_STAGE1 (skips the reference-faithful D-step
    re-forward of the updated generator, train_favae.py:109-116). Pins its
    semantics against the faithful step from identical init/batch/rng:
    stage-0 losses match, the codebook EMA advances once per step instead of
    twice, and the fast variant still trains G and D over 3 steps."""
    model_cfg, loss_cfg = tiny_cfg(), tiny_losses()
    x = jnp.asarray(np.random.RandomState(0).rand(8, 32, 32, 3)
                    .astype(np.float32) * 2 - 1)

    results = {}
    for faithful in (True, False):
        train_cfg = TrainConfig(batch_size=8,
                                faithful_stage1_recompute=faithful)
        state, model, tx_g, tx_d = FavaeTrainState.create(
            model_cfg, loss_cfg, train_cfg, jax.random.PRNGKey(0), lr=1e-4)
        lpips = LPIPS(dtype=jnp.float32)
        step = jax.jit(make_train_step(model, lpips, tx_g, tx_d, model_cfg,
                                       loss_cfg, train_cfg,
                                       disc_on=True, ffl_on=True))
        s1, m1 = step(state, x, jax.random.PRNGKey(1))
        results[faithful] = (state, s1, m1)
        if not faithful:
            # keeps training: 3 steps on a fixed batch, all finite, D moves
            s, losses_d = s1, [float(m1["loss_d"])]
            for i in range(2):
                s, m = step(s, x, jax.random.PRNGKey(2 + i))
                for k in ("loss_g", "loss_l1", "loss_d", "weight_d"):
                    assert np.isfinite(float(m[k])), (k, float(m[k]))
                losses_d.append(float(m["loss_d"]))
            d0 = jax.tree_util.tree_leaves(state.params_d)[0]
            d1 = jax.tree_util.tree_leaves(s.params_d)[0]
            assert not np.allclose(np.asarray(d0), np.asarray(d1))

    (_, s_f, m_f) = results[True]
    (_, s_r, m_r) = results[False]
    # stage 0 is the same computation in both variants
    for k in ("loss_g", "loss_l1", "loss_q", "loss_disc", "weight_d"):
        np.testing.assert_allclose(float(m_f[k]), float(m_r[k]), rtol=1e-5,
                                   err_msg=k)
    # faithful runs the quantizer twice per step (second EMA advance under
    # the updated generator); fast runs it once
    assert not np.allclose(np.asarray(s_f.cb_state.cluster_size),
                           np.asarray(s_r.cb_state.cluster_size))
    # D sees a different recon (updated-G re-forward vs stage-0 reuse), so
    # its first update differs
    df = jax.tree_util.tree_leaves(s_f.params_d)[0]
    dr = jax.tree_util.tree_leaves(s_r.params_d)[0]
    assert not np.allclose(np.asarray(df), np.asarray(dr))


def test_favae_adam_mu_dtype_knob():
    """TrainConfig.adam_mu_dtype="bfloat16" stores Adam's first moment in
    bf16 for BOTH the generator and discriminator optimizers (mirror of
    CATConfig.adam_mu_dtype — a measured -17% step-time win there) and still
    trains; the default f32 keeps the reference's exact Adam dynamics and
    the two trajectories stay close over a few steps (mu rounding only —
    nu and params remain f32)."""
    model_cfg, loss_cfg = tiny_cfg(), tiny_losses()
    x = jnp.asarray(
        np.random.RandomState(0).rand(8, 32, 32, 3).astype(np.float32)
        * 2 - 1)
    final = {}
    for mu_dtype in ("float32", "bfloat16"):
        train_cfg = TrainConfig(batch_size=8, adam_mu_dtype=mu_dtype)
        state, model, tx_g, tx_d = FavaeTrainState.create(
            model_cfg, loss_cfg, train_cfg, jax.random.PRNGKey(0), lr=1e-4)
        want = jnp.dtype(mu_dtype)
        for opt in (state.opt_g, state.opt_d):
            leaves = [l for l in jax.tree_util.tree_leaves(opt)
                      if hasattr(l, "dtype") and l.ndim > 0]
            assert any(l.dtype == want for l in leaves)
        step = jax.jit(make_train_step(
            model, LPIPS(dtype=jnp.float32), tx_g, tx_d, model_cfg,
            loss_cfg, train_cfg, disc_on=True, ffl_on=True))
        losses = []
        for _ in range(3):
            state, m = step(state, x, jax.random.PRNGKey(1))
            losses.append(float(m["loss_g"]))
        assert all(np.isfinite(v) for v in losses)
        final[mu_dtype] = losses[-1]
    # same data/rng/init: bf16 mu perturbs the trajectory only slightly
    assert abs(final["bfloat16"] - final["float32"]) < 0.05 * max(
        1e-3, abs(final["float32"]))
