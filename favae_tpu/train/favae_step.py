"""The FA-VAE train step: both GAN stages, all losses, codebook EMA, adaptive
discriminator weight — one jitted SPMD function.

Mirrors the reference hot loop (reference: favae_scripts/train_favae.py:56-116):

  stage 0 (generator): x -> E -> Q -> G -> D(fake);
      loss_g = L1 + pw*LPIPS + cw*loss_q
             [+ weight_d * dw * hinge_g]          (epoch >= disc_start_epochs)
             [+ FFL(x, x_recon) + DSL/SL tap FFL] (epoch >= ffl_start_epochs)
      Adam(0.5, 0.9) update of encoder+decoder+quantizer(+sigmas).
  stage 1 (discriminator): recompute recon with the *updated* generator
      (reference order: opt_g.step() happens before the stage-1 forward),
      hinge_d on D(x), D(sg(recon)); Adam update of D.

The adaptive weight weight_d = ||dL_recon/dW|| / (||dL_disc/dW|| + 1e-4)
clamped to [0, 1e4], W = the decoder's final RGB conv kernel (reference:
train_favae.py:32-39). Since the pre-final activation h_pre does not depend on
W, both grads come from one jax.vjp over the tiny tail graph
(final conv -> {L1+LPIPS, D}) instead of two full backward passes.

Epoch gates (disc_on, ffl_on) are Python statics: at most 4 compiled variants
per run, each free of dead branches.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from favae_tpu.config import DSL_PAIR, LossConfig, TrainConfig, VQGANConfig
from favae_tpu.models.lpips import LPIPS
from favae_tpu.models.vqgan import VQGANFCM
from favae_tpu.ops.ffl import feature_tap_ffl, focal_frequency_loss
from favae_tpu.ops.gaussian import gaussian_blur_nhwc
from favae_tpu.ops.losses import hinge_d_loss, hinge_g_loss
from favae_tpu.train.favae_state import FavaeTrainState, merge_params


def to_unit_range(x: jax.Array) -> jax.Array:
    """Accept uint8 [0,255] or float [-1,1] image batches; return f32 [-1,1].

    uint8 host->device transfer is the fast loader path: the 256px batch is
    4x smaller on the wire, and this normalize reproduces the reference
    transform ((img/255 - 0.5)/0.5, datasets/general_dataloader.py:32-37)
    bit-for-bit by using the same op sequence (divide, subtract, divide —
    a fused x*(1/127.5)-1 differs by up to 1 ulp over the 256 inputs); XLA
    fuses it into the first conv's prologue either way."""
    if x.dtype == jnp.uint8:
        xf = x.astype(jnp.float32) / 255.0
        return (xf - 0.5) / 0.5
    return x.astype(jnp.float32)


def _conv_same_nhwc(x, kernel, bias):
    """3x3 SAME conv matching flax nn.Conv used for the decoder's final_conv."""
    dn = jax.lax.conv_dimension_numbers(x.shape, kernel.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    y = jax.lax.conv_general_dilated(
        x, kernel, window_strides=(1, 1), padding="SAME", dimension_numbers=dn)
    return y + bias


def make_train_step(model: VQGANFCM, lpips_model, tx_g, tx_d,
                    model_cfg: VQGANConfig, loss_cfg: LossConfig,
                    train_cfg: TrainConfig, *, disc_on: bool, ffl_on: bool):
    """Build the jitted train step for one (disc_on, ffl_on) gate combination."""

    pw = loss_cfg.perceptual_weight
    cw = loss_cfg.codebook_weight
    dw = loss_cfg.disc_weight
    pair = model_cfg.dsl_mode == DSL_PAIR
    use_dsl = loss_cfg.dsl_weight > 0
    use_sl = loss_cfg.sl_weight > 0
    use_ffl_img = loss_cfg.ffl_weight > 0

    def _apply_disc(params, batch_stats, x, *, train):
        # full param tree: linen setup() materializes every submodule's params
        # on any method call, so partial trees are rejected. XLA dead-code
        # eliminates the unused generator params.
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        out = model.apply(variables, x, train=train,
                          method=VQGANFCM.discriminate,
                          mutable=["batch_stats"] if batch_stats else False)
        if batch_stats:
            logits, mutated = out
            return logits, mutated["batch_stats"]
        return out, batch_stats

    def train_step(state: FavaeTrainState, x: jax.Array, rng: jax.Array
                   ) -> Tuple[FavaeTrainState, Dict[str, jax.Array]]:
        x = to_unit_range(x)
        rng = jax.random.fold_in(rng, state.step)
        k_drop, k_vq0, k_vq1, k_drop1 = jax.random.split(rng, 4)
        metrics: Dict[str, jax.Array] = {}

        # VGG features of the real image are constant within the step: compute
        # the tower once and share it between the stage-0 perceptual loss and
        # the adaptive-weight tail (profile: LPIPS was ~17% of device time,
        # mostly duplicated VGG(x) forwards).
        fx_n = jax.lax.stop_gradient(lpips_model.apply(
            {"params": state.lpips_params}, x, method=LPIPS.features))

        def _lpips_dist(y):
            return jnp.mean(lpips_model.apply(
                {"params": state.lpips_params}, fx_n, y, method=LPIPS.dist))

        # ------------------------------------------------------------------
        # stage 0: generator update, with the backward split at the generator
        # outputs. jax.grad of a monolithic loss would work, but the adaptive
        # weight needs ∂loss_recon/∂W_last and ∂loss_disc/∂W_last separately
        # (reference: train_favae.py:32-39) BEFORE they are summed — a naive
        # tail recomputes VGG/D forward+backward just for those norms. Instead:
        #   1. one vjp over the generator body (encode→quantize→decode→taps),
        #   2. per-head grads at x_recon / tap level (each head backward runs
        #      exactly once: L1+LPIPS, hinge-G through D, FFL, DSL/SL),
        #   3. weight_d from two tiny dW convs of those head deltas against
        #      h_pre (chain rule through the final conv — identical math),
        #   4. one body backward with the weight_d-combined cotangent.
        # Nothing is evaluated twice; stage 0 runs exactly one D forward, like
        # the reference.
        # ------------------------------------------------------------------
        def stage0_body(params_g):
            variables = {"params": merge_params(params_g, state.params_d)}
            if state.batch_stats:
                variables["batch_stats"] = state.batch_stats
            outs = model.apply(
                variables, x, state.cb_state, train=True, rng=k_vq0,
                rngs={"dropout": k_drop}, method=VQGANFCM.generate,
                mutable=False)
            diff = (outs["x_recon"], outs["enc_feats"], outs["dec_feats"],
                    outs["loss_q"])
            return diff, (outs["cb_state"], outs["h_pre"], outs["indices"])

        diff_out, body_vjp, (cb_state1, h_pre, indices0) = jax.vjp(
            stage0_body, state.params_g, has_aux=True)
        x_recon0, enc_feats, dec_feats, loss_q = diff_out

        aux: Dict[str, jax.Array] = dict(loss_q=loss_q)

        # --- codebook health telemetry (long-horizon stability; the
        # reference logs nothing here — usage collapse is the classic silent
        # VQ failure mode). Batch usage/perplexity from the stage-0 code
        # assignments; replacements from the expiry fingerprint (an expired
        # code's EMA count is set to EXACTLY the threshold,
        # models/quantizer.py:_expire_dead_codes). Scalars only — fetched on
        # logging steps, free otherwise. ---
        k_codes = model_cfg.quantizer.codebook_size
        bins0 = jnp.zeros((k_codes,), jnp.float32).at[
            indices0.reshape(-1)].add(1.0)
        p_codes = bins0 / jnp.maximum(jnp.sum(bins0), 1.0)
        aux["cb_batch_usage_pct"] = 100.0 * jnp.mean(
            (bins0 > 0).astype(jnp.float32))
        aux["cb_perplexity"] = jnp.exp(-jnp.sum(
            jnp.where(p_codes > 0, p_codes * jnp.log(
                jnp.where(p_codes > 0, p_codes, 1.0)), 0.0)))
        thr = model_cfg.quantizer.threshold_ema_dead_code
        if thr > 0:
            aux["cb_replaced"] = jnp.sum(
                (cb_state1.cluster_size == jnp.float32(thr))
                .astype(jnp.float32))

        # --- recon head: L1 + perceptual, grad at x_recon ---
        def head_recon(xr):
            loss_l1 = jnp.mean(jnp.abs(x - xr))
            loss_perceptual = _lpips_dist(xr)
            return loss_l1 + pw * loss_perceptual, (loss_l1, loss_perceptual)

        (loss_recon, (loss_l1, loss_perceptual)), d_recon = \
            jax.value_and_grad(head_recon, has_aux=True)(x_recon0)
        aux.update(loss_l1=loss_l1, loss_perceptual=loss_perceptual,
                   loss_recon=loss_recon)
        loss_g = loss_recon + cw * loss_q
        ct_xr = d_recon
        ct_enc = [jnp.zeros_like(f) for f in enc_feats]
        ct_dec = [jnp.zeros_like(f) for f in dec_feats]

        if disc_on:
            # --- GAN head: hinge-G through D (train-mode BN, mutating the
            # running stats exactly like the reference's stage-0 forward) ---
            def head_disc(xr):
                logits, bs1 = _apply_disc(
                    merge_params(jax.lax.stop_gradient(state.params_g),
                                 state.params_d),
                    state.batch_stats, xr, train=True)
                return hinge_g_loss(logits), bs1

            (loss_disc, batch_stats1), d_disc = jax.value_and_grad(
                head_disc, has_aux=True)(x_recon0)

            # adaptive weight: ||∂loss_recon/∂W|| / ||∂loss_disc/∂W|| for the
            # decoder's final conv kernel W, via the chain rule through that
            # conv: ∂loss/∂W = dW-conv(h_pre, ∂loss/∂x_recon).
            # h_pre stays bf16: the dW conv accumulates f32 anyway, and an
            # f32 copy of the (N, 256, 256, C) tensor is ~0.5 GB of traffic
            w = state.params_g["decoder"]["final_conv"]["kernel"]
            b = state.params_g["decoder"]["final_conv"]["bias"]
            h_pre_sg = jax.lax.stop_gradient(h_pre)
            _, conv_vjp = jax.vjp(
                lambda w_: _conv_same_nhwc(h_pre_sg, w_,
                                           b.astype(h_pre_sg.dtype)),
                w.astype(h_pre_sg.dtype))
            (g_recon,) = conv_vjp(d_recon.astype(h_pre_sg.dtype))
            (g_disc,) = conv_vjp(d_disc.astype(h_pre_sg.dtype))
            g_recon = g_recon.astype(jnp.float32)
            g_disc = g_disc.astype(jnp.float32)
            weight_d = jnp.linalg.norm(g_recon) / (jnp.linalg.norm(g_disc) + 1e-4)
            weight_d = jax.lax.stop_gradient(jnp.clip(weight_d, 0.0, 1e4))
            loss_g = loss_g + weight_d * dw * loss_disc
            ct_xr = ct_xr + weight_d * dw * d_disc
            aux.update(loss_disc=loss_disc, weight_d=weight_d)
        else:
            # the reference's stage-0 forward runs D(x_recon) in train mode
            # even before disc_start_epochs (train_favae.py:75, vqgan_fcm
            # stage=0) — keep the BN running-stats update faithful
            _, batch_stats1 = _apply_disc(
                merge_params(state.params_g, state.params_d),
                state.batch_stats, jax.lax.stop_gradient(x_recon0),
                train=True)
            aux.update(loss_disc=jnp.float32(0.0), weight_d=jnp.float32(0.0))

        if ffl_on:
            if use_ffl_img:
                def head_ffl(xr):
                    return focal_frequency_loss(
                        xr, x, loss_weight=loss_cfg.ffl_weight,
                        alpha=loss_cfg.ffl_alpha,
                        compute_dtype=loss_cfg.spectral_dtype)

                loss_ffl, d_ffl = jax.value_and_grad(head_ffl)(x_recon0)
                loss_g = loss_g + loss_ffl
                ct_xr = ct_xr + d_ffl
                aux["loss_ffl"] = loss_ffl
            if use_dsl:
                def head_dsl(enc_f, dec_f):
                    loss_dsl, per_tap = feature_tap_ffl(
                        enc_f, dec_f, loss_weight=loss_cfg.dsl_weight,
                        alpha=loss_cfg.ffl_alpha,
                        compute_dtype=loss_cfg.spectral_dtype)
                    return loss_dsl, per_tap

                (loss_dsl, per_tap), d_taps = jax.value_and_grad(
                    head_dsl, argnums=(0, 1), has_aux=True)(enc_feats,
                                                            dec_feats)
                loss_g = loss_g + loss_dsl
                ct_enc = [a + g for a, g in zip(ct_enc, d_taps[0])]
                ct_dec = [a + g for a, g in zip(ct_dec, d_taps[1])]
                aux["loss_dsl_features"] = loss_dsl
                for i, t in enumerate(per_tap):
                    aux[f"loss_dsl_block{i + 1}"] = t
            if use_sl:
                # fixed-sigma Spectrum Loss on the raw taps (reference:
                # losses/vqgan_losses.py:34-50)
                def head_sl(enc_f, dec_f):
                    sig = jnp.float32(loss_cfg.gaussian_sigma)
                    enc_b = [gaussian_blur_nhwc(f, loss_cfg.gaussian_kernel,
                                                sig) for f in enc_f]
                    dec_b = [gaussian_blur_nhwc(f, loss_cfg.gaussian_kernel,
                                                sig) for f in dec_f]
                    # NOTE upstream quirk: recon_ffl_features_loss (DSL)
                    # reverses dec_feats IN PLACE, so a following SL call's
                    # own reverse (losses/vqgan_losses.py:20,38) restores the
                    # ORIGINAL order and pairs enc[i] with dec[i] — taps of
                    # MISMATCHED resolutions, which crashes in the FFL. The
                    # DSL+SL combination is therefore unusable upstream; we
                    # mirror-pair unconditionally (the only well-defined
                    # semantics, = reference behavior when SL runs alone).
                    loss_sl, _ = feature_tap_ffl(
                        enc_b, dec_b, loss_weight=loss_cfg.sl_weight,
                        alpha=loss_cfg.ffl_alpha,
                        compute_dtype=loss_cfg.spectral_dtype)
                    return loss_sl

                loss_sl, d_taps = jax.value_and_grad(
                    head_sl, argnums=(0, 1))(enc_feats, dec_feats)
                loss_g = loss_g + loss_sl
                ct_enc = [a + g for a, g in zip(ct_enc, d_taps[0])]
                ct_dec = [a + g for a, g in zip(ct_dec, d_taps[1])]
                aux["loss_sl_gauss_features"] = loss_sl

        aux["loss_g"] = loss_g
        (grads,) = body_vjp((ct_xr.astype(x_recon0.dtype), ct_enc, ct_dec,
                             jnp.float32(cw)))
        updates, opt_g = tx_g.update(grads, state.opt_g, state.params_g)
        params_g = optax.apply_updates(state.params_g, updates)
        metrics.update(aux)

        state = state.replace(params_g=params_g, opt_g=opt_g,
                              cb_state=cb_state1, batch_stats=batch_stats1)

        # ------------------------------------------------------------------
        # stage 1: discriminator update (reference: train_favae.py:109-116)
        # ------------------------------------------------------------------
        if disc_on:
            if train_cfg.faithful_stage1_recompute:
                # no_grad recon with the *updated* generator; train-mode
                # quantizer => the codebook EMA runs a second time per step,
                # exactly like the reference (vqgan_fcm.py:138-146 under
                # model.train()). Tap blurring is skipped: it cannot affect
                # the reconstruction and its output is discarded.
                gen_vars = {"params": merge_params(params_g, state.params_d)}
                z_q, _, _, _, cb_state2 = model.apply(
                    gen_vars, x, state.cb_state, train=True, inference=True,
                    rng=k_vq1, rngs={"dropout": k_drop1},
                    method=VQGANFCM.encode, mutable=False)
                x_recon1, _, _ = model.apply(
                    gen_vars, z_q, train=True, inference=True,
                    rngs={"dropout": k_drop1},
                    method=VQGANFCM.decode, mutable=False)
                x_recon1 = jax.lax.stop_gradient(x_recon1)
                state = state.replace(cb_state=cb_state2)
            else:
                x_recon1 = jax.lax.stop_gradient(x_recon0)

            def stage1_loss(params_d):
                logits_real, bs1 = _apply_disc(
                    merge_params(params_g, params_d), state.batch_stats, x,
                    train=True)
                logits_fake, bs2 = _apply_disc(
                    merge_params(params_g, params_d), bs1, x_recon1, train=True)
                loss_d = hinge_d_loss(logits_real, logits_fake)
                return loss_d, bs2

            (loss_d_val, batch_stats2), grads_d = jax.value_and_grad(
                stage1_loss, has_aux=True)(state.params_d)
            updates_d, opt_d = tx_d.update(grads_d, state.opt_d, state.params_d)
            params_d = optax.apply_updates(state.params_d, updates_d)
            state = state.replace(params_d=params_d, opt_d=opt_d,
                                  batch_stats=batch_stats2)
            metrics["loss_d"] = loss_d_val
        else:
            metrics["loss_d"] = jnp.float32(0.0)

        state = state.replace(step=state.step + 1)
        metrics["x_recon"] = x_recon0
        return state, metrics

    return train_step


def make_eval_step(model: VQGANFCM, lpips_model, loss_cfg: LossConfig):
    """Validation forward (reference: train_favae.py:180-231): L1 + LPIPS on
    eval-mode reconstructions."""

    def eval_step(state: FavaeTrainState, x: jax.Array):
        x = to_unit_range(x)
        variables = {"params": merge_params(state.params_g, state.params_d)}
        if state.batch_stats:
            variables["batch_stats"] = state.batch_stats
        z_q, _, indices, _, _ = model.apply(
            variables, x, state.cb_state, train=False, inference=True,
            method=VQGANFCM.encode)
        x_recon, _, _ = model.apply(
            variables, z_q, train=False, inference=True,
            method=VQGANFCM.decode)
        loss_l1 = jnp.mean(jnp.abs(x - x_recon))
        loss_perceptual = jnp.mean(lpips_model.apply(
            {"params": state.lpips_params}, x, x_recon))
        loss_recon = loss_l1 + loss_cfg.perceptual_weight * loss_perceptual
        return dict(loss_l1=loss_l1, loss_perceptual=loss_perceptual,
                    loss_recon=loss_recon, x_recon=x_recon, indices=indices)

    return eval_step
