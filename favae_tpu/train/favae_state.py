"""FA-VAE train state: generator/discriminator params, two Adam chains, EMA
codebook state — all one functional pytree.

reference optimizer setup: favae_scripts/train_favae.py:292-305 — Adam(0.5, 0.9)
over encoder+decoder+quantizer (with a separate lr 2.0e-7 group for the
model-level pairwise-DSL sigmas) and a second Adam over the discriminator.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct
from flax.core import freeze, unfreeze

from favae_tpu.config import LossConfig, TrainConfig, VQGANConfig
from favae_tpu.models.lpips import LPIPS
from favae_tpu.models.quantizer import CodebookState, init_codebook_state
from favae_tpu.models.vqgan import VQGANFCM


def split_params(params: Dict[str, Any]) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Generator (encoder/decoder/quantizer/sigmas) vs discriminator params."""
    params = dict(params)
    params_d = {"discriminator": params.pop("discriminator")}
    return params, params_d


def merge_params(params_g, params_d):
    out = dict(params_g)
    out.update(params_d)
    return out


def make_generator_tx(train_cfg: TrainConfig, lr: float) -> optax.GradientTransformation:
    """Adam(0.5, 0.9) with the model-level pairwise sigmas on lr 2.0e-7
    (reference: train_favae.py:296-301; non-pairwise sigmas live inside
    encoder/decoder params and use the normal lr, as in the reference)."""

    def label_fn(params):
        return jax.tree_util.tree_map_with_path(
            lambda path, _: "sigma" if (path and getattr(path[0], "key", None) == "sigmas")
            else "main", params)

    mu = _mu_dtype(train_cfg)
    main = optax.adam(lr, b1=train_cfg.adam_b1, b2=train_cfg.adam_b2,
                      mu_dtype=mu)
    sigma = optax.adam(train_cfg.sigma_lr, b1=train_cfg.adam_b1,
                       b2=train_cfg.adam_b2, mu_dtype=mu)
    return optax.multi_transform({"main": main, "sigma": sigma}, label_fn)


def _mu_dtype(train_cfg: TrainConfig):
    import jax.numpy as jnp
    return jnp.dtype(getattr(train_cfg, "adam_mu_dtype", "float32"))


def make_discriminator_tx(train_cfg: TrainConfig, lr: float) -> optax.GradientTransformation:
    return optax.adam(lr, b1=train_cfg.adam_b1, b2=train_cfg.adam_b2,
                      mu_dtype=_mu_dtype(train_cfg))


class FavaeTrainState(struct.PyTreeNode):
    params_g: Any
    params_d: Any
    batch_stats: Any            # discriminator BN running stats
    cb_state: CodebookState
    opt_g: optax.OptState
    opt_d: optax.OptState
    lpips_params: Any           # frozen perceptual net
    step: jax.Array             # int32 global step

    @classmethod
    def create(cls, model_cfg: VQGANConfig, loss_cfg: LossConfig,
               train_cfg: TrainConfig, rng: jax.Array, lr: float,
               lpips_params: Optional[Any] = None,
               image_size: Optional[int] = None):
        model = VQGANFCM(model_cfg, gaussian_kernel=loss_cfg.gaussian_kernel,
                         dsl_init_sigma=loss_cfg.dsl_init_sigma)
        k_model, k_cb, k_lpips, k_drop = jax.random.split(rng, 4)
        res = image_size or model_cfg.codec.resolution
        dummy = jnp.zeros((1, res, res, model_cfg.codec.in_channels), jnp.float32)
        cb_state = init_codebook_state(model_cfg.quantizer, k_cb)
        variables = model.init(
            {"params": k_model, "dropout": k_drop}, dummy, cb_state, train=False)
        variables = unfreeze(variables)
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
        params_g, params_d = split_params(params)

        if lpips_params is None:
            lpips = LPIPS()
            lp_vars = lpips.init(k_lpips, dummy, dummy)
            lpips_params = unfreeze(lp_vars)["params"]

        tx_g = make_generator_tx(train_cfg, lr)
        tx_d = make_discriminator_tx(train_cfg, lr)
        return cls(
            params_g=params_g,
            params_d=params_d,
            batch_stats=batch_stats,
            cb_state=cb_state,
            opt_g=tx_g.init(params_g),
            opt_d=tx_d.init(params_d),
            lpips_params=lpips_params,
            step=jnp.int32(0),
        ), model, tx_g, tx_d
