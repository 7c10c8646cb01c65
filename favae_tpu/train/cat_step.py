"""CAT train step + optimizer (AdamW with minGPT-style decay masking).

reference: cat_scripts/train_cat.py:69-109 (hot loop) and
models/txt_cond_transformer.py:238-265 (configure_optimizers). Decay rules
replicated exactly:

* no weight decay: torch-Embedding weights (token embedding incl. the tied
  logits head, the RelPosBias2d table) and anything named "bias";
* weight decay 0.01: everything else — including the custom-LayerNorm gammas,
  axial positional embeddings, start token, and null kv, because the
  reference's forbidden-type filter only excludes torch.nn.LayerNorm /
  torch.nn.Embedding and its custom LayerNorm/Parameters are neither
  (txt_cond_transformer.py:249-262).

The frozen FA-VAE encode and CLIP text encode both run inside the jitted
step; bf16 compute, no grad scaler (TPU needs no loss scaling).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from favae_tpu.config import CATConfig
from favae_tpu.models.txt_cond import CATModel


def decay_mask(params) -> Any:
    """True where weight decay applies."""

    def fn(path, _leaf):
        keys = [getattr(p, "key", "") for p in path]
        if keys and keys[-1] == "bias":
            return False
        if "embedding" in keys:        # nn.Embed leaves (tok_emb, pos_bias)
            return False
        return True

    return jax.tree_util.tree_map_with_path(fn, params)


def make_cat_optimizer(cfg: CATConfig, lr_schedule) -> optax.GradientTransformation:
    nu_dtype = jnp.dtype(getattr(cfg, "adam_nu_dtype", "float32"))
    mu_dtype = jnp.dtype(getattr(cfg, "adam_mu_dtype", "float32"))
    if nu_dtype == jnp.float32:
        # reference path: plain optax.adamw, bit-identical AdamW dynamics
        # (torch-oracle-pinned in tests/test_cat_torch_parity.py)
        return optax.adamw(
            lr_schedule, b1=cfg.adam_b1, b2=cfg.adam_b2, mu_dtype=mu_dtype,
            weight_decay=cfg.weight_decay, mask=decay_mask)
    return optax.chain(
        scale_by_adam_nu(b1=cfg.adam_b1, b2=cfg.adam_b2,
                         mu_dtype=mu_dtype, nu_dtype=nu_dtype),
        optax.add_decayed_weights(cfg.weight_decay, decay_mask),
        optax.scale_by_learning_rate(lr_schedule))


def scale_by_adam_nu(b1: float, b2: float, eps: float = 1e-8,
                     mu_dtype=None, nu_dtype=None
                     ) -> optax.GradientTransformation:
    """`optax.scale_by_adam` plus a storage dtype for the SECOND moment.

    optax only exposes ``mu_dtype``; nu always inherits the (f32) param
    dtype, and the r5 on-chip CAT profile charges the AdamW state
    read+write 21 ms of the 167 ms step — nu is half those bytes. Math
    mirrors optax exactly: moments update in f32 (dtype promotion against
    the f32 grads), bias correction reads the PRE-cast f32 moments, and
    the cast to the storage dtype happens once at the end — so with
    ``nu_dtype=float32`` the transform is bit-identical to
    ``optax.scale_by_adam`` (pinned by
    tests/test_clip_and_cat.py::test_adam_nu_dtype_f32_matches_optax).
    """
    mu_dtype = jnp.dtype(mu_dtype) if mu_dtype is not None else None
    nu_dtype = jnp.dtype(nu_dtype) if nu_dtype is not None else None

    def init_fn(params):
        mu = jax.tree_util.tree_map(
            lambda p: jnp.zeros_like(p, dtype=mu_dtype), params)
        nu = jax.tree_util.tree_map(
            lambda p: jnp.zeros_like(p, dtype=nu_dtype), params)
        return optax.ScaleByAdamState(count=jnp.zeros([], jnp.int32),
                                      mu=mu, nu=nu)

    def update_fn(updates, state, params=None):
        del params
        mu = optax.tree.update_moment(updates, state.mu, b1, 1)
        nu = optax.tree.update_moment_per_elem_norm(updates, state.nu, b2, 2)
        count_inc = optax.safe_increment(state.count)
        mu_hat = optax.tree.bias_correction(mu, b1, count_inc)
        nu_hat = optax.tree.bias_correction(nu, b2, count_inc)
        updates = jax.tree_util.tree_map(
            lambda m, v: m / (jnp.sqrt(v) + eps), mu_hat, nu_hat)
        mu = optax.tree.cast(mu, mu_dtype)
        nu = optax.tree.cast(nu, nu_dtype)
        return updates, optax.ScaleByAdamState(count=count_inc, mu=mu, nu=nu)

    return optax.GradientTransformation(init_fn, update_fn)


class CATTrainState(struct.PyTreeNode):
    gpt_params: Any
    opt_state: optax.OptState
    step: jax.Array


def create_cat_state(cat: CATModel, gpt_params, tx) -> CATTrainState:
    return CATTrainState(gpt_params=gpt_params, opt_state=tx.init(gpt_params),
                         step=jnp.int32(0))


def make_cat_train_step(cat: CATModel, tx, grad_accum: int = 1) -> Callable:
    """The jitted step takes the frozen first-stage/conditioning params as a
    SEPARATE, non-donated argument: closing over them would bake ~400MB of
    constants into the graph (overwhelming the remote compile service), and
    carrying them inside the donated state would delete the host copies.

    `grad_accum > 1` splits the leading batch axis into `grad_accum` equal
    microbatches and lax.scans value_and_grad over them, averaging grads
    before ONE optimizer update — identical update semantics to the full
    batch (the CE loss is a batch mean, so the microbatch-grad mean IS the
    full-batch grad; pinned by `test_cat_grad_accum_matches_full_batch`).
    Peak activation memory drops to one microbatch's worth, which is how a
    16G chip trains effective batches the B=24 compile-time OOM ruled out
    (docs/PERFORMANCE.md) — beyond-reference capability: the torch trainer
    has no accumulation (cat_scripts/train_cat.py:69-109). Each microbatch
    folds its index into the dropout rng so masks stay independent."""

    def train_step(state: CATTrainState, frozen, x, text_ids, rng
                   ) -> Tuple[CATTrainState, Dict[str, jax.Array]]:
        def loss_for(gpt_params, batch, r):
            xi, ti = batch
            return cat.gpt_loss(gpt_params, xi, ti, rng=r, train=True,
                                frozen=frozen)

        loss, grads = _loss_grads_accum(loss_for, state.gpt_params,
                                        (x, text_ids),
                                        jax.random.fold_in(rng, state.step),
                                        grad_accum)
        return _apply_update(state, tx, loss, grads)

    return train_step


def make_cat_latent_train_step(cat: CATModel, tx, grad_accum: int = 1
                               ) -> Callable:
    """Train step over PRECOMPUTED latents (z token ids, CLIP token embeds,
    text mask — see `CATModel.gpt_loss_from_latents`). No frozen-params
    argument: the frozen FA-VAE/CLIP towers never enter this jit, so their
    ~0.6 GB of params and the 256px encoder activations stay out of device
    memory entirely. Given latents produced by the same frozen encode, the
    update is bitwise-identical to `make_cat_train_step`
    (tests/test_cat_latent_cache.py)."""

    def train_step(state: CATTrainState, z, embeds, mask, rng
                   ) -> Tuple[CATTrainState, Dict[str, jax.Array]]:
        def loss_for(gpt_params, batch, r):
            zi, ei, mi = batch
            return cat.gpt_loss_from_latents(gpt_params, zi, ei, mi,
                                             rng=r, train=True)

        loss, grads = _loss_grads_accum(loss_for, state.gpt_params,
                                        (z, embeds, mask),
                                        jax.random.fold_in(rng, state.step),
                                        grad_accum)
        return _apply_update(state, tx, loss, grads)

    return train_step


def _loss_grads_accum(loss_for, params, batch, rng, grad_accum):
    """value_and_grad of ``loss_for(params, batch, rng)``, optionally
    accumulated over ``grad_accum`` equal microbatches along the leading
    axis (lax.scan, grads averaged — identical update semantics to the full
    batch since the CE loss is a batch mean). Each microbatch folds its
    index into the rng so dropout masks stay independent."""
    def loss_and_grads(arrs, r):
        return jax.value_and_grad(
            lambda p: loss_for(p, arrs, r))(params)

    if grad_accum == 1:
        return loss_and_grads(batch, rng)
    b = batch[0].shape[0]
    if b % grad_accum:
        raise ValueError(
            f"batch {b} not divisible by grad_accum={grad_accum}")
    mb = b // grad_accum
    split = tuple(a.reshape(grad_accum, mb, *a.shape[1:]) for a in batch)

    def body(acc, inp):
        li, gi = loss_and_grads(inp[:-1], jax.random.fold_in(rng, inp[-1]))
        return (acc[0] + li,
                jax.tree_util.tree_map(jnp.add, acc[1], gi)), None

    zero = (jnp.zeros((), jnp.float32),
            jax.tree_util.tree_map(jnp.zeros_like, params))
    (loss_sum, grad_sum), _ = jax.lax.scan(
        body, zero, (*split, jnp.arange(grad_accum)))
    loss = loss_sum / grad_accum
    grads = jax.tree_util.tree_map(lambda g: g / grad_accum, grad_sum)
    return loss, grads


def _apply_update(state, tx, loss, grads):
    updates, opt_state = tx.update(grads, state.opt_state, state.gpt_params)
    gpt_params = optax.apply_updates(state.gpt_params, updates)
    new_state = state.replace(gpt_params=gpt_params, opt_state=opt_state,
                              step=state.step + 1)
    return new_state, {"loss_gpt": loss}


def make_cat_eval_step(cat: CATModel) -> Callable:
    def eval_step(state: CATTrainState, frozen, x, text_ids):
        loss = cat.gpt_loss(state.gpt_params, x, text_ids,
                            rng=jax.random.PRNGKey(0), train=False,
                            frozen=frozen)
        return {"loss_gpt": loss}

    return eval_step


def make_cat_latent_eval_step(cat: CATModel) -> Callable:
    def eval_step(state: CATTrainState, z, embeds, mask):
        loss = cat.gpt_loss_from_latents(state.gpt_params, z, embeds, mask,
                                         rng=jax.random.PRNGKey(0),
                                         train=False)
        return {"loss_gpt": loss}

    return eval_step
