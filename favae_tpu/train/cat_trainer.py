"""CAT trainer: epoch loop with fractional cosine-warmup LR, validation CE,
sampling previews, checkpointing.

reference: cat_scripts/train_cat.py:69-244. The LR schedule steps fractionally
per train step (scheduler.step(epoch + step/steps_per_epoch), :78); here it is
an optax schedule over the global step with the same shape.

Multi-device: the reference launches CAT on 2 GPUs via DDP
(cat_scripts/script_cat_celeba.sh:19). Here a dp x tp SPMD mesh covers all
local devices automatically — the batch is sharded over 'dp', the GPT params
(and their Adam moments) over 'tp' with Megatron-style column/row splits
(parallel/sharding.py), and the frozen FA-VAE/CLIP towers are replicated.
tp=1 (pure data parallel, the DDP equivalent) is the default.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding

from favae_tpu.config import CATConfig
from favae_tpu.models.txt_cond import CATModel, build_cat
from favae_tpu.parallel.mesh import make_mesh, replicate_tree, shard_batch
from favae_tpu.parallel.sharding import gpt_param_pspec
from favae_tpu.train.cat_step import (create_cat_state, make_cat_eval_step,
                                      make_cat_latent_eval_step,
                                      make_cat_latent_train_step,
                                      make_cat_optimizer, make_cat_train_step)
from favae_tpu.train.schedule import make_step_schedule
from favae_tpu.utils.checkpoint import CheckpointManager
from favae_tpu.utils.logging import MetricWriter, print0


def shard_cat_state(state, mesh):
    """Place a CATTrainState on the mesh: GPT kernels (and the Adam moments
    mirroring them inside opt_state — same dict keys, so the same path rule
    applies) get the tensor-parallel pspecs; everything else is replicated."""
    return jax.tree_util.tree_map_with_path(
        lambda path, x: jax.device_put(
            x, NamedSharding(mesh, gpt_param_pspec(path, x))), state)


class CATTrainer:
    def __init__(self, cfg: CATConfig, save_dir: str, steps_per_epoch: int,
                 batch_size: int, favae_variables=None, cb_state=None,
                 clip_params=None, tokenizer=None,
                 log_dir: Optional[str] = None, enabled_warmup: bool = True,
                 seed: int = 0, tp: int = 1, save_every_epoch: int = 1,
                 grad_accum: int = 1, cache_latents: bool = False):
        self.cfg = cfg
        n_dev = jax.device_count()
        self.mesh = None
        if n_dev > 1:
            if n_dev % tp:
                raise ValueError(f"device count {n_dev} not divisible by tp={tp}")
            self.mesh = make_mesh(axes=("dp", "tp"), shape=(n_dev // tp, tp))
        lr = cfg.base_lr * batch_size * n_dev
        self.lr_schedule = make_step_schedule(
            steps_per_epoch, warmup_epochs=cfg.warmup_epochs,
            epochs=cfg.epochs, lr=lr, min_lr=cfg.min_lr,
            enabled=enabled_warmup)

        self.cat, gpt_params = build_cat(
            cfg, jax.random.PRNGKey(seed), favae_variables=favae_variables,
            cb_state=cb_state, clip_params=clip_params, tokenizer=tokenizer)
        self.tx = make_cat_optimizer(cfg, self.lr_schedule)
        self.state = create_cat_state(self.cat, gpt_params, self.tx)
        if self.mesh is not None:
            self.state = shard_cat_state(self.state, self.mesh)
            self.cat.favae_variables = replicate_tree(
                self.cat.favae_variables, self.mesh)
            self.cat.clip_params = replicate_tree(self.cat.clip_params, self.mesh)
            self.cat.cb_state = replicate_tree(self.cat.cb_state, self.mesh)
        self.frozen = self.cat.frozen_params()

        self.cache_latents = cache_latents
        if cache_latents:
            # the frozen towers never enter these jits -> their params and
            # 256px encoder activations stay out of device memory
            self.train_step = jax.jit(
                make_cat_latent_train_step(self.cat, self.tx,
                                           grad_accum=grad_accum),
                donate_argnums=0)
            self.eval_step = jax.jit(make_cat_latent_eval_step(self.cat))
        else:
            self.train_step = jax.jit(
                make_cat_train_step(self.cat, self.tx, grad_accum=grad_accum),
                donate_argnums=0)
            self.eval_step = jax.jit(make_cat_eval_step(self.cat))

        self.ckpt = CheckpointManager(save_dir, save_every_epoch)
        self.writer = MetricWriter(log_dir)
        self.start_epoch = 0
        self.rng = jax.random.PRNGKey(seed + 1)

    def resume(self, path: Optional[str] = None):
        """Resume / warm-start (reference: cat_scripts/train_cat.py:199-204,
        which torch.loads an arbitrary ``--resume_path``). ``path=None``
        restores ``save_dir/latest``; an Orbax dir restores the full state
        (params + AdamW + epoch) from there; a torch ``.pt`` warm-starts the
        GPT weights with a fresh optimizer."""
        import os
        if path is None:
            state, meta = self.ckpt.try_resume(self.state)
            if state is not None:
                self.state = state
                self.start_epoch = int(meta.get("epoch", 0))
                print0(f"resumed CAT from epoch {self.start_epoch}")
            return
        if os.path.isfile(path):  # torch checkpoint
            from favae_tpu.utils.torch_convert import convert_cat_gpt
            gpt_params = convert_cat_gpt(path, n_layer=self.cfg.gpt.n_layer)
            self.state = create_cat_state(self.cat, gpt_params, self.tx)
            if self.mesh is not None:
                self.state = shard_cat_state(self.state, self.mesh)
            print0(f"warm-started GPT weights from torch checkpoint {path}")
            return
        from favae_tpu.utils.checkpoint import restore_checkpoint
        state, meta = restore_checkpoint(path, self.state)
        self.state = state
        self.start_epoch = int(meta.get("epoch", 0))
        self.ckpt.best_score = meta.get("best_score", float("inf"))
        print0(f"resumed CAT from {path} at epoch {self.start_epoch}")

    def _place(self, x):
        if self.mesh is not None:
            return shard_batch(jnp.asarray(x), self.mesh)
        return jnp.asarray(x)

    def _prep_batch(self, batch):
        """(images, [clip_images], captions) -> (x, text_ids, captions)."""
        if len(batch) == 3:
            x, _clip_x, captions = batch
        else:
            x, captions = batch
        text_ids = self.cat.tokenize(captions)
        return self._place(x), self._place(text_ids), captions

    def _step_args(self, batch):
        """Per-batch step inputs for either pipeline.

        Full pipeline: (frozen, x, text_ids); cached latents: (z, embeds,
        mask). Returns (step_args, batch_size, text_ids, captions, x_or_z) —
        the trailing three feed sample logging."""
        if self.cache_latents:
            z, embeds, mask, text_ids, captions = batch
            args = (self._place(z), self._place(embeds), self._place(mask))
            return args, z.shape[0], text_ids, captions, z
        x, text_ids, captions = self._prep_batch(batch)
        return (self.frozen, x, text_ids), x.shape[0], text_ids, captions, x

    def _gt_images(self, x_or_z, n=4):
        """Ground-truth panel for the sample grid: the images themselves on
        the full pipeline; on the latent pipeline the FA-VAE decode of the
        cached z (the GT images are never loaded there)."""
        if not self.cache_latents:
            return np.asarray(x_or_z[:n])
        g = self.cfg.gpt.image_encoded_dim
        grid = jnp.asarray(np.asarray(x_or_z)[:n].reshape(-1, g, g))
        return np.asarray(self.cat.decode_to_img(grid))

    def _latent_loader(self, loader):
        """Precompute frozen-tower outputs for loader.ds and wrap them in a
        DataLoader with the SAME shuffle/seed/sharding, so batch order —
        and therefore the update sequence — matches the full pipeline
        exactly (pinned by tests/test_cat_latent_cache.py)."""
        from favae_tpu.data.latent_cache import precompute_latents
        from favae_tpu.data.pipeline import DataLoader
        ds = precompute_latents(self.cat, loader.ds, loader.batch_size,
                                frozen=self.frozen, place=self._place,
                                num_workers=loader.num_workers, log=print0)
        return DataLoader(ds, batch_size=loader.batch_size,
                          shuffle=loader.shuffle, seed=loader.seed,
                          drop_last=loader.drop_last,
                          num_workers=loader.num_workers,
                          shard_index=loader.shard_index,
                          shard_count=loader.shard_count)

    def train_epoch(self, loader, epoch: int, print_steps=10, img_steps=1000):
        import time
        loader.set_epoch(epoch)
        steps_per_epoch = len(loader)
        last_loss = float("inf")
        t_last = time.perf_counter()
        seen = 0
        for step, batch in enumerate(loader):
            args, bsz, text_ids, captions, x_or_z = self._step_args(batch)
            self.state, m = self.train_step(self.state, *args, self.rng)
            seen += bsz
            gstep = epoch * steps_per_epoch + step
            if step % print_steps == 0:
                loss = float(m["loss_gpt"])
                last_loss = loss
                lr_now = float(self.lr_schedule(gstep))
                dt = time.perf_counter() - t_last
                sps = seen / max(dt, 1e-9)
                t_last = time.perf_counter()
                seen = 0
                self.writer.scalars("train", {"loss_gpt": loss, "lr": lr_now,
                                              "samples_per_sec": sps}, gstep)
                print0(f"epoch {epoch} step {step} loss_gpt={loss:.4f} "
                       f"lr={lr_now:.3e} samples/s={sps:.2f}")
            if img_steps and gstep % img_steps == 0:
                self._log_samples("train/from-cond", self._gt_images(x_or_z),
                                  text_ids, captions, gstep)
        return last_loss

    def _log_samples(self, name, x, text_ids, captions, step, n=4):
        # small preview batch: fetch to host first so the sampler sees plain
        # (default-placed) inputs rather than a sliced dp-sharded array
        text_ids = jnp.asarray(np.asarray(text_ids)[:n])
        imgs, _ = self.cat.sample_images(
            self.state.gpt_params, text_ids[:n],
            rng=jax.random.fold_in(self.rng, step),
            top_k=self.cfg.top_k, top_p=self.cfg.top_p)
        self.writer.caption_grid(name, np.asarray(x[:n]), np.asarray(imgs),
                                 list(captions[:n]), step)

    def validate(self, loader, epoch: int) -> float:
        # device-side accumulation; one host fetch at the end
        total, n = 0.0, 0
        last = None
        for batch in loader:
            args, bsz, text_ids, captions, x_or_z = self._step_args(batch)
            m = self.eval_step(self.state, *args)
            total = total + m["loss_gpt"] * bsz
            n += bsz
            last = (x_or_z, text_ids, captions)
        val = float(total) / max(n, 1)
        self.writer.scalars("val", {"loss_gpt": val}, epoch)
        if last is not None:
            self._log_samples("val/from-cond", self._gt_images(last[0]),
                              last[1], last[2], epoch)
        print0(f"=== validate CAT epoch {epoch}: loss_gpt={val:.4f}")
        return val

    def fit(self, train_loader, val_loader, epochs: Optional[int] = None,
            print_steps=10, img_steps=1000):
        epochs = epochs or self.cfg.epochs
        if self.cache_latents:
            train_loader = self._latent_loader(train_loader)
            val_loader = (self._latent_loader(val_loader)
                          if val_loader else val_loader)
        for epoch in range(self.start_epoch, epochs):
            self.train_epoch(train_loader, epoch, print_steps, img_steps)
            score = (self.validate(val_loader, epoch)
                     if val_loader else float("inf"))
            self.ckpt.on_epoch_end(epoch, score, self.state,
                                   is_last=epoch == epochs - 1)
        self.writer.close()
