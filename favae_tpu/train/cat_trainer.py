"""CAT trainer: epoch loop with fractional cosine-warmup LR, validation CE,
sampling previews, checkpointing.

reference: cat_scripts/train_cat.py:69-244. The LR schedule steps fractionally
per train step (scheduler.step(epoch + step/steps_per_epoch), :78); here it is
an optax schedule over the global step with the same shape.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from favae_tpu.config import CATConfig
from favae_tpu.models.txt_cond import CATModel, build_cat
from favae_tpu.train.cat_step import (create_cat_state, make_cat_eval_step,
                                      make_cat_optimizer, make_cat_train_step)
from favae_tpu.train.schedule import make_step_schedule
from favae_tpu.utils.checkpoint import CheckpointManager
from favae_tpu.utils.logging import MetricWriter, print0


class CATTrainer:
    def __init__(self, cfg: CATConfig, save_dir: str, steps_per_epoch: int,
                 batch_size: int, favae_variables=None, cb_state=None,
                 clip_params=None, tokenizer=None,
                 log_dir: Optional[str] = None, enabled_warmup: bool = True,
                 seed: int = 0):
        self.cfg = cfg
        n_dev = jax.device_count()
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
        self.frozen = self.cat.frozen_params()

        self.train_step = jax.jit(make_cat_train_step(self.cat, self.tx),
                                  donate_argnums=0)
        self.eval_step = jax.jit(make_cat_eval_step(self.cat))

        self.ckpt = CheckpointManager(save_dir)
        self.writer = MetricWriter(log_dir)
        self.start_epoch = 0
        self.rng = jax.random.PRNGKey(seed + 1)

    def resume(self):
        state, meta = self.ckpt.try_resume(self.state)
        if state is not None:
            self.state = state
            self.start_epoch = int(meta.get("epoch", 0))
            print0(f"resumed CAT from epoch {self.start_epoch}")

    def _prep_batch(self, batch):
        """(images, [clip_images], captions) -> (x, text_ids, captions)."""
        if len(batch) == 3:
            x, _clip_x, captions = batch
        else:
            x, captions = batch
        text_ids = self.cat.tokenize(captions)
        return jnp.asarray(x), text_ids, captions

    def train_epoch(self, loader, epoch: int, print_steps=10, img_steps=1000):
        import time
        loader.set_epoch(epoch)
        steps_per_epoch = len(loader)
        last_loss = float("inf")
        t_last = time.perf_counter()
        seen = 0
        for step, batch in enumerate(loader):
            x, text_ids, captions = self._prep_batch(batch)
            self.state, m = self.train_step(self.state, self.frozen, x, text_ids, self.rng)
            seen += x.shape[0]
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
                self._log_samples("train/from-cond", x, text_ids, captions,
                                  gstep)
        return last_loss

    def _log_samples(self, name, x, text_ids, captions, step, n=4):
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
            x, text_ids, captions = self._prep_batch(batch)
            m = self.eval_step(self.state, self.frozen, x, text_ids)
            total = total + m["loss_gpt"] * x.shape[0]
            n += x.shape[0]
            last = (x, text_ids, captions)
        val = float(total) / max(n, 1)
        self.writer.scalars("val", {"loss_gpt": val}, epoch)
        if last is not None:
            self._log_samples("val/from-cond", last[0], last[1], last[2],
                              epoch)
        print0(f"=== validate CAT epoch {epoch}: loss_gpt={val:.4f}")
        return val

    def fit(self, train_loader, val_loader, epochs: Optional[int] = None,
            print_steps=10, img_steps=1000):
        epochs = epochs or self.cfg.epochs
        for epoch in range(self.start_epoch, epochs):
            self.train_epoch(train_loader, epoch, print_steps, img_steps)
            score = (self.validate(val_loader, epoch)
                     if val_loader else float("inf"))
            self.ckpt.on_epoch_end(epoch, score, self.state)
        self.writer.close()
