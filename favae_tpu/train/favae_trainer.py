"""FA-VAE trainer: epoch loop, gates, validation, checkpointing, logging.

reference: favae_scripts/train_favae.py:234-388. Differences by design:

* epoch gates (disc_start_epochs / ffl_start_epochs) select one of up to four
  pre-built jitted step variants instead of branching per step;
* metrics fetch to host only on logging steps (no per-step device sync);
* checkpoints via Orbax (atomic latest/best), resume restores the full
  functional state including both optimizer states and the codebook EMA.
"""

from __future__ import annotations

import dataclasses
import os
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from favae_tpu.config import LossConfig, TrainConfig, VQGANConfig
from favae_tpu.models.lpips import LPIPS
from favae_tpu.parallel.mesh import make_mesh, replicate_tree, shard_batch
from favae_tpu.train.favae_state import FavaeTrainState
from favae_tpu.train.favae_step import (make_eval_step, make_train_step,
                                        to_unit_range)


def _host_f32(x: np.ndarray) -> np.ndarray:
    """uint8 [0,255] or f32 [-1,1] host batch -> f32 [-1,1] (for logging)."""
    x = np.asarray(x)
    if x.dtype == np.uint8:
        return x.astype(np.float32) / 127.5 - 1.0
    return x
from favae_tpu.utils.checkpoint import CheckpointManager
from favae_tpu.utils.logging import MetricWriter, device_memory_mib, print0


class FavaeTrainer:
    def __init__(self, model_cfg: VQGANConfig, loss_cfg: LossConfig,
                 train_cfg: TrainConfig, save_dir: str,
                 lpips_params=None, log_dir: Optional[str] = None,
                 enable_profiler: bool = False):
        self.model_cfg = model_cfg
        self.loss_cfg = loss_cfg
        self.train_cfg = train_cfg
        self.enable_profiler = enable_profiler

        n_dev = jax.device_count()
        self.mesh = make_mesh() if n_dev > 1 else None
        # lr = base_lr * per-device batch * n_devices (reference:
        # train_favae.py:250-251 with WORLD_SIZE -> device count)
        self.lr = train_cfg.base_lr * train_cfg.batch_size * n_dev

        rng = jax.random.PRNGKey(train_cfg.seed)
        self.state, self.model, tx_g, tx_d = FavaeTrainState.create(
            model_cfg, loss_cfg, train_cfg, rng, lr=self.lr,
            lpips_params=lpips_params)
        self.lpips = LPIPS()
        self._steps = {}
        for disc_on in (False, True):
            for ffl_on in (False, True):
                self._steps[(disc_on, ffl_on)] = jax.jit(
                    make_train_step(self.model, self.lpips, tx_g, tx_d,
                                    model_cfg, loss_cfg, train_cfg,
                                    disc_on=disc_on, ffl_on=ffl_on),
                    donate_argnums=0)
        self.eval_step = jax.jit(make_eval_step(self.model, self.lpips, loss_cfg))

        if self.mesh is not None:
            self.state = replicate_tree(self.state, self.mesh)

        self.ckpt = CheckpointManager(save_dir, train_cfg.save_every_epoch)
        self.writer = MetricWriter(log_dir)
        self.start_epoch = 0
        self.rng = jax.random.PRNGKey(train_cfg.seed + 1)

    # ------------------------------------------------------------------
    def resume(self, path: Optional[str] = None):
        """Resume / warm-start (reference: train_favae.py:334-341, which
        torch.loads an arbitrary ``--resume_path``).

        * ``path=None``: restore ``save_dir/latest`` (with crash-window
          fallbacks) — full functional state incl. both Adam chains.
        * ``path`` = Orbax checkpoint dir: same full restore from there,
          epoch/best taken from its host metadata.
        * ``path`` = reference-format torch ``.pt`` file: weights-only warm
          start (params, BN stats, codebook EMA) with fresh optimizers and
          epoch 0 — torch Adam moments don't map onto the optax chains.
        """
        if path is None:
            state, meta = self.ckpt.try_resume(self.state)
            if state is not None:
                self.state = state
                self.start_epoch = int(meta.get("epoch", 0))
                print0(f"resumed from epoch {self.start_epoch}, "
                       f"best {self.ckpt.best_score:.4f}")
            return
        if os.path.isfile(path):  # torch checkpoint
            from favae_tpu.train.favae_state import split_params
            from favae_tpu.utils.torch_convert import convert_favae
            params, batch_stats, cb_state = convert_favae(path, self.model_cfg)
            params_g, params_d = split_params(params)
            new = self.state.replace(
                params_g=params_g, params_d=params_d,
                batch_stats=batch_stats if batch_stats else self.state.batch_stats,
                cb_state=cb_state)
            self.state = (replicate_tree(new, self.mesh)
                          if self.mesh is not None else new)
            print0(f"warm-started model weights from torch checkpoint {path}")
            return
        from favae_tpu.utils.checkpoint import restore_checkpoint
        state, meta = restore_checkpoint(path, self.state)
        self.state = state
        self.start_epoch = int(meta.get("epoch", 0))
        self.ckpt.best_score = meta.get("best_score", float("inf"))
        print0(f"resumed from {path} at epoch {self.start_epoch}, "
               f"best {self.ckpt.best_score:.4f}")

    def _place(self, x: np.ndarray):
        if self.mesh is not None:
            return shard_batch(jnp.asarray(x), self.mesh)
        return jnp.asarray(x)

    # ------------------------------------------------------------------
    def _data_dependent_init(self, x0: np.ndarray) -> None:
        """First-batch data-dependent initializations, reproducing what the
        reference does lazily inside its first training forward:

        * k-means codebook init (reference: models/l2_quantize.py:352-368
          init_embed_ -> kmeans at :124-164; embed/cluster_size replaced,
          euclidean also copies embed into embed_avg at :224-240);
        * ActNorm loc/scale from each norm layer's first input
          (reference: models/discriminator.py:67-86), computed on the
          reconstruction like the reference's stage-0 D(x_recon) forward.
        """
        from flax.core import unfreeze
        from favae_tpu.models.quantizer import kmeans, l2norm
        from favae_tpu.models.vqgan import VQGANFCM
        from favae_tpu.train.favae_state import merge_params

        qcfg = self.model_cfg.quantizer
        dcfg = self.model_cfg.discriminator
        use_actnorm = dcfg.use_actnorm and dcfg.kind == "patch"
        if not (qcfg.kmeans_init or use_actnorm):
            return

        x = self._place(np.asarray(x0))
        variables = {"params": merge_params(self.state.params_g,
                                            self.state.params_d)}
        if self.state.batch_stats:
            variables["batch_stats"] = self.state.batch_stats

        if qcfg.kmeans_init:
            @jax.jit
            def _init_codebook(variables, x, key):
                flat = self.model.apply(variables, to_unit_range(x),
                                        method=VQGANFCM.codebook_inputs)
                if qcfg.use_cosine_sim:
                    flat = l2norm(flat)
                means, bins = kmeans(key, flat, qcfg.codebook_size,
                                     num_iters=qcfg.kmeans_iters,
                                     use_cosine_sim=qcfg.use_cosine_sim)
                return means, bins

            self.rng, key = jax.random.split(self.rng)
            means, bins = _init_codebook(variables, x, key)
            cb = self.state.cb_state.replace(
                embed=means, cluster_size=bins, embed_avg=means)
            if self.mesh is not None:
                cb = replicate_tree(cb, self.mesh)
            self.state = self.state.replace(cb_state=cb)
            print0(f"k-means codebook init: {int(np.sum(np.asarray(bins) > 0))}"
                   f"/{qcfg.codebook_size} bins populated")

        if use_actnorm:
            @jax.jit
            def _actnorm_values(variables, cb_state, x):
                outs = self.model.apply(variables, to_unit_range(x), cb_state,
                                        train=False, inference=True)
                _, mut = self.model.apply(
                    variables, outs["x_recon"], train=False, data_init=True,
                    method=VQGANFCM.discriminate, mutable=["actnorm_init"])
                return mut["actnorm_init"]

            sown = unfreeze(_actnorm_values(variables, self.state.cb_state, x))
            disc = dict(self.state.params_d["discriminator"])
            for name, vals in sown["discriminator"].items():
                layer = dict(disc[name])
                layer["loc"] = vals["loc"]
                layer["scale"] = vals["scale"]
                disc[name] = layer
            params_d = dict(self.state.params_d)
            params_d["discriminator"] = disc
            if self.mesh is not None:
                params_d = replicate_tree(params_d, self.mesh)
            self.state = self.state.replace(params_d=params_d)
            print0(f"ActNorm data-dependent init: {len(sown['discriminator'])} "
                   "layers initialized from the first batch")

    # ------------------------------------------------------------------
    def train_epoch(self, loader, epoch: int) -> None:
        cfg = self.train_cfg
        disc_on = epoch >= self.loss_cfg.disc_start_epochs
        ffl_on = epoch >= self.loss_cfg.ffl_start_epochs
        step_fn = self._steps[(disc_on, ffl_on)]
        loader.set_epoch(epoch)
        steps_per_epoch = len(loader)

        t_last = time.perf_counter()
        imgs_since = 0
        for step, x in enumerate(loader):
            gstep = epoch * steps_per_epoch + step
            self.state, metrics = step_fn(self.state, self._place(x), self.rng)
            imgs_since += x.shape[0]

            if step % cfg.print_steps == 0:
                scalars = {k: float(v) for k, v in metrics.items()
                           if np.ndim(v) == 0}
                dt = time.perf_counter() - t_last
                scalars["imgs_per_sec"] = imgs_since / max(dt, 1e-9)
                scalars["mem_mib"] = device_memory_mib()
                t_last = time.perf_counter()
                imgs_since = 0
                self._log_sigmas(scalars)
                self.writer.scalars("train", scalars, gstep)
                print0(f"epoch {epoch} step {step} "
                       + " ".join(f"{k}={v:.4f}" for k, v in sorted(scalars.items())
                                  if k.startswith("loss") or k in
                                  ("weight_d", "imgs_per_sec")))
            if step % cfg.img_steps == 0:
                self.writer.recon_grid(
                    "train/img-recon", _host_f32(x[:4]),
                    np.asarray(metrics["x_recon"])[:4], gstep)

    def _log_sigmas(self, scalars: Dict[str, float]) -> None:
        """All learned DSL sigmas (reference: train_favae.py:129-147)."""
        pg = self.state.params_g
        if "sigmas" in pg:
            for i, v in enumerate(np.asarray(pg["sigmas"])):
                scalars[f"sigma_{i}"] = float(v)
        for mod in ("encoder", "decoder"):
            if isinstance(pg.get(mod), dict) and "sigmas" in pg[mod]:
                for i, v in enumerate(np.asarray(pg[mod]["sigmas"])):
                    scalars[f"{mod[:3]}_sigma_{i}"] = float(v)

    # ------------------------------------------------------------------
    def validate(self, loader, epoch: int) -> float:
        """L1 + LPIPS over the val set (reference: train_favae.py:180-231)."""
        # accumulate on device; fetch once at the end (per-batch float() would
        # force a device round-trip per batch)
        totals = {"loss_l1": 0.0, "loss_perceptual": 0.0, "loss_recon": 0.0}
        n = 0
        last = None
        for x in loader:
            out = self.eval_step(self.state, self._place(x))
            b = x.shape[0]
            for k in totals:
                totals[k] = totals[k] + out[k] * b
            n += b
            last = (x, out)
        for k in totals:
            totals[k] = float(totals[k]) / max(n, 1)
        self.writer.scalars("val", totals, epoch)
        if last is not None:
            self.writer.recon_grid("val/img-recon", _host_f32(last[0][:4]),
                                   np.asarray(last[1]["x_recon"])[:4], epoch)
        print0(f"=== validate epoch {epoch}: "
               + " ".join(f"{k}={v:.4f}" for k, v in totals.items()))
        return totals["loss_recon"]

    # ------------------------------------------------------------------
    def fit(self, train_loader, val_loader, epochs: Optional[int] = None):
        epochs = epochs or self.train_cfg.epochs
        if self.start_epoch == 0:
            train_loader.set_epoch(0)
            first = next(iter(train_loader), None)
            if first is not None:
                self._data_dependent_init(first)
        for epoch in range(self.start_epoch, epochs):
            if self.enable_profiler and epoch == self.start_epoch:
                jax.profiler.start_trace(self.ckpt.save_dir + "/profile")
            self.train_epoch(train_loader, epoch)
            if self.enable_profiler and epoch == self.start_epoch:
                jax.profiler.stop_trace()
            score = self.validate(val_loader, epoch) if val_loader else float("inf")
            self.ckpt.on_epoch_end(epoch, score, self.state,
                                   is_last=epoch == epochs - 1)
        self.writer.close()
