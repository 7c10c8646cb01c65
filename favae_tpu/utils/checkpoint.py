"""Checkpointing via Orbax: atomic latest/best with full train state.

Replaces the reference's torch.save tmp/rename dance (reference:
utils.py:108-119) and its latest/best policy (favae_scripts/
train_favae.py:363-382). Orbax writes are atomic (tmp dir + rename) and
async-capable; we persist the full functional state (params, both optimizer
states, codebook EMA state, step) plus a small json of host metadata
(epoch, best score).
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Any, Dict, Optional, Tuple

import jax
import orbax.checkpoint as ocp


def _meta_path(path: str) -> str:
    return os.path.join(path, "host_meta.json")


def _commit_path(path: str) -> str:
    return os.path.join(path, "_COMMITTED")


def save_checkpoint(path: str, state: Any, meta: Optional[Dict] = None) -> None:
    """Crash-safe write of `state` (any pytree) + host metadata to `path`.

    Invariant (mirrors the reference's tmp->rename dance, reference
    utils.py:108-119): at every instant a restorable checkpoint exists.
    We write the full checkpoint to ``path + ".tmp"`` first (marked
    complete by a ``_COMMITTED`` file written last), then swap it in via
    two renames. A crash at any point leaves either a valid ``path``, a
    committed ``path.tmp``, or the previous ``path.old`` — all of which
    ``try_resume`` knows how to use.
    """
    path = os.path.abspath(path)
    tmp = path + ".tmp"
    ckptr = ocp.StandardCheckpointer()
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    # Fetch the pytree to host numpy SYNCHRONOUSLY before handing it to
    # Orbax. Orbax's serializer waits on async device-to-host futures that
    # never complete through the experimental axon relay (r5 finding: the
    # save blocks forever on a futex at 0% CPU — same breakage class as
    # jax.block_until_ready, see docs/ROADMAP.md round-5). A synchronous
    # device_get is the proven-working fetch path (it is how the fixed
    # bench syncs); on ordinary backends and on already-host numpy leaves
    # it is a no-op/cheap copy, so this changes nothing off-relay.
    state = jax.device_get(state)
    ckptr.save(tmp, state)
    ckptr.wait_until_finished()
    if meta is not None:
        with open(_meta_path(tmp), "w") as f:
            json.dump(meta, f)
    with open(_commit_path(tmp), "w") as f:
        f.write("ok")
    old = path + ".old"
    if os.path.exists(path):
        if os.path.exists(old):
            shutil.rmtree(old)
        os.rename(path, old)
    os.rename(tmp, path)
    if os.path.exists(old):
        shutil.rmtree(old)


def restore_checkpoint(path: str, target: Any) -> Tuple[Any, Dict]:
    """Restore a pytree matching `target`'s structure; returns (state, meta)."""
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    state = ckptr.restore(path, target)
    meta: Dict = {}
    if os.path.exists(_meta_path(path)):
        with open(_meta_path(path)) as f:
            meta = json.load(f)
    return state, meta


class CheckpointManager:
    """latest/best policy mirroring the reference trainer
    (train_favae.py:363-382)."""

    def __init__(self, save_dir: str, save_every_epoch: int = 1):
        self.save_dir = os.path.abspath(save_dir)
        self.save_every_epoch = save_every_epoch
        self.best_score = float("inf")
        os.makedirs(self.save_dir, exist_ok=True)

    @property
    def latest_path(self):
        return os.path.join(self.save_dir, "latest")

    @property
    def best_path(self):
        return os.path.join(self.save_dir, "best")

    def on_epoch_end(self, epoch: int, score: float, state: Any,
                     is_last: bool = False) -> None:
        """Persist latest (and best-so-far) on cadence epochs.

        With the default ``save_every_epoch=1`` this is reference-exact:
        latest every epoch, best whenever the score improves
        (favae_scripts/train_favae.py:363-382). A sparser cadence is an
        operator knob for slow-link environments (each save fetches the
        full state over the relay): then both latest AND best are only
        written on cadence epochs or the final epoch, and ``best`` means
        best-among-persisted-epochs.
        """
        if not (epoch % self.save_every_epoch == 0 or is_last):
            return
        meta = {"epoch": epoch + 1, "score": score,
                "best_score": min(self.best_score, score)}
        # one synchronous host fetch serves both writes (the device_get
        # inside save_checkpoint is then a no-op on numpy leaves)
        state = jax.device_get(state)
        save_checkpoint(self.latest_path, state, meta)
        if score < self.best_score:
            self.best_score = score
            save_checkpoint(self.best_path, state, meta)

    def try_resume(self, target: Any):
        """Returns (state, meta) from the newest restorable checkpoint.

        Fallback order covers every crash window of ``save_checkpoint``:
        ``latest`` (normal case), then a committed ``latest.tmp`` (died
        between the two swap renames — the tmp write had completed), then
        ``latest.old`` (died before the new write committed). Whichever is
        chosen is first renamed back to ``latest`` so the directory
        returns to its steady state.
        """
        if not os.path.isdir(self.latest_path):
            tmp = self.latest_path + ".tmp"
            old = self.latest_path + ".old"
            if os.path.isdir(tmp) and os.path.exists(_commit_path(tmp)):
                os.rename(tmp, self.latest_path)
            elif os.path.isdir(old):
                os.rename(old, self.latest_path)
        if os.path.isdir(self.latest_path):
            state, meta = restore_checkpoint(self.latest_path, target)
            self.best_score = meta.get("best_score", float("inf"))
            return state, meta
        return None, {}
