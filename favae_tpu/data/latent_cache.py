"""Precomputed-latent cache for CAT training.

The CAT hot loop re-runs two FROZEN towers on every batch, every epoch: the
FA-VAE encoder+quantizer at 256px and the CLIP text encoder (reference:
cat_scripts/train_cat.py:69-109 -> models/txt_cond_transformer.py:134-150).
Both are deterministic functions of the sample, so their outputs can be
computed ONCE per dataset and replayed — the r5 on-chip step profile charges
them ~15.3 ms of the 167.3 ms gpt2_medium step (~9%), and keeping them out
of the train jit also frees their ~0.6 GB of params plus the 256px encoder
activations from device memory (the difference that lets batch 24 compile on
a 16G chip, docs/PERFORMANCE.md).

`precompute_latents` makes one unshuffled, non-dropping pass over a caption
dataset and returns a `LatentDataset` indexed by the ORIGINAL dataset index,
so a DataLoader over it with the same seed reproduces the exact batch order
of the image loader — the cached path is update-for-update identical to the
full pipeline (tests/test_cat_latent_cache.py pins first-epoch equality).

Host memory per sample: L*4 (z ids) + 77*D*4 (f32 CLIP token embeds)
+ 77*4 (text ids) + 77 (mask) bytes — ~237 KB/sample for ViT-L/14 (D=768),
i.e. ~2.4 GB per 10k samples. Datasets beyond host RAM should shard the
manifest; the cache is rebuilt per shard.

Beyond-reference capability: the torch trainer has no latent caching.
"""

from __future__ import annotations

from typing import Callable, Optional

import numpy as np

import jax

from favae_tpu.data.pipeline import DataLoader


class LatentDataset:
    """Dataset over precomputed CAT latents.

    Items are ``(z, embeds, mask, text_ids, caption)`` — everything a latent
    train/eval step or the sampler-side logging needs. Works with
    `favae_tpu.data.pipeline.DataLoader` (its collate stacks array columns
    and keeps the caption column a list).
    """

    def __init__(self, z: np.ndarray, embeds: np.ndarray, mask: np.ndarray,
                 text_ids: np.ndarray, captions: list):
        n = len(z)
        assert len(embeds) == len(mask) == len(text_ids) == len(captions) == n
        self.z = z
        self.embeds = embeds
        self.mask = mask
        self.text_ids = text_ids
        self.captions = captions

    def __len__(self):
        return len(self.z)

    def get(self, index: int):
        return (self.z[index], self.embeds[index], self.mask[index],
                self.text_ids[index], self.captions[index])

    def nbytes(self) -> int:
        return (self.z.nbytes + self.embeds.nbytes + self.mask.nbytes
                + self.text_ids.nbytes)


def precompute_latents(cat, dataset, batch_size: int, frozen=None,
                       place: Optional[Callable] = None,
                       num_workers: int = 4,
                       log: Callable = lambda m: None) -> LatentDataset:
    """One pass of the frozen towers over ``dataset`` -> `LatentDataset`.

    ``dataset`` must yield caption items — ``(x, caption)`` or
    ``(x, clip_x, caption)`` like `PklImageDataset(with_captions=True)`.
    The pass runs unshuffled and non-dropping so entry i of the cache is
    sample i of the dataset; the final partial batch is padded to
    ``batch_size`` (one compiled shape) and trimmed on the host.

    ``place`` (optional) maps host arrays onto devices — pass the trainer's
    ``_place`` so the encode pass shards over the same mesh as training.
    """
    frozen = frozen or cat.frozen_params()

    def encode(frozen, x, text_ids):
        z = cat.encode_to_z(x, frozen["favae_variables"],
                            frozen["cb_state"])
        embeds, mask = cat.encode_text_ids(text_ids, frozen["clip_params"])
        return z, embeds, mask

    encode = jax.jit(encode)
    place = place or (lambda a: a)

    loader = DataLoader(dataset, batch_size=batch_size, shuffle=False,
                        drop_last=False, num_workers=num_workers)
    zs, es, ms, tids, captions = [], [], [], [], []
    done = 0
    for batch in loader:
        if len(batch) == 3:
            x, _clip_x, caps = batch
        else:
            x, caps = batch
        ids = np.asarray(cat.tokenize(list(caps)))
        n = x.shape[0]
        if n < batch_size:  # pad the tail batch to the compiled shape
            pad = batch_size - n
            x = np.concatenate([x, np.repeat(x[-1:], pad, axis=0)])
            ids = np.concatenate([ids, np.repeat(ids[-1:], pad, axis=0)])
        z, embeds, mask = encode(frozen, place(np.asarray(x)), place(ids))
        zs.append(np.asarray(z)[:n])
        es.append(np.asarray(embeds)[:n])
        ms.append(np.asarray(mask)[:n])
        tids.append(ids[:n])
        captions.extend(list(caps))
        done += n
        log(f"cached latents {done}/{len(dataset)}")
    out = LatentDataset(np.concatenate(zs), np.concatenate(es),
                        np.concatenate(ms), np.concatenate(tids), captions)
    log(f"latent cache: {len(out)} samples, "
        f"{out.nbytes() / 1e6:.0f} MB host RAM")
    return out
