"""Input pipeline: pkl-manifest image loader with the reference's transforms.

reference: datasets/general_dataloader.py (FA-VAE: pickled list of image
paths) and datasets/general_dataloader_gpt.py (CAT: pickled list of
[path, caption] pairs). Semantics preserved:

* transform = Resize((r, r)) -> CenterCrop(r) -> scale to [0,1] -> normalize
  mean/std 0.5 => pixels in [-1, 1] (datasets/general_dataloader.py:32-37);
* CLIP branch = Resize((224, 224)) -> CLIP mean/std (…_gpt.py:43-47);
* corrupt/unreadable images fall through to the next index
  (general_dataloader.py:59-67); truncated files tolerated.

TPU-native differences: decoding runs in a thread pool feeding fixed-size
numpy batches (NHWC float32), each host loads only its shard of the global
batch, and a `SyntheticDataset` stands in when no manifest is available
(benchmarks, smoke tests).
"""

from __future__ import annotations

import pickle
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Iterator, List, Optional, Sequence, Tuple

import numpy as np

try:
    from PIL import Image, ImageFile
    ImageFile.LOAD_TRUNCATED_IMAGES = True
    _HAVE_PIL = True
except Exception:  # pragma: no cover
    _HAVE_PIL = False

# normalization constants (reference: datasets/statistic.py)
MEAN = np.asarray([0.5, 0.5, 0.5], np.float32)
STD = np.asarray([0.5, 0.5, 0.5], np.float32)
CLIP_MEAN = np.asarray([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_STD = np.asarray([0.26862954, 0.26130258, 0.27577711], np.float32)


def load_manifest(path: str) -> List:
    """Read a reference-format pkl manifest: list of paths, or list of
    [path, caption] (reference: datasets/general_dataloader.py:29-34)."""
    with open(path, "rb") as f:
        return pickle.load(f)


def _load_image(path: str) -> Optional["Image.Image"]:
    try:
        img = Image.open(path)
        if img.mode != "RGB":
            img = img.convert("RGB")
        return img
    except Exception:
        return None


def _transform(img, resolution: int) -> np.ndarray:
    img = img.resize((resolution, resolution), Image.BILINEAR)
    x = np.asarray(img, np.float32) / 255.0
    return (x - MEAN) / STD  # HWC in [-1, 1]


def _clip_transform(img) -> np.ndarray:
    img = img.resize((224, 224), Image.BICUBIC)
    x = np.asarray(img, np.float32) / 255.0
    return (x - CLIP_MEAN) / CLIP_STD


class PklImageDataset:
    """Image dataset over a pkl manifest (paths or [path, caption])."""

    def __init__(self, manifest_path: str, resolution: int,
                 with_captions: bool = False, with_clip_image: bool = False):
        if not _HAVE_PIL:
            raise RuntimeError("PIL is required for image loading")
        self.entries = load_manifest(manifest_path)
        self.resolution = resolution
        self.with_captions = with_captions
        self.with_clip_image = with_clip_image

    def __len__(self):
        return len(self.entries)

    def get(self, index: int):
        """Load item, skipping forward over unreadable files
        (reference: general_dataloader.py:59-67)."""
        for probe in range(index, index + len(self.entries)):
            e = self.entries[probe % len(self.entries)]
            path = e[0] if isinstance(e, (list, tuple)) else e
            img = _load_image(path)
            if img is None:
                continue
            x = _transform(img, self.resolution)
            if not self.with_captions:
                return x
            out = [x]
            if self.with_clip_image:
                out.append(_clip_transform(img))
            out.append(e[1])
            return tuple(out)
        raise RuntimeError("no readable image in manifest")


class SyntheticDataset:
    """Deterministic random images (+ dummy captions) for benchmarks/tests."""

    def __init__(self, resolution: int, size: int = 1024,
                 with_captions: bool = False, seed: int = 0):
        self.resolution = resolution
        self.size = size
        self.with_captions = with_captions
        self.seed = seed

    def __len__(self):
        return self.size

    def get(self, index: int):
        rng = np.random.RandomState(self.seed + index % self.size)
        x = rng.rand(self.resolution, self.resolution, 3).astype(np.float32) * 2 - 1
        if self.with_captions:
            return x, f"synthetic caption {index % self.size}"
        return x


class DataLoader:
    """Shuffling, batching, prefetching loader.

    Yields numpy batches: images stacked NHWC float32 (plus caption lists for
    caption datasets). `shard_index/shard_count` statically shard the sample
    space per host (replacing Accelerate's loader sharding, reference:
    favae_scripts/train_favae.py:344-347).
    """

    def __init__(self, dataset, batch_size: int, shuffle: bool = True,
                 seed: int = 0, drop_last: bool = True, num_workers: int = 8,
                 shard_index: int = 0, shard_count: int = 1,
                 prefetch: int = 2):
        self.ds = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.num_workers = max(1, num_workers)
        self.shard_index = shard_index
        self.shard_count = shard_count
        self.prefetch = prefetch
        self.epoch = 0

    def __len__(self):
        n = len(self.ds) // self.shard_count
        if self.drop_last:
            return n // self.batch_size
        return -(-n // self.batch_size)

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def _indices(self) -> np.ndarray:
        idx = np.arange(len(self.ds))
        if self.shuffle:
            rng = np.random.RandomState(self.seed + self.epoch)
            rng.shuffle(idx)
        return idx[self.shard_index::self.shard_count]

    def __iter__(self) -> Iterator:
        idx = self._indices()
        n_batches = len(self)
        batches = [idx[i * self.batch_size:(i + 1) * self.batch_size]
                   for i in range(n_batches)]

        def fetch(batch_idx):
            items = [self.ds.get(int(i)) for i in batches[batch_idx]]
            return self._collate(items)

        with ThreadPoolExecutor(self.num_workers) as pool:
            pending = []
            for b in range(min(self.prefetch + 1, n_batches)):
                pending.append(pool.submit(fetch, b))
            next_submit = len(pending)
            for b in range(n_batches):
                out = pending.pop(0).result()
                if next_submit < n_batches:
                    pending.append(pool.submit(fetch, next_submit))
                    next_submit += 1
                yield out

    @staticmethod
    def _collate(items):
        if isinstance(items[0], np.ndarray):
            return np.stack(items)
        cols = list(zip(*items))
        out = []
        for col in cols:
            if isinstance(col[0], np.ndarray):
                out.append(np.stack(col))
            else:
                out.append(list(col))
        return tuple(out)
