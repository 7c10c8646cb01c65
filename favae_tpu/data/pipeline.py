"""Input pipeline: pkl-manifest image loader with the reference's transforms.

reference: datasets/general_dataloader.py (FA-VAE: pickled list of image
paths) and datasets/general_dataloader_gpt.py (CAT: pickled list of
[path, caption] pairs). Semantics preserved:

* transform = Resize((r, r)) -> CenterCrop(r) -> scale to [0,1] -> normalize
  mean/std 0.5 => pixels in [-1, 1] (datasets/general_dataloader.py:32-37);
* CLIP branch = Resize((224, 224)) -> CLIP mean/std (…_gpt.py:43-47);
* corrupt/unreadable images fall through to the next index
  (general_dataloader.py:59-67); truncated files tolerated.

TPU-native differences: decoding runs in a thread pool (or, for hosts where
JPEG decode fights the dispatch thread for the GIL, a process pool —
`use_processes=True`) feeding fixed-size numpy batches, each host loads only
its shard of the global batch, and a `SyntheticDataset` stands in when no
manifest is available (benchmarks, smoke tests).

Fast path: `output_dtype="uint8"` skips the host-side normalize and ships
resized uint8 batches (4x less host->device traffic); the train/eval steps
normalize on device (train/favae_step.py `to_unit_range`), reproducing the
reference transform bit-for-bit in f32.
"""

from __future__ import annotations

import multiprocessing
import pickle
import threading
from concurrent.futures import ProcessPoolExecutor, ThreadPoolExecutor
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


def _transform_uint8(img, resolution: int) -> np.ndarray:
    """Resize only; normalization happens on device (to_unit_range)."""
    img = img.resize((resolution, resolution), Image.BILINEAR)
    return np.asarray(img, np.uint8)


def _clip_transform(img) -> np.ndarray:
    img = img.resize((224, 224), Image.BICUBIC)
    x = np.asarray(img, np.float32) / 255.0
    return (x - CLIP_MEAN) / CLIP_STD


class PklImageDataset:
    """Image dataset over a pkl manifest (paths or [path, caption])."""

    def __init__(self, manifest_path: str, resolution: int,
                 with_captions: bool = False, with_clip_image: bool = False,
                 output_dtype: str = "float32"):
        if not _HAVE_PIL:
            raise RuntimeError("PIL is required for image loading")
        self.entries = load_manifest(manifest_path)
        self.resolution = resolution
        self.with_captions = with_captions
        self.with_clip_image = with_clip_image
        # "uint8": ship raw resized pixels, normalize on device (fast path)
        self.output_dtype = output_dtype

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
            x = (_transform_uint8(img, self.resolution)
                 if self.output_dtype == "uint8"
                 else _transform(img, self.resolution))
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


# --- process-pool workers (module-level so they pickle by reference) -------
_WORKER_DS = None


def _proc_init(ds):
    global _WORKER_DS
    _WORKER_DS = ds


def _proc_fetch(indices):
    return [_WORKER_DS.get(int(i)) for i in indices]


class DataLoader:
    """Shuffling, batching, prefetching loader.

    Yields numpy batches: images stacked NHWC (plus caption lists for caption
    datasets). `shard_index/shard_count` statically shard the sample space
    per host (replacing Accelerate's loader sharding, reference:
    favae_scripts/train_favae.py:344-347).

    `use_processes=True` decodes in worker PROCESSES instead of threads: on
    single-core hosts PIL JPEG decode and the XLA dispatch thread otherwise
    fight over one GIL (measured 42% train-step slowdown, docs/ROADMAP.md);
    worker processes own their interpreters, and with uint8 datasets the IPC
    cost is ~200KB/image.
    """

    def __init__(self, dataset, batch_size: int, shuffle: bool = True,
                 seed: int = 0, drop_last: bool = True, num_workers: int = 8,
                 shard_index: int = 0, shard_count: int = 1,
                 prefetch: int = 2, use_processes: bool = False):
        self.ds = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.num_workers = max(1, num_workers)
        self.shard_index = shard_index
        self.shard_count = shard_count
        self.prefetch = prefetch
        self.use_processes = use_processes
        self.epoch = 0
        self._pool = None  # persistent process pool (forking is expensive)

    def _process_pool(self):
        if self._pool is None:
            # forkserver: workers don't inherit the parent's TPU/JAX threads
            # (unsafe to fork) and don't re-import __main__ (spawn would)
            methods = multiprocessing.get_all_start_methods()
            ctx = multiprocessing.get_context(
                "forkserver" if "forkserver" in methods else "spawn")
            self._pool = ProcessPoolExecutor(
                self.num_workers, mp_context=ctx,
                initializer=_proc_init, initargs=(self.ds,))
        return self._pool

    def close(self):
        if self._pool is not None:
            self._pool.shutdown()
            self._pool = None

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

        if self.use_processes:
            pool = self._process_pool()  # persistent across epochs
            pending = []
            for b in range(min(self.prefetch + 1, n_batches)):
                pending.append(pool.submit(_proc_fetch, batches[b]))
            next_submit = len(pending)
            for b in range(n_batches):
                out = self._collate(pending.pop(0).result())
                if next_submit < n_batches:
                    pending.append(pool.submit(_proc_fetch,
                                               batches[next_submit]))
                    next_submit += 1
                yield out
            return

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
