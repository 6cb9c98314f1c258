"""Dataset base classes and a torch-free batched loader.

Reference: dataloaders/dataloader.py (``BaseDataset`` split dispatch :4-40,
``ConcatDataset`` :42-61) and the DataLoader usage in module.py:19-28.

The loader replaces torch's DataLoader with a thread-pool prefetching
iterator producing numpy batches (NHWC images + NCHW depth), ready for
``jax.device_put`` - no framework dependency on the host path.
"""
from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Iterator, List, Optional, Sequence, Tuple

import numpy as np

Sample = Tuple[np.ndarray, np.ndarray]   # (rgb HWC float, depth HW float)


class BaseDataset:
    """Split-dispatched dataset: subclasses implement get_raw + the three
    preprocess hooks (train/val/test)."""

    def __init__(self, split: str):
        self.split = split
        if "train" in split:
            self.transform = self.training_preprocess
        elif split == "val":
            self.transform = self.validation_preprocess
        elif split == "test":
            self.transform = self.test_preprocess
        else:
            raise RuntimeError(
                f"Invalid split: {split}; supported: train, val, test")

    # hooks ----------------------------------------------------------------
    def get_raw(self, index: int) -> Sample:
        raise NotImplementedError

    def training_preprocess(self, rgb, depth) -> Sample:
        raise NotImplementedError

    def validation_preprocess(self, rgb, depth) -> Sample:
        raise NotImplementedError

    def test_preprocess(self, rgb, depth) -> Sample:
        raise NotImplementedError

    # protocol -------------------------------------------------------------
    def __getitem__(self, index: int) -> Sample:
        rgb, depth = self.get_raw(index)
        return self.transform(rgb, depth)

    def __len__(self) -> int:
        return len(self.images)  # type: ignore[attr-defined]


class ConcatDataset:
    """Shuffled mix of several datasets (dataloader.py:42-61), with a fixed
    per-instance permutation of dataset membership.

    Setting ``transform`` overrides the member datasets' preprocessing
    (they are bypassed via get_raw) and applies the override instead -
    the reference's transform-override feature (dataloader.py:49-58).
    """

    def __init__(self, datasets: Sequence, seed: int = 0):
        self.datasets = list(datasets)
        self.transform = None
        rng = np.random.default_rng(seed)
        self.indices = np.concatenate(
            [np.full(len(d), i) for i, d in enumerate(self.datasets)])
        rng.shuffle(self.indices)
        # precomputed per-position item index (O(1) __getitem__; the naive
        # "count equal members before i" rescan is quadratic per epoch)
        self.item_indices = np.empty(len(self.indices), np.int64)
        for d in range(len(self.datasets)):
            pos = np.flatnonzero(self.indices == d)
            self.item_indices[pos] = np.arange(len(pos))

    def __getitem__(self, i: int) -> Sample:
        ds_idx = self.indices[i]
        item_index = int(self.item_indices[i])
        ds = self.datasets[ds_idx]
        if self.transform is None:
            return ds[item_index]
        rgb, depth = ds.get_raw(item_index)
        return self.transform(rgb, depth)

    def __len__(self) -> int:
        return sum(len(d) for d in self.datasets)


def _collate(samples: List[Sample]) -> Tuple[np.ndarray, np.ndarray]:
    """Stack to (B,H,W,3) float32 images and (B,1,H,W) float32 depth."""
    rgbs, depths = zip(*samples)
    x = np.stack([np.asarray(r, np.float32) for r in rgbs])
    if x.ndim == 4 and x.shape[1] == 3 and x.shape[-1] != 3:
        x = x.transpose(0, 2, 3, 1)          # CHW -> HWC
    y = np.stack([np.asarray(d, np.float32) for d in depths])
    if y.ndim == 3:
        y = y[:, None, :, :]
    return np.ascontiguousarray(x), np.ascontiguousarray(y)


class DataLoader:
    """Shuffling, prefetching batch iterator.

    num_workers > 0 uses a thread pool for sample decode (h5/PNG/jpeg
    decode releases the GIL) and a bounded queue for pipeline overlap -
    the role torch's worker processes play in the reference
    (module.py:19-28, pin_memory/num_workers).
    """

    def __init__(self, dataset, batch_size: int, shuffle: bool = False,
                 num_workers: int = 0, drop_last: bool = False,
                 seed: int = 0, prefetch: int = 2,
                 sample_weights: Optional[np.ndarray] = None,
                 num_samples: Optional[int] = None):
        """``sample_weights``/``num_samples`` enable weighted sampling with
        replacement - the WeightedRandomSampler role the legacy loop uses to
        draw 3200 KITTI val samples per epoch (main.py:83-85,102-104)."""
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = num_workers
        self.drop_last = drop_last
        self.seed = seed
        self.prefetch = prefetch
        self.sample_weights = sample_weights
        self.num_samples = num_samples
        self._epoch = 0

    def _num_indices(self) -> int:
        return (self.num_samples if self.num_samples is not None
                else len(self.dataset))

    def __len__(self) -> int:
        n = self._num_indices()
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _index_batches(self) -> List[np.ndarray]:
        rng = np.random.default_rng(self.seed + self._epoch)
        if self.sample_weights is not None or self.num_samples is not None:
            w = (np.asarray(self.sample_weights, np.float64)
                 if self.sample_weights is not None
                 else np.ones(len(self.dataset)))
            w = w / w.sum()
            idx = rng.choice(len(self.dataset), size=self._num_indices(),
                             replace=True, p=w)
        else:
            idx = np.arange(len(self.dataset))
            if self.shuffle:
                rng.shuffle(idx)
        batches = [idx[i:i + self.batch_size]
                   for i in range(0, len(idx), self.batch_size)]
        if self.drop_last and batches and len(batches[-1]) < self.batch_size:
            batches.pop()
        return batches

    def __iter__(self) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        batches = self._index_batches()
        self._epoch += 1
        if self.num_workers <= 0:
            for b in batches:
                yield _collate([self.dataset[int(i)] for i in b])
            return

        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def produce():
            with ThreadPoolExecutor(max_workers=self.num_workers) as pool:
                for b in batches:
                    if stop.is_set():
                        return
                    samples = list(pool.map(
                        lambda i: self.dataset[int(i)], b))
                    q.put(_collate(samples))
            q.put(None)

        t = threading.Thread(target=produce, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    break
                yield item
        finally:
            stop.set()
