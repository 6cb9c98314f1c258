"""Raw-batch wrapper for the device-augmentation backend.

Host side does only decode + a deterministic fixed-size standardization
(short-side resize + center crop to ``raw_hw``); all random augmentation
(scale/rotate/crop/flip/jitter) happens on device inside the compiled train
step (data/augment.py).  ``raw_hw`` should comfortably contain the model
crop (e.g. (250, 333) raw for a 226x226 crop of NYU's 4:3 frames).
"""
from __future__ import annotations

from typing import Tuple

import numpy as np

from md_rdm_tpu.data import native


def _fill_size(sh: int, sw: int, th: int, tw: int) -> Tuple[int, int]:
    """Smallest aspect-preserving size covering (th, tw) in both dims."""
    scale = max(th / sh, tw / sw)
    return max(th, round(sh * scale)), max(tw, round(sw * scale))


def _center_crop(img: np.ndarray, th: int, tw: int) -> np.ndarray:
    h, w = img.shape[:2]
    i = max((h - th) // 2, 0)
    j = max((w - tw) // 2, 0)
    return img[i:i + th, j:j + tw]


class RawResizeDataset:
    """Wraps any dataset exposing ``get_raw`` -> (rgb HWC uint8/float,
    depth HW float).  Standardization runs through the native C++ kernels
    (native/host_ops.cc) when built, releasing the GIL under the threaded
    DataLoader; otherwise a numpy path with identical sampling.
    """

    def __init__(self, dataset, raw_hw: Tuple[int, int] = (250, 333),
                 keep_uint8: bool = False, cache: bool = False):
        self.dataset = dataset
        self.raw_hw = raw_hw
        # wire-format option: ship rgb as uint8 (1/4 the bytes of f32) and
        # normalize to [0,1] on device inside the compiled augment step -
        # host->device batch transfer is the pipeline bound on tunneled
        # TPU setups (PERF.md "Input pipeline")
        self.keep_uint8 = keep_uint8
        # standardization is deterministic, so small datasets can cache the
        # resized samples (the 1-core host otherwise re-resizes every
        # sample every epoch: ~583 KB/sample at (250,333) u8+f32)
        self._cache = {} if cache else None

    def __len__(self):
        return len(self.dataset)

    def __getitem__(self, index: int):
        if self._cache is not None and index in self._cache:
            return self._cache[index]
        rgb, depth = self.dataset.get_raw(index)
        rgb = np.asarray(rgb)
        if rgb.dtype != np.uint8:
            rgb = np.clip(rgb * (255.0 if rgb.max() <= 1.0 else 1.0),
                          0, 255).astype(np.uint8)
        depth = np.asarray(depth, np.float32)
        th, tw = self.raw_hw
        rh, rw = _fill_size(rgb.shape[0], rgb.shape[1], th, tw)
        depth_f = _center_crop(native.resize_f32(depth, rh, rw), th, tw)
        if self.keep_uint8:
            rgb_o = _center_crop(native.resize_u8(rgb, rh, rw), th, tw)
        else:
            rgb_o = _center_crop(native.resize_u8_to_f32(rgb, rh, rw),
                                 th, tw)
        item = (np.ascontiguousarray(rgb_o),
                np.ascontiguousarray(depth_f))
        if self._cache is not None:
            self._cache[index] = item
        return item
