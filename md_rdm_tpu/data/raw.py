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

from md_rdm_tpu.data import transforms as T


class RawResizeDataset:
    """Wraps any dataset exposing ``get_raw`` -> (rgb HWC uint8/float,
    depth HW float)."""

    def __init__(self, dataset, raw_hw: Tuple[int, int] = (250, 333)):
        self.dataset = dataset
        self.raw_hw = raw_hw

    def __len__(self):
        return len(self.dataset)

    def __getitem__(self, index: int):
        rgb, depth = self.dataset.get_raw(index)
        rgb = np.asarray(rgb)
        if rgb.dtype != np.uint8:
            rgb = np.clip(rgb * (255.0 if rgb.max() <= 1.0 else 1.0),
                          0, 255).astype(np.uint8)
        short = min(self.raw_hw)
        rgb = T.CenterCrop(self.raw_hw)(T.ResizeTo(short)(rgb))
        depth = T.CenterCrop(self.raw_hw)(
            T.ResizeTo(short)(np.asarray(depth, np.float32)))
        return (np.asarray(rgb, np.float32) / 255.0,
                np.asarray(depth, np.float32))
