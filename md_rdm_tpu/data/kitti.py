"""KITTI dataset - the working form of the reference's broken loader.

The reference's kitti_dataloader.py imports ``MyDataloader`` which does not
exist (SURVEY.md orientation note) - the KITTI path cannot run there.  This
implements the *intended* capability: sparse-to-dense-style h5 files
(``rgb``/``depth`` keys) under ``{root}/{train,val}``, output (228, 912),
with the documented augmentation recipe (kitti_dataloader.py:11-46):
Crop(130, 10, 240, 1200) -> rotate -> scale -> center-crop -> flip.
"""
from __future__ import annotations

from pathlib import Path
from typing import Tuple

import numpy as np

from md_rdm_tpu.data import transforms as T
from md_rdm_tpu.data.base import BaseDataset


class KITTIDataset(BaseDataset):
    def __init__(self, root: str, split: str = "train",
                 output_size: Tuple[int, int] = (228, 912), seed: int = 0):
        super().__init__(split)
        self.output_size = output_size
        self.rng = np.random.default_rng(seed)
        folder = Path(root) / ("train" if "train" in split else "val")
        self.images = sorted(p.as_posix() for p in folder.glob("**/*.h5"))
        if not self.images:
            raise RuntimeError(f"found 0 h5 files under {folder}")

    def get_raw(self, index: int):
        import h5py
        with h5py.File(self.images[index], "r") as f:
            rgb = np.array(f["rgb"]).transpose(1, 2, 0)
            depth = np.array(f["depth"])
        return rgb, depth

    def training_preprocess(self, rgb, depth):
        s = self.rng.uniform(1.0, 1.5)
        depth = np.asarray(depth, np.float32) / s
        angle = self.rng.uniform(-5.0, 5.0)
        do_flip = self.rng.uniform() < 0.5
        chain = T.Compose([
            T.Crop(130, 10, 240, 1200),
            T.Rotate(angle),
            T.Resize(s),
            T.CenterCrop(self.output_size),
            T.HorizontalFlip(do_flip),
        ])
        rgb = chain(np.asarray(rgb, np.uint8))
        rgb = T.ColorJitter(0.4, 0.4, 0.4, rng=self.rng)(rgb)
        return np.asarray(rgb, np.float64) / 255.0, chain(depth)

    def validation_preprocess(self, rgb, depth):
        chain = T.Compose([
            T.Crop(130, 10, 240, 1200),
            T.CenterCrop(self.output_size),
        ])
        rgb = chain(np.asarray(rgb, np.uint8))
        return (np.asarray(rgb, np.float64) / 255.0,
                chain(np.asarray(depth, np.float32)))

    def test_preprocess(self, rgb, depth):
        return self.validation_preprocess(rgb, depth)
