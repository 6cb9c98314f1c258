"""Floorplan3D dataset (dataloaders/floorplan3d_dataloader.py).

File-list driven: ``{root}/{type}_{split}.list`` lines of
``rgb_path  depth_path`` (two spaces).  Depth PNGs are uint16 scaled to
[0, 10] m via /(2^16-1)*10 (floorplan3d_dataloader.py:13-19).
Output (228, 405); the aug recipe scales the 720px-high raws by 250/720
before rotating (for speed), then by s, then crops.
"""
from __future__ import annotations

import os
from pathlib import Path
from typing import Tuple

import numpy as np
from PIL import Image

from md_rdm_tpu.data import transforms as T
from md_rdm_tpu.data.base import BaseDataset

IHEIGHT, IWIDTH = 720, 1280


def load_rgb(path: str) -> np.ndarray:
    return np.asarray(Image.open(path).convert("RGB"), dtype=np.uint8)


def load_depth_u16_scaled(path: str) -> np.ndarray:
    d = np.array(Image.open(path), dtype=np.uint16).astype(np.float32)
    return d / (2 ** 16 - 1) * 10.0


class Floorplan3DDataset(BaseDataset):
    def __init__(self, root: str, dataset_type: str, split: str,
                 output_size: Tuple[int, int] = (228, 405), seed: int = 0):
        super().__init__(split)
        self.root = root
        self.output_size = output_size
        self.rng = np.random.default_rng(seed)
        list_file = Path(root) / f"{dataset_type}_{split}.list"
        with open(list_file) as f:
            self.images = [ln.strip() for ln in f if ln.strip()]

    def get_raw(self, index: int):
        rgb_rel, depth_rel = self.images[index].split("  ")
        rgb = load_rgb(os.path.join(self.root, rgb_rel))
        depth = load_depth_u16_scaled(os.path.join(self.root, depth_rel))
        return rgb, depth

    def training_preprocess(self, rgb, depth):
        s = self.rng.uniform(1.0, 1.5)
        depth = depth / s
        angle = self.rng.uniform(-5.0, 5.0)
        do_flip = self.rng.uniform() < 0.5
        chain = T.Compose([
            T.Resize(250.0 / IHEIGHT),
            T.Rotate(angle),
            T.Resize(s),
            T.CenterCrop(self.output_size),
            T.HorizontalFlip(do_flip),
        ])
        rgb = chain(rgb)
        rgb = T.ColorJitter(0.4, 0.4, 0.4, rng=self.rng)(rgb)
        rgb = np.asarray(rgb, np.float64) / 255.0
        depth = chain(depth)
        return rgb, depth

    def validation_preprocess(self, rgb, depth):
        chain = T.Compose([
            T.Resize(240.0 / IHEIGHT),
            T.CenterCrop(self.output_size),
        ])
        return np.asarray(chain(rgb), np.float64) / 255.0, chain(depth)

    def test_preprocess(self, rgb, depth):
        return self.validation_preprocess(rgb, depth)
