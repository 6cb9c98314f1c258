"""Structured3D panorama dataset (dataloaders/structured3d_dataloader.py).

Scene directories scanned under the given root (the reference hardcodes
``/mnt/hdd/shared_datasets/Structured3D`` and ignores its root argument -
fixed here): scenes [0, 3000) train / [3000, ...) val of
``<scene>/2D_rendering/<id>/panorama/empty/{rgb_rawlight,depth}.png``.
Depth PNGs are millimeters, converted to meters and clipped to [0, 10]
(structured3d_dataloader.py:15-23).  Output (228, 405); raw size 512x1024.
"""
from __future__ import annotations

from pathlib import Path
from typing import Tuple

import numpy as np
from PIL import Image

from md_rdm_tpu.data import transforms as T
from md_rdm_tpu.data.base import BaseDataset
from md_rdm_tpu.data.floorplan3d import load_rgb

IHEIGHT, IWIDTH = 512, 1024


def load_depth_mm(path: str) -> np.ndarray:
    d = np.array(Image.open(path), dtype=np.uint16).astype(np.float32) / 1000.0
    return np.clip(d, 0.0, 10.0)


class Structured3DDataset(BaseDataset):
    def __init__(self, root: str, dataset_type: str = "panorama",
                 split: str = "train",
                 output_size: Tuple[int, int] = (228, 405),
                 train_scenes: int = 3000, seed: int = 0):
        super().__init__(split)
        self.output_size = output_size
        self.rng = np.random.default_rng(seed)
        scene_dirs = sorted(p for p in Path(root).glob("*") if p.is_dir())
        chosen = (scene_dirs[:train_scenes] if split == "train"
                  else scene_dirs[train_scenes:])
        files = []
        for scene in chosen:
            for render in sorted((scene / "2D_rendering").glob("*")):
                rgb = render / "panorama" / "empty" / "rgb_rawlight.png"
                depth = render / "panorama" / "empty" / "depth.png"
                if rgb.exists() and depth.exists():
                    files.append((rgb.as_posix(), depth.as_posix()))
        self.images = files

    def get_raw(self, index: int):
        rgb_path, depth_path = self.images[index]
        return load_rgb(rgb_path), load_depth_mm(depth_path)

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
        return np.asarray(rgb, np.float64) / 255.0, chain(depth)

    def validation_preprocess(self, rgb, depth):
        chain = T.Compose([
            T.Resize(240.0 / IHEIGHT),
            T.CenterCrop(self.output_size),
        ])
        return np.asarray(chain(rgb), np.float64) / 255.0, chain(depth)

    def test_preprocess(self, rgb, depth):
        return self.validation_preprocess(rgb, depth)
