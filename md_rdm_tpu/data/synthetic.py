"""Synthetic depth dataset for tests and benchmarks (no reference analogue;
stands in for NYU when no dataset is mounted).

Generates smooth positive depth fields (mixture of 2-D cosines) with
matching pseudo-RGB renderings, deterministically per index.
"""
from __future__ import annotations

from typing import Tuple

import numpy as np

from md_rdm_tpu.data.base import BaseDataset


def _field(rng: np.random.Generator, h: int, w: int) -> np.ndarray:
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    out = np.zeros((h, w), np.float32)
    for _ in range(4):
        fy, fx = rng.uniform(0.5, 3.0, 2)
        py, px = rng.uniform(0, 2 * np.pi, 2)
        out += rng.uniform(0.2, 1.0) * np.cos(
            2 * np.pi * (fy * yy / h + fx * xx / w) + py + px)
    return out


class SyntheticDepthDataset(BaseDataset):
    """``correlated=True`` renders the RGB channels from the depth field
    (normalized depth + directional shading from its gradients), so there IS
    a learnable rgb->depth mapping - used for learning-dynamics runs.  The
    default (False) keeps rgb independent: pipeline/shape tests only.

    ``cache=True`` materializes every sample once (the 1-core host is
    otherwise generation-bound at ~8 cos-field evaluations per sample).
    """

    def __init__(self, split: str = "train", size: int = 64,
                 output_size: Tuple[int, int] = (226, 226), seed: int = 0,
                 correlated: bool = False, cache: bool = False):
        super().__init__(split)
        self.n = size
        self.output_size = output_size
        self.seed = seed
        self.correlated = correlated
        self.images = list(range(size))
        self._cache = {} if cache else None

    def get_raw(self, index: int):
        if self._cache is not None and index in self._cache:
            return self._cache[index]
        rng = np.random.default_rng(self.seed * 100003 + index)
        h, w = self.output_size
        depth = 1.0 + 4.0 * (1.0 + _field(rng, h, w) / 4.0)   # ~[1, 9] m
        if self.correlated:
            gy, gx = np.gradient(depth)

            def norm01(a):
                return (a - a.min()) / (np.ptp(a) + 1e-6)

            rgb = np.stack([norm01(depth), norm01(gy), norm01(gx)], axis=-1)
        else:
            rgb = np.stack([_field(rng, h, w) for _ in range(3)], axis=-1)
            rgb = (rgb - rgb.min()) / (np.ptp(rgb) + 1e-6)
        item = rgb.astype(np.float32), depth.astype(np.float32)
        if self._cache is not None:
            self._cache[index] = item
        return item

    def training_preprocess(self, rgb, depth):
        return rgb, depth

    def validation_preprocess(self, rgb, depth):
        return rgb, depth

    def test_preprocess(self, rgb, depth):
        return rgb, depth
