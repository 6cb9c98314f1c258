"""Depth-map visualization: jet-colormap comparison grids.

Reference: utils.py:71-117 (``colored_depthmap`` / ``merge_into_row(_with_gt)``
/ ``add_row`` / ``save_image``) used by the legacy loop to write comparison
PNGs every len/9 validation iterations (main.py:337-344).
"""
from __future__ import annotations

from typing import Optional

import numpy as np


def _jet(x: np.ndarray) -> np.ndarray:
    """Matplotlib-compatible jet colormap without the matplotlib import on
    the hot path; x in [0,1] -> (..., 3) in [0,1]."""
    r = np.clip(1.5 - np.abs(4.0 * x - 3.0), 0, 1)
    g = np.clip(1.5 - np.abs(4.0 * x - 2.0), 0, 1)
    b = np.clip(1.5 - np.abs(4.0 * x - 1.0), 0, 1)
    return np.stack([r, g, b], axis=-1)


def colored_depthmap(depth: np.ndarray, d_min: Optional[float] = None,
                     d_max: Optional[float] = None) -> np.ndarray:
    """(H, W) depth -> (H, W, 3) uint8-range float jet rendering."""
    depth = np.asarray(depth, np.float32)
    d_min = float(depth.min()) if d_min is None else d_min
    d_max = float(depth.max()) if d_max is None else d_max
    rel = (depth - d_min) / max(d_max - d_min, 1e-12)
    return 255.0 * _jet(rel)


def _nearest_resize(img: np.ndarray, h: int, w: int) -> np.ndarray:
    yi = (np.arange(h) * img.shape[0] // h).clip(0, img.shape[0] - 1)
    xi = (np.arange(w) * img.shape[1] // w).clip(0, img.shape[1] - 1)
    return img[yi][:, xi]


def merge_into_row(rgb: np.ndarray, depth_target: np.ndarray,
                   depth_pred: np.ndarray) -> np.ndarray:
    """[RGB | GT | prediction] strip with a shared color scale.

    rgb: (H, W, 3) in [0,1]; depths: (H', W') - the rgb is resized to the
    depth resolution when they differ (the model predicts at 128x128 from
    226x226 inputs).
    """
    t = np.squeeze(np.asarray(depth_target))
    p = np.squeeze(np.asarray(depth_pred))
    if rgb.shape[:2] != t.shape:
        rgb = _nearest_resize(np.asarray(rgb), *t.shape)
    d_min = min(t.min(), p.min())
    d_max = max(t.max(), p.max())
    row = [255.0 * np.asarray(rgb),
           colored_depthmap(t, d_min, d_max),
           colored_depthmap(p, d_min, d_max)]
    return np.hstack(row)


def merge_into_row_with_gt(rgb, depth_input, depth_target, depth_pred):
    """[RGB | sparse input | GT | prediction] strip (utils.py:94-108)."""
    maps = [np.squeeze(np.asarray(m))
            for m in (depth_input, depth_target, depth_pred)]
    d_min = min(m.min() for m in maps)
    d_max = max(m.max() for m in maps)
    row = [255.0 * np.asarray(rgb)] + [
        colored_depthmap(m, d_min, d_max) for m in maps]
    return np.hstack(row)


def add_row(grid: np.ndarray, row: np.ndarray) -> np.ndarray:
    return np.vstack([grid, row])


def save_image(grid: np.ndarray, filename: str):
    from PIL import Image
    Image.fromarray(np.asarray(grid).astype("uint8")).save(filename)
