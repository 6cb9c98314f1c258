"""Regenerate the corrected NYU depth mat from mirror-plane annotations.

Working form of the reference's correction tooling
(nyu_dataloader.py:42-93 ``correct_depth`` + :206-238
``depth_correct_writer``): for every annotated image index in points.json,
fit the plane through the three annotated points, dilate+threshold the mask
PNG, overwrite masked depths with plane depth, and write
``depths_corrected``/``masks`` into the corrected mat (h5 format).

Usage:
  python tools/depth_correct_writer.py --mat nyu_depth_v2_labeled_corrected.mat \
      --points points.json --masks ./masks [--indices 25 26]
"""
from __future__ import annotations

import argparse
import json
from pathlib import Path

import numpy as np


def load_mask(path: Path) -> np.ndarray:
    import cv2
    mask = cv2.imread(path.as_posix(), cv2.IMREAD_GRAYSCALE)
    mask = cv2.dilate(mask, np.ones((5, 5), np.uint8), iterations=1)
    _, mask = cv2.threshold(mask, 128, 255,
                            cv2.THRESH_BINARY | cv2.THRESH_OTSU)
    return (mask.astype(np.float32) / 255).astype(bool)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mat", required=True)
    ap.add_argument("--points", default="points.json")
    ap.add_argument("--masks", default=".")
    ap.add_argument("--indices", type=int, nargs="*", default=None)
    args = ap.parse_args()

    import h5py

    from md_rdm_tpu.data.nyu import correct_mirror_depth

    with open(args.points) as f:
        points = json.load(f)
    masks_dir = Path(args.masks)

    with h5py.File(args.mat, "r+") as data:
        n = data["depths"].shape[0]
        if "depths_corrected" not in data:
            data.create_dataset("depths_corrected",
                                shape=data["depths"].shape,
                                dtype=np.float32)
        if "masks" not in data:
            data.create_dataset("masks", shape=(n, 640, 480), dtype=np.uint8)

        indices = args.indices if args.indices else sorted(
            int(k) for k in points)
        for index in indices:
            depth = np.transpose(data["depths"][index], (1, 0))
            pts = points.get(str(index))
            if pts is None:
                corrected, mask = depth, None
            elif len(pts) == 2:     # two mirrors in the scene
                corrected = depth
                mask = np.zeros(depth.shape, bool)
                for j, p in enumerate(pts, 1):
                    m = load_mask(masks_dir / f"{index}_{j}.png")
                    corrected = correct_mirror_depth(corrected, p, m)
                    mask |= m
            elif len(pts) == 6:
                mask = load_mask(masks_dir / f"{index}.png")
                corrected = correct_mirror_depth(depth, pts, mask)
            else:
                raise ValueError(f"bad annotation for index {index}")

            data["depths_corrected"][index] = np.transpose(corrected, (1, 0))
            if mask is not None:
                data["masks"][index] = np.transpose(
                    mask.astype(np.uint8), (1, 0))
            print(f"corrected index {index}")


if __name__ == "__main__":
    main()
