"""NYU Depth v2 dataset - dual backend (sparse-to-dense h5 / labeled mat).

Reference: dataloaders/nyu_dataloader.py.

* h5 backend (``sparse_2_dense``): one ``.h5`` per image with ``rgb``
  (3,H,W uint8) and ``depth`` (H,W float) keys (nyu_dataloader.py:169-174),
  optionally auto-downloaded (:113-139).
* mat backend (all other dataset_types): the single
  ``nyu_depth_v2_labeled_corrected.mat`` plus ``split.mat`` index file
  (:158-204), with mirror-index filtering (:23-25,145-148) and
  plane-fit depth correction tooling (ported in ``correct_mirror_depth``).

Augmentation recipe (train, nyu_dataloader.py:240-271): depth /= s~U(1,1.5),
ColorJitter(.4,.4,.4), short-side resize 250, rotate +-5 deg, resize 250*s,
center-crop to output size, p=.5 hflip.  RGB scaled to [0,1] (torchvision
to_tensor semantics on uint8).
"""
from __future__ import annotations

import tarfile
import urllib.request
from pathlib import Path
from typing import Tuple

import numpy as np

from md_rdm_tpu.data import transforms as T
from md_rdm_tpu.data.base import BaseDataset

DATASET_TYPES = ['labeled', 'no_mirror', 'corrected', 'mirror',
                 'mirror_corrected', 'sparse_2_dense', 'no_mirror_no_window',
                 'mirror_pixel', 'mirror_pixel_corrected']

URLS = {
    "split": "http://horatio.cs.nyu.edu/mit/silberman/indoor_seg_sup/splits.mat",
    "mapping40": "https://github.com/ankurhanda/nyuv2-meta-data/raw/master/classMapping40.mat",
    "sparse2dense": "http://datasets.lids.mit.edu/sparse-to-dense/data/nyudepthv2.tar.gz",
    "corrected": "https://cloudstore.uni-ulm.de/s/mRwWiLCCjsC6Rkf/download",
}

# validation/train mirror-scene indices (nyu_dataloader.py:23-25)
VAL_MIRROR_IDX = [25, 26, 76, 77, 86, 102, 131, 161, 162, 171, 172, 194, 195,
                  196, 199, 259, 266, 267, 268, 269, 271, 272, 273, 276, 277,
                  282, 283, 285, 286, 287, 290, 292, 294, 299, 302, 303, 305,
                  306, 308, 310, 313, 314, 323, 391, 401, 423, 427, 435, 440,
                  445, 457, 458, 487, 496, 505, 579, 583, 585, 586, 606, 609,
                  612, 613, 619]
TRAIN_MIRROR_IDX = [18, 20, 21, 91, 103, 104, 128, 130, 136, 139, 142, 143,
                    144, 145, 208, 209, 264, 269, 305, 306, 307, 308, 309,
                    311, 313, 317, 381, 382, 384, 386, 387, 388, 389, 391,
                    392, 394, 395, 396, 398, 400, 402, 404, 405, 406, 409,
                    412, 413, 414, 415, 416, 418, 420, 421, 423, 425, 426,
                    428, 439, 441, 473, 501, 532, 559, 566, 569, 574, 587,
                    588, 600, 608, 613, 615, 639, 640, 665, 666, 705, 706,
                    743, 756, 767, 768, 769, 774, 775, 780, 781, 782, 784]
MIRROR_EXCLUDE = [2, 8, 13, 15, 16, 27, 28, 34, 42, 52, 58, 60]


def _download(path: Path, url: str):
    path.parent.mkdir(parents=True, exist_ok=True)
    print(f"downloading {url} -> {path}")
    urllib.request.urlretrieve(url, filename=path)


def _safe_extract(tar_path: Path, dest: Path):
    """Path-traversal-safe tar extraction (nyu_dataloader.py:119-138)."""
    with tarfile.open(tar_path, "r") as tar:
        dest_resolved = dest.resolve()
        for member in tar.getmembers():
            target = (dest / member.name).resolve()
            if not str(target).startswith(str(dest_resolved)):
                raise RuntimeError("tar path traversal attempt")
        tar.extractall(dest)


class NYUDataset(BaseDataset):
    def __init__(self, path: str, dataset_type: str = "sparse_2_dense",
                 split: str = "train", output_size: Tuple[int, int] = (226, 226),
                 resize: int = 250, n_images: int = -1,
                 download: bool = False, seed: int = 0):
        super().__init__(split)
        if dataset_type not in DATASET_TYPES:
            raise ValueError(
                f"unknown NYU dataset type {dataset_type}; "
                f"available: {DATASET_TYPES}")
        if "corrected" in dataset_type and split == "train":
            raise ValueError("cannot use corrected depth during training")
        self.dataset_type = dataset_type
        self.output_size = output_size
        self.resize = resize
        self.rng = np.random.default_rng(seed)
        self.use_mat = dataset_type != "sparse_2_dense"
        self.use_corrected_depth = ("corrected" in dataset_type
                                    and split != "train")
        self.mirrors_only = dataset_type in (
            'mirror', 'mirror_corrected', 'mirror_pixel',
            'mirror_pixel_corrected')

        root = Path(path)
        if not self.use_mat:
            self.path = root / ("train" if "train" in split else "val")
            if not self.path.exists() and download:
                tar = root / "nyudepthv2.tar.gz"
                if not tar.exists():
                    _download(tar, URLS["sparse2dense"])
                _safe_extract(tar, root)
            self.images = sorted(
                p.as_posix() for p in self.path.glob("**/*.h5"))
        else:
            self.path = root
            self.mat_file = root / "nyu_depth_v2_labeled_corrected.mat"
            split_file = root / "split.mat"
            if download:
                if not self.mat_file.exists():
                    _download(self.mat_file, URLS["corrected"])
                if not split_file.exists():
                    _download(split_file, URLS["split"])
            import scipy.io
            key = "trainNdxs" if split == "train" else "testNdxs"
            self.images = np.hstack(
                scipy.io.loadmat(split_file)[key]) - 1
            self._mat_handle = None
            # 894-class -> 40-class label map (nyu_dataloader.py:143,166):
            # index 0 prepended so raw label 0 (unlabeled) maps to 0.  Used
            # by the label-masked dataset types and labels_40().
            mapping_file = root / "classMapping40.mat"
            if download and not mapping_file.exists():
                _download(mapping_file, URLS["mapping40"])
            self.mapping40 = None
            if mapping_file.exists():
                self.mapping40 = np.insert(
                    scipy.io.loadmat(mapping_file)["mapClass"][0], 0, 0)
            if (("no_mirror" in dataset_type or "no_window" in dataset_type)
                    and self.mapping40 is None):
                raise RuntimeError(
                    f"dataset type {dataset_type} needs classMapping40.mat "
                    f"under {root} (pass download=True to fetch it)")

        if len(self.images) == 0:
            raise RuntimeError(f"found 0 images under {path}")
        if self.mirrors_only:
            mirror_idx = (TRAIN_MIRROR_IDX if split == "train"
                          else VAL_MIRROR_IDX)
            self.images = self.images[
                [i for i in range(len(self.images)) if i in mirror_idx]]
            self.images = self.images[
                [i for i in range(len(self.images))
                 if i not in MIRROR_EXCLUDE]]
        if n_images > 0:
            self.images = self.images[:n_images]

    # ------------------------------------------------------------ loaders ---
    def get_raw(self, index: int):
        if self.use_mat:
            return self._mat_loader(self.images[index])
        return self._h5_loader(self.images[index])

    def _h5_loader(self, path: str):
        import h5py
        with h5py.File(path, "r") as f:
            rgb = np.array(f["rgb"]).transpose(1, 2, 0)
            depth = np.array(f["depth"])
        return rgb, depth

    def _mat_loader(self, index: int):
        import h5py
        if self._mat_handle is None:
            self._mat_handle = h5py.File(self.mat_file, "r")
        data = self._mat_handle
        key = ("depths_corrected" if self.use_corrected_depth
               and "depths_corrected" in data else "depths")
        depth = np.transpose(data[key][index], (1, 0))
        if self.use_corrected_depth and np.max(depth) == 0:
            depth = np.transpose(data["depths"][index], (1, 0))
        rgb = np.transpose(data["images"][index], (2, 1, 0))
        # working form of the reference's sketched label masking
        # (nyu_dataloader.py:194-203): zero out mirror (class 19) and/or
        # window (class 9) depths so those pixels fall out of the masked
        # losses/metrics (target > 0)
        if "no_mirror" in self.dataset_type or "no_window" in self.dataset_type:
            labels_40 = self.labels_40(index)
            depth = depth.copy()
            if "no_mirror" in self.dataset_type:
                depth[labels_40 == 19] = 0.0
            if "no_window" in self.dataset_type:
                depth[labels_40 == 9] = 0.0
        return rgb, depth

    def labels_40(self, index: int) -> np.ndarray:
        """Per-pixel 40-class semantic labels for a mat-backend image
        (nyu_dataloader.py:217-219)."""
        if self.mapping40 is None:
            raise RuntimeError("classMapping40.mat not available")
        if self._mat_handle is None:
            import h5py
            self._mat_handle = h5py.File(self.mat_file, "r")
        labels = np.transpose(self._mat_handle["labels"][index], (1, 0))
        return self.mapping40[labels]

    # ------------------------------------------------------- preprocessing ---
    def training_preprocess(self, rgb, depth):
        s = self.rng.uniform(1.0, 1.5)
        depth = np.asarray(depth, np.float32) / s
        rgb = np.asarray(rgb, np.uint8)

        rgb = T.ColorJitter(0.4, 0.4, 0.4, rng=self.rng)(rgb)
        rgb = T.ResizeTo(self.resize)(rgb)
        depth = T.ResizeTo(self.resize)(depth)
        angle = self.rng.uniform(-5.0, 5.0)
        rgb = T.Rotate(angle)(rgb)
        depth = T.Rotate(angle)(depth)
        rgb = T.ResizeTo(int(self.resize * s))(rgb)
        depth = T.ResizeTo(int(self.resize * s))(depth)
        rgb = T.CenterCrop(self.output_size)(rgb)
        depth = T.CenterCrop(self.output_size)(depth)
        if self.rng.uniform() > 0.5:
            rgb = np.fliplr(rgb)
            depth = np.fliplr(depth)
        return (np.asarray(rgb, np.float32) / 255.0,
                np.asarray(depth, np.float32))

    def validation_preprocess(self, rgb, depth):
        rgb = T.ResizeTo(self.resize)(np.asarray(rgb, np.uint8))
        depth = T.ResizeTo(self.resize)(np.asarray(depth, np.float32))
        rgb = T.CenterCrop(self.output_size)(rgb)
        depth = T.CenterCrop(self.output_size)(depth)
        return (np.asarray(rgb, np.float32) / 255.0,
                np.asarray(depth, np.float32))

    def test_preprocess(self, rgb, depth):
        rgb = T.ResizeTo(500)(np.asarray(rgb, np.uint8))
        depth = T.ResizeTo(500)(np.asarray(depth, np.float32))
        rgb = T.CenterCrop((480, 640))(rgb)
        depth = T.CenterCrop((480, 640))(depth)
        rgb = T.ResizeTo(self.output_size)(rgb)
        depth = T.ResizeTo(self.output_size)(depth)
        return (np.asarray(rgb, np.float32) / 255.0,
                np.asarray(depth, np.float32))


def correct_mirror_depth(depth: np.ndarray, points: np.ndarray,
                         mask: np.ndarray) -> np.ndarray:
    """Plane-fit depth correction for mirror regions
    (nyu_dataloader.py:42-93): fit the plane through three annotated points
    and overwrite masked pixels with the plane depth.

    depth: (H,W); points: 6-vector of three (x,y) pixel coords;
    mask: (H,W) bool of mirror pixels.
    """
    p0 = np.array([points[1], points[0]])
    p1 = np.array([points[3], points[2]])
    p2 = np.array([points[5], points[4]])
    d0 = np.append(p0, depth[int(p0[0]), int(p0[1])])
    d1 = np.append(p1, depth[int(p1[0]), int(p1[1])])
    d2 = np.append(p2, depth[int(p2[0]), int(p2[1])])
    a, b, v = d0 - d1, d2 - d1, d1
    ys, xs = np.where(mask)
    b_div = b[1] / b[0]
    s = (xs - v[1] - ys * b_div + b_div * v[0]) / (a[1] - a[0] * b_div)
    t = (ys - v[0] - a[0] * s) / b[0]
    out = depth.copy()
    out[ys, xs] = v[2] + a[2] * s + b[2] * t
    return out
