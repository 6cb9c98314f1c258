"""Host-side numpy/PIL transform library with reference semantics.

Reference: dataloaders/transforms.py (a vendored pre-torchvision transform
zoo).  Re-implemented against modern scipy/PIL APIs (the reference's
``scipy.ndimage.interpolation`` module no longer exists).  Behavioral
contract preserved:

* ``ToTensor``: HWC -> CHW float, **no** /255 (transforms.py:195-225)
* ``Resize``: a scalar size is a per-axis *scale factor*, not a target size
  (transforms.py:339 - ``h = shape[0] * size[0]``); PIL bilinear resampling
* ``Rotate``: nearest-neighbor (order=0), no reshape, no prefilter
  (transforms.py:288-309)
* ``HorizontalFlip``: np.fliplr (transforms.py:427-452)
* ``ColorJitter``: brightness/contrast/saturation via PIL ImageEnhance in
  random order (transforms.py:455-520)
* ``CenterCrop`` / ``Crop``: plain index windows (transforms.py:348,522)

Arrays are HWC (or HW for depth) float/uint8 numpy throughout.
"""
from __future__ import annotations

from typing import Callable, Sequence

import numpy as np
from PIL import Image, ImageEnhance
from scipy import ndimage


class Compose:
    def __init__(self, transforms: Sequence[Callable]):
        self.transforms = list(transforms)

    def __call__(self, img):
        for t in self.transforms:
            img = t(img)
        return img


class ToArray:
    """HWC -> CHW float32 (the reference's ToTensor without torch)."""

    def __call__(self, img: np.ndarray) -> np.ndarray:
        if img.ndim == 3:
            return np.ascontiguousarray(
                img.transpose(2, 0, 1)).astype(np.float32)
        if img.ndim == 2:
            return img.astype(np.float32)
        raise ValueError(f"expected 2/3-dim array, got {img.ndim}")


class Resize:
    """Scalar size = per-axis scale factor (faithful quirk); pair = scale
    factors per axis.  PIL bilinear."""

    def __init__(self, size, interpolation=Image.BILINEAR):
        if isinstance(size, (int, float)):
            self.size = (size, size)
        else:
            self.size = tuple(size)
        self.interpolation = interpolation

    def __call__(self, img: np.ndarray) -> np.ndarray:
        h = int(img.shape[0] * self.size[0])
        w = int(img.shape[1] * self.size[1])
        pil = Image.fromarray(img)
        return np.asarray(pil.resize((w, h), resample=self.interpolation))


class ResizeTo:
    """Resize to an absolute (h, w) or short-side int - torchvision
    semantics, used by the NYU path (nyu_dataloader.py:249 uses
    torchvision transforms.Resize(250) = short side 250)."""

    def __init__(self, size, interpolation=Image.BILINEAR):
        self.size = size
        self.interpolation = interpolation

    def __call__(self, img: np.ndarray) -> np.ndarray:
        h, w = img.shape[:2]
        if isinstance(self.size, int):
            if h <= w:
                nh, nw = self.size, max(1, round(w * self.size / h))
            else:
                nh, nw = max(1, round(h * self.size / w)), self.size
        else:
            nh, nw = self.size
        pil = Image.fromarray(img)
        return np.asarray(pil.resize((nw, nh), resample=self.interpolation))


class Rotate:
    def __init__(self, angle: float):
        self.angle = angle

    def __call__(self, img: np.ndarray) -> np.ndarray:
        return ndimage.rotate(img, self.angle, reshape=False,
                              prefilter=False, order=0)


class CenterCrop:
    def __init__(self, size):
        self.size = (size, size) if isinstance(size, (int, float)) \
            else tuple(size)

    def __call__(self, img: np.ndarray) -> np.ndarray:
        th, tw = int(self.size[0]), int(self.size[1])
        h, w = img.shape[:2]
        i = int(round((h - th) / 2.0))
        j = int(round((w - tw) / 2.0))
        return img[i:i + th, j:j + tw]


class Crop:
    def __init__(self, i: int, j: int, h: int, w: int):
        self.i, self.j, self.h, self.w = i, j, h, w

    def __call__(self, img: np.ndarray) -> np.ndarray:
        return img[self.i:self.i + self.h, self.j:self.j + self.w]


class HorizontalFlip:
    def __init__(self, do_flip: bool):
        self.do_flip = bool(do_flip)

    def __call__(self, img: np.ndarray) -> np.ndarray:
        return np.fliplr(img) if self.do_flip else img


class Lambda:
    def __init__(self, fn: Callable):
        self.fn = fn

    def __call__(self, img):
        return self.fn(img)


def adjust_brightness(img: Image.Image, factor: float) -> Image.Image:
    return ImageEnhance.Brightness(img).enhance(factor)


def adjust_contrast(img: Image.Image, factor: float) -> Image.Image:
    return ImageEnhance.Contrast(img).enhance(factor)


def adjust_saturation(img: Image.Image, factor: float) -> Image.Image:
    return ImageEnhance.Color(img).enhance(factor)


def adjust_hue(img: Image.Image, factor: float) -> Image.Image:
    """Shift hue by factor (in turns, |factor| <= 0.5) via HSV roll."""
    if not -0.5 <= factor <= 0.5:
        raise ValueError("hue factor out of range")
    h, s, v = img.convert("HSV").split()
    np_h = np.array(h, dtype=np.uint8)
    np_h = (np_h.astype(np.int16) + int(factor * 255)) % 256
    h = Image.fromarray(np_h.astype(np.uint8), "L")
    return Image.merge("HSV", (h, s, v)).convert("RGB")


class ColorJitter:
    """Brightness/contrast/saturation/hue jitter in random order."""

    def __init__(self, brightness=0.0, contrast=0.0, saturation=0.0, hue=0.0,
                 rng: np.random.Generator | None = None):
        self.brightness = brightness
        self.contrast = contrast
        self.saturation = saturation
        self.hue = hue
        self.rng = rng

    def __call__(self, img: np.ndarray) -> np.ndarray:
        rng = self.rng if self.rng is not None else np.random.default_rng()
        ops = []
        if self.brightness > 0:
            f = rng.uniform(max(0.0, 1 - self.brightness), 1 + self.brightness)
            ops.append(lambda im, f=f: adjust_brightness(im, f))
        if self.contrast > 0:
            f = rng.uniform(max(0.0, 1 - self.contrast), 1 + self.contrast)
            ops.append(lambda im, f=f: adjust_contrast(im, f))
        if self.saturation > 0:
            f = rng.uniform(max(0.0, 1 - self.saturation), 1 + self.saturation)
            ops.append(lambda im, f=f: adjust_saturation(im, f))
        if self.hue > 0:
            f = rng.uniform(-self.hue, self.hue)
            ops.append(lambda im, f=f: adjust_hue(im, f))
        rng.shuffle(ops)
        pil = Image.fromarray(img)
        for op in ops:
            pil = op(pil)
        return np.array(pil)
