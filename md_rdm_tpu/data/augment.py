"""On-device augmentation: the whole spatial recipe as ONE affine warp.

The reference's host-side recipe (nyu_dataloader.py:240-271, also
floorplan3d/structured3d/kitti variants) is a chain of dynamic-shape steps:
short-side resize -> rotate(+-5 deg) -> resize by s~U(1,1.5) -> center-crop
-> hflip.  Dynamic shapes are hostile to XLA, so here every step is folded
into a single 2x3 affine per image (static output size), evaluated with one
bilinear (or nearest) sampling pass - then color jitter as fused elementwise
ops.  Everything takes explicit PRNG keys and vmaps over the batch, so
augmentation + forward + backward compile into one graph (BASELINE.json
north star).

This is the fast "device" backend; the "host" backend
(md_rdm_tpu/data/*.py preprocess hooks) keeps PIL/scipy reference parity.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp


def _rotation(angle_deg: jnp.ndarray) -> jnp.ndarray:
    a = angle_deg * (jnp.pi / 180.0)
    c, s = jnp.cos(a), jnp.sin(a)
    return jnp.array([[c, -s], [s, c]])


def build_affine(in_hw: Tuple[int, int], out_hw: Tuple[int, int],
                 base_resize: float, scale: jnp.ndarray,
                 angle_deg: jnp.ndarray, flip: jnp.ndarray) -> jnp.ndarray:
    """Compose resize(base) -> rotate -> resize(scale) -> center-crop -> flip
    into one output->input coordinate map.  Returns (2, 3) [A | t] such that
    in_coords = A @ out_coords + t (row/col convention)."""
    ih, iw = in_hw
    oh, ow = out_hw
    # centers: output crop center maps to input center
    in_c = jnp.array([(ih - 1) / 2.0, (iw - 1) / 2.0])
    out_c = jnp.array([(oh - 1) / 2.0, (ow - 1) / 2.0])
    # forward chain is crop(center) . scale(s*base) . rotate(theta); the
    # inverse (output -> input) is rotate(-theta) . scale(1/(s*base))
    inv_scale = 1.0 / (base_resize * scale)
    rot = _rotation(-angle_deg)
    a = rot * inv_scale
    # horizontal flip negates the output column axis; re-anchoring the crop
    # center below turns that into a mirror about the center column
    flip_sign = jnp.where(flip, -1.0, 1.0)
    a = a.at[:, 1].multiply(flip_sign)
    t = in_c - a @ out_c
    return jnp.concatenate([a, t[:, None]], axis=1)


def warp_bilinear(img: jnp.ndarray, affine: jnp.ndarray,
                  out_hw: Tuple[int, int], fill: float = 0.0) -> jnp.ndarray:
    """Sample (H, W, C) image at affine-mapped coordinates, bilinear,
    zero/fill padding outside."""
    oh, ow = out_hw
    yy, xx = jnp.meshgrid(jnp.arange(oh, dtype=jnp.float32),
                          jnp.arange(ow, dtype=jnp.float32), indexing="ij")
    coords = jnp.stack([yy.ravel(), xx.ravel()])           # (2, oh*ow)
    src = affine[:, :2] @ coords + affine[:, 2:3]
    sy, sx = src[0], src[1]
    h, w = img.shape[0], img.shape[1]

    y0 = jnp.floor(sy)
    x0 = jnp.floor(sx)
    wy = sy - y0
    wx = sx - x0
    valid = (sy >= 0) & (sy <= h - 1) & (sx >= 0) & (sx <= w - 1)

    def gather(yi, xi):
        yi = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        xi = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        return img[yi, xi]

    v00 = gather(y0, x0)
    v01 = gather(y0, x0 + 1)
    v10 = gather(y0 + 1, x0)
    v11 = gather(y0 + 1, x0 + 1)
    wy = wy[:, None] if img.ndim == 3 else wy
    wx = wx[:, None] if img.ndim == 3 else wx
    out = (v00 * (1 - wy) * (1 - wx) + v01 * (1 - wy) * wx
           + v10 * wy * (1 - wx) + v11 * wy * wx)
    mask = valid[:, None] if img.ndim == 3 else valid
    out = jnp.where(mask, out, fill)
    shape = (oh, ow) if img.ndim == 2 else (oh, ow, img.shape[-1])
    return out.reshape(shape)


def color_jitter(key: jax.Array, rgb: jnp.ndarray,
                 brightness: float = 0.4, contrast: float = 0.4,
                 saturation: float = 0.4) -> jnp.ndarray:
    """PIL-ImageEnhance-equivalent jitter on a (H, W, 3) [0,1] image.

    brightness: x*f; contrast: mean_gray + (x-mean)*f;
    saturation: gray + (x-gray)*f with ITU-R 601 luma. (Order fixed
    b->c->s; the reference shuffles - documented deviation of the device
    backend.)
    """
    kb, kc, ks = jax.random.split(key, 3)
    fb = jax.random.uniform(kb, (), minval=1 - brightness,
                            maxval=1 + brightness)
    fc = jax.random.uniform(kc, (), minval=1 - contrast, maxval=1 + contrast)
    fs = jax.random.uniform(ks, (), minval=1 - saturation,
                            maxval=1 + saturation)
    x = rgb * fb
    luma = (0.299 * x[..., 0] + 0.587 * x[..., 1] + 0.114 * x[..., 2])
    x = luma.mean() + (x - luma.mean()) * fc
    x = luma[..., None] + (x - luma[..., None]) * fs
    return jnp.clip(x, 0.0, 1.0)


@functools.partial(jax.jit, static_argnames=("out_hw", "base_resize"))
def augment_batch(key: jax.Array, rgb: jnp.ndarray, depth: jnp.ndarray,
                  out_hw: Tuple[int, int] = (226, 226),
                  base_resize: float = None) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Full train-time augmentation on device.

    rgb: (B, H, W, 3) float [0,1] or uint8 (wire format - normalized here
    on device so the host->device transfer ships 1/4 the bytes);
    depth: (B, 1, H, W).  Returns ((B, oh, ow, 3), (B, 1, oh, ow)).
    """
    if jnp.issubdtype(rgb.dtype, jnp.integer):
        rgb = rgb.astype(jnp.float32) * (1.0 / 255.0)
    b, h, w = rgb.shape[0], rgb.shape[1], rgb.shape[2]
    if base_resize is None:
        base_resize = 250.0 / min(h, w)

    def one(key, img, dep):
        k_s, k_a, k_f, k_c = jax.random.split(key, 4)
        s = jax.random.uniform(k_s, (), minval=1.0, maxval=1.5)
        angle = jax.random.uniform(k_a, (), minval=-5.0, maxval=5.0)
        flip = jax.random.uniform(k_f, ()) > 0.5
        aff = build_affine((h, w), out_hw, base_resize, s, angle, flip)
        img_o = warp_bilinear(img, aff, out_hw)
        img_o = color_jitter(k_c, img_o)
        dep_o = warp_bilinear(dep[0], aff, out_hw) / s
        return img_o, dep_o[None]

    keys = jax.random.split(key, b)
    return jax.vmap(one)(keys, rgb, depth)
