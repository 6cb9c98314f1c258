"""Resize ops with exact PyTorch semantics, expressed as MXU matmuls.

The reference resizes depth maps with
``F.interpolate(x, size, mode='bicubic', align_corners=False)``
(computations.py:308-311) and upsamples with nearest-neighbor x2
(computations.py:357-360).  ``jax.image.resize`` uses different kernel
conventions, so bicubic is implemented here from first principles:

* source coordinate of output pixel o:  src = (o + 0.5) * (in/out) - 0.5
* 4-tap cubic convolution kernel with a = -0.75 (PyTorch/OpenCV constant)
* out-of-range taps clamp to the border (replicate), matching ATen's
  ``upsample_bicubic2d`` index clamping.

Because the taps and weights depend only on (in_size, out_size), the whole
resize is two small dense matrices applied separably:
``out = W_h @ img @ W_w^T`` - batched matmuls that map straight onto the MXU
instead of gather ops.  Weight matrices are cached per size pair.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

_A = -0.75  # cubic convolution alpha used by PyTorch


def _cubic_kernel(t: np.ndarray) -> np.ndarray:
    """Cubic convolution weight for |offset| t (vectorized, float64)."""
    t = np.abs(t)
    t2, t3 = t * t, t * t * t
    w = np.where(
        t <= 1.0,
        (_A + 2.0) * t3 - (_A + 3.0) * t2 + 1.0,
        np.where(t < 2.0, _A * t3 - 5.0 * _A * t2 + 8.0 * _A * t - 4.0 * _A, 0.0),
    )
    return w


@functools.lru_cache(maxsize=None)
def _bicubic_matrix(in_size: int, out_size: int) -> np.ndarray:
    """Dense (out_size, in_size) 1-D bicubic resampling matrix."""
    scale = in_size / out_size
    o = np.arange(out_size, dtype=np.float64)
    src = (o + 0.5) * scale - 0.5
    i0 = np.floor(src).astype(np.int64)
    t = src - i0
    w = np.stack([_cubic_kernel(t + 1.0), _cubic_kernel(t),
                  _cubic_kernel(t - 1.0), _cubic_kernel(t - 2.0)], axis=1)
    mat = np.zeros((out_size, in_size), dtype=np.float64)
    for k in range(4):
        idx = np.clip(i0 + (k - 1), 0, in_size - 1)
        np.add.at(mat, (o.astype(np.int64), idx), w[:, k])
    return mat


def resize_bicubic(x: jnp.ndarray, out_hw, dtype=jnp.float32) -> jnp.ndarray:
    """Bicubic resize of NCHW (or NHWC via transpose by caller) maps.

    x: (..., H, W) array; resized along the last two axes.
    out_hw: int or (out_h, out_w).
    Matches torch ``F.interpolate(mode='bicubic', align_corners=False)``
    (no antialiasing, border-replicate taps).
    """
    if isinstance(out_hw, int):
        out_hw = (out_hw, out_hw)
    out_h, out_w = out_hw
    in_h, in_w = x.shape[-2], x.shape[-1]
    wh = jnp.asarray(_bicubic_matrix(in_h, out_h), dtype=dtype)
    ww = jnp.asarray(_bicubic_matrix(in_w, out_w), dtype=dtype)
    x = x.astype(dtype)
    # (..., H, W) -> (..., out_h, W) -> (..., out_h, out_w).  HIGHEST matmul
    # precision: these are tiny contractions and drive the <1e-3 per-pixel
    # parity budget; bf16 MXU passes would eat it.
    hp = jax.lax.Precision.HIGHEST
    y = jnp.einsum("oh,...hw->...ow", wh, x, precision=hp)
    y = jnp.einsum("pw,...ow->...op", ww, y, precision=hp)
    return y


def upsample_nearest2(x: jnp.ndarray) -> jnp.ndarray:
    """Nearest-neighbor x2 upsample along last two axes (computations.py:357)."""
    x = jnp.repeat(x, 2, axis=-2)
    x = jnp.repeat(x, 2, axis=-1)
    return x


def multi_upsample(x: jnp.ndarray, n: int) -> jnp.ndarray:
    """n-fold nearest x2 upsample (computations.py:362-366).

    For power-of-two maps this equals a single nearest resize by 2**n.
    Implemented with one pair of repeats to avoid n round trips.
    """
    if n <= 0:
        return x
    f = 2 ** n
    x = jnp.repeat(x, f, axis=-2)
    x = jnp.repeat(x, f, axis=-1)
    return x
