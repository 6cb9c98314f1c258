"""Pairwise depth-ratio comparison matrices for the relative decoders.

Reference: RDM_Net.py:244-284 (``sparse_comparison_v1`` /
``sparse_comparison_id``) and computations.py:269-295 (``get_resized_area``).

* v1 (8x8 path): full ratio matrix M[b, i, j] = d_i / d_j - a rank-1
  outer product, one batched matmul (the reference already does this).
* cross-scale (id path): the reference loops over every pixel (r, c) of
  d_n in Python, extracting a clamped 3x3 neighborhood window of the
  bicubic-downsized d_{n-1} embedded in a field of ones, and multiplies by
  the pixel value.  Key observation: the window *positions* depend only on
  static shapes, so the whole loop collapses to one static boolean mask
  (HW, H'W') computed in numpy at trace time:

      sparse[b, p, q] = d_n[b, p] * (1 / d_{n-1}[b, q]  if mask[p, q] else 1)

  One broadcasted multiply on the VPU - no gathers, no Python loops.
"""
from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np


def comparison_v1(d: jnp.ndarray) -> jnp.ndarray:
    """Full ratio matrix for a (B, 1, H, W) map -> (B, H*W, H*W)."""
    b = d.shape[0]
    v = d.reshape(b, -1)
    return v[:, :, None] * (1.0 / v[:, None, :])


@functools.lru_cache(maxsize=None)
def _neighborhood_mask(h: int, w: int) -> np.ndarray:
    """Static (H*W, H1*W1) mask of the clamped 3x3 windows.

    Mirrors the index arithmetic of RDM_Net.py:266-273: for pixel (r, c) of
    d_n the window rows are r_s..r_s+2 with r_s = clip(floor(r/2), 0, H1-3)
    and cols c_s..c_s+2 with c_s = clip(floor(c/2), 0, W1-3).
    """
    h1, w1 = h // 2, w // 2
    mask = np.zeros((h * w, h1 * w1), dtype=bool)
    for r in range(h):
        for c in range(w):
            rs = int(np.clip(np.floor(r / 2), 0, h1 - 3))
            cs = int(np.clip(np.floor(c / 2), 0, w1 - 3))
            p = r * w + c
            for rr in range(rs, rs + 3):
                for cc in range(cs, cs + 3):
                    mask[p, rr * w1 + cc] = True
    return mask


def comparison_cross_scale(dn: jnp.ndarray, dn_1: jnp.ndarray) -> jnp.ndarray:
    """Cross-scale sparse comparison (B,1,H,W) x (B,1,H/2,W/2) -> (B, HW, HW/4).

    Entries inside the 3x3 neighborhood window hold d_n[p] / d_{n-1}[q];
    entries outside hold d_n[p] (ratio against the implicit ones field,
    matching get_resized_area's ones_like embedding).
    """
    b, _, h, w = dn.shape
    mask = jnp.asarray(_neighborhood_mask(h, w))
    dn_flat = dn.reshape(b, h * w, 1)
    inv_prev = (1.0 / dn_1.reshape(b, 1, -1))
    return dn_flat * jnp.where(mask[None], inv_prev, 1.0)
