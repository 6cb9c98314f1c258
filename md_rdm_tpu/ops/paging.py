"""Tile paging for large comparison matrices (computations.py:201-238).

Maps >= 32x32 are split into 16x16 tiles (with matching 8x8 tiles of the
coarser map) so the per-tile ALS problems stay small.  The split is a pure
reshape/transpose; tiles are stacked into the batch axis so every page's
comparison + quantize + ALS runs in one batched call instead of a Python
loop over pages (RDM_Net.py:389-393).

``reconstruct`` note: the reference's reassembly concatenates
``splits[0:ratio]`` for *every* row (computations.py:228-232), duplicating
the first row of tiles - a bug acknowledged in the survey.  The default here
is the intended grid reassembly; ``faithful=True`` reproduces the reference
byte-for-byte for parity testing.
"""
from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp


def split_into_tiles(x: jnp.ndarray, tile: int) -> jnp.ndarray:
    """(B, 1, H, W) -> (B, n_tiles, 1, tile, tile) in row-major tile order."""
    b, c, h, w = x.shape
    gh, gw = h // tile, w // tile
    x = x.reshape(b, c, gh, tile, gw, tile)
    x = x.transpose(0, 2, 4, 1, 3, 5)          # (B, gh, gw, C, t, t)
    return x.reshape(b, gh * gw, c, tile, tile)


def split_matrix(dn: jnp.ndarray, dn_1: jnp.ndarray,
                 tile: int = 16) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Page d_n into 16x16 tiles and d_{n-1} into matching 8x8 tiles.

    Returns (B, P, 1, 16, 16) and (B, P, 1, 8, 8); P = (H/16)^2.
    Tile order matches the reference's double loop (row-major).
    """
    return split_into_tiles(dn, tile), split_into_tiles(dn_1, tile // 2)


def merge_pages(pages: jnp.ndarray, grid: int, faithful: bool = False) -> jnp.ndarray:
    """(B, P, 1, t, t) pages -> (B, 1, grid*t, grid*t) map.

    ``faithful=False`` (default): proper row-major grid reassembly.
    ``faithful=True``: reproduce computations.py:228-232 - every tile-row is
    the *first* ``grid`` pages stacked along H, repeated along W.
    """
    b, p_cnt, c, t, _ = pages.shape
    if faithful:
        row = pages[:, :grid].transpose(0, 2, 1, 3, 4).reshape(b, c, grid * t, t)
        return jnp.tile(row, (1, 1, 1, grid))
    x = pages.reshape(b, grid, grid, c, t, t)
    x = x.transpose(0, 3, 1, 4, 2, 5)          # (B, C, gh, t, gw, t)
    return x.reshape(b, c, grid * t, grid * t)
