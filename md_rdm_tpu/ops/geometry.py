"""Geometric-mean normalization ops (reference computations.py:240-255).

``quick_gm`` computes the per-image geometric mean of a depth map; every map
in the pipeline is normalized by it (RDM_Net.py:117, module.py:145-150,
computations.py:76,146).

The reference computes ``prod(x ** (1/n))``.  We use ``exp(mean(log x))``,
which is identical for x > 0, maps x == 0 to 0 the same way
(log 0 = -inf -> prod 0), and produces NaN for negative inputs in both
formulations - but is numerically far more stable for large n (no underflow
of the n-th roots' product) and is a single VPU-friendly reduction.
"""
from __future__ import annotations

import jax.numpy as jnp


def geometric_mean_flat(x: jnp.ndarray, axis=-1, keepdims: bool = False):
    """exp(mean(log x)) along ``axis``."""
    return jnp.exp(jnp.mean(jnp.log(x), axis=axis, keepdims=keepdims))


def quick_gm(maps: jnp.ndarray) -> jnp.ndarray:
    """Per-image geometric mean of (B, ...) maps -> (B,) vector.

    Equivalent to reference ``quick_gm(t.view(B, H*W, 1), H)``
    (computations.py:244-255) for any trailing spatial shape.
    """
    b = maps.shape[0]
    return geometric_mean_flat(maps.reshape(b, -1), axis=-1)


def normalize_gm(maps: jnp.ndarray) -> jnp.ndarray:
    """Divide each image by its geometric mean (module.py:145-150).

    maps: (B, ...) - normalized over all non-batch axes.
    """
    gm = quick_gm(maps)
    return maps / gm.reshape((-1,) + (1,) * (maps.ndim - 1))


def geometric_resize(maps: jnp.ndarray, n: int = 1) -> jnp.ndarray:
    """Downscale (B, 1, H, W) by 2**n via per-2x2-block geometric means.

    Replaces the reference's triple Python loop (computations.py:313-355,
    ``alt_resize``/``geometric_resize``/``compress_entry``) with
    exp(avgpool2(log)) - one reshape-mean per level.
    """
    for _ in range(n):
        b, c, h, w = maps.shape
        lg = jnp.log(maps).reshape(b, c, h // 2, 2, w // 2, 2)
        maps = jnp.exp(jnp.mean(lg, axis=(3, 5)))
    return maps


def min_eps(losses, eps: float = 1e-6) -> bool:
    """Convergence check on an ALS loss history (computations.py:157-167):
    True while the last delta exceeds eps (host-side helper; the compiled
    ALS loop uses a fixed iteration count like the reference's live path).
    """
    if len(losses) < 2:
        return True
    return abs(float(losses[-1]) - float(losses[-2])) > eps


def find_nans(tree) -> bool:
    """True if any leaf of a pytree contains NaNs (computations.py:297-306;
    debugging aid alongside the jax_debug_nans flag)."""
    import jax

    for leaf in jax.tree_util.tree_leaves(tree):
        if bool(jnp.isnan(jnp.asarray(leaf)).any()):
            return True
    return False
