"""Batched alternating least squares for comparison-matrix factorization.

Reference: computations.py:38-85 (``quadratic_als``, square 64x64, 30 iters),
:95-155 (``alternating_least_squares``, rectangular (HW)x(HW/4), 100 iters),
:175-193 (``als_step``).

Structure exploited for TPU:

* The factors p, q are rank-1 *vectors*, so the "ridge solve"
  ``(F^T F + 0.05 I)^{-1}`` is a 1x1 inverse - a scalar reciprocal.  Each
  ALS step is one batched matvec plus a scalar divide; the whole loop is a
  ``lax.fori_loop`` with no linear-algebra calls at all.
* The reference records the batch-mean RMSE after every p-update and at the
  end picks the p from the *first* minimum (computations.py:74,143).  We
  carry a running (best_p, best_rmse) pair with a strict ``<`` comparison,
  which selects the same iterate without storing the history.

Faithful quirks preserved:

* The q-step uses ``sparse.view(B, W, H)`` - a *reshape*, not a transpose
  (computations.py:64,133).  For the square path this is the matrix itself;
  for the rectangular path it is a row-major rewrap.  We reproduce the
  reshape exactly.
* Normalization uses ``quick_gm(p, H)`` whose exponent is 1/H^2 even though
  p has only H entries (computations.py:244-255), i.e. gm(p)^(1/H).
  Reproduced via ``_quick_gm_pow``.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _als_step(ratings: jnp.ndarray, fixed: jnp.ndarray,
              reg: float = 0.05) -> jnp.ndarray:
    """One ridge LS update: (ratings @ fixed) / (fixed^T fixed + reg).

    ratings: (B, R, C); fixed: (B, C, 1) -> (B, R, 1).
    Matches computations.py:175-193 with the 1x1 inverse folded into a
    reciprocal.
    """
    denom = jnp.sum(fixed * fixed, axis=(1, 2), keepdims=True) + reg
    return jnp.matmul(ratings, fixed) / denom


def _rmse(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Scalar batch-mean RMSE (computations.py:172-173)."""
    return jnp.sqrt(jnp.mean((pred - target) ** 2))


def _quick_gm_pow(p: jnp.ndarray, rc: int) -> jnp.ndarray:
    """exp(sum(log p) / rc^2) over axis 1 - reference quick_gm semantics."""
    return jnp.exp(jnp.sum(jnp.log(p), axis=1, keepdims=True) / (rc * rc))


def als_factorize(sparse: jnp.ndarray, out_size: int,
                  num_iters: int) -> jnp.ndarray:
    """Factorize (B, H, W) comparison matrices, return (B,1,out,out) maps.

    Covers both reference entry points: square (H == W == out^2 / ... ) and
    rectangular (H = out^2, W = out^2/4).  ``num_iters`` is 30 for the
    square path and 100 for the rectangular one.
    """
    b, h, w = sparse.shape
    sparse = sparse.astype(jnp.float32)
    p = jnp.ones((b, h, 1), jnp.float32)
    q = jnp.ones((b, w, 1), jnp.float32)
    # faithful reshape (not transpose) used for the q-step
    sparse_r = sparse.reshape(b, w, h)

    best0 = _rmse(jnp.matmul(p, q.reshape(b, 1, w)), sparse)

    def body(_, carry):
        p, q, best_p, best_r = carry
        p_new = _als_step(sparse, q)
        r = _rmse(jnp.matmul(p_new, q.reshape(b, 1, w)), sparse)
        take = r < best_r
        best_p = jnp.where(take, p_new, best_p)
        best_r = jnp.where(take, r, best_r)
        q_new = _als_step(sparse_r, p_new)
        return p_new, q_new, best_p, best_r

    _, _, best_p, _ = jax.lax.fori_loop(
        0, num_iters, body, (p, q, p, best0))

    best_p = best_p / _quick_gm_pow(best_p, h)
    return best_p.reshape(b, 1, out_size, out_size)


def als_factorize_grouped(sparse: jnp.ndarray, out_size: int,
                          num_iters: int,
                          group_ids: jnp.ndarray,
                          num_groups: int) -> jnp.ndarray:
    """Grouped batched ALS: one fused iteration loop over matrices from
    several decoders, with the best-iterate RMSE selection pooled per
    *group* exactly as each decoder's standalone call would pool over its
    own batch (computations.py:55-74).

    Motivation: the optimal decoder set (1,6,7,8,9) otherwise runs three
    sequential 100-iteration ALS loops (d7, d8 pages, d9 pages) - a
    latency-bound chain.  Stacking them into one call cuts the sequential
    depth 3x while per-group RMSE keeps parity bit-for-bit in selection
    semantics.

    sparse: (N, H, W) with N = sum of per-decoder batch*pages;
    group_ids: (N,) int32 segment id per matrix; num_groups static.
    """
    n, h, w = sparse.shape
    sparse = sparse.astype(jnp.float32)
    p = jnp.ones((n, h, 1), jnp.float32)
    q = jnp.ones((n, w, 1), jnp.float32)
    sparse_r = sparse.reshape(n, w, h)
    counts = jax.ops.segment_sum(jnp.ones((n,)), group_ids,
                                 num_segments=num_groups)
    denom = counts * h * w

    def group_rmse(pred):
        sq = jnp.sum((pred - sparse) ** 2, axis=(1, 2))
        return jnp.sqrt(jax.ops.segment_sum(sq, group_ids,
                                            num_segments=num_groups) / denom)

    best_r0 = group_rmse(jnp.matmul(p, q.reshape(n, 1, w)))

    def body(_, carry):
        p, q, best_p, best_r = carry
        p_new = _als_step(sparse, q)
        r = group_rmse(jnp.matmul(p_new, q.reshape(n, 1, w)))
        take = r < best_r                      # (G,)
        take_rows = take[group_ids][:, None, None]
        best_p = jnp.where(take_rows, p_new, best_p)
        best_r = jnp.where(take, r, best_r)
        q_new = _als_step(sparse_r, p_new)
        return p_new, q_new, best_p, best_r

    _, _, best_p, _ = jax.lax.fori_loop(
        0, num_iters, body, (p, q, p, best_r0))
    best_p = best_p / _quick_gm_pow(best_p, h)
    return best_p.reshape(n, 1, out_size, out_size)


def quadratic_als(sparse: jnp.ndarray, n: int = 3,
                  num_iters: int = 30) -> jnp.ndarray:
    """Square-matrix ALS (computations.py:38-85): (B, 4^n, 4^n) -> 2^n maps."""
    return als_factorize(sparse, 2 ** n, num_iters)


def alternating_least_squares(sparse: jnp.ndarray, n: int = 4,
                              num_iters: int = 100) -> jnp.ndarray:
    """Rectangular ALS (computations.py:95-155): (B, 4^n, 4^(n-1)) -> 2^n."""
    return als_factorize(sparse, 2 ** n, num_iters)
