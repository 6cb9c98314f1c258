"""Multi-scale depth decomposition and recombination (the fusion tail).

Reference: computations.py:368-528.

* ``decompose_depth_map`` - recursive Hadamard-division pyramid:
  ``d_{n-1} = bicubic(d_n, 2^{n-1})``, fine detail
  ``F_n = d_n / nearest_up2(d_{n-1})``; the base map D0 is appended unless
  the map is relative (computations.py:368-392).
* ``recombination`` - sums nearest-upsampled components to a 128x128 map in
  log space (computations.py:394-421).
* ``fine_detail_matrices`` - groups components into size slots and stacks
  their logs as (B, k, H*W) matrices (computations.py:423-484).
* ``make_pred`` - applies the learned fusion weight vector per slot.  The
  reference loops over the batch with per-sample matmuls
  (computations.py:512-528); here it is a single einsum.

All lists are ordered coarse->fine ([D0, F1, ..., Fn]), i.e. already in the
reversed order the reference produces with ``[::-1]`` at call sites
(RDM_Net.py:117, module.py:123).
"""
from __future__ import annotations

from typing import List, Sequence

import jax.numpy as jnp

from md_rdm_tpu.ops.resize import multi_upsample, resize_bicubic, upsample_nearest2


def decompose_depth_map(dn: jnp.ndarray, n: int,
                        relative_map: bool = False,
                        eps: float = 0.0) -> List[jnp.ndarray]:
    """Decompose a (B, 1, 2^n, 2^n) map into fine-detail components.

    Returns [D0, F1, ..., Fn] (or [F1..Fn] when ``relative_map``), each
    (B, 1, 2^k, 2^k) - coarse-to-fine order (callers of the reference
    reverse its fine-to-coarse output; we return reversed directly).

    ``eps`` > 0 enables the flag-gated stabilization the reference lacks
    (its find_nans guard is commented-out debug, computations.py:383):
    bicubic downsampling has negative lobes and ALS-filled relative maps
    have no positivity guarantee, so the Hadamard ratios can go <= 0 and
    later ``log`` them to NaN.  With eps set, each pyramid level is
    floored at eps and the ratios are clipped to [eps, 1/eps] - faithful
    mode (eps=0) is bit-identical to before.
    """
    fines: List[jnp.ndarray] = []
    for k in range(n, 0, -1):
        dn_1 = resize_bicubic(dn, 2 ** (k - 1))
        if eps:
            dn_1 = jnp.maximum(dn_1, eps)
            fines.append(jnp.clip(dn / upsample_nearest2(dn_1),
                                  eps, 1.0 / eps))
        else:
            fines.append(dn / upsample_nearest2(dn_1))
        dn = dn_1
    out = [] if relative_map else [dn]
    out.extend(reversed(fines))
    return out


def recombination(components: Sequence[jnp.ndarray], n: int = 7) -> jnp.ndarray:
    """Combine optimal components into a (B,1,2^n,2^n) log-space map.

    components are coarse->fine.  If the first is 1x1 the absolute base D0
    is included (computations.py:405-414), otherwise relative-only
    (:416-420).  Equivalent closed form: every component is nearest-
    upsampled to 2^n and summed (sum of logs == log of product of the
    Hadamard factors).
    """
    size = 2 ** n
    out = None
    for c in components:
        up = multi_upsample(c, _log2(size // c.shape[-1]))
        out = up if out is None else out + up
    return out


def _log2(x: int) -> int:
    return int(x).bit_length() - 1


def slot_index(size: int) -> int:
    """Fine-detail slot for a map of spatial size (computations.py:444-462)."""
    idx = _log2(size)
    if 2 ** idx != size or not 0 <= idx <= 7:
        raise ValueError(f"invalid fine-detail map size {size}")
    return idx


def fine_detail_matrices(rows: Sequence[Sequence[jnp.ndarray]],
                         eps: float = 0.0) -> List[jnp.ndarray]:
    """Slot fine-detail maps by size and stack logs into matrices.

    rows: list of per-decoder component lists (each coarse->fine).
    Returns one (B, k_i, H_i*W_i) float32 log-space matrix per non-empty
    slot, ascending size (computations.py:423-484).  ``eps`` > 0 floors
    the log input (stabilization; see :func:`decompose_depth_map`).
    """
    slots: List[List[jnp.ndarray]] = [[] for _ in range(8)]
    for row in rows:
        for m in row:
            slots[slot_index(m.shape[-1])].append(m)
    mats = []
    for cand in slots:
        if not cand:
            continue
        b = cand[0].shape[0]
        mats.append(jnp.stack(
            [jnp.log(jnp.maximum(x, eps) if eps else x).reshape(b, -1)
             for x in cand], axis=1))
    return mats


def make_pred(weights: Sequence[jnp.ndarray],
              matrices: Sequence[jnp.ndarray]) -> List[jnp.ndarray]:
    """Apply fusion weights: per slot, (B,k,M)^T @ (k,1) -> (B,1,s,s).

    Replaces the per-batch Python loop of computations.py:512-528 with one
    einsum per slot (static slot count), feeding the MXU.
    """
    out = []
    for a, w in zip(matrices, weights):
        b, _, m = a.shape
        s = int(round(m ** 0.5))
        y = jnp.einsum("bkm,ko->bmo", a, w.astype(a.dtype))
        out.append(y.reshape(b, 1, s, s))
    return out


def squared_err(yhat: Sequence[jnp.ndarray],
                y: Sequence[jnp.ndarray]) -> List[jnp.ndarray]:
    """Per-slot MSE list (computations.py:530-544).

    When the prediction lacks the smallest-scale head the reference pops the
    first target (relative-only decoders); mirrored by aligning from the
    tail.
    """
    if yhat[0].shape[2] > y[0].shape[2]:
        y = y[1:]
    return [jnp.mean((a - b) ** 2) for a, b in zip(yhat, y)]


def optimize_components(yhat: Sequence[jnp.ndarray], y: Sequence[jnp.ndarray]):
    """Returns (yhat, sum of per-slot MSE) (computations.py:499-510)."""
    losses = squared_err(list(yhat), list(y))
    return list(yhat), jnp.sum(jnp.stack(losses))
