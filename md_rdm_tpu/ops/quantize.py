"""Lloyd-Max quantization of depth-ratio matrices.

Reference: RDM_Net.py:286-311 (``LloydQuantization``) + the ``Quantization``
table loader (RDM_Net.py:397-442).  The reference builds a (B,N,M,40) label
tensor with 40 threshold comparisons, sums it into an index, then maps each
element to a reconstruction level with a *per-element Python loop* - the
hottest loop in the repo.  Here it is a closed-form vectorized op:

    index = sum_i [ratio >= q_i]     (40 sorted thresholds)
    out   = inv[index]               (41 reconstruction levels)

``index`` equals ``searchsorted(q, ratio, side='right')`` for the sorted
tables; the gather of 41 levels is a tiny one-hot contraction that XLA fuses
onto the VPU.  A fused Pallas variant lives in kernels/lloyd.py.

Gradient note: the reference's in-place integer mapping produces constants,
so no gradient flows through quantization to the decoder convs; we make
that explicit with ``stop_gradient`` (documented parity decision).
"""
from __future__ import annotations

import functools
from pathlib import Path
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

_ASSET = Path(__file__).resolve().parent.parent / "assets" / "depth_ratio_quant.npz"

# map size -> quantizer id used by the reference (RDM_Net.py:432-442)
SIZE_TO_ID = {8: 3, 16: 4, 32: 5, 64: 6, 128: 7}
ID_TO_SIZE = {v: k for k, v in SIZE_TO_ID.items()}


@functools.lru_cache(maxsize=None)
def _tables() -> dict:
    with np.load(_ASSET) as z:
        return {k: z[k].astype(np.float64) for k in z.files}


def quant_tables(size: int) -> Tuple[np.ndarray, np.ndarray]:
    """(thresholds (40,), levels (41,)) for a map size in {8,...,128}.

    The 8x8 table is regenerated from the exact sqrt law between adjacent
    tables (see tools/convert_quant_tables.py); the original file is absent
    from the reference mount (.MISSING_LARGE_BLOBS).
    """
    t = _tables()
    return t[f"q{size}"], t[f"inv{size}"]


def lloyd_quantize(ratios: jnp.ndarray, size: int) -> jnp.ndarray:
    """Quantize ratio tensor elements to the nearest Lloyd-Max level.

    ratios: any shape; ``size`` selects the per-resolution table.
    Returns same-shape float32 tensor of reconstruction levels,
    with gradients stopped (see module docstring).

    Gather-free closed form: because the thresholds are sorted, the index
    is a prefix count and

        inv[count(r >= q_i)] = inv[0] + sum_i 1[r >= q_i] * (inv[i+1]-inv[i])

    expressed as 40 unrolled compare+select accumulations - a single fused
    VPU pass over the data with no (N, 40) indicator tensor and no gather
    (the paged d9 path quantizes 4M elements; materializing indicators
    would cost ~700 MB of HBM traffic).
    """
    q, inv = quant_tables(size)
    r = ratios.astype(jnp.float32)
    out = jnp.full_like(r, jnp.float32(inv[0]))
    for qi, di in zip(q, np.diff(inv)):
        out = out + jnp.where(r >= jnp.float32(qi), jnp.float32(di), 0.0)
    return jax.lax.stop_gradient(out)
