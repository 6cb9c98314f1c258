"""Pallas kernel: fused cross-scale comparison + Lloyd quantization.

The hot op of the relative decoders (BASELINE.json north star: "Lloyd
quantization against the precomputed depth_ratio tables ... fused into
Pallas kernels").  For each (batch*page) element this kernel

  1. builds the (256, 64) cross-scale ratio matrix
     sparse[p, q] = dn[p] * (mask[p,q] ? 1/dn_1[q] : 1)
     (reference RDM_Net.py:259-284, vectorized form in ops/comparison.py)
  2. quantizes it against the 40 sorted thresholds via the gather-free
     prefix-count identity out = inv0 + sum_i 1[r >= q_i] * dinv_i

in one VMEM-resident pass - the unquantized ratio matrix never touches HBM.
Thresholds arrive pre-broadcast as (40, 1) columns; the inner loop is 40
unrolled VPU compare+FMA steps.

Tile shapes: dn tile (1, 256) values, dn_1 tile (1, 64), mask (256, 64)
static, output (256, 64) - all comfortably inside the f32 (8, 128) tiling.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from md_rdm_tpu.ops.comparison import _neighborhood_mask
from md_rdm_tpu.ops.quantize import quant_tables


def _kernel(dn_ref, dn1_ref, mask_ref, out_ref, *, q, inv0, dinv):
    dn = dn_ref[0, 0, :]                     # (P,)
    inv_prev = pl.reciprocal(dn1_ref[0, 0, :], approx=False)   # (Q,)
    ratio = dn[:, None] * jnp.where(mask_ref[:, :] != 0,
                                    inv_prev[None, :], 1.0)
    acc = jnp.full(ratio.shape, inv0, jnp.float32)
    for i in range(q.shape[0]):              # 40 unrolled compare+FMA
        acc += jnp.where(ratio >= q[i], dinv[i], 0.0)
    out_ref[0, :, :] = acc


@functools.partial(jax.custom_jvp, nondiff_argnums=(2,))
def fused_comparison_quantize(dn: jnp.ndarray, dn_1: jnp.ndarray,
                              size: int) -> jnp.ndarray:
    """(B, 1, H, W) x (B, 1, H/2, W/2) -> quantized (B, HW, HW/4).

    ``size`` selects the Lloyd table (the decoder's map size; for the paged
    path pass the full map size while dn/dn_1 are 16/8 tiles).

    Gradients are explicitly zero (custom_jvp below): quantization emits
    constants in the reference (RDM_Net.py:296-310), and without the rule
    jax.grad would try to differentiate the Pallas primitive itself
    (reciprocal has no JVP) even under a downstream stop_gradient.
    """
    b, _, h, w = dn.shape
    hw, hw4 = h * w, (h // 2) * (w // 2)
    q64, inv64 = quant_tables(size)
    q = tuple(float(v) for v in q64)
    dinv = tuple(float(v) for v in np.diff(inv64))

    mask = np.asarray(_neighborhood_mask(h, w), np.int32)

    kernel = functools.partial(
        _kernel, q=np.asarray(q, np.float32), inv0=float(inv64[0]),
        dinv=np.asarray(dinv, np.float32))

    # Mosaic requires the last two block dims to be tile-divisible or span
    # the full array; per-batch rows are carried in a leading grid axis
    # with singleton middle dims spanning fully.
    out = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, 1, hw), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, hw4), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hw, hw4), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, hw, hw4), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, hw, hw4), jnp.float32),
        interpret=jax.default_backend() != "tpu",
    )(dn.reshape(b, 1, hw), dn_1.reshape(b, 1, hw4), jnp.asarray(mask))
    return out


@fused_comparison_quantize.defjvp
def _fused_comparison_quantize_jvp(size, primals, tangents):
    dn, dn_1 = primals
    out = fused_comparison_quantize(dn, dn_1, size)
    return out, jnp.zeros_like(out)
