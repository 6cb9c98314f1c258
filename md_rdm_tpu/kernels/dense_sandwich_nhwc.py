"""NHWC-native ("v2") layout of the fused dense-sandwich Pallas kernel.

The original kernel (kernels/dense_sandwich.py) runs both contractions in
transposed ``[C, pixels]`` layout, which costs two HBM round-trips per
layer outside the kernel: the input must be transposed+flattened to
``[B, C_in, ZL]`` and the output transposed back to NHWC.  In-model those
prep copies are worse than in the isolated microbench - the layer input
is a DenseBlock concat that XLA would otherwise fuse straight into the
consumer conv (PERF.md round 3 "open gap").

This variant keeps the model's native NHWC layout end to end by putting
the flattened spatial frame on the MXU *sublane* axis and channels on the
lane axis:

* input prep is ``pad(spatial) + reshape`` - layout-preserving, no
  transpose; the output needs no transpose-back either;
* weights load in their natural ``[C_in, C_mid]`` / ``[C_mid, 9G]``
  shapes (w2 regrouped once per step, a ~2 MB reshuffle);
* the flattened-frame trick (see dense_sandwich.py module docstring)
  turns the nine 3x3-conv taps into nine static *sublane-offset* windows
  of the shared ``[ZS, 9G]`` tap product.

Per-chunk MXU passes (chunk = ``kc`` columns of the expansion axis):

    z     [ZS, kc]  = xs [ZS, C_in] @ w1 [C_in, kc]      (1x1 expand)
    t_all [ZS, 9G]  = relu(affine(z)) @ w2r [kc, 9G]     (all nine taps)
    acc  += t_all[off_j : off_j + LP, jG:(j+1)G]          (VPU shifts)

The backward program mirrors kernels/dense_sandwich.py::_bwd_kernel with
the two matmul operands' roles transposed; weight gradients accumulate
across the sequential batch grid.

Reference semantics covered: torchvision _DenseLayer conv1 -> BN -> relu
-> conv2 with the reference's bn_size=spatial quirk (RDM_Net.py:515-534).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from md_rdm_tpu.kernels.dense_sandwich import _pick_kc


def _pad16(n: int) -> int:
    # 16 sublanes covers both f32 (8) and bf16 (16) tile granularity
    return -(-n // 16) * 16


def _geometry(s: int) -> Tuple[int, int, int]:
    """(F, LP, ZS) for spatial size S: padded-frame width, padded output
    sublane count, z sublane count (large enough that the last tap's
    window ``[2F+2, 2F+2+LP)`` stays in bounds)."""
    f = s + 2
    lp = _pad16(s * f)
    zs = _pad16(max(f * f, 2 * f + 2 + lp))
    return f, lp, zs


def _kernel(xs_ref, w1n_ref, w2r_ref, scale_ref, shift_ref, out_ref,
            *, s, c_mid_p, growth, kc):
    """One per-batch-element full-frame forward program (NHWC layout)."""
    f, lp, zs = _geometry(s)

    # zero mask for the padded frame border, now on the sublane axis
    fp = lax.broadcasted_iota(jnp.int32, (zs, 1), 0)
    col = fp % f
    row = fp // f
    valid = ((col > 0) & (col < f - 1) & (row > 0) & (row < s + 1)
             & (fp < f * f))

    def chunk(i, acc):
        k0 = i * kc
        z = lax.dot_general(
            xs_ref[0], w1n_ref[:, pl.ds(k0, kc)],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        z = (z * scale_ref[:, pl.ds(k0, kc)]
             + shift_ref[:, pl.ds(k0, kc)])
        z = jnp.where(valid, jnp.maximum(z, 0.0), 0.0).astype(xs_ref.dtype)
        t_all = lax.dot_general(
            z, w2r_ref[pl.ds(k0, kc), :],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        for dy in range(3):
            for dx in range(3):
                j = 3 * dy + dx
                t = dy * f + dx
                acc = acc + t_all[t:t + lp, j * growth:(j + 1) * growth]
        return acc

    acc = lax.fori_loop(0, c_mid_p // kc, chunk,
                        jnp.zeros((lp, growth), jnp.float32))
    out_ref[0, :, :] = acc.astype(out_ref.dtype)


def _prep(xr, w1, scale, shift, w2):
    """Shared fwd/bwd operand prep.  All reshapes are layout-preserving."""
    b, s, _, c_in = xr.shape
    c_mid = w1.shape[-1]
    growth = w2.shape[-1]
    dt = xr.dtype
    f, lp, zs = _geometry(s)

    xp = jnp.pad(xr, ((0, 0), (1, 1), (1, 1), (0, 0)))
    xs = jnp.pad(xp.reshape(b, f * f, c_in),
                 ((0, 0), (0, zs - f * f), (0, 0)))        # [B, ZS, C_in]

    kc = _pick_kc(c_mid, zs, jnp.dtype(dt).itemsize)
    cmp_ = -(-c_mid // kc) * kc

    w1n = jnp.pad(w1.reshape(c_in, c_mid).astype(dt),
                  ((0, 0), (0, cmp_ - c_mid)))             # [C_in, C_mid_p]
    # [ky,kx,C_mid,G] -> [C_mid, 9G] with column block j = 3*ky+kx
    w2r = jnp.pad(w2.transpose(2, 0, 1, 3).reshape(c_mid,
                                                  9 * growth).astype(dt),
                  ((0, cmp_ - c_mid), (0, 0)))             # [C_mid_p, 9G]
    scale2 = jnp.pad(scale.astype(jnp.float32),
                     (0, cmp_ - c_mid)).reshape(1, cmp_)
    shift2 = jnp.pad(shift.astype(jnp.float32),
                     (0, cmp_ - c_mid)).reshape(1, cmp_)
    return xs, w1n, w2r, scale2, shift2, kc, cmp_


def sandwich_nhwc(xr, w1, scale, shift, w2, *, interpret=False):
    """Fused forward, NHWC-native layout.  Same contract as
    dense_sandwich._pallas_sandwich: xr [B,S,S,C_in] (already norm1+relu,
    compute dtype), w1 [1,1,C_in,C_mid], w2 [3,3,C_mid,G], scale/shift
    [C_mid] f32 folded-BN affine.  Returns [B,S,S,G] in xr.dtype."""
    b, s, _, c_in = xr.shape
    growth = w2.shape[-1]
    dt = xr.dtype
    f, lp, zs = _geometry(s)
    xs, w1n, w2r, scale2, shift2, kc, cmp_ = _prep(xr, w1, scale, shift, w2)

    out = pl.pallas_call(
        functools.partial(_kernel, s=s, c_mid_p=cmp_, growth=growth,
                          kc=kc),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, zs, c_in), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c_in, cmp_), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cmp_, 9 * growth), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cmp_), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cmp_), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, lp, growth), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, lp, growth), dt),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 2**20),
        interpret=interpret,
    )(xs, w1n, w2r, scale2, shift2)

    # rows are flat positions q = o*F + w; keep w < S
    return out[:, :s * f, :].reshape(b, s, f, growth)[:, :, :s, :]


def _bwd_kernel(xs_ref, ge_ref, w1n_ref, w2r_ref, scale_ref, shift_ref,
                dx_ref, dw1_ref, dw2r_ref, dscale_ref, dshift_ref,
                *, s, c_mid_p, growth, kc):
    """Per-batch-element backward program (NHWC layout).

    Same five-MXU-pass recompute strategy as dense_sandwich._bwd_kernel,
    with pixels on sublanes; weight grads accumulate across the
    sequential batch grid into constant-index output blocks."""
    f, lp, zs = _geometry(s)
    first = pl.program_id(0) == 0

    @pl.when(first)
    def _init():
        dw1_ref[...] = jnp.zeros_like(dw1_ref)
        dw2r_ref[...] = jnp.zeros_like(dw2r_ref)
        dscale_ref[...] = jnp.zeros_like(dscale_ref)
        dshift_ref[...] = jnp.zeros_like(dshift_ref)

    fp = lax.broadcasted_iota(jnp.int32, (zs, 1), 0)
    col = fp % f
    row = fp // f
    valid = ((col > 0) & (col < f - 1) & (row > 0) & (row < s + 1)
             & (fp < f * f))

    # g_taps[p, j*G:(j+1)*G] = ge[p - off_j]   (zeros shifted in)
    ge = ge_ref[0]
    zero = jnp.zeros_like(ge)
    taps = []
    for dy in range(3):
        for dx_ in range(3):
            off = dy * f + dx_
            if off == 0:
                taps.append(ge)
            else:
                taps.append(jnp.concatenate(
                    [zero[:off, :], ge[:zs - off, :]], axis=0))
    g_taps = jnp.concatenate(taps, axis=1)              # [ZS, 9G], dt

    def chunk(i, dx_acc):
        k0 = i * kc
        z = lax.dot_general(
            xs_ref[0], w1n_ref[:, pl.ds(k0, kc)],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        sc = scale_ref[:, pl.ds(k0, kc)]
        a = z * sc + shift_ref[:, pl.ds(k0, kc)]
        mask = (a > 0.0) & valid
        r = jnp.where(mask, a, 0.0).astype(ge.dtype)
        dr = lax.dot_general(
            g_taps, w2r_ref[pl.ds(k0, kc), :],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        da = jnp.where(mask, dr, 0.0)
        dscale_ref[:, pl.ds(k0, kc)] += jnp.sum(da * z, axis=0,
                                                keepdims=True)
        dshift_ref[:, pl.ds(k0, kc)] += jnp.sum(da, axis=0, keepdims=True)
        dz = (da * sc).astype(ge.dtype)
        dx_acc = dx_acc + lax.dot_general(
            dz, w1n_ref[:, pl.ds(k0, kc)],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        dw1_ref[:, pl.ds(k0, kc)] += lax.dot_general(
            xs_ref[0], dz,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dw2r_ref[pl.ds(k0, kc), :] += lax.dot_general(
            r, g_taps,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return dx_acc

    c_in = xs_ref.shape[2]
    dx = lax.fori_loop(0, c_mid_p // kc, chunk,
                       jnp.zeros((zs, c_in), jnp.float32))
    dx_ref[0, :, :] = dx.astype(dx_ref.dtype)


def sandwich_nhwc_bwd(xr, w1, scale, shift, w2, g, *, interpret=False):
    """Fused backward, NHWC-native layout.  Returns (dxr, dw1, dscale,
    dshift, dw2) matching the primal dtypes (xr: compute dtype;
    weights/affine grads: float32)."""
    b, s, _, c_in = xr.shape
    c_mid = w1.shape[-1]
    growth = w2.shape[-1]
    dt = xr.dtype
    f, lp, zs = _geometry(s)
    xs, w1n, w2r, scale2, shift2, kc, cmp_ = _prep(xr, w1, scale, shift, w2)

    # embed the cotangent into flat-frame coords: q = o*F + w, w < S
    gp = jnp.pad(g.astype(dt), ((0, 0), (0, 0), (0, f - s), (0, 0)))
    ge = jnp.pad(gp.reshape(b, s * f, growth),
                 ((0, 0), (0, zs - s * f), (0, 0)))        # [B, ZS, G]

    dx, dw1n, dw2r, dscale, dshift = pl.pallas_call(
        functools.partial(_bwd_kernel, s=s, c_mid_p=cmp_, growth=growth,
                          kc=kc),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, zs, c_in), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, zs, growth), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c_in, cmp_), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cmp_, 9 * growth), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cmp_), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cmp_), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, zs, c_in), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c_in, cmp_), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cmp_, 9 * growth), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cmp_), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cmp_), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, zs, c_in), dt),
            jax.ShapeDtypeStruct((c_in, cmp_), jnp.float32),
            jax.ShapeDtypeStruct((cmp_, 9 * growth), jnp.float32),
            jax.ShapeDtypeStruct((1, cmp_), jnp.float32),
            jax.ShapeDtypeStruct((1, cmp_), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=96 * 2**20),
        interpret=interpret,
    )(xs, ge, w1n, w2r, scale2, shift2)

    dxr = dx[:, :f * f, :].reshape(b, f, f, c_in)[:, 1:s + 1, 1:s + 1, :]
    dw1 = dw1n[:, :c_mid].reshape(1, 1, c_in, c_mid).astype(jnp.float32)
    dw2 = (dw2r[:c_mid].reshape(c_mid, 3, 3, growth)
           .transpose(1, 2, 0, 3).astype(jnp.float32))
    return (dxr, dw1, dscale[0, :c_mid], dshift[0, :c_mid], dw2)
