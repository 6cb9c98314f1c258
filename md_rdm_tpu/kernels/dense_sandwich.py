"""Fused Pallas kernel for the encoder dense-layer "expand sandwich".

The reference encoder passes ``bn_size`` = 57/29/15 to torchvision's
``_DenseBlock`` (RDM_Net.py:526-531), so each dense layer's 1x1
"bottleneck" is really a giant *expansion*: at 57x57 the layer computes

    x[B,57,57,C_in] -> 1x1 conv -> z[B,57,57,2736] -> BN -> ReLU
                    -> 3x3 conv -> y[B,57,57,48]

The xplane trace of the bf16 train step (PERF.md round 3) shows this
sandwich dominating the step: the 284 MB z tensor round-trips HBM, the
BN reduces over 2736 channels at full spatial, and the 3x3 conv writes
48 of 128 MXU lanes (~37% lane fill, 1.76 ms vs the 0.62 ms full-lane
ideal per layer).

This kernel fuses conv1x1 -> folded-BN affine -> ReLU -> conv3x3 into a
single Pallas program per batch element (full frame - a row-strip
variant measured slower: the strip stack materialized an extra
transposed+haloed input copy, ~41 MB at the widest S=57 layer):

* both contractions run in **transposed layout** ``[C, pixels]`` so the
  pixel axis (= thousands) fills the MXU lanes instead of the 48 output
  channels;
* z lives only in VMEM (a ``[kc, F*F]`` chunk slab) - the HBM round
  trip disappears;
* the 3x3 conv uses the *flattened-frame trick*: with the spatial frame
  zero-padded to width F = S+2 and flattened row-major, the (dy, dx)
  conv tap is the contiguous flat slice ``z_flat[dy*F+dx : dy*F+dx+L]``
  (row-wrap contamination lands exactly on the zeroed border columns),
  so the nine taps are nine static slices of the in-VMEM z buffer.

BN folding: the affine ``scale = gamma/sqrt(var+eps)``, ``shift = beta -
mean*scale`` is computed by the caller (from running stats in eval; from
batch statistics via :func:`conv_bn_stats` in train - the 1x1 conv is
linear, so batch mean/var of z follow from the much smaller input
covariance without materializing z).

Gradients: :func:`dense_sandwich` is a ``jax.custom_vjp`` whose backward
recomputes the plain XLA formulation (:func:`reference_sandwich`) and
differentiates it - mathematically identical to the unfused layer's
gradient (the forward rematerializes under ``nn.remat`` anyway).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_SUPPORTED = frozenset({57, 29, 15})


def _pad128(n: int) -> int:
    return -(-n // 128) * 128


def _geometry(s: int) -> Tuple[int, int, int]:
    """(F, Lp, ZL) for spatial size S: padded-frame width, padded output
    flat length, padded z-frame lane width (large enough that the last
    tap's window ``[2F+2, 2F+2+Lp)`` stays in bounds)."""
    f = s + 2
    lp = _pad128(s * f)
    zl = _pad128(max(f * f, 2 * f + 2 + lp))
    return f, lp, zl


def supported_spatial(s: int) -> bool:
    return s in _SUPPORTED


# Sizes where the fused kernel beats XLA's formulation on real v5e
# (tools/bench_sandwich.py, PERF.md round 3, full-frame kernel): 57 wins
# decisively in both dtypes; 29/15 lose (too little work per program to
# amortize the transposed-layout prep).  Train-mode measured separately
# (--grad): at S=57 the fully-fused value+grad runs 3.51/5.57 ms vs XLA's
# 6.33/6.90 ms (narrow/wide, bf16 b16); S=29/15 route XLA.
_PROFITABLE_EVAL = frozenset({57})
_PROFITABLE_TRAIN = frozenset({57})


def profitable_spatial(s: int, train: bool = False) -> bool:
    return s in (_PROFITABLE_TRAIN if train else _PROFITABLE_EVAL)


# Sizes where the Pallas backward (not just the forward) wins in the
# train step: S=57 measured 1.8x over the XLA-differentiated backward
# (pallas_fbwd 3.505 ms vs pallas_xbwd 5.490 ms vs xla 6.330 ms at
# C_in=96, bf16 b16; tools/bench_sandwich.py --grad).
_BWD_PROFITABLE = frozenset({57})


def routes(s: int, train: bool, mode: str) -> bool:
    """Whether DenseLayer routes this (spatial, mode) through the kernel.
    ``on`` follows the measured-profitable tables; ``on_all`` /
    ``on_all_bwd`` force every supported size in both modes
    (benchmarking); ``interpret`` likewise (tests, interpreted)."""
    if mode in ("interpret", "on_all", "on_all_bwd"):
        return supported_spatial(s)
    return mode == "on" and profitable_spatial(s, train)


def bwd_routes(s: int, mode: str) -> bool:
    """Whether the custom_vjp backward uses the Pallas kernel too
    ("interpret" exercises it so tests cover the fully-fused path)."""
    if mode in ("on_all_bwd", "interpret"):
        return supported_spatial(s)
    return mode == "on" and s in _BWD_PROFITABLE


def _pick_kc(c_mid: int, zl: int, itemsize: int) -> int:
    """Contraction-chunk size, always a multiple of 128 so every chunk's
    K dimension is full MXU tiles (C_mid is padded up to a kc multiple;
    the pad rows cost compute but the full tiles more than pay for it -
    measured vs divisor-of-C_mid chunking).  Among sizes whose z slab
    (f32 transient + cast copy) fits the VMEM budget, minimize pad waste,
    then prefer the largest (fewer chunk-loop iterations)."""
    best = None
    for kc in (512, 384, 256, 128):
        if kc * zl * (4 + itemsize) > 12_000_000:
            continue
        waste = -(-c_mid // kc) * kc - c_mid
        if best is None or (waste, -kc) < best[0]:
            best = ((waste, -kc), kc)
    return best[1]


def _kernel(xs_ref, w1t_ref, w2s_ref, scale_ref, shift_ref, out_ref,
            *, s, c_mid_p, growth, kc):
    """One per-batch-element full-frame program.  See module docstring.

    The expansion axis (padded to ``c_mid_p``, a kc multiple) is processed
    in chunks of ``kc``: each chunk computes its z slab (1x1 dot ->
    folded-BN affine -> relu -> border mask) and immediately contracts it
    through the conv taps, so z never exists at full width anywhere.  The
    chunk loop is a ``fori_loop`` (not Python-unrolled) so only ONE
    chunk's slabs are live in scoped VMEM - the unrolled form OOMed the
    16 MB scoped-vmem stack at S=57 f32 (21.5 MB, 11 chunks partially
    overlapped by the scheduler).

    All nine taps run as ONE ``[9*growth, kc] @ [kc, zl]`` MXU pass
    (growth=48 alone would fill 48/128 of the streamed dimension; 9*48
    fills 432) followed by nine shifted VPU adds that pick each tap's
    flat window out of the shared product.
    """
    f, lp, zl = _geometry(s)

    # zero mask for the padded frame border (the conv's zero padding):
    # column 0 / F-1 of every frame row, frame rows 0 / S+1, lane tail.
    fp = lax.broadcasted_iota(jnp.int32, (1, zl), 1)
    col = fp % f
    row = fp // f
    valid = ((col > 0) & (col < f - 1) & (row > 0) & (row < s + 1)
             & (fp < f * f))

    def chunk(i, acc):
        k0 = i * kc
        z = lax.dot_general(
            w1t_ref[pl.ds(k0, kc), :], xs_ref[0],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        z = (z * scale_ref[pl.ds(k0, kc), :]
             + shift_ref[pl.ds(k0, kc), :])
        z = jnp.where(valid, jnp.maximum(z, 0.0), 0.0).astype(xs_ref.dtype)
        t_all = lax.dot_general(
            w2s_ref[:, pl.ds(k0, kc)], z,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        for dy in range(3):
            for dx in range(3):
                j = 3 * dy + dx
                t = dy * f + dx
                acc = acc + t_all[j * growth:(j + 1) * growth, t:t + lp]
        return acc

    acc = lax.fori_loop(0, c_mid_p // kc, chunk,
                        jnp.zeros((growth, lp), jnp.float32))
    out_ref[0, :, :] = acc.astype(out_ref.dtype)


def _pallas_sandwich(xr, w1, scale, shift, w2, *, interpret=False):
    """Fused forward.  xr: [B,S,S,C_in] (already norm1+relu'd, compute
    dtype); w1: [1,1,C_in,C_mid]; w2: [3,3,C_mid,G]; scale/shift:
    [C_mid] float32 folded-BN affine.  Returns [B,S,S,G] in xr.dtype."""
    b, s, _, c_in = xr.shape
    c_mid = w1.shape[-1]
    growth = w2.shape[-1]
    dt = xr.dtype
    f, lp, zl = _geometry(s)

    # prep: zero-pad frame, channels-first, flatten row-major, pad lanes
    xp = jnp.pad(xr, ((0, 0), (1, 1), (1, 1), (0, 0)))
    xs = jnp.pad(xp.transpose(0, 3, 1, 2).reshape(b, c_in, f * f),
                 ((0, 0), (0, 0), (0, zl - f * f)))    # [B, C_in, ZL]

    kc = _pick_kc(c_mid, zl, jnp.dtype(dt).itemsize)
    cmp_ = -(-c_mid // kc) * kc             # C_mid padded to a kc multiple

    # pad rows/cols beyond C_mid are zero everywhere (w1t rows, w2s cols,
    # affine), so padded z rows are relu(0*x + 0) = 0 and contribute 0.
    w1t = jnp.pad(w1.reshape(c_in, c_mid).T.astype(dt),
                  ((0, cmp_ - c_mid), (0, 0)))           # [C_mid_p, C_in]
    w2s = jnp.pad(w2.transpose(0, 1, 3, 2).reshape(9 * growth,
                                                  c_mid).astype(dt),
                  ((0, 0), (0, cmp_ - c_mid)))           # [9G, C_mid_p]
    scale2 = jnp.pad(scale.astype(jnp.float32),
                     (0, cmp_ - c_mid)).reshape(cmp_, 1)
    shift2 = jnp.pad(shift.astype(jnp.float32),
                     (0, cmp_ - c_mid)).reshape(cmp_, 1)

    out = pl.pallas_call(
        functools.partial(_kernel, s=s, c_mid_p=cmp_, growth=growth,
                          kc=kc),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, c_in, zl), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cmp_, c_in), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9 * growth, cmp_), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cmp_, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cmp_, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, growth, lp), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, growth, lp), dt),
        # full-frame slabs at S=57 f32 peak ~30 MB of scoped VMEM (w2s
        # 4.9 MB + w1t 3.8 MB resident + z/t_all at 3584 lanes); the
        # 16 MB default cap is arbitrary on a 128 MB-VMEM chip.
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 2**20),
        interpret=interpret,
    )(xs, w1t, w2s, scale2, shift2)

    # [B,G,S*F(pad)] -> [B,S,S,G]; flat position q = o*F + w, w<S
    y = out[..., :s * f].reshape(b, growth, s, f)[..., :s]
    return y.transpose(0, 2, 3, 1)


def _bwd_kernel(xs_ref, ge_ref, w1t_ref, w2s_ref, scale_ref, shift_ref,
                dx_ref, dw1_ref, dw2s_ref, dscale_ref, dshift_ref,
                *, s, c_mid_p, growth, kc):
    """Per-batch-element backward program.

    Recomputes each z chunk (cheaper than stashing the 284 MB tensor),
    forms the nine tap-shifted cotangent copies ``g_taps`` once in VMEM,
    then runs five MXU passes per chunk:

        z      = w1t_c @ x                       (recompute)
        dr_c   = w2s_cT @ g_taps                 (conv2 transpose)
        dx    += w1t_cT @ dz                     (conv1 transpose)
        dw1_c  = dz @ xT
        dw2s_c = g_taps @ rT

    with da = dr * [a > 0] * border, dz = da * scale, plus the rowsum
    reductions dscale_c = sum(da * z), dshift_c = sum(da).  Weight grads
    accumulate across the sequential batch grid into constant-index
    output blocks (zeroed at program 0).
    """
    f, lp, zl = _geometry(s)
    first = pl.program_id(0) == 0

    @pl.when(first)
    def _init():
        dw1_ref[...] = jnp.zeros_like(dw1_ref)
        dw2s_ref[...] = jnp.zeros_like(dw2s_ref)
        dscale_ref[...] = jnp.zeros_like(dscale_ref)
        dshift_ref[...] = jnp.zeros_like(dshift_ref)

    fp = lax.broadcasted_iota(jnp.int32, (1, zl), 1)
    col = fp % f
    row = fp // f
    valid = ((col > 0) & (col < f - 1) & (row > 0) & (row < s + 1)
             & (fp < f * f))

    # g_taps[t*G:(t+1)*G, p] = ge[p - off_t]   (zeros shifted in)
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
                    [zero[:, :off], ge[:, :zl - off]], axis=1))
    g_taps = jnp.concatenate(taps, axis=0)          # [9G, ZL], dt

    def chunk(i, dx_acc):
        k0 = i * kc
        z = lax.dot_general(
            w1t_ref[pl.ds(k0, kc), :], xs_ref[0],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        sc = scale_ref[pl.ds(k0, kc), :]
        a = z * sc + shift_ref[pl.ds(k0, kc), :]
        mask = (a > 0.0) & valid
        r = jnp.where(mask, a, 0.0).astype(ge.dtype)
        dr = lax.dot_general(
            w2s_ref[:, pl.ds(k0, kc)], g_taps,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        da = jnp.where(mask, dr, 0.0)
        dscale_ref[pl.ds(k0, kc), :] += jnp.sum(da * z, axis=1,
                                                keepdims=True)
        dshift_ref[pl.ds(k0, kc), :] += jnp.sum(da, axis=1, keepdims=True)
        dz = (da * sc).astype(ge.dtype)
        dx_acc = dx_acc + lax.dot_general(
            w1t_ref[pl.ds(k0, kc), :], dz,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dw1_ref[pl.ds(k0, kc), :] += lax.dot_general(
            dz, xs_ref[0],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        dw2s_ref[:, pl.ds(k0, kc)] += lax.dot_general(
            g_taps, r,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        return dx_acc

    c_in = xs_ref.shape[1]
    dx = lax.fori_loop(0, c_mid_p // kc, chunk,
                       jnp.zeros((c_in, zl), jnp.float32))
    dx_ref[0, :, :] = dx.astype(dx_ref.dtype)


def _pallas_sandwich_bwd(xr, w1, scale, shift, w2, g, *, interpret=False):
    """Fused backward.  Returns (dxr, dw1, dscale, dshift, dw2) matching
    the primal dtypes (xr: compute dtype; weights/affine: float32)."""
    b, s, _, c_in = xr.shape
    c_mid = w1.shape[-1]
    growth = w2.shape[-1]
    dt = xr.dtype
    f, lp, zl = _geometry(s)

    xp = jnp.pad(xr, ((0, 0), (1, 1), (1, 1), (0, 0)))
    xs = jnp.pad(xp.transpose(0, 3, 1, 2).reshape(b, c_in, f * f),
                 ((0, 0), (0, 0), (0, zl - f * f)))

    # embed the cotangent into flat-frame coords: q = o*F + w, w < S
    ge = jnp.pad(g.astype(dt), ((0, 0), (0, 0), (0, f - s), (0, 0)))
    ge = ge.transpose(0, 3, 1, 2).reshape(b, growth, s * f)
    ge = jnp.pad(ge, ((0, 0), (0, 0), (0, zl - s * f)))

    kc = _pick_kc(c_mid, zl, jnp.dtype(dt).itemsize)
    cmp_ = -(-c_mid // kc) * kc
    w1t = jnp.pad(w1.reshape(c_in, c_mid).T.astype(dt),
                  ((0, cmp_ - c_mid), (0, 0)))
    w2s = jnp.pad(w2.transpose(0, 1, 3, 2).reshape(9 * growth,
                                                  c_mid).astype(dt),
                  ((0, 0), (0, cmp_ - c_mid)))
    scale2 = jnp.pad(scale.astype(jnp.float32),
                     (0, cmp_ - c_mid)).reshape(cmp_, 1)
    shift2 = jnp.pad(shift.astype(jnp.float32),
                     (0, cmp_ - c_mid)).reshape(cmp_, 1)

    dx, dw1, dw2s, dscale, dshift = pl.pallas_call(
        functools.partial(_bwd_kernel, s=s, c_mid_p=cmp_, growth=growth,
                          kc=kc),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, c_in, zl), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, growth, zl), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cmp_, c_in), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9 * growth, cmp_), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cmp_, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cmp_, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, c_in, zl), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cmp_, c_in), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9 * growth, cmp_), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cmp_, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cmp_, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, c_in, zl), dt),
            jax.ShapeDtypeStruct((cmp_, c_in), jnp.float32),
            jax.ShapeDtypeStruct((9 * growth, cmp_), jnp.float32),
            jax.ShapeDtypeStruct((cmp_, 1), jnp.float32),
            jax.ShapeDtypeStruct((cmp_, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=96 * 2**20),
        interpret=interpret,
    )(xs, ge, w1t, w2s, scale2, shift2)

    dxr = dx[:, :, :f * f].reshape(b, c_in, f, f)[:, :, 1:s + 1, 1:s + 1]
    dxr = dxr.transpose(0, 2, 3, 1)
    dw1 = dw1[:c_mid].T.reshape(1, 1, c_in, c_mid).astype(jnp.float32)
    dw2 = (dw2s[:, :c_mid].reshape(3, 3, growth, c_mid)
           .transpose(0, 1, 3, 2).astype(jnp.float32))
    return (dxr, dw1, dscale[:c_mid, 0], dshift[:c_mid, 0], dw2)


# ---------------------------------------------------------------------------
# Flat-frame variants: kernel I/O in the block's own layout.
#
# The round-4 trace analysis (PERF.md) showed 6.3 ms/step of the fused
# path's win paid back in GLUE: per layer, a layout copy + lane-pad of
# the NHWC input into the kernel's [C, pixels] shape, and a reshape+copy
# of the flat output back to NHWC for the block concat.  The flat
# variants remove both: the WHOLE dense block keeps its concat stack in
# "lead-frame flat" layout [B, C, ZT] - padded-frame positions (r, c)
# at lane LEAD + r*F + c, LEAD = 128 zeros so every tap slice offset is
# nonnegative and the output write is lane-aligned - and the kernel
# reads/writes that layout directly (models/densenet.py DenseBlockFlat).
# ---------------------------------------------------------------------------

LEAD = 128


def _geometry_flat(s: int) -> Tuple[int, int, int]:
    """(F, W, ZT) for spatial size S in lead-frame layout: padded-frame
    width, accumulation-window width (covers all F*F frame positions),
    and total lane width (large enough that the last tap's read window
    ``[LEAD+F+1, LEAD+F+1+W)`` stays in bounds)."""
    f = s + 2
    w = _pad128(f * f)
    zt = _pad128(LEAD + f + 1 + w)
    return f, w, zt


def _interior_mask(s: int, width: int, offset: int = LEAD):
    """[1, width] bool: lanes holding interior frame positions (row/col
    in [1, S+1)) of a frame whose position 0 sits at lane ``offset``."""
    f = s + 2
    l = lax.broadcasted_iota(jnp.int32, (1, width), 1) - offset
    col = l % f
    row = l // f
    return ((l >= 0) & (l < f * f) & (col >= 1) & (col <= s)
            & (row >= 1) & (row <= s))


def _kernel_flat(xs_ref, w1t_ref, w2s_ref, scale_ref, shift_ref, out_ref,
                 *, s, c_mid_p, growth, kc):
    """Per-batch-element forward, lead-frame flat I/O (see block comment).

    Identical math to :func:`_kernel`; differences are pure layout:
    * input lanes already carry the padded frame at offset LEAD (no
      prep transposes in the caller);
    * tap j reads ``t_all[LEAD - F - 1 + dy*F + dx + k]`` for window
      position k (all offsets >= LEAD - F - 1 > 0);
    * the output is the full [G, ZT] lane row with the interior mask
      applied - the next layer consumes it directly, no reshape back.
    """
    f, w, zt = _geometry_flat(s)
    valid_z = _interior_mask(s, zt)

    def chunk(i, acc):
        k0 = i * kc
        z = lax.dot_general(
            w1t_ref[pl.ds(k0, kc), :], xs_ref[0],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        z = (z * scale_ref[pl.ds(k0, kc), :]
             + shift_ref[pl.ds(k0, kc), :])
        z = jnp.where(valid_z, jnp.maximum(z, 0.0), 0.0).astype(xs_ref.dtype)
        t_all = lax.dot_general(
            w2s_ref[:, pl.ds(k0, kc)], z,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        for dy in range(3):
            for dx in range(3):
                j = 3 * dy + dx
                t = LEAD - f - 1 + dy * f + dx
                acc = acc + t_all[j * growth:(j + 1) * growth, t:t + w]
        return acc

    acc = lax.fori_loop(0, c_mid_p // kc, chunk,
                        jnp.zeros((growth, w), jnp.float32))
    out = jnp.pad(
        jnp.where(_interior_mask(s, w, offset=0), acc, 0.0),
        ((0, 0), (LEAD, zt - LEAD - w)))
    out_ref[0, :, :] = out.astype(out_ref.dtype)


def _pallas_sandwich_flat(xs, w1, scale, shift, w2, *, s, interpret=False):
    """Fused forward, flat I/O.  xs: [B, C_in, ZT] lead-frame stack
    (already norm1+relu'd+masked, compute dtype, zero borders); returns
    [B, G, ZT] in the same layout with zero borders."""
    b, c_in, zt_in = xs.shape
    c_mid = w1.shape[-1]
    growth = w2.shape[-1]
    dt = xs.dtype
    f, w, zt = _geometry_flat(s)
    assert zt_in == zt, (zt_in, zt)

    kc = _pick_kc(c_mid, zt, jnp.dtype(dt).itemsize)
    cmp_ = -(-c_mid // kc) * kc
    w1t = jnp.pad(w1.reshape(c_in, c_mid).T.astype(dt),
                  ((0, cmp_ - c_mid), (0, 0)))
    w2s = jnp.pad(w2.transpose(0, 1, 3, 2).reshape(9 * growth,
                                                  c_mid).astype(dt),
                  ((0, 0), (0, cmp_ - c_mid)))
    scale2 = jnp.pad(scale.astype(jnp.float32),
                     (0, cmp_ - c_mid)).reshape(cmp_, 1)
    shift2 = jnp.pad(shift.astype(jnp.float32),
                     (0, cmp_ - c_mid)).reshape(cmp_, 1)

    return pl.pallas_call(
        functools.partial(_kernel_flat, s=s, c_mid_p=cmp_, growth=growth,
                          kc=kc),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, c_in, zt), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cmp_, c_in), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9 * growth, cmp_), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cmp_, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cmp_, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, growth, zt), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, growth, zt), dt),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 2**20),
        interpret=interpret,
    )(xs, w1t, w2s, scale2, shift2)


def _bwd_kernel_flat(xs_ref, ge_ref, w1t_ref, w2s_ref, scale_ref,
                     shift_ref, dx_ref, dw1_ref, dw2s_ref, dscale_ref,
                     dshift_ref, *, s, c_mid_p, growth, kc):
    """Per-batch-element backward, flat I/O.

    Mirrors :func:`_bwd_kernel` with lead-frame coordinates.  The
    incoming cotangent is interior-masked FIRST: the forward's output
    mask makes border positions constants, so border cotangents (which
    upstream flat-BN sums legitimately produce) must not contaminate
    the weight gradients.  dx comes out interior-only (dz is masked and
    the 1x1 conv is positionwise), which is exactly the stack cotangent
    the flat block needs.
    """
    f, w, zt = _geometry_flat(s)
    first = pl.program_id(0) == 0

    @pl.when(first)
    def _init():
        dw1_ref[...] = jnp.zeros_like(dw1_ref)
        dw2s_ref[...] = jnp.zeros_like(dw2s_ref)
        dscale_ref[...] = jnp.zeros_like(dscale_ref)
        dshift_ref[...] = jnp.zeros_like(dshift_ref)

    valid_z = _interior_mask(s, zt)
    ge = jnp.where(valid_z, ge_ref[0], 0).astype(ge_ref.dtype)

    # Forward: out[p] reads t_all[p - sh_j], sh_j = (f+1) - (dy*f+dx).
    # Transpose: g_taps[j][l] = ge[l + sh_j].  Shifts span both signs;
    # LEAD >= f+1 zeros on the left and >= f+1 on the right keep every
    # shift in-bounds (the shifted-in values are those zeros).
    zero = jnp.zeros_like(ge)
    taps = []
    for dy in range(3):
        for dx_ in range(3):
            sh = (f + 1) - (dy * f + dx_)
            if sh == 0:
                taps.append(ge)
            elif sh > 0:                     # content moves left by sh
                taps.append(jnp.concatenate(
                    [ge[:, sh:], zero[:, :sh]], axis=1))
            else:                            # content moves right by -sh
                taps.append(jnp.concatenate(
                    [zero[:, :(-sh)], ge[:, :zt + sh]], axis=1))
    g_taps = jnp.concatenate(taps, axis=0)          # [9G, ZT]

    def chunk(i, dx_acc):
        k0 = i * kc
        z = lax.dot_general(
            w1t_ref[pl.ds(k0, kc), :], xs_ref[0],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        sc = scale_ref[pl.ds(k0, kc), :]
        a = z * sc + shift_ref[pl.ds(k0, kc), :]
        mask = (a > 0.0) & valid_z
        r = jnp.where(mask, a, 0.0).astype(ge.dtype)
        dr = lax.dot_general(
            w2s_ref[:, pl.ds(k0, kc)], g_taps,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        da = jnp.where(mask, dr, 0.0)
        dscale_ref[pl.ds(k0, kc), :] += jnp.sum(da * z, axis=1,
                                                keepdims=True)
        dshift_ref[pl.ds(k0, kc), :] += jnp.sum(da, axis=1, keepdims=True)
        dz = (da * sc).astype(ge.dtype)
        dx_acc = dx_acc + lax.dot_general(
            w1t_ref[pl.ds(k0, kc), :], dz,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dw1_ref[pl.ds(k0, kc), :] += lax.dot_general(
            dz, xs_ref[0],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        dw2s_ref[:, pl.ds(k0, kc)] += lax.dot_general(
            g_taps, r,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        return dx_acc

    c_in = xs_ref.shape[1]
    dx = lax.fori_loop(0, c_mid_p // kc, chunk,
                       jnp.zeros((c_in, zt), jnp.float32))
    dx_ref[0, :, :] = dx.astype(dx_ref.dtype)


def _pallas_sandwich_flat_bwd(xs, w1, scale, shift, w2, g, *, s,
                              interpret=False):
    """Fused backward, flat I/O.  Returns (dxs, dw1, dscale, dshift, dw2)
    with dxs in the lead-frame stack layout."""
    b, c_in, zt_in = xs.shape
    c_mid = w1.shape[-1]
    growth = w2.shape[-1]
    dt = xs.dtype
    f, w, zt = _geometry_flat(s)
    assert zt_in == zt

    kc = _pick_kc(c_mid, zt, jnp.dtype(dt).itemsize)
    cmp_ = -(-c_mid // kc) * kc
    w1t = jnp.pad(w1.reshape(c_in, c_mid).T.astype(dt),
                  ((0, cmp_ - c_mid), (0, 0)))
    w2s = jnp.pad(w2.transpose(0, 1, 3, 2).reshape(9 * growth,
                                                  c_mid).astype(dt),
                  ((0, 0), (0, cmp_ - c_mid)))
    scale2 = jnp.pad(scale.astype(jnp.float32),
                     (0, cmp_ - c_mid)).reshape(cmp_, 1)
    shift2 = jnp.pad(shift.astype(jnp.float32),
                     (0, cmp_ - c_mid)).reshape(cmp_, 1)

    dx, dw1, dw2s, dscale, dshift = pl.pallas_call(
        functools.partial(_bwd_kernel_flat, s=s, c_mid_p=cmp_,
                          growth=growth, kc=kc),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, c_in, zt), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, growth, zt), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cmp_, c_in), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9 * growth, cmp_), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cmp_, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cmp_, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, c_in, zt), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cmp_, c_in), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9 * growth, cmp_), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cmp_, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cmp_, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, c_in, zt), dt),
            jax.ShapeDtypeStruct((cmp_, c_in), jnp.float32),
            jax.ShapeDtypeStruct((9 * growth, cmp_), jnp.float32),
            jax.ShapeDtypeStruct((cmp_, 1), jnp.float32),
            jax.ShapeDtypeStruct((cmp_, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=96 * 2**20),
        interpret=interpret,
    )(xs, g, w1t, w2s, scale2, shift2)

    dw1 = dw1[:c_mid].T.reshape(1, 1, c_in, c_mid).astype(jnp.float32)
    dw2 = (dw2s[:, :c_mid].reshape(3, 3, growth, c_mid)
           .transpose(0, 1, 3, 2).astype(jnp.float32))
    return (dx, dw1, dscale[:c_mid, 0], dshift[:c_mid, 0], dw2)


def flat_reference_sandwich(xs, w1, scale, shift, w2, *, s):
    """XLA reference for the flat layout: convert to NHWC, run
    :func:`reference_sandwich`, convert back (used as the non-Pallas
    custom_vjp backward and in tests)."""
    f, w, zt = _geometry_flat(s)
    b, c_in, _ = xs.shape
    xr = (xs[:, :, LEAD:LEAD + f * f].reshape(b, c_in, f, f)
          [:, :, 1:s + 1, 1:s + 1].transpose(0, 2, 3, 1))
    y = reference_sandwich(xr, w1, scale, shift, w2)
    g = w2.shape[-1]
    yp = jnp.pad(y.transpose(0, 3, 1, 2), ((0, 0), (0, 0), (1, 1), (1, 1)))
    return jnp.pad(yp.reshape(b, g, f * f),
                   ((0, 0), (0, 0), (LEAD, zt - LEAD - f * f)))


@functools.lru_cache(maxsize=None)
def _make_fused_flat(s: int, interpret: bool, pallas_bwd: bool = True):
    @jax.custom_vjp
    def fused(xs, w1, scale, shift, w2):
        return _pallas_sandwich_flat(xs, w1, scale, shift, w2, s=s,
                                     interpret=interpret)

    def fwd(xs, w1, scale, shift, w2):
        return fused(xs, w1, scale, shift, w2), (xs, w1, scale, shift, w2)

    def bwd(res, g):
        if pallas_bwd:
            return _pallas_sandwich_flat_bwd(*res, g, s=s,
                                             interpret=interpret)
        _, vjp = jax.vjp(
            lambda *a: flat_reference_sandwich(*a, s=s), *res)
        return vjp(g)

    fused.defvjp(fwd, bwd)
    return fused


def dense_sandwich_flat(xs, w1, scale, shift, w2, *, s, interpret=False,
                        pallas_bwd=True):
    """Public flat-layout entry (grad-safe custom_vjp)."""
    return _make_fused_flat(s, interpret, pallas_bwd)(
        xs, w1, scale, shift, w2)


def reference_sandwich(xr, w1, scale, shift, w2):
    """Plain XLA formulation with the DenseLayer's dtype semantics:
    conv1 in compute dtype, affine+relu in f32, conv2 in compute dtype.
    Used as the custom_vjp backward and as the off-TPU fallback."""
    dt = xr.dtype
    dn = ("NHWC", "HWIO", "NHWC")
    z = lax.conv_general_dilated(xr, w1.astype(dt), (1, 1), "VALID",
                                 dimension_numbers=dn)
    z = z.astype(jnp.float32) * scale + shift
    z = jnp.maximum(z, 0.0).astype(dt)
    return lax.conv_general_dilated(z, w2.astype(dt), (1, 1),
                                    ((1, 1), (1, 1)),
                                    dimension_numbers=dn)


# Per-spatial-size kernel layout: "cp" = the transposed [C, pixels]
# kernel above; "nhwc" = the NHWC-native variant (pixels on sublanes, no
# prep transposes - kernels/dense_sandwich_nhwc.py).  Populated from
# measurement (tools/bench_sandwich.py --layout): on real v5e the cp
# layout wins every routed shape in both fwd and fwd+bwd (S=57 c96 fwd
# 1.22 vs 1.80 ms, fbwd 3.51 vs 4.52 ms; PERF.md round 4) - the one-time
# transpose buys dense [C, 128k] contractions, while NHWC's padded
# S*(S+2) pixel axis fragments every tap's matmul.
_LAYOUT = {57: "cp", 29: "cp", 15: "cp"}


@functools.lru_cache(maxsize=None)
def _make_fused(interpret: bool, pallas_bwd: bool = False,
                layout: str = "cp"):
    if layout == "nhwc":
        from md_rdm_tpu.kernels.dense_sandwich_nhwc import (
            sandwich_nhwc, sandwich_nhwc_bwd)
        fwd_impl, bwd_impl = sandwich_nhwc, sandwich_nhwc_bwd
    else:
        fwd_impl, bwd_impl = _pallas_sandwich, _pallas_sandwich_bwd

    @jax.custom_vjp
    def fused(xr, w1, scale, shift, w2):
        return fwd_impl(xr, w1, scale, shift, w2, interpret=interpret)

    def fwd(xr, w1, scale, shift, w2):
        return fused(xr, w1, scale, shift, w2), (xr, w1, scale, shift, w2)

    def bwd(res, g):
        if pallas_bwd:
            return bwd_impl(*res, g, interpret=interpret)
        _, vjp = jax.vjp(reference_sandwich, *res)
        return vjp(g)

    fused.defvjp(fwd, bwd)
    return fused


def dense_sandwich(xr, w1, scale, shift, w2, *, use_pallas=True,
                   interpret=False, pallas_bwd=False, layout=None):
    """Public entry: fused Pallas sandwich (grad-safe) or the XLA
    reference formulation when ``use_pallas`` is False / unsupported.
    ``layout`` overrides the measured per-size :data:`_LAYOUT` choice."""
    if not use_pallas or not supported_spatial(xr.shape[1]):
        return reference_sandwich(xr, w1, scale, shift, w2)
    layout = layout or _LAYOUT[xr.shape[1]]
    return _make_fused(interpret, pallas_bwd, layout)(
        xr, w1, scale, shift, w2)


def sandwich_flops(b: int, s: int, c_in: int, c_mid: int,
                   growth: int = 48) -> int:
    """Matmul flops of one fused sandwich (invisible to XLA cost_analysis
    once inside the custom call): 1x1 expand + 3x3 growth conv."""
    return 2 * b * s * s * c_mid * (c_in + 9 * growth)


def sandwich_bwd_flops(b: int, s: int, c_in: int, c_mid: int,
                       growth: int = 48) -> int:
    """Matmul flops of one fused *backward* program: z recompute (C_in) +
    conv2-transpose (9G) + conv1-transpose (C_in) + dw1 (C_in) + dw2 (9G),
    each a [.., C_mid] contraction over the S*S pixels."""
    return 2 * b * s * s * c_mid * (3 * c_in + 2 * 9 * growth)


# Flat-block routing tables (round-5 measurement, results/round5/perf,
# all numbers same-session vs the base control):
# TRAIN S=57 wins decisively (bf16 step 62.5 vs 67.8 ms = 53.8 vs 49.4%
# MFU, f32 81.5 vs 86.7 - the per-layer glue runs twice under remat
# plus its vjp, and the flat layout removes all of it); S=29/15 flat
# loses hard (flatall train 128 vs 62.5 ms bf16: 48 tiny per-batch-
# element programs are dispatch-bound, same reason the NHWC kernel
# never routed there).  EVAL S=57 loses slightly (796 vs 838 img/s
# bf16: the single fwd instance only pays ~1.5 ms of prep glue, less
# than the flat path's ZT-lane inflation + hand-rolled BN cost less
# XLA fusion) - eval stays on the NHWC kernel path.
_FLAT_PROFITABLE_TRAIN = frozenset({57})
_FLAT_PROFITABLE_EVAL = frozenset()


def flat_routes(s: int, train: bool, mode: str) -> bool:
    """Whether the Encoder routes a dense block through DenseBlockFlat
    (train and eval trace separately; the param tree is identical, so
    the choice is free per mode)."""
    if mode == "on_all":
        return True
    if mode == "interpret":
        return s == 57
    if mode != "on":
        return False
    return s in (_FLAT_PROFITABLE_TRAIN if train else _FLAT_PROFITABLE_EVAL)


def flat_sizes(flat: str, train: bool = False) -> frozenset:
    """Spatial sizes the flat block path routes for a flat mode."""
    return frozenset(s for s in (57, 29, 15)
                     if flat_routes(s, train, flat))


def fused_hidden_flops(batch: int, growth: int = 48, mode: str = "on",
                       train: bool = False, bwd: bool = False,
                       flat: str = "off") -> int:
    """Total per-forward flops hidden inside Pallas sandwich calls for the
    flagship encoder (blocks at S=57/29/15 with the reference's bn_size =
    spatial quirk, RDM_Net.py:526-531), honoring the routing for
    ``mode``/``train``.  ``bwd`` counts the fused-backward programs
    instead (only sizes where :func:`bwd_routes`).  ``flat`` marks block
    sizes routed through DenseBlockFlat: every layer there is a Pallas
    call with the Pallas backward (mult 1 + bwd), regardless of the NHWC
    routing tables.  Benchmarks add this to XLA's cost analysis so MFU
    stays honest when the kernel is on."""
    fs = flat_sizes(flat, train)
    total = 0
    for s, n_layers, c0 in ((57, 6, 96), (29, 12, 192), (15, 36, 384)):
        if s in fs:
            mult = 1   # flat always pairs the Pallas fwd with its bwd
            if bwd and not train:
                continue
        elif bwd:
            if not (routes(s, train, mode) and bwd_routes(s, mode)):
                continue
            mult = 1
        else:
            if not routes(s, train, mode):
                continue
            # In a remat train step the backward replays the fused forward
            # UNLESS the Pallas backward also routes - then the custom_vjp
            # residuals are the layer inputs and XLA DCEs the replay
            # (verified by HLO inspection, round 3).  Fwd-routed-but-not-
            # bwd-routed layers therefore execute the forward twice.
            mult = 2 if train and not bwd_routes(s, mode) else 1
        c_mid = s * growth
        for i in range(n_layers):
            fn = sandwich_bwd_flops if bwd else sandwich_flops
            total += mult * fn(batch, s, c0 + i * growth, c_mid, growth)
    return total


def conv_bn_stats_flat(xs, w1, n_valid: int):
    """:func:`conv_bn_stats` for a lead-frame flat stack [B, C, ZT].

    Border and pad lanes are exactly zero, so plain sums over (B, lanes)
    equal the sums over the N = n_valid real pixels; only the divisor
    needs the true count.  Uses the uncentered co-moment E[xx^T] - mm^T
    (flax BatchNorm's own E[x^2] - E[x]^2 form) because centering would
    destroy the zero borders; float32 accumulation keeps it stable at
    these magnitudes (relu'd BN outputs, O(1))."""
    xf = xs.astype(jnp.float32)
    wf = w1.reshape(xs.shape[1], -1).astype(jnp.float32)
    m = jnp.sum(xf, axis=(0, 2)) / n_valid                 # [C]
    xx = lax.dot_general(xf, xf, (((0, 2), (0, 2)), ((), ())),
                         preferred_element_type=jnp.float32) / n_valid
    mean = m @ wf                                          # [C_mid]
    ex2 = jnp.sum(wf * (xx @ wf), axis=0)
    var = jnp.maximum(ex2 - mean * mean, 0.0)
    return mean, var


def conv_bn_stats(xr, w1):
    """Batch mean/var of ``conv1x1(xr, w1)`` without materializing it.

    The 1x1 conv is linear with no bias, so over N = B*H*W pixels:
      mean_d  = m @ W[:, d]                 with m = E[x]
      E[z_d^2] = W[:, d]^T S W[:, d]         with S = E[x x^T]
      var_d   = E[z_d^2] - mean_d^2          (biased, = flax BatchNorm)

    Cost is O(N*C_in^2 + C_in^2*C_mid) instead of O(N*C_mid) memory
    traffic over the huge z.  All accumulation in float32; fully
    differentiable (the caller backprops through the statistics exactly
    as through flax BatchNorm's).
    """
    b, h, w, c_in = xr.shape
    n = b * h * w
    xf = xr.reshape(n, c_in).astype(jnp.float32)
    wf = w1.reshape(c_in, -1).astype(jnp.float32)
    m = jnp.mean(xf, axis=0)                              # [C_in]
    xc = xf - m                                            # centered
    cov = lax.dot_general(xc, xc, (((0,), (0,)), ((), ())),
                          preferred_element_type=jnp.float32) / n
    mean = m @ wf                                          # [C_mid]
    var = jnp.maximum(jnp.sum(wf * (cov @ wf), axis=0), 0.0)
    return mean, var
