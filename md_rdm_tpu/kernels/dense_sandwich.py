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
single Pallas program per (batch, row-strip):

* both contractions run in **transposed layout** ``[C, pixels]`` so the
  pixel axis (= thousands) fills the MXU lanes instead of the 48 output
  channels;
* z lives only in VMEM (a ``[C_mid, ~1.3k]`` strip, ~7 MB) - the HBM
  round trip disappears;
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

# Output rows computed per program for each supported spatial size.  S
# must be divisible by R; R+2 rows of z (halo) are produced per strip.
_STRIP_ROWS = {57: 19, 29: 29, 15: 15}


def _pad128(n: int) -> int:
    return -(-n // 128) * 128


def _geometry(s: int) -> Tuple[int, int, int, int, int]:
    """(R, F, n_strips, Lp, ZL) for spatial size S."""
    r = _STRIP_ROWS[s]
    f = s + 2
    n = s // r
    lp = _pad128(r * f)
    zl = _pad128(max((r + 2) * f, 2 * f + 2 + lp))
    return r, f, n, lp, zl


def supported_spatial(s: int) -> bool:
    return s in _STRIP_ROWS


# Sizes where the fused kernel beats XLA's formulation on real v5e
# (tools/bench_sandwich.py, PERF.md round 3, fori_loop kernel): 57 wins
# 25-41% across its c_in range in BOTH dtypes (62-63% MFU vs XLA's
# 35-47%); 29 wins narrow but loses 25% at wide c_in (the [432,kc]@
# [kc,zl] tap matmul amortizes worse as the strip shrinks); 15 loses up
# to 2x wide.  "on" therefore routes only S=57 (encoder block 1, the
# single hottest stage) through the kernel.
_PROFITABLE = frozenset({57})


def profitable_spatial(s: int) -> bool:
    return s in _PROFITABLE


def _pick_kc(c_mid: int, zl: int, itemsize: int) -> int:
    """Contraction-chunk size, always a multiple of 128 so every chunk's
    K dimension is full MXU tiles (C_mid is padded up to a kc multiple;
    the pad rows cost compute but the full tiles more than pay for it -
    measured vs divisor-of-C_mid chunking).  Among sizes whose z slab
    (f32 transient + cast copy) fits the VMEM budget, minimize pad waste,
    then prefer the largest (fewer chunk-loop iterations)."""
    best = None
    for kc in (512, 384, 256, 128):
        if kc * zl * (4 + itemsize) > 6_000_000:
            continue
        waste = -(-c_mid // kc) * kc - c_mid
        if best is None or (waste, -kc) < best[0]:
            best = ((waste, -kc), kc)
    return best[1]


def _kernel(xs_ref, w1t_ref, w2s_ref, scale_ref, shift_ref, out_ref,
            *, s, c_mid_p, growth, kc):
    """One (batch, strip) program.  See module docstring for layout.

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
    r, f, _, lp, zl = _geometry(s)
    strip = pl.program_id(1)
    real = (r + 2) * f                      # valid flat length of the strip

    # zero mask for the padded frame border (the conv's zero padding):
    # column 0 / F-1 of every frame row, frame rows 0 / S+1, strip tail.
    fp = lax.broadcasted_iota(jnp.int32, (1, zl), 1)
    col = fp % f
    row = strip * r + fp // f
    valid = ((col > 0) & (col < f - 1) & (row > 0) & (row < s + 1)
             & (fp < real))

    def chunk(i, acc):
        k0 = i * kc
        z = lax.dot_general(
            w1t_ref[pl.ds(k0, kc), :], xs_ref[0, 0],
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
    out_ref[0, 0, :, :] = acc.astype(out_ref.dtype)


def _pallas_sandwich(xr, w1, scale, shift, w2, *, interpret=False):
    """Fused forward.  xr: [B,S,S,C_in] (already norm1+relu'd, compute
    dtype); w1: [1,1,C_in,C_mid]; w2: [3,3,C_mid,G]; scale/shift:
    [C_mid] float32 folded-BN affine.  Returns [B,S,S,G] in xr.dtype."""
    b, s, _, c_in = xr.shape
    c_mid = w1.shape[-1]
    growth = w2.shape[-1]
    dt = xr.dtype
    r, f, n, lp, zl = _geometry(s)

    # prep: zero-pad frame, channels-first, flatten, overlapping strips
    xp = jnp.pad(xr, ((0, 0), (1, 1), (1, 1), (0, 0)))
    xt = xp.transpose(0, 3, 1, 2).reshape(b, c_in, f * f)
    xs = jnp.stack([xt[:, :, i * r * f: i * r * f + (r + 2) * f]
                    for i in range(n)], 1)             # [B,n,C_in,(R+2)F]
    xs = jnp.pad(xs, ((0, 0), (0, 0), (0, 0), (0, zl - (r + 2) * f)))

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
        grid=(b, n),
        in_specs=[
            pl.BlockSpec((1, 1, c_in, zl), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cmp_, c_in), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9 * growth, cmp_), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cmp_, 1), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cmp_, 1), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, growth, lp),
                               lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n, growth, lp), dt),
        # f32 at S=57 peaks ~17 MB of scoped VMEM (w2s 4.9 MB + w1t 3.2 MB
        # resident + z/t_all slabs); the 16 MB default cap is arbitrary on
        # a 128 MB-VMEM chip - raise it rather than shrink the chunks.
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 2**20),
        interpret=interpret,
    )(xs, w1t, w2s, scale2, shift2)

    # [B,n,G,R*F(pad)] -> [B,S,S,G]; flat position q = o*F + w, w<S
    y = out[..., :r * f].reshape(b, n, growth, r, f)[..., :s]
    return y.transpose(0, 1, 3, 4, 2).reshape(b, s, s, growth)


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


@functools.lru_cache(maxsize=None)
def _make_fused(interpret: bool):
    @jax.custom_vjp
    def fused(xr, w1, scale, shift, w2):
        return _pallas_sandwich(xr, w1, scale, shift, w2,
                                interpret=interpret)

    def fwd(xr, w1, scale, shift, w2):
        return fused(xr, w1, scale, shift, w2), (xr, w1, scale, shift, w2)

    def bwd(res, g):
        _, vjp = jax.vjp(reference_sandwich, *res)
        return vjp(g)

    fused.defvjp(fwd, bwd)
    return fused


def dense_sandwich(xr, w1, scale, shift, w2, *, use_pallas=True,
                   interpret=False):
    """Public entry: fused Pallas sandwich (grad-safe) or the XLA
    reference formulation when ``use_pallas`` is False / unsupported."""
    if not use_pallas or not supported_spatial(xr.shape[1]):
        return reference_sandwich(xr, w1, scale, shift, w2)
    return _make_fused(interpret)(xr, w1, scale, shift, w2)


def sandwich_flops(b: int, s: int, c_in: int, c_mid: int,
                   growth: int = 48) -> int:
    """Matmul flops of one fused sandwich (invisible to XLA cost_analysis
    once inside the custom call): 1x1 expand + 3x3 growth conv."""
    return 2 * b * s * s * c_mid * (c_in + 9 * growth)


def fused_hidden_flops(batch: int, growth: int = 48) -> int:
    """Total per-forward flops hidden inside Pallas sandwich calls for the
    flagship encoder (blocks at S=57/29/15 with the reference's bn_size =
    spatial quirk, RDM_Net.py:526-531), honoring the profitable-size
    routing.  Benchmarks add this to XLA's cost analysis so MFU stays
    honest when the kernel is on."""
    total = 0
    for s, n_layers, c0 in ((57, 6, 96), (29, 12, 192), (15, 36, 384)):
        if not profitable_spatial(s):
            continue
        c_mid = s * growth
        for i in range(n_layers):
            total += sandwich_flops(batch, s, c0 + i * growth, c_mid,
                                    growth)
    return total


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
