"""Full-lane XLA formulation of the 3x3 "growth" convolution.

Every dense layer's second conv writes ``growth_rate`` = 48 output
channels (reference RDM_Net.py:526-531 torchvision blocks), so XLA's
native conv lowering fills 48 of 128 MXU output lanes (~37%) - the
structural MFU ceiling named in PERF.md's roadmap.  The S=57 layers
route through the fused Pallas sandwich (kernels/dense_sandwich.py),
whose 9-tap trick already packs the lanes; the S=29/15 layers stay on
XLA because the Pallas kernel loses there (too little per-program work).

This module gives those XLA-routed layers the same lane-packing WITHOUT
Pallas: express the 3x3 conv as ONE [9G, C] x [C, pixels] matmul whose
lane dimension is the flattened spatial frame (hundreds to thousands of
pixels - always full), followed by nine statically-shifted slice adds
(VPU work XLA fuses).  The flattened-frame trick is the same as the
Pallas kernel's: with the frame zero-padded to width F = S+2 and
flattened row-major, conv tap (dy, dx) of output pixel q is the flat
position q + dy*F + dx, and row-wrap contamination lands exactly on the
zeroed border columns.

Cost trade: the matmul streams ZL = pad128(~F^2) lane positions instead
of S^2 (1.3-1.7x flop inflation at S=29/15) but at full lane occupancy
(2.7x better), and its autodiff transposes (dz, dw2) keep C respectively
ZL on the lanes - the conv formulation's filter gradient writes G=48
lanes too.  Routing is measurement-driven via :data:`_PROFITABLE`
(tools/bench_sandwich.py --growth).
"""
from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def _pad128(n: int) -> int:
    return -(-n // 128) * 128


# Spatial sizes where the matmul formulation beats lax conv on real v5e.
# MEASURED NEGATIVE EVERYWHERE (round 5, results/round5/perf): at the
# model level the formulation lost both the eval forward (784 vs 833
# img/s bf16 b16) and the train step (80.3 vs 67.8 ms bf16; 104 vs 98 ms
# f32) - the [9G, B, ZL] f32 intermediate (99 MB at S=57-scale) and the
# dz/dw2 autodiff transposes cost more HBM traffic than the 48/128 lane
# fill costs MXU time, and XLA fuses BN/relu into its conv lowering,
# which the matmul's prep transpose breaks.  Tables stay empty; "on_all"
# still forces every size for benchmarking/tests.
_PROFITABLE_EVAL = frozenset()
_PROFITABLE_TRAIN = frozenset()


def growth_routes(s: int, train: bool, mode: str) -> bool:
    """Whether DenseLayer's XLA path uses the matmul growth conv."""
    if mode == "on_all":
        return True
    if mode != "on":
        return False
    return s in (_PROFITABLE_TRAIN if train else _PROFITABLE_EVAL)


def growth_conv_matmul(z: jnp.ndarray, w2: jnp.ndarray) -> jnp.ndarray:
    """3x3 SAME conv ``[B,S,S,C] x [3,3,C,G] -> [B,S,S,G]`` as one
    full-lane matmul plus nine shifted slice adds.

    Bit-compatible with ``lax.conv_general_dilated(z, w2, (1,1), SAME)``
    up to floating-point contraction order (same preferred element type:
    accumulate f32, cast to z.dtype like nn.Conv does).
    """
    b, s, _, c = z.shape
    g = w2.shape[-1]
    f = s + 2
    lp = _pad128(s * f)
    zl = _pad128(max(f * f, 2 * f + 2 + lp))

    # zero-pad frame, channels-first, flatten row-major, pad lane tail
    zp = jnp.pad(z, ((0, 0), (1, 1), (1, 1), (0, 0)))
    zf = jnp.pad(zp.transpose(0, 3, 1, 2).reshape(b, c, f * f),
                 ((0, 0), (0, 0), (0, zl - f * f)))        # [B, C, ZL]
    w2s = w2.transpose(0, 1, 3, 2).reshape(9 * g, c).astype(z.dtype)

    # [9G, C] @ [B, C, ZL] -> [9G, B, ZL]: lanes = ZL (full)
    t = lax.dot_general(w2s, zf,
                        dimension_numbers=(((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32)

    acc = jnp.zeros((g, b, lp), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            j = 3 * dy + dx
            off = dy * f + dx
            acc = acc + t[j * g:(j + 1) * g, :, off:off + lp]

    # flat q = o*F + w, w < S  ->  [B, S, S, G]
    y = acc[..., :s * f].reshape(g, b, s, f)[..., :s]
    return y.transpose(1, 2, 3, 0).astype(z.dtype)


def growth_flop_inflation(batch: int, mode: str = "on",
                          fused: str = "on", train: bool = False,
                          growth_rate: int = 48, flat: str = "off") -> int:
    """Extra flops XLA's cost_analysis counts for the matmul formulation
    over the conv it replaces - SUBTRACT this for honest MFU accounting
    (benchmarks must report achieved *algorithmic* conv flops, not the
    formulation's ZL/S^2 lane-pad inflation; cf. fused_hidden_flops in
    kernels/dense_sandwich.py for the mirror-image correction).

    Counts the encoder layers the growth path actually routes: those NOT
    taken by the Pallas sandwich (dense_sandwich.routes) whose spatial
    size growth_routes approves.  Per routed layer the big dot streams
    ZL = pad128(~F^2) lane positions instead of S^2, in the forward, its
    remat replay (the trainer always remats dense blocks), and the two
    backward contractions (dz, dw2); the nine tap slice-adds contribute
    a further ~8*G*LP adds per instance.  Residual error (pad/relu
    bookkeeping) is <0.5% of a train step's total flops.
    """
    from md_rdm_tpu.kernels.dense_sandwich import flat_sizes
    from md_rdm_tpu.kernels.dense_sandwich import routes as sandwich_routes
    g = growth_rate
    fs = flat_sizes(flat, train)
    total = 0
    for s, n_layers, _c0 in ((57, 6, 96), (29, 12, 192), (15, 36, 384)):
        if s in fs or sandwich_routes(s, train, fused):
            continue
        if not growth_routes(s, train, mode):
            continue
        f = s + 2
        lp = _pad128(s * f)
        zl = _pad128(max(f * f, 2 * f + 2 + lp))
        c_mid = s * g
        dot_infl = 2 * batch * 9 * g * c_mid * (zl - s * s)
        adds = 8 * batch * g * lp
        # instances in the graph: eval fwd = 1; remat train = fwd + replay
        # + two backward contractions (each the same contraction size)
        n_dots = 4 if train else 1
        n_adds = 3 if train else 1
        total += n_layers * (n_dots * dot_infl + n_adds * adds)
    return total
