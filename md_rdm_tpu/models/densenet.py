"""DenseNet building blocks with torchvision semantics, NHWC for TPU.

The reference hand-assembles its encoder from torchvision densenet internals
(RDM_Net.py:515-534): ``_DenseBlock(num_layers, in_features, bn_size,
growth_rate, drop_rate, memory_efficient)`` where each layer is
BN -> ReLU -> 1x1 conv (bn_size * growth) -> BN -> ReLU -> 3x3 conv (growth)
and concatenates its output onto the running feature stack;
``_Transition`` is BN -> ReLU -> 1x1 conv -> 2x2 avg-pool stride 2.

The reference passes unusual bn_size values (57/29/15 for the encoder
blocks, 8 for the decoder block - RDM_Net.py:526-531,144), which we preserve
exactly for shape parity.

Layout is NHWC (channels-last) - the native TPU convolution layout - and the
feature concatenation runs along the last axis, which XLA handles without
data movement.  BatchNorm statistics/params stay float32 even in bfloat16
compute mode.
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from md_rdm_tpu.kernels.dense_sandwich import (LEAD, _geometry_flat,
                                               _interior_mask, bwd_routes,
                                               conv_bn_stats,
                                               conv_bn_stats_flat,
                                               dense_sandwich,
                                               dense_sandwich_flat,
                                               flat_routes, routes)
from md_rdm_tpu.kernels.growth_conv import growth_conv_matmul, growth_routes

Dtype = Any


def resolve_fused(mode: str) -> str:
    """Resolve ModelConfig.fused_dense ("auto" -> on for real TPU)."""
    if mode == "auto":
        return "on" if jax.default_backend() == "tpu" else "off"
    return mode


def resolve_flat(mode: str, fused_resolved: str) -> str:
    """Resolve ModelConfig.flat_block.  The flat S=57 block needs the
    Pallas kernel (every layer routes), so "auto" can only be on when
    the resolved fused mode is too; measurement gates the default
    (tools/true_bench.py --flat, PERF.md round 5)."""
    if mode == "auto":
        ok = (jax.default_backend() == "tpu"
              and fused_resolved in ("on", "on_all", "on_all_bwd"))
        return "on" if ok else "off"
    return mode


class _Kernel(nn.Module):
    """Bare conv-kernel parameter holder: registers ``<name>/kernel`` with
    nn.Conv's exact default initializer/shape so fused layers stay
    checkpoint- and converter-compatible with the unfused graph."""

    shape: tuple

    @nn.compact
    def __call__(self):
        return self.param("kernel", nn.initializers.lecun_normal(),
                          self.shape, jnp.float32)


class _FoldedNorm(nn.Module):
    """BatchNorm folded to a per-channel (scale, shift) affine over the
    *output of a bias-free 1x1 conv* without materializing that output.

    Registers the same params/variables as ``nn.BatchNorm(name=...)``
    (params ``scale``/``bias``, batch_stats ``mean``/``var``) so checkpoints
    interoperate.  Train-mode batch statistics come from
    :func:`conv_bn_stats` (exact up to f.p. summation order - the 1x1 conv
    is linear); running averages update with flax's convention
    ``ra = momentum * ra + (1 - momentum) * batch``.
    """

    momentum: float = 0.9
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, xr, w1, train: bool):
        c = w1.shape[-1]
        gamma = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        beta = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((c,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((c,), jnp.float32))
        if train:
            mean, var = conv_bn_stats(xr, w1)
            if not self.is_initializing():
                m = self.momentum
                ra_mean.value = m * ra_mean.value + (1 - m) * mean
                ra_var.value = m * ra_var.value + (1 - m) * var
        else:
            mean, var = ra_mean.value, ra_var.value
        s = gamma * jax.lax.rsqrt(var + self.epsilon)
        return s, beta - mean * s


class DenseLayer(nn.Module):
    """One torchvision _DenseLayer (bottleneck + 3x3 growth conv).

    ``fused`` ("on"/"interpret") routes the conv1 -> norm2 -> relu ->
    conv2 sandwich through the Pallas kernel (kernels/dense_sandwich.py)
    at supported spatial sizes - same math, same parameter tree.
    """

    bn_size: int
    growth_rate: int
    dtype: Dtype = jnp.float32
    fused: str = "off"
    growth: str = "off"

    @nn.compact
    def __call__(self, x, train: bool = False):
        # BN statistics/params stay float32; the normalized output is cast
        # to the compute dtype BEFORE relu/conv so every tensor between
        # BN and conv is half-width in bf16 mode (the conv already casts
        # internally, so this mainly narrows the relu and keeps fusions
        # uniform; measured ~3% logical-byte reduction).
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=jnp.float32, name="norm1")(x)
        h = nn.relu(h.astype(self.dtype))
        c_mid = self.bn_size * self.growth_rate
        # routing per measured profitability (kernels/dense_sandwich.py):
        # eval and train have separate tables - the train step must beat
        # the prep copy running twice under remat plus its vjp (PERF.md
        # round 3).  "interpret" (tests) and "on_all" (benchmarks) force
        # every kernel-supported size in both modes.
        if routes(h.shape[1], train, self.fused):
            w1 = _Kernel((1, 1, h.shape[-1], c_mid), name="conv1")()
            w2 = _Kernel((3, 3, c_mid, self.growth_rate), name="conv2")()
            scale, shift = _FoldedNorm(name="norm2")(h, w1, train)
            return dense_sandwich(h, w1, scale, shift, w2,
                                  interpret=self.fused == "interpret",
                                  pallas_bwd=bwd_routes(h.shape[1],
                                                        self.fused))
        h = nn.Conv(c_mid, (1, 1), use_bias=False,
                    dtype=self.dtype, name="conv1")(h)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=jnp.float32, name="norm2")(h)
        h = nn.relu(h.astype(self.dtype))
        # the 48-lane growth conv optionally runs as the full-lane matmul
        # formulation (kernels/growth_conv.py) - same param tree (conv2
        # kernel registered with nn.Conv's shape/init via _Kernel).
        if growth_routes(h.shape[1], train, self.growth):
            w2 = _Kernel((3, 3, c_mid, self.growth_rate), name="conv2")()
            return growth_conv_matmul(h, w2.astype(self.dtype))
        h = nn.Conv(self.growth_rate, (3, 3), padding=1, use_bias=False,
                    dtype=self.dtype, name="conv2")(h)
        return h


class _FlatNorm(nn.Module):
    """``nn.BatchNorm`` semantics over a lead-frame flat stack
    [B, C, ZT] (kernels/dense_sandwich.py flat layout).

    Border/pad lanes are exactly zero, so plain sums over (batch, lanes)
    equal the sums over the ``n_valid`` = B*S*S real pixels; only the
    divisor changes.  Variance is E[x^2] - E[x]^2, flax's own form, so
    batch statistics match ``nn.BatchNorm`` bit-for-bit up to summation
    order.  Registers the same params/variables (``scale``/``bias``,
    ``mean``/``var``) for checkpoint interop.  Returns the folded
    per-channel (scale, shift) affine instead of applying it."""

    momentum: float = 0.9
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x, n_valid: int, train: bool):
        c = x.shape[1]
        gamma = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        beta = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((c,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((c,), jnp.float32))
        if train:
            xf = x.astype(jnp.float32)
            mean = jnp.sum(xf, axis=(0, 2)) / n_valid
            ex2 = jnp.sum(xf * xf, axis=(0, 2)) / n_valid
            var = jnp.maximum(ex2 - mean * mean, 0.0)
            if not self.is_initializing():
                m = self.momentum
                ra_mean.value = m * ra_mean.value + (1 - m) * mean
                ra_var.value = m * ra_var.value + (1 - m) * var
        else:
            mean, var = ra_mean.value, ra_var.value
        s = gamma * jax.lax.rsqrt(var + self.epsilon)
        return s, beta - mean * s


class _FlatFoldedNorm(nn.Module):
    """:class:`_FoldedNorm` over a lead-frame flat stack: folded-BN
    affine for the output of a bias-free 1x1 conv, batch statistics via
    :func:`conv_bn_stats_flat` (same linearity argument; zero borders
    keep the sums exact)."""

    momentum: float = 0.9
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, xs, w1, n_valid: int, train: bool):
        c = w1.shape[-1]
        gamma = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        beta = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((c,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((c,), jnp.float32))
        if train:
            mean, var = conv_bn_stats_flat(xs, w1, n_valid)
            if not self.is_initializing():
                m = self.momentum
                ra_mean.value = m * ra_mean.value + (1 - m) * mean
                ra_var.value = m * ra_var.value + (1 - m) * var
        else:
            mean, var = ra_mean.value, ra_var.value
        s = gamma * jax.lax.rsqrt(var + self.epsilon)
        return s, beta - mean * s


class FlatDenseLayer(nn.Module):
    """One _DenseLayer over the lead-frame flat stack: norm1 affine +
    relu + interior mask, then the flat-I/O Pallas sandwich.  Parameter
    tree identical to :class:`DenseLayer` (norm1, conv1, norm2, conv2).

    The interior mask after relu restores the stack's structural zero
    borders (the BN shift makes them nonzero otherwise) - required both
    by the kernel's tap trick and so border cotangents never reach the
    BN parameter gradients (the mask zeroes them on the way back)."""

    bn_size: int
    growth_rate: int
    spatial: int
    dtype: Dtype = jnp.float32
    interpret: bool = False
    pallas_bwd: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        s = self.spatial
        _f, _w, zt = _geometry_flat(s)
        n_valid = x.shape[0] * s * s
        sc1, sh1 = _FlatNorm(name="norm1")(x, n_valid, train)
        h = (x.astype(jnp.float32) * sc1[None, :, None]
             + sh1[None, :, None])
        h = jnp.where(_interior_mask(s, zt)[None],
                      nn.relu(h.astype(self.dtype)),
                      jnp.zeros((), self.dtype))
        c_mid = self.bn_size * self.growth_rate
        w1 = _Kernel((1, 1, h.shape[1], c_mid), name="conv1")()
        w2 = _Kernel((3, 3, c_mid, self.growth_rate), name="conv2")()
        sc2, sh2 = _FlatFoldedNorm(name="norm2")(h, w1, n_valid, train)
        return dense_sandwich_flat(h, w1, sc2, sh2, w2, s=s,
                                   interpret=self.interpret,
                                   pallas_bwd=self.pallas_bwd)


class DenseBlockFlat(nn.Module):
    """_DenseBlock in lead-frame flat layout: ONE entry transpose, the
    concat-growth runs on [B, C, ZT] stacks (kernel-native I/O - no
    per-layer prep/reshape glue), ONE exit transpose back to NHWC.
    Parameter tree identical to :class:`DenseBlock`."""

    num_layers: int
    bn_size: int
    growth_rate: int
    dtype: Dtype = jnp.float32
    remat: bool = False
    interpret: bool = False
    pallas_bwd: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, s, _, c0 = x.shape
        f, _w, zt = _geometry_flat(s)
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        stack = jnp.pad(xp.transpose(0, 3, 1, 2).reshape(b, c0, f * f),
                        ((0, 0), (0, 0), (LEAD, zt - LEAD - f * f)))
        layer_cls = (nn.remat(FlatDenseLayer, static_argnums=(2,))
                     if self.remat else FlatDenseLayer)
        for i in range(self.num_layers):
            new = layer_cls(self.bn_size, self.growth_rate, spatial=s,
                            dtype=self.dtype, interpret=self.interpret,
                            pallas_bwd=self.pallas_bwd,
                            name=f"denselayer{i + 1}")(stack, train)
            stack = jnp.concatenate([stack, new.astype(stack.dtype)],
                                    axis=1)
        out = (stack[:, :, LEAD:LEAD + f * f]
               .reshape(b, stack.shape[1], f, f)[:, :, 1:s + 1, 1:s + 1])
        return out.transpose(0, 2, 3, 1)


class DenseBlock(nn.Module):
    """torchvision _DenseBlock: concat-growth over num_layers layers.

    ``remat=True`` rematerializes each layer in the backward pass
    (the role of torchvision's memory_efficient flag, which the reference
    enables - RDM_Net.py:526-531 last ctor arg).
    """

    num_layers: int
    bn_size: int
    growth_rate: int
    dtype: Dtype = jnp.float32
    remat: bool = False
    fused: str = "off"
    growth: str = "off"

    @nn.compact
    def __call__(self, x, train: bool = False):
        layer_cls = (nn.remat(DenseLayer, static_argnums=(2,))
                     if self.remat else DenseLayer)
        for i in range(self.num_layers):
            new = layer_cls(self.bn_size, self.growth_rate,
                            dtype=self.dtype, fused=self.fused,
                            growth=self.growth,
                            name=f"denselayer{i + 1}")(
                                x, train)
            x = jnp.concatenate([x, new.astype(x.dtype)], axis=-1)
        return x


class Transition(nn.Module):
    """torchvision _Transition: BN -> ReLU -> 1x1 conv -> avgpool/2."""

    num_output_features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=jnp.float32, name="norm")(x)
        h = nn.relu(h.astype(self.dtype))   # see DenseLayer dtype note
        h = nn.Conv(self.num_output_features, (1, 1), use_bias=False,
                    dtype=self.dtype, name="conv")(h)
        h = nn.avg_pool(h, (2, 2), strides=(2, 2))
        return h


def pad_br(x: jnp.ndarray) -> jnp.ndarray:
    """ZeroPad2d((0,1,0,1)): one zero row at bottom, one column at right
    (RDM_Net.py:532; applied after each encoder dense block :80,86,92)."""
    return jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))


class Encoder(nn.Module):
    """DenseNet-161-style encoder (RDM_Net.py:515-534, forward :73-94).

    226x226x3 -> conv7/2 -> 113 -> maxpool3/2 -> 57 -> dense(6,96,bn57)
    -> 384ch -> pad -> 58 -> trans/2 -> 192ch@29 -> dense(12) -> 768 -> pad
    -> 30 -> trans -> 384@15 -> dense(36) -> 2112 -> pad -> 16 -> trans
    -> 1056@8.
    """

    dtype: Dtype = jnp.float32
    remat: bool = False
    fused: str = "off"
    growth: str = "off"
    flat: str = "off"

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x.astype(self.dtype)
        x = nn.Conv(96, (7, 7), strides=(2, 2), padding=3,
                    dtype=self.dtype, name="conv_e1")(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        # S=57 block: the flat-layout path keeps the concat stack in the
        # kernel's own layout (every layer kernelized, glue-free); param
        # tree identical, so the choice is runtime-routable PER MODE
        # (train/eval trace separately) via the measured flat_routes
        # tables.  "on_all" forces every block (bench mode; the S=29/15
        # flat blocks measured dispatch-bound - see kernels tables).
        def block(x, train, n_layers, bn, name):
            # Route on the ACTUAL incoming shape: device-augment init
            # traces the encoder at the raw pre-crop size (250x333 ->
            # non-square spatial), where only the shape-generic NHWC
            # path applies.  The param tree is identical either way, so
            # init-at-raw-shape + apply-at-226 stays consistent.
            s = x.shape[1]
            if s == x.shape[2] and flat_routes(s, train, self.flat):
                return DenseBlockFlat(n_layers, bn, 48, dtype=self.dtype,
                                      remat=self.remat,
                                      interpret="interpret" in self.flat,
                                      name=name)(x, train)
            return DenseBlock(n_layers, bn, 48, dtype=self.dtype,
                              remat=self.remat, fused=self.fused,
                              growth=self.growth, name=name)(x, train)

        x = block(x, train, 6, 57, "dense_e2")
        x = pad_br(x)
        x = Transition(192, dtype=self.dtype, name="trans_e2")(x, train)
        x = block(x, train, 12, 29, "dense_e3")
        x = pad_br(x)
        x = Transition(384, dtype=self.dtype, name="trans_e3")(x, train)
        x = block(x, train, 36, 15, "dense_e4")
        x = pad_br(x)
        x = Transition(1056, dtype=self.dtype, name="trans_e4")(x, train)
        return x
