"""Decoder branches: DORN ordinal heads and relative (comparison+ALS) heads.

Reference: RDM_Net.py:137-396 (``Decoder`` + ``Ordinal_Layer``).

Each decoder: _DenseBlock(24, 1056, bn8, gr48) -> 2208ch@8x8 -> WSM cascade
((id-1) mod 5 stages) -> head:
  * id == 1: 1x1 conv to 180 channels -> DORN ordinal regression
  * id in 2..5: raw cascade output straight into DORN (the reference applies
    no head conv for these ids - RDM_Net.py:156-159 - so ord_num = C/2)
  * id > 5: 1x1 conv to 1 channel -> relative path (comparison matrix ->
    Lloyd quantization -> ALS fill)

DORN decode (RDM_Net.py:313-345): logits are clamped to [1e-8, 1e4], pair
(A,B) softmax reduces to sigmoid(B - A), the decoded label is the count of
pairs with P(B) > 0.5.  The reference's float64 cast exists only to tame
softmax overflow; the sigmoid form is stable in float32.

Gradient semantics: the reference's Lloyd quantization writes constants
in-place, so no gradient reaches the relative decoders' convs through the
comparison path; ``lloyd_quantize`` stops the gradient explicitly and ALS
runs inside ``stop_gradient`` territory (also avoids differentiating 100
fori_loop iterations).
"""
from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax.numpy as jnp

from md_rdm_tpu.core.config import DECODER_SIZES
from md_rdm_tpu.models.densenet import DenseBlock
from md_rdm_tpu.models.wsm import WSMCascade
from md_rdm_tpu.ops.als import alternating_least_squares, quadratic_als
from md_rdm_tpu.ops.comparison import comparison_cross_scale, comparison_v1
from md_rdm_tpu.ops.paging import merge_pages, split_matrix
from md_rdm_tpu.ops.quantize import lloyd_quantize
from md_rdm_tpu.ops.resize import resize_bicubic

Dtype = Any


def dorn_decode(logits: jnp.ndarray,
                soft: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """DORN ordinal regression on NHWC logits (C = 2 * ord_num).

    Returns (decoded (B,1,H,W) float32 label counts, probs (B,ord_num,H,W))
    in NCHW to match the fusion tail's layout.

    ``soft=True`` decodes as sum(P) instead of count(P > 0.5) - the
    reference's commented-out alternative (RDM_Net.py:343).  The hard count
    (default, faithful) has zero gradient, so only the ordinal loss trains
    the backbone; the soft decode lets the depth losses reach it too.
    """
    b, h, w, c = logits.shape
    ord_num = c // 2
    x = jnp.clip(logits.astype(jnp.float32), 1e-8, 1e4)
    a = x[..., 0::2]
    bb = x[..., 1::2]
    probs = nn.sigmoid(bb - a)                      # (B,H,W,ord_num)
    if soft:
        decoded = jnp.sum(probs, axis=-1)
    else:
        decoded = jnp.sum(probs > 0.5, axis=-1).astype(jnp.float32)
    probs = jnp.transpose(probs, (0, 3, 1, 2))      # NCHW
    return decoded[:, None, :, :], probs


def cross_scale_quantized(dn: jnp.ndarray, dn_1: jnp.ndarray, size: int,
                          pallas: str = "auto") -> jnp.ndarray:
    """Quantized cross-scale comparison, Pallas-fused where it pays.

    ``pallas``: "auto" uses the fused kernel on a real TPU backend (the
    ratio matrix then never round-trips through HBM - kernels/lloyd.py);
    "on"/"off" force the choice (interpret-mode Pallas is slow on CPU).
    """
    import jax

    use = pallas == "on" or (pallas == "auto"
                             and jax.default_backend() == "tpu")
    if use:
        from md_rdm_tpu.kernels.lloyd import fused_comparison_quantize
        return fused_comparison_quantize(dn, dn_1, size)
    return lloyd_quantize(comparison_cross_scale(dn, dn_1), size=size)


def relative_map_from_features(d: jnp.ndarray, size: int,
                               als_iters_quadratic: int = 30,
                               als_iters_rect: int = 100,
                               pallas: str = "auto") -> jnp.ndarray:
    """Relative-depth branch of Ordinal_Layer (RDM_Net.py:358-396).

    d: (B, 1, size, size) single-channel feature map (NCHW).
    size 8: full ratio matrix -> quadratic ALS.
    size 16: cross-scale comparison vs bicubic-halved map -> rect ALS.
    size >= 32: 16x16/8x8 tile paging, batched over pages.
    """
    if size == 8:
        sparse = lloyd_quantize(comparison_v1(d), size=8)
        return quadratic_als(sparse, n=3, num_iters=als_iters_quadratic)
    dn_1 = resize_bicubic(d, size // 2)
    if size == 16:
        sparse = cross_scale_quantized(d, dn_1, 16, pallas)
        return alternating_least_squares(sparse, n=4,
                                         num_iters=als_iters_rect)
    # paged path: tiles go into the batch axis -> one batched ALS loop.
    # RMSE-selection groups are PER PAGE: the reference runs a separate
    # alternating_least_squares call per page (RDM_Net.py:392), each
    # pooling its rmse over the batch - pooling across pages would let one
    # page's record pick another page's iterate (measured 6e-3 fused-map
    # deviation on converted weights, tests/test_paged_parity.py).
    from md_rdm_tpu.ops.als import als_factorize_grouped
    dn_pages, dn1_pages = split_matrix(d, dn_1)      # (B,P,1,16,16)/(...,8,8)
    b, p = dn_pages.shape[:2]
    sparse = cross_scale_quantized(
        dn_pages.reshape(b * p, 1, 16, 16), dn1_pages.reshape(b * p, 1, 8, 8),
        size, pallas)
    page_ids = jnp.arange(b * p, dtype=jnp.int32) % p
    filled = als_factorize_grouped(sparse, 16, als_iters_rect,
                                   page_ids, p)
    return merge_pages(filled.reshape(b, p, 1, 16, 16), grid=size // 16)


class Decoder(nn.Module):
    """One decoder branch operating on NHWC encoder features.

    ``relative_tail=False`` returns the raw 1-channel NCHW map for relative
    decoders instead of running comparison+ALS inside - the model then runs
    a single *merged* grouped-ALS over all relative decoders
    (ops/als.py:als_factorize_grouped).
    """

    decoder_id: int
    ordinal_channels: int = 180
    als_iters_quadratic: int = 30
    als_iters_rect: int = 100
    relative_tail: bool = True
    soft_ordinal_decode: bool = False
    pallas_lloyd: str = "auto"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        did = self.decoder_id
        num_wsm = (did - 1) % 5
        x = DenseBlock(24, 8, 48, dtype=self.dtype,
                       name="dense_layer")(x, train=train)
        x = WSMCascade(num_wsm, dtype=self.dtype, name="wsm_block")(x)
        size = DECODER_SIZES[did]

        if did > 5:
            x = nn.Conv(1, (1, 1), dtype=self.dtype, name="conv1")(x)
            d = jnp.transpose(x, (0, 3, 1, 2)).astype(jnp.float32)  # NCHW
            if not self.relative_tail:
                return d
            return relative_map_from_features(
                d, size, self.als_iters_quadratic, self.als_iters_rect,
                pallas=self.pallas_lloyd)

        if did == 1:
            x = nn.Conv(self.ordinal_channels, (1, 1), dtype=self.dtype,
                        name="conv2")(x)
        # ids 2..5: no head conv (faithful; ord_num = planes/2)
        return dorn_decode(x, soft=self.soft_ordinal_decode)


def build_cross_scale_sparse(d: jnp.ndarray, size: int,
                             pallas: str = "auto"):
    """Quantized cross-scale sparse matrices for a relative decoder map.

    Returns (sparse (B*P, 256, 64), num_pages P) for size >= 16.
    """
    dn_1 = resize_bicubic(d, size // 2)
    if size == 16:
        return cross_scale_quantized(d, dn_1, 16, pallas), 1
    dn_pages, dn1_pages = split_matrix(d, dn_1)
    b, p = dn_pages.shape[:2]
    return cross_scale_quantized(
        dn_pages.reshape(b * p, 1, 16, 16),
        dn1_pages.reshape(b * p, 1, 8, 8), size, pallas), p
