"""DepthEstimationNet: encoder -> decoders -> fine-detail fusion.

Reference: RDM_Net.py:25-135.  The live path instantiates only decoder 1
(DORN 8x8); the authors' stated optimum adds relative decoders 6-9
(RDM_Net.py:96-97).  All ten decoder ids are supported via
``ModelConfig.decoder_ids``.

Forward (RDM_Net.py:70-135):
  encoder -> per-decoder maps -> DORN maps normalized by geometric mean and
  decomposed (n = log2(size)); relative maps decomposed with
  relative_map=True -> fine-detail slot matrices (log space) -> learned
  fusion weights -> list of per-slot weighted log maps.

Returns (yhat_components, ordinal_depth, ordinal_probs) where the ordinal
outputs come from decoder 1 (None when absent), matching the reference's
return signature.
"""
from __future__ import annotations

from typing import List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from md_rdm_tpu.core.config import DECODER_SIZES, ModelConfig, decomposition_depth
from md_rdm_tpu.models.decoder import Decoder, build_cross_scale_sparse
from md_rdm_tpu.models.densenet import Encoder, resolve_flat, resolve_fused
from md_rdm_tpu.ops.als import als_factorize_grouped
from md_rdm_tpu.ops.decompose import decompose_depth_map, fine_detail_matrices, make_pred
from md_rdm_tpu.ops.geometry import normalize_gm
from md_rdm_tpu.ops.paging import merge_pages


class Weights(nn.Module):
    """Learnable fusion weights, one vector per active fine-detail slot.

    Default init is |N(0,1)| per the reference (RDM_Net.py:449-456);
    zero-size slots simply have no parameter (the reference keeps empty
    frozen tensors).  ``init_mode`` gates the experimental alternatives
    documented at :class:`~md_rdm_tpu.core.config.ModelConfig.fusion_init`.
    """

    vector_sizes: Tuple[int, ...]
    init_mode: str = "abs_randn"

    def _init_fn(self):
        mode = self.init_mode

        def init(key, shape):
            w = jnp.abs(jax.random.normal(key, shape, jnp.float32))
            if mode == "normalized":
                return w / jnp.sum(w)
            if mode == "primary":
                return jnp.full(shape, 0.01, jnp.float32).at[0, 0].set(1.0)
            return w

        return init

    @nn.compact
    def __call__(self, matrices: List[jnp.ndarray]) -> List[jnp.ndarray]:
        names = ["d0", "f1", "f2", "f3", "f4", "f5", "f6", "f7"]
        weights = []
        for name, size in zip(names, self.vector_sizes):
            if size == 0:
                continue
            weights.append(self.param(name, self._init_fn(), (size, 1)))
        return make_pred(weights, matrices)


class DepthEstimationNet(nn.Module):
    """Full model; input NHWC float images (B, 226, 226, 3)."""

    config: ModelConfig = ModelConfig()

    @nn.compact
    def __call__(self, x, train: bool = False):
        cfg = self.config
        dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
        fused = resolve_fused(cfg.fused_dense)
        feats = Encoder(dtype=dtype, remat=cfg.remat, fused=fused,
                        growth=resolve_fused(cfg.growth_matmul),
                        flat=resolve_flat(cfg.flat_block, fused),
                        name="encoder")(x, train=train)
        if cfg.freeze_encoder:
            feats = jax.lax.stop_gradient(feats)

        # single grouped ALS across all cross-scale relative decoders
        # (>= 16px) cuts the sequential iteration chains to one
        merge_rect = len([d for d in cfg.relative_ids
                          if DECODER_SIZES[d] >= 16]) > 1

        rel_maps = {}
        rect_sparse, rect_groups, rect_meta = [], [], []
        num_groups = 0
        ord_depth: Optional[jnp.ndarray] = None
        ord_probs: Optional[jnp.ndarray] = None
        for did in cfg.decoder_ids:
            size = DECODER_SIZES[did]
            run_tail_inline = did <= 5 or size == 8 or not merge_rect
            out = Decoder(did, ordinal_channels=cfg.ordinal_channels,
                          als_iters_quadratic=cfg.als_iters_quadratic,
                          als_iters_rect=cfg.als_iters_rect,
                          relative_tail=run_tail_inline,
                          soft_ordinal_decode=cfg.soft_ordinal_decode,
                          pallas_lloyd=cfg.pallas_lloyd,
                          dtype=dtype, name=f"d_{did}")(feats, train=train)
            if did <= 5:
                depth, probs = out
                if ord_depth is None:          # decoder 1 feeds the ord loss
                    ord_depth, ord_probs = depth, probs
                rel_maps[did] = normalize_gm(depth)
            elif run_tail_inline:
                rel_maps[did] = out
            else:
                sparse, pages = build_cross_scale_sparse(
                    out, size, pallas=cfg.pallas_lloyd)
                rect_sparse.append(sparse)
                # RMSE-selection group PER (decoder, page): the reference
                # runs one ALS call per page, pooling rmse over the batch
                # only (RDM_Net.py:392) - see relative_map_from_features
                rect_groups.append(
                    num_groups + jnp.arange(sparse.shape[0],
                                            dtype=jnp.int32) % pages)
                num_groups += pages
                rect_meta.append((did, out.shape[0], pages, size))

        if rect_meta:
            filled = als_factorize_grouped(
                jnp.concatenate(rect_sparse, axis=0), 16,
                cfg.als_iters_rect, jnp.concatenate(rect_groups),
                num_groups)
            offset = 0
            for did, b, pages, size in rect_meta:
                cnt = b * pages
                tiles = filled[offset:offset + cnt]
                offset += cnt
                if pages == 1:
                    rel_maps[did] = tiles
                else:
                    rel_maps[did] = merge_pages(
                        tiles.reshape(b, pages, 1, 16, 16),
                        grid=size // 16)

        rows = []
        for did in cfg.decoder_ids:
            n = decomposition_depth(did)
            m = rel_maps[did]
            if cfg.fusion_eps and did > 5:
                # ALS-filled relative maps carry no positivity guarantee
                m = jnp.clip(m, cfg.fusion_eps, 1.0 / cfg.fusion_eps)
            rows.append(decompose_depth_map(
                m, n, relative_map=did > 5, eps=cfg.fusion_eps))

        mats = fine_detail_matrices(rows, eps=cfg.fusion_eps)
        yhat = Weights(cfg.vector_sizes, init_mode=cfg.fusion_init,
                       name="weight_layer")(mats)
        return yhat, ord_depth, ord_probs
