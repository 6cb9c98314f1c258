"""Converted-weights stage parity for the RELATIVE decoder branch
(VERDICT r2 next-round #5).

Builds the torch replica of d1 + d6 + d7 (tools/torch_replica.TorchRDMRel,
reference naming; fusion tail + ALS run through the reference's own
computations.py as oracle), converts the state_dict, and asserts per-stage
parity through the Ordinal_Layer relative branch (RDM_Net.py:244-311,
359-387):

  d6: 1-ch feature map -> full outer comparison matrix -> Lloyd-quantized
      matrix -> quadratic ALS output (8x8)
  d7: feature map (through WSM_1) -> bicubic-halved map -> cross-scale
      comparison (literal-loop oracle) -> Lloyd quantized -> rect ALS (16x16)
  fused: weighted yhat components + final recombined 128x128 map

Quantized matrices are bin indices: they must match EXACTLY except where a
ratio sits within float tolerance of a quantizer threshold (the same
near-threshold carve-out the DORN decode parity uses).
"""
import sys
from pathlib import Path

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
from convert_torch_checkpoint import convert_state_dict
from torch_replica import (
    TorchRDMRel,
    import_reference_computations,
    randomize_batchnorm,
)

from md_rdm_tpu.core.config import ModelConfig
from md_rdm_tpu.models.decoder import Decoder
from md_rdm_tpu.models.densenet import Encoder
from md_rdm_tpu.models.rdm import DepthEstimationNet
from md_rdm_tpu.ops.als import alternating_least_squares, quadratic_als
from md_rdm_tpu.ops.comparison import comparison_cross_scale, comparison_v1
from md_rdm_tpu.ops.quantize import lloyd_quantize
from md_rdm_tpu.ops.resize import resize_bicubic

cp = import_reference_computations()
pytestmark = pytest.mark.skipif(cp is None,
                                reason="reference computations.py not found")


def _rel_err(got, want):
    got = np.asarray(got, np.float64)
    want = np.asarray(want, np.float64)
    return float(np.linalg.norm(got - want) /
                 max(np.linalg.norm(want), 1e-12))


@pytest.fixture(scope="module")
def rel_setup():
    torch.manual_seed(11)
    replica = TorchRDMRel().eval()
    randomize_batchnorm(replica, seed=11)
    params, stats = convert_state_dict(replica.state_dict())
    variables = {"params": params, "batch_stats": stats}
    x_t = torch.rand(1, 3, 226, 226,
                     generator=torch.Generator().manual_seed(13))
    with torch.no_grad():
        want = replica(x_t, cp=cp)
    x_j = jnp.asarray(x_t.numpy().transpose(0, 2, 3, 1))
    return variables, x_j, want, replica


def test_tree_structure_matches(rel_setup):
    variables, x_j, _, _ = rel_setup
    model = DepthEstimationNet(ModelConfig(decoder_ids=(1, 6, 7)))
    ref = model.init(jax.random.PRNGKey(0), x_j, train=False)
    ref_paths = {jax.tree_util.keystr(p)
                 for p, _ in jax.tree_util.tree_leaves_with_path(ref)}
    got_paths = {jax.tree_util.keystr(p)
                 for p, _ in jax.tree_util.tree_leaves_with_path(variables)}
    assert got_paths == ref_paths


def _als_candidates(sparse_t, iters, out_size):
    """Torch-oracle per-iterate normalized outputs + the RMSE record
    (computations.py:95-155 loop, unrolled).  The reference selects the
    FIRST index attaining min(record); when the record plateaus, several
    consecutive entries tie at exact f32 equality and the selection becomes
    ill-conditioned - any reimplementation with different f32 reduction
    order may pick a different (equally optimal) iterate."""
    B, H, W = sparse_t.shape
    p = torch.ones((B, H, 1))
    q = torch.ones((B, W, 1))
    rec = [cp.rmse(torch.matmul(p, q.view(B, 1, W)), sparse_t).item()]
    outs = []
    for _ in range(iters):
        p = cp.als_step(sparse_t, q, cuda=False)
        rec.append(cp.rmse(torch.matmul(p, q.view(B, 1, W)), sparse_t).item())
        pn = torch.div(p, cp.quick_gm(p, H).expand(B, H).view(B, H, 1))
        outs.append(pn.view(B, 1, out_size, out_size).numpy())
        q = cp.als_step(sparse_t.view(B, W, H), p, cuda=False)
    return outs, np.asarray(rec[1:])   # rec[i] scores outs[i]


def _als_parity(got, sparse_want, iters, out_size, errs, key,
                tie_tol=1e-6):
    """Assert ``got`` matches ONE of the rmse-tied optimal torch iterates.

    On plateaued records (e.g. the d7 converted-weights map: iterations
    4-6 tie at 0.379585922 exactly) the reference's first-min choice and
    ours may legally differ; every tied iterate is an equally faithful
    output.  Quality is additionally bounded: the matched candidate's
    oracle RMSE must be within tie_tol of the oracle's own minimum."""
    sparse_t = (sparse_want if isinstance(sparse_want, torch.Tensor)
                else torch.from_numpy(np.asarray(sparse_want))).float()
    outs, rec = _als_candidates(sparse_t, iters, out_size)
    tied = np.flatnonzero(rec <= rec.min() + tie_tol)
    rels = [_rel_err(got, outs[i]) for i in tied]
    best = int(np.argmin(rels))
    errs[key] = rels[best]
    print(f"  {key}: {len(tied)} rmse-tied iterates {list(tied + 1)}, "
          f"matched #{tied[best] + 1} at {rels[best]:.2e}")
    assert rels[best] < 1e-3, (key, rels, tied)


def _quantized_parity(got, want, ratio_want, q_table, errs, key):
    """Same-bin match away from quantizer thresholds.

    Reconstruction levels carry f32-vs-f64 rounding (the flax op
    accumulates level diffs in f32), so same-bin outputs agree to ~1e-6
    while adjacent bins differ by >= the level gap; a tight isclose
    separates the two.  Entries whose ratio sits within float tolerance of
    a threshold are excluded (bin choice is ill-conditioned there)."""
    got = np.asarray(got, np.float64)
    want = np.asarray(want.numpy() if hasattr(want, "numpy") else want,
                      np.float64)
    near = np.min(np.abs(ratio_want[..., None] - q_table[None, ...]),
                  axis=-1) < 1e-5
    ok = np.isclose(got, want, rtol=1e-5, atol=1e-5) | near
    errs[key] = float((~ok).mean())
    assert ok.all(), f"{key}: {np.argwhere(~ok)[:5]}"


def test_relative_branch_stage_parity(rel_setup):
    variables, x_j, want, replica = rel_setup
    errs = {}

    feats = Encoder().apply(
        {"params": variables["params"]["encoder"],
         "batch_stats": variables["batch_stats"]["encoder"]},
        x_j, train=False)
    errs["encoder"] = _rel_err(
        np.asarray(feats).transpose(0, 3, 1, 2), want["encoder"].numpy())

    q8 = np.asarray(replica.d_6.quant.tables(8)[0][:, 0], np.float64)
    q16 = np.asarray(replica.d_6.quant.tables(16)[0][:, 0], np.float64)

    # ---------------------------------------------------------------- d6 ---
    def sub(v, did):
        return {"params": v["params"][f"d_{did}"],
                "batch_stats": v["batch_stats"][f"d_{did}"]}

    d6 = Decoder(6, relative_tail=False).apply(sub(variables, 6), feats)
    errs["d6.feat"] = _rel_err(d6, want["d6"]["feat"].numpy())
    ratio6 = comparison_v1(d6)
    ratio6_want = want["d6"]["comparison"].numpy()
    errs["d6.comparison"] = _rel_err(ratio6, ratio6_want)
    sparse6 = lloyd_quantize(ratio6, size=8)
    _quantized_parity(sparse6, want["d6"]["quantized"],
                      ratio6_want.astype(np.float64), q8,
                      errs, "d6.quantized(flipfrac)")
    als6 = quadratic_als(jnp.asarray(want["d6"]["quantized"].numpy()),
                         n=3, num_iters=30)
    _als_parity(als6, want["d6"]["quantized"], 30, 8,
                errs, "d6.als(same-sparse)")
    als6_e2e = quadratic_als(sparse6, n=3, num_iters=30)
    _als_parity(als6_e2e, want["d6"]["quantized"], 30, 8,
                errs, "d6.als(end-to-end)")

    # ---------------------------------------------------------------- d7 ---
    d7 = Decoder(7, relative_tail=False).apply(sub(variables, 7), feats)
    errs["d7.feat"] = _rel_err(d7, want["d7"]["feat"].numpy())
    dn_1 = resize_bicubic(d7, 8)
    errs["d7.dn_1"] = _rel_err(dn_1, want["d7"]["dn_1"].numpy())
    ratio7 = comparison_cross_scale(d7, dn_1)
    ratio7_want = want["d7"]["comparison"].numpy()
    errs["d7.comparison"] = _rel_err(ratio7, ratio7_want)
    sparse7 = lloyd_quantize(ratio7, size=16)
    _quantized_parity(sparse7, want["d7"]["quantized"],
                      ratio7_want.astype(np.float64), q16,
                      errs, "d7.quantized(flipfrac)")
    als7 = alternating_least_squares(
        jnp.asarray(want["d7"]["quantized"].numpy()), n=4, num_iters=100)
    _als_parity(als7, want["d7"]["quantized"], 100, 16,
                errs, "d7.als(same-sparse)")
    als7_e2e = alternating_least_squares(sparse7, n=4, num_iters=100)
    _als_parity(als7_e2e, want["d7"]["quantized"], 100, 16,
                errs, "d7.als(end-to-end)")

    # ------------------------------------------------------------- fused ---
    # The ALS tie flip (see _als_parity) legally changes which iterate
    # feeds the fusion, so the reference-composed yhat/final are checked
    # against the oracle fusion tail FED WITH OUR selected ALS maps and
    # decode: this verifies decompose -> log-matrix -> weighted-pred ->
    # recombination end-to-end on the relative path with converted weights.
    model = DepthEstimationNet(ModelConfig(decoder_ids=(1, 6, 7)))
    yhat, ord_depth, ord_probs = model.apply(variables, x_j, train=False)
    errs["probs"] = _rel_err(ord_probs, want["probs"].numpy())
    dec_got = np.asarray(ord_depth)
    near_thresh = np.any(np.abs(want["probs"].numpy() - 0.5) < 1e-5,
                         axis=1, keepdims=True)
    exact = (dec_got == want["decode"].numpy()) | near_thresh
    assert exact.all(), f"decode mismatch at {np.argwhere(~exact)[:5]}"

    decode_t = torch.from_numpy(dec_got).float()
    b, _, h, w = decode_t.shape
    gm = cp.quick_gm(decode_t.view(b, h * w, 1), h)
    normed = decode_t / gm.expand(b, h * w).view(b, 1, h, w)
    with torch.no_grad():
        f_d1 = cp.decompose_depth_map([], normed, 3)[::-1]
        f_d6 = cp.decompose_depth_map(
            [], torch.from_numpy(np.asarray(als6_e2e)), 3,
            relative_map=True)[::-1]
        f_d7 = cp.decompose_depth_map(
            [], torch.from_numpy(np.asarray(als7_e2e)), 4,
            relative_map=True)[::-1]
        mats = cp.relative_fine_detail_matrix([f_d1, f_d6, f_d7], False)
        yhat_t = cp.make_pred(replica.weight_layer.weight_list, mats,
                              False, False)
        final_t = cp.recombination(list(yhat_t), 7)
    for i, (got, want_y) in enumerate(zip(yhat, yhat_t)):
        errs[f"yhat[{i}]"] = _rel_err(got, want_y.detach().numpy())
    from md_rdm_tpu.ops.decompose import recombination
    final = recombination(list(yhat))
    errs["final"] = _rel_err(final, final_t.detach().numpy())
    # yhat[0] = w * log(D0) with D0 ~ 1 after gm-normalization: value ~ 0,
    # relative error ill-posed; bound absolutely (as the d1 parity test does)
    abs0 = float(np.max(np.abs(np.asarray(yhat[0], np.float64)
                               - want["yhat"][0].numpy())))
    errs["yhat[0]"] = min(errs["yhat[0]"], abs0)

    print("RELATIVE PARITY:", {k: f"{v:.2e}" for k, v in errs.items()})
    for k, v in errs.items():
        assert v < 1e-3, (k, v, errs)
