"""Converted-weights stage parity for the PAGED relative path (VERDICT r4
next #3): decoder d8 = 2-stage WSM cascade + 32x32 map -> split into
16x16/8x8 pages -> per-page cross-scale comparison + 32-table Lloyd
quantization + rect ALS -> reconstruct (reference RDM_Net.py:383-396,
computations.py:201-238).

Builds the torch replica of d1 + d8 (tools/torch_replica.TorchRDMPaged,
reference naming; tail through the reference's own computations.py as
oracle), converts the state_dict, and asserts per-stage parity including
the reference's row-duplicating ``reconstruct`` (faithful mode) and the
fixed grid reassembly the shipped model uses.

ALS tie handling as in test_relative_parity (PARITY.md round 3): the
reference picks the FIRST iterate attaining min(rmse); plateaued records
tie at exact f32 equality, so any rmse-tied iterate is accepted per page.
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
    TorchRDMPaged,
    import_reference_computations,
    randomize_batchnorm,
)

from test_relative_parity import _als_parity, _quantized_parity, _rel_err

from md_rdm_tpu.core.config import ModelConfig
from md_rdm_tpu.models.decoder import Decoder
from md_rdm_tpu.models.densenet import Encoder
from md_rdm_tpu.models.rdm import DepthEstimationNet
from md_rdm_tpu.ops.als import alternating_least_squares
from md_rdm_tpu.ops.comparison import comparison_cross_scale
from md_rdm_tpu.ops.paging import merge_pages, split_matrix
from md_rdm_tpu.ops.quantize import lloyd_quantize
from md_rdm_tpu.ops.resize import resize_bicubic

cp = import_reference_computations()
pytestmark = pytest.mark.skipif(cp is None,
                                reason="reference computations.py not found")


@pytest.fixture(scope="module")
def paged_setup():
    torch.manual_seed(21)
    replica = TorchRDMPaged().eval()
    randomize_batchnorm(replica, seed=21)
    params, stats = convert_state_dict(replica.state_dict())
    variables = {"params": params, "batch_stats": stats}
    x_t = torch.rand(1, 3, 226, 226,
                     generator=torch.Generator().manual_seed(23))
    with torch.no_grad():
        want = replica(x_t, cp=cp)
    x_j = jnp.asarray(x_t.numpy().transpose(0, 2, 3, 1))
    return variables, x_j, want, replica


def test_tree_structure_matches(paged_setup):
    variables, x_j, _, _ = paged_setup
    model = DepthEstimationNet(ModelConfig(decoder_ids=(1, 8)))
    ref = model.init(jax.random.PRNGKey(0), x_j, train=False)
    ref_paths = {jax.tree_util.keystr(p)
                 for p, _ in jax.tree_util.tree_leaves_with_path(ref)}
    got_paths = {jax.tree_util.keystr(p)
                 for p, _ in jax.tree_util.tree_leaves_with_path(variables)}
    assert got_paths == ref_paths


def test_paged_branch_stage_parity(paged_setup):
    variables, x_j, want, replica = paged_setup
    errs = {}

    feats = Encoder().apply(
        {"params": variables["params"]["encoder"],
         "batch_stats": variables["batch_stats"]["encoder"]},
        x_j, train=False)
    errs["encoder"] = _rel_err(
        np.asarray(feats).transpose(0, 3, 1, 2), want["encoder"].numpy())

    # --------------------------------------------- d8 feature (WSM x2) ---
    d8 = Decoder(8, relative_tail=False).apply(
        {"params": variables["params"]["d_8"],
         "batch_stats": variables["batch_stats"]["d_8"]}, feats)
    errs["d8.feat(wsm2)"] = _rel_err(d8, want["d8"]["feat"].numpy())
    dn_1 = resize_bicubic(d8, 16)
    errs["d8.dn_1"] = _rel_err(dn_1, want["d8"]["dn_1"].numpy())

    # ------------------------------------------------------ page split ---
    dn_pages, dn1_pages = split_matrix(d8, dn_1)    # (B,4,1,16,16)/(..8,8)
    assert dn_pages.shape[1] == 4 == len(want["d8"]["pages"])
    for j in range(4):
        errs[f"page{j}.split"] = _rel_err(
            dn_pages[:, j], want["d8"]["pages"][j].numpy())
        errs[f"page{j}.split_1"] = _rel_err(
            dn1_pages[:, j], want["d8"]["pages_1"][j].numpy())

    # ------------------------------- per-page comparison/quantize/ALS ---
    q32 = np.asarray(replica.d_8.quant.tables(32)[0][:, 0], np.float64)
    als_e2e_pages = []
    for j in range(4):
        ratio = comparison_cross_scale(dn_pages[:, j], dn1_pages[:, j])
        ratio_want = want["d8"]["comparison"][j].numpy()
        errs[f"page{j}.comparison"] = _rel_err(ratio, ratio_want)
        sparse = lloyd_quantize(ratio, size=32)
        _quantized_parity(sparse, want["d8"]["quantized"][j],
                          ratio_want.astype(np.float64), q32,
                          errs, f"page{j}.quantized(flipfrac)")
        als = alternating_least_squares(
            jnp.asarray(want["d8"]["quantized"][j].numpy()),
            n=4, num_iters=100)
        _als_parity(als, want["d8"]["quantized"][j], 100, 16,
                    errs, f"page{j}.als(same-sparse)")
        als_e2e = alternating_least_squares(sparse, n=4, num_iters=100)
        _als_parity(als_e2e, want["d8"]["quantized"][j], 100, 16,
                    errs, f"page{j}.als(end-to-end)")
        als_e2e_pages.append(als_e2e)

    # -------------------------------------------------- reconstruction ---
    # faithful mode reproduces the reference's row-duplicating reconstruct
    # byte-for-byte on the SAME pages (computations.py:228-232)
    oracle_pages = jnp.stack(
        [jnp.asarray(p.numpy()) for p in want["d8"]["als_pages"]], axis=1)
    faithful = merge_pages(oracle_pages, grid=2, faithful=True)
    errs["reconstruct(faithful)"] = _rel_err(faithful,
                                             want["d8"]["als"].numpy())
    np.testing.assert_array_equal(np.asarray(faithful),
                                  want["d8"]["als"].numpy())
    # fixed mode: true grid reassembly of the same pages
    fixed = np.asarray(merge_pages(oracle_pages, grid=2))
    for j, (r0, c0) in enumerate([(0, 0), (0, 16), (16, 0), (16, 16)]):
        np.testing.assert_array_equal(
            fixed[:, :, r0:r0 + 16, c0:c0 + 16],
            want["d8"]["als_pages"][j].numpy())

    # ------------------------------------------------------------ fused ---
    # ALS tie flips legally change which iterate feeds the fusion, so the
    # oracle fusion tail is FED WITH OUR selected maps (as the d6/d7 test
    # does): decompose -> log matrices -> weighted pred -> recombination
    # with converted weights, on the paged decoder set (1, 8).
    model = DepthEstimationNet(ModelConfig(decoder_ids=(1, 8)))
    yhat, ord_depth, ord_probs = model.apply(variables, x_j, train=False)
    errs["probs"] = _rel_err(ord_probs, want["probs"].numpy())
    dec_got = np.asarray(ord_depth)
    near_thresh = np.any(np.abs(want["probs"].numpy() - 0.5) < 1e-5,
                         axis=1, keepdims=True)
    exact = (dec_got == want["decode"].numpy()) | near_thresh
    assert exact.all(), f"decode mismatch at {np.argwhere(~exact)[:5]}"

    map8 = merge_pages(
        jnp.stack([jnp.asarray(a) for a in als_e2e_pages], axis=1), grid=2)
    decode_t = torch.from_numpy(dec_got).float()
    b, _, h, w = decode_t.shape
    gm = cp.quick_gm(decode_t.view(b, h * w, 1), h)
    normed = decode_t / gm.expand(b, h * w).view(b, 1, h, w)
    with torch.no_grad():
        f_d1 = cp.decompose_depth_map([], normed, 3)[::-1]
        f_d8 = cp.decompose_depth_map(
            [], torch.from_numpy(np.asarray(map8)), 5,
            relative_map=True)[::-1]
        mats = cp.relative_fine_detail_matrix([f_d1, f_d8], False)
        yhat_t = cp.make_pred(replica.weight_layer.weight_list, mats,
                              False, False)
        final_t = cp.recombination(list(yhat_t), 7)
    for i, (got, want_y) in enumerate(zip(yhat, yhat_t)):
        errs[f"yhat[{i}]"] = _rel_err(got, want_y.detach().numpy())
    from md_rdm_tpu.ops.decompose import recombination
    final = recombination(list(yhat))
    errs["final"] = _rel_err(final, final_t.detach().numpy())
    # yhat[0] = w * log(D0) with D0 ~ 1 after gm-normalization: value ~ 0,
    # relative error ill-posed; bound absolutely
    abs0 = float(np.max(np.abs(np.asarray(yhat[0], np.float64)
                               - want["yhat"][0].numpy())))
    errs["yhat[0]"] = min(errs["yhat[0]"], abs0)

    print("PAGED PARITY:", {k: f"{v:.2e}" for k, v in errs.items()})
    for k, v in errs.items():
        assert v < 1e-3, (k, v, errs)
