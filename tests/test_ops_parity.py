"""Golden-value parity tests: md_rdm_tpu.ops vs the PyTorch reference.

The reference's pure-torch numerics module (network/computations.py) is
imported directly from the read-only mount and used as the oracle, per
SURVEY.md section 4 (the reference ships no tests; parity against recorded
activations is the strategy).
"""
import numpy as np
import pytest
import torch

import jax.numpy as jnp

import tests.conftest as cf

ref_cp = pytest.importorskip("network.computations")

from md_rdm_tpu import ops


def t2n(x):
    return x.detach().cpu().numpy()


@pytest.fixture(autouse=True)
def _seed():
    np.random.seed(0)
    torch.manual_seed(0)


# ---------------------------------------------------------------- resize ---

@pytest.mark.parametrize("in_size,out_size", [
    (128, 64), (64, 32), (16, 8), (8, 4), (4, 2), (2, 1),
    (128, 8), (240, 128), (8, 16),
])
def test_bicubic_resize_matches_torch(in_size, out_size):
    x = np.random.rand(2, 1, in_size, in_size).astype(np.float64) * 5 + 0.1
    want = t2n(ref_cp.resize(torch.from_numpy(x), out_size))
    got = np.asarray(ops.resize_bicubic(jnp.asarray(x, jnp.float32), out_size))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_bicubic_rectangular():
    x = np.random.rand(1, 3, 30, 40).astype(np.float64)
    want = t2n(torch.nn.functional.interpolate(
        torch.from_numpy(x), size=(228, 304), mode="bicubic",
        align_corners=False))
    got = np.asarray(ops.resize_bicubic(jnp.asarray(x, jnp.float32), (228, 304)))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_upsample_nearest_matches_torch():
    x = np.random.rand(2, 1, 8, 8)
    want = t2n(ref_cp.upsample(torch.from_numpy(x)))
    got = np.asarray(ops.upsample_nearest2(jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=1e-6)

    want3 = t2n(ref_cp.multi_upsample(torch.from_numpy(x), 3))
    got3 = np.asarray(ops.multi_upsample(jnp.asarray(x), 3))
    np.testing.assert_allclose(got3, want3, rtol=1e-6)


# -------------------------------------------------------------- geometry ---

def test_quick_gm_matches_reference():
    x = np.random.rand(3, 64, 1).astype(np.float32) + 0.05
    want = t2n(ref_cp.quick_gm(torch.from_numpy(x), 8))  # (B, 1)
    got = np.asarray(ops.quick_gm(jnp.asarray(x)))
    np.testing.assert_allclose(got, want.ravel(), rtol=1e-5)


def test_normalize_gm_matches_module_normalize():
    # module.py:145-150: batch / quick_gm(batch.view(B,H*W,1), H)
    x = np.random.rand(2, 1, 8, 8).astype(np.float32) + 0.1
    xt = torch.from_numpy(x)
    gm = ref_cp.quick_gm(xt.view(2, 64, 1), 8)
    want = t2n(torch.div(xt, gm.expand(2, 64).view(2, 1, 8, 8)))
    got = np.asarray(ops.normalize_gm(jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=1e-5)


# ------------------------------------------------------------- decompose ---

@pytest.mark.parametrize("n,relative", [(3, False), (3, True), (7, False)])
def test_decompose_depth_map(n, relative):
    size = 2 ** n
    x = np.random.rand(2, 1, size, size).astype(np.float64) + 0.2
    want = ref_cp.decompose_depth_map(
        [], torch.from_numpy(x), n, relative_map=relative)[::-1]
    got = ops.decompose_depth_map(jnp.asarray(x, jnp.float32), n,
                                  relative_map=relative)
    assert len(got) == len(want)
    for g, w in zip(got, want):
        np.testing.assert_allclose(
            np.asarray(g), t2n(w), rtol=2e-4, atol=2e-5)


def test_recombination_with_d0():
    comps_np = [np.random.rand(1, 1, 2 ** k, 2 ** k) + 0.5 for k in range(8)]
    want = t2n(ref_cp.recombination(
        [torch.from_numpy(c) for c in comps_np], n=7))
    got = np.asarray(ops.recombination(
        [jnp.asarray(c, jnp.float32) for c in comps_np], n=7))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_recombination_relative_only():
    comps_np = [np.random.rand(1, 1, 2 ** k, 2 ** k) + 0.5 for k in range(1, 8)]
    want = t2n(ref_cp.recombination(
        [torch.from_numpy(c) for c in comps_np], n=7))
    got = np.asarray(ops.recombination(
        [jnp.asarray(c, jnp.float32) for c in comps_np], n=7))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_fine_detail_matrix_and_make_pred():
    # one DORN row: [D0 1x1, F1 2x2, F2 4x4, F3 8x8] (live config)
    row = [np.random.rand(2, 1, 2 ** k, 2 ** k) + 0.3 for k in range(4)]
    want_mats = ref_cp.relative_fine_detail_matrix(
        [[torch.from_numpy(c) for c in row]], cuda=False)
    got_mats = ops.fine_detail_matrices(
        [[jnp.asarray(c, jnp.float32) for c in row]])
    assert len(got_mats) == len(want_mats)
    for g, w in zip(got_mats, want_mats):
        np.testing.assert_allclose(np.asarray(g), t2n(w), rtol=1e-5, atol=1e-6)

    weights = [np.abs(np.random.randn(1, 1)).astype(np.float32)
               for _ in range(4)]
    want_pred = ref_cp.make_pred(
        [torch.from_numpy(w) for w in weights],
        [m.clone() for m in want_mats], cuda=False, relative_only=False)
    got_pred = ops.make_pred([jnp.asarray(w) for w in weights], got_mats)
    for g, w in zip(got_pred, want_pred):
        np.testing.assert_allclose(np.asarray(g), t2n(w), rtol=1e-4, atol=1e-5)


def test_optimize_components_loss():
    yhat = [np.random.randn(2, 1, 2 ** k, 2 ** k).astype(np.float32)
            for k in range(4)]
    y = [np.random.randn(2, 1, 2 ** k, 2 ** k).astype(np.float32)
         for k in range(4)]
    _, want = ref_cp.optimize_components(
        [torch.from_numpy(a) for a in yhat],
        [torch.from_numpy(b) for b in y], cuda=False)
    _, got = ops.optimize_components(
        [jnp.asarray(a) for a in yhat], [jnp.asarray(b) for b in y])
    np.testing.assert_allclose(float(got), float(want), rtol=1e-5)


# ------------------------------------------------------------------- SID ---

def test_sid_roundtrip_matches_reference():
    from md_rdm_tpu.core.config import SIDConfig
    depth = np.random.rand(2, 1, 8, 8).astype(np.float32) * 9 + 0.1
    # utils.depth2label_sid with defaults K=90, alpha=0.02, beta=10
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "ref_utils_sid", cf.REFERENCE_DIR + "/utils.py")
    # utils.py imports matplotlib etc. - compute golden inline instead:
    alpha, beta, K = 0.02, 10.0, 90.0
    dt = torch.from_numpy(depth)
    want = torch.max(
        K * torch.log(dt / alpha) / torch.log(torch.tensor(beta / alpha)),
        torch.zeros_like(dt)).int()
    got = ops.depth_to_label(jnp.asarray(depth), SIDConfig(alpha, beta, K))
    np.testing.assert_array_equal(np.asarray(got), t2n(want).astype(np.float32))

    labels = np.arange(91, dtype=np.float32)
    want_d = np.exp(np.log(alpha) + np.log(beta / alpha) * labels / K)
    got_d = ops.label_to_depth(jnp.asarray(labels), SIDConfig(alpha, beta, K))
    np.testing.assert_allclose(np.asarray(got_d), want_d, rtol=1e-5)


# ------------------------------------------------------------ comparison ---

def test_comparison_v1_is_ratio_matrix():
    d = np.random.rand(2, 1, 8, 8).astype(np.float32) + 0.2
    got = np.asarray(ops.comparison_v1(jnp.asarray(d)))
    flat = d.reshape(2, 64)
    want = flat[:, :, None] / flat[:, None, :]
    np.testing.assert_allclose(got, want, rtol=1e-5)


class _RefOrdinalComparison:
    """Minimal reimplementation of the reference loop as an oracle.

    Mirrors RDM_Net.py:259-284 + computations.py:269-295 exactly (the real
    class needs torchvision which is unavailable); kept deliberately literal.
    """

    def sparse_comparison_id(self, dn, dn_1):
        B, C, H, W = dn.size()
        dn = dn.view(B, H, W)
        test = []
        for index_row in range(H):
            for index_col in range(W):
                r0 = int(min(max(np.floor(index_row / 2), 0), dn_1.shape[2] - 3))
                c0 = int(min(max(np.floor(index_col / 2), 0), dn_1.shape[3] - 3))
                area = torch.ones_like(dn_1)
                area[:, :, r0, c0:c0 + 3] = dn_1[:, :, r0, c0:c0 + 3]
                area[:, :, r0 + 1, c0:c0 + 3] = dn_1[:, :, r0 + 1, c0:c0 + 3]
                area[:, :, r0 + 2, c0:c0 + 3] = dn_1[:, :, r0 + 2, c0:c0 + 3]
                area = area.view(B, 1, dn_1.shape[2] * dn_1.shape[3])
                test.append(dn[:, index_row, index_col].view(B, 1, 1)
                            * torch.pow(area, -1))
        return torch.cat(test, 1)


def test_comparison_cross_scale_matches_loop_oracle():
    dn = torch.rand(2, 1, 16, 16) + 0.2
    dn_1 = torch.rand(2, 1, 8, 8) + 0.2
    want = t2n(_RefOrdinalComparison().sparse_comparison_id(dn, dn_1))
    got = np.asarray(ops.comparison_cross_scale(
        jnp.asarray(t2n(dn)), jnp.asarray(t2n(dn_1))))
    np.testing.assert_allclose(got, want, rtol=1e-5)


# -------------------------------------------------------------- quantize ---

def test_lloyd_quantize_matches_reference_tables():
    import scipy.io
    mat = scipy.io.loadmat(cf.REFERENCE_DIR + "/depth_ratio_016_016_quant.mat")
    q = mat["depth_ratio_016_016_quant"].ravel()
    inv = mat["depth_ratio_016_016_quant_inv"].ravel()
    ratios = np.random.rand(3, 50).astype(np.float32) * 3.0
    # reference loop semantics (RDM_Net.py:301-311)
    idx = (ratios[..., None] >= q[None, None, :]).sum(-1)
    want = inv[idx]
    got = np.asarray(ops.lloyd_quantize(jnp.asarray(ratios), size=16))
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_lloyd_quantize_8_table_from_sqrt_law():
    q16, inv16 = ops.quant_tables(16)
    q8, inv8 = ops.quant_tables(8)
    np.testing.assert_allclose(q8, q16 ** 2, rtol=1e-12)
    np.testing.assert_allclose(inv8, inv16 ** 2, rtol=1e-12)


# ------------------------------------------------------------------- ALS ---

@pytest.mark.parametrize("kind", ["quadratic", "rect"])
def test_als_matches_reference(kind):
    if kind == "quadratic":
        sparse = np.abs(np.random.randn(2, 64, 64)).astype(np.float32) + 0.1
        want = t2n(ref_cp.quadratic_als(
            torch.from_numpy(sparse.copy()), cuda=False, n=3, limit=30))
        got = np.asarray(ops.quadratic_als(jnp.asarray(sparse), n=3,
                                           num_iters=30))
    else:
        sparse = np.abs(np.random.randn(2, 256, 64)).astype(np.float32) + 0.1
        want = t2n(ref_cp.alternating_least_squares(
            torch.from_numpy(sparse.copy()), n=4, cuda=False, limit=100))
        got = np.asarray(ops.alternating_least_squares(
            jnp.asarray(sparse), n=4, num_iters=100))
    np.testing.assert_allclose(got, want, rtol=5e-3, atol=5e-4)


# ---------------------------------------------------------------- paging ---

def test_split_matrix_matches_reference():
    dn = torch.rand(2, 1, 32, 32)
    dn_1 = torch.rand(2, 1, 16, 16)
    want_first, want_second = ref_cp.split_matrix(dn, dn_1)
    got_first, got_second = ops.split_matrix(
        jnp.asarray(t2n(dn)), jnp.asarray(t2n(dn_1)))
    assert got_first.shape[1] == len(want_first)
    for i in range(len(want_first)):
        np.testing.assert_allclose(
            np.asarray(got_first[:, i]), t2n(want_first[i]), rtol=1e-6)
        np.testing.assert_allclose(
            np.asarray(got_second[:, i]), t2n(want_second[i]), rtol=1e-6)


def test_merge_pages_faithful_matches_reference_bug():
    pages = [torch.rand(2, 1, 16, 16) for _ in range(4)]
    want = t2n(ref_cp.reconstruct(list(pages)))
    stacked = jnp.asarray(np.stack([t2n(p) for p in pages], axis=1))
    got = np.asarray(ops.merge_pages(stacked, grid=2, faithful=True))
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_merge_pages_roundtrip():
    x = jnp.asarray(np.random.rand(2, 1, 64, 64).astype(np.float32))
    tiles = ops.split_into_tiles(x, 16)
    back = ops.merge_pages(tiles, grid=4, faithful=False)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x), rtol=1e-6)
