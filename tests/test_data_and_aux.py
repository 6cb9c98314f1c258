"""Tests: data pipeline, transforms, on-device augmentation, metrics
definitions, losses vs reference, viz, Pallas kernel (interpret mode)."""
import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

import tests.conftest as cf

ref_loss = pytest.importorskip("loss")         # reference loss.py (pure torch)
import criteria as ref_criteria                # reference criteria.py

from md_rdm_tpu import losses, metrics
from md_rdm_tpu.data import transforms as T
from md_rdm_tpu.data.base import ConcatDataset, DataLoader
from md_rdm_tpu.data.synthetic import SyntheticDepthDataset


# ---------------------------------------------------------------- losses ---

def test_ordinal_loss_matches_reference():
    torch.manual_seed(0)
    probs = torch.rand(2, 90, 8, 8)
    target = torch.randint(0, 90, (2, 1, 8, 8))
    want = float(ref_loss.Ordinal_Loss().calc(probs, target, cuda=False))
    got = float(losses.ordinal_loss(
        jnp.asarray(probs.numpy()), jnp.asarray(target.numpy())))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_masked_losses_match_reference():
    torch.manual_seed(1)
    pred = torch.rand(2, 1, 16, 16)
    target = torch.rand(2, 1, 16, 16)
    target[0, 0, :4] = 0.0
    pj, tj = jnp.asarray(pred.numpy()), jnp.asarray(target.numpy())
    np.testing.assert_allclose(
        float(losses.masked_mse_loss(pj, tj)),
        float(ref_criteria.MaskedMSELoss()(pred, target)), rtol=1e-5)
    np.testing.assert_allclose(
        float(losses.masked_l1_loss(pj, tj)),
        float(ref_criteria.MaskedL1Loss()(pred, target)), rtol=1e-5)
    np.testing.assert_allclose(
        float(losses.berhu_loss(pj, tj)),
        float(ref_criteria.berHuLoss()(pred, target)), rtol=1e-5)


def test_rmse_loss():
    a, b = np.random.rand(4, 4), np.random.rand(4, 4)
    np.testing.assert_allclose(
        float(losses.rmse_loss(jnp.asarray(a), jnp.asarray(b))),
        np.sqrt(np.mean((a - b) ** 2)), rtol=1e-6)


# --------------------------------------------------------------- metrics ---

def test_metric_definitions_match_reference_formulas():
    rng = np.random.default_rng(0)
    pred = rng.uniform(0.5, 5.0, (1, 1, 16, 16)).astype(np.float32)
    target = rng.uniform(0.5, 5.0, (1, 1, 16, 16)).astype(np.float32)
    out = {k: float(v) for k, v in metrics.compute_metrics(
        jnp.asarray(pred), jnp.asarray(target),
        ("delta1", "delta2", "mse", "mae", "log10", "absrel", "sqrel",
         "rmse")).items()}
    p, t = pred.ravel(), target.ravel()
    ratio = np.maximum(p / t, t / p)
    np.testing.assert_allclose(out["delta1"], (ratio < 1.25).mean(), rtol=1e-6)
    np.testing.assert_allclose(out["delta2"], (ratio < 1.25 ** 2).mean(),
                               rtol=1e-6)
    np.testing.assert_allclose(out["mse"], ((p - t) ** 2).mean(), rtol=1e-6)
    np.testing.assert_allclose(out["mae"], np.abs(p - t).mean(), rtol=1e-6)
    np.testing.assert_allclose(
        out["log10"], np.abs(np.log10(p) - np.log10(t)).mean(), rtol=1e-5)
    np.testing.assert_allclose(out["absrel"], (np.abs(p - t) / t).mean(),
                               rtol=1e-6)
    np.testing.assert_allclose(out["sqrel"], ((p - t) ** 2 / t).mean(),
                               rtol=1e-6)
    # the reference's nonstandard rmse (metrics.py:113-116)
    np.testing.assert_allclose(
        out["rmse"], np.sqrt((p - t) ** 2 / t).mean(), rtol=1e-6)


def test_metrics_mask_and_clamp():
    pred = jnp.asarray([[0.0, 2.0]])      # clamped to 1e-7
    target = jnp.asarray([[0.0, 2.0]])    # first pixel invalid
    out = metrics.compute_metrics(pred, target, ("mae",))
    np.testing.assert_allclose(float(out["mae"]), 0.0, atol=1e-6)


# ------------------------------------------------------------ transforms ---

def test_resize_scalar_is_scale_factor():
    img = np.random.randint(0, 255, (100, 60, 3), np.uint8)
    out = T.Resize(0.5)(img)
    assert out.shape[:2] == (50, 30)


def test_center_crop_and_crop():
    img = np.arange(100, dtype=np.uint8).reshape(10, 10)
    c = T.CenterCrop(4)(img)
    assert c.shape == (4, 4) and c[0, 0] == 33
    w = T.Crop(2, 3, 4, 5)(img)
    assert w.shape == (4, 5) and w[0, 0] == 23


def test_rotate_nearest_identity_at_zero():
    img = np.random.rand(16, 16).astype(np.float32)
    np.testing.assert_allclose(T.Rotate(0.0)(img), img)


def test_horizontal_flip():
    img = np.arange(6, dtype=np.float32).reshape(2, 3)
    np.testing.assert_allclose(T.HorizontalFlip(True)(img),
                               img[:, ::-1])
    np.testing.assert_allclose(T.HorizontalFlip(False)(img), img)


def test_color_jitter_runs_and_preserves_shape():
    img = np.random.randint(0, 255, (32, 32, 3), np.uint8)
    out = T.ColorJitter(0.4, 0.4, 0.4,
                        rng=np.random.default_rng(0))(img)
    assert out.shape == img.shape


# ------------------------------------------------------------------ data ---

def test_dataloader_batching_and_shapes():
    ds = SyntheticDepthDataset("train", size=10, output_size=(64, 64))
    dl = DataLoader(ds, batch_size=4, shuffle=True, drop_last=True, seed=0)
    batches = list(dl)
    assert len(batches) == 2
    x, y = batches[0]
    assert x.shape == (4, 64, 64, 3) and x.dtype == np.float32
    assert y.shape == (4, 1, 64, 64)
    assert y.min() > 0


def test_dataloader_threaded_matches_sync():
    ds = SyntheticDepthDataset("val", size=6, output_size=(32, 32))
    sync = list(DataLoader(ds, 2, shuffle=False))
    thr = list(DataLoader(ds, 2, shuffle=False, num_workers=2))
    for (xa, ya), (xb, yb) in zip(sync, thr):
        np.testing.assert_allclose(xa, xb)
        np.testing.assert_allclose(ya, yb)


def test_concat_dataset_covers_all():
    a = SyntheticDepthDataset("val", size=3, output_size=(16, 16), seed=0)
    b = SyntheticDepthDataset("val", size=5, output_size=(16, 16), seed=9)
    c = ConcatDataset([a, b], seed=0)
    assert len(c) == 8
    got = [c[i][1].sum() for i in range(8)]
    want = [a[i][1].sum() for i in range(3)] + [b[i][1].sum()
                                               for i in range(5)]
    np.testing.assert_allclose(sorted(got), sorted(want), rtol=1e-6)


# ------------------------------------------------------------- augment ----

def test_device_augmentation_shapes_and_ranges():
    from md_rdm_tpu.data.augment import augment_batch
    rng = np.random.default_rng(0)
    rgb = jnp.asarray(rng.random((2, 240, 320, 3)), jnp.float32)
    depth = jnp.asarray(rng.uniform(1, 9, (2, 1, 240, 320)), jnp.float32)
    x, y = augment_batch(jax.random.PRNGKey(0), rgb, depth,
                         out_hw=(226, 226))
    assert x.shape == (2, 226, 226, 3)
    assert y.shape == (2, 1, 226, 226)
    assert float(x.min()) >= 0.0 and float(x.max()) <= 1.0
    assert np.isfinite(np.asarray(y)).all()
    # depth is divided by s in [1, 1.5]: values can only shrink
    assert float(y.max()) <= 9.0 + 1e-3


def test_device_augmentation_flip_determinism():
    from md_rdm_tpu.data.augment import augment_batch
    rgb = jnp.asarray(np.random.rand(1, 226, 226, 3), jnp.float32)
    depth = jnp.asarray(np.random.rand(1, 1, 226, 226) + 1, jnp.float32)
    a = augment_batch(jax.random.PRNGKey(7), rgb, depth)
    b = augment_batch(jax.random.PRNGKey(7), rgb, depth)
    np.testing.assert_allclose(np.asarray(a[0]), np.asarray(b[0]))


# ----------------------------------------------------------------- viz ----

def test_viz_grid_composition(tmp_path):
    from md_rdm_tpu.utils import viz
    rgb = np.random.rand(8, 8, 3)
    t = np.random.rand(8, 8)
    p = np.random.rand(8, 8)
    row = viz.merge_into_row(rgb, t, p)
    assert row.shape == (8, 24, 3)
    grid = viz.add_row(row, row)
    assert grid.shape == (16, 24, 3)
    out = tmp_path / "grid.png"
    viz.save_image(grid, str(out))
    assert out.exists()


# --------------------------------------------------------------- pallas ---

def test_fused_comparison_quantize_interpret():
    from md_rdm_tpu.kernels.lloyd import fused_comparison_quantize
    from md_rdm_tpu.ops.comparison import comparison_cross_scale
    from md_rdm_tpu.ops.quantize import lloyd_quantize

    rng = np.random.default_rng(0)
    dn = jnp.asarray(rng.uniform(0.5, 2.0, (2, 1, 16, 16)), jnp.float32)
    dn1 = jnp.asarray(rng.uniform(0.5, 2.0, (2, 1, 8, 8)), jnp.float32)
    want = np.asarray(lloyd_quantize(comparison_cross_scale(dn, dn1), 16))
    got = np.asarray(fused_comparison_quantize(dn, dn1, 16))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_fused_comparison_quantize_grad_is_zero():
    """jax.grad must pass THROUGH the Pallas kernel with zero gradient
    (quantization emits constants - reference RDM_Net.py:296-310); without
    the custom_jvp this raised NotImplementedError for 'reciprocal' inside
    the optimal-set train step."""
    from md_rdm_tpu.kernels.lloyd import fused_comparison_quantize

    rng = np.random.default_rng(1)
    dn = jnp.asarray(rng.uniform(0.5, 2.0, (1, 1, 16, 16)), jnp.float32)
    dn1 = jnp.asarray(rng.uniform(0.5, 2.0, (1, 1, 8, 8)), jnp.float32)

    def loss(dn, dn1):
        return jnp.sum(fused_comparison_quantize(dn, dn1, 16) ** 2)

    g_dn, g_dn1 = jax.jit(jax.grad(loss, argnums=(0, 1)))(dn, dn1)
    assert float(jnp.abs(g_dn).max()) == 0.0
    assert float(jnp.abs(g_dn1).max()) == 0.0
