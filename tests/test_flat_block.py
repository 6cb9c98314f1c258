"""Flat-layout dense block (DenseBlockFlat + dense_sandwich_flat) vs the
plain NHWC formulation.

The flat path must be a drop-in for the S=57 encoder block: identical
parameter tree (checkpoint interop), identical outputs, gradients, and
running-statistics updates - reference semantics are torchvision
_DenseBlock (RDM_Net.py:515-534 via SURVEY §2.1).  All kernels run
interpreted here (CPU).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from md_rdm_tpu.kernels.dense_sandwich import (LEAD, _geometry_flat,
                                               dense_sandwich_flat,
                                               flat_reference_sandwich)
from md_rdm_tpu.models.densenet import DenseBlock, DenseBlockFlat

pytestmark = pytest.mark.fast


def _to_flat(x):
    """NHWC -> lead-frame flat stack [B, C, ZT]."""
    b, s, _, c = x.shape
    f, _w, zt = _geometry_flat(s)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    return jnp.pad(xp.transpose(0, 3, 1, 2).reshape(b, c, f * f),
                   ((0, 0), (0, 0), (LEAD, zt - LEAD - f * f)))


def _inputs(b=2, s=15, c_in=40, c_mid=96, g=16, seed=0):
    rng = np.random.default_rng(seed)
    xr = jnp.asarray(rng.standard_normal((b, s, s, c_in)).clip(0),
                     jnp.float32)
    w1 = jnp.asarray(rng.standard_normal((1, 1, c_in, c_mid)) * 0.05,
                     jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((3, 3, c_mid, g)) * 0.05,
                     jnp.float32)
    scale = jnp.asarray(rng.standard_normal(c_mid) * 0.1 + 1.0, jnp.float32)
    shift = jnp.asarray(rng.standard_normal(c_mid) * 0.1, jnp.float32)
    return _to_flat(xr), w1, scale, shift, w2


def test_flat_kernel_matches_reference():
    args = _inputs()
    want = flat_reference_sandwich(*args, s=15)
    got = dense_sandwich_flat(*args, s=15, interpret=True,
                              pallas_bwd=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_flat_kernel_output_has_zero_borders():
    args = _inputs(seed=3)
    y = dense_sandwich_flat(*args, s=15, interpret=True, pallas_bwd=False)
    f, _w, zt = _geometry_flat(15)
    fr = np.asarray(y)[:, :, LEAD:LEAD + f * f].reshape(
        y.shape[0], y.shape[1], f, f)
    assert np.all(fr[:, :, 0, :] == 0) and np.all(fr[:, :, -1, :] == 0)
    assert np.all(fr[:, :, :, 0] == 0) and np.all(fr[:, :, :, -1] == 0)
    assert np.all(np.asarray(y)[:, :, :LEAD] == 0)
    assert np.all(np.asarray(y)[:, :, LEAD + f * f:] == 0)


def test_flat_backward_matches_reference_grads():
    args = _inputs(seed=1)

    def loss(fn, *a):
        return jnp.sum(jnp.abs(fn(*a)))

    got = jax.grad(lambda *a: loss(
        lambda *b: dense_sandwich_flat(*b, s=15, interpret=True,
                                       pallas_bwd=True), *a),
        argnums=tuple(range(5)))(*args)
    want = jax.grad(lambda *a: loss(
        lambda *b: flat_reference_sandwich(*b, s=15), *a),
        argnums=tuple(range(5)))(*args)
    # dxs: the reference path produces ZERO cotangent at border lanes
    # (slice discards them); the kernel does too (dz interior-masked)
    for gg, ww, name in zip(got, want,
                            ("dxs", "dw1", "dscale", "dshift", "dw2")):
        np.testing.assert_allclose(np.asarray(gg), np.asarray(ww),
                                   rtol=2e-4, atol=2e-4, err_msg=name)


def test_flat_backward_ignores_border_cotangents():
    """Border positions of the output are structural constants; garbage
    cotangent there must not reach any gradient."""
    args = _inputs(seed=2)
    f, _w, zt = _geometry_flat(15)

    y0 = dense_sandwich_flat(*args, s=15, interpret=True, pallas_bwd=True)
    _, vjp = jax.vjp(
        lambda *a: dense_sandwich_flat(*a, s=15, interpret=True,
                                       pallas_bwd=True), *args)
    g_clean = jnp.ones_like(y0)
    rng = np.random.default_rng(9)
    noise = jnp.asarray(rng.standard_normal(y0.shape) * 100, y0.dtype)
    # noise only OUTSIDE the interior: valid positions keep the clean g
    from md_rdm_tpu.kernels.dense_sandwich import _interior_mask
    mask = _interior_mask(15, zt)[None]
    g_dirty = jnp.where(mask, g_clean, noise)
    for a, b in zip(vjp(g_clean), vjp(g_dirty)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)


def _blocks(remat=False):
    plain = DenseBlock(3, 2, 16, fused="off", remat=remat)
    flat = DenseBlockFlat(3, 2, 16, remat=remat, interpret=True)
    return plain, flat


def test_block_param_tree_and_forward_match():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 15, 15, 24)), jnp.float32)
    plain, flat = _blocks()
    vp = plain.init(jax.random.PRNGKey(0), x, False)
    vf = flat.init(jax.random.PRNGKey(0), x, False)
    assert (jax.tree_util.tree_structure(vp)
            == jax.tree_util.tree_structure(vf))
    for a, b in zip(jax.tree_util.tree_leaves(vp),
                    jax.tree_util.tree_leaves(vf)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    yp = plain.apply(vp, x, False)
    yf = flat.apply(vf, x, False)
    assert yp.shape == yf.shape
    np.testing.assert_allclose(np.asarray(yf), np.asarray(yp),
                               rtol=5e-5, atol=5e-5)


def test_block_train_stats_match():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((2, 15, 15, 24)), jnp.float32)
    plain, flat = _blocks()
    vp = plain.init(jax.random.PRNGKey(0), x, True)
    yp, mp = plain.apply(vp, x, True, mutable=["batch_stats"])
    yf, mf = flat.apply(vp, x, True, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(yf), np.asarray(yp),
                               rtol=5e-5, atol=5e-5)
    fp = jax.tree_util.tree_leaves_with_path(mp["batch_stats"])
    ff = jax.tree_util.tree_leaves_with_path(mf["batch_stats"])
    for (pa, a), (pb, b) in zip(fp, ff):
        assert pa == pb
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-5, atol=5e-5,
                                   err_msg=str(pa))


@pytest.mark.parametrize("remat", [False, True])
def test_block_gradients_match(remat):
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((2, 15, 15, 24)), jnp.float32)
    plain, flat = _blocks(remat=remat)
    vp = plain.init(jax.random.PRNGKey(0), x, True)

    def loss(mod, params, x):
        y, _ = mod.apply({"params": params,
                          "batch_stats": vp["batch_stats"]}, x, True,
                         mutable=["batch_stats"])
        return jnp.sum(jnp.abs(y))

    gp = jax.grad(lambda p: loss(plain, p, x))(vp["params"])
    gf = jax.grad(lambda p: loss(flat, p, x))(vp["params"])
    for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_leaves_with_path(gp),
            jax.tree_util.tree_leaves_with_path(gf)):
        assert pa == pb
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=3e-4, atol=3e-4, err_msg=str(pa))


def test_encoder_routes_on_actual_shape():
    """Device-augment init traces the encoder at the raw pre-crop size
    (non-square spatial) - flat routing must fall back to the shape-
    generic path there and still produce the identical param tree
    (round-5 pipeline probe regression)."""
    from md_rdm_tpu.models.densenet import Encoder
    rng = np.random.default_rng(0)
    x_raw = jnp.asarray(rng.standard_normal((1, 250, 333, 3)), jnp.float32)
    x226 = jnp.asarray(rng.standard_normal((1, 226, 226, 3)), jnp.float32)
    enc = Encoder(fused="off", flat="interpret")
    v_raw = enc.init(jax.random.PRNGKey(0), x_raw, train=True)
    v_226 = enc.init(jax.random.PRNGKey(0), x226, train=True)
    assert (jax.tree_util.tree_structure(v_raw)
            == jax.tree_util.tree_structure(v_226))
    # params init'd at the raw shape must apply at 226 (the live path)
    y = enc.apply(v_raw, x226, train=False)
    assert y.shape == (1, 8, 8, 1056)
