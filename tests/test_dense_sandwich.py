"""Fused Pallas dense-sandwich kernel vs the plain flax formulation.

The kernel (kernels/dense_sandwich.py) must be a drop-in for DenseLayer's
conv1 -> norm2 -> relu -> conv2 at the encoder's spatial sizes: same
parameter tree (bitwise-identical init), same outputs, same gradients,
same running-statistics updates.  Reference semantics: torchvision
_DenseLayer (reference RDM_Net.py:515-534 via SURVEY §2.1).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from md_rdm_tpu.kernels.dense_sandwich import (_pallas_sandwich,
                                               conv_bn_stats,
                                               dense_sandwich,
                                               reference_sandwich)
from md_rdm_tpu.models.densenet import DenseLayer


def _inputs(b=2, s=15, c_in=96, c_mid=720, g=48, seed=0):
    rng = np.random.default_rng(seed)
    xr = jnp.asarray(rng.standard_normal((b, s, s, c_in)).clip(0),
                     jnp.float32)
    w1 = jnp.asarray(rng.standard_normal((1, 1, c_in, c_mid)) * 0.05,
                     jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((3, 3, c_mid, g)) * 0.05,
                     jnp.float32)
    scale = jnp.asarray(rng.standard_normal(c_mid) * 0.1 + 1.0, jnp.float32)
    shift = jnp.asarray(rng.standard_normal(c_mid) * 0.1, jnp.float32)
    return xr, w1, scale, shift, w2


@pytest.mark.parametrize("s,c_in", [(15, 96), (29, 192), (57, 336)])
def test_kernel_matches_reference(s, c_in):
    args = _inputs(b=2, s=s, c_in=c_in, c_mid=s * 48)
    want = reference_sandwich(*args)
    got = _pallas_sandwich(*args, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("s,c_in", [(15, 96), (29, 192), (57, 336)])
def test_nhwc_kernel_matches_reference(s, c_in):
    from md_rdm_tpu.kernels.dense_sandwich_nhwc import sandwich_nhwc
    args = _inputs(b=2, s=s, c_in=c_in, c_mid=s * 48)
    want = reference_sandwich(*args)
    got = sandwich_nhwc(*args, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_custom_vjp_grads_match_reference():
    args = _inputs()

    def loss(fn):
        return lambda *a: jnp.sum(jnp.sin(fn(*a)))

    g_fused = jax.grad(loss(lambda *a: dense_sandwich(*a, interpret=True)),
                       argnums=(0, 1, 2, 3, 4))(*args)
    g_ref = jax.grad(loss(reference_sandwich),
                     argnums=(0, 1, 2, 3, 4))(*args)
    for gf, gr in zip(g_fused, g_ref):
        scale = float(jnp.max(jnp.abs(gr))) + 1e-9
        np.testing.assert_allclose(np.asarray(gf) / scale,
                                   np.asarray(gr) / scale,
                                   rtol=5e-4, atol=5e-4)


@pytest.mark.parametrize("b,s,c_in", [(2, 15, 96), (2, 29, 192),
                                      (1, 57, 336)])
def test_pallas_backward_matches_reference(b, s, c_in):
    """The fully-fused Pallas backward (recompute + 5 MXU passes) must
    reproduce the XLA formulation's gradients for every operand.  S=57 is
    the shape production routes through the fused backward
    (_BWD_PROFITABLE), so it is covered at reduced batch (interpret mode
    is slow at full frame)."""
    args = _inputs(b=b, s=s, c_in=c_in, c_mid=s * 48, seed=1)

    def loss(fn):
        return lambda *a: jnp.sum(jnp.sin(fn(*a)))

    g_fused = jax.grad(
        loss(lambda *a: dense_sandwich(*a, interpret=True,
                                       pallas_bwd=True)),
        argnums=(0, 1, 2, 3, 4))(*args)
    g_ref = jax.grad(loss(reference_sandwich),
                     argnums=(0, 1, 2, 3, 4))(*args)
    for gf, gr in zip(g_fused, g_ref):
        assert gf.dtype == gr.dtype and gf.shape == gr.shape
        den = float(jnp.max(jnp.abs(gr))) + 1e-9
        np.testing.assert_allclose(np.asarray(gf) / den,
                                   np.asarray(gr) / den,
                                   rtol=5e-4, atol=5e-4)


@pytest.mark.parametrize("b,s,c_in", [(2, 15, 96), (2, 29, 192),
                                      (1, 57, 336)])
def test_nhwc_backward_matches_reference(b, s, c_in):
    """The NHWC-layout fused backward must reproduce the XLA
    formulation's gradients for every operand at every supported size."""
    args = _inputs(b=b, s=s, c_in=c_in, c_mid=s * 48, seed=1)

    def loss(fn):
        return lambda *a: jnp.sum(jnp.sin(fn(*a)))

    g_fused = jax.grad(
        loss(lambda *a: dense_sandwich(*a, interpret=True, pallas_bwd=True,
                                       layout="nhwc")),
        argnums=(0, 1, 2, 3, 4))(*args)
    g_ref = jax.grad(loss(reference_sandwich),
                     argnums=(0, 1, 2, 3, 4))(*args)
    for gf, gr in zip(g_fused, g_ref):
        assert gf.dtype == gr.dtype and gf.shape == gr.shape
        den = float(jnp.max(jnp.abs(gr))) + 1e-9
        np.testing.assert_allclose(np.asarray(gf) / den,
                                   np.asarray(gr) / den,
                                   rtol=5e-4, atol=5e-4)


def test_conv_bn_stats_exact_vs_f64():
    """The covariance-trick statistics must be at least as close to the
    f64 ground truth as flax's uncentered mean-of-squares formula."""
    xr, w1, _, _, _ = _inputs()
    z = jax.lax.conv_general_dilated(
        xr, w1, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC")).reshape(-1, w1.shape[-1])
    z64 = np.asarray(z, np.float64)
    mean64, var64 = z64.mean(0), z64.var(0)

    mean_flax = jnp.mean(z, 0)
    var_flax = jnp.mean(z * z, 0) - mean_flax * mean_flax
    mean, var = conv_bn_stats(xr, w1)

    np.testing.assert_allclose(np.asarray(mean), mean64, rtol=0, atol=1e-3)
    err_ours = np.max(np.abs(np.asarray(var) - var64) / (var64 + 1e-9))
    err_flax = np.max(np.abs(np.asarray(var_flax) - var64) / (var64 + 1e-9))
    assert err_ours <= max(err_flax * 1.5, 1e-5), (err_ours, err_flax)


def _layer_pair(train, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((2, 15, 15, 96)), jnp.float32)
    plain = DenseLayer(15, 48, fused="off")
    fused = DenseLayer(15, 48, fused="interpret")
    v = plain.init(jax.random.PRNGKey(3), x, train)
    v2 = fused.init(jax.random.PRNGKey(3), x, train)
    return plain, fused, v, v2, x


def test_full_model_init_structure_fused_invariant():
    """Whole-model init variable tree is identical across fused_dense
    modes (shape-level, via eval_shape - no execution).  The bench and
    driver entry points rely on this: they draw initial weights from the
    fused_dense="off" graph on the host CPU backend (no Pallas lowering)
    and apply them to the fused graph on the TPU (tools/true_bench.py,
    __graft_entry__.entry)."""
    from md_rdm_tpu.core.config import ModelConfig
    from md_rdm_tpu.models.rdm import DepthEstimationNet

    x = np.zeros((1, 226, 226, 3), np.float32)
    key = jax.random.PRNGKey(0)

    def shapes(mode):
        m = DepthEstimationNet(ModelConfig(decoder_ids=(1,),
                                           fused_dense=mode))
        return jax.eval_shape(lambda k, xx: m.init(k, xx, train=False),
                              key, x)

    s_off, s_int = shapes("off"), shapes("interpret")
    assert (jax.tree_util.tree_structure(s_off)
            == jax.tree_util.tree_structure(s_int))
    for a, b in zip(jax.tree_util.tree_leaves(s_off),
                    jax.tree_util.tree_leaves(s_int)):
        assert a.shape == b.shape and a.dtype == b.dtype


def test_fused_layer_param_tree_bitwise_identical():
    _, _, v, v2, _ = _layer_pair(train=False)
    flat1 = jax.tree_util.tree_flatten_with_path(v)[0]
    flat2 = jax.tree_util.tree_flatten_with_path(v2)[0]
    assert [k for k, _ in flat1] == [k for k, _ in flat2]
    for (k, a), (_, b) in zip(flat1, flat2):
        assert a.shape == b.shape and a.dtype == b.dtype, k
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=str(k))


def test_fused_layer_eval_matches_plain():
    plain, fused, v, _, x = _layer_pair(train=False)
    # make running stats non-trivial
    v = jax.tree_util.tree_map(lambda a: a, v)
    want = plain.apply(v, x, False)
    got = fused.apply(v, x, False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_fused_layer_train_output_stats_and_grads_match():
    plain, fused, v, _, x = _layer_pair(train=True)
    want, wvars = plain.apply(v, x, True, mutable=["batch_stats"])
    got, gvars = fused.apply(v, x, True, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=5e-3, atol=5e-3)
    for key in ("mean", "var"):
        a = np.asarray(wvars["batch_stats"]["norm2"][key])
        b = np.asarray(gvars["batch_stats"]["norm2"][key])
        np.testing.assert_allclose(b, a, rtol=5e-3, atol=5e-3)

    def loss(mod):
        def f(params):
            y, _ = mod.apply({"params": params,
                              "batch_stats": v["batch_stats"]},
                             x, True, mutable=["batch_stats"])
            return jnp.sum(jnp.abs(y))
        return f

    g1 = jax.grad(loss(plain))(v["params"])
    g2 = jax.grad(loss(fused))(v["params"])
    flat1 = jax.tree_util.tree_flatten_with_path(g1)[0]
    flat2 = jax.tree_util.tree_flatten_with_path(g2)[0]
    for (k, a), (_, b) in zip(flat1, flat2):
        den = float(jnp.max(jnp.abs(a))) + 1e-9
        np.testing.assert_allclose(np.asarray(b) / den, np.asarray(a) / den,
                                   rtol=2e-2, atol=2e-2, err_msg=str(k))
