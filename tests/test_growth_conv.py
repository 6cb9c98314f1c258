"""Full-lane matmul growth conv (kernels/growth_conv.py) vs lax conv.

The formulation must be a drop-in for DenseLayer's 3x3 SAME growth conv
(torchvision _DenseLayer semantics, reference RDM_Net.py:515-534): same
outputs, same gradients, same parameter tree when routed in the model.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from md_rdm_tpu.kernels.growth_conv import (growth_conv_matmul,
                                            growth_routes)

pytestmark = pytest.mark.fast


def _conv_ref(z, w2):
    return jax.lax.conv_general_dilated(
        z, w2, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _inputs(b, s, c, g=48, seed=0):
    rng = np.random.default_rng(seed)
    z = jnp.asarray(rng.standard_normal((b, s, s, c)).clip(0), jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((3, 3, c, g)) * 0.05, jnp.float32)
    return z, w2


@pytest.mark.parametrize("s,c", [(8, 64), (15, 720), (29, 1392), (57, 96)])
def test_matches_lax_conv(s, c):
    z, w2 = _inputs(2, s, c)
    np.testing.assert_allclose(np.asarray(growth_conv_matmul(z, w2)),
                               np.asarray(_conv_ref(z, w2)),
                               rtol=2e-5, atol=2e-5)


def test_gradients_match():
    z, w2 = _inputs(2, 15, 240)

    def loss(fn, z, w2):
        return jnp.sum(jnp.abs(fn(z, w2)))

    gz_a, gw_a = jax.grad(lambda *a: loss(growth_conv_matmul, *a),
                          argnums=(0, 1))(z, w2)
    gz_b, gw_b = jax.grad(lambda *a: loss(_conv_ref, *a),
                          argnums=(0, 1))(z, w2)
    np.testing.assert_allclose(np.asarray(gz_a), np.asarray(gz_b),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(gw_a), np.asarray(gw_b),
                               rtol=2e-4, atol=2e-4)


def test_bfloat16_close():
    z, w2 = _inputs(1, 29, 192)
    got = growth_conv_matmul(z.astype(jnp.bfloat16), w2.astype(jnp.bfloat16))
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(got, dtype=np.float32),
                               np.asarray(_conv_ref(z, w2)),
                               rtol=0.05, atol=0.05)


def test_routing_table():
    # measured NEGATIVE at every size (round 5, results/round5/perf):
    # "on" routes nothing; "on_all" still forces all (bench/test mode)
    assert not growth_routes(29, True, "on")
    assert not growth_routes(15, False, "on")
    assert not growth_routes(57, True, "on")
    assert growth_routes(8, True, "on_all")
    assert growth_routes(29, True, "on_all")
    assert not growth_routes(29, True, "off")


def test_dense_layer_routed_matches_unrouted():
    """DenseLayer with growth='on_all' has the identical param tree and
    output as the plain path (same init: _Kernel mirrors nn.Conv)."""
    from md_rdm_tpu.models.densenet import DenseLayer
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 15, 15, 96)), jnp.float32)
    plain = DenseLayer(15, 48, growth="off")
    routed = DenseLayer(15, 48, growth="on_all")
    vp = plain.init(jax.random.PRNGKey(0), x, False)
    vr = routed.init(jax.random.PRNGKey(0), x, False)
    assert jax.tree_util.tree_structure(vp) == jax.tree_util.tree_structure(vr)
    for a, b in zip(jax.tree_util.tree_leaves(vp),
                    jax.tree_util.tree_leaves(vr)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    yp = plain.apply(vp, x, False)
    yr = routed.apply(vr, x, False)
    np.testing.assert_allclose(np.asarray(yr), np.asarray(yp),
                               rtol=2e-5, atol=2e-5)


def test_flop_inflation_bookkeeping():
    """The MFU correction must cover exactly the routed, non-flat,
    non-sandwich layers (true_bench subtracts it from cost_analysis)."""
    from md_rdm_tpu.kernels.growth_conv import (_pad128,
                                                growth_flop_inflation)
    b, g = 16, 48

    def expect(sizes):
        tot = 0
        for s, n in sizes:
            f = s + 2
            lp = _pad128(s * f)
            zl = _pad128(max(f * f, 2 * f + 2 + lp))
            tot += n * (2 * b * 9 * g * (s * g) * (zl - s * s)
                        + 8 * b * g * lp)
        return tot

    # "on" routes nothing (measured negative) -> zero correction
    assert growth_flop_inflation(b, mode="on", fused="on") == 0
    # "on_all" with the sandwich routing 57 -> covers 29 (12) + 15 (36)
    assert growth_flop_inflation(b, mode="on_all", fused="on") == \
        expect([(29, 12), (15, 36)])
    # flat on_all -> nothing left for the growth path
    assert growth_flop_inflation(b, mode="on_all", fused="on",
                                 flat="on_all") == 0
    # train multiplies the dot inflation by 4 (fwd + replay + 2 bwd)
    fwd = growth_flop_inflation(b, mode="on_all", fused="on")
    tr = growth_flop_inflation(b, mode="on_all", fused="on", train=True)
    assert tr > 3.9 * fwd * 0.9 and tr < 4.1 * fwd
