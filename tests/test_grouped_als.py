"""Grouped ALS == per-decoder ALS (selection semantics preserved)."""
import numpy as np

import jax.numpy as jnp

from md_rdm_tpu.ops.als import alternating_least_squares, als_factorize_grouped


def test_grouped_matches_separate_calls():
    rng = np.random.default_rng(0)
    a = np.abs(rng.standard_normal((2, 256, 64))).astype(np.float32) + 0.1
    b = np.abs(rng.standard_normal((6, 256, 64))).astype(np.float32) + 0.1

    want_a = np.asarray(alternating_least_squares(jnp.asarray(a), n=4,
                                                  num_iters=25))
    want_b = np.asarray(alternating_least_squares(jnp.asarray(b), n=4,
                                                  num_iters=25))

    merged = jnp.concatenate([jnp.asarray(a), jnp.asarray(b)], axis=0)
    gids = jnp.asarray([0] * 2 + [1] * 6, jnp.int32)
    got = np.asarray(als_factorize_grouped(merged, 16, 25, gids, 2))
    np.testing.assert_allclose(got[:2], want_a, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(got[2:], want_b, rtol=1e-4, atol=1e-5)


def test_multi_relative_model_forward_shapes():
    """(6,7) set exercises inline 8px quadratic + merged-rect skip logic."""
    import jax
    from md_rdm_tpu.core.config import ModelConfig
    from md_rdm_tpu.models.rdm import DepthEstimationNet

    cfg = ModelConfig(decoder_ids=(6, 7), als_iters_quadratic=5,
                      als_iters_rect=5)
    model = DepthEstimationNet(cfg)
    x = jnp.asarray(np.random.default_rng(0).random((1, 226, 226, 3)),
                    jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    yhat, ord_depth, ord_probs = model.apply(variables, x, train=False)
    assert ord_depth is None and ord_probs is None
    # relative-only: slots 1..4 (2,4,8,16)
    assert [y.shape[-1] for y in yhat] == [2, 4, 8, 16]
    for y in yhat:
        assert np.isfinite(np.asarray(y)).all()
