"""Flag-gated fusion-tail stabilization (ModelConfig.fusion_eps).

Round-3 discovery: training the authors' optimal decoder set (1,6,7,8,9)
NaNs within one epoch under faithful reference semantics - ALS-filled
relative maps have no positivity guarantee and bicubic downsampling has
negative lobes, so the fine-detail pipeline ends up taking ``log`` of
non-positive ratios.  The reference shares the hazard (its find_nans
guard is commented-out debug, computations.py:383) and never trains that
set.  ``fusion_eps`` floors pyramid levels / clips ratios / floors log
inputs on the prediction side only; eps=0 must stay bit-identical.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from md_rdm_tpu.ops.decompose import decompose_depth_map, fine_detail_matrices


def _hostile_map(b=2, s=16, seed=0):
    """An ALS-like relative map with zeros and negatives sprinkled in."""
    rng = np.random.default_rng(seed)
    m = rng.lognormal(0.0, 0.6, (b, 1, s, s))
    m.flat[::17] = 0.0
    m.flat[3::29] = -rng.random(m.flat[3::29].shape) * 0.5
    return jnp.asarray(m, jnp.float32)


def test_eps_zero_is_bit_identical():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.lognormal(0, 0.4, (2, 1, 16, 16)), jnp.float32)
    a = decompose_depth_map(x, 4, relative_map=True)
    b = decompose_depth_map(x, 4, relative_map=True, eps=0.0)
    for u, v in zip(a, b):
        np.testing.assert_array_equal(np.asarray(u), np.asarray(v))
    ma = fine_detail_matrices([a])
    mb = fine_detail_matrices([a], eps=0.0)
    for u, v in zip(ma, mb):
        np.testing.assert_array_equal(np.asarray(u), np.asarray(v))


def test_faithful_path_nans_on_hostile_map():
    """Documents the hazard: without eps the log matrices go non-finite."""
    comps = decompose_depth_map(_hostile_map(), 4, relative_map=True)
    mats = fine_detail_matrices([comps])
    assert not all(bool(jnp.isfinite(m).all()) for m in mats)


def test_eps_yields_finite_values_and_grads():
    eps = 1e-2
    x = _hostile_map()

    def scalar(x):
        comps = decompose_depth_map(jnp.clip(x, eps, 1 / eps), 4,
                                    relative_map=True, eps=eps)
        mats = fine_detail_matrices([comps], eps=eps)
        return sum(jnp.sum(m * m) for m in mats)

    val, grad = jax.value_and_grad(scalar)(x)
    assert bool(jnp.isfinite(val))
    assert bool(jnp.isfinite(grad).all())
    # the clip bounds every log entry to +-log(1/eps)
    comps = decompose_depth_map(jnp.clip(x, eps, 1 / eps), 4,
                                relative_map=True, eps=eps)
    for m in fine_detail_matrices([comps], eps=eps):
        assert float(jnp.max(jnp.abs(m))) <= -np.log(eps) + 1e-5


@pytest.mark.parametrize("eps", [0.0, 1e-2])
def test_model_config_plumbs_fusion_eps(eps):
    """Optimal-set forward at tiny batch: eps keeps yhat finite even when
    the ALS tail produces non-positive entries; eps=0 remains the default
    faithful graph (finite here too - NaN needs adversarial weights - but
    the flag must at least thread through apply())."""
    from md_rdm_tpu.core.config import ModelConfig
    from md_rdm_tpu.models.rdm import DepthEstimationNet

    cfg = ModelConfig(decoder_ids=(1, 6), fusion_eps=eps,
                      als_iters_rect=5, pallas_lloyd="off")
    model = DepthEstimationNet(cfg)
    x = jnp.asarray(np.random.default_rng(0).random((1, 226, 226, 3)),
                    jnp.float32)
    v = model.init(jax.random.PRNGKey(0), x, train=False)
    yhat, _, _ = model.apply(v, x, train=False)
    if eps:
        for m in yhat:
            assert bool(jnp.isfinite(m).all())
