"""Structural parity tests for DepthEstimationNet (SURVEY.md 2.1 table).

torchvision is unavailable in this image, so the reference model cannot be
instantiated directly; instead these tests pin the documented architecture
contract: encoder resolution/channel chain (RDM_Net.py:515-534), decoder
output sizes by id (RDM_Net.py:29-39), fusion vector sizes (RDM_Net.py:63),
and DORN decode semantics (RDM_Net.py:313-345).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from md_rdm_tpu.core.config import ModelConfig
from md_rdm_tpu.models.decoder import dorn_decode
from md_rdm_tpu.models.densenet import Encoder
from md_rdm_tpu.models.rdm import DepthEstimationNet


@pytest.fixture(scope="module")
def live_model():
    cfg = ModelConfig(decoder_ids=(1,))
    model = DepthEstimationNet(cfg)
    x = jnp.asarray(np.random.default_rng(0).random((1, 226, 226, 3)),
                    jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    return cfg, model, variables, x


def test_config_vector_sizes():
    # live config (RDM_Net.py:63)
    assert ModelConfig(decoder_ids=(1,)).vector_sizes == (1, 1, 1, 1, 0, 0, 0, 0)
    # authors' optimum 1,6,7,8,9: d1 fills slots 0-3; d6 slots 1-3;
    # d7 slots 1-4; d8 slots 1-5; d9 slots 1-6
    assert ModelConfig(decoder_ids=(1, 6, 7, 8, 9)).vector_sizes == \
        (1, 5, 5, 5, 3, 2, 1, 0)


def test_encoder_feature_chain(live_model):
    _, _, variables, x = live_model
    feats = Encoder().apply(
        {"params": variables["params"]["encoder"],
         "batch_stats": variables["batch_stats"]["encoder"]}, x, train=False)
    assert feats.shape == (1, 8, 8, 1056)


def test_live_forward_shapes(live_model):
    cfg, model, variables, x = live_model
    yhat, ord_depth, ord_probs = model.apply(variables, x, train=False)
    assert [tuple(y.shape) for y in yhat] == [
        (1, 1, 1, 1), (1, 1, 2, 2), (1, 1, 4, 4), (1, 1, 8, 8)]
    assert ord_depth.shape == (1, 1, 8, 8)
    assert ord_probs.shape == (1, 90, 8, 8)
    # decode values are integer counts in [0, 90]
    d = np.asarray(ord_depth)
    assert np.all(d == np.round(d)) and d.min() >= 0 and d.max() <= 90
    for y in yhat:
        assert np.isfinite(np.asarray(y)).all()


def test_batchnorm_stats_update_in_train_mode(live_model):
    cfg, model, variables, x = live_model
    (_, _, _), mutated = model.apply(
        variables, x, train=True, mutable=["batch_stats"])
    before = variables["batch_stats"]["encoder"]["dense_e2"][
        "denselayer1"]["norm1"]["mean"]
    after = mutated["batch_stats"]["encoder"]["dense_e2"][
        "denselayer1"]["norm1"]["mean"]
    assert not np.allclose(np.asarray(before), np.asarray(after))


def test_dorn_decode_semantics():
    # pairs (A,B): decode counts pairs with clamp(B) > clamp(A)
    logits = np.zeros((1, 2, 2, 6), np.float32)  # 3 ordinal pairs, NHWC
    logits[0, :, :, 0::2] = [1.0, 5.0, -1.0]     # A
    logits[0, :, :, 1::2] = [2.0, 4.0, -2.0]     # B
    # pair0: B>A -> 1; pair1: B<A -> 0; pair2: both clamp to 1e-8 -> tie -> 0
    decoded, probs = dorn_decode(jnp.asarray(logits))
    assert decoded.shape == (1, 1, 2, 2)
    assert probs.shape == (1, 3, 2, 2)
    np.testing.assert_array_equal(np.asarray(decoded), 1.0)
    p = np.asarray(probs)
    assert np.all(p[0, 0] > 0.5) and np.all(p[0, 1] < 0.5)
    np.testing.assert_allclose(p[0, 2], 0.5, atol=1e-6)


def test_relative_decoder_forward_shapes():
    """Decoder 6 (8x8 relative) end-to-end on tiny encoder features."""
    from md_rdm_tpu.models.decoder import Decoder
    feats = jnp.asarray(
        np.random.default_rng(1).uniform(0.1, 1.0, (2, 8, 8, 1056)),
        jnp.float32)
    dec = Decoder(6)
    variables = dec.init(jax.random.PRNGKey(0), feats, train=False)
    out = dec.apply(variables, feats, train=False)
    assert out.shape == (2, 1, 8, 8)
    assert np.isfinite(np.asarray(out)).all()
    # ALS output is normalized by (a power of) the geometric mean: positive
    assert np.asarray(out).min() > 0


def test_relative_map_paged_path():
    """size-32 relative path exercises paging + batched ALS (RDM_Net.py:383-396)."""
    from md_rdm_tpu.models.decoder import relative_map_from_features
    d = jnp.asarray(
        np.random.default_rng(2).uniform(0.5, 2.0, (2, 1, 32, 32)),
        jnp.float32)
    out = relative_map_from_features(d, 32, als_iters_rect=30)
    assert out.shape == (2, 1, 32, 32)
    assert np.isfinite(np.asarray(out)).all()


def test_dorn_soft_decode():
    """soft decode = sum of probs (reference RDM_Net.py:343 alternative),
    differentiable where the hard count is not."""
    rng = np.random.default_rng(4)
    logits = jnp.asarray(rng.standard_normal((1, 2, 2, 6)), jnp.float32)
    hard, probs = dorn_decode(logits, soft=False)
    soft, _ = dorn_decode(logits, soft=True)
    np.testing.assert_allclose(np.asarray(soft)[0, 0],
                               np.asarray(probs).sum(1)[0], rtol=1e-6)
    # gradient flows through soft, not hard
    g_soft = jax.grad(lambda l: jnp.sum(dorn_decode(l, soft=True)[0]))(logits)
    g_hard = jax.grad(lambda l: jnp.sum(dorn_decode(l, soft=False)[0]))(logits)
    assert float(jnp.abs(g_soft).sum()) > 0
    assert float(jnp.abs(g_hard).sum()) == 0
