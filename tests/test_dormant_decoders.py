"""Decoders 2-5 and 10 - the reference's dormant configurations, executed.

The reference fully implements DORN decoders at 16-128 px with NO head conv
(ord_num = planes/2, RDM_Net.py:156-159) and the 4-stage WSM cascade for
d5/d10 (RDM_Net.py:536-553) but never instantiates them (RDM_Net.py:51-61
commented out).  These tests run every one of those compute shapes: the
per-decoder forward from encoder-shaped features, the 4-stage cascade's
channel/spatial ladder, the paged relative path at 128 px (d10), and the
fusion-slot accounting for each id.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

# ord_num = planes/2 where planes = _wsm_output_planes(id)
# (RDM_Net.py:555-567): d2 1664/2, d3 832/2, d4 416/2, d5 208/2.
DORN_SHAPES = {2: (16, 832), 3: (32, 416), 4: (64, 208), 5: (128, 104)}


@pytest.fixture(scope="module")
def encoder_features():
    rng = np.random.default_rng(0)
    return jnp.asarray(rng.standard_normal((1, 8, 8, 1056)), jnp.float32)


@pytest.mark.parametrize("did", [2, 3, 4, 5])
def test_dorn_decoder_no_head_conv(encoder_features, did):
    """ids 2..5: raw cascade output feeds DORN directly (RDM_Net.py:156-159
    applies conv2 only for id 1), so ord_num = cascade planes / 2."""
    from md_rdm_tpu.models.decoder import Decoder

    size, ord_num = DORN_SHAPES[did]
    dec = Decoder(did)
    variables = dec.init(jax.random.PRNGKey(did), encoder_features)
    # no head conv for these ids: neither conv1 nor conv2 params exist
    assert "conv1" not in variables["params"]
    assert "conv2" not in variables["params"]
    decoded, probs = dec.apply(variables, encoder_features)
    assert decoded.shape == (1, 1, size, size)
    assert probs.shape == (1, ord_num, size, size)
    assert np.isfinite(np.asarray(decoded)).all()
    p = np.asarray(probs)
    assert ((0.0 <= p) & (p <= 1.0)).all()
    # decoded labels are pair counts in [0, ord_num]
    d = np.asarray(decoded)
    assert d.min() >= 0 and d.max() <= ord_num


def test_decoder10_paged_relative(encoder_features):
    """d10: 4-stage cascade -> 1-channel 128x128 map -> 16x16 tile paging ->
    cross-scale comparison/Lloyd/ALS -> merged relative map
    (RDM_Net.py:388-396 paged branch)."""
    from md_rdm_tpu.models.decoder import Decoder

    dec = Decoder(10, als_iters_rect=5, pallas_lloyd="off")
    variables = dec.init(jax.random.PRNGKey(10), encoder_features)
    out = dec.apply(variables, encoder_features)
    assert out.shape == (1, 1, 128, 128)
    assert np.isfinite(np.asarray(out)).all()


def test_wsm_cascade_4stage_ladder():
    """The full 4-stage cascade halves channels / doubles resolution per
    stage: 2208@8 -> 1664@16 -> 832@32 -> 416@64 -> 208@128
    (RDM_Net.py:536-553)."""
    from md_rdm_tpu.models.wsm import WSMCascade

    x = jnp.asarray(np.random.default_rng(1).standard_normal(
        (1, 8, 8, 2208)), jnp.float32)
    cascade = WSMCascade(4)
    variables = cascade.init(jax.random.PRNGKey(0), x)
    out = cascade.apply(variables, x)
    assert out.shape == (1, 128, 128, 208)
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.parametrize("did,expected", [
    # DORN id k with size 2**n contributes slots 0..n
    (2, (1, 1, 1, 1, 1, 0, 0, 0)),
    (3, (1, 1, 1, 1, 1, 1, 0, 0)),
    (4, (1, 1, 1, 1, 1, 1, 1, 0)),
    (5, (1, 1, 1, 1, 1, 1, 1, 1)),
    # relative id: no D0 slot (computations.py:368-392 relative_map=True)
    (10, (0, 1, 1, 1, 1, 1, 1, 1)),
])
def test_fusion_slot_accounting(did, expected):
    from md_rdm_tpu.core.config import ModelConfig

    assert ModelConfig(decoder_ids=(did,)).vector_sizes == expected


def test_full_model_decoder2():
    """Whole-model forward with a dormant DORN id: decomposition at n=4 and
    fusion over slots 0..4 (sizes 1..16)."""
    from md_rdm_tpu.core.config import ModelConfig
    from md_rdm_tpu.models.rdm import DepthEstimationNet
    from md_rdm_tpu.ops.decompose import recombination

    cfg = ModelConfig(decoder_ids=(2,))
    model = DepthEstimationNet(cfg)
    x = jnp.asarray(np.random.default_rng(2).random((1, 226, 226, 3)),
                    jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    yhat, ord_depth, ord_probs = model.apply(variables, x, train=False)
    assert [y.shape[-1] for y in yhat] == [1, 2, 4, 8, 16]
    assert ord_depth.shape == (1, 1, 16, 16)      # d2 feeds the ord loss
    assert ord_probs.shape == (1, 832, 16, 16)
    final = recombination(list(yhat))
    assert np.isfinite(np.asarray(final)).all()
