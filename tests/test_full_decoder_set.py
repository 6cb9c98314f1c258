"""The authors' optimal decoder set (1,6,7,8,9) end-to-end.

Heavy compile - opt-in via RUN_SLOW=1 (verified on TPU manually; the cheap
per-decoder paths are covered in test_model.py).
"""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.skipif(
    not os.environ.get("RUN_SLOW"), reason="set RUN_SLOW=1 to enable")


def test_optimal_decoder_set_forward():
    from md_rdm_tpu.core.config import ModelConfig
    from md_rdm_tpu.models.rdm import DepthEstimationNet
    from md_rdm_tpu.ops.decompose import recombination

    cfg = ModelConfig(decoder_ids=(1, 6, 7, 8, 9),
                      als_iters_quadratic=10, als_iters_rect=20)
    assert cfg.vector_sizes == (1, 5, 5, 5, 3, 2, 1, 0)
    model = DepthEstimationNet(cfg)
    x = jnp.asarray(np.random.default_rng(0).random((1, 226, 226, 3)),
                    jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    yhat, ord_depth, ord_probs = model.apply(variables, x, train=False)
    # slots 0..6 active (no 128 candidates): sizes 1,2,4,8,16,32,64
    assert [y.shape[-1] for y in yhat] == [1, 2, 4, 8, 16, 32, 64]
    final = recombination(list(yhat))
    assert final.shape == (1, 1, 128, 128)
    assert np.isfinite(np.asarray(final)).all()
