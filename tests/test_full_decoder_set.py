"""The authors' optimal decoder set (1,6,7,8,9) end-to-end.

The forward test runs un-gated (eager apply, reduced ALS iters - no jit
compile cost); the train-step variant stays RUN_SLOW (its CPU compile is
minutes) and is benchmarked on TPU in PERF.md.
"""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

SLOW = pytest.mark.skipif(
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


@SLOW
def test_optimal_set_train_step_gradient_flow():
    """Train step at (1,6,7,8,9): loss finite; gradients reach the encoder,
    d_1 and the fusion weights, while the relative decoders' convs get ZERO
    gradient (Lloyd quantization stops them, matching the reference where
    in-place integer mapping breaks the graph - RDM_Net.py:286-311)."""
    from md_rdm_tpu.core.config import Config, ModelConfig, TrainConfig
    from md_rdm_tpu.training.module import DepthTrainer, mask_target
    from md_rdm_tpu.ops.resize import resize_bicubic

    cfg = Config(model=ModelConfig(decoder_ids=(1, 6, 7, 8, 9),
                                   als_iters_quadratic=5, als_iters_rect=5),
                 train=TrainConfig(metrics=("delta1",)))
    module = DepthTrainer(cfg)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((1, 226, 226, 3)), jnp.float32)
    y = jnp.asarray(rng.random((1, 1, 226, 226)) * 9 + 0.5, jnp.float32)

    from md_rdm_tpu.training.optim import make_optimizer
    tx = make_optimizer(1e-4)
    state = module.init(jax.random.PRNGKey(0), tx, x)
    y128 = mask_target(resize_bicubic(y, 128))

    def loss_fn(params):
        total, _ = module._forward_loss(params, state.batch_stats, x, y128,
                                        train=True)
        return total

    grads = jax.grad(loss_fn)(state.params)

    def gnorm(tree):
        return float(sum(jnp.sum(jnp.abs(g))
                         for g in jax.tree_util.tree_leaves(tree)))

    assert gnorm(grads["encoder"]) > 0          # via d_1's ordinal loss
    assert gnorm(grads["d_1"]) > 0
    assert gnorm(grads["weight_layer"]) > 0     # via fine-detail/final MSE
    for did in (6, 7, 8, 9):
        assert gnorm(grads[f"d_{did}"]) == 0.0, did
