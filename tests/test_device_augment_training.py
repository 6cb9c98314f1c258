"""Device-augmentation training path: raw batches -> fused augment+train
step in one compiled graph (BASELINE config 5)."""
import numpy as np

import jax
import jax.numpy as jnp

from md_rdm_tpu.core.config import Config, ModelConfig, TrainConfig
from md_rdm_tpu.data.raw import RawResizeDataset
from md_rdm_tpu.data.synthetic import SyntheticDepthDataset
from md_rdm_tpu.training.module import DepthTrainer
from md_rdm_tpu.training.optim import make_optimizer


def test_raw_resize_dataset_fixed_shapes():
    ds = RawResizeDataset(
        SyntheticDepthDataset("train", size=3, output_size=(480, 640)),
        raw_hw=(250, 333))
    rgb, depth = ds[0]
    assert rgb.shape == (250, 333, 3) and rgb.dtype == np.float32
    assert depth.shape == (250, 333)
    assert 0.0 <= rgb.min() and rgb.max() <= 1.0


def test_train_step_with_fused_device_augment():
    cfg = Config(model=ModelConfig(decoder_ids=(1,)),
                 train=TrainConfig(metrics=("mse",)))
    module = DepthTrainer(cfg)
    tx = make_optimizer(1e-4)
    rng = np.random.default_rng(0)
    x_raw = jnp.asarray(rng.random((2, 250, 333, 3)), jnp.float32)
    y_raw = jnp.asarray(rng.uniform(1, 9, (2, 1, 250, 333)), jnp.float32)
    state = module.init(jax.random.PRNGKey(0), tx,
                        jnp.zeros((1, 226, 226, 3)))
    step = jax.jit(lambda s, x, y, k: module.train_step_device_aug(
        s, tx, x, y, k))
    state2, logs = step(state, x_raw, y_raw, jax.random.PRNGKey(1))
    assert np.isfinite(float(logs["loss"]))
    assert int(state2.step) == 1
