"""Trainer loop end-to-end: fit in dev mode (train epoch + val epoch +
plateau + checkpoint), and the param-group optimizer."""
import numpy as np

import jax
import jax.numpy as jnp
import optax

from md_rdm_tpu.core.config import Config, ModelConfig, TrainConfig
from md_rdm_tpu.training.optim import get_lr, make_optimizer, set_lr


def test_param_group_optimizer_lr_split():
    params = {"encoder": {"w": jnp.ones((3,))},
              "weight_layer": {"d0": jnp.ones((1, 1))}}
    tx = make_optimizer(1e-4, fast_modules=("weight_layer",))
    state = tx.init(params)
    np.testing.assert_allclose(get_lr(state), 1e-4)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    updates, _ = tx.update(grads, state, params)
    # fast group moves ~10x further on the first step... AdamW normalizes by
    # second moment, so instead assert via the injected hyperparams
    lrs = sorted(float(s.inner_state.hyperparams["learning_rate"])
                 for s in state.inner_states.values())
    np.testing.assert_allclose(lrs, [1e-4, 1e-3])
    # scaling preserves the multiplier
    state = set_lr(state, 1e-5)
    lrs = sorted(float(s.inner_state.hyperparams["learning_rate"])
                 for s in state.inner_states.values())
    np.testing.assert_allclose(lrs, [1e-5, 1e-4], rtol=1e-6)


def test_seed_reproducibility(tmp_path):
    """Two Trainers with the same seed produce bitwise-identical first-step
    losses and parameters (SURVEY.md section 5: explicit PRNG threading
    replaces pl.seed_everything)."""
    from md_rdm_tpu.training.loop import Trainer

    rng = np.random.default_rng(0)
    x = rng.random((2, 226, 226, 3)).astype(np.float32)
    y = (rng.random((2, 1, 226, 226)).astype(np.float32) * 9 + 0.5)

    def one_step(sub):
        cfg = Config(
            model=ModelConfig(decoder_ids=(1,)),
            train=TrainConfig(metrics=("mse",), seed=123, data_parallel=1,
                              checkpoint_dir=str(tmp_path / sub)))
        tr = Trainer(cfg, workdir=str(tmp_path / sub))
        state = tr.init_state(x[:1])
        xd, yd = tr._put(x, y)
        state, logs = tr._train_step(state, xd, yd)
        loss = float(jax.device_get(logs["loss"]))
        leaf = np.asarray(jax.device_get(
            jax.tree_util.tree_leaves(state.params)[0]))
        tr.ckpt.close()
        return loss, leaf

    l1, p1 = one_step("a")
    l2, p2 = one_step("b")
    assert l1 == l2
    np.testing.assert_array_equal(p1, p2)


def test_trainer_fit_dev_mode(tmp_path):
    from md_rdm_tpu.data.base import DataLoader
    from md_rdm_tpu.data.synthetic import SyntheticDepthDataset
    from md_rdm_tpu.training.loop import Trainer

    cfg = Config(
        model=ModelConfig(decoder_ids=(1,)),
        train=TrainConfig(metrics=("delta1", "mse"), dev=True, seed=0,
                          max_epochs=1, data_parallel=1,
                          checkpoint_dir=str(tmp_path)),
    )
    trainer = Trainer(cfg, workdir=str(tmp_path))
    train_loader = DataLoader(
        SyntheticDepthDataset("train", size=4), batch_size=2)
    val_loader = DataLoader(
        SyntheticDepthDataset("val", size=2, seed=1), batch_size=2)

    x0, _ = next(iter(val_loader))
    state = trainer.init_state(x0)
    state = trainer.fit(state, train_loader, val_loader)
    assert int(jax.device_get(state.step)) == 1          # dev: 1 step
    # run_dirs convention: config.json lives in the allocated run_N dir
    assert trainer.workdir.name == "run_0"
    assert (trainer.workdir / "config.json").exists()
    assert trainer.ckpt.latest_step() == 0
    # restore round-trips through the Trainer API
    step, restored = trainer.restore(jax.device_get(state))
    assert step == 0
    trainer.ckpt.close()
