"""End-to-end CLI coverage beyond flag parsing: the evaluate entry point
(checkpoint restore -> predict -> metrics -> grid/best.txt) and the LR
range finder (train.py:74-80 tuner.lr_find equivalent)."""
import numpy as np

import jax
import jax.numpy as jnp

from md_rdm_tpu.core.config import Config, ModelConfig, TrainConfig


def _synthetic_batch(b=2, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.random((b, 226, 226, 3)).astype(np.float32)
    y = (rng.random((b, 1, 226, 226)).astype(np.float32) * 9 + 0.5)
    return x, y


def test_evaluate_cli_end_to_end(tmp_path):
    from md_rdm_tpu.cli.evaluate import main as evaluate_main
    from md_rdm_tpu.training.checkpoint import CheckpointManager
    from md_rdm_tpu.training.module import DepthTrainer
    from md_rdm_tpu.training.optim import make_optimizer

    cfg = Config(model=ModelConfig(decoder_ids=(1,)),
                 train=TrainConfig(metrics=("delta1", "mse")))
    module = DepthTrainer(cfg)
    tx = make_optimizer(1e-4)
    x, _ = _synthetic_batch(b=1)
    state = module.init(jax.random.PRNGKey(0), tx, jnp.asarray(x))

    ckdir = tmp_path / "checkpoints"
    mgr = CheckpointManager(str(ckdir), monitor="delta1")
    mgr.save(0, jax.device_get(state), {"delta1": 0.5})
    mgr.close()

    grid = tmp_path / "grid.png"
    best = tmp_path / "best.txt"
    avgs = evaluate_main([
        "--checkpoint", str(ckdir), "--dataset", "synthetic",
        "--num_images", "2", "--metrics", "delta1", "mse",
        "--linear_metrics", "--grid_out", str(grid),
        "--best_txt", str(best)])
    # --best_txt appends 'rms' (standard RMSE drives best selection,
    # matching the legacy loop's best-tracking, main.py:206-230)
    assert set(avgs) == {"delta1", "mse", "rms"}
    assert np.isfinite(avgs["mse"])
    assert grid.exists() and best.exists()
    assert "delta1=" in best.read_text()
    assert "rms=" in best.read_text()


def test_train_cli_resume(tmp_path):
    """--resume restores the best checkpoint and continues training
    (reference legacy --resume, main.py:126-148)."""
    from md_rdm_tpu.cli.train import main as train_main

    common = ["--dataset", "synthetic", "--dev", "--precision", "32",
              "--batch_size", "2", "--seed", "0",
              "--workdir", str(tmp_path)]
    state1 = train_main(common)
    assert int(jax.device_get(state1.step)) == 1       # dev: 1 step
    state2 = train_main(common + ["--resume", "latest"])
    # restored step-1 state, then one more dev step
    assert int(jax.device_get(state2.step)) == 2


def test_predictor_from_checkpoint(tmp_path):
    """Inference API: checkpoint -> Predictor -> positive relative depth."""
    from md_rdm_tpu.inference import Predictor
    from md_rdm_tpu.training.checkpoint import CheckpointManager
    from md_rdm_tpu.training.module import DepthTrainer
    from md_rdm_tpu.training.optim import make_optimizer

    cfg = Config(model=ModelConfig(decoder_ids=(1,)),
                 train=TrainConfig(metrics=("delta1",)))
    module = DepthTrainer(cfg)
    tx = make_optimizer(1e-4)
    x, _ = _synthetic_batch(b=1)
    state = module.init(jax.random.PRNGKey(0), tx, jnp.asarray(x))
    ckdir = tmp_path / "ck"
    mgr = CheckpointManager(str(ckdir), monitor="delta1")
    mgr.save(0, jax.device_get(state), {"delta1": 0.1})
    mgr.close()

    pred = Predictor.from_checkpoint(str(ckdir))
    final, ord_depth = pred(x)
    assert final.shape == (1, 1, 128, 128)
    assert ord_depth.shape == (1, 1, 8, 8)
    rel = pred.relative_depth(x)
    assert (rel > 0).all() and np.isfinite(rel).all()


def test_find_learning_rate_range(tmp_path):
    from md_rdm_tpu.cli.train import find_learning_rate
    from md_rdm_tpu.training.loop import Trainer

    cfg = Config(model=ModelConfig(decoder_ids=(1,)),
                 train=TrainConfig(metrics=("delta1", "mse"), seed=0,
                                   data_parallel=1,
                                   checkpoint_dir=str(tmp_path)))
    trainer = Trainer(cfg, workdir=str(tmp_path))
    x, y = _synthetic_batch(b=2)
    loader = [(x, y)] * 4
    state = trainer.init_state(x[:1])
    lr = find_learning_rate(trainer, state, loader, lo=1e-6, hi=1e-2,
                            num_steps=6)
    # np.exp(np.linspace(log lo, log hi)) endpoints carry float round-off
    assert 1e-6 * (1 - 1e-9) <= lr <= 1e-2 * (1 + 1e-9)
    trainer.ckpt.close()
