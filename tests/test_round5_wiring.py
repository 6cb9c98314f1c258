"""Round-5 wiring: fast_modules param groups, fusion_init modes, SID
per-dataset constants, run_N directories, ConcatDataset CLI mixing,
per-sample metric pooling (pure-ops level).

Fast tier: no full-model compiles here (see conftest.FAST_MODULES).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _parse(*argv):
    from md_rdm_tpu.cli.train import build_parser
    return build_parser().parse_args(list(argv))


# ---------------------------------------------------------------- SID ---

def test_sid_constants_follow_dataset():
    """cli builds per-dataset SID tables (computations.py:559-631);
    VERDICT r4 missing #3."""
    from md_rdm_tpu.cli.train import build_config

    cases = {
        "kitti": (0.001, 80.0, 71.0),
        "floorplan3d": (0.0552, 10.0, 68.0),
        "structured3d": (0.02, 10.0, 68.0),
        # the training path uses K=90 for NYU (utils.py:128,167)
        "nyu": (0.02, 10.0, 90.0),
        "synthetic": (0.02, 10.0, 90.0),       # NYU-like scenes
        "floorplan3d+nyu": (0.0552, 10.0, 68.0),  # primary member rules
    }
    for name, (alpha, beta, k) in cases.items():
        sid = build_config(_parse("--dataset", name)).sid
        assert (sid.alpha, sid.beta, sid.K) == (alpha, beta, k), name


# ------------------------------------------------------ fusion weights ---

def _weight_params(mode, sizes=(3, 2, 0, 0, 0, 0, 0, 0)):
    from md_rdm_tpu.models.rdm import Weights
    mats = [jnp.zeros((1, 3, 4)), jnp.zeros((1, 2, 16))]
    w = Weights(sizes, init_mode=mode)
    return w.init(jax.random.PRNGKey(0), mats)["params"]


def test_fusion_init_abs_randn_faithful():
    params = _weight_params("abs_randn")
    assert set(params) == {"d0", "f1"}
    for v in params.values():
        assert np.all(np.asarray(v) >= 0)
    # |N(0,1)| values are not all equal and not normalized
    assert abs(float(jnp.sum(params["d0"])) - 1.0) > 1e-3


def test_fusion_init_normalized_sums_to_one():
    params = _weight_params("normalized")
    for v in params.values():
        np.testing.assert_allclose(float(jnp.sum(v)), 1.0, rtol=1e-6)
        assert np.all(np.asarray(v) >= 0)


def test_fusion_init_primary_one_hot():
    params = _weight_params("primary")
    for v in params.values():
        v = np.asarray(v).ravel()
        assert v[0] == 1.0
        np.testing.assert_allclose(v[1:], 0.01)


def test_fusion_init_validated():
    from md_rdm_tpu.core.config import ModelConfig
    with pytest.raises(ValueError):
        ModelConfig(fusion_init="nope")


# --------------------------------------------------- fast param groups ---

def test_fast_modules_lr_multiplier():
    """The 1x/10x param-group recipe (main.py:156-162): modules listed in
    fast_modules step ~10x further under AdamW (first-step update is
    ~lr * sign(grad) with zero params, so the ratio is exact)."""
    import optax
    from md_rdm_tpu.training.optim import get_lr, make_optimizer, set_lr

    params = {"enc": {"w": jnp.zeros((4,))},
              "weight_layer": {"d0": jnp.zeros((3,))}}
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    tx = make_optimizer(1e-4, fast_modules=("weight_layer",),
                        fast_multiplier=10.0)
    state = tx.init(params)
    updates, state = tx.update(grads, state, params)
    slow = float(jnp.abs(updates["enc"]["w"]).max())
    fast = float(jnp.abs(updates["weight_layer"]["d0"]).max())
    np.testing.assert_allclose(fast / slow, 10.0, rtol=1e-4)

    # scheduler interplay: get_lr reports the BASE lr; set_lr rescales
    # both groups, preserving the 10x ratio
    assert get_lr(state) == pytest.approx(1e-4)
    state = set_lr(state, 1e-5)
    updates2, _ = tx.update(grads, state, params)
    slow2 = float(jnp.abs(updates2["enc"]["w"]).max())
    fast2 = float(jnp.abs(updates2["weight_layer"]["d0"]).max())
    np.testing.assert_allclose(fast2 / slow2, 10.0, rtol=1e-3)
    assert slow2 < slow  # base group actually decayed


def test_trainer_config_threads_fast_modules(tmp_path):
    """Trainer builds its optimizer from config.train.fast_modules."""
    from md_rdm_tpu.core.config import Config, ModelConfig, TrainConfig
    from md_rdm_tpu.training.loop import Trainer

    cfg = Config(model=ModelConfig(decoder_ids=(1,)),
                 train=TrainConfig(seed=0, data_parallel=1,
                                   fast_modules=("weight_layer",),
                                   fast_lr_multiplier=7.0,
                                   checkpoint_dir=str(tmp_path)))
    tr = Trainer(cfg, workdir=str(tmp_path))
    params = {"enc": {"w": jnp.zeros((2,))},
              "weight_layer": {"d0": jnp.zeros((2,))}}
    st = tr.tx.init(params)
    up, _ = tr.tx.update(jax.tree_util.tree_map(jnp.ones_like, params),
                         st, params)
    ratio = (float(jnp.abs(up["weight_layer"]["d0"]).max())
             / float(jnp.abs(up["enc"]["w"]).max()))
    np.testing.assert_allclose(ratio, 7.0, rtol=1e-4)
    tr.ckpt.close()


# -------------------------------------------------------- run_N dirs ---

def test_trainer_allocates_run_dirs(tmp_path):
    """Two Trainer constructions get distinct run_N dirs; a third with
    resume reuses the latest (utils.py:49-59; VERDICT r4 missing #4)."""
    from md_rdm_tpu.core.config import Config, ModelConfig, TrainConfig
    from md_rdm_tpu.training.loop import Trainer

    def make(resume=None):
        cfg = Config(model=ModelConfig(decoder_ids=(1,)),
                     train=TrainConfig(seed=0, data_parallel=1,
                                       checkpoint_dir=str(tmp_path),
                                       resume=resume))
        return Trainer(cfg, workdir=str(tmp_path))

    t0 = make()
    assert t0.workdir.name == "run_0"
    assert (t0.workdir / "config.json").exists()
    t1 = make()
    assert t1.workdir.name == "run_1"
    assert (t0.workdir / "config.json").exists()   # run_0 not clobbered
    t2 = make(resume="latest")
    assert t2.workdir == t1.workdir
    for t in (t0, t1, t2):
        t.ckpt.close()


def test_run_dir_numeric_ordering(tmp_path):
    """run_10 sorts after run_9 (numeric, not lexicographic)."""
    import os

    from md_rdm_tpu.utils.rundir import get_output_directory

    for i in range(11):
        os.makedirs(tmp_path / "rd" / f"run_{i}")
    nxt = get_output_directory(str(tmp_path), "rd")
    assert nxt.endswith("run_11")
    latest = get_output_directory(str(tmp_path), "rd", resume="latest")
    assert latest.endswith("run_10")


# --------------------------------------------------- ConcatDataset CLI ---

def test_cli_dataset_mixing():
    """--dataset a+b trains on a shuffled ConcatDataset
    (dataloader.py:42-61; VERDICT r4 missing #5)."""
    from md_rdm_tpu.cli.train import make_datasets
    from md_rdm_tpu.data.base import ConcatDataset

    args = _parse("--dataset", "synthetic+synthetic", "--batch_size", "2",
                  "--synthetic_size", "4", "--seed", "0", "--worker", "1")
    train_loader, val_loader = make_datasets(args)
    assert isinstance(train_loader.dataset, ConcatDataset)
    assert len(train_loader.dataset) == 8          # 4 + 4
    # distinct member seeds -> the two synthetic sets differ
    d0, d1 = train_loader.dataset.datasets
    assert not np.allclose(np.asarray(d0[0][1]), np.asarray(d1[0][1]))
    x, y = next(iter(train_loader))
    assert x.shape == (2, 226, 226, 3)
    xv, yv = next(iter(val_loader))
    assert xv.shape[1:] == (226, 226, 3)


# ------------------------------------------------ per-sample pooling ---

def test_per_sample_metrics_match_loop_over_singles():
    """compute_metrics(per_sample=True) row i == scalar metrics on
    sample i alone (the reference's batch-1 semantics, metrics.py:48-71)."""
    from md_rdm_tpu.metrics import compute_metrics

    rng = np.random.default_rng(0)
    pred = jnp.asarray(rng.uniform(0.1, 5, (3, 1, 8, 8)).astype(np.float32))
    target = jnp.asarray(
        rng.uniform(0, 5, (3, 1, 8, 8)).astype(np.float32))
    names = ["delta1", "delta2", "mse", "mae", "log10", "absrel",
             "sqrel", "rmse", "rms", "berhu", "msle"]
    batched = compute_metrics(pred, target, names, per_sample=True)
    for i in range(3):
        single = compute_metrics(pred[i:i + 1], target[i:i + 1], names)
        for n in names:
            np.testing.assert_allclose(
                np.asarray(batched[n])[i], float(single[n]), rtol=1e-5,
                err_msg=f"{n} sample {i}")


def test_restore_eval_across_optimizer_structures(tmp_path):
    """Checkpoints written by a fast_modules (param-group) run restore for
    evaluation/inference with a plain-optimizer template: restore_eval
    grafts only the model sub-trees (found by the round-5 verify driver:
    StandardRestore with a mismatched opt-state template fails)."""
    from md_rdm_tpu.training.checkpoint import CheckpointManager
    from md_rdm_tpu.training.module import TrainState
    from md_rdm_tpu.training.optim import make_optimizer

    params = {"enc": {"w": jnp.ones((2,))},
              "weight_layer": {"d0": jnp.full((1, 1), 2.0)}}
    tx_fast = make_optimizer(1e-4, fast_modules=("weight_layer",))
    st = TrainState(step=jnp.asarray(7), params=params, batch_stats={},
                    opt_state=tx_fast.init(params))
    mgr = CheckpointManager(str(tmp_path), monitor="m")
    mgr.save(0, jax.device_get(st), {"m": 0.5})

    tx_plain = make_optimizer(1e-4)
    tmpl = TrainState(
        step=jnp.asarray(0),
        params=jax.tree_util.tree_map(jnp.zeros_like, params),
        batch_stats={}, opt_state=tx_plain.init(params))
    step, got = mgr.restore_eval(jax.device_get(tmpl))
    mgr.close()
    assert int(got.step) == 7
    np.testing.assert_array_equal(np.asarray(got.params["enc"]["w"]),
                                  [1.0, 1.0])
    np.testing.assert_array_equal(
        np.asarray(got.params["weight_layer"]["d0"]), [[2.0]])


def test_accumulator_per_sample_drops_padding():
    from md_rdm_tpu.metrics import MetricAccumulator

    acc = MetricAccumulator(["mse"])
    acc.update_per_sample({"mse": np.array([1.0, 3.0, 99.0])}, n_real=2)
    acc.update_per_sample({"mse": np.array([5.0])}, n_real=1)
    assert acc.averages()["mse"] == pytest.approx((1 + 3 + 5) / 3)
