"""Tests for the dormant-capability extras: principal eigen, geometric
resize, weighted sampling, run dirs, nan scan."""
import numpy as np

import jax
import jax.numpy as jnp

from md_rdm_tpu import ops
from md_rdm_tpu.data.base import DataLoader
from md_rdm_tpu.data.synthetic import SyntheticDepthDataset
from md_rdm_tpu.utils.rundir import get_output_directory


def test_principal_eigen_recovers_rank1_depths():
    rng = np.random.default_rng(0)
    d = rng.uniform(0.5, 2.0, (3, 64)).astype(np.float32)
    m = d[:, :, None] / d[:, None, :]          # exact rank-1 ratio matrix
    out = np.asarray(ops.principal_eigen(jnp.asarray(m)))
    assert out.shape == (3, 1, 8, 8)
    # recovered map equals d normalized by its geometric mean
    gm = np.exp(np.mean(np.log(d), axis=1, keepdims=True))
    want = (d / gm).reshape(3, 1, 8, 8)
    np.testing.assert_allclose(out, want, rtol=1e-4)


def test_geometric_resize_matches_blockwise_gm():
    rng = np.random.default_rng(1)
    x = rng.uniform(0.5, 3.0, (2, 1, 8, 8)).astype(np.float32)
    out = np.asarray(ops.geometric_resize(jnp.asarray(x), 1))
    assert out.shape == (2, 1, 4, 4)
    blk = x.reshape(2, 1, 4, 2, 4, 2)
    want = np.exp(np.log(blk).mean(axis=(3, 5)))
    np.testing.assert_allclose(out, want, rtol=1e-5)
    # two levels = recursive application (alt_resize semantics)
    out2 = np.asarray(ops.geometric_resize(jnp.asarray(x), 2))
    np.testing.assert_allclose(
        out2, np.asarray(ops.geometric_resize(jnp.asarray(out), 1)),
        rtol=1e-5)


def test_min_eps():
    assert ops.min_eps([1.0])
    assert ops.min_eps([1.0, 0.5])
    assert not ops.min_eps([1.0, 0.5, 0.5 + 1e-8])


def test_find_nans():
    assert not ops.find_nans([jnp.ones(3), {"a": jnp.zeros(2)}])
    assert ops.find_nans([jnp.ones(3), jnp.asarray([np.nan])])


def test_weighted_sampler_draws_num_samples():
    ds = SyntheticDepthDataset("val", size=5, output_size=(16, 16))
    w = np.array([1.0, 0.0, 0.0, 0.0, 1.0])
    dl = DataLoader(ds, batch_size=4, sample_weights=w, num_samples=12,
                    seed=3)
    batches = list(dl)
    assert sum(b[0].shape[0] for b in batches) == 12
    # only indices 0 and 4 may appear: check depth sums match those samples
    allowed = {round(float(ds[i][1].sum()), 2) for i in (0, 4)}
    for x, y in batches:
        for d in y:
            assert round(float(d.sum()), 2) in allowed


def test_run_directory_numbering(tmp_path):
    d0 = get_output_directory(str(tmp_path), "rd")
    assert d0.endswith("run_0")
    import os
    os.makedirs(d0)
    d1 = get_output_directory(str(tmp_path), "rd")
    assert d1.endswith("run_1")
    resume = os.path.join(d0, "ckpt.bin")
    assert get_output_directory(str(tmp_path), "rd", resume=resume) == d0


def test_dense_block_remat_gradients():
    """remat path produces identical grads to the plain path."""
    import flax.linen as nn
    from md_rdm_tpu.models.densenet import DenseBlock

    x = jnp.asarray(np.random.default_rng(3).random((2, 6, 6, 8)),
                    jnp.float32)

    def loss(remat):
        blk = DenseBlock(2, 2, 4, remat=remat)
        v = blk.init(jax.random.PRNGKey(0), x)
        return jax.grad(
            lambda p: jnp.sum(blk.apply({"params": p,
                                         "batch_stats": v["batch_stats"]},
                                        x) ** 2))(v["params"])

    g0 = loss(False)
    g1 = loss(True)
    for a, b in zip(jax.tree_util.tree_leaves(g0),
                    jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5)
