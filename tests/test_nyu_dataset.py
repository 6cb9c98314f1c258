"""NYU dataset end-to-end with synthetic fixtures (both backends).

Builds tiny fake sparse-to-dense h5 files and a fake labeled-mat pair in
tmp, then exercises the real loader + preprocessing chains
(nyu_dataloader.py behaviors per SURVEY.md 2.4).
"""
import numpy as np
import pytest

import h5py


@pytest.fixture()
def h5_root(tmp_path):
    rng = np.random.default_rng(0)
    for split in ("train", "val"):
        d = tmp_path / split / "scene1"
        d.mkdir(parents=True)
        for i in range(3):
            with h5py.File(d / f"{i:05d}.h5", "w") as f:
                f["rgb"] = rng.integers(0, 256, (3, 480, 640),
                                        dtype=np.uint8)
                f["depth"] = rng.uniform(0.5, 9.5, (480, 640)).astype(
                    np.float32)
    return tmp_path


@pytest.fixture()
def mat_root(tmp_path):
    rng = np.random.default_rng(1)
    import scipy.io
    n = 4
    scipy.io.savemat(tmp_path / "split.mat", {
        "trainNdxs": np.arange(1, 3).reshape(-1, 1),
        "testNdxs": np.arange(3, n + 1).reshape(-1, 1),
    })
    with h5py.File(tmp_path / "nyu_depth_v2_labeled_corrected.mat", "w") as f:
        f["images"] = rng.integers(0, 256, (n, 3, 640, 480), dtype=np.uint8)
        f["depths"] = rng.uniform(0.5, 9.5, (n, 640, 480)).astype(np.float32)
    return tmp_path


def test_h5_backend_train(h5_root):
    from md_rdm_tpu.data.nyu import NYUDataset

    ds = NYUDataset(str(h5_root), dataset_type="sparse_2_dense",
                    split="train", output_size=(226, 226))
    assert len(ds) == 3
    rgb, depth = ds[0]
    assert rgb.shape == (226, 226, 3)
    assert depth.shape == (226, 226)
    assert 0.0 <= rgb.min() and rgb.max() <= 1.0
    assert depth.max() <= 9.5       # depth only shrinks (scale s >= 1)


def test_h5_backend_val_deterministic(h5_root):
    from md_rdm_tpu.data.nyu import NYUDataset

    ds = NYUDataset(str(h5_root), dataset_type="sparse_2_dense",
                    split="val", output_size=(226, 226))
    a0, d0 = ds[0]
    a1, d1 = ds[0]
    np.testing.assert_allclose(a0, a1)
    np.testing.assert_allclose(d0, d1)


def test_mat_backend_split_indices(mat_root):
    from md_rdm_tpu.data.nyu import NYUDataset

    train = NYUDataset(str(mat_root), dataset_type="labeled", split="train",
                       output_size=(226, 226))
    val = NYUDataset(str(mat_root), dataset_type="labeled", split="val",
                     output_size=(226, 226))
    assert len(train) == 2 and len(val) == 2
    rgb, depth = val[0]
    assert rgb.shape == (226, 226, 3) and depth.shape == (226, 226)


def test_corrected_disallowed_for_train(mat_root):
    from md_rdm_tpu.data.nyu import NYUDataset

    with pytest.raises(ValueError):
        NYUDataset(str(mat_root), dataset_type="corrected", split="train")


def test_dataloader_over_nyu(h5_root):
    from md_rdm_tpu.data.base import DataLoader
    from md_rdm_tpu.data.nyu import NYUDataset

    ds = NYUDataset(str(h5_root), dataset_type="sparse_2_dense",
                    split="train", output_size=(226, 226))
    x, y = next(iter(DataLoader(ds, batch_size=2, shuffle=True,
                                num_workers=2)))
    assert x.shape == (2, 226, 226, 3) and y.shape == (2, 1, 226, 226)
