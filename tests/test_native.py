"""Native C++ host-pipeline kernels vs the numpy reference implementation."""
import numpy as np
import pytest

from md_rdm_tpu.data import native


def test_resize_matches_numpy_reference():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (120, 160, 3), dtype=np.uint8)
    got = native.resize_u8_to_f32(img, 60, 90)
    want = native._resize_numpy(img.astype(np.float32), 60, 90) / 255.0
    np.testing.assert_allclose(got, want, atol=2e-3)

    dep = rng.uniform(0, 10, (120, 160)).astype(np.float32)
    np.testing.assert_allclose(native.resize_f32(dep, 60, 90),
                               native._resize_numpy(dep, 60, 90), atol=2e-3)


def test_resize_identity():
    img = np.arange(4 * 6 * 3, dtype=np.uint8).reshape(4, 6, 3)
    out = native.resize_u8_to_f32(img, 4, 6, scale=1.0)
    np.testing.assert_allclose(out, img.astype(np.float32), atol=1e-4)


def test_raw_dataset_uses_native_path():
    from md_rdm_tpu.data.raw import RawResizeDataset
    from md_rdm_tpu.data.synthetic import SyntheticDepthDataset

    ds = RawResizeDataset(
        SyntheticDepthDataset("train", size=2, output_size=(480, 640)),
        raw_hw=(250, 333))
    rgb, depth = ds[0]
    assert rgb.shape == (250, 333, 3) and depth.shape == (250, 333)
    assert np.isfinite(rgb).all() and np.isfinite(depth).all()
