"""KITTI / Floorplan3D / Structured3D loaders on tiny synthetic fixtures,
plus the NYU mirror plane-fit correction and label-40 masking.

Mirrors the NYU fixture strategy (test_nyu_dataset.py): build minimal real
files in tmp and drive the actual loader + preprocessing chains.

Reference behaviors covered: kitti_dataloader.py:11-46 (crop/rotate/scale/
center-crop/flip recipe at (228, 912)), floorplan3d_dataloader.py:13-19
(u16 depth -> [0,10] m) and :24+ (list-file lines, 250/720 pre-scale),
structured3d_dataloader.py:15-23 (mm -> m, clip 10) and the scene layout,
nyu_dataloader.py:42-93 (plane fit through three annotated points),
:143,194-203,217-219 (classMapping40 label masking).
"""
import numpy as np
import pytest

import h5py
from PIL import Image


# ------------------------------------------------------------------ KITTI ---
@pytest.fixture()
def kitti_root(tmp_path):
    rng = np.random.default_rng(0)
    for split in ("train", "val"):
        d = tmp_path / split / "drive1"
        d.mkdir(parents=True)
        for i in range(2):
            with h5py.File(d / f"{i:05d}.h5", "w") as f:
                f["rgb"] = rng.integers(0, 256, (3, 375, 1242),
                                        dtype=np.uint8)
                depth = rng.uniform(0.0, 80.0, (375, 1242)).astype(np.float32)
                depth[rng.random((375, 1242)) < 0.7] = 0.0   # sparse lidar
                f["depth"] = depth
    return tmp_path


def test_kitti_train(kitti_root):
    from md_rdm_tpu.data.kitti import KITTIDataset

    ds = KITTIDataset(str(kitti_root), "train")
    assert len(ds) == 2
    rgb, depth = ds[0]
    assert rgb.shape == (228, 912, 3)
    assert depth.shape == (228, 912)
    assert 0.0 <= rgb.min() and rgb.max() <= 1.0
    assert depth.max() <= 80.0      # scale s >= 1 only shrinks depth


def test_kitti_val_deterministic(kitti_root):
    from md_rdm_tpu.data.kitti import KITTIDataset

    ds = KITTIDataset(str(kitti_root), "val")
    a0, d0 = ds[0]
    a1, d1 = ds[0]
    np.testing.assert_allclose(a0, a1)
    np.testing.assert_allclose(d0, d1)
    assert a0.shape == (228, 912, 3) and d0.shape == (228, 912)


def test_kitti_val_weighted_sampler_wiring(kitti_root):
    """The train CLI wires the WeightedRandomSampler role for kitti by
    default (main.py:83-85,102-104): 3200 uniformly-resampled val images
    per epoch, drawn with replacement, at the TRAIN batch size."""
    from md_rdm_tpu.cli.train import build_parser, make_datasets

    args = build_parser().parse_args(
        ["--dataset", "kitti", "--data_path", str(kitti_root),
         "--batch_size", "4", "--seed", "0"])
    _, vl = make_datasets(args)
    assert vl.num_samples == 3200 and vl.batch_size == 4
    assert vl.sample_weights is not None and len(vl) == 800
    # an explicit 0 disables the sampler: ordered streaming at eval bs
    args = build_parser().parse_args(
        ["--dataset", "kitti", "--data_path", str(kitti_root),
         "--val_samples", "0"])
    _, vl = make_datasets(args)
    assert vl.num_samples is None and vl.batch_size == 1


def test_kitti_missing_root(tmp_path):
    from md_rdm_tpu.data.kitti import KITTIDataset

    with pytest.raises(RuntimeError):
        KITTIDataset(str(tmp_path / "nowhere"), "train")


# ------------------------------------------------------------ Floorplan3D ---
def _write_png16(path, arr):
    im = Image.new("I;16", (arr.shape[1], arr.shape[0]))
    im.frombytes(arr.astype("<u2").tobytes())
    im.save(path)


@pytest.fixture()
def floorplan_root(tmp_path):
    rng = np.random.default_rng(1)
    (tmp_path / "img").mkdir()
    lines = []
    for split in ("train", "val"):
        for i in range(2):
            rgb = rng.integers(0, 256, (720, 1280, 3), dtype=np.uint8)
            # depth 0..10 m encoded as u16 full range
            depth_m = rng.uniform(0.0, 10.0, (720, 1280))
            d16 = np.round(depth_m / 10.0 * (2 ** 16 - 1))
            rgb_rel = f"img/{split}_{i}_rgb.png"
            dep_rel = f"img/{split}_{i}_depth.png"
            Image.fromarray(rgb).save(tmp_path / rgb_rel)
            _write_png16(tmp_path / dep_rel, d16)
            lines.append(f"{rgb_rel}  {dep_rel}")
        (tmp_path / f"nyu_{split}.list").write_text(
            "\n".join(lines[-2:]) + "\n")
    return tmp_path


def test_floorplan3d_depth_scaling(floorplan_root):
    """u16 PNG decodes to meters via /(2^16-1)*10
    (floorplan3d_dataloader.py:13-19)."""
    from md_rdm_tpu.data.floorplan3d import load_depth_u16_scaled

    d = load_depth_u16_scaled(
        (floorplan_root / "img" / "val_0_depth.png").as_posix())
    assert d.dtype == np.float32
    assert 0.0 <= d.min() and d.max() <= 10.0


def test_floorplan3d_train_and_val(floorplan_root):
    from md_rdm_tpu.data.floorplan3d import Floorplan3DDataset

    tr = Floorplan3DDataset(str(floorplan_root), "nyu", "train")
    va = Floorplan3DDataset(str(floorplan_root), "nyu", "val")
    assert len(tr) == 2 and len(va) == 2
    rgb, depth = tr[0]
    assert rgb.shape == (228, 405, 3) and depth.shape == (228, 405)
    rgb, depth = va[1]
    assert rgb.shape == (228, 405, 3) and depth.shape == (228, 405)
    assert 0.0 <= rgb.min() and rgb.max() <= 1.0


# ------------------------------------------------------------ Structured3D ---
@pytest.fixture()
def structured3d_root(tmp_path):
    rng = np.random.default_rng(2)
    for s, scene in enumerate(("scene_00000", "scene_00001")):
        for render in ("485142", "485143"):
            d = tmp_path / scene / "2D_rendering" / render / "panorama" / "empty"
            d.mkdir(parents=True)
            rgb = rng.integers(0, 256, (512, 1024, 3), dtype=np.uint8)
            Image.fromarray(rgb).save(d / "rgb_rawlight.png")
            # depth in millimeters; include >10 m values to check the clip
            depth_mm = rng.uniform(500, 15000, (512, 1024))
            _write_png16(d / "depth.png", depth_mm)
    return tmp_path


def test_structured3d_scene_split(structured3d_root):
    """Root argument honored (the reference ignores it -
    structured3d_dataloader.py hardcodes /mnt/hdd - fixed here); scenes
    below train_scenes go to train, the rest to val."""
    from md_rdm_tpu.data.structured3d import Structured3DDataset

    tr = Structured3DDataset(str(structured3d_root), split="train",
                             train_scenes=1)
    va = Structured3DDataset(str(structured3d_root), split="val",
                             train_scenes=1)
    assert len(tr) == 2 and len(va) == 2     # 2 renderings per scene


def test_structured3d_depth_mm_clip(structured3d_root):
    from md_rdm_tpu.data.structured3d import load_depth_mm

    p = (structured3d_root / "scene_00000" / "2D_rendering" / "485142"
         / "panorama" / "empty" / "depth.png").as_posix()
    d = load_depth_mm(p)
    assert d.max() <= 10.0 and d.min() >= 0.0   # meters, clipped


def test_structured3d_samples(structured3d_root):
    from md_rdm_tpu.data.structured3d import Structured3DDataset

    tr = Structured3DDataset(str(structured3d_root), split="train",
                             train_scenes=1)
    rgb, depth = tr[0]
    assert rgb.shape == (228, 405, 3) and depth.shape == (228, 405)
    va = Structured3DDataset(str(structured3d_root), split="val",
                             train_scenes=1)
    rgb, depth = va[0]
    assert rgb.shape == (228, 405, 3) and depth.shape == (228, 405)
    assert np.isfinite(depth).all()


# ------------------------------------------------- NYU mirror correction ---
def test_correct_mirror_depth_recovers_plane():
    """Fit through three points of a known plane reproduces the plane's
    depth at every masked pixel (nyu_dataloader.py:42-93 formula)."""
    from md_rdm_tpu.data.nyu import correct_mirror_depth

    h, w = 60, 80
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    plane = 2.0 + 0.01 * yy + 0.02 * xx
    depth = plane.copy()
    # corrupt a mirror region (as the sensor would through a mirror)
    mask = np.zeros((h, w), bool)
    mask[20:40, 30:50] = True
    depth[mask] = 7.5
    # three annotated (x, y) points OUTSIDE the mask, non-collinear and
    # with distinct y for p1/p2 (b[0] != 0 in the parametric solve)
    points = np.array([5, 10, 70, 5, 60, 50], np.float64)  # (x0,y0,x1,y1,x2,y2)
    out = correct_mirror_depth(depth, points, mask)
    np.testing.assert_allclose(out[mask], plane[mask], rtol=1e-10)
    # unmasked pixels untouched (still the corrupted-free plane)
    np.testing.assert_allclose(out[~mask], depth[~mask])


def test_correct_mirror_depth_matches_reference_oracle():
    """Literal transcription of the reference's vectorized solve
    (nyu_dataloader.py:57-80) as an oracle on random depth."""
    from md_rdm_tpu.data.nyu import correct_mirror_depth

    rng = np.random.default_rng(3)
    depth = rng.uniform(1.0, 5.0, (40, 50))
    mask = rng.random((40, 50)) < 0.2
    points = np.array([3, 4, 45, 6, 40, 35], np.float64)

    # oracle: reference's exact formulation
    p0 = [points[1], points[0]]
    p1 = [points[3], points[2]]
    p2 = [points[5], points[4]]
    d0 = np.append(p0, depth[int(p0[0]), int(p0[1])])
    d1 = np.append(p1, depth[int(p1[0]), int(p1[1])])
    d2 = np.append(p2, depth[int(p2[0]), int(p2[1])])
    a, b, v = d0 - d1, d2 - d1, d1
    y_axis, x_axis = np.where(mask)
    all_pixels = np.array(list(zip(y_axis, x_axis)))
    b_div = b[1] / b[0]
    top = all_pixels[:, 1] - v[1] - all_pixels[:, 0] * b_div + b_div * v[0]
    s = top / (a[1] - a[0] * b_div)
    t = (all_pixels[:, 0] - v[0] - a[0] * s) / b[0]
    want = depth.copy()
    want[all_pixels[:, 0], all_pixels[:, 1]] = v[2] + a[2] * s + b[2] * t

    got = correct_mirror_depth(depth, points, mask)
    np.testing.assert_allclose(got, want, rtol=1e-12)


# ------------------------------------------------------ NYU label masking ---
@pytest.fixture()
def labeled_mat_root(tmp_path):
    rng = np.random.default_rng(4)
    import scipy.io
    n = 2
    scipy.io.savemat(tmp_path / "split.mat", {
        "trainNdxs": np.array([[1]]),
        "testNdxs": np.array([[2]]),
    })
    # 894 -> 40 class map; raw label L maps to mapClass[L-1] after the
    # 0-prepend (nyu_dataloader.py:143).  Make raw 1 -> 19 (mirror),
    # raw 2 -> 9 (window), raw 3 -> 5 (other).
    map_class = np.full(894, 5, np.float64)
    map_class[0] = 19
    map_class[1] = 9
    scipy.io.savemat(tmp_path / "classMapping40.mat",
                     {"mapClass": map_class.reshape(1, -1)})
    with h5py.File(tmp_path / "nyu_depth_v2_labeled_corrected.mat", "w") as f:
        f["images"] = rng.integers(0, 256, (n, 3, 640, 480), dtype=np.uint8)
        f["depths"] = rng.uniform(0.5, 9.5, (n, 640, 480)).astype(np.float32)
        labels = np.full((n, 640, 480), 3, np.uint16)
        labels[:, :100, :] = 1        # mirror stripe
        labels[:, 100:200, :] = 2     # window stripe
        f["labels"] = labels
    return tmp_path


def test_no_mirror_no_window_masks_depth(labeled_mat_root):
    from md_rdm_tpu.data.nyu import NYUDataset

    ds = NYUDataset(str(labeled_mat_root), dataset_type="no_mirror_no_window",
                    split="train", output_size=(226, 226))
    rgb, depth = ds.get_raw(0)
    lab = ds.labels_40(0)
    assert (depth[lab == 19] == 0).all()     # mirrors zeroed
    assert (depth[lab == 9] == 0).all()      # windows zeroed
    assert (depth[lab == 5] > 0).all()       # everything else intact


def test_no_mirror_requires_mapping(tmp_path):
    import scipy.io

    scipy.io.savemat(tmp_path / "split.mat", {
        "trainNdxs": np.array([[1]]), "testNdxs": np.array([[1]])})
    with h5py.File(tmp_path / "nyu_depth_v2_labeled_corrected.mat", "w") as f:
        f["images"] = np.zeros((1, 3, 640, 480), np.uint8)
        f["depths"] = np.ones((1, 640, 480), np.float32)
    from md_rdm_tpu.data.nyu import NYUDataset

    with pytest.raises(RuntimeError, match="classMapping40"):
        NYUDataset(str(tmp_path), dataset_type="no_mirror", split="train")
