"""Data layer tests: depth decode, calib parse, augmentation geometry,
scanline completion vs a literal re-implementation of the reference
algorithm, loader sharding/batching (reference: src/data/,
src/model/ops/depth_map_proc.py)."""

import json
import os

import numpy as np
import pytest
from PIL import Image

from diffusiondepth_tpu.config import Config
from diffusiondepth_tpu.data import DataLoader, get as get_data
from diffusiondepth_tpu.data.depth_completion import (
    simple_depth_completion_numpy,
)
from diffusiondepth_tpu.data.kittidc import read_calib_file, read_depth


# ---------------------------------------------------------------- fixtures
@pytest.fixture(scope="module")
def kitti_root(tmp_path_factory):
    """Tiny fake KITTI-DC tree (16-bit PNGs + calib + split json)."""
    root = tmp_path_factory.mktemp("kitti")
    rng = np.random.RandomState(0)
    h, w = 96, 320
    entries = []
    for i in range(4):
        d = root / f"train/drive_{i:04d}/image_02/data"
        os.makedirs(d, exist_ok=True)
        rgb = (rng.rand(h, w, 3) * 255).astype(np.uint8)
        Image.fromarray(rgb).save(d / "0000000000.png")

        for sub in ("proj_depth/velodyne_raw/image_02", "proj_depth/groundtruth/image_02"):
            dd = root / f"train/drive_{i:04d}" / sub
            os.makedirs(dd, exist_ok=True)
            depth = np.zeros((h, w), np.uint16)
            ys, xs = rng.randint(0, h, 500), rng.randint(0, w, 500)
            depth[ys, xs] = rng.randint(256, 20000, 500).astype(np.uint16)
            Image.fromarray(depth, mode="I;16").save(dd / "0000000000.png")

        calib = root / f"train/drive_{i:04d}/calib_cam_to_cam.txt"
        p = "7.2154e+02 0.0 6.0956e+02 4.4857e+01 0.0 7.2154e+02 1.7285e+02 2.1638e-01 0.0 0.0 1.0 2.7459e-03"
        calib.write_text(f"P_rect_02: {p}\nP_rect_03: {p}\n")
        entries.append(
            {
                "rgb": f"train/drive_{i:04d}/image_02/data/0000000000.png",
                "depth": f"train/drive_{i:04d}/proj_depth/velodyne_raw/image_02/0000000000.png",
                "gt": f"train/drive_{i:04d}/proj_depth/groundtruth/image_02/0000000000.png",
                "K": f"train/drive_{i:04d}/calib_cam_to_cam.txt",
            }
        )
    split = {"train": entries, "val": entries[:2], "test": entries[:2]}
    # test entries use the single-line intrinsics format
    intr = root / "intrinsics.txt"
    intr.write_text("721.54 0.0 609.56 0.0 721.54 172.85 0.0 0.0 1.0\n")
    split["test"] = [dict(e, K="intrinsics.txt") for e in entries[:2]]
    with open(root / "split.json", "w") as f:
        json.dump(split, f)
    return root


def test_read_depth_png_256(kitti_root):
    p = str(
        kitti_root
        / "train/drive_0000/proj_depth/velodyne_raw/image_02/0000000000.png"
    )
    d = read_depth(p)
    raw = np.array(Image.open(p))
    np.testing.assert_allclose(d, raw.astype(np.float32) / 256.0)


def test_read_calib_file(kitti_root):
    calib = read_calib_file(str(kitti_root / "train/drive_0000/calib_cam_to_cam.txt"))
    assert "P_rect_02" in calib
    K = np.reshape(calib["P_rect_02"], (3, 4))
    assert K[0, 0] == pytest.approx(721.54)


def test_kitti_train_augmented_sample(kitti_root):
    cfg = Config(
        data_name="KITTIDC",
        dir_data=str(kitti_root),
        split_json=str(kitti_root / "split.json"),
        patch_height=64,
        patch_width=192,
        top_crop=10,
        augment=True,
        num_sample=0,
    ).finalize()
    ds = get_data(cfg)(cfg, "train")
    s = ds.__getitem__(0, seed=3)
    assert s["rgb"].shape == (64, 192, 3)
    assert s["gt"].shape == (64, 192, 1)
    assert s["K"].shape == (4,)
    assert np.isfinite(s["rgb"]).all()
    # deterministic per (idx, seed)
    s2 = ds.__getitem__(0, seed=3)
    np.testing.assert_array_equal(s["rgb"], s2["rgb"])
    s3 = ds.__getitem__(0, seed=4)
    assert not np.array_equal(s["rgb"], s3["rgb"])


def test_kitti_test_mode_full_image(kitti_root):
    cfg = Config(
        data_name="KITTIDC",
        dir_data=str(kitti_root),
        split_json=str(kitti_root / "split.json"),
        augment=True,
    ).finalize()
    ds = get_data(cfg)(cfg, "test")
    s = ds.__getitem__(0)
    assert s["rgb"].shape == (96, 320, 3)  # full image at test
    assert s["K"][0] == pytest.approx(721.54)


def test_hflip_fixes_principal_point(kitti_root):
    """K[2] -> width - K[2] under hflip (reference kittidc.py:148-152)."""
    cfg = Config(
        data_name="KITTIDC",
        dir_data=str(kitti_root),
        split_json=str(kitti_root / "split.json"),
        patch_height=64,
        patch_width=192,
        augment=True,
    ).finalize()
    ds = get_data(cfg)(cfg, "train")
    # find two seeds with flip on/off by probing rng stream like the dataset
    import random as pyrandom

    def flip_of(seed):
        rng = pyrandom.Random(seed)
        rng.uniform(1.0, 1.5)
        rng.uniform(-5.0, 5.0)
        return rng.uniform(0.0, 1.0) > 0.5

    seeds = list(range(20))
    s_flip = next(s for s in seeds if flip_of(s))
    s_noflip = next(s for s in seeds if not flip_of(s))
    a = ds.__getitem__(0, seed=s_flip)
    b = ds.__getitem__(0, seed=s_noflip)
    assert a["K"].shape == b["K"].shape == (4,)


# ------------------------------------------------------- scanline completion
def _reference_scanline(depth):
    """Literal port of the reference numba algorithm (depth_map_proc.py:7-52),
    pure python, for parity testing."""
    INF = 1e8
    canvas = depth.astype(np.float32).copy()
    rows, cols = canvas.shape
    dist = np.zeros((rows, cols), np.float32)

    def inner(start, step):
        pos = list(start)
        prev_depth = 0.0
        prev_distance = INF
        step_len = float(np.sqrt(step[0] ** 2 + step[1] ** 2))
        while 0 <= pos[0] < rows and 0 <= pos[1] < cols:
            i = (pos[0], pos[1])
            if canvas[i] == 0:
                canvas[i] = prev_depth
                dist[i] = prev_distance
            else:
                if dist[i] > prev_distance:
                    dist[i] = prev_distance
                    canvas[i] = prev_depth
                prev_depth = canvas[i]
                prev_distance = dist[i]
            prev_distance += step_len
            pos[0] += step[0]
            pos[1] += step[1]

    for c in range(cols):
        inner([0, c], [1, 0])
        inner([rows - 1, c], [-1, 0])
    for r in range(rows):
        inner([r, 0], [0, 1])
        inner([r, cols - 1], [0, -1])
    return canvas, dist


def test_scanline_completion_matches_reference_algorithm():
    rng = np.random.RandomState(0)
    depth = np.zeros((20, 30), np.float32)
    ys, xs = rng.randint(0, 20, 40), rng.randint(0, 30, 40)
    depth[ys, xs] = rng.uniform(1, 50, 40).astype(np.float32)
    ours, dist = simple_depth_completion_numpy(depth)
    ref, ref_dist = _reference_scanline(depth)
    np.testing.assert_allclose(ours, ref, rtol=1e-6)
    assert (ours[depth > 0] == depth[depth > 0]).mean() > 0.9  # mostly preserved
    assert (ours > 0).mean() > 0.95  # filled


def test_scanline_completion_empty_input():
    out, _ = simple_depth_completion_numpy(np.zeros((8, 8), np.float32))
    np.testing.assert_array_equal(out, 0)


# ------------------------------------------------------------- noise filters
# Literal ports of the reference's sparse-LiDAR noise filters
# (depth_map_proc.py:55-113), pure python, for parity testing.


def _ref_noise_filter(sparse, lambda_=1.5, max_age_ratio=60, max_depth=1e9):
    sparse = sparse.astype(np.float32).copy()
    rows, cols = sparse.shape
    dense, _ = simple_depth_completion_numpy(sparse)
    for c in range(cols):
        pre, age = max_depth, 0
        for r in range(rows):
            if dense[r, c] <= pre * lambda_:
                pre, age = dense[r, c], 0
            elif sparse[r, c] >= 0:
                sparse[r, c] = -1
                age += 1
                max_age = max(1, 1 / max(dense[r, c], 1) * max_age_ratio)
                if age >= max_age:
                    age, pre = 0, max_depth
    return sparse


def _ref_noise_filter_0(sparse):
    sparse = sparse.astype(np.float32).copy()
    rows, cols = sparse.shape
    dense, _ = simple_depth_completion_numpy(sparse)
    for c in range(cols):
        pre = dense[0, c]
        for r in range(1, rows):
            if dense[r, c] <= pre:
                pre = dense[r, c]
            else:
                sparse[r, c] = -1
    return sparse


def _ref_noise_filter_2(sparse, thresh=0.6):
    sparse = sparse.astype(np.float32).copy()
    rows, cols = sparse.shape
    dense, _ = simple_depth_completion_numpy(sparse)
    for c in range(cols):
        pre = dense[0, c]
        for r in range(1, rows):
            if dense[r, c] <= pre + thresh:
                pre = dense[r, c]
            else:
                sparse[r, c] = -1
    return sparse


def _ref_noise_filter_3(sparse, size=3, thresh=1.5):
    sparse = sparse.astype(np.float32).copy()
    rows, cols = sparse.shape
    dense, _ = simple_depth_completion_numpy(sparse)
    # cv2.erode, MORPH_RECT (1, size) kernel (width 1 x height size),
    # borderValue=-1, default center anchor — literal min-filter loops.
    anchor = size // 2
    eroded = np.empty_like(dense)
    for r in range(rows):
        for c in range(cols):
            m = np.inf
            for k in range(size):
                rr = r + k - anchor
                v = dense[rr, c] if 0 <= rr < rows else -1.0
                m = min(m, v)
            eroded[r, c] = m
    for r in range(rows):
        for c in range(cols):
            if sparse[r, c] >= 0 and sparse[r, c] > eroded[r, c] + thresh:
                sparse[r, c] = -1
    return sparse


def _sparse_fixture(seed=0, rows=24, cols=18, n=90):
    rng = np.random.RandomState(seed)
    sparse = np.zeros((rows, cols), np.float32)
    ys, xs = rng.randint(0, rows, n), rng.randint(0, cols, n)
    sparse[ys, xs] = rng.uniform(1, 60, n).astype(np.float32)
    return sparse


def test_noise_filter_matches_reference_algorithm():
    from diffusiondepth_tpu.data.depth_completion import simple_noise_filter

    for seed in range(3):
        sparse = _sparse_fixture(seed)
        np.testing.assert_allclose(
            simple_noise_filter(sparse), _ref_noise_filter(sparse), rtol=1e-6
        )
    # non-default params exercise the age budget + tracker reset
    sparse = _sparse_fixture(7, rows=40)
    np.testing.assert_allclose(
        simple_noise_filter(sparse, lambda_=1.1, max_age_ratio=5, max_depth=100.0),
        _ref_noise_filter(sparse, lambda_=1.1, max_age_ratio=5, max_depth=100.0),
        rtol=1e-6,
    )


def test_noise_filter_0_matches_reference_algorithm():
    from diffusiondepth_tpu.data.depth_completion import simple_noise_filter_0

    for seed in range(3):
        sparse = _sparse_fixture(seed)
        np.testing.assert_allclose(
            simple_noise_filter_0(sparse), _ref_noise_filter_0(sparse), rtol=1e-6
        )


def test_noise_filter_2_matches_reference_algorithm():
    from diffusiondepth_tpu.data.depth_completion import simple_noise_filter_2

    for seed in range(3):
        sparse = _sparse_fixture(seed)
        np.testing.assert_allclose(
            simple_noise_filter_2(sparse), _ref_noise_filter_2(sparse), rtol=1e-6
        )
    np.testing.assert_allclose(
        simple_noise_filter_2(_sparse_fixture(5), thresh=2.5),
        _ref_noise_filter_2(_sparse_fixture(5), thresh=2.5),
        rtol=1e-6,
    )


def test_noise_filter_3_matches_reference_algorithm():
    from diffusiondepth_tpu.data.depth_completion import simple_noise_filter_3

    for seed in range(3):
        sparse = _sparse_fixture(seed)
        np.testing.assert_allclose(
            simple_noise_filter_3(sparse), _ref_noise_filter_3(sparse), rtol=1e-6
        )
    # even-sized kernel exercises the size // 2 anchor convention
    np.testing.assert_allclose(
        simple_noise_filter_3(_sparse_fixture(6), size=4, thresh=0.5),
        _ref_noise_filter_3(_sparse_fixture(6), size=4, thresh=0.5),
        rtol=1e-6,
    )


# ------------------------------------------------------------------- loader
def test_loader_sharding_and_batching():
    cfg = Config(data_name="Synthetic", patch_height=32, patch_width=48).finalize()
    ds = get_data(cfg)(cfg, "train")  # 64 samples
    seen = []
    for host in range(2):
        loader = DataLoader(ds, batch_size=4, shuffle=True, drop_last=True,
                            seed=1, host_index=host, host_count=2)
        loader.set_epoch(0)
        assert len(loader) == 8  # 32 per host / 4
        for batch in loader:
            assert batch["rgb"].shape == (4, 32, 48, 3)
            seen.append(batch)
    assert len(seen) == 16


def test_ip_basic_flag_densifies_depth_map():
    """--ip_basic flips on the reference's model-level densification branch
    (diffusion_dcbase_model.py:96-115), applied host-side in the datasets:
    the depth_map the model sees is fill_in_multiscale(clip(dm*mask, 0, 100))
    of the sparse map, so its valid coverage grows while the sparse points'
    depth range is preserved."""
    from diffusiondepth_tpu.data.ip_basic import densify_depth_map

    cfg = Config(data_name="Synthetic", patch_height=64, patch_width=96,
                 ip_basic=True).finalize()
    ds = get_data(cfg)(cfg, "train")
    sample = ds.__getitem__(3, seed=11)

    cfg_off = Config(data_name="Synthetic", patch_height=64, patch_width=96).finalize()
    sparse = get_data(cfg_off)(cfg_off, "train").__getitem__(3, seed=11)

    dm, dm_sparse = sample["depth_map"], sparse["depth_map"]
    assert dm.shape == dm_sparse.shape
    # densified: far more valid pixels than the ~5% sparse input
    assert (dm > 0.1).mean() > 3 * (dm_sparse > 0.1).mean()
    # and exactly the shared helper's output on that sparse map
    expect = densify_depth_map(dm_sparse, sparse["depth_mask"])
    np.testing.assert_allclose(dm, expect)
    # flag exists on the CLI mirror
    from diffusiondepth_tpu.config import parse_args
    assert parse_args(["--ip_basic"]).ip_basic is True
    assert parse_args([]).ip_basic is False


def test_loader_epoch_reshuffle():
    cfg = Config(data_name="Synthetic", patch_height=16, patch_width=16).finalize()
    ds = get_data(cfg)(cfg, "train")
    loader = DataLoader(ds, batch_size=8, shuffle=True, seed=0)
    loader.set_epoch(1)
    b1 = next(iter(loader))
    loader.set_epoch(2)
    b2 = next(iter(loader))
    assert not np.array_equal(b1["rgb"], b2["rgb"])


def test_native_scanline_matches_numpy():
    """C++ engine (native/depthops.cpp) == numpy spec, bit-for-bit semantics."""
    from diffusiondepth_tpu.native import depthops

    if not depthops.available():
        pytest.skip("native depthops not built (no toolchain)")
    rng = np.random.RandomState(1)
    d = np.zeros((60, 80), np.float32)
    ys, xs = rng.randint(0, 60, 300), rng.randint(0, 80, 300)
    d[ys, xs] = rng.uniform(1, 50, 300).astype(np.float32)
    c_native, dist_native = depthops.simple_depth_completion(d)
    c_np, dist_np = simple_depth_completion_numpy(d)
    np.testing.assert_allclose(c_native, c_np, rtol=1e-6)
    np.testing.assert_allclose(dist_native, dist_np, rtol=1e-6)
    # batched variant
    batch = np.stack([d, d[::-1].copy()])
    out = depthops.simple_depth_completion_batch(batch)
    np.testing.assert_allclose(out[0], c_np, rtol=1e-6)
