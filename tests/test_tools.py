"""Dataset-prep tooling tests (reference utils/ scripts)."""

import json
import os

import numpy as np
import pytest
from PIL import Image

from diffusiondepth_tpu.tools.generate_json import (
    generate_kitti_json,
    generate_kitti_test_json,
    generate_nyu_json,
)
from diffusiondepth_tpu.tools.prepare_kitti import reorganize


@pytest.fixture
def kitti_tree(tmp_path):
    root = tmp_path / "kitti"
    img = Image.fromarray(np.zeros((8, 8), np.uint16), mode="I;16")
    for split, seqs in (("train", 2), ("val", 1)):
        for s in range(seqs):
            seq = f"2011_09_26_drive_{s:04d}_sync"
            for cam in ("image_02", "image_03"):
                (root / split / seq / cam / "data").mkdir(parents=True)
                for sub in ("velodyne_raw", "groundtruth"):
                    d = root / split / seq / "proj_depth" / sub / cam
                    d.mkdir(parents=True, exist_ok=True)
                for i in range(3):
                    name = f"{i:010d}.png"
                    img.save(root / split / seq / cam / "data" / name)
                    img.save(root / split / seq / "proj_depth/velodyne_raw" / cam / name)
                    img.save(root / split / seq / "proj_depth/groundtruth" / cam / name)
            (root / split / seq / "calib_cam_to_cam.txt").write_text("P_rect_02: 1\n")
    sel = root / "depth_selection/val_selection_cropped"
    for sub in ("image", "velodyne_raw", "groundtruth_depth", "intrinsics"):
        (sel / sub).mkdir(parents=True)
    for i in range(2):
        base = f"2011_x_{i:010d}_{{}}_0000_img.png"
        img.save(sel / "image" / base.format("image"))
        img.save(sel / "velodyne_raw" / base.format("velodyne_raw"))
        img.save(sel / "groundtruth_depth" / base.format("groundtruth_depth"))
        (sel / "intrinsics" / (base.format("image")[:-4] + ".txt")).write_text("1\n")
    return root


def test_generate_kitti_json(kitti_tree):
    data = generate_kitti_json(str(kitti_tree), seed=1)
    assert len(data["train"]) == 2 * 2 * 3  # seqs x cams x frames
    assert len(data["val"]) == 1 * 2 * 3
    assert len(data["test"]) == 2
    s = data["train"][0]
    assert set(s) == {"rgb", "depth", "gt", "K"}
    for v in s.values():
        assert os.path.exists(kitti_tree / v)
    t = data["test"][0]
    assert "velodyne_raw" in t["depth"] and t["K"].endswith(".txt")


def test_generate_kitti_test_json(kitti_tree):
    """Online-submission (--test_data) split: anonymous prediction images +
    per-image intrinsics, depth/gt pointing at the reference's dummy
    placeholder (reference generate_json_KITTI_DP.py:176-225)."""
    sel = kitti_tree / "depth_selection" / "test_depth_prediction_anonymous"
    (sel / "image").mkdir(parents=True)
    (sel / "intrinsics").mkdir(parents=True)
    img = Image.fromarray(np.zeros((8, 8), np.uint16), mode="I;16")
    for i in range(3):
        img.save(sel / "image" / f"{i:010d}.png")
        (sel / "intrinsics" / f"{i:010d}.txt").write_text("1\n")
    dummy = (kitti_tree / "depth_selection" / "test_depth_completion_anonymous"
             / "velodyne_raw")
    dummy.mkdir(parents=True)
    img.save(dummy / "0000000000.png")

    data = generate_kitti_test_json(str(kitti_tree))
    assert set(data) == {"test"}
    assert len(data["test"]) == 3
    s = data["test"][0]
    assert s["rgb"].endswith("test_depth_prediction_anonymous/image/0000000000.png")
    assert s["depth"] == s["gt"] == (
        "depth_selection/test_depth_completion_anonymous/"
        "velodyne_raw/0000000000.png"
    )
    assert s["K"].endswith("intrinsics/0000000000.txt")
    for v in s.values():
        assert os.path.exists(kitti_tree / v)


def test_generate_kitti_json_caps_and_shuffles(kitti_tree):
    data = generate_kitti_json(str(kitti_tree), num_train=5, seed=1)
    assert len(data["train"]) == 5


def test_generate_nyu_json(tmp_path):
    root = tmp_path / "nyu"
    (root / "val" / "official").mkdir(parents=True)
    for i in range(4):
        (root / "val" / "official" / f"{i:05d}.h5").touch()
    csv_train = tmp_path / "train.csv"
    prefix = "x" * 19
    csv_train.write_text("\n".join(f"{prefix}train/d{i}/{i:05d}.h5" for i in range(40)))
    csv_test = tmp_path / "test.csv"
    csv_test.write_text("")

    data = generate_nyu_json(str(root), str(csv_train), str(csv_test),
                             val_ratio=0.1, seed=3)
    assert len(data["train"]) == 36
    assert len(data["val"]) == 4
    assert len(data["test"]) == 4
    assert data["train"][0]["filename"].startswith("train/")
    assert data["test"][0]["filename"] == "val/official/00000.h5"


def test_prepare_kitti_reorganize(tmp_path):
    raw = tmp_path / "raw"
    dc = tmp_path / "dc"
    seq = "2011_09_26_drive_0001_sync"
    for sub in ("image_02", "image_03", "oxts"):
        (raw / "2011_09_26" / seq / sub).mkdir(parents=True)
        (raw / "2011_09_26" / seq / sub / "f.bin").touch()
    for calib in ("calib_cam_to_cam.txt", "calib_imu_to_velo.txt",
                  "calib_velo_to_cam.txt"):
        (raw / "2011_09_26" / calib).write_text("c\n")
    for split in ("train", "val"):
        (dc / split).mkdir(parents=True)
    (dc / "train" / seq).mkdir()

    reorganize(str(dc), str(raw))
    assert (dc / "train" / seq / "image_02" / "f.bin").exists()
    assert (dc / "train" / seq / "calib_cam_to_cam.txt").exists()
