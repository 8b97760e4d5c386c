"""KITTI raw -> depth-completion layout reorganizer.

Re-implements the reference's prep script (utils/prepare_KITTI_DP.py:45-100):
for each drive sequence under the depth-completion train/val tree, copies the
matching raw-KITTI stereo images (image_02/image_03), oxts poses, and the
three calibration files next to the projected depths, producing the layout
the KITTIDC dataset reader expects.

Run:
  python -m diffusiondepth_tpu.tools.prepare_kitti \\
      --path_root_dc /data/kitti_depth --path_root_raw /data/kitti_raw
"""

from __future__ import annotations

import argparse
import os
import shutil

CALIB_FILES = (
    "calib_cam_to_cam.txt",
    "calib_imu_to_velo.txt",
    "calib_velo_to_cam.txt",
)


def reorganize(path_root_dc: str, path_root_raw: str, use_symlink: bool = False):
    assert os.path.isdir(path_root_dc), path_root_dc
    assert os.path.isdir(path_root_raw), path_root_raw

    copy_tree = (
        (lambda s, d: os.symlink(os.path.abspath(s), d))
        if use_symlink else shutil.copytree
    )

    for split in ("train", "val"):
        path_dc = os.path.join(path_root_dc, split)
        assert os.path.isdir(path_dc), path_dc
        for seq in sorted(os.listdir(path_dc)):
            date = seq[:10]  # drive name starts with its date directory
            src = os.path.join(path_root_raw, date, seq)
            dst = os.path.join(path_dc, seq)
            try:
                for sub in ("image_02", "image_03", "oxts"):
                    if not os.path.exists(os.path.join(dst, sub)):
                        print(f"copy {src}/{sub} -> {dst}/{sub}")
                        copy_tree(os.path.join(src, sub), os.path.join(dst, sub))
                for calib in CALIB_FILES:
                    target = os.path.join(dst, calib)
                    if not os.path.exists(target):
                        shutil.copy2(os.path.join(path_root_raw, date, calib), target)
            except OSError as e:
                print(f"failed for {seq}: {e}; skipping")
                continue
        print(f"reorganization for {split} finished")


def main(argv=None):
    p = argparse.ArgumentParser(description="KITTI DC reorganizer")
    p.add_argument("--path_root_dc", type=str, required=True,
                   help="depth-completion dataset root")
    p.add_argument("--path_root_raw", type=str, required=True,
                   help="raw KITTI root")
    p.add_argument("--symlink", action="store_true",
                   help="symlink instead of copying (saves disk)")
    args = p.parse_args(argv)
    reorganize(args.path_root_dc, args.path_root_raw, args.symlink)


if __name__ == "__main__":
    main()
