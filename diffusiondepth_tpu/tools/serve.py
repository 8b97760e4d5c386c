"""Batch serving from an exported artifact — no model-building code needed.

Completes the deployment story started by ``tools/export_model.py``: a
serving host needs only (a) the ``.jaxport`` artifact, (b) the msgpack
checkpoint, and (c) this file — no registries, no flax modules, no config
system. Reads RGB (+ optional sparse-depth) PNGs, batches them to the
artifact's fixed batch size (padding the ragged tail by repetition, then
dropping the pad), runs the exported predict step, and writes
KITTI-submission ``uint16(round(pred * 256))`` PNGs (the reference's
submission format, src/summary/diffusion_dcbase_summary.py:166-186; same
writer as summary/diffusion_dcbase_summary.py here).

Input conventions match the KITTI data layer (data/kittidc.py): RGB uint8
PNGs normalized like torchvision ToTensor (/255, NO ImageNet mean/std — the
reference never normalizes beyond ToTensor), 16-bit depth PNGs decoded as
value/256 meters. Images must already be at the artifact's HxW (crop/resize
is a capture-side concern for fixed-shape TPU serving).

CLI:  python -m diffusiondepth_tpu.tools.serve \
          --artifact model.jaxport --ckpt model_00030.ckpt \
          --rgb_dir imgs/ [--dep_dir sparse/] --out_dir preds/ [--seed 0]
"""

from __future__ import annotations

import argparse
import os
import sys
from typing import List, Optional

import numpy as np


def _load_rgb(path: str) -> np.ndarray:
    from PIL import Image

    img = np.asarray(Image.open(path).convert("RGB"), np.uint8)
    return img.astype(np.float32) / 255.0


def _load_dep(path: str) -> np.ndarray:
    from PIL import Image

    d = np.asarray(Image.open(path))
    assert d.dtype in (np.uint16, np.int32, np.uint8), d.dtype
    return (d.astype(np.float32) / 256.0)[..., None]


def _write_pred(path: str, pred: np.ndarray) -> None:
    from PIL import Image

    arr = (np.clip(np.asarray(pred[..., 0], np.float32), 0, 255) * 256.0)
    Image.fromarray(arr.astype(np.uint16)).save(path)


def serve_dir(
    artifact: str,
    ckpt: str,
    rgb_dir: str,
    out_dir: str,
    dep_dir: Optional[str] = None,
    seed: int = 0,
) -> List[str]:
    """Run the artifact over every PNG in ``rgb_dir``; returns output paths."""
    import jax
    import jax.numpy as jnp
    from flax import serialization

    from .export_model import load_exported

    exported = load_exported(artifact)
    with open(ckpt, "rb") as f:
        payload = serialization.msgpack_restore(f.read())
    variables = {"params": payload["params"],
                 "batch_stats": payload.get("batch_stats", {})}

    # the artifact's input spec fixes (B, H, W): the rgb input is the largest
    # (..., 3) rank-4 aval (a conv kernel with 3 output channels would be
    # orders of magnitude smaller than an image batch)
    candidates = [a.shape for a in exported.in_avals
                  if len(a.shape) == 4 and a.shape[-1] == 3]
    assert candidates, "artifact has no (B,H,W,3) rgb input"
    B, H, W, _ = max(candidates, key=lambda s: int(np.prod(s)))

    names = sorted(n for n in os.listdir(rgb_dir) if n.endswith(".png"))
    if not names:
        raise FileNotFoundError(f"no .png files in {rgb_dir}")
    os.makedirs(out_dir, exist_ok=True)
    rng = jax.random.PRNGKey(seed)

    written = []
    for i0 in range(0, len(names), B):
        chunk = names[i0 : i0 + B]
        pad = B - len(chunk)
        padded = chunk + [chunk[-1]] * pad  # ragged tail: repeat last frame
        rgb = np.stack([_load_rgb(os.path.join(rgb_dir, n)) for n in padded])
        assert rgb.shape[1:3] == (H, W), (
            f"input {rgb.shape[1:3]} != artifact {H}x{W}")
        if dep_dir is not None:
            dep = np.stack(
                [_load_dep(os.path.join(dep_dir, n)) for n in padded])
        else:
            dep = np.zeros((B, H, W, 1), np.float32)
        batch = {
            "rgb": jnp.asarray(rgb),
            "dep": jnp.asarray(dep),
            "gt": jnp.asarray(dep),
            "depth_map": jnp.asarray(dep),
            "depth_mask": jnp.asarray((dep > 0).astype(np.float32)),
        }
        pred = np.asarray(
            exported.call(variables, batch, jax.random.fold_in(rng, i0))
        )
        for j, name in enumerate(chunk):
            out_path = os.path.join(out_dir, name)
            _write_pred(out_path, pred[j])
            written.append(out_path)
    return written


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--artifact", required=True, help=".jaxport file")
    p.add_argument("--ckpt", required=True, help="msgpack checkpoint")
    p.add_argument("--rgb_dir", required=True)
    p.add_argument("--dep_dir", default=None,
                   help="optional sparse-depth 16-bit PNGs (same filenames)")
    p.add_argument("--out_dir", required=True)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)
    written = serve_dir(args.artifact, args.ckpt, args.rgb_dir, args.out_dir,
                        dep_dir=args.dep_dir, seed=args.seed)
    print(f"wrote {len(written)} predictions to {args.out_dir}")


if __name__ == "__main__":
    sys.exit(main())
