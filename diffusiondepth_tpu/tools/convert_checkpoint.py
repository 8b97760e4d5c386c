"""CLI: reference PyTorch checkpoint -> framework msgpack checkpoint.

One command takes a released reference ``model_EEEEE.pt`` (or any torch
save of the same layouts: official/mmcv Swin, mmbev ResNet, MPViT, NLSPN,
full Diffusion_DCbase_ models — utils/convert_torch_checkpoint.py) to a
checkpoint this framework's ``--pretrain``, ``tools/export_model.py`` and
``tools/eval_parity.py`` consume directly. The model flags mirror main.py
so the conversion is pinned to an explicit architecture; initialization
runs at a small fixed resolution because every parameter shape here is
resolution-independent (relative-position Swin tables, fixed-size level
embeds, conv kernels).

CLI:  python -m diffusiondepth_tpu.tools.convert_checkpoint \
          --torch model_00022.pt --out_dir converted/ [--epoch 0] \
          --model_name Diffusion_DCbase_ --backbone_module swin \
          --backbone_name swin_large_naive_l4w722422k \
          --head_specify DDIMDepthEstimate_Swin_ADDHAHI [...main.py flags]
"""

from __future__ import annotations

import argparse
import sys
from types import SimpleNamespace

import numpy as np


# swin depths per registered backbone (for the stage-boundary key remap)
_SWIN_DEPTHS = {
    "swin_tiny": (2, 2, 6, 2),
    "swin_micro": (1, 1, 2, 1),
}


def main(argv=None):
    p = argparse.ArgumentParser(
        description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter
    )
    p.add_argument("--torch", required=True, dest="torch_path",
                   help="reference .pt checkpoint")
    p.add_argument("--out_dir", required=True)
    p.add_argument("--epoch", type=int, default=0,
                   help="epoch stamp for the output name model_EEEEE.ckpt")
    args, model_flags = p.parse_known_args(argv)

    import jax

    from ..config import parse_args
    from ..models import build_model
    from ..utils.checkpoint import save_checkpoint
    from ..utils.convert_torch_checkpoint import load_reference_checkpoint

    cfg = parse_args(model_flags)
    model = build_model(cfg)

    # init at a tiny fixed resolution: parameter shapes are
    # resolution-independent, and this keeps Swin-L init off the hot path
    b, h, w = 1, 64, 96
    gt = np.full((b, h, w, 1), 5.0, np.float32)
    batch = {
        "rgb": np.zeros((b, h, w, 3), np.float32),
        "dep": gt, "gt": gt, "depth_map": gt,
        "depth_mask": np.ones_like(gt),
    }
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "diffusion": jax.random.PRNGKey(1)},
        batch, train=False,
    )

    init_flat = _flat(variables["params"])
    swin_depths = _SWIN_DEPTHS.get(cfg.backbone_name, (2, 2, 18, 2))
    new_vars = load_reference_checkpoint(
        args.torch_path, variables, swin_depths=swin_depths
    )
    replaced = sum(
        1 for k, v in _flat(new_vars["params"]).items()
        if k not in init_flat or not np.array_equal(np.asarray(v),
                                                    np.asarray(init_flat[k]))
    )
    total = len(init_flat)

    state = SimpleNamespace(
        params=new_vars["params"],
        batch_stats=new_vars.get("batch_stats", {}),
        step=0,
    )
    path = save_checkpoint(args.out_dir, args.epoch, state, cfg)
    print(f"converted {args.torch_path} -> {path} "
          f"({replaced}/{total} param leaves replaced)")
    if replaced == 0:
        print("WARNING: no leaves replaced — checkpoint layout not recognized",
              file=sys.stderr)
        return 1
    return 0


def _flat(tree):
    import flax

    return flax.traverse_util.flatten_dict(flax.core.unfreeze(tree), sep="/")


if __name__ == "__main__":
    sys.exit(main())
