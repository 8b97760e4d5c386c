"""Statistical accuracy-parity evaluation harness (SURVEY.md §7).

Diffusion inference starts from a random latent, so bit-parity with the
reference is undefined; accuracy parity is a *statistical* statement: the
metric spread over N independent latent seeds must bracket the reference's
published numbers (BASELINE.json: RMSE within 1%). This harness runs the
reference evaluation protocol (reference test(), src/main.py:404-491 -
batch 1, gt-sized latents, optional 50-step + flip-ensemble leaderboard
variant README.md:254-257) over N seeds on a converted checkpoint and
reports mean / std / min / max per metric, plus the relative deviation from
reference values when provided.

Usage (all ordinary config flags pass through, plus the harness flags):

  python -m diffusiondepth_tpu.tools.eval_parity \
      --pretrain converted_swin.ckpt --dir_data ../datasets/kitti \
      --data_name KITTIDC --split_json .../kitti_dc.json \
      --backbone_module swin --backbone_name swin_large_naive_l4w722422k \
      --head_specify DDIMDepthEstimate_Swin_ADDHAHI \
      --parity_seeds 3 --parity_reference BASELINE.json#kitti_swin \
      [--inference_steps 50 --tta_flip]

Reference metric values can be given as ``path.json`` holding
``{"RMSE": 0.9801, ...}`` or ``path.json#key`` selecting a sub-dict.
"""

from __future__ import annotations

import argparse
import json
import os
import time
from typing import Dict, List, Optional

import numpy as np

from ..config import Config, build_parser
from ..data import DataLoader, get as get_data
from ..metrics import METRIC_NAMES
from ..models import build_model
from ..parallel.mesh import create_mesh, shard_batch
from ..training.optim import make_optimizer
from ..training.steps import make_eval_step
from ..training.train_state import create_train_state
from ..utils.checkpoint import load_checkpoint, restore_state

RTOL_DEFAULT = 0.01  # BASELINE.json north star: RMSE within 1%


def _load_reference_metrics(spec: str) -> Dict[str, float]:
    path, _, key = spec.partition("#")
    with open(path) as f:
        data = json.load(f)
    if key:
        for part in key.split("."):
            data = data[part]
    return {k: float(v) for k, v in data.items() if k in METRIC_NAMES}


def run_parity_eval(
    cfg: Config,
    n_seeds: int = 3,
    reference_metrics: Optional[Dict[str, float]] = None,
    rtol: float = RTOL_DEFAULT,
) -> Dict:
    """Evaluates the test split ``n_seeds`` times with independent diffusion
    latents and returns the statistical parity report."""
    import jax

    mesh = create_mesh(cfg.mesh_shape)
    data_cls = get_data(cfg)
    ds = data_cls(cfg, "test")
    loader = DataLoader(ds, cfg.test_batch_size, shuffle=False,
                        num_threads=2, seed=cfg.seed)

    model = build_model(cfg)
    tx = make_optimizer(cfg, steps_per_epoch=max(1, len(ds)))
    init_batch = next(iter(loader))
    init_batch = {k: v for k, v in init_batch.items()
                  if isinstance(v, np.ndarray)}
    state = create_train_state(model, tx, init_batch, jax.random.PRNGKey(0))
    if cfg.pretrain:
        state = restore_state(state, load_checkpoint(cfg.pretrain))
        print(f"loaded checkpoint {cfg.pretrain}")

    eval_step = make_eval_step(model, mesh=mesh, tta_flip=cfg.tta_flip)

    per_seed: List[np.ndarray] = []
    for s in range(n_seeds):
        rng = jax.random.PRNGKey(cfg.seed + 1000 * s)
        rows = []
        t0 = time.time()
        for batch in loader:
            rng, e_rng = jax.random.split(rng)
            dbatch = shard_batch(
                {k: v for k, v in batch.items() if isinstance(v, np.ndarray)},
                mesh,
            )
            _, metric_val, _ = eval_step(state, dbatch, e_rng)
            rows.append(np.asarray(metric_val))
        mean_row = np.concatenate(rows, axis=0).mean(axis=0)
        per_seed.append(mean_row)
        line = "  ".join(f"{n}: {v:.4f}" for n, v in zip(METRIC_NAMES, mean_row))
        print(f"seed {s}: {line}  ({time.time() - t0:.1f}s)")

    stack = np.stack(per_seed)  # (n_seeds, 8)
    report: Dict = {
        "protocol": {
            "n_seeds": n_seeds,
            "inference_steps": cfg.inference_steps,
            "tta_flip": cfg.tta_flip,
            "test_batch_size": cfg.test_batch_size,
            "num_samples": len(ds),
        },
        "metrics": {},
    }
    for i, name in enumerate(METRIC_NAMES):
        m = {
            "mean": float(stack[:, i].mean()),
            "std": float(stack[:, i].std()),
            "min": float(stack[:, i].min()),
            "max": float(stack[:, i].max()),
        }
        if reference_metrics and name in reference_metrics:
            ref = reference_metrics[name]
            m["reference"] = ref
            m["rel_dev"] = float((m["mean"] - ref) / ref) if ref else 0.0
            # parity: the reference value within rtol of the seed-mean, with
            # the seed spread as slack for the latent-init randomness
            slack = max(abs(ref) * rtol, 2.0 * m["std"])
            m["within_tolerance"] = bool(abs(m["mean"] - ref) <= slack)
        report["metrics"][name] = m

    if reference_metrics:
        checked = [v for v in report["metrics"].values()
                   if "within_tolerance" in v]
        report["parity"] = bool(checked) and all(
            v["within_tolerance"] for v in checked
        )
    return report


def main(argv=None):
    p = argparse.ArgumentParser(
        description="statistical accuracy-parity evaluation",
        parents=[build_parser()], conflict_handler="resolve", add_help=True,
    )
    p.add_argument("--parity_seeds", type=int, default=3)
    p.add_argument("--parity_reference", type=str, default=None,
                   help="path.json[#key] with reference metric values")
    p.add_argument("--parity_rtol", type=float, default=RTOL_DEFAULT)
    p.add_argument("--parity_out", type=str, default=None,
                   help="where to write the json report")
    ns = p.parse_args(argv)
    harness_keys = ("parity_seeds", "parity_reference", "parity_rtol",
                    "parity_out")
    cfg = Config.from_dict(
        {k: v for k, v in vars(ns).items() if k not in harness_keys}
    )

    ref = (_load_reference_metrics(ns.parity_reference)
           if ns.parity_reference else None)
    report = run_parity_eval(cfg, ns.parity_seeds, ref, ns.parity_rtol)

    print(json.dumps(report, indent=2))
    if ns.parity_out:
        os.makedirs(os.path.dirname(ns.parity_out) or ".", exist_ok=True)
        with open(ns.parity_out, "w") as f:
            json.dump(report, f, indent=2)
        print(f"wrote {ns.parity_out}")
    return report


if __name__ == "__main__":
    main()
