"""AOT export of the inference step for serving (jax.export / StableHLO).

The reference has no deployment story: inference means carrying the whole
training repo and running ``src/main.py`` with ``--test_only`` (reference
src/main.py:404-491). A TPU-native framework serves differently: trace and
lower the jitted predict step ONCE, serialize the result (StableHLO with any
embedded Mosaic/Pallas custom calls), and run it from any JAX runtime with
no model-building Python, no registries, and no flax on the serving host.

Artifact contract
-----------------
``export_predict`` exports ``predict(variables, batch, rng) -> pred`` with
the weights as *arguments* (not baked-in constants), so one artifact serves
any checkpoint of the same architecture and the weights keep riding the
framework's msgpack checkpoints. The serialized bytes round-trip through
:func:`save_exported` / :func:`load_exported`; ``Exported.call`` re-traces
into any outer jit, so serving hosts can shard it with their own mesh.

CLI:  python -m diffusiondepth_tpu.tools.export_model \
          --ckpt experiments/.../model_00010.ckpt --out model.jaxport \
          --batch_size 1 --height 352 --width 1216 [--tta]
"""

from __future__ import annotations

import argparse
import sys
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import export as jax_export

from ..training.steps import _hflip_batch


def make_predict_fn(model, tta_flip: bool = False):
    """``predict(variables, batch, rng) -> pred`` — the serving forward.

    Unlike ``make_eval_step`` this computes no metrics (a serving batch has
    no ground truth) and returns only the depth map. ``tta_flip`` bakes the
    leaderboard flip-ensemble (reference src/main.py:447-456 protocol) into
    the artifact as one doubled batch.
    """

    def predict(variables, batch: Dict, rng: jax.Array):
        if tta_flip:
            b = batch["rgb"].shape[0]
            flipped = _hflip_batch(batch)
            both = {
                k: (jnp.concatenate([batch[k], flipped[k]], axis=0)
                    if hasattr(batch[k], "ndim") and batch[k].ndim >= 1
                    else batch[k])
                for k in batch
            }
            out = model.apply(variables, both, train=False,
                              rngs={"diffusion": rng})
            return 0.5 * (out["pred"][:b] + jnp.flip(out["pred"][b:], axis=2))
        out = model.apply(variables, batch, train=False,
                          rngs={"diffusion": rng})
        return out["pred"]

    return predict


def serving_batch_spec(batch_size: int, height: int, width: int) -> Dict:
    """The serving input contract (shape specs for tracing): RGB + sparse
    depth + the dense hint map the head sizes its latent from (the
    reference's gt-shaped-latent test quirk needs only the SHAPE, reference
    ddim_depth_estimate_res_swin_addHAHI.py:134 — serving feeds the sparse
    map there)."""
    img = jax.ShapeDtypeStruct((batch_size, height, width, 3), jnp.float32)
    dep = jax.ShapeDtypeStruct((batch_size, height, width, 1), jnp.float32)
    return {"rgb": img, "dep": dep, "gt": dep, "depth_map": dep,
            "depth_mask": dep}


def export_predict(
    model,
    variables,
    batch_spec: Dict,
    *,
    tta_flip: bool = False,
    platforms: Optional[list] = None,
) -> jax_export.Exported:
    """Lower + export the predict step for the given input spec.

    ``platforms`` defaults to the current backend; pass e.g.
    ``["tpu"]`` / ``["cpu"]`` explicitly to cross-export (only valid when
    the lowering contains no platform-specific custom calls — the fused
    Pallas denoiser path auto-disables off-TPU, so CPU artifacts are pure
    StableHLO)."""
    predict = make_predict_fn(model, tta_flip=tta_flip)
    var_spec = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(np.shape(x), x.dtype), variables
    )
    # whatever PRNGKey produces on this jax version (raw uint32[2] or a
    # typed key array) is the artifact's rng input
    rng_spec = jax.eval_shape(lambda: jax.random.PRNGKey(0))
    jitted = jax.jit(predict)
    kwargs = {}
    if platforms is not None:
        kwargs["platforms"] = tuple(platforms)
    return jax_export.export(jitted, **kwargs)(var_spec, batch_spec, rng_spec)


def save_exported(exported: jax_export.Exported, path: str) -> None:
    with open(path, "wb") as f:
        f.write(exported.serialize())


def load_exported(path: str) -> jax_export.Exported:
    with open(path, "rb") as f:
        return jax_export.deserialize(bytearray(f.read()))


def main(argv=None):
    from ..config import Config
    from ..models import build_model
    from ..utils.checkpoint import load_checkpoint

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--ckpt", required=True,
                   help="msgpack checkpoint (with sibling .args.json)")
    p.add_argument("--out", required=True, help="output artifact path")
    p.add_argument("--batch_size", type=int, default=1)
    p.add_argument("--height", type=int, default=352)
    p.add_argument("--width", type=int, default=1216)
    p.add_argument("--tta", action="store_true",
                   help="bake the flip-ensemble into the artifact")
    p.add_argument("--platform", default=None,
                   help="override target platform (tpu/cpu)")
    args = p.parse_args(argv)

    payload = load_checkpoint(args.ckpt)
    if "args" not in payload:
        p.error(f"no args.json next to {args.ckpt}")
    cfg: Config = payload["args"]
    model = build_model(cfg)
    variables = {"params": payload["params"],
                 "batch_stats": payload.get("batch_stats", {})}
    spec = serving_batch_spec(args.batch_size, args.height, args.width)
    exported = export_predict(
        model, variables, spec, tta_flip=args.tta,
        platforms=[args.platform] if args.platform else None,
    )
    save_exported(exported, args.out)
    print(f"exported {cfg.model_name}/{cfg.backbone_name} "
          f"bs{args.batch_size} {args.height}x{args.width} "
          f"platforms={exported.platforms} -> {args.out}")


if __name__ == "__main__":
    sys.exit(main())
