"""Real-TPU parity drive for the padded-layout sampler scan.

Runs the flagship head's fused Pallas sampling path (whole-step
fused_sampler_step carry, ops/fused_denoiser.py) against the jnp path at a
tiny upsample_add head config — forward and the full parameter-grad tree —
on the real chip (Mosaic lowering, not interpret mode), then repeats the
fused grads with the u4 residual budget forced to 0 so the backward's
fb-link recompute path (save_u4=False, the flagship train configuration)
is exercised on hardware too.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python tools/tpu_padded_check.py
Prints PADDED_SCAN_PARITY_OK on success; part of the /verify drive recipe.
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np
import jax
import jax.numpy as jnp

print("backend:", jax.default_backend(), jax.devices(), flush=True)

from diffusiondepth_tpu.models.heads.ddim_head import DDIMDepthEstimateHead
from diffusiondepth_tpu.ops import fused_denoiser

B, GH, GW = 2, 32, 48
rng = np.random.RandomState(0)
fp = [
    jnp.asarray(rng.randn(B, 16, 24, 32), jnp.bfloat16),
    jnp.asarray(rng.randn(B, 8, 12, 64), jnp.bfloat16),
]
gt = jnp.asarray(np.clip(rng.rand(B, GH, GW, 1) * 8 + 1, 0, 10), jnp.float32)
init_lat = jnp.asarray(rng.randn(B, 16, 24, 16), jnp.float32)


def make(use_fused):
    return DDIMDepthEstimateHead(
        in_channels=(32, 64), fpn_dim=32, depth_feature_dim=16,
        inference_steps=4, fuse="upsample_add", dtype=jnp.bfloat16,
        use_fused_denoiser=use_fused,
    )


head_j = make(False)
vs = head_j.init(jax.random.PRNGKey(0), fp, gt_depth_map=gt,
                 init_latent=init_lat)
head_f = make(True)


@jax.jit
def fwd_f(vs):
    return head_f.apply(vs, fp, gt_depth_map=gt, init_latent=init_lat)["pred"]


@jax.jit
def fwd_j(vs):
    return head_j.apply(vs, fp, gt_depth_map=gt, init_latent=init_lat)["pred"]


pf = np.asarray(fwd_f(vs), np.float32)
pj = np.asarray(fwd_j(vs), np.float32)
rel = np.abs(pf - pj).max() / (np.abs(pj).max() + 1e-8)
print("fwd rel-max diff (fused vs jnp):", rel, flush=True)
assert np.isfinite(pf).all()
assert rel < 0.12, rel  # fused-vs-jnp bf16 noise through 4 DDIM steps + decode


def loss_of(head, train=False):
    def loss(params):
        v = {**vs, "params": params}
        if train:
            # train=True drives the whole-step PAIR path (the u4 gate's
            # home); train=False grads flow through the eval grouped-flat
            # path's closed-form VJP instead
            out, _ = head.apply(v, fp, gt_depth_map=gt, init_latent=init_lat,
                                train=True,
                                rngs={"diffusion": jax.random.PRNGKey(1)},
                                mutable=["batch_stats"])
        else:
            out = head.apply(v, fp, gt_depth_map=gt, init_latent=init_lat)
        return jnp.mean(jnp.square(out["pred"].astype(jnp.float32)))
    return loss


def dist(a, b):
    a = np.asarray(a, np.float32).ravel()
    b = np.asarray(b, np.float32).ravel()
    return float(np.sqrt(np.mean((a - b) ** 2)) / (np.sqrt(np.mean(b ** 2)) + 1e-8))


def compare_grads(gf, gj, tag):
    # global scale: bias grads are near-cancelling global sums whose
    # RELATIVE distance explodes when the reference value is ~0 — judge
    # those against the tree-wide gradient scale instead
    flat_j = jax.tree_util.tree_flatten(gj)[0]
    gscale = float(np.sqrt(np.mean(np.concatenate(
        [np.asarray(v, np.float32).ravel() ** 2 for v in flat_j]))))
    bad = []
    for (k, va), (_, vb) in zip(
        jax.tree_util.tree_flatten_with_path(gf)[0],
        jax.tree_util.tree_flatten_with_path(gj)[0],
    ):
        ks = jax.tree_util.keystr(k)
        d = dist(va, vb)
        bn = float(np.sqrt(np.mean(np.asarray(vb, np.float32) ** 2)))
        if not np.isfinite(np.asarray(va, np.float32)).all():
            bad.append((ks, "nonfinite"))
        elif d > 0.35 and bn > 0.01 * gscale:
            bad.append((ks, d, "rms", bn, "scale", gscale))
    print(f"[{tag}] grad tree compared;",
          "worst offenders:" if bad else "all within tol", bad[:8], flush=True)
    assert not bad, (tag, bad)


# eval-path grads (grouped-flat carry + closed-form DDIM VJP)
gj_e = jax.jit(jax.grad(loss_of(head_j)))(vs["params"])
gf_e = jax.jit(jax.grad(loss_of(head_f)))(vs["params"])
compare_grads(gf_e, gj_e, "eval flat path grads")

# train-path grads (whole-step pair custom_vjp, u4 gate on/off)
gj = jax.jit(jax.grad(loss_of(head_j, train=True)))(vs["params"])
gf = jax.jit(jax.grad(loss_of(head_f, train=True)))(vs["params"])
compare_grads(gf, gj, "save_u4 on (tiny shapes fit the budget)")

# force the residual gate off: the backward recomputes the fb link instead
# of consuming the stacked u4 — the flagship train shape's configuration
budget = fused_denoiser.U4_STACK_BUDGET_BYTES
try:
    fused_denoiser.U4_STACK_BUDGET_BYTES = 0
    gf0 = jax.jit(jax.grad(loss_of(head_f, train=True)))(vs["params"])
finally:
    fused_denoiser.U4_STACK_BUDGET_BYTES = budget
compare_grads(gf0, gj, "save_u4 off (budget forced 0)")
# the recomputed u4 is the same kernel on the same inputs: bitwise equal
for (k, va), (_, vb) in zip(
    jax.tree_util.tree_flatten_with_path(gf0)[0],
    jax.tree_util.tree_flatten_with_path(gf)[0],
):
    np.testing.assert_array_equal(
        np.asarray(va, np.float32), np.asarray(vb, np.float32),
        err_msg=jax.tree_util.keystr(k))
print("save_u4 on/off grads bitwise equal", flush=True)

# u5 residual layout gate (padded vs flat save): same values either way,
# so grads must be BITWISE equal too (r5, u5_pad_stack_fits)
budget5 = fused_denoiser.U5_PAD_BUDGET_BYTES
try:
    fused_denoiser.U5_PAD_BUDGET_BYTES = 0
    gf5 = jax.jit(jax.grad(loss_of(head_f, train=True)))(vs["params"])
finally:
    fused_denoiser.U5_PAD_BUDGET_BYTES = budget5
for (k, va), (_, vb) in zip(
    jax.tree_util.tree_flatten_with_path(gf5)[0],
    jax.tree_util.tree_flatten_with_path(gf)[0],
):
    np.testing.assert_array_equal(
        np.asarray(va, np.float32), np.asarray(vb, np.float32),
        err_msg=jax.tree_util.keystr(k))
print("u5 padded/flat residual grads bitwise equal", flush=True)

print("PADDED_SCAN_PARITY_OK", flush=True)
