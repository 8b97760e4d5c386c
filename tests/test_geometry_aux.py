"""Tests for geometry ops (frustum/unprojection/lidar projection), refine
losses, ip_basic densification, and the biased SI timestep schedule
(reference: src/model/ops/depth_map_to_points.py, project_lidar_to_cam.py,
src/model/head/mmbev_base_depth_refine.py:137-244, src/model/ops/ip_basic.py,
src/model/diffusers/schedulers/scheduling_ddim_si.py)."""

import jax.numpy as jnp
import numpy as np
import pytest

from diffusiondepth_tpu.data.ip_basic import fill_in_fast, fill_in_multiscale
from diffusiondepth_tpu.diffusion.ddim import DDIMSchedule
from diffusiondepth_tpu.losses.refine_losses import (
    depth_smooth_loss,
    l1_depth_loss,
    shape_reg_loss,
)
from diffusiondepth_tpu.ops.geometry import (
    convert_depth_map_to_points,
    create_frustum,
    get_geometry,
    pad_constants,
    pad_ones,
    pad_zeros,
    project_lidar_to_cam,
)


# ------------------------------------------------------------- frustum/geom
def _identity_cams(b=1, n=1):
    rots = jnp.broadcast_to(jnp.eye(3), (b, n, 3, 3))
    trans = jnp.zeros((b, n, 3))
    intrins = jnp.broadcast_to(
        jnp.asarray([[100.0, 0, 32.0], [0, 100.0, 24.0], [0, 0, 1.0]]), (b, n, 3, 3)
    )
    post_rots = jnp.broadcast_to(jnp.eye(3), (b, n, 3, 3))
    post_trans = jnp.zeros((b, n, 3))
    return rots, trans, intrins, post_rots, post_trans


def test_unprojection_roundtrips_pinhole():
    """A pixel at the principal point unprojects to (0, 0, depth)."""
    h, w = 48, 64
    depth = jnp.full((1, 1, 1, h, w), 5.0)
    rots, trans, intrins, post_rots, post_trans = _identity_cams()
    frustum = create_frustum(depth, (h, w), 1)
    geom = get_geometry(frustum, rots, trans, intrins, post_rots, post_trans)
    # principal point (x=32, y=24)
    pt = np.asarray(geom[0, 0, 0, 24, 32])
    np.testing.assert_allclose(pt, [0.0, 0.0, 5.0], atol=1e-5)
    # a pixel 10px right of center at depth 5, f=100 -> x = 0.5
    pt2 = np.asarray(geom[0, 0, 0, 24, 42])
    np.testing.assert_allclose(pt2, [0.5, 0.0, 5.0], atol=1e-5)


def test_project_unproject_consistency():
    """Unprojected points re-project to their source pixels."""
    h, w = 32, 48
    rng = np.random.RandomState(0)
    depth = jnp.asarray(rng.rand(1, 1, 1, h, w).astype(np.float32) * 50 + 1)
    rots, trans, intrins, post_rots, post_trans = _identity_cams()
    pts = convert_depth_map_to_points(
        depth, (h, w), 1, rots, trans, intrins, post_rots, post_trans
    )[0]
    uv, d, valid = project_lidar_to_cam(
        pts, rots[0], trans[0], intrins[0], post_rots[0, 0], post_trans[0, 0],
        height=h, width=w,
    )
    xs = np.tile(np.arange(w), h).astype(np.float32)
    ys = np.repeat(np.arange(h), w).astype(np.float32)
    got = np.asarray(uv[0])
    assert np.asarray(valid).mean() > 0.9
    m = np.asarray(valid[0])
    np.testing.assert_allclose(got[m, 0], xs[m], atol=1e-2)
    np.testing.assert_allclose(got[m, 1], ys[m], atol=1e-2)


def test_pad_helpers():
    a = jnp.ones((2, 3))
    assert pad_ones(a, 0).shape == (3, 3)
    assert pad_zeros(a, 1, 2).shape == (2, 5)
    out = pad_constants(a, 7.0, 0, 1)
    assert float(out[-1, 0]) == 7.0


# ------------------------------------------------------------ refine losses
def test_l1_depth_loss_masked():
    pred = jnp.ones((1, 4, 4, 1)) * 3.0
    gt = jnp.zeros((1, 4, 4, 1)).at[0, 1, 1, 0].set(5.0)
    loss = l1_depth_loss(pred, gt)
    np.testing.assert_allclose(float(loss), 2.0, rtol=1e-6)


def test_depth_smooth_loss_zero_for_constant():
    pred = jnp.full((1, 8, 8, 1), 4.0)
    img = jnp.zeros((1, 16, 16, 3))
    assert float(depth_smooth_loss(pred, img)) == pytest.approx(0.0, abs=1e-7)
    # non-constant depth on a flat image -> positive
    pred2 = pred.at[0, :, 4:, 0].set(8.0)
    assert float(depth_smooth_loss(pred2, img)) > 0


def test_shape_reg_loss_inside_box_is_zero():
    h, w = 8, 8
    depth = jnp.full((1, h, w, 1), 5.0)
    rots, trans, intrins, post_rots, post_trans = _identity_cams()
    fg = jnp.ones((1, h, w, 1))
    # a huge box centred at (0, 0, 5) -> all points inside -> loss 0
    boxes = jnp.asarray([[[0.0, 0.0, 0.0, 100.0, 100.0, 10.0, 0.0]]])
    valid = jnp.asarray([[True]])
    loss = shape_reg_loss(depth, fg, boxes, valid, rots, trans, intrins,
                          post_rots, post_trans, (h, w), 1)
    np.testing.assert_allclose(float(loss), 0.0, atol=1e-6)
    # a tiny faraway box -> positive
    boxes2 = jnp.asarray([[[50.0, 50.0, 50.0, 0.1, 0.1, 0.1, 0.3]]])
    loss2 = shape_reg_loss(depth, fg, boxes2, valid, rots, trans, intrins,
                           post_rots, post_trans, (h, w), 1)
    assert float(loss2) > 1.0


# ----------------------------------------------------------------- ip_basic
def _sparse_depth(h=64, w=96, seed=0):
    rng = np.random.RandomState(seed)
    d = np.zeros((h, w), np.float32)
    ys, xs = rng.randint(0, h, 600), rng.randint(0, w, 600)
    d[ys, xs] = rng.uniform(1.0, 70.0, 600).astype(np.float32)
    return d


def test_fill_in_fast_densifies():
    d = _sparse_depth()
    out = fill_in_fast(d, max_depth=100.0)
    assert out.shape == d.shape
    assert (out > 0.1).mean() > 0.9
    assert out.max() <= 100.0 and np.all(np.isfinite(out))


def test_fill_in_multiscale_densifies():
    d = _sparse_depth()
    out, _ = fill_in_multiscale(d, max_depth=100.0)
    assert (out > 0.1).mean() > 0.9
    # dilation keeps values inside the input depth range (min-depth biased -
    # the same behaviour as fill_in_fast on sparse random input)
    assert 0.0 <= out.min() and out.max() <= d.max() + 1.0
    out_fast = fill_in_fast(d, max_depth=100.0)
    valid = d > 0.1
    assert out[valid].mean() == pytest.approx(out_fast[valid].mean(), rel=0.25)


# ---------------------------------------------------------- biased schedule
def test_biased_timesteps_match_reference_table():
    sched = DDIMSchedule(num_train_timesteps=1000)
    t = sched.biased_timesteps(20)
    expected = [999, 500, 250, 125, 80, 50, 35, 20, 15, 12,
                9, 8, 7, 6, 5, 4, 3, 2, 1, 0]
    assert t.tolist() == expected


def test_biased_tables_prev_is_list_predecessor():
    sched = DDIMSchedule(num_train_timesteps=1000)
    tables = sched.inference_tables(20, sched.biased_timesteps(20))
    acp = sched.alphas_cumprod
    # prev of 999 is 500 (reference scheduling_ddim_si.py:308)
    np.testing.assert_allclose(float(tables.alpha_prod_prev[0]), acp[500])
    # final step: prev -> final_alpha_cumprod (reference wraps to 999; fixed)
    np.testing.assert_allclose(float(tables.alpha_prod_prev[-1]), 1.0)


def test_uniform_tables_unchanged_by_next_entry_rule():
    sched = DDIMSchedule(num_train_timesteps=1000)
    tables = sched.inference_tables(20)
    ts = np.asarray(tables.timesteps)
    acp = sched.alphas_cumprod
    np.testing.assert_allclose(
        np.asarray(tables.alpha_prod_prev[:-1]), acp[ts[:-1] - 50], rtol=1e-6
    )
    np.testing.assert_allclose(float(tables.alpha_prod_prev[-1]), 1.0)
