"""Fused Pallas denoiser chain (ops/fused_denoiser.py) vs the flax module.

Runs the kernels in Pallas interpret mode on the CPU test platform; the same
code compiles via Mosaic on TPU (benchmarked 2.0x the XLA lowering at the
flagship latent shape - see the module docstring).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusiondepth_tpu.models.heads.denoiser import ScheduledCNNRefine
from diffusiondepth_tpu.ops.fused_denoiser import (
    _jnp_chain,
    fused_denoiser_apply,
)


def _setup(B=2, H=16, W=21, C=32, seed=0):
    rng = np.random.RandomState(seed)
    den = ScheduledCNNRefine(
        channels_in=C, channels_noise=16, use_fused=False, dtype=jnp.bfloat16
    )
    lat = jnp.asarray(rng.randn(B, H, W, 16), jnp.bfloat16)
    cond = jnp.asarray(rng.randn(B, H, W, C), jnp.bfloat16)
    vs = den.init(jax.random.PRNGKey(0), lat, 100, cond)
    # randomized params so the GN affines and biases are non-trivial
    leaves, tree = jax.tree_util.tree_flatten(vs["params"])
    leaves = [jnp.asarray(rng.randn(*l.shape) * 0.3, l.dtype) for l in leaves]
    params = jax.tree_util.tree_unflatten(tree, leaves)
    te = params["time_embedding"]["embedding"][100]
    feat = cond + te[None, None, None, :].astype(cond.dtype)
    return den, params, lat, cond, feat


def test_fused_forward_matches_module():
    """Pallas chain (interpret) == flax module forward within bf16 noise."""
    den, params, lat, cond, feat = _setup()
    ref = np.asarray(den.apply({"params": params}, lat, 100, cond), np.float32)
    out = np.asarray(
        fused_denoiser_apply(params, lat, feat, interpret=True), np.float32
    )
    assert out.shape == ref.shape
    rel = np.abs(out - ref).max() / (np.abs(ref).max() + 1e-8)
    assert rel < 0.03, rel
    np.testing.assert_allclose(out, ref, atol=0.12, rtol=0.1)


def test_fused_forward_odd_width_and_batch1():
    """Padding/masking is exact for awkward widths and B=1."""
    den, params, lat, cond, feat = _setup(B=1, H=8, W=13, C=32, seed=3)
    ref = np.asarray(den.apply({"params": params}, lat, 100, cond), np.float32)
    out = np.asarray(
        fused_denoiser_apply(params, lat, feat, interpret=True), np.float32
    )
    np.testing.assert_allclose(out, ref, atol=0.12, rtol=0.1)


def test_jnp_twin_matches_module():
    """The custom-VJP differentiation target is the module's exact math."""
    den, params, lat, cond, feat = _setup(seed=1)
    ref = np.asarray(den.apply({"params": params}, lat, 100, cond), np.float32)
    twin = np.asarray(_jnp_chain(params, lat, feat), np.float32)
    np.testing.assert_allclose(twin, ref, atol=0.06, rtol=0.05)


def _chain_f32(params, lat, feat):
    """Same chain math in f32: the gradient ORACLE. Any bf16 path (the twin's
    autodiff or the Pallas backward kernels) should sit within bf16 noise."""
    from diffusiondepth_tpu.ops.fused_denoiser import _chain_params

    def conv(x, cp):
        y = jax.lax.conv_general_dilated(
            x, cp["kernel"].astype(jnp.float32), (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y + cp["bias"].astype(jnp.float32)[None, None, None, :]

    def gn(x, gp):
        b, c = x.shape[0], x.shape[-1]
        xg = x.reshape(b, -1, 4, c // 4)
        mean = xg.mean(axis=(1, 3), keepdims=True)
        var = ((xg - mean) ** 2).mean(axis=(1, 3), keepdims=True)
        xh = ((xg - mean) * jax.lax.rsqrt(var + 1e-5)).reshape(x.shape)
        return (xh * gp["scale"][None, None, None, :]
                + gp["bias"][None, None, None, :])

    ne0, gn0, ne1, gn1, fa, fb, pr0, gn2, pr1, gn3 = _chain_params(params)
    v1 = jax.nn.relu(gn(conv(lat.astype(jnp.float32), ne0), gn0))
    ne = jax.nn.relu(gn(conv(v1, ne1), gn1))
    u4 = conv(conv(feat.astype(jnp.float32) + ne, fa), fb)
    v5 = jax.nn.relu(gn(conv(u4, pr0), gn2))
    return jax.nn.relu(gn(conv(v5, pr1), gn3))


@pytest.mark.slow
def test_fused_backward_chain_as_accurate_as_twin_autodiff():
    """The hand-written Pallas backward (fused_denoiser_bwd_chain) must sit
    as close to the f32-autodiff oracle as autodiff of the bf16 jnp twin does
    - for the latent/feat cotangents and every conv/GN parameter gradient."""
    from diffusiondepth_tpu.ops.fused_denoiser import (
        _jnp_chain,
        fused_denoiser_bwd_chain,
    )

    den, params, lat, cond, feat = _setup(seed=2)
    ct = jnp.asarray(
        np.random.RandomState(9).randn(*lat.shape) * 0.1, jnp.bfloat16
    )
    _, vjp_tw = jax.vjp(_jnp_chain, params, lat, feat)
    gP, gL, gF = vjp_tw(ct)
    _, vjp32 = jax.vjp(_chain_f32, params, lat, feat)
    oP, oL, oF = vjp32(ct.astype(jnp.float32))
    dP, dL, dF = fused_denoiser_bwd_chain(params, lat, feat, ct,
                                          interpret=True)

    def dist(a, b):
        # RMS distance normalised by the oracle's RMS: robust to the handful
        # of ReLU-kink subgradient flips bf16 forward noise causes (max-norm
        # flags those O(1) single-element flips; an actual indexing/formula
        # bug shows up as RMS of order 1)
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        return float(np.sqrt(np.mean((a - b) ** 2))
                     / (np.sqrt(np.mean(b ** 2)) + 1e-8))

    # kernel chain no worse than 2x the twin's distance (+small abs slack)
    assert dist(dL, oL) < 2 * dist(gL, oL) + 0.05, (dist(dL, oL), dist(gL, oL))
    assert dist(dF, oF) < 2 * dist(gF, oF) + 0.05, (dist(dF, oF), dist(gF, oF))
    o = {jax.tree_util.keystr(k): v
         for k, v in jax.tree_util.tree_flatten_with_path(oP)[0]}
    tw = {jax.tree_util.keystr(k): v
          for k, v in jax.tree_util.tree_flatten_with_path(gP)[0]}
    for k, v in jax.tree_util.tree_flatten_with_path(dP)[0]:
        ks = jax.tree_util.keystr(k)
        if "time_embedding" in ks:
            assert np.all(np.asarray(v) == 0)
            continue
        dk, dt = dist(v, o[ks]), dist(tw[ks], o[ks])
        assert dk < 2 * dt + 0.05, (ks, dk, dt)
        assert np.isfinite(np.asarray(v, np.float32)).all(), ks


@pytest.mark.slow
def test_public_custom_vjp_split_cond_te():
    """The public fused_denoiser takes (cond, te) SEPARATELY (so the sampler
    scan's saved residuals stay small — see its docstring). Its forward must
    equal the feat-based apply, and its VJP — including the dte spatial-sum
    glue — must match autodiff of the jnp twin through feat = cond + te."""
    from diffusiondepth_tpu.ops.fused_denoiser import fused_denoiser

    den, params, lat, cond, feat = _setup(seed=5)
    B = lat.shape[0]
    te = params["time_embedding"]["embedding"][100]
    te_b = jnp.broadcast_to(te[None, :], (B, te.shape[-1]))

    out = fused_denoiser(params, lat, cond, te_b)
    ref = fused_denoiser_apply(params, lat, feat, interpret=True)
    np.testing.assert_array_equal(np.asarray(out, np.float32),
                                  np.asarray(ref, np.float32))

    ct = jnp.asarray(
        np.random.RandomState(11).randn(*lat.shape) * 0.1, jnp.bfloat16
    )

    def twin_split(params, lat, cond, te_b):
        f = cond + te_b[:, None, None, :].astype(cond.dtype)
        return _jnp_chain(params, lat, f)

    _, vjp_k = jax.vjp(fused_denoiser, params, lat, cond, te_b)
    _, vjp_t = jax.vjp(twin_split, params, lat, cond, te_b)
    kP, kL, kC, kT = vjp_k(ct)
    tP, tL, tC, tT = vjp_t(ct)

    def dist(a, b):
        a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
        return float(np.sqrt(np.mean((a - b) ** 2))
                     / (np.sqrt(np.mean(b ** 2)) + 1e-8))

    # two bf16 paths around the same math: mutual RMS distance is bf16 +
    # ReLU-kink noise (kernel-vs-f32-oracle accuracy is covered by
    # test_fused_backward_chain_as_accurate_as_twin_autodiff); this test
    # guards the split-args GLUE — wiring, shapes, and the dte reduction
    assert dist(kL, tL) < 0.25, dist(kL, tL)
    assert dist(kC, tC) < 0.25, dist(kC, tC)
    # dte: ones-dot spatial reduction vs autodiff's broadcast-sum
    assert kT.shape == tT.shape == (B, te.shape[-1])
    assert dist(kT, tT) < 0.25, dist(kT, tT)


def test_public_custom_vjp_per_sample_te():
    """Per-sample te rows (the training ddim_loss call, r5): the link
    kernels index te per batch row, so DISTINCT rows must flow through the
    forward and the per-sample (B, C) dte must match the jnp twin."""
    from diffusiondepth_tpu.ops.fused_denoiser import fused_denoiser

    den, params, lat, cond, _ = _setup(seed=6)
    B = lat.shape[0]
    emb = params["time_embedding"]["embedding"]
    te_b = emb[jnp.asarray([100, 7])][:B]  # distinct row per sample
    assert not np.allclose(np.asarray(te_b[0], np.float32),
                           np.asarray(te_b[1], np.float32))

    def twin_split(params, lat, cond, te_b):
        f = cond + te_b[:, None, None, :].astype(cond.dtype)
        return _jnp_chain(params, lat, f)

    out = fused_denoiser(params, lat, cond, te_b)
    ref = twin_split(params, lat, cond, te_b)
    rel = (np.abs(np.asarray(out, np.float32) - np.asarray(ref, np.float32)).max()
           / (np.abs(np.asarray(ref, np.float32)).max() + 1e-8))
    assert rel < 0.03, rel

    ct = jnp.asarray(
        np.random.RandomState(12).randn(*lat.shape) * 0.1, jnp.bfloat16
    )
    _, vjp_k = jax.vjp(fused_denoiser, params, lat, cond, te_b)
    _, vjp_t = jax.vjp(twin_split, params, lat, cond, te_b)
    kP, kL, kC, kT = vjp_k(ct)
    tP, tL, tC, tT = vjp_t(ct)

    def dist(a, b):
        a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
        return float(np.sqrt(np.mean((a - b) ** 2))
                     / (np.sqrt(np.mean(b ** 2)) + 1e-8))

    assert kT.shape == (B, te_b.shape[-1])
    assert dist(kT, tT) < 0.25, dist(kT, tT)
    assert dist(kL, tL) < 0.25, dist(kL, tL)
    # the per-sample rows must NOT be averaged together
    assert dist(kT[0], tT[0]) < 0.25 and dist(kT[1], tT[1]) < 0.25


def test_module_per_sample_t_takes_fused_path(monkeypatch):
    """The denoiser __call__ gate (r5): a per-sample timestep VECTOR now
    dispatches to the fused chain when fused_active — previously only
    scalar t did, so the training ddim_loss call silently ran the jnp
    path. Asserts dispatch by call count and output/grad agreement."""
    from diffusiondepth_tpu.models.heads import denoiser as den_mod
    from diffusiondepth_tpu.ops import fused_denoiser as fd

    den, params, lat, cond, _ = _setup(seed=7)
    B = lat.shape[0]
    ts = jnp.asarray([100, 7])[:B]

    calls = {"n": 0}
    real = fd.fused_denoiser

    def counting(*a, **kw):
        calls["n"] += 1
        return real(*a, **kw)

    monkeypatch.setattr(fd, "fused_denoiser", counting)
    monkeypatch.setattr(den_mod.ScheduledCNNRefine, "_on_tpu",
                        staticmethod(lambda: True))

    def loss(params, on):
        monkeypatch.setattr(den_mod.ScheduledCNNRefine, "_on_tpu",
                            staticmethod(lambda: on))
        out = den.apply({"params": params}, lat, ts, cond)
        return jnp.mean(jnp.square(out.astype(jnp.float32)))

    # use_fused=False in _setup's module: build one with the gate open
    den_f = den.copy(use_fused=True)

    def loss_f(params, on):
        monkeypatch.setattr(den_mod.ScheduledCNNRefine, "_on_tpu",
                            staticmethod(lambda: on))
        out = den_f.apply({"params": params}, lat, ts, cond)
        return jnp.mean(jnp.square(out.astype(jnp.float32)))

    l_fused, g_fused = jax.value_and_grad(loss_f)(params, True)
    assert calls["n"] >= 1, "per-sample-t call did not reach the fused chain"
    n = calls["n"]
    l_ref, g_ref = jax.value_and_grad(loss_f)(params, False)
    assert calls["n"] == n

    assert abs(float(l_fused) - float(l_ref)) <= 0.03 * abs(float(l_ref)) + 1e-6
    fl_f = jax.tree_util.tree_leaves(g_fused)
    fl_r = jax.tree_util.tree_leaves(g_ref)
    # two bf16 paths around the same math: per-leaf RMS distance (the
    # test_public_custom_vjp_split_cond_te criterion — max-abs on tiny GN
    # leaves just measures bf16 reduction-order noise)
    for a, b in zip(fl_f, fl_r):
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        d = float(np.sqrt(np.mean((a - b) ** 2))
                  / (np.sqrt(np.mean(b ** 2)) + 1e-8))
        # tiny GN/bias vectors accumulate the most reduction-order noise
        # between the flax-module and kernel paths; kernel-vs-oracle
        # accuracy is gated by the dedicated oracle test above
        assert d < (0.25 if a.size > 64 else 0.6), (a.shape, d)


@pytest.mark.parametrize("save_u4,save_u5p",
                         [(True, True), (False, True), (True, False)])
def test_padded_layout_entry_point(save_u4, save_u5p):
    """fused_denoiser_padded (the sampling scan's zero-border layout path)
    must equal the unpadded public op in both forward and VJP: eps/grads come
    back in the padded layout with exactly-zero border columns, and slicing
    recovers the unpadded op's values bit-for-bit (same kernels, same
    inputs). save_u4=False exercises the residual-HBM gate's backward
    recompute of the fb link — bitwise identical, since the saved u4 IS the
    same kernel's output on the same inputs."""
    from diffusiondepth_tpu.ops.fused_denoiser import (
        fused_denoiser,
        fused_denoiser_padded,
        pad_w,
        padded_width,
    )

    den, params, lat, cond, feat = _setup(seed=7)
    B, H, W, _ = lat.shape
    Wp = padded_width(W)
    te = params["time_embedding"]["embedding"][100]
    te_b = jnp.broadcast_to(te[None, :], (B, te.shape[-1]))
    lat_p = pad_w(lat.astype(jnp.float32), Wp)  # f32 like the scan carry
    cond_p = pad_w(cond, Wp)

    out_p = fused_denoiser_padded(W, save_u4, save_u5p, params, lat_p,
                                  cond_p, te_b)
    out = fused_denoiser(params, lat, cond, te_b)
    assert out_p.shape == (B, H, Wp, 16)
    np.testing.assert_array_equal(
        np.asarray(out_p[:, :, 1 : W + 1, :], np.float32),
        np.asarray(out, np.float32),
    )
    # zero-border invariant: the next scan step feeds this straight back in
    border = np.concatenate(
        [np.asarray(out_p[:, :, :1], np.float32),
         np.asarray(out_p[:, :, W + 1 :], np.float32)], axis=2
    )
    np.testing.assert_array_equal(border, np.zeros_like(border))

    ct = jnp.asarray(
        np.random.RandomState(13).randn(B, H, W, 16) * 0.1, jnp.bfloat16
    )
    ct_p = pad_w(ct, Wp)
    _, vjp_p = jax.vjp(
        lambda p, l, c, t: fused_denoiser_padded(W, save_u4, save_u5p,
                                                 p, l, c, t),
        params, lat_p, cond_p, te_b,
    )
    _, vjp_u = jax.vjp(fused_denoiser, params, lat, cond, te_b)
    pP, pL, pC, pT = vjp_p(ct_p)
    uP, uL, uC, uT = vjp_u(ct)

    np.testing.assert_array_equal(
        np.asarray(pL[:, :, 1 : W + 1, :], np.float32),
        np.asarray(uL, np.float32),
    )
    np.testing.assert_array_equal(
        np.asarray(pC[:, :, 1 : W + 1, :], np.float32),
        np.asarray(uC, np.float32),
    )
    # dte sums over H*Wp (zeros in the borders) vs H*W positions: identical
    # terms, but the reduction tree may reassociate — allow f32 noise
    np.testing.assert_allclose(np.asarray(pT, np.float32),
                               np.asarray(uT, np.float32),
                               rtol=1e-5, atol=1e-5)
    # grad borders are exactly zero (masked by the backward kernels)
    for g in (pL, pC):
        gb = np.concatenate(
            [np.asarray(g[:, :, :1], np.float32),
             np.asarray(g[:, :, W + 1 :], np.float32)], axis=2)
        np.testing.assert_array_equal(gb, np.zeros_like(gb))
    for (ka, va), (kb, vb) in zip(
        jax.tree_util.tree_flatten_with_path(pP)[0],
        jax.tree_util.tree_flatten_with_path(uP)[0],
    ):
        assert jax.tree_util.keystr(ka) == jax.tree_util.keystr(kb)
        np.testing.assert_array_equal(np.asarray(va, np.float32),
                                      np.asarray(vb, np.float32))


@pytest.mark.parametrize("save_u4,save_u5p",
                         [(True, True), (False, True), (True, False)])
def test_fused_sampler_step_matches_composite(save_u4, save_u5p):
    """fused_sampler_step (whole DDIM step: chain + scheduler in Pallas) must
    match the composite fused_denoiser_padded -> step_from_alphas path: the
    forward within f32 rounding of the identical formula, and the VJP within
    f32/bf16 noise (the dx path uses the algebraically-exact closed form
    sp/sa where autodiff expands term-by-term)."""
    from diffusiondepth_tpu.diffusion.ddim import DDIMSchedule
    from diffusiondepth_tpu.ops.fused_denoiser import (
        fused_denoiser_padded,
        fused_sampler_step,
        pad_w,
        padded_width,
    )

    den, params, lat, cond, feat = _setup(seed=9)
    B, H, W, _ = lat.shape
    Wp = padded_width(W)
    te = params["time_embedding"]["embedding"][100]
    te_b = jnp.broadcast_to(te[None, :], (B, te.shape[-1]))
    x_f32 = pad_w(jnp.asarray(np.random.RandomState(3).randn(B, H, W, 16),
                              jnp.float32), Wp)
    x_b = x_f32.astype(jnp.bfloat16)
    cond_p = pad_w(cond, Wp)
    a_t, a_prev = jnp.float32(0.63), jnp.float32(0.89)
    sched = jnp.stack([jnp.sqrt(a_t), jnp.sqrt(1 - a_t),
                       jnp.sqrt(a_prev), jnp.sqrt(1 - a_prev)])

    schedule = DDIMSchedule(clip_sample=False)

    def composite(params, x_f32, x_b, cond_p, te_b, sched):
        eps = fused_denoiser_padded(W, True, True, params, x_b, cond_p,
                                    te_b)
        xp, _ = schedule.step_from_alphas(
            eps.astype(jnp.float32), x_f32, a_t, a_prev,
            eta=0.0, use_clipped_model_output=True,
        )
        return xp

    xp_f, xpb_f = fused_sampler_step(W, save_u4, save_u5p, params, x_f32,
                                     x_b, cond_p, te_b, sched)
    xp_c = composite(params, x_f32, x_b, cond_p, te_b, sched)
    np.testing.assert_allclose(np.asarray(xp_f, np.float32),
                               np.asarray(xp_c, np.float32),
                               rtol=2e-6, atol=2e-6)
    np.testing.assert_array_equal(
        np.asarray(xpb_f, np.float32),
        np.asarray(xp_f.astype(jnp.bfloat16), np.float32))

    ct = jnp.asarray(np.random.RandomState(5).randn(B, H, Wp, 16) * 0.1,
                     jnp.float32)
    # zero the ct borders like the scan's sliced output transpose does
    colm = ((np.arange(Wp) >= 1) & (np.arange(Wp) <= W)).astype(np.float32)
    ct = ct * jnp.asarray(colm)[None, None, :, None]

    _, vjp_f = jax.vjp(
        lambda p, xf, xb, c, t: fused_sampler_step(
            W, save_u4, save_u5p, p, xf, xb, c, t, sched),
        params, x_f32, x_b, cond_p, te_b)
    fP, fXf, fXb, fC, fT = vjp_f((ct, jnp.zeros_like(ct, jnp.bfloat16)))
    # composite only consumes x_b through the chain; route x_f32 through the
    # scheduler exactly as fused_sampler_step does
    _, vjp_c = jax.vjp(
        lambda p, xf, xb, c, t: composite(p, xf, xb, c, t, sched),
        params, x_f32, x_b, cond_p, te_b)
    cP, cXf, cXb, cC, cT = vjp_c(ct)

    def dist(a, b):
        a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
        return float(np.sqrt(np.mean((a - b) ** 2))
                     / (np.sqrt(np.mean(b ** 2)) + 1e-8))

    assert dist(fXf, cXf) < 1e-5, dist(fXf, cXf)     # linear closed form
    assert dist(fXb, cXb) < 0.15, dist(fXb, cXb)     # bf16 chain path
    assert dist(fC, cC) < 0.15, dist(fC, cC)
    assert dist(fT, cT) < 0.15, dist(fT, cT)
    for (k, va), (_, vb) in zip(
        jax.tree_util.tree_flatten_with_path(fP)[0],
        jax.tree_util.tree_flatten_with_path(cP)[0],
    ):
        ks = jax.tree_util.keystr(k)
        if "time_embedding" in ks:
            continue
        d = dist(va, vb)
        assert d < 0.15, (ks, d)


def test_module_guard_falls_back_off_tpu():
    """On the CPU test platform the module must take the jnp path even with
    use_fused=True (the guard checks the backend), so results are identical
    to use_fused=False."""
    den_f, params, lat, cond, _ = _setup(seed=4)
    den_t = ScheduledCNNRefine(
        channels_in=32, channels_noise=16, use_fused=True, dtype=jnp.bfloat16
    )
    a = np.asarray(den_t.apply({"params": params}, lat, 100, cond), np.float32)
    b = np.asarray(den_f.apply({"params": params}, lat, 100, cond), np.float32)
    np.testing.assert_array_equal(a, b)


def test_sched_kernels_wide_shape_th4():
    """The fused sampler-step scheduler kernels at a width that forces the
    VMEM-budgeted tile height down to th=4 (the flagship train/eval widths do
    this on the real chip — the 16-channel minor dim lane-pads 8x inside VMEM
    blocks, so th=8 blows the 16 MB scoped limit; see _sched_th). Pins the
    th=4 block specs and the border/relu masks against a jnp restatement of
    the documented formulas."""
    from diffusiondepth_tpu.ops.fused_denoiser import (
        _sched_bwd,
        _sched_step,
        _sched_th,
        padded_width,
    )

    B, H, W = 1, 8, 453
    Wp = padded_width(W)
    assert _sched_th(H, Wp, 4 + 2 + 4 + 2) == 4
    assert _sched_th(H, Wp, 4 + 2 + 2 + 4 + 2) == 4

    rng = np.random.RandomState(11)
    u6 = jnp.asarray(rng.randn(B, H, Wp, 16), jnp.bfloat16)
    x = jnp.asarray(rng.randn(B, H, Wp, 16), jnp.float32)
    coefs = jnp.asarray(
        np.stack(
            [rng.randn(B, 16) * 0.5 for _ in range(5)]
            + [np.zeros((B, 16))] * 3,
            axis=1,
        ),
        jnp.float32,
    )
    a_t, a_prev = 0.63, 0.89
    sched = jnp.asarray(
        [np.sqrt(a_t), np.sqrt(1 - a_t), np.sqrt(a_prev), np.sqrt(1 - a_prev)],
        jnp.float32,
    )
    sa, sb, sp, sq = [jnp.float32(v) for v in np.asarray(sched)]
    colmask = ((np.arange(Wp) >= 1) & (np.arange(Wp) <= W))[None, None, :, None]

    xp, xpb = _sched_step(u6, x, coefs, sched, W=W, interpret=True)

    bf = jnp.bfloat16
    a = coefs[:, 0].astype(bf)[:, None, None, :]
    b = coefs[:, 1].astype(bf)[:, None, None, :]
    eps = (
        jnp.maximum(u6 * a + b, bf(0)) * jnp.asarray(colmask, bf)
    ).astype(jnp.float32)
    x0 = (x - sb * eps) / sa
    eps2 = (x - sa * x0) / sb
    xp_ref = sp * x0 + sq * eps2
    np.testing.assert_allclose(
        np.asarray(xp, np.float32), np.asarray(xp_ref, np.float32),
        rtol=1e-6, atol=1e-6,
    )
    np.testing.assert_array_equal(
        np.asarray(xpb, np.float32),
        np.asarray(xp.astype(bf), np.float32),
    )

    dxp = jnp.asarray(rng.randn(B, H, Wp, 16), jnp.float32)
    dxpb = jnp.asarray(rng.randn(B, H, Wp, 16) * 0.1, jnp.bfloat16)
    dx, t6, ps = _sched_bwd(dxp, dxpb, u6, coefs, sched, W=W, interpret=True)

    dtot = dxp + dxpb.astype(jnp.float32)
    np.testing.assert_allclose(
        np.asarray(dx, np.float32), np.asarray(dtot * (sp / sa), np.float32),
        rtol=1e-6, atol=1e-6,
    )
    deps = dtot * (sq - sp * sb / sa)
    pre = u6 * a + b
    live = jnp.logical_and(pre.astype(jnp.float32) > 0.0, jnp.asarray(colmask))
    scale3 = coefs[:, 4].astype(bf)[:, None, None, :]
    t6_ref = jnp.where(live, deps.astype(bf), bf(0)) * scale3
    np.testing.assert_array_equal(
        np.asarray(t6, np.float32), np.asarray(t6_ref, np.float32)
    )

    th = 4
    assert ps.shape == (B, H // th, 2, 16)
    inv6 = coefs[:, 2].astype(bf)[:, None, None, :]
    mean6 = coefs[:, 3].astype(bf)[:, None, None, :]
    xh6 = (u6 - mean6) * inv6
    # bf16-level tolerance: with --xla_allow_excess_precision the kernel's
    # stat sums keep deps at f32 through the elided bf16 round-trip, so they
    # differ from sums of the materialized (rounded) t6 by ~0.3% (see
    # _sched_bwd_kernel). Structural errors (wrong tile/mask/block) would be
    # O(1), far outside this tolerance.
    blk = lambda v: np.asarray(
        jnp.sum(v.astype(jnp.float32).reshape(B, H // th, th * Wp, 16), axis=2)
    )
    np.testing.assert_allclose(ps[:, :, 0], blk(t6_ref), rtol=2e-2, atol=5e-2)
    np.testing.assert_allclose(
        ps[:, :, 1],
        blk(t6_ref.astype(jnp.float32) * xh6.astype(jnp.float32)),
        rtol=2e-2, atol=5e-2,
    )


@pytest.mark.slow
@pytest.mark.parametrize("budget_attr", ["U4_STACK_BUDGET_BYTES",
                                         "U5_PAD_BUDGET_BYTES"])
def test_head_scan_u4_gate_grads_bitwise_equal(monkeypatch, budget_attr):
    """The head-level fused sampling scan (ddim_head._sample whole-step
    path) with a residual budget forced to 0 — u4 off means the backward
    recomputes the fb link (the flagship train shape's configuration); the
    u5 pad budget off means the flat lane-compacted residual layout — must
    produce BITWISE-identical parameter grads to the default path: either
    way the same kernels see the same inputs. Drives
    the real nn.scan + custom_vjp wiring (interpret mode on CPU; the
    real-chip twin is tools/tpu_padded_check.py)."""
    from diffusiondepth_tpu.models.heads.ddim_head import DDIMDepthEstimateHead
    from diffusiondepth_tpu.models.heads.denoiser import ScheduledCNNRefine
    from diffusiondepth_tpu.ops import fused_denoiser

    monkeypatch.setattr(ScheduledCNNRefine, "_on_tpu", staticmethod(lambda: True))

    B, GH, GW = 1, 16, 24
    rng = np.random.RandomState(0)
    fp = [
        jnp.asarray(rng.randn(B, 8, 12, 32), jnp.bfloat16),
        jnp.asarray(rng.randn(B, 4, 6, 64), jnp.bfloat16),
    ]
    gt = jnp.asarray(np.clip(rng.rand(B, GH, GW, 1) * 8 + 1, 0, 10),
                     jnp.float32)
    init_lat = jnp.asarray(rng.randn(B, 8, 12, 16), jnp.float32)
    head = DDIMDepthEstimateHead(
        in_channels=(32, 64), fpn_dim=32, depth_feature_dim=16,
        inference_steps=2, fuse="upsample_add", dtype=jnp.bfloat16,
        use_fused_denoiser=True,
    )
    vs = head.init(jax.random.PRNGKey(0), fp, gt_depth_map=gt,
                   init_latent=init_lat)

    def loss(params):
        # train=True: the whole-step pair path (the u4 gate's home) — eval
        # (train=False) takes the grouped-flat carry path instead. The
        # ddim_loss term drives the padded per-sample-timestep denoiser
        # call (r5) through the same interpret-mode wiring.
        out, _ = head.apply({**vs, "params": params}, fp, gt_depth_map=gt,
                            init_latent=init_lat, train=True,
                            rngs={"diffusion": jax.random.PRNGKey(1)},
                            mutable=["batch_stats"])
        return (jnp.mean(jnp.square(out["pred"].astype(jnp.float32)))
                + out["ddim_loss"].astype(jnp.float32))

    g_on = jax.grad(loss)(vs["params"])
    monkeypatch.setattr(fused_denoiser, budget_attr, 0)
    g_off = jax.grad(loss)(vs["params"])
    for (k, va), (_, vb) in zip(
        jax.tree_util.tree_flatten_with_path(g_off)[0],
        jax.tree_util.tree_flatten_with_path(g_on)[0],
    ):
        np.testing.assert_array_equal(
            np.asarray(va, np.float32), np.asarray(vb, np.float32),
            err_msg=jax.tree_util.keystr(k))


def test_flat_ddim_update_matches_scheduler():
    """flat_ddim_update (grouped unpadded layout, ops/fused_denoiser.py) must
    equal step_from_alphas exactly in f32, and its closed-form VJP must match
    autodiff of the jnp restatement (the update is linear in (eps, x))."""
    from diffusiondepth_tpu.diffusion.ddim import DDIMSchedule
    from diffusiondepth_tpu.ops.fused_denoiser import (
        flat_ddim_update,
        group16,
        ungroup16,
    )

    B, H, Wp = 2, 8, 32
    rng = np.random.RandomState(4)
    eps = jnp.asarray(np.maximum(rng.randn(B, H, Wp, 16), 0), jnp.bfloat16)
    x = jnp.asarray(rng.randn(B, H, Wp, 16), jnp.float32)
    a_t, a_prev = jnp.float32(0.63), jnp.float32(0.89)
    sched = jnp.stack([jnp.sqrt(a_t), jnp.sqrt(1 - a_t),
                       jnp.sqrt(a_prev), jnp.sqrt(1 - a_prev)])

    xg = group16(x)
    assert xg.shape == (B, H, Wp * 16 // 128, 128)
    # group/ungroup are pure reshapes: bitwise round-trip
    np.testing.assert_array_equal(np.asarray(ungroup16(xg, 16)), np.asarray(x))

    out = ungroup16(flat_ddim_update(group16(eps), xg, sched), 16)
    ref, _ = DDIMSchedule(clip_sample=False).step_from_alphas(
        eps.astype(jnp.float32), x, a_t, a_prev,
        eta=0.0, use_clipped_model_output=True,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)

    ct = jnp.asarray(rng.randn(B, H, Wp * 16 // 128, 128) * 0.1, jnp.float32)
    _, vjp_f = jax.vjp(flat_ddim_update, group16(eps), xg, sched)
    dE, dX, dS = vjp_f(ct)

    def twin(eps_g, x_g, sched):
        e = ungroup16(eps_g, 16).astype(jnp.float32)
        xx = ungroup16(x_g, 16)
        sa, sb, sp, sq = sched[0], sched[1], sched[2], sched[3]
        x0 = (xx - sb * e) / sa
        return group16(sp * x0 + sq * (xx - sa * x0) / sb)

    _, vjp_t = jax.vjp(twin, group16(eps), xg, sched)
    tE, tX, tS = vjp_t(ct)
    np.testing.assert_allclose(np.asarray(dX), np.asarray(tX),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(dE, np.float32),
                               np.asarray(tE, np.float32),
                               rtol=1e-2, atol=1e-3)  # bf16 cotangent
    assert np.all(np.asarray(dS) == 0)


@pytest.mark.slow
def test_head_eval_flat_path_matches_jnp(monkeypatch):
    """The eval-only grouped-flat sampling path (ddim_head._sample,
    train=False) must match the jnp scan within fused-vs-jnp bf16 noise,
    both forward and under jax.grad (the flat path stays differentiable via
    flat_ddim_update's closed-form VJP + fused_denoiser_padded's vjp)."""
    from diffusiondepth_tpu.models.heads.ddim_head import DDIMDepthEstimateHead
    from diffusiondepth_tpu.models.heads.denoiser import ScheduledCNNRefine

    monkeypatch.setattr(ScheduledCNNRefine, "_on_tpu", staticmethod(lambda: True))

    B, GH, GW = 1, 16, 24
    rng = np.random.RandomState(7)
    fp = [
        jnp.asarray(rng.randn(B, 8, 12, 32), jnp.bfloat16),
        jnp.asarray(rng.randn(B, 4, 6, 64), jnp.bfloat16),
    ]
    gt = jnp.asarray(np.clip(rng.rand(B, GH, GW, 1) * 8 + 1, 0, 10),
                     jnp.float32)
    init_lat = jnp.asarray(rng.randn(B, 8, 12, 16), jnp.float32)

    def make(use_fused):
        return DDIMDepthEstimateHead(
            in_channels=(32, 64), fpn_dim=32, depth_feature_dim=16,
            inference_steps=2, fuse="upsample_add", dtype=jnp.bfloat16,
            use_fused_denoiser=use_fused,
        )

    head_j, head_f = make(False), make(True)
    vs = head_j.init(jax.random.PRNGKey(0), fp, gt_depth_map=gt,
                     init_latent=init_lat)

    pf = np.asarray(head_f.apply(vs, fp, gt_depth_map=gt,
                                 init_latent=init_lat)["pred"], np.float32)
    pj = np.asarray(head_j.apply(vs, fp, gt_depth_map=gt,
                                 init_latent=init_lat)["pred"], np.float32)
    rel = np.abs(pf - pj).max() / (np.abs(pj).max() + 1e-8)
    assert np.isfinite(pf).all()
    assert rel < 0.12, rel

    def loss_of(head):
        def loss(params):
            out = head.apply({**vs, "params": params}, fp, gt_depth_map=gt,
                             init_latent=init_lat)
            return jnp.mean(jnp.square(out["pred"].astype(jnp.float32)))
        return loss

    gf = jax.grad(loss_of(head_f))(vs["params"])
    gj = jax.grad(loss_of(head_j))(vs["params"])

    def dist(a, b):
        a = np.asarray(a, np.float32).ravel()
        b = np.asarray(b, np.float32).ravel()
        return float(np.sqrt(np.mean((a - b) ** 2))
                     / (np.sqrt(np.mean(b ** 2)) + 1e-8))

    for (k, va), (_, vb) in zip(
        jax.tree_util.tree_flatten_with_path(gf)[0],
        jax.tree_util.tree_flatten_with_path(gj)[0],
    ):
        ks = jax.tree_util.keystr(k)
        assert np.isfinite(np.asarray(va, np.float32)).all(), ks
        d = dist(va, vb)
        assert d < 0.35, (ks, d)
