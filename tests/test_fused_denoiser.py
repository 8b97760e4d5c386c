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
