"""Stencil-compiled propagation vs the exact deformable-conv gather path.

The stencil path (ops/stencil_prop.py) must reproduce
``modulated_deform_conv`` (ops/deform_conv.py — itself torch-parity-tested
in test_deform_conv.py) bit-for-bit in f32 whenever offsets stay within the
stencil radius, including at image borders (zero-pad bilinear semantics) and
through ``prop_time`` chained iterations, and its gradients must agree
because both formulations are differentiated by jax autodiff.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusiondepth_tpu.ops.deform_conv import modulated_deform_conv
from diffusiondepth_tpu.ops.stencil_prop import build_stencil, stencil_apply

W_PROP = jnp.ones((3, 3, 1, 1), jnp.float32)


def _exact(feat, offset, aff):
    return modulated_deform_conv(
        feat, offset, aff, W_PROP, stride=1, padding=1, dilation=1,
        groups=1, deformable_groups=1,
    )


def _case(b=2, h=13, w=17, radius=4, seed=0, off_scale=2.5):
    rng = np.random.RandomState(seed)
    feat = jnp.asarray(rng.randn(b, h, w, 1), jnp.float32)
    offset = jnp.asarray(
        np.clip(rng.randn(b, h, w, 18) * off_scale, -radius, radius),
        jnp.float32,
    )
    aff = jnp.asarray(rng.rand(b, h, w, 9) / 9, jnp.float32)
    return feat, offset, aff


@pytest.mark.parametrize("radius", [2, 4, 6])
def test_single_step_matches_gather(radius):
    feat, offset, aff = _case(radius=radius)
    M = build_stencil(offset, aff, radius)
    got = stencil_apply(M, feat, radius)
    want = _exact(feat, offset, aff)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_border_zero_pad_semantics():
    """Offsets that push samples off the image: corners outside contribute
    zero in both paths."""
    rng = np.random.RandomState(1)
    feat = jnp.asarray(rng.randn(1, 6, 7, 1), jnp.float32)
    # all taps aimed 3.7 px up-left: top-left pixels sample mostly outside
    offset = jnp.tile(jnp.asarray([-3.7, -3.7], jnp.float32), (1, 6, 7, 9))
    aff = jnp.asarray(rng.rand(1, 6, 7, 9), jnp.float32)
    M = build_stencil(offset, aff, radius=4)
    got = stencil_apply(M, feat, 4)
    want = _exact(feat, offset, aff)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_integer_offsets_at_radius_edge():
    """Exactly-integer offsets at +-R hit the one-weight-zero corner path."""
    rng = np.random.RandomState(2)
    feat = jnp.asarray(rng.randn(1, 8, 9, 1), jnp.float32)
    offs = rng.choice([-4.0, -2.0, 0.0, 1.0, 4.0], size=(1, 8, 9, 18))
    offset = jnp.asarray(offs, jnp.float32)
    aff = jnp.asarray(rng.rand(1, 8, 9, 9), jnp.float32)
    M = build_stencil(offset, aff, radius=4)
    got = stencil_apply(M, feat, 4)
    want = _exact(feat, offset, aff)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_chained_iterations_match():
    """prop_time chained steps (the NLSPN scan): one stencil reused."""
    feat, offset, aff = _case(h=10, w=12, radius=6, seed=3)
    M = build_stencil(offset, aff, 6)

    def run_stencil(f):
        def step(f, _):
            return stencil_apply(M, f, 6), None
        return jax.lax.scan(step, f, None, length=6)[0]

    def run_exact(f):
        def step(f, _):
            return _exact(f, offset, aff), None
        return jax.lax.scan(step, f, None, length=6)[0]

    np.testing.assert_allclose(
        np.asarray(run_stencil(feat)), np.asarray(run_exact(feat)),
        rtol=1e-4, atol=1e-5,
    )


def test_gradients_match_gather_path():
    """d(out)/d(feat, offset, aff) agree between formulations (autodiff of
    the stencil build + apply vs autodiff of the bilinear gather).

    Offsets strictly inside (-R, R): AT the clamp boundary the stencil
    path's offset grad saturates (clip semantics) while the unbounded gather
    keeps its bilinear slope — the documented deviation."""
    rng = np.random.RandomState(4)
    feat = jnp.asarray(rng.randn(1, 7, 8, 1), jnp.float32)
    offset = jnp.asarray(
        np.clip(rng.randn(1, 7, 8, 18) * 1.5, -3.6, 3.6) + 0.07, jnp.float32
    )
    aff = jnp.asarray(rng.rand(1, 7, 8, 9) / 9, jnp.float32)

    def loss_stencil(feat, offset, aff):
        M = build_stencil(offset, aff, 4)
        out = stencil_apply(M, feat, 4)
        return jnp.sum(out * out)

    def loss_exact(feat, offset, aff):
        out = _exact(feat, offset, aff)
        return jnp.sum(out * out)

    gs = jax.grad(loss_stencil, argnums=(0, 1, 2))(feat, offset, aff)
    ge = jax.grad(loss_exact, argnums=(0, 1, 2))(feat, offset, aff)
    for a, b, name in zip(gs, ge, ("feat", "offset", "aff")):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4,
            err_msg=f"grad mismatch: {name}",
        )


@pytest.mark.slow
def test_nlspn_model_stencil_matches_exact_path():
    """Full NLSPN forward: default stencil propagation == radius-0 exact
    gather propagation, with a perturbed (non-zero) offset/affinity conv so
    real sub-pixel taps are exercised (models/nlspn.py:187-231)."""
    from diffusiondepth_tpu.config import Config
    from diffusiondepth_tpu.models import build_model

    rng = np.random.RandomState(7)
    gt = np.clip(rng.rand(1, 32, 48, 1) * 80 + 1, 0, 88).astype(np.float32)
    sample = {
        "rgb": jnp.asarray(rng.randn(1, 32, 48, 3).astype(np.float32)),
        "dep": jnp.asarray(gt * (rng.rand(1, 32, 48, 1) > 0.9)),
        "gt": jnp.asarray(gt),
    }

    def run(radius):
        cfg = Config(
            model_name="NLSPN", network="resnet18", prop_time=3,
            prop_kernel=3, affinity="TGASS", conf_prop=True,
            patch_height=32, patch_width=48, prop_stencil_radius=radius,
        ).finalize()
        model = build_model(cfg)
        variables = model.init(jax.random.PRNGKey(0), sample, train=False)
        # perturb the zero-init offset/affinity conv: offsets ~ +-1 px
        flat = jax.tree_util.tree_flatten_with_path(variables)[0]
        mutated = variables
        import flax

        mutated = flax.core.unfreeze(mutated) if hasattr(
            flax.core, "unfreeze") else dict(mutated)

        def visit(tree, path=()):
            for k, v in tree.items():
                if isinstance(v, dict):
                    visit(v, path + (k,))
                elif "conv_offset_aff" in "/".join(map(str, path + (k,))):
                    r2 = np.random.RandomState(11)
                    tree[k] = jnp.asarray(
                        r2.randn(*v.shape).astype(np.float32) * 0.008
                    )

        mutated = jax.tree_util.tree_map(lambda x: x, mutated)  # deep copy
        visit(mutated["params"])
        out = model.apply(mutated, sample, train=False)
        return np.asarray(out["pred"], np.float32), np.asarray(
            out["offset"], np.float32)

    pred_fast, off = run(6)
    pred_exact, _ = run(0)
    assert np.abs(off).max() <= 6, "perturbation exceeded stencil radius"
    assert np.abs(off).max() > 0.01, "offsets did not perturb"
    np.testing.assert_allclose(pred_fast, pred_exact, rtol=1e-4, atol=1e-4)
