"""models/common.py op parity tests (LayerNorm bf16 custom-vjp)."""
import jax
import jax.numpy as jnp
import numpy as np


class TestLayerNormBF16:
    """models/common.py LayerNorm: custom bf16 custom_vjp (MXU ones-dot
    stats) vs flax nn.LayerNorm semantics."""

    def test_f32_matches_flax(self):
        import flax.linen as fnn
        from diffusiondepth_tpu.models.common import LayerNorm

        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(2, 5, 7, 96) * 3 + 1, jnp.float32)
        ours = LayerNorm(epsilon=1e-5, dtype=None)
        ref = fnn.LayerNorm(epsilon=1e-5, dtype=None)
        vo = ours.init(jax.random.PRNGKey(0), x)
        y_ours = ours.apply(vo, x)
        y_ref = ref.apply(vo, x)  # identical param tree: {scale, bias}
        np.testing.assert_allclose(np.asarray(y_ours), np.asarray(y_ref),
                                   rtol=1e-5, atol=1e-5)

    def test_bf16_fwd_close_to_f32(self):
        from diffusiondepth_tpu.models.common import LayerNorm

        rng = np.random.RandomState(1)
        x = np.asarray(rng.randn(3, 11, 128) * 2, np.float32)
        m16 = LayerNorm(epsilon=1e-5, dtype=jnp.bfloat16)
        m32 = LayerNorm(epsilon=1e-5, dtype=None)
        v = m32.init(jax.random.PRNGKey(0), jnp.asarray(x))
        # non-trivial affine params
        v = {"params": {
            "scale": jnp.asarray(rng.rand(128).astype(np.float32) + 0.5),
            "bias": jnp.asarray(rng.randn(128).astype(np.float32)),
        }}
        y16 = np.asarray(m16.apply(v, jnp.asarray(x, jnp.bfloat16)),
                         np.float32)
        y32 = np.asarray(m32.apply(v, jnp.asarray(x)), np.float32)
        np.testing.assert_allclose(y16, y32, rtol=0, atol=0.05)

    def test_bf16_grads_match_f32(self):
        from diffusiondepth_tpu.models.common import LayerNorm

        rng = np.random.RandomState(2)
        x = jnp.asarray(rng.randn(4, 9, 64), jnp.float32)
        cot = jnp.asarray(rng.randn(4, 9, 64), jnp.float32)
        params = {"params": {
            "scale": jnp.asarray(rng.rand(64).astype(np.float32) + 0.5),
            "bias": jnp.asarray(rng.randn(64).astype(np.float32)),
        }}
        m16 = LayerNorm(epsilon=1e-5, dtype=jnp.bfloat16)
        m32 = LayerNorm(epsilon=1e-5, dtype=None)

        def loss(mdl, v, xi):
            return jnp.sum(mdl.apply(v, xi).astype(jnp.float32) * cot)

        g32x, g32p = jax.grad(lambda v, xi: loss(m32, v, xi),
                              argnums=(1, 0))(params, x)
        g16x, g16p = jax.grad(
            lambda v, xi: loss(m16, v, xi), argnums=(1, 0)
        )(params, x.astype(jnp.bfloat16))
        np.testing.assert_allclose(np.asarray(g16x, np.float32),
                                   np.asarray(g32x), rtol=0, atol=0.1)
        for k in ("scale", "bias"):
            a = np.asarray(g16p["params"][k], np.float32)
            b = np.asarray(g32p["params"][k])
            scale = max(1.0, np.abs(b).max())
            np.testing.assert_allclose(a / scale, b / scale, rtol=0,
                                       atol=2e-2)


class TestLayerNormPallasKernel:
    """ops/layernorm.py Pallas kernels (interpret mode) vs the jnp spec."""

    def test_fwd_matches_spec(self):
        from diffusiondepth_tpu.ops.layernorm import (
            _ln_jnp_fwd, layernorm_fwd_pallas)

        rng = np.random.RandomState(0)
        for m, c in ((300, 192), (129, 384)):  # m not a block multiple
            x = jnp.asarray(rng.randn(m, c) * 2, jnp.bfloat16)
            scale = jnp.asarray(rng.rand(c).astype(np.float32) + 0.5)
            bias = jnp.asarray(rng.randn(c).astype(np.float32))
            y_k, mean_k, inv_k = layernorm_fwd_pallas(x, scale, bias, 1e-5,
                                                      interpret=True)
            y_s, mean_s, inv_s = _ln_jnp_fwd(x, scale, bias, 1e-5)
            np.testing.assert_allclose(np.asarray(y_k, np.float32),
                                       np.asarray(y_s, np.float32),
                                       rtol=0, atol=0.06)
            np.testing.assert_allclose(np.asarray(mean_k), np.asarray(mean_s),
                                       rtol=1e-5, atol=1e-5)
            np.testing.assert_allclose(np.asarray(inv_k), np.asarray(inv_s),
                                       rtol=1e-4, atol=1e-4)

    def test_bwd_matches_spec(self):
        from diffusiondepth_tpu.ops.layernorm import (
            _ln_jnp_bwd, _ln_jnp_fwd, layernorm_bwd_pallas)

        rng = np.random.RandomState(1)
        m, c = 290, 256
        x = jnp.asarray(rng.randn(m, c) * 2, jnp.bfloat16)
        dy = jnp.asarray(rng.randn(m, c), jnp.bfloat16)
        scale = jnp.asarray(rng.rand(c).astype(np.float32) + 0.5)
        bias = jnp.asarray(rng.randn(c).astype(np.float32))
        _, mean, inv = _ln_jnp_fwd(x, scale, bias, 1e-5)
        dx_k, ds_k, db_k = layernorm_bwd_pallas(x, dy, mean, inv, scale,
                                                interpret=True)
        dx_s, ds_s, db_s = _ln_jnp_bwd(x, dy, mean, inv, scale)
        np.testing.assert_allclose(np.asarray(dx_k, np.float32),
                                   np.asarray(dx_s, np.float32),
                                   rtol=0, atol=0.06)
        np.testing.assert_allclose(np.asarray(ds_k), np.asarray(ds_s),
                                   rtol=2e-2, atol=2e-2)
        np.testing.assert_allclose(np.asarray(db_k), np.asarray(db_s),
                                   rtol=2e-2, atol=2e-2)
