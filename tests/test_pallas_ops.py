"""Pallas kernel tests (interpret mode on the CPU backend)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mixermdm_tpu.ops.attention import fused_attention, reference_attention

B, H, T, D = 2, 3, 20, 16


def rand(key, shape):
    return jax.random.normal(jax.random.PRNGKey(key), shape, jnp.float32)


class TestFusedAttention:
    @pytest.mark.parametrize("zero_attn", [True, False])
    def test_matches_reference(self, zero_attn):
        q, k, v = rand(0, (B, H, T, D)), rand(1, (B, H, T, D)), rand(2, (B, H, T, D))
        want = reference_attention(q, k, v, zero_attn=zero_attn)
        got = fused_attention(q, k, v, zero_attn=zero_attn, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)

    def test_key_padding(self):
        q, k, v = rand(3, (B, H, T, D)), rand(4, (B, H, T, D)), rand(5, (B, H, T, D))
        kpm = jnp.zeros((B, T), bool).at[:, -7:].set(True)
        want = reference_attention(q, k, v, key_padding_mask=kpm)
        got = fused_attention(q, k, v, key_padding_mask=kpm, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)

    def test_fully_masked_rows_finite(self):
        """With zero_attn, fully-masked rows attend only the zero token."""
        q, k, v = rand(6, (1, 1, 8, D)), rand(7, (1, 1, 8, D)), rand(8, (1, 1, 8, D))
        kpm = jnp.ones((1, 8), bool)
        got = fused_attention(q, k, v, key_padding_mask=kpm, interpret=True)
        np.testing.assert_allclose(np.asarray(got), 0.0, atol=1e-6)

    def test_causal_mask(self):
        causal = jnp.triu(jnp.full((T, T), -jnp.inf), k=1)
        q, k, v = rand(9, (B, H, T, D)), rand(10, (B, H, T, D)), rand(11, (B, H, T, D))
        want = reference_attention(q, k, v, attn_mask=causal, zero_attn=False)
        got = fused_attention(q, k, v, attn_mask=causal, zero_attn=False, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)

    def test_cross_lengths(self):
        Tk = 9
        q = rand(12, (B, H, T, D))
        k, v = rand(13, (B, H, Tk, D)), rand(14, (B, H, Tk, D))
        want = reference_attention(q, k, v)
        got = fused_attention(q, k, v, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)

    def test_reference_matches_torch_zero_attn_math(self):
        """The reference XLA impl (zero-logit softmax) equals explicit
        zero-token concatenation."""
        q, k, v = rand(15, (B, H, T, D)), rand(16, (B, H, T, D)), rand(17, (B, H, T, D))
        k2 = jnp.concatenate([k, jnp.zeros((B, H, 1, D))], axis=2)
        v2 = jnp.concatenate([v, jnp.zeros((B, H, 1, D))], axis=2)
        scale = 1.0 / (D**0.5)
        logits = jnp.einsum("bhqd,bhkd->bhqk", q * scale, k2)
        want = jnp.einsum("bhqk,bhkd->bhqd", jax.nn.softmax(logits, -1), v2)
        got = reference_attention(q, k, v, zero_attn=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


class TestFusedAttentionGrad:
    def test_grad_matches_reference(self):
        q, k, v = rand(20, (B, H, T, D)), rand(21, (B, H, T, D)), rand(22, (B, H, T, D))
        kpm = jnp.zeros((B, T), bool).at[:, -5:].set(True)

        def loss_pl(q, k, v):
            return (fused_attention(q, k, v, key_padding_mask=kpm, interpret=True) ** 2).sum()

        def loss_ref(q, k, v):
            return (reference_attention(q, k, v, key_padding_mask=kpm) ** 2).sum()

        g_pl = jax.grad(loss_pl, argnums=(0, 1, 2))(q, k, v)
        g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(g_pl, g_ref):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)

    def test_grad_nomask(self):
        q, k, v = rand(23, (1, 2, 8, D)), rand(24, (1, 2, 8, D)), rand(25, (1, 2, 8, D))
        g = jax.grad(lambda q: (fused_attention(q, k, v, interpret=True) ** 2).sum())(q)
        assert bool(jnp.isfinite(g).all())


class TestPallasPathEndToEnd:
    def test_training_step_through_pallas_interpret(self):
        """Run a tiny adversarial G step with the Pallas attention path forced
        (interpret mode on CPU) — guards against kernel-only autodiff or
        dispatch bugs that the default CPU path cannot see."""
        import sys as _s, os

        _s.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
        from mixermdm_tpu.models import layers as L
        from mixermdm_tpu.ops import attention as A
        from __graft_entry__ import _tiny_system

        L.set_pallas_attention(True)
        A.FORCE_INTERPRET = True
        try:
            system = _tiny_system()
            params = system.init_params(jax.random.PRNGKey(0))
            params = jax.tree_util.tree_map(
                lambda x: x + 0.01 * jax.random.normal(jax.random.PRNGKey(9), x.shape),
                params,
            )
            cond = jax.random.normal(jax.random.PRNGKey(1), (2, 8 * system.text_dim))
            motions = jax.random.normal(jax.random.PRNGKey(2), (2, 12, 524)) * 0.1
            lens = jnp.asarray([10, 8])

            def loss(p):
                return system._loss_impl(
                    p, motions, lens, cond, jax.random.PRNGKey(3),
                    mode="generator", i_loss_factor=1.0, I_loss_factor=2.0,
                    l1=0.1, cond_mask_prob=0.0,
                )["total"]

            g = jax.grad(loss)(params)
            total = sum(float(jnp.abs(x).sum()) for x in jax.tree_util.tree_leaves(g["core"]))
            assert np.isfinite(total) and total > 0
        finally:
            L.set_pallas_attention(None)
            A.FORCE_INTERPRET = False
