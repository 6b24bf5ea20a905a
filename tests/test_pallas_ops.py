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


class TestFusedBlocks:
    """Fused AdaLN+MHA / FFN mega-kernels vs the unfused layer composition
    (interpret mode on the CPU mesh)."""

    def _weights(self, rng, E, F=None):
        mk = lambda *s: jnp.asarray(rng.standard_normal(s) / np.sqrt(s[0]), jnp.float32)
        vec = lambda n: jnp.asarray(0.1 * rng.standard_normal(n), jnp.float32)
        if F is None:
            return [mk(E, E) if i % 2 == 0 else vec(E) for i in range(8)]
        return mk(E, F), vec(F), mk(F, E), vec(E)

    def test_fused_sa_block(self):
        from mixermdm_tpu.ops.attention import reference_attention
        from mixermdm_tpu.ops.fused_block import fused_sa_block

        rng = np.random.default_rng(0)
        B, T, E, H = 3, 21, 256, 2
        x = jnp.asarray(rng.standard_normal((B, T, E)) * 0.5, jnp.float32)
        scale = jnp.asarray(0.1 * rng.standard_normal((B, E)), jnp.float32)
        shift = jnp.asarray(0.1 * rng.standard_normal((B, E)), jnp.float32)
        wq, bq, wk, bk, wv, bv, wo, bo = self._weights(rng, E)
        kpm = np.zeros((B, T), bool)
        kpm[1, -4:] = True
        kpm = jnp.asarray(kpm)

        out = fused_sa_block(x, scale, shift, wq, bq, wk, bk, wv, bv, wo, bo,
                             kpm, n_heads=H, interpret=True)

        from mixermdm_tpu.models.layers import layer_norm

        xn = layer_norm(x, eps=1e-6) * (1.0 + scale[:, None]) + shift[:, None]
        q, k, v = xn @ wq + bq, xn @ wk + bk, xn @ wv + bv
        D = E // H
        to_h = lambda a: a.reshape(B, T, H, D).transpose(0, 2, 1, 3)
        ref = reference_attention(to_h(q), to_h(k), to_h(v),
                                  key_padding_mask=kpm, zero_attn=True)
        ref = ref.transpose(0, 2, 1, 3).reshape(B, T, E) @ wo + bo
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5, rtol=2e-5)

    def test_fused_ca_block(self):
        from mixermdm_tpu.ops.attention import reference_attention
        from mixermdm_tpu.ops.fused_block import fused_ca_block

        rng = np.random.default_rng(1)
        B, T, E, H = 2, 17, 256, 2
        x = jnp.asarray(rng.standard_normal((B, T, E)) * 0.5, jnp.float32)
        xf = jnp.asarray(rng.standard_normal((B, T, E)) * 0.5, jnp.float32)
        mods = [jnp.asarray(0.1 * rng.standard_normal((B, E)), jnp.float32)
                for _ in range(4)]
        wq, bq, wk, bk, wv, bv, wo, bo = self._weights(rng, E)

        out = fused_ca_block(x, xf, *mods, wq, bq, wk, bk, wv, bv, wo, bo,
                             None, n_heads=H, interpret=True)

        from mixermdm_tpu.models.layers import layer_norm

        xn = layer_norm(x, eps=1e-6) * (1.0 + mods[0][:, None]) + mods[1][:, None]
        xfn = layer_norm(xf, eps=1e-6) * (1.0 + mods[2][:, None]) + mods[3][:, None]
        q, k, v = xn @ wq + bq, xfn @ wk + bk, xfn @ wv + bv
        D = E // H
        to_h = lambda a: a.reshape(B, T, H, D).transpose(0, 2, 1, 3)
        ref = reference_attention(to_h(q), to_h(k), to_h(v), zero_attn=True)
        ref = ref.transpose(0, 2, 1, 3).reshape(B, T, E) @ wo + bo
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5, rtol=2e-5)

    @pytest.mark.parametrize("with_adaln", [True, False])
    def test_fused_ffn_block(self, with_adaln):
        import jax.nn as jnn

        from mixermdm_tpu.ops.fused_block import fused_ffn_block

        rng = np.random.default_rng(2)
        B, T, E, F = 2, 13, 256, 512
        x = jnp.asarray(rng.standard_normal((B, T, E)) * 0.5, jnp.float32)
        w1, b1, w2, b2 = self._weights(rng, E, F)
        if with_adaln:
            scale = jnp.asarray(0.1 * rng.standard_normal((B, E)), jnp.float32)
            shift = jnp.asarray(0.1 * rng.standard_normal((B, E)), jnp.float32)
        else:
            scale = shift = None

        out = fused_ffn_block(x, scale, shift, w1, b1, w2, b2, interpret=True)

        from mixermdm_tpu.models.layers import layer_norm

        xn = x
        if with_adaln:
            xn = layer_norm(x, eps=1e-6) * (1.0 + scale[:, None]) + shift[:, None]
        ref = jnn.gelu(xn @ w1 + b1, approximate=False) @ w2 + b2
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5, rtol=2e-5)

    def test_residual_fusion(self):
        """residual=True == residual-less output + x, for all three kernels."""
        from mixermdm_tpu.ops.fused_block import (
            fused_ca_block, fused_ffn_block, fused_sa_block,
        )

        rng = np.random.default_rng(7)
        B, T, E, H, F = 2, 15, 256, 2, 512
        arr = lambda *s: jnp.asarray(rng.standard_normal(s) * 0.5, jnp.float32)
        x, xf = arr(B, T, E), arr(B, T, E)
        mods = [arr(B, E) * 0.2 for _ in range(4)]
        wq, bq, wk, bk, wv, bv, wo, bo = self._weights(rng, E)
        w1, b1, w2, b2 = self._weights(rng, E, F)

        sa = lambda res: fused_sa_block(
            x, mods[0], mods[1], wq, bq, wk, bk, wv, bv, wo, bo,
            None, n_heads=H, residual=res, interpret=True)
        ca = lambda res: fused_ca_block(
            x, xf, *mods, wq, bq, wk, bk, wv, bv, wo, bo,
            None, n_heads=H, residual=res, interpret=True)
        ffn = lambda res: fused_ffn_block(
            x, mods[0], mods[1], w1, b1, w2, b2, residual=res, interpret=True)
        for name, fn in [("sa", sa), ("ca", ca), ("ffn", ffn)]:
            np.testing.assert_allclose(
                np.asarray(fn(True)), np.asarray(fn(False) + x),
                atol=2e-5, rtol=2e-5, err_msg=name,
            )

    @pytest.mark.parametrize("T", [1, 7, 8, 129, 299])
    @pytest.mark.parametrize("kv_pad", [8, 128])
    def test_sa_block_shapes_and_padding(self, T, kv_pad):
        """Odd sequence lengths x both k/v padding multiples: the fused SA
        kernel must match the unfused reference for every combination."""
        import mixermdm_tpu.ops.fused_block as FB
        from mixermdm_tpu.models.layers import layer_norm
        from mixermdm_tpu.ops.attention import reference_attention
        from mixermdm_tpu.ops.fused_block import fused_sa_block

        rng = np.random.default_rng(T * 1000 + kv_pad)
        B, E, H = 2, 256, 2
        x = jnp.asarray(rng.standard_normal((B, T, E)) * 0.5, jnp.float32)
        scale = jnp.asarray(0.1 * rng.standard_normal((B, E)), jnp.float32)
        shift = jnp.asarray(0.1 * rng.standard_normal((B, E)), jnp.float32)
        wq, bq, wk, bk, wv, bv, wo, bo = self._weights(rng, E)
        kpm = None
        if T > 4:
            m = np.zeros((B, T), bool)
            m[0, -3:] = True
            kpm = jnp.asarray(m)

        old = FB.KV_PAD
        try:
            FB.KV_PAD = kv_pad
            out = fused_sa_block(x, scale, shift, wq, bq, wk, bk, wv, bv,
                                 wo, bo, kpm, n_heads=H, interpret=True)
        finally:
            FB.KV_PAD = old

        xn = layer_norm(x, eps=1e-6) * (1.0 + scale[:, None]) + shift[:, None]
        q, k, v = xn @ wq + bq, xn @ wk + bk, xn @ wv + bv
        D = E // H
        to_h = lambda a: a.reshape(B, T, H, D).transpose(0, 2, 1, 3)
        ref = reference_attention(to_h(q), to_h(k), to_h(v),
                                  key_padding_mask=kpm, zero_attn=True)
        ref = ref.transpose(0, 2, 1, 3).reshape(B, T, E) @ wo + bo
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=3e-5, rtol=3e-5)

    def test_w8a8_quant_close_to_f32(self):
        """W8A8 kernels (int8 MXU path) track the f32 kernels within the
        expected 8-bit quantisation error (~1-2% of activation scale)."""
        from mixermdm_tpu.ops.fused_block import (
            fused_ca_block, fused_ffn_block, fused_sa_block,
        )

        rng = np.random.default_rng(11)
        B, T, E, H, F = 2, 15, 256, 2, 512
        arr = lambda *s: jnp.asarray(rng.standard_normal(s) * 0.5, jnp.float32)
        x, xf = arr(B, T, E), arr(B, T, E)
        mods = [arr(B, E) * 0.2 for _ in range(4)]
        wq, bq, wk, bk, wv, bv, wo, bo = self._weights(rng, E)
        w1, b1, w2, b2 = self._weights(rng, E, F)

        cases = {
            "sa": lambda q: fused_sa_block(
                x, mods[0], mods[1], wq, bq, wk, bk, wv, bv, wo, bo,
                None, n_heads=H, quant=q, interpret=True),
            "ca": lambda q: fused_ca_block(
                x, xf, *mods, wq, bq, wk, bk, wv, bv, wo, bo,
                None, n_heads=H, quant=q, interpret=True),
            "ffn": lambda q: fused_ffn_block(
                x, mods[0], mods[1], w1, b1, w2, b2, quant=q, interpret=True),
        }
        for name, fn in cases.items():
            ref = np.asarray(fn(False))
            out = np.asarray(fn(True))
            scale = max(np.abs(ref).max(), 1e-6)
            err = np.abs(out - ref).max() / scale
            assert err < 0.05, f"{name}: relative error {err:.4f}"
            # And it must actually differ (the int8 path really ran).
            assert err > 1e-6, f"{name}: quant path identical — not engaged?"

    def test_layer_fused_path_matches_unfused_bf16(self):
        """The wired-in fused path (bf16) vs the XLA path on the same params."""
        from mixermdm_tpu.models import layers as L

        rng = jax.random.PRNGKey(3)
        B, T, E, H = 2, 11, 256, 2
        x = jax.random.normal(rng, (B, T, E)) * 0.5
        emb = jax.random.normal(jax.random.fold_in(rng, 1), (B, E))
        sa = L.VanillaSelfAttention(E, H)
        params = sa.init(jax.random.PRNGKey(4), x, emb)["params"]

        import mixermdm_tpu.ops.fused_block as FB
        import mixermdm_tpu.ops.attention as A

        old_fb, old_a = FB.FORCE_INTERPRET, A.FORCE_INTERPRET
        FB.FORCE_INTERPRET = A.FORCE_INTERPRET = True
        try:
            L.set_pallas_attention(True)
            fused = sa.apply({"params": params}, x.astype(jnp.bfloat16),
                             emb.astype(jnp.bfloat16))
            L.set_pallas_attention(False)
            unfused = sa.apply({"params": params}, x.astype(jnp.bfloat16),
                               emb.astype(jnp.bfloat16))
        finally:
            FB.FORCE_INTERPRET, A.FORCE_INTERPRET = old_fb, old_a
            L.set_pallas_attention(None)
        np.testing.assert_allclose(
            np.asarray(fused, np.float32), np.asarray(unfused, np.float32),
            atol=3e-2, rtol=3e-2,
        )


class TestPallasBackward:
    """Hand-written attention backward kernel vs the XLA VJP (<=1e-3)."""

    @pytest.mark.parametrize("with_mask", [False, True])
    def test_grads_match_xla(self, with_mask):
        import mixermdm_tpu.ops.attention as A

        rng = np.random.default_rng(0)
        B, H, T, D = 2, 2, 19, 32
        q = jnp.asarray(rng.standard_normal((B, H, T, D)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((B, H, T, D)), jnp.float32)
        v = jnp.asarray(rng.standard_normal((B, H, T, D)), jnp.float32)
        kpm = None
        if with_mask:
            m = np.zeros((B, T), bool)
            m[0, -3:] = True
            kpm = jnp.asarray(m)

        def loss(q, k, v):
            out = A.fused_attention(q, k, v, key_padding_mask=kpm,
                                    zero_attn=True, interpret=True)
            return (out * out).sum()

        old = A.USE_PALLAS_BWD
        try:
            A.USE_PALLAS_BWD = True
            g_pallas = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
            A.USE_PALLAS_BWD = False
            g_xla = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
        finally:
            A.USE_PALLAS_BWD = old

        for name, a, b in zip("qkv", g_pallas, g_xla):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-3, rtol=1e-3,
                err_msg=f"d{name}",
            )


class TestFusedPathSystemLevel:
    """Full In2IN denoiser forward: fused-block path (bf16, interpret) vs
    the XLA path on the same params — guards the layer wiring end-to-end."""

    def test_denoiser_fused_vs_xla(self):
        import mixermdm_tpu.ops.attention as A
        import mixermdm_tpu.ops.fused_block as FB
        from mixermdm_tpu.models import layers as L
        from mixermdm_tpu.models.in2in import In2INDenoiser

        den = In2INDenoiser(input_feats=262, mode="interaction", latent_dim=128,
                            ff_size=256, num_layers=2, num_heads=1, dropout=0.0)
        rng = jax.random.PRNGKey(0)
        B, T = 2, 17
        x = jax.random.normal(rng, (B, T, 524)) * 0.5
        cond = jax.random.normal(jax.random.fold_in(rng, 1), (B, 3 * 768)) * 0.2
        t = jnp.asarray([3, 7])
        mask = jnp.ones((B, T, 1)).at[1, -4:].set(0.0)
        params = den.init(jax.random.PRNGKey(1), x, t, mask, cond)["params"]
        # Perturb zero-init outputs so activations are nonzero.
        params = jax.tree_util.tree_map(
            lambda a: a + 0.05 * jax.random.normal(jax.random.PRNGKey(2), a.shape),
            params,
        )

        xb, cb = x.astype(jnp.bfloat16), cond.astype(jnp.bfloat16)
        old_fb, old_a = FB.FORCE_INTERPRET, A.FORCE_INTERPRET
        FB.FORCE_INTERPRET = A.FORCE_INTERPRET = True
        try:
            L.set_pallas_attention(True)
            L.set_fused_blocks(True)
            fused = den.apply({"params": params}, xb, t, mask, cb)
            L.set_fused_blocks(False)
            L.set_pallas_attention(False)
            unfused = den.apply({"params": params}, xb, t, mask, cb)
        finally:
            FB.FORCE_INTERPRET, A.FORCE_INTERPRET = old_fb, old_a
            L.set_pallas_attention(None)
            L.set_fused_blocks(True)
        f = np.asarray(fused, np.float32)
        u = np.asarray(unfused, np.float32)
        # bf16 paths with different accumulation orders: tolerance scales
        # with activation magnitude over 2 layers.
        scale = max(np.abs(u).max(), 1.0)
        np.testing.assert_allclose(f / scale, u / scale, atol=5e-2)

    def test_denoiser_w8a8_vs_bf16(self):
        """Full denoiser forward under the W8A8 scope vs the bf16 fused path:
        8-bit quantisation error stays small through 2 layers."""
        import mixermdm_tpu.ops.attention as A
        import mixermdm_tpu.ops.fused_block as FB
        from mixermdm_tpu.models import layers as L
        from mixermdm_tpu.models.in2in import In2INDenoiser

        den = In2INDenoiser(input_feats=262, mode="interaction", latent_dim=128,
                            ff_size=256, num_layers=2, num_heads=1, dropout=0.0)
        rng = jax.random.PRNGKey(0)
        B, T = 2, 17
        x = jax.random.normal(rng, (B, T, 524)) * 0.5
        cond = jax.random.normal(jax.random.fold_in(rng, 1), (B, 3 * 768)) * 0.2
        t = jnp.asarray([3, 7])
        mask = jnp.ones((B, T, 1)).at[1, -4:].set(0.0)
        params = den.init(jax.random.PRNGKey(1), x, t, mask, cond)["params"]
        params = jax.tree_util.tree_map(
            lambda a: a + 0.05 * jax.random.normal(jax.random.PRNGKey(2), a.shape),
            params,
        )

        xb, cb = x.astype(jnp.bfloat16), cond.astype(jnp.bfloat16)
        old_fb, old_a = FB.FORCE_INTERPRET, A.FORCE_INTERPRET
        old_gate = L._W8A8_MIN_DIM
        FB.FORCE_INTERPRET = A.FORCE_INTERPRET = True
        try:
            L.set_pallas_attention(True)
            L.set_fused_blocks(True)
            L._W8A8_MIN_DIM = 0     # width gate tuned for v5e; test is tiny
            ref = den.apply({"params": params}, xb, t, mask, cb)
            with L.w8a8_scope(True):
                quant = den.apply({"params": params}, xb, t, mask, cb)
        finally:
            FB.FORCE_INTERPRET, A.FORCE_INTERPRET = old_fb, old_a
            L.set_pallas_attention(None)
            L._W8A8_MIN_DIM = old_gate
        r = np.asarray(ref, np.float32)
        q = np.asarray(quant, np.float32)
        scale = max(np.abs(r).max(), 1e-6)
        err = np.abs(q - r).max() / scale
        assert err < 0.08, f"w8a8 system-level relative error {err:.4f}"
        assert err > 1e-6, "quant scope did not engage"
