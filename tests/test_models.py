"""Shape/behaviour tests for denoisers, discriminator, influence, mixer."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mixermdm_tpu.models.in2in import In2INDenoiser
from mixermdm_tpu.models.intergen import InterDenoiser
from mixermdm_tpu.models.mdm import MDMDenoiser
from mixermdm_tpu.models.discriminator import DiscriminatorTransformer
from mixermdm_tpu.models.influence import Influence, expand_influence
from mixermdm_tpu.models.layers import TorchMultiheadAttention
from mixermdm_tpu.models.torch_compat import TorchEncoder

# Tiny dims to keep CPU compiles fast.
F, D, T, B = 262, 64, 8, 2
TD = 768


def rngs():
    return jax.random.PRNGKey(0)


class TestAttention:
    def test_fully_masked_row_is_finite(self):
        """add_zero_attn: a fully-padded query must not NaN."""
        attn = TorchMultiheadAttention(32, 4)
        x = jax.random.normal(rngs(), (2, 5, 32))
        kpm = jnp.ones((2, 5), dtype=bool)  # everything masked
        params = attn.init(rngs(), x, x, x, kpm)
        out = attn.apply(params, x, x, x, kpm)
        assert bool(jnp.isfinite(out).all())

    def test_masked_keys_ignored(self):
        attn = TorchMultiheadAttention(32, 4)
        x = jax.random.normal(rngs(), (1, 6, 32))
        params = attn.init(rngs(), x, x, x)
        kpm = jnp.asarray([[False, False, False, True, True, True]])
        out1 = attn.apply(params, x, x, x, kpm)
        # Perturb only the masked keys/values (query unchanged): the outputs
        # must not change anywhere.
        kv = x.at[:, 3:].add(100.0)
        out2 = attn.apply(params, x, kv, kv, kpm)
        np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-5)


class TestDenoisers:
    def test_in2in_individual(self):
        m = In2INDenoiser(input_feats=F, mode="individual", latent_dim=D,
                          ff_size=D * 2, num_layers=2, num_heads=4)
        x = jax.random.normal(rngs(), (B, T, F))
        t = jnp.asarray([3, 7])
        cond = jax.random.normal(rngs(), (B, TD))
        params = m.init(rngs(), x, t, None, cond)
        out = m.apply(params, x, t, None, cond)
        assert out.shape == (B, T, F)
        # Zero-init final layer => zero output at init.
        np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-6)

    def test_in2in_interaction(self):
        m = In2INDenoiser(input_feats=F, mode="interaction", latent_dim=D,
                          ff_size=D * 2, num_layers=2, num_heads=4)
        x = jax.random.normal(rngs(), (B, T, 2 * F))
        t = jnp.asarray([3, 7])
        cond = jax.random.normal(rngs(), (B, 3 * TD))
        params = m.init(rngs(), x, t, None, cond)
        out = m.apply(params, x, t, None, cond)
        assert out.shape == (B, T, 2 * F)

    def test_in2in_person_symmetry(self):
        """Swapping persons (and their conds) must swap the outputs."""
        m = In2INDenoiser(input_feats=F, mode="interaction", latent_dim=D,
                          ff_size=D * 2, num_layers=2, num_heads=4)
        key = rngs()
        xa = jax.random.normal(jax.random.fold_in(key, 1), (B, T, F))
        xb = jax.random.normal(jax.random.fold_in(key, 2), (B, T, F))
        cI = jax.random.normal(jax.random.fold_in(key, 3), (B, TD))
        c1 = jax.random.normal(jax.random.fold_in(key, 4), (B, TD))
        c2 = jax.random.normal(jax.random.fold_in(key, 5), (B, TD))
        t = jnp.asarray([5, 9])

        x = jnp.concatenate([xa, xb], -1)
        x_sw = jnp.concatenate([xb, xa], -1)
        cond = jnp.concatenate([cI, c1, c2], -1)
        cond_sw = jnp.concatenate([cI, c2, c1], -1)

        params = m.init(rngs(), x, t, None, cond)
        out = m.apply(params, x, t, None, cond)
        out_sw = m.apply(params, x_sw, t, None, cond_sw)
        np.testing.assert_allclose(
            np.asarray(out[..., :F]), np.asarray(out_sw[..., F:]), atol=1e-5
        )

    def test_intergen(self):
        m = InterDenoiser(input_feats=F, latent_dim=D, ff_size=D * 2,
                          num_layers=2, num_heads=4)
        x = jax.random.normal(rngs(), (B, T, 2 * F))
        t = jnp.asarray([3, 7])
        cond = jax.random.normal(rngs(), (B, TD))
        params = m.init(rngs(), x, t, None, cond)
        assert m.apply(params, x, t, None, cond).shape == (B, T, 2 * F)

    def test_mdm(self):
        m = MDMDenoiser(input_feats=F, latent_dim=D, ff_size=D * 2,
                        num_layers=2, num_heads=4)
        x = jax.random.normal(rngs(), (B, T, F))
        t = jnp.asarray([3, 7])
        cond = jax.random.normal(rngs(), (B, D))
        params = m.init(rngs(), x, t, None, cond)
        assert m.apply(params, x, t, None, cond).shape == (B, T, F)


class TestDiscriminatorInfluence:
    def test_discriminator(self):
        m = DiscriminatorTransformer(input_feats=F, latent_dim=D, ff_size=D * 2,
                                     num_layers=2, num_heads=4)
        x = jax.random.normal(rngs(), (B, T, F))
        t = jnp.asarray([3, 7])
        cond = jax.random.normal(rngs(), (B, TD))
        params = m.init(rngs(), x, t, None, cond)
        out = m.apply(params, x, t, None, cond)
        assert out.shape == (B, T, 1)

    @pytest.mark.parametrize("mode,shape", [(1, (B, 1)), (2, (B, T, 1)),
                                            (3, (B, 23)), (4, (B, T, 23))])
    def test_influence_modes(self, mode, shape):
        m = Influence(input_shape=D, n_blocks=1, n_heads=4, ff_size=D * 2, mode=mode)
        mi = jax.random.normal(rngs(), (B, T, D))
        mI = jax.random.normal(jax.random.fold_in(rngs(), 1), (B, T, D))
        ci = jax.random.normal(rngs(), (B, D))
        params = m.init(rngs(), mi, mI, ci, ci)
        out = m.apply(params, mi, mI, ci, ci)
        assert out.shape == shape
        assert bool(((out >= 0) & (out <= 1)).all())

    @pytest.mark.parametrize("mode", [1, 2, 3, 4])
    def test_expand_influence(self, mode):
        if mode in (1, 3):
            infl = jnp.ones((B, 1 if mode == 1 else 23)) * 0.5
        else:
            infl = jnp.ones((B, T, 1 if mode == 2 else 23)) * 0.5
        out = expand_influence(infl, T, mode)
        want_dim = 1 if mode in (1, 2) else 262
        assert out.shape == (B, T, want_dim)

    def test_expand_layout(self):
        """Joint k weight must land on pos[3k:3k+3], vel, rot 6k, contact x4."""
        w = jnp.asarray(np.arange(23, dtype=np.float32))[None, None, :].repeat(T, 1)
        out = expand_influence(w, T, 4)[0, 0]
        np.testing.assert_allclose(out[:3], 0.0)        # joint 0 -> pos dims 0-2
        np.testing.assert_allclose(out[3:6], 1.0)       # joint 1
        np.testing.assert_allclose(out[66:69], 0.0)     # vel reuses joint 0
        np.testing.assert_allclose(out[132:138], 0.0)   # rot joint 0 (6 dims)
        np.testing.assert_allclose(out[138:144], 1.0)   # rot joint 1
        np.testing.assert_allclose(out[258:], 22.0)     # contact weight


class TestTorchEncoder:
    def test_shapes(self):
        m = TorchEncoder(d_model=D, nhead=4, dim_feedforward=D * 2, num_layers=2)
        x = jax.random.normal(rngs(), (B, T, D))
        params = m.init(rngs(), x)
        assert m.apply(params, x).shape == (B, T, D)
