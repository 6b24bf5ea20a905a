"""Composed parity vs the LIVE torch reference (random weights, converted).

VERDICT round-1 item 1: primitives were parity-tested in round 1
(test_torch_parity.py); this file checks *composed* call paths against the
actual reference implementation imported from /root/reference/src with
torch-cpu.  Engine-level checks use 2-D (B, F) tensors so the reference's
dim-1 channel split coincides with our feature (last-axis) split.
"""

import numpy as np
import pytest

torch = pytest.importorskip(
    "torch", reason="live-reference parity needs torch; torch-free parity "
                    "coverage lives in tests/test_golden.py"
)

from tests import golden
from tests.reference_compat import import_reference

import jax
import jax.numpy as jnp

from mixermdm_tpu.diffusion import gaussian as G
from mixermdm_tpu.diffusion import vlb as V
from mixermdm_tpu.diffusion.schedule import (
    get_named_beta_schedule,
    make_schedule,
    space_timesteps,
)

gd = import_reference("models.utils.gaussian_diffusion")

N_STEPS = 20


def _ref_diffusion(mean_type, var_type, use_timesteps=None):
    betas = get_named_beta_schedule("cosine", N_STEPS)
    kwargs = dict(
        betas=betas,
        model_mean_type=mean_type,
        model_var_type=var_type,
        loss_type=gd.LossType.MSE,
    )
    if use_timesteps is not None:
        ref = gd.SpacedDiffusion(use_timesteps=use_timesteps, **kwargs)
    else:
        ref = gd.GaussianDiffusion(**kwargs)
    s = make_schedule(betas, use_timesteps)
    return ref, s


class TestEngineEnumParity:
    """LEARNED/LEARNED_RANGE variances + PREVIOUS_X mean vs the reference
    (gaussian_diffusion.py:445-539)."""

    @pytest.mark.parametrize(
        "var_name,ref_var",
        [("learned", "LEARNED"), ("learned_range", "LEARNED_RANGE")],
    )
    def test_learned_variances(self, var_name, ref_var):
        ref, s = _ref_diffusion(gd.ModelMeanType.START_X, gd.ModelVarType[ref_var])
        rng = np.random.default_rng(0)
        B, F = 4, 6
        x = rng.standard_normal((B, F)).astype(np.float32)
        out = (0.3 * rng.standard_normal((B, 2 * F))).astype(np.float32)
        t = np.array([0, 3, 11, N_STEPS - 1])

        ref_out = ref.p_mean_variance(
            lambda *_a, **_k: torch.from_numpy(out),
            torch.from_numpy(x),
            torch.from_numpy(t),
            clip_denoised=False,
        )
        mine = G.p_mean_variance(
            lambda _x, _t: jnp.asarray(out), s, jnp.asarray(x), jnp.asarray(t),
            mean_type=G.MEAN_START_X, var_type=var_name, clip_denoised=False,
        )
        for k in ("mean", "variance", "log_variance", "pred_xstart"):
            np.testing.assert_allclose(
                np.asarray(mine[k]), ref_out[k].numpy(), atol=3e-5, rtol=3e-5,
                err_msg=f"{var_name}:{k}",
            )

    def test_previous_x_mean(self):
        ref, s = _ref_diffusion(gd.ModelMeanType.PREVIOUS_X, gd.ModelVarType.FIXED_SMALL)
        rng = np.random.default_rng(1)
        B, F = 3, 5
        x = rng.standard_normal((B, F)).astype(np.float32)
        out = rng.standard_normal((B, F)).astype(np.float32)
        t = np.array([0, 7, N_STEPS - 1])

        ref_out = ref.p_mean_variance(
            lambda *_a, **_k: torch.from_numpy(out),
            torch.from_numpy(x), torch.from_numpy(t), clip_denoised=False,
        )
        mine = G.p_mean_variance(
            lambda _x, _t: jnp.asarray(out), s, jnp.asarray(x), jnp.asarray(t),
            mean_type=G.MEAN_PREVIOUS_X, var_type="fixed_small", clip_denoised=False,
        )
        for k in ("mean", "variance", "log_variance", "pred_xstart"):
            # fixed variances are kept broadcastable (B,1) here vs the
            # reference's full-shape expansion
            a = np.broadcast_to(np.asarray(mine[k]), ref_out[k].shape)
            np.testing.assert_allclose(
                a, ref_out[k].numpy(), atol=3e-5, rtol=3e-5, err_msg=k,
            )

    def test_learned_range_respaced(self):
        """Respaced chain: max_log must use the RESPACED betas (reference
        SpacedDiffusion re-derives betas, :2138-2146)."""
        use = space_timesteps(N_STEPS, "ddim5")
        ref, s = _ref_diffusion(
            gd.ModelMeanType.START_X, gd.ModelVarType.LEARNED_RANGE, use
        )
        rng = np.random.default_rng(2)
        B, F = 2, 4
        x = rng.standard_normal((B, F)).astype(np.float32)
        out = (0.2 * rng.standard_normal((B, 2 * F))).astype(np.float32)
        t = np.array([0, 4])

        ref_out = ref.p_mean_variance(
            lambda *_a, **_k: torch.from_numpy(out),
            torch.from_numpy(x), torch.from_numpy(t), clip_denoised=False,
        )
        mine = G.p_mean_variance(
            lambda _x, _t: jnp.asarray(out), s, jnp.asarray(x), jnp.asarray(t),
            mean_type=G.MEAN_START_X, var_type="learned_range", clip_denoised=False,
        )
        for k in ("mean", "variance", "log_variance", "pred_xstart"):
            np.testing.assert_allclose(
                np.asarray(mine[k]), ref_out[k].numpy(), atol=3e-5, rtol=3e-5,
                err_msg=k,
            )

    def test_vb_terms_learned(self):
        """_vb_terms_bpd with LEARNED variance vs reference :1071-1104."""
        ref, s = _ref_diffusion(gd.ModelMeanType.START_X, gd.ModelVarType.LEARNED)
        rng = np.random.default_rng(3)
        B, F = 3, 6
        x_start = rng.standard_normal((B, F)).astype(np.float32)
        x_t = rng.standard_normal((B, F)).astype(np.float32)
        out = (0.2 * rng.standard_normal((B, 2 * F))).astype(np.float32)
        t = np.array([0, 5, N_STEPS - 1])

        ref_out = ref._vb_terms_bpd(
            lambda *_a, **_k: torch.from_numpy(out),
            torch.from_numpy(x_start), torch.from_numpy(x_t), torch.from_numpy(t),
            clip_denoised=False,
        )
        mine = V.vb_terms_bpd(
            lambda _x, _t: jnp.asarray(out), s, jnp.asarray(x_start),
            jnp.asarray(x_t), jnp.asarray(t),
            clip_denoised=False, var_type="learned",
        )
        np.testing.assert_allclose(
            np.asarray(mine["output"]), ref_out["output"].numpy(), atol=3e-5, rtol=3e-5
        )


class TestGuidedSampling:
    """cond_fn wiring through the scan loops (reference p_sample :656 /
    ddim_sample :822)."""

    def _model(self):
        # A fixed pseudo-denoiser predicting x0 = tanh(x) (START_X type).
        return lambda x, t: jnp.tanh(x)

    def test_ddim_cond_fn_shifts_samples(self):
        s = make_schedule(get_named_beta_schedule("cosine", N_STEPS))
        shape = (4, 6)
        rng = jax.random.PRNGKey(0)
        base = G.ddim_sample_loop(self._model(), s, shape, rng)
        guided = G.ddim_sample_loop(
            self._model(), s, shape, rng, cond_fn=lambda x, t: 5.0 * jnp.ones_like(x)
        )
        assert np.all(np.isfinite(np.asarray(guided)))
        # Positive score gradient pushes samples up.
        assert float(jnp.mean(guided) - jnp.mean(base)) > 0.05

    def test_ddpm_cond_fn_shifts_samples(self):
        s = make_schedule(get_named_beta_schedule("cosine", N_STEPS))
        shape = (4, 6)
        rng = jax.random.PRNGKey(1)
        base = G.p_sample_loop(self._model(), s, shape, rng)
        guided = G.p_sample_loop(
            self._model(), s, shape, rng, cond_fn=lambda x, t: 5.0 * jnp.ones_like(x)
        )
        assert np.all(np.isfinite(np.asarray(guided)))
        assert float(jnp.mean(guided) - jnp.mean(base)) > 0.05


class TestLearnedVarTraining:
    def test_vb_term_trains_only_variance_half(self):
        """The frozen-out trick (reference :1149-1152): d(vb)/d(mean-half)=0,
        d(vb)/d(var-half)!=0; mse still trains the mean half."""
        s = make_schedule(get_named_beta_schedule("cosine", N_STEPS))
        B, F = 3, 4
        rng = jax.random.PRNGKey(2)
        x_start = jax.random.normal(rng, (B, F))
        t = jnp.asarray([1, 5, 10])

        def losses(w):
            w_mean, w_var = w
            model = lambda x, _t: jnp.concatenate(
                [w_mean * jnp.ones_like(x), w_var * jnp.ones_like(x)], axis=-1
            )
            terms = G.mse_training_losses(
                model, s, x_start, t, jax.random.PRNGKey(3), var_type="learned"
            )
            return terms

        grad_vb = jax.grad(lambda w: losses(w)["vb"].sum())(jnp.ones(2))
        assert abs(float(grad_vb[0])) < 1e-8      # mean half frozen in vb
        assert abs(float(grad_vb[1])) > 1e-6      # variance half trains
        grad_mse = jax.grad(lambda w: losses(w)["mse"].sum())(jnp.ones(2))
        assert abs(float(grad_mse[0])) > 1e-6     # mse trains the mean half
        terms = losses(jnp.ones(2))
        np.testing.assert_allclose(
            np.asarray(terms["loss"]), np.asarray(terms["mse"] + terms["vb"]), rtol=1e-6
        )

    def test_previous_x_training_target(self):
        """PREVIOUS_X target is the q-posterior mean (reference :1163-1167)."""
        s = make_schedule(get_named_beta_schedule("cosine", N_STEPS))
        B, F = 2, 4
        x_start = jax.random.normal(jax.random.PRNGKey(4), (B, F))
        t = jnp.asarray([3, 9])
        terms = G.mse_training_losses(
            lambda x, _t: jnp.zeros_like(x), s, x_start, t, jax.random.PRNGKey(5),
            mean_type=G.MEAN_PREVIOUS_X,
        )
        expected = G.q_posterior_mean_variance(s, x_start, terms["x_t"], t)[0]
        np.testing.assert_allclose(
            np.asarray(terms["target"]), np.asarray(expected), rtol=1e-6
        )


# ===========================================================================
# Composed-model parity: random-weight reference modules, converted via
# train/checkpoint.py, activation deltas asserted end-to-end.
# ===========================================================================

import os

from mixermdm_tpu.diffusion.mixer_diffusion import (
    ddim_sample_loop_x2,
    mixer_training_losses,
)
from mixermdm_tpu.models.cfg import cfg_model_x2
from mixermdm_tpu.models.discriminator import DiscriminatorTransformer
from mixermdm_tpu.models.in2in import In2INDenoiser
from mixermdm_tpu.models.mixer import MixerConfig, MixerCore, make_mixer_forward
from mixermdm_tpu.train.checkpoint import (
    convert_discriminator,
    convert_in2in_denoiser,
    convert_mixer_core,
)
from mixermdm_tpu.utils.normalizer import load_normalizer

# Tiny-but-composed sizes (same structure as production, smaller dims).
L, FF, NL, NH, TD, F = 64, 128, 2, 4, 768, 262
B, T = 2, 8


def _sd(module):
    return {k: v.detach().numpy() for k, v in module.state_dict().items()}


def _perturb_zero_init(module, std=0.05, seed=0):
    """Zero-init output layers make denoiser outputs constant (degenerate for
    the alignment math); nudge them like a few training steps would."""
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for name, p in module.named_parameters():
            if ".out." in name or name.startswith("out."):
                p.add_(torch.randn(p.shape, generator=g) * std)


@pytest.fixture(scope="module")
def stats_cwd(tmp_path_factory):
    """CWD with ./data normalizer stats (the reference loads CWD-relative)."""
    root = tmp_path_factory.mktemp("refstats")
    d = root / "data"
    (d / "HumanML3D").mkdir(parents=True)
    rng = np.random.default_rng(42)
    for path in ("global_mean.npy", "HumanML3D/mean_ih_new.npy"):
        np.save(d / path, (0.1 * rng.standard_normal(F)).astype(np.float32))
    for path in ("global_std.npy", "HumanML3D/std_ih_new.npy"):
        np.save(d / path, (0.5 + rng.random(F)).astype(np.float32))
    old = os.getcwd()
    os.chdir(root)
    yield str(root)
    os.chdir(old)


@pytest.fixture(scope="module")
def ref_denoisers(stats_cwd):
    in2in = import_reference("models.in2in")
    torch.manual_seed(0)
    den1 = in2in.in2INDenoiser(
        input_feats=F, mode="individual", latent_dim=L, num_frames=300,
        ff_size=FF, num_layers=NL, num_heads=NH, dropout=0.0,
    ).eval()
    den2 = in2in.in2INDenoiser(
        input_feats=F, mode="interaction", latent_dim=L, num_frames=300,
        ff_size=FF, num_layers=NL, num_heads=NH, dropout=0.0,
    ).eval()
    _perturb_zero_init(den1, seed=1)
    _perturb_zero_init(den2, seed=2)
    return den1, den2


@pytest.fixture(scope="module")
def our_denoisers(ref_denoisers):
    den1_t, den2_t = ref_denoisers
    den1 = In2INDenoiser(input_feats=F, mode="individual", latent_dim=L,
                         ff_size=FF, num_layers=NL, num_heads=NH, dropout=0.0)
    den2 = In2INDenoiser(input_feats=F, mode="interaction", latent_dim=L,
                         ff_size=FF, num_layers=NL, num_heads=NH, dropout=0.0)
    p1 = convert_in2in_denoiser(_sd(den1_t), "", NL, has_cross=True)
    p2 = convert_in2in_denoiser(_sd(den2_t), "", NL, has_cross=True)
    return den1, p1, den2, p2


def _inputs(seed, interaction=True):
    rng = np.random.default_rng(seed)
    x = rng.standard_normal((B, T, 2 * F if interaction else F)).astype(np.float32)
    cond = (0.2 * rng.standard_normal((B, (3 if interaction else 1) * TD))).astype(np.float32)
    t = np.array([3, 15])
    mask = np.ones((B, T, 1), np.float32)
    mask[1, -3:] = 0.0  # padded tail on one item
    return x, cond, t, mask


class TestIn2INDenoiserParity:
    """VERDICT item 1(a): composed denoiser forward vs in2in.py:358-463."""

    def test_individual(self, ref_denoisers, our_denoisers):
        den1_t, _ = ref_denoisers
        den1, p1, _, _ = our_denoisers
        x, cond, t, mask = _inputs(10, interaction=False)
        with torch.no_grad():
            ref = den1_t(torch.from_numpy(x), torch.from_numpy(t),
                         mask=torch.from_numpy(mask), cond=torch.from_numpy(cond))
        ours = den1.apply({"params": p1}, jnp.asarray(x), jnp.asarray(t),
                          jnp.asarray(mask), jnp.asarray(cond))
        np.testing.assert_allclose(np.asarray(ours), ref.numpy(), atol=1e-4, rtol=1e-4)
        golden.save_or_check("denoiser_fwd_individual",
                             {"x": x, "cond": cond, "t": t, "mask": mask,
                              "ref": ref.numpy()})

    def test_interaction(self, ref_denoisers, our_denoisers):
        _, den2_t = ref_denoisers
        _, _, den2, p2 = our_denoisers
        x, cond, t, mask = _inputs(11, interaction=True)
        with torch.no_grad():
            ref = den2_t(torch.from_numpy(x), torch.from_numpy(t),
                         mask=torch.from_numpy(mask), cond=torch.from_numpy(cond))
        ours = den2.apply({"params": p2}, jnp.asarray(x), jnp.asarray(t),
                          jnp.asarray(mask), jnp.asarray(cond))
        np.testing.assert_allclose(np.asarray(ours), ref.numpy(), atol=1e-4, rtol=1e-4)
        golden.save_or_check("denoiser_fwd_interaction",
                             {"x": x, "cond": cond, "t": t, "mask": mask,
                              "ref": ref.numpy()})


@pytest.fixture(scope="module")
def ref_mixer(stats_cwd, ref_denoisers):
    mixermdm = import_reference("models.mixermdm")
    den1_t, den2_t = ref_denoisers
    torch.manual_seed(3)
    mixer = mixermdm.Mixer(
        den1_t, den2_t, nfeats=F, latent_dim=L, ff_size=FF, text_dim=TD,
        n_blocks=NL, n_heads=NH, mixing_mode=4, mode="train", align=True,
    ).eval()
    _perturb_zero_init(mixer.influence, std=0.2, seed=4)
    return mixer


@pytest.fixture(scope="module")
def our_mixer(stats_cwd, ref_mixer, our_denoisers):
    den1, p1, den2, p2 = our_denoisers
    cfg = MixerConfig(nfeats=F, latent_dim=L, ff_size=FF, n_blocks=NL,
                      n_heads=NH, text_dim=TD, mixing_mode=4, align=True)
    core = MixerCore(nfeats=F, latent_dim=L, ff_size=FF, n_blocks=NL,
                     n_heads=NH, text_dim=TD, mixing_mode=4, dropout=0.0)
    n1 = load_normalizer("data/HumanML3D/mean_ih_new.npy", "data/HumanML3D/std_ih_new.npy")
    n2 = load_normalizer("data/global_mean.npy", "data/global_std.npy")
    fwd = make_mixer_forward(
        cfg,
        lambda p, x, t, m, c: den1.apply({"params": p}, x, t, m, c),
        lambda p, x, t, m, c: den2.apply({"params": p}, x, t, m, c),
        lambda p, *a, train=False, rngs=None: core.apply({"params": p}, *a, train=train, rngs=rngs),
        n1, n2, compute_dtype=None,
    )
    params = {
        "core": convert_mixer_core(_sd(ref_mixer), NL, prefix=""),
        "denoiser1": p1,
        "denoiser2": p2,
    }
    return cfg, fwd, params, n1, n2


def _mixer_inputs(seed):
    rng = np.random.default_rng(seed)
    x1 = rng.standard_normal((B, T, 2 * F)).astype(np.float32)
    x2 = rng.standard_normal((B, T, 2 * F)).astype(np.float32)
    cond = (0.2 * rng.standard_normal((B, 8 * TD))).astype(np.float32)
    t = np.array([3, 15])
    mask = np.ones((B, T, 1), np.float32)
    mask[1, -3:] = 0.0
    return x1, x2, cond, t, mask


class TestMixerParity:
    """VERDICT item 1(b): Mixer.forward incl. denorm + align + influence +
    blend vs mixermdm.py:604-811 — proves the converters AND the fast
    align/center paths simultaneously."""

    def test_forward_train_mode(self, ref_mixer, our_mixer):
        _, fwd, params, _, _ = our_mixer
        x1, x2, cond, t, mask = _mixer_inputs(20)
        with torch.no_grad():
            ref_mix, ref_o1, ref_o2 = ref_mixer(
                torch.from_numpy(x1), torch.from_numpy(t),
                cond=torch.from_numpy(cond), mask=torch.from_numpy(mask),
                x2=torch.from_numpy(x2),
            )
        mix, o1, o2, _infl = fwd(
            params, jnp.asarray(x1), jnp.asarray(t), jnp.asarray(cond),
            jnp.asarray(mask), jnp.asarray(x2),
        )
        for name, a, b in (("out1", o1, ref_o1), ("out2", o2, ref_o2),
                           ("mixed", mix, ref_mix)):
            np.testing.assert_allclose(
                np.asarray(a), b.numpy(), atol=5e-4, rtol=1e-3, err_msg=name
            )
        golden.save_or_check("mixer_fwd",
                             {"x1": x1, "x2": x2, "cond": cond, "t": t,
                              "mask": mask, "ref_mixed": ref_mix.numpy(),
                              "ref_out1": ref_o1.numpy(),
                              "ref_out2": ref_o2.numpy()})


@pytest.fixture(scope="module")
def ref_discriminators(stats_cwd):
    disc_mod = import_reference("models.utils.discriminators")
    torch.manual_seed(5)
    disc_i = disc_mod.DiscriminatorTransfomer(
        input_feats=F, latent_dim=L, num_frames=300, ff_size=FF,
        num_layers=NL, num_heads=NH, dropout=0.0,
    ).eval()
    disc_I = disc_mod.DiscriminatorTransfomer(
        input_feats=2 * F, latent_dim=L, num_frames=300, ff_size=FF,
        num_layers=NL, num_heads=NH, dropout=0.0,
    ).eval()
    return disc_i, disc_I


class TestMixerDiffusionParity:
    """VERDICT item 1(c): MixerDiffusion.training_losses + one
    ddim_sample_loop chain vs gaussian_diffusion.py:1545-1965."""

    @pytest.fixture(scope="class")
    def diffusions(self, stats_cwd):
        betas = get_named_beta_schedule("cosine", N_STEPS)
        train_ref = gd.MixerDiffusion(
            use_timesteps=list(range(N_STEPS)), align=True, betas=betas,
            model_mean_type=gd.ModelMeanType.START_X,
            model_var_type=gd.ModelVarType.FIXED_SMALL,
            loss_type=gd.LossType.MSE,
        )
        use = space_timesteps(N_STEPS, "ddim5")
        test_ref = gd.MixerDiffusion(
            use_timesteps=use, align=True, betas=betas,
            model_mean_type=gd.ModelMeanType.START_X,
            model_var_type=gd.ModelVarType.FIXED_SMALL,
            loss_type=gd.LossType.MSE,
        )
        return train_ref, make_schedule(betas), test_ref, make_schedule(betas, use)

    @pytest.mark.parametrize("mode", ["generator", "discriminator"])
    def test_training_losses(self, mode, diffusions, ref_mixer, our_mixer,
                             ref_discriminators, monkeypatch):
        train_ref, s_train, _, _ = diffusions
        cfg, fwd, params, n1, n2 = our_mixer
        disc_i_t, disc_I_t = ref_discriminators

        rng = np.random.default_rng(30)
        x_start = rng.standard_normal((B, T, 2 * F)).astype(np.float32)
        cond = (0.2 * rng.standard_normal((B, 8 * TD))).astype(np.float32)
        t = np.array([3, 15])
        mask = np.ones((B, T, 2), np.float32)
        mask[1, -3:] = 0.0
        noise = rng.standard_normal((B, T, 2 * F)).astype(np.float32)

        # The reference draws its q-sample noise internally; pin it.
        monkeypatch.setattr(gd.th, "randn_like",
                            lambda x: torch.from_numpy(noise).to(x.dtype))
        with torch.no_grad():
            ref_losses = train_ref.training_losses(
                ref_mixer, disc_i_t, disc_I_t,
                torch.from_numpy(mask), 10, None, mode, 1.0, 2.0, 0.1,
                t=torch.from_numpy(t), x_start=torch.from_numpy(x_start),
                model_kwargs={"cond": torch.from_numpy(cond)},
            )

        disc_i = DiscriminatorTransformer(input_feats=F, latent_dim=L,
                                          ff_size=FF, num_layers=NL,
                                          num_heads=NH, dropout=0.0)
        disc_I = DiscriminatorTransformer(input_feats=2 * F, latent_dim=L,
                                          ff_size=FF, num_layers=NL,
                                          num_heads=NH, dropout=0.0)
        loss_params = {
            "mixer": params,
            "disc_i": convert_discriminator(_sd(disc_i_t), "", NL),
            "disc_I": convert_discriminator(_sd(disc_I_t), "", NL),
        }
        ours = mixer_training_losses(
            fwd,
            lambda p, x, tt, m, c, train=False, rngs=None: disc_i.apply(
                {"params": p}, x, tt, m, c, train=train, rngs=rngs),
            lambda p, x, tt, m, c, train=False, rngs=None: disc_I.apply(
                {"params": p}, x, tt, m, c, train=train, rngs=rngs),
            loss_params, s_train,
            jnp.asarray(x_start), jnp.asarray(t), jnp.asarray(cond),
            jnp.asarray(mask), jax.random.PRNGKey(0),
            mode=mode, i_loss_factor=1.0, I_loss_factor=2.0, l1=0.1,
            align=True, normalizer1=n1, normalizer2=n2,
            cond_slices=cfg.cond_slices(), nfeats=F,
            noise=jnp.asarray(noise),
        )
        for key, ref_val in ref_losses.items():
            np.testing.assert_allclose(
                float(ours[key]), float(ref_val), atol=2e-3, rtol=2e-3,
                err_msg=key,
            )
        golden.save_or_check(
            f"mixer_losses_{mode}",
            {"x_start": x_start, "cond": cond, "t": t, "mask": mask,
             "noise": noise,
             "ref_losses": {k: np.float32(v) for k, v in ref_losses.items()}},
        )

    def test_ddim_chain(self, diffusions, ref_mixer, our_mixer):
        _, _, test_ref, s_test = diffusions
        cfg, fwd, params, n1, n2 = our_mixer
        cfg_sampler = import_reference("models.utils.cfg_sampler")

        rng = np.random.default_rng(40)
        cond = (0.2 * rng.standard_normal((B, 8 * TD))).astype(np.float32)
        mask = np.ones((B, T, 1), np.float32)
        noise = rng.standard_normal((B, T, 2 * F)).astype(np.float32)

        ref_mixer.mode = "eval_intermediate"
        try:
            model = cfg_sampler.ClassifierFreeSampleModelX2(ref_mixer, 3.5)
            with torch.no_grad():
                ref_out = test_ref.ddim_sample_loop(
                    model, (B, T, 2 * F), noise=torch.from_numpy(noise),
                    clip_denoised=False,
                    model_kwargs={"cond": torch.from_numpy(cond),
                                  "mask": torch.from_numpy(mask)},
                )
        finally:
            ref_mixer.mode = "train"

        mixer_eval = lambda x, x2, t, m, c: fwd(params, x, t, c, m, x2)[0]
        ours = ddim_sample_loop_x2(
            cfg_model_x2(mixer_eval, 3.5), s_test, (B, T, 2 * F),
            jax.random.PRNGKey(0), jnp.asarray(cond),
            mask=jnp.asarray(mask), normalizer1=n1, normalizer2=n2,
            align=True, nfeats=F, noise=jnp.asarray(noise),
        )
        np.testing.assert_allclose(
            np.asarray(ours), ref_out.numpy(), atol=2e-3, rtol=2e-3
        )
        golden.save_or_check("mixer_ddim",
                             {"cond": cond, "mask": mask, "noise": noise,
                              "ref": ref_out.numpy()})


class TestInpaintingLoops:
    """VERDICT r2 item 3: inpainting controls threaded through the sampling
    LOOPS (not just the helpers), vs the live reference loops —
    ``skip_timesteps``/``init_image`` (gaussian_diffusion.py:1031-1038),
    ``pre_seq``/``transl_req`` in ``p_sample`` (:662-673), and the
    dual-stream ``x_start`` trajectory pinning (:1874-1882)."""

    D = 300  # wide enough for the traj-control dims [0, 2, 262, 264]

    @staticmethod
    def _dummy_models():
        def f_torch(x, t, **_kw):
            scale = 0.5 + 0.05 * t.float().view(-1, *([1] * (x.dim() - 1)))
            return torch.tanh(x) * scale

        def f_jax(x, t_orig):
            scale = 0.5 + 0.05 * t_orig.astype(jnp.float32).reshape(
                (-1,) + (1,) * (x.ndim - 1)
            )
            return jnp.tanh(x) * scale

        return f_torch, f_jax

    @pytest.mark.parametrize("skip,with_image", [(0, True), (7, True), (7, False)])
    def test_ddim_warm_start(self, skip, with_image):
        """skip_timesteps/init_image on the respaced DDIM loop."""
        use = space_timesteps(N_STEPS, "ddim10")
        ref, s = _ref_diffusion(
            gd.ModelMeanType.START_X, gd.ModelVarType.FIXED_SMALL, use
        )
        f_torch, f_jax = self._dummy_models()
        rng = np.random.default_rng(50)
        B, T = 2, 5
        shape = (B, T, self.D)
        noise = rng.standard_normal(shape).astype(np.float32)
        init = (0.3 * rng.standard_normal(shape)).astype(np.float32) if with_image else None

        with torch.no_grad():
            ref_out = ref.ddim_sample_loop(
                f_torch, shape, noise=torch.from_numpy(noise),
                clip_denoised=False, device="cpu", skip_timesteps=skip,
                init_image=None if init is None else torch.from_numpy(init),
            )
        ours = G.ddim_sample_loop(
            f_jax, s, shape, jax.random.PRNGKey(0),
            noise=jnp.asarray(noise), clip_denoised=False,
            skip_timesteps=skip,
            init_image=None if init is None else jnp.asarray(init),
        )
        np.testing.assert_allclose(
            np.asarray(ours), ref_out.numpy(), atol=3e-5, rtol=3e-5
        )

    def test_ddim_traj_control(self):
        """x_start root-trajectory pinning in the single-stream loop
        (reference :1052-1055)."""
        use = space_timesteps(N_STEPS, "ddim10")
        ref, s = _ref_diffusion(
            gd.ModelMeanType.START_X, gd.ModelVarType.FIXED_SMALL, use
        )
        f_torch, f_jax = self._dummy_models()
        rng = np.random.default_rng(51)
        B, T = 2, 5
        shape = (B, T, self.D)
        noise = rng.standard_normal(shape).astype(np.float32)
        x_start = rng.standard_normal(shape).astype(np.float32)

        with torch.no_grad():
            ref_out = ref.ddim_sample_loop(
                f_torch, shape, noise=torch.from_numpy(noise),
                clip_denoised=False, device="cpu",
                x_start=torch.from_numpy(x_start),
            )
        ours = G.ddim_sample_loop(
            f_jax, s, shape, jax.random.PRNGKey(0),
            noise=jnp.asarray(noise), clip_denoised=False,
            traj_control=jnp.asarray(x_start),
        )
        np.testing.assert_allclose(
            np.asarray(ours), ref_out.numpy(), atol=3e-5, rtol=3e-5
        )

    def test_ddpm_pre_seq_and_transl_req(self, monkeypatch):
        """pre_seq + transl_req through the whole DDPM loop.

        The reference's indexing (``x[:, :, :T]`` / ``x[:, :2, frame]``,
        :662-673) assumes its MDM-ancestor layout with FRAMES LAST, so the
        reference runs on (B, F, T') tensors and ours on the transposed
        (B, T', F) motion layout with ``transl_dims=(0, 1)``; noise draws on
        both sides are pinned to zero so the coefficient math must agree
        exactly step-for-step."""
        ref, s = _ref_diffusion(gd.ModelMeanType.START_X, gd.ModelVarType.FIXED_SMALL)
        f_torch, f_jax = self._dummy_models()
        rng = np.random.default_rng(52)
        B, T, Fd = 2, 6, 5
        T_pre = 3
        noise = rng.standard_normal((B, T, Fd)).astype(np.float32)
        pre_seq = rng.standard_normal((B, T_pre, Fd)).astype(np.float32)
        transl_req = [(4, 0.7, -0.3), (1, -1.1, 0.2)]

        monkeypatch.setattr(gd.th, "randn_like", lambda x: torch.zeros_like(x))
        monkeypatch.setattr(
            gd.th, "randn",
            lambda *shape, **kw: torch.zeros(*shape, **{k: v for k, v in kw.items()
                                                        if k != "device"}),
        )
        with torch.no_grad():
            ref_out = ref.p_sample_loop(
                f_torch, (B, Fd, T),
                noise=torch.from_numpy(noise.transpose(0, 2, 1).copy()),
                clip_denoised=False, device="cpu",
                pre_seq=torch.from_numpy(pre_seq.transpose(0, 2, 1).copy()),
                transl_req=transl_req,
            )

        real_normal = jax.random.normal
        monkeypatch.setattr(
            jax.random, "normal",
            lambda key, shape=(), dtype=jnp.float32: jnp.zeros(shape, dtype),
        )
        try:
            ours = G.p_sample_loop(
                f_jax, s, (B, T, Fd), jax.random.PRNGKey(0),
                noise=jnp.asarray(noise), clip_denoised=False,
                pre_seq=jnp.asarray(pre_seq), transl_req=transl_req,
                transl_dims=(0, 1),
            )
        finally:
            monkeypatch.setattr(jax.random, "normal", real_normal)
        np.testing.assert_allclose(
            np.asarray(ours), ref_out.numpy().transpose(0, 2, 1),
            atol=3e-5, rtol=3e-5,
        )


class TestDualStreamInpainting:
    """Dual-stream loop controls vs MixerDiffusion (reference :1854-1882):
    x_start pins BOTH streams; skip/init warm-starts both from one image."""

    def test_x2_traj_control(self, ref_mixer, our_mixer):
        self._run_x2(ref_mixer, our_mixer, traj=True, skip=0, image=False)

    def test_x2_warm_start(self, ref_mixer, our_mixer):
        self._run_x2(ref_mixer, our_mixer, traj=False, skip=2, image=True)

    def _run_x2(self, ref_mixer, our_mixer, *, traj, skip, image):
        cfg, fwd, params, n1, n2 = our_mixer
        cfg_sampler = import_reference("models.utils.cfg_sampler")
        betas = get_named_beta_schedule("cosine", N_STEPS)
        use = space_timesteps(N_STEPS, "ddim5")
        test_ref = gd.MixerDiffusion(
            use_timesteps=use, align=True, betas=betas,
            model_mean_type=gd.ModelMeanType.START_X,
            model_var_type=gd.ModelVarType.FIXED_SMALL,
            loss_type=gd.LossType.MSE,
        )
        s_test = make_schedule(betas, use)

        rng = np.random.default_rng(60)
        cond = (0.2 * rng.standard_normal((B, 8 * TD))).astype(np.float32)
        mask = np.ones((B, T, 1), np.float32)
        noise = rng.standard_normal((B, T, 2 * F)).astype(np.float32)
        x_start = rng.standard_normal((B, T, 2 * F)).astype(np.float32) if traj else None
        init = (0.3 * rng.standard_normal((B, T, 2 * F))).astype(np.float32) if image else None

        ref_mixer.mode = "eval_intermediate"
        try:
            model = cfg_sampler.ClassifierFreeSampleModelX2(ref_mixer, 3.5)
            with torch.no_grad():
                ref_out = test_ref.ddim_sample_loop(
                    model, (B, T, 2 * F), noise=torch.from_numpy(noise),
                    clip_denoised=False, skip_timesteps=skip,
                    init_image=None if init is None else torch.from_numpy(init),
                    model_kwargs={"cond": torch.from_numpy(cond),
                                  "mask": torch.from_numpy(mask)},
                    x_start=None if x_start is None else torch.from_numpy(x_start),
                )
        finally:
            ref_mixer.mode = "train"

        mixer_eval = lambda x, x2, t, m, c: fwd(params, x, t, c, m, x2)[0]
        ours = ddim_sample_loop_x2(
            cfg_model_x2(mixer_eval, 3.5), s_test, (B, T, 2 * F),
            jax.random.PRNGKey(0), jnp.asarray(cond),
            mask=jnp.asarray(mask), normalizer1=n1, normalizer2=n2,
            align=True, nfeats=F, noise=jnp.asarray(noise),
            traj_control=None if x_start is None else jnp.asarray(x_start),
            skip_timesteps=skip,
            init_image=None if init is None else jnp.asarray(init),
        )
        np.testing.assert_allclose(
            np.asarray(ours), ref_out.numpy(), atol=2e-3, rtol=2e-3
        )


class TestInterCLIPParity:
    """VERDICT item 1(d): InterCLIP motion/text embeddings + CE loss vs
    evaluation/models.py:7-252 (fake-clip stub provides the frozen token
    embeddings; both sides consume identical tokens)."""

    @pytest.fixture(scope="class")
    def interclip_pair(self, stats_cwd):
        import sys
        import types

        models_mod = import_reference("evaluation.models")
        cfg_t = types.SimpleNamespace(
            INPUT_DIM=258, LATENT_DIM=L, FF_SIZE=FF, NUM_LAYERS=NL,
            NUM_HEADS=NH, DROPOUT=0.0, ACTIVATION="gelu", MODE="interaction",
        )
        torch.manual_seed(7)
        ref = models_mod.InterCLIP(cfg_t).eval()

        from mixermdm_tpu.config import Config
        from mixermdm_tpu.eval.interclip import InterCLIP
        from mixermdm_tpu.train.checkpoint import convert_interclip

        cfg_j = Config.wrap(
            {"INPUT_DIM": 258, "LATENT_DIM": L, "FF_SIZE": FF,
             "NUM_LAYERS": NL, "NUM_HEADS": NH, "DROPOUT": 0.0,
             "MODE": "interaction"}
        )
        ours = InterCLIP(cfg_j, text_width=768)
        params = convert_interclip(_sd(ref), num_layers=NL, text_layers=8)
        return ref, ours, params

    @staticmethod
    def _tokens(B):
        rng = np.random.default_rng(50)
        toks = np.zeros((B, 77), np.int64)
        toks[:, 0] = 49406  # SOT
        for b in range(B):
            n = 5 + b
            toks[b, 1 : 1 + n] = rng.integers(1, 40000, n)
            toks[b, 1 + n] = 49407  # EOT (argmax pooling target)
        return toks

    def test_motion_embeddings(self, interclip_pair):
        ref, ours, params = interclip_pair
        rng = np.random.default_rng(51)
        motions = rng.standard_normal((3, T, 524)).astype(np.float32)
        lens = np.array([T, T - 2, T - 4])
        batch = {
            "motions": torch.from_numpy(motions),
            "motion_lens": torch.from_numpy(lens),
        }
        with torch.no_grad():
            out = ref.encode_motion(dict(batch))
        ref_emb = out["motion_emb"].numpy()
        ours_emb = np.asarray(
            ours.encode_motion(params, jnp.asarray(motions), jnp.asarray(lens))
        )
        np.testing.assert_allclose(ours_emb, ref_emb, atol=2e-4, rtol=2e-4)
        # Only the motion-encoder subtree is recorded: the text tower's
        # token embedding alone is 150 MB (vocab 49408 x 768) — far too big
        # to commit — and the motion encoder is the part that matters for
        # eval parity (it is the FID featurizer).
        golden.save_or_check("interclip_motion",
                             {"params": {"motion_encoder": params["motion_encoder"],
                                         "latent_scale": params["latent_scale"]},
                              "motions": motions,
                              "lens": lens, "ref_emb": ref_emb})

    def test_text_embeddings_and_loss(self, interclip_pair):
        import sys

        ref, ours, params = interclip_pair
        B = 3
        toks = self._tokens(B)
        sys.modules["clip"].tokenize = (
            lambda texts, truncate=True: torch.from_numpy(toks)
        )
        rng = np.random.default_rng(52)
        motions = rng.standard_normal((B, T, 524)).astype(np.float32)
        lens = np.array([T, T - 1, T - 3])
        batch = {
            "motions": torch.from_numpy(motions),
            "motion_lens": torch.from_numpy(lens),
            "text": ["a"] * B,
        }
        with torch.no_grad():
            out = ref.encode_text(dict(batch))
            ref_total, _ = ref.compute_loss(dict(batch))
        ours_text = np.asarray(ours.encode_text_tokens(params, jnp.asarray(toks)))
        np.testing.assert_allclose(
            ours_text, out["text_emb"].numpy(), atol=2e-4, rtol=2e-4
        )
        ours_total, _ = ours.compute_loss(
            params, jnp.asarray(motions), jnp.asarray(lens), jnp.asarray(toks)
        )
        np.testing.assert_allclose(
            float(ours_total), float(ref_total), atol=1e-4, rtol=1e-4
        )
        # No golden fixture for the text tower (see interclip_motion note):
        # text-side parity stays live-torch-only.


class TestGoldenStack:
    """Record/verify the converted parameter stack used by the torch-free
    golden replay (tests/test_golden.py)."""

    def test_record_stack(self, our_mixer, ref_discriminators):
        _cfg, _fwd, params, n1, n2 = our_mixer
        disc_i_t, disc_I_t = ref_discriminators
        stack = {
            "mixer": params,
            "disc_i": convert_discriminator(_sd(disc_i_t), "", NL),
            "disc_I": convert_discriminator(_sd(disc_I_t), "", NL),
            "norm": {"mean1": n1.mean, "std1": n1.std,
                     "mean2": n2.mean, "std2": n2.std},
        }
        golden.save_or_check("mixer_stack", stack, atol=1e-7, rtol=1e-7)
