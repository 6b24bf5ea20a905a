"""Torch-free parity replay against committed golden activations.

VERDICT r2 item 4: ``test_reference_parity.py`` needs the live torch
reference; these tests replay OUR implementation against the recorded
reference activations in ``tests/fixtures/golden`` (see ``tests/golden.py``),
so converter / engine regressions are caught even with torch absent.

Constants mirror ``test_reference_parity.py`` (the fixtures were recorded at
these sizes).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests import golden

# Sizes used when the fixtures were recorded (test_reference_parity.py).
L, FF, NL, NH, TD, F = 64, 128, 2, 4, 768, 262
B, T = 2, 8
N_STEPS = 20

pytestmark = pytest.mark.skipif(
    not golden.exists("mixer_stack"),
    reason="golden fixtures not recorded yet (run test_reference_parity.py "
           "with torch available once)",
)


@pytest.fixture(scope="module")
def stack():
    return golden.load("mixer_stack")


@pytest.fixture(scope="module")
def denoisers():
    from mixermdm_tpu.models.in2in import In2INDenoiser

    den1 = In2INDenoiser(input_feats=F, mode="individual", latent_dim=L,
                         ff_size=FF, num_layers=NL, num_heads=NH, dropout=0.0)
    den2 = In2INDenoiser(input_feats=F, mode="interaction", latent_dim=L,
                         ff_size=FF, num_layers=NL, num_heads=NH, dropout=0.0)
    return den1, den2


@pytest.fixture(scope="module")
def mixer(stack, denoisers):
    from mixermdm_tpu.models.mixer import MixerConfig, MixerCore, make_mixer_forward
    from mixermdm_tpu.utils.normalizer import Normalizer

    den1, den2 = denoisers
    cfg = MixerConfig(nfeats=F, latent_dim=L, ff_size=FF, n_blocks=NL,
                      n_heads=NH, text_dim=TD, mixing_mode=4, align=True)
    core = MixerCore(nfeats=F, latent_dim=L, ff_size=FF, n_blocks=NL,
                     n_heads=NH, text_dim=TD, mixing_mode=4, dropout=0.0)
    n1 = Normalizer(jnp.asarray(stack["norm"]["mean1"]),
                    jnp.asarray(stack["norm"]["std1"]))
    n2 = Normalizer(jnp.asarray(stack["norm"]["mean2"]),
                    jnp.asarray(stack["norm"]["std2"]))
    fwd = make_mixer_forward(
        cfg,
        lambda p, x, t, m, c: den1.apply({"params": p}, x, t, m, c),
        lambda p, x, t, m, c: den2.apply({"params": p}, x, t, m, c),
        lambda p, *a, train=False, rngs=None: core.apply(
            {"params": p}, *a, train=train, rngs=rngs),
        n1, n2, compute_dtype=None,
    )
    return cfg, fwd, stack["mixer"], n1, n2


class TestGoldenDenoisers:
    @pytest.mark.parametrize("which", ["individual", "interaction"])
    def test_forward(self, which, stack, denoisers):
        den = denoisers[0 if which == "individual" else 1]
        params = stack["mixer"]["denoiser1" if which == "individual" else "denoiser2"]
        fx = golden.load(f"denoiser_fwd_{which}")
        ours = den.apply({"params": params}, jnp.asarray(fx["x"]),
                         jnp.asarray(fx["t"]), jnp.asarray(fx["mask"]),
                         jnp.asarray(fx["cond"]))
        np.testing.assert_allclose(np.asarray(ours), fx["ref"],
                                   atol=1e-4, rtol=1e-4)


class TestGoldenMixer:
    def test_forward(self, mixer):
        _, fwd, params, _, _ = mixer
        fx = golden.load("mixer_fwd")
        mix, o1, o2, _ = fwd(params, jnp.asarray(fx["x1"]), jnp.asarray(fx["t"]),
                             jnp.asarray(fx["cond"]), jnp.asarray(fx["mask"]),
                             jnp.asarray(fx["x2"]))
        for name, a in (("ref_out1", o1), ("ref_out2", o2), ("ref_mixed", mix)):
            np.testing.assert_allclose(np.asarray(a), fx[name],
                                       atol=5e-4, rtol=1e-3, err_msg=name)

    @pytest.mark.parametrize("mode", ["generator", "discriminator"])
    def test_training_losses(self, mode, stack, mixer):
        from mixermdm_tpu.diffusion.mixer_diffusion import mixer_training_losses
        from mixermdm_tpu.diffusion.schedule import (
            get_named_beta_schedule,
            make_schedule,
        )
        from mixermdm_tpu.models.discriminator import DiscriminatorTransformer

        cfg, fwd, params, n1, n2 = mixer
        fx = golden.load(f"mixer_losses_{mode}")
        betas = get_named_beta_schedule("cosine", N_STEPS)
        s_train = make_schedule(betas)

        disc_i = DiscriminatorTransformer(input_feats=F, latent_dim=L,
                                          ff_size=FF, num_layers=NL,
                                          num_heads=NH, dropout=0.0)
        disc_I = DiscriminatorTransformer(input_feats=2 * F, latent_dim=L,
                                          ff_size=FF, num_layers=NL,
                                          num_heads=NH, dropout=0.0)
        loss_params = {"mixer": params, "disc_i": stack["disc_i"],
                       "disc_I": stack["disc_I"]}
        ours = mixer_training_losses(
            fwd,
            lambda p, x, tt, m, c, train=False, rngs=None: disc_i.apply(
                {"params": p}, x, tt, m, c, train=train, rngs=rngs),
            lambda p, x, tt, m, c, train=False, rngs=None: disc_I.apply(
                {"params": p}, x, tt, m, c, train=train, rngs=rngs),
            loss_params, s_train,
            jnp.asarray(fx["x_start"]), jnp.asarray(fx["t"]),
            jnp.asarray(fx["cond"]), jnp.asarray(fx["mask"]),
            jax.random.PRNGKey(0),
            mode=mode, i_loss_factor=1.0, I_loss_factor=2.0, l1=0.1,
            align=True, normalizer1=n1, normalizer2=n2,
            cond_slices=cfg.cond_slices(), nfeats=F,
            noise=jnp.asarray(fx["noise"]),
        )
        for key, ref_val in fx["ref_losses"].items():
            np.testing.assert_allclose(float(ours[key]), float(ref_val),
                                       atol=2e-3, rtol=2e-3, err_msg=key)

    def test_ddim_chain(self, mixer):
        from mixermdm_tpu.diffusion.mixer_diffusion import ddim_sample_loop_x2
        from mixermdm_tpu.diffusion.schedule import (
            get_named_beta_schedule,
            make_schedule,
            space_timesteps,
        )
        from mixermdm_tpu.models.cfg import cfg_model_x2

        cfg, fwd, params, n1, n2 = mixer
        fx = golden.load("mixer_ddim")
        betas = get_named_beta_schedule("cosine", N_STEPS)
        s_test = make_schedule(betas, space_timesteps(N_STEPS, "ddim5"))

        mixer_eval = lambda x, x2, t, m, c: fwd(params, x, t, c, m, x2)[0]
        ours = ddim_sample_loop_x2(
            cfg_model_x2(mixer_eval, 3.5), s_test, (B, T, 2 * F),
            jax.random.PRNGKey(0), jnp.asarray(fx["cond"]),
            mask=jnp.asarray(fx["mask"]), normalizer1=n1, normalizer2=n2,
            align=True, nfeats=F, noise=jnp.asarray(fx["noise"]),
        )
        np.testing.assert_allclose(np.asarray(ours), fx["ref"],
                                   atol=2e-3, rtol=2e-3)


class TestGoldenInterCLIP:
    @pytest.fixture(scope="class")
    def interclip(self):
        from mixermdm_tpu.config import Config
        from mixermdm_tpu.eval.interclip import InterCLIP

        cfg = Config.wrap(
            {"INPUT_DIM": 258, "LATENT_DIM": L, "FF_SIZE": FF,
             "NUM_LAYERS": NL, "NUM_HEADS": NH, "DROPOUT": 0.0,
             "MODE": "interaction"}
        )
        return InterCLIP(cfg, text_width=768)

    def test_motion_embeddings(self, interclip):
        """The motion encoder is the FID featurizer — the eval-parity
        critical half.  (The text tower has no golden fixture: its token
        embedding alone is 150 MB; text parity stays live-torch-only in
        test_reference_parity.py.)"""
        fx = golden.load("interclip_motion")
        emb = np.asarray(interclip.encode_motion(
            fx["params"], jnp.asarray(fx["motions"]), jnp.asarray(fx["lens"])
        ))
        np.testing.assert_allclose(emb, fx["ref_emb"], atol=2e-4, rtol=2e-4)
