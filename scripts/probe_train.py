"""Differential probes for the full-size G+D training step.

Same DCE trick as scripts/probe_step.py: replace a stage's output with
constants (jnp.full_like uses only shape/dtype) so XLA dead-code-eliminates
the stage, and the timing delta against baseline is its true share.

Modes:
  baseline      full fused G+D step
  gonly         generator step only
  donly         discriminator step only
  nodenoisers   frozen in2IN denoiser forwards DCE'd (mixer stays live)
  nonets        entire mixer forward DCE'd (denoisers + mixer + influence)
  noinfluence   influence/mixer core DCE'd (denoisers + discs stay live)
  notext        encode_cond DCE'd (both steps' text pipelines)
  nodiscs       discriminator applies DCE'd (fwd+bwd of all 3 heads)
  nocenter      center_person -> identity in the loss graph

Usage: python scripts/probe_train.py [mode]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "baseline"

    from mixermdm_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    import mixermdm_tpu.systems.mixermdm as SM

    orig = SM.make_mixer_forward

    if which == "nodenoisers":
        def patched(cfg, a1, a2, core_apply, n1, n2, **kw):
            def const(inner):
                def f(p, x, t, mask, cond, train=False, rngs=None):
                    out = inner(p, x, t, mask, cond, train=train, rngs=rngs)
                    return jax.tree_util.tree_map(
                        lambda a: jnp.full_like(a, 0.1), out)
                return f

            return orig(cfg, const(a1), const(a2), core_apply, n1, n2, **kw)

        SM.make_mixer_forward = patched
    elif which == "noinfluence":
        # Constant influence-net output: DCEs only the (differentiated)
        # influence core; denoisers, blend, align, discs stay live.
        def patched(cfg, a1, a2, core_apply, n1, n2, **kw):
            def const_core(p, *args, train=False, rngs=None):
                out = core_apply(p, *args, train=train, rngs=rngs)
                return jax.tree_util.tree_map(
                    lambda a: jnp.full_like(a, 0.5), out)

            return orig(cfg, a1, a2, const_core, n1, n2, **kw)

        SM.make_mixer_forward = patched
    elif which == "nonets":
        def patched(cfg, a1, a2, core_apply, n1, n2, **kw):
            f = orig(cfg, a1, a2, core_apply, n1, n2, **kw)

            def wrapper(*args, **k):
                out = f(*args, **k)
                return jax.tree_util.tree_map(
                    lambda a: jnp.full_like(a, 0.1), out)

            return wrapper

        SM.make_mixer_forward = patched
    elif which == "notext":
        # Constant cond: DCEs the CLIP towers + all post-encoder heads in
        # BOTH the G and D steps (the G step's text-head grads become zero
        # but the optimizer structure is unchanged).
        _enc = SM.MixerMDMSystem.encode_cond

        def patched_enc(self, params, *tok):
            return jnp.full_like(_enc(self, params, *tok), 0.1)

        SM.MixerMDMSystem.encode_cond = patched_enc
    elif which == "nodiscs":
        # Trivial discriminator: logits = x[..., :1], so the 9 disc applies
        # (3 G-side fwd+input-bwd, 6 D-side fwd+param-bwd) DCE away while the
        # generator graph stays live (G grads still flow through the logits).
        # Patch the SYMBOL the system constructs from — flax registers
        # compact methods at class creation, so post-hoc __call__ assignment
        # on the real class would not take.
        import flax.linen as nn

        from mixermdm_tpu.models.discriminator import DiscriminatorTransformer

        class TrivialDisc(DiscriminatorTransformer):
            @nn.compact
            def __call__(self, x, timesteps, mask=None, cond=None, train=False):
                # A dummy param keeps init's ["params"] collection non-empty.
                b = self.param("dummy", lambda k: jnp.zeros((1,), jnp.float32))
                return x[..., :1].astype(jnp.float32) + b * 0.0

        SM.DiscriminatorTransformer = TrivialDisc
    elif which == "nocenter":
        import mixermdm_tpu.diffusion.mixer_diffusion as MD

        MD.center_person = lambda x, align: x

    from bench import build_system
    from mixermdm_tpu.train.trainer import MixerTrainer

    B, T = 32, 300
    system = build_system()
    params = system.init_params(jax.random.PRNGKey(0))
    trainer = MixerTrainer(system, grad_acc_steps=2, discriminator_steps=1,
                           donate=True)

    rng = np.random.default_rng(0)
    batch = {
        "motions": jnp.asarray(rng.normal(size=(B, T, 2 * 262)), jnp.float32),
        "motion_lens": jnp.asarray(rng.integers(T // 2, T, size=(B,)), jnp.int32),
        "tokens_inter": jnp.asarray(rng.integers(0, 100, size=(B, 77)), jnp.int32),
        "tokens_i1": jnp.asarray(rng.integers(0, 100, size=(B, 77)), jnp.int32),
        "tokens_i2": jnp.asarray(rng.integers(0, 100, size=(B, 77)), jnp.int32),
    }

    def one(st, key):
        if which == "gonly":
            st, losses = trainer.generator_step(st, batch, key)
            return st, losses
        if which == "donly":
            st, losses = trainer.discriminator_step(st, batch, key)
            return st, losses
        st, g, d = trainer.fit_step(st, batch, key, 0)
        return st, g

    st = trainer.init_state(params)
    st, losses = one(st, jax.random.PRNGKey(1))
    jax.block_until_ready(losses["total"])
    times = []
    for i in range(5):
        t0 = time.perf_counter()
        st, losses = one(st, jax.random.PRNGKey(2 + i))
        jax.block_until_ready(losses["total"])
        times.append(time.perf_counter() - t0)
    best = min(times)
    print(f"{which}: {best*1e3:.1f} ms/step")


if __name__ == "__main__":
    main()
