"""Differential step-time probes for the sampling chain.

Monkeypatches individual stages out of the DDIM step (identity align,
constant influence) and times the bench workload for each variant — the
delta against baseline is that stage's true share.  Measurement only; the
patched variants compute the WRONG result by design.

Usage: python scripts/probe_step.py
"""

import sys
import time

import jax
import numpy as np

sys.path.insert(0, ".")


def timed_sample(label):
    import jax.numpy as jnp

    from bench import build_system

    system = build_system()
    params = system.init_params(jax.random.PRNGKey(0))
    cond = jax.random.normal(jax.random.PRNGKey(1), (10, 8 * 768))
    out = system.sample(params, cond, 299, jax.random.PRNGKey(2))
    jax.block_until_ready(out)
    times = []
    for i in range(3):
        t0 = time.perf_counter()
        out = system.sample(params, cond, 299, jax.random.PRNGKey(3 + i))
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    best = min(times)
    print(f"{label}: {best:.3f} s  ({10 / best:.2f} samples/sec, "
          f"{best / 50 * 1e3:.1f} ms/step)")
    return best


def main():
    from mixermdm_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    which = sys.argv[1] if len(sys.argv) > 1 else "baseline"

    if which == "noalign":
        # Identity-align: patch the names where they were imported.
        import mixermdm_tpu.diffusion.mixer_diffusion as MD
        import mixermdm_tpu.models.mixer as MX

        MD.center_person_fast = lambda x: x
        MX.align_persons_fast = lambda r, m, mask=None: (r, m)
    elif which == "nonets":
        # Constant mixer-forward output: XLA DCEs denoisers+mixer entirely,
        # leaving only the DDIM arithmetic / process_xstart / CFG plumbing.
        import mixermdm_tpu.systems.mixermdm as SM

        orig = SM.make_mixer_forward

        def patched(cfg, a1, a2, core_apply, n1, n2, **kw):
            import jax.numpy as jnp

            f = orig(cfg, a1, a2, core_apply, n1, n2, **kw)

            def wrapper(*args, **k):
                out = f(*args, **k)
                return jax.tree_util.tree_map(
                    lambda a: jnp.full_like(a, 0.1), out)

            return wrapper

        SM.make_mixer_forward = patched
    elif which == "noinfluence":
        # Constant influence: full_like only uses shape/dtype, so XLA
        # dead-code-eliminates the whole influence-net computation.
        import mixermdm_tpu.systems.mixermdm as SM

        orig = SM.make_mixer_forward

        def patched(cfg, a1, a2, core_apply, n1, n2, **kw):
            import jax.numpy as jnp

            def const_core(p, *args, train=False, rngs=None):
                out = core_apply(p, *args, train=train, rngs=rngs)
                return jax.tree_util.tree_map(lambda a: jnp.full_like(a, 0.5), out)

            return orig(cfg, a1, a2, const_core, n1, n2, **kw)

        SM.make_mixer_forward = patched

    timed_sample(which)


if __name__ == "__main__":
    main()
