"""Persistent XLA compilation cache setup.

Full-size MixerMDM sampling programs take tens of minutes to compile through
a remote TPU attachment; the persistent cache makes every later process
(benchmarks, CLIs, the driver's round-end bench) reuse the compiled
executable.  Call :func:`enable_compilation_cache` before the first jit.
"""

from __future__ import annotations

import os


def enable_compilation_cache(path: str | None = None) -> None:
    import jax

    path = path or os.environ.get(
        "MIXERMDM_JAX_CACHE", os.path.join(os.path.dirname(__file__), "..", "..", ".jax_cache")
    )
    try:
        # Namespace per platform config: CPU AOT artifacts are host-machine
        # specific and must not be shared with TPU entries (or across hosts).
        tag = jax.config.jax_platforms or "default"
        path = os.path.join(path, tag.replace(",", "-"))
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", os.path.abspath(path))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # older jax or read-only fs: cache is an optimisation only
