"""Beta schedules, DDIM respacing, and the precomputed DiffusionSchedule.

The reference recomputes its schedule arrays inside a class hierarchy and
rebuilds the sampling diffusion object on *every* forward call
(``/root/reference/src/models/mixermdm.py:515-522``).  Here the schedule is a
frozen pytree of arrays computed once on the host in float64 (matching the
reference's f64 schedule math, ``gaussian_diffusion.py:346``) and cast to f32
device arrays, so the whole denoising chain can close over it inside one jit.

Parity sources: ``get_named_beta_schedule`` gaussian_diffusion.py:236,
``betas_for_alpha_bar``:262, ``space_timesteps``:1279, the respaced-beta
re-derivation in ``SpacedDiffusion.__init__``:2138-2146, and the array
precomputation in ``GaussianDiffusion.__init__``:345-382.
"""

from __future__ import annotations

import math
from typing import NamedTuple, Sequence

import numpy as np
import jax.numpy as jnp


def linear_betas(num_timesteps: int) -> np.ndarray:
    scale = 1000.0 / num_timesteps
    return np.linspace(scale * 0.0001, scale * 0.02, num_timesteps, dtype=np.float64)


def cosine_betas(num_timesteps: int, max_beta: float = 0.999) -> np.ndarray:
    def alpha_bar(t):
        return math.cos((t + 0.008) / 1.008 * math.pi / 2) ** 2

    betas = []
    for i in range(num_timesteps):
        t1 = i / num_timesteps
        t2 = (i + 1) / num_timesteps
        betas.append(min(1 - alpha_bar(t2) / alpha_bar(t1), max_beta))
    return np.array(betas, dtype=np.float64)


def get_named_beta_schedule(name: str, num_timesteps: int) -> np.ndarray:
    if name == "linear":
        return linear_betas(num_timesteps)
    if name == "cosine":
        return cosine_betas(num_timesteps)
    raise NotImplementedError(f"unknown beta schedule: {name}")


def space_timesteps(num_timesteps: int, section_counts) -> list[int]:
    """Subset of original timesteps to keep; 'ddimN' uses DDIM striding.

    Returns a *sorted list* (the reference returns a set and then iterates
    ``enumerate(alphas_cumprod)``, which is equivalent to sorted order).
    """
    if isinstance(section_counts, str):
        if section_counts.startswith("ddim"):
            desired = int(section_counts[len("ddim"):])
            for i in range(1, num_timesteps):
                if len(range(0, num_timesteps, i)) == desired:
                    return sorted(range(0, num_timesteps, i))
            raise ValueError(
                f"cannot create exactly {desired} steps with an integer stride"
            )
        section_counts = [int(x) for x in section_counts.split(",")]
    elif isinstance(section_counts, int):
        section_counts = [section_counts]

    size_per = num_timesteps // len(section_counts)
    extra = num_timesteps % len(section_counts)
    start_idx = 0
    all_steps: list[int] = []
    for i, count in enumerate(section_counts):
        size = size_per + (1 if i < extra else 0)
        if size < count:
            raise ValueError(f"cannot divide section of {size} steps into {count}")
        frac_stride = 1 if count <= 1 else (size - 1) / (count - 1)
        cur = 0.0
        for _ in range(count):
            all_steps.append(start_idx + round(cur))
            cur += frac_stride
        start_idx += size
    return sorted(set(all_steps))


class DiffusionSchedule(NamedTuple):
    """All precomputed per-timestep arrays, f32 on device.

    If the schedule is respaced, the arrays are indexed by the *respaced*
    timestep and ``timestep_map[i]`` gives the original timestep to feed the
    model (reference ``_WrappedModel.__call__`` gaussian_diffusion.py:2185).
    """

    betas: jnp.ndarray
    alphas_cumprod: jnp.ndarray
    alphas_cumprod_prev: jnp.ndarray
    alphas_cumprod_next: jnp.ndarray
    sqrt_alphas_cumprod: jnp.ndarray
    sqrt_one_minus_alphas_cumprod: jnp.ndarray
    sqrt_recip_alphas_cumprod: jnp.ndarray
    sqrt_recipm1_alphas_cumprod: jnp.ndarray
    posterior_variance: jnp.ndarray
    posterior_log_variance_clipped: jnp.ndarray
    posterior_mean_coef1: jnp.ndarray
    posterior_mean_coef2: jnp.ndarray
    log_betas: jnp.ndarray
    fixed_large_variance: jnp.ndarray
    log_fixed_large_variance: jnp.ndarray
    timestep_map: jnp.ndarray  # int32 (num_timesteps,)

    @property
    def num_timesteps(self) -> int:
        return self.betas.shape[0]


def make_schedule(
    betas: np.ndarray,
    use_timesteps: Sequence[int] | None = None,
    dtype=jnp.float32,
) -> DiffusionSchedule:
    """Build a DiffusionSchedule; optionally respaced to ``use_timesteps``."""
    betas = np.asarray(betas, dtype=np.float64)
    assert betas.ndim == 1 and (betas > 0).all() and (betas <= 1).all()

    if use_timesteps is not None:
        use = set(int(t) for t in use_timesteps)
        alphas_cumprod_full = np.cumprod(1.0 - betas)
        last = 1.0
        new_betas, timestep_map = [], []
        for i, ac in enumerate(alphas_cumprod_full):
            if i in use:
                new_betas.append(1.0 - ac / last)
                last = ac
                timestep_map.append(i)
        betas = np.array(new_betas, dtype=np.float64)
    else:
        timestep_map = list(range(len(betas)))

    alphas = 1.0 - betas
    alphas_cumprod = np.cumprod(alphas)
    alphas_cumprod_prev = np.append(1.0, alphas_cumprod[:-1])
    alphas_cumprod_next = np.append(alphas_cumprod[1:], 0.0)

    posterior_variance = betas * (1.0 - alphas_cumprod_prev) / (1.0 - alphas_cumprod)
    posterior_log_variance_clipped = np.log(
        np.append(posterior_variance[1], posterior_variance[1:])
    )
    fixed_large = np.append(posterior_variance[1], betas[1:])

    def arr(x):
        return jnp.asarray(x, dtype=dtype)

    return DiffusionSchedule(
        betas=arr(betas),
        alphas_cumprod=arr(alphas_cumprod),
        alphas_cumprod_prev=arr(alphas_cumprod_prev),
        alphas_cumprod_next=arr(alphas_cumprod_next),
        sqrt_alphas_cumprod=arr(np.sqrt(alphas_cumprod)),
        sqrt_one_minus_alphas_cumprod=arr(np.sqrt(1.0 - alphas_cumprod)),
        sqrt_recip_alphas_cumprod=arr(np.sqrt(1.0 / alphas_cumprod)),
        sqrt_recipm1_alphas_cumprod=arr(np.sqrt(1.0 / alphas_cumprod - 1.0)),
        posterior_variance=arr(posterior_variance),
        posterior_log_variance_clipped=arr(posterior_log_variance_clipped),
        posterior_mean_coef1=arr(
            betas * np.sqrt(alphas_cumprod_prev) / (1.0 - alphas_cumprod)
        ),
        posterior_mean_coef2=arr(
            (1.0 - alphas_cumprod_prev) * np.sqrt(alphas) / (1.0 - alphas_cumprod)
        ),
        log_betas=arr(np.log(betas)),
        fixed_large_variance=arr(fixed_large),
        log_fixed_large_variance=arr(np.log(fixed_large)),
        timestep_map=jnp.asarray(np.array(timestep_map), dtype=jnp.int32),
    )


def named_schedule(
    beta_scheduler: str,
    diffusion_steps: int,
    respacing: str | int | None = None,
    dtype=jnp.float32,
) -> DiffusionSchedule:
    """Convenience: e.g. ``named_schedule("cosine", 1000, "ddim50")``."""
    betas = get_named_beta_schedule(beta_scheduler, diffusion_steps)
    use = None if respacing is None else space_timesteps(diffusion_steps, respacing)
    return make_schedule(betas, use, dtype=dtype)


def resolve_sampler_strategy(cfg) -> tuple:
    """Parse a system config's sampling-loop choice.

    Returns ``(sampler_type, strategy)`` where sampler_type is ``"ddim"``
    (the reference's only fast path) or ``"dpmpp"`` (DPM-Solver++(2M),
    TPU-native addition).  ``STRATEGY: dpmppN`` is shorthand for
    ``SAMPLER_TYPE: dpmpp`` over ddim-strided N timesteps (the respacing
    grid is shared; only the update rule differs).
    """
    strategy = cfg.get("STRATEGY", "ddim50")
    sampler = str(cfg.get("SAMPLER_TYPE", "ddim")).lower()
    if isinstance(strategy, str) and strategy.startswith("dpmpp"):
        sampler = "dpmpp"
        strategy = "ddim" + strategy[len("dpmpp"):]
    if sampler not in ("ddim", "dpmpp"):
        raise ValueError(f"unknown SAMPLER_TYPE {sampler!r}")
    return sampler, strategy
