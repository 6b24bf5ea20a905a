from .in2in import In2INSystem, generate_src_mask
from .intergen import InterGenSystem
from .mdm import MDMSystem
from .mixermdm import MixerMDMSystem
from .text import TextPipeline

__all__ = [
    "In2INSystem",
    "InterGenSystem",
    "MDMSystem",
    "MixerMDMSystem",
    "TextPipeline",
    "generate_src_mask",
]


def apply_sampler_overrides(system, sampler: str | None = None,
                            sample_steps: int | None = None):
    """Post-construction sampling-loop overrides for the CLI surface.

    ``sampler`` switches the update rule ("ddim" — reference behaviour — or
    "dpmpp", DPM-Solver++(2M)); ``sample_steps`` rebuilds the respaced
    sampling schedule at N model calls (ddim-strided grid, shared by both
    samplers).  Mutating the system is exact: the jitted sample programs
    are traced lazily per call-shape, after these fields are read.
    """
    if sampler:
        sampler = str(sampler).lower()
        if sampler not in ("ddim", "dpmpp"):
            raise ValueError(f"unknown sampler {sampler!r}")
        system.sampler_type = sampler
    if sample_steps:
        from ..diffusion.schedule import named_schedule

        system.sample_schedule = named_schedule(
            system.cfg.BETA_SCHEDULER,
            int(system.cfg.DIFFUSION_STEPS),
            f"ddim{int(sample_steps)}",
        )
    return system


def load_dualmdm(cfg_interaction, cfg_individual=None, **kwargs):
    """DualMDM baseline: in2IN in dual mode (reference dualmdm.py:4-17).

    Checkpoint merging (interaction + individual state dicts into one) is
    handled by :mod:`mixermdm_tpu.train.checkpoint`.
    """
    from .in2in import In2INSystem

    return In2INSystem(cfg_interaction, mode="dual", **kwargs)
