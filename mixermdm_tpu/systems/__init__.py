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


def load_dualmdm(cfg_interaction, cfg_individual=None, **kwargs):
    """DualMDM baseline: in2IN in dual mode (reference dualmdm.py:4-17).

    Checkpoint merging (interaction + individual state dicts into one) is
    handled by :mod:`mixermdm_tpu.train.checkpoint`.
    """
    from .in2in import In2INSystem

    return In2INSystem(cfg_interaction, mode="dual", **kwargs)
