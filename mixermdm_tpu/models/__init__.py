from . import blocks, cfg, discriminator, embeddings, in2in, influence, intergen, layers, mdm, mixer, torch_compat

__all__ = [
    "blocks",
    "cfg",
    "discriminator",
    "embeddings",
    "in2in",
    "influence",
    "intergen",
    "layers",
    "mdm",
    "mixer",
    "torch_compat",
]
