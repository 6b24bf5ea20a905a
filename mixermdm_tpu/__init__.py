"""mixermdm_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework with the
capabilities of pabloruizponce/MixerMDM.

The reference implementation (mounted read-only at /root/reference) is a
PyTorch/Lightning research codebase for *learnable composition* of two
pre-trained text-conditioned human-motion diffusion models (CVPR 2025).
This package is a from-scratch re-design of the same capability surface for
TPU hardware:

- pure-functional diffusion engine whose full denoising chain compiles into a
  single ``lax.scan`` (reference: per-step Python loop,
  ``src/models/utils/gaussian_diffusion.py:1046``),
- flax.linen denoiser/discriminator/influence networks with
  torch-``MultiheadAttention``-compatible semantics (``add_zero_attn``),
- classifier-free guidance as batched forwards inside jit,
- data-parallel training over a ``jax.sharding.Mesh`` (reference: Lightning
  DDP/NCCL, ``src/scripts/train/mixermdm.py:333``),
- Pallas kernels for the hot per-step fused attention path.

Subpackages
-----------
``utils``      geometry substrate: quaternions, rotation conversions,
               motion-representation converters, normalizers, feature pipeline
``diffusion``  schedules, respacing, DDPM/DDIM engine, losses, samplers
``models``     denoisers, discriminators, influence net, mixer, CFG, CLIP text
``parallel``   mesh construction + sharded train/eval steps
``train``      optimizers, trainers (base diffusion + adversarial mixer),
               checkpointing and torch->jax converters
``eval``       InterCLIP extractor, FID/R-precision/diversity/MModality metrics
``data``       InterHuman / HumanML3D datasets + synthetic fixtures
``ops``        Pallas TPU kernels
"""

__version__ = "0.1.0"
