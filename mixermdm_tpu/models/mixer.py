"""Mixer: the learnable per-step composition of two frozen denoisers.

Parity source ``/root/reference/src/models/mixermdm.py``: ``Mixer``:604-811.
Per denoising step the reference runs, in Python: frozen individual denoiser
twice (one per person), frozen interaction denoiser once, denormalises both to
raw motion space, aligns the individual outputs onto the interaction
trajectories, embeds everything, runs the Influence net twice, expands 23
weights to the 262-d layout, and blends ``out2 + w*(out1 - out2)``.

TPU-first re-design decisions:

* the two per-person calls of denoiser1 and of the Influence net are stacked
  into the batch axis (2B) — half the kernel launches, full MXU tiles;
* the whole pipeline is a pure function of pytree params, so the DDIM driver
  can put it inside ``lax.scan`` and CFG can batch cond/uncond through it;
* influence histories are *returned* (scan ys), not mutated on the module
  (reference appends to ``self.history_*``, mixermdm.py:794-808).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax.numpy as jnp
import flax.linen as nn

from ..utils.alignment import align_persons_fast
from ..utils.normalizer import Normalizer
from .embeddings import PositionalEncoding, TimestepEmbedder
from .influence import Influence, expand_influence
from .layers import TorchLinear


class MixerCore(nn.Module):
    """Trainable part of the Mixer: embedders + Influence net.

    Takes the (already denormalised + aligned) raw-space denoiser outputs and
    produces the expanded (B, T, 262) influence weights for both persons.
    Both persons are processed stacked at 2B batch.
    """

    nfeats: int = 262
    latent_dim: int = 512
    ff_size: int = 1024
    n_blocks: int = 4
    n_heads: int = 8
    text_dim: int = 768
    mixing_mode: int = 4
    dropout: float = 0.0

    @nn.compact
    def __call__(
        self,
        out1_1, out1_2,       # individual-model outputs, raw space (B, T, 262)
        out2_1, out2_2,       # interaction-model outputs, raw space
        timesteps,            # (B,) original timesteps
        cond_I, cond_i1, cond_i2,  # raw 768-d mixer conds
        mask=None,
        train: bool = False,
    ):
        B, T = out1_1.shape[0], out1_1.shape[1]

        t_emb = TimestepEmbedder(self.latent_dim, name="embed_timestep")(timesteps)
        text_embed = TorchLinear(self.latent_dim, name="text_embed")
        emb_I = t_emb + text_embed(cond_I)
        emb_i1 = t_emb + text_embed(cond_i1)
        emb_i2 = t_emb + text_embed(cond_i2)

        motion_embed = TorchLinear(self.latent_dim, name="motion_embed")
        pos_enc = PositionalEncoding(self.latent_dim, name="sequence_pos_encoder")

        # Stack persons into batch: individual stream and interaction stream.
        m_i = pos_enc(motion_embed(jnp.concatenate([out1_1, out1_2], axis=0)))
        m_I = pos_enc(motion_embed(jnp.concatenate([out2_1, out2_2], axis=0)))
        cond_i = jnp.concatenate([emb_i1, emb_i2], axis=0)
        cond_I2 = jnp.concatenate([emb_I, emb_I], axis=0)
        mask2 = None if mask is None else jnp.concatenate([mask, mask], axis=0)

        infl = Influence(
            input_shape=self.latent_dim,
            n_blocks=self.n_blocks,
            n_heads=self.n_heads,
            ff_size=self.ff_size,
            mode=self.mixing_mode,
            dropout=self.dropout,
            name="influence",
        )(m_i, m_I, cond_i, cond_I2, mask2, train)

        infl_1, infl_2 = infl[:B], infl[B:]
        return (
            expand_influence(infl_1, T, self.mixing_mode),
            expand_influence(infl_2, T, self.mixing_mode),
        )


@dataclasses.dataclass(frozen=True)
class MixerConfig:
    """Static composition config (mirrors configs/models/MixerMDM.yaml)."""

    nfeats: int = 262
    latent_dim: int = 512
    ff_size: int = 1024
    n_blocks: int = 4
    n_heads: int = 8
    text_dim: int = 768
    mixing_mode: int = 4
    align: bool = True
    # text_dim attributes of the wrapped denoisers, used for cond slicing
    # (mixermdm.py:672-682; see SURVEY.md §2.4 for the MDM mis-slice quirk).
    denoiser1_text_dim: int = 768
    denoiser2_text_dim: int = 768

    def cond_slices(self):
        """Offsets into the concatenated 8x768 cond vector.

        Order (mixermdm.py:342-354): [I, I_i1, I_i2, ind_i1, ind_i2,
        mix_I, mix_i1, mix_i2].
        """
        d1, d2, td = self.denoiser1_text_dim, self.denoiser2_text_dim, self.text_dim
        base = d2 * 3
        return {
            "cond2": (0, td * 3),
            "cond1_1": (base, base + d1),
            "cond1_2": (base + d1, base + 2 * d1),
            "cond_I": (base + 2 * d1, base + 2 * d1 + d2),
            "cond_i1": (base + 2 * d1 + d2, base + 2 * d1 + 2 * d2),
            "cond_i2": (base + 2 * d1 + 2 * d2, base + 2 * d1 + 3 * d2),
        }


def make_mixer_forward(
    cfg: MixerConfig,
    denoiser1_apply: Callable,   # (params, x, t, mask, cond) -> (B,T,262)
    denoiser2_apply: Callable,   # (params, x, t, mask, cond) -> (B,T,524)
    core_apply: Callable,        # (params, ...) -> (infl1, infl2)
    normalizer1: Normalizer,
    normalizer2: Normalizer,
    compute_dtype=None,
):
    """Build the full per-step Mixer pipeline as a pure function.

    Returns ``forward(params, x1, t, cond, mask, x2, force_influence_val)``
    where ``params`` is a dict with keys ``core`` / ``denoiser1`` /
    ``denoiser2``.  Output: ``(out_influenced, out1, out2, (infl1, infl2))``
    matching the reference's train-mode returns (mixermdm.py:803-804).
    """
    sl = cfg.cond_slices()
    F = cfg.nfeats

    def forward(params, x1, t, cond, mask=None, x2=None,
                force_influence_val: Optional[float] = None,
                train: bool = False, rngs=None):
        B, T = x1.shape[0], x1.shape[1]

        x1_i1 = x1[..., :F]
        x1_i2 = x1[..., F:]

        # The frozen denoisers' cond slices come from the FROZEN submodels'
        # text encoders (reference mixermdm.py:62-65 + generate_cond) — the
        # stop_gradient here makes that symbolically true again after the
        # concat with the trainable mixer slices, so no tangents (and hence
        # no VJPs) ever reach the frozen denoisers in training traces.
        from jax.lax import stop_gradient as sg
        cond1_1 = sg(cond[:, sl["cond1_1"][0] : sl["cond1_1"][1]])
        cond1_2 = sg(cond[:, sl["cond1_2"][0] : sl["cond1_2"][1]])
        cond2 = sg(cond[:, sl["cond2"][0] : sl["cond2"][1]])
        cond_I = cond[:, sl["cond_I"][0] : sl["cond_I"][1]]
        cond_i1 = cond[:, sl["cond_i1"][0] : sl["cond_i1"][1]]
        cond_i2 = cond[:, sl["cond_i2"][0] : sl["cond_i2"][1]]

        # --- frozen denoisers; the two person calls of denoiser1 batched ---
        # bf16 compute for the transformer stacks (MXU-native); the diffusion
        # arithmetic and the quaternion alignment stay f32.
        x1_both = jnp.concatenate([x1_i1, x1_i2], axis=0)
        cond1_both = jnp.concatenate([cond1_1, cond1_2], axis=0)
        t2 = jnp.concatenate([t, t], axis=0)
        mask2 = None if mask is None else jnp.concatenate([mask, mask], axis=0)
        if compute_dtype is not None:
            x1_both = x1_both.astype(compute_dtype)
            cond1_both = cond1_both.astype(compute_dtype)
            x2_in = x2.astype(compute_dtype)
            cond2_in = cond2.astype(compute_dtype)
        else:
            x2_in, cond2_in = x2, cond2
        out1_both = denoiser1_apply(
            params["denoiser1"], x1_both, t2, mask2, cond1_both
        ).astype(jnp.float32)
        out2 = denoiser2_apply(
            params["denoiser2"], x2_in, t, mask, cond2_in
        ).astype(jnp.float32)

        # --- denormalise to raw motion space (mixermdm.py:691-694) ---
        out1_both = normalizer1.backward(out1_both)
        out2 = normalizer2.backward(out2.reshape(B, T, 2, -1)).reshape(B, T, -1)

        out1_1, out1_2 = out1_both[:B], out1_both[B:]
        out2_1, out2_2 = out2[..., :F], out2[..., F:]

        # --- align individual outputs onto interaction trajectories ---
        if cfg.align:
            # Stack persons (2B) and take the fast algebraic path — identical
            # output to the reference's ih_to_smpl/align_motions/smpl_to_ih
            # chain, minus the axis-angle detour (see utils.alignment).
            o1 = jnp.concatenate([out1_1, out1_2], axis=0)
            o2 = jnp.concatenate([out2_1, out2_2], axis=0)
            am = None if mask is None else jnp.concatenate([mask, mask], axis=0)
            o2_ih, o1_ih = align_persons_fast(o2, o1, am)
            out1_1, out1_2 = o1_ih[:B], o1_ih[B:]
            out2_1, out2_2 = o2_ih[:B], o2_ih[B:]

        out1 = jnp.concatenate([out1_1, out1_2], axis=-1)
        out2 = jnp.concatenate([out2_1, out2_2], axis=-1)

        # --- influence prediction ---
        if compute_dtype is not None:
            cd = lambda a: a.astype(compute_dtype)
            infl1, infl2 = core_apply(
                params["core"], cd(out1_1), cd(out1_2), cd(out2_1), cd(out2_2), t,
                cd(cond_I), cd(cond_i1), cd(cond_i2), mask,
                train=train, rngs=rngs,
            )
            infl1 = infl1.astype(jnp.float32)
            infl2 = infl2.astype(jnp.float32)
        else:
            infl1, infl2 = core_apply(
                params["core"], out1_1, out1_2, out2_1, out2_2, t,
                cond_I, cond_i1, cond_i2, mask,
                train=train, rngs=rngs,
            )

        if force_influence_val is not None:
            infl1 = jnp.full_like(infl1, force_influence_val)
            infl2 = jnp.full_like(infl2, force_influence_val)

        # --- blend (mixermdm.py:799-801) ---
        mixed_1 = out2_1 + infl1 * (out1_1 - out2_1)
        mixed_2 = out2_2 + infl2 * (out1_2 - out2_2)
        out_influenced = jnp.concatenate([mixed_1, mixed_2], axis=-1)

        return out_influenced, out1, out2, (infl1, infl2)

    return forward
