"""MixerMDM system: the flagship learnable composition.

Reference surface ``/root/reference/src/models/mixermdm.py:18-602``:
wraps two frozen pre-trained models (individual + interaction), the Mixer
(influence net + embedders), two discriminators, and its own CLIP
post-encoder; ``generate_cond`` concatenates 8x768 conditions;
``compute_loss`` runs adversarial training; ``forward``/``forward_test`` run
the dual-stream CFG DDIM chain.

TPU re-design highlights
------------------------
* the whole 50-step chain compiles to one ``lax.scan`` (the reference loops
  in Python and rebuilds its diffusion object per call, mixermdm.py:515);
* CFG cond/uncond and the two person streams are batch-stacked, so each DDIM
  step costs ONE jitted forward of each frozen denoiser at 4B effective
  batch (2 CFG x 2 persons) instead of 6 separate module calls;
* influence histories come back as scan outputs, not Python-side mutation.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from ..config import Config, MIXERMDM_DEFAULT
from ..diffusion.mixer_diffusion import (
    ddim_sample_loop_x2,
    dpmpp_sample_loop_x2,
    mixer_training_losses,
)
from ..diffusion.schedule import named_schedule, resolve_sampler_strategy
from ..models.cfg import cfg_model_x2
from ..models.clip_text import ClipTextConfig
from ..models.discriminator import DiscriminatorTransformer
from ..models.mixer import MixerConfig, MixerCore, make_mixer_forward
from ..utils.normalizer import Normalizer, hml3d_normalizer, interhuman_normalizer
from .in2in import In2INSystem, generate_src_mask
from .text import TextPipeline


def _maybe_quant(inner, quant: bool, frozen: bool = True):
    """Wrap a bound denoiser apply in the frozen-fused and (optional) W8A8
    trace-time scopes — the adapters' submodels are frozen by construction,
    so the VJP-less fused kernels are always legal for them."""

    def apply(p, x, t, mask, cond, train=False, rngs=None):
        from ..models.layers import fused_scope, w8a8_scope

        with fused_scope(frozen and not train), \
             w8a8_scope(quant and not train):
            return inner(p, x, t, mask, cond, train=train, rngs=rngs)

    return apply


class MDMAsIndividual:
    """Adapter presenting an MDMSystem with the In2INSystem submodel API the
    Mixer expects (reference supports MDM as MODEL1, mixermdm.py:32-35).

    NOTE on the reference quirk: upstream's MDM branch mis-slices the cond
    vector (``MDMDenoiser.text_dim=256`` vs actual 512-d cond — SURVEY.md
    §2.4), so MDM+in2IN mixing is broken there.  Here text dims are wired
    from the actual cond width, so the combination works.
    """

    def __init__(self, mdm):
        self.mdm = mdm
        self.text_dim = int(mdm.cfg.LATENT_DIM)  # cond after embed_text

    def init_params(self, rng):
        p = self.mdm.init_params(rng)
        return {
            "denoiser_individual": p["denoiser"],
            "clip": p["clip"],
            "embed_text": p["embed_text"],
        }

    def denoiser_apply(self, name: str, cast: bool = False, quant: bool = False,
                       frozen: bool = True):
        inner = self.mdm.denoiser_apply(cast)
        return _maybe_quant(inner, quant, frozen)

    def text_process(self, params, texts, mode="individual"):
        return self.mdm.text_process(
            {"clip": params["clip"], "embed_text": params["embed_text"]}, texts
        )

    def encode_tokens(self, params, tokens, head="individual"):
        # NOTE: uses the standard 77-token layout (the reference MDM pairing
        # truncates to 22 tokens — and is broken by its cond mis-slice anyway).
        return self.mdm.encode_cond_tokens(
            {"clip": params["clip"], "embed_text": params["embed_text"]},
            {"tokens": tokens},
        )


class InterGenAsInteraction:
    """Adapter presenting an InterGenSystem as the interaction submodel
    (reference supports InterGen as MODEL2, mixermdm.py:37-40)."""

    def __init__(self, intergen):
        self.intergen = intergen
        self.text = intergen.text
        self.text_dim = intergen.text_dim

    def init_params(self, rng):
        p = self.intergen.init_params(rng)
        return {"denoiser_interaction": p["denoiser"], "text": p["text"]}

    def denoiser_apply(self, name: str, cast: bool = False, quant: bool = False,
                       frozen: bool = True):
        return _maybe_quant(self.intergen.denoiser_apply(cast), quant, frozen)

    def text_process(self, params, texts, mode="interaction"):
        return self.text.encode_texts(params["text"], texts, head="interaction")

    def encode_tokens(self, params, tokens, head="interaction"):
        return self.text.encode(params["text"], tokens, "interaction")


def build_mixer_system(cfg, cfg_model1, cfg_model2, clip_cfg=None, **kwargs):
    """Factory wiring MODEL1/MODEL2 by NAME (reference mixermdm.py:32-40):
    MODEL1 in {"in2INind", "MDM"}, MODEL2 in {"in2IN", "InterGen"}."""
    from .intergen import InterGenSystem
    from .mdm import MDMSystem

    name1 = cfg_model1.get("NAME", "in2INind")
    name2 = cfg_model2.get("NAME", "in2IN")

    if name1 == "MDM":
        model1 = MDMAsIndividual(MDMSystem(cfg_model1, clip_cfg=clip_cfg))
    else:
        model1 = In2INSystem(cfg_model1, mode="individual", clip_cfg=clip_cfg)

    if name2 == "InterGen":
        model2 = InterGenAsInteraction(InterGenSystem(cfg_model2, clip_cfg=clip_cfg))
    else:
        model2 = In2INSystem(cfg_model2, mode="interaction", clip_cfg=clip_cfg)

    return MixerMDMSystem(cfg, model1=model1, model2=model2, clip_cfg=clip_cfg, **kwargs)


class MixerMDMSystem:
    def __init__(
        self,
        cfg: Optional[Config] = None,
        model1: Optional[In2INSystem] = None,
        model2: Optional[In2INSystem] = None,
        clip_cfg: Optional[ClipTextConfig] = None,
        align: bool = True,
        data_root: str = "./data",
        normalizer1: Optional[Normalizer] = None,
        normalizer2: Optional[Normalizer] = None,
        compute_dtype: str = "auto",
    ):
        self.cfg = cfg or MIXERMDM_DEFAULT
        g = self.cfg.GENERATOR if "GENERATOR" in self.cfg else self.cfg
        d = self.cfg.DISCRIMINATOR if "DISCRIMINATOR" in self.cfg else self.cfg
        self.nfeats = int(g.INPUT_DIM)
        self.align = align

        # Frozen submodels (the shipped config pairs in2IN-individual with
        # in2IN-interaction; MDM/InterGen variants plug in the same way).
        self.model1 = model1 or In2INSystem(mode="individual", clip_cfg=clip_cfg, data_root=data_root)
        self.model2 = model2 or In2INSystem(mode="interaction", clip_cfg=clip_cfg, data_root=data_root)

        self.text_dim = (clip_cfg or self.model2.text.clip_cfg).width
        self.mixer_cfg = MixerConfig(
            nfeats=self.nfeats,
            latent_dim=int(g.LATENT_DIM),
            ff_size=int(g.FF_SIZE),
            n_blocks=int(g.NUM_LAYERS),
            n_heads=int(g.NUM_HEADS),
            mixing_mode=int(self.cfg.MIXING_MODE),
            align=align,
            text_dim=self.text_dim,
            denoiser1_text_dim=self.model1.text_dim,
            denoiser2_text_dim=self.model2.text_dim,
        )
        self.core = MixerCore(
            nfeats=self.nfeats,
            latent_dim=self.mixer_cfg.latent_dim,
            ff_size=self.mixer_cfg.ff_size,
            n_blocks=self.mixer_cfg.n_blocks,
            n_heads=self.mixer_cfg.n_heads,
            mixing_mode=self.mixer_cfg.mixing_mode,
            dropout=float(g.get("DROPOUT", 0.0)),
        )
        self.disc_i = DiscriminatorTransformer(
            input_feats=self.nfeats,
            latent_dim=int(d.LATENT_DIM),
            ff_size=int(d.FF_SIZE),
            num_layers=int(d.NUM_LAYERS),
            num_heads=int(d.NUM_HEADS),
            dropout=float(d.get("DROPOUT", 0.0)),
        )
        self.disc_I = DiscriminatorTransformer(
            input_feats=self.nfeats * 2,
            latent_dim=int(d.LATENT_DIM),
            ff_size=int(d.FF_SIZE),
            num_layers=int(d.NUM_LAYERS),
            num_heads=int(d.NUM_HEADS),
            dropout=float(d.get("DROPOUT", 0.0)),
        )
        # Own CLIP post-encoder for the influence conds (mixermdm.py:244-256).
        self.text = TextPipeline(clip_cfg or self.model2.text.clip_cfg, heads=("mixer",))

        steps = int(self.cfg.DIFFUSION_STEPS)
        self.train_schedule = named_schedule(self.cfg.BETA_SCHEDULER, steps)
        # SAMPLER_TYPE "ddim" (reference behaviour) or "dpmpp" (DPM-Solver++
        # (2M): ~half the model calls at DDIM-50 quality — TPU-native
        # addition, gated by scripts/sampler_ab.py).  STRATEGY "dpmppN" is
        # shorthand for SAMPLER_TYPE dpmpp over ddim-strided N steps.
        self.sampler_type, strategy = resolve_sampler_strategy(self.cfg)
        self.sample_schedule = named_schedule(
            self.cfg.BETA_SCHEDULER, steps, strategy
        )
        # SAMPLER config → timestep draw (reference mixermdm.py:128-129,450;
        # the reference never calls update_with_local_losses from any training
        # path, so the sampler state stays at its init here too).
        from ..diffusion.samplers import create_named_schedule_sampler

        (self._sampler_state0, self._sample_t, _) = create_named_schedule_sampler(
            self.cfg.get("SAMPLER", "uniform"), steps
        )

        self.normalizer1 = normalizer1 if normalizer1 is not None else hml3d_normalizer(data_root)
        self.normalizer2 = normalizer2 if normalizer2 is not None else interhuman_normalizer(data_root)

        self.cfg_weight = float(self.cfg.CFG_WEIGHT)
        # Defensive double-guard against the yaml "None"-as-string hazard
        # (config.load_yaml already literal_evals like yacs, but configs can
        # also be constructed programmatically).
        fiv = self.cfg.get("FORCE_INFLUENCE_VAL", None)
        self.force_influence_val = None if fiv in (None, "None", "") else float(fiv)

        # bf16 transformer compute on TPU (MXU-native); f32 elsewhere.  The
        # diffusion arithmetic + quaternion alignment always stay f32.
        if compute_dtype == "auto":
            self.compute_dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else None
        elif compute_dtype in ("bf16", "bfloat16"):
            self.compute_dtype = jnp.bfloat16
        else:
            self.compute_dtype = None

        # W8A8 for the FROZEN in2IN denoisers at sampling time (the mixer
        # itself stays bf16).  MXU int8 runs at 2x the bf16 rate on v5e;
        # per-channel weight + per-token activation scales.  Config
        # QUANT_FROZEN gates sampling; QUANT_TRAIN (opt-in, default off)
        # additionally quantises the frozen denoiser FORWARDS inside the
        # adversarial training loss — only the frozen fused subgraphs see
        # int8 (the differentiated mixer/discriminator graphs trace with
        # fused blocks off, so the scope cannot reach them), but the
        # generator's training signal then comes from int8 frozen outputs,
        # so it ships opt-in (see BASELINE.md round-3 training A/B).
        self.quant_frozen = bool(self.cfg.get("QUANT_FROZEN", False))
        self.quant_train = bool(self.cfg.get("QUANT_TRAIN", False))
        # Discriminator compute dtype in the adversarial losses (mirrors the
        # reference's 16-mixed harness).  Follows compute_dtype; overridable
        # for A/Bs (scripts/bench_train.py --f32-disc).
        self.disc_compute_dtype = self.compute_dtype
        self._mixer_forward = make_mixer_forward(
            self.mixer_cfg,
            # quant rides the SAMPLING whole-trace scope (_sample_impl), so
            # QUANT_FROZEN never alters the TRAINING signal; `frozen` (fused
            # kernels, no remat) is legal in both.
            self.model1.denoiser_apply("individual", frozen=True),
            self.model2.denoiser_apply("interaction", frozen=True),
            lambda p, *args, train=False, rngs=None: self.core.apply(
                {"params": p}, *args, train=train, rngs=rngs
            ),
            self.normalizer1,
            self.normalizer2,
            compute_dtype=self.compute_dtype,
        )
        self._jit_sample = {}
        self._jit_loss = {}

    # ------------------------------------------------------------------ params
    def init_params(self, rng):
        """Initialise all params as ONE jitted program (eager init is
        hundreds of per-op dispatches — pathological over a device tunnel)."""
        import jax as _jax
        if not hasattr(self, "_jit_init"):
            self._jit_init = _jax.jit(self._init_params_impl)
        return self._jit_init(rng)

    def _init_params_impl(self, rng) -> dict:
        r = jax.random.split(rng, 6)
        T0, F = 8, self.nfeats
        params = {
            "model1": self.model1.init_params(r[0]),
            "model2": self.model2.init_params(r[1]),
            "text": self.text.init_params(r[2]),
        }
        zeros = jnp.zeros
        td = self.text_dim
        params["core"] = self.core.init(
            r[3],
            zeros((1, T0, F)), zeros((1, T0, F)), zeros((1, T0, F)), zeros((1, T0, F)),
            zeros((1,), jnp.int32), zeros((1, td)), zeros((1, td)), zeros((1, td)),
        )["params"]
        t0 = zeros((1,), jnp.int32)
        params["disc_i"] = self.disc_i.init(
            r[4], zeros((1, T0, F)), t0, None, zeros((1, td))
        )["params"]
        params["disc_I"] = self.disc_I.init(
            r[5], zeros((1, T0, 2 * F)), t0, None, zeros((1, td))
        )["params"]
        return params

    def mixer_params(self, params) -> dict:
        return {
            "core": params["core"],
            "denoiser1": params["model1"]["denoiser_individual"],
            "denoiser2": params["model2"]["denoiser_interaction"],
        }

    # ------------------------------------------------------------------- text
    def text_process(self, params, texts):
        """The mixer's own post-encoder head (mixermdm.py:283-313)."""
        return self.text.encode_texts(params["text"], texts, head="mixer")

    def encode_cond(self, params, tokens_inter, tokens_i1, tokens_i2) -> jnp.ndarray:
        """Cond encoder over pre-tokenised text.

        Fixed order [I, I_i1, I_i2, ind_i1, ind_i2, mix_I, mix_i1, mix_i2]
        (mixermdm.py:315-356).  The frozen submodels' conds are
        stop-gradiented; the mixer's own head trains (the reference's
        generator optimizer includes ``clipTransEncoder``/``clip_ln``,
        scripts/train/mixermdm.py:62-97).

        Jitted lazily: the 8 CLIP-tower encodes are hundreds of small ops —
        eager per-op dispatch over the device tunnel costs ~6.5 s/call where
        the compiled program takes milliseconds, which dominated serving
        latency and the eval-protocol generation loops.  Trainers calling
        this inside their own jit simply inline it.
        """
        if not hasattr(self, "_jit_encode_cond"):
            self._jit_encode_cond = jax.jit(self._encode_cond_impl)
        return self._jit_encode_cond(params, tokens_inter, tokens_i1, tokens_i2)

    def _encode_cond_impl(self, params, tokens_inter, tokens_i1, tokens_i2) -> jnp.ndarray:
        enc2 = lambda tok: self.model2.encode_tokens(
            params["model2"], tok, "interaction"
        )
        enc1 = lambda tok: self.model1.encode_tokens(
            params["model1"], tok, "individual"
        )
        encM = lambda tok: self.text.encode(params["text"], tok, "mixer")
        frozen = jax.lax.stop_gradient(
            jnp.concatenate(
                [enc2(tokens_inter), enc2(tokens_i1), enc2(tokens_i2),
                 enc1(tokens_i1), enc1(tokens_i2)],
                axis=1,
            )
        )
        mix = jnp.concatenate(
            [encM(tokens_inter), encM(tokens_i1), encM(tokens_i2)], axis=1
        )
        return jnp.concatenate([frozen, mix], axis=1)

    def tokenize_batch(self, batch: dict) -> dict:
        """Host-side tokenisation of the three text fields."""
        text_inter = batch.get("text_interaction", batch.get("text"))
        return {
            "tokens_inter": self.text.tokenize(text_inter),
            "tokens_i1": self.text.tokenize(batch["text_individual1"]),
            "tokens_i2": self.text.tokenize(batch["text_individual2"]),
        }

    def generate_cond(self, params, batch: dict) -> jnp.ndarray:
        """String-batch convenience wrapper (tokenise + encode)."""
        toks = self.tokenize_batch(batch)
        return self.encode_cond(
            params, toks["tokens_inter"], toks["tokens_i1"], toks["tokens_i2"]
        )

    # ------------------------------------------------------------------- loss
    def compute_loss(self, params, motions, motion_lens, cond, rng, *, mode,
                     i_loss_factor=1.0, I_loss_factor=2.0, l1=0.1,
                     cond_mask_prob=0.1):
        """Adversarial loss, jitted per (mode, shape) (mixermdm.py:390-488)."""
        key = (mode, motions.shape, float(i_loss_factor), float(I_loss_factor), float(l1))
        if key not in self._jit_loss:
            self._jit_loss[key] = jax.jit(
                partial(
                    self._loss_impl, mode=mode, i_loss_factor=i_loss_factor,
                    I_loss_factor=I_loss_factor, l1=l1, cond_mask_prob=cond_mask_prob,
                )
            )
        return self._jit_loss[key](params, motions, motion_lens, cond, rng)

    def _loss_impl(self, params, motions, motion_lens, cond, rng, *, mode,
                   i_loss_factor, I_loss_factor, l1, cond_mask_prob):
        from ..models.layers import w8a8_scope

        with w8a8_scope(self.quant_train):
            return self._loss_body(
                params, motions, motion_lens, cond, rng, mode=mode,
                i_loss_factor=i_loss_factor, I_loss_factor=I_loss_factor,
                l1=l1, cond_mask_prob=cond_mask_prob,
            )

    def _loss_body(self, params, motions, motion_lens, cond, rng, *, mode,
                   i_loss_factor, I_loss_factor, l1, cond_mask_prob):
        B, T = motions.shape[:2]
        rng_mask, rng_t, rng_noise = jax.random.split(rng, 3)
        if cond_mask_prob > 0:
            drop = jax.random.bernoulli(rng_mask, cond_mask_prob, (B, 1))
            cond = cond * (1.0 - drop)
        seq_mask = generate_src_mask(T, motion_lens, B)
        rng_t, rng_drop = jax.random.split(rng_t)
        # SAMPLER-config draw; the importance weight is discarded exactly like
        # the reference (`t, _ = self.sampler.sample(...)`, mixermdm.py:450).
        t, _ = self._sample_t(rng_t, B, self._sampler_state0)

        loss_params = {
            "mixer": self.mixer_params(params),
            "disc_i": params["disc_i"],
            "disc_I": params["disc_I"],
        }
        return mixer_training_losses(
            self._mixer_forward,
            lambda p, x, tt, m, c, train=False, rngs=None: self.disc_i.apply(
                {"params": p}, x, tt, m, c, train=train, rngs=rngs
            ),
            lambda p, x, tt, m, c, train=False, rngs=None: self.disc_I.apply(
                {"params": p}, x, tt, m, c, train=train, rngs=rngs
            ),
            loss_params,
            self.train_schedule,
            motions, t, cond, seq_mask, rng_noise,
            mode=mode,
            i_loss_factor=i_loss_factor, I_loss_factor=I_loss_factor, l1=l1,
            align=self.align,
            normalizer1=self.normalizer1, normalizer2=self.normalizer2,
            cond_slices=self.mixer_cfg.cond_slices(),
            nfeats=self.nfeats,
            dropout_rng=rng_drop,
            # bf16 discriminator compute on TPU (the reference trains under
            # Lightning 16-mixed, so its disc matmuls autocast to half too).
            compute_dtype=self.disc_compute_dtype,
        )

    # ----------------------------------------------------------------- sample
    _FIV_FROM_CONFIG = object()  # sentinel: "use self.force_influence_val"

    def sample(self, params, cond, n_frames: int, rng, collect_influence: bool = False,
               force_influence_val=_FIV_FROM_CONFIG,
               traj_control=None, skip_timesteps: int = 0, init_image=None):
        """Full dual-stream CFG DDIM chain (mixermdm.py:490-548).

        Returns raw-motion (B, T, 524) output; with ``collect_influence`` also
        the per-step (infl1, infl2) histories as stacked arrays.

        ``force_influence_val`` (reference mixermdm.py:789-791) is a TRACED
        argument: sweeping its value (eval datasets compare base vs composed
        behaviour) re-uses one compiled program instead of baking the value
        into the trace.  Only ``is None`` (override off/on) is a cache key.
        """
        fiv = (self.force_influence_val
               if force_influence_val is MixerMDMSystem._FIV_FROM_CONFIG
               else force_influence_val)
        B = cond.shape[0]
        key = (B, n_frames, collect_influence, fiv is None, int(skip_timesteps),
               traj_control is None, init_image is None)
        if key not in self._jit_sample:
            self._jit_sample[key] = jax.jit(
                partial(self._sample_impl, n_frames=n_frames,
                        collect_influence=collect_influence,
                        use_fiv=fiv is not None,
                        skip_timesteps=int(skip_timesteps))
            )
        fiv_val = jnp.float32(0.0 if fiv is None else fiv)
        return self._jit_sample[key](params, cond, rng, fiv_val,
                                     traj_control, init_image)

    def _sample_impl(self, params, cond, rng, fiv_val, traj_control=None,
                     init_image=None, *, n_frames, collect_influence, use_fiv,
                     skip_timesteps: int = 0):
        from ..models.layers import w8a8_scope

        with w8a8_scope(self.quant_frozen):
            return self._sample_body(params, cond, rng, fiv_val,
                                     n_frames=n_frames,
                                     collect_influence=collect_influence,
                                     use_fiv=use_fiv,
                                     traj_control=traj_control,
                                     init_image=init_image,
                                     skip_timesteps=skip_timesteps)

    def _sample_body(self, params, cond, rng, fiv_val, *, n_frames,
                     collect_influence, use_fiv, traj_control=None,
                     init_image=None, skip_timesteps: int = 0):
        """At sampling time EVERY network is frozen, so under QUANT_FROZEN
        the whole trace (mixer/influence core included, not just the in2IN
        denoisers) runs its fused-block projections as int8 on the MXU."""
        B = cond.shape[0]
        mp = self.mixer_params(params)
        if self.compute_dtype is not None:
            # Pre-cast the frozen trees once: every layer computes
            # ``x @ kernel.astype(x.dtype)`` anyway (same math), but with f32
            # params the cast re-reads ~1 GB of f32 weights from HBM per
            # DDIM step inside the scan.
            mp = jax.tree_util.tree_map(
                lambda a: a.astype(self.compute_dtype)
                if a.dtype == jnp.float32 else a,
                mp,
            )
        fiv = fiv_val if use_fiv else None

        if collect_influence:
            def mixer_eval(x, x2, t_orig, mask, c):
                mixed, _, _, infl = self._mixer_forward(mp, x, t_orig, c, mask, x2, fiv)
                return mixed, infl
        else:
            def mixer_eval(x, x2, t_orig, mask, c):
                mixed, _, _, _ = self._mixer_forward(mp, x, t_orig, c, mask, x2, fiv)
                return mixed

        model = cfg_model_x2(mixer_eval, self.cfg_weight, with_influence=collect_influence)

        loop = (dpmpp_sample_loop_x2 if self.sampler_type == "dpmpp"
                else ddim_sample_loop_x2)
        return loop(
            model, self.sample_schedule, (B, n_frames, self.nfeats * 2), rng, cond,
            normalizer1=self.normalizer1, normalizer2=self.normalizer2,
            align=self.align, nfeats=self.nfeats, collect_influence=collect_influence,
            traj_control=traj_control, skip_timesteps=skip_timesteps,
            init_image=init_image,
        )

    def forward(self, params, batch: dict, rng):
        """Text encode + sample with influence histories (mixermdm.py:490)."""
        cond = self.generate_cond(params, batch)
        n_frames = int(batch["motion_lens"][0])
        out, infl = self.sample(params, cond, n_frames, rng, collect_influence=True)
        return {"output": out, "influence_i1": infl[0], "influence_i2": infl[1]}

    def forward_test(self, params, batch: dict, rng):
        """Sampling only (mixermdm.py:550-602)."""
        cond = self.generate_cond(params, batch)
        n_frames = int(batch["motion_lens"][0])
        return self.sample(params, cond, n_frames, rng)
