"""in2IN system: denoiser(s) + diffusion + text pipeline + CFG sampling.

Reference public surface (``/root/reference/src/models/in2in.py:11-356``):
``compute_loss(batch)``, ``forward``/``forward_test`` (full DDIM chain),
``text_process``; modes ``individual`` / ``interaction`` / ``dual``.

TPU re-design: the system object holds static module definitions and
precomputed schedules; all compute methods are pure functions of a params
pytree and are jitted once (the reference rebuilds its sampling diffusion
object on every forward, in2in.py:307-316).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from ..config import Config, IN2IN_INTERACTION_DEFAULT
from ..diffusion import gaussian as G
from ..diffusion.losses import motion_training_losses
from ..diffusion.schedule import named_schedule, resolve_sampler_strategy
from ..models.cfg import cfg_dual_mdm, cfg_model, cfg_model_multiple
from ..models.clip_text import ClipTextConfig
from ..models.in2in import In2INDenoiser
from ..utils.normalizer import Normalizer, hml3d_normalizer, interhuman_normalizer
from .text import TextPipeline


class In2INSystem:
    """Mode-specialised in2IN model family."""

    def __init__(
        self,
        cfg: Optional[Config] = None,
        mode: str = "interaction",
        clip_cfg: Optional[ClipTextConfig] = None,
        normalizer: Optional[Normalizer] = None,
        data_root: str = "./data",
    ):
        self.cfg = cfg or IN2IN_INTERACTION_DEFAULT
        self.mode = mode
        self.nfeats = int(self.cfg.INPUT_DIM)

        heads = []
        if mode in ("interaction", "dual"):
            heads.append("interaction")
        if mode in ("individual", "dual"):
            heads.append("individual")
        self.text = TextPipeline(clip_cfg, heads=tuple(heads))

        self.text_dim = self.text.clip_cfg.width

        def make_denoiser(dmode):
            return In2INDenoiser(
                input_feats=self.nfeats,
                mode=dmode,
                latent_dim=int(self.cfg.LATENT_DIM),
                ff_size=int(self.cfg.FF_SIZE),
                num_layers=int(self.cfg.NUM_LAYERS),
                num_heads=int(self.cfg.NUM_HEADS),
                text_dim=self.text_dim,
                dropout=float(self.cfg.get("DROPOUT", 0.0)),
            )

        self.denoisers = {}
        if mode == "interaction":
            self.denoisers["interaction"] = make_denoiser("interaction")
        elif mode == "individual":
            self.denoisers["individual"] = make_denoiser("individual")
        elif mode == "dual":
            self.denoisers["interaction"] = make_denoiser("dual_interaction")
            self.denoisers["individual"] = make_denoiser("dual_individual")
        else:
            raise ValueError(mode)

        steps = int(self.cfg.DIFFUSION_STEPS)
        self.train_schedule = named_schedule(self.cfg.BETA_SCHEDULER, steps)
        self.sampler_type, strategy = resolve_sampler_strategy(self.cfg)
        self.sample_schedule = named_schedule(
            self.cfg.BETA_SCHEDULER, steps, strategy
        )

        if normalizer is not None:
            self.normalizer = normalizer
        elif mode == "interaction":
            self.normalizer = interhuman_normalizer(data_root)
        else:
            self.normalizer = hml3d_normalizer(data_root)

        import jax as _jax
        self.compute_dtype = (
            jnp.bfloat16 if _jax.default_backend() == "tpu" else None
        )
        # W8A8 int8 projections for the (frozen-at-inference) denoisers in
        # the sampling paths only; training is untouched.
        self._quant = bool(self.cfg.get("QUANT", False))
        self._jit_sample = {}

    # ------------------------------------------------------------------ params
    def init_params(self, rng):
        """Initialise all params as ONE jitted program (eager init is
        hundreds of per-op dispatches — pathological over a device tunnel)."""
        import jax as _jax
        if not hasattr(self, "_jit_init"):
            self._jit_init = _jax.jit(self._init_params_impl)
        return self._jit_init(rng)

    def _init_params_impl(self, rng: jax.Array) -> dict:
        rngs = jax.random.split(rng, 1 + len(self.denoisers))
        params = {"text": self.text.init_params(rngs[0])}
        T0, td = 8, self.text_dim
        for i, (name, d) in enumerate(self.denoisers.items()):
            if d.mode == "individual":
                x = jnp.zeros((1, T0, self.nfeats))
                cond = jnp.zeros((1, td))
            elif d.mode == "dual_individual":
                x = jnp.zeros((1, T0, 2 * self.nfeats))
                cond = jnp.zeros((1, 5 * td))
            else:
                x = jnp.zeros((1, T0, 2 * self.nfeats))
                cond = jnp.zeros((1, 3 * td if d.mode == "interaction" else 5 * td))
            t = jnp.zeros((1,), jnp.int32)
            params[f"denoiser_{name}"] = d.init(rngs[1 + i], x, t, None, cond)["params"]
        return params

    def denoiser_apply(self, name: str, cast: bool = False, quant: bool = False,
                       frozen: bool = False):
        """Bound apply fn; ``cast`` runs the transformer in ``compute_dtype``
        (bf16 on TPU) with f32 in/out at the boundary.  ``quant`` traces the
        call inside a W8A8 scope (int8 fused-block projections on the MXU);
        ``frozen`` re-enables the fused (VJP-less) kernels even inside a
        training trace — legal because no gradients ever flow through the
        mixer's frozen denoisers (see ``models.layers.fused_scope``)."""
        d = self.denoisers[name]
        cd = self.compute_dtype if cast else None

        def apply(p, x, t, mask, cond, train=False, rngs=None):
            from ..models.layers import fused_scope, w8a8_scope

            with fused_scope(frozen and not train), \
                 w8a8_scope(quant and not train):
                if cd is not None:
                    out = d.apply({"params": p}, x.astype(cd), t, mask,
                                  cond.astype(cd), train=train, rngs=rngs)
                    return out.astype(jnp.float32)
                return d.apply({"params": p}, x, t, mask, cond, train=train, rngs=rngs)

        return apply

    # ------------------------------------------------------------------- text
    def text_process(self, params, texts, mode: str):
        """Raw strings -> pooled 768-d cond through the mode's post-encoder."""
        return self.text.encode_texts(params["text"], texts, head=mode)

    def encode_tokens(self, params, tokens, head: str):
        """Jittable: pre-tokenised text -> pooled cond for one head."""
        return self.text.encode(params["text"], tokens, head)

    def encode_cond_tokens(self, params, batch_tokens: dict) -> jnp.ndarray:
        """Cond from pre-tokenised text (keys: ``tokens`` [+
        ``tokens_i1``/``tokens_i2`` in interaction/dual mode]).

        Jitted lazily: the CLIP towers are hundreds of small ops, and eager
        per-op dispatch over the device tunnel costs SECONDS per call where
        the compiled program takes milliseconds (measured 6.5 s vs 0.03 s on
        the tiny config).  Callers already inside a jit (the trainers)
        simply inline it."""
        if not hasattr(self, "_jit_enc_tokens"):
            self._jit_enc_tokens = jax.jit(self._encode_cond_tokens_impl)
        return self._jit_enc_tokens(params, batch_tokens)

    def _encode_cond_tokens_impl(self, params, batch_tokens: dict) -> jnp.ndarray:
        if self.mode == "interaction":
            e = lambda tok: self.text.encode(params["text"], tok, "interaction")
            return jnp.concatenate(
                [e(batch_tokens["tokens"]), e(batch_tokens["tokens_i1"]),
                 e(batch_tokens["tokens_i2"])], axis=1,
            )
        if self.mode == "individual":
            return self.text.encode(params["text"], batch_tokens["tokens"], "individual")
        ei = lambda tok: self.text.encode(params["text"], tok, "interaction")
        ep = lambda tok: self.text.encode(params["text"], tok, "individual")
        return jnp.concatenate(
            [ei(batch_tokens["tokens"]), ei(batch_tokens["tokens_i1"]),
             ei(batch_tokens["tokens_i2"]), ep(batch_tokens["tokens_i1"]),
             ep(batch_tokens["tokens_i2"])], axis=1,
        )

    def tokenize_batch(self, batch: dict) -> dict:
        out = {"tokens": self.text.tokenize(batch["text"])}
        if self.mode != "individual":
            out["tokens_i1"] = self.text.tokenize(batch["text_individual1"])
            out["tokens_i2"] = self.text.tokenize(batch["text_individual2"])
        return out

    def build_cond(self, params, batch: dict) -> jnp.ndarray:
        """Concatenated conds in the reference's order (in2in.py:248-301):
        host tokenisation + ONE jitted encode (see ``encode_cond_tokens``)."""
        return self.encode_cond_tokens(params, self.tokenize_batch(batch))

    # ------------------------------------------------------------------- loss
    def compute_loss(self, params, motions, motion_lens, cond, rng,
                     cond_mask_prob=0.1, t=None):
        """Training loss (in2in.py:246-283 -> MotionDiffusion.training_losses).

        ``motions``: (B, T, F[*2]) raw; ``cond`` pre-encoded.
        Pure in params — safe under jit/grad.  ``t`` injects externally
        sampled timesteps (schedule samplers, in2in.py:265); default is the
        uniform draw.
        """
        B, T = motions.shape[:2]
        rng_mask, rng_t, rng_noise = jax.random.split(rng, 3)

        if cond_mask_prob > 0:
            drop = jax.random.bernoulli(rng_mask, cond_mask_prob, (B, 1))
            cond = cond * (1.0 - drop)

        seq_mask = generate_src_mask(T, motion_lens, B)
        rng_t, rng_drop = jax.random.split(rng_t)
        if t is None:
            t = jax.random.randint(rng_t, (B,), 0, self.train_schedule.num_timesteps)

        name = "interaction" if self.mode != "individual" else "individual"
        apply = self.denoiser_apply(name)
        dparams = params[f"denoiser_{name}"]

        def model_fn(x_t, t_orig):
            return apply(dparams, x_t, t_orig, seq_mask, cond,
                         train=True, rngs={"dropout": rng_drop})

        return motion_training_losses(
            model_fn, self.train_schedule, motions, t, seq_mask, rng_noise,
            mode=name, t_bar=int(self.cfg.T_BAR), normalizer=self.normalizer,
        )

    # ----------------------------------------------------------------- sample
    def sample(self, params, cond, n_frames: int, rng, normalize_output: bool = True,
               traj_control=None, skip_timesteps: int = 0, init_image=None):
        """Full CFG DDIM chain, jitted per (B, T) shape (in2in.py:285-356).

        ``traj_control`` pins the root-trajectory dims from a given motion
        each step (reference ``x_start``, gaussian_diffusion.py:1052-1055);
        ``skip_timesteps``/``init_image`` warm-start the chain from a motion
        in the model's NORMALISED space (reference :1031-1038).  Both are
        traced arguments (only their presence recompiles).
        """
        B = cond.shape[0]
        key = (B, n_frames, int(skip_timesteps),
               traj_control is None, init_image is None)
        if key not in self._jit_sample:
            self._jit_sample[key] = jax.jit(
                partial(self._sample_impl, n_frames=n_frames,
                        skip_timesteps=int(skip_timesteps))
            )
        out = self._jit_sample[key](params, cond, rng, traj_control, init_image)
        if normalize_output:
            P = 2 if self.mode != "individual" else 1
            out = self.normalizer.backward(out.reshape(B, n_frames, P, -1)).reshape(
                B, n_frames, -1
            )
        return out

    def _sample_impl(self, params, cond, rng, traj_control=None, init_image=None,
                     *, n_frames, skip_timesteps: int = 0):
        B = cond.shape[0]
        if self.mode == "interaction":
            apply = self.denoiser_apply("interaction", cast=True, quant=self._quant)
            dparams = params["denoiser_interaction"]
            model = cfg_model_multiple(
                lambda x, t, m, c: apply(dparams, x, t, m, c),
                float(self.cfg.CFG_WEIGHT),
                float(self.cfg.CFG_WEIGHT_INTERACTION),
                float(self.cfg.CFG_WEIGHT_INDIVIDUAL),
            )
            shape = (B, n_frames, self.nfeats * 2)
        elif self.mode == "individual":
            apply = self.denoiser_apply("individual", cast=True, quant=self._quant)
            dparams = params["denoiser_individual"]
            model = cfg_model(
                lambda x, t, m, c: apply(dparams, x, t, m, c), float(self.cfg.CFG_WEIGHT)
            )
            shape = (B, n_frames, self.nfeats)
        else:  # dual = DualMDM composition baseline
            a_ind = self.denoiser_apply("individual", cast=True, quant=self._quant)
            a_int = self.denoiser_apply("interaction", cast=True, quant=self._quant)
            p_ind = params["denoiser_individual"]
            p_int = params["denoiser_interaction"]
            model = cfg_dual_mdm(
                lambda x, t, m, c: a_ind(p_ind, x, t, m, c),
                lambda x, t, m, c: a_int(p_int, x, t, m, c),
                float(self.cfg.CFG_WEIGHT_INDIVIDUAL),
                float(self.cfg.CFG_WEIGHT_INTERACTION),
                self.cfg.get("W_FUNC", "const"),
                float(self.cfg.get("W_VALUE", 0.5)),
            )
            shape = (B, n_frames, self.nfeats * 2)

        def model_fn(x, t_orig):
            return model(x, t_orig, None, cond)

        loop = (G.dpmpp_sample_loop if self.sampler_type == "dpmpp"
                else G.ddim_sample_loop)
        return loop(
            model_fn, self.sample_schedule, shape, rng, clip_denoised=False,
            traj_control=traj_control, skip_timesteps=skip_timesteps,
            init_image=init_image,
        )

    def forward_test(self, params, batch: dict, rng):
        """Reference ``forward_test``: text encode + sample (in2in.py:92-107)."""
        cond = self.build_cond(params, batch)
        n_frames = int(batch["motion_lens"][0])
        return self.sample(params, cond, n_frames, rng)


def generate_src_mask(T: int, lengths, B: int) -> jnp.ndarray:
    """(B, T, 2) binary mask, zero after each sequence's length
    (vectorised; reference uses a triple Python loop, in2in.py:237-244)."""
    frame = jnp.arange(T)[None, :] < jnp.asarray(lengths)[:, None]
    return jnp.repeat(frame[..., None].astype(jnp.float32), 2, axis=-1)
