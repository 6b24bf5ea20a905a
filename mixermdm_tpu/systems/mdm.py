"""MDM system: single-person baseline (Tevet-style).

Reference surface ``/root/reference/src/models/mdm.py:9-231``: CLIP ViT-B/32
``encode_text`` -> Linear(512 -> latent) cond, MDMDenoiser, MotionDiffusion
(individual), CFG DDIM sampling with 22-token context zero-padded to 77
(mdm.py:104-112).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from ..config import Config
from ..diffusion import gaussian as G
from ..diffusion.losses import motion_training_losses
from ..diffusion.schedule import named_schedule, resolve_sampler_strategy
from ..models.cfg import cfg_model
from ..models.clip_text import ClipTextConfig, ClipTextEncoder, default_tokenizer, tokenize
from ..models.layers import TorchLinear
from ..models.mdm import MDMDenoiser
from ..utils.normalizer import Normalizer, hml3d_normalizer


class MDMSystem:
    def __init__(
        self,
        cfg: Config,
        clip_cfg: Optional[ClipTextConfig] = None,
        normalizer: Optional[Normalizer] = None,
        data_root: str = "./data",
    ):
        self.cfg = cfg
        self.nfeats = int(cfg.INPUT_DIM)
        self.clip_cfg = clip_cfg or ClipTextConfig.vit_b_32()
        self.clip = ClipTextEncoder(self.clip_cfg)
        self.embed_text = TorchLinear(int(cfg.LATENT_DIM))
        self.denoiser = MDMDenoiser(
            input_feats=self.nfeats,
            latent_dim=int(cfg.LATENT_DIM),
            ff_size=int(cfg.FF_SIZE),
            num_layers=int(cfg.NUM_LAYERS),
            num_heads=int(cfg.NUM_HEADS),
            dropout=float(cfg.get("DROPOUT", 0.0)),
        )
        steps = int(cfg.DIFFUSION_STEPS)
        self.train_schedule = named_schedule(cfg.BETA_SCHEDULER, steps)
        self.sampler_type, strategy = resolve_sampler_strategy(cfg)
        self.sample_schedule = named_schedule(cfg.BETA_SCHEDULER, steps, strategy)
        self.normalizer = normalizer if normalizer is not None else hml3d_normalizer(data_root)
        self.tokenizer = default_tokenizer()
        import jax as _jax
        self.compute_dtype = (
            jnp.bfloat16 if _jax.default_backend() == "tpu" else None
        )
        self._jit_sample = {}

    def init_params(self, rng):
        """Initialise all params as ONE jitted program (eager init is
        hundreds of per-op dispatches — pathological over a device tunnel)."""
        import jax as _jax
        if not hasattr(self, "_jit_init"):
            self._jit_init = _jax.jit(self._init_params_impl)
        return self._jit_init(rng)

    def _init_params_impl(self, rng):
        r1, r2, r3 = jax.random.split(rng, 3)
        tokens = jnp.zeros((1, self.clip_cfg.context_length), jnp.int32)
        clip_params = self.clip.init(r1, tokens)["params"]
        proj_dim = self.clip_cfg.projection_dim or self.clip_cfg.width
        embed_params = self.embed_text.init(r2, jnp.zeros((1, proj_dim)))["params"]
        x = jnp.zeros((1, 8, self.nfeats))
        dn_params = self.denoiser.init(
            r3, x, jnp.zeros((1,), jnp.int32), None, jnp.zeros((1, int(self.cfg.LATENT_DIM)))
        )["params"]
        return {"clip": clip_params, "embed_text": embed_params, "denoiser": dn_params}

    def encode_cond_tokens(self, params, batch_tokens: dict):
        """Cond from pre-tokenised text (key ``tokens``, already in the
        22-context/77-pad layout).  Jitted lazily — eager CLIP-tower
        dispatch costs seconds over the device tunnel (see
        In2INSystem.encode_cond_tokens)."""
        if not hasattr(self, "_jit_enc_tokens"):
            self._jit_enc_tokens = jax.jit(self._encode_cond_tokens_impl)
        return self._jit_enc_tokens(params, batch_tokens)

    def _encode_cond_tokens_impl(self, params, batch_tokens: dict):
        feats = jax.lax.stop_gradient(
            self.clip.apply({"params": params["clip"]}, batch_tokens["tokens"])
        ).astype(jnp.float32)
        return self.embed_text.apply({"params": params["embed_text"]}, feats)

    def text_process(self, params, texts):
        """22-token context zero-padded to 77, encode_text, project to latent."""
        tokens = jnp.asarray(tokenize(texts, self.tokenizer, context_length=22, pad_to=77))
        feats = jax.lax.stop_gradient(
            self.clip.apply({"params": params["clip"]}, tokens)
        ).astype(jnp.float32)
        return self.embed_text.apply({"params": params["embed_text"]}, feats)

    def denoiser_apply(self, cast: bool = False):
        d = self.denoiser
        cd = self.compute_dtype if cast else None

        def apply(p, x, t, mask, cond, train=False, rngs=None):
            if cd is not None:
                out = d.apply({"params": p}, x.astype(cd), t, mask,
                              cond.astype(cd), train=train, rngs=rngs)
                return out.astype(jnp.float32)
            return d.apply({"params": p}, x, t, mask, cond, train=train, rngs=rngs)

        return apply

    def compute_loss(self, params, motions, motion_lens, cond, rng,
                     cond_mask_prob=0.1, t=None):
        from .in2in import generate_src_mask

        B, T = motions.shape[:2]
        rng_mask, rng_t, rng_noise = jax.random.split(rng, 3)
        if cond_mask_prob > 0:
            drop = jax.random.bernoulli(rng_mask, cond_mask_prob, (B, 1))
            cond = cond * (1.0 - drop)
        seq_mask = generate_src_mask(T, motion_lens, B)
        rng_t, rng_drop = jax.random.split(rng_t)
        if t is None:
            t = jax.random.randint(rng_t, (B,), 0, self.train_schedule.num_timesteps)
        apply = self.denoiser_apply()
        dparams = params["denoiser"]

        def model_fn(x_t, t_orig):
            return apply(dparams, x_t, t_orig, seq_mask, cond,
                         train=True, rngs={"dropout": rng_drop})

        return motion_training_losses(
            model_fn, self.train_schedule, motions, t, seq_mask, rng_noise,
            mode="individual", t_bar=int(self.cfg.T_BAR), normalizer=self.normalizer,
        )

    def sample(self, params, cond, n_frames: int, rng, normalize_output: bool = True):
        B = cond.shape[0]
        key = (B, n_frames)
        if key not in self._jit_sample:
            self._jit_sample[key] = jax.jit(partial(self._sample_impl, n_frames=n_frames))
        out = self._jit_sample[key](params, cond, rng)
        if normalize_output:
            out = self.normalizer.backward(out)
        return out

    def _sample_impl(self, params, cond, rng, *, n_frames):
        B = cond.shape[0]
        apply = self.denoiser_apply(cast=True)
        dparams = params["denoiser"]
        model = cfg_model(
            lambda x, t, m, c: apply(dparams, x, t, m, c), float(self.cfg.CFG_WEIGHT)
        )

        def model_fn(x, t_orig):
            return model(x, t_orig, None, cond)

        loop = (G.dpmpp_sample_loop if self.sampler_type == "dpmpp"
                else G.ddim_sample_loop)
        return loop(
            model_fn, self.sample_schedule, (B, n_frames, self.nfeats), rng,
            clip_denoised=False,
        )

    def forward_test(self, params, batch, rng):
        cond = self.text_process(params, batch["text"])
        return self.sample(params, cond, int(batch["motion_lens"][0]), rng)
