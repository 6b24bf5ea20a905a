"""Config system: attribute-access dicts loaded from YAML.

Functional replacement for the reference's yacs wrapper
(``/root/reference/src/utils/configs.py:26-74``): same YAML schema (so the
reference's ``configs/models/*.yaml`` files parse unchanged), nested
``GENERATOR``/``DISCRIMINATOR`` blocks, ``MODEL1``/``MODEL2`` sub-config
paths, and the DualMDM ``W_FUNC``/``W_VALUE`` injection.
"""

from __future__ import annotations

import copy
from typing import Any


class Config(dict):
    """dict with attribute access; nested dicts are wrapped recursively."""

    def __getattr__(self, name: str) -> Any:
        try:
            return self[name]
        except KeyError as e:
            raise AttributeError(name) from e

    def __setattr__(self, name: str, value: Any) -> None:
        self[name] = value

    @classmethod
    def wrap(cls, obj):
        if isinstance(obj, dict):
            return cls({k: cls.wrap(v) for k, v in obj.items()})
        if isinstance(obj, list):
            return [cls.wrap(v) for v in obj]
        return obj

    def merged(self, other: dict) -> "Config":
        out = copy.deepcopy(self)
        for k, v in other.items():
            if isinstance(v, dict) and isinstance(out.get(k), dict):
                out[k] = Config.wrap(out[k]).merged(v)
            else:
                out[k] = Config.wrap(v)
        return out


def _coerce_scalar(v: Any) -> Any:
    """yacs-style scalar decoding for string YAML values.

    The reference loads configs through yacs, whose ``_decode_cfg_value``
    runs ``ast.literal_eval`` on string scalars so ``None`` / ``(1, 2)`` /
    ``1e-5`` written unquoted-but-stringly in YAML become Python values
    (yacs config.py).  ``yaml.safe_load`` alone leaves ``None`` as the
    *string* "None" (YAML's null spelling is ``null``/``~``), which made the
    shipped ``FORCE_INFLUENCE_VAL: None`` crash at sampling.  Mirror yacs:
    try literal_eval, keep the string on failure.
    """
    if not isinstance(v, str):
        return v
    import ast

    try:
        out = ast.literal_eval(v)
    except (ValueError, SyntaxError):
        return v
    # literal_eval succeeds for quoted-string-looking things too; only accept
    # non-str results (yacs keeps strings as-is in that case as well).
    return v if isinstance(out, str) else out


def _coerce_tree(obj: Any) -> Any:
    if isinstance(obj, dict):
        return {k: _coerce_tree(v) for k, v in obj.items()}
    if isinstance(obj, list):
        return [_coerce_tree(v) for v in obj]
    return _coerce_scalar(obj)


def load_yaml(path: str) -> Config:
    import yaml

    with open(path) as f:
        return Config.wrap(_coerce_tree(yaml.safe_load(f)))


def get_config(path: str) -> Config:
    """Load a model/train config file (configs.py:26-41)."""
    return load_yaml(path)


def get_config_model(path: str, w_func: str | None = None, w_value: float | None = None) -> Config:
    """Model config with DualMDM weight-schedule injection (configs.py:44-58)."""
    cfg = load_yaml(path)
    if w_func is not None:
        cfg["W_FUNC"] = w_func
    if w_value is not None:
        cfg["W_VALUE"] = w_value
    return cfg


def dataset_config(path: str, name: str) -> Config:
    """Named dataset variant from configs/datasets.yaml (configs.py:61-74)."""
    all_cfg = load_yaml(path)
    return all_cfg[name]


# ---------------------------------------------------------------------------
# Default architecture configs mirroring the reference's shipped YAMLs
# (configs/models/{MixerMDM,in2IN,individual}.yaml) so the framework works
# without any files on disk.
# ---------------------------------------------------------------------------

IN2IN_INTERACTION_DEFAULT = Config.wrap(
    {
        "NAME": "in2IN",
        "NUM_LAYERS": 8, "NUM_HEADS": 8, "DROPOUT": 0.1,
        "INPUT_DIM": 262, "LATENT_DIM": 1024, "FF_SIZE": 2048,
        "ACTIVATION": "gelu", "CHECKPOINT": "checkpoints/in2IN.ckpt",
        "DIFFUSION_STEPS": 1000, "BETA_SCHEDULER": "cosine", "SAMPLER": "uniform",
        "MOTION_REP": "global", "T_BAR": 700, "STRATEGY": "ddim50",
        "CFG_WEIGHT": 3, "CFG_WEIGHT_INTERACTION": 3, "CFG_WEIGHT_INDIVIDUAL": 1,
    }
)

IN2IN_INDIVIDUAL_DEFAULT = Config.wrap(
    {
        "NAME": "in2INind",
        "NUM_LAYERS": 8, "NUM_HEADS": 8, "DROPOUT": 0.1,
        "INPUT_DIM": 262, "LATENT_DIM": 1024, "FF_SIZE": 2048,
        "ACTIVATION": "gelu", "CHECKPOINT": "checkpoints/individual.ckpt",
        "DIFFUSION_STEPS": 1000, "BETA_SCHEDULER": "cosine", "SAMPLER": "uniform",
        "MOTION_REP": "global", "T_BAR": 700, "STRATEGY": "ddim50",
        "CFG_WEIGHT": 3.5,
    }
)

MIXERMDM_DEFAULT = Config.wrap(
    {
        "NAME": "MixerMDM",
        "GENERATOR": {
            "NUM_LAYERS": 4, "NUM_HEADS": 8, "DROPOUT": 0.1,
            "INPUT_DIM": 262, "LATENT_DIM": 512, "FF_SIZE": 1024,
        },
        "DISCRIMINATOR": {
            "NUM_LAYERS": 2, "NUM_HEADS": 4, "DROPOUT": 0.1,
            "INPUT_DIM": 262, "LATENT_DIM": 256, "FF_SIZE": 512,
        },
        "ACTIVATION": "gelu",
        "CHECKPOINT": "checkpoints/MixerMDM.ckpt",
        "DIFFUSION_STEPS": 1000, "BETA_SCHEDULER": "cosine", "SAMPLER": "uniform",
        "MOTION_REP": "global", "T_BAR": 700, "STRATEGY": "ddim50",
        "CFG_WEIGHT": 3.5, "MIXING_MODE": 4, "FORCE_INFLUENCE_VAL": None,
        # W8A8 int8 projections for the frozen denoisers at sampling time.
        # DEFAULT ON since the distribution-level acceptance A/B
        # (scripts/quant_ab.py, recorded in BASELINE.md): FID delta vs f32 is
        # +0.0027 — the same magnitude as bf16's -0.0020, i.e. int8 noise is
        # indistinguishable from the accepted mixed-precision noise.
        "QUANT_FROZEN": True,
    }
)

MDM_DEFAULT = Config.wrap(
    {
        "NAME": "MDM",
        "NUM_LAYERS": 8, "NUM_HEADS": 4, "DROPOUT": 0.1,
        "INPUT_DIM": 262, "LATENT_DIM": 512, "FF_SIZE": 1024,
        "ACTIVATION": "gelu", "CHECKPOINT": "checkpoints/mdm.ckpt",
        "DIFFUSION_STEPS": 1000, "BETA_SCHEDULER": "cosine", "SAMPLER": "uniform",
        "MOTION_REP": "global", "T_BAR": 700, "STRATEGY": "ddim50",
        "CFG_WEIGHT": 2.5,
    }
)

INTERGEN_DEFAULT = Config.wrap(
    {
        "NAME": "InterGen",
        "NUM_LAYERS": 8, "NUM_HEADS": 8, "DROPOUT": 0.1,
        "INPUT_DIM": 262, "LATENT_DIM": 1024, "FF_SIZE": 2048,
        "ACTIVATION": "gelu", "CHECKPOINT": "checkpoints/intergen.ckpt",
        "DIFFUSION_STEPS": 1000, "BETA_SCHEDULER": "cosine", "SAMPLER": "uniform",
        "MOTION_REP": "global", "T_BAR": 700, "STRATEGY": "ddim50",
        "CFG_WEIGHT": 3.5,
    }
)

MIXERMDM_TRAIN_DEFAULT = Config.wrap(
    {
        "GENERAL": {"EXP_NAME": "mixermdm-tpu", "CHECKPOINT": "./checkpoints", "LOG_DIR": "./log"},
        "TRAIN": {
            "LR": 1e-5, "WEIGHT_DECAY": 1e-4, "BATCH_SIZE": 64, "EPOCH": 300,
            "LOG_STEPS": 25, "SAVE_EPOCH": 25, "NUM_WORKERS": 4,
            "INDIVIDUAL_LOSS_FACTOR": 1, "INTERACTION_LOSS_FACTOR": 2,
            "DISCRIMINATOR_STEPS": 1, "GRAD_ACC_STEPS": 2, "LOSS_L1": 0.1,
        },
    }
)


def tiny_config(latent: int = 64, layers: int = 2, heads: int = 4, diffusion_steps: int = 20) -> Config:
    """Miniature config for tests / CPU smoke runs."""
    return Config.wrap(
        {
            "NAME": "in2IN",
            "NUM_LAYERS": layers, "NUM_HEADS": heads, "DROPOUT": 0.0,
            "INPUT_DIM": 262, "LATENT_DIM": latent, "FF_SIZE": latent * 2,
            "ACTIVATION": "gelu",
            "DIFFUSION_STEPS": diffusion_steps, "BETA_SCHEDULER": "cosine",
            "SAMPLER": "uniform", "MOTION_REP": "global", "T_BAR": diffusion_steps // 2,
            "STRATEGY": f"ddim{max(2, diffusion_steps // 4)}",
            "CFG_WEIGHT": 3.5, "CFG_WEIGHT_INTERACTION": 3, "CFG_WEIGHT_INDIVIDUAL": 1,
        }
    )
