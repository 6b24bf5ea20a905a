"""``python -m mixermdm_tpu convert`` — torch ``.ckpt`` -> orbax, one command.

The reference user's first action is loading a released PyTorch checkpoint
with ad-hoc state-dict surgery at every site (reference
``src/scripts/infer/mixermdm.py:172-177`` with ``model.`` stripping at
``:174-176``, submodel prefix stripping ``src/models/mixermdm.py:44-47``,
individual->interaction renames ``src/scripts/train/finetuned.py:185-188``,
DualMDM dict merging ``src/models/dualmdm.py:12-14``).  This command wraps
the library converters (:mod:`mixermdm_tpu.train.checkpoint`) into the
one-step equivalent: point it at the released ``.ckpt`` file(s), get an
orbax checkpoint directory the infer/eval/train CLIs consume via
``--checkpoint``.

Families::

    # full MixerMDM (mixer ckpt + both frozen in2IN submodel ckpts)
    python -m mixermdm_tpu convert --family mixermdm \
        --ckpt MixerMDM.ckpt --ckpt-individual individual.ckpt \
        --ckpt-interaction interaction.ckpt --out ckpts/mixermdm

    # in2IN base models (either mode), incl. the finetune warm-start surgery
    python -m mixermdm_tpu convert --family in2in --mode interaction \
        --ckpt in2IN.ckpt --out ckpts/in2in_interaction
    python -m mixermdm_tpu convert --family in2in --mode interaction \
        --ckpt individual.ckpt --rename-individual-to-interaction --out ...

    # DualMDM (merged interaction+individual checkpoints, dual mode)
    python -m mixermdm_tpu convert --family dualmdm \
        --ckpt-interaction in2IN.ckpt --ckpt-individual individual.ckpt \
        --out ckpts/dualmdm

    # MDM and the InterCLIP evaluator
    python -m mixermdm_tpu convert --family mdm --ckpt mdm.ckpt --out ...
    python -m mixermdm_tpu convert --family interclip --ckpt eval.ckpt --out ...

Leaves the checkpoint does not provide (e.g. the frozen CLIP tower when the
released file dropped it) keep their freshly-initialised values and are
listed in the summary — pass ``--strict`` to fail instead.
"""

from __future__ import annotations

import argparse

import numpy as np


def deep_merge(template: dict, converted: dict, path: str = "",
               filled: list | None = None):
    """Replace ``template`` leaves with ``converted`` leaves (shape-checked).

    Returns the merged tree; records every filled leaf path in ``filled``.
    Raises KeyError/ValueError on structure or shape mismatches — the same
    guarantee as torch ``load_state_dict(strict=True)`` for the covered keys.
    """
    if filled is None:
        filled = []
    if not isinstance(converted, dict):
        t = np.asarray(template)
        c = np.asarray(converted)
        if t.shape != c.shape:
            raise ValueError(
                f"shape mismatch at {path}: checkpoint {c.shape} vs model {t.shape}"
            )
        filled.append(path)
        return c.astype(t.dtype) if c.dtype != t.dtype else c
    if not isinstance(template, dict):
        raise KeyError(f"structure mismatch at {path}: checkpoint has a subtree, "
                       f"model has a leaf")
    out = dict(template)
    for k, v in converted.items():
        if k not in template:
            raise KeyError(
                f"converted key {path}/{k} not in the model param tree "
                f"(model keys here: {sorted(template)})"
            )
        out[k] = deep_merge(template[k], v, f"{path}/{k}", filled)
    return out


def leaf_paths(tree: dict, path: str = ""):
    if not isinstance(tree, dict):
        yield path
        return
    for k, v in tree.items():
        yield from leaf_paths(v, f"{path}/{k}")


def rename_individual_to_interaction(sd: dict) -> dict:
    """The finetune warm-start surgery (reference finetuned.py:185-188):
    every ``*individual*`` key re-addresses the interaction modules."""
    return {k.replace("individual", "interaction"): v for k, v in sd.items()}


def _clip_prefix(sd: dict) -> str:
    """The reference models store the frozen CLIP tower either at top level
    (in2IN/MixerMDM re-parent the pieces) or under ``clip_model.`` (MDM)."""
    if any(k.startswith("clip_model.token_embedding") for k in sd):
        return "clip_model"
    return ""


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="convert reference torch .ckpt files to orbax checkpoints"
    )
    parser.add_argument("--family", required=True,
                        choices=("mixermdm", "in2in", "dualmdm", "mdm", "interclip"))
    parser.add_argument("--ckpt", type=str, default=None,
                        help="the torch .ckpt (mixermdm/in2in/mdm/interclip)")
    parser.add_argument("--ckpt-individual", type=str, default=None,
                        help="in2IN individual .ckpt (mixermdm/dualmdm)")
    parser.add_argument("--ckpt-interaction", type=str, default=None,
                        help="in2IN interaction .ckpt (mixermdm/dualmdm)")
    parser.add_argument("--out", required=True, help="orbax checkpoint dir to write")
    parser.add_argument("--model", type=str, default=None, help="model config yaml")
    parser.add_argument("--mode", type=str, default="interaction",
                        choices=("interaction", "individual"),
                        help="in2in family: which mode the checkpoint trains")
    parser.add_argument("--rename-individual-to-interaction", action="store_true",
                        help="apply the finetune warm-start key surgery "
                             "(reference finetuned.py:185-188) before converting")
    parser.add_argument("--strict", action="store_true",
                        help="fail if any model leaf is left at its init value")
    parser.add_argument("--tiny", action="store_true",
                        help="tiny config wiring (tests/smoke runs)")
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args(argv)

    import jax

    from ..train.checkpoint import (
        convert_clip_text,
        convert_in2in_system,
        convert_interclip,
        convert_linear,
        convert_mdm_denoiser,
        convert_mixermdm_system,
        load_torch_state_dict,
        merge_dualmdm_state_dicts,
        save_checkpoint,
    )

    def load(path):
        if path is None:
            raise SystemExit(f"--family {args.family} needs the checkpoint "
                             f"flag that was left unset (see --help)")
        sd = load_torch_state_dict(path)
        if args.rename_individual_to_interaction:
            sd = rename_individual_to_interaction(sd)
        return sd

    # Build the system purely as the param-tree template provider.
    if args.family == "mixermdm":
        from .infer_mixermdm import build_system

        system = build_system(args.model, tiny=args.tiny)
        template = system.init_params(jax.random.PRNGKey(args.seed))
        nl1 = int(system.model1.cfg.NUM_LAYERS)
        nl2 = int(system.model2.cfg.NUM_LAYERS)
        clip_layers = int(system.text.clip_cfg.layers)
        converted = convert_mixermdm_system(
            load(args.ckpt),
            mixer_blocks=int(system.cfg.GENERATOR.NUM_LAYERS),
            disc_layers=int(system.cfg.DISCRIMINATOR.NUM_LAYERS),
            clip_layers=clip_layers,
        )
        converted["model1"] = convert_in2in_system(
            load(args.ckpt_individual), "individual", num_layers=nl1,
            clip_layers=clip_layers,
        )
        converted["model2"] = convert_in2in_system(
            load(args.ckpt_interaction), "interaction", num_layers=nl2,
            clip_layers=clip_layers,
        )
    elif args.family in ("in2in", "dualmdm"):
        from .infer_in2in import build_system

        if args.family == "dualmdm":
            mode = "dual"
            sd = merge_dualmdm_state_dicts(
                load(args.ckpt_interaction), load(args.ckpt_individual)
            )
        else:
            mode = args.mode
            sd = load(args.ckpt)
        system = build_system(args.model, mode=mode, tiny=args.tiny)
        template = system.init_params(jax.random.PRNGKey(args.seed))
        converted = convert_in2in_system(
            sd, mode, num_layers=int(system.cfg.NUM_LAYERS),
            clip_layers=int(system.text.clip_cfg.layers),
        )
    elif args.family == "mdm":
        from .infer_mdm import build_system

        system = build_system(args.model, tiny=args.tiny)
        template = system.init_params(jax.random.PRNGKey(args.seed))
        sd = load(args.ckpt)
        converted = {
            "denoiser": convert_mdm_denoiser(
                sd, int(system.cfg.NUM_LAYERS), prefix="model"
            ),
            "embed_text": convert_linear(sd, "embed_text"),
        }
        cp = _clip_prefix(sd)
        if any(k.startswith(f"{cp + '.' if cp else ''}token_embedding") for k in sd):
            # MDM's ClipTextEncoder nests the tower under "transformer" with
            # the projection alongside (clip_text.py:136-149).
            converted["clip"] = {
                "transformer": convert_clip_text(
                    sd, int(system.clip_cfg.layers), prefix=cp
                )
            }
            tp = f"{cp + '.' if cp else ''}text_projection"
            if tp in sd:
                converted["clip"]["text_projection"] = sd[tp]
    else:  # interclip
        from ..eval.interclip import InterCLIP

        if args.tiny:
            from ..config import Config
            from ..models.torch_compat import TorchEncoder

            icfg = Config.wrap(
                {"INPUT_DIM": 258, "LATENT_DIM": 32, "FF_SIZE": 64,
                 "NUM_LAYERS": 1, "NUM_HEADS": 2, "DROPOUT": 0.0,
                 "MODE": "interaction"}
            )
            system = InterCLIP(icfg, text_width=64)
            system.text_encoder = TorchEncoder(64, 2, 64, 1)
            text_layers = 1
        else:
            system = InterCLIP()
            text_layers = 8
        template = system.init_params(jax.random.PRNGKey(args.seed))
        converted = convert_interclip(
            load(args.ckpt), num_layers=int(system.cfg.NUM_LAYERS),
            text_layers=text_layers,
        )

    filled: list = []
    merged = deep_merge(template, converted, filled=filled)
    all_leaves = set(leaf_paths(template))
    missing = sorted(all_leaves - set(filled))
    print(f"converted {len(filled)}/{len(all_leaves)} model leaves from torch")
    if missing:
        msg = (f"{len(missing)} leaves keep their init values (first 10): "
               + ", ".join(missing[:10]))
        if args.strict:
            raise SystemExit("--strict: " + msg)
        print("note: " + msg)

    save_checkpoint(args.out, merged)
    print(f"wrote orbax checkpoint: {args.out}")
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main() or 0)
