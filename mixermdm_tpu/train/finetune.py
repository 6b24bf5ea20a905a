"""Fine-tuning an interaction model from an individual checkpoint.

Parity source ``/root/reference/src/scripts/train/finetuned.py``:
``individual -> interaction`` key renames (:185-188), non-strict load, and
freezing all ``sa_block`` self-attention params during fine-tuning
(:218-220) so only the cross-person attention + FFN adapt.

JAX re-design: key renaming is a pytree re-rooting; freezing is an optax
``masked`` transform (no requires_grad mutation).
"""

from __future__ import annotations

import optax


def individual_to_interaction_params(individual_params: dict, interaction_template: dict) -> dict:
    """Initialise an interaction denoiser from an individual one.

    The two share every submodule except the cross-attention blocks
    (``ca_block``), which don't exist in individual mode — those keep the
    template's fresh init (reference loads non-strict and audits the overlap,
    finetuned.py:190-211).
    """

    def merge(src, dst):
        if not isinstance(dst, dict):
            return src if src is not None else dst
        out = {}
        for k, v in dst.items():
            s = src.get(k) if isinstance(src, dict) else None
            out[k] = merge(s, v) if s is not None else v
        return out

    return merge(individual_params, interaction_template)


def sa_block_freeze_mask(params) -> dict:
    """Pytree mask: False (frozen) for every leaf under an ``sa_block``
    subtree, True elsewhere (finetuned.py:218-220)."""

    def walk(tree, frozen):
        if not isinstance(tree, dict):
            return not frozen
        return {k: walk(v, frozen or k == "sa_block") for k, v in tree.items()}

    return walk(params, False)


def masked_optimizer(opt: optax.GradientTransformation, params) -> optax.GradientTransformation:
    """Wrap an optimizer so sa_block params receive zero updates."""
    mask = sa_block_freeze_mask(params)
    return optax.masked(opt, mask)
