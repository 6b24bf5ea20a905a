"""Checkpointing (orbax) + PyTorch->JAX weight converters.

The reference distributes PyTorch ``.ckpt`` files and performs ad-hoc
state-dict surgery at every load site (SURVEY.md §5: key-prefix stripping
``mixermdm.py:44-47``, ``model.``-removal ``scripts/infer/mixermdm.py:174-176``,
individual->interaction renames ``finetuned.py:185-188``, DualMDM dict
merging ``dualmdm.py:4-17``).  Here:

* native orbax checkpoints for our own params (save/restore whole pytrees);
* systematic converters from torch state dicts to our flax param trees —
  torch ``nn.Linear`` weights are (out, in) and transpose to (in, out);
  packed ``in_proj_weight`` splits into q/k/v; ``nn.TransformerEncoderLayer``
  FFN/LayerNorm names map onto :mod:`mixermdm_tpu.models.torch_compat`.

Converters take a flat ``{name: np.ndarray}`` dict, so tests can feed
``module.state_dict()`` from live torch modules and assert bit-parity.
"""

from __future__ import annotations

import os
from typing import Dict

import numpy as np


def save_checkpoint(path: str, params, step: int = 0) -> None:
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, params, force=True)
    ckptr.wait_until_finished()


def restore_checkpoint(path: str, template=None):
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path), template)


def save_train_state(path: str, state) -> None:
    """Save a FULL train state (params + optimizer state(s) + step [+ sampler
    history]) so resume is bitwise-continuous — the reference restores all of
    it via Lightning ``ckpt_path`` (scripts/train/mixermdm.py:340-343)."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), state, force=True)
    ckptr.wait_until_finished()


def latest_train_state_path(out_dir: str):
    """Newest ``*_state`` checkpoint under ``out_dir`` (``--resume auto``).

    Ranked by modification time, NOT by the epoch number in the filename: a
    resumed-then-re-preempted job may have saved a higher-numbered but OLDER
    file from before the first preemption, and picking it would silently
    discard the newer progress (ADVICE r2 medium).  Ties (same mtime
    granularity) break toward ``final_state`` then the higher epoch number.
    """
    import glob
    import re

    cands = glob.glob(os.path.join(out_dir, "*_state"))

    def rank(p):
        if p.endswith("final_state"):
            name_rank = (2, 0)
        else:
            m = re.search(r"epoch_(\d+)_state$", p)
            name_rank = (1, int(m.group(1))) if m else (0, 0)
        return (os.path.getmtime(p), *name_rank)

    return max(cands, key=rank) if cands else None


def restore_train_state(path: str, template):
    """Restore a full train state saved by :func:`save_train_state`.

    ``template`` must be a freshly built state of the same trainer (for
    structure/dtypes); returns the same NamedTuple type."""
    import jax
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    flat = ckptr.restore(os.path.abspath(path), jax.tree_util.tree_map(lambda x: x, template))
    return type(template)(*flat) if isinstance(flat, (list, tuple)) else flat


# ---------------------------------------------------------------------------
# torch -> flax converters (all take flat numpy state dicts)
# ---------------------------------------------------------------------------


def _t(w: np.ndarray) -> np.ndarray:
    """torch Linear weight (out, in) -> flax kernel (in, out)."""
    return np.ascontiguousarray(w.T)


def load_torch_state_dict(path: str, strip_prefixes=("model.",)) -> Dict[str, np.ndarray]:
    """Load a torch checkpoint to numpy, applying the reference's usual
    prefix surgery."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("state_dict", ckpt) if isinstance(ckpt, dict) else ckpt
    out = {}
    for k, v in sd.items():
        for p in strip_prefixes:
            if k.startswith(p):
                k = k[len(p):]
        out[k] = v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)
    return out


def convert_mha(sd: Dict[str, np.ndarray], prefix: str) -> dict:
    """torch ``nn.MultiheadAttention`` -> TorchMultiheadAttention params.

    Handles both the packed ``in_proj_weight`` layout (qkv same dim) and
    separate ``q/k/v_proj_weight`` (different kdim/vdim).
    """
    p = prefix
    if f"{p}.in_proj_weight" in sd:
        w = sd[f"{p}.in_proj_weight"]
        b = sd[f"{p}.in_proj_bias"]
        E = w.shape[1]
        qw, kw, vw = w[:E], w[E : 2 * E], w[2 * E :]
        qb, kb, vb = b[:E], b[E : 2 * E], b[2 * E :]
    else:
        qw, kw, vw = (
            sd[f"{p}.q_proj_weight"], sd[f"{p}.k_proj_weight"], sd[f"{p}.v_proj_weight"]
        )
        b = sd[f"{p}.in_proj_bias"]
        E = qw.shape[0]
        qb, kb, vb = b[:E], b[E : 2 * E], b[2 * E :]
    return {
        "q_proj": {"kernel": _t(qw), "bias": qb},
        "k_proj": {"kernel": _t(kw), "bias": kb},
        "v_proj": {"kernel": _t(vw), "bias": vb},
        "out_proj": {
            "kernel": _t(sd[f"{p}.out_proj.weight"]),
            "bias": sd[f"{p}.out_proj.bias"],
        },
    }


def convert_linear(sd, prefix: str) -> dict:
    return {"kernel": _t(sd[f"{prefix}.weight"]), "bias": sd[f"{prefix}.bias"]}


def convert_layernorm(sd, prefix: str) -> dict:
    return {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}


def convert_adaln(sd, prefix: str) -> dict:
    """AdaLN: emb_layers = Sequential(SiLU, Linear) -> index 1 (layers.py:8-12)."""
    return {"emb_proj": convert_linear(sd, f"{prefix}.emb_layers.1")}


def convert_ffn(sd, prefix: str, has_norm: bool = True) -> dict:
    out = {
        "linear1": convert_linear(sd, f"{prefix}.linear1"),
        "linear2": convert_linear(sd, f"{prefix}.linear2"),
    }
    if has_norm and f"{prefix}.norm.emb_layers.1.weight" in sd:
        out["norm"] = convert_adaln(sd, f"{prefix}.norm")
    return out


def convert_self_attention(sd, prefix: str) -> dict:
    out = {"attention": convert_mha(sd, f"{prefix}.attention")}
    if f"{prefix}.norm.emb_layers.1.weight" in sd:
        out["norm"] = convert_adaln(sd, f"{prefix}.norm")
    return out


def convert_cross_attention(sd, prefix: str) -> dict:
    return {
        "attention": convert_mha(sd, f"{prefix}.attention"),
        "norm": convert_adaln(sd, f"{prefix}.norm"),
        "xf_norm": convert_adaln(sd, f"{prefix}.xf_norm"),
    }


def convert_timestep_embedder(sd, prefix: str) -> dict:
    """TimestepEmbedder: time_embed = Sequential(Linear, SiLU, Linear)."""
    return {
        "linear1": convert_linear(sd, f"{prefix}.time_embed.0"),
        "linear2": convert_linear(sd, f"{prefix}.time_embed.2"),
    }


def convert_transformer_block(sd, prefix: str, has_cross: bool = True) -> dict:
    out = {
        "sa_block": convert_self_attention(sd, f"{prefix}.sa_block"),
        "ffn": convert_ffn(sd, f"{prefix}.ffn"),
    }
    if has_cross and f"{prefix}.ca_block.attention.out_proj.weight" in sd:
        out["ca_block"] = convert_cross_attention(sd, f"{prefix}.ca_block")
    return out


def stack_layer_trees(trees: list) -> dict:
    """Per-layer param trees -> one tree with a leading layer axis (the
    nn.scan layout)."""

    def stack(*leaves):
        return np.stack([np.asarray(l) for l in leaves], axis=0)

    import jax

    return jax.tree_util.tree_map(stack, *trees)


def unstack_layer_tree(tree: dict, num_layers: int) -> list:
    import jax

    return [
        jax.tree_util.tree_map(lambda x: np.asarray(x)[i], tree)
        for i in range(num_layers)
    ]


def convert_in2in_denoiser(sd, prefix: str, num_layers: int, has_cross: bool,
                           scan_layers: bool = True) -> dict:
    """in2INDenoiser / InterDenoiser state dict -> In2INDenoiser params.

    ``scan_layers`` emits the nn.scan layout (stacked ``blocks/block``);
    otherwise per-layer ``blocks_{i}`` subtrees.
    """
    p = prefix + "." if prefix else ""
    out = {
        "embed_timestep": convert_timestep_embedder(sd, f"{p}embed_timestep"),
        "motion_embed": convert_linear(sd, f"{p}motion_embed"),
        "text_embed": convert_linear(sd, f"{p}text_embed"),
        "out": {"linear": convert_linear(sd, f"{p}out.linear")},
    }
    layers = [
        convert_transformer_block(sd, f"{p}blocks.{i}", has_cross)
        for i in range(num_layers)
    ]
    if scan_layers:
        out["blocks"] = {"block": stack_layer_trees(layers)}
    else:
        for i, tree in enumerate(layers):
            out[f"blocks_{i}"] = tree
    return out


def convert_discriminator(sd, prefix: str, num_layers: int,
                          scan_layers: bool = True) -> dict:
    p = prefix + "." if prefix else ""
    out = {
        "embed_timestep": convert_timestep_embedder(sd, f"{p}embed_timestep"),
        "motion_embed": convert_linear(sd, f"{p}motion_embed"),
        "text_embed": convert_linear(sd, f"{p}text_embed"),
        "out": convert_linear(sd, f"{p}out"),
    }
    layers = [
        convert_transformer_block(sd, f"{p}blocks.{i}", has_cross=False)
        for i in range(num_layers)
    ]
    if scan_layers:
        out["blocks"] = {"block": stack_layer_trees(layers)}
    else:
        for i, tree in enumerate(layers):
            out[f"blocks_{i}"] = tree
    return out


def convert_torch_encoder_layer(sd, prefix: str) -> dict:
    """torch ``nn.TransformerEncoderLayer`` -> TorchEncoderLayer params."""
    return {
        "self_attn": convert_mha(sd, f"{prefix}.self_attn"),
        "linear1": convert_linear(sd, f"{prefix}.linear1"),
        "linear2": convert_linear(sd, f"{prefix}.linear2"),
        "norm1": convert_layernorm(sd, f"{prefix}.norm1"),
        "norm2": convert_layernorm(sd, f"{prefix}.norm2"),
    }


def convert_torch_encoder(sd, prefix: str, num_layers: int,
                          scan_layers: bool = True) -> dict:
    layers = [
        convert_torch_encoder_layer(sd, f"{prefix}.layers.{i}")
        for i in range(num_layers)
    ]
    if scan_layers:
        return {"layers": {"layer": stack_layer_trees(layers)}}
    return {f"layers_{i}": tree for i, tree in enumerate(layers)}


def convert_clip_post_encoder(sd, enc_prefix: str, ln_prefix: str, num_layers: int = 2) -> dict:
    """clipTransEncoder + clip_ln -> ClipPostEncoder params."""
    return {
        "encoder": convert_torch_encoder(sd, enc_prefix, num_layers),
        "ln": convert_layernorm(sd, ln_prefix),
    }


def convert_clip_resblock(sd, prefix: str) -> dict:
    return {
        "ln_1": convert_layernorm(sd, f"{prefix}.ln_1"),
        "ln_2": convert_layernorm(sd, f"{prefix}.ln_2"),
        "attn": convert_mha(sd, f"{prefix}.attn"),
        "c_fc": convert_linear(sd, f"{prefix}.mlp.c_fc"),
        "c_proj": convert_linear(sd, f"{prefix}.mlp.c_proj"),
    }


def convert_clip_text(sd, num_layers: int, prefix: str = "",
                      scan_layers: bool = True) -> dict:
    """OpenAI CLIP text tower -> ClipTextTransformer params.

    Expects keys ``token_embedding.weight``, ``positional_embedding``,
    ``transformer.resblocks.{i}.*``, ``ln_final.*`` (optionally prefixed).
    """
    p = prefix + "." if prefix else ""
    out = {
        "token_embedding": sd[f"{p}token_embedding.weight"],
        "positional_embedding": sd[f"{p}positional_embedding"],
        "ln_final": convert_layernorm(sd, f"{p}ln_final"),
    }
    layers = [
        convert_clip_resblock(sd, f"{p}transformer.resblocks.{i}")
        for i in range(num_layers)
    ]
    if scan_layers:
        out["resblocks"] = {"resblock": stack_layer_trees(layers)}
    else:
        for i, tree in enumerate(layers):
            out[f"resblocks_{i}"] = tree
    return out


def convert_influence(sd, prefix: str, n_blocks: int,
                      scan_layers: bool = True) -> dict:
    p = prefix + "." if prefix else ""
    out = {"out": convert_linear(sd, f"{p}out")}
    layers = [
        {
            "sa_block": convert_self_attention(sd, f"{p}blocks.{i}.sa_block"),
            "ca_block": convert_cross_attention(sd, f"{p}blocks.{i}.ca_block"),
            "ffn": convert_ffn(sd, f"{p}blocks.{i}.ffn"),
        }
        for i in range(n_blocks)
    ]
    if scan_layers:
        out["blocks"] = {"block": stack_layer_trees(layers)}
    else:
        for i, tree in enumerate(layers):
            out[f"blocks_{i}"] = tree
    return out


def convert_mixer_core(sd, n_blocks: int, prefix: str = "mixing") -> dict:
    """Reference Mixer trainable parts -> MixerCore params
    (mixermdm.py:627-653: influence + embedders)."""
    p = prefix + "." if prefix else ""
    return {
        "embed_timestep": convert_timestep_embedder(sd, f"{p}embed_timestep"),
        "motion_embed": convert_linear(sd, f"{p}motion_embed"),
        "text_embed": convert_linear(sd, f"{p}text_embed"),
        "influence": convert_influence(sd, f"{p}influence", n_blocks),
    }


# ---------------------------------------------------------------------------
# Inverse converters: flax params -> torch-style flat state dicts
# (checkpoint export + converter round-trip testing)
# ---------------------------------------------------------------------------


def _np(x):
    return np.asarray(x)


def export_linear(p: dict, prefix: str, out: dict):
    out[f"{prefix}.weight"] = _np(p["kernel"]).T.copy()
    out[f"{prefix}.bias"] = _np(p["bias"])


def export_layernorm(p: dict, prefix: str, out: dict):
    out[f"{prefix}.weight"] = _np(p["scale"])
    out[f"{prefix}.bias"] = _np(p["bias"])


def export_mha(p: dict, prefix: str, out: dict, packed: bool = True):
    qw, kw, vw = (_np(p[n]["kernel"]).T for n in ("q_proj", "k_proj", "v_proj"))
    qb, kb, vb = (_np(p[n]["bias"]) for n in ("q_proj", "k_proj", "v_proj"))
    if packed and qw.shape == kw.shape == vw.shape:
        out[f"{prefix}.in_proj_weight"] = np.concatenate([qw, kw, vw], axis=0)
    else:
        out[f"{prefix}.q_proj_weight"] = qw
        out[f"{prefix}.k_proj_weight"] = kw
        out[f"{prefix}.v_proj_weight"] = vw
    out[f"{prefix}.in_proj_bias"] = np.concatenate([qb, kb, vb], axis=0)
    export_linear(p["out_proj"], f"{prefix}.out_proj", out)


def export_adaln(p: dict, prefix: str, out: dict):
    export_linear(p["emb_proj"], f"{prefix}.emb_layers.1", out)


def export_timestep_embedder(p: dict, prefix: str, out: dict):
    export_linear(p["linear1"], f"{prefix}.time_embed.0", out)
    export_linear(p["linear2"], f"{prefix}.time_embed.2", out)


def export_ffn(p: dict, prefix: str, out: dict):
    export_linear(p["linear1"], f"{prefix}.linear1", out)
    export_linear(p["linear2"], f"{prefix}.linear2", out)
    if "norm" in p:
        export_adaln(p["norm"], f"{prefix}.norm", out)


def export_transformer_block(p: dict, prefix: str, out: dict):
    export_mha(p["sa_block"]["attention"], f"{prefix}.sa_block.attention", out)
    if "norm" in p["sa_block"]:
        export_adaln(p["sa_block"]["norm"], f"{prefix}.sa_block.norm", out)
    if "ca_block" in p:
        export_mha(p["ca_block"]["attention"], f"{prefix}.ca_block.attention", out)
        export_adaln(p["ca_block"]["norm"], f"{prefix}.ca_block.norm", out)
        export_adaln(p["ca_block"]["xf_norm"], f"{prefix}.ca_block.xf_norm", out)
    export_ffn(p["ffn"], f"{prefix}.ffn", out)


def export_in2in_denoiser(params: dict, prefix: str = "") -> Dict[str, np.ndarray]:
    """In2INDenoiser params -> torch-style state dict (reference key names).

    Handles both the unrolled ``blocks_{i}`` and the nn.scan ``blocks/block``
    (stacked) layouts.
    """
    out: Dict[str, np.ndarray] = {}
    p = prefix + "." if prefix else ""
    export_timestep_embedder(params["embed_timestep"], f"{p}embed_timestep", out)
    export_linear(params["motion_embed"], f"{p}motion_embed", out)
    export_linear(params["text_embed"], f"{p}text_embed", out)
    export_linear(params["out"]["linear"], f"{p}out.linear", out)
    if "blocks" in params:
        stacked = params["blocks"]["block"]
        import jax

        num_layers = jax.tree_util.tree_leaves(stacked)[0].shape[0]
        for i, tree in enumerate(unstack_layer_tree(stacked, num_layers)):
            export_transformer_block(tree, f"{p}blocks.{i}", out)
    else:
        i = 0
        while f"blocks_{i}" in params:
            export_transformer_block(params[f"blocks_{i}"], f"{p}blocks.{i}", out)
            i += 1
    return out


def _layer_list(params: dict, outer: str, inner: str, unrolled: str) -> list:
    """Per-layer trees from either the nn.scan stacked layout
    (``params[outer][inner]``) or the unrolled ``{unrolled}_{i}`` layout."""
    if outer in params:
        import jax

        stacked = params[outer][inner]
        n = jax.tree_util.tree_leaves(stacked)[0].shape[0]
        return unstack_layer_tree(stacked, n)
    layers = []
    i = 0
    while f"{unrolled}_{i}" in params:
        layers.append(params[f"{unrolled}_{i}"])
        i += 1
    return layers


def export_torch_encoder(params: dict, prefix: str, out: dict):
    """Inverse of :func:`convert_torch_encoder` (torch nn.TransformerEncoder
    key names)."""
    for i, lp in enumerate(_layer_list(params, "layers", "layer", "layers")):
        export_mha(lp["self_attn"], f"{prefix}.layers.{i}.self_attn", out)
        export_linear(lp["linear1"], f"{prefix}.layers.{i}.linear1", out)
        export_linear(lp["linear2"], f"{prefix}.layers.{i}.linear2", out)
        export_layernorm(lp["norm1"], f"{prefix}.layers.{i}.norm1", out)
        export_layernorm(lp["norm2"], f"{prefix}.layers.{i}.norm2", out)


def export_clip_post_encoder(params: dict, enc_prefix: str, ln_prefix: str, out: dict):
    export_torch_encoder(params["encoder"], enc_prefix, out)
    export_layernorm(params["ln"], ln_prefix, out)


def export_clip_text(params: dict, out: dict, prefix: str = "",
                     transformer_name: str = "transformer"):
    """Inverse of :func:`convert_clip_text`.  The reference stores the tower
    pieces either re-parented at top level with the transformer named
    ``clip_transformer`` (in2IN/MixerMDM, in2in.py:56-66) or whole under
    ``clip_model.`` (MDM, mdm.py:71-82)."""
    p = prefix + "." if prefix else ""
    out[f"{p}token_embedding.weight"] = _np(params["token_embedding"])
    out[f"{p}positional_embedding"] = _np(params["positional_embedding"])
    export_layernorm(params["ln_final"], f"{p}ln_final", out)
    if "text_projection" in params:
        out[f"{p}text_projection"] = _np(params["text_projection"])
    for i, rp in enumerate(_layer_list(params, "resblocks", "resblock", "resblocks")):
        rb = f"{p}{transformer_name}.resblocks.{i}"
        export_layernorm(rp["ln_1"], f"{rb}.ln_1", out)
        export_layernorm(rp["ln_2"], f"{rb}.ln_2", out)
        export_mha(rp["attn"], f"{rb}.attn", out)
        export_linear(rp["c_fc"], f"{rb}.mlp.c_fc", out)
        export_linear(rp["c_proj"], f"{rb}.mlp.c_proj", out)


def export_in2in_system(params: dict, mode: str) -> Dict[str, np.ndarray]:
    """Inverse of :func:`convert_in2in_system`: an In2INSystem param tree ->
    a reference-layout in2IN state dict (denoisers under ``decoder.net_*``,
    post-encoders ``clipTransEncoder_*``/``clip_ln_*``, CLIP tower re-parented
    at top level)."""
    sd: Dict[str, np.ndarray] = {}
    if "clip" in params.get("text", {}):
        export_clip_text(params["text"]["clip"], sd,
                         transformer_name="clip_transformer")
    if mode in ("interaction", "dual"):
        sd.update(export_in2in_denoiser(params["denoiser_interaction"],
                                        "decoder.net_interaction"))
        export_clip_post_encoder(params["text"]["post_interaction"],
                                 "clipTransEncoder_interaction",
                                 "clip_ln_interaction", sd)
    if mode in ("individual", "dual"):
        sd.update(export_in2in_denoiser(params["denoiser_individual"],
                                        "decoder.net_individual"))
        export_clip_post_encoder(params["text"]["post_individual"],
                                 "clipTransEncoder_individual",
                                 "clip_ln_individual", sd)
    return sd


def export_influence(params: dict, prefix: str, out: dict):
    export_linear(params["out"], f"{prefix}.out", out)
    for i, bp in enumerate(_layer_list(params, "blocks", "block", "blocks")):
        b = f"{prefix}.blocks.{i}"
        export_mha(bp["sa_block"]["attention"], f"{b}.sa_block.attention", out)
        if "norm" in bp["sa_block"]:
            export_adaln(bp["sa_block"]["norm"], f"{b}.sa_block.norm", out)
        export_mha(bp["ca_block"]["attention"], f"{b}.ca_block.attention", out)
        export_adaln(bp["ca_block"]["norm"], f"{b}.ca_block.norm", out)
        export_adaln(bp["ca_block"]["xf_norm"], f"{b}.ca_block.xf_norm", out)
        export_ffn(bp["ffn"], f"{b}.ffn", out)


def export_mixer_core(params: dict, out: dict, prefix: str = "mixing"):
    p = prefix + "." if prefix else ""
    export_timestep_embedder(params["embed_timestep"], f"{p}embed_timestep", out)
    export_linear(params["motion_embed"], f"{p}motion_embed", out)
    export_linear(params["text_embed"], f"{p}text_embed", out)
    export_influence(params["influence"], f"{p}influence", out)


def export_discriminator(params: dict, prefix: str, out: dict):
    export_timestep_embedder(params["embed_timestep"], f"{prefix}.embed_timestep", out)
    export_linear(params["motion_embed"], f"{prefix}.motion_embed", out)
    export_linear(params["text_embed"], f"{prefix}.text_embed", out)
    export_linear(params["out"], f"{prefix}.out", out)
    for i, bp in enumerate(_layer_list(params, "blocks", "block", "blocks")):
        export_transformer_block(bp, f"{prefix}.blocks.{i}", out)


def export_mixermdm_system(params: dict) -> Dict[str, np.ndarray]:
    """Inverse of :func:`convert_mixermdm_system`: the TRAINED parts only
    (the shipped MixerMDM.ckpt drops the frozen submodels,
    scripts/eval/mixermdm.py:302-304)."""
    sd: Dict[str, np.ndarray] = {}
    export_mixer_core(params["core"], sd, prefix="mixing")
    export_discriminator(params["disc_i"], "discriminator_i", sd)
    export_discriminator(params["disc_I"], "discriminator_I", sd)
    export_clip_post_encoder(params["text"]["post_mixer"],
                             "clipTransEncoder", "clip_ln", sd)
    if "clip" in params.get("text", {}):
        export_clip_text(params["text"]["clip"], sd,
                         transformer_name="clip_transformer")
    return sd


def export_interclip(params: dict) -> Dict[str, np.ndarray]:
    """Inverse of :func:`convert_interclip` (reference evaluation/models.py)."""
    sd: Dict[str, np.ndarray] = {}
    me = params["motion_encoder"]
    sd["motion_encoder.query_token"] = _np(me["query_token"])
    export_linear(me["embed_motion"], "motion_encoder.embed_motion", sd)
    export_torch_encoder(me["transformer"], "motion_encoder.transformer", sd)
    export_layernorm(me["out_ln"], "motion_encoder.out_ln", sd)
    export_linear(me["out"], "motion_encoder.out", sd)
    sd["token_embedding.weight"] = _np(params["token_embedding"])
    sd["positional_embedding"] = _np(params["positional_embedding"])
    sd["latent_scale"] = _np(params["latent_scale"])
    export_torch_encoder(params["text_encoder"], "textTransEncoder", sd)
    export_layernorm(params["text_ln"], "text_ln", sd)
    export_linear(params["text_out"], "out", sd)
    return sd


def export_mdm_system(params: dict) -> Dict[str, np.ndarray]:
    """Inverse of the MDM conversion (denoiser under ``model.``, CLIP tower
    whole under ``clip_model.``, mdm.py:71-82)."""
    sd: Dict[str, np.ndarray] = {}
    dn = params["denoiser"]
    export_timestep_embedder(dn["embed_timestep"], "model.embed_timestep", sd)
    export_linear(dn["input_process"], "model.input_process.poseEmbedding", sd)
    export_linear(dn["output_process"], "model.output_process.poseFinal", sd)
    export_torch_encoder(dn["seqTransEncoder"], "model.seqTransEncoder", sd)
    export_linear(params["embed_text"], "embed_text", sd)
    if "clip" in params:
        # MDM's ClipTextEncoder nests the tower under "transformer" with the
        # projection alongside (clip_text.py:136-149).
        export_clip_text(params["clip"]["transformer"], sd, prefix="clip_model")
        sd["clip_model.text_projection"] = _np(params["clip"]["text_projection"])
    return sd


# ---------------------------------------------------------------------------
# System-level converters: full reference checkpoints -> system param trees
# ---------------------------------------------------------------------------


def convert_in2in_system(sd: Dict[str, np.ndarray], mode: str, num_layers: int = 8,
                         clip_layers: int = 12) -> dict:
    """Reference in2IN state dict -> In2INSystem params.

    Key families (reference in2in.py): ``decoder.net_interaction.*`` /
    ``decoder.net_individual.*`` (denoisers),
    ``clipTransEncoder_{interaction,individual}.*`` + ``clip_ln_*``
    (post-encoders), ``token_embedding``/``clip_transformer``/... (CLIP).
    """
    params: dict = {"text": {}}
    if any(k.startswith("token_embedding") for k in sd):
        clip_sd = {
            k.replace("clip_transformer", "transformer"): v
            for k, v in sd.items()
        }
        params["text"]["clip"] = convert_clip_text(clip_sd, clip_layers)
    if mode in ("interaction", "dual"):
        params["denoiser_interaction"] = convert_in2in_denoiser(
            sd, "decoder.net_interaction", num_layers, has_cross=True
        )
        params["text"]["post_interaction"] = convert_clip_post_encoder(
            sd, "clipTransEncoder_interaction", "clip_ln_interaction"
        )
    if mode in ("individual", "dual"):
        # dual_individual keeps the unrolled layout (its person-b quirk needs
        # direct access to the last block — see models/in2in.py).
        params["denoiser_individual"] = convert_in2in_denoiser(
            sd, "decoder.net_individual", num_layers, has_cross=mode == "dual",
            scan_layers=mode != "dual",
        )
        params["text"]["post_individual"] = convert_clip_post_encoder(
            sd, "clipTransEncoder_individual", "clip_ln_individual"
        )
    return params


def merge_dualmdm_state_dicts(sd_interaction: Dict[str, np.ndarray],
                              sd_individual: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """DualMDM checkpoint merge (reference dualmdm.py:4-17): the interaction
    checkpoint provides everything; the individual checkpoint's denoiser keys
    slot in as ``decoder.net_individual``."""
    merged = dict(sd_interaction)
    for k, v in sd_individual.items():
        if k.startswith("decoder.net_individual"):
            merged[k] = v
        if k.startswith("clipTransEncoder_individual") or k.startswith("clip_ln_individual"):
            merged[k] = v
    return merged


def convert_mixermdm_system(sd: Dict[str, np.ndarray], mixer_blocks: int = 4,
                            disc_layers: int = 2, clip_layers: int = 12) -> dict:
    """Reference MixerMDM checkpoint -> the *trainable* MixerMDMSystem params.

    The shipped MixerMDM.ckpt stores only the trained parts (frozen submodels
    are dropped at save, scripts/eval/mixermdm.py:302-304): the Mixer core
    (``mixing.*`` minus the frozen denoisers), the two discriminators, and
    the CLIP post-encoder head.  Load the submodels from their own
    checkpoints via :func:`convert_in2in_system`.
    """
    params = {
        "core": convert_mixer_core(sd, mixer_blocks, prefix="mixing"),
        "disc_i": convert_discriminator(sd, "discriminator_i", disc_layers),
        "disc_I": convert_discriminator(sd, "discriminator_I", disc_layers),
        "text": {
            "post_mixer": convert_clip_post_encoder(sd, "clipTransEncoder", "clip_ln"),
        },
    }
    if any(k.startswith("token_embedding") for k in sd):
        clip_sd = {k.replace("clip_transformer", "transformer"): v for k, v in sd.items()}
        params["text"]["clip"] = convert_clip_text(clip_sd, clip_layers)
    return params


def convert_interclip(sd: Dict[str, np.ndarray], num_layers: int = 8,
                      text_layers: int = 8) -> dict:
    """Reference InterCLIP evaluator checkpoint -> InterCLIP params
    (evaluation/models.py:7-130: motion_encoder tower, text tower, heads)."""
    me = "motion_encoder."
    params = {
        "motion_encoder": {
            "query_token": sd[f"{me}query_token"],
            "embed_motion": {
                "kernel": _t(sd[f"{me}embed_motion.weight"]),
                "bias": sd[f"{me}embed_motion.bias"],
            },
            "transformer": convert_torch_encoder(sd, f"{me}transformer", num_layers),
            "out_ln": convert_layernorm(sd, f"{me}out_ln"),
            "out": {
                "kernel": _t(sd[f"{me}out.weight"]),
                "bias": sd[f"{me}out.bias"],
            },
        },
        "token_embedding": sd["token_embedding.weight"],
        "positional_embedding": sd["positional_embedding"],
        "latent_scale": np.asarray(sd["latent_scale"]).reshape(()),
        "text_encoder": convert_torch_encoder(sd, "textTransEncoder", text_layers),
        "text_ln": convert_layernorm(sd, "text_ln"),
        "text_out": {"kernel": _t(sd["out.weight"]), "bias": sd["out.bias"]},
    }
    return params


def convert_mdm_denoiser(sd, num_layers: int, prefix: str = "model") -> dict:
    p = prefix + "." if prefix else ""
    return {
        "embed_timestep": convert_timestep_embedder(sd, f"{p}embed_timestep"),
        "input_process": convert_linear(sd, f"{p}input_process.poseEmbedding"),
        "output_process": convert_linear(sd, f"{p}output_process.poseFinal"),
        "seqTransEncoder": convert_torch_encoder(sd, f"{p}seqTransEncoder", num_layers),
    }
