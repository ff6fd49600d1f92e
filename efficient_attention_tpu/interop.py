"""Reference-checkpoint interop: load PyTorch ViT checkpoints into flax.

A user of the reference trains DeiT/PVT models with ``vit/main.py`` and gets
``ckpt.pth`` files (``vit/main.py:355-363``: ``{'model': state_dict, ...}``).
This module converts such a ``state_dict`` into this framework's flax param
pytree so those checkpoints (including the authors' published ones) can be
evaluated and fine-tuned here directly.

The conversion is rule-based over the FLAX tree: for every flax leaf we
derive the reference parameter name (module-name translation table below)
and apply the layout transform (torch ``nn.Linear`` stores ``[out, in]`` →
flax Dense ``[in, out]``; torch conv ``[O, I, kh, kw]`` → flax ``[kh, kw,
I, O]``; LayerNorm ``weight`` → ``scale``).  Unknown leaves or shape
mismatches raise rather than silently skipping, and reference-side buffers
that this framework recomputes statically (e.g. ``relative_position_index``)
are ignored.

Verified end-to-end by ``tests/test_interop.py`` against a recorded
full-model golden (reference forward on CPU vs converted-params flax
forward).
"""
from __future__ import annotations

import re
from typing import Any, Dict, Mapping

import jax
import numpy as np

# attention classes appear in flax paths by class name (factory-built inside
# Block); the reference names the submodule 'attn' (efficient_vit.py:112)
_ATTN_CLASSES = (
    "EVA", "LocalAttention", "MultiheadAttention", "KernelizedAttention",
    "RandomizedAttention", "LinearRA", "ScatterBrain", "CausalEVAttention",
)

# flax path component -> reference component
_COMPONENT_MAP = {
    "GatedMlp_0": "mlp",
    "MlpWithDepthwiseConv_0": "mlp",
    "Dense_0": "fc1",
    "Dense_1": "fc2",
    "Conv_0": "dwconv.dwconv",  # PVT MLP depthwise conv (DWConv:285-296)
    "LayerNorm_0": "norm1",
    "LayerNorm_1": "norm2",
    "layers_0": "0",
    "layers_1": "1",
}

# reference buffers that the flax modules derive statically
_IGNORED_TORCH_SUFFIXES = ("relative_position_index",)

_PVT_BLOCK = re.compile(r"block(\d+)_(\d+)")


def _flax_path_to_torch_key(parts) -> str:
    """Translate a flax param path to the reference parameter name.

    DeiT (``efficient_vit.py``): ['blocks_0', 'EVA_0', 'qkv', 'kernel'] ->
    'blocks.0.attn.qkv.weight'.  PVTv2 (``pvt_legacy.py``): ['block1_0',
    'EVA_0', 'qkv', 'kernel'] -> 'block1.0.attn.attn_fn.qkv.weight' (PVT
    wraps the factory module in an `attn` shim holding `attn_fn`,
    ``pvt_legacy.py:78-87``) and per-stage ``patch_embedN`` holds both a
    conv (`.proj`) and a LayerNorm (`.norm`).
    """
    pvt = any(_PVT_BLOCK.fullmatch(p) for p in parts)
    body, out = parts[:-1], []
    i = 0
    while i < len(body):
        p = body[i]
        m = _PVT_BLOCK.fullmatch(p)
        if p.startswith("blocks_"):
            out.append("blocks." + p[len("blocks_"):])
        elif m:
            out.append(f"block{m.group(1)}.{m.group(2)}")
        elif any(p == f"{c}_0" for c in _ATTN_CLASSES):
            out.append("attn.attn_fn" if pvt else "attn")
        elif p.startswith("patch_embed"):
            child = body[i + 1] if i + 1 < len(body) else ""
            out.append(p + (".norm" if child == "LayerNorm_0" else ".proj"))
            i += 2
            continue
        elif p in _COMPONENT_MAP:
            out.append(_COMPONENT_MAP[p])
        else:
            out.append(p)
        i += 1
    leaf = parts[-1]
    if leaf in ("kernel", "scale"):
        out.append("weight")
    elif leaf == "bias":
        out.append("bias")
    else:
        out.append(leaf)  # named tables (e.g. *_relative_position_bias_table)
    return ".".join(out)


def _to_flax_layout(torch_val: np.ndarray, leaf_name: str) -> np.ndarray:
    v = np.asarray(torch_val, np.float32)
    if leaf_name == "kernel":
        if v.ndim == 2:
            return v.T
        if v.ndim == 4:  # conv OIHW -> HWIO
            return v.transpose(2, 3, 1, 0)
    return v


def convert_vit_state_dict(state_dict: Mapping[str, Any],
                           flax_params: Dict) -> Dict:
    """Map a reference ``EfficientTransformer.state_dict()`` onto the flax
    param template (same architecture); returns the converted pytree."""
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    flat = jax.tree_util.tree_flatten_with_path(flax_params)[0]
    treedef = jax.tree_util.tree_structure(flax_params)
    used = set()
    leaves = []
    for path, leaf in flat:
        parts = [getattr(k, "key", str(k)) for k in path]
        if parts and parts[0] == "params":
            parts = parts[1:]
        tk = _flax_path_to_torch_key(parts)
        if tk not in sd:
            raise KeyError(
                f"no reference parameter for flax leaf {'/'.join(parts)} "
                f"(expected torch key '{tk}')")
        val = _to_flax_layout(sd[tk], parts[-1])
        if val.shape != leaf.shape:
            raise ValueError(
                f"shape mismatch for {tk}: torch {val.shape} vs flax "
                f"{leaf.shape}")
        used.add(tk)
        leaves.append(val.astype(leaf.dtype))
    unused = [k for k in sd
              if k not in used and not k.endswith(_IGNORED_TORCH_SUFFIXES)]
    if unused:
        raise ValueError(f"unconverted reference parameters: {unused}")
    return jax.tree_util.tree_unflatten(treedef, leaves)


# ---------------------------------------------------------------- language --

# flax DecoderLayer component -> fairseq TransformerDecoderLayer component
_LM_COMPONENT_MAP = {
    "ln_self": "self_attn_layer_norm",
    "ln_cross": "encoder_attn_layer_norm",
    "ln_ffn": "final_layer_norm",
    "cross_attn": "encoder_attn",
    "final_ln": "layer_norm",
    "layers_0": "0",
    "layers_1": "1",
}

# flax EncoderLayer (@nn.compact) component -> fairseq TransformerEncoderLayer
_ENC_COMPONENT_MAP = {
    "LayerNorm_0": "self_attn_layer_norm",
    "LayerNorm_1": "final_layer_norm",
    "Dense_0": "fc1",
    "Dense_1": "fc2",
    "layers_0": "0",
    "layers_1": "1",
}

_LM_IGNORED_SUFFIXES = (
    "._float_tensor", ".version",
    # fully-tied adaptive softmax: every tail/word_proj tensor IS an
    # adaptive-input tensor (fairseq TiedLinear registers the shared
    # parameter under both names)
    "adaptive_softmax.head.word_proj.weight",
)
_LM_IGNORED_RE = re.compile(
    r"adaptive_softmax\.tail\.\d+\.\d+\.weight$")


def _verify_tied_adaptive(sd: Mapping[str, np.ndarray]) -> None:
    """The conversion treats adaptive-softmax tail/word_proj tensors as
    duplicates of the adaptive-INPUT bands (fairseq ``TiedLinear`` registers
    the shared parameter under both names).  That is only true for
    ``--tie-adaptive-weights`` checkpoints — verify it, so an untied
    checkpoint raises instead of silently substituting its input embeddings
    for the trained output layer."""
    for k in sd:
        if "adaptive_softmax.head.word_proj.weight" in k:
            band = k.split("adaptive_softmax")[0] + \
                "embed_tokens.embeddings.0.0.weight"
            pairs = [(k, band)]
        else:
            m = re.search(r"adaptive_softmax\.tail\.(\d+)\.(\d+)\.weight$", k)
            if not m:
                continue
            i, j = int(m.group(1)), int(m.group(2))
            # tail.i.0 is the dim-reducing projection (== band i+1's
            # projection, embeddings.{i+1}.1); the last tail linear is the
            # band's word embedding (embeddings.{i+1}.0)
            band = (k.split("adaptive_softmax")[0]
                    + f"embed_tokens.embeddings.{i + 1}.{1 if j == 0 else 0}"
                    + ".weight")
            pairs = [(k, band)]
        for tied, band in pairs:
            if band not in sd or sd[tied].shape != sd[band].shape \
                    or not np.allclose(sd[tied], sd[band]):
                raise ValueError(
                    f"'{tied}' does not mirror '{band}': this checkpoint's "
                    "adaptive softmax is NOT tied to the adaptive input "
                    "(no --tie-adaptive-weights); convert_lang_state_dict "
                    "only supports the tied configuration the wiki103 "
                    "recipe publishes")


def _lang_path_to_torch_key(parts) -> str:
    """Translate a flax LM/MT param path to the fairseq parameter name.

    LM example: ['decoder', 'layer_0', 'self_attn', 'q_proj', 'kernel'] ->
    'decoder.layers.0.self_attn.q_proj.weight'.  MT encoder example:
    ['encoder', 'layer_0', 'EVA_0', 'qkv', 'kernel'] ->
    'encoder.layers.0.self_attn.attn.qkv.weight' (the fork's
    ``EfficientAttention`` wrapper holds the factory module as ``.attn``,
    ``fairseq/modules/efficient_attention.py:64``).
    """
    body, out = parts[:-1], []
    in_encoder = parts and parts[0] == "encoder"
    cmap = dict(_LM_COMPONENT_MAP)
    if in_encoder:
        cmap.update(_ENC_COMPONENT_MAP)
    if parts and parts[0] == "adaptive_softmax":
        # TransformerLM holds the (tied) adaptive softmax beside the
        # decoder; fairseq nests it inside TransformerDecoder
        out.append("decoder")
    i = 0
    while i < len(body):
        p = body[i]
        if p == "shared_embed":
            # one flax table stands for encoder+decoder+output tied tables;
            # source from the encoder key
            out.append("encoder.embed_tokens")
        elif p.startswith("layer_"):
            out.append("layers." + p[len("layer_"):])
        elif any(p == f"{c}_0" for c in _ATTN_CLASSES):
            # factory-built encoder attention sits behind the
            # EfficientAttention bridge as `.attn`
            out.append("self_attn.attn")
        elif re.fullmatch(r"emb_(\d+)", p):
            out.append(f"embeddings.{p[4:]}.0")
        elif re.fullmatch(r"proj_(\d+)", p):
            out.append(f"embeddings.{p[5:]}.1")
        elif p == "class_proj":
            out.append("head.class_proj")
        elif p in cmap:
            out.append(cmap[p])
        else:
            out.append(p)
        i += 1
    leaf = parts[-1]
    if leaf in ("kernel", "scale"):
        out.append("weight")
    elif leaf == "embedding":
        out.append("weight")
    elif leaf == "rel_pos_bias":
        # causal-EVA scalar T5 table is a direct flax param; fairseq stores
        # it as an Embedding inside T5RelativePositionBias
        out.append("rel_pos_bias.relative_attention_bias.weight")
    elif leaf == "relative_attention_bias":
        out.append("relative_attention_bias.weight")
    elif leaf == "embed_positions":
        # learned positional table (padding-aware fairseq layout:
        # max_len + pad_idx + 1 rows) — stored here as a raw param
        out.append("embed_positions.weight")
    else:
        out.append(leaf)
    return ".".join(out)


def convert_lang_state_dict(state_dict: Mapping[str, Any],
                            flax_params: Dict,
                            shared_embed: bool = False) -> Dict:
    """Map a fairseq ``transformer_lm`` / ``transformer`` state_dict onto
    the flax LM/MT param template (same architecture).

    Handles: adaptive input bands, FULLY TIED adaptive softmax (only
    ``head.class_proj`` is an independent tensor — the tied tail/word
    tensors are recognized as duplicates of the adaptive-input bands),
    ``--share-all-embeddings`` (one flax table fed from
    ``encoder.embed_tokens.weight``), causal-EVA decoder layers, and the
    fork's ``EfficientAttention``-wrapped factory encoder attention.
    """
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    _verify_tied_adaptive(sd)
    flat = jax.tree_util.tree_flatten_with_path(flax_params)[0]
    treedef = jax.tree_util.tree_structure(flax_params)
    used = set()
    leaves = []
    for path, leaf in flat:
        parts = [getattr(k, "key", str(k)) for k in path]
        if parts and parts[0] == "params":
            parts = parts[1:]
        tk = _lang_path_to_torch_key(parts)
        if tk not in sd:
            raise KeyError(
                f"no reference parameter for flax leaf {'/'.join(parts)} "
                f"(expected torch key '{tk}')")
        val = _to_flax_layout(sd[tk], parts[-1])
        if parts[-1] in ("embedding", "rel_pos_bias",
                         "relative_attention_bias", "embed_positions"):
            val = np.asarray(sd[tk], np.float32)  # no transpose
        if val.shape != leaf.shape:
            raise ValueError(
                f"shape mismatch for {tk}: torch {val.shape} vs flax "
                f"{leaf.shape}")
        used.add(tk)
        leaves.append(val.astype(leaf.dtype))
    if shared_embed:
        used.update({"decoder.embed_tokens.weight",
                     "decoder.output_projection.weight"})
    unused = [
        k for k in sd
        if k not in used
        and not any(k.endswith(s) for s in _LM_IGNORED_SUFFIXES)
        and not _LM_IGNORED_RE.search(k)
    ]
    if unused:
        raise ValueError(f"unconverted reference parameters: {unused}")
    return jax.tree_util.tree_unflatten(treedef, leaves)


def load_reference_checkpoint(path: str, flax_params: Dict) -> Dict:
    """Load a reference ``ckpt.pth`` (or bare state_dict ``.pth``) file."""
    import torch

    # reference ckpt.pth files pickle non-tensor state too (optimizer,
    # lr_scheduler, argparse args — ``vit/main.py:355-363``), which the
    # torch>=2.6 weights_only default refuses to load
    blob = torch.load(path, map_location="cpu", weights_only=False)
    sd = blob.get("model", blob) if isinstance(blob, dict) else blob
    sd = {k: v.numpy() if hasattr(v, "numpy") else v for k, v in sd.items()}
    return convert_vit_state_dict(sd, flax_params)
