"""Named architecture presets — the ``--arch`` registry.

fairseq registers named architectures whose functions fill in every
hyperparameter the user did not set (``transformer_legacy.py:225-330``,
``transformer_lm.py:330-500``, each line a ``safe_getattr(args, k,
default)``).  The TPU form is declarative: a preset dict per name, applied
to exactly the dests the user did not pin on the CLI or in the YAML
config — same precedence (explicit > config > arch > parser default).

Dims map onto this stack's flag surface (one ``encoder-embed-dim`` feeds
both sides of the MT model, as the reference's shared-dim recipes do).
"""
from __future__ import annotations

from typing import Any, Dict, Optional

# --- MT (``fairseq/models/transformer/transformer_legacy.py``) ---
_MT_BIG = {
    "encoder_embed_dim": 1024,
    "encoder_ffn_embed_dim": 4096,
    "encoder_attention_heads": 16,
    "dropout": 0.3,
}
MT_ARCHS: Dict[str, Dict[str, Any]] = {
    # base (``transformer_legacy.py:238``): the CLI defaults
    "transformer": {},
    "transformer_wmt_en_de": {},
    # ``transformer_legacy.py:225-234``
    "transformer_iwslt_de_en": {
        "encoder_embed_dim": 512,
        "encoder_ffn_embed_dim": 1024,
        "encoder_attention_heads": 4,
        "encoder_layers": 6,
        "decoder_layers": 6,
    },
    # ``transformer_legacy.py:309-318``
    "transformer_vaswani_wmt_en_de_big": dict(_MT_BIG),
    "transformer_wmt_en_de_big": dict(_MT_BIG),
    # ``transformer_legacy.py:322-323`` (big with dropout 0.1)
    "transformer_vaswani_wmt_en_fr_big": {**_MT_BIG, "dropout": 0.1},
}

# --- LM (``fairseq/models/transformer_lm.py``) ---
_LM_WIKI103 = {
    # ``transformer_lm_baevski_wiki103`` (:408-426) + transformer_lm_big:
    # the published checkpoint configuration
    "decoder_embed_dim": 1024,
    "decoder_ffn_embed_dim": 4096,
    "decoder_layers": 16,
    "decoder_attention_heads": 8,
    "dropout": 0.3,
    "adaptive_input": True,
    "tie_adaptive_weights": True,
    "adaptive_cutoffs": "20000,60000",
    "no_decoder_final_norm": True,
    "criterion": "adaptive_loss",
}
# the train_lm PARSER defaults are the wiki103 recipe (adaptive loss +
# cutoffs); every non-wiki103 arch must reset them to fairseq's base
# (full-softmax cross entropy), or `--arch transformer_lm_gpt` would
# silently train an adaptive-softmax model unlike its fairseq namesake
_LM_PLAIN_SOFTMAX = {
    "criterion": "cross_entropy",
    "adaptive_input": False,
    "tie_adaptive_weights": False,
}
LM_ARCHS: Dict[str, Dict[str, Any]] = {
    # base (:330-346): 512/2048/6L/8H
    "transformer_lm": {
        **_LM_PLAIN_SOFTMAX,
        "decoder_embed_dim": 512,
        "decoder_ffn_embed_dim": 2048,
        "decoder_layers": 6,
        "decoder_attention_heads": 8,
    },
    # :398-402
    "transformer_lm_big": {
        **_LM_PLAIN_SOFTMAX,
        "decoder_embed_dim": 1024,
        "decoder_ffn_embed_dim": 4096,
        "decoder_layers": 12,
        "decoder_attention_heads": 16,
    },
    "transformer_lm_wiki103": dict(_LM_WIKI103),
    "transformer_lm_baevski_wiki103": dict(_LM_WIKI103),
    # :439-446
    "transformer_lm_gpt": {
        **_LM_PLAIN_SOFTMAX,
        "decoder_embed_dim": 768,
        "decoder_ffn_embed_dim": 3072,
        "decoder_layers": 12,
        "decoder_attention_heads": 12,
        "activation_fn": "gelu",
    },
    # :451-494
    "transformer_lm_gpt2_tiny": {
        **_LM_PLAIN_SOFTMAX,
        "decoder_embed_dim": 64,
        "decoder_ffn_embed_dim": 64,
        "decoder_layers": 2,
        "decoder_attention_heads": 1,
        "activation_fn": "gelu",
    },
    "transformer_lm_gpt2_small": {
        **_LM_PLAIN_SOFTMAX,
        "decoder_embed_dim": 1024,
        "decoder_ffn_embed_dim": 4096,
        "decoder_layers": 24,
        "decoder_attention_heads": 16,
        "activation_fn": "gelu",
    },
    "transformer_lm_gpt2_medium": {
        **_LM_PLAIN_SOFTMAX,
        "decoder_embed_dim": 1280,
        "decoder_ffn_embed_dim": 5120,
        "decoder_layers": 36,
        "decoder_attention_heads": 20,
        "activation_fn": "gelu",
    },
    "transformer_lm_gpt2_big": {
        **_LM_PLAIN_SOFTMAX,
        "decoder_embed_dim": 1600,
        "decoder_ffn_embed_dim": 6400,
        "decoder_layers": 48,
        "decoder_attention_heads": 25,
        "activation_fn": "gelu",
    },
}


def apply_arch(args, parser, argv: Optional[list],
               table: Dict[str, Dict[str, Any]]):
    """Fill preset values for dests the user did not pin (CLI or YAML)."""
    name = getattr(args, "arch", None)
    if not name:
        return args
    preset = table.get(name)
    if preset is None:
        raise ValueError(
            f"unknown --arch {name!r} (registered: {sorted(table)})")
    from efficient_attention_tpu.config_yaml import (
        _cli_tokens,
        _explicit_dests,
        load_yaml_config,
    )

    explicit = _explicit_dests(parser, _cli_tokens(argv))
    yaml_keys = set()
    if getattr(args, "config", None):
        yaml_keys = {k.replace("-", "_")
                     for k in load_yaml_config(args.config)}
    for dest, val in preset.items():
        if dest in explicit or dest in yaml_keys:
            continue
        setattr(args, dest, val)
    return args
