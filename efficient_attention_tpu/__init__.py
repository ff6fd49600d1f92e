"""efficient_attention_tpu — a TPU-native efficient-attention framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
HKUNLP/efficient-attention (EVA, LARA and a zoo of efficient-attention
baselines, plus ViT / MT / LM training stacks), designed TPU-first:
SPMD over device meshes, functional transforms, static shapes, and Pallas
kernels for the hot attention paths.

Public surface mirrors the reference factory
(``efficient-attention/efficient_attention/__init__.py:43-79``):

    AttentionFactory.build_attention(name, attn_args_dict) -> linen Module
    AttentionFactory.add_attn_specific_args(parser, name, struct_name, prefix)
    NestedNamespace / add_nested_argument / remove_argument
"""
from typing import Any, Dict

from efficient_attention_tpu.config import (
    NestedNamespace,
    add_nested_argument,
    namespace_to_dict,
    remove_argument,
)
from efficient_attention_tpu.attention import (
    EVA,
    CausalEVAttention,
    KernelizedAttention,
    LinearRA,
    LocalAttention,
    MultiheadAttention,
    RandomizedAttention,
    ScatterBrain,
)

__version__ = "0.1.0"


class AttentionFactory:
    """Name -> module registry (reference ``__init__.py:52-79``)."""

    attn_dict = {
        "performer": KernelizedAttention,
        "softmax": MultiheadAttention,
        "local": LocalAttention,
        "lara": LinearRA,
        "ra": RandomizedAttention,
        "scatterbrain": ScatterBrain,
        "eva": EVA,
        "causal_eva": CausalEVAttention,
    }

    @classmethod
    def register(cls, name: str, attn_cls) -> None:
        cls.attn_dict[name] = attn_cls

    @classmethod
    def build_attention(cls, attn_name: str, attn_args: Dict[str, Any]):
        attn_cls = cls.attn_dict[attn_name]
        # tolerate reference-CLI keys that are not constructor fields
        valid = set(attn_cls.__dataclass_fields__)
        kwargs = {k: v for k, v in attn_args.items() if k in valid}
        dropped = set(attn_args) - set(kwargs)
        if dropped - {"name", "parent"}:
            import logging

            logging.getLogger(__name__).debug(
                "AttentionFactory: dropping unknown args %s for %s",
                sorted(dropped), attn_name,
            )
        return attn_cls(**kwargs)

    @classmethod
    def add_attn_specific_args(
        cls, parent_parser, attn_name, struct_name="attn_args", prefix=""
    ):
        if hasattr(cls.attn_dict[attn_name], "add_attn_specific_args"):
            return cls.attn_dict[attn_name].add_attn_specific_args(
                parent_parser, struct_name=struct_name, prefix=prefix
            )
        return parent_parser


__all__ = [
    "AttentionFactory",
    "NestedNamespace",
    "add_nested_argument",
    "remove_argument",
    "namespace_to_dict",
    "MultiheadAttention",
    "LocalAttention",
    "KernelizedAttention",
    "RandomizedAttention",
    "LinearRA",
    "EVA",
    "CausalEVAttention",
    "ScatterBrain",
]
