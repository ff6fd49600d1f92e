"""Model zoo: DeiT-style EfficientTransformer, PVTv2, MT/LM transformers."""
from efficient_attention_tpu.models.registry import (
    create_model,
    list_models,
    register_model,
)
from efficient_attention_tpu.models import efficient_vit as _evit  # noqa: F401
from efficient_attention_tpu.models import pvt as _pvt  # noqa: F401
from efficient_attention_tpu.models.efficient_vit import Block, EfficientTransformer
from efficient_attention_tpu.models.pvt import PVTBlock, PyramidVisionTransformerV2

__all__ = [
    "create_model",
    "list_models",
    "register_model",
    "EfficientTransformer",
    "Block",
    "PyramidVisionTransformerV2",
    "PVTBlock",
]
from efficient_attention_tpu.models import lightconv as _lightconv  # noqa: F401,E402
from efficient_attention_tpu.models.lightconv import (  # noqa: E402
    DynamicConv,
    LightConvModel,
    LightweightConv,
)

__all__ += ["LightConvModel", "LightweightConv", "DynamicConv"]
