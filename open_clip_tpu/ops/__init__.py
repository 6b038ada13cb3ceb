from .layers import (
    gelu,
    gelu_tanh,
    layer_norm,
    linear,
    quick_gelu,
    relu_squared,
    rms_norm,
)
from .attention import dot_product_attention, multi_head_attention

__all__ = [
    "gelu",
    "gelu_tanh",
    "layer_norm",
    "linear",
    "quick_gelu",
    "relu_squared",
    "rms_norm",
    "dot_product_attention",
    "multi_head_attention",
]
