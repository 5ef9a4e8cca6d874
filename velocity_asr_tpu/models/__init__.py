"""Model components and assembly."""

from .config import VelocityASRConfig
from .layers import CTCOutputHead, PositionalEncoding2D, TemporalBindingLayer
from .ssm import GlobalSSM, LocalSSMProcessor, SelectiveSSM, SSMBlock
from .attention import (
    AdaptivePool,
    GatedFusion,
    HierarchicalGlobalContext,
    MultiHeadAttention,
)
from .model import (
    VelocityASR,
    count_parameters,
    create_model,
    forward,
    from_pretrained,
    get_output_length,
    init_params,
    save_pretrained,
)

__all__ = [
    "VelocityASRConfig",
    "CTCOutputHead",
    "PositionalEncoding2D",
    "TemporalBindingLayer",
    "GlobalSSM",
    "LocalSSMProcessor",
    "SelectiveSSM",
    "SSMBlock",
    "AdaptivePool",
    "GatedFusion",
    "HierarchicalGlobalContext",
    "MultiHeadAttention",
    "VelocityASR",
    "count_parameters",
    "create_model",
    "forward",
    "from_pretrained",
    "get_output_length",
    "init_params",
    "save_pretrained",
]
