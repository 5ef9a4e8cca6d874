"""TPU-native compute ops (scan, conv, pooling, fused mel)."""

from .scan import (
    ScanMode,
    selective_scan,
    selective_scan_parallel,
    selective_scan_sequential,
)
from .conv import causal_depthwise_conv1d, strided_conv1d
from .pooling import (
    adaptive_avg_pool1d,
    adaptive_pool_matrix,
    pool_size_level1,
    pool_size_level2,
)

__all__ = [
    "ScanMode",
    "selective_scan",
    "selective_scan_parallel",
    "selective_scan_sequential",
    "causal_depthwise_conv1d",
    "strided_conv1d",
    "adaptive_avg_pool1d",
    "adaptive_pool_matrix",
    "pool_size_level1",
    "pool_size_level2",
]
