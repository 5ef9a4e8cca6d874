"""Convolution ops for VELOCITY-ASR TPU.

XLA-native (lax.conv_general_dilated) equivalents of the reference's
cuDNN-backed nn.Conv1d uses:
  - causal depthwise conv inside SSM blocks (reference ssm.py:377-383,
    411-413: pad k-1 both sides, truncate right to L => left-pad k-1)
  - strided temporal-binding conv (reference model.py:156-162: k=3,
    stride=2, pad=1)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def causal_depthwise_conv1d(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    bias: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Causal depthwise conv over time.

    Matches the reference SSMBlock conv (ssm.py:377-383): nn.Conv1d with
    groups=d_model, padding=k-1, then right-truncation to the input length
    (ssm.py:411-413) — i.e. a left-padded causal convolution.

    Args:
        x: (batch, L, d_model)
        kernel: (kernel_size, d_model) — tap k applied to x[t - (K-1) + k].
        bias: optional (d_model,)

    Returns:
        (batch, L, d_model)
    """
    k = kernel.shape[0]
    d = kernel.shape[1]
    # lax depthwise conv: feature_group_count=d, kernel (spatial, in/group=1, out).
    out = jax.lax.conv_general_dilated(
        x,
        kernel[:, None, :].astype(x.dtype),
        window_strides=(1,),
        padding=[(k - 1, 0)],
        dimension_numbers=("NHC", "HIO", "NHC"),
        feature_group_count=d,
    )
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out


def strided_conv1d(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    bias: jnp.ndarray | None = None,
    stride: int = 2,
    padding: int = 1,
) -> jnp.ndarray:
    """Strided 1D convolution (temporal binding, reference model.py:156-162).

    Args:
        x: (batch, L, in_channels)
        kernel: (kernel_size, in_channels, out_channels)
        stride/padding: torch Conv1d semantics; default k=3/s=2/p=1 gives
            output length (L + 1) // 2 (reference model.py:370-383).

    Returns:
        (batch, out_L, out_channels)
    """
    out = jax.lax.conv_general_dilated(
        x,
        kernel.astype(x.dtype),
        window_strides=(stride,),
        padding=[(padding, padding)],
        dimension_numbers=("NHC", "HIO", "NHC"),
    )
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out
