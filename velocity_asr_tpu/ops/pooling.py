"""Static-shape adaptive average pooling.

The reference uses F.adaptive_avg_pool1d with a runtime-computed pool size
(reference attention.py:37-44, 63-72) — data-dependent shapes that XLA
cannot trace. Here sequence lengths are static at trace time (the data
pipeline buckets/pads utterances), so the pool size is a Python constant
and the uneven-bucket averaging becomes a precomputed (K, L) matrix
applied with one MXU matmul.

Bucket rule matches torch.nn.functional.adaptive_avg_pool1d exactly:
output bin i averages input indices [floor(i*L/K), ceil((i+1)*L/K)).
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np


def pool_size_level1(seq_len: int) -> int:
    """K1 = max(64, L // 8), clamped to L (reference attention.py:39-40, 67)."""
    return min(max(64, seq_len // 8), seq_len)


def pool_size_level2(k1: int) -> int:
    """K2 = min(64, max(16, K1 // 4)), clamped to K1 (reference attention.py:43-44, 67)."""
    return min(min(64, max(16, k1 // 4)), k1)


@functools.lru_cache(maxsize=64)
def adaptive_pool_matrix(seq_len: int, pool_size: int) -> np.ndarray:
    """(pool_size, seq_len) averaging matrix matching torch semantics."""
    mat = np.zeros((pool_size, seq_len), dtype=np.float32)
    for i in range(pool_size):
        start = (i * seq_len) // pool_size
        end = -(-((i + 1) * seq_len) // pool_size)  # ceil
        mat[i, start:end] = 1.0 / (end - start)
    # lru_cache hands the same ndarray to every caller; make in-place
    # mutation raise instead of silently poisoning future pools.
    mat.setflags(write=False)
    return mat


def adaptive_avg_pool1d(x: jnp.ndarray, pool_size: int) -> jnp.ndarray:
    """Adaptive average pool over the time axis.

    Args:
        x: (batch, seq_len, d_model)
        pool_size: static output length K <= seq_len.

    Returns:
        (batch, K, d_model)
    """
    seq_len = x.shape[1]
    if pool_size == seq_len:
        return x
    mat = jnp.asarray(adaptive_pool_matrix(seq_len, pool_size), dtype=x.dtype)
    return jnp.einsum("kl,bld->bkd", mat, x)
