"""INT8 matmul paths for on-device quantized inference.

The reference's INT8 deployment story is ONNX Runtime dynamic quantization
(weights int8, activations quantized per call; reference
quantize.py:434-440). The TPU-native equivalent here:

  - weights: per-output-channel symmetric int8 (constant-folded by XLA at
    compile time, so the compiled executable holds int8 weights);
  - activations: per-row (per-token) symmetric dynamic quantization —
    each row of the flattened (tokens, features) input gets its own scale
    (the calibrated static path in quantize.py uses a per-tensor scale
    instead);
  - the product runs on the MXU's int8 path with int32 accumulation,
    dequantized by (x_scale * w_scale).

Two implementations: a plain XLA path (lax.dot_general on int8) and a fused
Pallas kernel (quantize + dot + dequantize in VMEM). Both are
equivalence-tested in tests/test_int8.py.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def quantize_weight(w: jnp.ndarray):
    """Per-output-channel symmetric int8: returns (w_int8 (K, N), scale (1, N)).

    Grid contract: scale = amax/127, clip [-127, 127]. export.py's
    quantize_weights_int8 writes packages on this same grid — keep them in
    sync or saved int8 packages stop round-tripping losslessly.
    """
    amax = jnp.max(jnp.abs(w), axis=0, keepdims=True)
    scale = jnp.maximum(amax / 127.0, 1e-10).astype(jnp.float32)
    w_q = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    return w_q, scale


def int8_dot_xla(
    x: jnp.ndarray,
    w_q: jnp.ndarray,
    w_scale: jnp.ndarray,
    x_scale: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Int8 matmul, XLA path; activation scale dynamic (per call) or
    static (calibrated, passed in — the ORT quantize_static analog).

    x: (..., K) float; w_q: (K, N) int8; w_scale: (1, N) fp32.
    """
    xf = x.astype(jnp.float32)
    if x_scale is None:
        # Per-row (per-token) dynamic scale: co-batched utterances must
        # not change each other's quantization grid (a loud utterance
        # raising a shared per-tensor scale coarsens its batchmates).
        x_amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
        x_scale = jnp.maximum(x_amax / 127.0, 1e-10)
    x_q = jnp.clip(jnp.round(xf / x_scale), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        x_q, w_q,
        dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return acc.astype(jnp.float32) * (x_scale * w_scale)


def _int8_kernel(xs_ref, x_ref, w_ref, ws_ref, out_ref):
    """Fused quantize + int8 dot + dequantize, static calibrated scale.

    xs_ref: (1, 1) SMEM activation scale; x_ref: (M_b, K) fp32;
    w_ref: (K, N) int8; ws_ref: (1, N) fp32; out_ref: (M_b, N) fp32.
    """
    x_scale = xs_ref[0, 0]
    x_q = jnp.clip(
        jnp.round(x_ref[:] * pl.reciprocal(x_scale, approx=False)), -127, 127
    ).astype(jnp.int8)
    acc = jax.lax.dot_general(
        x_q, w_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    out_ref[:] = acc.astype(jnp.float32) * (x_scale * ws_ref[:])


def _int8_dynamic_kernel(x_ref, w_ref, ws_ref, out_ref):
    """Fused per-row dynamic quantize + int8 dot + dequantize.

    Each row (token) gets its own scale from its own max-abs, so results
    are independent of whatever else is in the batch."""
    xf = x_ref[:]
    amax = jnp.max(jnp.abs(xf), axis=1, keepdims=True)  # (M_b, 1)
    xs = jnp.maximum(amax * (1.0 / 127.0), 1e-10)
    x_q = jnp.clip(jnp.round(xf / xs), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        x_q, w_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    out_ref[:] = acc.astype(jnp.float32) * xs * ws_ref[:]


def int8_dot_pallas(
    x: jnp.ndarray,
    w_q: jnp.ndarray,
    w_scale: jnp.ndarray,
    x_scale: jnp.ndarray | None = None,
    block_m: int = 256,
) -> jnp.ndarray:
    """Int8 matmul, fused Pallas kernel; activation scale dynamic or
    static (calibrated, passed in).

    x: (..., K) float; w_q: (K, N) int8 with K, N lane-aligned
    (pad outside if needed); w_scale: (1, N) fp32.
    """
    orig_shape = x.shape
    k = orig_shape[-1]
    n = w_q.shape[1]
    xf = x.reshape(-1, k).astype(jnp.float32)
    m = xf.shape[0]
    pad_m = (-m) % block_m
    if pad_m:
        xf = jnp.pad(xf, ((0, pad_m), (0, 0)))

    grid = (xf.shape[0] // block_m,)
    if x_scale is None:
        # Per-row dynamic scales, computed inside the kernel.
        out = pl.pallas_call(
            _int8_dynamic_kernel,
            out_shape=jax.ShapeDtypeStruct((xf.shape[0], n), jnp.float32),
            grid=grid,
            in_specs=[
                pl.BlockSpec((block_m, k), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((k, n), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, n), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((block_m, n), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            interpret=jax.default_backend() != "tpu",
        )(xf, w_q, w_scale)
        return out[:m].reshape(orig_shape[:-1] + (n,))

    x_scale = jnp.asarray(x_scale, jnp.float32).reshape(1, 1)
    out = pl.pallas_call(
        _int8_kernel,
        out_shape=jax.ShapeDtypeStruct((xf.shape[0], n), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((block_m, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_m, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
        interpret=jax.default_backend() != "tpu",
    )(x_scale, xf, w_q, w_scale)

    return out[:m].reshape(orig_shape[:-1] + (n,))


def dynamic_int8_dense(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    bias: jnp.ndarray | None = None,
    backend: str = "auto",
    x_scale: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Weights-only-quantized Dense: fp32 kernel is quantized at trace time
    (constant-folded to int8 in the executable); activations quantized
    dynamically (x_scale=None) or with a calibrated static scale.

    backend: "auto" (pallas on TPU when shapes are lane-aligned), "xla",
    or "pallas".
    """
    w_q, w_scale = quantize_weight(kernel.astype(jnp.float32))
    k, n = kernel.shape
    if backend == "auto":
        aligned = k % 128 == 0 and n % 128 == 0
        backend = "pallas" if (jax.default_backend() == "tpu" and aligned) else "xla"
    if backend == "pallas":
        out = int8_dot_pallas(x, w_q, w_scale, x_scale=x_scale)
    else:
        out = int8_dot_xla(x, w_q, w_scale, x_scale=x_scale)
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out.astype(x.dtype)
