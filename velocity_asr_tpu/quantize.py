"""Quantization-aware training and INT8 utilities (reference quantize.py).

Design notes vs. the reference:
  - FakeQuantize is a flax module whose scale/zero-point/calibrated state
    lives in a mutable "quant_stats" variable collection (the functional
    equivalent of the reference's registered buffers, quantize.py:76-78).
  - Min/max observers are recomputed from the current tensor on every
    training forward, with no EMA — matching the reference exactly
    (quantize.py:87-88, a deliberately replicated noisy-QAT property).
  - Straight-through estimator: x + stop_gradient(x_dq - x)
    (reference quantize.py:97).
  - Weights: symmetric per-channel (output channel); activations:
    asymmetric per-tensor (reference QuantizationConfig, quantize.py:18-37).
  - The ssm_state_fp32 rule (quantize.py:288-293): every projection inside
    SSM blocks stays un-quantized; only the global-context attention/pool/
    fusion projections, the CTC head, and the temporal-binding conv are
    quantized — the same set the reference's name-based skip produces.
  - Calibration here *actually observes* activations (the reference's
    calibrate_model runs eval-mode forwards in which FakeQuantize
    passes through without updating, quantize.py:80-97 + 325-371, so its
    post-hoc calibration is a no-op unless QAT training ran first; we fix
    that honestly).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable, Dict, Iterable, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@dataclass
class QuantizationConfig:
    """Quantization settings (reference quantize.py:18-37)."""

    weight_bits: int = 8
    activation_bits: int = 8
    per_channel_weights: bool = True
    ssm_state_fp32: bool = True
    num_calibration_batches: int = 100
    symmetric_weights: bool = True
    symmetric_activations: bool = False


class FakeQuantize(nn.Module):
    """Fake quantization with STE (reference quantize.py:40-139)."""

    bits: int = 8
    symmetric: bool = True
    per_channel: bool = False
    channel_axis: int = -1

    @nn.compact
    def __call__(self, x: jnp.ndarray, update_stats: bool = False) -> jnp.ndarray:
        if self.symmetric:
            qmin = -(2 ** (self.bits - 1))
            qmax = 2 ** (self.bits - 1) - 1
        else:
            qmin = 0
            qmax = 2**self.bits - 1

        if self.per_channel:
            axis = self.channel_axis % x.ndim
            stat_shape = tuple(
                x.shape[i] if i == axis else 1 for i in range(x.ndim)
            )
            reduce_axes = tuple(i for i in range(x.ndim) if i != axis)
        else:
            stat_shape = ()
            reduce_axes = None

        scale_var = self.variable(
            "quant_stats", "scale", lambda: jnp.ones(stat_shape, jnp.float32)
        )
        zp_var = self.variable(
            "quant_stats", "zero_point", lambda: jnp.zeros(stat_shape, jnp.float32)
        )
        calibrated_var = self.variable(
            "quant_stats", "calibrated", lambda: jnp.zeros((), jnp.bool_)
        )
        # Running calibration range (accumulated across calibration
        # batches; +/-inf sentinels mean "nothing observed yet").
        min_var = self.variable(
            "quant_stats", "range_min",
            lambda: jnp.full(stat_shape, jnp.inf, jnp.float32),
        )
        max_var = self.variable(
            "quant_stats", "range_max",
            lambda: jnp.full(stat_shape, -jnp.inf, jnp.float32),
        )

        def ranges(v: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
            v = v.astype(jnp.float32)
            if reduce_axes is None:
                x_min, x_max = jnp.min(v), jnp.max(v)
            else:
                x_min = jnp.min(v, axis=reduce_axes, keepdims=True)
                x_max = jnp.max(v, axis=reduce_axes, keepdims=True)
            return x_min.reshape(stat_shape), x_max.reshape(stat_shape)

        def to_scale_zp(x_min, x_max) -> Tuple[jnp.ndarray, jnp.ndarray]:
            if self.symmetric:
                scale = jnp.maximum(jnp.abs(x_min), jnp.abs(x_max)) / qmax
                zp = jnp.zeros_like(scale)
            else:
                scale = (x_max - x_min) / (qmax - qmin)
                scale_safe = jnp.maximum(scale, 1e-10)
                zp = qmin - x_min / scale_safe
            return jnp.maximum(scale, 1e-10), zp

        can_write = (
            not self.is_initializing()
            and self.is_mutable_collection("quant_stats")
        )

        if update_stats:
            # Training forward: recompute observers from the live tensor
            # (reference quantize.py:87-88, no EMA).
            scale, zp = to_scale_zp(*ranges(x))
            if can_write:
                scale_var.value = scale
                zp_var.value = zp
        elif can_write:
            # Eval forward with a mutable quant_stats collection = a
            # calibration pass: ACCUMULATE the observed range across
            # batches (last-batch-wins would make the calibrated grid
            # depend on batch order and waste every batch but the final
            # one); observe without dropout noise (the reference's
            # calibrate_model never actually observed — see module
            # docstring).
            x_min, x_max = ranges(x)
            new_min = jnp.minimum(min_var.value, x_min)
            new_max = jnp.maximum(max_var.value, x_max)
            min_var.value = new_min
            max_var.value = new_max
            scale, zp = to_scale_zp(new_min, new_max)
            scale_var.value = scale
            zp_var.value = zp
        else:
            scale, zp = scale_var.value, zp_var.value

        xf = x.astype(jnp.float32)
        x_q = jnp.clip(jnp.round(xf / scale + zp), qmin, qmax)
        x_dq = ((x_q - zp) * scale).astype(x.dtype)
        fq = x + jax.lax.stop_gradient(x_dq - x)

        if update_stats or can_write:
            return fq
        # Inference: pass through until calibrated (reference quantize.py:83-85).
        return jnp.where(calibrated_var.value, fq, x)


class QuantDense(nn.Module):
    """Dense with fake-quantized weights and activations
    (reference QuantizedLinear, quantize.py:142-191)."""

    features: int
    use_bias: bool = True
    kernel_init: Callable = nn.initializers.xavier_uniform()
    dtype: Any = jnp.float32
    weight_bits: int = 8
    activation_bits: int = 8

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        kernel = self.param("kernel", self.kernel_init, (x.shape[-1], self.features))
        kernel_q = FakeQuantize(
            bits=self.weight_bits,
            symmetric=True,
            per_channel=True,
            channel_axis=-1,  # output channel (torch channel_dim=0 on (out, in))
            name="weight_quantizer",
        )(kernel, update_stats=train)

        y = jnp.dot(x.astype(self.dtype), kernel_q.astype(self.dtype))
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + bias.astype(self.dtype)

        return FakeQuantize(
            bits=self.activation_bits,
            symmetric=False,
            per_channel=False,
            name="activation_quantizer",
        )(y, update_stats=train)


class QuantConv1d(nn.Module):
    """Strided Conv1d with fake quantization
    (reference QuantizedConv1d, quantize.py:194-266)."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 0
    kernel_init: Callable = nn.initializers.xavier_uniform()
    dtype: Any = jnp.float32
    weight_bits: int = 8
    activation_bits: int = 8

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        from .ops.conv import strided_conv1d

        kernel = self.param(
            "kernel", self.kernel_init, (self.kernel_size, x.shape[-1], self.features)
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        kernel_q = FakeQuantize(
            bits=self.weight_bits, symmetric=True, per_channel=True, channel_axis=-1,
            name="weight_quantizer",
        )(kernel, update_stats=train)
        y = strided_conv1d(
            x.astype(self.dtype), kernel_q, bias, stride=self.stride, padding=self.padding
        )
        return FakeQuantize(
            bits=self.activation_bits, symmetric=False, per_channel=False,
            name="activation_quantizer"
        )(y, update_stats=train)


class DynamicInt8Dense(nn.Module):
    """Dense with int8 weights (trace-time constant-folded) and int8
    activations on the MXU int8 path.

    static=False: per-call dynamic activation scale — the TPU-native
    analog of ORT quantize_dynamic (reference quantize.py:434-440).

    static=True: the ORT quantize_static analog (reference
    quantize.py:449-472): the activation scale is a CALIBRATED constant
    held in the "quant_stats" collection. Calibration = eval forwards with
    quant_stats mutable (calibrate_int8_model); the observer accumulates a
    running max-abs over the calibration data (MinMax calibration,
    symmetric — consistent with the dynamic path so the two tiers differ
    only in where the scale comes from). Until calibrated, inference
    falls back to the dynamic scale."""

    features: int
    use_bias: bool = True
    kernel_init: Callable = nn.initializers.xavier_uniform()
    dtype: Any = jnp.float32
    static: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        from .ops.int8_matmul import dynamic_int8_dense

        del train
        kernel = self.param("kernel", self.kernel_init, (x.shape[-1], self.features))
        bias = (
            self.param("bias", nn.initializers.zeros, (self.features,))
            if self.use_bias
            else None
        )
        if not self.static:
            return dynamic_int8_dense(x, kernel, bias)

        amax_var = self.variable(
            "quant_stats", "x_amax", lambda: jnp.zeros((), jnp.float32)
        )
        calibrated_var = self.variable(
            "quant_stats", "calibrated", lambda: jnp.zeros((), jnp.bool_)
        )
        can_write = (
            not self.is_initializing() and self.is_mutable_collection("quant_stats")
        )
        if can_write:
            # calibration pass: accumulate running max-abs; compute the
            # output exactly (fp32) so downstream observers see clean
            # statistics.
            amax_var.value = jnp.maximum(
                amax_var.value, jnp.max(jnp.abs(x.astype(jnp.float32)))
            )
            y = jnp.dot(x.astype(self.dtype), kernel.astype(self.dtype))
            return y + bias.astype(self.dtype) if bias is not None else y

        static_scale = jnp.maximum(amax_var.value / 127.0, 1e-10)
        dynamic_scale = jnp.maximum(
            jnp.max(jnp.abs(x.astype(jnp.float32))) / 127.0, 1e-10
        )
        x_scale = jnp.where(calibrated_var.value, static_scale, dynamic_scale)
        return dynamic_int8_dense(x, kernel, bias, x_scale=x_scale)


def prepare_model_for_qat(config, quant_config: Optional[QuantizationConfig] = None):
    """Return a QAT-enabled model config (reference prepare_model_for_qat,
    quantize.py:269-322).

    The reference rewrites the module graph in place; in the functional
    build the same effect is config flags: modules outside the SSM stacks
    route their projections through QuantDense/QuantConv1d, with the
    weight/activation bit-widths taken from quant_config.
    """
    import dataclasses

    qc = quant_config or QuantizationConfig()
    # The QAT layers hardcode the reference's default scheme (symmetric
    # per-channel weights, asymmetric per-tensor activations, SSM kept
    # fp32). Silently accepting a different scheme would diverge from
    # what actually runs, so non-default values of the untunable fields
    # are rejected instead of ignored.
    defaults = QuantizationConfig()
    for field in ("per_channel_weights", "symmetric_weights",
                  "symmetric_activations", "ssm_state_fp32"):
        if getattr(qc, field) != getattr(defaults, field):
            raise NotImplementedError(
                f"QuantizationConfig.{field}={getattr(qc, field)} is not "
                "supported: the QAT layers implement the reference's "
                "default scheme only (see QuantDense/QuantConv1d)"
            )
    return dataclasses.replace(
        config, qat=True,
        qat_weight_bits=qc.weight_bits,
        qat_activation_bits=qc.activation_bits,
    )


def calibrate_int8_model(
    model,
    params: Dict[str, Any],
    batches: Iterable[np.ndarray],
    num_batches: int = 100,
) -> Dict[str, Any]:
    """Calibrate a static-INT8 model's activation scales (the ORT
    quantize_static + CalibrationDataReader analog, reference
    quantize.py:449-472).

    `model` must be built with int8_inference=True, int8_static=True.
    Runs eval-mode forwards over calibration batches with the quant_stats
    collection mutable; each DynamicInt8Dense(static=True) accumulates a
    running max-abs of its input (MinMax calibration). Returns the
    calibrated quant_stats to pass to forward()/the INT8 export package.
    """
    variables = model.init(
        {"params": jax.random.PRNGKey(0)},
        jnp.zeros((1, 64, model.config.mel_bins), jnp.float32),
        train=False,
    )
    quant_stats = variables.get("quant_stats", {})

    @jax.jit
    def observe(params, quant_stats, mel):
        _, mutated = model.apply(
            {"params": params, "quant_stats": quant_stats},
            mel,
            train=False,
            mutable=["quant_stats"],
        )
        return mutated["quant_stats"]

    count = 0
    for batch in batches:
        if count >= num_batches:
            break
        quant_stats = observe(params, quant_stats, jnp.asarray(batch))
        count += 1
    if count == 0:
        raise ValueError("no calibration batches provided")
    return mark_calibrated(quant_stats)


def init_quant_stats(model, params, example_frames: int = 64) -> Dict[str, Any]:
    """Build the initial quant_stats collection for a QAT model."""
    mel = jnp.zeros((1, example_frames, model.config.mel_bins), jnp.float32)
    variables = model.init({"params": jax.random.PRNGKey(0)}, mel, train=False)
    return variables.get("quant_stats", {})


def calibrate_model(
    model,
    params: Dict[str, Any],
    quant_stats: Dict[str, Any],
    batches: Iterable[np.ndarray],
    num_batches: int = 100,
) -> Dict[str, Any]:
    """Refresh observers over calibration data, then mark calibrated
    (reference calibrate_model, quantize.py:325-371; see module docstring
    for the honest-observation deviation).
    """
    # Fresh calibration: reset accumulated ranges so a re-calibration is
    # not contaminated by a previous pass's data.
    quant_stats = reset_calibration_ranges(quant_stats)

    @jax.jit
    def observe(params, quant_stats, mel):
        # Eval-mode forward with a mutable quant_stats collection: the
        # observers ACCUMULATE ranges from clean (dropout-free)
        # activations. Jitted: one compiled forward per batch instead of
        # op-by-op dispatch over the TPU tunnel.
        _, mutated = model.apply(
            {"params": params, "quant_stats": quant_stats},
            mel,
            train=False,
            mutable=["quant_stats"],
        )
        return mutated["quant_stats"]

    count = 0
    for batch in batches:
        if count >= num_batches:
            break
        quant_stats = observe(params, quant_stats, jnp.asarray(batch))
        count += 1
    if count == 0:
        # Marking never-observed default stats (scale 1, zp 0) as
        # calibrated would clip every negative activation to zero.
        raise ValueError("no calibration batches provided")
    return mark_calibrated(quant_stats)


def reset_calibration_ranges(quant_stats: Dict[str, Any]) -> Dict[str, Any]:
    """Reset the accumulated calibration ranges to their sentinels."""

    def visit(path, leaf):
        if path and getattr(path[-1], "key", None) == "range_min":
            return jnp.full_like(leaf, jnp.inf)
        if path and getattr(path[-1], "key", None) == "range_max":
            return jnp.full_like(leaf, -jnp.inf)
        return leaf

    return jax.tree_util.tree_map_with_path(visit, quant_stats)


def mark_calibrated(quant_stats: Dict[str, Any], value: bool = True) -> Dict[str, Any]:
    """Set every FakeQuantize 'calibrated' flag (reference quantize.py:367-369)."""

    def visit(path, leaf):
        if path and path[-1].key == "calibrated":
            return jnp.asarray(value, jnp.bool_)
        return leaf

    return jax.tree_util.tree_map_with_path(visit, quant_stats)


def get_model_size_mb(params: Dict[str, Any], bits_per_param: int = 32) -> float:
    """Model size in MB (reference get_model_size_mb, quantize.py:477-495)."""
    n = sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(params))
    return n * (bits_per_param / 8) / (1024 * 1024)
