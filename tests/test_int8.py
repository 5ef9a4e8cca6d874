"""INT8 on-device inference tests: XLA/Pallas matmul equivalence,
quantization error bounds, and the model-level int8_inference flag."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import velocity_asr_tpu as va
from velocity_asr_tpu.ops.int8_matmul import (
    dynamic_int8_dense,
    int8_dot_pallas,
    int8_dot_xla,
    quantize_weight,
)


def test_weight_quantization_roundtrip():
    rng = np.random.default_rng(0)
    w = rng.standard_normal((64, 32)).astype(np.float32)
    w_q, scale = quantize_weight(jnp.asarray(w))
    assert w_q.dtype == jnp.int8
    deq = np.asarray(w_q, np.float32) * np.asarray(scale)
    # max per-channel quantization error is scale/2
    assert np.all(np.abs(deq - w) <= np.asarray(scale) / 2 + 1e-7)


def test_int8_dot_xla_close_to_fp32():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((4, 64)).astype(np.float32)
    w = rng.standard_normal((64, 32)).astype(np.float32)
    w_q, scale = quantize_weight(jnp.asarray(w))
    ref = x @ w
    out = np.asarray(int8_dot_xla(jnp.asarray(x), w_q, scale))
    rel = np.abs(out - ref).max() / np.abs(ref).max()
    assert rel < 0.03


def test_int8_pallas_matches_xla():
    rng = np.random.default_rng(2)
    x = rng.standard_normal((3, 40, 128)).astype(np.float32)
    w = rng.standard_normal((128, 256)).astype(np.float32)
    w_q, scale = quantize_weight(jnp.asarray(w))
    a = np.asarray(int8_dot_xla(jnp.asarray(x), w_q, scale))
    b = np.asarray(int8_dot_pallas(jnp.asarray(x), w_q, scale))
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)


def test_dynamic_int8_dense_with_bias():
    rng = np.random.default_rng(3)
    x = rng.standard_normal((5, 64)).astype(np.float32)
    w = rng.standard_normal((64, 16)).astype(np.float32)
    b = rng.standard_normal((16,)).astype(np.float32)
    out = np.asarray(dynamic_int8_dense(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b)))
    ref = x @ w + b
    assert np.abs(out - ref).max() / np.abs(ref).max() < 0.05


def test_model_int8_inference_flag():
    cfg = va.VelocityASRConfig(
        d_model=16, ssm_layers=1, ssm_state_dim=4, global_ssm_layers=1,
        global_ssm_state_dim=4, attention_heads=2, attention_dim=8,
        vocab_size=24, dropout=0.0,
    )
    model = va.create_model(cfg)
    params = va.init_params(model, jax.random.PRNGKey(0), example_frames=64)

    # same params load under int8_inference (identical tree structure)
    cfg8 = dataclasses.replace(cfg, int8_inference=True)
    model8 = va.create_model(cfg8)
    mel = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 80))

    fp32_logits = np.asarray(va.forward(model, params, mel))
    int8_logits = np.asarray(va.forward(model8, params, mel))
    assert fp32_logits.shape == int8_logits.shape
    diff = np.abs(fp32_logits - int8_logits)
    assert diff.max() > 0  # int8 path actually active
    assert diff.max() < 0.5  # and accurate
    # greedy decodes agree on nearly all frames for a random model
    agree = (fp32_logits.argmax(-1) == int8_logits.argmax(-1)).mean()
    assert agree > 0.9
