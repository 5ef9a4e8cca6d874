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


class TestStaticInt8:
    """Calibrated static activation scales (the ORT quantize_static analog,
    reference quantize.py:449-472)."""

    def _toy(self):
        import flax.linen as nn

        from velocity_asr_tpu.quantize import DynamicInt8Dense

        model = DynamicInt8Dense(16, static=True)
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((4, 8)).astype(np.float32))
        variables = model.init(jax.random.PRNGKey(0), x)
        return model, variables["params"], variables["quant_stats"], x, rng

    def test_calibration_accumulates_running_max(self):
        from velocity_asr_tpu.quantize import mark_calibrated

        model, params, stats, x, rng = self._toy()
        _, m1 = model.apply({"params": params, "quant_stats": stats}, x * 1.0,
                            mutable=["quant_stats"])
        a1 = float(jax.tree_util.tree_leaves(m1["quant_stats"])[1])  # x_amax
        _, m2 = model.apply({"params": params, "quant_stats": m1["quant_stats"]},
                            x * 3.0, mutable=["quant_stats"])
        stats2 = m2["quant_stats"]
        amaxes = {k: v for k, v in jax.tree_util.tree_flatten_with_path(stats2)[0]}
        vals = [float(v) for p, v in amaxes.items() if "x_amax" in str(p)]
        assert len(vals) == 1
        np.testing.assert_allclose(vals[0], 3 * a1, rtol=1e-6)

    def test_static_scale_used_after_calibration(self):
        from velocity_asr_tpu.quantize import mark_calibrated

        model, params, stats, x, rng = self._toy()
        _, m = model.apply({"params": params, "quant_stats": stats}, x,
                           mutable=["quant_stats"])
        calibrated = mark_calibrated(m["quant_stats"])

        # fp32 oracle
        y_fp = x @ params["kernel"] + params["bias"]
        y_static = model.apply({"params": params, "quant_stats": calibrated}, x)
        np.testing.assert_allclose(np.asarray(y_static), np.asarray(y_fp),
                                   atol=0.08, rtol=0.05)

        # out-of-calibration-range input: static clips where dynamic rescales,
        # so the two paths must now differ
        y_static_big = model.apply({"params": params, "quant_stats": calibrated}, x * 10)
        y_dyn_big = model.apply({"params": params, "quant_stats": stats}, x * 10)
        assert not np.allclose(np.asarray(y_static_big), np.asarray(y_dyn_big))

    def test_full_model_static_int8_close_to_fp32(self):
        from velocity_asr_tpu.models.config import VelocityASRConfig
        from velocity_asr_tpu.models.model import create_model, forward, init_params
        from velocity_asr_tpu.quantize import calibrate_int8_model

        cfg = VelocityASRConfig(
            d_model=32, ssm_layers=1, ssm_state_dim=8, global_ssm_layers=1,
            global_ssm_state_dim=4, attention_heads=2, attention_dim=8,
            vocab_size=16, dropout=0.0,
        )
        import dataclasses

        rng = np.random.default_rng(1)
        mel_batches = [rng.standard_normal((2, 64, 80)).astype(np.float32)
                       for _ in range(3)]

        fp_model = create_model(cfg)
        params = init_params(fp_model, jax.random.PRNGKey(0), example_frames=64)

        s_cfg = dataclasses.replace(cfg, int8_inference=True, int8_static=True)
        s_model = create_model(s_cfg)
        stats = calibrate_int8_model(s_model, params, mel_batches)

        mel = jnp.asarray(mel_batches[0])
        y_fp = np.asarray(forward(fp_model, params, mel))
        y_s = np.asarray(forward(s_model, params, mel, quant_stats=stats))
        # int8 quantization error bound, not bit-exactness
        assert np.max(np.abs(y_s - y_fp)) < 0.5, np.max(np.abs(y_s - y_fp))
        corr = np.corrcoef(y_s.ravel(), y_fp.ravel())[0, 1]
        assert corr > 0.99, corr
