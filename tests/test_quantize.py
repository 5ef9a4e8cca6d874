"""Quantization tests: FakeQuantize semantics vs the reference, QAT model
forward/training, calibration flow, size accounting."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import velocity_asr_tpu as va
from velocity_asr_tpu.quantize import (
    FakeQuantize,
    QuantDense,
    QuantizationConfig,
    calibrate_model,
    get_model_size_mb,
    init_quant_stats,
    mark_calibrated,
    prepare_model_for_qat,
)


def _fq_apply(module, x, update_stats):
    vars_ = module.init(jax.random.PRNGKey(0), x, update_stats=True)
    out, mutated = module.apply(
        vars_, x, update_stats=update_stats, mutable=["quant_stats"]
    )
    return out, mutated["quant_stats"]


def test_fake_quantize_symmetric_per_channel_matches_reference(torch_reference):
    import torch

    from velocity_asr import quantize as ref_q

    rng = np.random.default_rng(0)
    w = rng.standard_normal((6, 4)).astype(np.float32)  # torch (out, in)

    ref_fq = ref_q.FakeQuantize(bits=8, symmetric=True, per_channel=True, channel_dim=0)
    ref_fq.train()
    ref_out = ref_fq(torch.from_numpy(w)).detach().numpy()

    # ours: flax kernel layout (in, out) with channel_axis=-1
    fq = FakeQuantize(bits=8, symmetric=True, per_channel=True, channel_axis=-1)
    out, _ = _fq_apply(fq, jnp.asarray(w.T), update_stats=True)
    np.testing.assert_allclose(np.asarray(out).T, ref_out, rtol=1e-5, atol=1e-6)


def test_fake_quantize_asymmetric_matches_reference(torch_reference):
    import torch

    from velocity_asr import quantize as ref_q

    rng = np.random.default_rng(1)
    x = (rng.standard_normal((5, 7)) * 3 + 1).astype(np.float32)

    ref_fq = ref_q.FakeQuantize(bits=8, symmetric=False, per_channel=False)
    ref_fq.train()
    ref_out = ref_fq(torch.from_numpy(x)).detach().numpy()

    fq = FakeQuantize(bits=8, symmetric=False, per_channel=False)
    out, _ = _fq_apply(fq, jnp.asarray(x), update_stats=True)
    np.testing.assert_allclose(np.asarray(out), ref_out, rtol=1e-4, atol=1e-5)


def test_fake_quantize_passthrough_until_calibrated():
    x = jnp.asarray(np.random.default_rng(2).standard_normal((4, 4)).astype(np.float32))
    fq = FakeQuantize()
    vars_ = fq.init(jax.random.PRNGKey(0), x, update_stats=True)
    # inference, uncalibrated -> identity (reference quantize.py:83-85)
    out = fq.apply(vars_, x, update_stats=False)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(x))
    # calibrated -> quantized
    vars_cal = {"quant_stats": mark_calibrated(vars_["quant_stats"])}
    out_q = fq.apply(vars_cal, x, update_stats=False)
    assert not np.allclose(np.asarray(out_q), np.asarray(x))


def test_quant_dense_ste_gradient():
    x = jnp.ones((2, 8))
    qd = QuantDense(4)
    vars_ = qd.init(jax.random.PRNGKey(0), x, train=True)

    def loss(params):
        out, _ = qd.apply(
            {"params": params, "quant_stats": vars_["quant_stats"]},
            x, train=True, mutable=["quant_stats"],
        )
        return jnp.sum(out**2)

    g = jax.grad(loss)(vars_["params"])
    # STE: gradients flow to the underlying fp32 kernel
    assert float(jnp.abs(g["kernel"]).sum()) > 0


@pytest.fixture(scope="module")
def qat_model():
    cfg = va.VelocityASRConfig(
        d_model=16, ssm_layers=1, ssm_state_dim=4, global_ssm_layers=1,
        global_ssm_state_dim=4, attention_heads=2, attention_dim=8,
        vocab_size=20, dropout=0.0,
    )
    qcfg = prepare_model_for_qat(cfg)
    assert qcfg.qat
    model = va.create_model(qcfg)
    mel = jnp.zeros((1, 32, 80))
    variables = model.init({"params": jax.random.PRNGKey(0)}, mel, train=False)
    return model, variables["params"], variables["quant_stats"]


def test_qat_quant_stats_only_outside_ssm(qat_model):
    model, params, quant_stats = qat_model
    paths = {
        "/".join(str(k.key) for k in path)
        for path, _ in jax.tree_util.tree_leaves_with_path(quant_stats)
    }
    # the ssm_state_fp32 rule: nothing under the SSM stacks is quantized
    assert not any("local_ssm" in p for p in paths)
    assert not any("global_ssm" in p for p in paths)
    # but global-context attention/pool/fusion, ctc head, temporal conv are
    assert any(p.startswith("global_context/cross_attention") for p in paths)
    assert any(p.startswith("global_context/pool1") for p in paths)
    assert any(p.startswith("global_context/fusion") for p in paths)
    assert any(p.startswith("ctc_head") for p in paths)
    assert any(p.startswith("temporal_binding/conv") for p in paths)


def test_qat_forward_and_calibration(qat_model):
    model, params, quant_stats = qat_model
    mel = np.random.default_rng(3).standard_normal((2, 32, 80)).astype(np.float32)

    # Uncalibrated inference == fp32 model semantics (pass-through quantizers).
    logits_fp32 = model.apply({"params": params, "quant_stats": quant_stats},
                              jnp.asarray(mel), train=False)

    # Calibrate on data, then quantized inference differs but is close.
    cal_stats = calibrate_model(model, params, quant_stats, [mel], num_batches=1)
    logits_int8 = model.apply({"params": params, "quant_stats": cal_stats},
                              jnp.asarray(mel), train=False)
    diff = np.abs(np.asarray(logits_int8) - np.asarray(logits_fp32))
    assert diff.max() > 0  # quantization is active
    assert diff.max() < 1.0  # and sane


@pytest.mark.slow
def test_qat_train_step():
    cfg = va.VelocityASRConfig(
        d_model=16, ssm_layers=1, ssm_state_dim=4, global_ssm_layers=1,
        global_ssm_state_dim=4, attention_heads=2, attention_dim=8,
        vocab_size=20, dropout=0.0, qat=True,
    )
    model = va.create_model(cfg)
    mel = jnp.zeros((1, 32, 80))
    variables = model.init({"params": jax.random.PRNGKey(0)}, mel, train=False)
    params, qstats = variables["params"], variables["quant_stats"]

    def loss_fn(params, qstats):
        out, mutated = model.apply(
            {"params": params, "quant_stats": qstats},
            mel, train=True, mutable=["quant_stats"],
            rngs={"dropout": jax.random.PRNGKey(1)},
        )
        return jnp.sum(out**2), mutated["quant_stats"]

    (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(params, qstats)
    assert np.isfinite(float(loss))
    # observers were refreshed during the training forward
    leaves_before = jax.tree_util.tree_leaves(qstats)
    leaves_after = jax.tree_util.tree_leaves(new_stats)
    changed = any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(leaves_before, leaves_after)
    )
    assert changed


def test_model_size_accounting():
    cfg = va.VelocityASRConfig()
    model = va.create_model(cfg)
    params = va.init_params(model, jax.random.PRNGKey(0), example_frames=8)
    fp32 = get_model_size_mb(params, bits_per_param=32)
    int8 = get_model_size_mb(params, bits_per_param=8)
    assert 20 < fp32 < 30  # 6.17M params * 4B ~= 23.5 MB
    assert abs(fp32 / int8 - 4.0) < 1e-6
