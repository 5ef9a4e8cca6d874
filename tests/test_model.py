"""Model assembly tests: shapes, param parity, checkpoint roundtrip, and
full-forward golden parity against the torch reference via the weight
converter."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import velocity_asr_tpu as va


SMALL = dict(
    d_model=16,
    ssm_layers=2,
    ssm_state_dim=8,
    global_ssm_layers=1,
    global_ssm_state_dim=4,
    attention_heads=2,
    attention_dim=8,
    vocab_size=40,
)


@pytest.fixture(scope="module")
def small_model():
    cfg = va.VelocityASRConfig(**SMALL)
    model = va.create_model(cfg)
    params = va.init_params(model, jax.random.PRNGKey(0), example_frames=64)
    return model, params


def test_param_count_matches_reference_default():
    # Measured on the reference: 6,172,696 at default config (SURVEY.md).
    cfg = va.VelocityASRConfig()
    model = va.create_model(cfg)
    params = va.init_params(model, jax.random.PRNGKey(0), example_frames=8)
    assert va.count_parameters(params) == 6_172_696


def test_forward_shape(small_model):
    model, params = small_model
    mel = jax.random.normal(jax.random.PRNGKey(1), (2, 100, 80))
    logits = va.forward(model, params, mel)
    assert logits.shape == (2, 50, SMALL["vocab_size"])


def test_output_length_rule():
    assert va.get_output_length(500) == 250
    assert va.get_output_length(501) == 251
    assert va.get_output_length(1) == 1


def test_return_features(small_model):
    model, params = small_model
    mel = jnp.zeros((1, 64, 80))
    logits, feats = va.forward(model, params, mel, return_features=True)
    assert set(feats) == {"temporal_binding", "local_features", "fused_features"}
    assert feats["temporal_binding"].shape == (1, 32, SMALL["d_model"])


def test_scan_modes_agree(small_model):
    import dataclasses

    model, params = small_model
    mel = jax.random.normal(jax.random.PRNGKey(2), (1, 80, 80))
    outs = {}
    for mode in ("sequential", "parallel", "pallas"):
        cfg = dataclasses.replace(model.config, scan_mode=mode)
        m = va.create_model(cfg)
        outs[mode] = np.asarray(va.forward(m, params, mel))
    np.testing.assert_allclose(outs["sequential"], outs["parallel"], rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(outs["sequential"], outs["pallas"], rtol=1e-4, atol=1e-4)


def test_dropout_stochastic_in_train(small_model):
    model, params = small_model
    mel = jnp.ones((1, 64, 80))
    l1 = va.forward(model, params, mel, train=True, dropout_rng=jax.random.PRNGKey(1))
    l2 = va.forward(model, params, mel, train=True, dropout_rng=jax.random.PRNGKey(2))
    assert not np.allclose(np.asarray(l1), np.asarray(l2))
    # Eval is deterministic.
    e1 = va.forward(model, params, mel)
    e2 = va.forward(model, params, mel)
    np.testing.assert_array_equal(np.asarray(e1), np.asarray(e2))


def test_save_load_roundtrip(tmp_path, small_model):
    model, params = small_model
    path = os.path.join(tmp_path, "ckpt")
    va.save_pretrained(path, model.config, params)
    model2, params2 = va.from_pretrained(path)
    assert model2.config == model.config
    mel = jax.random.normal(jax.random.PRNGKey(3), (1, 64, 80))
    np.testing.assert_allclose(
        np.asarray(va.forward(model, params, mel)),
        np.asarray(va.forward(model2, params2, mel)),
        rtol=1e-6,
        atol=1e-6,
    )


def test_bf16_forward_close_to_fp32(small_model):
    import dataclasses

    model, params = small_model
    mel = jax.random.normal(jax.random.PRNGKey(4), (1, 64, 80))
    m_bf16 = va.create_model(dataclasses.replace(model.config, dtype="bfloat16"))
    out32 = np.asarray(va.forward(model, params, mel))
    out16 = np.asarray(va.forward(m_bf16, params, mel))
    assert out16.dtype == np.float32  # logits always fp32
    # bf16 has ~3 decimal digits; logits should still be close.
    assert np.mean(np.abs(out32 - out16)) < 0.1


def test_full_forward_matches_torch_reference(torch_reference):
    """End-to-end golden test: torch weights -> converter -> identical logits."""
    import torch

    from velocity_asr_tpu.compat import convert_torch_state_dict

    ref_cfg = torch_reference.VelocityASRConfig(
        d_model=32,
        ssm_layers=2,
        ssm_state_dim=8,
        global_ssm_layers=1,
        global_ssm_state_dim=4,
        attention_heads=2,
        attention_dim=8,
        vocab_size=50,
        dropout=0.0,
        scan_mode="sequential",
    )
    torch.manual_seed(0)
    ref_model = torch_reference.VELOCITYASR(ref_cfg).eval()
    # The reference's hand-rolled Blelloch scan does NOT match its own
    # sequential recurrence (down-sweep order-of-operations bug,
    # reference ssm.py:279-284), and GlobalSSM always uses the default
    # parallel mode (ssm.py:529-538). Force sequential everywhere so the
    # oracle computes the documented recurrence.
    for m in ref_model.modules():
        if isinstance(m, torch_reference.SelectiveSSM):
            m.scan_mode = "sequential"

    mel = np.random.default_rng(5).standard_normal((2, 200, 80)).astype(np.float32)
    with torch.no_grad():
        ref_logits = ref_model(torch.from_numpy(mel)).numpy()

    cfg = va.VelocityASRConfig(
        d_model=32,
        ssm_layers=2,
        ssm_state_dim=8,
        global_ssm_layers=1,
        global_ssm_state_dim=4,
        attention_heads=2,
        attention_dim=8,
        vocab_size=50,
        dropout=0.0,
        scan_mode="sequential",
    )
    model = va.create_model(cfg)
    params = convert_torch_state_dict(
        ref_model.state_dict(), ssm_layers=2, global_ssm_layers=1
    )
    logits = np.asarray(va.forward(model, params, jnp.asarray(mel)))

    assert logits.shape == ref_logits.shape
    np.testing.assert_allclose(logits, ref_logits, rtol=1e-3, atol=1e-3)


def test_long_form_forward_pool_scaling(small_model):
    """>60s-equivalent input: adaptive pool sizes leave the K1=64 floor
    (BASELINE long-form config; reference attention.py:37-44)."""
    from velocity_asr_tpu.ops.pooling import pool_size_level1, pool_size_level2

    model, params = small_model
    frames = 1600  # local length 800 -> K1 = 100, K2 = 25
    assert pool_size_level1(800) == 100
    assert pool_size_level2(100) == 25
    mel = jax.random.normal(jax.random.PRNGKey(9), (1, frames, 80))
    logits = va.forward(model, params, mel)
    assert logits.shape == (1, 800, SMALL["vocab_size"])
    assert np.isfinite(np.asarray(logits)).all()


def test_presets():
    tiny = va.VelocityASRConfig.from_preset("tiny")
    base = va.VelocityASRConfig.from_preset("base")
    large = va.VelocityASRConfig.from_preset("large-vocab", dropout=0.0)
    assert tiny.d_model == 128 and base == va.VelocityASRConfig()
    assert large.vocab_size == 50000 and large.dropout == 0.0

    import pytest as _pytest

    with _pytest.raises(ValueError):
        va.VelocityASRConfig.from_preset("huge")

    # tiny preset builds and runs
    model = va.create_model(tiny)
    params = va.init_params(model, jax.random.PRNGKey(0), example_frames=32)
    n = va.count_parameters(params)
    assert 0.5e6 < n < 3e6
    logits = va.forward(model, params, jnp.zeros((1, 32, 80)))
    assert logits.shape == (1, 16, 1000)


def test_positional_encoding_matches_table_and_lifts_cap():
    """The computed 2D pos-enc equals the reference's (max_len, d/2) sinusoid
    table at every in-table offset, and stays well-defined past the table's
    5000-frame (~100 min) cap (reference model.py:93-104)."""
    import jax
    import jax.numpy as jnp

    from velocity_asr_tpu.models.layers import (
        PositionalEncoding2D,
        sinusoidal_time_encoding,
    )

    d_model = 40
    half = d_model // 2
    pe = PositionalEncoding2D(d_model=d_model)
    params = pe.init(jax.random.PRNGKey(0), jnp.zeros((1, 4, d_model)))

    table = sinusoidal_time_encoding(5000, half)
    for offset, seq in [(0, 64), (4935, 65), (1234, 7)]:
        out = pe.apply(params, jnp.zeros((1, seq, d_model)), time_offset=offset)
        np.testing.assert_allclose(
            np.asarray(out)[0, :, :half], table[offset : offset + seq], atol=2e-5
        )

    # past the old cap: finite, continuous with the in-range encoding
    out = pe.apply(params, jnp.zeros((1, 16, d_model)), time_offset=1_000_000)
    assert np.isfinite(np.asarray(out)).all()
    # traced offset (streaming jit) also works
    f = jax.jit(lambda o: pe.apply(params, jnp.zeros((1, 8, d_model)), time_offset=o))
    a = np.asarray(f(jnp.int32(100)))
    b = np.asarray(pe.apply(params, jnp.zeros((1, 8, d_model)), time_offset=100))
    np.testing.assert_allclose(a, b, atol=1e-6)


def test_torch_convert_infers_config_and_rejects_truncation(torch_reference):
    """Bare state_dicts carry no config: the converter must infer the
    architecture from tensor shapes (a 3-layer model must not be silently
    truncated to the 8-layer default) and refuse malformed checkpoints."""
    import pytest
    import torch

    from velocity_asr_tpu.compat import convert_torch_state_dict
    from velocity_asr_tpu.compat.torch_convert import _infer_config_from_state_dict
    from velocity_asr_tpu.models.config import VelocityASRConfig

    ref_cfg = torch_reference.VelocityASRConfig(
        d_model=32, ssm_layers=3, ssm_state_dim=8, global_ssm_layers=1,
        global_ssm_state_dim=4, attention_heads=2, attention_dim=8,
        vocab_size=50, dropout=0.0, scan_mode="sequential",
    )
    torch.manual_seed(1)
    sd = torch_reference.VELOCITYASR(ref_cfg).state_dict()

    cfg = _infer_config_from_state_dict(sd, VelocityASRConfig)
    assert cfg.ssm_layers == 3
    assert cfg.d_model == 32 and cfg.ssm_state_dim == 8
    assert cfg.global_ssm_layers == 1 and cfg.global_ssm_state_dim == 4
    assert cfg.vocab_size == 50 and cfg.attention_dim == 8

    # Converting with fewer layers than the checkpoint has must raise, not
    # silently drop the extra layer weights.
    with pytest.raises(ValueError, match="not consumed"):
        convert_torch_state_dict(sd, ssm_layers=2, global_ssm_layers=1)

    # A filtered/truncated state_dict missing an expected bias must fail at
    # conversion, not as an opaque flax structure error later.
    broken = {k: v for k, v in sd.items() if k != "ctc_head.proj.2.bias"}
    with pytest.raises(KeyError, match="ctc_head.proj.2.bias"):
        convert_torch_state_dict(broken, ssm_layers=3, global_ssm_layers=1)
