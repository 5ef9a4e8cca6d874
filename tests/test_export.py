"""Export tests: StableHLO roundtrip, INT8 weight package roundtrip, and
manifest generation from a synthetic LibriSpeech tree."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import velocity_asr_tpu as va
from velocity_asr_tpu.export import (
    export_stablehlo,
    load_exported,
    load_int8_checkpoint,
    quantize_weights_int8,
    save_int8_checkpoint,
)


@pytest.fixture(scope="module")
def tiny():
    cfg = va.VelocityASRConfig(
        d_model=16, ssm_layers=1, ssm_state_dim=4, global_ssm_layers=1,
        global_ssm_state_dim=4, attention_heads=2, attention_dim=8,
        vocab_size=24, dropout=0.0,
    )
    model = va.create_model(cfg)
    params = va.init_params(model, jax.random.PRNGKey(0), example_frames=64)
    return model, params


def test_stablehlo_roundtrip(tmp_path, tiny):
    model, params = tiny
    path = str(tmp_path / "m.stablehlo")
    export_stablehlo(model, params, path, input_shape=(1, 64, 80))
    assert os.path.getsize(path) > 0

    mel = np.random.default_rng(0).standard_normal((1, 64, 80)).astype(np.float32)
    live = np.asarray(va.forward(model, params, jnp.asarray(mel)))
    fn = load_exported(path)
    reloaded = np.asarray(fn(params, jnp.asarray(mel)))
    np.testing.assert_allclose(live, reloaded, rtol=1e-5, atol=1e-5)


def test_int8_quantization_error_small(tiny):
    model, params = tiny
    qtree, info = quantize_weights_int8(params)
    assert info["quantized_tensors"] > 0
    assert info["int8_mb"] < info["fp32_mb"]

    from velocity_asr_tpu.export import dequantize_weights

    deq = dequantize_weights(qtree)
    mel = np.random.default_rng(1).standard_normal((1, 64, 80)).astype(np.float32)
    fp32_out = np.asarray(va.forward(model, params, jnp.asarray(mel)))
    int8_out = np.asarray(va.forward(model, deq, jnp.asarray(mel)))
    # int8 weights perturb logits slightly, not wildly
    assert np.abs(fp32_out - int8_out).max() < 0.5


def test_int8_package_roundtrip(tmp_path, tiny):
    model, params = tiny
    path = str(tmp_path / "int8")
    info = save_int8_checkpoint(path, model.config, params)
    cfg2, params2 = load_int8_checkpoint(path)
    assert cfg2 == model.config

    mel = np.random.default_rng(2).standard_normal((1, 64, 80)).astype(np.float32)
    out1 = np.asarray(va.forward(model, params2, jnp.asarray(mel)))
    # same as in-memory dequantized weights
    from velocity_asr_tpu.export import dequantize_weights, quantize_weights_int8

    deq = dequantize_weights(quantize_weights_int8(params)[0])
    out2 = np.asarray(va.forward(model, deq, jnp.asarray(mel)))
    np.testing.assert_allclose(out1, out2, rtol=1e-6, atol=1e-6)


def test_ssm_weights_not_quantized(tiny):
    model, params = tiny
    qtree, _ = quantize_weights_int8(params, skip_ssm=True)

    def check(path, node):
        if isinstance(node, dict) and set(node) == {"int8", "scale"}:
            assert "ssm" not in path.lower(), path
            return
        if isinstance(node, dict):
            for k, v in node.items():
                check(f"{path}/{k}", v)

    check("", qtree)


def test_manifest_from_synthetic_librispeech(tmp_path):
    from scripts.download_librispeech import flac_duration_seconds, write_manifest
    from tests.flac_encoder import encode_flac

    chap = tmp_path / "LibriSpeech" / "dev-clean" / "84" / "121123"
    chap.mkdir(parents=True)
    rng = np.random.default_rng(0)
    with open(chap / "84-121123.trans.txt", "w") as f:
        for i, text in enumerate(["HELLO WORLD", "GOOD DAY"]):
            utt = f"84-121123-{i:04d}"
            pcm = (rng.standard_normal(16000) * 1000).astype(np.int16)
            with open(chap / f"{utt}.flac", "wb") as ff:
                ff.write(encode_flac(pcm))
            f.write(f"{utt} {text}\n")

    manifest = str(tmp_path / "dev-clean.jsonl")
    n = write_manifest(str(tmp_path), "dev-clean", manifest)
    assert n == 2
    entries = [json.loads(l) for l in open(manifest)]
    assert entries[0]["text"] == "hello world"
    assert abs(entries[0]["duration"] - 1.0) < 0.01
    assert os.path.exists(entries[0]["audio_path"])

    # and the dataset can consume the manifest end-to-end (native decode)
    from velocity_asr_tpu import io as va_io

    if va_io.native_available():
        from velocity_asr_tpu.data import ASRDataset

        ds = ASRDataset(manifest)
        item = ds[0]
        assert item["mel_spectrogram"].shape[1] == 80


# ---------------------------------------------------------------------------
# TFLite edge artifact (reference README.md:11,263: the ONNX export runs on
# ORT CPU / browser WebGPU; the TPU-native equivalent runs outside JAX via
# TFLite/LiteRT)
# ---------------------------------------------------------------------------

tf = pytest.importorskip("tensorflow")


def test_tflite_export_parity(tmp_path, tiny):
    from velocity_asr_tpu.export import export_tflite, run_tflite

    model, params = tiny
    path = str(tmp_path / "m.tflite")
    export_tflite(model, params, path, input_shape=(1, 64, 80))
    assert os.path.getsize(path) > 0

    mel = np.random.default_rng(1).standard_normal((1, 64, 80)).astype(np.float32)
    live = np.asarray(va.forward(model, params, jnp.asarray(mel)))
    out = run_tflite(path, mel)
    assert out.shape == live.shape
    np.testing.assert_allclose(live, out, rtol=1e-4, atol=1e-4)


def test_tflite_dynamic_int8_smaller_and_close(tmp_path, tiny):
    from velocity_asr_tpu.export import export_tflite, run_tflite

    model, params = tiny
    fp32 = str(tmp_path / "fp32.tflite")
    int8 = str(tmp_path / "int8.tflite")
    export_tflite(model, params, fp32, input_shape=(1, 64, 80))
    export_tflite(model, params, int8, input_shape=(1, 64, 80), quantize="dynamic")
    assert os.path.getsize(int8) < os.path.getsize(fp32)

    mel = np.random.default_rng(2).standard_normal((1, 64, 80)).astype(np.float32)
    live = np.asarray(va.forward(model, params, jnp.asarray(mel)))
    out = run_tflite(int8, mel)
    # dynamic-range weights: argmax decisions should survive quantization
    assert np.abs(live - out).max() < 0.5
    match = (live.argmax(-1) == out.argmax(-1)).mean()
    assert match > 0.9


def test_calibrated_int8_package_roundtrip(tmp_path, tiny):
    """A calibrated package (quant_stats saved) must load back into a
    RUNNABLE static-int8 model: config flags on, stats restored, forward
    works with the stats threaded through."""
    import dataclasses

    from velocity_asr_tpu.export import load_int8_model
    from velocity_asr_tpu.quantize import calibrate_int8_model

    model, params = tiny
    rng = np.random.default_rng(5)
    calib = [jnp.asarray(rng.standard_normal((1, 64, 80)), jnp.float32)
             for _ in range(2)]
    int8_cfg = dataclasses.replace(
        model.config, int8_inference=True, int8_static=True
    )
    int8_model = va.create_model(int8_cfg)
    stats = calibrate_int8_model(int8_model, params, calib)

    path = str(tmp_path / "int8_cal")
    save_int8_checkpoint(path, model.config, params, quant_stats=stats)

    m2, p2, stats2 = load_int8_model(path)
    assert m2.config.int8_static and m2.config.int8_inference
    assert stats2 is not None
    mel = jnp.asarray(rng.standard_normal((1, 64, 80)), jnp.float32)
    out = np.asarray(va.forward(m2, p2, mel, quant_stats=stats2))
    assert np.isfinite(out).all()
    # and the uncalibrated loader path still returns a plain fp32 pair
    path2 = str(tmp_path / "int8_plain")
    save_int8_checkpoint(path2, model.config, params)
    m3, p3, stats3 = load_int8_model(path2)
    assert stats3 is None and not m3.config.int8_static
    out3 = np.asarray(va.forward(m3, p3, mel))
    assert np.isfinite(out3).all()


def test_export_normalizes_int8_flags(tmp_path, tiny):
    """Exporting a checkpoint whose config carries int8/QAT flags must
    not bake those layer variants into the serialized graph (they read a
    quant_stats collection the exported signature doesn't carry)."""
    import dataclasses

    model, params = tiny
    int8_model = va.create_model(dataclasses.replace(
        model.config, int8_inference=True, int8_static=True
    ))
    path = str(tmp_path / "m.stablehlo")
    export_stablehlo(int8_model, params, path, input_shape=(1, 64, 80))
    fn = load_exported(path)
    mel = np.zeros((1, 64, 80), np.float32)
    out = np.asarray(fn(jax.device_get(params), mel))
    assert out.shape[0] == 1 and np.isfinite(out).all()
