"""Evaluate CLI tests: the WER/CER benchmark path decodes on device
(tokens-only host transfer) and returns sane metrics for greedy and beam.

Covers the path the reference stubbed (scripts/evaluate.py:41-57) —
implemented here with the transcribe/serve device-decode pattern.
"""

import json
import sys
import wave

import numpy as np
import pytest


def _write_wav(path, seconds=1.0, freq=440.0, sr=16000):
    t = np.arange(int(seconds * sr)) / sr
    sig = (0.3 * np.sin(2 * np.pi * freq * t)).astype(np.float32)
    pcm = (sig * 32767).astype("<i2")
    with wave.open(str(path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(pcm.tobytes())


@pytest.fixture(scope="module")
def checkpoint_and_manifest(tmp_path_factory):
    import jax

    from velocity_asr_tpu.decode import create_default_vocabulary
    from velocity_asr_tpu.models.config import VelocityASRConfig
    from velocity_asr_tpu.models.model import create_model, init_params, save_pretrained

    tmp = tmp_path_factory.mktemp("evalcli")
    cfg = VelocityASRConfig(
        d_model=32, ssm_layers=1, ssm_state_dim=8, global_ssm_layers=1,
        global_ssm_state_dim=4, attention_heads=2, attention_dim=8,
        vocab_size=32, dropout=0.0,
    )
    model = create_model(cfg)
    params = init_params(model, jax.random.PRNGKey(0), example_frames=8)
    ckpt = tmp / "ckpt"
    save_pretrained(str(ckpt), cfg, params)
    vocab = create_default_vocabulary(cfg.vocab_size)
    with open(ckpt / "vocabulary.json", "w") as f:
        json.dump(vocab, f)

    entries = []
    for i in range(5):
        path = tmp / f"utt{i}.wav"
        _write_wav(path, seconds=1.0 + 0.3 * i, freq=300.0 + 100 * i)
        entries.append(
            {"audio_path": str(path), "text": "hello world", "duration": 1.0 + 0.3 * i}
        )
    manifest = tmp / "manifest.jsonl"
    with open(manifest, "w") as f:
        for e in entries:
            f.write(json.dumps(e) + "\n")
    return str(ckpt), str(manifest)


def _run_evaluate(argv):
    from scripts.evaluate import main

    old = sys.argv
    sys.argv = ["evaluate.py"] + argv
    try:
        return main()
    finally:
        sys.argv = old


def test_benchmark_greedy(checkpoint_and_manifest, tmp_path):
    ckpt, manifest = checkpoint_and_manifest
    out = tmp_path / "results.json"
    res = _run_evaluate(
        ["--checkpoint", ckpt, "--test-set", manifest, "--batch-size", "4",
         "--output", str(out)]
    )
    assert res["wer"] >= 0.0 and res["cer"] >= 0.0
    with open(out) as f:
        payload = json.load(f)
    assert payload["utterances"] == 5
    assert len(payload["results"]) == 5
    # untrained model on tones: predictions exist as strings
    assert all(isinstance(r["prediction"], str) for r in payload["results"])


def test_benchmark_beam_matches_shape(checkpoint_and_manifest):
    ckpt, manifest = checkpoint_and_manifest
    res = _run_evaluate(
        ["--checkpoint", ckpt, "--test-set", manifest, "--batch-size", "8",
         "--beam-width", "4"]
    )
    assert "wer" in res and "cer" in res and res["rtf"] > 0


def test_streaming_flag_combos_rejected(checkpoint_and_manifest):
    ckpt, manifest = checkpoint_and_manifest
    with pytest.raises(SystemExit):
        _run_evaluate(["--checkpoint", ckpt, "--test-set", manifest,
                       "--streaming", "--int8-static"])
    # beam (+LM) with --streaming is SUPPORTED since r4 (chunk-carried
    # beam); what stays rejected is the per-batch oracle-hotword mode
    # (it needs the offline batched beam) and LM without a beam.
    with pytest.raises(SystemExit):
        _run_evaluate(["--checkpoint", ckpt, "--test-set", manifest,
                       "--streaming", "--hotwords-oracle",
                       "--beam-width", "4"])
    with pytest.raises(SystemExit):
        _run_evaluate(["--checkpoint", ckpt, "--test-set", manifest,
                       "--streaming", "--lm", "nonexistent.json.gz"])


def test_streaming_on_manifest(checkpoint_and_manifest):
    ckpt, manifest = checkpoint_and_manifest
    res = _run_evaluate(
        ["--checkpoint", ckpt, "--test-set", manifest, "--batch-size", "4",
         "--streaming", "--chunk-seconds", "0.5"]
    )
    assert res["wer"] >= 0.0 and res["rtf"] > 0


def test_streaming_on_librispeech_layout(checkpoint_and_manifest, tmp_path):
    """evaluate --streaming accepts LibriSpeech-layout test sets (VERDICT
    r2 item 9: the manifest-only assert is gone)."""
    from velocity_asr_tpu.io import native_available

    if not native_available():
        pytest.skip("native FLAC decoder not built")
    from tests.flac_encoder import encode_flac

    ckpt, _ = checkpoint_and_manifest
    chap = tmp_path / "LibriSpeech" / "dev-clean" / "19" / "198"
    chap.mkdir(parents=True)
    rng = np.random.default_rng(0)
    with open(chap / "19-198.trans.txt", "w") as f:
        for i in range(3):
            pcm = (rng.standard_normal(16000 + 4000 * i) * 3000).astype("<i2")
            with open(chap / f"19-198-{i:04d}.flac", "wb") as ff:
                ff.write(encode_flac(pcm))
            f.write(f"19-198-{i:04d} HELLO WORLD {i}\n")
    res = _run_evaluate(
        ["--checkpoint", ckpt, "--test-set", "dev-clean",
         "--librispeech-root", str(tmp_path), "--batch-size", "2",
         "--streaming", "--chunk-seconds", "0.5"]
    )
    assert res["wer"] >= 0.0 and res["rtf"] > 0


def test_hotword_flag_combos_rejected(checkpoint_and_manifest):
    ckpt, manifest = checkpoint_and_manifest
    with pytest.raises(SystemExit):  # hotwords need a beam
        _run_evaluate(["--checkpoint", ckpt, "--test-set", manifest,
                       "--hotwords", "hello"])
    with pytest.raises(SystemExit):  # oracle and explicit list conflict
        _run_evaluate(["--checkpoint", ckpt, "--test-set", manifest,
                       "--beam-width", "4", "--hotwords", "hello",
                       "--hotwords-oracle"])


def test_benchmark_hotwords_modes_run(checkpoint_and_manifest):
    """--hotwords and --hotwords-oracle drive the n-best rescoring path
    end-to-end (untrained model: just pin the machinery works)."""
    ckpt, manifest = checkpoint_and_manifest
    res = _run_evaluate(
        ["--checkpoint", ckpt, "--test-set", manifest, "--batch-size", "8",
         "--beam-width", "4", "--hotwords", "hello,world"]
    )
    assert "wer" in res and res["rtf"] > 0
    res2 = _run_evaluate(
        ["--checkpoint", ckpt, "--test-set", manifest, "--batch-size", "8",
         "--beam-width", "4", "--hotwords-oracle"]
    )
    assert "wer" in res2


# ----- language identification (--identify-language) ---------------------------


@pytest.fixture(scope="module")
def ml_checkpoint_and_manifest(tmp_path_factory):
    """Tiny multilingual checkpoint (LID head) + labeled manifest."""
    import jax

    from velocity_asr_tpu.decode import create_default_vocabulary
    from velocity_asr_tpu.models.config import VelocityASRConfig
    from velocity_asr_tpu.models.model import (
        create_model, init_params, save_pretrained,
    )

    tmp = tmp_path_factory.mktemp("evalcli_ml")
    cfg = VelocityASRConfig(
        d_model=32, ssm_layers=1, ssm_state_dim=8, global_ssm_layers=1,
        global_ssm_state_dim=4, attention_heads=2, attention_dim=8,
        vocab_size=32, dropout=0.0, num_languages=3,
    )
    model = create_model(cfg)
    params = init_params(model, jax.random.PRNGKey(0), example_frames=8)
    ckpt = tmp / "ckpt"
    save_pretrained(str(ckpt), cfg, params)
    with open(ckpt / "vocabulary.json", "w") as f:
        json.dump(create_default_vocabulary(cfg.vocab_size), f)

    entries = []
    for i in range(4):
        path = tmp / f"utt{i}.wav"
        _write_wav(path, seconds=1.0 + 0.2 * i, freq=300.0 + 80 * i)
        entries.append(
            {"audio_path": str(path), "text": "hello", "duration": 1.0 + 0.2 * i,
             "language": i % 3}
        )
    manifest = tmp / "manifest.jsonl"
    with open(manifest, "w") as f:
        for e in entries:
            f.write(json.dumps(e) + "\n")
    return str(ckpt), str(manifest)


def test_identify_language_benchmark(ml_checkpoint_and_manifest, tmp_path):
    """--identify-language reports overall accuracy, per-language recall/WER,
    and per-result predictions in the output payload."""
    ckpt, manifest = ml_checkpoint_and_manifest
    out = tmp_path / "lid.json"
    res = _run_evaluate(
        ["--checkpoint", ckpt, "--test-set", manifest, "--batch-size", "2",
         "--identify-language", "--output", str(out)]
    )
    assert 0.0 <= res["lid_accuracy"] <= 1.0
    with open(out) as f:
        payload = json.load(f)
    lid = payload["lid"]
    assert set(lid["per_language"]) == {"0", "1", "2"}
    assert sum(v["utterances"] for v in lid["per_language"].values()) == 4
    for rec in payload["results"]:
        assert rec["language"] in (0, 1, 2)
        assert 0 <= rec["language_pred"] < 3


def test_identify_language_requires_head(checkpoint_and_manifest):
    """A LID-less checkpoint fails fast, not mid-eval."""
    ckpt, manifest = checkpoint_and_manifest
    with pytest.raises(SystemExit):
        _run_evaluate(["--checkpoint", ckpt, "--test-set", manifest,
                       "--identify-language"])


def test_identify_language_requires_labels(ml_checkpoint_and_manifest,
                                           checkpoint_and_manifest):
    """A manifest without 'language' rows errors with the regenerate hint."""
    ml_ckpt, _ = ml_checkpoint_and_manifest
    _, unlabeled_manifest = checkpoint_and_manifest
    with pytest.raises(SystemExit):
        _run_evaluate(["--checkpoint", ml_ckpt, "--test-set",
                       unlabeled_manifest, "--identify-language"])


def test_identify_language_streaming_rejected(ml_checkpoint_and_manifest):
    ml_ckpt, ml_manifest = ml_checkpoint_and_manifest
    with pytest.raises(SystemExit):
        _run_evaluate(["--checkpoint", ml_ckpt, "--test-set", ml_manifest,
                       "--identify-language", "--streaming"])


def test_transcriber_language_probs(ml_checkpoint_and_manifest):
    """Transcriber.language_probs returns a normalized posterior; the
    head-less model raises."""
    import jax

    from velocity_asr_tpu.decode import CTCDecoder, create_default_vocabulary
    from velocity_asr_tpu.models.model import from_pretrained
    from scripts.transcribe import Transcriber

    ml_ckpt, _ = ml_checkpoint_and_manifest
    model, params = from_pretrained(ml_ckpt)
    dec = CTCDecoder(create_default_vocabulary(model.config.vocab_size))
    tr = Transcriber(model, params, dec)
    rng = np.random.default_rng(0)
    audio = (rng.standard_normal(16000) * 0.1).astype(np.float32)
    probs = tr.language_probs(audio)
    assert probs.shape == (3,)
    assert abs(float(probs.sum()) - 1.0) < 1e-4
    res = tr.transcribe_array(audio, identify_language=True)
    assert res["language"] == int(np.argmax(probs))
    assert len(res["language_probs"]) == 3
