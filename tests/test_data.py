"""Data pipeline tests: manifest dataset, vocab rules, collator bucketing,
threaded loader, LibriSpeech directory reader."""

import json
import os
import wave

import numpy as np
import pytest

from velocity_asr_tpu.data import (
    ASRCollator,
    ASRDataset,
    DataLoader,
    LibriSpeechDataset,
    create_dataloader,
    cycle,
)


def write_wav(path, seconds=1.0, freq=440.0, sr=16000):
    t = np.arange(int(seconds * sr)) / sr
    sig = (0.3 * np.sin(2 * np.pi * freq * t)).astype(np.float32)
    pcm = (sig * 32767).astype("<i2")
    with wave.open(str(path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(pcm.tobytes())


@pytest.fixture
def manifest(tmp_path):
    entries = []
    for i, (dur, text) in enumerate(
        [(1.0, "hello"), (1.5, "abc bca"), (2.0, "the cat"), (0.2, "too short"), (40.0, "too long")]
    ):
        path = tmp_path / f"utt{i}.wav"
        # only write real audio for kept entries; 0.2s/40s get filtered by duration
        write_wav(path, seconds=min(dur, 2.0))
        entries.append({"audio_path": str(path), "text": text, "duration": dur})
    # one missing file
    entries.append({"audio_path": str(tmp_path / "missing.wav"), "text": "x", "duration": 1.0})
    mpath = tmp_path / "manifest.jsonl"
    with open(mpath, "w") as f:
        for e in entries:
            f.write(json.dumps(e) + "\n")
    return str(mpath)


def test_manifest_filtering_and_vocab(manifest):
    ds = ASRDataset(manifest)
    # 0.2s (< 0.5 min), 40s (> 30 max), and the missing file are dropped
    assert len(ds) == 3
    # vocab: specials then sorted corpus chars (reference data.py:86-105)
    assert ds.vocab["<blank>"] == 0 and ds.vocab["<unk>"] == 1 and ds.vocab["<pad>"] == 2
    chars = sorted(set("hello" + "abc bca" + "the cat"))
    for i, c in enumerate(chars):
        assert ds.vocab[c] == i + 3

    item = ds[0]
    assert item["mel_spectrogram"].shape[1] == 80
    assert item["mel_spectrogram"].shape[0] == item["input_lengths"]
    assert item["target_lengths"] == len("hello")


def test_unknown_char_maps_to_unk(manifest):
    ds = ASRDataset(manifest)
    assert ds.text_to_tokens("hz")[1] == ds.vocab["<unk>"] or "z" in ds.vocab


def test_collator_bucketing():
    items = [
        {
            "mel_spectrogram": np.ones((73, 80), np.float32),
            "targets": np.array([3, 4, 5], np.int32),
            "input_lengths": np.int32(73),
            "target_lengths": np.int32(3),
            "text": "abc",
        },
        {
            "mel_spectrogram": np.ones((120, 80), np.float32),
            "targets": np.array([4], np.int32),
            "input_lengths": np.int32(120),
            "target_lengths": np.int32(1),
            "text": "b",
        },
    ]
    out = ASRCollator(frame_bucket=100, target_bucket=32)(items)
    assert out["mel_spectrogram"].shape == (2, 200, 80)  # 120 -> 200
    assert out["targets"].shape == (2, 32)
    assert out["targets"][0, 3] == 2  # <pad>
    assert out["mel_spectrogram"][0, 73:].sum() == 0.0
    np.testing.assert_array_equal(out["input_lengths"], [73, 120])

    # reference-exact mode: pad to batch max
    out2 = ASRCollator(frame_bucket=1, target_bucket=1)(items)
    assert out2["mel_spectrogram"].shape == (2, 120, 80)
    assert out2["targets"].shape == (2, 3)


def test_dataloader_iteration(manifest):
    loader, ds = create_dataloader(manifest, batch_size=2, shuffle=False, num_workers=2)
    batches = list(loader)
    assert len(batches) == 2  # 3 items, batch 2, no drop (shuffle=False)
    assert batches[0]["mel_spectrogram"].shape[0] == 2
    assert batches[1]["mel_spectrogram"].shape[0] == 1
    assert len(batches[0]["texts"]) == 2

    # shuffled loader drops last incomplete batch (reference data.py:248)
    loader2, _ = create_dataloader(manifest, batch_size=2, shuffle=True, num_workers=2)
    assert len(list(loader2)) == 1


def test_cycle(manifest):
    loader, _ = create_dataloader(manifest, batch_size=2, shuffle=False, num_workers=1)
    it = cycle(loader)
    got = [next(it) for _ in range(5)]
    assert len(got) == 5


def test_librispeech_layout(tmp_path):
    # Build a fake LibriSpeech tree with WAVs (decoder-agnostic): the reader
    # globs *.flac, so name them .flac but write WAV bytes and decode via
    # the python fallback only if native decoder handles containers by
    # content. Instead: test the index construction with real .wav files by
    # symlinking trans entries to .flac names is fragile -> write the tree
    # with .flac names only if native decoder exists; otherwise just check
    # indexing raises cleanly for missing split.
    with pytest.raises(FileNotFoundError):
        LibriSpeechDataset(root=str(tmp_path), split="train-clean-100")


def test_librispeech_vocab_rules(tmp_path):
    # Vocab is fixed and independent of data; build via a minimal empty split.
    split_dir = tmp_path / "LibriSpeech" / "dev-clean"
    split_dir.mkdir(parents=True)
    ds = LibriSpeechDataset(root=str(tmp_path), split="dev-clean")
    assert len(ds) == 0
    assert len(ds.vocab) == 31  # 3 specials + " a-z'" (reference data.py:293-307)
    assert ds.vocab[" "] == 3 and ds.vocab["a"] == 4 and ds.vocab["'"] == 30
    assert ds.text_to_tokens("AB c") == [ds.vocab["a"], ds.vocab["b"], 3, ds.vocab["c"]]


def test_dataloader_propagates_item_errors():
    class BadDataset:
        def __len__(self):
            return 4

        def __getitem__(self, idx):
            if idx == 2:
                raise ValueError("corrupt file")
            return {
                "mel_spectrogram": np.zeros((10, 80), np.float32),
                "targets": np.array([3], np.int32),
                "input_lengths": np.int32(10),
                "target_lengths": np.int32(1),
                "text": "",
            }

    loader = DataLoader(BadDataset(), batch_size=2, shuffle=False, num_workers=2)
    with pytest.raises(RuntimeError, match="DataLoader worker failed"):
        for _ in loader:
            pass


def test_dataloader_early_break_does_not_hang(manifest):
    loader, _ = create_dataloader(manifest, batch_size=1, shuffle=False, num_workers=1)
    for batch in loader:
        break  # abandon the iterator with batches still queued
    # a second full iteration still works (no leaked blocked producer)
    assert len(list(loader)) == 3


def test_librispeech_device_mel_items(tmp_path):
    """LibriSpeech items can ship raw audio for the device-mel train path
    (the train_splits config is the multi-chip DP story; mel must be able
    to move on device there too)."""
    from velocity_asr_tpu.io import native_available

    if not native_available():
        pytest.skip("native FLAC decoder not built")
    from tests.flac_encoder import encode_flac

    chap = tmp_path / "LibriSpeech" / "dev-clean" / "19" / "198"
    chap.mkdir(parents=True)
    rng = np.random.default_rng(0)
    with open(chap / "19-198.trans.txt", "w") as f:
        pcm = (rng.standard_normal(8000) * 3000).astype("<i2")
        with open(chap / "19-198-0000.flac", "wb") as ff:
            ff.write(encode_flac(pcm))
        f.write("19-198-0000 HELLO\n")

    host = LibriSpeechDataset(root=str(tmp_path), split="dev-clean")
    dev = LibriSpeechDataset(root=str(tmp_path), split="dev-clean", device_mel=True)
    h, d = host[0], dev[0]
    assert "mel_spectrogram" in h and "audio" in d
    assert d["audio"].dtype == np.float32
    # Same frame count contract as ASRDataset's device_mel branch.
    assert int(d["input_lengths"]) == 1 + len(d["audio"]) // 160
    np.testing.assert_array_equal(h["targets"], d["targets"])

    collated = ASRCollator(frame_bucket=50)([dev[0]])
    assert collated["audio"].dtype == np.int16
