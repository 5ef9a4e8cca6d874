"""Audio front-end golden tests against the reference (SURVEY.md §7 step 1)."""

import numpy as np
import pytest

from velocity_asr_tpu import audio


def test_constants():
    assert audio.SAMPLE_RATE == 16000
    assert audio.N_FFT == 400
    assert audio.HOP_LENGTH == 160
    assert audio.N_MELS == 80


def test_mel_shape():
    wav = np.random.default_rng(0).standard_normal(16000).astype(np.float32)
    mel = audio.compute_mel_spectrogram(wav)
    assert mel.shape == (1 + 16000 // 160, 80)

    batched = audio.compute_mel_spectrogram(np.stack([wav, wav]))
    assert batched.shape == (2, 1 + 16000 // 160, 80)
    np.testing.assert_allclose(batched[0], mel, rtol=1e-5, atol=1e-5)


def test_pad_or_trim():
    wav = np.ones(100, np.float32)
    assert audio.pad_or_trim(wav, 50).shape == (50,)
    out = audio.pad_or_trim(wav, 150)
    assert out.shape == (150,)
    assert out[100:].sum() == 0


def test_mel_matches_torch_reference(torch_reference):
    import torch

    rng = np.random.default_rng(1)
    wav = (rng.standard_normal(16000 * 2) * 0.1).astype(np.float32)

    ref = torch_reference.compute_mel_spectrogram(torch.from_numpy(wav)).numpy()
    ours = np.asarray(audio.compute_mel_spectrogram(wav))

    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-4)


def test_mel_unnormalized_matches_torch_reference(torch_reference):
    import torch

    rng = np.random.default_rng(2)
    wav = (rng.standard_normal(16000) * 0.1).astype(np.float32)

    ref = torch_reference.compute_mel_spectrogram(
        torch.from_numpy(wav), normalize=False
    ).numpy()
    ours = np.asarray(audio.compute_mel_spectrogram(wav, normalize=False))
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-4)


def test_filterbank_matches_torch_reference(torch_reference):
    import torch

    from velocity_asr_tpu.audio import mel_filterbank

    ref_fb = torch_reference.audio._create_mel_filterbank(
        n_fft=400, n_mels=80, sample_rate=16000, device=torch.device("cpu")
    ).numpy()
    # The reference builds the filterbank in fp32; ours uses fp64 then casts,
    # so edge bins can differ by ~1e-5.
    np.testing.assert_allclose(mel_filterbank(), ref_fb, rtol=1e-4, atol=1e-5)


def test_pallas_mel_matches_xla():
    from velocity_asr_tpu.ops.mel_pallas import mel_spectrogram_pallas

    rng = np.random.default_rng(6)
    wav = (rng.standard_normal(16000) * 0.2).astype(np.float32)
    ref = np.asarray(audio.compute_mel_spectrogram(wav, normalize=True))
    ours = np.asarray(mel_spectrogram_pallas(wav, normalize=True))
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-3)

    # batched + unnormalized
    wav2 = np.stack([wav, wav * 0.5])
    ref2 = np.asarray(audio.compute_mel_spectrogram(wav2, normalize=False))
    ours2 = np.asarray(mel_spectrogram_pallas(wav2, normalize=False))
    np.testing.assert_allclose(ours2, ref2, rtol=1e-3, atol=1e-3)


def test_masked_normalize_matches_unpadded():
    """The transcribe CLI's device-mel path (reflect-padded audio + masked
    normalization) reproduces the offline unpadded mel exactly."""
    from velocity_asr_tpu.audio import masked_normalize_mel
    import jax.numpy as jnp

    rng = np.random.default_rng(9)
    for n_samples in (16000, 15923):  # hop-aligned and not
        wav = (rng.standard_normal(n_samples) * 0.2).astype(np.float32)
        exact = audio.compute_mel_spectrogram_np(wav, normalize=True)
        n = exact.shape[0]

        # Transcriber padding scheme: bucket covers every sample,
        # reflect-padded tail.
        min_frames = 1 + -(-n_samples // 160)
        bucket = -(-min_frames // 100) * 100
        target = (bucket - 1) * 160
        padded = np.pad(wav, (0, target - n_samples), mode="reflect")

        raw = np.asarray(audio.compute_mel_spectrogram(padded, normalize=False))
        normed = np.asarray(masked_normalize_mel(jnp.asarray(raw), n))
        assert raw.shape[0] == bucket
        np.testing.assert_allclose(normed[:n], exact, atol=1e-3)
        assert np.abs(normed[n:]).max() == 0.0
