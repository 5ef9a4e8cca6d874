"""Ogg Vorbis decoder tests: the from-scratch Vorbis I decoder
(native/vorbis_decoder.cc) against libvorbisfile golden PCM on
libvorbisenc-encoded fixtures, plus wiring through io.decode_audio_file
and the audio loader.

Parity target: the reference decodes ogg via torchaudio (reference
velocity_asr/audio.py:39-56); here the native decoder handles it
directly. Unlike mp3 there is no gapless-trim asymmetry: Vorbis streams
carry their exact length in the final granule position, so both decoders
must agree on every sample and on the total count (measured relative
RMS ~1.3e-07, the float32 rounding floor)."""

import os

import numpy as np
import pytest

from velocity_asr_tpu import io as va_io
from tests.vorbis_codec import (
    encoder_available,
    vorbis_encode,
    vorbisfile_available,
    vorbisfile_decode,
)

needs_native = pytest.mark.skipif(
    not va_io.native_available(), reason="native decoder not built"
)
needs_enc = pytest.mark.skipif(
    not encoder_available(), reason="no libvorbisenc"
)
needs_vfile = pytest.mark.skipif(
    not vorbisfile_available(), reason="no libvorbisfile"
)


def tone_noise(n, rate, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(n) / rate
    x = (0.3 * np.sin(2 * np.pi * 440 * t)
         + 0.2 * np.sin(2 * np.pi * 1873 * t)
         + 0.05 * rng.standard_normal(n))
    return np.clip(x, -0.95, 0.95).astype(np.float32)


def click_noise(n, rate, seed=2):
    """Low noise + periodic transients: forces long/short window
    switching (the encoder emits short blocks at each attack)."""
    rng = np.random.default_rng(seed)
    x = 0.01 * rng.standard_normal(n)
    for s in range(9000, n - 3000, 5000):
        k = min(150, n - s)
        x[s:s + k] += (np.sin(2 * np.pi * 2500 * np.arange(k) / rate)
                       * np.hanning(k) * 0.8)
    return x.astype(np.float32)


def _golden_compare(tmp_path, x, rate, quality, max_rel_rms=1e-4):
    data = vorbis_encode(x, rate, quality=quality)
    path = str(tmp_path / "fixture.ogg")
    with open(path, "wb") as f:
        f.write(data)
    ref, rref = vorbisfile_decode(data)
    got, rgot = va_io.decode_audio_file(path)
    mine = got.T  # io gives (ch, n); golden gives (n, ch)
    assert rref == rgot
    assert ref.shape == mine.shape, (ref.shape, mine.shape)
    num = np.sqrt(np.mean((ref - mine) ** 2))
    den = np.sqrt(np.mean(ref ** 2)) + 1e-12
    assert num / den < max_rel_rms, num / den


@needs_native
@needs_enc
@needs_vfile
@pytest.mark.parametrize("rate", [16000, 22050, 44100])
@pytest.mark.parametrize("quality", [-0.1, 0.4, 1.0])
def test_golden_mono(tmp_path, rate, quality):
    _golden_compare(tmp_path, tone_noise(rate * 3, rate), rate, quality)


@needs_native
@needs_enc
@needs_vfile
@pytest.mark.parametrize("rate", [16000, 44100])
def test_golden_window_switching(tmp_path, rate):
    """Transient content exercises short blocks and the long/short
    window transition slopes."""
    _golden_compare(tmp_path, click_noise(rate * 3, rate), rate, 0.4)


@needs_native
@needs_enc
@needs_vfile
@pytest.mark.parametrize("quality", [-0.1, 0.4, 1.0])
def test_golden_stereo_coupling(tmp_path, quality):
    """Stereo exercises square-polar coupling + residue type 2
    interleave at every quality's mode setup."""
    rate = 44100
    x = np.stack(
        [tone_noise(rate * 2, rate, 1), click_noise(rate * 2, rate, 3)], 1
    )
    _golden_compare(tmp_path, x, rate, quality)


@needs_native
@needs_enc
@needs_vfile
def test_golden_short_stream(tmp_path):
    """A stream shorter than one long block: end-trim via the final
    granule position must produce the exact sample count."""
    rate = 16000
    _golden_compare(tmp_path, tone_noise(700, rate), rate, 0.4)


@needs_native
@needs_enc
def test_sniffing_extensionless(tmp_path):
    """Serve receives raw bodies with no extension: magic-byte dispatch."""
    rate = 16000
    x = tone_noise(rate, rate)
    path = str(tmp_path / "noext")
    with open(path, "wb") as f:
        f.write(vorbis_encode(x, rate, quality=0.4))
    got, rgot = va_io.decode_audio_file(path)
    assert rgot == rate
    assert got.shape[0] == 1 and got.shape[1] > 0


@needs_native
def test_exts_advertised():
    assert ".ogg" in va_io.supported_audio_exts()
    assert ".oga" in va_io.supported_audio_exts()


@needs_native
def test_corrupt_ogg_rejected(tmp_path):
    path = str(tmp_path / "bad.ogg")
    with open(path, "wb") as f:
        f.write(b"OggS" + os.urandom(400))
    with pytest.raises(ValueError):
        va_io.decode_audio_file(path)


@needs_native
@needs_enc
def test_loader_end_to_end(tmp_path):
    """An .ogg utterance flows through the audio loader (decode +
    downmix + resample to 16 kHz) like wav/flac/mp3 do."""
    from velocity_asr_tpu.audio import SAMPLE_RATE, load_audio

    rate = 44100
    x = np.stack(
        [tone_noise(rate * 2, rate, 5), tone_noise(rate * 2, rate, 6)], 1
    )
    path = str(tmp_path / "utt.ogg")
    with open(path, "wb") as f:
        f.write(vorbis_encode(x, rate, quality=0.4))
    wave = load_audio(path)
    wave = np.asarray(wave)
    assert wave.ndim == 1
    expected = 2 * SAMPLE_RATE
    assert abs(wave.shape[0] - expected) <= SAMPLE_RATE // 100
    assert np.abs(wave).max() > 0.05
