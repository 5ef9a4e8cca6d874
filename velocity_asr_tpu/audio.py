"""Audio front-end for VELOCITY-ASR TPU.

TPU-native rebuild of the reference audio pipeline
(`/root/reference/velocity_asr/audio.py:14-324`): framing + Hann window +
rFFT + HTK-mel filterbank + log + per-bin normalization, expressed as pure
JAX so the whole front-end jits onto the device (the reference computes mel
on host CPU before transfer, `scripts/transcribe.py:73-77`).

Numerical contract (verified against the reference implementation in
tests/test_audio.py):
  - constants: 16 kHz, n_fft=400 (25 ms), hop=160 (10 ms), 80 mels
    (reference audio.py:14-19)
  - reflect-pad n_fft//2 on both sides, STFT with center=False
    (reference audio.py:99-112)
  - periodic Hann window (torch.hann_window default)
  - power magnitude |X|^2 (reference audio.py:115)
  - HTK mel scale 2595*log10(1+hz/700), n_mels+2 points from 0 to Nyquist,
    triangular min/max slope filters (reference audio.py:146-199)
  - log(mel + 1e-10) (reference audio.py:129)
  - optional per-mel-bin normalization over the *time* axis with unbiased
    std (reference audio.py:132-135 normalizes dim=-1 of the (B, M, T)
    tensor, i.e. over time, with torch's default ddof=1)
"""

from __future__ import annotations

import functools
from typing import Union

import jax
import jax.numpy as jnp
import numpy as np

# Default audio parameters (reference audio.py:14-19).
SAMPLE_RATE = 16000
N_FFT = 400  # 25 ms at 16 kHz
HOP_LENGTH = 160  # 10 ms at 16 kHz
N_MELS = 80


def hann_window(n_fft: int = N_FFT, dtype=np.float32) -> np.ndarray:
    """Periodic Hann window, matching torch.hann_window(n_fft)."""
    n = np.arange(n_fft, dtype=np.float64)
    w = 0.5 * (1.0 - np.cos(2.0 * np.pi * n / n_fft))
    return w.astype(dtype)


def _hz_to_mel(hz: np.ndarray) -> np.ndarray:
    """HTK mel scale (reference audio.py:169-170)."""
    return 2595.0 * np.log10(1.0 + hz / 700.0)


def _mel_to_hz(mel: np.ndarray) -> np.ndarray:
    """Inverse HTK mel scale (reference audio.py:172-173)."""
    return 700.0 * (10.0 ** (mel / 2595.0) - 1.0)


@functools.lru_cache(maxsize=8)
def mel_filterbank(
    n_fft: int = N_FFT,
    n_mels: int = N_MELS,
    sample_rate: int = SAMPLE_RATE,
) -> np.ndarray:
    """Triangular HTK-mel filterbank, shape (n_mels, n_fft // 2 + 1).

    Matches the reference construction (audio.py:146-199): n_mels + 2
    mel-spaced points from 0 Hz to Nyquist; per-filter rising/falling
    slopes combined with min, clamped at zero; 1e-10 guards in the slope
    denominators.
    """
    n_freqs = n_fft // 2 + 1
    freqs = np.linspace(0.0, sample_rate / 2.0, n_freqs, dtype=np.float64)

    mel_min = _hz_to_mel(np.float64(0.0))
    mel_max = _hz_to_mel(np.float64(sample_rate / 2.0))
    mel_points = np.linspace(mel_min, mel_max, n_mels + 2)
    hz_points = _mel_to_hz(mel_points)

    lower = hz_points[:-2, None]  # (n_mels, 1)
    center = hz_points[1:-1, None]
    upper = hz_points[2:, None]

    lower_slope = (freqs[None, :] - lower) / (center - lower + 1e-10)
    upper_slope = (upper - freqs[None, :]) / (upper - center + 1e-10)
    fb = np.maximum(0.0, np.minimum(lower_slope, upper_slope)).astype(np.float32)
    # lru_cache hands the SAME array to every caller: freeze it so an
    # in-place mutation can't silently corrupt the shared entry.
    fb.setflags(write=False)
    return fb


def frame_count(num_samples: int, n_fft: int = N_FFT, hop_length: int = HOP_LENGTH) -> int:
    """Number of STFT frames produced by compute_mel_spectrogram.

    With reflect padding of n_fft//2 on each side and center=False
    framing: 1 + (num_samples + 2*(n_fft//2) - n_fft) // hop_length,
    which reduces to 1 + num_samples // hop_length for even n_fft.
    """
    return 1 + (num_samples + 2 * (n_fft // 2) - n_fft) // hop_length


def _frame_signal(audio: jnp.ndarray, n_fft: int, hop_length: int) -> jnp.ndarray:
    """Slice padded audio (..., S) into overlapping frames (..., T, n_fft).

    Implemented as hop-sized block slicing + concat (no gather): frame t is
    the concatenation of ceil(n_fft/hop) consecutive hop-blocks starting at
    block t — much faster on TPU than a (T, n_fft) gather.
    """
    num_samples = audio.shape[-1]
    num_frames = 1 + (num_samples - n_fft) // hop_length
    n_full, rem = divmod(n_fft, hop_length)
    # Blocks the slicing below reads, and the signal length rounded UP to
    # a whole number of hop-blocks (a hop-divisible n_fft with a
    # non-block-aligned signal needs padding up, never a negative pad).
    blocks_needed = num_frames + n_full - (0 if rem else 1) + (1 if rem else 0)
    target = max(blocks_needed, -(-num_samples // hop_length)) * hop_length
    pad = target - num_samples
    if pad > 0:
        audio = jnp.pad(audio, [(0, 0)] * (audio.ndim - 1) + [(0, pad)])
    nblocks = audio.shape[-1] // hop_length
    blocks = audio.reshape(audio.shape[:-1] + (nblocks, hop_length))
    parts = [blocks[..., t : t + num_frames, :] for t in range(n_full)]
    if rem:
        parts.append(blocks[..., n_full : n_full + num_frames, :rem])
    return jnp.concatenate(parts, axis=-1)


def compute_mel_spectrogram(
    audio: jnp.ndarray,
    sample_rate: int = SAMPLE_RATE,
    n_fft: int = N_FFT,
    hop_length: int = HOP_LENGTH,
    n_mels: int = N_MELS,
    normalize: bool = True,
    backend: str = "auto",
) -> jnp.ndarray:
    """Compute a log-mel spectrogram on device.

    Args:
        audio: waveform, shape (samples,) or (batch, samples), float32.
        normalize: per-mel-bin mean/std normalization over time
            (reference audio.py:132-135; std is unbiased / ddof=1).
        backend: "auto" (fused Pallas kernel on TPU — more accurate than
            the TPU rfft and as fast — XLA elsewhere), "pallas", or "xla".

    Returns:
        (frames, n_mels) or (batch, frames, n_mels), float32.
        frames = 1 + samples // hop_length.
    """
    if backend == "auto":
        backend = "pallas" if jax.default_backend() == "tpu" else "xla"
    if backend == "pallas":
        from .ops.mel_pallas import mel_spectrogram_pallas

        return mel_spectrogram_pallas(
            audio, sample_rate, n_fft, hop_length, n_mels, normalize
        )
    return _compute_mel_spectrogram_xla(
        audio, sample_rate, n_fft, hop_length, n_mels, normalize
    )


@functools.partial(
    jax.jit,
    static_argnames=("sample_rate", "n_fft", "hop_length", "n_mels", "normalize"),
)
def _compute_mel_spectrogram_xla(
    audio: jnp.ndarray,
    sample_rate: int = SAMPLE_RATE,
    n_fft: int = N_FFT,
    hop_length: int = HOP_LENGTH,
    n_mels: int = N_MELS,
    normalize: bool = True,
) -> jnp.ndarray:
    """XLA (jnp.fft.rfft) mel path; see compute_mel_spectrogram."""
    squeeze_output = audio.ndim == 1
    if squeeze_output:
        audio = audio[None, :]
    audio = audio.astype(jnp.float32)

    pad = n_fft // 2
    audio_padded = jnp.pad(audio, ((0, 0), (pad, pad)), mode="reflect")

    frames = _frame_signal(audio_padded, n_fft, hop_length)  # (B, T, n_fft)
    window = jnp.asarray(hann_window(n_fft))
    spec = jnp.fft.rfft(frames * window, n=n_fft, axis=-1)  # (B, T, n_freqs)
    power = jnp.real(spec) ** 2 + jnp.imag(spec) ** 2

    fb = jnp.asarray(mel_filterbank(n_fft, n_mels, sample_rate))  # (M, F)
    mel = jnp.einsum("mf,btf->btm", fb, power)
    mel = jnp.log(mel + 1e-10)

    if normalize:
        # Reference normalizes each mel bin over the time axis with torch's
        # default unbiased std (audio.py:132-135).
        mean = jnp.mean(mel, axis=-2, keepdims=True)
        var = jnp.var(mel, axis=-2, keepdims=True)
        t = mel.shape[-2]
        if t > 1:
            var = var * (t / (t - 1))
        mel = (mel - mean) / (jnp.sqrt(var) + 1e-10)

    if squeeze_output:
        mel = mel[0]
    return mel


def masked_normalize_mel(mel: jnp.ndarray, n_valid) -> jnp.ndarray:
    """Per-bin time normalization over the first n_valid frames only.

    Device-side equivalent of computing mel on the unpadded utterance and
    normalizing (reference audio.py:132-135, unbiased std): statistics
    exclude padding, and padded frames are zeroed (the batch pad value).
    n_valid may be a traced scalar (one length for the whole batch) or a
    (batch,) vector (per-item lengths — the serving micro-batch path), so
    one compiled graph serves every length within a bucket.
    """
    t = mel.shape[-2]
    n_valid = jnp.asarray(n_valid)
    if n_valid.ndim == 1:  # (batch,) -> (batch, 1, 1)
        n_valid = n_valid[:, None, None]
    valid = jnp.arange(t)[:, None] < n_valid  # (t, 1) or (batch, t, 1)
    n = jnp.maximum(n_valid, 1).astype(mel.dtype)
    mean = jnp.sum(jnp.where(valid, mel, 0.0), axis=-2, keepdims=True) / n
    var = jnp.sum(jnp.where(valid, (mel - mean) ** 2, 0.0), axis=-2, keepdims=True) / (
        jnp.maximum(n - 1.0, 1.0)
    )
    out = (mel - mean) / (jnp.sqrt(var) + 1e-10)
    return jnp.where(valid, out, 0.0)


def causal_normalize_mel(
    mel: jnp.ndarray, n_valid, chunk_frames: int
) -> jnp.ndarray:
    """Per-bin normalization with CAUSAL per-chunk statistics on device.

    Frame t in chunk c is normalized with the mean/unbiased-std of frames
    [0, min((c+1)*chunk_frames, n_valid)) — the statistics a live stream's
    running normalizer holds when chunk c is processed (streaming.py
    StreamingMel fed chunk-sized blocks). Used by the streaming-aware
    training objective so the model trains under the exact feature
    distribution the streaming runtime produces. Padded frames are zeroed.

    mel: (batch, t, mels) un-normalized log-mel; n_valid: (batch,) valid
    frame counts; t need not be a multiple of chunk_frames.
    """
    b, t, m = mel.shape
    n_valid = jnp.asarray(n_valid, jnp.int32).reshape(b, 1)
    valid = jnp.arange(t)[None, :, None] < n_valid[:, :, None]
    x = jnp.where(valid, mel.astype(jnp.float32), 0.0)
    cs = jnp.cumsum(x, axis=1)
    cs2 = jnp.cumsum(x * x, axis=1)
    chunk = jnp.arange(t, dtype=jnp.int32) // chunk_frames
    cutoff = jnp.minimum((chunk[None, :] + 1) * chunk_frames, n_valid)
    cutoff = jnp.maximum(cutoff, 1)  # (b, t)
    idx = jnp.broadcast_to((cutoff - 1)[:, :, None], (b, t, m))
    s = jnp.take_along_axis(cs, idx, axis=1)
    s2 = jnp.take_along_axis(cs2, idx, axis=1)
    n = cutoff[:, :, None].astype(jnp.float32)
    mean = s / n
    var = (s2 - n * mean * mean) / jnp.maximum(n - 1.0, 1.0)
    std = jnp.sqrt(jnp.maximum(var, 0.0))
    out = (mel - mean) / (std + 1e-10)
    return jnp.where(valid, out, 0.0)


def compute_mel_spectrogram_np(
    audio: np.ndarray,
    sample_rate: int = SAMPLE_RATE,
    n_fft: int = N_FFT,
    hop_length: int = HOP_LENGTH,
    n_mels: int = N_MELS,
    normalize: bool = True,
) -> np.ndarray:
    """Numpy mirror of compute_mel_spectrogram for the host data pipeline.

    The training data path computes mel per utterance *before* padding
    (the reference does the same in its Dataset __getitem__,
    data.py:124-142) because the per-bin time normalization depends on the
    utterance length; this host-side version avoids device round-trips in
    data-loader workers. Bit-compatible with the JAX version to ~1e-5.
    """
    squeeze_output = audio.ndim == 1
    if squeeze_output:
        audio = audio[None, :]
    audio = np.asarray(audio, np.float32)

    pad = n_fft // 2
    audio_padded = np.pad(audio, ((0, 0), (pad, pad)), mode="reflect")
    num_frames = 1 + (audio_padded.shape[-1] - n_fft) // hop_length
    idx = (
        np.arange(num_frames, dtype=np.int64)[:, None] * hop_length
        + np.arange(n_fft, dtype=np.int64)[None, :]
    )
    frames = audio_padded[:, idx] * hann_window(n_fft)
    spec = np.fft.rfft(frames, n=n_fft, axis=-1)
    power = (spec.real**2 + spec.imag**2).astype(np.float32)

    fb = mel_filterbank(n_fft, n_mels, sample_rate)
    mel = np.einsum("mf,btf->btm", fb, power)
    mel = np.log(mel + 1e-10)

    if normalize:
        mean = mel.mean(axis=-2, keepdims=True)
        std = mel.std(axis=-2, keepdims=True, ddof=1) if mel.shape[-2] > 1 else np.zeros_like(mean)
        mel = (mel - mean) / (std + 1e-10)

    if squeeze_output:
        mel = mel[0]
    return mel.astype(np.float32)


class MelSpectrogramTransform:
    """Callable wrapper bundling mel parameters (reference audio.py:202-261).

    The reference wraps mel computation in an nn.Module so it can be traced
    into the ONNX graph; here the function is already jittable, so this class
    only carries configuration.
    """

    def __init__(
        self,
        sample_rate: int = SAMPLE_RATE,
        n_fft: int = N_FFT,
        hop_length: int = HOP_LENGTH,
        n_mels: int = N_MELS,
        normalize: bool = True,
    ):
        self.sample_rate = sample_rate
        self.n_fft = n_fft
        self.hop_length = hop_length
        self.n_mels = n_mels
        self.normalize = normalize

    def __call__(self, audio: jnp.ndarray) -> jnp.ndarray:
        return compute_mel_spectrogram(
            audio,
            sample_rate=self.sample_rate,
            n_fft=self.n_fft,
            hop_length=self.hop_length,
            n_mels=self.n_mels,
            normalize=self.normalize,
        )


def audio_to_frames(
    audio_length: int,
    hop_length: int = HOP_LENGTH,
    n_fft: int = N_FFT,
) -> int:
    """Mel frame estimate from sample count (reference audio.py:264-280).

    Note: the reference helper returns (len + n_fft) // hop, which
    over-counts the actual STFT output by one frame for hop-aligned
    lengths; kept for API parity. Use frame_count() for the exact value.
    """
    return (audio_length + n_fft) // hop_length


def frames_to_audio(num_frames: int, hop_length: int = HOP_LENGTH) -> int:
    """Approximate sample count from frames (reference audio.py:283-297)."""
    return num_frames * hop_length


def pad_or_trim(
    audio: Union[np.ndarray, jnp.ndarray],
    target_length: int,
) -> Union[np.ndarray, jnp.ndarray]:
    """Pad with zeros or trim to target sample count (reference audio.py:300-324)."""
    xp = jnp if isinstance(audio, jnp.ndarray) else np
    current = audio.shape[-1]
    if current > target_length:
        return audio[..., :target_length]
    if current < target_length:
        pad_width = [(0, 0)] * (audio.ndim - 1) + [(0, target_length - current)]
        return xp.pad(audio, pad_width)
    return audio


def load_audio(
    path: str,
    sample_rate: int = SAMPLE_RATE,
    mono: bool = True,
) -> np.ndarray:
    """Load an audio file, downmix to mono, resample to target rate.

    Host-side replacement for the reference's torchaudio loader
    (audio.py:22-62). Decoding is handled by the native C++ decoder
    (WAV/FLAC) with a pure-Python WAV fallback; resampling uses a polyphase
    filter (scipy) when rates differ.
    """
    from .io import decode_audio_file

    waveform, sr = decode_audio_file(path)  # (channels, samples) float32

    if mono and waveform.shape[0] > 1:
        waveform = waveform.mean(axis=0, keepdims=True)

    if sr != sample_rate:
        from scipy.signal import resample_poly
        from math import gcd

        g = gcd(sr, sample_rate)
        waveform = resample_poly(waveform, sample_rate // g, sr // g, axis=-1).astype(
            np.float32
        )

    if mono:
        waveform = waveform[0]
    return np.ascontiguousarray(waveform, dtype=np.float32)
