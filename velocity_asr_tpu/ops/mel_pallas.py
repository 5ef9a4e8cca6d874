"""Fused Pallas mel-spectrogram kernel.

Computes window + DFT + power + mel filterbank + log in one VMEM-resident
kernel over pre-framed audio (the BASELINE north-star's "fused Pallas
framing/STFT/mel kernel"; replaces the reference's torch.stft native path,
reference audio.py:104-126).

The DFT is expressed as two MXU matmuls against precomputed
window-folded cosine/sine matrices: for a 400-point rFFT that is
~0.16 MFLOP per frame — ideal MXU shape, and the (T, 201) power spectrum
never round-trips to HBM.

All matrices are zero-padded to lane-aligned sizes (n_fft 400->512,
n_freq 201->256, n_mels 80->128); the zero rows/columns contribute
nothing. Per-bin time normalization is global over the utterance and is
applied by the caller in XLA.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..audio import (
    HOP_LENGTH,
    N_FFT,
    N_MELS,
    SAMPLE_RATE,
    _frame_signal,
    frame_count,
    hann_window,
    mel_filterbank,
)

FRAME_BLOCK = 128


def _round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


@functools.lru_cache(maxsize=4)
def _dft_mel_matrices(n_fft: int, n_mels: int, sample_rate: int):
    """Window-folded DFT real/imag matrices and transposed mel filterbank,
    zero-padded to lane-aligned shapes."""
    n_freq = n_fft // 2 + 1
    k = np.arange(n_fft)[:, None]
    f = np.arange(n_freq)[None, :]
    ang = 2.0 * np.pi * k * f / n_fft
    w = hann_window(n_fft).astype(np.float64)[:, None]
    real = (w * np.cos(ang)).astype(np.float32)
    imag = (-w * np.sin(ang)).astype(np.float32)

    fb = mel_filterbank(n_fft, n_mels, sample_rate)  # (n_mels, n_freq)

    n_fft_p = _round_up(n_fft, 128)
    n_freq_p = _round_up(n_freq, 128)
    n_mels_p = _round_up(n_mels, 128)

    real_p = np.zeros((n_fft_p, n_freq_p), np.float32)
    imag_p = np.zeros((n_fft_p, n_freq_p), np.float32)
    real_p[:n_fft, :n_freq] = real
    imag_p[:n_fft, :n_freq] = imag
    fbt_p = np.zeros((n_freq_p, n_mels_p), np.float32)
    fbt_p[:n_freq, :n_mels] = fb.T
    return real_p, imag_p, fbt_p


def _mel_kernel(frames_ref, real_ref, imag_ref, fbt_ref, out_ref):
    """(1, FRAME_BLOCK, n_fft_p) frames -> (1, FRAME_BLOCK, n_mels_p) log-mel."""
    hi = jax.lax.Precision.HIGHEST  # full-precision MXU passes for the DFT
    frames = frames_ref[0]  # (T_b, n_fft_p)
    re = jnp.dot(frames, real_ref[:], preferred_element_type=jnp.float32, precision=hi)
    im = jnp.dot(frames, imag_ref[:], preferred_element_type=jnp.float32, precision=hi)
    power = re * re + im * im  # (T_b, n_freq_p)
    mel = jnp.dot(power, fbt_ref[:], preferred_element_type=jnp.float32, precision=hi)
    out_ref[0] = jnp.log(mel + 1e-10)


def mel_spectrogram_pallas(
    audio: jnp.ndarray,
    sample_rate: int = SAMPLE_RATE,
    n_fft: int = N_FFT,
    hop_length: int = HOP_LENGTH,
    n_mels: int = N_MELS,
    normalize: bool = True,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Log-mel spectrogram via the fused Pallas kernel.

    Same contract as audio.compute_mel_spectrogram (reference
    audio.py:65-143): reflect pad n_fft//2, center=False framing, power
    spectrum, HTK mel, log, optional per-bin unbiased normalization over
    time. Jitted (like the XLA path): the ~1 MB constant DFT/mel
    matrices live on device instead of re-uploading per call, and the
    surrounding pad/frame/normalize ops fuse.
    """
    return _mel_spectrogram_pallas_jit(
        audio, sample_rate, n_fft, hop_length, n_mels, normalize, interpret
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "sample_rate", "n_fft", "hop_length", "n_mels", "normalize",
        "interpret",
    ),
)
def _mel_spectrogram_pallas_jit(
    audio: jnp.ndarray,
    sample_rate: int,
    n_fft: int,
    hop_length: int,
    n_mels: int,
    normalize: bool,
    interpret: bool | None,
) -> jnp.ndarray:
    squeeze = audio.ndim == 1
    if squeeze:
        audio = audio[None]
    audio = audio.astype(jnp.float32)
    batch = audio.shape[0]

    pad = n_fft // 2
    padded = jnp.pad(audio, ((0, 0), (pad, pad)), mode="reflect")
    num_frames = frame_count(audio.shape[-1], n_fft, hop_length)

    # Frame in XLA (overlapping windows aren't expressible as pallas blocks),
    # zero-padded to the lane-aligned kernel shapes.
    t_pad = _round_up(num_frames, FRAME_BLOCK)
    real_p, imag_p, fbt_p = _dft_mel_matrices(n_fft, n_mels, sample_rate)
    n_fft_p = real_p.shape[0]
    n_mels_p = fbt_p.shape[1]

    frames = _frame_signal(padded, n_fft, hop_length)  # (B, T, n_fft)
    frames = jnp.pad(
        frames, ((0, 0), (0, t_pad - num_frames), (0, n_fft_p - n_fft))
    )

    grid = (batch, t_pad // FRAME_BLOCK)
    out = pl.pallas_call(
        _mel_kernel,
        out_shape=jax.ShapeDtypeStruct((batch, t_pad, n_mels_p), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, FRAME_BLOCK, n_fft_p), lambda b, t: (b, t, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((n_fft_p, real_p.shape[1]), lambda b, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_fft_p, imag_p.shape[1]), lambda b, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(fbt_p.shape, lambda b, t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, FRAME_BLOCK, n_mels_p), lambda b, t: (b, t, 0), memory_space=pltpu.VMEM
        ),
        interpret=(jax.default_backend() != "tpu") if interpret is None else interpret,
    )(frames, jnp.asarray(real_p), jnp.asarray(imag_p), jnp.asarray(fbt_p))

    mel = out[:, :num_frames, :n_mels]

    if normalize:
        mean = jnp.mean(mel, axis=-2, keepdims=True)
        var = jnp.var(mel, axis=-2, keepdims=True)
        t = mel.shape[-2]
        if t > 1:
            var = var * (t / (t - 1))
        mel = (mel - mean) / (jnp.sqrt(var) + 1e-10)

    if squeeze:
        mel = mel[0]
    return mel
