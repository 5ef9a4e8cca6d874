"""Training-time augmentation.

The reference declares an `augmentation:` config stanza but never
implements it (reference configs/train.yaml:27-34, unread by any code).
Implemented here, all inside the jitted train step (sampled with the
step PRNG; zero host work): SpecAugment-style time/frequency masking on
the batched mel, white-noise injection on the waveform, and speed
perturbation as a fixed-shape on-device time warp.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp


@dataclass
class SpecAugmentConfig:
    """SpecAugment hyperparameters (LibriSpeech-style defaults).

    noise_injection and speed_perturb implement the reference's
    declared-but-unimplemented `augmentation` keys (reference
    configs/train.yaml:33-34); both run inside the jitted train step and
    therefore require device-mel batches (raw PCM on device):

      - noise_injection: white noise added to the waveform at a
        per-utterance SNR drawn from [noise_min_snr_db, noise_max_snr_db].
      - speed_perturb: sox-`speed`-style tempo+pitch warp by a factor
        drawn from [speed_min, speed_max], done the TPU way — a
        fixed-shape linear-interpolation gather keeps the batch's static
        width and only the valid-length bookkeeping changes (host-side
        rate resampling would produce dynamic lengths).
    """

    enabled: bool = False
    num_time_masks: int = 2
    time_mask_frames: int = 50  # max frames per mask
    num_freq_masks: int = 2
    freq_mask_bins: int = 15  # max mel bins per mask
    noise_injection: bool = False
    noise_min_snr_db: float = 10.0
    noise_max_snr_db: float = 40.0
    speed_perturb: bool = False
    speed_min: float = 0.9
    speed_max: float = 1.1


def spec_augment(
    mel: jnp.ndarray,
    rng: jax.Array,
    config: SpecAugmentConfig,
    input_lengths: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Apply time/frequency masking to (batch, T, n_mels) mel batches.

    Masked regions are set to 0 (the batch pad value). Time masks are
    sampled within each utterance's valid length when input_lengths is
    given.
    """
    batch, t_len, n_mels = mel.shape
    out = mel

    def sample_masks(key, count, max_width, limit, width_cap=None):
        """(batch, count) starts and widths; masks stay within [0, limit)."""
        k1, k2 = jax.random.split(key)
        widths = jax.random.randint(k1, (batch, count), 0, max_width + 1)
        if width_cap is not None:
            widths = jnp.minimum(widths, width_cap[:, None])
        widths = jnp.minimum(widths, limit[:, None])
        # SpecAugment: start ~ U[0, limit - width] inclusive, so the final
        # valid frame/bin is reachable and masks never spill past limit.
        max_start = jnp.maximum(limit[:, None] - widths + 1, 1)
        starts = jax.random.randint(k2, (batch, count), 0, 2**30) % max_start
        return starts, widths

    keys = jax.random.split(rng, 2)

    if config.num_time_masks > 0:
        limit = (
            input_lengths.astype(jnp.int32)
            if input_lengths is not None
            else jnp.full((batch,), t_len, jnp.int32)
        )
        # Cap each time mask at half the utterance so a single mask can
        # never silence a clip shorter than time_mask_frames while CTC
        # still demands the whole transcript (limit // 2 == 0 for 1-frame
        # clips: those are never time-masked). With >= 2 masks, joint
        # coverage remains possible — as in standard SpecAugment — and the
        # CTC loss's zero_infinity rule absorbs the infeasible example.
        starts, widths = sample_masks(
            keys[0],
            config.num_time_masks,
            config.time_mask_frames,
            limit,
            width_cap=limit // 2,
        )
        pos = jnp.arange(t_len)[None, :, None]  # (1, T, 1)
        masked = (pos >= starts[:, None, :]) & (pos < (starts + widths)[:, None, :])
        time_mask = jnp.any(masked, axis=-1)  # (batch, T)
        out = jnp.where(time_mask[:, :, None], 0.0, out)

    if config.num_freq_masks > 0:
        limit = jnp.full((batch,), n_mels, jnp.int32)
        starts, widths = sample_masks(
            keys[1], config.num_freq_masks, config.freq_mask_bins, limit
        )
        pos = jnp.arange(n_mels)[None, :, None]
        masked = (pos >= starts[:, None, :]) & (pos < (starts + widths)[:, None, :])
        freq_mask = jnp.any(masked, axis=-1)  # (batch, n_mels)
        out = jnp.where(freq_mask[:, None, :], 0.0, out)

    return out


def noise_inject(
    audio: jnp.ndarray,
    rng: jax.Array,
    config: SpecAugmentConfig,
    sample_lengths: jnp.ndarray,
) -> jnp.ndarray:
    """Add white noise to (batch, samples) waveforms at per-utterance SNR.

    SNR ~ U[noise_min_snr_db, noise_max_snr_db]; signal power is measured
    over each utterance's valid samples and noise is applied only there
    (padding stays untouched). Runs on device inside the train step.
    """
    batch, n = audio.shape
    k1, k2 = jax.random.split(rng)
    snr_db = jax.random.uniform(
        k1,
        (batch, 1),
        minval=config.noise_min_snr_db,
        maxval=config.noise_max_snr_db,
    )
    valid = jnp.arange(n)[None, :] < sample_lengths[:, None]
    denom = jnp.maximum(sample_lengths[:, None].astype(jnp.float32), 1.0)
    sig_pow = jnp.sum(jnp.where(valid, audio * audio, 0.0), axis=1, keepdims=True) / denom
    noise_pow = sig_pow * 10.0 ** (-snr_db / 10.0)
    noise = jax.random.normal(k2, audio.shape, audio.dtype) * jnp.sqrt(noise_pow)
    return jnp.where(valid, audio + noise, audio)


def speed_perturb_audio(
    audio: jnp.ndarray,
    rng: jax.Array,
    config: SpecAugmentConfig,
    input_lengths: jnp.ndarray,
    hop_length: int,
):
    """Per-utterance speed perturbation on (batch, samples) waveforms.

    The reference declares `augmentation.speed_perturb` but never reads it
    (reference configs/train.yaml:34). Classic implementations resample on
    the host, changing utterance length — which fights XLA's static
    shapes. Here each utterance is warped ON DEVICE by a factor
    f ~ U[speed_min, speed_max] with a fixed-shape linear-interpolation
    gather (out[t] = audio[t*f], sox `speed`: tempo and pitch shift
    together); the padded buffer keeps its static width and only the
    valid-length bookkeeping changes. Slow-down factors are clamped per
    utterance so the stretched signal still fits the buffer (f >= valid/S
    — only utterances already filling their padding bucket lose range).

    input_lengths are valid MEL frames (the collator's 1 + samples // hop
    rule); returns (warped audio, new input_lengths) under the same rule.
    """
    b, s = audio.shape
    f = jax.random.uniform(
        rng, (b, 1), minval=config.speed_min, maxval=config.speed_max
    )
    valid = ((input_lengths[:, None] - 1) * hop_length).astype(jnp.float32)
    f = jnp.maximum(f, valid / s)
    pos = jnp.arange(s, dtype=jnp.float32)[None, :] * f
    i0 = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, s - 1)
    i1 = jnp.minimum(i0 + 1, s - 1)
    w = pos - i0.astype(jnp.float32)
    out = (jnp.take_along_axis(audio, i0, axis=1) * (1.0 - w)
           + jnp.take_along_axis(audio, i1, axis=1) * w)
    new_valid = jnp.floor(valid / f).astype(jnp.int32)
    out = jnp.where(jnp.arange(s)[None, :] < new_valid, out, 0.0)
    new_lengths = new_valid[:, 0] // hop_length + 1
    return out, new_lengths
