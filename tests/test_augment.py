"""SpecAugment tests."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from velocity_asr_tpu.augment import SpecAugmentConfig, spec_augment


def test_spec_augment_masks_and_preserves_shape():
    cfg = SpecAugmentConfig(enabled=True, num_time_masks=2, time_mask_frames=10,
                            num_freq_masks=2, freq_mask_bins=8)
    mel = jnp.ones((3, 100, 80))
    lengths = jnp.array([100, 60, 30], jnp.int32)
    out = spec_augment(mel, jax.random.PRNGKey(0), cfg, lengths)
    assert out.shape == mel.shape
    # something was masked
    assert float(jnp.sum(out == 0.0)) > 0
    # unmasked values untouched
    assert float(jnp.max(out)) == 1.0


def test_spec_augment_time_masks_within_length():
    cfg = SpecAugmentConfig(enabled=True, num_time_masks=4, time_mask_frames=20,
                            num_freq_masks=0)
    mel = jnp.ones((2, 200, 16))
    lengths = jnp.array([50, 200], jnp.int32)
    for seed in range(5):
        out = np.asarray(spec_augment(mel, jax.random.PRNGKey(seed), cfg, lengths))
        # time masks for item 0 stay entirely within [0, 50)
        fully_masked = np.all(out[0] == 0.0, axis=-1)
        assert not fully_masked[50:].any()


def test_spec_augment_short_utterance_never_fully_silenced():
    # A clip shorter than time_mask_frames: per-mask width is capped at
    # limit // 2, so a single mask can never zero the whole valid region.
    cfg = SpecAugmentConfig(enabled=True, num_time_masks=1, time_mask_frames=50,
                            num_freq_masks=0)
    mel = jnp.ones((1, 60, 8))
    lengths = jnp.array([20], jnp.int32)
    for seed in range(30):
        out = np.asarray(spec_augment(mel, jax.random.PRNGKey(seed), cfg, lengths))
        valid = out[0, :20]
        assert np.any(valid != 0.0), f"seed {seed} silenced the whole clip"


def test_spec_augment_last_bin_reachable():
    # SpecAugment samples start in [0, limit - width] inclusive: the final
    # frequency bin must be maskable (regression for an off-by-one that
    # made bin n_mels-1 unreachable forever).
    cfg = SpecAugmentConfig(enabled=True, num_time_masks=0,
                            num_freq_masks=1, freq_mask_bins=8)
    mel = jnp.ones((4, 30, 8))
    hit_last = False
    for seed in range(20):
        out = np.asarray(spec_augment(mel, jax.random.PRNGKey(seed), cfg))
        if np.any(np.all(out[:, :, -1] == 0.0, axis=1)):
            hit_last = True
            break
    assert hit_last, "frequency mask never reached the last mel bin"


def test_spec_augment_deterministic_per_key():
    cfg = SpecAugmentConfig(enabled=True)
    mel = jnp.ones((1, 80, 80))
    a = spec_augment(mel, jax.random.PRNGKey(1), cfg)
    b = spec_augment(mel, jax.random.PRNGKey(1), cfg)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    c = spec_augment(mel, jax.random.PRNGKey(2), cfg)
    assert not np.array_equal(np.asarray(a), np.asarray(c))


def test_trainer_with_augment_and_metrics(tmp_path):
    import velocity_asr_tpu as va
    from velocity_asr_tpu.training import Trainer, TrainingConfig

    cfg = va.VelocityASRConfig(
        d_model=16, ssm_layers=1, ssm_state_dim=4, global_ssm_layers=1,
        global_ssm_state_dim=4, attention_heads=2, attention_dim=8,
        vocab_size=12, dropout=0.0,
    )
    model = va.create_model(cfg)
    rng = np.random.default_rng(0)
    batch = {
        "mel_spectrogram": rng.standard_normal((8, 50, 80)).astype(np.float32),
        "targets": rng.integers(3, 12, size=(8, 8)).astype(np.int32),
        "input_lengths": np.full((8,), 50, np.int32),
        "target_lengths": np.full((8,), 8, np.int32),
    }

    def batches():
        while True:
            yield batch

    metrics = str(tmp_path / "metrics.jsonl")
    tconf = TrainingConfig(
        max_steps=4, warmup_steps=1, log_interval=2,
        eval_interval=10**9, save_interval=10**9,
        augment=va.augment.SpecAugmentConfig(enabled=True) if hasattr(va, "augment") else None,
        metrics_path=metrics,
    )
    from velocity_asr_tpu.augment import SpecAugmentConfig as SAC

    tconf.augment = SAC(enabled=True)
    trainer = Trainer(model, tconf, batches())
    trainer.train()
    import json

    lines = [json.loads(l) for l in open(metrics)]
    assert len(lines) == 2
    assert {"step", "loss", "lr", "sec_per_step"} <= set(lines[0])


def test_noise_inject_snr_and_padding():
    from velocity_asr_tpu.augment import noise_inject

    cfg = SpecAugmentConfig(enabled=True, noise_injection=True,
                            noise_min_snr_db=20.0, noise_max_snr_db=20.0)
    t = np.arange(16000, dtype=np.float32)
    sig = 0.3 * np.sin(2 * np.pi * 440.0 * t / 16000.0)
    audio = jnp.asarray(np.stack([sig, sig]))
    lengths = jnp.array([16000, 8000], jnp.int32)
    out = np.asarray(noise_inject(audio, jax.random.PRNGKey(0), cfg, lengths))

    # Measured SNR over the valid region should be ~20 dB.
    noise0 = out[0] - sig
    snr0 = 10 * np.log10(np.mean(sig**2) / np.mean(noise0**2))
    assert 18.0 < snr0 < 22.0, snr0
    # Item 1: noise only within the first 8000 samples; padding untouched.
    assert np.array_equal(out[1, 8000:], sig[8000:])
    assert not np.array_equal(out[1, :8000], sig[:8000])


def test_trainer_rejects_noise_injection_without_device_mel():
    import pytest

    import velocity_asr_tpu as va
    from velocity_asr_tpu.training import Trainer, TrainingConfig

    cfg = va.VelocityASRConfig(
        d_model=16, ssm_layers=1, ssm_state_dim=4, global_ssm_layers=1,
        global_ssm_state_dim=4, attention_heads=2, attention_dim=8,
        vocab_size=12, dropout=0.0,
    )
    model = va.create_model(cfg)
    rng = np.random.default_rng(0)
    batch = {
        "mel_spectrogram": rng.standard_normal((8, 50, 80)).astype(np.float32),
        "targets": rng.integers(3, 12, size=(8, 8)).astype(np.int32),
        "input_lengths": np.full((8,), 50, np.int32),
        "target_lengths": np.full((8,), 8, np.int32),
    }
    tconf = TrainingConfig(
        max_steps=1, warmup_steps=1, log_interval=1,
        eval_interval=10**9, save_interval=10**9,
        augment=SpecAugmentConfig(enabled=True, noise_injection=True),
    )
    trainer = Trainer(model, tconf, iter([batch]))
    with pytest.raises(ValueError, match="device_mel"):
        trainer.train()


def test_speed_perturb_identity_factor():
    """factor == 1.0 is a no-op: waveform and lengths pass through."""
    from velocity_asr_tpu.audio import HOP_LENGTH
    from velocity_asr_tpu.augment import speed_perturb_audio

    cfg = SpecAugmentConfig(enabled=True, speed_perturb=True,
                            speed_min=1.0, speed_max=1.0)
    rng = np.random.default_rng(0)
    audio = np.zeros((2, 16000), np.float32)
    audio[0, :16000] = rng.standard_normal(16000)
    audio[1, :8000] = rng.standard_normal(8000)
    lengths = jnp.array([1 + 16000 // HOP_LENGTH, 1 + 8000 // HOP_LENGTH],
                        jnp.int32)
    out, new_lengths = speed_perturb_audio(
        jnp.asarray(audio), jax.random.PRNGKey(0), cfg, lengths, HOP_LENGTH
    )
    np.testing.assert_array_equal(np.asarray(new_lengths), np.asarray(lengths))
    valid0 = (int(lengths[0]) - 1) * HOP_LENGTH
    valid1 = (int(lengths[1]) - 1) * HOP_LENGTH
    np.testing.assert_allclose(np.asarray(out)[0, :valid0],
                               audio[0, :valid0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(out)[1, :valid1],
                               audio[1, :valid1], atol=1e-6)


def test_speed_perturb_warps_and_rescales_lengths():
    """A fixed 2x speed-up subsamples the waveform (out[t] = audio[2t])
    and halves the valid length; samples past the new length are zero."""
    from velocity_asr_tpu.audio import HOP_LENGTH
    from velocity_asr_tpu.augment import speed_perturb_audio

    cfg = SpecAugmentConfig(enabled=True, speed_perturb=True,
                            speed_min=2.0, speed_max=2.0)
    rng = np.random.default_rng(1)
    s = 16000
    audio = rng.standard_normal((1, s)).astype(np.float32)
    lengths = jnp.array([1 + (s // 2) // HOP_LENGTH], jnp.int32)  # half valid
    out, new_lengths = speed_perturb_audio(
        jnp.asarray(audio), jax.random.PRNGKey(0), cfg, lengths, HOP_LENGTH
    )
    valid = (int(lengths[0]) - 1) * HOP_LENGTH
    new_valid = valid // 2
    assert int(new_lengths[0]) == new_valid // HOP_LENGTH + 1
    out = np.asarray(out)[0]
    # integer factor -> pure gather, no interpolation error
    np.testing.assert_allclose(out[:new_valid], audio[0, :valid:2], atol=1e-6)
    np.testing.assert_array_equal(out[new_valid:], 0.0)


def test_speed_perturb_slowdown_clamped_to_buffer():
    """An utterance that already fills its padded buffer cannot stretch
    past it: the factor clamps to valid/S (here 1.0 -> no-op), instead of
    writing out of bounds or cutting the transcript's audio."""
    from velocity_asr_tpu.audio import HOP_LENGTH
    from velocity_asr_tpu.augment import speed_perturb_audio

    cfg = SpecAugmentConfig(enabled=True, speed_perturb=True,
                            speed_min=0.9, speed_max=0.9)
    rng = np.random.default_rng(2)
    s = 16000
    audio = rng.standard_normal((1, s)).astype(np.float32)
    lengths = jnp.array([1 + s // HOP_LENGTH], jnp.int32)
    valid = (int(lengths[0]) - 1) * HOP_LENGTH
    assert s - valid < HOP_LENGTH  # buffer essentially full
    out, new_lengths = speed_perturb_audio(
        jnp.asarray(audio), jax.random.PRNGKey(3), cfg, lengths, HOP_LENGTH
    )
    # f_eff = valid/s ~= 1: lengths unchanged (never exceed the buffer)
    assert int(new_lengths[0]) * HOP_LENGTH <= s + HOP_LENGTH
    assert int(new_lengths[0]) >= int(lengths[0]) - 1


def test_trainer_speed_perturb_device_mel_end_to_end():
    """speed_perturb trains through the real device-mel step: loss is
    finite, and the step differs from the unaugmented one (the warp
    actually happened)."""
    import velocity_asr_tpu as va
    from velocity_asr_tpu.data import ASRCollator
    from velocity_asr_tpu.synth import SyntheticSpeechDataset
    from velocity_asr_tpu.training import Trainer, TrainingConfig

    cfg = va.VelocityASRConfig(
        d_model=16, ssm_layers=1, ssm_state_dim=4, global_ssm_layers=1,
        global_ssm_state_dim=4, attention_heads=2, attention_dim=8,
        vocab_size=31, dropout=0.0,
    )
    ds = SyntheticSpeechDataset(8, split="dev", seed=7, device_mel=True)
    batch = ASRCollator(frame_bucket=100)([ds[i] for i in range(8)])

    def batches(b):
        while True:
            yield b

    base = TrainingConfig(
        learning_rate=0.0, warmup_steps=1, max_steps=2, grad_clip_norm=1e9,
        log_interval=1000, eval_interval=10**9, save_interval=10**9,
    )
    t_plain = Trainer(va.create_model(cfg), base, batches(batch))
    loss_plain = float(t_plain._train_step_device(batch))

    sp = dataclasses.replace(
        base,
        augment=SpecAugmentConfig(
            enabled=True, num_time_masks=0, num_freq_masks=0,
            speed_perturb=True, speed_min=0.8, speed_max=0.8,
        ),
    )
    t_sp = Trainer(va.create_model(cfg), sp, batches(batch),
                   params=jax.device_get(t_plain.params))
    loss_sp = float(t_sp._train_step_device(batch))
    assert np.isfinite(loss_sp)
    assert abs(loss_sp - loss_plain) > 1e-4  # the warp changed the input


def test_trainer_rejects_speed_perturb_without_device_mel():
    import pytest

    import velocity_asr_tpu as va
    from velocity_asr_tpu.training import Trainer, TrainingConfig

    cfg = va.VelocityASRConfig(
        d_model=16, ssm_layers=1, ssm_state_dim=4, global_ssm_layers=1,
        global_ssm_state_dim=4, attention_heads=2, attention_dim=8,
        vocab_size=12, dropout=0.0,
    )
    rng = np.random.default_rng(0)
    batch = {
        "mel_spectrogram": rng.standard_normal((8, 50, 80)).astype(np.float32),
        "targets": rng.integers(3, 12, size=(8, 8)).astype(np.int32),
        "input_lengths": np.full((8,), 50, np.int32),
        "target_lengths": np.full((8,), 8, np.int32),
    }
    tconf = TrainingConfig(
        max_steps=1, warmup_steps=1, log_interval=1,
        eval_interval=10**9, save_interval=10**9,
        augment=SpecAugmentConfig(enabled=True, num_time_masks=0,
                                  num_freq_masks=0, speed_perturb=True),
    )
    trainer = Trainer(va.create_model(cfg), tconf, iter([batch]))
    with pytest.raises(ValueError, match="device_mel"):
        trainer.train_step(batch)
