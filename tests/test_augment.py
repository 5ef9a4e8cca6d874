"""SpecAugment tests."""

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
