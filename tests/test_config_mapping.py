"""YAML -> config mapping tests (scripts/train.py config surface)."""

from velocity_asr_tpu.utils.config import (
    model_config_from_yaml,
    training_config_from_yaml,
)


def test_model_yaml_mapping():
    cfg = model_config_from_yaml({
        "model": {"d_model": 96, "dropout": 0.2},
        "ssm": {"num_layers": 6, "state_dim": 32},
        "global_context": {"attention_heads": 2},
        "output": {"vocab_size": 123},
        "performance": {"scan_mode": "mamba", "dtype": "bfloat16"},
    })
    assert cfg.d_model == 96 and cfg.dropout == 0.2
    assert cfg.ssm_layers == 6 and cfg.ssm_state_dim == 32
    assert cfg.attention_heads == 2 and cfg.vocab_size == 123
    assert cfg.scan_mode == "pallas"  # reference name "mamba" maps to pallas
    assert cfg.dtype == "bfloat16"


def test_model_yaml_defaults():
    cfg = model_config_from_yaml({})
    from velocity_asr_tpu.models.config import VelocityASRConfig

    assert cfg == VelocityASRConfig()


def test_train_yaml_mapping():
    cfg = training_config_from_yaml({
        "training": {"batch_size": 4, "max_steps": 10, "use_amp": False},
        "optimizer": {"learning_rate": 3e-4, "warmup_steps": 2},
        "checkpoint": {"dir": "/tmp/x", "keep_last": 2},
        "logging": {"log_interval": 5, "metrics_path": "/tmp/m.jsonl"},
        "augmentation": {"enabled": True, "num_time_masks": 3},
        "distributed": {"num_data_shards": 4},
    })
    assert cfg.batch_size == 4 and cfg.max_steps == 10 and not cfg.use_amp
    assert cfg.learning_rate == 3e-4 and cfg.warmup_steps == 2
    assert cfg.checkpoint_dir == "/tmp/x" and cfg.keep_last == 2
    assert cfg.metrics_path == "/tmp/m.jsonl"
    assert cfg.augment is not None and cfg.augment.num_time_masks == 3
    assert cfg.num_data_shards == 4


def test_train_yaml_augment_disabled_by_default():
    cfg = training_config_from_yaml({})
    assert cfg.augment is None


def test_train_yaml_reference_augmentation_stanza():
    """The reference nests augmentation under data: with its own key names
    (reference configs/train.yaml:27-34); a migrated config must keep
    SpecAugment on rather than silently training un-augmented."""
    cfg = training_config_from_yaml({
        "data": {
            "augmentation": {
                "spec_augment": True,
                "time_mask_param": 100,
                "time_mask_num": 3,
                "freq_mask_param": 27,
                "freq_mask_num": 1,
            }
        }
    })
    assert cfg.augment is not None
    assert cfg.augment.time_mask_frames == 100
    assert cfg.augment.num_time_masks == 3
    assert cfg.augment.freq_mask_bins == 27
    assert cfg.augment.num_freq_masks == 1

    off = training_config_from_yaml(
        {"data": {"augmentation": {"spec_augment": False}}}
    )
    assert off.augment is None


def test_noise_injection_without_spec_augment():
    """noise_injection is its own switch: spec_augment/enabled false with
    noise_injection true trains with noise only (no masking), rather than
    silently dropping the key."""
    cfg = training_config_from_yaml({
        "data": {"augmentation": {"spec_augment": False,
                                  "noise_injection": True}}
    })
    assert cfg.augment is not None and cfg.augment.noise_injection
    assert cfg.augment.num_time_masks == 0 and cfg.augment.num_freq_masks == 0

    on = training_config_from_yaml({
        "augmentation": {"enabled": True, "noise_injection": True}
    })
    assert on.augment.noise_injection and on.augment.num_time_masks == 2


def test_speed_perturb_mapping():
    """speed_perturb maps for real (the reference declares the key,
    train.yaml:34): bare boolean uses the 0.9-1.1 default range, a
    [min, max] list overrides it, malformed lists error."""
    import pytest

    on = training_config_from_yaml({
        "data": {"augmentation": {"spec_augment": False,
                                  "speed_perturb": True}}
    })
    assert on.augment is not None and on.augment.speed_perturb
    assert (on.augment.speed_min, on.augment.speed_max) == (0.9, 1.1)
    assert on.augment.num_time_masks == 0  # masking stays off

    ranged = training_config_from_yaml({
        "augmentation": {"enabled": True, "speed_perturb": [0.85, 1.2]}
    })
    assert ranged.augment.speed_perturb
    assert (ranged.augment.speed_min, ranged.augment.speed_max) == (0.85, 1.2)

    off = training_config_from_yaml({
        "augmentation": {"speed_perturb": False}
    })
    assert off.augment is None

    with pytest.raises(ValueError, match="speed_perturb"):
        training_config_from_yaml(
            {"augmentation": {"speed_perturb": [1.2, 0.8]}}
        )
