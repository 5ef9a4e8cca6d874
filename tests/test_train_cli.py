"""Train CLI tests: the --init-from path (fine-tune from a shipped
final_pretrained artifact — config.json + params.msgpack — with a fresh
optimizer) loads the weights for real and guards vocab mismatches.

This is the flow configs/train_synth_stream.yaml documents: the Orbax
trainer checkpoints are scratch, so continuing a shipped run goes through
the msgpack pretrained format (reference from_pretrained, model.py:385-433).
"""

import os
import sys

import numpy as np
import pytest


MODEL_YAML = """\
model:
  d_model: 32
  ssm_layers: 1
  ssm_state_dim: 8
  global_ssm_layers: 1
  global_ssm_state_dim: 4
  attention_heads: 2
  attention_dim: 8
  vocab_size: 32
  dropout: 0.0
  dtype: float32
"""

TRAIN_YAML = """\
data:
  synthetic: 8
  synthetic_seed: 7
  synthetic_min_words: 1
  synthetic_max_words: 2

training:
  batch_size: 2
  gradient_accumulation_steps: 1
  max_steps: {steps}
  use_amp: false

optimizer:
  learning_rate: {lr}
  warmup_steps: 0
  grad_clip_norm: 1.0

logging:
  log_interval: 1000000
  eval_interval: 1000000

checkpoint:
  dir: {ckpt_dir}
  save_interval: 1000000
"""


def _run_train(argv):
    from scripts.train import main

    old = sys.argv
    sys.argv = ["train.py"] + argv
    try:
        return main()
    finally:
        sys.argv = old


def _write_cfgs(tmp, name, steps, lr):
    model_cfg = tmp / f"model_{name}.yaml"
    train_cfg = tmp / f"train_{name}.yaml"
    ckpt_dir = tmp / f"ckpt_{name}"
    model_cfg.write_text(MODEL_YAML)
    train_cfg.write_text(TRAIN_YAML.format(steps=steps, lr=lr, ckpt_dir=ckpt_dir))
    return model_cfg, train_cfg, ckpt_dir


@pytest.mark.slow
def test_init_from_loads_pretrained_weights(tmp_path):
    # Leg 1: a 2-step run produces final_pretrained.
    model_cfg, train_cfg, ckpt1 = _write_cfgs(tmp_path, "base", steps=2, lr=1e-3)
    _run_train(["--config", str(train_cfg), "--model-config", str(model_cfg)])
    pretrained = os.path.join(ckpt1, "final_pretrained")
    assert os.path.exists(os.path.join(pretrained, "params.msgpack"))

    # Leg 2: --init-from at lr=0 — the weights must pass through unchanged,
    # proving they were actually loaded (a fresh init would differ).
    import flax
    import jax

    from velocity_asr_tpu.models.model import from_pretrained

    _, params_in = from_pretrained(pretrained)
    model_cfg2, train_cfg2, ckpt2 = _write_cfgs(tmp_path, "ft", steps=1, lr=0.0)
    _run_train(["--config", str(train_cfg2), "--model-config", str(model_cfg2),
                "--init-from", pretrained])
    _, params_out = from_pretrained(os.path.join(ckpt2, "final_pretrained"))

    flat_in = flax.traverse_util.flatten_dict(jax.device_get(params_in))
    flat_out = flax.traverse_util.flatten_dict(jax.device_get(params_out))
    assert flat_in.keys() == flat_out.keys()
    for k, v in flat_in.items():
        np.testing.assert_array_equal(np.asarray(v), np.asarray(flat_out[k]),
                                      err_msg="/".join(k))


@pytest.mark.slow
def test_checkpoint_dir_override(tmp_path):
    """--checkpoint-dir redirects artifacts (and metrics.jsonl) away from
    the config's dir, so one config can drive A/B runs."""
    model_cfg, train_cfg, ckpt_cfg = _write_cfgs(tmp_path, "cd", steps=1, lr=1e-3)
    train_cfg.write_text(
        train_cfg.read_text()
        + f"\nlogging:\n  log_interval: 1\n  eval_interval: 1000000\n"
          f"  metrics_path: {ckpt_cfg}/metrics.jsonl\n"
    )
    override = tmp_path / "elsewhere"
    _run_train(["--config", str(train_cfg), "--model-config", str(model_cfg),
                "--checkpoint-dir", str(override)])
    assert os.path.exists(os.path.join(override, "final_pretrained"))
    assert os.path.exists(os.path.join(override, "metrics.jsonl"))
    assert not os.path.exists(os.path.join(ckpt_cfg, "final_pretrained"))


@pytest.mark.slow
def test_init_from_vocab_mismatch_errors(tmp_path):
    import flax
    import jax

    from velocity_asr_tpu.models.config import VelocityASRConfig
    from velocity_asr_tpu.models.model import create_model, init_params, save_pretrained

    cfg = VelocityASRConfig(
        d_model=32, ssm_layers=1, ssm_state_dim=8, global_ssm_layers=1,
        global_ssm_state_dim=4, attention_heads=2, attention_dim=8,
        vocab_size=48, dropout=0.0,  # != the dataset/model vocab (32)
    )
    model = create_model(cfg)
    params = init_params(model, jax.random.PRNGKey(0), example_frames=8)
    pretrained = tmp_path / "pretrained48"
    save_pretrained(str(pretrained), cfg, params)

    model_cfg, train_cfg, _ = _write_cfgs(tmp_path, "mismatch", steps=1, lr=0.0)
    with pytest.raises(SystemExit):
        _run_train(["--config", str(train_cfg), "--model-config", str(model_cfg),
                    "--init-from", str(pretrained)])
