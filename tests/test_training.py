"""Training runtime tests: CTC loss golden vs torch, scheduler parity,
overfit smoke, metrics parity, checkpoint resume."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import velocity_asr_tpu as va
from velocity_asr_tpu.training import (
    Trainer,
    TrainingConfig,
    compute_cer,
    compute_wer,
    ctc_loss,
    warmup_cosine_schedule,
)


def test_ctc_loss_matches_torch():
    torch = pytest.importorskip("torch")

    rng = np.random.default_rng(0)
    B, T, V, L = 3, 20, 10, 6
    logits = rng.standard_normal((B, T, V)).astype(np.float32)
    targets = rng.integers(3, V, size=(B, L)).astype(np.int32)
    input_lengths = np.array([20, 15, 12], np.int32)
    target_lengths = np.array([6, 4, 3], np.int32)
    # pad targets beyond length with <pad>=2
    for b in range(B):
        targets[b, target_lengths[b]:] = 2

    lt = torch.from_numpy(logits)
    ref = torch.nn.CTCLoss(blank=0, reduction="mean", zero_infinity=True)(
        torch.log_softmax(lt, -1).transpose(0, 1),
        torch.from_numpy(targets.astype(np.int64)),
        torch.from_numpy(input_lengths.astype(np.int64)),
        torch.from_numpy(target_lengths.astype(np.int64)),
    ).item()

    ours = float(
        ctc_loss(
            jnp.asarray(logits),
            jnp.asarray(targets),
            jnp.asarray(input_lengths),
            jnp.asarray(target_lengths),
        )
    )
    np.testing.assert_allclose(ours, ref, rtol=1e-4)


def test_ctc_loss_degenerate_lengths_finite():
    # target longer than input frames -> torch gives inf, zero_infinity zeroes it
    logits = np.zeros((1, 3, 5), np.float32)
    targets = np.array([[3, 4, 3, 4, 3, 4]], np.int32)
    loss = float(
        ctc_loss(
            jnp.asarray(logits),
            jnp.asarray(targets),
            jnp.asarray([3], np.int32),
            jnp.asarray([6], np.int32),
        )
    )
    assert np.isfinite(loss)
    assert loss == 0.0


def test_scheduler_matches_reference(torch_reference):
    import torch

    lin = torch.nn.Linear(2, 2)
    opt = torch.optim.AdamW(lin.parameters(), lr=1e-4)
    from velocity_asr import training as ref_training

    ref_sched = ref_training.WarmupCosineScheduler(
        opt, warmup_steps=10, total_steps=100
    )
    sched = warmup_cosine_schedule(1e-4, warmup_steps=10, total_steps=100)

    for count in range(120):
        ref_sched.step()
        ours = float(sched(count))
        np.testing.assert_allclose(ours, ref_sched.get_lr()[0], rtol=1e-5)


def test_lr_horizon_default_anneals_parity_opt_in():
    """The default cosine horizon is max_steps // accumulation (reaches
    min_lr by the final update); the reference's never-anneals behavior
    (horizon = max_steps micro-steps, training.py:196-204) is opt-in via
    lr_parity_horizon, and lr_total_steps overrides both."""
    from velocity_asr_tpu.training import TrainingConfig, make_optimizer

    base = dict(learning_rate=3e-4, warmup_steps=100,
                max_steps=4000, gradient_accumulation_steps=4)
    _, sched_default = make_optimizer(TrainingConfig(**base))
    _, sched_parity = make_optimizer(
        TrainingConfig(**base, lr_parity_horizon=True))
    _, sched_override = make_optimizer(
        TrainingConfig(**base, lr_total_steps=500))
    final_update = 4000 // 4 - 1
    # default: fully annealed to min_lr_ratio * base at the final update
    np.testing.assert_allclose(
        float(sched_default(final_update)), 0.1 * 3e-4, rtol=1e-2)
    # parity opt-in: barely decayed at the run's final update
    assert float(sched_parity(final_update)) > 0.8 * 3e-4
    # explicit horizon beats both: annealed by update 500 already
    np.testing.assert_allclose(
        float(sched_override(500)), 0.1 * 3e-4, rtol=1e-2)


def test_wer_cer_match_reference(torch_reference):
    preds = ["the cat sat", "hello world", ""]
    refs = ["the cat sat on the mat", "hello word", "abc"]
    from velocity_asr import training as ref_training

    assert compute_wer(preds, refs) == ref_training.compute_wer(preds, refs)
    assert compute_cer(preds, refs) == ref_training.compute_cer(preds, refs)


def _tiny_setup(accum=1):
    cfg = va.VelocityASRConfig(
        d_model=16, ssm_layers=1, ssm_state_dim=4, global_ssm_layers=1,
        global_ssm_state_dim=4, attention_heads=2, attention_dim=8,
        vocab_size=12, dropout=0.0,
    )
    model = va.create_model(cfg)
    rng = np.random.default_rng(0)
    # batch of 8: divisible across the 8-device data mesh from conftest
    batch = {
        "mel_spectrogram": rng.standard_normal((8, 50, 80)).astype(np.float32),
        "targets": rng.integers(3, 12, size=(8, 8)).astype(np.int32),
        "input_lengths": np.full((8,), 50, np.int32),
        "target_lengths": np.full((8,), 8, np.int32),
    }

    def batches():
        while True:
            yield batch

    tconf = TrainingConfig(
        learning_rate=3e-3, warmup_steps=2, max_steps=30,
        gradient_accumulation_steps=accum, log_interval=1000,
        eval_interval=10**9, save_interval=10**9,
    )
    trainer = Trainer(model, tconf, batches())
    return trainer, batch


@pytest.mark.slow
def test_overfit_single_batch():
    trainer, batch = _tiny_setup()
    first = trainer.train_step(batch)["loss"]
    for _ in range(29):
        last = trainer.train_step(batch)["loss"]
    assert last < first * 0.9, (first, last)


@pytest.mark.slow
def test_gradient_accumulation_runs():
    trainer, batch = _tiny_setup(accum=2)
    for _ in range(4):
        m = trainer.train_step(batch)
    assert np.isfinite(m["loss"])


@pytest.mark.slow
def test_checkpoint_roundtrip(tmp_path):
    trainer, batch = _tiny_setup()
    for _ in range(3):
        trainer.train_step(batch)
    path = str(tmp_path / "ckpt")
    trainer.save_checkpoint(path)

    trainer2, _ = _tiny_setup()
    trainer2.load_checkpoint(path)
    assert trainer2.global_step == trainer.global_step
    a = jax.tree_util.tree_leaves(trainer.params)
    b = jax.tree_util.tree_leaves(trainer2.params)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    # resumed training continues
    m = trainer2.train_step(batch)
    assert np.isfinite(m["loss"])


def test_train_step_sharded_over_mesh():
    # 8 virtual CPU devices from conftest: batch shards over `data`.
    assert len(jax.devices()) == 8
    trainer, batch = _tiny_setup()
    assert trainer.mesh.shape["data"] == 8
    sharded, n_valid = trainer.shard_batch(batch)
    assert n_valid == 8
    shard_shapes = [
        s.data.shape for s in sharded["mel_spectrogram"].addressable_shards
    ]
    assert all(s[0] == 1 for s in shard_shapes) and len(shard_shapes) == 8
    m = trainer.train_step(batch)
    assert np.isfinite(m["loss"])

    # batch not divisible by the mesh: padded + masked, loss still sane
    batch5 = {
        k: (v[:5] if hasattr(v, "ndim") else v) for k, v in batch.items()
    }
    sharded5, n_valid5 = trainer.shard_batch(batch5)
    assert n_valid5 == 5
    assert sharded5["mel_spectrogram"].shape[0] == 8
    m5 = trainer.eval_step(batch5)
    assert np.isfinite(m5["eval_loss"])


def test_device_mel_train_path_matches_host_mel():
    """device-mel training (collator ships int16 PCM; the compiled step
    computes mel + masked per-utterance normalization on device) produces
    the same loss as the host-mel path on the same utterances
    (VERDICT r3 item 6: the input pipeline must be able to feed a
    multi-chip mesh, so mel moves on device)."""
    from velocity_asr_tpu.data import ASRCollator
    from velocity_asr_tpu.synth import SyntheticSpeechDataset

    cfg = va.VelocityASRConfig(
        d_model=16, ssm_layers=1, ssm_state_dim=4, global_ssm_layers=1,
        global_ssm_state_dim=4, attention_heads=2, attention_dim=8,
        vocab_size=31, dropout=0.0,
    )
    model = va.create_model(cfg)

    host_ds = SyntheticSpeechDataset(8, split="dev", seed=7)
    dev_ds = SyntheticSpeechDataset(8, split="dev", seed=7, device_mel=True)
    collator = ASRCollator(frame_bucket=100)
    host_batch = collator([host_ds[i] for i in range(8)])
    dev_batch = collator([dev_ds[i] for i in range(8)])
    assert "audio" in dev_batch and dev_batch["audio"].dtype == np.int16
    np.testing.assert_array_equal(
        host_batch["input_lengths"], dev_batch["input_lengths"])

    def batches(b):
        while True:
            yield b

    tconf = TrainingConfig(
        learning_rate=0.0, warmup_steps=1, max_steps=4, grad_clip_norm=1e9,
        log_interval=1000, eval_interval=10**9, save_interval=10**9,
        augment=None,
    )
    t_host = Trainer(model, tconf, batches(host_batch))
    loss_host = float(t_host._train_step_device(host_batch))
    t_dev = Trainer(model, tconf, batches(dev_batch),
                    params=jax.device_get(t_host.params))
    loss_dev = float(t_dev._train_step_device(dev_batch))
    # int16 wire + boundary-window reflection differences are tiny
    assert abs(loss_host - loss_dev) < 2e-2 * max(abs(loss_host), 1.0), (
        loss_host, loss_dev)


def test_qat_trainer_end_to_end(tmp_path):
    """QAT training through the real Trainer: the quant_stats collection
    must thread through the jitted step (regression: forward() without it
    crashed with ScopeCollectionNotFound on the first step), optimize,
    and round-trip through checkpoints."""
    import jax
    import jax.numpy as jnp

    import velocity_asr_tpu as va
    from velocity_asr_tpu.quantize import prepare_model_for_qat
    from velocity_asr_tpu.training import Trainer, TrainingConfig

    cfg = prepare_model_for_qat(va.VelocityASRConfig(
        d_model=16, ssm_layers=1, ssm_state_dim=4, global_ssm_layers=1,
        global_ssm_state_dim=4, attention_heads=2, attention_dim=8,
        vocab_size=24, dropout=0.0, scan_mode="parallel", dtype="float32"))
    model = va.create_model(cfg)
    rng = np.random.default_rng(0)
    batch = {
        "mel_spectrogram": rng.standard_normal((2, 64, 80)).astype(np.float32),
        "input_lengths": np.array([64, 64], np.int32),
        "targets": np.tile(np.array([[3, 4, 5, 0]], np.int32), (2, 1)),
        "target_lengths": np.array([3, 3], np.int32),
    }
    tc = TrainingConfig(
        batch_size=2, max_steps=8, gradient_accumulation_steps=1,
        learning_rate=3e-3, warmup_steps=1,
        checkpoint_dir=str(tmp_path), metrics_path=str(tmp_path / "m.jsonl"),
    )
    tr = Trainer(model, tc, iter([]))
    assert tr.quant_stats is not None
    losses = [tr.train_step(batch)["loss"] for _ in range(4)]
    assert losses[-1] < losses[0], losses
    assert np.isfinite(tr.eval_step(batch)["eval_loss"])

    tr.save_checkpoint(str(tmp_path / "ck"))
    tr2 = Trainer(model, tc, iter([]))
    tr2.load_checkpoint(str(tmp_path / "ck"))
    for a, b in zip(jax.tree_util.tree_leaves(tr.quant_stats),
                    jax.tree_util.tree_leaves(tr2.quant_stats)):
        assert jnp.allclose(a, b)


def test_calibration_accumulates_and_guards():
    """Calibration must accumulate ranges across batches (order
    independence) and refuse an empty iterator."""
    import jax
    import jax.numpy as jnp

    import velocity_asr_tpu as va
    from velocity_asr_tpu.quantize import (
        calibrate_model,
        init_quant_stats,
        prepare_model_for_qat,
    )

    cfg = prepare_model_for_qat(va.VelocityASRConfig(
        d_model=16, ssm_layers=1, ssm_state_dim=4, global_ssm_layers=1,
        global_ssm_state_dim=4, attention_heads=2, attention_dim=8,
        vocab_size=24, dropout=0.0, scan_mode="parallel", dtype="float32"))
    model = va.create_model(cfg)
    params = va.init_params(model, jax.random.PRNGKey(0), example_frames=64)
    stats = init_quant_stats(model, params)

    rng = np.random.default_rng(1)
    big = jnp.asarray(rng.standard_normal((1, 64, 80)) * 5, jnp.float32)
    small = jnp.asarray(rng.standard_normal((1, 64, 80)) * 0.1, jnp.float32)
    c1 = calibrate_model(model, params, stats, [big, small], num_batches=2)
    c2 = calibrate_model(model, params, stats, [small, big], num_batches=2)
    # Order independence is approximate (downstream activations flow
    # through upstream grids that evolve during the pass), but nothing
    # like the old last-batch-wins 10000x scale swings.
    for a, b in zip(jax.tree_util.tree_leaves(c1),
                    jax.tree_util.tree_leaves(c2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0.15, atol=0.05)
    # The large batch's range must not be forgotten when it comes first:
    # input-quantizer scales from [big, small] dominate [small]-only.
    c_small = calibrate_model(model, params, stats, [small], num_batches=1)

    def scales(tree):
        return [np.asarray(leaf)
                for path, leaf in jax.tree_util.tree_leaves_with_path(tree)
                if getattr(path[-1], "key", None) == "scale"]

    bigger = [float(np.max(a)) >= float(np.max(b)) * 0.99
              for a, b in zip(scales(c1), scales(c_small))]
    assert sum(bigger) > len(bigger) * 0.8, bigger

    with pytest.raises(ValueError, match="no calibration batches"):
        calibrate_model(model, params, stats, [], num_batches=2)


def test_device_mel_train_with_noise_injection_runs():
    """noise_injection (the reference's declared-but-dead config key, made
    real): the jitted device-mel step applies waveform noise and trains."""
    from velocity_asr_tpu.augment import SpecAugmentConfig
    from velocity_asr_tpu.data import ASRCollator
    from velocity_asr_tpu.synth import SyntheticSpeechDataset

    cfg = va.VelocityASRConfig(
        d_model=16, ssm_layers=1, ssm_state_dim=4, global_ssm_layers=1,
        global_ssm_state_dim=4, attention_heads=2, attention_dim=8,
        vocab_size=31, dropout=0.0,
    )
    model = va.create_model(cfg)
    dev_ds = SyntheticSpeechDataset(4, split="dev", seed=7, device_mel=True)
    collator = ASRCollator(frame_bucket=100)
    batch = collator([dev_ds[i] for i in range(4)])

    def batches():
        while True:
            yield batch

    tconf = TrainingConfig(
        warmup_steps=1, max_steps=2, log_interval=1000,
        eval_interval=10**9, save_interval=10**9,
        augment=SpecAugmentConfig(
            enabled=True, num_time_masks=1, num_freq_masks=1,
            noise_injection=True, noise_min_snr_db=15.0,
            noise_max_snr_db=30.0,
        ),
    )
    trainer = Trainer(model, tconf, batches())
    loss = float(trainer._train_step_device(batch))
    assert np.isfinite(loss)
