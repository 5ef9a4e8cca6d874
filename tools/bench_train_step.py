"""Train-step timing probe (dev tool): scan tiers x shapes on the real TPU."""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp

from velocity_asr_tpu.models.config import VelocityASRConfig
from velocity_asr_tpu.models.model import create_model
from velocity_asr_tpu.training import Trainer, TrainingConfig


def measure(scan_mode, frames, batch=8, vocab=30, steps=6):
    cfg = VelocityASRConfig(dtype="bfloat16", scan_mode=scan_mode, vocab_size=vocab)
    model = create_model(cfg)
    rng = np.random.default_rng(0)

    def batches():
        while True:
            yield {
                "mel_spectrogram": rng.standard_normal((batch, frames, 80)).astype(np.float32),
                "targets": rng.integers(3, vocab, size=(batch, 40)).astype(np.int32),
                "input_lengths": np.full((batch,), frames, np.int32),
                "target_lengths": np.full((batch,), 40, np.int32),
            }

    tc = TrainingConfig(
        max_steps=steps, warmup_steps=2, log_interval=10**9,
        eval_interval=10**9, save_interval=10**9,
        gradient_accumulation_steps=4,
    )
    tr = Trainer(model, tc, batches())
    it = iter(batches())
    # warmup/compile
    loss = tr._train_step_device(next(it))
    np.asarray(loss)
    t0 = time.perf_counter()
    losses = [tr._train_step_device(next(it)) for _ in range(steps)]
    for l in losses:
        np.asarray(l)
    dt = (time.perf_counter() - t0) / steps
    print(f"scan={scan_mode:10s} frames={frames:5d} batch={batch}: {dt*1e3:8.1f} ms/step")
    return dt


if __name__ == "__main__":
    specs = sys.argv[1:] or ["pallas:600", "parallel:600", "pallas:3000", "parallel:3000"]
    for spec in specs:
        mode, fr = spec.split(":")
        try:
            measure(mode, int(fr))
        except Exception as e:
            print(f"{spec}: FAILED {type(e).__name__}: {str(e)[:150]}")
