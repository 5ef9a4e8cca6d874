#!/usr/bin/env python3
"""Benchmark: end-to-end batched inference RTF on one TPU chip.

Measures the flagship configuration (default 6.2M-param model, bf16
compute, Pallas selective-scan kernel) on 30 s utterances: on-device mel
front-end + forward + on-device greedy decode, steady-state.

Prints ONE JSON line:
  {"metric": "rtf_per_chip", "value": <RTF>, "unit": "wall_s_per_audio_s",
   "vs_baseline": <reference_gpu_rtf / ours>}

Baseline: the reference README reports RTF 0.05x on GPU / 0.3x on CPU
(BASELINE.md); the north-star target is <= 0.01 per TPU chip.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASELINE_GPU_RTF = 0.05
AUDIO_SECONDS = 30.0
BATCH = 16
WARMUP = 2
ITERS = 10


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from velocity_asr_tpu.audio import HOP_LENGTH, SAMPLE_RATE, compute_mel_spectrogram
    from velocity_asr_tpu.decode import ctc_greedy_decode_jax
    from velocity_asr_tpu.models.config import VelocityASRConfig
    from velocity_asr_tpu.models.model import create_model, forward, init_params

    on_tpu = jax.default_backend() == "tpu"
    scan_mode = "pallas" if on_tpu else "parallel"
    cfg = VelocityASRConfig(dtype="bfloat16", scan_mode=scan_mode)
    model = create_model(cfg)
    params = init_params(model, jax.random.PRNGKey(0), example_frames=64)

    num_samples = int(AUDIO_SECONDS * SAMPLE_RATE)
    rng = np.random.default_rng(0)
    audio = rng.standard_normal((BATCH, num_samples)).astype(np.float32) * 0.1

    @jax.jit
    def pipeline(params, audio):
        mel = compute_mel_spectrogram(audio)
        logits = forward(model, params, mel, train=False)
        tokens, lengths = ctc_greedy_decode_jax(logits)
        return tokens, lengths

    audio_dev = jnp.asarray(audio)
    # Warmup / compile. Synchronize via host transfer: block_until_ready
    # alone does not reliably fence execution through the axon tunnel.
    for _ in range(WARMUP):
        tokens, lengths = pipeline(params, audio_dev)
        np.asarray(tokens), np.asarray(lengths)

    # Throughput measurement: enqueue all iterations (async dispatch), then
    # drain. The host<->TPU tunnel adds ~30 ms round-trip latency per sync,
    # which would otherwise dominate; a serving system pipelines requests
    # exactly like this.
    t0 = time.perf_counter()
    outs = [pipeline(params, audio_dev) for _ in range(ITERS)]
    for tokens, lengths in outs:
        np.asarray(tokens)
    wall = (time.perf_counter() - t0) / ITERS

    audio_s = BATCH * AUDIO_SECONDS
    rtf = wall / audio_s
    result = {
        "metric": "rtf_per_chip",
        "value": round(rtf, 6),
        "unit": "wall_s_per_audio_s",
        "vs_baseline": round(BASELINE_GPU_RTF / rtf, 2),
    }
    print(json.dumps(result))
    return result


if __name__ == "__main__":
    main()
