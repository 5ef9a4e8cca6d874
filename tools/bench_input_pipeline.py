"""Measure training input-pipeline throughput: can the host feed N chips?

VERDICT r2 weak #5: every training mel was computed in Python threads on a
1-CPU host — fine for one chip at 0.123 s/step, but an 8-chip DP run would
starve. The fix is device-mel training (data.ASRCollator._collate_audio +
training.Trainer device-mel path): the host then only decodes audio and
ships int16 PCM; the fused-Pallas mel runs inside the compiled train step.

This tool measures host pipeline throughput in both modes over the on-disk
WAV corpus and reports the margin against the device's consumption rate
(audio-seconds per wall-second at the measured train-step time).

Usage: python tools/bench_input_pipeline.py [--manifest ...] [--batches N]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# CPU-only measurement: the loader never touches the device.
os.environ.setdefault("JAX_PLATFORMS", "cpu")


def measure(manifest, device_mel, batch_size, num_workers, max_batches):
    from velocity_asr_tpu.data import ASRCollator, ASRDataset, DataLoader

    ds = ASRDataset(manifest, device_mel=device_mel)
    loader = DataLoader(
        ds, batch_size=batch_size, shuffle=True, num_workers=num_workers,
        collate_fn=ASRCollator(frame_bucket=200), drop_last=True, prefetch=4,
    )
    it = iter(loader)
    next(it)  # warm the worker pool / page cache
    t0 = time.perf_counter()
    n_batches, audio_s = 0, 0.0
    for batch in it:
        audio_s += float(batch["input_lengths"].sum()) * 0.01
        n_batches += 1
        if n_batches >= max_batches:
            break
    wall = time.perf_counter() - t0
    return n_batches / wall, audio_s / wall


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--manifest", default="data/synth_test/test_manifest.jsonl")
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--num-workers", type=int, default=8)
    ap.add_argument("--batches", type=int, default=60)
    ap.add_argument("--step-seconds", type=float, default=0.123,
                    help="measured train-step time at the recipe shape "
                         "(8 x 30 s, BENCH_DETAILS_r02)")
    ap.add_argument("--recipe-audio-s", type=float, default=240.0,
                    help="audio seconds consumed per chip per step (8 x 30)")
    args = ap.parse_args()

    consume_per_chip = args.recipe_audio_s / args.step_seconds
    print(f"consumption: {consume_per_chip:.0f} audio-s/s per chip "
          f"({args.recipe_audio_s:.0f} audio-s per {args.step_seconds}s step)")

    for mode, device_mel in (("host-mel", False), ("device-mel", True)):
        bps, asps = measure(args.manifest, device_mel, args.batch_size,
                            args.num_workers, args.batches)
        chips = asps / consume_per_chip
        print(f"{mode:11s} {bps:6.2f} batches/s  {asps:8.1f} audio-s/s  "
              f"-> feeds {chips:.2f} chips at the recipe shape")


if __name__ == "__main__":
    main()
