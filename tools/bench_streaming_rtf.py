"""Streaming RTF: Pallas state-carry kernel vs the XLA associative-scan tier.

Round-2 silently routed every stateful scan call (i.e. every streaming
chunk) to the XLA associative scan — measured 25x slower than the Pallas
block recurrence at the kernel level (BENCH_DETAILS_r02.md). Round 3
taught the kernel h0/h_final (VERDICT r2 item 3); this tool measures what
that is worth END TO END: the same checkpoint decoded by
BatchedStreamingTranscriber with scan_mode="pallas" (the new native
stateful kernel) vs scan_mode="parallel" (the old fallback tier), same
utterances, same chunking.

Usage: python tools/bench_streaming_rtf.py [ckpt_dir] [n_utts]
Prints one JSON line per mode plus a speedup summary.
"""

import dataclasses
import json
import sys
import time

sys.path.insert(0, ".")

from velocity_asr_tpu.utils.platform import apply_platform_env  # noqa: E402

apply_platform_env()

import numpy as np  # noqa: E402


def main():
    ckpt = sys.argv[1] if len(sys.argv) > 1 else "checkpoints/synth_run/final_pretrained"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 64

    from velocity_asr_tpu.audio import SAMPLE_RATE
    from velocity_asr_tpu.decode import CTCDecoder
    from velocity_asr_tpu.models.model import create_model, from_pretrained
    from velocity_asr_tpu.streaming import BatchedStreamingTranscriber
    from velocity_asr_tpu.synth import SyntheticSpeechDataset

    model, params = from_pretrained(ckpt)
    import json as _json
    import os

    vocab = _json.load(open(os.path.join(ckpt, "vocabulary.json")))
    decoder = CTCDecoder(vocab)

    # Long utterances exercise many chunks (where the scan tier dominates).
    ds = SyntheticSpeechDataset(
        n, split="rtfbench", seed=77, min_words=30, max_words=60
    )
    audios = [np.asarray(ds.audio_for(i), np.float32) for i in range(n)]
    total_s = sum(len(a) for a in audios) / SAMPLE_RATE
    print(f"{n} utterances, {total_s:.1f} audio-s total", file=sys.stderr)

    results = {}
    for mode in ("pallas", "parallel"):
        m = create_model(dataclasses.replace(model.config, scan_mode=mode))
        st = BatchedStreamingTranscriber(m, params, decoder, batch_size=16)
        # Warm up (compile) on a small slice, then time the full set.
        st.transcribe_batch(audios[:16])
        t0 = time.perf_counter()
        texts = []
        for s in range(0, n, 16):
            texts += st.transcribe_batch(audios[s : s + 16])
        wall = time.perf_counter() - t0
        rtf = wall / total_s
        results[mode] = rtf
        print(json.dumps({
            "metric": "streaming_rtf", "scan_mode": mode,
            "value": round(rtf, 5), "unit": "wall_s_per_audio_s",
            "wall_s": round(wall, 2), "n_utts": n,
        }))

    print(json.dumps({
        "metric": "streaming_pallas_speedup",
        "value": round(results["parallel"] / results["pallas"], 2),
        "unit": "x_vs_xla_assoc_scan_tier",
    }))


if __name__ == "__main__":
    main()
