"""Ablate the streaming-vs-offline WER gap into its two causes.

The streaming local path (SSM + causal convs) is numerically exact
chunked evaluation (ops/scan.py h0 carry), so the residual gap
(5.84% streaming vs 3.64% offline after the length-extension fine-tune)
can only come from:

  (a) causal mel normalization — running per-bin stats instead of the
      whole-utterance stats the offline front-end uses;
  (b) the global-context approximation — per-chunk summary tokens with a
      rolling memory of PAST chunks, vs offline pooling over the whole
      utterance (frames never see future context).

This tool measures four conditions on the synthetic test set:

  A. offline graph + offline mel            (baseline, = eval_fp32_final)
  B. offline graph + causal mel             (isolates (a))
  C. streaming pipeline + oracle offline mel (isolates (b))
  D. streaming pipeline + causal mel        (baseline, = eval_streaming)

Usage:
  python tools/ablate_streaming_gap.py --checkpoint \
      checkpoints/synth_run/final_pretrained [--max-utts 1000]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from velocity_asr_tpu.utils.platform import apply_platform_env  # noqa: E402

apply_platform_env()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", default="checkpoints/synth_run/final_pretrained")
    ap.add_argument("--test-set", default="data/synth_test/test_manifest.jsonl")
    ap.add_argument("--max-utts", type=int, default=1000)
    ap.add_argument("--batch-size", type=int, default=16)
    ap.add_argument("--chunk-frames", type=int, default=200)
    ap.add_argument("--output", default=None)
    args = ap.parse_args()

    from velocity_asr_tpu.audio import compute_mel_spectrogram, load_audio
    from velocity_asr_tpu.data import ASRDataset
    from velocity_asr_tpu.decode import create_default_vocabulary, CTCDecoder
    from velocity_asr_tpu.decode import ctc_greedy_decode_jax
    from velocity_asr_tpu.models.model import forward, from_pretrained
    from velocity_asr_tpu.streaming import BatchedStreamingTranscriber
    from velocity_asr_tpu.training import compute_cer, compute_wer

    model, params = from_pretrained(args.checkpoint)
    vocab_path = os.path.join(args.checkpoint, "vocabulary.json")
    if os.path.exists(vocab_path):
        vocabulary = json.load(open(vocab_path))
    else:
        vocabulary = create_default_vocabulary(model.config.vocab_size)
    decoder = CTCDecoder(vocabulary)

    ds = ASRDataset(args.test_set)
    n = min(len(ds.samples), args.max_utts) if args.max_utts else len(ds.samples)
    pairs = [(s["audio_path"], s["text"]) for s in ds.samples[:n]]
    audios = [np.asarray(load_audio(p)) for p, _ in pairs]
    refs = [t for _, t in pairs]
    print(f"{n} utterances loaded", flush=True)

    st = BatchedStreamingTranscriber(
        model, params, decoder, chunk_frames=args.chunk_frames,
        batch_size=args.batch_size,
    )

    def causal_mel(a):
        return st._causal_mel(a)

    def offline_mel(a):
        return np.asarray(compute_mel_spectrogram(a))

    # ---- offline-graph decode over precomputed mels, bucketed ----
    bucket = 100

    @jax.jit
    def greedy_tokens(p, mel, out_lens):
        logits = forward(model, p, mel, train=False)
        t_frames = logits.shape[1]
        pad = (jnp.arange(t_frames)[None, :] >= out_lens[:, None])[:, :, None]
        logits = jnp.where(pad, -1e9, logits)
        logits = logits.at[:, :, 0].set(
            jnp.where(pad[..., 0], 0.0, logits[:, :, 0]))
        return ctc_greedy_decode_jax(logits)

    def offline_decode(mels):
        preds = []
        for s in range(0, len(mels), args.batch_size):
            group = mels[s : s + args.batch_size]
            max_f = max(m.shape[0] for m in group)
            max_f = -(-max_f // bucket) * bucket
            mel = np.zeros((len(group), max_f, group[0].shape[1]), np.float32)
            for i, m in enumerate(group):
                mel[i, : m.shape[0]] = m
            out_lens = jnp.asarray([(m.shape[0] + 1) // 2 for m in group])
            toks, lens = greedy_tokens(params, jnp.asarray(mel), out_lens)
            toks, lens = np.asarray(toks), np.asarray(lens)
            preds.extend(
                decoder._tokens_to_text(toks[b, : lens[b]].tolist())
                for b in range(len(group))
            )
        return preds

    results = {}

    def report(name, preds):
        wer, cer = compute_wer(preds, refs), compute_cer(preds, refs)
        results[name] = {"wer": wer, "cer": cer}
        print(f"{name:44s} WER {wer*100:6.2f}%  CER {cer*100:5.2f}%", flush=True)

    t0 = time.perf_counter()
    report("A offline graph + offline mel (baseline)",
           offline_decode([offline_mel(a) for a in audios]))
    report("B offline graph + causal mel (ablate norm)",
           offline_decode([causal_mel(a) for a in audios]))

    orig = BatchedStreamingTranscriber._causal_mel
    BatchedStreamingTranscriber._causal_mel = lambda self, a: offline_mel(a)
    report("C streaming + oracle offline mel (ablate gc)",
           st.transcribe_batch(audios))
    BatchedStreamingTranscriber._causal_mel = orig
    report("D streaming + causal mel (baseline)",
           st.transcribe_batch(audios))
    print(f"total {time.perf_counter() - t0:.0f}s")

    if args.output:
        json.dump(results, open(args.output, "w"), indent=2)


if __name__ == "__main__":
    main()
