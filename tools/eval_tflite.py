"""End-task WER of the exported .tflite artifact (no JAX at inference).

Measures what a user of the edge artifact actually gets: host-side mel
(numpy), the TFLite interpreter for the forward pass, host greedy CTC
decode. The reference reports its ONNX-int8 artifact at 4.5% vs 4.2% fp32
on LibriSpeech test-clean (README.md:255); this is the TPU-native
framework's equivalent measurement on the synthetic corpus.

Usage:
  python scripts/export_model.py --checkpoint ... --output-dir export \
      --frames 608 --tflite dynamic
  python tools/eval_tflite.py --tflite export/velocity_asr.tflite
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tflite", default="export/velocity_asr.tflite")
    ap.add_argument("--checkpoint", default="checkpoints/synth_run/final_pretrained")
    ap.add_argument("--test-set", default="data/synth_test/test_manifest.jsonl")
    ap.add_argument("--max-utts", type=int, default=200)
    ap.add_argument("--output", default=None)
    args = ap.parse_args()

    import tensorflow as tf

    from velocity_asr_tpu.audio import compute_mel_spectrogram_np, load_audio
    from velocity_asr_tpu.data import ASRDataset
    from velocity_asr_tpu.decode import BLANK_TOKEN, CTCDecoder, create_default_vocabulary
    from velocity_asr_tpu.training import compute_cer, compute_wer

    vocab_path = os.path.join(args.checkpoint, "vocabulary.json")
    if os.path.exists(vocab_path):
        vocabulary = json.load(open(vocab_path))
    else:
        vocabulary = create_default_vocabulary(1000)
    decoder = CTCDecoder(vocabulary)

    interp = tf.lite.Interpreter(model_path=args.tflite)
    interp.allocate_tensors()
    inp = interp.get_input_details()[0]
    out = interp.get_output_details()[0]
    frames_cap = inp["shape"][1]

    ds = ASRDataset(args.test_set)
    n = min(len(ds.samples), args.max_utts) if args.max_utts else len(ds.samples)
    preds, refs = [], []
    wall, audio_s = 0.0, 0.0
    for i in range(n):
        s = ds.samples[i]
        audio = load_audio(s["audio_path"])
        audio_s += len(audio) / 16000.0
        mel = compute_mel_spectrogram_np(np.asarray(audio))
        if mel.shape[0] > frames_cap:
            raise SystemExit(
                f"{s['audio_path']}: {mel.shape[0]} frames > artifact cap "
                f"{frames_cap}; re-export with --frames >= {mel.shape[0]}")
        out_len = (mel.shape[0] + 1) // 2
        buf = np.zeros((1, frames_cap, mel.shape[1]), np.float32)
        buf[0, : mel.shape[0]] = mel
        t0 = time.perf_counter()
        interp.set_tensor(inp["index"], buf)
        interp.invoke()
        logits = interp.get_tensor(out["index"])[0, :out_len]
        wall += time.perf_counter() - t0
        toks, prev = [], BLANK_TOKEN
        for t in logits.argmax(-1):
            t = int(t)
            if t != BLANK_TOKEN and t != prev:
                toks.append(t)
            prev = t
        preds.append(decoder._tokens_to_text(toks))
        refs.append(s["text"])
        if i % 50 == 0:
            print(f"  {i}/{n}", flush=True)

    wer, cer = compute_wer(preds, refs), compute_cer(preds, refs)
    rtf = wall / max(audio_s, 1e-9)
    print(f"TFLITE WER {wer*100:.2f}%  CER {cer*100:.2f}%  "
          f"cpu RTF {rtf:.4f}  ({n} utts)", flush=True)
    if args.output:
        json.dump({"wer": wer, "cer": cer, "rtf_cpu": rtf, "utterances": n},
                  open(args.output, "w"), indent=2)


if __name__ == "__main__":
    main()
