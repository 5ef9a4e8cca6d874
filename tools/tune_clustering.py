#!/usr/bin/env python3
"""Offline clustering tuner for the diarization pipeline.

Embeds every window of a set of synthetic conversations ONCE (the slow,
device-bound part), then scores clustering variants host-side against the
reference segments — so clusterer changes iterate in seconds. Tune on
--split dev; report only the shipped configuration on --split test
(scripts/diarize.py eval).

Usage:
  JAX_PLATFORMS=cpu python tools/tune_clustering.py \
      --speaker-model checkpoints/speaker_run/final_speaker --split dev
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from velocity_asr_tpu.utils.platform import apply_platform_env

apply_platform_env()

import numpy as np


def extract(args):
    from velocity_asr_tpu.audio import compute_mel_spectrogram_np
    from velocity_asr_tpu.diarize import (
        DiarizeConfig, Diarizer, energy_vad, speech_regions, window_plan,
    )
    from velocity_asr_tpu.synth import SyntheticConversationDataset

    ds = SyntheticConversationDataset(
        n_convs=args.num_convs, speakers_range=(2, 4), split=args.split,
        seed=args.seed,
    )
    diar = Diarizer(
        args.speaker_model,
        config=DiarizeConfig(vad_threshold=args.vad_threshold),
    )
    cache = []
    for i in range(len(ds)):
        item = ds[i]
        mel_raw = compute_mel_spectrogram_np(item["audio"], normalize=False)
        cfg = diar.config
        speech = energy_vad(mel_raw, cfg.vad_threshold, cfg.min_speech_s,
                            cfg.min_gap_s)
        plan = window_plan(speech_regions(speech), diar.window_frames,
                           diar.hop_frames)
        emb = diar.embed_windows(mel_raw, plan)
        cache.append({
            "emb": emb, "plan": plan, "speech": speech,
            "segments": item["segments"], "n_speakers": item["n_speakers"],
            "n_frames": mel_raw.shape[0],
        })
        print(f"conv {i}: {len(plan)} windows, {item['n_speakers']} speakers",
              file=sys.stderr)
    return cache


def assemble_and_score(rec, labels, collar=0.25):
    """Frame-vote segment assembly (mirrors Diarizer.diarize) + DER."""
    from velocity_asr_tpu.diarize import FRAME_S, Segment, diarization_error_rate

    n_clusters = int(labels.max()) + 1 if labels.size else 0
    votes = np.zeros((rec["n_frames"], max(n_clusters, 1)), np.int32)
    for (start, valid), lab in zip(rec["plan"], labels):
        votes[start:start + valid, lab] += 1
    covered = votes.sum(axis=1) > 0
    frame_lab = votes.argmax(axis=1)
    active = rec["speech"] & covered
    segs, prev, seg_start = [], None, 0
    for t in range(len(active) + 1):
        cur = int(frame_lab[t]) if t < len(active) and active[t] else None
        if cur != prev:
            if prev is not None:
                segs.append(Segment(seg_start * FRAME_S, t * FRAME_S, prev))
            seg_start, prev = t, cur
    der = diarization_error_rate(
        rec["segments"], [s.to_dict() for s in segs], collar=collar)
    der["n_hyp"] = len({s.speaker for s in segs})
    return der


def run_variant(cache, fn, name, known=False):
    miss = fa = conf = total = 0.0
    count_ok = 0
    for rec in cache:
        labels = fn(rec["emb"], rec["n_speakers"] if known else None)
        der = assemble_and_score(rec, labels)
        miss += der["miss"]; fa += der["false_alarm"]
        conf += der["confusion"]; total += der["total"]
        count_ok += der["n_hyp"] == rec["n_speakers"]
    agg = {
        "variant": name, "known": known,
        "der": (miss + fa + conf) / total,
        "miss": miss / total, "fa": fa / total, "conf": conf / total,
        "count_acc": count_ok / len(cache),
    }
    print(json.dumps({k: round(v, 4) if isinstance(v, float) else v
                      for k, v in agg.items()}))
    return agg


def load_or_extract(args):
    """Cache the embeddings (the slow part) so clusterer variants iterate
    in seconds."""
    if args.cache and os.path.exists(args.cache):
        data = np.load(args.cache, allow_pickle=True)
        return list(data["cache"])
    cache = extract(args)
    if args.cache:
        np.savez_compressed(args.cache, cache=np.asarray(cache, object))
    return cache


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--speaker-model", required=True)
    ap.add_argument("--split", default="dev")
    ap.add_argument("--num-convs", type=int, default=20)
    ap.add_argument("--seed", type=int, default=1234)
    ap.add_argument("--cache", help="npz path: save/load extracted embeddings")
    ap.add_argument("--vad-threshold", type=float, default=0.35)
    args = ap.parse_args()

    from velocity_asr_tpu.diarize import (
        cluster_embeddings, reassign_to_centroids, spectral_cluster_embeddings,
    )

    cache = load_or_extract(args)

    def refined(fn, iters=2):
        def wrapped(e, k):
            lab = fn(e, k)
            return reassign_to_centroids(e, lab, iters) if lab.size else lab
        return wrapped

    for thr in (0.35, 0.45, 0.55, 0.65):
        run_variant(cache,
                    lambda e, k, t=thr: cluster_embeddings(e, k, threshold=t),
                    f"ahc_t{thr}")
    run_variant(cache, lambda e, k: cluster_embeddings(e, k), "ahc", known=True)
    run_variant(cache, lambda e, k: spectral_cluster_embeddings(e, k),
                "spectral")
    run_variant(cache, lambda e, k: spectral_cluster_embeddings(e, k),
                "spectral", known=True)
    run_variant(cache, refined(lambda e, k: spectral_cluster_embeddings(e, k)),
                "spectral+reassign")
    run_variant(cache, refined(lambda e, k: spectral_cluster_embeddings(e, k)),
                "spectral+reassign", known=True)


if __name__ == "__main__":
    main()
