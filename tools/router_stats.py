#!/usr/bin/env python3
"""Per-language MoE router utilization (VERDICT r4 item 6 evidence).

Feeds N utterances per language from a labeled manifest (e.g.
data/synth_test_ml/test_manifest.jsonl) through an MoE checkpoint with
the "router_stats" collection requested (models/moe.py sows the
per-expert first-choice dispatch fractions per layer), and reports:

- per (language, layer): the expert utilization distribution,
- per layer: max pairwise Jensen-Shannon divergence between languages'
  distributions — the quantitative "did the router specialize by
  language" evidence,
- global: min/max expert utilization (dead-expert / collapse check).

Usage:
  python tools/router_stats.py --checkpoint checkpoints/multilang_moe_run/final_pretrained \
      --test-set data/synth_test_ml/test_manifest.jsonl \
      --per-language 64 --output /tmp/router_stats.json
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from velocity_asr_tpu.utils.platform import apply_platform_env

apply_platform_env()


def js_divergence(p, q):
    import numpy as np

    p = np.asarray(p, np.float64) + 1e-12
    q = np.asarray(q, np.float64) + 1e-12
    p, q = p / p.sum(), q / q.sum()
    m = 0.5 * (p + q)
    kl = lambda a, b: float(np.sum(a * np.log(a / b)))  # noqa: E731
    return 0.5 * kl(p, m) + 0.5 * kl(q, m)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--test-set", default="data/synth_test_ml/test_manifest.jsonl")
    ap.add_argument("--per-language", type=int, default=64)
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--output", default=None)
    args = ap.parse_args()

    import jax
    import numpy as np

    from velocity_asr_tpu.audio import compute_mel_spectrogram_np, load_audio
    from velocity_asr_tpu.models.model import from_pretrained

    model, params = from_pretrained(args.checkpoint)
    if getattr(model.config, "moe_experts", 0) <= 0:
        sys.exit("checkpoint has no MoE layers (moe_experts == 0)")

    rows_by_lang = {}
    base = os.path.dirname(os.path.abspath(args.test_set))
    with open(args.test_set) as f:
        for line in f:
            row = json.loads(line)
            lang = int(row.get("language", 0))
            if len(rows_by_lang.setdefault(lang, [])) < args.per_language:
                rows_by_lang[lang].append(row)

    @jax.jit
    def probe(params, mel):
        _, mutated = model.apply(
            {"params": params}, mel, train=False, mutable=["router_stats"]
        )
        # {layer_name: {"f_frac": (tuple of (E,))}} -> stacked (L, E)
        stats = mutated["router_stats"]["local_ssm"]
        names = sorted(stats.keys())
        import jax.numpy as jnp

        return jnp.stack([stats[n]["moe"]["f_frac"][0] for n in names])

    def mel_batch(rows):
        mels = []
        for r in rows:
            path = r["audio_path"]
            if not os.path.exists(path):
                path = os.path.join(base, os.path.basename(path))
            mels.append(compute_mel_spectrogram_np(load_audio(path)))
        t = max(m.shape[0] for m in mels)
        t = -(-t // 200) * 200  # frame bucket
        out = np.zeros((len(mels), t, mels[0].shape[1]), np.float32)
        for i, m in enumerate(mels):
            out[i, : m.shape[0]] = m
        return out

    per_lang = {}
    for lang, rows in sorted(rows_by_lang.items()):
        acc = None
        nb = 0
        for i in range(0, len(rows), args.batch_size):
            mel = mel_batch(rows[i : i + args.batch_size])
            s = np.asarray(probe(params, mel))  # (L, E)
            acc = s if acc is None else acc + s
            nb += 1
        per_lang[lang] = acc / nb  # (L, E) mean utilization

    langs = sorted(per_lang)
    n_layers, n_exp = per_lang[langs[0]].shape
    layers = []
    for l in range(n_layers):
        dists = {g: per_lang[g][l] for g in langs}
        max_js = max(
            (js_divergence(dists[a], dists[b])
             for ai, a in enumerate(langs) for b in langs[ai + 1 :]),
            default=0.0,
        )
        layers.append({
            "layer": l,
            "max_pairwise_js": round(max_js, 4),
            "per_language_util": {
                str(g): [round(float(x), 4) for x in dists[g]] for g in langs
            },
        })
    all_util = np.stack([per_lang[g] for g in langs]).mean(axis=0)  # (L, E)
    report = {
        "checkpoint": args.checkpoint,
        "num_experts": n_exp,
        "per_language_utts": {str(g): len(rows_by_lang[g]) for g in langs},
        "min_expert_util": round(float(all_util.min()), 4),
        "max_expert_util": round(float(all_util.max()), 4),
        "mean_max_pairwise_js": round(
            float(np.mean([x["max_pairwise_js"] for x in layers])), 4
        ),
        "layers": layers,
    }
    out = json.dumps(report, indent=1)
    print(out)
    if args.output:
        with open(args.output, "w") as f:
            f.write(out)


if __name__ == "__main__":
    main()
