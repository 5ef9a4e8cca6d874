#!/usr/bin/env python3
"""Summarize the label-efficiency grid (VERDICT r3 item 5).

Reads checkpoints/ft{2,10,100}_{scratch,pretrained}/eval_fp32.json and
prints the scratch-vs-pretrained WER curve with relative wins.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LEGS = [("2%", "ft2"), ("10%", "ft10"), ("100%", "ft100")]


def main():
    rows = []
    for label, stem in LEGS:
        pair = {}
        for init in ("scratch", "pretrained"):
            p = f"checkpoints/{stem}_{init}/eval_fp32.json"
            if os.path.exists(p):
                pair[init] = json.load(open(p))
        if "scratch" in pair and "pretrained" in pair:
            s, pt = pair["scratch"]["wer"], pair["pretrained"]["wer"]
            rel = (s - pt) / s * 100 if s > 0 else 0.0
            rows.append((label, s, pt, rel))
        elif pair:
            rows.append((label,
                         pair.get("scratch", {}).get("wer"),
                         pair.get("pretrained", {}).get("wer"), None))
    print(f"{'labels':>7} | {'scratch WER':>11} | {'pretrained WER':>14} | rel win")
    for label, s, pt, rel in rows:
        sw = f"{s*100:.2f}%" if s is not None else "—"
        pw = f"{pt*100:.2f}%" if pt is not None else "—"
        rw = f"{rel:+.1f}%" if rel is not None else "—"
        print(f"{label:>7} | {sw:>11} | {pw:>14} | {rw}")


if __name__ == "__main__":
    main()
