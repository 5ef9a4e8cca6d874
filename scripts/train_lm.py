#!/usr/bin/env python3
"""Train the character n-gram LM for beam-search shallow fusion.

The reference's beam search declares an external-LM hook
(`lm_scorer`/`lm_weight`, reference decode.py:188-190) but ships no
language model; velocity_asr_tpu.lm implements an interpolated
Kneser-Ney char n-gram behind that exact contract. Text sources:

  # from a JSONL manifest's text fields
  python scripts/train_lm.py --manifest data/train.jsonl --out lm.json.gz

  # from the synthetic training corpus (matches the shipped checkpoint)
  python scripts/train_lm.py --synthetic 50000 --out lm.json.gz

  # from a plain-text file (one sentence per line)
  python scripts/train_lm.py --text corpus.txt --checkpoint ckpt_dir --out lm.json.gz

The LM must share the decoder's token ids: pass --checkpoint to read the
checkpoint's vocabulary.json (otherwise --synthetic uses the synthetic
corpus vocabulary). Use with `transcribe/evaluate --lm lm.json.gz
--lm-weight 0.5 --beam-width 8`.
"""

import argparse
import json
import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

logging.basicConfig(
    level=logging.INFO, format="%(asctime)s | %(levelname)s | %(message)s"
)
logger = logging.getLogger("train_lm")


def main():
    parser = argparse.ArgumentParser(description="Train a char n-gram LM")
    src = parser.add_mutually_exclusive_group(required=True)
    src.add_argument("--manifest", help="JSONL manifest with text fields")
    src.add_argument("--text", help="plain-text file, one sentence per line")
    src.add_argument("--synthetic", type=int, metavar="N",
                     help="N sentences from the synthetic training corpus")
    parser.add_argument("--checkpoint",
                        help="checkpoint dir whose vocabulary.json defines "
                             "the token ids (required for --manifest/--text)")
    parser.add_argument("--order", type=int, default=5)
    parser.add_argument("--out", default="lm.json.gz")
    parser.add_argument("--holdout", type=int, default=500,
                        help="sentences held out for the perplexity report")
    parser.add_argument("--seed", type=int, default=1234,
                        help="synthetic corpus seed")
    args = parser.parse_args()

    from velocity_asr_tpu.lm import CharNGramLM

    if args.synthetic:
        from velocity_asr_tpu.synth import SyntheticSpeechDataset

        ds = SyntheticSpeechDataset(args.synthetic, split="train",
                                    seed=args.seed)
        texts = [ds.text_for(i) for i in range(args.synthetic)]
        token_to_idx = dict(ds.vocab)
        if args.checkpoint:
            token_to_idx = _load_vocab(args.checkpoint, parser)
    else:
        if not args.checkpoint:
            parser.error("--manifest/--text need --checkpoint for the "
                         "vocabulary mapping")
        token_to_idx = _load_vocab(args.checkpoint, parser)
        texts = []
        if args.manifest:
            with open(args.manifest) as f:
                for line in f:
                    line = line.strip()
                    if line:
                        texts.append(json.loads(line)["text"].lower())
        else:
            with open(args.text) as f:
                texts = [ln.strip().lower() for ln in f if ln.strip()]
    if not texts:
        parser.error("no training texts found")

    holdout = texts[: args.holdout] if len(texts) > 2 * args.holdout else []
    train_texts = texts[len(holdout):]
    logger.info("Training order-%d char LM on %d sentences (%d held out)",
                args.order, len(train_texts), len(holdout))
    lm = CharNGramLM.train(train_texts, token_to_idx, order=args.order)
    lm.save(args.out)
    size_mb = os.path.getsize(args.out) / 1e6
    logger.info("Saved %s (%.2f MB)", args.out, size_mb)
    if holdout:
        ppl = lm.perplexity(holdout)
        ppl_train = lm.perplexity(train_texts[: args.holdout])
        logger.info("Per-char perplexity: held-out %.3f, train %.3f "
                    "(uniform over %d tokens would be %d)",
                    ppl, ppl_train, lm.vocab_size, lm.vocab_size)


def _load_vocab(checkpoint: str, parser):
    vocab_path = os.path.join(checkpoint, "vocabulary.json")
    if not os.path.exists(vocab_path):
        parser.error(f"{vocab_path} not found")
    with open(vocab_path) as f:
        vocab = json.load(f)
    return {tok: i for i, tok in enumerate(vocab)}


if __name__ == "__main__":
    main()
