#!/usr/bin/env python3
"""Download LibriSpeech and write JSONL manifests
(reference scripts/download_librispeech.py).

Downloads official openslr.org tarballs with urllib (no torchaudio),
extracts them under <root>/LibriSpeech/<split>/, and writes per-split +
combined manifests in the reference's format
(scripts/download_librispeech.py:133-141):
  {"audio_path": ..., "text": ..., "duration": ..., "speaker_id": ...,
   "chapter_id": ..., "utterance_id": ...}
"""

import argparse
import json
import logging
import os
import sys
import tarfile
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

logging.basicConfig(
    level=logging.INFO, format="%(asctime)s | %(levelname)s | %(message)s"
)
logger = logging.getLogger("download_librispeech")

BASE_URL = "https://www.openslr.org/resources/12/"

TRAIN_SPLITS = ["train-clean-100", "train-clean-360", "train-other-500"]
DEV_SPLITS = ["dev-clean", "dev-other"]
TEST_SPLITS = ["test-clean", "test-other"]


def download_split(root: str, split: str) -> str:
    split_dir = os.path.join(root, "LibriSpeech", split)
    if os.path.isdir(split_dir):
        logger.info("%s already present, skipping download", split)
        return split_dir
    url = f"{BASE_URL}{split}.tar.gz"
    tar_path = os.path.join(root, f"{split}.tar.gz")
    os.makedirs(root, exist_ok=True)
    logger.info("Downloading %s ...", url)
    urllib.request.urlretrieve(url, tar_path)
    logger.info("Extracting %s ...", tar_path)
    with tarfile.open(tar_path, "r:gz") as tf:
        tf.extractall(root)
    os.remove(tar_path)
    return split_dir


def flac_duration_seconds(path: str) -> float:
    """Read total_samples/sample_rate from the FLAC STREAMINFO header."""
    with open(path, "rb") as f:
        head = f.read(4 + 4 + 34)
    if head[:4] != b"fLaC":
        return 0.0
    body = head[8:]
    sample_rate = (body[10] << 12) | (body[11] << 4) | (body[12] >> 4)
    total = ((body[13] & 0x0F) << 32) | int.from_bytes(body[14:18], "big")
    return total / sample_rate if sample_rate else 0.0


def write_manifest(root: str, split: str, manifest_path: str) -> int:
    split_dir = os.path.join(root, "LibriSpeech", split)
    count = 0
    with open(manifest_path, "w", encoding="utf-8") as out:
        for speaker in sorted(os.listdir(split_dir)):
            spk_dir = os.path.join(split_dir, speaker)
            if not os.path.isdir(spk_dir):
                continue
            for chapter in sorted(os.listdir(spk_dir)):
                chap_dir = os.path.join(spk_dir, chapter)
                trans = os.path.join(chap_dir, f"{speaker}-{chapter}.trans.txt")
                if not os.path.exists(trans):
                    continue
                with open(trans, "r", encoding="utf-8") as f:
                    for line in f:
                        utt_id, _, text = line.strip().partition(" ")
                        flac = os.path.join(chap_dir, f"{utt_id}.flac")
                        if not os.path.exists(flac):
                            continue
                        out.write(
                            json.dumps(
                                {
                                    "audio_path": os.path.abspath(flac),
                                    "text": text.lower(),
                                    "duration": round(flac_duration_seconds(flac), 3),
                                    "speaker_id": speaker,
                                    "chapter_id": chapter,
                                    "utterance_id": utt_id,
                                }
                            )
                            + "\n"
                        )
                        count += 1
    logger.info("Wrote %d entries to %s", count, manifest_path)
    return count


def main():
    parser = argparse.ArgumentParser(description="Download LibriSpeech + manifests")
    parser.add_argument("--root", default="./data")
    parser.add_argument(
        "--splits", nargs="+",
        default=["train-clean-100", "dev-clean", "test-clean"],
        help=f"any of {TRAIN_SPLITS + DEV_SPLITS + TEST_SPLITS}",
    )
    parser.add_argument("--manifest-only", action="store_true",
                        help="skip downloads; just (re)write manifests")
    args = parser.parse_args()

    for split in args.splits:
        if not args.manifest_only:
            download_split(args.root, split)
        write_manifest(args.root, split, os.path.join(args.root, f"{split}.jsonl"))

    # combined train/dev manifests (reference writes train-all/dev-all)
    for combo, members in [("train-all", TRAIN_SPLITS), ("dev-all", DEV_SPLITS)]:
        parts = [
            os.path.join(args.root, f"{s}.jsonl")
            for s in members
            if os.path.exists(os.path.join(args.root, f"{s}.jsonl"))
        ]
        if parts:
            combo_path = os.path.join(args.root, f"{combo}.jsonl")
            with open(combo_path, "w") as out:
                for p in parts:
                    out.write(open(p).read())
            logger.info("Wrote %s (%d splits)", combo_path, len(parts))


if __name__ == "__main__":
    main()
