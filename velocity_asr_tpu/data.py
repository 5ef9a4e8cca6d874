"""Data pipeline (reference data.py).

Host-side datasets + a threaded, prefetching loader feeding padded,
length-bucketed numpy batches to the device. Bucketing replaces the
reference's pad-to-batch-max collation (data.py:162-203) so XLA sees a
small set of static shapes.

No torch dependency: audio decode goes through velocity_asr_tpu.io
(native C++ WAV/FLAC decoder with Python WAV fallback), and LibriSpeech is
read directly from its on-disk layout instead of torchaudio.datasets.
"""

from __future__ import annotations

import json
import logging
import os
import queue
import random
import threading
from typing import Any, Callable, Dict, Iterator, List, Optional, Tuple

import numpy as np

from .audio import HOP_LENGTH, SAMPLE_RATE, compute_mel_spectrogram_np
from .audio import load_audio

logger = logging.getLogger(__name__)

PAD_TOKEN_ID = 2  # <pad> (reference data.py:99)


class ASRDataset:
    """Manifest-backed dataset (reference ASRDataset, data.py:19-142).

    Manifest format (JSON lines): {"audio_path": ..., "text": ...,
    "duration": ...}. Filters by duration (0.5-30 s defaults), skips
    missing files, and builds a character vocabulary from the corpus
    (<blank>=0, <unk>=1, <pad>=2, then sorted chars — data.py:86-105).
    """

    def __init__(
        self,
        manifest_path: str,
        tokenizer: Optional[Any] = None,
        max_duration: Optional[float] = 30.0,
        min_duration: float = 0.5,
        sample_rate: int = SAMPLE_RATE,
        normalize_audio: bool = True,
        device_mel: bool = False,
    ):
        self.manifest_path = manifest_path
        self.tokenizer = tokenizer
        self.max_duration = max_duration
        self.min_duration = min_duration
        self.sample_rate = sample_rate
        self.normalize_audio = normalize_audio
        # device_mel: skip the host mel transform; items carry raw audio and
        # the train step computes the (fused Pallas) mel on device — the
        # host pipeline then only decodes audio, which is what lets one
        # host feed a multi-chip data-parallel mesh
        # (tools/bench_input_pipeline.py measures the margin).
        self.device_mel = device_mel
        if device_mel and not normalize_audio:
            # The device-mel train step always applies masked
            # normalization on device; silently ignoring the flag would
            # make host-mel and device-mel runs of the "same" config
            # produce different features.
            raise ValueError(
                "normalize_audio=False is not supported with device_mel "
                "(the train step normalizes on device); use host mel"
            )

        self.samples = self._load_manifest()
        self.vocab = self._build_vocab() if tokenizer is None else None

    def _load_manifest(self) -> List[Dict[str, Any]]:
        samples = []
        with open(self.manifest_path, "r", encoding="utf-8") as f:
            for line in f:
                if not line.strip():
                    continue
                entry = json.loads(line)
                # An absent duration is unknown, not zero: keep the entry
                # (dropping it via the min filter would silently shrink
                # manifests that omit the optional field).
                duration = entry.get("duration")
                if duration is not None:
                    if duration < self.min_duration:
                        continue
                    if self.max_duration and duration > self.max_duration:
                        continue
                if not os.path.exists(entry["audio_path"]):
                    continue
                samples.append(entry)
        return samples

    def _build_vocab(self) -> Dict[str, int]:
        chars = set()
        for sample in self.samples:
            # "text" is optional: calibration / transcription-only manifests
            # carry audio paths without transcripts.
            chars.update(sample.get("text", ""))
        vocab = {"<blank>": 0, "<unk>": 1, "<pad>": 2}
        for i, char in enumerate(sorted(chars)):
            vocab[char] = i + 3
        return vocab

    def text_to_tokens(self, text: str) -> List[int]:
        if self.tokenizer is not None:
            return self.tokenizer.encode(text)
        unk = self.vocab["<unk>"]
        return [self.vocab.get(c, unk) for c in text]

    def __len__(self) -> int:
        return len(self.samples)

    def __getitem__(self, idx: int) -> Dict[str, Any]:
        sample = self.samples[idx]
        audio = load_audio(sample["audio_path"], sample_rate=self.sample_rate)
        text = sample.get("text", "")
        tokens = self.text_to_tokens(text)
        item = {
            "targets": np.asarray(tokens, np.int32),
            "target_lengths": np.int32(len(tokens)),
            "text": text,
        }
        if "language" in sample:
            # Optional integer language-ID label (multilingual training;
            # feeds the model's LID head via training.lid_loss_weight).
            item["language"] = np.int32(sample["language"])
        if self.device_mel:
            item["audio"] = np.asarray(audio, np.float32)
            item["input_lengths"] = np.int32(1 + len(audio) // HOP_LENGTH)
        else:
            mel = compute_mel_spectrogram_np(audio, normalize=self.normalize_audio)
            item["mel_spectrogram"] = mel
            item["input_lengths"] = np.int32(mel.shape[0])
        return item


def _round_up(n: int, multiple: int) -> int:
    return ((n + multiple - 1) // multiple) * multiple


class ASRCollator:
    """Batch collation with padding (reference ASRCollator, data.py:145-203).

    TPU addition: lengths are rounded up to `frame_bucket` / `target_bucket`
    multiples so batch shapes repeat and XLA compiles once per bucket
    instead of once per batch (set both to 1 for reference-exact padding).
    """

    def __init__(
        self,
        pad_token_id: int = PAD_TOKEN_ID,
        mel_pad_value: float = 0.0,
        frame_bucket: int = 100,
        target_bucket: int = 32,
    ):
        self.pad_token_id = pad_token_id
        self.mel_pad_value = mel_pad_value
        self.frame_bucket = max(frame_bucket, 1)
        self.target_bucket = max(target_bucket, 1)

    def __call__(self, batch: List[Dict[str, Any]]) -> Dict[str, Any]:
        if "audio" in batch[0]:
            return self._collate_audio(batch)
        max_mel = _round_up(
            max(item["mel_spectrogram"].shape[0] for item in batch), self.frame_bucket
        )
        max_tgt = _round_up(
            max(1, max(item["targets"].shape[0] for item in batch)), self.target_bucket
        )

        n = len(batch)
        mel_bins = batch[0]["mel_spectrogram"].shape[1]
        mels = np.full((n, max_mel, mel_bins), self.mel_pad_value, np.float32)
        targets = np.full((n, max_tgt), self.pad_token_id, np.int32)
        input_lengths = np.empty((n,), np.int32)
        target_lengths = np.empty((n,), np.int32)
        texts = []

        for i, item in enumerate(batch):
            m, t = item["mel_spectrogram"], item["targets"]
            mels[i, : m.shape[0]] = m
            targets[i, : t.shape[0]] = t
            input_lengths[i] = item["input_lengths"]
            target_lengths[i] = item["target_lengths"]
            texts.append(item.get("text", ""))

        out = {
            "mel_spectrogram": mels,
            "targets": targets,
            "input_lengths": input_lengths,
            "target_lengths": target_lengths,
            "texts": texts,
        }
        self._collate_language(batch, out)
        return out

    @staticmethod
    def _collate_language(batch, out):
        # Utterance-level language-ID labels (multilingual training; the
        # reference's planned extension, README.md:480). Optional: datasets
        # without labels produce batches without the key and the Trainer's
        # LID term stays off.
        n_labeled = sum(1 for item in batch if "language" in item)
        if n_labeled == 0:
            return
        if n_labeled != len(batch):
            # A half-labeled manifest silently dropping the LID term (or
            # KeyError-ing mid-epoch) is a data bug worth surfacing.
            raise ValueError(
                f"batch mixes labeled and unlabeled utterances: {n_labeled}"
                f"/{len(batch)} rows carry a 'language' field; label every "
                "manifest row (or none)"
            )
        out["language"] = np.asarray(
            [item["language"] for item in batch], np.int32
        )

    def _collate_audio(self, batch: List[Dict[str, Any]]) -> Dict[str, Any]:
        """device-mel collation: pad raw audio instead of mel.

        Each utterance is reflect-padded to the common sample length (the
        same convention as the transcribe/serve pipeline, so the device mel
        of the valid frames is exact — the reflection at the utterance end
        IS the offline right reflect-pad), and crosses the host link as
        int16 PCM (half the bytes of fp32; rescaled on device). The train
        step computes the fused-Pallas mel + masked per-utterance
        normalization on device (training.py device-mel path)."""
        hop = HOP_LENGTH

        # ceil-based frame sizing guarantees target_samples >= every len
        max_mel = _round_up(
            max(1 + -(-len(item["audio"]) // hop) for item in batch),
            self.frame_bucket,
        )
        target_samples = (max_mel - 1) * hop
        max_tgt = _round_up(
            max(1, max(item["targets"].shape[0] for item in batch)), self.target_bucket
        )

        n = len(batch)
        audio = np.zeros((n, target_samples), np.int16)
        targets = np.full((n, max_tgt), self.pad_token_id, np.int32)
        input_lengths = np.empty((n,), np.int32)
        target_lengths = np.empty((n,), np.int32)
        texts = []
        for i, item in enumerate(batch):
            a = np.asarray(item["audio"], np.float32)
            if len(a) >= 2:
                padded = np.pad(a, (0, target_samples - len(a)), mode="reflect")
            else:
                padded = np.zeros(target_samples, np.float32)
                padded[: len(a)] = a
            audio[i] = np.clip(padded * 32768.0, -32768, 32767).astype(np.int16)
            t = item["targets"]
            targets[i, : t.shape[0]] = t
            input_lengths[i] = item["input_lengths"]
            target_lengths[i] = item["target_lengths"]
            texts.append(item.get("text", ""))

        out = {
            "audio": audio,
            "targets": targets,
            "input_lengths": input_lengths,
            "target_lengths": target_lengths,
            "texts": texts,
        }
        self._collate_language(batch, out)
        return out


class DataLoader:
    """Threaded prefetching loader (replaces torch.utils.data.DataLoader).

    Items are loaded by a worker pool; collated batches are queued ahead of
    the consumer so host IO overlaps device compute.
    """

    def __init__(
        self,
        dataset,
        batch_size: int = 8,
        shuffle: bool = True,
        num_workers: int = 4,
        collate_fn: Optional[Callable] = None,
        drop_last: bool = False,
        seed: int = 0,
        prefetch: int = 2,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = max(num_workers, 1)
        self.collate_fn = collate_fn or ASRCollator()
        self.drop_last = drop_last
        self.seed = seed
        self.prefetch = prefetch
        self._epoch = 0

    def __len__(self) -> int:
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def _index_batches(self) -> List[List[int]]:
        idx = list(range(len(self.dataset)))
        if self.shuffle:
            random.Random(self.seed + self._epoch).shuffle(idx)
        batches = [
            idx[i : i + self.batch_size] for i in range(0, len(idx), self.batch_size)
        ]
        if self.drop_last:
            batches = [b for b in batches if len(b) == self.batch_size]
        return batches

    def __iter__(self) -> Iterator[Dict[str, Any]]:
        from concurrent.futures import ThreadPoolExecutor

        batches = self._index_batches()
        self._epoch += 1
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def put(item) -> bool:
            """Bounded put that gives up when the consumer stopped."""
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.25)
                    return True
                except queue.Full:
                    continue
            return False

        def produce():
            # Exceptions (e.g. one corrupt audio file) are forwarded to the
            # consumer instead of silently killing this thread, which would
            # deadlock the training loop on q.get().
            try:
                with ThreadPoolExecutor(max_workers=self.num_workers) as pool:
                    for batch_idx in batches:
                        if stop.is_set():
                            return
                        items = list(pool.map(self.dataset.__getitem__, batch_idx))
                        if not put(self.collate_fn(items)):
                            return
                put(None)
            except Exception as e:  # noqa: BLE001 - forwarded to consumer
                put(e)

        thread = threading.Thread(target=produce, daemon=True)
        thread.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    return
                if isinstance(item, Exception):
                    raise RuntimeError("DataLoader worker failed") from item
                yield item
        finally:
            # Unblock a producer stuck in put() so its threads exit even
            # when the consumer breaks out of the loop early.
            stop.set()
            while True:
                try:
                    q.get_nowait()
                except queue.Empty:
                    break


def cycle(loader: DataLoader) -> Iterator[Dict[str, Any]]:
    """Infinite iterator over a loader (the reference Trainer's
    StopIteration-cycling, training.py:321-325)."""
    while True:
        n = 0
        for batch in loader:
            n += 1
            yield batch
        if n == 0:
            # Fail fast instead of busy-looping Trainer.train() forever:
            # an empty loader means every sample was filtered out or the
            # dataset is smaller than one (drop_last) batch.
            raise RuntimeError(
                "DataLoader yielded no batches (empty dataset after "
                "filtering, or fewer samples than one batch with "
                "drop_last): nothing to train on"
            )


def calibration_batches(
    ds: Any,
    collator: "ASRCollator",
    batch_size: int,
    num_batches: int,
    max_items: Optional[int] = None,
) -> Iterator[np.ndarray]:
    """Yield mel batches for INT8 activation-scale calibration.

    Shared by `export_model.py --calibrate` and `evaluate.py --int8-static`
    so both CLIs draw calibration data identically (batch size and count
    are honored, transcripts are not required). max_items additionally caps
    the utterances drawn (evaluate's --max-utts contract: calibration must
    not touch utterances the user excluded).
    """
    n = min(len(ds), num_batches * batch_size)
    if max_items is not None:
        n = min(n, max_items)
    for start in range(0, n, batch_size):
        items = [ds[i] for i in range(start, min(start + batch_size, n))]
        yield collator(items)["mel_spectrogram"]


def create_dataloader(
    manifest_path: str,
    batch_size: int = 8,
    shuffle: bool = True,
    num_workers: int = 4,
    pin_memory: bool = True,  # accepted for API parity; meaningless in JAX
    max_duration: Optional[float] = 30.0,
    min_duration: float = 0.5,
    tokenizer: Optional[Any] = None,
    device_mel: bool = False,
) -> Tuple[DataLoader, ASRDataset]:
    """Create a manifest DataLoader (reference create_dataloader,
    data.py:206-251)."""
    del pin_memory
    dataset = ASRDataset(
        manifest_path=manifest_path,
        tokenizer=tokenizer,
        max_duration=max_duration,
        min_duration=min_duration,
        device_mel=device_mel,
    )
    loader = DataLoader(
        dataset,
        batch_size=batch_size,
        shuffle=shuffle,
        num_workers=num_workers,
        collate_fn=ASRCollator(),
        drop_last=shuffle,  # reference drops last when shuffling (data.py:248)
    )
    return loader, dataset


LIBRISPEECH_CHARS = " abcdefghijklmnopqrstuvwxyz'"


class LibriSpeechDataset:
    """LibriSpeech read directly from its on-disk layout
    (reference LibriSpeechDataset, data.py:254-360, minus torchaudio).

    Expects root/LibriSpeech/<split>/<speaker>/<chapter>/
    {<id>.flac, <speaker>-<chapter>.trans.txt}. Fixed 29-char vocabulary
    (" a-z'" + 3 specials, reference data.py:293-307); transcripts are
    lowercased; audio longer than max_duration is truncated
    (data.py:343-346).
    """

    def __init__(
        self,
        root: str = "./data",
        split: str = "train-clean-100",
        tokenizer: Optional[Any] = None,
        max_duration: Optional[float] = 30.0,
        download: bool = False,
        device_mel: bool = False,
    ):
        self.root = root
        self.split = split
        self.tokenizer = tokenizer
        self.max_duration = max_duration
        # Same contract as ASRDataset.device_mel: items carry raw audio;
        # the train step computes the fused-Pallas mel on device.
        self.device_mel = device_mel
        if download:
            logger.warning(
                "download=True is handled by scripts/download_librispeech.py; "
                "expecting data on disk."
            )

        split_dir = os.path.join(root, "LibriSpeech", split)
        if not os.path.isdir(split_dir):
            raise FileNotFoundError(f"LibriSpeech split not found: {split_dir}")

        self.entries: List[Tuple[str, str]] = []  # (flac_path, transcript)
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
                        if os.path.exists(flac):
                            self.entries.append((flac, text))

        self.vocab = self._build_vocab() if tokenizer is None else None

    def _build_vocab(self) -> Dict[str, int]:
        vocab = {"<blank>": 0, "<unk>": 1, "<pad>": 2}
        for i, char in enumerate(LIBRISPEECH_CHARS):
            vocab[char] = i + 3
        return vocab

    def text_to_tokens(self, text: str) -> List[int]:
        if self.tokenizer is not None:
            return self.tokenizer.encode(text)
        text = text.lower()
        unk = self.vocab["<unk>"]
        return [self.vocab.get(c, unk) for c in text]

    def __len__(self) -> int:
        return len(self.entries)

    def __getitem__(self, idx: int) -> Dict[str, Any]:
        path, transcript = self.entries[idx]
        waveform = load_audio(path, sample_rate=SAMPLE_RATE)
        if self.max_duration:
            max_samples = int(self.max_duration * SAMPLE_RATE)
            waveform = waveform[:max_samples]
        tokens = self.text_to_tokens(transcript)
        item = {
            "targets": np.asarray(tokens, np.int32),
            "target_lengths": np.int32(len(tokens)),
            "text": transcript.lower(),
        }
        if self.device_mel:
            item["audio"] = np.asarray(waveform, np.float32)
            item["input_lengths"] = np.int32(1 + len(waveform) // HOP_LENGTH)
        else:
            mel = compute_mel_spectrogram_np(waveform, normalize=True)
            item["mel_spectrogram"] = mel
            item["input_lengths"] = np.int32(mel.shape[0])
        return item


class _ConcatDataset:
    def __init__(self, datasets):
        self.datasets = datasets
        self._offsets = np.cumsum([0] + [len(d) for d in datasets])

    def __len__(self):
        return int(self._offsets[-1])

    def __getitem__(self, idx):
        ds = int(np.searchsorted(self._offsets, idx, side="right") - 1)
        return self.datasets[ds][idx - int(self._offsets[ds])]


def create_librispeech_dataloaders(
    root: str = "./data",
    train_splits: List[str] = ["train-clean-100"],
    val_splits: List[str] = ["dev-clean"],
    batch_size: int = 8,
    num_workers: int = 4,
    max_duration: float = 30.0,
    download: bool = False,
    device_mel: bool = False,
) -> Tuple[DataLoader, DataLoader, Dict[str, int]]:
    """Train + val LibriSpeech loaders with a shared vocabulary
    (reference create_librispeech_dataloaders, data.py:363-448)."""
    train_datasets = [
        LibriSpeechDataset(root=root, split=s, max_duration=max_duration,
                           download=download, device_mel=device_mel)
        for s in train_splits
    ]
    vocab = train_datasets[0].vocab
    train_dataset = (
        _ConcatDataset(train_datasets) if len(train_datasets) > 1 else train_datasets[0]
    )

    val_datasets = []
    for s in val_splits:
        ds = LibriSpeechDataset(root=root, split=s, max_duration=max_duration,
                                download=download, device_mel=device_mel)
        ds.vocab = vocab
        val_datasets.append(ds)
    val_dataset = _ConcatDataset(val_datasets) if len(val_datasets) > 1 else val_datasets[0]

    collator = ASRCollator()
    train_loader = DataLoader(
        train_dataset, batch_size=batch_size, shuffle=True, num_workers=num_workers,
        collate_fn=collator, drop_last=True,
    )
    val_loader = DataLoader(
        val_dataset, batch_size=batch_size, shuffle=False, num_workers=num_workers,
        collate_fn=collator, drop_last=False,
    )
    return train_loader, val_loader, vocab
