"""Synthetic speech corpus: a rich, fully deterministic stand-in for
LibriSpeech in environments with no audio data (this container has zero
egress, so the reference's LibriSpeech recipe cannot be downloaded).

Each character is a "phoneme" with a distinct multi-component spectrum:
vowel-like characters are stacks of three formant sines, consonant-like
characters are shaped noise bursts with a sine transient. Utterances add
the variability that makes the task non-trivial and the trained model's
WER meaningful:

  - per-utterance "speaker": global formant scale, level, and speaking rate
  - per-phoneme duration / amplitude jitter and 10 ms crossfades
  - background noise at a random SNR
  - leading/trailing silence and inter-word pauses

Text is drawn from a deterministic pseudo-word lexicon so WER is a
word-level metric over a closed vocabulary (as in any fixed-language
corpus). The train and held-out streams share the lexicon but never the
sentences.

This is evaluation/benchmark infrastructure for the training recipe
(reference configs/train.yaml + README.md:255 quote WERs on LibriSpeech;
here the same recipe is validated end-to-end on this corpus instead).
"""

from __future__ import annotations

import hashlib
import json
import os
import wave
from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from .audio import SAMPLE_RATE, compute_mel_spectrogram_np

VOWELS = "aeiouy"
CHARS = "abcdefghijklmnopqrstuvwxyz"


@dataclass
class SpeakerProfile:
    """A persistent synthetic speaker identity.

    The per-utterance draws in SynthVoice.render (formant scale, speaking
    rate, level) become per-SPEAKER constants with small per-utterance
    jitter around them, so utterances by the same profile share vocal
    characteristics — the signal a speaker-embedding model learns and a
    diarizer clusters (reference README.md:483 "Speaker Diarization"
    planned extension; the reference has no speaker model at all).
    """

    fscale: float  # global formant scale ("vocal tract length")
    rate: float  # speaking rate
    level: float  # loudness
    tilt: float  # spectral tilt: relative weight of higher formants

    @classmethod
    def sample(cls, rng: np.random.Generator) -> "SpeakerProfile":
        return cls(
            fscale=float(rng.uniform(0.85, 1.2)),
            rate=float(rng.uniform(0.8, 1.25)),
            level=float(rng.uniform(0.18, 0.4)),
            tilt=float(rng.uniform(0.7, 1.3)),
        )

    @classmethod
    def for_id(cls, speaker_id: int, seed: int = 1234) -> "SpeakerProfile":
        """Deterministic profile for a speaker index (corpus-stable)."""
        return cls.sample(_char_seed(seed, "speaker", speaker_id))


def _char_seed(master_seed: int, *parts) -> np.random.Generator:
    h = hashlib.sha256(("|".join(map(str, parts)) + f"|{master_seed}").encode())
    return np.random.default_rng(int.from_bytes(h.digest()[:8], "little"))


class SynthVoice:
    """Deterministic text -> waveform renderer."""

    def __init__(self, sample_rate: int = SAMPLE_RATE, seed: int = 1234):
        self.sr = sample_rate
        self.seed = seed
        # Character-specific spectra, fixed for the corpus lifetime.
        rng = _char_seed(seed, "phonemes")
        self.formants: Dict[str, np.ndarray] = {}
        self.noise_tilt: Dict[str, float] = {}
        for i, c in enumerate(CHARS):
            # three "formants", well separated across characters
            base = 280.0 + 110.0 * i  # 280 .. 3030 Hz
            self.formants[c] = np.array(
                [base, base * 2.1 + 150, base * 3.3 + 400]
            ) + rng.uniform(-30, 30, 3)
            self.noise_tilt[c] = float(rng.uniform(0.3, 3.0))

    def _phoneme(
        self, c: str, dur_s: float, fscale: float, rng, tilt: float = 1.0
    ) -> np.ndarray:
        n = max(int(dur_s * self.sr), 8)
        t = np.arange(n) / self.sr
        if c == " ":
            return np.zeros(n, np.float32)
        amps = np.array([1.0, 0.55 * tilt, 0.3 * tilt]) * rng.uniform(0.85, 1.15, 3)
        freqs = self.formants[c] * fscale
        sig = sum(
            a * np.sin(2 * np.pi * f * t + rng.uniform(0, 2 * np.pi))
            for a, f in zip(amps, freqs)
        )
        if c not in VOWELS:
            # consonant: add a char-tilted noise burst and shorten the
            # periodic part so the phone is transient-dominated
            noise = rng.standard_normal(n)
            # char-specific spectral tilt: first-difference mix colors the
            # noise from flat (alpha~0) to high-pass (alpha~0.75)
            alpha = self.noise_tilt[c] / (1 + self.noise_tilt[c])
            shaped = np.copy(noise)
            shaped[1:] = noise[1:] - alpha * noise[:-1]
            sig = 0.45 * sig + 0.8 * shaped
        env = np.minimum(1.0, np.minimum(t, t[::-1]) / 0.012)  # 12 ms ramps
        return (sig * env).astype(np.float32)

    def render(
        self,
        text: str,
        rng: Optional[np.random.Generator] = None,
        profile: Optional[SpeakerProfile] = None,
        add_noise: bool = True,
    ) -> np.ndarray:
        """Render text to a 16 kHz waveform with speaker/rate/noise jitter.

        With profile=None (the default, byte-identical to the pre-profile
        corpus) the "speaker" is drawn fresh per utterance. With a
        SpeakerProfile, the speaker constants come from the profile with
        small per-utterance jitter — utterances share a voice.

        The phoneme table covers lowercase a-z and space; other input is
        lowercased and unmapped characters render as silence (like space)
        rather than crashing on a bare KeyError."""
        rng = rng or np.random.default_rng(0)
        text = "".join(
            c if c in self.formants or c == " " else " "
            for c in text.lower()
        )
        if profile is None:
            fscale = rng.uniform(0.85, 1.2)  # "speaker" formant scale
            rate = rng.uniform(0.8, 1.25)  # speaking rate
            level = rng.uniform(0.18, 0.4)
            tilt = 1.0
        else:
            fscale = profile.fscale * rng.uniform(0.98, 1.02)
            rate = profile.rate * rng.uniform(0.95, 1.05)
            level = profile.level * rng.uniform(0.9, 1.1)
            tilt = profile.tilt
        xfade = int(0.010 * self.sr)

        pieces: List[np.ndarray] = [np.zeros(int(rng.uniform(0.04, 0.15) * self.sr), np.float32)]
        for c in text:
            if c == " ":
                dur = rng.uniform(0.05, 0.12)
            else:
                dur = rng.uniform(0.07, 0.13) * rate
            pieces.append(self._phoneme(c, dur, fscale, rng, tilt=tilt))
        pieces.append(np.zeros(int(rng.uniform(0.04, 0.15) * self.sr), np.float32))

        # overlap-add with short crossfades
        total = sum(len(p) for p in pieces) - xfade * (len(pieces) - 1)
        out = np.zeros(max(total, 1), np.float32)
        pos = 0
        for p in pieces:
            out[pos : pos + len(p)] += p
            pos += len(p) - xfade
        peak = np.max(np.abs(out)) + 1e-9
        out = out / peak * level
        if add_noise:
            # add_noise=False (conversation rendering) skips both draws;
            # they are the LAST rng consumers, so everything before them
            # stays byte-identical either way.
            snr_db = rng.uniform(12.0, 32.0)
            noise_rms = level / np.sqrt(2) / (10 ** (snr_db / 20))
            out = out + rng.standard_normal(len(out)).astype(np.float32) * noise_rms
        return out.astype(np.float32)


def make_lexicon(n_words: int = 1500, seed: int = 7) -> List[str]:
    """Deterministic pseudo-word lexicon (CV-patterned, 2-8 chars)."""
    rng = _char_seed(seed, "lexicon")
    consonants = [c for c in CHARS if c not in VOWELS]
    words, seen = [], set()
    while len(words) < n_words:
        n = int(rng.integers(2, 9))
        w = []
        for i in range(n):
            pool = consonants if (i % 2 == 0) != bool(rng.integers(0, 4) == 0) else VOWELS
            w.append(pool[int(rng.integers(0, len(pool)))])
        w = "".join(w)
        if w not in seen:
            seen.add(w)
            words.append(w)
    return words


def sample_sentence(lexicon: List[str], rng, min_words: int = 2, max_words: int = 8) -> str:
    n = int(rng.integers(min_words, max_words + 1))
    return " ".join(lexicon[int(rng.integers(0, len(lexicon)))] for _ in range(n))


# ----- synthetic languages (multilingual / language-ID benchmark) -----------

#: Per-language phonologies. All languages share the grapheme set (a-z +
#: space) and therefore the acoustic phoneme inventory — like real
#: languages sharing phones — but differ in which phonemes occur, their
#: frequencies, and their sequencing (syllable patterns). That is exactly
#: the signal a language-ID head must learn from audio. Language 0 is the
#: base corpus lexicon (make_lexicon), so every existing checkpoint /
#: eval artifact is "language 0" of the multilingual family.
_LANGUAGE_PHONOLOGIES: List[Optional[Dict]] = [
    None,  # language 0: make_lexicon's mixed-CV pseudo-words
    {  # open-syllable language: small consonant set, strict CV, a/i/u
        "consonants": "ptkmnsrlhw",
        "vowels": "aiu",
        "patterns": ["CV", "CVCV", "CVCVCV", "CVVCV", "CVCVCVCV"],
    },
    {  # cluster language: voiced/fricative consonants, closed syllables
        "consonants": "bdgvzjfqxc",
        "vowels": "eoy",
        "patterns": ["CVC", "CCVC", "CVCC", "CVCCVC", "CCVCVC"],
    },
    {  # vowel-initial language: sonorants, vowel-heavy sequences
        "consonants": "mnrlszt",
        "vowels": "aeiouy",
        "patterns": ["VCV", "VCCV", "VCVC", "VVCV", "VCVCVV"],
    },
]

#: Languages available out of the box (model num_languages may be <= this).
NUM_SYNTH_LANGUAGES = len(_LANGUAGE_PHONOLOGIES)


def make_language_lexicon(
    language: int, n_words: int = 1500, seed: int = 1234
) -> List[str]:
    """Deterministic pseudo-word lexicon for one synthetic language.

    Language 0 reproduces make_lexicon(n_words, seed) exactly (corpus
    continuity); languages 1..3 draw words from their phonology's
    syllable patterns.
    """
    if not 0 <= language < NUM_SYNTH_LANGUAGES:
        raise ValueError(
            f"language {language} out of range 0..{NUM_SYNTH_LANGUAGES - 1}"
        )
    phon = _LANGUAGE_PHONOLOGIES[language]
    if phon is None:
        return make_lexicon(n_words, seed=seed)
    rng = _char_seed(seed, "lexicon_lang", language)
    cons, vows, patterns = phon["consonants"], phon["vowels"], phon["patterns"]
    words, seen = [], set()
    while len(words) < n_words:
        pat = patterns[int(rng.integers(0, len(patterns)))]
        w = "".join(
            (cons if ch == "C" else vows)[
                int(rng.integers(0, len(cons if ch == "C" else vows)))
            ]
            for ch in pat
        )
        if w not in seen:
            seen.add(w)
            words.append(w)
    return words


class SyntheticSpeechDataset:
    """data.ASRDataset-compatible on-the-fly synthetic corpus.

    Items are deterministic in (seed, split, idx) — a "dataset" without
    any files on disk. Vocabulary follows the manifest-dataset rules
    (specials + sorted corpus characters, reference data.py:86-105).
    """

    def __init__(
        self,
        n_utts: int = 10000,
        split: str = "train",
        seed: int = 1234,
        lexicon_words: int = 1500,
        min_words: int = 2,
        max_words: int = 8,
        normalize_audio: bool = True,
        device_mel: bool = False,
        languages: int = 1,
    ):
        self.n_utts = n_utts
        self.split = split
        self.seed = seed
        self.min_words = min_words
        self.max_words = max_words
        self.normalize_audio = normalize_audio
        # see data.ASRDataset: items carry raw audio; mel runs on device
        self.device_mel = device_mel
        if device_mel and not normalize_audio:
            # Same contract as data.ASRDataset: the device-mel train step
            # always normalizes on device, so the flag cannot be honored.
            raise ValueError(
                "normalize_audio=False is not supported with device_mel "
                "(the train step normalizes on device); use host mel"
            )
        # Multilingual mode: each utterance draws a deterministic language
        # and samples its sentence from that language's lexicon
        # (make_language_lexicon). languages=1 is byte-identical to the
        # monolingual corpus (language 0 IS the base lexicon) and items do
        # not carry a "language" key, so every earlier artifact/eval is
        # unchanged.
        if not 1 <= languages <= NUM_SYNTH_LANGUAGES:
            raise ValueError(
                f"languages must be 1..{NUM_SYNTH_LANGUAGES}, got {languages}"
            )
        self.languages = languages
        self.voice = SynthVoice(seed=seed)
        self.lexicons = [
            make_language_lexicon(l, lexicon_words, seed=seed)
            for l in range(languages)
        ]
        self.lexicon = self.lexicons[0]
        specials = ["<blank>", "<unk>", "<pad>"]
        chars = sorted(set(CHARS + " "))
        self.vocab = {tok: i for i, tok in enumerate(specials + chars)}
        self.idx_to_token = {i: t for t, i in self.vocab.items()}

    def __len__(self) -> int:
        return self.n_utts

    def language_for(self, idx: int) -> int:
        """Deterministic per-utterance language (uniform over languages).

        A separate rng stream from the text draw, so languages=1 reproduces
        the monolingual corpus exactly.
        """
        if self.languages == 1:
            return 0
        rng = _char_seed(self.seed, "lang", self.split, idx)
        return int(rng.integers(0, self.languages))

    def text_for(self, idx: int) -> str:
        rng = _char_seed(self.seed, "text", self.split, idx)
        lexicon = self.lexicons[self.language_for(idx)]
        return sample_sentence(lexicon, rng, self.min_words, self.max_words)

    def audio_for(self, idx: int, text: str | None = None) -> np.ndarray:
        # text may be passed in when the caller already sampled it (the
        # sentence draw is deterministic per idx but not free).
        if text is None:
            text = self.text_for(idx)
        rng = _char_seed(self.seed, "audio", self.split, idx)
        return self.voice.render(text, rng)

    def text_to_tokens(self, text: str) -> List[int]:
        unk = self.vocab["<unk>"]
        return [self.vocab.get(c, unk) for c in text]

    def __getitem__(self, idx: int) -> Dict:
        text = self.text_for(idx)
        audio = self.audio_for(idx, text=text)
        tokens = self.text_to_tokens(text)
        item = {
            "targets": np.asarray(tokens, np.int32),
            "target_lengths": np.int32(len(tokens)),
            "text": text,
        }
        if self.languages > 1:
            item["language"] = np.int32(self.language_for(idx))
        if self.device_mel:
            from .audio import HOP_LENGTH

            item["audio"] = np.asarray(audio, np.float32)
            item["input_lengths"] = np.int32(1 + len(audio) // HOP_LENGTH)
        else:
            mel = compute_mel_spectrogram_np(audio, normalize=self.normalize_audio)
            item["mel_spectrogram"] = mel
            item["input_lengths"] = np.int32(mel.shape[0])
        return item


# ----- speaker-attributed conversations (diarization benchmark) -------------


def render_conversation(
    voice: SynthVoice,
    turns: Sequence[Tuple[int, str]],
    profiles: Sequence[SpeakerProfile],
    rng: np.random.Generator,
    gap_range: Tuple[float, float] = (0.3, 1.2),
    snr_db_range: Tuple[float, float] = (16.0, 30.0),
) -> Tuple[np.ndarray, List[Dict]]:
    """Render a multi-speaker conversation with ground-truth segments.

    turns is a list of (speaker_index, text); speaker_index indexes
    profiles. Turns are separated by silence gaps, and ONE continuous
    background-noise bed covers the whole conversation (per-turn noise
    would hand the VAD a trivial noise-floor cue at every boundary).

    Returns (waveform, segments) with segments =
    [{"start", "end", "speaker", "text"}, ...] in seconds. Segment bounds
    are the rendered turn clips, which include render()'s own <=0.15 s
    lead/tail silence — scoring with the standard DER collar absorbs it.
    """
    sr = voice.sr
    pieces: List[np.ndarray] = [
        np.zeros(int(rng.uniform(*gap_range) * sr), np.float32)
    ]
    pos = len(pieces[0])
    segments: List[Dict] = []
    for speaker, text in turns:
        clip = voice.render(
            text, rng, profile=profiles[speaker], add_noise=False
        )
        segments.append(
            {
                "start": pos / sr,
                "end": (pos + len(clip)) / sr,
                "speaker": int(speaker),
                "text": text,
            }
        )
        pieces.append(clip)
        pos += len(clip)
        gap = np.zeros(int(rng.uniform(*gap_range) * sr), np.float32)
        pieces.append(gap)
        pos += len(gap)
    audio = np.concatenate(pieces)
    speech = np.concatenate(
        [pieces[i] for i in range(1, len(pieces), 2)]
    )
    speech_rms = float(np.sqrt(np.mean(speech**2)) + 1e-9)
    snr_db = rng.uniform(*snr_db_range)
    noise_rms = speech_rms / (10 ** (snr_db / 20))
    audio = audio + rng.standard_normal(len(audio)).astype(np.float32) * noise_rms
    return audio.astype(np.float32), segments


class SyntheticSpeakerDataset:
    """(mel, speaker_id) utterances from persistent synthetic speakers, for
    training the speaker-embedding encoder (diarize.SpeakerTrainer).

    Items reuse the ASR batch contract so the stock ASRCollator/DataLoader/
    Trainer runtime applies unchanged: the speaker label rides in
    `targets` as a length-1 sequence (SpeakerTrainer reads
    batch["targets"][:, 0]).

    Speaker profiles are deterministic in (seed, speaker index); the eval
    split renders DIFFERENT utterances by the SAME speakers (speaker
    verification-style held-out: known voices, unseen speech).
    """

    def __init__(
        self,
        n_speakers: int = 64,
        utts_per_speaker: int = 100,
        split: str = "train",
        seed: int = 1234,
        lexicon_words: int = 1500,
        min_words: int = 2,
        max_words: int = 6,
    ):
        self.n_speakers = n_speakers
        self.utts_per_speaker = utts_per_speaker
        self.split = split
        self.seed = seed
        self.min_words = min_words
        self.max_words = max_words
        self.voice = SynthVoice(seed=seed)
        self.lexicon = make_lexicon(lexicon_words, seed=seed)
        self.profiles = [
            SpeakerProfile.for_id(i, seed=seed) for i in range(n_speakers)
        ]

    def __len__(self) -> int:
        return self.n_speakers * self.utts_per_speaker

    def __getitem__(self, idx: int) -> Dict:
        from .diarize import scalar_normalize_mel

        speaker = idx % self.n_speakers
        rng = _char_seed(self.seed, "spk_utt", self.split, idx)
        text = sample_sentence(self.lexicon, rng, self.min_words, self.max_words)
        audio = self.voice.render(text, rng, profile=self.profiles[speaker])
        # Speaker features keep the spectral shape: scalar (loudness-only)
        # normalization, NOT the ASR per-bin normalization — see
        # diarize.scalar_normalize_mel.
        mel = scalar_normalize_mel(
            compute_mel_spectrogram_np(audio, normalize=False)
        )
        return {
            "mel_spectrogram": mel,
            "input_lengths": np.int32(mel.shape[0]),
            "targets": np.asarray([speaker], np.int32),
            "target_lengths": np.int32(1),
            "text": text,
        }


class SyntheticConversationDataset:
    """Deterministic multi-speaker conversations with ground-truth turns,
    for measuring diarization error rate.

    Conversation speakers are drawn from a held-out id range (offset
    1_000_000) so their profiles are UNSEEN by any embedding model trained
    on SyntheticSpeakerDataset — the diarizer must cluster novel voices,
    not recognize trained ones.
    """

    def __init__(
        self,
        n_convs: int = 20,
        speakers_range: Tuple[int, int] = (2, 4),
        turns_range: Tuple[int, int] = (6, 14),
        words_range: Tuple[int, int] = (4, 10),
        split: str = "test",
        seed: int = 1234,
        lexicon_words: int = 1500,
    ):
        self.n_convs = n_convs
        self.speakers_range = speakers_range
        self.turns_range = turns_range
        self.words_range = words_range
        self.split = split
        self.seed = seed
        self.voice = SynthVoice(seed=seed)
        self.lexicon = make_lexicon(lexicon_words, seed=seed)

    def __len__(self) -> int:
        return self.n_convs

    def __getitem__(self, idx: int) -> Dict:
        rng = _char_seed(self.seed, "conv", self.split, idx)
        n_spk = int(rng.integers(self.speakers_range[0], self.speakers_range[1] + 1))
        profiles = [
            SpeakerProfile.for_id(1_000_000 + idx * 16 + k, seed=self.seed)
            for k in range(n_spk)
        ]
        n_turns = int(rng.integers(self.turns_range[0], self.turns_range[1] + 1))
        turns: List[Tuple[int, str]] = []
        prev = -1
        for _ in range(n_turns):
            # consecutive turns change speaker (a conversation, not a recap)
            choices = [k for k in range(n_spk) if k != prev] or [0]
            spk = choices[int(rng.integers(0, len(choices)))]
            text = sample_sentence(
                self.lexicon, rng, self.words_range[0], self.words_range[1]
            )
            turns.append((spk, text))
            prev = spk
        audio, segments = render_conversation(self.voice, turns, profiles, rng)
        return {
            "audio": audio,
            "segments": segments,
            "n_speakers": n_spk,
        }


def write_conversations(
    out_dir: str,
    n_convs: int = 20,
    split: str = "test",
    seed: int = 1234,
    **kwargs,
) -> str:
    """Materialize conversations as WAVs + a JSONL manifest whose rows
    carry the ground-truth segments (scripts/diarize.py --test-set)."""
    ds = SyntheticConversationDataset(n_convs, split=split, seed=seed, **kwargs)
    os.makedirs(out_dir, exist_ok=True)
    manifest = os.path.join(out_dir, f"{split}_conversations.jsonl")
    with open(manifest, "w") as mf:
        for i in range(n_convs):
            item = ds[i]
            path = os.path.join(out_dir, f"{split}_conv_{i:04d}.wav")
            pcm = np.clip(item["audio"] * 32767, -32768, 32767).astype("<i2")
            with wave.open(path, "wb") as w:
                w.setnchannels(1)
                w.setsampwidth(2)
                w.setframerate(SAMPLE_RATE)
                w.writeframes(pcm.tobytes())
            mf.write(
                json.dumps(
                    {
                        "audio_path": path,
                        "duration": len(item["audio"]) / SAMPLE_RATE,
                        "n_speakers": item["n_speakers"],
                        "segments": item["segments"],
                    }
                )
                + "\n"
            )
    return manifest


def write_corpus(
    out_dir: str,
    n_utts: int,
    split: str = "test",
    seed: int = 1234,
    lexicon_words: int = 1500,
    min_words: int = 2,
    max_words: int = 8,
    languages: int = 1,
) -> str:
    """Materialize a split as WAV files + JSONL manifest (for the evaluate
    CLI, which measures WER over files like the reference's benchmark
    mode). Returns the manifest path.

    min_words/max_words scale utterance length: the defaults give 1.5-6 s
    clips (the training distribution); ~90/110 gives 60-90 s long-form
    utterances for the >60 s benchmark config (BASELINE config #3).
    languages > 1 mixes the synthetic languages and stamps each manifest
    row with its "language" label (LID accuracy benchmark)."""
    ds = SyntheticSpeechDataset(
        n_utts, split=split, seed=seed, lexicon_words=lexicon_words,
        min_words=min_words, max_words=max_words, languages=languages,
    )
    os.makedirs(out_dir, exist_ok=True)
    manifest = os.path.join(out_dir, f"{split}_manifest.jsonl")
    with open(manifest, "w") as mf:
        for i in range(n_utts):
            text = ds.text_for(i)
            audio = ds.audio_for(i, text=text)
            path = os.path.join(out_dir, f"{split}_{i:05d}.wav")
            pcm = np.clip(audio * 32767, -32768, 32767).astype("<i2")
            with wave.open(path, "wb") as w:
                w.setnchannels(1)
                w.setsampwidth(2)
                w.setframerate(SAMPLE_RATE)
                w.writeframes(pcm.tobytes())
            row = {
                "audio_path": path,
                "text": text,
                "duration": len(audio) / SAMPLE_RATE,
            }
            if languages > 1:
                row["language"] = ds.language_for(i)
            mf.write(json.dumps(row) + "\n")
    return manifest
