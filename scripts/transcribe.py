#!/usr/bin/env python3
"""Transcribe audio with VELOCITY-ASR TPU (reference scripts/transcribe.py).

Single file or recursive --input-dir batch; greedy or beam decoding;
optional word-level timestamps (frame -> seconds = frame * 2 * hop / sr,
reference scripts/transcribe.py:42-45); text or JSON output; per-file
error isolation (reference scripts/transcribe.py:278-279).

TPU-native difference: the mel front-end runs on device inside the same
jit as the model (the reference computes mel on host CPU before transfer,
scripts/transcribe.py:73-77), and utterances are padded to frame buckets
so XLA compiles a handful of shapes.
"""

import argparse
import json
import logging
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from velocity_asr_tpu.utils.platform import apply_platform_env

apply_platform_env()

logging.basicConfig(
    level=logging.INFO, format="%(asctime)s | %(levelname)s | %(message)s"
)
logger = logging.getLogger("transcribe")

# Only advertise what the decoder stack can actually handle (the reference
# lists mp3/ogg/m4a via torchaudio, scripts/transcribe.py; here wav/flac/
# mp3/ogg decode natively, m4a via the system-codec shim where the libav*
# stack exists, and anything else fails fast with a conversion hint).
from velocity_asr_tpu.io import supported_audio_exts

AUDIO_EXTS = supported_audio_exts()


from velocity_asr_tpu.decode import (  # noqa: E402  (library home;
    frame_to_seconds,                     # re-exported here for backwards
    words_with_timestamps,                # compatibility of older callers)
)


class Transcriber:
    """Bucketed jit transcription pipeline.

    The whole pipeline runs on device in one jit: mel front-end (fused
    Pallas kernel on TPU) with masked per-utterance normalization, model
    forward, and logits. Audio is padded to sample buckets so a handful of
    compiled shapes serve every utterance; the valid frame count is a
    traced scalar. device_mel=False falls back to exact host-side
    per-utterance mel (normalization statistics are identical either way;
    on device the final ~2 boundary frames see the zero padding through
    the STFT window).
    """

    def __init__(self, model, params, decoder, beam_width=0, frame_bucket=200,
                 device_mel=True, lm_scorer=None, lm_weight=0.0):
        import jax
        import jax.numpy as jnp

        from velocity_asr_tpu.audio import (
            HOP_LENGTH,
            SAMPLE_RATE,
            compute_mel_spectrogram,
            compute_mel_spectrogram_np,
            masked_normalize_mel,
        )

        self.model = model
        self.params = params
        self.decoder = decoder
        self.beam_width = beam_width
        # Shallow-fusion scorer for beam decodes (hotword boosting /
        # external LM); scaled by lm_weight (velocity_asr_tpu.hotwords).
        self.lm_scorer = lm_scorer
        self.lm_weight = lm_weight
        self.frame_bucket = frame_bucket
        self.device_mel = device_mel
        self._jax = jax
        self._jnp = jnp
        self._mel = compute_mel_spectrogram_np
        self.hop = HOP_LENGTH
        self.sr = SAMPLE_RATE

        from velocity_asr_tpu.models.model import forward

        def infer(params, mel):
            return forward(model, params, mel, train=False)

        self._infer = jax.jit(infer)

        def masked_logits(params, audio, n_valid_frames):
            # n_valid_frames: (batch,) int32 — the pipeline is batched so the
            # serving daemon can micro-batch concurrent requests into one
            # device call.
            if audio.dtype == jnp.int16:
                # Audio crosses the host link as int16 PCM (the source WAV
                # sample format — lossless, half the bytes of fp32; the
                # link is the serve bottleneck) and is rescaled on device.
                audio = audio.astype(jnp.float32) * (1.0 / 32768.0)
            mel = compute_mel_spectrogram(audio, normalize=False)
            mel = masked_normalize_mel(mel, n_valid_frames)
            logits = forward(model, params, mel, train=False)
            # force blank beyond the valid output frames so device-side
            # decoding needs no host slicing
            t = logits.shape[1]
            out_len = (jnp.asarray(n_valid_frames, jnp.int32).reshape(-1) + 1) // 2
            pad = (jnp.arange(t)[None, :] >= out_len[:, None])[:, :, None]
            logits = jnp.where(pad, -1e9, logits)
            return logits.at[:, :, 0].set(jnp.where(pad[..., 0], 0.0, logits[:, :, 0]))

        self._infer_audio = jax.jit(
            lambda p, a, n: masked_logits(p, a, n)
        )

        from velocity_asr_tpu.decode import ctc_greedy_decode_jax

        def greedy_tokens(params, audio, n_valid_frames):
            logits = masked_logits(params, audio, n_valid_frames)
            return ctc_greedy_decode_jax(logits)

        def frame_preds(params, audio, n_valid_frames):
            # (argmax ids, their per-frame log posterior) — the lp feeds
            # word confidences on the --timestamps path; only two (B, T)
            # vectors cross the host link
            lsm = jax.nn.log_softmax(
                masked_logits(params, audio, n_valid_frames).astype(jnp.float32)
            )
            return jnp.argmax(lsm, axis=-1), jnp.max(lsm, axis=-1)

        # Device-side decode: only token ids cross the host link (full
        # logits are vocab_size/2 KB per frame — dominant at serve time).
        self._greedy_tokens = jax.jit(greedy_tokens)
        self._frame_preds = jax.jit(frame_preds)

        # Language identification (models with num_languages > 0): the LID
        # head's posterior, pooled over the valid output frames only.
        self.num_languages = int(getattr(model.config, "num_languages", 0) or 0)
        if self.num_languages > 0:
            def lid_probs_mel(params, mel, out_len):
                _, feats = forward(
                    model, params, mel, train=False,
                    return_features=True, feature_lengths=out_len,
                )
                return jax.nn.softmax(
                    feats["lid_logits"].astype(jnp.float32), axis=-1
                )

            def lid_probs_audio(params, audio, n_valid_frames):
                if audio.dtype == jnp.int16:
                    audio = audio.astype(jnp.float32) * (1.0 / 32768.0)
                mel = compute_mel_spectrogram(audio, normalize=False)
                mel = masked_normalize_mel(mel, n_valid_frames)
                out_len = (
                    jnp.asarray(n_valid_frames, jnp.int32).reshape(-1) + 1
                ) // 2
                return lid_probs_mel(params, mel, out_len)

            self._lid_probs_mel = jax.jit(lid_probs_mel)
            self._lid_probs_audio = jax.jit(lid_probs_audio)

    def frame_bucket_of(self, audio: np.ndarray) -> int:
        """The frame bucket this utterance pads to on its own. The serving
        micro-batcher groups requests by this value: the global-context
        pooling is not length-masked, so batching a short clip into a much
        longer utterance's bucket would change its transcription."""
        min_frames = 1 + -(-len(audio) // self.hop)
        return -(-min_frames // self.frame_bucket) * self.frame_bucket

    def _pad_audio(self, audio: np.ndarray):
        """Reflect-pad audio to the sample bucket (exact valid frames)."""
        n_frames = 1 + len(audio) // self.hop
        bucket = self.frame_bucket_of(audio)
        target_samples = (bucket - 1) * self.hop
        audio = np.asarray(audio, np.float32)
        if len(audio) >= 2:
            padded = np.pad(audio, (0, target_samples - len(audio)), mode="reflect")
        else:
            padded = np.zeros(target_samples, np.float32)
            padded[: len(audio)] = audio
        return padded[None], n_frames

    @staticmethod
    def _to_wire(audio_f32: np.ndarray) -> np.ndarray:
        """int16 PCM for the host->device link (see masked_logits)."""
        return np.clip(audio_f32 * 32768.0, -32768, 32767).astype(np.int16)

    def logits_for(self, audio: np.ndarray):
        n_frames = 1 + len(audio) // self.hop
        if self.device_mel:
            padded, n_frames = self._pad_audio(audio)
            logits = np.asarray(
                self._infer_audio(
                    self.params, self._jnp.asarray(self._to_wire(padded)), n_frames
                )
            )
        else:
            bucket = -(-n_frames // self.frame_bucket) * self.frame_bucket
            mel = self._mel(audio)  # exact per-utterance mel on host
            mel_padded = np.zeros((1, bucket, mel.shape[1]), np.float32)
            mel_padded[0, : mel.shape[0]] = mel
            logits = np.asarray(self._infer(self.params, self._jnp.asarray(mel_padded)))
        out_len = (n_frames + 1) // 2
        return logits[:, :out_len], out_len

    def language_probs(self, audio: np.ndarray) -> np.ndarray:
        """Posterior over the model's languages for one utterance
        (the LID head; requires model config num_languages > 0)."""
        if self.num_languages <= 0:
            raise ValueError(
                "this model has no language-ID head (num_languages=0); "
                "train with model output.num_languages > 0 and "
                "training.lid_loss_weight > 0"
            )
        n_frames = 1 + len(audio) // self.hop
        if self.device_mel:
            padded, n_frames = self._pad_audio(audio)
            probs = self._lid_probs_audio(
                self.params, self._jnp.asarray(self._to_wire(padded)), n_frames
            )
        else:
            bucket = -(-n_frames // self.frame_bucket) * self.frame_bucket
            mel = self._mel(audio)
            mel_padded = np.zeros((1, bucket, mel.shape[1]), np.float32)
            mel_padded[0, : mel.shape[0]] = mel
            out_len = np.asarray([(n_frames + 1) // 2], np.int32)
            probs = self._lid_probs_mel(
                self.params, self._jnp.asarray(mel_padded), out_len
            )
        return np.asarray(probs)[0]

    def _lid_result(self, audio: np.ndarray, result: dict) -> None:
        probs = self.language_probs(audio)
        result["language"] = int(np.argmax(probs))
        result["language_prob"] = float(np.max(probs))
        result["language_probs"] = [float(p) for p in probs]

    def _beam_timestamp_result(self, result, logits, beam_width,
                               lm_scorer, lm_weight) -> None:
        """--timestamps composed with --beam-width (VERDICT r4 item 7):
        the beam (with any LM/hotword rescoring) picks the token
        sequence, then a CTC Viterbi forced alignment against the same
        logits pins each token's frame span and mean posterior
        (decode.align_tokens_to_frames)."""
        from velocity_asr_tpu.decode import (
            _log_softmax_np,
            align_tokens_to_frames,
        )

        beams = self.decoder.decode_beam_search(
            logits, beam_width=beam_width, backend="jax",
            lm_scorer=lm_scorer, lm_weight=lm_weight, return_all_beams=True,
        )[0]
        tokens = beams[0].tokens if beams else []
        result["text"] = self.decoder._tokens_to_text(tokens)
        lsm = _log_softmax_np(np.asarray(logits[0], np.float32))
        stamps, token_lp = align_tokens_to_frames(
            lsm, tokens, self.decoder.blank_token
        )
        result["words"] = words_with_timestamps(
            tokens, stamps, self.decoder.vocabulary, self.hop, self.sr,
            token_logprobs=token_lp,
        )

    def transcribe_array(self, audio: np.ndarray, timestamps: bool = False,
                         beam_width: int = None, lm_scorer=None,
                         lm_weight: float = None,
                         identify_language: bool = False):
        """Transcribe one utterance. `beam_width` / `lm_scorer` /
        `lm_weight` override the instance defaults for this call (serving
        passes each request's values instead of mutating shared state
        under a lock)."""
        from velocity_asr_tpu.decode import timestamps_from_predictions

        if beam_width is None:
            beam_width = self.beam_width
        if lm_scorer is None:
            lm_scorer = self.lm_scorer
        if lm_weight is None:
            lm_weight = self.lm_weight
        result = {"duration": len(audio) / self.sr}
        if identify_language:
            self._lid_result(audio, result)
        if not self.device_mel:
            # host-mel fallback: decode from downloaded logits
            logits, _ = self.logits_for(audio)
            if timestamps and beam_width > 1:
                self._beam_timestamp_result(
                    result, logits, beam_width, lm_scorer, lm_weight
                )
            elif timestamps:
                from velocity_asr_tpu.decode import (
                    _log_softmax_np,
                    token_logprobs_from_frames,
                )

                lsm = _log_softmax_np(np.asarray(logits[0], np.float32))
                tokens, stamps = timestamps_from_predictions(
                    np.argmax(lsm, -1)[None]
                )[0]
                result["text"] = self.decoder._tokens_to_text(tokens)
                result["words"] = words_with_timestamps(
                    tokens, stamps, self.decoder.vocabulary, self.hop, self.sr,
                    token_logprobs=token_logprobs_from_frames(
                        lsm.max(-1), stamps),
                )
            elif beam_width > 1:
                result["text"] = self.decoder.decode_beam_search(
                    logits, beam_width=beam_width,
                    lm_scorer=lm_scorer, lm_weight=lm_weight,
                )[0]
            else:
                result["text"] = self.decoder.decode_greedy(logits)[0]
            return result

        # Device path: mel + forward + decode run in one jit; only token
        # ids cross the host link (full logits are ~vocab/2 KB per frame).
        padded, n_frames = self._pad_audio(audio)
        out_len = (n_frames + 1) // 2
        audio_dev = self._jnp.asarray(self._to_wire(padded))
        if timestamps and beam_width > 1:
            # rich-output beam path: the full logits cross the host link
            # once; the beam picks the sequence, Viterbi alignment pins
            # the frames (decode.align_tokens_to_frames).
            logits = np.asarray(
                self._infer_audio(self.params, audio_dev, n_frames)
            )[:, :out_len]
            self._beam_timestamp_result(
                result, logits, beam_width, lm_scorer, lm_weight
            )
        elif timestamps:
            from velocity_asr_tpu.decode import token_logprobs_from_frames

            preds_dev, lp_dev = self._frame_preds(self.params, audio_dev, n_frames)
            preds, frame_lp = np.asarray(preds_dev), np.asarray(lp_dev)
            tokens, stamps = timestamps_from_predictions(preds[:, :out_len])[0]
            result["text"] = self.decoder._tokens_to_text(tokens)
            result["words"] = words_with_timestamps(
                tokens, stamps, self.decoder.vocabulary, self.hop, self.sr,
                token_logprobs=token_logprobs_from_frames(frame_lp[0], stamps),
            )
        elif beam_width > 1:
            logits = self._infer_audio(self.params, audio_dev, n_frames)
            # On-device batched beam; n-best rescored by any lm_scorer
            # (hotword boosting) inside decode_beam_search.
            result["text"] = self.decoder.decode_beam_search(
                logits, beam_width=beam_width, backend="jax",
                lm_scorer=lm_scorer, lm_weight=lm_weight,
            )[0]
        else:
            toks, lens = self._greedy_tokens(self.params, audio_dev, n_frames)
            toks, lens = np.asarray(toks), np.asarray(lens)
            result["text"] = self.decoder._tokens_to_text(toks[0, : lens[0]].tolist())
        return result

    def transcribe_batch(self, audios):
        """Batched greedy device path (the serving micro-batcher): pads
        utterances to their sample bucket and a power-of-two batch size,
        so a handful of compiled shapes serve arbitrary request mixes.
        Utterances are grouped BY BUCKET (one device call per bucket in
        the mix): the global-context pooling is not length-masked, so
        padding a short clip to a long utterance's bucket would change
        its transcription. Only token ids cross the host link. Returns a
        list of {"text", "duration"} dicts in input order."""
        assert self.device_mel, "batched path requires device mel"
        buckets: dict = {}
        for i, a in enumerate(audios):
            buckets.setdefault(self.frame_bucket_of(a), []).append(i)
        if len(buckets) > 1:
            out = [None] * len(audios)
            for idxs in buckets.values():
                for i, r in zip(idxs, self.transcribe_batch(
                        [audios[i] for i in idxs])):
                    out[i] = r
            return out
        padded_list, n_frames_list = [], []
        for a in audios:
            p, nf = self._pad_audio(a)
            padded_list.append(p[0])
            n_frames_list.append(nf)
        max_len = max(p.shape[0] for p in padded_list)
        b = len(audios)
        bpad = 1 << (b - 1).bit_length()  # batch bucket (1, 2, 4, 8, ...)
        batch = np.zeros((bpad, max_len), np.float32)
        for i, p in enumerate(padded_list):
            batch[i, : p.shape[0]] = p
        nvec = np.ones((bpad,), np.int32)
        nvec[:b] = n_frames_list
        toks, lens = self._greedy_tokens(
            self.params, self._jnp.asarray(self._to_wire(batch)), self._jnp.asarray(nvec)
        )
        toks, lens = np.asarray(toks), np.asarray(lens)
        return [
            {
                "text": self.decoder._tokens_to_text(toks[i, : lens[i]].tolist()),
                "duration": len(a) / self.sr,
            }
            for i, a in enumerate(audios)
        ]

    def transcribe_file(self, path: str, timestamps: bool = False,
                        identify_language: bool = False):
        from velocity_asr_tpu.audio import load_audio

        t0 = time.perf_counter()
        audio = load_audio(path)
        result = self.transcribe_array(audio, timestamps=timestamps,
                                       identify_language=identify_language)
        result["file"] = path
        result["rtf"] = (time.perf_counter() - t0) / max(result["duration"], 1e-9)
        return result


def make_streaming_transcriber(model, params, decoder, chunk_seconds=2.0,
                               lookahead=0, beam_width=0, beam_scorers=None):
    """Build one StreamingTranscriber for a batch of files: its jitted
    chunk step compiles once; reset() starts each new session.
    beam_width > 1 decodes with the chunk-carried beam (beam_scorers =
    [(scorer, weight)] rescores the n-best at finish — LM fusion /
    hotword boosting on the live path)."""
    from velocity_asr_tpu.streaming import StreamingTranscriber

    frames = round(chunk_seconds * 100)
    frames += frames % 2  # even chunk contract
    return StreamingTranscriber(model, params, decoder, chunk_frames=frames,
                                lookahead_chunks=lookahead,
                                beam_width=beam_width,
                                beam_scorers=beam_scorers)


def transcribe_streaming(st, path, timestamps=False):
    """Chunked streaming transcription: exact SSM/conv carry, per-chunk
    global context (velocity_asr_tpu.streaming). lookahead > 0 emits each
    chunk N chunks late with offline-like context (see StreamingTranscriber).
    timestamps=True adds word-level timings (the same assembly as the
    offline --timestamps path, tracked across chunk boundaries).

    The feed block size is derived from the transcriber's own compiled
    chunk length so the two can never diverge."""
    from velocity_asr_tpu.audio import HOP_LENGTH, SAMPLE_RATE, load_audio

    st.reset()  # new session, same compiled step
    t0 = time.perf_counter()
    audio = load_audio(path)
    block = st.chunk_frames * HOP_LENGTH
    text = ""
    for i in range(0, len(audio), block):
        text += st.feed(audio[i : i + block])
    text += st.finish()
    duration = len(audio) / SAMPLE_RATE
    result = {
        "file": path,
        "text": text,
        "duration": duration,
        "rtf": (time.perf_counter() - t0) / max(duration, 1e-9),
        "streaming": True,
    }
    if timestamps:
        result["words"] = st.words()
    return result


def collect_files(input_dir: str):
    out = []
    for root, _, files in os.walk(input_dir):
        for f in sorted(files):
            if f.lower().endswith(AUDIO_EXTS):
                out.append(os.path.join(root, f))
    return out


def main():
    parser = argparse.ArgumentParser(description="Transcribe audio with VELOCITY-ASR TPU")
    parser.add_argument("audio", nargs="?", help="audio file to transcribe")
    parser.add_argument("--input-dir", help="transcribe every audio file under a directory")
    parser.add_argument("--checkpoint", required=True, help="pretrained checkpoint dir")
    parser.add_argument("--output", help="write results to file")
    parser.add_argument("--json", action="store_true", help="JSON output")
    parser.add_argument("--timestamps", action="store_true", help="word-level timestamps")
    parser.add_argument("--beam-width", type=int, default=0, help=">1 enables beam search")
    parser.add_argument(
        "--hotwords", default=None,
        help="hot-word boosting (the reference's planned 'custom vocabulary "
             "injection', implemented): a file (one word/phrase per line) or "
             "an inline comma-separated list; requires --beam-width > 1",
    )
    parser.add_argument(
        "--hotword-weight", type=float, default=2.0,
        help="shallow-fusion weight for --hotwords (bonus per matched "
             "character, in log-prob units)",
    )
    parser.add_argument(
        "--lm", default=None,
        help="character n-gram LM for beam shallow fusion "
             "(scripts/train_lm.py artifact); requires --beam-width > 1",
    )
    parser.add_argument("--lm-weight", type=float, default=0.5)
    parser.add_argument(
        "--streaming", action="store_true",
        help="chunked streaming decode with carried SSM state (long-form audio)",
    )
    parser.add_argument(
        "--chunk-seconds", type=float, default=2.0,
        help="streaming chunk size in seconds",
    )
    parser.add_argument(
        "--lookahead", type=int, default=0,
        help="streaming: emit each chunk N chunks late, re-decoded with "
             "future global context + normalization stats (offline-like "
             "accuracy at N*chunk extra latency)",
    )
    parser.add_argument(
        "--sequence-parallel", action="store_true",
        help="shard the SSM scans' time axis across all local devices "
             "(sequence parallelism for long-form audio; SURVEY.md §2.4)",
    )
    parser.add_argument(
        "--identify-language", action="store_true",
        help="also report the language-ID head's prediction (models "
             "trained with num_languages > 0; the reference's planned "
             "multilingual extension, README.md:480)",
    )
    args = parser.parse_args()

    if not args.audio and not args.input_dir:
        parser.error("provide an audio file or --input-dir")
    # Reject flag combinations that would otherwise be silently dropped
    # (same convention as evaluate.py / serve.py).
    if args.lookahead and not args.streaming:
        parser.error("--lookahead requires --streaming")
    if args.hotwords and args.beam_width <= 1:
        parser.error("--hotwords biases the beam search; add --beam-width "
                     "(e.g. --beam-width 8)")
    if args.lm and args.beam_width <= 1:
        parser.error("--lm fuses into the beam search; add --beam-width "
                     "(e.g. --beam-width 8)")
    if args.identify_language and args.streaming:
        parser.error("--identify-language is not supported with --streaming "
                     "(the LID head pools over the full utterance)")

    from velocity_asr_tpu.decode import CTCDecoder, create_default_vocabulary
    from velocity_asr_tpu.models.model import from_pretrained

    overrides = {}
    sp_ctx = None
    if args.sequence_parallel:
        import jax

        from velocity_asr_tpu.parallel import create_mesh, sequence_parallel

        overrides["scan_mode"] = "sp"
        mesh = create_mesh()
        sp_ctx = sequence_parallel(mesh)
        logger.info(
            "Sequence parallelism: time axis sharded over %d devices", len(jax.devices())
        )
    model, params = from_pretrained(args.checkpoint, **overrides)
    vocab_path = os.path.join(args.checkpoint, "vocabulary.json")
    if os.path.exists(vocab_path):
        with open(vocab_path) as f:
            vocabulary = json.load(f)
    else:
        vocabulary = create_default_vocabulary(model.config.vocab_size)
    decoder = CTCDecoder(vocabulary)
    scorer_parts = []
    if args.hotwords:
        from velocity_asr_tpu.hotwords import load_hotwords_arg

        booster = load_hotwords_arg(args.hotwords, decoder.token_to_idx)
        logger.info("Hotword boosting: %d word(s), weight %.2f",
                    len(booster.words), args.hotword_weight)
        scorer_parts.append((booster, args.hotword_weight))
    if args.lm:
        from velocity_asr_tpu.lm import CharNGramLM

        ngram = CharNGramLM.load(args.lm)
        logger.info("LM shallow fusion: order-%d char n-gram, weight %.2f",
                    ngram.order, args.lm_weight)
        scorer_parts.append((ngram, args.lm_weight))
    if len(scorer_parts) > 1:
        from velocity_asr_tpu.lm import CombinedScorer

        scorer, scorer_weight = CombinedScorer(scorer_parts), 1.0
    elif scorer_parts:
        scorer, scorer_weight = scorer_parts[0]
    else:
        scorer, scorer_weight = None, 0.0
    pipeline = Transcriber(model, params, decoder, beam_width=args.beam_width,
                           lm_scorer=scorer, lm_weight=scorer_weight)
    if args.identify_language and pipeline.num_languages <= 0:
        parser.error("--identify-language requires a model with a LID head "
                     "(trained with output.num_languages > 0); this "
                     "checkpoint has none")
    streamer = None
    if args.streaming:
        streamer = make_streaming_transcriber(
            model, params, decoder, args.chunk_seconds,
            lookahead=args.lookahead, beam_width=args.beam_width,
            beam_scorers=[(scorer, scorer_weight)] if scorer else None,
        )

    files = [args.audio] if args.audio else collect_files(args.input_dir)
    results = []
    if sp_ctx is None:
        import contextlib

        sp_ctx = contextlib.nullcontext()
    with sp_ctx:  # scans trace against the SP mesh inside this block
        for path in files:
            try:
                if args.streaming:
                    result = transcribe_streaming(streamer, path,
                                                  timestamps=args.timestamps)
                else:
                    result = pipeline.transcribe_file(
                        path, timestamps=args.timestamps,
                        identify_language=args.identify_language,
                    )
                results.append(result)
                logger.info("%s -> %s (RTF %.4f)", path, result["text"], result["rtf"])
                if "language" in result:
                    logger.info("%s -> language %d (p=%.3f)", path,
                                result["language"], result["language_prob"])
            except Exception as e:  # per-file isolation (reference :278-279)
                logger.error("Failed on %s: %s", path, e)
                results.append({"file": path, "error": str(e)})

    if args.output:
        with open(args.output, "w") as f:
            if args.json:
                json.dump(results, f, indent=2)
            else:
                for r in results:
                    f.write(f"{r.get('file','')}\t{r.get('text', r.get('error',''))}\n")
        logger.info("Wrote %s", args.output)
    elif args.json:
        print(json.dumps(results, indent=2))

    return results


if __name__ == "__main__":
    main()
