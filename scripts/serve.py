#!/usr/bin/env python3
"""Serve VELOCITY-ASR TPU over HTTP.

A lightweight stdlib serving daemon around the single-utterance fast path
(on-device mel + forward + greedy decode, token-ids-only host transfer).
The reference has no serving runtime at all (SURVEY.md §1: "serve" = CLI
batch transcription); this is the deployment-facing counterpart.

Endpoints:
  GET  /health               -> {"status": "ok", "model": {...}}
  POST /transcribe           -> {"text", "duration", "rtf"}
      body: audio file bytes (WAV or FLAC; decoded by the native decoder)
      query: ?timestamps=1 adds word timings + confidences, ?beam=N
             uses beam search,
             ?hotwords=a,b&hotword_weight=W biases the beam toward the
             request's custom vocabulary (requires beam > 1),
             ?identify_language=1 adds the LID head's prediction
             (models trained with num_languages > 0)
  POST /diarize              -> {"segments": [{start, end, speaker[, text]}],
                                 "duration", "rtf"}
      requires --speaker-model; the reference's planned "Speaker
      Diarization: Integration of speaker identification output"
      (README.md:483) as a service surface.
      query: ?num_speakers=N pins the speaker count,
             ?transcripts=1 adds per-segment ASR text
             (speaker-attributed transcription)
  POST /stream               -> NDJSON: {"text": increment[, "words"]}*
                                then {"final": true, "text", "duration",
                                "rtf"[, "words"]}
      live incremental transcription over one HTTP request (the
      reference's "Streaming Mode" future-work item, README.md:480-482,
      as a service surface over velocity_asr_tpu.streaming). Body is
      16 kHz mono audio — raw int16 PCM, or a WAV whose header declares
      that format — sent with Transfer-Encoding: chunked (or
      Content-Length); text increments are written back as the audio
      arrives. query: ?chunk_seconds=S (default 2.0) sets the decode
      cadence, ?lookahead=N delays each chunk's emission N chunks for
      offline-like context (see StreamingTranscriber), ?beam=N decodes
      with a chunk-carried beam search (finalized text is the beams'
      common prefix; with --lm the n-best is LM-rescored at the end),
      ?timestamps=1 adds word-level timings to the increments
      (finalized words) and the final line — composes with ?beam via
      the in-beam span tracker.
      Default-cadence sessions — greedy, ?lookahead, and ?beam alike —
      are micro-batched through one compiled step per (lookahead, beam)
      shape, all drawing from one --max-streams budget; non-default
      cadences use pooled per-session transcribers — at most
      --max-streams concurrently (503 beyond that), serialized on the
      device lock.

Example:
  python scripts/serve.py --checkpoint ckpts/final_pretrained --port 8570
  curl -s --data-binary @utt.flac localhost:8570/transcribe
  python scripts/serve.py --checkpoint ... \
      --speaker-model checkpoints/speaker_v2p/final_speaker
  curl -s --data-binary @meeting.wav 'localhost:8570/diarize?transcripts=1'
  # live microphone -> captions (any tool that emits 16 kHz mono s16le)
  arecord -f S16_LE -r 16000 -c 1 -t raw | \
      curl -sN -H 'Transfer-Encoding: chunked' -T - localhost:8570/stream
"""

import argparse
import json
import logging
import os
import queue
import sys
import tempfile
import threading
import time
from concurrent.futures import Future
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from velocity_asr_tpu.utils.platform import apply_platform_env

apply_platform_env()

logging.basicConfig(
    level=logging.INFO, format="%(asctime)s | %(levelname)s | %(message)s"
)
logger = logging.getLogger("serve")


class BadRequest(Exception):
    """Client-side fault (undecodable audio, unsupported flag combo):
    maps to HTTP 400; everything else is a 500."""


class ServiceBusy(Exception):
    """All streaming sessions are in use: maps to HTTP 503."""


class PcmDecoder:
    """Incremental 16 kHz mono int16 PCM decoder for the /stream body.

    Accepts an optional leading WAV header — it must declare exactly the
    raw format (PCM16, mono, 16 kHz), otherwise the request is the
    client's fault. Carries the odd byte across block boundaries.
    """

    _MAX_HEADER = 65536

    def __init__(self, sample_rate: int):
        self.sample_rate = sample_rate
        self._buf = b""
        self._header_checked = False

    def _parse_wav_header(self):
        """Return the 'data' chunk payload offset, or None if more bytes
        are needed. Raises BadRequest on a non-matching format."""
        buf = self._buf
        if len(buf) < 12:
            return None
        if buf[8:12] != b"WAVE":
            raise BadRequest("RIFF body is not a WAV file")
        pos, fmt_ok = 12, False
        while True:
            if len(buf) < pos + 8:
                return None
            cid = buf[pos:pos + 4]
            size = int.from_bytes(buf[pos + 4:pos + 8], "little")
            if cid == b"data":
                if not fmt_ok:
                    raise BadRequest("WAV 'data' chunk precedes 'fmt '")
                return pos + 8
            if len(buf) < pos + 8 + size:
                return None
            if cid == b"fmt ":
                audio_format = int.from_bytes(buf[pos + 8:pos + 10], "little")
                channels = int.from_bytes(buf[pos + 10:pos + 12], "little")
                rate = int.from_bytes(buf[pos + 12:pos + 16], "little")
                bits = int.from_bytes(buf[pos + 22:pos + 24], "little")
                if (audio_format, channels, rate, bits) != \
                        (1, 1, self.sample_rate, 16):
                    raise BadRequest(
                        "/stream WAV must be PCM16 mono "
                        f"{self.sample_rate} Hz; got format={audio_format} "
                        f"channels={channels} rate={rate} bits={bits}"
                    )
                fmt_ok = True
            pos += 8 + size + (size & 1)  # chunks are word-aligned

    def feed(self, block: bytes):
        import numpy as np

        self._buf += block
        if not self._header_checked:
            if len(self._buf) < 4:
                return np.zeros(0, np.float32)
            if self._buf[:4] == b"RIFF":
                data_ofs = self._parse_wav_header()
                if data_ofs is None:
                    if len(self._buf) > self._MAX_HEADER:
                        raise BadRequest("WAV header too large")
                    return np.zeros(0, np.float32)
                self._buf = self._buf[data_ofs:]
            self._header_checked = True
        n = len(self._buf) // 2
        if n == 0:
            return np.zeros(0, np.float32)
        pcm = np.frombuffer(self._buf[: 2 * n], "<i2")
        self._buf = self._buf[2 * n:]
        return pcm.astype(np.float32) / 32768.0


class StreamPool:
    """Reusable streaming-transcription sessions.

    Each StreamingTranscriber owns its jitted chunk-step closures, so
    building one per request would recompile the streaming graph every
    time. The pool keeps finished sessions (reset() reuses the compiled
    steps) keyed by (chunk_frames, lookahead), capping live sessions at
    max_streams; a request for a new shape may evict an idle session of
    another shape to make room.
    """

    def __init__(self, transcriber, max_streams: int = 2, beam_scorers=None):
        self.transcriber = transcriber
        self.max_streams = max_streams
        self.beam_scorers = beam_scorers  # [(scorer, weight)] for beam>1
        self._cv = threading.Condition()
        self._idle: dict = {}  # key -> [StreamingTranscriber]
        self._live = 0  # sessions in existence (idle + acquired)

    def acquire(self, chunk_frames: int, lookahead: int, beam: int = 0,
                timeout: float = 10.0):
        key = (chunk_frames, lookahead, beam)
        deadline = time.monotonic() + timeout
        with self._cv:
            while True:
                free = self._idle.get(key)
                if free:
                    st = free.pop()
                    st.reset()
                    return st
                if self._live >= self.max_streams:
                    # evict an idle session of another shape, if any
                    for lst in self._idle.values():
                        if lst:
                            lst.pop()
                            self._live -= 1
                            break
                if self._live < self.max_streams:
                    self._live += 1
                    break  # create below, outside the lock (compiles)
                remaining = deadline - time.monotonic()
                if remaining <= 0:
                    raise ServiceBusy(
                        f"all {self.max_streams} streaming sessions are "
                        "busy; retry later or raise --max-streams"
                    )
                self._cv.wait(remaining)
        from velocity_asr_tpu.streaming import StreamingTranscriber

        try:
            return StreamingTranscriber(
                self.transcriber.model, self.transcriber.params,
                self.transcriber.decoder, chunk_frames=chunk_frames,
                lookahead_chunks=lookahead, beam_width=beam,
                beam_scorers=self.beam_scorers if beam > 1 else None,
            )
        except BaseException:
            with self._cv:
                self._live -= 1
                self._cv.notify()
            raise

    def release(self, st) -> None:
        beam = st._sbeam.beam_width if st._sbeam is not None else 0
        key = (st.chunk_frames, st.lookahead_chunks, beam)
        with self._cv:
            self._idle.setdefault(key, []).append(st)
            self._cv.notify()


class MicroBatcher:
    """Coalesces concurrent greedy requests into one batched device call.

    Requests arriving within `window_ms` of the first are grouped (up to
    `max_batch`) and run through Transcriber.transcribe_batch — one jit
    call instead of max_batch serialized ones. Beam/timestamp requests
    bypass the batcher (they keep the single-utterance path)."""

    def __init__(self, transcriber, max_batch: int = 8, window_ms: float = 10.0):
        self.transcriber = transcriber
        self.max_batch = max_batch
        self.window = window_ms / 1e3
        self.q: "queue.Queue" = queue.Queue()
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    def submit(self, audio) -> Future:
        fut: Future = Future()
        self.q.put((audio, fut))
        return fut

    def _loop(self):
        while True:
            audio, fut = self.q.get()
            group = [(audio, fut)]
            deadline = time.perf_counter() + self.window
            while len(group) < self.max_batch:
                timeout = deadline - time.perf_counter()
                if timeout <= 0:
                    break
                try:
                    group.append(self.q.get(timeout=timeout))
                except queue.Empty:
                    break
            try:
                # transcribe_batch groups by frame bucket internally, so a
                # mixed-length group cannot perturb its short members.
                results = self.transcriber.transcribe_batch([a for a, _ in group])
                for (_, f), r in zip(group, results):
                    f.set_result(r)
            except Exception as e:
                for _, f in group:
                    if not f.done():
                        f.set_exception(e)


class ASRService:
    """Checkpoint + compiled pipelines + a micro-batching dispatcher."""

    def __init__(self, checkpoint: str, beam_width: int = 0,
                 max_batch: int = 8, batch_window_ms: float = 10.0,
                 speaker_model: str = None, max_streams: int = 2,
                 lm_path: str = None, lm_weight: float = 0.5):
        from velocity_asr_tpu.decode import CTCDecoder, create_default_vocabulary
        from velocity_asr_tpu.models.model import from_pretrained
        from scripts.transcribe import Transcriber

        self.model, params = from_pretrained(checkpoint)
        vocab_path = os.path.join(checkpoint, "vocabulary.json")
        if os.path.exists(vocab_path):
            with open(vocab_path) as f:
                vocabulary = json.load(f)
        else:
            vocabulary = create_default_vocabulary(self.model.config.vocab_size)
        self.decoder = CTCDecoder(vocabulary)
        self.transcriber = Transcriber(
            self.model, params, self.decoder, beam_width=beam_width
        )
        self.lock = threading.Lock()
        # Optional char n-gram LM (scripts/train_lm.py artifact): shallow
        # fusion on beam requests — /stream ?beam=N rescoring and offline
        # beams alike.
        self.lm = None
        self.lm_weight = lm_weight
        if lm_path:
            from velocity_asr_tpu.lm import CharNGramLM

            self.lm = CharNGramLM.load(lm_path)
            logger.info("LM loaded: order-%d char n-gram, weight %.2f",
                        self.lm.order, lm_weight)
        self.batcher = MicroBatcher(
            self.transcriber, max_batch=max_batch, window_ms=batch_window_ms
        )
        self.stream_pool = StreamPool(
            self.transcriber, max_streams=max_streams,
            beam_scorers=[(self.lm, lm_weight)] if self.lm else None,
        )
        # Default-cadence /stream sessions (any ?lookahead, any ?beam) are
        # micro-batched through ONE compiled chunk step per
        # (lookahead, beam) shape (streaming.StreamSessionBatcher):
        # concurrent live streams share each device round trip instead of
        # serializing on it; lookahead batchers run the frozen-memory
        # re-decodes as a second batched call, and beam batchers fuse the
        # chunk-carried beam resume + commit into the same call (VERDICT
        # r4 item 4 — beam sessions used to serialize via the pool). Built
        # lazily on the first such session. ALL batchers draw from ONE
        # shared --max-streams budget (advisor r4: per-shape batchers must
        # not multiply the cap), though each constructed shape keeps its
        # own (small) device state rows. Non-default cadences fall back to
        # per-session pooled transcribers — at most --max-streams of
        # those run concurrently and they serialize on the device lock.
        self.stream_batchers = {}  # (lookahead, beam) -> StreamSessionBatcher
        self._stream_batcher_slots = max_streams
        self._batched_live = 0  # sessions across ALL batchers (shared cap)
        self._batcher_lock = threading.Lock()
        self.diarizer = None
        if speaker_model:
            from velocity_asr_tpu.diarize import Diarizer

            self.diarizer = Diarizer(speaker_model)
            logger.info("Speaker model loaded: %s", speaker_model)
        logger.info("Model loaded: %s", self.model.config)

    def _decode_body(self, data: bytes):
        """Decode an uploaded audio body via the native decoders; a body we
        cannot decode is the client's fault (400)."""
        from velocity_asr_tpu.audio import load_audio

        with tempfile.NamedTemporaryFile(suffix=".audio", delete=False) as f:
            f.write(data)
            path = f.name
        try:
            return load_audio(path)
        except (ValueError, RuntimeError) as e:
            # don't leak the server-side temp path to the client
            raise BadRequest(str(e).replace(repr(path), "request body")) from e
        finally:
            os.unlink(path)

    def diarize_bytes(self, data: bytes, num_speakers=None,
                      transcripts: bool = False):
        from velocity_asr_tpu.audio import SAMPLE_RATE

        if self.diarizer is None:
            raise BadRequest("this server has no speaker model; restart "
                             "serve.py with --speaker-model DIR to enable "
                             "/diarize")
        audio = self._decode_body(data)
        t0 = time.perf_counter()
        with self.lock:
            segs = self.diarizer.diarize(audio, n_speakers=num_speakers)
            if transcripts and segs:
                clips = [
                    audio[int(s.start * SAMPLE_RATE): int(s.end * SAMPLE_RATE)]
                    for s in segs
                ]
                for s, r in zip(segs, self.transcriber.transcribe_batch(clips)):
                    s.text = r["text"]
        duration = len(audio) / SAMPLE_RATE
        return {
            "segments": [s.to_dict() for s in segs],
            "num_speakers": len({s.speaker for s in segs}),
            "duration": duration,
            "rtf": (time.perf_counter() - t0) / max(duration, 1e-9),
        }

    #: allowed /stream decode cadences (seconds). Snapping arbitrary
    #: ?chunk_seconds to this menu bounds the number of distinct compiled
    #: streaming graphs a client can force (each new chunk shape is a
    #: fresh jit compile that also occupies a pool slot).
    STREAM_CADENCES = (0.5, 1.0, 2.0, 4.0, 8.0, 15.0, 30.0)

    #: /stream decode cadence that routes to the shared micro-batched
    #: step (seconds)
    STREAM_DEFAULT_CADENCE = 2.0

    def open_stream(self, chunk_seconds: float, lookahead: int,
                    beam: int = 0):
        """Validate /stream query knobs and acquire a session.

        chunk_seconds snaps to the nearest STREAM_CADENCES entry. The
        default cadence — greedy, ?lookahead, and ?beam alike — gets a
        slot in the shared per-shape StreamSessionBatcher (concurrent
        streams share one compiled device call per chunk interval; all
        shapes draw from one --max-streams budget); non-default cadences
        use pooled per-session transcribers."""
        from velocity_asr_tpu.audio import HOP_LENGTH, SAMPLE_RATE

        if not 0.5 <= chunk_seconds <= 30.0:
            raise BadRequest("chunk_seconds must be in [0.5, 30]")
        if not 0 <= lookahead <= 4:
            raise BadRequest("lookahead must be in [0, 4]")
        if not 0 <= beam <= 16:
            raise BadRequest("beam must be in [0, 16]")
        beam = 0 if beam <= 1 else beam
        chunk_seconds = min(self.STREAM_CADENCES,
                            key=lambda c: abs(c - chunk_seconds))
        frames = int(round(chunk_seconds * SAMPLE_RATE / HOP_LENGTH))
        frames += frames % 2  # StreamingTranscriber needs an even chunk
        if chunk_seconds == self.STREAM_DEFAULT_CADENCE:
            from velocity_asr_tpu.streaming import (
                StreamSessionBatcher,
                StreamSlotsExhausted,
            )

            key = (lookahead, beam)
            with self._batcher_lock:
                if self._batched_live >= self._stream_batcher_slots:
                    raise ServiceBusy(
                        f"all {self._stream_batcher_slots} batched stream "
                        "slots are in use; retry later or raise "
                        "--max-streams"
                    )
                if key not in self.stream_batchers:
                    self.stream_batchers[key] = StreamSessionBatcher(
                        self.transcriber.model, self.transcriber.params,
                        self.transcriber.decoder, chunk_frames=frames,
                        max_slots=self._stream_batcher_slots,
                        lookahead=lookahead, beam_width=beam,
                        beam_scorers=(
                            [(self.lm, self.lm_weight)]
                            if beam and self.lm else None
                        ),
                    )
                self._batched_live += 1
            try:
                st = self.stream_batchers[key].open()
            except StreamSlotsExhausted as e:
                with self._batcher_lock:
                    self._batched_live -= 1
                raise ServiceBusy(str(e)) from e
            except BaseException:
                with self._batcher_lock:
                    self._batched_live -= 1
                raise
            st._pooled = False
            return st
        st = self.stream_pool.acquire(frames, lookahead, beam)
        st._pooled = True
        return st

    def release_stream(self, st) -> None:
        if st._pooled:
            self.stream_pool.release(st)
        else:
            st.close()
            with self._batcher_lock:
                self._batched_live -= 1

    def stream_feed(self, st, pcm) -> str:
        if st._pooled:
            # pooled sessions share the service's single-utterance device
            # path; batched sessions synchronize inside the batcher, and
            # taking the lock would re-serialize concurrent streams
            with self.lock:
                return st.feed(pcm)
        return st.feed(pcm)

    def stream_finish(self, st) -> str:
        if st._pooled:
            with self.lock:
                return st.finish()
        return st.finish()

    def transcribe_bytes(self, data: bytes, timestamps: bool, beam: int,
                         hotwords: str = "", hotword_weight: float = 2.0,
                         identify_language: bool = False):
        if identify_language and self.transcriber.num_languages <= 0:
            raise BadRequest("?identify_language needs a model with a LID "
                             "head (trained with num_languages > 0)")
        eff_beam = beam if beam > 0 else self.transcriber.beam_width
        booster = None
        if hotwords:
            # Per-request custom vocabulary (the reference's planned
            # "hot-word boosting" extension, implemented as shallow
            # fusion — velocity_asr_tpu/hotwords.py).
            if eff_beam <= 1:
                raise BadRequest("?hotwords biases the beam search; add "
                                 "?beam=N (N > 1)")
            from velocity_asr_tpu.hotwords import HotwordBooster

            try:
                booster = HotwordBooster(
                    hotwords.split(","), self.decoder.token_to_idx
                )
            except ValueError as e:
                raise BadRequest(str(e)) from e
        audio = self._decode_body(data)

        t0 = time.perf_counter()
        if timestamps or eff_beam > 1:
            # rich-output path: single-utterance pipeline under the lock;
            # the request's beam width / booster are passed as arguments,
            # never written into the shared transcriber
            with self.lock:
                result = self.transcriber.transcribe_array(
                    audio, timestamps=timestamps, beam_width=eff_beam,
                    lm_scorer=booster,
                    lm_weight=hotword_weight if booster else None,
                )
        else:
            # greedy path: coalesced into one batched device call with any
            # other requests in flight
            result = self.batcher.submit(audio).result()
        if identify_language:
            # Separate jitted LID call under the lock (both request paths);
            # see transcribe.Transcriber.language_probs.
            with self.lock:
                self.transcriber._lid_result(audio, result)
        result["rtf"] = (time.perf_counter() - t0) / max(result["duration"], 1e-9)
        return result


def make_handler(service: ASRService):
    class Handler(BaseHTTPRequestHandler):
        # HTTP/1.1: chunked uploads (`Expect: 100-continue` gets its
        # interim response) and keep-alive for /transcribe clients. Every
        # response sets Content-Length (_send) or Connection: close
        # (/stream), so 1.1 framing is always satisfied.
        protocol_version = "HTTP/1.1"
        # Socket idle timeout: a stalled /stream upload raises TimeoutError
        # in _iter_body, so the pooled session is released instead of held
        # forever (finally in _do_stream).
        timeout = 120

        def _send(self, code: int, payload: dict):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            if code != 200:
                # error paths respond before (fully) reading the request
                # body; keeping the HTTP/1.1 connection alive would make
                # the unread body bytes parse as the next request line
                self.send_header("Connection", "close")
                self.close_connection = True
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if urlparse(self.path).path == "/health":
                cfg = service.model.config
                self._send(200, {
                    "status": "ok",
                    "model": {
                        "d_model": cfg.d_model,
                        "vocab_size": cfg.vocab_size,
                        "scan_mode": cfg.scan_mode,
                        "dtype": cfg.dtype,
                    },
                })
            else:
                self._send(404, {"error": "unknown endpoint"})

        def _iter_body(self, max_block: int = 32768):
            """Yield request-body blocks as they arrive: chunked
            transfer-encoding (live streams) or Content-Length."""
            te = (self.headers.get("Transfer-Encoding") or "").lower()
            if "chunked" in te:
                while True:
                    line = self.rfile.readline(1024).strip()
                    if not line:
                        raise BadRequest("malformed chunked encoding")
                    try:
                        size = int(line.split(b";")[0], 16)
                    except ValueError as e:
                        raise BadRequest("malformed chunk size") from e
                    if size == 0:
                        while self.rfile.readline(1024).strip():
                            pass  # drain trailers up to the blank line
                        return
                    remaining = size
                    while remaining:
                        block = self.rfile.read1(min(remaining, max_block))
                        if not block:
                            raise BadRequest("truncated chunk")
                        remaining -= len(block)
                        yield block
                    self.rfile.read(2)  # chunk-terminating CRLF
            else:
                try:
                    remaining = int(self.headers.get("Content-Length", 0))
                except ValueError as e:
                    raise BadRequest("malformed Content-Length") from e
                if remaining <= 0:
                    raise BadRequest(
                        "empty body (send Content-Length or "
                        "Transfer-Encoding: chunked)"
                    )
                while remaining:
                    block = self.rfile.read1(min(remaining, max_block))
                    if not block:
                        raise BadRequest("truncated body")
                    remaining -= len(block)
                    yield block

        def _do_stream(self, parsed):
            from velocity_asr_tpu.audio import SAMPLE_RATE

            q = parse_qs(parsed.query)
            try:
                try:
                    chunk_seconds = float(q.get("chunk_seconds", ["2.0"])[0])
                    lookahead = int(q.get("lookahead", ["0"])[0])
                    beam = int(q.get("beam", ["0"])[0])
                except ValueError as e:
                    raise BadRequest(f"invalid query value: {e}") from e
                timestamps = q.get("timestamps", ["0"])[0] in ("1", "true")
                st = service.open_stream(chunk_seconds, lookahead, beam)
            except BadRequest as e:
                self._send(400, {"error": str(e)})
                return
            except ServiceBusy as e:
                self._send(503, {"error": str(e)})
                return
            except Exception:
                logger.exception("stream setup failed")
                self._send(500, {"error": "internal failure"})
                return

            def line(payload: dict):
                self.wfile.write((json.dumps(payload) + "\n").encode())
                self.wfile.flush()

            dec = PcmDecoder(SAMPLE_RATE)
            samples = 0
            t0 = time.perf_counter()
            try:
                # everything past acquire lives under this try: a client
                # that vanishes mid-headers must not leak the pooled
                # session (finally releases it)
                self.send_response(200)
                self.send_header("Content-Type", "application/x-ndjson")
                self.send_header("Cache-Control", "no-store")
                self.send_header("Connection", "close")
                self.end_headers()
                self.close_connection = True
                def emit(inc: str, flush: bool = False):
                    payload = {"text": inc} if inc else {}
                    if timestamps:
                        # words finalized since the last emission (a word is
                        # final once a later word has started; flush
                        # releases the trailing one)
                        words = st.take_new_words(flush=flush)
                        if words:
                            payload["words"] = words
                    if payload:
                        line(payload)

                for block in self._iter_body():
                    pcm = dec.feed(block)
                    if pcm.size:
                        samples += pcm.size
                        emit(service.stream_feed(st, pcm))
                emit(service.stream_finish(st), flush=True)
                duration = samples / SAMPLE_RATE
                final = {
                    "final": True, "text": st.text, "duration": duration,
                    "rtf": (time.perf_counter() - t0) / max(duration, 1e-9),
                }
                if timestamps:
                    final["words"] = st.words()
                line(final)
            except BadRequest as e:
                # headers are out; the error rides the NDJSON stream
                logger.warning("bad stream request: %s", e)
                line({"error": str(e)})
            except (BrokenPipeError, ConnectionResetError):
                logger.info("stream client disconnected")
            except Exception:
                logger.exception("stream failed")
                try:
                    line({"error": "internal failure"})
                except OSError:
                    pass
            finally:
                service.release_stream(st)

        def do_PUT(self):
            # `curl -T -` uploads with PUT; /stream accepts both verbs
            parsed = urlparse(self.path)
            if parsed.path != "/stream":
                self._send(404, {"error": "unknown endpoint"})
                return
            self._do_stream(parsed)

        def do_POST(self):
            parsed = urlparse(self.path)
            if parsed.path not in ("/transcribe", "/diarize", "/stream"):
                self._send(404, {"error": "unknown endpoint"})
                return
            if parsed.path == "/stream":
                # incremental body handling; never buffers the upload
                self._do_stream(parsed)
                return
            try:
                length = int(self.headers.get("Content-Length", 0))
                if length <= 0:
                    self._send(400, {"error": "empty body"})
                    return
                data = self.rfile.read(length)
                q = parse_qs(parsed.query)
                if parsed.path == "/diarize":
                    try:
                        num_speakers = q.get("num_speakers", [None])[0]
                        num_speakers = (int(num_speakers)
                                        if num_speakers is not None else None)
                    except ValueError as e:
                        raise BadRequest(f"invalid query value: {e}") from e
                    transcripts = (
                        q.get("transcripts", ["0"])[0] in ("1", "true")
                    )
                    self._send(200, service.diarize_bytes(
                        data, num_speakers=num_speakers,
                        transcripts=transcripts,
                    ))
                    return
                timestamps = q.get("timestamps", ["0"])[0] in ("1", "true")
                try:
                    beam = int(q.get("beam", ["0"])[0])
                    hotword_weight = float(q.get("hotword_weight", ["2.0"])[0])
                except ValueError as e:
                    raise BadRequest(f"invalid query value: {e}") from e
                hotwords = q.get("hotwords", [""])[0]
                identify_language = (
                    q.get("identify_language", ["0"])[0] in ("1", "true")
                )
                result = service.transcribe_bytes(
                    data, timestamps, beam,
                    hotwords=hotwords, hotword_weight=hotword_weight,
                    identify_language=identify_language,
                )
                self._send(200, result)
            except BadRequest as e:
                logger.warning("bad request: %s", e)
                self._send(400, {"error": str(e)})
            except Exception:  # request isolation: server-side fault
                logger.exception("request failed")
                self._send(500, {"error": "internal failure"})

        def log_message(self, fmt, *args):
            logger.info("%s - %s", self.address_string(), fmt % args)

    return Handler


def main():
    parser = argparse.ArgumentParser(description="Serve VELOCITY-ASR TPU over HTTP")
    parser.add_argument("--checkpoint", required=True)
    parser.add_argument("--host", default="127.0.0.1")
    parser.add_argument("--port", type=int, default=8570)
    parser.add_argument("--beam-width", type=int, default=0)
    parser.add_argument("--max-batch", type=int, default=8,
                        help="micro-batch size cap for concurrent requests")
    parser.add_argument("--batch-window-ms", type=float, default=10.0,
                        help="how long to wait to coalesce concurrent requests")
    parser.add_argument("--speaker-model",
                        help="speaker-embedding artifact dir (e.g. "
                             "checkpoints/speaker_v2p/final_speaker); "
                             "enables POST /diarize")
    parser.add_argument("--max-streams", type=int, default=8,
                        help="concurrent POST /stream sessions (503 beyond "
                             "this). Default-cadence sessions (any "
                             "?lookahead / ?beam) are micro-batched through "
                             "one compiled step per shape and share ONE "
                             "budget of this many slots across all shapes; "
                             "each extra slot costs only a small state row. "
                             "Non-default cadences run per-session from a "
                             "separate pool of the same size and serialize "
                             "on the device — treat max-streams as a hard "
                             "capacity for those")
    parser.add_argument("--lm", default=None,
                        help="char n-gram LM artifact (scripts/train_lm.py) "
                             "for shallow fusion on ?beam requests")
    parser.add_argument("--lm-weight", type=float, default=0.5)
    args = parser.parse_args()

    service = ASRService(args.checkpoint, beam_width=args.beam_width,
                         max_batch=args.max_batch,
                         batch_window_ms=args.batch_window_ms,
                         speaker_model=args.speaker_model,
                         max_streams=args.max_streams,
                         lm_path=args.lm, lm_weight=args.lm_weight)
    server = ThreadingHTTPServer((args.host, args.port), make_handler(service))
    logger.info("Serving on http://%s:%d (POST /transcribe, POST /stream%s, "
                "GET /health)", args.host, args.port,
                ", POST /diarize" if service.diarizer else "")
    server.serve_forever()


if __name__ == "__main__":
    main()
