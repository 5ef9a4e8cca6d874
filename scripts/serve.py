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
      query: ?timestamps=1 adds word timings, ?beam=N uses beam search,
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

Example:
  python scripts/serve.py --checkpoint ckpts/final_pretrained --port 8570
  curl -s --data-binary @utt.flac localhost:8570/transcribe
  python scripts/serve.py --checkpoint ... \
      --speaker-model checkpoints/speaker_run/final_speaker
  curl -s --data-binary @meeting.wav 'localhost:8570/diarize?transcripts=1'
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
                 speaker_model: str = None):
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
        self.batcher = MicroBatcher(
            self.transcriber, max_batch=max_batch, window_ms=batch_window_ms
        )
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

    def transcribe_bytes(self, data: bytes, timestamps: bool, beam: int,
                         hotwords: str = "", hotword_weight: float = 2.0,
                         identify_language: bool = False):
        if timestamps and beam > 1:
            raise BadRequest("beam search with timestamps is not supported; "
                             "drop one of ?timestamps / ?beam")
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
        def _send(self, code: int, payload: dict):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
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

        def do_POST(self):
            parsed = urlparse(self.path)
            if parsed.path not in ("/transcribe", "/diarize"):
                self._send(404, {"error": "unknown endpoint"})
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
                             "checkpoints/speaker_run/final_speaker); "
                             "enables POST /diarize")
    args = parser.parse_args()

    service = ASRService(args.checkpoint, beam_width=args.beam_width,
                         max_batch=args.max_batch,
                         batch_window_ms=args.batch_window_ms,
                         speaker_model=args.speaker_model)
    server = ThreadingHTTPServer((args.host, args.port), make_handler(service))
    logger.info("Serving on http://%s:%d (POST /transcribe%s, GET /health)",
                args.host, args.port,
                ", POST /diarize" if service.diarizer else "")
    server.serve_forever()


if __name__ == "__main__":
    main()
