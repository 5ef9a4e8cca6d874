"""Serving-path tests: batched transcription equivalence and the
micro-batcher's coalescing behavior."""

import json
import threading

import numpy as np
import pytest


@pytest.fixture(scope="module")
def pipeline(tmp_path_factory):
    import jax

    from velocity_asr_tpu.decode import CTCDecoder, create_default_vocabulary
    from velocity_asr_tpu.models.config import VelocityASRConfig
    from velocity_asr_tpu.models.model import create_model, init_params, save_pretrained
    from scripts.transcribe import Transcriber

    cfg = VelocityASRConfig(
        d_model=32, ssm_layers=1, ssm_state_dim=8, global_ssm_layers=1,
        global_ssm_state_dim=4, attention_heads=2, attention_dim=8,
        vocab_size=32, dropout=0.0,
    )
    model = create_model(cfg)
    params = init_params(model, jax.random.PRNGKey(0), example_frames=8)
    decoder = CTCDecoder(create_default_vocabulary(32))
    return Transcriber(model, params, decoder)


def test_transcribe_batch_matches_single(pipeline):
    rng = np.random.default_rng(0)
    audios = [
        (rng.standard_normal(16000 + 4000 * i) * 0.1).astype(np.float32)
        for i in range(3)
    ]
    batched = pipeline.transcribe_batch(audios)
    for audio, b in zip(audios, batched):
        single = pipeline.transcribe_array(audio)
        assert b["text"] == single["text"]
        assert abs(b["duration"] - single["duration"]) < 1e-9


def test_micro_batcher_coalesces_and_matches(pipeline):
    from scripts.serve import MicroBatcher

    calls = []
    orig = pipeline.transcribe_batch

    def counting(audios):
        calls.append(len(audios))
        return orig(audios)

    pipeline.transcribe_batch = counting
    try:
        mb = MicroBatcher(pipeline, max_batch=8, window_ms=200.0)
        rng = np.random.default_rng(1)
        audios = [
            (rng.standard_normal(16000) * 0.1).astype(np.float32) for _ in range(6)
        ]
        futures = [mb.submit(a) for a in audios]
        results = [f.result(timeout=120) for f in futures]
    finally:
        pipeline.transcribe_batch = orig

    singles = [pipeline.transcribe_array(a) for a in audios]
    assert [r["text"] for r in results] == [s["text"] for s in singles]
    # 6 near-simultaneous submissions within a 200 ms window must coalesce
    # into far fewer device calls than 6
    assert sum(calls) == 6 and len(calls) <= 3, calls


def test_transcribe_batch_mixed_buckets_matches_single(pipeline):
    """A short clip batched with a much longer one must transcribe
    exactly as it does alone: the global-context pooling is not
    length-masked, so cross-bucket padding would change its output.
    transcribe_batch groups by frame bucket internally."""
    rng = np.random.default_rng(7)
    short = (rng.standard_normal(8000) * 0.1).astype(np.float32)    # bucket 200
    long = (rng.standard_normal(150000) * 0.1).astype(np.float32)   # bucket 1000
    assert pipeline.frame_bucket_of(short) != pipeline.frame_bucket_of(long)
    batched = pipeline.transcribe_batch([short, long, short])
    solo_short = pipeline.transcribe_array(short)
    solo_long = pipeline.transcribe_array(long)
    assert batched[0]["text"] == solo_short["text"]
    assert batched[2]["text"] == solo_short["text"]
    assert batched[1]["text"] == solo_long["text"]


def test_transcribe_array_beam_override(pipeline):
    """Per-call beam_width overrides the instance default without
    mutating shared state (the serving path passes it per request)."""
    rng = np.random.default_rng(8)
    audio = (rng.standard_normal(16000) * 0.1).astype(np.float32)
    assert pipeline.beam_width == 0
    r = pipeline.transcribe_array(audio, beam_width=4)
    assert pipeline.beam_width == 0  # untouched
    assert isinstance(r["text"], str)


def test_serve_error_classification(pipeline):
    """Undecodable bodies and bad flag combos are 400s; internal faults
    are 500s (clients/monitoring key off the status class)."""
    from scripts.serve import ASRService, BadRequest

    svc = ASRService.__new__(ASRService)  # skip checkpoint load
    svc.transcriber = pipeline
    svc.lock = threading.Lock()

    with pytest.raises(BadRequest):
        svc.transcribe_bytes(b"\x00" * 64, timestamps=False, beam=0)
    with pytest.raises(BadRequest):
        svc.transcribe_bytes(b"anything", timestamps=True, beam=4)


def test_serve_hotword_request_validation(pipeline):
    """?hotwords needs a beam, and an all-OOV hotword list is the
    client's fault (400), not a server crash."""
    import threading

    from scripts.serve import ASRService, BadRequest

    svc = ASRService.__new__(ASRService)  # skip checkpoint load
    svc.transcriber = pipeline
    svc.decoder = pipeline.decoder
    svc.lock = threading.Lock()

    with pytest.raises(BadRequest, match="beam"):
        svc.transcribe_bytes(b"x", timestamps=False, beam=0, hotwords="cat")
    with pytest.raises(BadRequest, match="hotwords"):
        svc.transcribe_bytes(b"x", timestamps=False, beam=4, hotwords="ñ,é")


def _wav_bytes(audio: np.ndarray, sr: int = 16000) -> bytes:
    import io
    import wave

    pcm = (np.clip(audio, -1, 1) * 32767).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(pcm.tobytes())
    return buf.getvalue()


def test_serve_diarize_endpoint(pipeline):
    """POST /diarize service logic: clear 400 without a speaker model;
    segments (optionally speaker-attributed) with one."""
    import jax
    import jax.numpy as jnp

    from scripts.serve import ASRService, BadRequest
    from velocity_asr_tpu.diarize import (
        DiarizeConfig,
        Diarizer,
        SpeakerClassifier,
        SpeakerEncoderConfig,
    )
    from velocity_asr_tpu.synth import SyntheticConversationDataset

    svc = ASRService.__new__(ASRService)  # skip checkpoint load
    svc.transcriber = pipeline
    svc.lock = threading.Lock()
    svc.diarizer = None

    item = SyntheticConversationDataset(n_convs=1, seed=11)[0]
    body = _wav_bytes(item["audio"])

    with pytest.raises(BadRequest, match="speaker model"):
        svc.diarize_bytes(body)

    enc_cfg = SpeakerEncoderConfig(
        d_model=16, ssm_layers=1, ssm_state_dim=4, embedding_dim=8,
        n_speakers=4, dropout=0.0,
    )
    params = SpeakerClassifier(config=enc_cfg).init(
        jax.random.PRNGKey(0), jnp.zeros((1, 8, 80), jnp.float32), train=False,
    )["params"]
    svc.diarizer = Diarizer(
        encoder_config=enc_cfg, encoder_params=params["encoder"],
        config=DiarizeConfig(batch_bucket=16),
    )

    res = svc.diarize_bytes(body, num_speakers=item["n_speakers"])
    assert res["segments"], "no segments"
    assert res["duration"] > 0 and res["rtf"] > 0
    assert res["num_speakers"] <= item["n_speakers"]
    for s in res["segments"]:
        assert 0 <= s["start"] < s["end"]
        assert "text" not in s

    res2 = svc.diarize_bytes(body, num_speakers=item["n_speakers"],
                             transcripts=True)
    assert all(isinstance(s.get("text"), str) for s in res2["segments"])

    with pytest.raises(BadRequest):  # undecodable body is the client's fault
        svc.diarize_bytes(b"\x00" * 64)


class TestPcmDecoder:
    def test_raw_pcm_across_odd_boundaries(self):
        from scripts.serve import PcmDecoder

        rng = np.random.default_rng(0)
        pcm = (rng.standard_normal(1000) * 8000).astype("<i2")
        raw = pcm.tobytes()
        dec = PcmDecoder(16000)
        out = []
        prev = 0
        for cut in (3, 10, 257, 258, 1999, len(raw)):
            out.append(dec.feed(raw[prev:cut]))
            prev = cut
        got = np.concatenate(out)
        assert got.shape == (1000,)
        np.testing.assert_allclose(got, pcm.astype(np.float32) / 32768.0)

    def test_wav_header_stripped(self):
        from scripts.serve import PcmDecoder

        rng = np.random.default_rng(1)
        audio = (rng.standard_normal(500) * 0.1).astype(np.float32)
        body = _wav_bytes(audio)
        dec = PcmDecoder(16000)
        # drip the header in tiny pieces: nothing decodes until 'data'
        got = [dec.feed(body[i:i + 7]) for i in range(0, len(body), 7)]
        got = np.concatenate(got)
        assert got.shape == (500,)
        np.testing.assert_allclose(
            got, np.clip(audio, -1, 1), atol=2 / 32768.0)

    def test_wav_wrong_format_rejected(self):
        from scripts.serve import BadRequest, PcmDecoder

        body = _wav_bytes(np.zeros(100, np.float32), sr=8000)
        dec = PcmDecoder(16000)
        with pytest.raises(BadRequest, match="rate=8000"):
            dec.feed(body)


class TestStreamPool:
    @staticmethod
    def _pool(pipeline, max_streams=1):
        from scripts.serve import StreamPool

        return StreamPool(pipeline, max_streams=max_streams)

    def test_reuse_and_busy(self, pipeline):
        from scripts.serve import ServiceBusy

        pool = self._pool(pipeline, max_streams=1)
        st = pool.acquire(16, 0, timeout=0.1)
        with pytest.raises(ServiceBusy):
            pool.acquire(16, 0, timeout=0.1)
        pool.release(st)
        st2 = pool.acquire(16, 0, timeout=0.1)
        assert st2 is st  # reset + reuse, no recompile
        pool.release(st2)

    def test_eviction_makes_room_for_new_shape(self, pipeline):
        pool = self._pool(pipeline, max_streams=1)
        st = pool.acquire(16, 0, timeout=0.1)
        pool.release(st)
        st2 = pool.acquire(32, 0, timeout=0.1)  # evicts the idle (16, 0)
        assert st2.chunk_frames == 32
        pool.release(st2)


def test_serve_stream_http_end_to_end(pipeline):
    """POST /stream over a real socket with a chunked upload: NDJSON
    increments arrive, and the final text matches a direct
    StreamingTranscriber run with the same chunking."""
    import http.client
    import socket

    from http.server import ThreadingHTTPServer

    from scripts.serve import ASRService, StreamPool, make_handler
    from velocity_asr_tpu.streaming import StreamingTranscriber

    svc = ASRService.__new__(ASRService)  # skip checkpoint load
    svc.transcriber = pipeline
    svc.model = pipeline.model
    svc.lock = threading.Lock()
    svc.diarizer = None
    svc.stream_pool = StreamPool(pipeline, max_streams=1)

    rng = np.random.default_rng(3)
    audio = (rng.standard_normal(16000 * 3) * 0.1).astype(np.float32)
    pcm = (np.clip(audio, -1, 1) * 32767).astype("<i2").tobytes()

    ref = StreamingTranscriber(
        pipeline.model, pipeline.params, pipeline.decoder, chunk_frames=100,
    )
    # one-shot feed of the int16-quantized audio: streaming output is
    # arrival-invariant (chunk-quantized causal normalization), so the
    # HTTP path's network fragmentation must not change the text
    ref.feed(np.frombuffer(pcm, "<i2").astype(np.float32) / 32768.0)
    expected = ref.text + ref.finish()

    server = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(svc))
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        def blocks():
            for i in range(0, len(pcm), 4096):
                yield pcm[i:i + 4096]

        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=300)
        conn.request("POST", "/stream?chunk_seconds=1.0", body=blocks(),
                     headers={"Transfer-Encoding": "chunked"},
                     encode_chunked=True)
        resp = conn.getresponse()
        assert resp.status == 200
        assert resp.getheader("Content-Type") == "application/x-ndjson"
        lines = [json.loads(l) for l in resp.read().decode().splitlines()]
        conn.close()

        final = lines[-1]
        assert final.get("final") is True
        assert abs(final["duration"] - 3.0) < 1e-6
        assert final["text"] == expected
        # increments concatenate to the final text
        assert "".join(l["text"] for l in lines[:-1]) == expected

        # bad query -> 400 before any streaming
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=60)
        conn.request("POST", "/stream?chunk_seconds=999", body=b"")
        assert conn.getresponse().status == 400
        conn.close()
    finally:
        server.shutdown()
        server.server_close()


def test_serve_stream_malformed_chunked_encoding(pipeline):
    """Malformed chunked bodies surface as an in-stream error line, the
    session returns to the pool, and the next request still works."""
    import http.client
    import socket

    from http.server import ThreadingHTTPServer

    from scripts.serve import ASRService, StreamPool, make_handler

    svc = ASRService.__new__(ASRService)
    svc.transcriber = pipeline
    svc.model = pipeline.model
    svc.lock = threading.Lock()
    svc.diarizer = None
    svc.stream_pool = StreamPool(pipeline, max_streams=1)
    svc.stream_batchers = {}
    svc._stream_batcher_slots = 2
    svc._batched_live = 0
    svc._batcher_lock = threading.Lock()

    server = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(svc))
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        # hand-rolled socket: garbage where the chunk size should be
        s = socket.create_connection(("127.0.0.1", port), timeout=60)
        s.sendall(b"POST /stream HTTP/1.1\r\nHost: x\r\n"
                  b"Transfer-Encoding: chunked\r\n\r\nZZZ\r\nnope\r\n")
        buf = b""
        while b'"error"' not in buf:
            got = s.recv(4096)
            if not got:
                break
            buf += got
        s.close()
        assert b"malformed chunk size" in buf, buf

        # pool recovered: a normal request succeeds afterwards
        rng = np.random.default_rng(4)
        pcm = (rng.standard_normal(16000) * 3000).astype("<i2").tobytes()
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=120)
        conn.request("POST", "/stream?chunk_seconds=1.0", body=pcm)
        resp = conn.getresponse()
        assert resp.status == 200
        lines = [json.loads(l) for l in resp.read().decode().splitlines()]
        assert lines[-1].get("final") is True
        conn.close()
    finally:
        server.shutdown()
        server.server_close()


def test_serve_stream_timestamps(pipeline):
    """?timestamps=1 rides word timings on the NDJSON increments; the
    final line's words equal a direct streaming run's words()."""
    import http.client

    from http.server import ThreadingHTTPServer

    from scripts.serve import ASRService, StreamPool, make_handler
    from velocity_asr_tpu.streaming import StreamingTranscriber

    svc = ASRService.__new__(ASRService)
    svc.transcriber = pipeline
    svc.model = pipeline.model
    svc.lock = threading.Lock()
    svc.diarizer = None
    svc.stream_pool = StreamPool(pipeline, max_streams=1)

    rng = np.random.default_rng(6)
    audio = (rng.standard_normal(16000 * 2) * 0.1).astype(np.float32)
    pcm = (np.clip(audio, -1, 1) * 32767).astype("<i2").tobytes()

    ref = StreamingTranscriber(
        pipeline.model, pipeline.params, pipeline.decoder, chunk_frames=100,
    )
    ref.feed(np.frombuffer(pcm, "<i2").astype(np.float32) / 32768.0)
    ref.finish()
    expected_words = ref.words()

    server = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(svc))
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        conn = http.client.HTTPConnection(
            "127.0.0.1", port, timeout=300)
        conn.request("POST", "/stream?chunk_seconds=1.0&timestamps=1",
                     body=pcm)
        resp = conn.getresponse()
        assert resp.status == 200
        lines = [json.loads(l) for l in resp.read().decode().splitlines()]
        conn.close()
        final = lines[-1]
        assert final.get("final") is True
        assert final["words"] == expected_words
        # increments carry only finalized words; they concatenate to the
        # full list
        inc = [w for l in lines[:-1] for w in l.get("words", [])]
        assert inc == expected_words
    finally:
        server.shutdown()
        server.server_close()


def test_serve_stream_concurrent_batched_sessions(pipeline):
    """Two default-cadence /stream requests run concurrently through the
    shared micro-batched step (StreamSessionBatcher) and each returns the
    text a dedicated StreamingTranscriber produces."""
    import http.client

    from http.server import ThreadingHTTPServer

    from scripts.serve import ASRService, StreamPool, make_handler
    from velocity_asr_tpu.streaming import StreamingTranscriber

    svc = ASRService.__new__(ASRService)
    svc.transcriber = pipeline
    svc.model = pipeline.model
    svc.lock = threading.Lock()
    svc.diarizer = None
    svc.stream_pool = StreamPool(pipeline, max_streams=1)
    svc.stream_batchers = {}
    svc._stream_batcher_slots = 4
    svc._batched_live = 0
    svc._batcher_lock = threading.Lock()

    rng = np.random.default_rng(29)
    pcms = [
        (np.clip((rng.standard_normal(n) * 0.1), -1, 1) * 32767)
        .astype("<i2").tobytes()
        for n in (3 * 16000, 2 * 16000 + 5000)
    ]

    ref = StreamingTranscriber(
        pipeline.model, pipeline.params, pipeline.decoder, chunk_frames=200,
    )
    expected = []
    for pcm in pcms:
        ref.reset()
        ref.feed(np.frombuffer(pcm, "<i2").astype(np.float32) / 32768.0)
        expected.append(ref.text + ref.finish())

    server = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(svc))
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    results = [None, None]
    errs = []

    def client(i):
        try:
            conn = http.client.HTTPConnection("127.0.0.1", port, timeout=300)
            conn.request("POST", "/stream", body=pcms[i])  # default cadence
            resp = conn.getresponse()
            assert resp.status == 200
            lines = [json.loads(l) for l in resp.read().decode().splitlines()]
            conn.close()
            results[i] = lines[-1]
        except Exception as e:  # pragma: no cover
            errs.append(e)

    try:
        threads = [threading.Thread(target=client, args=(i,)) for i in (0, 1)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert not errs, errs
        # the default cadence really used the batcher (pool holds 1 slot;
        # two concurrent sessions would otherwise have 503'd)
        assert (0, 0) in svc.stream_batchers
        for i in (0, 1):
            assert results[i]["final"] is True
            assert results[i]["text"] == expected[i]
        # all batcher slots returned, and the shared budget drained
        assert len(svc.stream_batchers[(0, 0)]._free) == 4
        assert svc._batched_live == 0
    finally:
        server.shutdown()
        server.server_close()


def test_serve_stream_beam_batched_and_shared_budget(pipeline):
    """Default-cadence ?beam=N sessions run through a shared
    StreamSessionBatcher (VERDICT r4 item 4: they used to serialize via
    pooled per-session transcribers), and ALL batched shapes draw from
    one --max-streams budget (advisor r4: per-shape batchers must not
    multiply the cap)."""
    from scripts.serve import ASRService, ServiceBusy, StreamPool
    from velocity_asr_tpu.streaming import StreamingTranscriber

    svc = ASRService.__new__(ASRService)
    svc.transcriber = pipeline
    svc.model = pipeline.model
    svc.lock = threading.Lock()
    svc.diarizer = None
    svc.lm = None
    svc.lm_weight = 0.5
    svc.stream_pool = StreamPool(pipeline, max_streams=1)
    svc.stream_batchers = {}
    svc._stream_batcher_slots = 1
    svc._batched_live = 0
    svc._batcher_lock = threading.Lock()

    # a greedy batched session holds the single shared slot...
    st = svc.open_stream(2.0, 0, 0)
    assert not st._pooled
    # ...so a ?beam session (a DIFFERENT batcher shape) is refused: the
    # budget is global, not per shape
    with pytest.raises(ServiceBusy):
        svc.open_stream(2.0, 0, 4)
    svc.release_stream(st)
    assert svc._batched_live == 0

    # now the beam session gets the slot, runs through a batcher (not the
    # pool), and matches a dedicated beam transcriber
    stb = svc.open_stream(2.0, 0, 4)
    assert not stb._pooled
    assert (0, 4) in svc.stream_batchers
    assert svc.stream_batchers[(0, 4)].beam_width == 4

    rng = np.random.default_rng(53)
    audio = (rng.standard_normal(16000 * 2) * 0.1).astype(np.float32)
    ref = StreamingTranscriber(
        pipeline.model, pipeline.params, pipeline.decoder,
        chunk_frames=stb.chunk_frames, beam_width=4,
    )
    ref.feed(audio)
    expected = ref.text + ref.finish()

    stb.feed(audio)
    stb.finish()
    assert stb.text == expected
    svc.release_stream(stb)
    assert svc._batched_live == 0


def test_transcribe_array_beam_timestamps(pipeline):
    """--timestamps composes with --beam-width (VERDICT r4 item 7): the
    beam picks the text, CTC Viterbi alignment pins the word timings. On
    agreeing transcripts the timings equal the greedy frame path exactly
    (the argmax path IS the Viterbi path for its own collapse)."""
    rng = np.random.default_rng(71)
    audio = (rng.standard_normal(16000) * 0.1).astype(np.float32)
    g = pipeline.transcribe_array(audio, timestamps=True)
    b = pipeline.transcribe_array(audio, timestamps=True, beam_width=4)
    assert b["text"] == g["text"]
    assert len(b["words"]) == len(g["words"]) > 0
    for gw, bw in zip(g["words"], b["words"]):
        assert (bw["word"], bw["start"], bw["end"]) == \
            (gw["word"], gw["start"], gw["end"])
        assert bw["confidence"] == pytest.approx(gw["confidence"], abs=1e-4)


def test_serve_stream_beam_timestamps(pipeline):
    """/stream?beam=N&timestamps=1 (previously refused): word timings
    ride the NDJSON increments through the BATCHED beam path and the
    final line's words equal a dedicated beam transcriber's words()."""
    import http.client

    from http.server import ThreadingHTTPServer

    from scripts.serve import ASRService, StreamPool, make_handler
    from velocity_asr_tpu.streaming import StreamingTranscriber

    svc = ASRService.__new__(ASRService)
    svc.transcriber = pipeline
    svc.model = pipeline.model
    svc.lock = threading.Lock()
    svc.diarizer = None
    svc.lm = None
    svc.lm_weight = 0.5
    svc.stream_pool = StreamPool(pipeline, max_streams=1)
    svc.stream_batchers = {}
    svc._stream_batcher_slots = 2
    svc._batched_live = 0
    svc._batcher_lock = threading.Lock()

    rng = np.random.default_rng(83)
    audio = (rng.standard_normal(16000 * 2) * 0.1).astype(np.float32)
    pcm = (np.clip(audio, -1, 1) * 32767).astype("<i2").tobytes()

    ref = StreamingTranscriber(
        pipeline.model, pipeline.params, pipeline.decoder, chunk_frames=200,
        beam_width=4,
    )
    ref.feed(np.frombuffer(pcm, "<i2").astype(np.float32) / 32768.0)
    ref.finish()
    expected_words = ref.words()

    server = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(svc))
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=300)
        conn.request("POST", "/stream?beam=4&timestamps=1", body=pcm)
        resp = conn.getresponse()
        assert resp.status == 200
        lines = [json.loads(l) for l in resp.read().decode().splitlines()]
        conn.close()
        final = lines[-1]
        assert final.get("final") is True
        assert final["text"] == ref.text
        assert len(final["words"]) == len(expected_words) > 0
        for g, w in zip(final["words"], expected_words):
            assert (g["word"], g["start"], g["end"]) == \
                (w["word"], w["start"], w["end"])
        assert (0, 4) in svc.stream_batchers  # rode the batched beam path
    finally:
        server.shutdown()
        server.server_close()
