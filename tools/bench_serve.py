"""Serve-daemon load test (dev tool).

Starts scripts/serve.py as a subprocess against a checkpoint, fires
concurrent /transcribe requests with synthetic WAVs, reports QPS and
latency percentiles.

Usage: python tools/bench_serve.py --checkpoint <dir> [--clients 8]
       [--requests 64] [--seconds 30] [--no-batching]
       --stream: bench POST /stream instead — N concurrent live sessions
       uploading chunked PCM as fast as the server accepts it; reports
       per-stream throughput RTF (wall/audio; a live mic only needs <= 1),
       time-to-first-text, and aggregate audio throughput.
"""
import argparse
import io
import os
import subprocess
import sys
import threading
import time
import urllib.request
import wave

import numpy as np

sys.path.insert(0, "/root/repo")


def make_wav_bytes(seconds: float, seed: int) -> bytes:
    rng = np.random.default_rng(seed)
    sig = (rng.standard_normal(int(seconds * 16000)) * 0.1).astype(np.float32)
    pcm = (sig * 32767).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes(pcm.tobytes())
    return buf.getvalue()


def bench_stream(args):
    """N concurrent /stream sessions, firehose upload, NDJSON drain."""
    import http.client
    import json

    pcm = make_wav_bytes(args.seconds, 0)[44:]  # strip the WAV header

    results = []
    lock = threading.Lock()

    def one_stream(cid, record=True):
        def blocks():
            for i in range(0, len(pcm), 32768):
                yield pcm[i:i + 32768]

        conn = http.client.HTTPConnection("127.0.0.1", args.port, timeout=600)
        t0 = time.perf_counter()
        conn.request(
            "POST",
            f"/stream?chunk_seconds={args.chunk_seconds}"
            f"&lookahead={args.lookahead}&beam={args.beam}",
            body=blocks(), headers={"Transfer-Encoding": "chunked"},
            encode_chunked=True,
        )
        resp = conn.getresponse()
        assert resp.status == 200, resp.status
        first_text = None
        final = None
        while True:
            line = resp.readline()
            if not line:
                break
            rec = json.loads(line)
            if first_text is None and rec.get("text"):
                first_text = time.perf_counter() - t0
            if rec.get("final"):
                final = rec
        wall = time.perf_counter() - t0
        conn.close()
        assert final is not None, "no final line"
        if record:
            with lock:
                results.append((wall, first_text, final))

    one_stream(0, record=False)  # compile warm-up
    threads = [threading.Thread(target=one_stream, args=(c,))
               for c in range(args.clients)]
    t0 = time.perf_counter()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall_all = time.perf_counter() - t0
    walls = np.asarray([r[0] for r in results])
    ttft = np.asarray([r[1] for r in results if r[1] is not None])
    audio_s = args.seconds * len(results)
    print(f"streams={args.clients} utterance={args.seconds:.0f}s "
          f"chunk={args.chunk_seconds:.1f}s lookahead={args.lookahead} "
          f"beam={args.beam} (firehose upload)")
    print(f"per-stream throughput RTF p50={np.median(walls) / args.seconds:.3f} "
          f"max={walls.max() / args.seconds:.3f} (live mic needs <= 1)")
    if ttft.size:
        print(f"time-to-first-text p50={np.median(ttft) * 1e3:.0f} ms")
    print(f"aggregate audio throughput={audio_s / wall_all:.1f} audio-s/s")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--port", type=int, default=8571)
    ap.add_argument("--clients", type=int, default=8)
    ap.add_argument("--requests", type=int, default=64)
    ap.add_argument("--seconds", type=float, default=30.0, help="utterance length")
    ap.add_argument("--no-batching", action="store_true",
                    help="run the server with --max-batch 1 (round-1 behavior)")
    ap.add_argument("--stream", action="store_true",
                    help="bench POST /stream (concurrent live sessions)")
    ap.add_argument("--chunk-seconds", type=float, default=2.0)
    ap.add_argument("--lookahead", type=int, default=0,
                    help="--stream only: ?lookahead=N per session "
                         "(measures the batched lookahead serving path)")
    ap.add_argument("--beam", type=int, default=0,
                    help="--stream only: ?beam=N per session (measures the "
                         "batched beam serving path — VERDICT r4 item 4's "
                         "aggregate-throughput row)")
    args = ap.parse_args()

    cmd = [sys.executable, "/root/repo/scripts/serve.py",
           "--checkpoint", args.checkpoint, "--port", str(args.port),
           "--max-streams", str(max(args.clients, 2))]
    if args.no_batching:
        cmd += ["--max-batch", "1"]
    proc = subprocess.Popen(cmd, stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
    try:
        base = f"http://127.0.0.1:{args.port}"
        for _ in range(600):
            try:
                urllib.request.urlopen(base + "/health", timeout=1)
                break
            except Exception:
                time.sleep(1)
        else:
            raise RuntimeError("server never became healthy")

        wav = make_wav_bytes(args.seconds, 0)

        if args.stream:
            bench_stream(args)
            return

        # Warm the compile cache BEFORE timing: sequential requests warm
        # batch-1, then rounds of concurrent requests warm the power-of-two
        # micro-batch shapes (2/4/8) the timed run will hit.
        def fire():
            urllib.request.urlopen(
                urllib.request.Request(base + "/transcribe", data=wav), timeout=600
            ).read()

        for k in range(2):
            fire()
        for k in range(3):
            ws = [threading.Thread(target=fire) for _ in range(args.clients)]
            for t in ws:
                t.start()
            for t in ws:
                t.join()

        latencies = []
        lock = threading.Lock()
        per_client = args.requests // args.clients

        def client(cid):
            for i in range(per_client):
                t0 = time.perf_counter()
                urllib.request.urlopen(
                    urllib.request.Request(base + "/transcribe", data=wav), timeout=600
                ).read()
                dt = time.perf_counter() - t0
                with lock:
                    latencies.append(dt)

        threads = [threading.Thread(target=client, args=(c,)) for c in range(args.clients)]
        t0 = time.perf_counter()
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        wall = time.perf_counter() - t0
        lat = np.sort(np.asarray(latencies))
        n = len(lat)
        print(f"clients={args.clients} requests={n} utterance={args.seconds:.0f}s "
              f"batching={'off' if args.no_batching else 'on'}")
        print(f"QPS={n / wall:.2f}  p50={lat[n // 2] * 1e3:.0f} ms  "
              f"p95={lat[int(n * 0.95)] * 1e3:.0f} ms  "
              f"audio-throughput={n * args.seconds / wall:.1f} s/s")
    finally:
        proc.terminate()
        proc.wait(timeout=10)


if __name__ == "__main__":
    main()
