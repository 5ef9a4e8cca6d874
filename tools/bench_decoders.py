#!/usr/bin/env python3
"""Throughput of the native C++ audio decoders vs the system reference
decoders (libmpg123 / libvorbisfile) on identical fixtures.

The training input pipeline decodes audio on host threads
(data.py prefetch loader); these numbers bound how many audio-seconds
per second one core's decode stage can feed. Prints one line per format:
realtime multiple = decoded audio seconds per wall second.

Usage: python tools/bench_decoders.py [seconds_per_fixture]
"""

import sys
import time

sys.path.insert(0, ".")

import numpy as np  # noqa: E402

from velocity_asr_tpu import io as va_io  # noqa: E402


def tone(n, rate, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(n) / rate
    x = (0.3 * np.sin(2 * np.pi * 440 * t)
         + 0.2 * np.sin(2 * np.pi * 1873 * t)
         + 0.05 * rng.standard_normal(n))
    return np.clip(x, -0.95, 0.95).astype(np.float32)


def bench(label, path, audio_s, fn, reps=5):
    fn(path)  # warm (page cache, lazy init)
    t0 = time.perf_counter()
    for _ in range(reps):
        fn(path)
    dt = (time.perf_counter() - t0) / reps
    print(f"{label:28s} {audio_s / dt:9.0f}x realtime  ({dt * 1e3:7.2f} ms "
          f"for {audio_s:.0f}s audio)")
    return audio_s / dt


def main():
    secs = float(sys.argv[1]) if len(sys.argv) > 1 else 30.0
    rate = 16000
    n = int(secs * rate)
    x = tone(n, rate)

    import tempfile

    d = tempfile.mkdtemp()

    # WAV
    import wave

    wav_path = f"{d}/f.wav"
    with wave.open(wav_path, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes((x * 32767).astype(np.int16).tobytes())
    bench("wav  (native C++)", wav_path, secs, va_io.decode_audio_file)

    # FLAC
    from tests.flac_encoder import encode_flac

    flac_path = f"{d}/f.flac"
    open(flac_path, "wb").write(encode_flac(x, rate))
    bench("flac (native C++)", flac_path, secs, va_io.decode_audio_file)

    # MP3
    from tests.mp3_codec import lame_available, lame_encode, mpg123_available

    if lame_available():
        mp3_path = f"{d}/f.mp3"
        open(mp3_path, "wb").write(lame_encode(x, rate))
        ours = bench("mp3  (native C++)", mp3_path, secs,
                     va_io.decode_audio_file)
        if mpg123_available():
            from tests.mp3_codec import mpg123_decode

            ref = bench("mp3  (libmpg123 golden)", mp3_path, secs,
                        mpg123_decode)
            print(f"{'':28s} native/golden ratio: {ours / ref:.2f}")

    # Ogg Vorbis
    from tests.vorbis_codec import encoder_available, vorbisfile_available

    if encoder_available():
        from tests.vorbis_codec import vorbis_encode

        ogg_path = f"{d}/f.ogg"
        open(ogg_path, "wb").write(vorbis_encode(x, rate, quality=0.4))
        ours = bench("ogg  (native C++)", ogg_path, secs,
                     va_io.decode_audio_file)
        if vorbisfile_available():
            from tests.vorbis_codec import vorbisfile_decode

            def golden(p):
                vorbisfile_decode(open(p, "rb").read())

            ref = bench("ogg  (libvorbisfile golden)", ogg_path, secs, golden)
            print(f"{'':28s} native/golden ratio: {ours / ref:.2f}")

    # m4a/AAC (system-codec shim over libavformat/libavcodec)
    if va_io.m4a_available():
        m4a_path = f"{d}/f.m4a"
        va_io.encode_m4a(m4a_path, x, rate)
        bench("m4a  (libav* shim)", m4a_path, secs, va_io.decode_audio_file)


if __name__ == "__main__":
    main()
