"""Robustness fuzz for the native C++ audio decoders.

A serving daemon decodes untrusted request bodies (scripts/serve.py), so
a malformed file must produce a clean Python error — never a segfault,
hang, or runaway allocation. Each trial mutates a valid FLAC/WAV/MP3/Ogg
fixture (or truncates it) and decodes it in a SUBPROCESS so that a
crash in the shared library fails the test instead of killing pytest.

The reference delegates decode to torchaudio/ffmpeg and inherits their
hardening; these from-scratch decoders need their own evidence. A longer
offline run of the same harness (2400 Ogg trials, 8 seeds) is recorded
in BENCH_DETAILS_r03.md.
"""

import subprocess
import sys
import textwrap

import numpy as np
import pytest

from velocity_asr_tpu import io as va_io

needs_native = pytest.mark.skipif(
    not va_io.native_available(), reason="native decoder not built"
)

_WORKER = textwrap.dedent(
    """
    import random
    import struct
    import sys

    sys.path.insert(0, {repo!r})
    from velocity_asr_tpu import io as va_io

    CRC_TABLE = []
    for i in range(256):
        r = i << 24
        for _ in range(8):
            r = ((r << 1) ^ 0x04C11DB7 if r & 0x80000000 else r << 1)
            r &= 0xFFFFFFFF
        CRC_TABLE.append(r)

    def fix_ogg_crcs(buf):
        # Recompute page CRCs so mutations reach the Vorbis parser
        # instead of dying at the Ogg integrity check.
        p = 0
        while p + 27 <= len(buf):
            if buf[p:p + 4] != b"OggS":
                p += 1
                continue
            nsegs = buf[p + 26]
            if p + 27 + nsegs > len(buf):
                break
            body = sum(buf[p + 27 + i] for i in range(nsegs))
            end = p + 27 + nsegs + body
            if end > len(buf):
                break
            buf[p + 22:p + 26] = b"\\x00" * 4
            crc = 0
            for byte in buf[p:end]:
                crc = ((crc << 8) & 0xFFFFFFFF) ^ CRC_TABLE[
                    ((crc >> 24) ^ byte) & 0xFF]
            buf[p + 22:p + 26] = struct.pack("<I", crc)
            p = end

    path, seed, trials = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    random.seed(seed)
    data = bytearray(open(path, "rb").read())
    is_ogg = data[:4] == b"OggS"
    for trial in range(trials):
        buf = bytearray(data)
        for _ in range(random.randint(1, 40)):
            buf[random.randrange(len(buf))] = random.randrange(256)
        if random.random() < 0.3:
            buf = buf[: random.randrange(8, len(buf))]
        # Half the ogg trials get valid CRCs: exercises the codebook /
        # floor / residue / mapping parsers, not just the CRC gate.
        if is_ogg and trial % 2 == 0:
            fix_ogg_crcs(buf)
        open(path + ".fuzz", "wb").write(bytes(buf))
        try:
            va_io.decode_audio_file(path + ".fuzz")
        except (ValueError, RuntimeError):
            pass  # clean rejection is the expected outcome
    print("fuzz-ok")
    """
)


def _make_wav(path, rate=16000, n=8000):
    import wave

    t = np.arange(n) / rate
    pcm = (0.5 * np.sin(2 * np.pi * 440 * t) * 32767).astype(np.int16)
    with wave.open(str(path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(pcm.tobytes())


def _run_fuzz(tmp_path, fixture_path, trials=60, seed=0):
    script = tmp_path / "worker.py"
    script.write_text(_WORKER.format(repo="/root/repo"))
    r = subprocess.run(
        [sys.executable, str(script), str(fixture_path), str(seed), str(trials)],
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert r.returncode == 0, (
        f"decoder crashed under fuzz (rc={r.returncode}):\n{r.stderr[-500:]}"
    )
    assert "fuzz-ok" in r.stdout


@needs_native
def test_fuzz_wav(tmp_path):
    p = tmp_path / "f.wav"
    _make_wav(p)
    _run_fuzz(tmp_path, p)


@needs_native
def test_fuzz_flac(tmp_path):
    from tests.flac_encoder import encode_flac

    t = np.arange(16000) / 16000
    x = (0.4 * np.sin(2 * np.pi * 330 * t)).astype(np.float32)
    p = tmp_path / "f.flac"
    p.write_bytes(encode_flac(x, 16000))
    _run_fuzz(tmp_path, p)


@needs_native
def test_fuzz_mp3(tmp_path):
    from tests.mp3_codec import lame_available, lame_encode

    if not lame_available():
        pytest.skip("no libmp3lame to build the fixture")
    t = np.arange(16000) / 16000
    x = (0.4 * np.sin(2 * np.pi * 330 * t)).astype(np.float32)
    p = tmp_path / "f.mp3"
    p.write_bytes(lame_encode(x, 16000))
    _run_fuzz(tmp_path, p)


@needs_native
def test_fuzz_ogg(tmp_path):
    from tests.vorbis_codec import encoder_available, vorbis_encode

    if not encoder_available():
        pytest.skip("no libvorbisenc to build the fixture")
    t = np.arange(16000) / 16000
    x = (0.4 * np.sin(2 * np.pi * 330 * t)).astype(np.float32)
    p = tmp_path / "f.ogg"
    p.write_bytes(vorbis_encode(x, 16000, quality=0.4))
    _run_fuzz(tmp_path, p)
