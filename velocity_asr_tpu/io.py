"""Host-side audio file decoding.

The reference relies on torchaudio's C++ decoders (reference
velocity_asr/audio.py:39-56). Here decoding is provided by a small native
C++ library (``native/audio_decoder``) exposing WAV, FLAC, MPEG Layer III
and Ogg Vorbis decode through ctypes (all from-scratch decoders), an
optional system-codec shim for m4a/AAC (``native/m4a_decoder`` over
libavformat/libavcodec — torchaudio's own backend), and a pure-Python WAV
fallback so the package works before the native library is built.
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional, Tuple

import numpy as np

_NATIVE_LIB: Optional[ctypes.CDLL] = None
_NATIVE_CHECKED = False
_NATIVE_LOCK = __import__("threading").Lock()

_M4A_LIB: Optional[ctypes.CDLL] = None
_M4A_CHECKED = False


def _find_native_lib(
    name: str = "libvelocity_audio.so", env_var: str = "VELOCITY_ASR_NATIVE_LIB"
) -> Optional[str]:
    here = os.path.dirname(os.path.abspath(__file__))
    candidates = [
        os.path.join(here, "_native", name),
        os.path.join(here, "..", "native", "build", name),
    ]
    env = os.environ.get(env_var)
    if env:
        candidates.insert(0, env)
    for c in candidates:
        if os.path.exists(c):
            return c
    return None


def _load_native() -> Optional[ctypes.CDLL]:
    global _NATIVE_LIB, _NATIVE_CHECKED
    if _NATIVE_CHECKED:
        return _NATIVE_LIB
    with _NATIVE_LOCK:
        return _load_native_locked()


def _load_native_locked() -> Optional[ctypes.CDLL]:
    # Data-loader threads race to the first load; _NATIVE_CHECKED must only
    # flip after _NATIVE_LIB is fully initialized (hence the lock + ordering).
    global _NATIVE_LIB, _NATIVE_CHECKED
    if _NATIVE_CHECKED:
        return _NATIVE_LIB
    path = _find_native_lib()
    if path is None:
        _NATIVE_CHECKED = True
        return None
    try:
        lib = ctypes.CDLL(path)
        # int va_decode_file(const char* path, float** out_samples,
        #                    int64_t* out_frames, int32_t* out_channels,
        #                    int32_t* out_sample_rate)
        lib.va_decode_file.restype = ctypes.c_int
        lib.va_decode_file.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
        ]
        lib.va_free.restype = None
        lib.va_free.argtypes = [ctypes.POINTER(ctypes.c_float)]
        _NATIVE_LIB = lib
    except OSError:
        _NATIVE_LIB = None
    _NATIVE_CHECKED = True
    return _NATIVE_LIB


def native_available() -> bool:
    """Whether the native C++ audio decoder is loaded."""
    return _load_native() is not None


def _load_m4a() -> Optional[ctypes.CDLL]:
    """Load the system-codec m4a shim (libvelocity_m4a.so), once.

    The shim wraps the system libavformat/libavcodec stack — the same
    backend the reference's torchaudio m4a path uses (reference
    velocity_asr/audio.py:39-56) — and is built only where those dev
    libraries exist (native/Makefile gates on the headers).
    """
    global _M4A_LIB, _M4A_CHECKED
    if _M4A_CHECKED:
        return _M4A_LIB
    with _NATIVE_LOCK:
        if _M4A_CHECKED:
            return _M4A_LIB
        path = _find_native_lib("libvelocity_m4a.so", "VELOCITY_ASR_M4A_LIB")
        lib = None
        if path is not None:
            try:
                lib = ctypes.CDLL(path)
                lib.va_m4a_decode_file.restype = ctypes.c_int
                lib.va_m4a_decode_file.argtypes = [
                    ctypes.c_char_p,
                    ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
                    ctypes.POINTER(ctypes.c_int64),
                    ctypes.POINTER(ctypes.c_int32),
                    ctypes.POINTER(ctypes.c_int32),
                ]
                lib.va_m4a_free.restype = None
                lib.va_m4a_free.argtypes = [ctypes.POINTER(ctypes.c_float)]
                lib.va_m4a_encode_file.restype = ctypes.c_int
                lib.va_m4a_encode_file.argtypes = [
                    ctypes.c_char_p,
                    ctypes.POINTER(ctypes.c_float),
                    ctypes.c_int64,
                    ctypes.c_int32,
                ]
            except OSError:
                # Shim present but its libav* dependencies are not
                # loadable on this host: treat as unavailable.
                lib = None
        _M4A_LIB = lib
        _M4A_CHECKED = True
        return _M4A_LIB


def m4a_available() -> bool:
    """Whether the system-codec m4a/AAC decoder shim is loaded."""
    return _load_m4a() is not None


def _decode_m4a(path: str) -> Tuple[np.ndarray, int]:
    lib = _load_m4a()
    assert lib is not None
    out_ptr = ctypes.POINTER(ctypes.c_float)()
    out_frames = ctypes.c_int64(0)
    out_channels = ctypes.c_int32(0)
    out_rate = ctypes.c_int32(0)
    rc = lib.va_m4a_decode_file(
        path.encode("utf-8"),
        ctypes.byref(out_ptr),
        ctypes.byref(out_frames),
        ctypes.byref(out_channels),
        ctypes.byref(out_rate),
    )
    if rc != 0:
        raise ValueError(f"m4a decoder failed on {path!r} (code {rc})")
    n = out_frames.value * out_channels.value
    try:
        buf = np.ctypeslib.as_array(out_ptr, shape=(n,)).copy()
    finally:
        lib.va_m4a_free(out_ptr)
    data = buf.reshape(out_frames.value, out_channels.value).T
    return np.ascontiguousarray(data, dtype=np.float32), out_rate.value


def encode_m4a(path: str, samples: np.ndarray, sample_rate: int) -> None:
    """Encode mono float32 PCM to AAC-LC in an mp4 container.

    Test-fixture generator (and a convenience so producing m4a does not
    require the ffmpeg CLI). Raises if the system-codec shim is absent.
    """
    lib = _load_m4a()
    if lib is None:
        raise RuntimeError(
            "m4a support requires the system libavformat/libavcodec stack "
            "(build with `make -C native` where the ffmpeg dev headers exist)"
        )
    pcm = np.ascontiguousarray(samples, dtype=np.float32).reshape(-1)
    rc = lib.va_m4a_encode_file(
        path.encode("utf-8"),
        pcm.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        len(pcm),
        int(sample_rate),
    )
    if rc != 0:
        raise ValueError(f"m4a encoder failed on {path!r} (code {rc})")


def _decode_native(path: str) -> Tuple[np.ndarray, int]:
    lib = _load_native()
    assert lib is not None
    out_ptr = ctypes.POINTER(ctypes.c_float)()
    out_frames = ctypes.c_int64(0)
    out_channels = ctypes.c_int32(0)
    out_rate = ctypes.c_int32(0)
    rc = lib.va_decode_file(
        path.encode("utf-8"),
        ctypes.byref(out_ptr),
        ctypes.byref(out_frames),
        ctypes.byref(out_channels),
        ctypes.byref(out_rate),
    )
    if rc != 0:
        raise ValueError(f"native decoder failed on {path!r} (code {rc})")
    n = out_frames.value * out_channels.value
    try:
        buf = np.ctypeslib.as_array(out_ptr, shape=(n,)).copy()
    finally:
        lib.va_free(out_ptr)
    # Native layout is interleaved (frames, channels); return (channels, frames).
    data = buf.reshape(out_frames.value, out_channels.value).T
    return np.ascontiguousarray(data, dtype=np.float32), out_rate.value


def _decode_wav_python(path: str) -> Tuple[np.ndarray, int]:
    """Pure-Python RIFF/WAVE decode.

    Handles PCM 8/16/24/32-bit, IEEE float32/float64, and
    WAVE_FORMAT_EXTENSIBLE wrappers of both — the same format set as the
    native decoder (native/audio_decoder.cc), so results do not silently
    differ between environments with and without the native build.
    (The stdlib ``wave`` module rejects float and extensible WAVs.)
    """
    with open(path, "rb") as f:
        riff = f.read(12)
        if len(riff) < 12 or riff[:4] != b"RIFF" or riff[8:12] != b"WAVE":
            raise ValueError(f"not a RIFF/WAVE file: {path!r}")
        fmt = raw = None
        while fmt is None or raw is None:
            hdr = f.read(8)
            if len(hdr) < 8:
                break
            cid = hdr[:4]
            size = int.from_bytes(hdr[4:8], "little")
            payload = f.read(size)
            if cid == b"fmt ":
                fmt = payload
            elif cid == b"data":
                raw = payload
            if size % 2:  # RIFF chunks are word-aligned
                f.seek(1, 1)
    if fmt is None or len(fmt) < 16 or raw is None:
        raise ValueError(f"WAV missing fmt/data chunk: {path!r}")

    tag = int.from_bytes(fmt[0:2], "little")
    channels = int.from_bytes(fmt[2:4], "little")
    rate = int.from_bytes(fmt[4:8], "little")
    bits = int.from_bytes(fmt[14:16], "little")
    if tag == 0xFFFE and len(fmt) >= 26:
        # WAVE_FORMAT_EXTENSIBLE: the real format is the first two bytes
        # of the SubFormat GUID.
        tag = int.from_bytes(fmt[24:26], "little")
    if channels <= 0 or rate <= 0:
        raise ValueError(f"invalid WAV header (channels={channels}, rate={rate})")

    def trim(buf: bytes, itemsize: int) -> bytes:
        return buf[: (len(buf) // itemsize) * itemsize]

    if tag == 3:  # IEEE float
        if bits == 32:
            data = np.frombuffer(trim(raw, 4), dtype="<f4").astype(np.float32)
        elif bits == 64:
            data = np.frombuffer(trim(raw, 8), dtype="<f8").astype(np.float32)
        else:
            raise ValueError(f"unsupported float WAV bit depth: {bits}")
    elif tag == 1:  # integer PCM
        if bits == 16:
            data = np.frombuffer(trim(raw, 2), dtype="<i2").astype(np.float32) / 32768.0
        elif bits == 32:
            data = (
                np.frombuffer(trim(raw, 4), dtype="<i4").astype(np.float32)
                / 2147483648.0
            )
        elif bits == 8:
            data = (
                np.frombuffer(raw, dtype=np.uint8).astype(np.float32) - 128.0
            ) / 128.0
        elif bits == 24:
            b = np.frombuffer(trim(raw, 3), dtype=np.uint8).reshape(-1, 3)
            vals = (
                b[:, 0].astype(np.int32)
                | (b[:, 1].astype(np.int32) << 8)
                | (b[:, 2].astype(np.int32) << 16)
            )
            vals = np.where(vals >= 1 << 23, vals - (1 << 24), vals)
            data = vals.astype(np.float32) / float(1 << 23)
        else:
            raise ValueError(f"unsupported WAV bit depth: {bits}")
    else:
        raise ValueError(f"unsupported WAV format tag: {tag}")

    n = (len(data) // channels) * channels
    data = data[:n].reshape(-1, channels).T
    return np.ascontiguousarray(data, dtype=np.float32), rate


def supported_audio_exts() -> Tuple[str, ...]:
    """Extensions the current build can actually decode.

    The reference decodes mp3/ogg/m4a through torchaudio (audio.py:39-56);
    this build ships its own decoders (WAV + FLAC + MPEG-1/2/2.5 Layer III
    mp3 + Ogg Vorbis, native/mp3_decoder.cc / native/vorbis_decoder.cc),
    decodes m4a through a system-codec shim (native/m4a_decoder.cc — the
    same libav* backend torchaudio uses) where that stack exists, and
    advertises exactly what it supports instead of failing at decode time.
    """
    exts: Tuple[str, ...] = (".wav",)
    if native_available():
        exts = (".wav", ".flac", ".mp3", ".ogg", ".oga")
    if m4a_available():
        exts = exts + (".m4a", ".mp4")
    return exts


def _sniff_format(path: str) -> str:
    """Container format from magic bytes: 'wav'|'flac'|'mp3'|'ogg'|'m4a'|''."""
    try:
        with open(path, "rb") as f:
            head = f.read(12)
    except OSError:
        return ""
    if head[:4] == b"RIFF" and head[8:12] == b"WAVE":
        # RIFF alone is not enough (AVI/WebP are RIFF too).
        return "wav"
    if head[4:8] == b"ftyp":
        # ISO BMFF (mp4/m4a/mov): box size then the 'ftyp' box type.
        return "m4a"
    head = head[:4]
    if head == b"fLaC":
        return "flac"
    if head == b"OggS":
        return "ogg"
    if _looks_like_mp3(head):
        return "mp3"
    return ""


def _looks_like_mp3(head: bytes) -> bool:
    """ID3v2 container or an MPEG-1/2/2.5 Layer III frame sync."""
    if head[:3] == b"ID3":
        return True
    if len(head) < 4 or head[0] != 0xFF or (head[1] & 0xE0) != 0xE0:
        return False
    version_bits = (head[1] >> 3) & 3
    layer_bits = (head[1] >> 1) & 3
    bitrate_index = head[2] >> 4
    sr_index = (head[2] >> 2) & 3
    return (
        version_bits != 1
        and layer_bits == 1
        and bitrate_index not in (0, 15)
        and sr_index != 3
    )


def decode_audio_file(path: str) -> Tuple[np.ndarray, int]:
    """Decode an audio file to ((channels, samples) float32, sample_rate).

    Dispatch is by content sniffing (magic bytes) with extension as the
    tiebreak for headerless/ambiguous files — the serve daemon receives
    raw request bodies without a meaningful filename. Fails fast with a
    clear message on formats no decoder handles (m4a, when the system
    libav* stack is absent — the reference gets it via torchaudio).
    """
    lower = path.lower()
    exts = supported_audio_exts()
    sniffed = _sniff_format(path)
    if not lower.endswith(exts):
        known = {
            "wav": True,
            "flac": native_available(),
            "mp3": native_available(),
            "ogg": native_available(),
            "m4a": m4a_available(),
        }
        if not known.get(sniffed, False):
            raise RuntimeError(
                f"Cannot decode {path!r}: unsupported format. Supported: "
                f"{', '.join(exts)}. (m4a requires the system "
                "libavformat/libavcodec stack; convert with e.g. "
                "`ffmpeg -i in.m4a -ar 16000 out.wav`.)"
            )
    if sniffed == "m4a" or (not sniffed and lower.endswith((".m4a", ".mp4"))):
        if not m4a_available():
            raise RuntimeError(
                f"Cannot decode {path!r}: m4a requires the system "
                "libavformat/libavcodec stack (absent here). Convert with "
                "e.g. `ffmpeg -i in.m4a -ar 16000 out.wav`."
            )
        return _decode_m4a(path)
    if native_available():
        return _decode_native(path)
    # The Python fallback parses WAV only: verify the content really is a
    # WAV before handing it to the RIFF parser, so a misnamed FLAC/mp3
    # fails with the conversion hint, not an opaque parser error.
    if _sniff_format(path) != "wav":
        raise RuntimeError(
            f"Cannot decode {path!r}: only WAV is supported until the "
            "native decoder is built (`make -C native` adds flac/mp3/ogg). "
            "Convert with e.g. `ffmpeg -i in.xxx -ar 16000 out.wav`."
        )
    return _decode_wav_python(path)
