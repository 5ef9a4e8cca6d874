"""Test-only ctypes bindings for the system LAME encoder and mpg123
decoder. Used by tests/test_mp3.py to generate MP3 fixtures and golden
PCM: our native decoder (native/mp3_decoder.cc) must match libmpg123
bit-closely on LAME-encoded audio. Neither library is part of the
product — the product decoder is the from-scratch C++ implementation."""

import ctypes
import os

import numpy as np

_LAME_PATHS = [
    "/usr/lib/x86_64-linux-gnu/libmp3lame.so.0",
    "libmp3lame.so.0",
]
_MPG_PATHS = [
    "/usr/lib/x86_64-linux-gnu/libmpg123.so.0",
    "libmpg123.so.0",
]


def _load(paths):
    for p in paths:
        try:
            return ctypes.CDLL(p)
        except OSError:
            continue
    return None


_LAME = _load(_LAME_PATHS)
_MPG = _load(_MPG_PATHS)

if _LAME is not None:
    _LAME.lame_init.restype = ctypes.c_void_p
    _LAME.lame_encode_buffer_ieee_float.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int,
        ctypes.c_char_p, ctypes.c_int,
    ]
    for fn in ("lame_set_in_samplerate", "lame_set_num_channels",
               "lame_set_out_samplerate", "lame_set_VBR", "lame_set_brate",
               "lame_set_mode"):
        getattr(_LAME, fn).argtypes = [ctypes.c_void_p, ctypes.c_int]
    _LAME.lame_init_params.argtypes = [ctypes.c_void_p]
    _LAME.lame_encode_flush.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int]
    _LAME.lame_get_lametag_frame.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_size_t]
    _LAME.lame_get_lametag_frame.restype = ctypes.c_size_t
    _LAME.lame_close.argtypes = [ctypes.c_void_p]

if _MPG is not None:
    _MPG.mpg123_new.restype = ctypes.c_void_p


def lame_available():
    return _LAME is not None


def mpg123_available():
    return _MPG is not None


def lame_encode(x, rate, channels=1, brate=128, vbr=False):
    """Encode float32 PCM ((n,) mono or (n, 2) stereo) to MP3 bytes."""
    g = _LAME.lame_init()
    _LAME.lame_set_in_samplerate(g, rate)
    _LAME.lame_set_num_channels(g, channels)
    _LAME.lame_set_out_samplerate(g, rate)
    if vbr:
        _LAME.lame_set_VBR(g, 4)  # vbr_default
    else:
        _LAME.lame_set_brate(g, brate)
    _LAME.lame_set_mode(g, 3 if channels == 1 else 1)  # mono / joint
    assert _LAME.lame_init_params(g) >= 0
    n = len(x)
    buf = ctypes.create_string_buffer(int(1.25 * n + 7200) + 7200)
    if channels == 1:
        left = np.ascontiguousarray(x, dtype=np.float32)
        right = left
    else:
        left = np.ascontiguousarray(x[:, 0], dtype=np.float32)
        right = np.ascontiguousarray(x[:, 1], dtype=np.float32)
    m = _LAME.lame_encode_buffer_ieee_float(
        g, left.ctypes.data_as(ctypes.c_void_p),
        right.ctypes.data_as(ctypes.c_void_p), n, buf, len(buf))
    assert m >= 0, m
    out = buf.raw[:m]
    m2 = _LAME.lame_encode_flush(g, buf, len(buf))
    out += buf.raw[:m2]
    tag = ctypes.create_string_buffer(8192)
    tl = _LAME.lame_get_lametag_frame(g, tag, len(tag))
    if 0 < tl <= len(out):
        out = tag.raw[:tl] + out[tl:]
    _LAME.lame_close(g)
    return out


def mpg123_decode(path):
    """Decode an MP3 file with libmpg123 -> (float32 pcm, rate).

    Stereo comes back as (n, 2)."""
    _MPG.mpg123_init()
    h = ctypes.c_void_p(_MPG.mpg123_new(None, None))
    # MPG123_ADD_FLAGS(2), MPG123_FORCE_FLOAT(0x400): set before open.
    _MPG.mpg123_param(h, 2, 0x400, ctypes.c_double(0))
    assert _MPG.mpg123_open(h, os.fsencode(path)) == 0
    rate = ctypes.c_long()
    ch = ctypes.c_int()
    enc = ctypes.c_int()
    assert _MPG.mpg123_getformat(
        h, ctypes.byref(rate), ctypes.byref(ch), ctypes.byref(enc)) == 0
    assert enc.value == 0x200, hex(enc.value)  # MPG123_ENC_FLOAT_32
    chunks = []
    buf = ctypes.create_string_buffer(65536)
    done = ctypes.c_size_t()
    while True:
        rc = _MPG.mpg123_read(h, buf, len(buf), ctypes.byref(done))
        if done.value:
            chunks.append(bytes(buf.raw[:done.value]))
        if rc != 0 and done.value == 0:
            break
    _MPG.mpg123_close(h)
    _MPG.mpg123_delete(h)
    pcm = np.frombuffer(b"".join(chunks), dtype=np.float32)
    if ch.value > 1:
        pcm = pcm.reshape(-1, ch.value)
    return pcm, rate.value
