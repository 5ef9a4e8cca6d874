"""Test-only ctypes bindings for the system libvorbisenc encoder and
libvorbisfile decoder. Used by tests/test_vorbis.py to generate Ogg
Vorbis fixtures and golden PCM: our native decoder
(native/vorbis_decoder.cc) must match libvorbisfile bit-closely on
libvorbisenc-encoded audio. Neither library is part of the product —
the product decoder is the from-scratch C++ implementation.

The caller-allocated libvorbis/libogg structs (vorbis_info,
vorbis_dsp_state, ogg_stream_state, ...) are treated as opaque,
generously over-allocated byte buffers; only ogg_packet / ogg_page /
the head of vorbis_info are declared field-by-field because the tests
read them. Those layouts are part of the libraries' frozen public ABI.
"""

import ctypes
from ctypes import (
    CFUNCTYPE,
    POINTER,
    byref,
    c_char,
    c_float,
    c_int,
    c_int64,
    c_long,
    c_size_t,
    c_ubyte,
    c_void_p,
)

import numpy as np

_LIBDIR = "/usr/lib/x86_64-linux-gnu/"


def _load(name):
    for p in (_LIBDIR + name, name):
        try:
            return ctypes.CDLL(p)
        except OSError:
            continue
    return None


_OGG = _load("libogg.so.0")
_VORBIS = _load("libvorbis.so.0")
_VENC = _load("libvorbisenc.so.2")
_VFILE = _load("libvorbisfile.so.3")


class OggPacket(ctypes.Structure):
    _fields_ = [
        ("packet", POINTER(c_ubyte)),
        ("bytes", c_long),
        ("b_o_s", c_long),
        ("e_o_s", c_long),
        ("granulepos", c_int64),
        ("packetno", c_int64),
    ]


class OggPage(ctypes.Structure):
    _fields_ = [
        ("header", POINTER(c_ubyte)),
        ("header_len", c_long),
        ("body", POINTER(c_ubyte)),
        ("body_len", c_long),
    ]


class VorbisInfoHead(ctypes.Structure):
    # First fields of vorbis_info (frozen ABI); the rest is opaque.
    _fields_ = [
        ("version", c_int),
        ("channels", c_int),
        ("rate", c_long),
    ]


# Opaque caller-allocated structs, over-allocated for safety.
_SZ_INFO = 512
_SZ_COMMENT = 512
_SZ_DSP = 2048
_SZ_BLOCK = 2048
_SZ_STREAM = 4096
_SZ_OVFILE = 8192

if _VORBIS is not None and _VENC is not None and _OGG is not None:
    _VENC.vorbis_encode_init_vbr.argtypes = [c_void_p, c_long, c_long, c_float]
    _VORBIS.vorbis_analysis_buffer.restype = POINTER(POINTER(c_float))
    _VORBIS.vorbis_analysis_buffer.argtypes = [c_void_p, c_int]


def encoder_available():
    return _VORBIS is not None and _VENC is not None and _OGG is not None


def vorbisfile_available():
    return _VFILE is not None


def vorbis_encode(x, rate, quality=0.4, serial=1):
    """Encode float32 PCM ((n,) mono or (n, ch)) to Ogg Vorbis bytes."""
    x = np.asarray(x, dtype=np.float32)
    if x.ndim == 1:
        x = x[:, None]
    n, channels = x.shape

    vi = ctypes.create_string_buffer(_SZ_INFO)
    vc = ctypes.create_string_buffer(_SZ_COMMENT)
    vd = ctypes.create_string_buffer(_SZ_DSP)
    vb = ctypes.create_string_buffer(_SZ_BLOCK)
    os_ = ctypes.create_string_buffer(_SZ_STREAM)

    _VORBIS.vorbis_info_init(vi)
    rc = _VENC.vorbis_encode_init_vbr(vi, channels, rate, quality)
    assert rc == 0, f"vorbis_encode_init_vbr failed: {rc}"
    _VORBIS.vorbis_comment_init(vc)
    assert _VORBIS.vorbis_analysis_init(vd, vi) == 0
    assert _VORBIS.vorbis_block_init(vd, vb) == 0
    assert _OGG.ogg_stream_init(os_, serial) == 0

    out = bytearray()
    page = OggPage()

    def drain(flush):
        fn = _OGG.ogg_stream_flush if flush else _OGG.ogg_stream_pageout
        while fn(os_, byref(page)) != 0:
            out.extend(ctypes.string_at(page.header, page.header_len))
            out.extend(ctypes.string_at(page.body, page.body_len))

    h1, h2, h3 = OggPacket(), OggPacket(), OggPacket()
    assert _VORBIS.vorbis_analysis_headerout(
        vd, vc, byref(h1), byref(h2), byref(h3)) == 0
    for h in (h1, h2, h3):
        _OGG.ogg_stream_packetin(os_, byref(h))
    drain(flush=True)  # headers end on their own page(s)

    pkt = OggPacket()
    chunk = 1024
    pos = 0
    while True:
        todo = min(chunk, n - pos)
        if todo > 0:
            buf = _VORBIS.vorbis_analysis_buffer(vd, todo)
            for c in range(channels):
                ctypes.memmove(
                    buf[c],
                    np.ascontiguousarray(x[pos:pos + todo, c]).ctypes.data,
                    todo * 4,
                )
            _VORBIS.vorbis_analysis_wrote(vd, todo)
            pos += todo
        else:
            _VORBIS.vorbis_analysis_wrote(vd, 0)  # end of stream
        while _VORBIS.vorbis_analysis_blockout(vd, vb) == 1:
            _VORBIS.vorbis_analysis(vb, None)
            _VORBIS.vorbis_bitrate_addblock(vb)
            while _VORBIS.vorbis_bitrate_flushpacket(vd, byref(pkt)) == 1:
                _OGG.ogg_stream_packetin(os_, byref(pkt))
                drain(flush=False)
        if todo <= 0:
            break
    drain(flush=True)

    _OGG.ogg_stream_clear(os_)
    _VORBIS.vorbis_block_clear(vb)
    _VORBIS.vorbis_dsp_clear(vd)
    _VORBIS.vorbis_comment_clear(vc)
    _VORBIS.vorbis_info_clear(vi)
    return bytes(out)


def vorbisfile_decode(data):
    """Golden decode of Ogg Vorbis bytes via libvorbisfile (ov_fopen on a
    temp file — simpler and less ABI-fragile than memory callbacks).

    Returns (pcm float32 (n, ch), rate).
    """
    import os
    import tempfile

    fd, path = tempfile.mkstemp(suffix=".ogg")
    try:
        with os.fdopen(fd, "wb") as f:
            f.write(bytes(data))
        return _vorbisfile_decode_path(path)
    finally:
        os.unlink(path)


def _vorbisfile_decode_path(path):
    vf = ctypes.create_string_buffer(_SZ_OVFILE)
    rc = _VFILE.ov_fopen(path.encode(), vf)
    assert rc == 0, f"ov_fopen failed: {rc}"

    _VFILE.ov_info.restype = POINTER(VorbisInfoHead)
    info = _VFILE.ov_info(vf, -1).contents
    channels, rate = info.channels, info.rate

    _VFILE.ov_read_float.argtypes = [
        c_void_p, POINTER(POINTER(POINTER(c_float))), c_int, POINTER(c_int)]
    pcm = POINTER(POINTER(c_float))()
    bitstream = c_int(0)
    chunks = []
    while True:
        got = _VFILE.ov_read_float(vf, byref(pcm), 4096, byref(bitstream))
        if got <= 0:
            break
        frame = np.empty((got, channels), dtype=np.float32)
        for c in range(channels):
            frame[:, c] = np.ctypeslib.as_array(pcm[c], shape=(got,))
        chunks.append(frame)
    _VFILE.ov_clear(vf)
    if not chunks:
        return np.zeros((0, channels), np.float32), rate
    return np.concatenate(chunks, axis=0), rate


__all__ = [
    "encoder_available",
    "vorbisfile_available",
    "vorbis_encode",
    "vorbisfile_decode",
]

# keep pyflakes quiet about the unused c_char import slot
_ = c_char
