"""Minimal FLAC encoder — TEST FIXTURE ONLY.

Produces spec-conformant FLAC streams (16-bit, fixed blocking) so the
native C++ decoder can be validated without any external flac tooling.
Supports constant / verbatim / fixed-order-2 (Rice-coded) subframes,
independent or left/side stereo, correct CRC-8/CRC-16.
"""

from __future__ import annotations

import numpy as np


class BitWriter:
    def __init__(self):
        self.bytes = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, bits: int):
        assert bits >= 0
        if bits == 0:
            return
        value &= (1 << bits) - 1
        self.acc = (self.acc << bits) | value
        self.nbits += bits
        while self.nbits >= 8:
            self.nbits -= 8
            self.bytes.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def write_signed(self, value: int, bits: int):
        self.write(value & ((1 << bits) - 1), bits)

    def write_unary(self, q: int):
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)  # q zeros then a one

    def align(self):
        if self.nbits:
            self.write(0, 8 - self.nbits)

    def getvalue(self) -> bytes:
        assert self.nbits == 0
        return bytes(self.bytes)


def crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def crc16(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 else (crc << 1) & 0xFFFF
    return crc


def utf8_coded(n: int) -> bytes:
    if n < 0x80:
        return bytes([n])
    out = []
    if n < 0x800:
        lead, extra = 0xC0, 1
    elif n < 0x10000:
        lead, extra = 0xE0, 2
    elif n < 0x200000:
        lead, extra = 0xF0, 3
    else:
        raise ValueError("frame number too large for fixture")
    shifts = list(range(6 * extra, -1, -6))
    out.append(lead | (n >> shifts[0]))
    for s in shifts[1:]:
        out.append(0x80 | ((n >> s) & 0x3F))
    return bytes(out)


def _rice_param(res: np.ndarray) -> int:
    mean = float(np.mean(np.abs(res))) if len(res) else 0.0
    k = 0
    while (1 << k) < mean + 1 and k < 14:
        k += 1
    return k


def _write_subframe(bw: BitWriter, samples: np.ndarray, bps: int, mode: str):
    bw.write(0, 1)  # pad
    if mode == "constant":
        bw.write(0, 6)
        bw.write(0, 1)  # no wasted bits
        bw.write_signed(int(samples[0]), bps)
    elif mode == "verbatim":
        bw.write(1, 6)
        bw.write(0, 1)
        for v in samples:
            bw.write_signed(int(v), bps)
    elif mode == "fixed2":
        order = 2
        bw.write(8 + order, 6)
        bw.write(0, 1)
        s = samples.astype(np.int64)
        for v in s[:order]:
            bw.write_signed(int(v), bps)
        res = s[order:] - (2 * s[order - 1 : -1] - s[order - 2 : -2])
        # residual: method 0 (4-bit rice), partition order 0
        bw.write(0, 2)
        bw.write(0, 4)
        k = _rice_param(res)
        bw.write(k, 4)
        for v in res:
            u = (int(v) << 1) ^ (int(v) >> 63)  # zigzag
            bw.write_unary(u >> k)
            bw.write(u & ((1 << k) - 1), k)
    else:
        raise ValueError(mode)


def encode_flac(
    pcm: np.ndarray,
    sample_rate: int = 16000,
    block_size: int = 1024,
    mode: str = "fixed2",
    stereo_mode: str = "independent",
) -> bytes:
    """Encode int16 PCM (samples,) or (samples, channels) to FLAC bytes."""
    if pcm.ndim == 1:
        pcm = pcm[:, None]
    total, channels = pcm.shape
    bps = 16

    out = bytearray(b"fLaC")
    # STREAMINFO (last metadata block)
    si = BitWriter()
    si.write(block_size, 16)
    si.write(block_size, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(sample_rate, 20)
    si.write(channels - 1, 3)
    si.write(bps - 1, 5)
    si.write(total, 36)
    body = si.getvalue() + b"\x00" * 16
    out += bytes([0x80, 0, 0, len(body)]) + body

    frame_no = 0
    for start in range(0, total, block_size):
        block = pcm[start : start + block_size]
        bs = block.shape[0]

        hdr = BitWriter()
        hdr.write(0b11111111111110, 14)
        hdr.write(0, 1)  # reserved
        hdr.write(0, 1)  # fixed blocking
        hdr.write(7, 4)  # blocksize: 16-bit value - 1 follows
        hdr.write(0, 4)  # sample rate: from streaminfo
        if channels == 2 and stereo_mode == "left_side":
            hdr.write(8, 4)
        else:
            hdr.write(channels - 1, 4)
        hdr.write(4, 3)  # 16 bps
        hdr.write(0, 1)  # reserved
        hdr.align()
        hdr_bytes = bytearray(hdr.getvalue())
        hdr_bytes += utf8_coded(frame_no)
        hdr_bytes += bytes([(bs - 1) >> 8, (bs - 1) & 0xFF])
        hdr_bytes.append(crc8(bytes(hdr_bytes)))

        fw = BitWriter()
        for b in hdr_bytes:
            fw.write(b, 8)
        if channels == 2 and stereo_mode == "left_side":
            left = block[:, 0].astype(np.int64)
            side = left - block[:, 1].astype(np.int64)
            _write_subframe(fw, left, bps, mode)
            _write_subframe(fw, side, bps + 1, mode)
        else:
            for c in range(channels):
                sub_mode = mode
                if mode == "constant" and not np.all(block[:, c] == block[0, c]):
                    sub_mode = "verbatim"
                _write_subframe(fw, block[:, c], bps, sub_mode)
        fw.align()
        frame = fw.getvalue()
        out += frame + crc16(frame).to_bytes(2, "big")
        frame_no += 1

    return bytes(out)
