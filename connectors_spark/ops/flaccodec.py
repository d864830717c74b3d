"""Stdlib-only FLAC codec (lossless audio; format spec at
xiph.org/flac/format.html, RFC 9639).

Closes the audio-side compressed-codec gap the same way jpegcodec did
for images: FLAC needs nothing beyond bit twiddling (Rice coding,
fixed-polynomial prediction, CRC-8/16), so the `decode_audio` seam can
run a REAL lossless compressed path — and because FLAC is lossless,
decode(encode(s)) == s exactly, which makes closed-form DuckDB oracles
trivial (no state replay like ADPCM).

Scope (documented, raises outside it):
- decode: 16-bit streams, mono/stereo; all four channel assignments
  (independent, left/side, right/side, mid/side); subframe types
  CONSTANT, VERBATIM, FIXED (orders 0-4) and LPC (any order /
  precision / shift); Rice methods RICE (4-bit) and RICE2 (5-bit)
  with any partition order incl. escape-to-raw partitions; wasted
  bits; fixed- and variable-blocksize frame headers; CRC-8 and
  CRC-16 VERIFIED. Non-16-bit depths raise.
- encode: 16-bit mono/stereo (independent channels), fixed-blocksize
  frames, per-block best FIXED order 0-4 by minimum |residual| sum
  (CONSTANT subframes when a block is flat), single-partition Rice
  with per-block parameter fit, STREAMINFO with the real MD5 of the
  PCM stream — a spec-conformant stream any FLAC reader decodes.

Scale note: same as the other codecs — this runs inside Arrow-batched
mapInPandas; swap in libFLAC via the identical seam for a real
100 TB corpus.
"""

from __future__ import annotations

import hashlib
import struct
from typing import List, Tuple

_CRC8_POLY = 0x07
_CRC16_POLY = 0x8005


def _mk_crc8():
    tab = []
    for b in range(256):
        r = b
        for _ in range(8):
            r = ((r << 1) ^ _CRC8_POLY if r & 0x80 else r << 1) & 0xFF
        tab.append(r)
    return tab


def _mk_crc16():
    tab = []
    for b in range(256):
        r = b << 8
        for _ in range(8):
            r = ((r << 1) ^ _CRC16_POLY if r & 0x8000 else r << 1) \
                & 0xFFFF
        tab.append(r)
    return tab


_CRC8 = _mk_crc8()
_CRC16 = _mk_crc16()


def crc8(data: bytes) -> int:
    r = 0
    for b in data:
        r = _CRC8[r ^ b]
    return r


def crc16(data: bytes) -> int:
    r = 0
    for b in data:
        r = (_CRC16[(r >> 8) ^ b] ^ (r << 8)) & 0xFFFF
    return r


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, bits: int) -> None:
        if bits == 0:
            return
        self.acc = (self.acc << bits) | (value & ((1 << bits) - 1))
        self.nbits += bits
        while self.nbits >= 8:
            self.nbits -= 8
            self.buf.append((self.acc >> self.nbits) & 0xFF)

    def write_unary(self, q: int) -> None:
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)  # q zeros then a 1

    def align(self) -> None:
        if self.nbits:
            self.write(0, 8 - self.nbits)

    def bytes(self) -> bytes:
        assert self.nbits == 0
        return bytes(self.buf)


class _BitReader:
    def __init__(self, data: bytes, pos_bytes: int = 0):
        self.data = data
        self.pos = pos_bytes * 8

    def read(self, bits: int) -> int:
        v = 0
        for _ in range(bits):
            byte = self.data[self.pos >> 3]
            v = (v << 1) | ((byte >> (7 - (self.pos & 7))) & 1)
            self.pos += 1
        return v

    def read_unary(self) -> int:
        q = 0
        while self.read(1) == 0:
            q += 1
        return q

    def read_signed(self, bits: int) -> int:
        v = self.read(bits)
        if v >= 1 << (bits - 1):
            v -= 1 << bits
        return v

    def align(self) -> None:
        self.pos = (self.pos + 7) & ~7

    def byte_pos(self) -> int:
        return self.pos >> 3


def _utf8_number(n: int) -> bytes:
    """FLAC's UTF-8-style coding for frame/sample numbers (§9.1.5)."""
    if n < 0x80:
        return bytes([n])
    out = []
    bits = n.bit_length()
    nbytes = 2
    while bits > 6 * (nbytes - 1) + (7 - nbytes):
        nbytes += 1
    lead = (0xFF << (8 - nbytes)) & 0xFF
    out.append(lead | (n >> (6 * (nbytes - 1))))
    for i in range(nbytes - 2, -1, -1):
        out.append(0x80 | ((n >> (6 * i)) & 0x3F))
    return bytes(out)


def _read_utf8_number(br: _BitReader) -> int:
    b0 = br.read(8)
    if b0 < 0x80:
        return b0
    nbytes = 0
    mask = 0x80
    while b0 & mask:
        nbytes += 1
        mask >>= 1
    n = b0 & (mask - 1)
    for _ in range(nbytes - 1):
        n = (n << 6) | (br.read(8) & 0x3F)
    return n


def _zigzag(r: int) -> int:
    return (r << 1) if r >= 0 else (-(r << 1) - 1)


def _unzigzag(u: int) -> int:
    return (u >> 1) if (u & 1) == 0 else -((u >> 1) + 1)


_FIXED_COEFS = {0: [], 1: [1], 2: [2, -1], 3: [3, -3, 1],
                4: [4, -6, 4, -1]}


def _fixed_residual(samples: List[int], order: int) -> List[int]:
    c = _FIXED_COEFS[order]
    return [samples[i] - sum(c[j] * samples[i - 1 - j]
                             for j in range(order))
            for i in range(order, len(samples))]


# ---------------------------------------------------------------- encode

def encode_flac(samples: List[int], sample_rate: int = 8000,
                channels: int = 1, block_size: int = 256) -> bytes:
    """16-bit FLAC stream; ``samples`` are interleaved when stereo."""
    if channels not in (1, 2):
        raise ValueError("1 or 2 channels")
    if len(samples) % channels:
        raise ValueError("sample count not divisible by channels")
    n_frames_total = len(samples) // channels
    chans = [samples[c::channels] for c in range(channels)]

    out = bytearray(b"fLaC")
    md5 = hashlib.md5(
        b"".join(struct.pack("<h", s) for s in samples)).digest()
    si = _BitWriter()
    si.write(block_size, 16)       # min block size
    si.write(block_size, 16)       # max block size
    si.write(0, 24)                # min frame size (unknown)
    si.write(0, 24)                # max frame size (unknown)
    si.write(sample_rate, 20)
    si.write(channels - 1, 3)
    si.write(16 - 1, 5)
    si.write(n_frames_total, 36)
    body = si.bytes() + md5
    out += bytes([0x80]) + len(body).to_bytes(3, "big") + body

    for fi, start in enumerate(range(0, n_frames_total, block_size)):
        bs = min(block_size, n_frames_total - start)
        hw = _BitWriter()
        hw.write(0b11111111111110, 14)
        hw.write(0, 1)                  # reserved
        hw.write(0, 1)                  # fixed-blocksize stream
        hw.write(0b0111, 4)             # blocksize: 16-bit at end
        hw.write(0b0000, 4)             # sample rate: from STREAMINFO
        hw.write(0b0000 if channels == 1 else 0b0001, 4)
        hw.write(0b100, 3)              # 16-bit
        hw.write(0, 1)                  # reserved
        header = bytearray(hw.bytes()) + _utf8_number(fi) \
            + struct.pack(">H", bs - 1)
        header.append(crc8(bytes(header)))
        fw = _BitWriter()
        for b in bytes(header):
            fw.write(b, 8)
        for ch in chans:
            blk = ch[start:start + bs]
            _write_subframe(fw, blk)
        fw.align()
        frame = bytearray(fw.bytes())
        frame += struct.pack(">H", crc16(bytes(frame)))
        out += frame
    return bytes(out)


def _write_subframe(fw: _BitWriter, blk: List[int]) -> None:
    if all(s == blk[0] for s in blk):
        fw.write(0, 1)                   # zero padding bit
        fw.write(0b000000, 6)            # CONSTANT
        fw.write(0, 1)                   # no wasted bits
        fw.write(blk[0] & 0xFFFF, 16)
        return
    best_o, best_res, best_cost = 0, blk[:], None
    for o in range(0, min(5, len(blk))):
        res = _fixed_residual(blk, o)
        cost = sum(abs(r) for r in res)
        if best_cost is None or cost < best_cost:
            best_o, best_res, best_cost = o, res, cost
    o, res = best_o, best_res
    fw.write(0, 1)
    fw.write(0b001000 | o, 6)            # FIXED, order o
    fw.write(0, 1)                       # no wasted bits
    for s in blk[:o]:                    # warmup
        fw.write(s & 0xFFFF, 16)
    # residual: RICE method, partition order 0, one parameter
    mean = (sum(_zigzag(r) for r in res) // max(1, len(res))) or 1
    k = max(0, min(14, mean.bit_length() - 1))
    fw.write(0b00, 2)                    # RICE (4-bit params)
    fw.write(0, 4)                       # partition order 0
    fw.write(k, 4)
    for r in res:
        u = _zigzag(r)
        fw.write_unary(u >> k)
        fw.write(u, k)


# ---------------------------------------------------------------- decode

def decode_flac(data: bytes) -> Tuple[int, int, List[int]]:
    """-> (sample_rate, channels, interleaved 16-bit samples). CRC-8
    and CRC-16 are verified per frame; mismatches raise."""
    if data[:4] != b"fLaC":
        raise ValueError("not a FLAC stream")
    pos = 4
    sample_rate = channels = bps = None
    total = None
    while True:
        hdr = data[pos]
        last = bool(hdr & 0x80)
        btype = hdr & 0x7F
        blen = int.from_bytes(data[pos + 1:pos + 4], "big")
        body = data[pos + 4:pos + 4 + blen]
        if btype == 0:                   # STREAMINFO
            br = _BitReader(body)
            br.read(16)
            br.read(16)
            br.read(24)
            br.read(24)
            sample_rate = br.read(20)
            channels = br.read(3) + 1
            bps = br.read(5) + 1
            total = br.read(36)
        pos += 4 + blen
        if last:
            break
    if sample_rate is None:
        raise ValueError("missing STREAMINFO")
    if bps != 16:
        raise NotImplementedError(f"{bps}-bit FLAC (16-bit only)")

    out: List[List[int]] = [[] for _ in range(channels)]
    n_done = 0
    while n_done < (total or 0) and pos < len(data):
        pos, chans_blk = _decode_frame(data, pos, channels, sample_rate)
        for c in range(channels):
            out[c] += chans_blk[c]
        n_done += len(chans_blk[0])
    inter: List[int] = []
    for i in range(len(out[0])):
        for c in range(channels):
            inter.append(out[c][i])
    if total is not None:
        inter = inter[:total * channels]
    return sample_rate, channels, inter


_BS_CODE = {1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608, 8: 256,
            9: 512, 10: 1024, 11: 2048, 12: 4096, 13: 8192,
            14: 16384, 15: 32768}


def _decode_frame(data: bytes, pos: int, channels: int,
                  stream_rate: int):
    br = _BitReader(data, pos)
    sync = br.read(14)
    if sync != 0b11111111111110:
        raise ValueError("bad frame sync")
    br.read(1)                           # reserved
    br.read(1)                           # blocking strategy
    bs_code = br.read(4)
    sr_code = br.read(4)
    ch_asgn = br.read(4)
    ss_code = br.read(3)
    br.read(1)
    _read_utf8_number(br)
    if bs_code == 6:
        bs = br.read(8) + 1
    elif bs_code == 7:
        bs = br.read(16) + 1
    else:
        bs = _BS_CODE[bs_code]
    if sr_code == 12:
        br.read(8)
    elif sr_code in (13, 14):
        br.read(16)
    hdr_end = br.byte_pos()
    expect = br.read(8)
    if crc8(data[pos:hdr_end]) != expect:
        raise ValueError("frame header CRC-8 mismatch")
    if ss_code not in (0, 0b100):
        raise NotImplementedError("16-bit frames only")

    n_ch = 2 if ch_asgn >= 8 else ch_asgn + 1
    if n_ch != channels:
        raise ValueError("frame/stream channel mismatch")
    subs = []
    for c in range(n_ch):
        extra = 1 if (ch_asgn == 8 and c == 1) \
            or (ch_asgn == 9 and c == 0) \
            or (ch_asgn == 10 and c == 1) else 0
        subs.append(_decode_subframe(br, bs, 16 + extra))
    br.align()
    crc_end = br.byte_pos()
    expect16 = br.read(16)
    if crc16(data[pos:crc_end]) != expect16:
        raise ValueError("frame CRC-16 mismatch")
    if ch_asgn < 8:
        chans = subs
    elif ch_asgn == 8:                  # left/side
        chans = [subs[0], [l - s for l, s in zip(subs[0], subs[1])]]
    elif ch_asgn == 9:                  # right/side: left = side+right
        chans = [[s + r for s, r in zip(subs[0], subs[1])], subs[1]]
    elif ch_asgn == 10:                 # mid/side
        left, right = [], []
        for m, s in zip(subs[0], subs[1]):
            mm = (m << 1) | (s & 1)
            left.append((mm + s) >> 1)
            right.append((mm - s) >> 1)
        chans = [left, right]
    else:
        raise NotImplementedError(f"channel assignment {ch_asgn}")
    return br.byte_pos(), chans


def _decode_subframe(br: _BitReader, bs: int, bps: int) -> List[int]:
    if br.read(1):
        raise ValueError("bad subframe padding bit")
    stype = br.read(6)
    wasted = 0
    if br.read(1):
        wasted = br.read_unary() + 1
    eff = bps - wasted
    if stype == 0:                       # CONSTANT
        v = br.read_signed(eff)
        out = [v] * bs
    elif stype == 1:                     # VERBATIM
        out = [br.read_signed(eff) for _ in range(bs)]
    elif 8 <= stype <= 12:               # FIXED
        order = stype - 8
        warm = [br.read_signed(eff) for _ in range(order)]
        res = _read_residual(br, bs, order)
        out = list(warm)
        c = _FIXED_COEFS[order]
        for r in res:
            out.append(r + sum(c[j] * out[-1 - j]
                               for j in range(order)))
    elif stype >= 32:                    # LPC
        order = stype - 31
        warm = [br.read_signed(eff) for _ in range(order)]
        prec = br.read(4) + 1
        shift = br.read_signed(5)
        coefs = [br.read_signed(prec) for _ in range(order)]
        res = _read_residual(br, bs, order)
        out = list(warm)
        for r in res:
            pred = sum(coefs[j] * out[-1 - j]
                       for j in range(order)) >> shift
            out.append(r + pred)
    else:
        raise NotImplementedError(f"subframe type {stype}")
    if wasted:
        out = [v << wasted for v in out]
    return out


def _read_residual(br: _BitReader, bs: int, order: int) -> List[int]:
    method = br.read(2)
    if method not in (0, 1):
        raise NotImplementedError(f"residual method {method}")
    pbits = 4 if method == 0 else 5
    esc = (1 << pbits) - 1
    porder = br.read(4)
    res: List[int] = []
    nparts = 1 << porder
    for p in range(nparts):
        n = (bs >> porder) - (order if p == 0 else 0)
        k = br.read(pbits)
        if k == esc:                     # raw partition
            raw_bits = br.read(5)
            res += [br.read_signed(raw_bits) if raw_bits else 0
                    for _ in range(n)]
        else:
            for _ in range(n):
                u = (br.read_unary() << k) | br.read(k)
                res.append(_unzigzag(u))
    return res
