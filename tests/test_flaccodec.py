"""FLAC codec (ops/flaccodec.py): lossless round-trips through the
real encoder, plus decoder paths the subset encoder never emits
(LPC, RICE2, escape partitions, wasted bits, stereo decorrelation) —
constructed bit-exact with the module's own primitives."""

import math
import random
import struct

import pytest

from connectors_spark.ops.flaccodec import (_BitWriter, _FIXED_COEFS,
                                            _utf8_number, _zigzag,
                                            crc8, crc16, decode_flac,
                                            encode_flac)


def test_round_trip_matrix():
    rng = random.Random(3)
    cases = [([0] * 500, 1), ([100] * 300, 1),
             ([i % 1000 - 500 for i in range(1000)], 1),
             ([int(10000 * math.sin(i / 7)) for i in range(777)], 1),
             ([rng.randrange(-32768, 32768) for _ in range(513)], 1),
             ([1], 1),
             ([i % 256 - 128 for i in range(600)], 2),
             ([rng.randrange(-32768, 32768) for _ in range(512)], 2)]
    for s, ch in cases:
        data = encode_flac(s, 8000, ch, block_size=256)
        rate, c, got = decode_flac(data)
        assert (rate, c) == (8000, ch)
        assert got == s


def test_crc_verification_catches_corruption():
    s = [i * 13 % 2000 - 1000 for i in range(400)]
    data = bytearray(encode_flac(s, 8000, 1))
    data[-3] ^= 0x40                      # flip a bit in the last frame
    with pytest.raises(ValueError, match="CRC"):
        decode_flac(bytes(data))


def _stream(frame_payload: bytes, n_samples: int, channels: int) -> bytes:
    """Wrap one hand-built frame in a minimal fLaC container."""
    si = _BitWriter()
    si.write(4096, 16)
    si.write(4096, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(8000, 20)
    si.write(channels - 1, 3)
    si.write(15, 5)                      # 16-bit
    si.write(n_samples, 36)
    body = si.bytes() + b"\x00" * 16
    return (b"fLaC" + bytes([0x80]) + len(body).to_bytes(3, "big")
            + body + frame_payload)


def _frame_header(bs: int, ch_asgn: int) -> bytearray:
    hw = _BitWriter()
    hw.write(0b11111111111110, 14)
    hw.write(0, 2)
    hw.write(0b0111, 4)                  # 16-bit blocksize at end
    hw.write(0, 4)                       # rate from STREAMINFO
    hw.write(ch_asgn, 4)
    hw.write(0b100, 3)                   # 16 bps
    hw.write(0, 1)
    hdr = bytearray(hw.bytes()) + _utf8_number(0) \
        + struct.pack(">H", bs - 1)
    hdr.append(crc8(bytes(hdr)))
    return hdr


def _finish(fw: _BitWriter, hdr: bytearray) -> bytes:
    fw.align()
    frame = hdr + fw.bytes()
    frame += struct.pack(">H", crc16(bytes(frame)))
    return bytes(frame)


def test_decoder_lpc_rice2_and_escape_partitions():
    """Hand-built frame: an LPC subframe whose residuals ride a RICE2
    (5-bit-parameter) coding with partition order 1 — second partition
    escaped to raw 6-bit — must reconstruct exactly."""
    bs, order, shift = 16, 2, 2
    coefs = [3, -1]                       # pred = (3*a - b) >> 2
    warm = [100, 120]
    res = [1, -2, 0, 3, -1, 2, 0, -3,     # partition 1 (bs/2 - order)
           5, -5, 4, -4, 3, -3, 2, -2][:bs - order]
    samples = list(warm)
    for r in res:
        pred = (coefs[0] * samples[-1] + coefs[1] * samples[-2]) >> shift
        samples.append(r + pred)

    hdr = _frame_header(bs, 0)
    fw = _BitWriter()
    fw.write(0, 1)
    fw.write(32 + (order - 1), 6)         # LPC, order 2
    fw.write(0, 1)                        # no wasted bits
    for s in warm:
        fw.write(s & 0xFFFF, 16)
    fw.write(4 - 1, 4)                    # precision 4
    fw.write(shift, 5)
    for c in coefs:
        fw.write(c & 0xF, 4)
    fw.write(0b01, 2)                     # RICE2
    fw.write(1, 4)                        # partition order 1
    # partition 1: rice2 k=2 over first bs/2 - order residuals
    fw.write(2, 5)
    for r in res[:bs // 2 - order]:
        u = _zigzag(r)
        fw.write_unary(u >> 2)
        fw.write(u, 2)
    # partition 2: escape, raw 6-bit
    fw.write(31, 5)
    fw.write(6, 5)
    for r in res[bs // 2 - order:]:
        fw.write(r & 0x3F, 6)
    data = _stream(_finish(fw, hdr), bs, 1)
    rate, ch, got = decode_flac(data)
    assert got == samples


def test_decoder_stereo_decorrelation_modes():
    """left/side (8), right/side (9) and mid/side (10) frames rebuilt
    from VERBATIM subframes must reproduce the L/R signal exactly —
    incl. the odd-sum mid/side case (side carries the lost LSB)."""
    left = [10, -7, 300, -32768, 32767, 0, 255, -256]
    right = [3, -7, 299, -32768, 32766, 1, -255, 256]
    bs = len(left)
    side = [l - r for l, r in zip(left, right)]

    def verbatim(fw, vals, bits):
        fw.write(0, 1)
        fw.write(1, 6)
        fw.write(0, 1)
        for v in vals:
            fw.write(v & ((1 << bits) - 1), bits)

    # left/side: sub0 = left (16), sub1 = side (17)
    hdr = _frame_header(bs, 8)
    fw = _BitWriter()
    verbatim(fw, left, 16)
    verbatim(fw, side, 17)
    rate, ch, got = decode_flac(_stream(_finish(fw, hdr), bs, 2))
    assert got[0::2] == left and got[1::2] == right
    # right/side: sub0 = side (17), sub1 = right (16)
    hdr = _frame_header(bs, 9)
    fw = _BitWriter()
    verbatim(fw, side, 17)
    verbatim(fw, right, 16)
    rate, ch, got = decode_flac(_stream(_finish(fw, hdr), bs, 2))
    assert got[0::2] == left and got[1::2] == right
    # mid/side: mid = (l + r) >> 1 (floor), side = l - r
    hdr = _frame_header(bs, 10)
    fw = _BitWriter()
    verbatim(fw, [(l + r) >> 1 for l, r in zip(left, right)], 16)
    verbatim(fw, side, 17)
    rate, ch, got = decode_flac(_stream(_finish(fw, hdr), bs, 2))
    assert got[0::2] == left and got[1::2] == right


def test_decoder_wasted_bits():
    """A subframe with 3 wasted bits: samples encoded >> 3 and shifted
    back by the decoder."""
    vals = [8, -16, 64, 0, 24, -8, 16, 32]
    bs = len(vals)
    hdr = _frame_header(bs, 0)
    fw = _BitWriter()
    fw.write(0, 1)
    fw.write(1, 6)                        # VERBATIM
    fw.write(1, 1)                        # wasted bits follow
    fw.write_unary(2)                     # unary(2) + 1 = 3 wasted
    for v in vals:
        fw.write((v >> 3) & 0x1FFF, 13)   # eff bps = 16 - 3
    rate, ch, got = decode_flac(_stream(_finish(fw, hdr), bs, 1))
    assert got == vals


def test_fixed_coefficient_table_matches_definition():
    # the order-o fixed predictor is the o-th difference operator, so
    # its residual over a degree-(o-1) polynomial is identically 0
    from connectors_spark.ops.flaccodec import _fixed_residual
    assert _fixed_residual([7] * 10, 1) == [0] * 9
    assert _fixed_residual([3 * i + 7 for i in range(10)], 2) == [0] * 8
    assert _fixed_residual([i * i for i in range(10)], 3) == [0] * 7
    assert _fixed_residual([i ** 3 - i for i in range(10)], 4) == [0] * 6
