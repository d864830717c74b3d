"""Stdlib-only WAV/PCM audio codec (`struct` only).

Companion to ops/imagecodec.py: turns the audio arm of the multimodal
stubs into a REAL decode path for the one audio format parseable
without native codecs — RIFF/WAVE with integer PCM. Compressed formats
(mp3/aac/ogg) remain native-codec-guarded in ops/multimodal.py.

Supports: PCM (format tag 1), 16-bit, mono or interleaved multi-channel,
arbitrary sample rate; chunk-walking parser that skips unknown chunks
(LIST/fact/cue) like a real reader must. Round 8 adds the REAL
compressed-audio arm: ITU-T G.711 companding (A-law format tag 6,
mu-law tag 7, 8 bits/sample) — encode and decode follow the CCITT
reference algorithm (validated exhaustively against CPython's
audioop), and decode(encode(s)) is a closed-form step function, so an
SQL oracle reproduces decoded samples exactly. mp3/aac/ogg remain
native-codec-guarded."""

from __future__ import annotations

import struct
from typing import List, Tuple


def encode_wav(samples: List[int], sample_rate: int = 8000,
               channels: int = 1) -> bytes:
    """Encode interleaved int16 samples as a PCM16 RIFF/WAVE blob."""
    if len(samples) % channels:
        raise ValueError("sample count not divisible by channel count")
    data = struct.pack(f"<{len(samples)}h", *samples)
    byte_rate = sample_rate * channels * 2
    fmt = struct.pack("<HHIIHH", 1, channels, sample_rate, byte_rate,
                      channels * 2, 16)
    body = (b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(data: bytes) -> Tuple[int, int, List[int]]:
    """Decode PCM16 WAV -> (sample_rate, channels, interleaved int16
    samples). Walks chunks, skipping ones it doesn't know (word-aligned
    per the RIFF spec); raises on non-PCM or non-16-bit."""
    if bytes(data[:4]) != b"RIFF" or bytes(data[8:12]) != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    (riff_size,) = struct.unpack("<I", data[4:8])
    pos, end = 12, min(len(data), 8 + riff_size)
    rate = channels = None
    pcm = None
    while pos + 8 <= end:
        tag = bytes(data[pos:pos + 4])
        (ln,) = struct.unpack("<I", data[pos + 4:pos + 8])
        if pos + 8 + ln > len(data):
            raise ValueError(
                f"truncated {tag!r} chunk: declares {ln} bytes, "
                f"{len(data) - pos - 8} remain")
        body = data[pos + 8:pos + 8 + ln]
        if tag == b"fmt ":
            fmt_tag, channels, rate, _br, _ba, bits = struct.unpack(
                "<HHIIHH", body[:16])
            if fmt_tag not in (1, 6, 7):
                raise NotImplementedError(
                    f"WAV format tag {fmt_tag}: only integer PCM and "
                    f"G.711 (A-law/mu-law) have stdlib decoders")
            if fmt_tag == 1 and bits != 16:
                raise NotImplementedError(f"PCM{bits}: only 16-bit")
            if fmt_tag in (6, 7) and bits != 8:
                raise ValueError(f"G.711 must be 8-bit, got {bits}")
        elif tag == b"data":
            pcm = bytes(body)
        pos += 8 + ln + (ln & 1)  # chunks are word-aligned
    if rate is None or pcm is None:
        raise ValueError("missing fmt or data chunk")
    if fmt_tag == 6:
        return rate, channels, [alaw_decode_sample(b) for b in pcm]
    if fmt_tag == 7:
        return rate, channels, [ulaw_decode_sample(b) for b in pcm]
    if len(pcm) % 2:
        raise ValueError("PCM16 data chunk has odd byte length")
    samples = list(struct.unpack(f"<{len(pcm) // 2}h", pcm))
    return rate, channels, samples


# ---------------------------------------------------------------------------
# G.711 companded audio (ITU-T G.711: mu-law format tag 7, A-law tag 6)
# ---------------------------------------------------------------------------
# The real compressed-audio arm: 2:1 logarithmic companding, the
# telephony codec every WAV reader supports. Both directions follow
# the published CCITT reference algorithm (same as CPython's audioop);
# the encode->decode composition is a closed-form step function of the
# input sample, so an SQL oracle can reproduce decoded samples exactly.

_ULAW_BIAS = 0x84
_ULAW_SEGS = (0x3F, 0x7F, 0xFF, 0x1FF, 0x3FF, 0x7FF, 0xFFF, 0x1FFF)


def ulaw_encode_sample(s: int) -> int:
    # CCITT 14-bit formulation (the variant CPython's audioop ships):
    # arithmetic >>2 first, so negative magnitudes floor toward -inf.
    p = s >> 2
    if p < 0:
        p = -p
        mask = 0x7F
    else:
        mask = 0xFF
    if p > 8159:
        p = 8159
    p += _ULAW_BIAS >> 2
    for seg, end in enumerate(_ULAW_SEGS):
        if p <= end:
            return ((seg << 4) | ((p >> (seg + 1)) & 0x0F)) ^ mask
    return 0x7F ^ mask


def ulaw_decode_sample(b: int) -> int:
    b = ~b & 0xFF
    exp = (b >> 4) & 0x07
    mant = b & 0x0F
    mag = (((mant << 3) + _ULAW_BIAS) << exp) - _ULAW_BIAS
    return -mag if b & 0x80 else mag


_ALAW_SEGS = (0xFF, 0x1FF, 0x3FF, 0x7FF, 0xFFF, 0x1FFF, 0x3FFF, 0x7FFF)


def alaw_encode_sample(s: int) -> int:
    pcm = s >> 3                      # 13-bit, arithmetic shift
    if pcm >= 0:
        mask = 0xD5                   # sign bit set, 0x55 xor folded in
    else:
        mask = 0x55
        pcm = -pcm - 1
    for seg, end in enumerate(_ALAW_SEGS):
        if pcm <= end >> 3:
            break
    else:
        seg = 7
    if seg == 0:
        aval = (pcm >> 1) & 0x0F
    elif seg == 1:
        aval = 0x10 | ((pcm >> 1) & 0x0F)
    else:
        aval = (seg << 4) | ((pcm >> seg) & 0x0F)
    return (aval ^ mask) & 0xFF


def alaw_decode_sample(a: int) -> int:
    a ^= 0x55
    t = (a & 0x0F) << 4
    seg = (a >> 4) & 0x07
    if seg == 0:
        t += 8
    elif seg == 1:
        t += 0x108
    else:
        t = (t + 0x108) << (seg - 1)
    return t if a & 0x80 else -t


def encode_wav_g711(samples: List[int], sample_rate: int = 8000,
                    channels: int = 1, law: str = "ulaw") -> bytes:
    """Encode interleaved int16 samples as a G.711-companded RIFF/WAVE
    blob (format tag 7 for mu-law, 6 for A-law, 8 bits/sample)."""
    if len(samples) % channels:
        raise ValueError("sample count not divisible by channel count")
    if law == "ulaw":
        tag, enc = 7, ulaw_encode_sample
    elif law == "alaw":
        tag, enc = 6, alaw_encode_sample
    else:
        raise ValueError(f"law must be 'ulaw' or 'alaw', got {law!r}")
    data = bytes(enc(s) for s in samples)
    byte_rate = sample_rate * channels
    fmt = struct.pack("<HHIIHH", tag, channels, sample_rate, byte_rate,
                      channels, 8)
    body = (b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    return b"RIFF" + struct.pack("<I", len(body)) + body
