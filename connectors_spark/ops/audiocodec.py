"""Stdlib-only WAV/PCM audio codec (`struct` only).

Companion to ops/imagecodec.py: turns the audio arm of the multimodal
stubs into a REAL decode path for the one audio format parseable
without native codecs — RIFF/WAVE with integer PCM. Compressed formats
(mp3/aac/ogg) remain native-codec-guarded in ops/multimodal.py.

Supports: PCM (format tag 1), 16-bit, mono or interleaved multi-channel,
arbitrary sample rate; chunk-walking parser that skips unknown chunks
(LIST/fact/cue) like a real reader must."""

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
            if fmt_tag != 1:
                raise NotImplementedError(
                    f"WAV format tag {fmt_tag}: only integer PCM has a "
                    f"stdlib decoder")
            if bits != 16:
                raise NotImplementedError(f"PCM{bits}: only 16-bit")
        elif tag == b"data":
            pcm = bytes(body)
        pos += 8 + ln + (ln & 1)  # chunks are word-aligned
    if rate is None or pcm is None:
        raise ValueError("missing fmt or data chunk")
    if len(pcm) % 2:
        raise ValueError("PCM16 data chunk has odd byte length")
    samples = list(struct.unpack(f"<{len(pcm) // 2}h", pcm))
    return rate, channels, samples
