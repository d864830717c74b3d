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


def wav_format_tag(data: bytes) -> int:
    """The wFormatTag of a RIFF/WAVE stream (1 = integer PCM, 6/7 =
    G.711 A-law/µ-law, 0x11 = IMA ADPCM) from the fmt chunk — a header
    sniff for dispatch without decoding the payload."""
    if bytes(data[:4]) != b"RIFF" or bytes(data[8:12]) != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos = 12
    while pos + 8 <= len(data):
        tag = bytes(data[pos:pos + 4])
        (ln,) = struct.unpack("<I", data[pos + 4:pos + 8])
        if tag == b"fmt ":
            (fmt_tag,) = struct.unpack("<H", data[pos + 8:pos + 10])
            return fmt_tag
        pos += 8 + ln + (ln & 1)
    raise ValueError("missing fmt chunk")


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
    block_align = fact_frames = None
    while pos + 8 <= end:
        tag = bytes(data[pos:pos + 4])
        (ln,) = struct.unpack("<I", data[pos + 4:pos + 8])
        if pos + 8 + ln > len(data):
            raise ValueError(
                f"truncated {tag!r} chunk: declares {ln} bytes, "
                f"{len(data) - pos - 8} remain")
        body = data[pos + 8:pos + 8 + ln]
        if tag == b"fmt ":
            fmt_tag, channels, rate, _br, block_align, bits = \
                struct.unpack("<HHIIHH", body[:16])
            if fmt_tag not in (1, 6, 7, 0x11):
                raise NotImplementedError(
                    f"WAV format tag {fmt_tag}: only integer PCM, "
                    f"G.711 (A-law/mu-law) and IMA ADPCM have stdlib "
                    f"decoders")
            if fmt_tag == 1 and bits != 16:
                raise NotImplementedError(f"PCM{bits}: only 16-bit")
            if fmt_tag in (6, 7) and bits != 8:
                raise ValueError(f"G.711 must be 8-bit, got {bits}")
            if fmt_tag == 0x11 and bits != 4:
                raise ValueError(f"IMA ADPCM must be 4-bit, got {bits}")
        elif tag == b"fact":
            (fact_frames,) = struct.unpack("<I", body[:4])
        elif tag == b"data":
            pcm = bytes(body)
        pos += 8 + ln + (ln & 1)  # chunks are word-aligned
    if rate is None or pcm is None:
        raise ValueError("missing fmt or data chunk")
    if fmt_tag == 0x11:
        return rate, channels, adpcm_decode(pcm, channels, block_align,
                                            fact_frames)
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


# ---------------------------------------------------------------------------
# IMA (DVI) ADPCM — WAV format tag 0x11, the dominant compressed-WAV
# layout: 4 bits/sample, blockwise state reset, ~4:1 vs PCM16.
# Decode is the IMA reference step function (IMA Digital Audio Focus
# and Technical Working Groups, "Recommended Practices for Enhancing
# Digital Audio Compatibility", rev 3.00, 1992); the encoder is the
# standard greedy quantizer whose state updates run through the SAME
# decode step, so encoder and decoder predictors never diverge.
# ---------------------------------------------------------------------------

IMA_STEP_TABLE = [
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34,
    37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143,
    157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494,
    544, 598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552,
    1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428,
    4871, 5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487,
    12635, 13899, 15289, 16818, 18500, 20350, 22385, 24623, 27086,
    29794, 32767]
IMA_INDEX_TABLE = [-1, -1, -1, -1, 2, 4, 6, 8]


def adpcm_step(code: int, pred: int, idx: int) -> Tuple[int, int]:
    """One IMA decode step: 4-bit code + (predictor, step index) →
    new (predictor, step index). Shared by decode AND encode."""
    step = IMA_STEP_TABLE[idx]
    diff = step >> 3
    if code & 1:
        diff += step >> 2
    if code & 2:
        diff += step >> 1
    if code & 4:
        diff += step
    pred = pred - diff if code & 8 else pred + diff
    pred = max(-32768, min(32767, pred))
    idx = max(0, min(88, idx + IMA_INDEX_TABLE[code & 7]))
    return pred, idx


def adpcm_encode_sample(s: int, pred: int, idx: int) -> int:
    """Greedy IMA quantize of one sample against the current state."""
    step = IMA_STEP_TABLE[idx]
    delta = s - pred
    code = 0
    if delta < 0:
        code = 8
        delta = -delta
    if delta >= step:
        code |= 4
        delta -= step
    if delta >= step >> 1:
        code |= 2
        delta -= step >> 1
    if delta >= step >> 2:
        code |= 1
    return code


def _adpcm_fmt(sample_rate: int, channels: int,
               block_align: int) -> bytes:
    spb = (block_align - 4 * channels) * 2 // channels + 1
    byte_rate = sample_rate * block_align // spb   # informational avg
    return struct.pack("<HHIIHHHH", 0x11, channels, sample_rate,
                       byte_rate, block_align, 4, 2, spb)


def encode_wav_ima_adpcm(samples: List[int], sample_rate: int = 8000,
                         channels: int = 1,
                         block_align: int = 256) -> bytes:
    """Encode interleaved int16 samples as IMA ADPCM WAV (tag 0x11).

    Per block and channel: 4-byte header (predictor int16 = the
    block's first sample, stored EXACTLY; step index; reserved), then
    nibbles for the remaining samples in 4-byte per-channel groups
    (low nibble first), channels interleaved group-wise. The final
    partial block is zero-padded in the nibble stream; the fact chunk
    carries the true per-channel frame count so decoders trim padding.
    """
    if block_align % 4 or block_align < 8 * channels:
        raise ValueError("block_align must be a multiple of 4 and "
                         "hold the per-channel headers")
    if len(samples) % channels:
        raise ValueError("sample count not divisible by channel count")
    frames = len(samples) // channels
    spb = (block_align - 4 * channels) * 2 // channels + 1
    chans = [samples[c::channels] for c in range(channels)]
    idx = [0] * channels
    data = bytearray()
    f = 0
    while f < frames:
        block_n = min(spb, frames - f)
        nibbles: List[List[int]] = []
        for c in range(channels):
            pred = chans[c][f]
            data += struct.pack("<hBB", pred, idx[c], 0)
            nibs = []
            for j in range(1, spb):
                s = chans[c][f + j] if j < block_n else pred
                code = adpcm_encode_sample(s, pred, idx[c])
                pred, idx[c] = adpcm_step(code, pred, idx[c])
                nibs.append(code)
            nibbles.append(nibs)
        # 4-byte groups (8 nibbles), channels interleaved group-wise
        n_groups = (spb - 1 + 7) // 8
        for g in range(n_groups):
            for c in range(channels):
                chunk = nibbles[c][g * 8:g * 8 + 8]
                chunk += [0] * (8 - len(chunk))
                for b in range(4):
                    data.append(chunk[2 * b] | (chunk[2 * b + 1] << 4))
        f += spb
    fmt = _adpcm_fmt(sample_rate, channels, block_align)
    body = (b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"fact" + struct.pack("<II", 4, frames)
            + b"data" + struct.pack("<I", len(data)) + data)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def adpcm_decode(data: bytes, channels: int, block_align: int,
                 frames: int = None) -> List[int]:
    """Decode an IMA ADPCM data chunk → interleaved int16 samples.
    ``frames`` (from the fact chunk) trims final-block padding."""
    spb = (block_align - 4 * channels) * 2 // channels + 1
    out: List[List[int]] = [[] for _ in range(channels)]
    pos = 0
    while pos + block_align <= len(data):
        block = data[pos:pos + block_align]
        pos += block_align
        preds, idxs = [], []
        for c in range(channels):
            pred, idx, _rsv = struct.unpack_from("<hBB", block, 4 * c)
            if idx > 88:
                raise ValueError(f"ADPCM step index {idx} > 88")
            preds.append(pred)
            idxs.append(idx)
            out[c].append(pred)
        body = block[4 * channels:]
        n_groups = len(body) // (4 * channels)
        for g in range(n_groups):
            for c in range(channels):
                grp = body[(g * channels + c) * 4:
                           (g * channels + c) * 4 + 4]
                for byte in grp:
                    for code in (byte & 0x0F, byte >> 4):
                        preds[c], idxs[c] = adpcm_step(
                            code, preds[c], idxs[c])
                        out[c].append(preds[c])
    per_ch = frames if frames is not None else \
        min(len(o) for o in out)
    inter: List[int] = []
    for i in range(per_ch):
        for c in range(channels):
            inter.append(out[c][i])
    return inter
