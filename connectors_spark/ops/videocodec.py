"""Stdlib-only AVI video codec (`struct` only): uncompressed DIB
('RGB ' / BI_RGB) frames in a minimal RIFF-AVI container.

Completes the multimodal trio (imagecodec: PNG/BMP, audiocodec: WAV):
video too has formats a pure-Python parser can decode — raw-frame
AVI, and (round 8) Motion-JPEG: each '00dc' frame is a standalone
baseline JPEG routed through the real entropy/DCT codec in
ops/jpegcodec.py, so MJPEG decode exercises the full compressed
path per frame. The encoder writes a spec-shaped container (avih main
header, strl/strh/strf stream headers, movi list of '00db' DIB or
'00dc' JPEG frames, DIB rows bottom-up BGR padded to 4 bytes); the
decoder is a chunk walker that descends LISTs, reads dimensions from
'avih', and yields frames as top-down RGB. Inter-frame codecs (h264
etc.) remain native-codec-guarded in ops/multimodal.py."""

from __future__ import annotations

import struct
from typing import List, Tuple

from . import jpegcodec


def _dib_frame(width: int, height: int, rgb: bytes) -> bytes:
    """Top-down RGB -> bottom-up padded BGR (the DIB wire format)."""
    pad = (-(width * 3)) % 4
    out = bytearray()
    for y in range(height - 1, -1, -1):
        for x in range(width):
            o = (y * width + x) * 3
            out += bytes((rgb[o + 2], rgb[o + 1], rgb[o]))
        out += bytes(pad)
    return bytes(out)


def _undib_frame(width: int, height: int, body: bytes) -> bytes:
    pad = (-(width * 3)) % 4
    out = bytearray(width * height * 3)
    p = 0
    for y in range(height - 1, -1, -1):
        for x in range(width):
            b, g, r = body[p], body[p + 1], body[p + 2]
            o = (y * width + x) * 3
            out[o], out[o + 1], out[o + 2] = r, g, b
            p += 3
        p += pad
    return bytes(out)


def _chunk(tag: bytes, body: bytes) -> bytes:
    return tag + struct.pack("<I", len(body)) + body + b"\0" * (len(body) & 1)


def _list(kind: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", kind + body)


def _avi_container(width: int, height: int, payloads: List[bytes],
                   handler: bytes, compression: int, chunk_id: bytes,
                   fps: int) -> bytes:
    """Shared RIFF-AVI assembly: avih main header, strl/strh/strf
    stream headers, movi list of per-frame payload chunks."""
    buf = max((len(p) for p in payloads), default=0)
    avih = struct.pack("<IIIIIIIIII4I", 1_000_000 // fps, 0, 0, 0x10,
                       len(payloads), 0, 1, buf, width, height,
                       0, 0, 0, 0)
    # flags, priority, language, initialFrames, scale, rate, start,
    # length, suggestedBufferSize, quality, sampleSize, rcFrame
    strh = (b"vids" + handler
            + struct.pack("<IHHIIIIIIiI", 0, 0, 0, 0, 1, fps, 0,
                          len(payloads), buf, -1, 0)
            + struct.pack("<4H", 0, 0, width, height))
    strf = struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24,
                       compression, buf, 2835, 2835, 0, 0)
    hdrl = _list(b"hdrl", _chunk(b"avih", avih)
                 + _list(b"strl", _chunk(b"strh", strh)
                         + _chunk(b"strf", strf)))
    movi = _list(b"movi", b"".join(_chunk(chunk_id, p)
                                   for p in payloads))
    return _chunk(b"RIFF", b"AVI " + hdrl + movi)


def encode_avi(width: int, height: int, frames: List[bytes],
               fps: int = 10) -> bytes:
    """Encode top-down RGB frames (each w*h*3 bytes) as raw-DIB AVI."""
    if any(len(f) != width * height * 3 for f in frames):
        raise ValueError("every frame must be w*h*3 RGB bytes")
    return _avi_container(
        width, height,
        [_dib_frame(width, height, f) for f in frames],
        b"DIB ", 0, b"00db", fps)


def decode_avi(data: bytes) -> Tuple[int, int, List[bytes]]:
    """Decode raw-DIB or Motion-JPEG AVI -> (width, height, frames as
    top-down RGB). Walks the RIFF tree; '00db' chunks un-DIB, '00dc'
    chunks run the full baseline-JPEG decode; inter-frame codecs raise."""
    if bytes(data[:4]) != b"RIFF" or bytes(data[8:12]) != b"AVI ":
        raise ValueError("not a RIFF/AVI file")
    width = height = None
    frames: List[bytes] = []

    def walk(pos: int, end: int) -> None:
        nonlocal width, height
        while pos + 8 <= end:
            tag = bytes(data[pos:pos + 4])
            (ln,) = struct.unpack("<I", data[pos + 4:pos + 8])
            body_start = pos + 8
            if tag == b"LIST":
                walk(body_start + 4, body_start + ln)
            elif tag == b"avih":
                width, height = struct.unpack(
                    "<II", data[body_start + 32:body_start + 40])
            elif tag == b"strh":
                handler = bytes(data[body_start + 4:body_start + 8])
                if bytes(data[body_start:body_start + 4]) == b"vids" \
                        and handler not in (b"DIB ", b"\0\0\0\0",
                                            b"MJPG"):
                    raise NotImplementedError(
                        f"AVI codec {handler!r}: only raw DIB and "
                        f"MJPG have stdlib decoders")
            elif tag == b"00db":
                if width is None:
                    raise ValueError("frame before avih header")
                frames.append(_undib_frame(
                    width, height, data[body_start:body_start + ln]))
            elif tag == b"00dc":
                if width is None:
                    raise ValueError("frame before avih header")
                fw, fh, fc, px = jpegcodec.decode_jpeg(
                    bytes(data[body_start:body_start + ln]))
                if (fw, fh) != (width, height):
                    raise ValueError(
                        f"MJPEG frame {fw}x{fh} != header "
                        f"{width}x{height}")
                if fc == 1:   # gray frames widen to RGB for uniformity
                    px = bytes(v for g in px for v in (g, g, g))
                frames.append(px)
            pos = body_start + ln + (ln & 1)

    walk(12, 8 + struct.unpack("<I", data[4:8])[0])
    if width is None:
        raise ValueError("missing avih header")
    return width, height, frames


def encode_avi_mjpeg(width: int, height: int, frames: List[bytes],
                     fps: int = 10) -> bytes:
    """Encode top-down RGB frames as a Motion-JPEG AVI: handler
    'MJPG', each frame a standalone baseline 4:4:4 color JPEG in a
    '00dc' (compressed) chunk. Dimensions must be multiples of 8 (the
    block-exact contract of the stdlib JPEG encoder)."""
    if any(len(f) != width * height * 3 for f in frames):
        raise ValueError("every frame must be w*h*3 RGB bytes")
    return _avi_container(
        width, height,
        [jpegcodec.encode_jpeg_color(width, height, f)
         for f in frames],
        b"MJPG", 0x47504A4D, b"00dc", fps)  # biCompression 'MJPG'

