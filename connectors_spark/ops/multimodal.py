"""Multimodal column plumbing: opaque binary media + typed metadata.

The pattern for image/audio/video at 100 TB: media bytes live in a
`binary` column (or object-store pointers), typed metadata in a sibling
struct; decode / feature-extract runs as Arrow-batched `mapInPandas`
so Python touches data in columnar batches, never row-at-a-time.

The container has no native media libraries, but every modality has
stdlib-decodable formats, and those paths are REAL here — including a
compressed format per modality: PNG (incl. Adam7) / BMP / GIF-LZW /
baseline+progressive JPEG images (ops/imagecodec.py, ops/jpegcodec.py),
WAV/PCM and G.711 mu-law/A-law audio (ops/audiocodec.py), raw-DIB and
Motion-JPEG AVI video (ops/videocodec.py) — all oracle-gated on
closed-form pixel/sample statistics. The remaining native-only
formats (mp3, h264, ...) raise NotImplementedError behind guards:
the mapInPandas seam is identical, so a native decoder drops in with
zero plan changes. `fake_decode_features`/`fake_resize`/`fake_frame_sample`
remain as byte-length stand-ins exercising the batch contracts
independently of any codec.
"""

from __future__ import annotations

from typing import Callable, Dict, Iterator, Optional

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import _spread
from pyspark.sql.types import (BinaryType, IntegerType, LongType, StringType,
                               StructField, StructType)

MEDIA_META = StructType([
    StructField("kind", StringType()),      # image | audio | video
    StructField("fmt", StringType()),       # e.g. png, wav, mp4
    StructField("n_bytes", LongType()),
])

MEDIA_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("media", BinaryType()),
    StructField("meta", MEDIA_META),
])

FEATURE_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("kind", StringType()),
    StructField("n_bytes", LongType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("n_frames", IntegerType()),
])


def attach_fake_media(docs: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id") -> DataFrame:
    """Synthesize a media table from documents: media = utf-8 bytes of the
    text (a deterministic opaque blob), kind cycles by id."""
    kind = F.element_at(F.array(F.lit("image"), F.lit("audio"),
                                F.lit("video")),
                        (F.col(id_col) % 3 + 1).cast("int"))
    fmt = F.element_at(F.array(F.lit("png"), F.lit("wav"), F.lit("mp4")),
                       (F.col(id_col) % 3 + 1).cast("int"))
    media = F.encode(F.col(text_col), "utf-8")
    return docs.select(
        F.col(id_col).alias("doc_id"),
        media.alias("media"),
        F.struct(kind.alias("kind"), fmt.alias("fmt"),
                 F.octet_length(F.col(text_col)).cast("long")
                 .alias("n_bytes")).alias("meta"))


def fake_decode_features(media_df: DataFrame) -> DataFrame:
    """Arrow-batched mapInPandas 'decode': deterministic pseudo-features
    from the byte payload. Stand-in for a real image/audio decoder with
    the exact batch shape a real one would use.

    width  = 16 + n_bytes % 32
    height = 16 + n_bytes % 17
    n_frames = 1 for image, n_bytes % 100 for audio/video
    """
    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = pdf["media"].map(len).astype("int64")
            kind = pdf["meta"].map(lambda m: m["kind"])
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "kind": kind,
                "n_bytes": n,
                "width": (16 + n % 32).astype("int32"),
                "height": (16 + n % 17).astype("int32"),
                "n_frames": (n % 100).where(kind != "image", 1)
                .astype("int32"),
            })

    return media_df.mapInPandas(decode, schema=FEATURE_SCHEMA)


RESIZE_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("thumb", BinaryType()),
])

FRAME_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("frame_idx", IntegerType()),
    StructField("frame_off", LongType()),
    StructField("frame_bytes", BinaryType()),
])


def fake_resize(media_df: DataFrame, width: int = 32,
                height: int = 32) -> DataFrame:
    """Arrow-batched mapInPandas 'resize': 1→1 batch shape with a binary
    OUTPUT column — the contract a real thumbnailer (PIL resize) drops
    into. The deterministic stand-in takes the first width*height payload
    bytes, zero-padded."""
    target = width * height

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "width": width,
                "height": height,
                "thumb": pdf["media"].map(
                    lambda b: bytes(b[:target]).ljust(target, b"\0")),
            }).astype({"width": "int32", "height": "int32"})

    return media_df.mapInPandas(resize, schema=RESIZE_SCHEMA)


def fake_frame_sample(media_df: DataFrame, every_n: int = 10,
                      frame_size: int = 256) -> DataFrame:
    """Arrow-batched mapInPandas frame sampler: 1→N batch shape (each
    video row emits one row per sampled frame) — the contract a real
    video decoder (pyav/ffmpeg keyframe extraction) drops into.

    Deterministic stand-in: n_frames = n_bytes % 100 (matching
    fake_decode_features), frames every_n apart, each frame a
    frame_size-byte slice of the payload starting at
    (frame_idx * frame_size) % n_bytes."""

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            kind = pdf["meta"].map(lambda m: m["kind"])
            vid = pdf[(kind == "video").values]
            if len(vid) == 0:
                continue
            nb = vid["media"].map(len).astype("int64")
            frames = (nb % 100).map(
                lambda k: list(range(0, int(k), every_n)))
            out = pd.DataFrame({"doc_id": vid["doc_id"],
                                "media": vid["media"],
                                "nb": nb,
                                "frame_idx": frames}).explode("frame_idx")
            out = out[out["frame_idx"].notna()]
            if len(out) == 0:
                continue
            idx = out["frame_idx"].astype("int64")
            off = (idx * frame_size) % out["nb"].clip(lower=1)
            yield pd.DataFrame({
                "doc_id": out["doc_id"],
                "frame_idx": idx.astype("int32"),
                "frame_off": off.astype("int64"),
                "frame_bytes": [bytes(m[o:o + frame_size])
                                for m, o in zip(out["media"], off)],
            })

    return media_df.mapInPandas(sample, schema=FRAME_SCHEMA)


# ---------------------------------------------------------------------------
# REAL image paths (PNG/BMP via ops/imagecodec.py; baseline JPEG via
# ops/jpegcodec.py — Huffman + dequant + IDCT in stdlib/numpy). Other
# compressed formats keep the NotImplementedError guard; the
# mapInPandas seam is identical, so a native decoder drops in with
# zero plan changes.
# ---------------------------------------------------------------------------

IMAGE_STATS_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("fmt", StringType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("channels", IntegerType()),
    StructField("pix_sum", LongType()),
    StructField("pix_xsum", LongType()),
])

THUMB_STATS_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("tw", IntegerType()),
    StructField("th", IntegerType()),
    StructField("thumb_sum", LongType()),
    StructField("thumb_xsum", LongType()),
])


def synth_image_media(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic REAL-image corpus: per doc, pixels follow the
    closed-form rule

        w = 4 + doc_id % 13,  h = 3 + doc_id % 7
        bmp when doc_id % 5 == 0 (else png)
        channels = 3 when bmp or doc_id odd, else 1 (grayscale)
        byte[i] = (doc_id * 31 + i) % 256

    encoded through the real stdlib encoders — PNGs with the per-row
    mixed filter schedule (y % 5) and Adam7 INTERLACED when
    doc_id % 3 == 0 (the oracle computes pixel stats from the rule, so
    the layout difference is exactly what the gate pins: a
    de-interlacing bug shifts pixels and breaks the position-weighted
    pix_xsum), BMPs bottom-up BGR-padded — so decoding them back is a
    genuine parse, while an SQL oracle can recompute the expected
    pixels from the rule alone."""
    from . import imagecodec as codec
    from ..shipping import ensure_shipped_by_value
    ensure_shipped_by_value()

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did in pdf[id_col]:
                did = int(did)
                w, h = 4 + did % 13, 3 + did % 7
                bmp = did % 5 == 0
                c = 3 if (bmp or did % 2 == 1) else 1
                px = bytes((did * 31 + i) % 256 for i in range(w * h * c))
                data = (codec.encode_bmp(w, h, px) if bmp
                        else codec.encode_png(w, h, px, c,
                                              interlace=did % 3 == 0))
                rows.append((did, data, "bmp" if bmp else "png"))
            yield pd.DataFrame(rows, columns=[id_col, "media", "fmt"])

    return _spread(docs.select(id_col)).mapInPandas(
        gen, schema=f"{id_col} long, media binary, fmt string")


def synth_flac_media(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic REAL-FLAC corpus: per doc a 16-bit FLAC clip,

        channels = 2 when doc_id % 4 == 2 else 1
        n        = 300 + doc_id % 257        frames (per channel)
        s(i)     = ((doc_id * 37 + i * i * 5 + (i % 7) * 911) % 65536)
                   - 32768                   (interleaved index i)

    encoded through the real encoder (per-block best FIXED predictor,
    Rice residuals, CRC-8/16, STREAMINFO md5). FLAC is LOSSLESS, so
    the oracle recomputes s(i) directly — no state replay — while
    Spark must run real Rice decode + fixed-polynomial reconstruction
    to reproduce the identical integers; the mix of block sizes (the
    last block is ragged) and stereo interleave is what the
    position-weighted amp_xsum pins."""
    from . import flaccodec as fc
    from ..shipping import ensure_shipped_by_value
    ensure_shipped_by_value()

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did in pdf[id_col]:
                did = int(did)
                ch = 2 if did % 4 == 2 else 1
                n = (300 + did % 257) * ch
                s = [((did * 37 + i * i * 5 + (i % 7) * 911) % 65536)
                     - 32768 for i in range(n)]
                data = fc.encode_flac(s, 8000, ch, block_size=256)
                rows.append((did, data, "flac"))
            yield pd.DataFrame(rows, columns=[id_col, "media", "fmt"])

    return _spread(docs.select(id_col)).mapInPandas(
        gen, schema=f"{id_col} long, media binary, fmt string")


def synth_tiff_media(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic REAL-TIFF corpus: per doc,

        w = 4 + doc_id % 11,  h = 3 + doc_id % 6
        channels = 3 when doc_id odd else 1
        compression: doc_id % 3 → 0 none, 1 LZW, 2 PackBits
        byte order:  big-endian (MM) when doc_id % 7 == 0 else II
        rows_per_strip = 3 (multi-strip whenever h > 3)
        byte[i] = (doc_id * 31 + i) % 256

    encoded through the real TIFF 6.0 writer (IFD, strip arrays,
    MSB-first early-change LZW / PackBits), so decoding is a genuine
    parse across both byte orders and all three baseline compressions
    while a SQL oracle recomputes the pixels from the rule alone —
    compression and endianness are exactly what the gate pins (a
    strip/LZW/byte-order bug shifts bytes and breaks the position-
    weighted pix_xsum)."""
    from . import imagecodec as codec
    from ..shipping import ensure_shipped_by_value
    ensure_shipped_by_value()

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        comp_of = {0: 1, 1: 5, 2: 32773}
        for pdf in batches:
            rows = []
            for did in pdf[id_col]:
                did = int(did)
                w, h = 4 + did % 11, 3 + did % 6
                c = 3 if did % 2 == 1 else 1
                px = bytes((did * 31 + i) % 256 for i in range(w * h * c))
                data = codec.encode_tiff(
                    w, h, px, channels=c, compression=comp_of[did % 3],
                    rows_per_strip=3, big_endian=did % 7 == 0)
                rows.append((did, data, "tiff"))
            yield pd.DataFrame(rows, columns=[id_col, "media", "fmt"])

    return _spread(docs.select(id_col)).mapInPandas(
        gen, schema=f"{id_col} long, media binary, fmt string")


def synth_jpeg_media(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic REAL-JPEG corpus: per doc, a baseline JPEG —
    grayscale for even ids, 4:4:4 COLOR for odd ids (interleaved MCUs,
    JFIF YCbCr) — whose pixels are piecewise-constant per 8×8 block
    under the closed-form rule

        doc_id % 4 == 3:  16 × 16, 4:2:0 color (2×2 Y blocks per MCU)
        doc_id % 8 == 5:  16 × 8,  4:2:2 color (2×1 Y blocks per MCU)
        doc_id % 8 == 1:  PROGRESSIVE (SOF2) 4:4:4 color, regular dims
        doc_id % 8 == 6:  PROGRESSIVE (SOF2) grayscale, regular dims
        otherwise:        w = 8·(1 + doc_id % 3), h = 8·(1 + doc_id % 2),
                          4:4:4 color when odd, grayscale when even
        block b (raster order):  p = 128 + 2·(((doc_id·7 + b·13) % 64) − 32)
        color docs: R = G = B = p  (gray RGB ⇒ Cb = Cr = 128 exactly)

    The progressive ids keep the regular-dims pixel rule, so the
    oracle is UNCHANGED — only the entropy layout differs (multi-scan
    spectral selection + successive approximation), and Spark must run
    the full Annex-G decode to reproduce the same bits.

    encoded through the real encoder (float DCT, quantize, Huffman,
    byte stuffing). The even offsets make S00 = 8·(p−128) an exact
    multiple of the flat quantizer 16 and gray RGB zeroes the chroma
    planes — including the 2×2-subsampled-then-replicated 4:2:0 ones —
    so decode reproduces the rule BIT-FOR-BIT — a DuckDB oracle
    recomputes the pixels from the rule while Spark must run real
    entropy decode, IDCT, chroma upsampling and YCbCr→RGB to match."""
    from . import jpegcodec as codec
    from ..shipping import ensure_shipped_by_value
    ensure_shipped_by_value()

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did in pdf[id_col]:
                did = int(did)
                sub420 = did % 4 == 3
                sub422 = did % 8 == 5
                if sub420:
                    w = h = 16
                elif sub422:
                    w, h = 16, 8
                else:
                    w, h = 8 * (1 + did % 3), 8 * (1 + did % 2)
                c = 3 if did % 2 else 1
                px = bytearray(w * h * c)
                for y in range(h):
                    for x in range(w):
                        b = (y // 8) * (w // 8) + (x // 8)
                        v = 128 + 2 * (((did * 7 + b * 13) % 64) - 32)
                        for ch in range(c):
                            px[(y * w + x) * c + ch] = v
                if did % 8 in (1, 6):
                    blob = codec.encode_jpeg_progressive(
                        w, h, bytes(px), channels=c)
                else:
                    enc = (codec.encode_jpeg_color_420 if sub420
                           else codec.encode_jpeg_color_422 if sub422
                           else codec.encode_jpeg_color if c == 3
                           else codec.encode_jpeg_gray)
                    blob = enc(w, h, bytes(px))
                rows.append((did, blob, "jpeg"))
            yield pd.DataFrame(rows, columns=[id_col, "media", "fmt"])

    return _spread(docs.select(id_col)).mapInPandas(
        gen, schema=f"{id_col} long, media binary, fmt string")


def synth_jpeg_progressive_media(docs: DataFrame,
                                 id_col: str = "doc_id") -> DataFrame:
    """Deterministic ALL-PROGRESSIVE (SOF2, ITU-T.81 Annex G) JPEG
    corpus — the dedicated gate for the multi-scan decode path:

        even doc_id:  multi-scan GRAYSCALE, w = 8·(1 + doc_id % 3),
                      h = 8·(1 + doc_id % 2)
        doc_id % 4 == 1:  PROGRESSIVE 4:2:0 color, 16 × 16
        doc_id % 4 == 3:  PROGRESSIVE 4:2:0 color, 32 × 16
        block b (raster):  p = 128 + 2·(((doc_id·7 + b·13) % 64) − 32)
        color docs: R = G = B = p  (gray RGB ⇒ chroma planes are
        exactly zero, surviving the 2×2-mean 4:2:0 subsample intact)

    Every stream is a genuine multi-scan file: DC-first (Al=1), DC
    refinement (raw bits), per-component spectral-selection AC scans
    with EOBn runs, then AC successive-approximation refinement with
    correction bits — Spark must run the full Annex-G accumulate-
    then-IDCT decode; the DuckDB oracle recomputes the closed-form
    pixel rule (exact: block-constant pixels quantize losslessly
    under the flat quantizer)."""
    from . import jpegcodec as codec
    from ..shipping import ensure_shipped_by_value
    ensure_shipped_by_value()

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did in pdf[id_col]:
                did = int(did)
                if did % 2:
                    w, h, c = (16 if did % 4 == 1 else 32), 16, 3
                    sub = "420"
                else:
                    w, h, c = 8 * (1 + did % 3), 8 * (1 + did % 2), 1
                    sub = "444"
                px = bytearray(w * h * c)
                for y in range(h):
                    for x in range(w):
                        b = (y // 8) * (w // 8) + (x // 8)
                        v = 128 + 2 * (((did * 7 + b * 13) % 64) - 32)
                        for ch in range(c):
                            px[(y * w + x) * c + ch] = v
                blob = codec.encode_jpeg_progressive(
                    w, h, bytes(px), channels=c, subsampling=sub)
                rows.append((did, blob, "jpeg"))
            yield pd.DataFrame(rows, columns=[id_col, "media", "fmt"])

    return _spread(docs.select(id_col)).mapInPandas(
        gen, schema=f"{id_col} long, media binary, fmt string")


def synth_gif_media(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic REAL-GIF corpus: per doc, a single-frame GIF89a
    with real LZW-compressed pixel data under the closed-form rule

        w = 1 + doc_id % 19,  h = 1 + doc_id % 13
        ncol = 2 + doc_id % 255
        palette[i] = ((i·7 + doc_id) % 256, (i·11 + 3·doc_id) % 256,
                      (i·13 + 5·doc_id) % 256)
        index at pixel p (raster) = (doc_id·3 + p·5) % ncol
        odd doc_ids are INTERLACED (4-pass row order)

    GIF is lossless, so the DuckDB oracle recomputes the exact RGB
    bytes from the rule while Spark must run real LZW decompression,
    palette lookup and de-interlacing to match."""
    from . import imagecodec as codec
    from ..shipping import ensure_shipped_by_value
    ensure_shipped_by_value()

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did in pdf[id_col]:
                did = int(did)
                w, h = 1 + did % 19, 1 + did % 13
                ncol = 2 + did % 255
                pal = bytes(b for i in range(ncol)
                            for b in ((i * 7 + did) % 256,
                                      (i * 11 + 3 * did) % 256,
                                      (i * 13 + 5 * did) % 256))
                idx = bytes((did * 3 + p * 5) % ncol
                            for p in range(w * h))
                rows.append((did,
                             codec.encode_gif(w, h, idx, pal,
                                              interlace=bool(did % 2)),
                             "gif"))
            yield pd.DataFrame(rows, columns=[id_col, "media", "fmt"])

    return _spread(docs.select(id_col)).mapInPandas(
        gen, schema=f"{id_col} long, media binary, fmt string")


def decode_image(media_df: DataFrame, id_col: str = "doc_id",
                 media_col: str = "media") -> DataFrame:
    """REAL image decode via the stdlib PNG/BMP codec: Arrow-batched
    mapInPandas over binary payloads → per-image stats
    (width/height/channels from the parsed headers, pix_sum/pix_xsum
    from the decoded pixel bytes — position-sensitive, so a filter
    or row-order bug cannot cancel out). PNG/BMP/GIF/JPEG dispatch to
    the stdlib codecs; other formats raise NotImplementedError
    (native-codec formats)."""
    import numpy as np

    from . import imagecodec as codec
    from ..shipping import ensure_shipped_by_value
    ensure_shipped_by_value()

    def dec(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, blob in zip(pdf[id_col], pdf[media_col]):
                fmt, w, h, c, px = codec.decode_any(bytes(blob))
                arr = np.frombuffer(px, dtype=np.uint8).astype(np.int64)
                rows.append((int(did), fmt, w, h, c, int(arr.sum()),
                             int(((np.arange(len(arr)) + 1) * arr).sum())))
            yield pd.DataFrame(rows, columns=cols)

    cols = [id_col] + [f.name for f in IMAGE_STATS_SCHEMA.fields[1:]]
    schema = StructType([StructField(id_col, LongType())]
                        + IMAGE_STATS_SCHEMA.fields[1:])
    return media_df.mapInPandas(dec, schema=schema)


def synth_jpeg_scaled_media(docs: DataFrame, groups: int = 50,
                            id_col: str = "doc_id") -> DataFrame:
    """Deterministic REAL-JPEG corpus of SCALE VARIANTS for perceptual
    dedup: doc_ids sharing a group (``doc_id % groups``) render the
    SAME 4×4-cell grayscale pattern at one of three sizes
    (32/64/128 px square, size = 32 << (doc_id % 3)), so a
    scale-invariant image hash must collapse each group to one cluster
    across renditions. Cell values follow

        v(g, ci, cj) = 128 + 2·((((g+3)·(ci·5 + cj·11 + 7) + g²) % 64)
                                − 32)

    — chosen (and pinned in tests) so all `groups` patterns produce
    DISTINCT pHashes while every cell spans ≥ one whole 8×8 JPEG block
    at the smallest size, keeping the encoder's exact block-constant
    round trip (see synth_jpeg_media). The rule is closed-form, so a
    SQL oracle can predict the cluster structure without computing a
    single DCT."""
    from . import jpegcodec as codec
    from ..shipping import ensure_shipped_by_value
    ensure_shipped_by_value()

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np
        for pdf in batches:
            rows = []
            for did in pdf[id_col]:
                did = int(did)
                g = did % groups
                size = 32 << (did % 3)
                cells = np.array(
                    [[128 + 2 * ((((g + 3) * (ci * 5 + cj * 11 + 7)
                                   + g * g) % 64) - 32)
                      for cj in range(4)] for ci in range(4)],
                    dtype=np.uint8)
                cs = size // 4
                px = np.repeat(np.repeat(cells, cs, axis=0), cs, axis=1)
                blob = codec.encode_jpeg_gray(size, size,
                                              px.tobytes())
                rows.append((did, blob, "jpeg"))
            yield pd.DataFrame(rows, columns=[id_col, "media", "fmt"])

    return _spread(docs.select(id_col)).mapInPandas(
        gen, schema=f"{id_col} long, media binary, fmt string")


def _dct_mat(n: int):
    """Orthonormal DCT-II basis matrix (type-II, norm='ortho')."""
    import numpy as np
    k = np.arange(n)[:, None]
    i = np.arange(n)[None, :]
    M = np.sqrt(2.0 / n) * np.cos(np.pi * (2 * i + 1) * k / (2 * n))
    M[0] = np.sqrt(1.0 / n)
    return M


def _phash64(gray32) -> int:
    """64-bit DCT perceptual hash of a 32×32 grayscale array: 2-D
    orthonormal DCT, keep the 8×8 low-frequency block, drop the DC
    term (brightness invariance), threshold the remaining 63 at their
    median (> median → 1; exact-median ties → 0, deterministic), pack
    little-endian."""
    import numpy as np
    M32 = _dct_mat(32)
    d = M32 @ gray32.astype(np.float64) @ M32.T
    low = d[:8, :8].flatten()[1:]
    bits = (low > np.median(low)).astype(np.uint8)
    words = np.packbits(bits, bitorder="little")
    out = 0
    for bi, byte in enumerate(words[:8]):
        out |= int(byte) << (8 * bi)
    return out - (1 << 64) if out >= (1 << 63) else out


def phash_clusters(media_df: DataFrame, id_col: str = "doc_id",
                   media_col: str = "media") -> DataFrame:
    """Perceptual-hash image dedup clusters (pHash: Zauner 2010,
    'Implementation and Benchmarking of Perceptual Image Hash
    Functions'): REAL decode → luma → box-resize to 32×32 → DCT
    low-band sign hash → exact groupBy on the 64-bit hash. Scale
    variants of the same image land in one cluster; the DC drop makes
    it brightness-shift tolerant.

    100 TB shape: decode+hash is one Arrow-batched mapInPandas pass
    emitting (id, width, hash) — 16 bytes/row into a single map-side-
    combined groupBy on an 8-byte key; no pair expansion anywhere
    (cluster semantics, not pair semantics — the output is one row per
    perceptual identity: representative, member count, distinct
    rendition sizes).

    Non-multiple-of-32 inputs use nearest-neighbor index sampling (the
    deterministic fallback); multiples use exact box means."""
    import numpy as np

    from . import imagecodec as codec
    from ..shipping import ensure_shipped_by_value
    ensure_shipped_by_value()

    def hash_rows(batches: Iterator[pd.DataFrame]
                  ) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, blob in zip(pdf[id_col], pdf[media_col]):
                _fmt, w, h, c, px = codec.decode_any(bytes(blob))
                arr = np.frombuffer(px, dtype=np.uint8) \
                    .reshape(h, w, c).astype(np.float64)
                gray = arr.mean(axis=2)
                if h % 32 == 0 and w % 32 == 0:
                    g32 = gray.reshape(32, h // 32, 32, w // 32) \
                        .mean(axis=(1, 3))
                else:
                    yi = (np.arange(32) * h) // 32
                    xi = (np.arange(32) * w) // 32
                    g32 = gray[np.ix_(yi, xi)]
                rows.append((int(did), int(w), _phash64(g32)))
            yield pd.DataFrame(rows,
                               columns=[id_col, "width", "phash"])

    hashed = media_df.mapInPandas(
        hash_rows, schema=f"{id_col} long, width int, phash long")
    return (hashed.groupBy("phash")
            .agg(F.min(id_col).alias("rep"),
                 F.count(F.lit(1)).alias("n_members"),
                 F.countDistinct("width").alias("n_sizes"))
            .select("rep", "n_members", "n_sizes"))


def image_thumbnails(media_df: DataFrame, tw: int = 5, th: int = 4,
                     id_col: str = "doc_id",
                     media_col: str = "media") -> DataFrame:
    """REAL thumbnail path: decode → nearest-neighbor resize →
    re-encode as PNG → decode the thumbnail AGAIN and emit its pixel
    sums. The double round-trip through the real encoder/decoder (with
    the mixed filter schedule) is the point — the output stats are only
    right if parse, unfilter, resample, refilter, and reparse all are."""
    import numpy as np

    from . import imagecodec as codec
    from ..shipping import ensure_shipped_by_value
    ensure_shipped_by_value()

    def thumbs(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, blob in zip(pdf[id_col], pdf[media_col]):
                _fmt, w, h, c, px = codec.decode_any(bytes(blob))
                tpx = codec.resize_nearest(px, w, h, c, tw, th)
                blob2 = codec.encode_png(tw, th, tpx, c)
                w2, h2, _c2, px2 = codec.decode_png(blob2)
                arr = np.frombuffer(px2, dtype=np.uint8).astype(np.int64)
                rows.append((int(did), w2, h2, int(arr.sum()),
                             int(((np.arange(len(arr)) + 1) * arr).sum())))
            yield pd.DataFrame(rows, columns=cols)

    cols = [id_col] + [f.name for f in THUMB_STATS_SCHEMA.fields[1:]]
    schema = StructType([StructField(id_col, LongType())]
                        + THUMB_STATS_SCHEMA.fields[1:])
    return media_df.mapInPandas(thumbs, schema=schema)


AUDIO_STATS_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("sample_rate", IntegerType()),
    StructField("channels", IntegerType()),
    StructField("n_samples", IntegerType()),
    StructField("amp_sum", LongType()),
    StructField("amp_sq_sum", LongType()),
    StructField("amp_xsum", LongType()),
])


def synth_wav_media(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic REAL-audio corpus: per doc, PCM16 mono samples
    follow the closed-form rule

        n     = 64 + doc_id % 129
        rate  = 8000 + (doc_id % 3) * 4000
        s[i]  = (doc_id * 7919 + i * i) % 4001 - 2000

    encoded through the real WAV encoder, so decoding is a genuine
    RIFF-chunk parse while an SQL oracle recomputes expected sample
    statistics from the rule alone."""
    from . import audiocodec as ac
    from ..shipping import ensure_shipped_by_value
    ensure_shipped_by_value()

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did in pdf[id_col]:
                did = int(did)
                n = 64 + did % 129
                rate = 8000 + (did % 3) * 4000
                samples = [(did * 7919 + i * i) % 4001 - 2000
                           for i in range(n)]
                rows.append((did, ac.encode_wav(samples, rate)))
            yield pd.DataFrame(rows, columns=[id_col, "media"])

    # no _spread: PCM16 encode is cheap; the extra exchange costs
    # more than the single-task encode saves (A/B at sf0.1)
    return docs.select(id_col).mapInPandas(
        gen, schema=f"{id_col} long, media binary")


def synth_adpcm_media(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic REAL IMA-ADPCM corpus: per doc a mono 8 kHz WAV
    (format tag 0x11, block_align 12 → 17 samples/block) built from
    closed-form block headers and nibble stream

        nb          = 2 + doc_id % 3                 blocks
        pred0(b)    = ((doc_id*131 + b*4099) % 65536) - 32768
        idx0(b)     = (doc_id + 11*b) % 89
        nib(b, j)   = (doc_id*7 + b*5 + j*j*3) % 16,  j = 0..15

    ADPCM decode is a sequential state machine (per-block state), so —
    unlike G.711 — decode(encode(s)) has no per-sample closed form;
    instead the CORPUS pins the encoded stream in closed form and the
    DuckDB oracle replays the IMA step function with a recursive CTE
    (17 steps/block), while Spark parses the real RIFF container and
    runs the real blockwise decoder (ops/audiocodec.adpcm_decode,
    whose step function is validated bit-exact against CPython's
    audioop DVI implementation)."""
    import struct as _struct

    from . import audiocodec as ac
    from ..shipping import ensure_shipped_by_value
    ensure_shipped_by_value()

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did in pdf[id_col]:
                did = int(did)
                nb = 2 + did % 3
                data = bytearray()
                for b in range(nb):
                    pred0 = ((did * 131 + b * 4099) % 65536) - 32768
                    idx0 = (did + 11 * b) % 89
                    data += _struct.pack("<hBB", pred0, idx0, 0)
                    nibs = [(did * 7 + b * 5 + j * j * 3) % 16
                            for j in range(16)]
                    for m in range(8):          # 8 data bytes/block
                        data.append(nibs[2 * m] | (nibs[2 * m + 1] << 4))
                fmt = ac._adpcm_fmt(8000, 1, 12)
                body = (b"WAVE"
                        + b"fmt " + _struct.pack("<I", len(fmt)) + fmt
                        + b"fact" + _struct.pack("<II", 4, 17 * nb)
                        + b"data" + _struct.pack("<I", len(data))
                        + bytes(data))
                blob = b"RIFF" + _struct.pack("<I", len(body)) + body
                rows.append((did, blob))
            yield pd.DataFrame(rows, columns=[id_col, "media"])

    return _spread(docs.select(id_col)).mapInPandas(
        gen, schema=f"{id_col} long, media binary")


# ---------------------------------------------------------------------------
# Pluggable EXTERNAL decoders (the formal seam for the native-codec
# ceiling): formats whose decode is out of scope in this container
# (mp3, h264, arithmetic-coded JPEG) raise NotImplementedError UNLESS
# a deployment registers a real decoder for the sniffed format — e.g.
# a minimp3 / pyav / libjpeg-turbo binding. The registry snapshot is
# captured BY VALUE into each mapInPandas closure (module state on the
# driver is invisible to executor interpreters), so registration needs
# no plan, schema, or code change — the dispatch surface is proven by
# tests/test_multimodal_seam.py with a fake registered decoder.
# Decoder contract per kind:
#   audio: fn(bytes) -> (sample_rate, channels, [interleaved ints])
# ---------------------------------------------------------------------------

_EXTERNAL_DECODERS: Dict[str, Dict[str, Callable]] = {"audio": {}}


def register_external_decoder(kind: str, fmt: str,
                              fn: Callable) -> None:
    """Register a native decoder for a guarded format (e.g.
    ``("audio", "audio/mpeg", minimp3_decode)``). ``fn`` must be
    picklable (module-level) — it ships to executors by value."""
    if kind not in _EXTERNAL_DECODERS:
        raise ValueError(f"unknown media kind {kind!r} "
                         f"(have {sorted(_EXTERNAL_DECODERS)})")
    _EXTERNAL_DECODERS[kind][fmt] = fn


def unregister_external_decoder(kind: str, fmt: str) -> None:
    _EXTERNAL_DECODERS.get(kind, {}).pop(fmt, None)


def _sniff_guarded_audio(blob: bytes) -> Optional[str]:
    """Format tag for audio formats this container cannot decode
    natively: MPEG audio (ID3v2 tag or an MPEG-1 frame sync)."""
    if blob[:3] == b"ID3":
        return "audio/mpeg"
    if len(blob) >= 2 and blob[0] == 0xFF and (blob[1] & 0xE0) == 0xE0 \
            and blob[:4] != b"\xff\xd8\xff\xe0":
        return "audio/mpeg"
    return None


def decode_audio(media_df: DataFrame, id_col: str = "doc_id",
                 media_col: str = "media") -> DataFrame:
    """REAL audio decode via the stdlib WAV codec: per clip, sample
    rate and count from the parsed header plus amplitude sums from the
    decoded payload — PCM16 or G.711 companded (amp_xsum is
    position-weighted, so a byte-order or alignment bug cannot cancel
    out). Other format tags raise NotImplementedError (native-codec
    territory). FLAC clips (sniffed by the fLaC magic) decode through
    the stdlib lossless codec, CRC-verified."""
    import numpy as np

    from . import audiocodec as ac
    from . import flaccodec as fc
    from ..shipping import ensure_shipped_by_value
    ensure_shipped_by_value()

    ext_reg = dict(_EXTERNAL_DECODERS["audio"])   # snapshot BY VALUE

    def dec(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, blob in zip(pdf[id_col], pdf[media_col]):
                blob = bytes(blob)
                guarded = _sniff_guarded_audio(blob)
                if blob[:4] == b"fLaC":
                    rate, ch, samples = fc.decode_flac(blob)
                elif guarded is not None:
                    if guarded not in ext_reg:
                        raise NotImplementedError(
                            f"{guarded} decode needs a native codec "
                            f"not present in this environment; "
                            f"register one via "
                            f"register_external_decoder('audio', "
                            f"{guarded!r}, fn)")
                    rate, ch, samples = ext_reg[guarded](blob)
                else:
                    rate, ch, samples = ac.decode_wav(blob)
                arr = np.array(samples, dtype=np.int64)
                rows.append((int(did), rate, ch, len(arr), int(arr.sum()),
                             int((arr * arr).sum()),
                             int(((np.arange(len(arr)) + 1) * arr).sum())))
            yield pd.DataFrame(rows, columns=cols)

    cols = [id_col] + [f.name for f in AUDIO_STATS_SCHEMA.fields[1:]]
    schema = StructType([StructField(id_col, LongType())]
                        + AUDIO_STATS_SCHEMA.fields[1:])
    return media_df.mapInPandas(dec, schema=schema)


def synth_audio_xcodec_media(docs: DataFrame, groups: int = 32,
                             id_col: str = "doc_id") -> DataFrame:
    """Deterministic CROSS-CODEC audio corpus for perceptual dedup:
    doc_ids sharing a group (``doc_id % groups``) carry the SAME
    512-sample mono clip, encoded through a different REAL codec per
    rendition (doc_id % 3): PCM16 WAV, FLAC (lossless), or G.711 µ-law
    WAV (lossy companding). The clip is one tone per octave band —
    frequency bin 8b+4 of a 128-sample frame, amplitude
    800 + 400·p_g(b) where p_g is the affine permutation
    (2·(g%4)+1)·b + g//4 mod 8 — so the band-energy ORDERING encodes
    the group, every pairwise band comparison has a ≥20k energy margin
    over µ-law quantization noise (measured), and a band-sign
    fingerprint must collapse the three codec renditions to one
    cluster. Closed-form rule → the SQL oracle needs only group
    arithmetic."""
    from . import audiocodec as ac
    from . import flaccodec as fc
    from ..shipping import ensure_shipped_by_value
    ensure_shipped_by_value()

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np
        for pdf in batches:
            rows = []
            for did in pdf[id_col]:
                did = int(did)
                g = did % groups
                i = np.arange(512)
                a_g, c_g = 2 * (g % 4) + 1, g // 4
                s = np.zeros(512)
                for b in range(8):
                    amp = 800 + 400 * ((a_g * b + c_g) % 8)
                    s += amp * np.sin(2 * np.pi * (8 * b + 4) * i / 128)
                samples = [int(v) for v in np.round(s)]
                fmt = did % 3
                if fmt == 0:
                    blob = ac.encode_wav(samples, 8000)
                elif fmt == 1:
                    blob = fc.encode_flac(samples, 8000, 1,
                                          block_size=256)
                else:
                    blob = ac.encode_wav_g711(samples, 8000)
                rows.append((did, blob,
                             ("wav", "flac", "g711")[fmt]))
            yield pd.DataFrame(rows, columns=[id_col, "media", "fmt"])

    return _spread(docs.select(id_col)).mapInPandas(
        gen, schema=f"{id_col} long, media binary, fmt string")


def _audio_fp64(samples) -> int:
    """Band-energy-ordering audio fingerprint (the Haitsma/Kalker
    'robust audio hashing' family): frame to 128 samples, rfft, sum
    |X| over 8 octave-ish bands of 8 bins, average frames, then one
    bit per band PAIR (b1 < b2): energy[b1] > energy[b2] — 28 bits
    encoding the energy ordering, invariant to codec-level noise and
    global gain."""
    import numpy as np
    x = np.asarray(samples, dtype=np.float64)[:512]
    if len(x) < 512:
        x = np.pad(x, (0, 512 - len(x)))
    frames = x.reshape(4, 128)
    spec = np.abs(np.fft.rfft(frames, axis=1))[:, 1:65]
    bands = spec.reshape(4, 8, 8).sum(axis=2).mean(axis=0)
    bits = 0
    k = 0
    for b1 in range(8):
        for b2 in range(b1 + 1, 8):
            if bands[b1] > bands[b2]:
                bits |= 1 << k
            k += 1
    return bits


def audio_fp_clusters(media_df: DataFrame, id_col: str = "doc_id",
                      media_col: str = "media") -> DataFrame:
    """Cross-codec audio dedup clusters: REAL decode (WAV PCM16 /
    G.711 companded / IMA ADPCM via the RIFF parser; FLAC via the
    Rice/LPC codec, CRC-verified) → band-ordering fingerprint →
    exact groupBy on the fingerprint. Renditions of the same content
    in different containers/codecs land in one cluster.

    100 TB shape: one Arrow-batched mapInPandas pass emitting
    (id, fmt, fp) — the cluster agg is a map-side-combined groupBy on
    an 8-byte key; no pair expansion (cluster semantics: one row per
    audio identity with member count and distinct-codec count)."""
    from . import audiocodec as ac
    from . import flaccodec as fc
    from ..shipping import ensure_shipped_by_value
    ensure_shipped_by_value()

    def fps(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, blob in zip(pdf[id_col], pdf[media_col]):
                blob = bytes(blob)
                if blob[:4] == b"fLaC":
                    fmt = "flac"
                    _r, _c, samples = fc.decode_flac(blob)
                else:
                    # RIFF: PCM16 vs companded G.711 vs ADPCM are
                    # dispatched by the parsed wFormatTag
                    fmt = "wav" if ac.wav_format_tag(blob) == 1 \
                        else "companded"
                    _r, _c, samples = ac.decode_wav(blob)
                rows.append((int(did), fmt, _audio_fp64(samples)))
            yield pd.DataFrame(rows, columns=[id_col, "fmt", "fp"])

    hashed = media_df.mapInPandas(
        fps, schema=f"{id_col} long, fmt string, fp long")
    return (hashed.groupBy("fp")
            .agg(F.min(id_col).alias("rep"),
                 F.count(F.lit(1)).alias("n_members"),
                 F.countDistinct("fmt").alias("n_fmts"))
            .select("rep", "n_members", "n_fmts"))


VIDEO_FRAME_STATS_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("frame_idx", IntegerType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("pix_sum", LongType()),
    StructField("pix_xsum", LongType()),
])


def synth_avi_media(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic REAL-video corpus: per doc a raw-DIB AVI with

        nf = 2 + doc_id % 4 frames,  w = 4 + doc_id % 5,
        h = 2 + doc_id % 3,  pixel(f, i) = (doc_id*131 + f*977 + i) % 256

    encoded through the real AVI encoder (RIFF lists, bottom-up padded
    BGR DIB frames), so frame extraction is a genuine container parse
    while an SQL oracle recomputes expected frame statistics from the
    rule alone."""
    from . import videocodec as vc
    from ..shipping import ensure_shipped_by_value
    ensure_shipped_by_value()

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did in pdf[id_col]:
                did = int(did)
                nf, w, h = 2 + did % 4, 4 + did % 5, 2 + did % 3
                frames = [bytes((did * 131 + f * 977 + i) % 256
                                for i in range(w * h * 3))
                          for f in range(nf)]
                rows.append((did, vc.encode_avi(w, h, frames)))
            yield pd.DataFrame(rows, columns=[id_col, "media"])

    return _spread(docs.select(id_col)).mapInPandas(
        gen, schema=f"{id_col} long, media binary")


def frame_sample_real(media_df: DataFrame, every_n: int = 2,
                      id_col: str = "doc_id",
                      media_col: str = "media") -> DataFrame:
    """REAL video frame sampling: parse the AVI container, keep every
    ``every_n``-th frame, emit per-frame pixel stats (position-weighted
    xsum — a row-order/BGR-swap bug cannot cancel). 1→N Arrow batch
    shape, the contract a native keyframe extractor drops into."""
    import numpy as np

    from . import videocodec as vc
    from ..shipping import ensure_shipped_by_value
    ensure_shipped_by_value()

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, blob in zip(pdf[id_col], pdf[media_col]):
                w, h, frames = vc.decode_avi(bytes(blob))
                for fi in range(0, len(frames), every_n):
                    arr = np.frombuffer(frames[fi],
                                        dtype=np.uint8).astype(np.int64)
                    rows.append((int(did), fi, w, h, int(arr.sum()),
                                 int(((np.arange(len(arr)) + 1)
                                      * arr).sum())))
            yield pd.DataFrame(rows, columns=cols)

    cols = [id_col] + [f.name for f in VIDEO_FRAME_STATS_SCHEMA.fields[1:]]
    schema = StructType([StructField(id_col, LongType())]
                        + VIDEO_FRAME_STATS_SCHEMA.fields[1:])
    return media_df.mapInPandas(sample, schema=schema)


def synth_mjpeg_scenes_media(docs: DataFrame,
                             id_col: str = "doc_id") -> DataFrame:
    """Deterministic REAL Motion-JPEG corpus with KNOWN scene cuts:
    per doc an 8-frame 16×16 MJPG AVI whose frames are solid-color
    baseline JPEGs; the color changes exactly at the closed-form cut
    set  {f ∈ 1..7 : (doc_id + f) % 3 == 0}  (scene s = number of cuts
    ≤ f, frame value v = 128 + 2·(((doc_id·7 + s·13) % 64) − 32); the
    13-step mod 64 guarantees consecutive scenes differ). Block-
    constant frames decode bit-exactly, so within-scene frame diffs
    are EXACTLY zero and cut-frame diffs ≥ 2 — a SQL oracle enumerates
    the cut set while Spark must run the real container parse and
    per-frame entropy decode to find it."""
    from . import videocodec as vc
    from ..shipping import ensure_shipped_by_value
    ensure_shipped_by_value()

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did in pdf[id_col]:
                did = int(did)
                frames = []
                s = 0
                for f in range(8):
                    if f > 0 and (did + f) % 3 == 0:
                        s += 1
                    v = 128 + 2 * (((did * 7 + s * 13) % 64) - 32)
                    frames.append(bytes([v]) * (16 * 16 * 3))
                rows.append((did, vc.encode_avi_mjpeg(16, 16, frames)))
            yield pd.DataFrame(rows, columns=[id_col, "media"])

    return _spread(docs.select(id_col)).mapInPandas(
        gen, schema=f"{id_col} long, media binary")


def scene_cuts(media_df: DataFrame, threshold: float = 1.0,
               id_col: str = "doc_id",
               media_col: str = "media") -> DataFrame:
    """Scene-cut detection over REAL video decode: parse the container,
    entropy-decode every frame, and emit (id, cut_idx) for each frame
    whose mean absolute pixel difference from its predecessor exceeds
    ``threshold`` — the video-curation primitive behind scene
    segmentation / keyframe sampling in multimodal training pipelines.

    100 TB shape: one Arrow-batched mapInPandas pass; per clip the
    state is two frames (current + previous), never the whole decoded
    video, and the output is O(cuts) narrow rows."""
    import numpy as np

    from . import videocodec as vc
    from ..shipping import ensure_shipped_by_value
    ensure_shipped_by_value()

    def cuts(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, blob in zip(pdf[id_col], pdf[media_col]):
                _w, _h, frames = vc.decode_avi(bytes(blob))
                prev = None
                for i, fr in enumerate(frames):
                    cur = np.frombuffer(fr, dtype=np.uint8) \
                        .astype(np.int64)
                    if prev is not None:
                        if np.abs(cur - prev).mean() > threshold:
                            rows.append((int(did), i))
                    prev = cur
            yield pd.DataFrame(rows, columns=[id_col, "cut_idx"])

    return media_df.mapInPandas(
        cuts, schema=f"{id_col} long, cut_idx int")


def synth_wav_segments_media(docs: DataFrame,
                             id_col: str = "doc_id") -> DataFrame:
    """Deterministic PCM16 corpus with KNOWN active/silence structure:
    per doc a 2000-sample mono WAV of five 400-sample blocks; block b
    is ACTIVE (a ±800·(1 + (doc_id + b) % 3) square tone, period 16)
    when (doc_id + b·b) % 3 != 0, else EXACT silence. Adjacent
    active blocks occur, so a detector must MERGE them — the oracle
    reproduces the merge with closed-form arithmetic while Spark runs
    the real RIFF parse + energy framing."""
    from . import audiocodec as ac
    from ..shipping import ensure_shipped_by_value
    ensure_shipped_by_value()

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did in pdf[id_col]:
                did = int(did)
                samples = []
                for b in range(5):
                    if (did + b * b) % 3 != 0:
                        amp = 800 * (1 + (did + b) % 3)
                        samples += [amp if (i // 8) % 2 == 0 else -amp
                                    for i in range(400)]
                    else:
                        samples += [0] * 400
                rows.append((did, ac.encode_wav(samples, 8000)))
            yield pd.DataFrame(rows, columns=[id_col, "media"])

    return _spread(docs.select(id_col)).mapInPandas(
        gen, schema=f"{id_col} long, media binary")


def audio_segments(media_df: DataFrame, frame: int = 100,
                   threshold: float = 1.0, id_col: str = "doc_id",
                   media_col: str = "media") -> DataFrame:
    """Voice-activity-style audio segmentation over REAL decode: frame
    the decoded samples, mark frames whose mean |amplitude| exceeds
    ``threshold`` as active, and emit one row per MERGED run of active
    frames — (id, seg_start, seg_end) in frame units, end exclusive.
    The audio-curation primitive behind silence trimming and utterance
    splitting in speech pipelines.

    100 TB shape: one Arrow-batched mapInPandas pass; per clip the
    state is one energy vector, and the output is O(segments) narrow
    rows."""
    import numpy as np

    from . import audiocodec as ac
    from . import flaccodec as fc
    from ..shipping import ensure_shipped_by_value
    ensure_shipped_by_value()

    def segs(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, blob in zip(pdf[id_col], pdf[media_col]):
                blob = bytes(blob)
                if blob[:4] == b"fLaC":
                    _r, _c, samples = fc.decode_flac(blob)
                else:
                    _r, _c, samples = ac.decode_wav(blob)
                x = np.abs(np.asarray(samples, dtype=np.float64))
                n = (len(x) // frame) * frame
                if not n:
                    continue
                e = x[:n].reshape(-1, frame).mean(axis=1)
                active = e > threshold
                start = None
                for i, a in enumerate(active):
                    if a and start is None:
                        start = i
                    elif not a and start is not None:
                        rows.append((int(did), start, i))
                        start = None
                if start is not None:
                    rows.append((int(did), start, len(active)))
            yield pd.DataFrame(rows,
                               columns=[id_col, "seg_start", "seg_end"])

    return media_df.mapInPandas(
        segs, schema=f"{id_col} long, seg_start int, seg_end int")


def synth_mjpeg_media(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic REAL Motion-JPEG corpus: per doc an MJPG AVI with

        nf = 1 + doc_id % 3 frames,  w = 8·(1 + doc_id % 3),
        h = 8·(1 + doc_id % 2)
        block b of frame f (raster order, 8×8):
            p = 128 + 2·(((doc_id·7 + f·11 + b·13) % 64) − 32)
        every pixel of the block is R = G = B = p

    Each frame is a standalone baseline 4:4:4 JPEG inside a '00dc'
    chunk (real DCT/quantize/Huffman per frame); the even-offset
    block-constant rule makes decode bit-exact (S00 a multiple of the
    flat quantizer, gray RGB zeroes chroma), so an SQL oracle
    recomputes every pixel while Spark runs the full container parse
    plus per-frame entropy decode, IDCT and YCbCr→RGB."""
    from . import videocodec as vc
    from ..shipping import ensure_shipped_by_value
    ensure_shipped_by_value()

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did in pdf[id_col]:
                did = int(did)
                w, h = 8 * (1 + did % 3), 8 * (1 + did % 2)
                nf, bw = 1 + did % 3, w // 8
                frames = []
                for f in range(nf):
                    fr = bytearray(w * h * 3)
                    for by in range(h // 8):
                        for bx in range(bw):
                            b = by * bw + bx
                            p = 128 + 2 * (((did * 7 + f * 11
                                             + b * 13) % 64) - 32)
                            for yy in range(8):
                                o = (((by * 8 + yy) * w) + bx * 8) * 3
                                fr[o:o + 24] = bytes([p]) * 24
                    frames.append(bytes(fr))
                rows.append((did, vc.encode_avi_mjpeg(w, h, frames)))
            yield pd.DataFrame(rows, columns=[id_col, "media"])

    return _spread(docs.select(id_col)).mapInPandas(
        gen, schema=f"{id_col} long, media binary")


def synth_g711_media(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic REAL compressed-audio corpus: per doc a G.711
    WAV (mu-law for even doc_ids — format tag 7 — A-law for odd —
    tag 6) whose pre-companding int16 samples follow

        n    = 48 + doc_id % 97
        s[i] = ((doc_id * 7919 + i * i * 31) % 65536) - 32768

    spanning the full int16 range so every companding segment is
    exercised. The codec is lossy but decode(encode(s)) is a
    closed-form step function (CCITT algorithm), so an SQL oracle
    reproduces the decoded samples exactly while Spark runs the real
    RIFF parse + per-byte expansion."""
    from . import audiocodec as ac
    from ..shipping import ensure_shipped_by_value
    ensure_shipped_by_value()

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did in pdf[id_col]:
                did = int(did)
                n = 48 + did % 97
                samples = [((did * 7919 + i * i * 31) % 65536) - 32768
                           for i in range(n)]
                law = "ulaw" if did % 2 == 0 else "alaw"
                rows.append((did,
                             ac.encode_wav_g711(samples, 8000, 1, law)))
            yield pd.DataFrame(rows, columns=[id_col, "media"])

    return _spread(docs.select(id_col)).mapInPandas(
        gen, schema=f"{id_col} long, media binary")
