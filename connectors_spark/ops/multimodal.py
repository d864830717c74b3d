"""Multimodal column plumbing: opaque binary media + typed metadata.

The pattern for image/audio/video at 100 TB: media bytes live in a
`binary` column (or object-store pointers), typed metadata in a sibling
struct; decode / feature-extract runs as Arrow-batched `mapInPandas`
so Python touches data in columnar batches, never row-at-a-time.

The container has no image/audio libraries, so the real decoders are
STUBS raising NotImplementedError behind import-guards; the *Spark-side
plumbing* — schema, batch iteration, partition sizing, UDF signature —
is real and tested. `fake_decode_features` is the deterministic stand-in
the tests and the correctness oracle exercise (features are pure
arithmetic on byte length, reproducible in SQL).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
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


def decode_image(media_df: DataFrame) -> DataFrame:  # pragma: no cover
    """Real image decode → (doc_id, width, height, mode). Requires PIL,
    which this container does not ship; the mapInPandas shape is
    identical to fake_decode_features."""
    try:
        from PIL import Image  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "image decoding requires Pillow; use fake_decode_features for "
            "plumbing tests") from e
    raise NotImplementedError("real decoder not wired in this environment")
