"""Sequence packing: lay documents end-to-end into fixed-size token
windows (context windows), the standard pre-training batch-construction
step ("concat-and-chunk", GPT-2/3 style): the corpus is concatenated in
a deterministic document order and split every `ctx` tokens; each
document is attributed to the window containing its first token.

The reference has no data-plane operators like this (SURVEY.md §0);
§7 extension.

Scale note — the global running sum. A naive
``sum() over (order by id)`` window is a SINGLE partition: the whole
corpus funnels through one task. This module computes the identical
result with the classic two-pass distributed prefix sum:

1. bucket documents by id range (``block = id div block_size``);
2. aggregate per-block token totals (map-side combined, one tiny
   relation of n_docs/block_size rows);
3. exclusive-prefix-sum the block totals with a window over BLOCKS
   (cheap: 100 B docs / 2^20 block ≈ 10^5 rows);
4. broadcast-join block offsets back and window only WITHIN each block.

Token counts are integers, so the two-pass sum is exactly associative —
bit-identical to the single-partition window and to a SQL oracle's
``sum() over (order by doc_id)``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import token_count


def doc_positions(df: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text",
                  block_size: int = 1 << 20) -> DataFrame:
    """(doc_id, n_tok, tok_start): each document's token count and the
    global offset of its first token under concat-in-id-order. Empty
    documents (0 tokens) are kept (they occupy no tokens)."""
    base = df.select(F.col(id_col).alias("doc_id"),
                     token_count(F.col(text_col)).alias("n_tok"),
                     (F.col(id_col) / F.lit(block_size)).cast("long")
                     .alias("_blk"))
    blk_totals = base.groupBy("_blk").agg(F.sum("n_tok").alias("_bt"))
    w_blocks = (Window.orderBy("_blk")
                .rowsBetween(Window.unboundedPreceding, -1))
    blk_offsets = blk_totals.select(
        "_blk", F.coalesce(F.sum("_bt").over(w_blocks), F.lit(0))
        .alias("_boff"))
    w_in = (Window.partitionBy("_blk").orderBy("doc_id")
            .rowsBetween(Window.unboundedPreceding, -1))
    return (base.join(F.broadcast(blk_offsets), "_blk")
            .select("doc_id", "n_tok",
                    (F.col("_boff")
                     + F.coalesce(F.sum("n_tok").over(w_in), F.lit(0)))
                    .alias("tok_start")))


def pack_sequences(df: DataFrame, ctx: int = 256, id_col: str = "doc_id",
                   text_col: str = "text",
                   block_size: int = 1 << 20) -> DataFrame:
    """Per-document packing assignment: (doc_id, n_tok, tok_start,
    seq_id, seq_offset, crosses_boundary) where ``seq_id`` is the
    ``ctx``-token window holding the document's first token,
    ``seq_offset`` the position within it, and ``crosses_boundary``
    whether the document spills into the next window (its tail is
    attributed to subsequent windows by construction)."""
    pos = doc_positions(df, id_col, text_col, block_size)
    return pos.select(
        "doc_id", "n_tok", "tok_start",
        (F.col("tok_start") / F.lit(ctx)).cast("long").alias("seq_id"),
        (F.col("tok_start") % F.lit(ctx)).alias("seq_offset"),
        F.when(F.col("n_tok") > 0,
               ((F.col("tok_start") + F.col("n_tok") - 1) / F.lit(ctx))
               .cast("long") !=
               (F.col("tok_start") / F.lit(ctx)).cast("long"))
        .otherwise(F.lit(False)).alias("crosses_boundary"))


def packing_summary(df: DataFrame, ctx: int = 256, id_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """Per-window summary: (seq_id, n_docs, n_tokens_started,
    n_crossing) — documents starting in the window, their total tokens,
    and how many of them spill past the window boundary."""
    packed = pack_sequences(df, ctx, id_col, text_col)
    return (packed.groupBy("seq_id")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("n_tok").alias("n_tokens_started"),
                 F.sum(F.col("crosses_boundary").cast("long"))
                 .alias("n_crossing")))


def chunk_token_windows(df: DataFrame, window: int = 32, stride: int = 24,
                        id_col: str = "doc_id",
                        text_col: str = "text") -> DataFrame:
    """Per-document sliding token windows (RAG / context-window chunking):
    (doc_id, chunk_idx, chunk_text, n_tokens), chunk i covering tokens
    [i*stride, i*stride + window). The final chunk may be partial; docs
    with fewer than `window` tokens yield exactly one chunk; empty docs
    yield none.

    Pure JVM map-side expression — the token array is bound once as a
    higher-order-function lambda variable and every chunk is a `slice` +
    `concat_ws` over it; `posexplode` fans out to one row per chunk. No
    shuffle anywhere: at 100 TB this runs at scan speed and partitions
    like the input. `stride < window` gives overlapping chunks
    (retrieval-friendly); `stride == window` gives a partition of the
    token stream.
    """
    from ..functions.text import tokens

    if stride <= 0 or window <= 0:
        raise ValueError("window and stride must be positive")

    def build(tk):
        z = F.size(tk)
        n_chunks = (F.when(z > window,
                           F.floor((z - window + stride - 1) / stride) + 1)
                    .otherwise(1))
        return F.transform(
            F.sequence(F.lit(0), n_chunks - 1),
            lambda i: F.struct(
                F.concat_ws(" ", F.slice(tk, i * stride + 1, window))
                .alias("txt"),
                F.least(F.lit(window), z - i * stride).alias("n")))
    chunks = F.element_at(
        F.transform(F.array(tokens(F.col(text_col))), build), 1)
    return (df.filter(F.size(tokens(F.col(text_col))) > 0)
            .select(F.col(id_col).alias("doc_id"),
                    F.posexplode(chunks).alias("chunk_idx", "c"))
            .select("doc_id", F.col("chunk_idx").cast("long"),
                    F.col("c.txt").alias("chunk_text"),
                    F.col("c.n").cast("long").alias("n_tokens")))
