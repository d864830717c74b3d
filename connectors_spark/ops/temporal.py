"""Temporal join operators: as-of join and binned range join.

Spark has no built-in as-of join (pandas `merge_asof` semantics) and a
naive range join is a cross product, so both are provided here as
compositions of existing DataFrame ops — no Python UDFs, one shuffle
each, scale-safe shapes:

- **as-of join** — union the two inputs tagged by side and run ONE
  window over (by-key, time) carrying the last-seen right-side payload
  forward. Cost: a single shuffle on the by-key + an in-partition sort;
  never a range explosion, no per-row probing. This is the standard
  big-data as-of shape (a merge-sorted scan per key group).
- **binned range join** — join ranges [ts+lo, ts+hi] by exploding the
  left side over the fixed-width time bins its range covers, equi-join
  on (key, bin), then exact range filter. Fanout is bounded by
  ceil((hi-lo)/bin) + 1 per row, so shuffle volume stays linear — the
  equi-join gives Catalyst a hash join instead of a broadcast
  nested-loop over an inequality.

Reference parity: none (delta-io/connectors has no data-plane joins) —
SURVEY.md §7 extensions. Semantics follow pandas merge_asof and the
range-join literature (e.g. interval/bin joins in Flink/Trino).
"""

from __future__ import annotations

from typing import List, Optional

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _epoch_sec(col: Column, dtype) -> Column:
    """Epoch-seconds double for numeric or any timestamp/date flavor
    (TIMESTAMP_NTZ/date don't cast to double directly; routing through
    timestamp is monotonic, which is all bucketing/tolerance need)."""
    from pyspark.sql import types as T
    if isinstance(dtype, (T.TimestampType, T.TimestampNTZType, T.DateType)):
        return col.cast("timestamp").cast("double")
    return col.cast("double")


def asof_join(left: DataFrame, right: DataFrame, on: str = "ts",
              by: Optional[List[str]] = None,
              right_cols: Optional[List[str]] = None,
              strict: bool = False,
              tolerance_seconds: Optional[float] = None,
              prefix: str = "asof_",
              bucket_seconds: Optional[float] = None) -> DataFrame:
    """For each left row, attach the latest right row with
    ``right.on <= left.on`` (``<`` when ``strict``) within the same
    ``by`` group, or nulls when none exists.

    Deterministic: right-side ties on `on` resolve to a fixed payload
    struct (stable given a unique column in `right_cols`).
    `tolerance_seconds` nulls out matches older than the window.

    **Un-keyed scale path**: with ``by=[]`` the single window is ONE
    partition — the whole stream through one task. Pass
    ``bucket_seconds`` to switch to the two-pass bucketed plan: rows
    bucket by ``floor(epoch/on bucket)``; each bucket's last payload is
    selected (a by-bucket window, evenly spread), the per-bucket lasts
    get an exclusive running LOCF over BUCKETS (a window over one tiny
    row per bucket, same shape as the sequence-packing block-offset
    pass), and the carry-in joins back (broadcast) to seed per-bucket
    windows. Buckets partition the time axis monotonically and equal
    timestamps share a bucket, so the result is exactly the global
    window's. Pick ``bucket_seconds`` so the bucket count stays ≪ rows
    (e.g. a day over years of data).
    """
    by = by or []
    right_cols = right_cols or [c for c in right.columns
                                if c != on and c not in by]
    # Tag so that at equal timestamps the right row sorts before the left
    # row for <= semantics, after it for strict < semantics.
    right_tag, left_tag = (0, 1) if not strict else (1, 0)
    payload = F.struct(F.col(on).alias("_asof_ts"),
                       *[F.col(c) for c in right_cols])
    r = (right.select(*by, F.col(on).alias("_t"),
                      payload.alias("_p"))
         .withColumn("_side", F.lit(right_tag)))
    l = (left.withColumn("_t", F.col(on))
         .withColumn("_p", F.lit(None).cast(r.schema["_p"].dataType))
         .withColumn("_side", F.lit(left_tag)))
    unioned = l.select(*left.columns, "_t", "_p", "_side").unionByName(
        r.select(*[F.lit(None).cast(left.schema[c].dataType).alias(c)
                   for c in left.columns if c not in by and c != on],
                 *by, F.col("_t").alias(on), "_t", "_p", "_side"),
        allowMissingColumns=False)
    if not by and bucket_seconds is not None:
        matched = _asof_bucketed(unioned, left_tag, bucket_seconds)
    else:
        w = (Window.partitionBy(*by) if by else Window.partitionBy(F.lit(1)))
        w = (w.orderBy("_t", "_side", F.desc("_p"))
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
        matched = (unioned
                   .withColumn("_m", F.last("_p", ignorenulls=True).over(w))
                   .filter(F.col("_side") == left_tag))
    if tolerance_seconds is not None:
        tdt = unioned.schema["_t"].dataType
        in_tol = (_epoch_sec(F.col("_t"), tdt) -
                  _epoch_sec(F.col("_m._asof_ts"), tdt)) <= tolerance_seconds
        matched = matched.withColumn(
            "_m", F.when(in_tol, F.col("_m")))
    out_cols = [F.col(c) for c in left.columns]
    out_cols.append(F.col("_m._asof_ts").alias(f"{prefix}{on}"))
    out_cols += [F.col(f"_m.{c}").alias(f"{prefix}{c}") for c in right_cols]
    return matched.select(*out_cols)


def _asof_bucketed(unioned: DataFrame, left_tag: int,
                   bucket_seconds: float) -> DataFrame:
    """Two-pass un-keyed as-of: identical result to the global window
    (``last(_p, ignorenulls)`` over (_t, _side, _p desc) order) without
    ever funneling the stream through one task. Equality argument: the
    global last-payload at any row is the last payload WITHIN the row's
    bucket if one precedes it there, else the last payload of any
    earlier bucket — buckets partition the time axis monotonically, and
    equal timestamps (the only ordering subtlety) always share a
    bucket, so within-bucket order IS global order restricted to the
    bucket. Same shape as sequence packing's two-pass prefix sum: the
    only single-partition window runs over ONE row per distinct bucket.
    """
    sec = _epoch_sec(F.col("_t"), unioned.schema["_t"].dataType)
    # NULL timestamps: the global window orders them FIRST (asc nulls
    # first), so they belong in a sentinel bucket below every real one
    # — a NULL bucket key would silently drop the rows at the carry
    # join instead of emitting them with a null match.
    b = unioned.withColumn(
        "_bk", F.coalesce(
            F.floor(sec / F.lit(float(bucket_seconds))).cast("long"),
            F.lit(-(1 << 62)).cast("long")))
    # Pass 1a: each bucket's LAST payload under the global sort order —
    # payload rows all share one _side, so last = max _t, then min _p
    # (the order is (_t asc, _p desc): the final row of an equal-_t run
    # is the smallest payload). A by-bucket window — evenly spread.
    wlast = (Window.partitionBy("_bk")
             .orderBy(F.desc("_t"), F.asc("_p")))
    lasts = (b.filter(F.col("_p").isNotNull())
             .withColumn("_rn", F.row_number().over(wlast))
             .filter(F.col("_rn") == 1)
             .select("_bk", F.col("_p").alias("_bp")))
    # Pass 1b: densify to every bucket that has ANY row, then exclusive
    # running LOCF over buckets — one tiny row per bucket, so the
    # single-partition window is harmless by construction.
    wb = (Window.orderBy("_bk")
          .rowsBetween(Window.unboundedPreceding, -1))
    carry = (b.select("_bk").distinct()
             .join(lasts, "_bk", "left")
             .select("_bk",
                     F.last("_bp", ignorenulls=True).over(wb)
                     .alias("_cin")))
    # Pass 2: within-bucket running last, seeded by the carry-in.
    wloc = (Window.partitionBy("_bk")
            .orderBy("_t", "_side", F.desc("_p"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (b.join(F.broadcast(carry), "_bk")
            .withColumn("_m", F.coalesce(
                F.last("_p", ignorenulls=True).over(wloc),
                F.col("_cin")))
            .filter(F.col("_side") == left_tag)
            .drop("_bk", "_cin"))


def range_join_binned(left: DataFrame, right: DataFrame,
                      by: List[str], on: str = "ts",
                      lower_seconds: float = 0.0,
                      upper_seconds: float = 3600.0,
                      bin_seconds: float = 3600.0,
                      right_alias: str = "r") -> DataFrame:
    """All (left, right) pairs in the same ``by`` group with
    ``left.on + lower <= right.on <= left.on + upper``.

    Left rows are exploded over every `bin_seconds`-wide epoch bin their
    range covers (bounded fanout), the join is a plain equi-join on
    (by, bin), and the exact inequality filters the candidates. Right
    columns come back prefixed with `right_alias`. The pair stream is
    linear in input size for fixed range/bin ratio — pick `bin_seconds`
    ≈ the range width so fanout ≈ 2.
    """
    n_bins = int((upper_seconds - lower_seconds) // bin_seconds) + 2
    lsec = F.col(on).cast("double")
    lo_bin = F.floor((lsec + lower_seconds) / bin_seconds).cast("long")
    l = (left.withColumn("_b0", lo_bin)
         .withColumn("_bin", F.explode_outer(F.sequence(
             F.col("_b0"), F.col("_b0") + F.lit(n_bins - 1))))
         .where(F.col("_bin").isNotNull())
         .drop("_b0"))
    # Keep only bins the range actually covers (sequence over-covers by
    # at most one trailing bin).
    l = l.filter(F.col("_bin") * bin_seconds <= lsec + upper_seconds)
    rsec = F.col(on).cast("double")
    r = right.select(
        *[F.col(c).alias(c) for c in by],
        F.floor(rsec / bin_seconds).cast("long").alias("_bin"),
        *[F.col(c).alias(f"{right_alias}_{c}") for c in right.columns
          if c not in by])
    rts = F.col(f"{right_alias}_{on}").cast("double")
    return (l.join(r, [*by, "_bin"])
            .filter((rts >= lsec + lower_seconds) &
                    (rts <= lsec + upper_seconds))
            .drop("_bin"))


def gap_fill_locf(df: DataFrame, key_col: str, ts_col: str, val_col: str,
                  agg: str = "avg") -> DataFrame:
    """Regularize an event series to a dense per-key DAILY grid with
    last-observation-carried-forward fill — the hypertable
    `time_bucket_gapfill` + `locf` shape (TimescaleDB) used to turn
    irregular events into model-ready time series.

    Per key: buckets span the key's own [min, max] observed day;
    missing days take the most recent observed day's aggregate;
    ``filled`` marks interpolated rows. Bucket aggregates are rounded
    to 6 before the carry so the fill is bit-stable across engines.

    Scale shape: one shuffle keyed (key, day) for the bucket aggregate,
    one shuffle keyed key for span + LOCF window. The dense grid is
    built by exploding per-key `sequence(min_day, max_day)` — fanout =
    days-per-key, generated on executors, never on the driver. Keys are
    independent: no global window, no cross-key exchange.
    """
    day = F.date_trunc("day", F.col(ts_col)).cast("date")
    agg_fn = {"avg": F.avg, "sum": F.sum, "min": F.min,
              "max": F.max}[agg]
    obs = (df.select(F.col(key_col).alias("key"), day.alias("day"),
                     F.col(val_col).alias("v"))
           .groupBy("key", "day")
           .agg(F.round(agg_fn("v"), 6).alias("v")))
    span = (obs.groupBy("key")
            .agg(F.min("day").alias("_lo"), F.max("day").alias("_hi")))
    grid = (span.select(
        "key", F.explode_outer(F.sequence(
            "_lo", "_hi",
            F.expr("interval 1 day"))).alias("day"))
        .where(F.col("day").isNotNull()))
    w = (Window.partitionBy("key").orderBy("day")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (grid.join(obs, ["key", "day"], "left")
            .select("key", "day",
                    F.last("v", ignorenulls=True).over(w).alias("value"),
                    F.col("v").isNull().alias("filled")))


def gap_fill_interpolate(df: DataFrame, key_col: str, ts_col: str,
                         val_col: str, agg: str = "avg") -> DataFrame:
    """Dense per-key daily grid with LINEAR interpolation across gaps —
    the `interpolate()` companion to :func:`gap_fill_locf`
    (time_bucket_gapfill + interpolate): a missing day between two
    observed days takes the value on the straight line between them.

    Per missing day: v = prev + (next - prev) * elapsed/span. The
    interpolation runs on an exact integer micro-unit grid (bucket
    aggregates quantized to 1e-6, the lerp floored after one double
    multiply/divide well inside 2^53) so the result is bit-identical
    across engines and partitionings — a plain `round(lerp, 6)` can
    land on a half-way boundary and disagree in the last digit.
    Interior gaps only by construction (the grid spans each key's own
    [min, max] observed day, so every missing day has both neighbors).

    Scale shape: identical to LOCF — two keyed shuffles; the previous/
    next observation pairs come from two IGNORE-NULLS windows over the
    same (key, day) partitioning, no self-join.
    """
    day = F.date_trunc("day", F.col(ts_col)).cast("date")
    agg_fn = {"avg": F.avg, "sum": F.sum, "min": F.min,
              "max": F.max}[agg]
    obs = (df.select(F.col(key_col).alias("key"), day.alias("day"),
                     F.col(val_col).alias("v"))
           .groupBy("key", "day")
           .agg(F.round(agg_fn("v"), 6).alias("v")))
    span = (obs.groupBy("key")
            .agg(F.min("day").alias("_lo"), F.max("day").alias("_hi")))
    grid = (span.select(
        "key", F.explode_outer(F.sequence(
            "_lo", "_hi", F.expr("interval 1 day"))).alias("day"))
        .where(F.col("day").isNotNull()))
    joined = grid.join(obs, ["key", "day"], "left")
    w_prev = (Window.partitionBy("key").orderBy("day")
              .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    w_next = (Window.partitionBy("key").orderBy("day")
              .rowsBetween(Window.currentRow, Window.unboundedFollowing))
    vu = F.floor(F.col("v") * F.lit(1e6) + F.lit(0.5)).cast("long")
    joined = joined.withColumn("_vu", vu)
    prev_v = F.last("_vu", ignorenulls=True).over(w_prev)
    next_v = F.first("_vu", ignorenulls=True).over(w_next)
    obs_day = F.when(F.col("v").isNotNull(), F.col("day"))
    prev_d = F.last(obs_day, ignorenulls=True).over(w_prev)
    next_d = F.first(obs_day, ignorenulls=True).over(w_next)
    elapsed = F.datediff(F.col("day"), prev_d)
    span_d = F.datediff(next_d, prev_d)
    interp_u = prev_v + F.floor((next_v - prev_v) * elapsed / span_d)
    micro = F.coalesce(F.col("_vu"), interp_u).cast("double")
    return joined.select(
        "key", "day",
        (micro / F.lit(1e6)).alias("value"),
        F.col("v").isNull().alias("filled"))


def ohlc(df: DataFrame, key_col: str, ts_col: str,
         val_col: str) -> DataFrame:
    """Per-key daily OHLC (open/high/low/close) candlestick aggregate —
    the financial `candlestick_agg` / `first-last` bucket shape over an
    irregular event series.

    open/close are the values at the first/last timestamp in the
    bucket; ties on the timestamp resolve by value (smallest wins the
    open, largest wins the close) so the result is deterministic under
    any partitioning. Implemented with `min_by`/`max_by` over a
    `(ts, value)` struct key — struct ordering is lexicographic, so
    the tie-break costs nothing extra.

    Scale shape: a single hash aggregate keyed (key, day) with map-side
    partial aggregation; no window, no sort, no second shuffle.
    """
    day = F.date_trunc("day", F.col(ts_col)).cast("date")
    k = F.struct(F.col(ts_col), F.col(val_col))
    return (df.groupBy(F.col(key_col).alias("key"), day.alias("day"))
            .agg(F.min_by(F.col(val_col), k).alias("open"),
                 F.max(val_col).alias("high"),
                 F.min(val_col).alias("low"),
                 F.max_by(F.col(val_col), k).alias("close"),
                 F.count("*").alias("n")))


def time_weighted_avg(df: DataFrame, key_col: str, ts_col: str,
                      val_col: str) -> DataFrame:
    """Per-key time-weighted average over an irregular series — the
    TimescaleDB `time_weight('LOCF', ...)`/`average()` shape: each
    observation holds until the next one, so its weight is the gap (in
    microseconds) to the successor; the final observation of a key
    carries no weight. Keys with a single observation yield NULL.

    Weights stay on the integer microsecond grid; the only floating
    math is the value*weight product and the final division, so engines
    agree to double precision. Ties on the timestamp order by value so
    the weighted pairing is deterministic.

    Scale shape: one shuffle keyed by `key` shared by the lead window
    and the final aggregate (the groupBy reuses the window's hash
    partitioning — Catalyst elides the second exchange); per-key state
    is O(1).
    """
    w = Window.partitionBy(key_col).orderBy(ts_col, val_col)
    t = F.unix_micros(F.col(ts_col))
    dur = (F.lead(t).over(w) - t).alias("_dur_us")
    obs = df.select(F.col(key_col).alias("key"),
                    F.col(val_col).alias("v"), dur)
    return (obs.groupBy("key")
            .agg((F.sum(F.col("v") * F.col("_dur_us")) /
                  F.sum("_dur_us")).alias("twa"),
                 F.sum("_dur_us").alias("span_us"),
                 F.count("*").alias("n")))


def throttle_first_per_window(df: DataFrame, key_cols, ts_col: str,
                              interval_sec: int,
                              tie_col: str = "event_id") -> DataFrame:
    """Event throttling / windowed dedup: keep the FIRST event per key
    per fixed ``interval_sec`` window (min timestamp, ``tie_col``
    breaking exact-timestamp ties) — the standard dedup-bounce /
    rate-limit shape for clickstreams and telemetry before sessionizing
    or feature extraction.

    Scale shape: ONE map-side-combinable aggregation (min_by of the
    full row keyed by (keys, window bucket)) — no window function, so
    no per-key single-task funnel and partial aggregation shrinks the
    shuffle to one row per (key, bucket). Deterministic: the winner is
    a pure function of the data."""
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    ts = F.col(ts_col)
    bucket = F.floor(ts.cast("double") / F.lit(float(interval_sec)))
    cols = df.columns
    picked = (df.withColumn("_w", bucket)
              .groupBy(*keys, "_w")
              .agg(F.min_by(F.struct(*cols),
                            F.struct(F.col(ts_col), F.col(tie_col)))
                   .alias("_row")))
    return picked.select(*[F.col(f"_row.{c}").alias(c) for c in cols])
