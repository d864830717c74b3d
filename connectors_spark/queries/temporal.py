"""Temporal / sketch query suite: as-of join, binned range join, KMV
distinct sketch, multi-granularity rollup — over the events table.

Every query is double-entry: the Spark plan uses the reusable operators
in ops.temporal (single-shuffle as-of, bounded-fanout range join) and
the oracle re-derives identical semantics in ANSI-ish DuckDB SQL.
Timestamp arithmetic stays on the microsecond integer grid
(unix_micros/epoch_us) so no float rounding can diverge.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..functions.text import hash64
from ..ops import temporal as tp
from .registry import load, register


# --------------------------------------------------------------------------
# As-of join: attribute each view to the user's latest click at-or-before
# --------------------------------------------------------------------------

@register("ev_asof_click_attribution", sql="""
WITH u AS (
  SELECT user_id, ts, event_id,
         CASE WHEN event_type = 'click' THEN 0 ELSE 1 END AS side
  FROM events WHERE event_type IN ('click', 'view')),
m AS (
  SELECT *,
         last_value(CASE WHEN side = 0
                         THEN {'ts': ts, 'event_id': event_id} END
                    IGNORE NULLS)
           OVER (PARTITION BY user_id
                 ORDER BY ts, side, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c
  FROM u)
SELECT event_id AS view_id, user_id,
       c.event_id AS click_id,
       epoch_us(ts) - epoch_us(c.ts) AS gap_us
FROM m WHERE side = 1
""")
def ev_asof(spark, sf_dir):
    # ops.temporal.asof_join: one union + one window shuffle on user_id
    # — the merge-sorted-scan as-of shape; no range explosion, no
    # per-row probe. Gap stays on the integer microsecond grid.
    ev = load(spark, sf_dir, "events")
    views = (ev.filter(F.col("event_type") == "view")
             .select("event_id", "user_id", "ts"))
    clicks = (ev.filter(F.col("event_type") == "click")
              .select("user_id", "ts", "event_id"))
    out = tp.asof_join(views, clicks, on="ts", by=["user_id"],
                       right_cols=["event_id"])
    return out.select(
        F.col("event_id").alias("view_id"), "user_id",
        F.col("asof_event_id").alias("click_id"),
        (F.unix_micros("ts") - F.unix_micros("asof_ts")).alias("gap_us"))


@register("ev_asof_global_locf", sql="""
WITH p AS (
  SELECT ts, max(value) AS pv FROM events
  WHERE event_type = 'purchase' GROUP BY ts),
e AS (SELECT event_id, ts FROM events WHERE event_type = 'error'),
u AS (
  SELECT NULL::BIGINT AS event_id, ts, 0 AS side,
         {'ts': ts, 'pv': pv} AS p
  FROM p
  UNION ALL
  SELECT event_id, ts, 1 AS side, NULL FROM e),
m AS (
  SELECT *, last_value(p IGNORE NULLS)
            OVER (ORDER BY ts NULLS FIRST, side
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c
  FROM u)
SELECT event_id, epoch_us(ts) - epoch_us(c.ts) AS gap_us, c.pv AS pv
FROM m WHERE side = 1
""")
def ev_asof_global(spark, sf_dir):
    # UN-KEYED as-of at scale: every error event attributed to the
    # corpus-wide latest purchase mark (purchases deduped per ts so the
    # match is tie-free). The Spark side runs the bucketed two-pass
    # plan (bucket_seconds) — per-bucket windows + a one-row-per-bucket
    # carry — never a single global window partition; the oracle is the
    # plain global LOCF it must equal.
    ev = load(spark, sf_dir, "events")
    errors = (ev.filter(F.col("event_type") == "error")
              .select("event_id", "ts"))
    purchases = (ev.filter(F.col("event_type") == "purchase")
                 .groupBy("ts").agg(F.max("value").alias("pv")))
    out = tp.asof_join(errors, purchases, on="ts", by=[],
                       right_cols=["pv"], bucket_seconds=86400.0)
    return out.select(
        "event_id",
        (F.unix_micros("ts") - F.unix_micros("asof_ts")).alias("gap_us"),
        F.col("asof_pv").alias("pv"))


# --------------------------------------------------------------------------
# Range join: per error event, activity of the same user in the next 30 min
# --------------------------------------------------------------------------

@register("ev_range_error_context", sql="""
SELECT e.event_id, e.user_id,
       count(*)::BIGINT AS n_following,
       round(sum(o.value), 2) AS sum_value
FROM events e JOIN events o
  ON o.user_id = e.user_id
 AND o.event_id <> e.event_id
 AND epoch_us(o.ts) >= epoch_us(e.ts)
 AND epoch_us(o.ts) <= epoch_us(e.ts) + 1800000000
WHERE e.event_type = 'error'
GROUP BY 1, 2
""")
def ev_range(spark, sf_dir):
    # ops.temporal.range_join_binned: errors explode over the <=2
    # half-hour epoch bins their window covers, equi-join on
    # (user_id, bin) — a hash join Catalyst can shuffle-partition —
    # then the exact microsecond-range filter. Never an inequality-only
    # (nested-loop) join.
    ev = load(spark, sf_dir, "events")
    errors = (ev.filter(F.col("event_type") == "error")
              .select("event_id", "user_id", "ts"))
    other = ev.select("event_id", "user_id", "ts", "value")
    pairs = tp.range_join_binned(
        errors, other, by=["user_id"], on="ts",
        lower_seconds=0.0, upper_seconds=1800.0, bin_seconds=1800.0)
    return (pairs.filter(F.col("r_event_id") != F.col("event_id"))
            .groupBy("event_id", "user_id")
            .agg(F.count(F.lit(1)).alias("n_following"),
                 F.round(F.sum("r_value"), 2).alias("sum_value")))


# --------------------------------------------------------------------------
# KMV (k-minimum-values) distinct sketch — deterministic, oracle-matched
# --------------------------------------------------------------------------

_KMV_K = 32
_2_60 = 1152921504606846976  # 2^60: hash64 range


@register("ev_kmv_distinct", sql=f"""
WITH h AS (
  SELECT DISTINCT event_type,
         ('0x' || substring(md5(user_id::VARCHAR), 1, 15))::BIGINT AS hv
  FROM events),
r AS (
  SELECT event_type, hv,
         row_number() OVER (PARTITION BY event_type ORDER BY hv) AS rn
  FROM h),
g AS (
  SELECT event_type, count(*)::BIGINT AS n_exact,
         max(CASE WHEN rn = {_KMV_K} THEN hv END) AS hk
  FROM r GROUP BY 1)
SELECT event_type, n_exact,
       round(CASE WHEN n_exact < {_KMV_K} THEN n_exact::DOUBLE
                  ELSE {_KMV_K - 1} * {_2_60}.0 / hk END, 2) AS kmv_est
FROM g
""")
def ev_kmv(spark, sf_dir):
    # Deterministic alternative to HLL: the k smallest md5-derived
    # hashes per group estimate distinct count as (k-1)·2^60/h_k.
    # Unlike approx_count_distinct, every engine computes the identical
    # estimate — sketches stay hash-compare-testable. Shuffle is one
    # window on (event_type); at scale the distinct pre-aggregation
    # combines map-side.
    from pyspark.sql import Window
    ev = load(spark, sf_dir, "events")
    h = (ev.select("event_type",
                   hash64(F.col("user_id").cast("string")).alias("hv"))
         .distinct())
    w = Window.partitionBy("event_type").orderBy("hv")
    r = h.withColumn("rn", F.row_number().over(w))
    g = (r.groupBy("event_type")
         .agg(F.count(F.lit(1)).alias("n_exact"),
              F.max(F.when(F.col("rn") == _KMV_K, F.col("hv"))).alias("hk")))
    est = F.when(F.col("n_exact") < _KMV_K,
                 F.col("n_exact").cast("double")) \
           .otherwise(F.lit(float(_KMV_K - 1)) * F.lit(float(_2_60)) /
                      F.col("hk"))
    return g.select("event_type", "n_exact",
                    F.round(est, 2).alias("kmv_est"))


# --------------------------------------------------------------------------
# Hypertable-style rollup: day × event_type with subtotal grades
# --------------------------------------------------------------------------

@register("ev_rollup_day_type", sql="""
SELECT CAST(ts AS DATE) AS day, event_type,
       count(*)::BIGINT AS n_events,
       round(sum(value), 2) AS sum_value
FROM events
GROUP BY ROLLUP (day, event_type)
""")
def ev_rollup(spark, sf_dir):
    # ROLLUP computes (day, type), (day), and grand-total grades in ONE
    # pass with partial aggregation — the continuous-aggregate /
    # hypertable rollup shape; no per-granularity rescans.
    ev = load(spark, sf_dir, "events")
    return (ev.rollup(F.to_date("ts").alias("day"), "event_type")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.round(F.sum("value"), 2).alias("sum_value")))


@register("ev_cube_type_day", sql="""
SELECT CAST(ts AS DATE) AS day, event_type,
       count(*)::BIGINT AS n_events,
       round(sum(value), 2) AS sum_value
FROM events
GROUP BY CUBE (day, event_type)
""")
def ev_cube(spark, sf_dir):
    # CUBE adds the (event_type)-only grade ROLLUP lacks: all four
    # grouping sets — (day, type), (day), (type), () — in one shuffle
    # with map-side partial aggregation (Expand + HashAggregate).
    ev = load(spark, sf_dir, "events")
    return (ev.cube(F.to_date("ts").alias("day"), "event_type")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.round(F.sum("value"), 2).alias("sum_value")))


# --------------------------------------------------------------------------
# Inter-arrival gaps per event type (lag window, integer microseconds)
# --------------------------------------------------------------------------

@register("ev_interarrival_stats", sql="""
WITH g AS (
  SELECT event_type,
         epoch_us(ts) - lag(epoch_us(ts))
           OVER (PARTITION BY event_type ORDER BY ts, event_id) AS gap_us
  FROM events)
SELECT event_type, count(gap_us)::BIGINT AS n_gaps,
       min(gap_us) AS min_gap_us, max(gap_us) AS max_gap_us,
       (sum(gap_us) // count(gap_us))::BIGINT AS mean_gap_us
FROM g GROUP BY 1
""")
def ev_interarrival(spark, sf_dir):
    # One shuffle on event_type serves both the lag window and the
    # aggregation. The mean MUST be exact integer division on both
    # sides: DuckDB's double::BIGINT cast rounds half-even while
    # Spark's cast('long') truncates, so sum/count through doubles is
    # off-by-one whenever the true quotient's fraction crosses .5
    # (caught by the sf0.001 harness sweep in r6 — sf0.01 happened to
    # dodge every .5 boundary for two rounds).
    from pyspark.sql import Window
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    g = ev.select("event_type",
                  (F.unix_micros("ts") -
                   F.lag(F.unix_micros("ts")).over(w)).alias("gap_us"))
    return (g.groupBy("event_type")
            .agg(F.count("gap_us").alias("n_gaps"),
                 F.min("gap_us").alias("min_gap_us"),
                 F.max("gap_us").alias("max_gap_us"),
                 F.sum("gap_us").alias("_sum_gap"))
            .withColumn("mean_gap_us", F.expr("_sum_gap div n_gaps"))
            .drop("_sum_gap"))


# --------------------------------------------------------------------------
# Discrete percentiles of order value per priority (cume_dist rule)
# --------------------------------------------------------------------------

@register("ord_totalprice_percentiles", sql="""
WITH ranked AS (
  SELECT o_orderpriority, o_totalprice,
         cume_dist() OVER (PARTITION BY o_orderpriority
                           ORDER BY o_totalprice) AS cd
  FROM orders)
SELECT o_orderpriority,
       round(min(CASE WHEN cd >= 0.5 THEN o_totalprice END), 2) AS p50,
       round(min(CASE WHEN cd >= 0.95 THEN o_totalprice END), 2) AS p95
FROM ranked GROUP BY 1
""")
def ord_percentiles(spark, sf_dir):
    # Discrete percentiles via the SQL-standard rule (smallest value
    # whose cume_dist >= p) spelled out as a window + conditional min —
    # engine-neutral, always an actual data value (2-decimal prices), so
    # rounding can never tie. percentile_disc would hide the rule behind
    # implementation-defined rank arithmetic.
    from pyspark.sql import Window
    od = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice")
    ranked = od.select("o_orderpriority", "o_totalprice",
                       F.cume_dist().over(w).alias("cd"))
    return (ranked.groupBy("o_orderpriority")
            .agg(F.round(F.min(F.when(F.col("cd") >= 0.5,
                                      F.col("o_totalprice"))), 2)
                 .alias("p50"),
                 F.round(F.min(F.when(F.col("cd") >= 0.95,
                                      F.col("o_totalprice"))), 2)
                 .alias("p95")))


# --------------------------------------------------------------------------
# Conversion funnel: view -> click -> purchase in strict time order
# --------------------------------------------------------------------------

@register("ev_funnel_view_click_purchase", sql="""
WITH s1 AS (
  SELECT user_id, min(CASE WHEN event_type = 'view' THEN ts END) AS t1
  FROM events GROUP BY 1),
s2 AS (
  SELECT e.user_id, min(e.ts) AS t2
  FROM events e JOIN s1 USING (user_id)
  WHERE e.event_type = 'click' AND e.ts > s1.t1
  GROUP BY 1),
s3 AS (
  SELECT e.user_id, min(e.ts) AS t3
  FROM events e JOIN s2 USING (user_id)
  WHERE e.event_type = 'purchase' AND e.ts > s2.t2
  GROUP BY 1)
SELECT count(s1.user_id)::BIGINT AS n_view,
       count(s2.user_id)::BIGINT AS n_view_click,
       count(s3.user_id)::BIGINT AS n_full_funnel,
       floor(sum(CASE WHEN s3.user_id IS NOT NULL
                      THEN epoch_us(t3) - epoch_us(t1) END)::DOUBLE
             / count(s3.user_id))::BIGINT AS mean_convert_us
FROM s1 LEFT JOIN s2 USING (user_id) LEFT JOIN s3 USING (user_id)
WHERE s1.t1 IS NOT NULL
""")
def ev_funnel(spark, sf_dir):
    # Each stage is one aggregation over the fact joined with the
    # (tiny, broadcast) previous-stage anchors — strict event ordering
    # without a per-user sort, conversion time on the integer
    # microsecond grid.
    ev = load(spark, sf_dir, "events")
    s1 = (ev.groupBy("user_id")
          .agg(F.min(F.when(F.col("event_type") == "view",
                            F.col("ts"))).alias("t1"))
          .filter(F.col("t1").isNotNull()))
    s2 = (ev.filter(F.col("event_type") == "click")
          .join(F.broadcast(s1), "user_id")
          .filter(F.col("ts") > F.col("t1"))
          .groupBy("user_id").agg(F.min("ts").alias("t2")))
    s3 = (ev.filter(F.col("event_type") == "purchase")
          .join(F.broadcast(s2), "user_id")
          .filter(F.col("ts") > F.col("t2"))
          .groupBy("user_id").agg(F.min("ts").alias("t3")))
    j = (s1.join(s2, "user_id", "left").join(s3, "user_id", "left"))
    conv = F.when(F.col("t3").isNotNull(),
                  F.unix_micros("t3") - F.unix_micros("t1"))
    return j.agg(
        F.count("user_id").alias("n_view"),
        F.count("t2").alias("n_view_click"),
        F.count("t3").alias("n_full_funnel"),
        F.floor(F.sum(conv) / F.count("t3")).cast("long")
        .alias("mean_convert_us"))


# --------------------------------------------------------------------------
# Gap-fill + LOCF daily series (ops/temporal.py gap_fill_locf)
# --------------------------------------------------------------------------

@register("ev_gapfill_daily_locf", sql="""
WITH obs AS (
  SELECT user_id AS key, date_trunc('day', ts)::DATE AS day,
         round(avg(value), 6) AS v
  FROM events GROUP BY 1, 2),
span AS (SELECT key, min(day) AS lo, max(day) AS hi FROM obs GROUP BY 1),
grid AS (
  SELECT key, unnest(generate_series(lo, hi, INTERVAL 1 DAY))::DATE AS day
  FROM span)
SELECT g.key, g.day,
       last_value(o.v IGNORE NULLS) OVER (
           PARTITION BY g.key ORDER BY g.day
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value,
       o.v IS NULL AS filled
FROM grid g LEFT JOIN obs o ON o.key = g.key AND o.day = g.day
""")
def ev_gapfill(spark, sf_dir):
    # Dense per-user daily mean-value series over each user's own
    # observed span; missing days carry the last observed day's value
    # (time_bucket_gapfill + locf). Two keyed shuffles, no global window.
    return tp.gap_fill_locf(load(spark, sf_dir, "events"),
                            key_col="user_id", ts_col="ts",
                            val_col="value")


# --------------------------------------------------------------------------
# Unigram-LM quality scores (ops/quality.py unigram_nll_scores)
# --------------------------------------------------------------------------

@register("doc_unigram_nll", sql="""
WITH toks AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS t
  FROM documents),
tok AS (SELECT doc_id, unnest(t) AS w FROM toks),
v AS (SELECT w, count(*) AS c FROM tok GROUP BY 1),
tot AS (SELECT sum(c)::DOUBLE AS s FROM v),
lp AS (SELECT w, -ln(c / s) AS nll FROM v, tot)
SELECT tok.doc_id, count(*)::BIGINT AS n_tok,
       round(avg(lp.nll), 6) AS nll
FROM tok JOIN lp USING (w)
GROUP BY 1
""")
def doc_unigram_nll(spark, sf_dir):
    # CCNet-style quality signal under the corpus's own unigram LM:
    # mean -ln p(token) per doc. Vocab relation broadcast; corpus
    # tokenized once.
    from ..ops.quality import unigram_nll_scores
    return unigram_nll_scores(load(spark, sf_dir, "documents"))


@register("ev_gapfill_daily_interp", sql="""
WITH obs AS (
  SELECT user_id AS key, date_trunc('day', ts)::DATE AS day,
         floor(round(avg(value), 6) * 1e6 + 0.5)::BIGINT AS vu
  FROM events GROUP BY 1, 2),
span AS (SELECT key, min(day) AS lo, max(day) AS hi FROM obs GROUP BY 1),
grid AS (
  SELECT key, unnest(generate_series(lo, hi, INTERVAL 1 DAY))::DATE AS day
  FROM span),
j AS (
  SELECT g.key, g.day, o.vu,
         last_value(o.vu IGNORE NULLS) OVER w_prev AS pv,
         first_value(o.vu IGNORE NULLS) OVER w_next AS nv,
         last_value(CASE WHEN o.vu IS NOT NULL THEN g.day END IGNORE NULLS)
             OVER w_prev AS pd,
         first_value(CASE WHEN o.vu IS NOT NULL THEN g.day END IGNORE NULLS)
             OVER w_next AS nd
  FROM grid g LEFT JOIN obs o ON o.key = g.key AND o.day = g.day
  WINDOW
    w_prev AS (PARTITION BY g.key ORDER BY g.day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
    w_next AS (PARTITION BY g.key ORDER BY g.day
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
SELECT key, day,
       coalesce(vu, pv + floor((nv - pv) * date_diff('day', pd, day)
                               / date_diff('day', pd, nd)))::DOUBLE
           / 1e6 AS value,
       vu IS NULL AS filled
FROM j
""")
def ev_gapfill_interp(spark, sf_dir):
    # Linear interpolation across interior gaps (time_bucket_gapfill +
    # interpolate); same two-shuffle shape as LOCF, neighbors from two
    # IGNORE-NULLS windows, never a self-join.
    return tp.gap_fill_interpolate(load(spark, sf_dir, "events"),
                                   key_col="user_id", ts_col="ts",
                                   val_col="value")


@register("ev_ohlc_daily", sql="""
WITH b AS (
  SELECT user_id AS key, date_trunc('day', ts)::DATE AS day, ts, value
  FROM events),
w AS (
  SELECT *,
         row_number() OVER (PARTITION BY key, day
                            ORDER BY ts, value) AS rn_a,
         row_number() OVER (PARTITION BY key, day
                            ORDER BY ts DESC, value DESC) AS rn_z
  FROM b)
SELECT key, day,
       max(CASE WHEN rn_a = 1 THEN value END) AS open,
       max(value) AS high,
       min(value) AS low,
       max(CASE WHEN rn_z = 1 THEN value END) AS close,
       count(*) AS n
FROM w GROUP BY 1, 2
""")
def ev_ohlc(spark, sf_dir):
    # Single hash aggregate with map-side combine: min_by/max_by on a
    # (ts, value) struct key give deterministic open/close without the
    # oracle's two window sorts.
    return tp.ohlc(load(spark, sf_dir, "events"),
                   key_col="user_id", ts_col="ts", val_col="value")


@register("ev_time_weighted_avg", sql="""
WITH d AS (
  SELECT user_id AS key, value AS v,
         lead(epoch_us(ts)) OVER (PARTITION BY user_id
                                  ORDER BY ts, value)
             - epoch_us(ts) AS dur_us
  FROM events)
SELECT key, round(sum(v * dur_us) / sum(dur_us), 6) AS twa,
       sum(dur_us)::BIGINT AS span_us, count(*) AS n
FROM d GROUP BY 1
""")
def ev_twa(spark, sf_dir):
    # LOCF time-weighted mean: lead-window durations on the integer
    # microsecond grid, then one keyed aggregate that reuses the
    # window's partitioning (no second exchange). The exposed double is
    # rounded to 6 decimals in BOTH implementations per the registry
    # determinism contract — sum(v*dur) is order-sensitive in the last
    # ulp, and a full-precision hash compare must not see that
    # (CORRECTNESS_r04's only unrounded computed double).
    out = tp.time_weighted_avg(load(spark, sf_dir, "events"),
                               key_col="user_id", ts_col="ts",
                               val_col="value")
    return out.withColumn("twa", F.round("twa", 6))


@register("ev_retention_cohorts", sql="""
WITH firsts AS (
  SELECT user_id, min(CAST(ts AS DATE)) AS first_day
  FROM events GROUP BY 1),
act AS (
  SELECT DISTINCT e.user_id, f.first_day,
         (CAST(e.ts AS DATE) - f.first_day) // 7 AS week_k
  FROM events e JOIN firsts f USING (user_id))
SELECT first_day AS cohort_day, week_k::BIGINT AS week_k,
       count(DISTINCT user_id)::BIGINT AS n_users
FROM act GROUP BY 1, 2
""")
def ev_retention_cohorts(spark, sf_dir):
    # Classic cohort retention: cohort = a user's first active day,
    # week_k = whole weeks since it; n_users = distinct cohort members
    # active in that week. Two aggregates: a per-user min (map-side
    # combined) joined back onto the events, then the distinct
    # count per (cohort, week) — no window over the event stream, so
    # a power user's million events never funnel through one task.
    # The firsts relation is O(distinct users) — corpus-scale, not a
    # bounded dimension — so no broadcast hint: AQE's size-based
    # choice broadcasts it when small and shuffle-joins at scale.
    ev = load(spark, sf_dir, "events")
    firsts = (ev.groupBy("user_id")
              .agg(F.min(F.to_date("ts")).alias("first_day")))
    act = (ev.join(firsts, "user_id")
           .select("user_id", "first_day",
                   F.floor(F.datediff(F.to_date("ts"),
                                      F.col("first_day")) / 7)
                   .alias("week_k"))
           .distinct())
    return (act.groupBy(F.col("first_day").alias("cohort_day"), "week_k")
            .agg(F.countDistinct("user_id").alias("n_users")))
