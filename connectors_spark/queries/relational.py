"""Relational analytics suite: TPC-H-adapted queries over the testdata
star schema plus event-stream queries (sessionization, rollups).

Spark-first plan notes per query are inline — the goal at 100 TB:
- dimension joins BROADCAST (region/nation/supplier — and customer when
  it fits; at real TPC-H scale customer shuffles, AQE decides),
- aggregations rely on partial (map-side) aggregation,
- filters sit directly on the scan so Catalyst pushes them into Parquet
  (verified via .explain: PushedFilters), and only needed columns are
  selected before joins (ReadSchema pruning).
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import Window

from .registry import load, register


# --------------------------------------------------------------------------
# Q1 pricing summary report (TPC-H Q1 adapted)
# --------------------------------------------------------------------------

@register("q1_pricing_summary", sql="""
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2)                                   AS sum_qty,
       round(sum(l_extendedprice), 2)                              AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2)           AS sum_disc_price,
       round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
       round(avg(l_quantity), 4)                                   AS avg_qty,
       round(avg(l_extendedprice), 4)                              AS avg_price,
       round(avg(l_discount), 6)                                   AS avg_disc,
       count(*)                                                    AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-01'
GROUP BY l_returnflag, l_linestatus
""", bench=True)
def q1(spark, sf_dir):
    # Single scan → partial agg → 6-group final agg. Filter + 7-column
    # projection push into the Parquet reader; no join, no skew.
    li = load(spark, sf_dir, "lineitem")
    return (li.filter(F.col("l_shipdate") <= F.lit("1998-09-01").cast("timestamp"))
            .groupBy("l_returnflag", "l_linestatus")
            .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
                 F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
                 F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
                 .alias("sum_disc_price"),
                 F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))
                               * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
                 F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
                 F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
                 F.round(F.avg("l_discount"), 6).alias("avg_disc"),
                 F.count(F.lit(1)).alias("count_order")))


# --------------------------------------------------------------------------
# Q3 shipping priority (TPC-H Q3 adapted)
# --------------------------------------------------------------------------

@register("q3_shipping_priority", sql="""
SELECT o_orderkey, o_orderdate, o_orderpriority,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM customer JOIN orders ON c_custkey = o_custkey
              JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-01-01'
  AND l_shipdate  > TIMESTAMP '1998-01-01'
GROUP BY o_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderkey
LIMIT 10
""", bench=True)
def q3(spark, sf_dir):
    # customer is the selective dimension (1/5 segment) → broadcast it
    # into orders, then join the big fact last so the only shuffle is the
    # orders⋈lineitem equi-join (co-partitioned on orderkey by AQE).
    cu = load(spark, sf_dir, "customer") \
        .filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    od = load(spark, sf_dir, "orders") \
        .filter(F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")) \
        .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    li = load(spark, sf_dir, "lineitem") \
        .filter(F.col("l_shipdate") > F.lit("1998-01-01").cast("timestamp")) \
        .select("l_orderkey", "l_extendedprice", "l_discount")
    return (od.join(F.broadcast(cu), od.o_custkey == cu.c_custkey)
            .join(li, od.o_orderkey == li.l_orderkey)
            .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
            .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
                 .alias("revenue"))
            .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
            .limit(10))


# --------------------------------------------------------------------------
# Q5 local supplier volume (TPC-H Q5 adapted)
# --------------------------------------------------------------------------

@register("q5_local_supplier_volume", sql="""
SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM customer JOIN orders   ON c_custkey = o_custkey
              JOIN lineitem ON l_orderkey = o_orderkey
              JOIN supplier ON l_suppkey = s_suppkey
              JOIN nation   ON c_nationkey = n_nationkey
              JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND s_nationkey = c_nationkey
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1998-01-01'
GROUP BY n_name
ORDER BY revenue DESC, n_name
""", bench=True)
def q5(spark, sf_dir):
    # region/nation/supplier/customer are all dimensions → broadcast
    # chain; the fact tables join on orderkey. The "local" constraint
    # (supplier nation == customer nation) is a post-join filter.
    re = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    na = load(spark, sf_dir, "nation")
    cu = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    su = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    od = load(spark, sf_dir, "orders") \
        .filter((F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp")) &
                (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))) \
        .select("o_orderkey", "o_custkey")
    li = load(spark, sf_dir, "lineitem") \
        .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
    dim = (na.join(F.broadcast(re), na.n_regionkey == re.r_regionkey)
           .select("n_nationkey", "n_name"))
    # Restrict BOTH entity dimensions to ASIA nations before the fact
    # shuffle (broadcast semi-join against the ~5-nation dim): the
    # orders⋈customer and lineitem⋈supplier inputs shrink ~5x before
    # any wide join runs — the single biggest lever in this plan.
    cu = cu.join(F.broadcast(dim.select("n_nationkey")),
                 cu.c_nationkey == F.col("n_nationkey"), "left_semi")
    su = su.join(F.broadcast(dim.select("n_nationkey")),
                 su.s_nationkey == F.col("n_nationkey"), "left_semi")
    return (od.join(li, od.o_orderkey == li.l_orderkey)
            .join(cu, od.o_custkey == cu.c_custkey)
            .join(F.broadcast(su), li.l_suppkey == su.s_suppkey)
            .filter(F.col("s_nationkey") == F.col("c_nationkey"))
            .join(F.broadcast(dim), F.col("c_nationkey") == F.col("n_nationkey"))
            .groupBy("n_name")
            .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
                 .alias("revenue"))
            .orderBy(F.desc("revenue"), F.asc("n_name")))


# --------------------------------------------------------------------------
# Q6 forecast revenue change (TPC-H Q6 adapted)
# --------------------------------------------------------------------------

@register("q6_forecast_revenue", sql="""
SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
""", bench=True)
def q6(spark, sf_dir):
    # Pure scan-filter-agg: all four predicates push into Parquet
    # (row-group min/max skipping on l_shipdate at scale).
    li = load(spark, sf_dir, "lineitem")
    return (li.filter((F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp")) &
                      (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp")) &
                      (F.col("l_discount").between(0.05, 0.07)) &
                      (F.col("l_quantity") < 24))
            .agg(F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2)
                 .alias("revenue")))


# --------------------------------------------------------------------------
# Q10 returned-item reporting (TPC-H Q10 adapted)
# --------------------------------------------------------------------------

@register("q10_returned_items", sql="""
SELECT c_custkey, c_name, round(c_acctbal, 2) AS acctbal, n_name,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM customer JOIN orders   ON c_custkey = o_custkey
              JOIN lineitem ON l_orderkey = o_orderkey
              JOIN nation   ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
""", bench=True)
def q10(spark, sf_dir):
    cu = load(spark, sf_dir, "customer")
    od = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load(spark, sf_dir, "lineitem") \
        .filter(F.col("l_returnflag") == "R") \
        .select("l_orderkey", "l_extendedprice", "l_discount")
    na = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (od.join(li, od.o_orderkey == li.l_orderkey)
            .join(cu, od.o_custkey == cu.c_custkey)
            .join(F.broadcast(na), cu.c_nationkey == na.n_nationkey)
            .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
            .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
                 .alias("revenue"))
            .select("c_custkey", "c_name",
                    F.round("c_acctbal", 2).alias("acctbal"), "n_name", "revenue")
            .orderBy(F.desc("revenue"), F.asc("c_custkey"))
            .limit(20))


# --------------------------------------------------------------------------
# Q14 promotion effect (TPC-H Q14 adapted)
# --------------------------------------------------------------------------

@register("q14_promo_revenue", sql="""
SELECT round(100.0 * sum(CASE WHEN p_type = 'PROMO'
                              THEN l_extendedprice * (1 - l_discount)
                              ELSE 0 END)
             / sum(l_extendedprice * (1 - l_discount)), 4) AS promo_revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-07-01'
""")
def q14(spark, sf_dir):
    # part is a broadcast dimension; conditional aggregation avoids a
    # second pass.
    li = load(spark, sf_dir, "lineitem") \
        .filter((F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp")) &
                (F.col("l_shipdate") < F.lit("1997-07-01").cast("timestamp"))) \
        .select("l_partkey", "l_extendedprice", "l_discount")
    pa = load(spark, sf_dir, "part").select("p_partkey", "p_type")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (li.join(F.broadcast(pa), li.l_partkey == pa.p_partkey)
            .agg(F.round(100.0 * F.sum(F.when(F.col("p_type") == "PROMO", disc)
                                       .otherwise(F.lit(0.0))) / F.sum(disc), 4)
                 .alias("promo_revenue")))


# --------------------------------------------------------------------------
# Q18 large-volume customers (TPC-H Q18 adapted)
# --------------------------------------------------------------------------

@register("q18_large_volume_customer", sql="""
SELECT c_custkey, c_name, o_orderkey, o_orderdate,
       round(o_totalprice, 2) AS totalprice,
       round(big.sum_qty, 2)  AS sum_qty
FROM (SELECT l_orderkey, sum(l_quantity) AS sum_qty
      FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 300) big
JOIN orders   ON o_orderkey = big.l_orderkey
JOIN customer ON c_custkey = o_custkey
ORDER BY totalprice DESC, o_orderkey
LIMIT 100
""", bench=True)
def q18(spark, sf_dir):
    # Aggregate-then-join: the HAVING collapses lineitem to a small key
    # set. No explicit broadcast hint on it — `big` is FACT-derived, so
    # its size grows with SF (~100 MB of keys at TPC-H-100TB): a forced
    # broadcast that is right at bench scale becomes an OOM at 100×.
    # AQE measures the post-aggregation size at runtime and converts the
    # join to a broadcast exactly when it actually fits
    # (plan-pinned: test_plans.test_q18_aqe_broadcasts_agg).
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    big = (li.groupBy("l_orderkey")
           .agg(F.sum("l_quantity").alias("_sq"))
           .filter(F.col("_sq") > 300))
    od = load(spark, sf_dir, "orders")
    cu = load(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (od.join(big, od.o_orderkey == big.l_orderkey)
            .join(cu, od.o_custkey == cu.c_custkey)
            .select("c_custkey", "c_name", "o_orderkey", "o_orderdate",
                    F.round("o_totalprice", 2).alias("totalprice"),
                    F.round("_sq", 2).alias("sum_qty"))
            .orderBy(F.desc("totalprice"), F.asc("o_orderkey"))
            .limit(100))


# --------------------------------------------------------------------------
# Window: top orders per customer
# --------------------------------------------------------------------------

@register("w_top_orders_per_customer", sql="""
SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS totalprice,
       rk::INTEGER AS rk
FROM (SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rk
      FROM orders)
WHERE rk <= 3
""")
def w_top_orders(spark, sf_dir):
    od = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"),
                                                F.asc("o_orderkey"))
    return (od.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= 3)
            .select("o_custkey", "o_orderkey",
                    F.round("o_totalprice", 2).alias("totalprice"), "rk"))


# --------------------------------------------------------------------------
# Window: monthly revenue + running cumulative per priority
# --------------------------------------------------------------------------

@register("w_monthly_running_revenue", sql="""
WITH m AS (
  SELECT o_orderpriority, date_trunc('month', o_orderdate)::TIMESTAMP AS month,
         round(sum(o_totalprice), 2) AS month_rev
  FROM orders GROUP BY 1, 2)
SELECT o_orderpriority, month, month_rev,
       round(sum(month_rev) OVER (PARTITION BY o_orderpriority ORDER BY month
                                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
       AS running_rev
FROM m
""")
def w_running_rev(spark, sf_dir):
    # Two-level: rounded monthly aggregate first so the running sum adds
    # IDENTICAL doubles in identical (month) order on any engine.
    od = load(spark, sf_dir, "orders")
    m = (od.groupBy("o_orderpriority",
                    F.date_trunc("month", "o_orderdate").alias("month"))
         .agg(F.round(F.sum("o_totalprice"), 2).alias("month_rev")))
    w = (Window.partitionBy("o_orderpriority").orderBy("month")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return m.withColumn("running_rev", F.round(F.sum("month_rev").over(w), 2))


# --------------------------------------------------------------------------
# Events: sessionization via lag gap (30 min)
# --------------------------------------------------------------------------

@register("ev_sessionize", sql="""
WITH g AS (
  SELECT user_id, event_id,
         epoch_us(ts) - lag(epoch_us(ts))
           OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
  FROM events)
SELECT user_id, count(*) AS n_events,
       sum(CASE WHEN gap_us IS NULL OR gap_us > 1800 * 1000000
                THEN 1 ELSE 0 END)::BIGINT AS n_sessions
FROM g GROUP BY user_id
""", bench=True)
def ev_sessionize(spark, sf_dir):
    # lag over (user, ts) — the classic sessionize; one shuffle by
    # user_id serves both the window and the final aggregation. Gaps are
    # compared in exact epoch-microseconds (truncation/boundary semantics
    # of second-granularity datediff differ across engines).
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    return (ev.withColumn("_gap", us - F.lag(us).over(w))
            .groupBy("user_id")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.sum(F.when(F.col("_gap").isNull() |
                              (F.col("_gap") > 1800 * 1000000), 1)
                       .otherwise(0)).alias("n_sessions")))


# --------------------------------------------------------------------------
# Events: hourly rollup
# --------------------------------------------------------------------------

@register("ev_hourly_rollup", sql="""
SELECT date_trunc('hour', ts)::TIMESTAMP AS hour, event_type,
       count(*) AS n_events,
       count(DISTINCT user_id) AS n_users,
       round(sum(value), 2) AS sum_value
FROM events GROUP BY 1, 2
""")
def ev_hourly(spark, sf_dir):
    # Tumbling-window rollup expressed as date_trunc groupBy — the batch
    # twin of the Structured Streaming windowed agg in streaming/.
    ev = load(spark, sf_dir, "events")
    return (ev.groupBy(F.date_trunc("hour", "ts").alias("hour"), "event_type")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.countDistinct("user_id").alias("n_users"),
                 F.round(F.sum("value"), 2).alias("sum_value")))


# --------------------------------------------------------------------------
# Events: JSON props extraction + conditional agg
# --------------------------------------------------------------------------

@register("ev_props_json", sql="""
SELECT event_type,
       round(avg(CAST(json_extract(props, '$.k') AS BIGINT)), 4) AS avg_k,
       max(CAST(json_extract(props, '$.k') AS BIGINT))           AS max_k,
       count(*) AS n
FROM events GROUP BY event_type
""")
def ev_props(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return (ev.groupBy("event_type")
            .agg(F.round(F.avg(k), 4).alias("avg_k"),
                 F.max(k).alias("max_k"),
                 F.count(F.lit(1)).alias("n")))


# --------------------------------------------------------------------------
# Q4-style: order priority with EXISTS semi-join
# --------------------------------------------------------------------------

@register("q4_priority_semijoin", sql="""
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-01-01'
  AND o_orderdate <  TIMESTAMP '1997-07-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_quantity > 45)
GROUP BY o_orderpriority
""")
def q4(spark, sf_dir):
    # EXISTS → left_semi join; the lineitem side is pre-filtered so the
    # semi-join input is small and AQE broadcasts it.
    od = load(spark, sf_dir, "orders") \
        .filter((F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp")) &
                (F.col("o_orderdate") < F.lit("1997-07-01").cast("timestamp")))
    li = load(spark, sf_dir, "lineitem") \
        .filter(F.col("l_quantity") > 45).select("l_orderkey")
    return (od.join(li, od.o_orderkey == li.l_orderkey, "left_semi")
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("order_count")))


# --------------------------------------------------------------------------
# Q16-style: distinct-supplier counts per brand
# --------------------------------------------------------------------------

@register("q16_supplier_cnt", sql="""
SELECT p_brand, count(DISTINCT l_suppkey) AS supplier_cnt,
       count(*) AS line_cnt
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_size >= 20
GROUP BY p_brand
""")
def q16(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    pa = load(spark, sf_dir, "part").filter(F.col("p_size") >= 20) \
        .select("p_partkey", "p_brand")
    return (li.join(F.broadcast(pa), li.l_partkey == pa.p_partkey)
            .groupBy("p_brand")
            .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"),
                 F.count(F.lit(1)).alias("line_cnt")))


# --------------------------------------------------------------------------
# Q22-style: rich customers with no orders (anti-join + scalar subquery)
# --------------------------------------------------------------------------

@register("q22_global_sales_opportunity", sql="""
WITH avg_bal AS (
  SELECT avg(c_acctbal) AS a FROM customer WHERE c_acctbal > 0)
SELECT c_nationkey, count(*) AS numcust,
       round(sum(c_acctbal), 2) AS totacctbal
FROM customer, avg_bal
WHERE c_acctbal > avg_bal.a
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '2000-01-01')
GROUP BY c_nationkey
""")
def q22(spark, sf_dir):
    # Scalar subquery (tiny aggregate crossJoined as a literal) + anti
    # join against the recently-active-customer key set ("rich customers
    # with no recent orders"); the date filter keeps the anti side small
    # enough to broadcast.
    cu = load(spark, sf_dir, "customer")
    od = (load(spark, sf_dir, "orders")
          .filter(F.col("o_orderdate") >=
                  F.lit("2000-01-01").cast("timestamp"))
          .select("o_custkey"))
    avg_bal = (cu.filter(F.col("c_acctbal") > 0)
               .agg(F.avg("c_acctbal").alias("a")))
    return (cu.crossJoin(F.broadcast(avg_bal))
            .filter(F.col("c_acctbal") > F.col("a"))
            .join(od, cu.c_custkey == od.o_custkey, "left_anti")
            .groupBy("c_nationkey")
            .agg(F.count(F.lit(1)).alias("numcust"),
                 F.round(F.sum("c_acctbal"), 2).alias("totacctbal")))


# --------------------------------------------------------------------------
# Q12-style: priority line counts per return flag (fact-fact join + CASE)
# --------------------------------------------------------------------------

@register("q12_priority_lines", sql="""
SELECT l_returnflag,
       sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END)::BIGINT AS high_line_count,
       sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END)::BIGINT AS low_line_count
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate <  TIMESTAMP '1998-01-01'
GROUP BY l_returnflag
""")
def q12(spark, sf_dir):
    # Fact-fact equi-join: both sides shuffle on orderkey at real scale
    # (AQE may still broadcast the projected orders side at small SF);
    # the shipdate filter is pushed to the lineitem scan.
    li = (load(spark, sf_dir, "lineitem")
          .filter((F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp")) &
                  (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp")))
          .select("l_orderkey", "l_returnflag"))
    od = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (li.join(od, li.l_orderkey == od.o_orderkey)
            .groupBy("l_returnflag")
            .agg(F.sum(F.when(hi, 1).otherwise(0)).alias("high_line_count"),
                 F.sum(F.when(~hi, 1).otherwise(0)).alias("low_line_count")))


# --------------------------------------------------------------------------
# Q13-style: customer order-count distribution (left outer join, zero bucket)
# --------------------------------------------------------------------------

@register("q13_customer_distribution", sql="""
SELECT c_count, count(*)::BIGINT AS custdist FROM (
  SELECT c_custkey, count(o_orderkey)::BIGINT AS c_count
  FROM customer LEFT OUTER JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey)
GROUP BY c_count
""")
def q13(spark, sf_dir):
    # LEFT OUTER keeps order-less customers in the c_count=0 bucket;
    # count(o_orderkey) counts only matched (non-null) rows. Two
    # aggregations: the first shuffles on custkey, the second is tiny.
    cu = load(spark, sf_dir, "customer").select("c_custkey")
    od = (load(spark, sf_dir, "orders")
          .filter(F.col("o_orderpriority") != "1-URGENT")
          .select("o_custkey", "o_orderkey"))
    per = (cu.join(od, cu.c_custkey == od.o_custkey, "left_outer")
           .groupBy("c_custkey")
           .agg(F.count("o_orderkey").alias("c_count")))
    return per.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


# --------------------------------------------------------------------------
# Q17-style: small-quantity revenue vs per-part average (correlated subquery)
# --------------------------------------------------------------------------

@register("q17_small_quantity_revenue", sql="""
WITH pavg AS (
  SELECT l_partkey, 0.2 * avg(l_quantity) AS cutoff
  FROM lineitem GROUP BY l_partkey)
SELECT p_brand, round(sum(l_extendedprice), 2) AS revenue,
       count(*)::BIGINT AS n_lines
FROM lineitem
JOIN part ON p_partkey = l_partkey
JOIN pavg ON pavg.l_partkey = lineitem.l_partkey
WHERE l_quantity < cutoff
GROUP BY p_brand
""")
def q17(spark, sf_dir):
    # The correlated scalar subquery (per-part average) is de-correlated
    # into an aggregate + equi-join — one extra pass over lineitem's two
    # needed columns, partially aggregated map-side before the shuffle.
    li = load(spark, sf_dir, "lineitem") \
        .select("l_partkey", "l_quantity", "l_extendedprice")
    pavg = (li.groupBy("l_partkey")
            .agg((F.lit(0.2) * F.avg("l_quantity")).alias("cutoff")))
    pa = load(spark, sf_dir, "part").select("p_partkey", "p_brand")
    return (li.join(pavg, "l_partkey")
            .filter(F.col("l_quantity") < F.col("cutoff"))
            .join(F.broadcast(pa), li.l_partkey == pa.p_partkey)
            .groupBy("p_brand")
            .agg(F.round(F.sum("l_extendedprice"), 2).alias("revenue"),
                 F.count(F.lit(1)).alias("n_lines")))


# --------------------------------------------------------------------------
# Q19-style: disjunctive predicate revenue (OR-of-conjunctions pushdown)
# --------------------------------------------------------------------------

@register("q19_disjunctive_revenue", sql="""
SELECT p_brand,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_size <= 10 AND l_quantity >= 1 AND l_quantity <= 20)
   OR (p_size > 40 AND l_quantity >= 25 AND l_quantity <= 40)
GROUP BY p_brand
""")
def q19(spark, sf_dir):
    # Disjunction spans both sides of the join, so it can't be fully
    # pushed to either scan; Catalyst still derives the implied
    # single-side conjuncts (l_quantity bounds, p_size bounds) and pushes
    # those, evaluating the full OR post-join.
    li = load(spark, sf_dir, "lineitem") \
        .select("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
    pa = load(spark, sf_dir, "part").select("p_partkey", "p_size", "p_brand")
    cond = (((F.col("p_size") <= 10) & F.col("l_quantity").between(1, 20)) |
            ((F.col("p_size") > 40) & F.col("l_quantity").between(25, 40)))
    return (li.join(F.broadcast(pa), li.l_partkey == pa.p_partkey)
            .filter(cond)
            .groupBy("p_brand")
            .agg(F.round(F.sum(F.col("l_extendedprice") *
                               (1 - F.col("l_discount"))), 2)
                 .alias("revenue")))


# --------------------------------------------------------------------------
# Q7-style: volume shipping between two nations
# --------------------------------------------------------------------------

@register("q7_volume_shipping", sql="""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       year(l_shipdate)::BIGINT AS l_year,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem JOIN orders   ON o_orderkey = l_orderkey
              JOIN supplier ON s_suppkey = l_suppkey
              JOIN customer ON c_custkey = o_custkey
              JOIN nation n1 ON s_nationkey = n1.n_nationkey
              JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7') OR
       (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
GROUP BY 1, 2, 3
""")
def q7(spark, sf_dir):
    # nation is filtered to 2 rows before broadcasting into supplier and
    # customer, which shrink to ~2/25 of their rows and broadcast into
    # the fact join; the only big shuffle is orders⋈lineitem.
    na = load(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_3", "NATION_7"))
    su = (load(spark, sf_dir, "supplier")
          .join(F.broadcast(na.select(F.col("n_nationkey").alias("s_nationkey"),
                                      F.col("n_name").alias("supp_nation"))),
                "s_nationkey")
          .select("s_suppkey", "supp_nation"))
    cu = (load(spark, sf_dir, "customer")
          .join(F.broadcast(na.select(F.col("n_nationkey").alias("c_nationkey"),
                                      F.col("n_name").alias("cust_nation"))),
                "c_nationkey")
          .select("c_custkey", "cust_nation"))
    od = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate",
        "l_extendedprice", "l_discount")
    return (li.join(od, li.l_orderkey == od.o_orderkey)
            .join(F.broadcast(su), li.l_suppkey == su.s_suppkey)
            .join(F.broadcast(cu), od.o_custkey == cu.c_custkey)
            .filter(F.col("supp_nation") != F.col("cust_nation"))
            .groupBy("supp_nation", "cust_nation",
                     F.year("l_shipdate").cast("long").alias("l_year"))
            .agg(F.round(F.sum(F.col("l_extendedprice") *
                               (1 - F.col("l_discount"))), 2)
                 .alias("revenue")))


# --------------------------------------------------------------------------
# Q15-style: top supplier(s) by period revenue (argmax with ties)
# --------------------------------------------------------------------------

@register("q15_top_supplier", sql="""
WITH rev AS (
  SELECT l_suppkey AS suppkey,
         round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
    AND l_shipdate <  TIMESTAMP '1997-04-01'
  GROUP BY 1)
SELECT s_suppkey, s_name, total_revenue
FROM supplier JOIN rev ON s_suppkey = suppkey
WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
""")
def q15(spark, sf_dir):
    # The "view + scalar max" decomposes to: one aggregation over the
    # filtered fact, a 1-row max broadcast back onto it, and a broadcast
    # dimension join. Rounding BEFORE the max comparison keeps the
    # equality deterministic across engines.
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp")) &
        (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp")))
    rev = (li.groupBy(F.col("l_suppkey").alias("suppkey"))
           .agg(F.round(F.sum(F.col("l_extendedprice") *
                              (1 - F.col("l_discount"))), 2)
                .alias("total_revenue")))
    mx = rev.agg(F.max("total_revenue").alias("_mx"))
    su = load(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (rev.crossJoin(F.broadcast(mx))
            .filter(F.col("total_revenue") == F.col("_mx"))
            .join(F.broadcast(su), rev.suppkey == su.s_suppkey)
            .select("s_suppkey", "s_name", "total_revenue"))


# --------------------------------------------------------------------------
# Q2-style: argmax per group (top customer per nation, max_by)
# --------------------------------------------------------------------------

@register("q2_top_customer_per_nation", sql="""
WITH ranked AS (
  SELECT c_nationkey, c_name, c_acctbal,
         row_number() OVER (PARTITION BY c_nationkey
                            ORDER BY c_acctbal DESC, c_name DESC) AS rn
  FROM customer)
SELECT c_nationkey, c_name AS top_customer,
       round(c_acctbal, 2) AS top_acctbal
FROM ranked WHERE rn = 1
""")
def q2(spark, sf_dir):
    # argmax as a single map-side-combinable aggregate (max_by on a
    # (value, tie-break) struct) — no window, no second shuffle; ties
    # resolve deterministically by name.
    cu = load(spark, sf_dir, "customer")
    pair = F.struct(F.col("c_acctbal"), F.col("c_name"))
    return (cu.groupBy("c_nationkey")
            .agg(F.max_by("c_name", pair).alias("top_customer"),
                 F.round(F.max("c_acctbal"), 2).alias("top_acctbal")))


# --------------------------------------------------------------------------
# Q8-style: national market share within a region
# --------------------------------------------------------------------------

@register("q8_market_share", sql="""
SELECT o_year,
       round(sum(CASE WHEN nation = 'NATION_5' THEN volume ELSE 0 END), 2)
           AS nation_volume,
       round(sum(volume), 2) AS total_volume,
       round(sum(CASE WHEN nation = 'NATION_5' THEN volume ELSE 0 END)
             / sum(volume), 6) AS mkt_share
FROM (
  SELECT year(o_orderdate)::BIGINT AS o_year,
         l_extendedprice * (1 - l_discount) AS volume,
         n2.n_name AS nation
  FROM part JOIN lineitem ON p_partkey = l_partkey
       JOIN supplier ON s_suppkey = l_suppkey
       JOIN orders ON l_orderkey = o_orderkey
       JOIN customer ON o_custkey = c_custkey
       JOIN nation n1 ON c_nationkey = n1.n_nationkey
       JOIN region ON n1.n_regionkey = r_regionkey
       JOIN nation n2 ON s_nationkey = n2.n_nationkey
  WHERE r_name = 'ASIA' AND p_type = 'ECONOMY'
    AND o_orderdate >= TIMESTAMP '1995-01-01'
    AND o_orderdate <  TIMESTAMP '1998-01-01')
GROUP BY o_year
""")
def q8(spark, sf_dir):
    # All dimensions broadcast (part filtered to 1/6, customer to 1/5
    # via the region chain, supplier+nation tiny); the single shuffle is
    # orders⋈lineitem on orderkey. Numerator/denominator are reported
    # alongside the ratio so the rounded share stays auditable.
    re = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n1 = (load(spark, sf_dir, "nation")
          .join(F.broadcast(re), F.col("n_regionkey") == re.r_regionkey)
          .select("n_nationkey"))
    cu = (load(spark, sf_dir, "customer")
          .join(F.broadcast(n1), F.col("c_nationkey") == n1.n_nationkey)
          .select("c_custkey"))
    n2 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nationkey"),
        F.col("n_name").alias("nation"))
    su = (load(spark, sf_dir, "supplier")
          .join(F.broadcast(n2), "s_nationkey")
          .select("s_suppkey", "nation"))
    pa = load(spark, sf_dir, "part") \
        .filter(F.col("p_type") == "ECONOMY").select("p_partkey")
    od = load(spark, sf_dir, "orders") \
        .filter((F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp")) &
                (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))) \
        .select("o_orderkey", "o_custkey", "o_orderdate")
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey",
        "l_extendedprice", "l_discount")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    nat = F.when(F.col("nation") == "NATION_5", vol).otherwise(F.lit(0.0))
    return (li.join(F.broadcast(pa), li.l_partkey == pa.p_partkey)
            .join(od, li.l_orderkey == od.o_orderkey)
            .join(F.broadcast(cu), od.o_custkey == cu.c_custkey)
            .join(F.broadcast(su), li.l_suppkey == su.s_suppkey)
            .groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
            .agg(F.round(F.sum(nat), 2).alias("nation_volume"),
                 F.round(F.sum(vol), 2).alias("total_volume"),
                 F.round(F.sum(nat) / F.sum(vol), 6).alias("mkt_share")))


# --------------------------------------------------------------------------
# Q9-style: product-line profit by supplier nation and year
# (adapted: testdata has no partsupp, so cost = 0.4 * p_retailprice * qty)
# --------------------------------------------------------------------------

@register("q9_product_profit", sql="""
SELECT nation, o_year, sum(amount_e4)::BIGINT AS sum_profit_e4
FROM (
  SELECT n_name AS nation, year(o_orderdate)::BIGINT AS o_year,
         round((l_extendedprice * (1 - l_discount)
                - 0.4 * p_retailprice * l_quantity) * 10000)::BIGINT
             AS amount_e4
  FROM lineitem JOIN part ON p_partkey = l_partkey
       JOIN supplier ON s_suppkey = l_suppkey
       JOIN orders ON o_orderkey = l_orderkey
       JOIN nation ON s_nationkey = n_nationkey
  WHERE p_name LIKE '%gear%')
GROUP BY nation, o_year
""")
def q9(spark, sf_dir):
    # part (name-filtered), supplier⋈nation broadcast; orders⋈lineitem
    # is the only shuffle. The LIKE filter is pushed into the part scan
    # (StringContains pushdown).
    pa = load(spark, sf_dir, "part") \
        .filter(F.col("p_name").contains("gear")) \
        .select("p_partkey", "p_retailprice")
    na = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nationkey"),
        F.col("n_name").alias("nation"))
    su = (load(spark, sf_dir, "supplier")
          .join(F.broadcast(na), "s_nationkey")
          .select("s_suppkey", "nation"))
    od = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
        "l_extendedprice", "l_discount")
    # Profits cancel (revenue - cost), so a double sum rounded to cents
    # lands on genuine half-cent ties where engines disagree. Amounts are
    # exact multiples of 1e-4, so summing round(amount*1e4) longs is
    # exact and engine-independent.
    amount = (F.col("l_extendedprice") * (1 - F.col("l_discount"))
              - 0.4 * F.col("p_retailprice") * F.col("l_quantity"))
    amount_e4 = F.round(amount * 10000, 0).cast("long")
    return (li.join(F.broadcast(pa), li.l_partkey == pa.p_partkey)
            .join(od, li.l_orderkey == od.o_orderkey)
            .join(F.broadcast(su), li.l_suppkey == su.s_suppkey)
            .groupBy("nation",
                     F.year("o_orderdate").cast("long").alias("o_year"))
            .agg(F.sum(amount_e4).alias("sum_profit_e4")))


# --------------------------------------------------------------------------
# Q11-style: important parts by traded value vs global threshold
# (adapted: no partsupp — value = sum(extendedprice * quantity) per part)
# --------------------------------------------------------------------------

@register("q11_important_parts", sql="""
WITH val AS (
  SELECT l_partkey, round(sum(l_extendedprice * l_quantity), 2) AS part_value
  FROM lineitem GROUP BY 1)
SELECT l_partkey, part_value
FROM val
WHERE part_value > (SELECT avg(part_value) * 1.5 FROM val)
""")
def q11(spark, sf_dir):
    # Group-agg reused twice: once per part, once reduced to the scalar
    # threshold that is broadcast back — the same having-vs-scalar shape
    # as TPC-H Q11, with no second scan of the fact table.
    li = load(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_extendedprice", "l_quantity")
    val = (li.groupBy("l_partkey")
           .agg(F.round(F.sum(F.col("l_extendedprice") * F.col("l_quantity")), 2)
                .alias("part_value")))
    # LAZY, cache-free: `val` is consumed twice (scalar threshold and
    # filter side), each a scan+partial-agg of lineitem — embarrassingly
    # parallel recompute with nothing pinned in executor storage, the
    # trade every scale-out engine makes for scalar-subquery shapes.
    thr = val.agg((F.avg("part_value") * 1.5).alias("_thr"))
    return (val.crossJoin(F.broadcast(thr))
            .filter(F.col("part_value") > F.col("_thr"))
            .select("l_partkey", "part_value"))


# --------------------------------------------------------------------------
# Q21-style: suppliers who alone shipped late on multi-supplier orders
# (adapted: no commit/receipt dates — "late" = shipped >60 days after order)
# --------------------------------------------------------------------------

@register("q21_waiting_suppliers", sql="""
WITH li AS (
  SELECT l_orderkey, l_suppkey,
         CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY
              THEN 1 ELSE 0 END AS late
  FROM lineitem JOIN orders ON o_orderkey = l_orderkey
  WHERE o_orderstatus = 'F'),
ord AS (
  SELECT l_orderkey,
         count(DISTINCT l_suppkey) AS n_supp,
         count(DISTINCT CASE WHEN late = 1 THEN l_suppkey END) AS n_late
  FROM li GROUP BY 1)
SELECT s_name, count(*)::BIGINT AS numwait
FROM li JOIN ord USING (l_orderkey)
        JOIN supplier ON s_suppkey = l_suppkey
WHERE li.late = 1 AND ord.n_supp > 1 AND ord.n_late = 1
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 20
""")
def q21(spark, sf_dir):
    # The EXISTS / NOT EXISTS pair of TPC-H Q21 collapses into one
    # per-order aggregate (distinct suppliers, distinct late suppliers)
    # joined back to the late rows — two shuffles on orderkey that AQE
    # co-partitions, instead of two correlated subquery scans.
    od = load(spark, sf_dir, "orders") \
        .filter(F.col("o_orderstatus") == "F") \
        .select("o_orderkey", "o_orderdate")
    li_raw = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate")
    li = (li_raw.join(od, li_raw.l_orderkey == od.o_orderkey)
          .select("l_orderkey", "l_suppkey",
                  F.when(F.col("l_shipdate") >
                         F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"),
                         1).otherwise(0).alias("late")))
    # Per-order stats ride a WINDOW over the same l_orderkey
    # partitioning the probe rows need anyway: one scan of
    # lineitem+orders and one shuffle, where the previous
    # aggregate-then-join-back shape re-evaluated the whole join for
    # each side (two fact scans) and paid a countDistinct expand.
    # Orders hold at most 7 lineitems, so the per-partition collect_set
    # state is bounded and skew-free.
    wo = Window.partitionBy("l_orderkey")
    flagged = (li.withColumn(
        "n_supp", F.size(F.collect_set("l_suppkey").over(wo)))
        .withColumn(
            "n_late", F.size(F.collect_set(
                F.when(F.col("late") == 1, F.col("l_suppkey")))
                .over(wo)))
        .filter((F.col("late") == 1) & (F.col("n_supp") > 1) &
                (F.col("n_late") == 1)))
    su = load(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (flagged
            .join(F.broadcast(su), F.col("l_suppkey") == su.s_suppkey)
            .groupBy("s_name")
            .agg(F.count(F.lit(1)).alias("numwait"))
            .orderBy(F.desc("numwait"), F.asc("s_name"))
            .limit(20))


# --------------------------------------------------------------------------
# Q20-style: suppliers shipping outsized volumes of promo parts
# (adapted: no partsupp — threshold is 1.5x the per-part average of
#  supplier-level shipped quantity; quantities are integer-valued doubles
#  so sums/averages are exact and engine-independent)
# --------------------------------------------------------------------------

@register("q20_outsized_promo_suppliers", sql="""
WITH sp AS (
  SELECT l_suppkey, l_partkey, sum(l_quantity) AS qty
  FROM lineitem JOIN part ON p_partkey = l_partkey
  WHERE p_type = 'PROMO'
    AND l_shipdate >= TIMESTAMP '1997-01-01'
    AND l_shipdate <  TIMESTAMP '1998-01-01'
  GROUP BY 1, 2),
pavg AS (SELECT l_partkey, avg(qty) AS aq FROM sp GROUP BY 1)
SELECT s_suppkey, s_name, count(*)::BIGINT AS n_big_parts
FROM supplier JOIN sp ON s_suppkey = sp.l_suppkey
              JOIN pavg ON pavg.l_partkey = sp.l_partkey
WHERE sp.qty > 1.5 * pavg.aq AND s_nationkey = 2
GROUP BY 1, 2
""")
def q20(spark, sf_dir):
    # part (type-filtered) broadcasts into the date-pruned fact; the
    # (supplier, part) aggregate is the only fact-sized shuffle. The
    # correlated per-part average is a window over the already-small
    # aggregate instead of a second scan + self-join.
    pa = load(spark, sf_dir, "part") \
        .filter(F.col("p_type") == "PROMO").select("p_partkey")
    li = (load(spark, sf_dir, "lineitem")
          .filter((F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp")) &
                  (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp")))
          .select("l_partkey", "l_suppkey", "l_quantity"))
    sp = (li.join(F.broadcast(pa), li.l_partkey == pa.p_partkey)
          .groupBy("l_suppkey", "l_partkey")
          .agg(F.sum("l_quantity").alias("qty")))
    w = Window.partitionBy("l_partkey")
    big = (sp.withColumn("aq", F.avg("qty").over(w))
           .filter(F.col("qty") > 1.5 * F.col("aq")))
    su = (load(spark, sf_dir, "supplier")
          .filter(F.col("s_nationkey") == 2)
          .select("s_suppkey", "s_name"))
    return (big.join(F.broadcast(su), big.l_suppkey == su.s_suppkey)
            .groupBy("s_suppkey", "s_name")
            .agg(F.count(F.lit(1)).alias("n_big_parts")))
