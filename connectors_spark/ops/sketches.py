"""Mergeable sketches: CountMin, HyperLogLog, Bloom membership.

The 100 TB aggregation story: all three reduce to hash-bucketed
groupBy/agg — map-side combinable, constant memory per group, and
MERGEABLE (a sketch of partition A + a sketch of partition B is the
sketch of A∪B), so they compose across days/shards without re-reading
data. Unlike Spark's built-in approx_count_distinct (HLL++ with
engine-private hashing), every hash here is md5-derived
(functions/text.hash64) with NO seeds, so a DuckDB oracle computes the
bit-identical estimate — sketches stay hash-compare-testable, the same
determinism rationale as ev_kmv_distinct (queries/temporal.py).

References: Cormode & Muthukrishnan 2005 (CountMin); Flajolet et al.
2007 (HyperLogLog); Bloom 1970. Reference repo has no sketch surface —
this is part of the §7 training-data-pipeline extension family.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import hash64


# --------------------------------------------------------------------- util

def _bucket(col: Column, salt: str, width: int) -> Column:
    """Deterministic bucket: hash64 is a non-negative 60-bit value, so
    plain % agrees between Spark and DuckDB (no negative-mod skew).
    DuckDB twin (inlined by the oracles in queries/pipeline.py):
    ``('0x' || substring(md5('<salt>' || expr), 1, 15))::BIGINT % w``.
    """
    return hash64(F.concat(F.lit(salt), col.cast("string"))) % width


def _probe_array(col: Column, prefix: str, k: int, width: int,
                 with_j: bool = True):
    """The k per-hash probes for a key — ONE construction shared by
    sketch build and estimate/probe sides, so the two can never drift
    (a probe-side salt change would silently garble every estimate
    while still passing >=0 sanity checks)."""
    if with_j:
        return F.array(*[
            F.struct(F.lit(j).cast("int").alias("j"),
                     _bucket(col, f"{prefix}{j}:", width).alias("bucket"))
            for j in range(k)])
    return F.array(*[_bucket(col, f"{prefix}{j}:", width)
                     for j in range(k)])


# ----------------------------------------------------------------- CountMin

def countmin_sketch(df: DataFrame, key_col: str, depth: int = 4,
                    width: int = 256) -> DataFrame:
    """Build the (j, bucket, c) counter relation: depth rows of width
    counters, each c = Σ occurrences hashing there. ONE scan (the depth
    hashes explode from an array), one map-side-combined aggregate;
    counters are additive, so sketches of different data slices union +
    re-aggregate into the merged sketch."""
    probes = _probe_array(F.col(key_col), "cm", depth, width)
    return (df.select(F.explode_outer(probes).alias("_p"))
            .where(F.col("_p").isNotNull())
            .groupBy(F.col("_p.j").alias("j"),
                     F.col("_p.bucket").alias("bucket"))
            .agg(F.count(F.lit(1)).alias("c")))


def countmin_estimate(sketch: DataFrame, keys: DataFrame, key_col: str,
                      depth: int = 4, width: int = 256) -> DataFrame:
    """Point-estimate each key against the sketch: min over the depth
    counters it hashes to (CountMin guarantee: estimate >= true count,
    overshoot bounded by collisions). keys is small (the probe set);
    the join is on (j, bucket) against the d*w-row sketch."""
    pr = (keys.select(
        F.col(key_col),
        F.explode(_probe_array(F.col(key_col), "cm", depth, width))
        .alias("_p"))
        .select(key_col, F.col("_p.j").alias("j"),
                F.col("_p.bucket").alias("bucket")))
    return (pr.join(sketch, ["j", "bucket"], "left")
            .groupBy(key_col)
            .agg(F.min(F.coalesce(F.col("c"), F.lit(0)))
                 .alias("cm_est")))


# -------------------------------------------------------------- HyperLogLog

HLL_M = 64          # registers (2^6)
HLL_ALPHA = 0.709   # alpha_64 (Flajolet et al. 2007, fig. 3)


def hll_registers(df: DataFrame, group_col: str,
                  key_col: str) -> DataFrame:
    """(group, bucket, reg) register relation per group: bucket is the
    low bits of the hash, reg = max over keys of rho(remaining bits)
    (position of the lowest set bit, 1-based). max() is the mergeable
    combiner — map-side partial max, then one reduce."""
    hv = hash64(F.col(key_col).cast("string"))
    # High bits via shift, NOT float division — hv is up to 2^60 and a
    # double mantissa would round it. hv is non-negative, so >> 6 is
    # exactly the oracle's `hv // 64`.
    v = F.shiftright(hv, 6)
    # rho via the lowest set bit: v & -v is an exact power of two, and
    # log2 of an exact power of two is exact in IEEE double — same
    # closed form the oracle uses. v == 0 caps at the max possible rho.
    rho = (F.when(v == 0, F.lit(55))
           .otherwise(F.floor(F.log2((v.bitwiseAND(-v))
                                     .cast("double"))) + 1)).cast("int")
    return (df.select(F.col(group_col).alias("grp"),
                      (hv % HLL_M).alias("bucket"), rho.alias("rho"))
            .groupBy("grp", "bucket")
            .agg(F.max("rho").alias("reg")))


def hll_estimate(regs: DataFrame) -> DataFrame:
    """(grp, hll_est, n_zero_regs): the HLL raw estimate
    alpha*m^2 / Σ 2^-reg (empty registers contribute 2^0), with the
    small-range linear-counting correction when est <= 2.5m and zero
    registers remain. Rounded 2 — both engines compute IEEE doubles on
    identical integers."""
    g = (regs.groupBy("grp")
         .agg(F.sum(F.pow(F.lit(2.0), -F.col("reg"))).alias("_s"),
              F.count(F.lit(1)).alias("_n")))
    zeros = F.lit(HLL_M) - F.col("_n")
    raw = (F.lit(HLL_ALPHA * HLL_M * HLL_M)
           / (F.col("_s") + zeros.cast("double")))
    est = F.when((raw <= F.lit(2.5 * HLL_M)) & (zeros > 0),
                 F.lit(float(HLL_M)) * F.log(F.lit(float(HLL_M))
                                             / zeros.cast("double"))) \
           .otherwise(raw)
    return g.select(F.col("grp"),
                    F.round(est, 2).alias("hll_est"),
                    zeros.cast("int").alias("n_zero_regs"))


# -------------------------------------------------------------------- Bloom

def bloom_bits(df: DataFrame, gram_col: str, k: int = 3,
               mbits: int = 4096) -> DataFrame:
    """Distinct set-bit relation (bit BIGINT) for a gram column — the
    Bloom filter as data. At 100 TB the bit relation is at most mbits
    rows regardless of corpus size (vs broadcasting the exact gram
    set), and ORs of two filters are a plain union+distinct."""
    probes = _probe_array(F.col(gram_col), "bl", k, mbits, with_j=False)
    return (df.select(F.explode_outer(probes).alias("bit"))
            .where(F.col("bit").isNotNull()).distinct())


def bloom_contains_counts(probe: DataFrame, id_col: str, gram_col: str,
                          bits: DataFrame, k: int = 3,
                          mbits: int = 4096) -> DataFrame:
    """Per id: total distinct grams and how many the filter contains
    (ALL k bits set — Bloom semantics: no false negatives, bounded
    false positives). bits is tiny (<= mbits rows) → broadcast-joinable
    by AQE; no corpus-sized shuffle beyond the per-gram distinct."""
    pr = (probe.select(id_col, gram_col).distinct()
          .select(id_col, gram_col,
                  F.explode_outer(_probe_array(F.col(gram_col), "bl", k,
                                               mbits, with_j=False))
                  .alias("bit"))
          .where(F.col("bit").isNotNull()))
    marked = bits.withColumn("_hit", F.lit(1))
    per_gram = (pr.join(marked, "bit", "left")
                .groupBy(id_col, gram_col)
                .agg((F.count("_hit") == k).alias("_in")))
    return (per_gram.groupBy(id_col)
            .agg(F.count(F.lit(1)).alias("n_grams"),
                 F.sum(F.col("_in").cast("long")).alias("n_bloom_hits")))


# ------------------------------------------------------- histogram quantiles

def histogram_sketch(df: DataFrame, group_col: str,
                     value_col: str) -> DataFrame:
    """(grp, bin, cnt): mergeable log-histogram over positive 2-decimal
    values. Values quantize to integer cents; the bin is EXACT bit
    arithmetic — (bit_length-1)*2 + second-MSB — i.e. half-octave
    buckets with no transcendental in sight, so Spark and DuckDB can
    never disagree on a boundary (a log2()-based binning would be one
    libm ulp away from a different bucket). Counts are additive:
    sketches of different slices union + re-aggregate, same merge story
    as CountMin."""
    c = F.round(F.col(value_col) * 100).cast("long")
    b = F.bin(c)
    bin_id = ((F.length(b) - 1) * 2
              + (F.substring(b, 2, 1) == F.lit("1")).cast("int"))
    return (df.filter(F.col(value_col).isNotNull() & (c >= 1))
            .select(F.col(group_col).alias("grp"), bin_id.alias("bin"))
            .groupBy("grp", "bin")
            .agg(F.count(F.lit(1)).alias("cnt")))


def histogram_quantiles(sketch: DataFrame, ps=(0.5, 0.9, 0.99)) -> DataFrame:
    """Per group: quantile estimates from the histogram — the smallest
    bin whose cumulative count reaches ceil(p·n), reported as the bin's
    lower edge in value units. Everything runs on the tiny (grp, bin)
    relation; at 100 TB only the one binning aggregate sees data."""
    from pyspark.sql import Window

    w = (Window.partitionBy("grp").orderBy("bin")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    fl = F.floor(F.col("bin") / 2)
    edge = F.round((F.pow(F.lit(2.0), fl.cast("double"))
                    + (F.col("bin") % 2).cast("double")
                    * F.pow(F.lit(2.0), (fl - 1).cast("double")))
                   / 100.0, 6)
    cum = (sketch.withColumn("_cum", F.sum("cnt").over(w))
           .withColumn("_n", F.sum("cnt").over(Window.partitionBy("grp")))
           .withColumn("_edge", edge))
    aggs = [F.max("_n").alias("n_values")]
    for p in ps:
        tag = f"p{int(p * 100)}_est"
        rank = F.ceil(F.lit(p) * F.col("_n").cast("double"))
        aggs.append(F.min(F.when(F.col("_cum") >= rank, F.col("_edge")))
                    .alias(tag))
    return (cum.groupBy("grp").agg(*aggs))
