"""Sketch-family properties: the guarantees the estimates rest on,
pinned independently of the oracle gates (which pin cross-engine
determinism)."""

from pyspark.sql import functions as F

from connectors_spark.functions.text import tokens
from connectors_spark.ops import sketches as sk
from tests.conftest import read_table


def _tok(spark):
    return (read_table(spark, "documents")
            .select(F.explode(tokens("text")).alias("g")))


def test_countmin_never_underestimates(spark):
    tok = _tok(spark)
    exact = tok.groupBy("g").agg(F.count(F.lit(1)).alias("n"))
    sketch = sk.countmin_sketch(tok, "g", depth=4, width=256)
    est = sk.countmin_estimate(sketch, exact.select("g"), "g",
                               depth=4, width=256)
    bad = (exact.join(est, "g")
           .filter(F.col("cm_est") < F.col("n")).count())
    assert bad == 0  # CountMin guarantee: estimate >= true count


def test_countmin_sketches_merge(spark):
    tok = _tok(spark)
    a = sk.countmin_sketch(tok.filter(F.crc32(F.col("g")) % 2 == 0),
                           "g", depth=4, width=256)
    b = sk.countmin_sketch(tok.filter(F.crc32(F.col("g")) % 2 == 1),
                           "g", depth=4, width=256)
    merged = (a.unionByName(b).groupBy("j", "bucket")
              .agg(F.sum("c").alias("c")))
    full = sk.countmin_sketch(tok, "g", depth=4, width=256)
    diff = (merged.join(full, ["j", "bucket"], "full")
            .filter(~merged["c"].eqNullSafe(full["c"])).count())
    assert diff == 0  # counters are additive: merge == rebuild


def test_hll_registers_merge(spark):
    ev = read_table(spark, "events")
    full = sk.hll_registers(ev, "event_type", "user_id")
    a = sk.hll_registers(ev.filter(F.col("user_id") % 2 == 0),
                         "event_type", "user_id")
    b = sk.hll_registers(ev.filter(F.col("user_id") % 2 == 1),
                         "event_type", "user_id")
    merged = (a.unionByName(b).groupBy("grp", "bucket")
              .agg(F.max("reg").alias("reg")))
    diff = (merged.join(full, ["grp", "bucket"], "full")
            .filter(~merged["reg"].eqNullSafe(full["reg"])).count())
    assert diff == 0  # register max is the mergeable combiner


def test_hll_estimate_reasonable(spark):
    ev = read_table(spark, "events")
    est = sk.hll_estimate(
        sk.hll_registers(ev, "event_type", "user_id"))
    ex = (ev.groupBy("event_type")
          .agg(F.countDistinct("user_id").alias("n"))
          .withColumnRenamed("event_type", "grp"))
    rows = ex.join(est, "grp").collect()
    assert rows
    for r in rows:
        # m=64 HLL: ~13% standard error; 3 sigma envelope.
        assert abs(r.hll_est - r.n) <= max(10.0, 0.4 * r.n), r


def test_bloom_has_no_false_negatives(spark):
    docs = read_table(spark, "documents")
    from connectors_spark.functions.text import ngram_shingles
    evalg = (docs.filter(F.col("source") == "src0")
             .select("doc_id",
                     F.explode(ngram_shingles(F.col("text"), 3))
                     .alias("g")))
    bits = sk.bloom_bits(evalg, "g", k=3, mbits=4096)
    # Probing the eval set against its own filter: every gram contained.
    res = sk.bloom_contains_counts(evalg, "doc_id", "g", bits,
                                   k=3, mbits=4096)
    missed = res.filter(F.col("n_bloom_hits") < F.col("n_grams")).count()
    assert missed == 0


def test_bpe_learns_classic_merges(spark):
    from connectors_spark.ops.bpe import bpe_train
    df = spark.createDataFrame(
        [("low low lower newest widest",)], "text string")
    merges = bpe_train(df, k=4)
    # Sennrich-style toy corpus: 'lo' (in low×3 + lower), then 'low',
    # then the est pieces; ties broken (freq desc, pair lexicographic).
    assert merges == [(1, "l", "o", 3), (2, "lo", "w", 3),
                      (3, "e", "s", 2), (4, "es", "t", 2)]


def test_bpe_merges_repeats_left_to_right(spark):
    from connectors_spark.ops.bpe import bpe_train
    # 'aaaa': pair (a,a) occurs 3 times overlapping, weight counts all
    # adjacencies; the MERGE is non-overlapping left-to-right, so round
    # 2's top pair is (aa, aa) — the delimiter-safe replace must merge
    # both disjoint occurrences in one pass.
    df = spark.createDataFrame([("aaaa aaaa",)], "text string")
    merges = bpe_train(df, k=2)
    assert merges[0][1:3] == ("a", "a")
    assert merges[1][1:3] == ("aa", "aa")


def test_histogram_sketch_merges_and_bounds(spark):
    from pyspark.sql import functions as F2
    ev = read_table(spark, "events")
    full = sk.histogram_sketch(ev, "event_type", "value")
    a = sk.histogram_sketch(ev.filter(F2.col("event_id") % 2 == 0),
                            "event_type", "value")
    b = sk.histogram_sketch(ev.filter(F2.col("event_id") % 2 == 1),
                            "event_type", "value")
    merged = (a.unionByName(b).groupBy("grp", "bin")
              .agg(F2.sum("cnt").alias("cnt")))
    diff = (merged.join(full, ["grp", "bin"], "full")
            .filter(~merged["cnt"].eqNullSafe(full["cnt"])).count())
    assert diff == 0  # additive counts: merge == rebuild
    # The estimate is the lower edge of the half-octave bin holding
    # the ceil(p*n)-th ORDER STATISTIC, so edge <= stat < edge*1.5
    # (bin widths alternate x1.5 / x4/3).
    import math
    q = {r.grp: r for r in sk.histogram_quantiles(full).collect()}
    vals = {}
    for r in ev.select("event_type", "value").collect():
        vals.setdefault(r.event_type, []).append(r.value)
    for grp, vs in vals.items():
        vs.sort()
        est = q[grp]
        for p, e in ((0.5, est.p50_est), (0.99, est.p99_est)):
            stat = vs[math.ceil(p * len(vs)) - 1]
            assert e <= stat * 1.001, (grp, p, e, stat)
            assert stat < e * 1.51, (grp, p, e, stat)


def test_bpe_oracle_survives_pair_dryout(spark, tmp_path):
    """Fewer learnable merges than k: the Spark side breaks early and
    the oracle's LEFT JOIN ON TRUE passes states through unchanged —
    doc_bpe_subword_counts-style encode must still agree per doc."""
    import duckdb
    from connectors_spark.queries.pipeline import _bpe_ctes
    from connectors_spark.ops.bpe import bpe_subword_counts, bpe_train

    pq = str(tmp_path / "docs.parquet")
    docs = spark.createDataFrame(
        [(0, "ab ab a", "en", "src0"), (1, "b a ab", "en", "src0")],
        "doc_id long, text string, lang string, source string")
    docs.toPandas().to_parquet(pq)

    merges = bpe_train(docs, k=6)       # only 1 learnable merge: (a,b)
    assert len(merges) == 1 and merges[0][1:3] == ("a", "b")
    got = {(r.doc_id, r.n_words, r.n_subwords)
           for r in bpe_subword_counts(docs, merges).collect()}

    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{pq}'")
    sql = _bpe_ctes(6) + """
SELECT t.doc_id, count(*)::BIGINT AS n_words,
       sum(len(string_split(substr(s.state, 2, length(s.state) - 2),
                            chr(31) || chr(31))))::BIGINT AS n_subwords
FROM (SELECT doc_id, unnest(t) AS word FROM toks) t
JOIN s6 s USING (word)
GROUP BY 1
"""
    want = set(map(tuple, con.execute(sql).fetchall()))
    con.close()
    assert got == want
