"""Document deduplication operators (SURVEY.md §7 / training-data pipeline).

Four families, each scale-first:

- **Exact** — hash-groupBy on a normalized fingerprint. One shuffle on a
  16-byte key; at 100 TB this is the cheapest possible dedup.
- **N-gram Jaccard** — exact set similarity, but NEVER all-pairs: candidate
  pairs come from an inverted shingle index (explode → self-join on shingle
  → groupBy pair). Hot shingles are capped (`max_shingle_freq`, cf. stop
  words) so one ubiquitous shingle can't create an O(n²) bucket.
- **MinHash + LSH** — k deterministic permutations folded into ONE
  aggregation pass over the exploded shingles (map-side combine), banded
  so only same-band docs join. The classic scale path: shuffle volume is
  O(docs × bands), not O(docs²).
- **SimHash** — 60-bit signature via per-bit vote aggregation, near-dup
  candidates from 15-bit band buckets, verified with `bit_count(xor)`.

All hashing is md5-derived (see functions.text.hash64) so every operator
is reproducible in a double-entry SQL oracle. Everything — including
shingle construction (see ngram_shingles) — is JVM-side expressions; no
Python workers anywhere in the dedup family.

Reference parity note: delta-io/connectors has no dedup operators; these
are the §7 extensions. The LSH shape follows the published MinHash/LSH
literature (Broder '97; Leskovec et al., "Mining of Massive Datasets").
"""

from __future__ import annotations

from typing import List, Optional, Tuple

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import (bind_once, fingerprint, hash64,
                              kgram_hashes, ngram_shingles, tokens)

# Prime modulus > 2^32 and multiplier bound 2^29 keep a*h+b < 2^62:
# no BIGINT overflow in Spark OR the SQL oracle (DuckDB errors on
# overflow; Spark wraps — identical only if we never overflow).
MINHASH_PRIME = 4294967311

# 16 fixed (a, b) permutation constants, a ∈ [1, 2^29), b ∈ [0, P).
# Hardcoded so signatures are stable across runs/engines.
MINHASH_PERMS: List[Tuple[int, int]] = [
    (268041533, 1929943859), (488076719, 3527867887), (104395303, 2971215073),
    (387420489, 1046527441), (536812103, 3628273133), (225058681, 2038074743),
    (472882027, 3267000013), (323507003, 1823829241), (198491317, 2797050013),
    (533000389, 3464871019), (137438953, 1472033447), (429496729, 3091567403),
    ( 86028121, 2147483647), (507892117, 3739208719), (179424673, 1300609249),
    (463291321, 3323707379),
]


def with_fingerprint(df: DataFrame, text_col: str = "text",
                     out: str = "fp") -> DataFrame:
    return df.withColumn(out, fingerprint(text_col))


def dedup_exact(df: DataFrame, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """Keep one representative (min id) per exact-content group.

    Single hash aggregation: shuffle key is the md5 fingerprint, so data
    is near-uniformly distributed — no skew at any scale.
    """
    return (with_fingerprint(df, text_col)
            .groupBy("fp")
            .agg(F.min(id_col).alias(id_col),
                 F.count(F.lit(1)).alias("group_size"))
            )


def exact_dup_stats(df: DataFrame, id_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """Corpus-level exact-dup summary: docs, distinct contents, dup docs."""
    groups = dedup_exact(df, id_col, text_col)
    return groups.agg(
        F.sum("group_size").cast("long").alias("n_docs"),
        F.count(F.lit(1)).alias("n_unique"),
        (F.sum("group_size") - F.count(F.lit(1))).cast("long")
        .alias("n_exact_dups"),
    )


# --------------------------------------------------------------------------
# N-gram Jaccard (exact verification; inverted-index candidates)
# --------------------------------------------------------------------------

def _spread(df: DataFrame) -> DataFrame:
    """Repartition up to the cluster's parallelism when the input is
    narrow (e.g. a single small Parquet file → one task). At real scale
    the scan is already wide and this is a no-op."""
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def shingle_sets(df: DataFrame, id_col: str = "doc_id",
                 text_col: str = "text", n: int = 3) -> DataFrame:
    """(id, shingles array, set size) — the base relation for Jaccard."""
    return (_spread(df).select(F.col(id_col).alias("_id"),
                               ngram_shingles(text_col, n).alias("_sh"))
            .withColumn("_sz", F.size("_sh")))


def ngram_jaccard_pairs(df: DataFrame, id_col: str = "doc_id",
                        text_col: str = "text", n: int = 3,
                        threshold: float = 0.8,
                        max_shingle_freq: Optional[int] = None) -> DataFrame:
    """Exact Jaccard-similar pairs above `threshold`.

    Plan shape (scale-critical):
      explode shingles → (optional hot-shingle cap) → self-join on the
      shingle (equi-join, hash-partitioned by shingle) → groupBy (a, b)
      count shared → join back the two set sizes → filter on Jaccard.

    Candidate generation cost is Σ_s freq(s)², so `max_shingle_freq`
    matters on real corpora: a boilerplate shingle appearing in 1M docs
    would otherwise emit 10¹² pairs. Pairs that lose capped shingles can
    only be *under*-counted, which for high thresholds is the safe side.

    Set sizes ride along with the exploded rows so the pair aggregation
    needs no back-joins, and the length filter (J ≥ t ⟹
    max(|a|,|b|)/min(|a|,|b|) ≤ 1/t) prunes impossible pairs before the
    groupBy shuffle.
    """
    sh = shingle_sets(df, id_col, text_col, n)
    # Join on the 60-bit md5 hash of the shingle, not the string: the
    # self-join shuffle carries 8-byte keys instead of ~25-byte strings
    # and comparisons are integer equality. Distinct-per-doc is taken on
    # strings BEFORE hashing, so counts are identical to the string join
    # (up to md5 collisions, ~1e-12 for millions of shingles).
    # explode_OUTER + null-filter, not explode (r14, guide §2.4/§7.2):
    # a bare explode lets InferFiltersFromGenerate synthesize a
    # size(shingles)>0 filter that predicate-pushdown then sinks BELOW
    # the spread repartition — re-evaluating the whole shingle HOF
    # expression once in that filter (on the narrow pre-spread
    # partitioning) and again in the projection. The outer variant
    # admits no inferred filter; the one null row an empty doc emits is
    # dropped right after the generate. CONTRACT for every
    # explode_outer+isNotNull site in this repo (ADVICE r14): the
    # generator must never yield NULL ELEMENTS — plain explode would
    # emit them, the null-filter drops them. All current generators
    # (tokens, shingles, sequence(), struct arrays) are null-free by
    # construction; a future generator that can produce null elements
    # needs a different guard.
    ex = (sh.select("_id", "_sz", F.explode_outer("_sh").alias("_gs"))
          .where(F.col("_gs").isNotNull())
          .select("_id", "_sz", hash64("_gs").alias("_g")))
    # LAZY plan, no op-owned caches: each self-join side evaluates the
    # (cheap, JVM-expression) shingle subtree independently — Spark
    # cannot dedupe subtrees containing higher-order-function lambdas,
    # and both caching and a bucket-local collect_list pair expansion
    # measured slower than simply recomputing a scan-bound stage. The
    # hot cap is a MAP-SIDE-COMBINED aggregate + anti-join, NOT a
    # window count: a window over partitionBy(_g) has no partial
    # aggregation, so every row of the hottest gram would funnel into
    # one task just to be counted — the cap itself becoming a straggler
    # on exactly the skewed keys it exists to remove. The agg shrinks
    # hot keys map-side; the hot-key relation is usually tiny (only
    # grams above the cap), but it is corpus-derived and unbounded (a
    # low cap over a big corpus can make it huge), so no forced
    # broadcast hint — AQE converts the anti-join to broadcast from the
    # MEASURED size when it fits, same reasoning as q18's dropped hint.
    if max_shingle_freq is not None:
        hot = (ex.groupBy("_g").agg(F.count(F.lit(1)).alias("_freq"))
               .filter(F.col("_freq") > max_shingle_freq).select("_g"))
        ex = ex.join(hot, "_g", "left_anti")
    a = ex.select(F.col("_id").alias("a_id"),
                  F.col("_sz").alias("_asz"), "_g")
    b = ex.select(F.col("_id").alias("b_id"),
                  F.col("_sz").alias("_bsz"), "_g")
    return (a.join(b, "_g")
            .filter((F.col("a_id") < F.col("b_id")) &
                    (F.greatest("_asz", "_bsz") * F.lit(threshold) <=
                     F.least("_asz", "_bsz")))
            .groupBy("a_id", "b_id", "_asz", "_bsz")
            .agg(F.count(F.lit(1)).alias("_shared"))
            .withColumn("jaccard",
                        F.col("_shared").cast("double") /
                        (F.col("_asz") + F.col("_bsz") - F.col("_shared"))
                        .cast("double"))
            .filter(F.col("jaccard") >= threshold)
            .select("a_id", "b_id",
                    F.round("jaccard", 6).alias("jaccard")))


def ngram_containment_pairs(df: DataFrame, id_col: str = "doc_id",
                            text_col: str = "text", n: int = 3,
                            threshold: float = 0.8,
                            max_shingle_freq: Optional[int] = None
                            ) -> DataFrame:
    """Directed shingle CONTAINMENT pairs: (a_id, b_id, containment)
    with containment = |S_a ∩ S_b| / |S_a| ≥ threshold, a ≠ b — the
    asymmetric companion to `ngram_jaccard_pairs`. Jaccard misses the
    quote/inclusion case a curation pipeline cares about (a short doc
    embedded verbatim inside a much longer one has tiny Jaccard but
    containment ≈ 1); Broder's original resemblance paper defines both
    measures for exactly this reason.

    Plan shape: identical inverted-index equi-join as Jaccard (shared
    counts per unordered pair, sizes riding along), then each unordered
    pair expands into its ≤2 passing directions. One structural
    difference: Jaccard's length prune (max/min ≤ 1/t) is UNSOUND here
    — a 10-shingle doc can be fully contained in a 10⁶-shingle doc —
    so no length filter runs, and the hot-shingle cap is the only
    candidate bound (under-counts shared shingles: containment only
    ever drops, the safe side at high thresholds)."""
    sh = shingle_sets(df, id_col, text_col, n)
    # explode_outer + null-filter: see ngram_jaccard_pairs (avoids the
    # InferFiltersFromGenerate double-evaluation of the shingle HOF)
    ex = (sh.select("_id", "_sz", F.explode_outer("_sh").alias("_gs"))
          .where(F.col("_gs").isNotNull())
          .select("_id", "_sz", hash64("_gs").alias("_g")))
    if max_shingle_freq is not None:
        hot = (ex.groupBy("_g").agg(F.count(F.lit(1)).alias("_freq"))
               .filter(F.col("_freq") > max_shingle_freq).select("_g"))
        ex = ex.join(hot, "_g", "left_anti")
    a = ex.select(F.col("_id").alias("a_id"),
                  F.col("_sz").alias("_asz"), "_g")
    b = ex.select(F.col("_id").alias("b_id"),
                  F.col("_sz").alias("_bsz"), "_g")
    shared = (a.join(b, "_g")
              .filter(F.col("a_id") < F.col("b_id"))
              .groupBy("a_id", "b_id", "_asz", "_bsz")
              .agg(F.count(F.lit(1)).alias("_shared")))
    fwd = shared.select(
        "a_id", "b_id",
        (F.col("_shared") / F.col("_asz").cast("double"))
        .alias("containment"))
    rev = shared.select(
        F.col("b_id").alias("a_id"), F.col("a_id").alias("b_id"),
        (F.col("_shared") / F.col("_bsz").cast("double"))
        .alias("containment"))
    return (fwd.unionByName(rev)
            .filter(F.col("containment") >= threshold)
            .select("a_id", "b_id",
                    F.round("containment", 6).alias("containment")))


def boundary_stitch_pairs(df: DataFrame, id_col: str = "doc_id",
                          text_col: str = "text", k: int = 8
                          ) -> DataFrame:
    """Directed shard-boundary stitch candidates: (a_id, b_id,
    overlap_tokens) where the LAST ``overlap_tokens`` ≥ k tokens of A
    equal the FIRST tokens of B — the signature of one document split
    across extraction shards (a real ingestion defect: crawler/ETL
    shard boundaries cut documents mid-stream, and the halves then
    defeat both exact and near dedup because neither half resembles
    the whole). Downstream, pairs chain into stitch runs via the same
    connected-components used for dup clusters.

    overlap_tokens is the MAXIMAL overlap (extended from the k-token
    candidate key), so a caller can rank stitches by evidence
    strength. Docs with fewer than k tokens are out of scope.

    The overlap region is a SUFFIX of A but a PREFIX of B, so for
    overlap m > k the last k tokens of A do NOT equal the first k of
    B — a naive suffix_k = prefix_k key misses every stitch except
    m = k exactly. Candidates therefore come from an inverted index of
    A-side k-grams (one row per token position, 8-byte hash, no token
    array carried through the explode) equi-joined against each doc's
    k-PREFIX key: a k-gram at position p implies overlap m = n_a-p+1,
    verified by one array-slice equality on the (rare) joined pairs —
    token arrays re-join by id only for candidates. The gram side is
    O(total tokens) rows of (id, pos, hash), the same shuffle budget
    as a shingle pass; hot keys are bounded by how many docs SHARE a
    k-prefix (template preambles) — the per-pair output dedups by
    max(m)."""
    from ..functions.text import hash64, tokens
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    t = tokens(F.col("_text"))
    base = (_spread(df.select(F.col(id_col).alias("_id"),
                              F.col(text_col).alias("_text")))
            .select("_id", t.alias("_t"))
            .withColumn("_n", F.size("_t"))
            .where(F.col("_n") >= k))
    # hash every k-gram INSIDE the row (transform over positions) and
    # explode only (pos, hash) structs: exploding positions first and
    # hashing after would copy the full token array into every
    # generated row — O(tokens²) bytes per doc in the generate output
    gram_arr = F.transform(
        F.sequence(F.lit(1), F.col("_n") - k + 1),
        lambda p: F.struct(
            p.alias("pos"),
            hash64(F.concat_ws(" ", F.slice("_t", p, k))).alias("h")))
    grams = (base.select("_id", "_n",
                         F.explode_outer(gram_arr).alias("_ph"))
             .where(F.col("_ph").isNotNull())
             .select("_id", "_n", F.col("_ph.pos").alias("_pos"),
                     F.col("_ph.h").alias("_h")))
    pref = base.select(
        F.col("_id").alias("b_id"),
        hash64(F.concat_ws(" ", F.slice("_t", 1, k))).alias("_h"))
    cand = (grams.select(F.col("_id").alias("a_id"), "_n", "_pos", "_h")
            .join(pref, "_h")
            .where(F.col("a_id") != F.col("b_id"))
            .select("a_id", "b_id",
                    (F.col("_n") - F.col("_pos") + 1).alias("_m")))
    # verify on candidates only: re-join the RAW text by id and
    # tokenize AFTER the join, so the tokens expression sees candidate
    # rows — a tiny fraction of the corpus — instead of re-tokenizing
    # every doc on both verify sides (r14, guide §1.2; the same
    # candidates-only re-derivation minhash_lsh_pairs' verify uses).
    # The slice-equality test itself is the proof (the hash join
    # guarantees nothing).
    ta = df.select(F.col(id_col).alias("a_id"),
                   F.col(text_col).alias("_atxt"))
    tb = df.select(F.col(id_col).alias("b_id"),
                   F.col(text_col).alias("_btxt"))
    ok = (cand.join(ta, "a_id").join(tb, "b_id")
          .withColumn("_ta", tokens(F.col("_atxt")))
          .withColumn("_tb", tokens(F.col("_btxt")))
          .withColumn("_na", F.size("_ta"))
          .withColumn("_nb", F.size("_tb"))
          .where((F.col("_m") <= F.col("_nb"))
                 & (F.slice("_ta", F.col("_na") - F.col("_m") + 1,
                            F.col("_m"))
                    == F.slice("_tb", F.lit(1), F.col("_m")))))
    return (ok.groupBy("a_id", "b_id")
            .agg(F.max("_m").cast("long").alias("overlap_tokens")))


# --------------------------------------------------------------------------
# MinHash + LSH
# --------------------------------------------------------------------------

def minhash_signatures(df: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text", n: int = 3,
                       num_perm: int = 16) -> DataFrame:
    """One row per doc: mh_0..mh_{k-1} minhash signature columns.

    Single explode + single aggregation: all k permutation-mins are
    computed as k agg expressions over one pass (partial aggregation
    combines map-side, so shuffle rows = docs, not docs × shingles).
    """
    perms = MINHASH_PERMS[:num_perm]
    ex = (shingle_sets(df, id_col, text_col, n)
          .select("_id", F.explode_outer("_sh").alias("_g"))
          .where(F.col("_g").isNotNull())
          .withColumn("_h", hash64(F.col("_g")) % MINHASH_PRIME))
    aggs = [F.min((F.lit(a) * F.col("_h") + F.lit(b)) % MINHASH_PRIME)
            .alias(f"mh_{i}") for i, (a, b) in enumerate(perms)]
    return ex.groupBy("_id").agg(*aggs)


def band_buckets(sig: DataFrame, num_perm: int = 16, bands: int = 4,
                 id_col: str = "_id") -> DataFrame:
    """LSH band keys for a minhash signature relation: one
    (id, band, md5(joined band values)) row per band — the bucket
    identity both the batch pair-miner and the persistent incremental
    index share."""
    rows = num_perm // bands
    band_cols = []
    for bi in range(bands):
        key = F.md5(F.concat_ws(
            ",", *[F.col(f"mh_{bi * rows + r}").cast("string")
                   for r in range(rows)]))
        band_cols.append(F.struct(F.lit(bi).alias("band"),
                                  key.alias("key")).alias(f"b{bi}"))
    return (sig.select(id_col, F.explode(F.array(*band_cols)).alias("bk"))
            .select(id_col, "bk.band", "bk.key"))


def minhash_lsh_pairs(df: DataFrame, id_col: str = "doc_id",
                      text_col: str = "text", n: int = 3,
                      num_perm: int = 16, bands: int = 4,
                      threshold: float = 0.8,
                      max_bucket_size: int = 64) -> DataFrame:
    """Near-dup pairs: LSH candidate generation + exact Jaccard verify.

    Bands of rows=k/b signature values form bucket keys; docs sharing any
    band bucket become candidates (shuffle O(docs×bands)); candidates are
    verified with exact shingle-set Jaccard (array_intersect on the two
    docs' shingle arrays — only for candidate pairs, never all pairs).

    `max_bucket_size` bounds the per-bucket pair expansion: normal LSH
    buckets hold a handful of near-identical docs, but a degenerate
    real-corpus bucket — a million EXACT duplicates sharing every band —
    would otherwise collect the whole cluster into one aggregation row
    (executor OOM) before emitting O(n²) pairs. Buckets are clipped to
    their `max_bucket_size` smallest ids (array_sort before slice, so
    the kept subset is deterministic); pairs are lost only among docs
    that provably already share a full band — i.e. near-identical docs
    that exact-dedup-first (`dedup_exact`) or the transitive closure in
    `ops.graph.components` recovers. Row width is bounded at
    O(max_bucket_size), pair fan-out at O(max_bucket_size²) per bucket.
    """
    rows = num_perm // bands
    # LAZY plan, no op-owned caches. The JVM-expression shingle pass
    # (ngram_shingles — a lambda-bound higher-order function, no Python
    # workers) feeds ONLY signature generation (one pass); the
    # exact-Jaccard verify re-shingles just the candidate docs (a tiny
    # fraction of the corpus) by joining candidate ids back to the
    # source text — cheaper than caching corpus-wide shingle arrays
    # across consumers, and nothing is pinned in executor storage after
    # the op returns.
    sh = shingle_sets(df, id_col, text_col, n)
    ex = (sh.select("_id", F.explode_outer("_sh").alias("_g"))
          .where(F.col("_g").isNotNull())
          .withColumn("_h", hash64(F.col("_g")) % MINHASH_PRIME))
    perms = MINHASH_PERMS[:num_perm]
    aggs = [F.min((F.lit(a) * F.col("_h") + F.lit(b)) % MINHASH_PRIME)
            .alias(f"mh_{i}") for i, (a, b) in enumerate(perms)]
    sig = ex.groupBy("_id").agg(*aggs)
    buckets = band_buckets(sig, num_perm, bands)
    # Candidate pairs via per-bucket collect_list + in-bucket pair
    # expansion, NOT a bucket self-join: the self-join's two sides are
    # the whole signature subtree, and Spark cannot dedupe subtrees
    # containing higher-order-function lambdas (their canonical forms
    # differ), so the join shape computed every signature TWICE. A
    # same-band-key bucket holds near-identical docs — a handful of ids
    # by LSH construction — so the quadratic in-bucket expansion is
    # trivially small per group and the signature pipeline runs ONCE.
    ids = F.col("ids")
    pair_expand = F.flatten(F.transform(
        ids,
        lambda a, i: F.transform(
            F.slice(ids, i + F.lit(2),
                    F.greatest(F.size(ids) - i - 1, F.lit(0))),
            lambda b: F.struct(F.least(a, b).alias("a_id"),
                               F.greatest(a, b).alias("b_id")))))
    # Bucket-size cap as a two-phase distributed min-k: cap each
    # bucket's ids WITHIN each input partition first, then merge the
    # capped lists and cap again. min-k of the union of per-partition
    # min-ks IS the global min-k, so the result is exact and
    # deterministic under any partitioning — and, unlike a single
    # collect_list + slice, no aggregation row ever materializes more
    # than O(max_bucket_size × fan_in) ids even when a million exact
    # duplicates share every band. A degenerate bucket's first-phase
    # groups are spread across (band, key, partition) keys, so the cap
    # never concentrates the cluster into one straggler task.
    if max_bucket_size is None:
        # Uncapped single-phase shape: one shuffle, but a degenerate
        # bucket materializes whole in one aggregation row — only for
        # corpora already exact-deduped (see docstring).
        grouped = (buckets.groupBy("band", "key")
                   .agg(F.collect_list("_id").alias("ids")))
    else:
        local = (buckets
                 .groupBy("band", "key",
                          F.spark_partition_id().alias("_p"))
                 .agg(F.slice(F.array_sort(F.collect_list("_id")), 1,
                              max_bucket_size).alias("_ids")))
        grouped = (local.groupBy("band", "key")
                   .agg(F.slice(
                       F.array_sort(F.flatten(F.collect_list("_ids"))),
                       1, max_bucket_size).alias("ids")))
    cand = (grouped
            .filter(F.size("ids") >= 2)
            .select(F.explode_outer(pair_expand).alias("p"))
            .where(F.col("p").isNotNull())
            .select("p.a_id", "p.b_id").distinct())
    # Re-shingle ONLY the candidate docs: join the (small, by LSH
    # construction) candidate pair list against the raw text relation and
    # evaluate the shingle expression post-join, so it sees candidate
    # rows — a tiny fraction of the corpus — instead of caching
    # corpus-wide shingle arrays across consumers. `cand` is computed once (AQE
    # broadcasts it into both text scans); nothing is pinned in executor
    # storage after the op returns.
    ta = df.select(F.col(id_col).alias("a_id"),
                   F.col(text_col).alias("_atxt"))
    tb = df.select(F.col(id_col).alias("b_id"),
                   F.col(text_col).alias("_btxt"))
    j = (cand
         .join(ta, "a_id").join(tb, "b_id")
         .withColumn("_ash", ngram_shingles("_atxt", n))
         .withColumn("_bsh", ngram_shingles("_btxt", n))
         .withColumn("_asz", F.size("_ash"))
         .withColumn("_bsz", F.size("_bsh"))
         .withColumn("_shared",
                     F.size(F.array_intersect("_ash", "_bsh")))
         .withColumn("jaccard",
                     F.col("_shared").cast("double") /
                     (F.col("_asz") + F.col("_bsz") - F.col("_shared"))
                     .cast("double"))
         .filter(F.col("jaccard") >= threshold)
         .select("a_id", "b_id", F.round("jaccard", 6).alias("jaccard")))
    return j


# --------------------------------------------------------------------------
# Winnowing (rolling-hash fingerprint) partial-overlap detection
# --------------------------------------------------------------------------

def winnow_fingerprints(df: DataFrame, id_col: str = "doc_id",
                        text_col: str = "text", k: int = 8,
                        w: int = 4) -> DataFrame:
    """Winnowing document fingerprints (Schleimer, Wilkerson, Aiken:
    "Winnowing: Local Algorithms for Document Fingerprinting", SIGMOD
    2003): hash every character k-gram, slide a window of w consecutive
    hashes, select each window's minimum; the distinct selected hashes
    fingerprint the document. Any shared substring of length >= k+w-1
    contributes at least one common fingerprint, so PARTIAL overlap
    (quotes, boilerplate, containment) is detectable — which
    whole-document set-Jaccard dilutes away.

    Returns (_id, _f) — one row per distinct fingerprint. Docs with
    fewer than w k-grams keep all their gram hashes (standard
    winnowing fallback).

    r15 (guide §2.4 — remove shuffles outright): the per-window minima
    are an ARRAY EXPRESSION (`_winnow_fp_array`) over the once-bound
    gram-hash array instead of posexplode + rows-between window — the
    previous shape shuffled and sorted EVERY k-gram of the corpus
    (O(corpus chars) rows through one exchange) just to take a
    4-element sliding minimum. slice/array_min operate on the
    bind_once lambda variable, so each gram is still hashed exactly
    once per row (the O(m²) rehash kgram_hashes warns about does not
    apply to a bound array); per-doc distinct becomes array_distinct.
    Equivalence pinned by test_winnow_fingerprints_shape,
    test_winnow_overlap_* and the doc_winnow_overlap_pairs oracle.
    """
    return (_spread(df)
            .select(F.col(id_col).alias("_id"),
                    _winnow_fp_array(text_col, k, w).alias("_fs"))
            .select("_id", F.explode_outer("_fs").alias("_f"))
            .where(F.col("_f").isNotNull()))


def _winnow_fp_array(text_col, k: int, w: int):
    """Distinct winnowing fingerprints as one array expression:
    min of each w-wide window over the k-gram hash array (all gram
    hashes when fewer than w grams exist)."""
    from ..functions.text import bind_once

    def _build(g):
        m = F.size(g)
        mins = F.transform(
            F.sequence(F.lit(1), m - w + 1),
            lambda i: F.array_min(F.slice(g, i, w)))
        # sequence() counts DOWN when m-w+1 < 1 — the when() guard
        # keeps the mins branch unevaluated for short docs
        return F.array_distinct(F.when(m >= w, mins).otherwise(g))

    return bind_once(kgram_hashes(text_col, k), _build)


def winnow_overlap_pairs(df: DataFrame, id_col: str = "doc_id",
                         text_col: str = "text", k: int = 8, w: int = 4,
                         min_shared: int = 5,
                         max_fp_freq: Optional[int] = None) -> DataFrame:
    """Pairs of documents sharing >= `min_shared` winnowing fingerprints
    — catches PARTIAL overlap (shared quotes, boilerplate, containment)
    that whole-document Jaccard dilutes away.

    Same inverted-index shape as `ngram_jaccard_pairs`: the (already
    ~1/w winnowed, distinct) fingerprints self-join on the fingerprint,
    shared counts aggregate per pair. `max_fp_freq` caps ubiquitous
    fingerprints (boilerplate appearing in thousands of docs) so one hot
    key can't create an O(n²) bucket at corpus scale. Output `overlap`
    is the Jaccard of the two fingerprint SETS (deterministic, rounded).
    """
    # Set size as size(_fs) on the SAME row (r15): the previous
    # groupBy(_id)+join-back re-aggregated and re-shuffled the
    # fingerprint relation just to attach a count the array expression
    # already knows — two more exchanges gone (guide §2.4). _sz stays
    # the FULL (pre-cap) fingerprint-set size, as before.
    ex = (_spread(df)
          .select(F.col(id_col).alias("_id"),
                  _winnow_fp_array(text_col, k, w).alias("_fs"))
          .select("_id", F.size("_fs").alias("_sz"),
                  F.explode_outer("_fs").alias("_f"))
          .where(F.col("_f").isNotNull()))
    if max_fp_freq is not None:
        hot = (ex.groupBy("_f").count()
               .filter(F.col("count") > max_fp_freq).select("_f"))
        ex = ex.join(hot, "_f", "left_anti")
    a = ex.select(F.col("_id").alias("a_id"), F.col("_sz").alias("_asz"),
                  "_f")
    b = ex.select(F.col("_id").alias("b_id"), F.col("_sz").alias("_bsz"),
                  "_f")
    return (a.join(b, "_f")
            .filter(F.col("a_id") < F.col("b_id"))
            .groupBy("a_id", "b_id", "_asz", "_bsz")
            .agg(F.count(F.lit(1)).alias("shared"))
            .filter(F.col("shared") >= min_shared)
            .select("a_id", "b_id", F.col("shared").cast("long"),
                    F.round(F.col("shared").cast("double") /
                            (F.col("_asz") + F.col("_bsz") -
                             F.col("shared")).cast("double"), 6)
                    .alias("overlap")))


# --------------------------------------------------------------------------
# SimHash
# --------------------------------------------------------------------------

SIMHASH_BITS = 60          # hash64 yields 60 usable bits (15 hex chars)
SIMHASH_BAND_BITS = 15     # 4 bands × 15 bits


def simhash(df: DataFrame, id_col: str = "doc_id",
            text_col: str = "text") -> DataFrame:
    """60-bit SimHash per doc (token-frequency weighted).

    explode tokens → one aggregation with 60 per-bit vote sums (map-side
    combined) → recombine votes into a single BIGINT. One shuffle keyed
    by doc id.
    """
    ex = (_spread(df).select(F.col(id_col).alias("_id"),
                             F.explode_outer(tokens(text_col)).alias("_t"))
          .where(F.col("_t").isNotNull())
          .withColumn("_h", hash64(F.col("_t"))))
    votes = [F.sum(F.when(F.shiftright("_h", j).bitwiseAND(F.lit(1)) == 1,
                          1).otherwise(-1)).alias(f"v{j}")
             for j in range(SIMHASH_BITS)]
    agg = ex.groupBy("_id").agg(*votes)
    sim: Column = F.lit(0).cast("long")
    for j in range(SIMHASH_BITS):
        sim = sim + F.when(F.col(f"v{j}") > 0,
                           F.lit(1 << j).cast("long")).otherwise(F.lit(0))
    return agg.select("_id", sim.alias("simhash"))


def simhash_pairs(df: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text",
                  max_hamming: int = 9,
                  max_bucket_size: int = 64) -> DataFrame:
    """Near-dup pairs with Hamming distance ≤ max_hamming.

    Band join: 4 chunks of 15 bits; by pigeonhole any pair within
    Hamming 3·(bands-1) shares some chunk SOMETIMES — for guaranteed
    recall at distance d you need d < bands; here bands=4 guarantees
    recall for d ≤ 3 and probabilistically catches larger d. Verification
    is exact bit_count(xor).

    `max_bucket_size` clips degenerate buckets (a huge exact-duplicate
    cluster sharing every 15-bit chunk) to their smallest ids via the
    same two-phase distributed min-k as `minhash_lsh_pairs` — exact,
    deterministic, and O(max_bucket_size)-bounded row width; pairs are
    lost only among docs already provably chunk-identical.
    """
    sh = simhash(df, id_col, text_col)
    chunks = F.array(*[
        F.struct(F.lit(i).alias("band"),
                 F.shiftright("simhash", i * SIMHASH_BAND_BITS)
                 .bitwiseAND(F.lit((1 << SIMHASH_BAND_BITS) - 1))
                 .alias("key"))
        for i in range(SIMHASH_BITS // SIMHASH_BAND_BITS)])
    b = (sh.select("_id", "simhash", F.explode(chunks).alias("c"))
         .select("_id", "simhash", "c.band", "c.key"))
    # Candidates via per-bucket collect_list + in-bucket pair expansion
    # (see minhash_lsh_pairs): a band self-join's two sides are the
    # whole signature subtree, which contains higher-order-function
    # lambdas (tokens()) that Spark cannot canonicalize — the join shape
    # computed every signature twice. Same-chunk buckets hold few,
    # near-identical docs, so the quadratic expansion is tiny per group
    # and the signature aggregation runs ONCE.
    ds = F.col("ds")
    pair_expand = F.flatten(F.transform(
        ds,
        lambda a, i: F.transform(
            F.slice(ds, i + F.lit(2),
                    F.greatest(F.size(ds) - i - 1, F.lit(0))),
            lambda x: F.struct(
                F.least(a["_id"], x["_id"]).alias("a_id"),
                F.greatest(a["_id"], x["_id"]).alias("b_id"),
                F.bit_count(a["simhash"].bitwiseXOR(x["simhash"]))
                .alias("hamming")))))
    # Two-phase min-k bucket cap (struct arrays sort by _id first, so
    # the kept subset is the smallest ids — see minhash_lsh_pairs).
    if max_bucket_size is None:
        grouped = (b.groupBy("band", "key")
                   .agg(F.collect_list(F.struct("_id", "simhash"))
                        .alias("ds")))
    else:
        local = (b.groupBy("band", "key",
                           F.spark_partition_id().alias("_p"))
                 .agg(F.slice(F.array_sort(
                     F.collect_list(F.struct("_id", "simhash"))), 1,
                     max_bucket_size).alias("_ds")))
        grouped = (local.groupBy("band", "key")
                   .agg(F.slice(
                       F.array_sort(F.flatten(F.collect_list("_ds"))),
                       1, max_bucket_size).alias("ds")))
    return (grouped
            .filter(F.size("ds") >= 2)
            .select(F.explode_outer(pair_expand).alias("p"))
            .where(F.col("p").isNotNull())
            .select("p.a_id", "p.b_id", "p.hamming")
            .distinct()
            .filter(F.col("hamming") <= max_hamming))


# ---------------------------------------------------------------------------
# Boilerplate chunk removal (sub-document dedup)
# ---------------------------------------------------------------------------

def doc_chunks(df: DataFrame, id_col: str = "doc_id",
               text_col: str = "text", chunk_tokens: int = 10) -> DataFrame:
    """(doc_id, pos, chunk): consecutive ``chunk_tokens``-token windows of
    each document, position-ordered. The sub-document unit for
    boilerplate detection — the C4/CCNet recipe dedups LINES across the
    corpus; our synthetic docs have no newlines, so the deterministic
    stand-in unit is the fixed-width token chunk (a trailing short chunk
    is kept). One codegen'd expression, no Python."""
    toks = tokens(F.col(text_col))
    n_chunks = F.ceil(F.size(toks) / F.lit(chunk_tokens)).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.concat_ws(
            " ", F.slice(toks, i * chunk_tokens + 1, chunk_tokens)))
    return (_spread(df).where(F.size(toks) > 0)
            .select(F.col(id_col).alias("doc_id"),
                    F.posexplode(chunks).alias("pos", "chunk")))


def boilerplate_chunks(df: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text", chunk_tokens: int = 10,
                       min_docs: int = 2) -> DataFrame:
    """(chunk, n_docs): chunks occurring in ≥ min_docs DISTINCT documents
    — corpus-level boilerplate (headers, footers, license banners). The
    aggregate is distinct-doc counting per chunk; this REPORTING variant
    keys by the chunk text so callers see the strings —
    `remove_boilerplate` keys its internal pipeline by hash64(chunk)
    instead (8-byte shuffle keys)."""
    ch = doc_chunks(df, id_col, text_col, chunk_tokens).dropDuplicates(
        ["doc_id", "chunk"])
    return (ch.groupBy("chunk")
            .agg(F.count(F.lit(1)).alias("n_docs"))
            .where(F.col("n_docs") >= min_docs))


def remove_boilerplate(df: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text", chunk_tokens: int = 10,
                       min_docs: int = 2) -> DataFrame:
    """Documents with boilerplate chunks stripped: chunks appearing in ≥
    min_docs distinct docs are dropped, survivors re-joined in position
    order. Returns (doc_id, text) with empty docs removed.

    Plan shape: chunk explode → left_anti join against the (small)
    boilerplate relation → groupBy doc reassembly ordered by pos. The
    boilerplate side is a corpus-frequency aggregate, broadcast when it
    fits; the reassembly is one shuffle by doc_id. Every chunk-keyed
    step (the distinct, the frequency aggregate, the anti-join) is
    keyed by hash64(chunk) — 8-byte md5-derived keys instead of
    ~50-byte chunk strings, deterministic across engines; the strings
    themselves only travel in the doc_id-keyed reassembly shuffle."""
    ch = doc_chunks(df, id_col, text_col, chunk_tokens).withColumn(
        "_ck", hash64("chunk"))
    bp = (ch.dropDuplicates(["doc_id", "_ck"])
          .groupBy("_ck").agg(F.count(F.lit(1)).alias("_n"))
          .where(F.col("_n") >= min_docs))
    kept = ch.join(F.broadcast(bp.select("_ck")), "_ck", "left_anti")
    return (kept.groupBy("doc_id")
            .agg(F.concat_ws(
                " ", F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "chunk"))),
                    lambda s: s.getField("chunk"))).alias("text"))
            .where(F.length("text") > 0))


def dedup_chunks_keep_first(df: DataFrame, id_col: str = "doc_id",
                            text_col: str = "text",
                            chunk_tokens: int = 10) -> DataFrame:
    """Corpus-level chunk dedup keeping the FIRST occurrence — the
    CCNet/RefinedWeb line-dedup recipe (Wenzek et al. 2020 §3.1;
    Penedo et al. 2023): every repeated chunk keeps only its globally
    first instance (lowest (doc_id, pos)); later instances are
    stripped. Differs from `remove_boilerplate`, which drops ALL
    instances of frequent chunks — here one copy of repeated text
    always survives, the usual pass run BEFORE document-level dedup.

    Returns (doc_id, text); docs that lose every chunk drop out.

    Plan shape: chunk explode keyed by hash64(chunk) → one map-side-
    combined min(struct(doc_id, pos)) per chunk → equi-join back on
    the 8-byte key (a shuffle join, NOT broadcast: the winner relation
    is distinct-chunk-sized, i.e. corpus-scale) → keep instances equal
    to their chunk's winner → one doc_id-keyed reassembly shuffle.
    Strings travel only in the reassembly; every chunk-keyed exchange
    carries md5-derived 8-byte keys."""
    ch = doc_chunks(df, id_col, text_col, chunk_tokens).withColumn(
        "_ck", hash64("chunk"))
    win = ch.groupBy("_ck").agg(
        F.min(F.struct("doc_id", "pos")).alias("_w"))
    kept = (ch.join(win, "_ck")
            .where((F.col("doc_id") == F.col("_w.doc_id")) &
                   (F.col("pos") == F.col("_w.pos"))))
    return (kept.groupBy("doc_id")
            .agg(F.concat_ws(
                " ", F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "chunk"))),
                    lambda s: s.getField("chunk"))).alias("text"))
            .where(F.length("text") > 0))


# ---------------------------------------------------------------------------
# Benchmark decontamination (train/eval n-gram overlap)
# ---------------------------------------------------------------------------

def contamination_report(train: DataFrame, eval_df: DataFrame, n: int = 3,
                         id_col: str = "doc_id",
                         text_col: str = "text") -> DataFrame:
    """Training documents that share word n-grams with an evaluation set
    — the GPT-3-style decontamination check (Brown et al. 2020, §C) run
    before training: any train doc overlapping a benchmark document is
    flagged (and usually dropped).

    Returns (doc_id, n_shared_ngrams, n_eval_docs): per contaminated
    TRAIN document, how many distinct n-grams it shares with the eval
    set and how many distinct eval documents those grams appear in.

    Scale shape: distinct n-grams per doc on both sides (JVM-expression
    shingle pass), then an equi-join on the gram. The eval side is a
    benchmark suite — thousands of docs, not billions — so its gram
    relation is broadcast: the train corpus is scanned once with a
    map-side hash join, no shuffle of the 100 TB side. For an eval set
    too big to broadcast, drop the hint and it degrades to one
    sort-merge join keyed by gram.
    """
    tg = (_spread(train).select(F.col(id_col).alias("doc_id"),
                                F.explode_outer(
                                    ngram_shingles(F.col(text_col), n))
                       .alias("g"))
          .where(F.col("g").isNotNull()))
    eg = (eval_df.select(F.col(id_col).alias("_eval_id"),
                         F.explode_outer(ngram_shingles(F.col(text_col), n))
                         .alias("g"))
          .where(F.col("g").isNotNull()))
    hits = tg.join(F.broadcast(eg), "g")
    return (hits.groupBy("doc_id")
            .agg(F.countDistinct("g").alias("n_shared_ngrams"),
                 F.countDistinct("_eval_id").alias("n_eval_docs")))


# --------------------------------------------------------------------------
# Corpus-composition capping and incremental (cross-batch) dedup
# --------------------------------------------------------------------------

def cap_per_group(df: DataFrame, group_col: str = "source",
                  cap: int = 10, id_col: str = "doc_id",
                  rank_col: str = "n_chars") -> DataFrame:
    """Keep at most ``cap`` documents per group (domain/source), ranked by
    (``rank_col`` DESC, ``id_col`` ASC) — the standard corpus-composition
    guard against any single domain dominating training data.

    Two-phase top-cap (same exactness argument as the LSH bucket min-k):
    a per-INPUT-partition window keeps each group's local top ``cap``
    first, then the global window ranks only the survivors. The global
    top-cap of a group is a subset of the union of its per-partition
    top-caps, so the result is exactly the single-window answer — but a
    mega-domain (a billion rows of one source) contributes at most
    ``cap × partitions`` rows to the group-keyed shuffle instead of its
    full row count, and no single task ever sorts the whole domain: the
    phase-1 exchange is keyed (group, input-partition-id) — the salted
    shape, evenly spread — and phase 2 shuffles only survivors.
    Reference parity: none — §7 extension.
    """
    pid = F.spark_partition_id()
    w_local = Window.partitionBy(group_col, pid.alias("_p")).orderBy(
        F.desc(rank_col), F.asc(id_col))
    pre = (df.withColumn("_lrk", F.row_number().over(w_local))
           .where(F.col("_lrk") <= cap)
           .drop("_lrk"))
    w = Window.partitionBy(group_col).orderBy(
        F.desc(rank_col), F.asc(id_col))
    return (pre.withColumn("_rk", F.row_number().over(w))
            .where(F.col("_rk") <= cap)
            .drop("_rk"))


def build_fingerprint_index(docs: DataFrame, index_path: str,
                            id_col: str = "doc_id",
                            text_col: str = "text",
                            mode: str = "overwrite") -> int:
    """Materialize a persistent exact-dedup index: one row per distinct
    content fingerprint with the first-seen doc id, stored as a Delta
    table. The index is what makes dedup INCREMENTAL: later ingests
    anti-join against it instead of re-scanning the historical corpus.
    Returns the committed version."""
    from ..table import DeltaTable
    fps = (with_fingerprint(docs, text_col)
           .groupBy("fp").agg(F.min(id_col).alias("first_" + id_col)))
    t = DeltaTable.for_path(docs.sparkSession, index_path)
    return t.write(fps, mode=mode)


def ingest_dedup(new_docs: DataFrame, index_path: str,
                 id_col: str = "doc_id", text_col: str = "text",
                 update_index: bool = True) -> DataFrame:
    """Incremental exact dedup for a streaming/batched ingestion
    pipeline: accept only documents whose content fingerprint is BOTH
    unseen in the persistent index AND first (min id) within this batch,
    then append the accepted fingerprints to the index so the next batch
    dedups against them.

    Plan shape: one hash aggregation for the in-batch keep-first, one
    anti-join against the index scan on the md5 fingerprint (uniform
    keys — no skew at any scale; Spark broadcasts the smaller side when
    it fits, hash-shuffles otherwise). The historical corpus is never
    re-read — the index is O(distinct contents) and itself a Delta
    table, so the whole loop is transactional.
    Reference parity: none — §7 extension.
    """
    from ..table import DeltaTable
    spark = new_docs.sparkSession
    fp_docs = with_fingerprint(new_docs, text_col)
    first = (fp_docs.groupBy("fp").agg(F.min(id_col).alias("_first_id")))
    in_batch = (fp_docs.join(first, "fp")
                .where(F.col(id_col) == F.col("_first_id"))
                .drop("_first_id"))
    index = DeltaTable.for_path(spark, index_path).to_df()
    accepted = in_batch.join(index.select("fp"), "fp", "left_anti")
    if update_index:
        new_fps = accepted.select(
            "fp", F.col(id_col).alias("first_" + id_col))
        DeltaTable.for_path(spark, index_path).write(new_fps, mode="append")
    return accepted.drop("fp")


def build_minhash_index(docs: DataFrame, index_path: str,
                        id_col: str = "doc_id", text_col: str = "text",
                        n: int = 3, num_perm: int = 16,
                        mode: str = "overwrite") -> int:
    """Seed the persistent near-dup index: one row per document with
    its minhash signature (id, mh_0..mh_{k-1}) in a Delta table. The
    index is O(corpus docs) x k small ints — the raw text never needs
    re-reading to dedup future batches against history."""
    from ..table import DeltaTable
    sigs = minhash_signatures(docs, id_col, text_col, n, num_perm) \
        .withColumnRenamed("_id", id_col)
    t = DeltaTable.for_path(docs.sparkSession, index_path)
    return t.write(sigs, mode=mode)


def ingest_neardup(new_docs: DataFrame, index_path: str,
                   threshold: float = 0.5, id_col: str = "doc_id",
                   text_col: str = "text", n: int = 3,
                   num_perm: int = 16, bands: int = 4,
                   update_index: bool = True) -> DataFrame:
    """Incremental NEAR-dup ingestion against a persistent minhash
    index (`build_minhash_index`) — the fuzzy sibling of
    `ingest_dedup`: a new document is rejected when

    - it shares an LSH band bucket with a HISTORICAL doc whose
      signature agrees on ≥ ceil(threshold·num_perm) permutations
      (the minhash Jaccard estimate — history's raw text is never
      re-read, only the k-int signatures), or
    - it est-matches an earlier (smaller-id) document of ITS OWN
      batch the same way (deterministic keep-first; chains over-reject
      slightly vs a sequential greedy pass, documented trade).

    Accepted docs' signatures append to the index so the next batch
    dedups against them — the continuous-curation loop at corpus
    scale. Plan shape: candidate generation is bucket-equality joins
    on (band, md5 key) — never all-pairs; verification joins tiny
    signature relations; history text is never read.
    Reference parity: none — §7 extension (MinHash: Broder 1997).
    """
    import math

    from ..table import DeltaTable
    spark = new_docs.sparkSession
    min_match = math.ceil(threshold * num_perm)
    sigs = minhash_signatures(new_docs, id_col, text_col, n, num_perm)
    hist = DeltaTable.for_path(spark, index_path).to_df()
    nb = band_buckets(sigs, num_perm, bands)
    hb = band_buckets(hist.withColumnRenamed(id_col, "_id"),
                      num_perm, bands).withColumnRenamed("_id", "_hid")
    agree = sum(F.when(F.col(f"am_{j}") == F.col(f"bm_{j}"), 1)
                .otherwise(0) for j in range(num_perm))
    a_side = sigs.select(F.col("_id"),
                         *[F.col(f"mh_{j}").alias(f"am_{j}")
                           for j in range(num_perm)])
    h_side = hist.select(F.col(id_col).alias("_hid"),
                         *[F.col(f"mh_{j}").alias(f"bm_{j}")
                           for j in range(num_perm)])
    rej_hist = (nb.join(hb, ["band", "key"])
                .select("_id", "_hid").distinct()
                .join(a_side, "_id").join(h_side, "_hid")
                .where(agree >= min_match)
                .select("_id").distinct())
    b_side = sigs.select(F.col("_id").alias("_bid"),
                         *[F.col(f"mh_{j}").alias(f"bm_{j}")
                           for j in range(num_perm)])
    cand_b = (nb.join(nb.select(F.col("_id").alias("_bid"),
                                "band", "key"), ["band", "key"])
              .where(F.col("_id") < F.col("_bid"))
              .select("_id", "_bid").distinct())
    rej_batch = (cand_b.join(a_side, "_id")
                 .join(b_side, "_bid")
                 .where(agree >= min_match)
                 .select(F.col("_bid").alias("_id")).distinct())
    rejected = rej_hist.unionByName(rej_batch).distinct()
    accepted = new_docs.join(
        rejected.withColumnRenamed("_id", id_col), id_col, "left_anti")
    if update_index:
        acc_sigs = (sigs.join(rejected, "_id", "left_anti")
                    .withColumnRenamed("_id", id_col))
        DeltaTable.for_path(spark, index_path).write(acc_sigs,
                                                     mode="append")
    return accepted


# ---------------------------------------------------------------------------
# Content-defined chunking (shift-resistant sub-document dedup)
# ---------------------------------------------------------------------------

def cdc_chunks(df: DataFrame, id_col: str = "doc_id",
               text_col: str = "text", divisor: int = 8) -> DataFrame:
    """(doc_id, cid, chunk, n_tok): content-defined chunks — a token
    CLOSES its chunk when hash64(token) % divisor == 0, so boundaries
    follow content, not position (LBFS/FastCDC rationale: an insertion
    near the head of a document shifts every fixed-width chunk but
    leaves every content-defined chunk after the next boundary
    byte-identical, which is what makes sub-document dedup survive
    edits). Expected chunk length is ``divisor`` tokens; no min/max
    clamp, so the rule stays a pure per-token predicate both engines
    evaluate identically.

    Plan shape: ZERO shuffles — boundary positions, chunk spans, and
    chunk strings are all one narrow array expression over the token
    array (slice per span), posexploded into chunk rows. The
    explode+window+reassemble formulation this replaces would shuffle
    the whole corpus by doc_id twice just to rebuild strings that
    were adjacent in the source row all along. No Python."""
    def _build(tk):
        bpos = F.filter(
            F.sequence(F.lit(1), F.size(tk)),
            lambda i: hash64(F.element_at(tk, i)) % divisor == 0)
        starts = F.concat(F.array(F.lit(1)),
                          F.transform(bpos, lambda b: b + 1))
        ends = F.concat(bpos, F.array(F.size(tk)))
        spans = F.filter(
            F.zip_with(starts, ends,
                       lambda s, e: F.struct(s.alias("s"),
                                             e.alias("e"))),
            lambda p: p.getField("s") <= p.getField("e"))
        return F.transform(
            spans,
            lambda p: F.struct(
                F.concat_ws(" ", F.slice(
                    tk, p.getField("s"),
                    p.getField("e") - p.getField("s") + 1))
                .alias("chunk"),
                (p.getField("e") - p.getField("s") + 1).cast("bigint")
                .alias("n_tok")))

    tk = tokens(F.col(text_col))
    chunks = F.when(
        F.size(tk) >= 1,   # sequence(1, 0) counts DOWN, guard empties
        bind_once(tk, _build))
    # no _spread here: this op's pinned contract is ZERO shuffles
    # (content-defined chunking at scan speed — test_plans
    # test_cdc_chunking_is_fully_narrow); callers that need width
    # spread their own input
    return (df.select(F.col(id_col).alias("doc_id"),
                      F.posexplode(chunks).alias("cid", "c"))
            .select("doc_id", F.col("cid").cast("bigint").alias("cid"),
                    "c.chunk", "c.n_tok"))


def cdc_dedup_stats(df: DataFrame, id_col: str = "doc_id",
                    text_col: str = "text",
                    divisor: int = 8) -> DataFrame:
    """Per-document duplicate-content accounting at content-defined
    chunk granularity: a chunk instance is a duplicate when an
    identical chunk occurs earlier in global (doc_id, cid) order — the
    storage-dedup / ExactSubstr-style signal (Lee et al. 2021) at
    chunk resolution, robust to token insertions unlike fixed-width
    chunks. Returns (doc_id, n_chunks, dup_chunks, n_tok, dup_tok,
    dup_token_ratio).

    Plan shape: chunk fingerprints are hash64 8-byte keys; first
    occurrence is one row_number window per key (per-key row counts
    are duplicate multiplicities — bounded skew, same profile as
    dedup_chunks_keep_first's min-struct), then one doc_id
    re-aggregate. Chunk strings never leave the reassembly stage."""
    ch = cdc_chunks(df, id_col, text_col, divisor).withColumn(
        "_ck", hash64("chunk"))
    rn = F.row_number().over(
        Window.partitionBy("_ck").orderBy("doc_id", "cid"))
    flagged = ch.select(
        "doc_id", "n_tok", (rn > 1).cast("int").alias("_dup"))
    return (flagged.groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n_chunks"),
                 F.sum("_dup").cast("bigint").alias("dup_chunks"),
                 F.sum("n_tok").alias("n_tok"),
                 F.sum(F.col("_dup") * F.col("n_tok"))
                 .cast("bigint").alias("dup_tok"),
                 F.round(F.sum(F.col("_dup") * F.col("n_tok"))
                         .cast("double") / F.sum("n_tok"), 6)
                 .alias("dup_token_ratio")))


def neardup_decontaminate(train: DataFrame, eval_df: DataFrame,
                          n: int = 3, num_perm: int = 16,
                          bands: int = 4, threshold: float = 0.5,
                          id_col: str = "doc_id",
                          text_col: str = "text") -> DataFrame:
    """NEAR-duplicate benchmark decontamination: train documents whose
    shingle-set Jaccard against any eval document clears ``threshold``
    — the paraphrase-robust complement of `contamination_report`,
    whose exact n-gram matching misses lightly reworded benchmark
    leakage (the Llama/GPT-4 era decontamination reports run both).

    Returns (doc_id, n_eval_matches, max_jaccard) per flagged TRAIN
    doc, max_jaccard rounded to 6.

    Scale shape: both sides run the shared MinHash pipeline
    (minhash_signatures → band_buckets; map-side-combined signature
    agg). Candidates come from a band-bucket equi-join where the EVAL
    side is broadcast — a benchmark suite is thousands of docs, so its
    bucket relation is dimension-sized; the 100 TB train side streams
    through a map-side hash join and only candidate rows (bounded by
    LSH construction) reach the exact-Jaccard verify, which
    re-shingles just those docs. Never all-pairs, never a corpus
    shuffle keyed by bucket."""
    tb = band_buckets(
        minhash_signatures(train, id_col, text_col, n, num_perm),
        num_perm, bands).withColumnRenamed("_id", "_tid")
    eb = band_buckets(
        minhash_signatures(eval_df, id_col, text_col, n, num_perm),
        num_perm, bands).withColumnRenamed("_id", "_eid")
    cand = (tb.join(F.broadcast(eb), ["band", "key"])
            .select("_tid", "_eid").distinct())
    tt = train.select(F.col(id_col).alias("_tid"),
                      ngram_shingles(F.col(text_col), n).alias("_tsh"))
    et = eval_df.select(F.col(id_col).alias("_eid"),
                        ngram_shingles(F.col(text_col), n).alias("_esh"))
    j = (cand.join(tt, "_tid").join(F.broadcast(et), "_eid")
         .withColumn("_c", F.size(F.array_intersect("_tsh", "_esh")))
         .withColumn("jaccard",
                     F.col("_c").cast("double") /
                     (F.size("_tsh") + F.size("_esh") - F.col("_c"))
                     .cast("double"))
         .filter(F.col("jaccard") >= threshold))
    return (j.groupBy(F.col("_tid").alias("doc_id"))
            .agg(F.count(F.lit(1)).alias("n_eval_matches"),
                 F.round(F.max("jaccard"), 6).alias("max_jaccard")))
