"""Distributed k-means (Lloyd's algorithm) over embedding columns —
the clustering substrate for SemDeDup-style semantic dedup (Abbas et
al. 2023: cluster embeddings, then near-dup within clusters) and for
IVF-style partitioned ANN layouts.

Reference parity: none (delta-io/connectors has no vector operators);
§7 extension.

Execution model — the textbook distributed Lloyd iteration:

- **Assignment** is embarrassingly parallel: the k×dim centroid matrix
  is closed over by an Arrow-batched pandas UDF (one numpy matmul per
  batch, no shuffle, no JVM↔Python per-row crossings).
- **Update** is one map-side-combined aggregation: posexplode the
  vector, groupBy (cluster, dim), avg. Shuffle volume is O(rows × dim)
  counts, combined to k×dim partial sums per task before the exchange.
- The k×dim centroid matrix (tiny — 8×64 here, ≤ MBs for real k) is
  collected to the driver between iterations; that driver sync per
  iteration is inherent to Lloyd and independent of corpus size.

Determinism (what makes the DuckDB oracle hash-match): init centroids
are the k lowest-id vectors (no RNG); distances and updated centroids
are rounded to 6 decimals before use, so double summation order across
engines/partitions cannot flip an argmin; ties break to the lowest
cluster id.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _assign_col(vec_col: str, cents: np.ndarray):
    """(cluster, dist) struct column: index of the nearest centroid by
    squared L2 distance rounded to 6 places, ties to the lowest id."""
    from pyspark.sql.types import (IntegerType, DoubleType, StructField,
                                   StructType)

    out_t = StructType([StructField("cluster", IntegerType()),
                        StructField("dist", DoubleType())])
    c = cents.copy()

    @F.pandas_udf(out_t)
    def _assign(vs: pd.Series) -> pd.DataFrame:
        mat = np.array(vs.tolist(), dtype=np.float64)
        # ||v-c||² per (row, centroid); rounded so cross-engine
        # summation-order noise (~1e-13) can't flip the argmin.
        d = ((mat[:, None, :] - c[None, :, :]) ** 2).sum(axis=2).round(6)
        cl = d.argmin(axis=1)  # first (lowest) index wins ties
        return pd.DataFrame({"cluster": cl.astype("int32"),
                             "dist": d[np.arange(len(cl)), cl]})

    return _assign(F.col(vec_col))


def _update_centroids(assigned: DataFrame, vec_col: str,
                      prev: np.ndarray) -> np.ndarray:
    """One Lloyd update: per-(cluster, dim) mean over assigned vectors,
    rounded to 6; clusters that lost every point keep their previous
    centroid (standard empty-cluster policy)."""
    rows = (assigned
            .select("cluster",
                    F.posexplode(F.col(vec_col).cast("array<double>"))
                    .alias("dim", "v"))
            .groupBy("cluster", "dim")
            .agg(F.round(F.avg("v"), 6).alias("c"))
            .collect())
    nxt = prev.copy()
    for r in rows:
        nxt[r["cluster"], r["dim"]] = r["c"]
    return nxt


def kmeans_fit(df: DataFrame, k: int = 8, iters: int = 2,
               id_col: str = "vec_id",
               vec_col: str = "embedding") -> Tuple[np.ndarray, DataFrame]:
    """Run `iters` Lloyd iterations from the k lowest-id vectors.

    Returns (centroids, assignments) where assignments is
    (id_col, cluster, dist) under the FINAL centroids. The input is
    scanned iters+1 times (once per assignment pass plus the final
    labeling); callers clustering a hot corpus should `.cache()` it.
    """
    init = sorted(df.select(id_col, vec_col).orderBy(id_col).limit(k)
                  .collect(), key=lambda r: r[id_col])
    if len(init) < k:
        raise ValueError(f"k={k} but only {len(init)} vectors")
    cents = np.array([r[vec_col] for r in init], dtype=np.float64)
    for _ in range(iters):
        assigned = df.select(
            F.col(id_col),
            _assign_col(vec_col, cents)["cluster"].alias("cluster"),
            F.col(vec_col))
        cents = _update_centroids(assigned, vec_col, cents)
    final = df.select(
        F.col(id_col),
        _assign_col(vec_col, cents).alias("_a")).select(
        id_col, F.col("_a.cluster").alias("cluster"),
        F.col("_a.dist").alias("dist"))
    return cents, final


def cluster_summary(assignments: DataFrame) -> DataFrame:
    """(cluster, n, mean_dist): cluster sizes and mean within-cluster
    squared distance (rounded 6) — the convergence/balance report."""
    return (assignments.groupBy("cluster")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.round(F.avg("dist"), 6).alias("mean_dist")))


def pq_fit(df: DataFrame, m: int = 4, k: int = 8, iters: int = 1,
           id_col: str = "vec_id",
           vec_col: str = "embedding") -> List[np.ndarray]:
    """Train product-quantization codebooks (Jégou et al. 2011,
    "Product Quantization for Nearest Neighbor Search"): split each
    vector into ``m`` contiguous subvectors and run an independent
    ``k``-centroid deterministic Lloyd per subspace (k lowest-id init,
    round-6 distances/centroids, ties to the lowest code). Returns the
    m codebooks, each k×(dim/m).

    At 100 TB, train on a sample — codebooks are tiny and converge long
    before the full corpus; encoding (pq_encode) is the full-corpus
    pass."""
    first = df.select(vec_col).first()
    dim = len(first[0])
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    d = dim // m
    books: List[np.ndarray] = []
    for j in range(m):
        sub = df.select(F.col(id_col),
                        F.slice(F.col(vec_col), j * d + 1, d).alias("_sub"))
        cents, _ = kmeans_fit(sub, k=k, iters=iters, id_col=id_col,
                              vec_col="_sub")
        books.append(cents)
    return books


def pq_encode(df: DataFrame, books: List[np.ndarray],
              id_col: str = "vec_id",
              vec_col: str = "embedding",
              keep: Sequence[str] = ()) -> DataFrame:
    """Encode every vector as its ``m`` nearest-centroid codes under
    ``books``. A dim-d float vector compresses to m small ints
    (64 floats → 4 codes here) while distances stay approximable from
    the codebooks — the memory-bound ANN scale path (IVF partitions
    the corpus; PQ shrinks what each partition stores).

    Returns (id_col, code_0..code_{m-1}, err): per-vector codes plus
    total squared quantization error (sum of the m per-subspace
    round-6 distances, re-rounded).

    Scale shape: ONE Arrow-batched map pass with all m codebooks
    closed over — one scan, no joins, no shuffle; per-batch work is m
    tiny (batch × k × dim/m) matmuls."""
    from pyspark.sql.types import (DoubleType, IntegerType, StructField,
                                   StructType)

    m = len(books)
    d = books[0].shape[1]
    bk = [b.copy() for b in books]

    fields = [StructField(f"code_{j}", IntegerType()) for j in range(m)]
    out_t = StructType(fields + [StructField("err", DoubleType())])

    @F.pandas_udf(out_t)
    def _encode(vs: pd.Series) -> pd.DataFrame:
        mat = np.array(vs.tolist(), dtype=np.float64)
        cols = {}
        err = np.zeros(len(mat))
        for j in range(m):
            sub = mat[:, j * d:(j + 1) * d]
            dist = ((sub[:, None, :] - bk[j][None, :, :]) ** 2
                    ).sum(axis=2).round(6)
            code = dist.argmin(axis=1)
            cols[f"code_{j}"] = code.astype("int32")
            err += dist[np.arange(len(code)), code]
        cols["err"] = err.round(6)
        return pd.DataFrame(cols)

    enc = df.select(F.col(id_col), *[F.col(c) for c in keep],
                    _encode(F.col(vec_col)).alias("_e"))
    return enc.select(
        id_col, *keep, *[F.col(f"_e.code_{j}").alias(f"code_{j}")
                         for j in range(m)],
        F.col("_e.err").alias("err"))


def pq_codes(df: DataFrame, m: int = 4, k: int = 8, iters: int = 1,
             id_col: str = "vec_id",
             vec_col: str = "embedding") -> DataFrame:
    """pq_fit + pq_encode in one call (see both for the scale story)."""
    return pq_encode(df, pq_fit(df, m, k, iters, id_col, vec_col),
                     id_col, vec_col)


def pq_adc_topk(corpus: DataFrame, queries: DataFrame, k: int = 5,
                m: int = 4, codebook_k: int = 8, iters: int = 1,
                id_col: str = "vec_id", vec_col: str = "embedding",
                query_id_col: str = "query_id",
                exclude_self: bool = True) -> DataFrame:
    """Approximate top-k by PQ asymmetric distance computation (ADC):
    dist(q, x) ≈ Σ_j ||q_j − book_j[code_j(x)]||². Each query
    precomputes an m×k table of round-6 subspace distances on the
    driver (tiny: queries are a bounded set, same contract as
    cosine_topk's broadcast query side); scoring the corpus is then m
    literal-array lookups per encoded row — NO floating math against
    the raw vectors, which is the point: the scored relation is the
    4-byte code table, not the 256-byte float corpus.

    Returns (query_id, vec_id, adist, rank) — rank 1..k per query by
    (adist ASC, vec_id), deterministic.

    Scale shape: codes come from one encode pass (pq_encode); per-query
    scoring branches union over a small Q and share the single code
    scan; for large Q, turn the tables into a broadcast (qid, j, code,
    d) relation and score with m broadcast joins instead of literal
    arrays."""
    from pyspark.sql import Window

    books = pq_fit(corpus, m, codebook_k, iters, id_col, vec_col)
    d = books[0].shape[1]
    codes = pq_encode(corpus, books, id_col, vec_col).drop("err")
    # Rematerialized query-id literals must keep the SOURCE column's
    # type — F.lit(python_int) alone is int32, silently narrowing a
    # bigint id column's wire type.
    qid_type = queries.schema[query_id_col].dataType
    qrows = queries.select(query_id_col, vec_col).collect()
    # ONE scan of the code relation: every query's ADC score is a
    # separate struct in one projection (m literal-array lookups each),
    # exploded to (query, candidate) rows — a union of per-query
    # branches would re-evaluate the lazy encode pass Q times.
    per_q = []
    for r in qrows:
        qid = r[query_id_col]
        qv = np.array(r[vec_col], dtype=np.float64)
        score = F.lit(0.0)
        for j in range(m):
            tab = np.round(((qv[j * d:(j + 1) * d][None, :]
                             - books[j]) ** 2).sum(axis=1), 6)
            arr = F.array(*[F.lit(float(x)) for x in tab])
            score = score + F.element_at(arr, F.col(f"code_{j}") + 1)
        per_q.append(F.struct(
            F.lit(qid).cast(qid_type).alias("_qid"),
            F.round(score, 6).alias("_adist")))
    out = (codes.select(F.col(id_col),
                        F.explode(F.array(*per_q)).alias("_s"))
           .select(F.col("_s._qid").alias(query_id_col),
                   F.col(id_col), F.col("_s._adist").alias("adist")))
    # Self-exclusion by id equality is only meaningful when the query
    # relation is drawn from the corpus id space; for an unrelated
    # query set a coincidental id collision must NOT drop a candidate,
    # so the caller opts out with exclude_self=False.
    if exclude_self:
        out = out.filter(F.col(id_col) != F.col(query_id_col))
    w = Window.partitionBy(query_id_col).orderBy(F.asc("adist"),
                                                 F.asc(id_col))
    return (out.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k))


def pq_adc_dist_table(queries: DataFrame, books: List[np.ndarray],
                      query_id_col: str = "query_id",
                      vec_col: str = "embedding") -> DataFrame:
    """Per-query subspace distance tables as a RELATION:
    (qid, j, code, d) with d = round6 ||q_j − book_j[code]||², computed
    distributively (tiny codebooks closed over an Arrow batch pass) —
    Q·m·k rows total, no driver collect of the query side."""
    from pyspark.sql.types import (DoubleType, IntegerType, StructField,
                                   StructType)

    m = len(books)
    d = books[0].shape[1]
    k = books[0].shape[0]
    bk = [b.copy() for b in books]
    qid_type = queries.schema[query_id_col].dataType
    out_t = StructType([StructField("qid", qid_type),
                        StructField("j", IntegerType()),
                        StructField("code", IntegerType()),
                        StructField("d", DoubleType())])

    def gen(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            mat = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            nq = len(mat)
            frames = []
            for j in range(m):
                sub = mat[:, j * d:(j + 1) * d]
                dist = ((sub[:, None, :] - bk[j][None, :, :]) ** 2
                        ).sum(axis=2).round(6)  # nq × k
                frames.append(pd.DataFrame({
                    "qid": np.repeat(pdf[query_id_col].values, k),
                    "j": np.int32(j),
                    "code": np.tile(np.arange(k, dtype=np.int32), nq),
                    "d": dist.ravel(),
                }))
            yield pd.concat(frames, ignore_index=True)

    return queries.select(query_id_col, vec_col).mapInPandas(gen, out_t)


def pq_adc_topk_broadcast(corpus: DataFrame, queries: DataFrame,
                          k: int = 5, m: int = 4, codebook_k: int = 8,
                          iters: int = 1, id_col: str = "vec_id",
                          vec_col: str = "embedding",
                          query_id_col: str = "query_id",
                          exclude_self: bool = True) -> DataFrame:
    """Large-Q ADC top-k: same semantics as pq_adc_topk, but the
    per-query lookup tables are a broadcast (qid, j, code, d) RELATION
    instead of per-query literal arrays — the plan has NO per-query
    branches, so it is identical for 10 or 10,000 queries and the
    query side is never collected to the driver.

    Scoring: codes unpivot to (vec_id, j, code_j) — m rows per vector
    — broadcast-join the distance table on (j, code) (every pair hits,
    the table enumerates all k codes), then one map-side-combined sum
    per (qid, vec_id). Summands are pre-rounded 1e-6 multiples, so the
    re-round after the order-free sum is exact regardless of partial
    aggregation order. Top-k by the same (adist, vec_id) window.

    Scale: broadcast size is Q·m·k small rows; the corpus-side scan is
    the 4-byte code relation. When Q·m·k outgrows a broadcast, drop
    the hint — the join and aggregate are already shuffle-correct."""
    from pyspark.sql import Window

    books = pq_fit(corpus, m, codebook_k, iters, id_col, vec_col)
    codes = pq_encode(corpus, books, id_col, vec_col).drop("err")
    dtab = pq_adc_dist_table(queries, books, query_id_col, vec_col)
    codes_long = (codes.select(
        F.col(id_col),
        F.explode(F.array(*[
            F.struct(F.lit(j).cast("int").alias("j"),
                     F.col(f"code_{j}").alias("code"))
            for j in range(m)])).alias("_jc"))
        .select(id_col, F.col("_jc.j").alias("j"),
                F.col("_jc.code").alias("code")))
    scored = (codes_long.join(F.broadcast(dtab), ["j", "code"])
              .groupBy("qid", id_col)
              .agg(F.round(F.sum("d"), 6).alias("adist"))
              .withColumnRenamed("qid", query_id_col))
    if exclude_self:
        scored = scored.filter(F.col(id_col) != F.col(query_id_col))
    w = Window.partitionBy(query_id_col).orderBy(F.asc("adist"),
                                                 F.asc(id_col))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k))


def build_ivf_pq_index(corpus: DataFrame, index_path: str,
                       nlist: int = 16, m: int = 4, codebook_k: int = 8,
                       iters: int = 1, id_col: str = "vec_id",
                       vec_col: str = "embedding",
                       mode: str = "overwrite"
                       ) -> Tuple[np.ndarray, List[np.ndarray]]:
    """Composite IVF+PQ index — the FAISS ``IVFPQ`` layout (Jégou et
    al. 2011 §V): a Delta table storing ONLY
    ``(list_id, id, code_0..code_{m-1})``, partitioned by the IVF
    coarse list. The raw float vectors are NOT stored: the index's
    per-row payload is m small ints, so a 100 TB float corpus indexes
    into ~m/(4·dim) of its size, and a probe reads `nprobe` list
    partitions of 4-byte codes — partition-pruned in the metadata
    plane before any Parquet opens, then ADC-scored without touching
    floats.

    One Arrow pass computes both the coarse assignment and the m PQ
    codes (no corpus-size join). Returns (centroids, codebooks) — both
    tiny and deterministically re-derivable from the corpus."""
    from ..table import DeltaTable
    from .similarity import _ivf_assign_col, _ivf_centroids
    cents = _ivf_centroids(corpus, nlist, id_col, vec_col)
    books = pq_fit(corpus, m, codebook_k, iters, id_col, vec_col)
    with_list = corpus.withColumn(
        "list_id", _ivf_assign_col(vec_col, cents))
    codes = pq_encode(with_list, books, id_col, vec_col,
                      keep=("list_id",)).drop("err")
    t = DeltaTable.for_path(corpus.sparkSession, index_path)
    t.write(codes, mode=mode, partition_by=["list_id"])
    return cents, books


def ivf_pq_adc_topk(spark, index_path: str, queries: DataFrame,
                    cents: np.ndarray, books: List[np.ndarray],
                    k: int = 5, nprobe: int = 4,
                    id_col: str = "vec_id", vec_col: str = "embedding",
                    query_id_col: str = "query_id",
                    exclude_self: bool = True) -> DataFrame:
    """Probe a :func:`build_ivf_pq_index` table: rank coarse centroids
    per query (driver-side numpy on the bounded query set — the same
    contract as ivf_query_indexed), partition-prune the code scan to
    the union of probed lists, then ADC-score candidates against a
    broadcast ``(qid, j, code, d)`` distance relation
    (pq_adc_dist_table — computed distributively, never collected) and
    take per-query top-k by (adist ASC, id).

    A candidate counts for a query only if its list is among THAT
    query's probes. Scale shape: scan = nprobe/nlist of the CODE table
    (not the float corpus); scoring = one broadcast join on (qid, j,
    code) + one map-side-combined sum per (qid, id); summands are
    pre-rounded 1e-6 multiples so the re-round after the order-free
    sum is exact."""
    from pyspark.sql import Window

    from ..expressions import Col, Lit
    from ..table import DeltaTable
    from .similarity import _collect_query_side

    m = len(books)
    qrows = _collect_query_side(queries, query_id_col, vec_col)
    qmat = np.array([r["_qv"] for r in qrows], dtype=np.float64)
    qn = np.linalg.norm(qmat, axis=1, keepdims=True)
    sims = (qmat / np.where(qn == 0, 1.0, qn)) @ cents.T
    probes = {}
    for i, r in enumerate(qrows):
        order = sorted(range(cents.shape[0]),
                       key=lambda j: (-sims[i, j], j))
        probes[r["_qid"]] = order[:nprobe]
    probe_lists = sorted({l for ls in probes.values() for l in ls})
    pred = None
    for l in probe_lists:
        term = Col("list_id") == Lit(l)
        pred = term if pred is None else (pred | term)
    cand = DeltaTable.for_path(spark, index_path).scan(pred).to_df()
    qid_type = queries.schema[query_id_col].dataType
    pp_rows = [(qid, l) for qid, ls in probes.items() for l in ls]
    pp_schema = T.StructType([T.StructField("_qid", qid_type),
                              T.StructField("list_id", T.IntegerType())])
    from ..localrel import local_rows_df
    pp = F.broadcast(local_rows_df(spark, pp_rows, pp_schema))
    dtab = pq_adc_dist_table(queries, books, query_id_col, vec_col)
    codes_long = (cand.join(pp, "list_id")
                  .select(F.col("_qid"), F.col(id_col),
                          F.explode(F.array(*[
                              F.struct(F.lit(j).cast("int").alias("j"),
                                       F.col(f"code_{j}").alias("code"))
                              for j in range(m)])).alias("_jc"))
                  .select("_qid", id_col, F.col("_jc.j").alias("j"),
                          F.col("_jc.code").alias("code")))
    scored = (codes_long.join(
        F.broadcast(dtab),
        (codes_long["_qid"] == dtab["qid"])
        & (codes_long["j"] == dtab["j"])
        & (codes_long["code"] == dtab["code"]))
        .groupBy("_qid", id_col)
        .agg(F.round(F.sum("d"), 6).alias("adist"))
        .withColumnRenamed("_qid", query_id_col))
    if exclude_self:
        scored = scored.filter(F.col(id_col) != F.col(query_id_col))
    w = Window.partitionBy(query_id_col).orderBy(F.asc("adist"),
                                                 F.asc(id_col))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k))


def semdedup(df: DataFrame, k: int = 8, iters: int = 2,
             threshold: float = 0.4, id_col: str = "vec_id",
             vec_col: str = "embedding",
             max_cluster_size: int = 2500) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): cluster embeddings with k-means,
    then drop semantic duplicates WITHIN each cluster — a document is
    dropped when a lower-id document in its cluster has cosine
    similarity ≥ threshold (the paper keeps an arbitrary member per
    duplicate set; lowest-id is the deterministic variant).

    Returns (id_col, cluster, dropped): the full corpus labeled.

    Scale shape: the all-pairs comparison is confined to clusters —
    cost Σ |cluster|², the entire point of clustering first. With a
    FIXED k, cluster sizes grow with the corpus and Σ|c|² turns
    quadratic (found REAL at the sf10 probe: k=8 over 200k vectors
    timed out — 25k-row clusters are 625M pairs each).
    ``max_cluster_size`` bounds it: clusters above the cap are
    deterministically sub-split by ``hash64(id) % ceil(m/cap)`` and
    pairs only form within a sub-split — candidate count ≤ cap·n
    (LINEAR in n), at the cost of missing duplicates that land in
    different sub-splits of one oversized cluster (the bounded-
    candidate tradeoff; raise k with the corpus to keep clusters under
    the cap and the sub-split never activates). Similarities are
    rounded to 6 before thresholding so the drop set is engine- and
    partitioning-independent.
    """
    from ..functions.text import hash64
    _, assigned = kmeans_fit(df, k, iters, id_col, vec_col)
    labeled = (df.select(F.col(id_col).alias("_id"),
                         F.col(vec_col).cast("array<double>").alias("_v"))
               .join(assigned.select(F.col(id_col).alias("_id"), "cluster"),
                     "_id"))
    sizes = labeled.groupBy("cluster").agg(F.count(F.lit(1)).alias("_m"))
    nrm = (labeled.join(F.broadcast(sizes), "cluster")
           .withColumn(
               "_sub",
               F.when(F.col("_m") > max_cluster_size,
                      hash64(F.col("_id").cast("string"))
                      % F.expr(f"(_m + {max_cluster_size - 1}) "
                               f"div {max_cluster_size}"))
               .otherwise(F.lit(0)))
           .drop("_m")
           .withColumn(
               "_n", F.sqrt(F.aggregate("_v", F.lit(0.0),
                                        lambda a, x: a + x * x))))
    a = nrm.select("cluster", "_sub", F.col("_id").alias("_a"),
                   F.col("_v").alias("_va"), F.col("_n").alias("_na"))
    b = nrm.select("cluster", "_sub", F.col("_id").alias("_b"),
                   F.col("_v").alias("_vb"), F.col("_n").alias("_nb"))
    dot = F.aggregate(F.zip_with("_va", "_vb", lambda x, y: x * y),
                      F.lit(0.0), lambda acc, x: acc + x)
    dropped = (a.join(b, ["cluster", "_sub"])
               .filter(F.col("_a") < F.col("_b"))
               .withColumn("_sim", F.round(
                   dot / F.col("_na") / F.col("_nb"), 6))
               .filter(F.col("_sim") >= F.lit(threshold))
               .select(F.col("_b").alias("_id")).distinct())
    return (labeled.join(dropped.withColumn("_d", F.lit(True)),
                         "_id", "left")
            .select(F.col("_id").alias(id_col), "cluster",
                    F.coalesce("_d", F.lit(False)).alias("dropped")))
