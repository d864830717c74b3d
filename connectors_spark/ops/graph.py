"""Connected components over pair graphs (near-dup clusters).

Iterative min-label propagation expressed as DataFrame joins: every
round each node adopts the smallest label among itself and its
neighbors, converging in O(diameter) rounds — 2-3 on the short-chain
clusters dedup produces (for adversarial long-path graphs the
large-star/small-star scheme of Kiveris et al., SoCC 2014, drops rounds
to O(log² n); dedup graphs never need it). Each round is two shuffles
on node id; no driver-side graph state — only the convergence check
(a limit-1 count) comes back to the driver.

Use case: near-duplicate pairs from MinHash/SimHash/embedding LSH form
edges; components are duplicate CLUSTERS, from which keep-best dedup
retains one representative (see ops.dedup usage in queries.pipeline).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _release_checkpoint(df: DataFrame) -> None:
    """Free an eager localCheckpoint's backing RDD. Spark exposes no
    public unpersist for checkpointed Datasets (and the persist()+
    unpersist formulation was measured 2x slower per CC call:
    InMemoryRelation build plus an extra materializing action per
    iteration), so reach through the analyzed LogicalRDD; on any API
    drift this degrades to ContextCleaner GC-based cleanup instead of
    failing. Guarded by node type (ADVICE r14): unpersist only when
    the analyzed plan IS the checkpoint's LogicalRDD leaf — if a
    future Spark version resolves ``.rdd()`` through some OTHER
    (still-referenced) plan, silently unpersisting that RDD could drop
    live blocks; an unexpected node shape now falls through to GC
    cleanup instead."""
    try:
        analyzed = df._jdf.queryExecution().analyzed()
        if analyzed.nodeName() != "LogicalRDD":
            return
        analyzed.rdd().unpersist(False)
    except Exception:  # noqa: BLE001 — cleanup must never break the op
        pass


# Driver-side union-find budget for connected_components (r15): below
# this many edges the component computation runs single-process on the
# driver — the distributed label-propagation loop costs ~2 Spark jobs
# per iteration (checkpoint + convergence probe), pure scheduling
# overhead on the few-hundred-edge graphs near-dup thresholds produce.
# 2M edges ≈ 32 MB of long pairs on the driver; above it (real graph
# scale) the distributed loop runs unchanged. Env-overridable.
_CC_DRIVER_MAX_EDGES = int(os.environ.get(
    "CONNECTORS_SPARK_CC_DRIVER_MAX_EDGES", 2_000_000))

_CC_INTEGRAL = {"tinyint", "smallint", "int", "bigint"}


def _cc_driver_side(spark, rows, dtype: str) -> DataFrame:
    """Union-find over collected (a, b) edge rows; component = min
    member id — identical to the converged label propagation (and to
    the oracle's transitive closure). Integral ids only: Python and
    Spark order them identically, so the min-canonical label is
    bit-identical."""
    parent: dict = {}

    def find(x):
        r = x
        while parent[r] != r:
            r = parent[r]
        while parent[x] != r:          # path compression
            parent[x], x = r, parent[x]
        return r

    for a, b in rows:
        if a not in parent:
            parent[a] = a
        if b not in parent:
            parent[b] = b
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)   # min-root union
    out = [(n, find(n)) for n in parent]
    from ..localrel import local_rows_df
    return local_rows_df(spark, sorted(out),
                         f"node {dtype}, component {dtype}")


def connected_components(edges: DataFrame, a_col: str = "a_id",
                         b_col: str = "b_id",
                         max_iter: int = 20) -> DataFrame:
    """(node, component) for every node appearing in `edges`; component
    is the smallest node id reachable (deterministic canonical label).

    Small graphs (≤ _CC_DRIVER_MAX_EDGES, integral ids, no nulls) run
    driver-side union-find over the materialized edge plane — the
    near-dup graphs the dedup family produces are a few hundred edges,
    where each distributed iteration's 2 Spark jobs are pure
    scheduling overhead (guide §1.2/§5; the same small-state policy as
    the driver-written checkpoint). Everything else — and any
    oversized, non-integral, or null-carrying edge set — runs the
    distributed label propagation: each node's label starts as
    min(self, neighbors) and every round adopts the min label among
    itself and its neighbors, until a round changes nothing. Rounds
    are DataFrame joins — no collect of the graph. `max_iter` bounds
    worst-case chains; dedup clusters converge in 2-3 rounds.
    """
    edges = edges.select(F.col(a_col).alias("_a"), F.col(b_col).alias("_b"))
    # Materialize the EDGE plane once, eagerly: a lazy persist() left
    # the (often expensive) upstream edge pipeline to be evaluated
    # inside the first iteration's action, where the two sym subtrees
    # (labels init + neighbor join) race to fill the cache — measured
    # 7.3 s for one iteration over a 512-row sym at sf0.1.
    # localCheckpoint pins O(edges) rows, the small relation here by
    # construction (near-dup pairs after thresholding) — NOT the
    # corpus; every superseded checkpoint is released explicitly below,
    # so only the FINAL label relation stays pinned for the caller
    # (pinned by tests test_dedup_ops_release_their_caches).
    edges = edges.localCheckpoint(eager=True)
    dtypes = {f.dataType.simpleString() for f in edges.schema.fields}
    if len(dtypes) == 1 and next(iter(dtypes)) in _CC_INTEGRAL \
            and edges.count() <= _CC_DRIVER_MAX_EDGES:
        rows = [(r["_a"], r["_b"]) for r in edges.collect()]
        if all(a is not None and b is not None for a, b in rows):
            out = _cc_driver_side(edges.sparkSession, rows,
                                  next(iter(dtypes)))
            _release_checkpoint(edges)
            return out
    sym = edges.union(edges.select(F.col("_b").alias("_a"),
                                   F.col("_a").alias("_b")))
    sym = sym.localCheckpoint(eager=True)
    _release_checkpoint(edges)
    cur = (sym.groupBy("_a")
           .agg(F.least(F.min("_b"), F.first("_a")).alias("_lbl"))
           .select(F.col("_a").alias("_n"), "_lbl")
           .localCheckpoint(eager=True))
    labels = cur
    for _ in range(max_iter):
        # Each node's candidate label: min over its own label and its
        # neighbors' labels. The changed flag rides in the SAME select
        # (new < old iff a neighbor offered a smaller label), so the
        # convergence probe needs no extra join against the previous
        # labels — one materializing pass per iteration, then a local
        # scan of the checkpointed rows for the probe.
        nbr = (sym.join(labels.withColumnRenamed("_n", "_b")
                        .withColumnRenamed("_lbl", "_nlbl"), "_b")
               .groupBy("_a").agg(F.min("_nlbl").alias("_cand")))
        new_cur = (labels.join(nbr.withColumnRenamed("_a", "_n"),
                               "_n", "left")
                   .select("_n", F.least("_lbl", F.coalesce(
                       "_cand", "_lbl")).alias("_lbl"),
                           (F.col("_cand") < F.col("_lbl"))
                           .alias("_chg"))
                   .localCheckpoint(eager=True))
        changed = new_cur.filter("_chg").limit(1).count()
        _release_checkpoint(cur)           # superseded label relation
        cur = new_cur
        labels = new_cur.drop("_chg")
        if changed == 0:
            break
    _release_checkpoint(sym)
    return labels.select(F.col("_n").alias("node"),
                         F.col("_lbl").alias("component"))


def pagerank(nodes: DataFrame, edges: DataFrame, iters: int = 2,
             damping: float = 0.85, node_col: str = "doc_id",
             a_col: str = "a_id", b_col: str = "b_id") -> DataFrame:
    """Deterministic PageRank over an undirected edge list (power
    iteration, Brin & Page 1998): PR ← round(1−d + d·Σ PR(u)/deg(u),
    6) over in-neighbors, PR₀ = 1, isolated nodes settle at 1−d.

    Determinism (oracle-matchable): ranks are rounded to 6 after every
    iteration and per-edge contributions are pre-rounded 1e-6
    multiples, so the order-free neighbor sum re-rounds identically in
    any engine/partitioning — the same device as kmeans/BPE/logreg.

    Scale shape per iteration: one join of the rank relation onto the
    symmetrized edge list (both keyed by node id — co-partitioned
    after the first shuffle) + one map-side-combined sum per node.
    Driver holds NOTHING (ranks stay distributed; contrast logreg's
    k-double sync): iterations chain lazily and a localCheckpoint
    every iteration keeps lineage bounded."""
    sym = (edges.select(F.col(a_col).alias("src"),
                        F.col(b_col).alias("dst"))
           .unionByName(edges.select(F.col(b_col).alias("src"),
                                     F.col(a_col).alias("dst")))
           .distinct())
    deg = sym.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    base = (nodes.select(F.col(node_col).alias("id")).distinct()
            .localCheckpoint(eager=True))
    pr = base.withColumn("pr", F.lit(1.0))
    # Materialize the degree-annotated edge list ONCE: without it every
    # iteration's contrib join re-evaluated the full upstream edge
    # pipeline (and sym twice over — deg side + join side). O(edges)
    # rows, the small relation by construction; released below along
    # with every superseded rank checkpoint, so only the final ranks
    # stay pinned for the caller.
    out_edges = sym.join(deg, "src").localCheckpoint(eager=True)
    prev = None
    for _ in range(iters):
        contrib = (out_edges.join(
            pr.withColumnRenamed("id", "src"), "src")
            .select(F.col("dst").alias("id"),
                    F.round(F.col("pr") / F.col("deg"), 6)
                    .alias("_c")))
        summed = contrib.groupBy("id").agg(F.sum("_c").alias("_s"))
        pr = (base.join(summed, "id", "left")
              .select("id",
                      F.round(F.lit(1.0 - damping) +
                              F.lit(damping) *
                              F.coalesce(F.col("_s"), F.lit(0.0)),
                              6).alias("pr"))
              .localCheckpoint(eager=True))
        if prev is not None:
            _release_checkpoint(prev)
        prev = pr
    if iters > 0:
        # the final pr checkpoint truncated its lineage — the edge and
        # node planes are no longer referenced by the returned plan
        _release_checkpoint(base)
        _release_checkpoint(out_edges)
    return pr.select(F.col("id").alias(node_col), "pr")
