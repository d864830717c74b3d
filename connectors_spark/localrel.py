"""Driver-local relations with size-matched slicing.

``spark.createDataFrame(list, schema)`` parallelizes the list over
``defaultParallelism`` slices, and every action over the resulting
relation then pays one Python-worker round trip PER SLICE to apply the
schema (``applySchemaToPythonRDD``) — measured ~0.5-0.8 s per job at
local[32] for a handful of rows (r14, guide §4.1): 32 near-empty Python
tasks serving 2 real ones. The commit plane builds many such small
relations (publish file lists, partition-value maps, row-id base maps,
file inventories), so that overhead lands on every write and scan.

``local_rows_df`` parallelizes with an explicit slice count matched to
the row count instead: metadata-plane lists get one round trip, large
inventories keep full parallelism. Semantics are identical — the same
row-verification/conversion path runs, just inside ``len/ROWS_PER_SLICE
+ 1`` tasks instead of ``defaultParallelism``.
"""

from __future__ import annotations

from typing import Optional, Sequence

# One Python-worker round trip handles this many rows before another
# slice is worth it (pickled metadata rows are tiny; the per-slice
# constant dominates far past this point).
ROWS_PER_SLICE = 10_000


def local_rows_df(spark, rows: Sequence, schema,
                  parts: Optional[int] = None):
    """DataFrame over driver-built ``rows`` sliced to match their size.

    ``parts`` overrides the slice count — pass the intended task count
    when the relation fans out real per-row work (e.g. a ``mapInPandas``
    over a staged-file list), so the explicit slicing replaces the
    ``repartition`` shuffle those call sites previously needed.
    """
    rows = rows if isinstance(rows, list) else list(rows)
    if not rows:
        return spark.createDataFrame([], schema)
    if parts is None:
        parts = len(rows) // ROWS_PER_SLICE + 1
    parts = max(1, min(parts, len(rows),
                       spark.sparkContext.defaultParallelism))
    return spark.createDataFrame(
        spark.sparkContext.parallelize(rows, parts), schema)
