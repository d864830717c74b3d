"""Oracle-parity smoke for the round-7 query additions.

The full registry↔DuckDB sweep (tests/harness.py CLI) is too slow for
every pytest run, so the driver gate and per-round sweeps carry it;
this file keeps the NEWEST queries' cross-engine parity pinned in the
suite at sf0.001, where each compare is seconds. If a refactor breaks
an oracle or a determinism contract, this fails before the driver
round does.
"""

from __future__ import annotations

import pytest

from tests.harness import compare

_ROUND7 = [
    "delta_reorg_purge",
    "doc_dsir_weights",
    "doc_quality_logreg",
    "emb_ivf_pq_topk",
    "doc_chunk_dedup_first",
    "ord_topk_per_status",
    "doc_adaptive_length_filter",
    "mm_jpeg_decode_real",
    "doc_ccnet_buckets",
    "doc_split_leakage",
    "ev_retention_cohorts",
    "doc_incremental_neardup",
    "doc_pagerank_neardup",
    "emb_source_centroid_drift",
    "delta_show_partitions",
]


@pytest.mark.parametrize("name", _ROUND7)
def test_round7_query_matches_oracle(spark, sf_dir, name):
    ok, msg = compare(spark, sf_dir, name)
    assert ok, f"{name}: {msg}"
