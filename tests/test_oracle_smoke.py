"""Oracle-parity smoke for the least-proven registry queries.

The full registry↔DuckDB sweep (tests/harness.py CLI) is too slow for
every pytest run, so the driver gate and per-round sweeps carry it;
this file keeps cross-engine parity pinned in the suite at sf0.001,
where each compare is seconds. The selection is INCREMENTAL, not a
hand-maintained list (the frozenset-rotation lesson, registry.py): it
takes the queries with the weakest driver evidence — never recorded in
any CORRECTNESS_r*.json first, then latest-red — capped at a fixed
budget, so the default pytest wall-clock stays bounded as the registry
grows. New-round queries are exactly the unrecorded ones, so every
addition is smoke-covered until the driver proves it; once green in a
record file it rolls off. If nothing is unproven (mid-round, all
green), the stalest-evidence queries fill the budget instead — the
suite always smoke-checks something.
"""

from __future__ import annotations

import pytest

from connectors_spark.queries.registry import (_evidence_order,
                                               _load_evidence)
from connectors_spark.queries.registry import REGISTRY
from tests.harness import compare

_BUDGET = 16


def _smoke_names() -> list:
    evidence = _load_evidence()
    ordered = _evidence_order(list(REGISTRY), evidence)
    return ordered[:_BUDGET]


@pytest.mark.parametrize("name", _smoke_names())
def test_least_proven_query_matches_oracle(spark, sf_dir, name):
    ok, msg = compare(spark, sf_dir, name)
    assert ok, f"{name}: {msg}"
