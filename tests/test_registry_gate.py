"""GATE_COLUMNS drift guard (VERDICT r5 task #8 + ADVICE r5 #2).

GATE_COLUMNS is a hand-maintained mirror of each gate query's output
columns; the gate wrapper sorts BOTH engines by the same list, so a
renamed/added column that desyncs the list from the actual schema would
silently diverge the two engines' tie-break orders. _wrap_sorted now
raises on any column absent from the list, and orderBy raises on any
listed column the query no longer emits — so simply BUILDING each gate
query's plan proves the list matches the schema. delta_* gate queries
are exercised the same way by tests/harness.py and the delta suites
(building them writes tables, too heavy to repeat here).
"""

import pytest
# Integration-heavy: excluded from the fast inner loop (pytest -m "not slow");
# the full suite still runs these unchanged at round close-out (SURVEY 5).
pytestmark = pytest.mark.slow


from connectors_spark.queries import REGISTRY
from connectors_spark.queries.registry import GATE_SORT, GATE_COLUMNS


def _gate_names():
    return [n for n in REGISTRY
            if n in GATE_SORT and not n.startswith("delta_")]


@pytest.mark.parametrize("name", _gate_names())
def test_gate_columns_match_schema(spark, sf_dir, name):
    # Plan analysis only — _wrap_sorted raises ValueError if the query
    # emits a column missing from GATE_SORT+GATE_COLUMNS, and orderBy
    # raises AnalysisException if the list names a dropped column.
    df = REGISTRY[name].fn(spark, sf_dir)
    assert df.columns  # plan resolved, list and schema agree


def test_gate_columns_has_no_orphans():
    # Every GATE_COLUMNS key must be a registered gate query.
    orphans = [n for n in GATE_COLUMNS
               if n not in REGISTRY or n not in GATE_SORT]
    assert orphans == [], orphans


def test_stale_gate_columns_fails_loudly(spark, sf_dir):
    from connectors_spark.queries.registry import _wrap_sorted

    def q(spark, sf_dir):
        return spark.range(3).selectExpr("id", "id * 2 AS doubled")

    wrapped = _wrap_sorted(q, ["id"])  # 'doubled' missing from list
    with pytest.raises(ValueError, match="GATE_COLUMNS stale"):
        wrapped(spark, sf_dir)


def test_evidence_age_ordering():
    """Driver-sample rotation is computed from the CORRECTNESS record
    files, not hand-maintained sets (VERDICT r7 #1): never-recorded
    queries first, latest-red next, then stalest-green-first, with
    registry insertion order as the tie-break."""
    from connectors_spark.queries.registry import _evidence_order

    names = ["a", "b", "c", "d", "e"]
    evidence = {
        "a": (7, True),    # freshest green -> last
        "b": (3, True),    # stale green -> after red
        "c": (6, False),   # latest row red -> re-record early
        # d: never recorded -> first
        "e": (3, True),    # stale green, later insertion than b
    }
    assert _evidence_order(names, evidence) == ["d", "c", "b", "e", "a"]
    # no evidence at all -> pure insertion order
    assert _evidence_order(names, {}) == names


def test_load_evidence_reads_record_files(tmp_path):
    import json
    from connectors_spark.queries.registry import _load_evidence

    (tmp_path / "CORRECTNESS_r03.json").write_text(json.dumps({
        "q": {"rows_match": True, "schema_match": True,
              "hash_match": True, "err": None},
        "r": {"rows_match": True, "schema_match": True,
              "hash_match": False, "err": None}}))
    (tmp_path / "CORRECTNESS_r05.json").write_text(json.dumps({
        "r": {"rows_match": True, "schema_match": True,
              "hash_match": True, "err": None}}))
    (tmp_path / "CORRECTNESS_rXX.json").write_text("not json")
    ev = _load_evidence(root=str(tmp_path))
    assert ev["q"] == (3, True)
    assert ev["r"] == (5, True)   # latest round wins


def test_evidence_rotation_stable_on_fresh_clone():
    """ADVICE r8 #3 / VERDICT r9 #2: ordered_names() derives the
    driver sample from CORRECTNESS_r*.json at the repo root — if any
    of those is present on disk but NOT git-tracked, a fresh clone
    computes a DIFFERENT rotation (environment-dependent sampling).
    Pin: every evidence file is tracked, and the ordering is a
    deterministic permutation of the registry."""
    import os
    import subprocess

    from connectors_spark.queries.registry import (REGISTRY,
                                                   ordered_names)
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    on_disk = sorted(f for f in os.listdir(root)
                     if f.startswith("CORRECTNESS_r")
                     and f.endswith(".json"))
    assert on_disk, "evidence files missing entirely"
    tracked = subprocess.run(
        ["git", "ls-files", "CORRECTNESS_r*.json"], cwd=root,
        capture_output=True, text=True).stdout.split()
    untracked = set(on_disk) - set(tracked)
    assert not untracked, (
        f"evidence files not committed: {sorted(untracked)} — the "
        f"driver rotation would differ on a fresh clone")
    names = ordered_names()
    assert sorted(names) == sorted(REGISTRY)
    assert names == ordered_names()
