"""Foreign-writer interop: read the reference repo's REAL golden tables.

These fixtures were written by delta-spark itself
(golden-tables/src/test/scala/io/delta/golden/GoldenTables.scala — the
generator documents each table's exact contents; file:line cited per
test). The repo's own scenario ports (FIXTURES.md) prove protocol logic
against THIS engine's writer; this module proves the one thing those
cannot: byte-level interop with a foreign writer's actual output — the
first thing a real user does is point the engine at an existing
delta-spark table.

The fixtures are treated as DATA (public test resources). Tests that
must mutate state (corrupting ``_last_checkpoint``, re-stamping commit
mtimes for timestamp travel — which git checkout does not preserve)
copy the table into tmp_path first; the reference's own suites do the
same (DeltaTimeTravelSuite.scala:96-105).
"""

from __future__ import annotations

import os
import shutil

import pytest

# Integration-heavy: slow tier, like the other end-to-end suites.
pytestmark = pytest.mark.slow

from pyspark.sql import functions as F

from connectors_spark import DeltaTable
from connectors_spark.errors import DeltaError, DeltaProtocolError

GOLDEN = "/root/reference/golden-tables/src/test/resources/golden"

requires_golden = pytest.mark.skipif(
    not os.path.isdir(GOLDEN), reason="reference golden tables not present")


def _t(spark, name):
    return DeltaTable.for_path(spark, os.path.join(GOLDEN, name))


def _copy(name, tmp_path):
    dst = str(tmp_path / os.path.basename(name))
    shutil.copytree(os.path.join(GOLDEN, name), dst)
    return dst


def _paths(t, version=None):
    snap = t.snapshot() if version is None else t.log.snapshot_at(version)
    return sorted(os.path.basename(f.path) for f in snap.all_files())


# ---------------------------------------------------------------------------
# Log / snapshot state (DeltaLogSuite scenarios; GoldenTables.scala:115-300)
# ---------------------------------------------------------------------------

@requires_golden
def test_golden_checkpoint_replay(spark):
    """GoldenTables.scala:115-127: 15 commits, each adds file `i` and
    removes `i-1`; delta-spark checkpointed mid-stream. Exactly one
    active file survives replay."""
    t = _t(spark, "checkpoint")
    assert _paths(t) == ["15"]
    assert t.snapshot().version == 14


@requires_golden
def test_golden_snapshot_lineage(spark):
    """GoldenTables.scala:139-181: append/append/overwrite/append/
    delete/repartition(dataChange=false)/vacuum lineage; the DATA must
    match at every stage."""
    def rows(name):
        return sorted((r["col1"], r["col2"])
                      for r in _t(spark, name).to_df().collect())

    d = {i: [(x, f"data-{i}-{x}") for x in range(10)] for i in range(3)}
    d[3] = [(x, f"data-3-{x}") for x in range(20)]
    assert rows("snapshot-data0") == sorted(d[0])
    assert rows("snapshot-data1") == sorted(d[0] + d[1])
    assert rows("snapshot-data2") == sorted(d[2])        # overwrite
    assert rows("snapshot-data3") == sorted(d[2] + d[3])
    expected_after_delete = sorted(d[3])   # delete "col2 like 'data-2-%'"
    assert rows("snapshot-data2-deleted") == expected_after_delete
    assert rows("snapshot-repartitioned") == expected_after_delete
    assert rows("snapshot-vacuumed") == expected_after_delete


@requires_golden
def test_golden_update_deleted_directory(spark):
    """GoldenTables.scala:184-190: 10 log-only files + a checkpoint."""
    t = _t(spark, "update-deleted-directory")
    assert _paths(t) == sorted(str(i) for i in range(1, 11))


@requires_golden
def test_golden_corrupted_last_checkpoint(spark, tmp_path):
    """GoldenTables.scala:193-200 + DeltaLogSuite 'handle corrupted
    _last_checkpoint': a garbage hint file must not break loading —
    segment listing falls back and finds the checkpoint itself."""
    path = _copy("corrupted-last-checkpoint", tmp_path)
    lc = os.path.join(path, "_delta_log", "_last_checkpoint")
    assert os.path.exists(lc)
    with open(lc, "w") as fh:
        fh.write("{corrupted")
    t = DeltaTable.for_path(spark, path)
    assert t.snapshot().version == 10
    assert _paths(t) == sorted(str(i) for i in range(11))


@requires_golden
@pytest.mark.parametrize("suffix", ["normal-a", "normal-b",
                                    "special-a", "special-b"])
def test_golden_canonicalized_paths(spark, suffix):
    """GoldenTables.scala:203-228: v0 adds an absolute path, v1 removes
    the SAME path qualified with file:/file:// (and percent-escaped in
    the special variants) — canonicalization must cancel them to an
    empty table."""
    t = _t(spark, f"canonicalized-paths-{suffix}")
    assert t.snapshot().all_files() == []


@requires_golden
def test_golden_delete_re_add_same_file(spark):
    """GoldenTables.scala:231-248: add foo / remove foo / re-add foo /
    add bar across four transactions — latest-per-path wins, so foo
    (modificationTime 1700000000000) and bar are both active."""
    t = _t(spark, "delete-re-add-same-file-different-transactions")
    files = {os.path.basename(f.path): f.modificationTime
             for f in t.snapshot().all_files()}
    assert set(files) == {"foo", "bar"}
    assert files["foo"] == 1700000000000


@requires_golden
def test_golden_versions_not_contiguous_fails(spark):
    """GoldenTables.scala:251-265: version 1 deleted from a 0-1-2 log —
    loading must refuse, never silently skip the hole."""
    with pytest.raises((DeltaError, ValueError)):
        _t(spark, "versions-not-contiguous").snapshot()


@requires_golden
@pytest.mark.parametrize("missing", ["protocol", "metadata"])
def test_golden_state_reconstruction_incomplete_fails(spark, missing):
    """GoldenTables.scala:268-283: a log whose version 0 lacks the
    Protocol (resp. Metadata) action is unreadable state."""
    with pytest.raises((DeltaError, ValueError, FileNotFoundError)):
        t = _t(spark, f"deltalog-state-reconstruction-without-{missing}")
        t.snapshot().metadata if missing == "metadata" \
            else t.snapshot().protocol
        t.to_df().collect()


@requires_golden
@pytest.mark.parametrize("missing", ["protocol", "metadata"])
def test_golden_checkpoint_missing_action_fails(spark, missing):
    """GoldenTables.scala:289-335: the checkpoint parquet was rewritten
    WITHOUT the protocol (resp. metadata) rows — replay from it must
    fail loudly."""
    with pytest.raises((DeltaError, ValueError, FileNotFoundError)):
        t = _t(spark,
               f"deltalog-state-reconstruction-from-checkpoint-missing-"
               f"{missing}")
        snap = t.snapshot()
        _ = snap.metadata if missing == "metadata" else snap.protocol
        snap.to_df().collect()


@requires_golden
def test_golden_invalid_protocol_version_fails(spark):
    """GoldenTables.scala:338-350: Protocol(99) — a reader version far
    beyond this client must refuse (W9)."""
    with pytest.raises((DeltaProtocolError, DeltaError, ValueError)):
        _t(spark, "deltalog-invalid-protocol-version").to_df().collect()


@requires_golden
def test_golden_commit_info(spark):
    """GoldenTables.scala:353-380: delta-spark's full CommitInfo field
    set reads back through history()."""
    t = _t(spark, "deltalog-commit-info")
    h = t.history()[-1]
    assert h["version"] == 0
    assert h["operation"] == "WRITE"
    assert h["operationParameters"] == {"test": "test"}
    # the fixture predates engineInfo serialization — the key is absent
    # from the JSON and must read back as None, not garbage
    assert h.get("engineInfo") is None
    assert h.get("isBlindAppend") is True
    assert h.get("isolationLevel") == "default"
    assert h.get("userMetadata") == "foo"
    assert h.get("userId") == "user_0"
    assert h.get("userName") == "username_0"
    assert h.get("readVersion") == -1
    assert h.get("operationMetrics") == {"test": "test"}


@requires_golden
def test_golden_get_changes(spark):
    """GoldenTables.scala:383-401: action-level getChanges — v0
    metadata+add, v1 cdc+remove, v2 protocol+setTransaction; the CDC
    file's partitionValues and tags survive the parse."""
    from connectors_spark.log.actions import (AddCDCFile, AddFile,
                                              Metadata, Protocol,
                                              RemoveFile, SetTransaction)
    t = _t(spark, "deltalog-getChanges")
    changes = {v: acts for v, acts in t.log.get_changes(0)}
    assert sorted(changes) == [0, 1, 2]
    by_type = lambda v, k: [a for a in changes[v] if isinstance(a, k)]
    assert len(by_type(0, Metadata)) == 1
    assert [a.path for a in by_type(0, AddFile)] == ["fake/path/1"]
    cdc = by_type(1, AddCDCFile)
    assert len(cdc) == 1
    assert cdc[0].partitionValues == {"partition_foo": "partition_bar"}
    assert cdc[0].tags == {"tag_foo": "tag_bar"}
    assert [a.path for a in by_type(1, RemoveFile)] == ["fake/path/1"]
    assert len(by_type(2, Protocol)) == 1
    st = by_type(2, SetTransaction)
    assert len(st) == 1 and st[0].appId == "fakeAppId" \
        and st[0].version == 3


@requires_golden
def test_golden_log_store_fixtures(spark):
    """GoldenTables.scala:407-428: raw LogStore read/listFrom semantics
    over the foreign-written plain files."""
    from connectors_spark.log.logstore import default_log_store
    root = os.path.join(GOLDEN, "log-store-read")
    store = default_log_store(root)
    assert store.read(os.path.join(root, "0")) == ["zero", "none"]
    assert store.read(os.path.join(root, "1")) == ["one"]
    root = os.path.join(GOLDEN, "log-store-listFrom")
    store = default_log_store(root)
    names = [n for n in store.list_from(root, "2")
             if not n.startswith("_")]
    assert sorted(names) == ["2", "3"]


# ---------------------------------------------------------------------------
# Time travel (DeltaTimeTravelSuite scenarios; GoldenTables.scala:434-500)
# ---------------------------------------------------------------------------

START = 1540415658000  # GoldenTables.scala:451


@requires_golden
def test_golden_time_travel_versions(spark):
    """GoldenTables.scala:437-465: three stacked commits of 10 rows
    each — versionAsOf slices exactly."""
    t = _t(spark, "time-travel-start-start20-start40")
    assert sorted(r["id"] for r in t.to_df(version=0).collect()) \
        == list(range(10))
    assert sorted(r["id"] for r in t.to_df(version=1).collect()) \
        == list(range(20))
    assert sorted(r["id"] for r in t.to_df(version=2).collect()) \
        == list(range(30))
    with pytest.raises((DeltaError, ValueError)):
        t.to_df(version=3).collect()


@requires_golden
def test_golden_time_travel_timestamps(spark, tmp_path):
    """Timestamp travel over the same fixture. Git checkout does not
    preserve mtimes, so re-stamp the commit files to the generator's
    schedule (start / +20min / +40min) exactly as the reference suite
    does (DeltaTimeTravelSuite.scala, generateCommits)."""
    path = _copy("time-travel-start-start20-start40", tmp_path)
    for v, ts in enumerate([START, START + 20 * 60000,
                            START + 40 * 60000]):
        f = os.path.join(path, "_delta_log", "%020d.json" % v)
        os.utime(f, (ts / 1000, ts / 1000))
    t = DeltaTable.for_path(spark, path)
    # exact hit, mid-window, and last-commit resolution
    assert t.to_df(timestamp_ms=START).count() == 10
    assert t.to_df(timestamp_ms=START + 10 * 60000).count() == 10
    assert t.to_df(timestamp_ms=START + 20 * 60000).count() == 20
    assert t.to_df(timestamp_ms=START + 40 * 60000).count() == 30
    # before the first commit: no version to serve
    with pytest.raises((DeltaError, ValueError)):
        t.to_df(timestamp_ms=START - 1).collect()


@requires_golden
def test_golden_time_travel_schema_changes(spark):
    """GoldenTables.scala:470-479: v1 merged a new column — travel to
    v0 must instantiate the OLD schema, not the latest one."""
    t = _t(spark, "time-travel-schema-changes-b")
    assert t.to_df(version=0).columns == ["id"]
    assert sorted(t.to_df(version=1).columns) == ["id", "part"]
    assert sorted(r["id"] for r in t.to_df(version=0).collect()) \
        == list(range(10))


@requires_golden
def test_golden_time_travel_partition_changes(spark):
    """GoldenTables.scala:484-500: v1 overwrote schema AND partitioning
    (part5 → part2) — each version reads with its own layout."""
    t = _t(spark, "time-travel-partition-changes-b")
    v0 = t.to_df(version=0)
    assert sorted(v0.columns) == ["id", "part5"]
    assert sorted((r["id"], r["part5"]) for r in v0.collect()) \
        == [(i, i % 5) for i in range(10)]
    v1 = t.to_df(version=1)
    assert sorted(v1.columns) == ["id", "part2"]
    assert sorted((r["id"], r["part2"]) for r in v1.collect()) \
        == [(i, i % 2) for i in range(10, 20)]


# ---------------------------------------------------------------------------
# Typed data reads (DeltaDataReaderSuite scenarios; GoldenTables.scala:503-748)
# ---------------------------------------------------------------------------

@requires_golden
def test_golden_data_reader_primitives(spark):
    """GoldenTables.scala:509-532: every primitive type + a full-null
    row, incl. byte/short/decimal(1,0)/binary."""
    from decimal import Decimal
    rows = _t(spark, "data-reader-primitives").to_df().collect()
    assert len(rows) == 11
    null_rows = [r for r in rows if r["as_int"] is None]
    assert len(null_rows) == 1 and all(v is None for v in null_rows[0])
    by_i = {r["as_int"]: r for r in rows if r["as_int"] is not None}
    assert sorted(by_i) == list(range(10))
    for i, r in by_i.items():
        assert r["as_long"] == i and r["as_byte"] == i \
            and r["as_short"] == i
        assert r["as_boolean"] == (i % 2 == 0)
        assert r["as_float"] == float(i) and r["as_double"] == float(i)
        assert r["as_string"] == str(i)
        assert bytes(r["as_binary"]) == bytes([i, i])
        assert r["as_big_decimal"] == Decimal(i)


@requires_golden
def test_golden_data_reader_partition_values(spark):
    """GoldenTables.scala:535-590: TWELVE typed partition columns
    (int/long/byte/short/boolean/float/double/string/'null' literal/
    date/timestamp/decimal) plus one row with ALL-NULL partition
    values — the partition-decode path (§2.8) against a foreign
    writer's directory layout."""
    import datetime
    from decimal import Decimal
    rows = _t(spark, "data-reader-partition-values").to_df().collect()
    assert len(rows) == 3
    null_row = [r for r in rows if r["value"] == "2"]
    assert len(null_row) == 1
    nr = null_row[0]
    for c in ("as_int", "as_long", "as_byte", "as_short", "as_boolean",
              "as_float", "as_double", "as_string", "as_date",
              "as_timestamp", "as_big_decimal"):
        assert nr[c] is None, c
    assert [x["val"] for x in nr["as_list_of_records"]] == [2, 2, 2]
    assert nr["as_nested_struct"]["ac"]["acb"] == 2
    for i in (0, 1):
        r = [x for x in rows if x["value"] == str(i)][0]
        assert r["as_int"] == i and r["as_long"] == i
        assert r["as_byte"] == i and r["as_short"] == i
        assert r["as_boolean"] == (i % 2 == 0)
        assert r["as_float"] == float(i) and r["as_double"] == float(i)
        assert r["as_string"] == str(i)
        assert r["as_string_lit_null"] == "null"  # LITERAL, not None
        assert r["as_date"] == datetime.date(2021, 9, 8)
        assert r["as_timestamp"] == datetime.datetime(2021, 9, 8,
                                                      11, 11, 11)
        assert r["as_big_decimal"] == Decimal(i)
        assert [x["val"] for x in r["as_list_of_records"]] == [i, i, i]
        assert r["as_nested_struct"]["ac"]["aca"] == i


@requires_golden
@pytest.mark.parametrize("tz", ["UTC", "Iceland", "PST",
                                "America/Los_Angeles", "Etc/GMT+9",
                                "Asia/Beirut", "JST"])
def test_golden_data_reader_date_types(spark, tz):
    """GoldenTables.scala:593-609: one (timestamp, date) row written
    with the JVM default timezone set to ``tz`` — parquet stores the
    UTC-normalized instant, so reading in a UTC session must yield
    2020-01-01 08:09:10 LOCAL-to-tz converted to UTC; the date is
    timezone-free."""
    from datetime import datetime
    from zoneinfo import ZoneInfo
    zmap = {"PST": "America/Los_Angeles", "JST": "Asia/Tokyo"}
    zone = ZoneInfo(zmap.get(tz, tz))
    expected = (datetime(2020, 1, 1, 8, 9, 10, tzinfo=zone)
                .astimezone(ZoneInfo("UTC")).replace(tzinfo=None))
    t = _t(spark, f"data-reader-date-types-{tz}")
    got = (t.to_df()
           .select(F.date_format("timestamp", "yyyy-MM-dd HH:mm:ss")
                   .alias("ts"),
                   F.date_format("date", "yyyy-MM-dd").alias("d"))
           .collect())
    assert len(got) == 1
    assert got[0]["ts"] == expected.strftime("%Y-%m-%d %H:%M:%S")
    assert got[0]["d"] == "2020-01-01"


@requires_golden
def test_golden_data_reader_arrays_maps_structs(spark):
    """GoldenTables.scala:612-710: arrays of primitives, 3d/4d nested
    lists, maps with non-string keys, nested structs."""
    rows = _t(spark, "data-reader-array-primitives").to_df().collect()
    assert len(rows) == 10
    for r in rows:
        i = r["as_array_int"][0]
        assert r["as_array_long"] == [i] and r["as_array_string"] == [str(i)]
        assert bytes(r["as_array_binary"][0]) == bytes([i, i])

    rows = (_t(spark, "data-reader-array-complex-objects")
            .to_df().collect())
    assert len(rows) == 10
    for r in rows:
        i = r["i"]
        assert r["3d_int_list"][0][0] == [i, i, i]
        assert r["4d_int_list"][0][0][0] == [i, i, i]
        assert r["list_of_maps"][0] == {str(i): i}
        assert [x["val"] for x in r["list_of_records"]] == [i, i, i]

    rows = _t(spark, "data-reader-map").to_df().collect()
    assert len(rows) == 10
    for r in rows:
        i = r["i"]
        assert r["a"] == {i: i} and r["b"] == {i: i}
        assert r["c"] == {i: (i % 2 == 0)}
        assert r["e"][str(i)] == i

    rows = _t(spark, "data-reader-nested-struct").to_df().collect()
    assert len(rows) == 10
    for r in rows:
        i = r["b"]
        assert r["a"]["aa"] == str(i)
        assert r["a"]["ac"]["aca"] == i and r["a"]["ac"]["acb"] == i

    rows = (_t(spark, "data-reader-nullable-field-invalid-schema-key")
            .to_df().collect())
    assert len(rows) == 1
    assert rows[0]["array_can_contain_null"] == [None, None, None]


@requires_golden
def test_golden_data_reader_escaped_chars(spark):
    """GoldenTables.scala:721-727: partition values containing '+' and
    literal percent-escapes ('bar+%21') — the directory name is
    URL-escaped but partitionValues holds the raw string."""
    t = _t(spark, "data-reader-escaped-chars")
    got = sorted((r["_1"], r["_2"]) for r in t.to_df().collect())
    assert got == [("foo1", "bar+%21"), ("foo2", "bar+%22"),
                   ("foo3", "bar+%23")]


@requires_golden
def test_golden_issue_124_decimal_decode(spark):
    """GoldenTables.scala:730-734 (reference issue #124): decimal(10,0)
    value 1000000 decodes exactly."""
    from decimal import Decimal
    rows = _t(spark, "124-decimal-decode-bug").to_df().collect()
    assert len(rows) == 1
    assert rows[0]["large_decimal"] == Decimal(1000000)


@requires_golden
def test_golden_issue_125_iterator_bug(spark):
    """GoldenTables.scala:737-748 (reference issue #125): 12 commits,
    7 of them EMPTY writes — iteration must yield exactly 1..5 without
    choking on zero-row files."""
    rows = _t(spark, "125-iterator-bug").to_df().collect()
    assert sorted(r["col1"] for r in rows) == [1, 2, 3, 4, 5]


# ---------------------------------------------------------------------------
# Hive-connector fixtures (GoldenTables.scala:751-833) — same engine-
# agnostic read path, partitioned layouts with special characters.
# ---------------------------------------------------------------------------

@requires_golden
def test_golden_hive_tables(spark):
    h = os.path.join(GOLDEN, "hive")

    t = DeltaTable.for_path(spark, os.path.join(h, "deltatbl-non-partitioned"))
    got = sorted((r["c1"], r["c2"]) for r in t.to_df().collect())
    assert got == sorted((x, f"foo{x % 2}") for x in range(10))

    t = DeltaTable.for_path(spark, os.path.join(h, "deltatbl-partitioned"))
    got = sorted((r["c1"], r["c2"]) for r in t.to_df().collect())
    assert got == sorted((x, f"foo{x % 2}") for x in range(10))
    # partition pruning against the foreign layout
    from connectors_spark.expressions import Col, Lit
    scan = t.scan(Col("c2") == Lit("foo0"))
    assert sorted(r["c1"] for r in scan.to_df().collect()) \
        == [0, 2, 4, 6, 8]

    t = DeltaTable.for_path(spark,
                            os.path.join(h, "deltatbl-partition-prune"))
    scan = t.scan((Col("date") == Lit("20180520")) &
                  (Col("city") == Lit("hz")))
    assert [(r["name"], r["cnt"]) for r in scan.to_df().collect()] \
        == [("Jim", 3)]
    assert len(scan.collect_files()) == 1   # pruned to one partition

    t = DeltaTable.for_path(
        spark, os.path.join(h, "deltatbl-special-chars-in-partition-column"))
    got = sorted((r["c1"], r["c2"]) for r in t.to_df().collect())
    assert got == sorted((x, f"+ =%{x % 2}") for x in range(10))


@requires_golden
def test_golden_hive_typed_and_case_insensitive(spark):
    """GoldenTables.scala:795-822: the Hive connector's all-types row
    (byte/binary/bool/int/long/string/float/double/short/date/
    timestamp/decimal/array/map/struct) and mixed-case column names
    through a partitioned layout."""
    import datetime
    from decimal import Decimal
    h = os.path.join(GOLDEN, "hive")

    t = DeltaTable.for_path(spark,
                            os.path.join(h, "deltatbl-map-types-correctly"))
    rows = t.to_df().collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["c1"] == 97 and bytes(r["c2"]) == b"bc" and r["c3"] is True
    assert r["c4"] == 4 and r["c5"] == 5 and r["c6"] == "foo"
    assert r["c7"] == 6.0 and r["c8"] == 7.0 and r["c9"] == 8
    # java.sql.Date/Timestamp(60000000L) = 1970-01-01T16:40:00 UTC
    assert r["c10"] == datetime.date(1970, 1, 1)
    got_ts = (t.to_df()
              .select(F.date_format("c11", "yyyy-MM-dd HH:mm:ss")
                      .alias("ts")).collect()[0]["ts"])
    assert got_ts == "1970-01-01 16:40:00"
    assert isinstance(r["c12"], Decimal)
    assert r["c13"] == ["foo", "bar"]
    assert r["c14"] == {"foo": 123}
    assert r["c15"]["f1"] == "foo" and r["c15"]["f2"] == 456

    t = DeltaTable.for_path(
        spark, os.path.join(h, "deltatbl-column-names-case-insensitive"))
    assert t.to_df().columns == ["FooBar", "BarFoo"]   # case preserved
    got = sorted((r["FooBar"], r["BarFoo"]) for r in t.to_df().collect())
    assert got == sorted((x, f"foo{x % 2}") for x in range(10))
    # partition pruning on the mixed-case partition column
    from connectors_spark.expressions import Col, Lit
    scan = t.scan(Col("BarFoo") == Lit("foo1"))
    assert sorted(r["FooBar"] for r in scan.to_df().collect()) \
        == [1, 3, 5, 7, 9]


@requires_golden
def test_golden_absolute_and_escaped_add_paths(spark):
    """data-reader-absolute-paths-escaped-chars (log-only here — the
    absolute path references the generator's machine): v0 adds an
    ABSOLUTE path, v1 adds a percent-escaped relative one
    ('bar%2Dbar...'); state reconstruction must keep the absolute path
    out of the table root and decode the escape exactly once."""
    t = _t(spark, "data-reader-absolute-paths-escaped-chars")
    paths = sorted(f.path for f in t.snapshot().all_files())
    assert len(paths) == 2
    rel = [p for p in paths if "bar-bar" in p]
    assert len(rel) == 1       # %2D decoded to '-' exactly once
    assert rel[0].endswith("bar-bar.snappy.parquet")
    absolute = [p for p in paths if p not in rel]
    assert absolute[0].startswith("/") or "://" in absolute[0]
    assert "/Users/" in absolute[0]   # NOT resolved against our root
