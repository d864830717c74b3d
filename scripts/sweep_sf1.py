#!/usr/bin/env python
"""Full-registry sweep at the sf1 scaling probe (VERDICT r10 #4) with a
per-query wall-clock budget.

Some oracle SQL is the O(n²) textbook definition (fuzzy Levenshtein
pairs, all-pairs cosine) — feasible at the sf0.01 correctness gate and
the sf0.1 close-out sweep, but hours-infeasible at sf1 where DuckDB
has 10× the rows and 100× the pairs. A query whose ORACLE exceeds the
budget is recorded as `oracle_timeout` with its Spark-side row count
(the Spark plan already completed) rather than stalling the sweep;
everything else gets the full rows+schema+hash compare.

The SPARK side gets the same budget (cancelled via job group): two
registry entries are documented exact-O(n²) verification paths
(`cosine_neardup_pairs` — its LSH sibling is the scale path) whose own
cost is quadratic by definition at sf1.

Usage: python scripts/sweep_sf1.py [sf_dir] [budget_sec] [out_json]
                                   [resume_log] [only]
`resume_log`: a previous run's stdout; queries with a PASS/SKIP line
there are carried over instead of re-run.
`only`: comma-separated registry names — sweep just that subset (the
sf10 probe targets the ~30 most expensive ranks, VERDICT r11 #1).
"""
from __future__ import annotations

import json
import multiprocessing as mp
import os
import re
import sys
import threading
import time


def _oracle_rows(sql: str, sf_dir: str, q):  # subprocess target
    import duckdb
    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem "
              "events documents embeddings").split():
        src = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(src):
            src = f"{src}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{src}')")
    rel = con.sql(sql)
    q.put((list(rel.columns), [str(t) for t in rel.types],
           rel.fetchall()))


# Sampled verification (VERDICT r12 #5): when the FULL oracle exceeds
# the budget, verify a deterministic ≤1/BANDS hash band of the result
# instead — both sides restricted to rows whose key's md5 starts with
# the same byte (md5 is the one hash DuckDB and Python compute
# identically). DuckDB pushes the band predicate through the outer
# projection into the O(n²) join's banded side, collapsing the
# definitional oracle's cost by ~BANDS×. Key per query = the output
# column the band pins; queries absent here band on their first
# column. Completeness holds WITHIN the band: a row missing from
# either side of the band fails the compare.
SAMPLE_BANDS = 256
SAMPLE_KEYS = {
    "doc_fuzzy_edit_pairs": "a_id",
    "doc_fuzzy_er_clusters": "canonical_doc",
    "emb_cosine_neardup_lsh": "a_id",
    "emb_semdedup": "vec_id",
    "delta_manifest_read": "l_orderkey",
}


def _band_of(val, bands: int = SAMPLE_BANDS) -> int:
    import hashlib
    h = hashlib.md5(str(val).encode()).hexdigest()
    return int(h[:2], 16) % bands


def _banded_sql(sql: str, key: str, band: int) -> str:
    # ('0x' || first-2-hex-of-md5)::int — same band as _band_of
    return (f"SELECT * FROM ({sql}) __band WHERE "
            f"(('0x' || substr(md5(CAST(\"{key}\" AS VARCHAR)), 1, 2))"
            f"::INT % {SAMPLE_BANDS}) = {band}")


def _band_pred(expr: str, band: int) -> str:
    return (f"(('0x' || substr(md5(CAST({expr} AS VARCHAR)), 1, 2))"
            f"::INT % {SAMPLE_BANDS}) = {band}")


def _banded_semdedup(sql: str, key: str, band: int) -> str:
    """emb_semdedup's drop set is global, so the generic OUTER band
    cannot collapse its O(n·cluster) pair stage. But a banded vector's
    `dropped` flag depends ONLY on pairs where IT is the higher id —
    so banding the pair join's b-side (and the final projection) is
    exact for the banded rows while the linear k-means CTEs stay full.
    Anchored textual injection: breaks loudly if the oracle changes."""
    a = "JOIN sb ab ON aa.cl = ab.cl AND aa.sub = ab.sub"
    assert a in sql, "semdedup oracle changed; update _banded_semdedup"
    sql = sql.replace(
        a, a + f"\n            AND {_band_pred('ab.vec_id', band)}", 1)
    tail = "FROM asg\n\n) __q"
    assert tail in sql, "semdedup oracle tail changed"
    return sql.replace(
        tail, f"FROM asg WHERE {_band_pred('vec_id', band)}\n\n) __q", 1)


# Queries whose banded verification needs the predicate INSIDE the
# oracle (a global-state final stage the outer wrapper can't reach).
SAMPLE_SQL_BUILDERS = {
    "emb_semdedup": _banded_semdedup,
}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    budget = int(sys.argv[2]) if len(sys.argv) > 2 else 600
    out_path = sys.argv[3] if len(sys.argv) > 3 else "/tmp/SWEEP_SF1.json"
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))

    from pyspark.sql import SparkSession

    from connectors_spark.queries import REGISTRY
    from tests.harness import _norm, check_oracle_types

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "16")
    spark = (SparkSession.builder.master(f"local[{cpus}]")
             .config("spark.sql.shuffle.partitions", cpus)
             .config("spark.driver.memory", "16g")
             # whole-table hash gates (delta_manifest_read) legally
             # collect O(table) rows at probe scale
             .config("spark.driver.maxResultSize", "8g")
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    carried = {}
    if len(sys.argv) > 4 and os.path.exists(sys.argv[4]):
        with open(sys.argv[4], errors="replace") as f:
            for line in f:
                for m in re.finditer(
                        r"(PASS|SKIP) ([a-z0-9_]+):", line):
                    carried[m.group(2)] = m.group(1)

    only = None
    if len(sys.argv) > 5 and sys.argv[5].strip():
        only = set(sys.argv[5].split(","))
        unknown = only - set(REGISTRY)
        if unknown:
            raise SystemExit(f"unknown query names: {sorted(unknown)}")

    results = {}
    for name, qd in REGISTRY.items():
        if only is not None and name not in only:
            continue
        if name in carried:
            results[name] = {"status": "pass_prior"
                             if carried[name] == "PASS"
                             else "skip_prior"}
            print(f"CARRY {name}: from resume log", flush=True)
            continue
        t0 = time.time()
        box = {}

        def run_spark(_qd=qd):
            try:
                spark.sparkContext.setJobGroup("sweep", name, True)
                sdf = _qd.fn(spark, sf_dir)
                box["rows"] = sdf.collect()
                box["cols"] = sorted(sdf.columns)
            except Exception as e:  # noqa: BLE001
                box["err"] = f"{type(e).__name__}: {e}"[:300]

        th = threading.Thread(target=run_spark, daemon=True)
        th.start()
        th.join(budget)
        spark_banded = False
        if th.is_alive():
            spark.sparkContext.cancelJobGroup("sweep")
            th.join(60)
            if qd.sql is None:
                results[name] = {"status": "spark_timeout",
                                 "budget_sec": budget}
                print(f"SKIP {name}: spark exceeded {budget}s",
                      flush=True)
                continue
            # The budget here is usually burned COLLECTING a result
            # whose size is the point (whole-table hash gates): retry
            # with the SPARK side banded too — same md5 band the
            # oracle fallback uses, so the exact compare still holds.
            key = SAMPLE_KEYS.get(name)
            band = _band_of(name)
            box = {}

            def run_spark_banded(_qd=qd, _key=key, _band=band):
                from pyspark.sql import functions as SF
                try:
                    spark.sparkContext.setJobGroup("sweep", name, True)
                    sdf = _qd.fn(spark, sf_dir)
                    k = _key or sorted(sdf.columns)[0]
                    pred = (SF.conv(SF.substring(
                        SF.md5(SF.col(k).cast("string")), 1, 2),
                        16, 10).cast("int") % SAMPLE_BANDS
                        == SF.lit(_band))
                    box["rows"] = sdf.where(pred).collect()
                    box["cols"] = sorted(sdf.columns)
                except Exception as e:  # noqa: BLE001
                    box["err"] = f"{type(e).__name__}: {e}"[:300]

            th2 = threading.Thread(target=run_spark_banded, daemon=True)
            t0 = time.time()
            th2.start()
            th2.join(budget)
            if th2.is_alive() or "err" in box:
                spark.sparkContext.cancelJobGroup("sweep")
                th2.join(60)
                results[name] = {"status": "spark_timeout",
                                 "budget_sec": budget,
                                 "banded_err": box.get("err")}
                print(f"SKIP {name}: spark exceeded {budget}s "
                      f"(banded retry too)", flush=True)
                continue
            spark_banded = True
        if "err" in box:
            results[name] = {"status": "spark_error",
                             "err": box["err"]}
            print(f"FAIL {name}: spark {box['err']}", flush=True)
            continue
        srows, scols = box["rows"], box["cols"]
        spark_s = time.time() - t0
        if qd.sql is None:
            results[name] = {"status": "rows_only",
                             "spark_rows": len(srows),
                             "spark_sec": round(spark_s, 1)}
            print(f"PASS {name}: rows-only ({len(srows)})", flush=True)
            continue
        got = None
        if not spark_banded:
            ctx = mp.get_context("spawn")
            q = ctx.Queue()
            p = ctx.Process(target=_oracle_rows,
                            args=(qd.sql, sf_dir, q))
            t1 = time.time()
            p.start()
            while time.time() - t1 < budget:
                if not q.empty():
                    got = q.get()
                    break
                if not p.is_alive():
                    try:
                        got = q.get(timeout=5)
                    except Exception:  # noqa: BLE001
                        pass
                    break
                time.sleep(0.5)
        if got is None:
            if not spark_banded:
                p.terminate()
                p.join()
            # Full oracle over budget (or the Spark side already ran
            # banded): fall back to the hash-band sample. The band is
            # pinned by the query NAME so reruns verify the same slice.
            key = SAMPLE_KEYS.get(name) or scols[0]
            band = _band_of(name)
            s_band = srows if spark_banded else \
                [r for r in srows if _band_of(r[key]) == band]
            builder = SAMPLE_SQL_BUILDERS.get(name, _banded_sql)
            # spawn, not fork: forking this parent (a live multi-thread
            # JVM + py4j) can deadlock the child before duckdb runs
            ctx2 = mp.get_context("spawn")
            q2 = ctx2.Queue()
            p2 = ctx2.Process(target=_oracle_rows,
                              args=(builder(qd.sql, key, band),
                                    sf_dir, q2))
            t2 = time.time()
            p2.start()
            got2 = None
            while time.time() - t2 < budget * 2:
                if not q2.empty():
                    got2 = q2.get()
                    break
                if not p2.is_alive():
                    try:
                        got2 = q2.get(timeout=5)
                    except Exception:  # noqa: BLE001
                        pass
                    break
                time.sleep(0.5)
            if got2 is None:
                p2.terminate()
                p2.join()
                results[name] = {"status": "oracle_timeout",
                                 "spark_rows": len(srows),
                                 "spark_sec": round(spark_s, 1),
                                 "budget_sec": budget,
                                 "sampled": "also timed out"}
                print(f"SKIP {name}: oracle exceeded {budget}s; "
                      f"banded sample exceeded {budget * 2}s too "
                      f"(spark ok, {len(srows)} rows in {spark_s:.0f}s)",
                      flush=True)
                continue
            p2.join()
            ocols_raw, otypes, orows = got2
            ocols = sorted(ocols_raw)
            ok, msg = True, (f"SAMPLED band {band}/{SAMPLE_BANDS} on "
                             f"{key}: {len(s_band)} rows match")
            if scols != ocols:
                ok, msg = False, f"sampled schema {scols} vs {ocols}"
            elif len(s_band) != len(orows):
                ok, msg = False, (f"sampled rows {len(s_band)} vs "
                                  f"{len(orows)} (band {band} on {key})")
            else:
                sset = sorted(tuple(_norm(r[c]) for c in scols)
                              for r in s_band)
                oidx = [ocols_raw.index(c) for c in ocols]
                oset = sorted(tuple(_norm(r[i]) for i in oidx)
                              for r in orows)
                if sset != oset:
                    diffs = [(a, b) for a, b in zip(sset, oset)
                             if a != b][:2]
                    ok, msg = False, f"sampled values differ: {diffs}"[:400]
            results[name] = {
                "status": "pass_sampled" if ok else "fail",
                "detail": msg, "spark_rows": len(srows),
                "sampled_rows": len(s_band),
                "band": band, "bands": SAMPLE_BANDS, "key": key,
                "spark_banded": spark_banded,
                "spark_sec": round(spark_s, 1),
                "oracle_sec": round(time.time() - t2, 1)}
            print(("PASS " if ok else "FAIL ") + f"{name}: {msg}",
                  flush=True)
            continue
        p.join()
        ocols_raw, otypes, orows = got
        ocols = sorted(ocols_raw)
        ok, msg = True, f"ok ({len(srows)} rows)"
        if scols != ocols:
            ok, msg = False, f"schema {scols} vs {ocols}"
        elif len(srows) != len(orows):
            ok, msg = False, f"rows {len(srows)} vs {len(orows)}"
        else:
            sset = sorted(tuple(_norm(r[c]) for c in scols)
                          for r in srows)
            oidx = [ocols_raw.index(c) for c in ocols]
            oset = sorted(tuple(_norm(r[i]) for i in oidx)
                          for r in orows)
            if sset != oset:
                diffs = [(a, b) for a, b in zip(sset, oset)
                         if a != b][:2]
                ok, msg = False, f"values differ: {diffs}"[:400]
        results[name] = {"status": "pass" if ok else "fail",
                         "detail": msg, "spark_rows": len(srows),
                         "spark_sec": round(spark_s, 1),
                         "oracle_sec": round(time.time() - t1, 1)}
        print(("PASS " if ok else "FAIL ") + f"{name}: {msg}",
              flush=True)
    with open(out_path, "w") as f:
        json.dump(results, f, indent=1)
    n_pass = sum(1 for r in results.values()
                 if r["status"] in ("pass", "pass_sampled", "rows_only"))
    n_skip = sum(1 for r in results.values()
                 if r["status"] == "oracle_timeout")
    n_fail = len(results) - n_pass - n_skip
    print(f"\n{n_pass} pass / {n_skip} oracle-timeout / {n_fail} fail "
          f"of {len(results)}", flush=True)


if __name__ == "__main__":
    main()
