"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB
against the same sf dir, then compares row count, sorted column names, and an
order-insensitive value comparison. Usage:

    python tools/check_oracle.py [sf_dir] [query ...]

A full (un-filtered) run also writes ``CORRECTNESS_local.json`` at the repo
root in the driver gate's schema — one row per registry query with
rows/schema/hash match booleans. Since round 5 the driver samples a rotating
50-query subset, so ANY registry query can be drawn — this full-sweep
artifact (regenerated at both SFs each round) is what keeps every query
strict-green between samples. The float compare is bit-exact (repr), at
least as strict as the driver's value hash (round-5 verdict task 2).
"""

from __future__ import annotations

import sys
import time
from datetime import date, datetime

import duckdb

sys.path.insert(0, "/root/repo")

from veri_spark.session import get_spark  # noqa: E402

import __spark_entry__ as entry_mod  # noqa: E402

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def normalize(v):
    if isinstance(v, float):
        # DRIVER-STRENGTH compare (round-5 verdict task 2): repr() is the
        # shortest round-trip representation, so two doubles match iff they
        # are bit-identical (it also distinguishes -0.0 from 0.0 and makes
        # NaN compare equal to NaN). The old round(v, 4) normalization was
        # looser than the driver's value-hash and masked a 6th-decimal
        # ROUND(AVG(double)) flip for a full round.
        return repr(v)
    if isinstance(v, datetime):
        return v.isoformat()
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, list):
        return tuple(normalize(x) for x in v)
    return v


def rows_to_multiset(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    # None sorts before any value of any type (NULLs FIRST, type-safe)
    return sorted(
        (tuple(normalize(r[i]) for i in order) for r in rows),
        key=lambda t: tuple((v is not None, str(type(v)), v) for v in t),
    )


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    con = duckdb.connect()
    # spill outside the repo: an out-of-memory oracle otherwise writes its
    # temp storage to ./.tmp inside the working tree (a runaway query once
    # left 51 GB there and hung `git add`)
    con.execute("SET temp_directory='/tmp/duckdb_oracle_spill'")
    con.execute("SET max_temp_directory_size='20GiB'")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    spark = get_spark("oracle-check")
    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()

    failed, passed, weak = [], [], []
    report: dict[str, dict] = {}

    def record(name, *, rows_match=False, schema_match=False, hash_match=False,
               spark_rows=None, oracle_rows=None, err=None):
        report[name] = {
            "rows_match": rows_match,
            "schema_match": schema_match,
            "hash_match": hash_match,
            "spark_rows": spark_rows,
            "oracle_rows": oracle_rows,
            "err": err,
        }

    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            s_cols = sdf.columns
            s_rows = [tuple(r) for r in sdf.collect()]
        except Exception as ex:
            print(f"FAIL {name}: spark error: {ex}")
            failed.append(name)
            record(name, err=f"spark error: {ex}"[:500])
            continue
        if name not in oracles:
            weak.append(name)
            print(f"weak {name}: rows={len(s_rows)} (no oracle) [{time.time()-t0:.1f}s]")
            record(
                name, rows_match=len(s_rows) > 0, schema_match=True,
                spark_rows=len(s_rows), err="no oracle (rows-only check)",
            )
            continue
        try:
            res = con.execute(oracles[name])
            d_cols = [d[0] for d in res.description]
            d_rows = res.fetchall()
        except Exception as ex:
            print(f"FAIL {name}: duckdb error: {ex}")
            failed.append(name)
            record(name, spark_rows=len(s_rows), err=f"duckdb error: {ex}"[:500])
            continue
        problems = []
        schema_ok = sorted(s_cols) == sorted(d_cols)
        rows_ok = len(s_rows) == len(d_rows)
        hash_ok = False
        if not schema_ok:
            problems.append(f"cols spark={sorted(s_cols)} duck={sorted(d_cols)}")
        if not rows_ok:
            problems.append(f"rowcount spark={len(s_rows)} duck={len(d_rows)}")
        if not problems:
            sm = rows_to_multiset(s_rows, s_cols)
            dm = rows_to_multiset(d_rows, d_cols)
            hash_ok = sm == dm
            if not hash_ok:
                diff = [(a, b) for a, b in zip(sm, dm) if a != b][:3]
                problems.append(f"values differ, first diffs: {diff}")
        record(
            name, rows_match=rows_ok, schema_match=schema_ok, hash_match=hash_ok,
            spark_rows=len(s_rows), oracle_rows=len(d_rows),
            err="; ".join(problems)[:500] or None,
        )
        if problems:
            print(f"FAIL {name}: {'; '.join(problems)}")
            failed.append(name)
        else:
            print(f"ok   {name}: rows={len(s_rows)} [{time.time()-t0:.1f}s]")
            passed.append(name)

    print(
        f"\n{len(passed)} ok, {len(weak)} weak (no oracle), {len(failed)} FAILED"
        + (f": {failed}" if failed else "")
    )
    if not only:
        import json
        import os

        # name by SF so the sf0.1 sweep never clobbers the sf0.01 artifact
        # (CORRECTNESS_local.json stays the gate-scale sf0.01 name)
        tag = sf_dir.rstrip("/").rsplit("/", 1)[-1]
        fname = (
            "CORRECTNESS_local.json"
            if tag == "sf0.01"
            else f"CORRECTNESS_local_{tag}.json"
        )
        out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                           fname)
        with open(out, "w") as f:
            json.dump(report, f, indent=2)
        print(f"wrote {out} ({len(report)} queries)")
    spark.stop()
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
