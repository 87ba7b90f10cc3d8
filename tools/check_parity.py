"""Local replica of the driver's correctness gate: run every registered
query through Spark AND its DuckDB oracle, compare row count / columns /
values (order-insensitive, columns sorted by name).

Usage: python tools/check_parity.py [sf_dir] [query ...]
"""

from __future__ import annotations

import datetime
import decimal
import math
import sys
import time

import duckdb

sys.path.insert(0, ".")

from grouper_spark.session import get_spark  # noqa: E402
from grouper_spark.sources import TABLES  # noqa: E402


def normalize(v):
    if isinstance(v, decimal.Decimal):
        return float(v)
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    if isinstance(v, list):
        return tuple(normalize(x) for x in v)
    if isinstance(v, float) and math.isnan(v):
        return "NaN"
    return v


def sort_key(row):
    return tuple((x is None, str(type(x)), str(x)) for x in row)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()

    spark = get_spark("parity-check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    n_pass = n_fail = n_rows_only = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        # Drop cached blocks left by the previous query's
        # localCheckpoint frames: across a 700+-query sweep they
        # accumulate tens of GB in the driver-JVM block manager and
        # OOM the heap at scale10 (the round-10 q325 cascade). Each
        # query's checkpoints are dead once it has printed.
        try:
            for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
                rdd.unpersist()
        except Exception:
            pass
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sorted(sdf.columns)
            srows = sorted(
                (tuple(normalize(r[c]) for c in scols) for r in sdf.collect()),
                key=sort_key,
            )
        except Exception as e:
            print(f"FAIL {name}: spark error: {type(e).__name__}: {e}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"ROWS {name}: {len(srows)} rows ({time.time()-t0:.1f}s) [rows-only]")
            n_rows_only += 1
            continue
        try:
            res = con.execute(oracles[name])
            dcols_raw = [d[0] for d in res.description]
            drows_raw = res.fetchall()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {type(e).__name__}: {e}")
            n_fail += 1
            continue
        order = sorted(range(len(dcols_raw)), key=lambda i: dcols_raw[i])
        dcols = [dcols_raw[i] for i in order]
        drows = sorted(
            (tuple(normalize(r[i]) for i in order) for r in drows_raw),
            key=sort_key,
        )
        if scols != dcols:
            print(f"FAIL {name}: columns differ\n  spark={scols}\n  duck ={dcols}")
            n_fail += 1
            continue
        if len(srows) != len(drows):
            print(f"FAIL {name}: row count {len(srows)} vs {len(drows)}")
            n_fail += 1
            continue
        if srows != drows:
            n_bad = sum(1 for a, b in zip(srows, drows) if a != b)
            print(f"FAIL {name}: {n_bad}/{len(srows)} rows differ; first diff:")
            for a, b in zip(srows, drows):
                if a != b:
                    for c, x, y in zip(scols, a, b):
                        if x != y:
                            print(f"    {c}: spark={x!r} duck={y!r}")
                    break
            n_fail += 1
            continue
        print(f"PASS {name}: {len(srows)} rows ({time.time()-t0:.1f}s)")
        n_pass += 1

    print(f"\n{n_pass} pass, {n_fail} fail, {n_rows_only} rows-only")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
