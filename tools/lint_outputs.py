"""Canonicalizer-hazard lint for oracled query outputs.

The driver's correctness gate canonicalizes both the Spark result and the
DuckDB oracle result through pandas before hashing.  Output columns whose
*declared* engine type is fragile hash differently between engines even
when the values are numerically identical.  Known-bad classes (each one
has caused a driver hash-fail or driver ERR in rounds 1-2):

  * DuckDB ``HUGEINT`` / ``DECIMAL`` outputs (``SUM(BIGINT)`` is HUGEINT;
    a ``x / 100.0`` over it may stay DECIMAL on other duckdb versions,
    and pandas renders those as ``object`` columns of ``decimal.Decimal``
    which hash differently from float64) — q08 r1, q100 r2.
  * Array / list / struct / map outputs (pandas cannot hash them) — q42,
    q45 r1.
  * FLOAT (32-bit) columns: Spark float32 → float64 widening is lossy
    relative to an oracle computing in float64.

This lint runs ``DESCRIBE`` on every oracle under DuckDB and inspects the
Spark result schema, then fails on any fragile column type.  It is both a
CLI (``python tools/lint_outputs.py``) and importable for the pytest gate
(tests/test_output_lint.py).

Allowed declared types:
  DuckDB : BIGINT INTEGER SMALLINT TINYINT DOUBLE VARCHAR DATE TIMESTAMP
           BOOLEAN
  Spark  : bigint int smallint tinyint double string date timestamp
           boolean
"""

from __future__ import annotations

import re
import sys

import duckdb

sys.path.insert(0, ".")

DUCK_OK = {
    "BIGINT",
    "INTEGER",
    "SMALLINT",
    "TINYINT",
    "DOUBLE",
    "VARCHAR",
    "DATE",
    "BOOLEAN",
}
DUCK_OK_PREFIX = ("TIMESTAMP",)

SPARK_OK = {
    "bigint",
    "int",
    "smallint",
    "tinyint",
    "double",
    "string",
    "date",
    "boolean",
}
SPARK_OK_PREFIX = ("timestamp",)


def duck_type_ok(t: str) -> bool:
    t = t.upper()
    return t in DUCK_OK or t.startswith(DUCK_OK_PREFIX)


def spark_type_ok(t: str) -> bool:
    t = t.lower()
    return t in SPARK_OK or t.startswith(SPARK_OK_PREFIX)


def lint_oracle_types(con, name: str, sql: str) -> list[str]:
    """DESCRIBE the oracle and flag fragile declared column types."""
    bad = []
    try:
        rows = con.execute(f"DESCRIBE {sql}").fetchall()
    except Exception as e:  # noqa: BLE001 - report, don't crash the sweep
        return [f"{name}: DESCRIBE failed: {type(e).__name__}: {e}"]
    for col, typ, *_ in rows:
        if not duck_type_ok(typ):
            bad.append(f"{name}: oracle column {col!r} has fragile type {typ}")
    return bad


def lint_spark_types(name: str, df) -> list[str]:
    bad = []
    for col, typ in df.dtypes:
        if not spark_type_ok(typ):
            bad.append(f"{name}: spark column {col!r} has fragile type {typ}")
    return bad


# static idiom scan: a bare decimal literal divisor creates DECIMAL
# arithmetic in DuckDB unless the whole expression is CAST afterwards
DIV_IDIOM = re.compile(r"SUM\s*\([^)]*\)\s*/\s*\d+\.\d+", re.IGNORECASE)


def main() -> int:
    import __spark_entry__ as entry_mod

    from grouper_spark.session import get_spark
    from grouper_spark.sources import TABLES

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    problems: list[str] = []
    for name, sql in sorted(oracles.items()):
        problems += lint_oracle_types(con, name, sql)
        m = DIV_IDIOM.search(sql)
        if m and f"CAST({m.group(0)}" not in sql.replace("\n", " "):
            # only a warning-grade signal; the DESCRIBE check above is the
            # authoritative one — report it so the idiom dies out
            problems.append(
                f"{name}: oracle contains bare `SUM(..)/<decimal literal>`"
                f" idiom: {m.group(0)!r}"
            )

    spark = get_spark("output-lint")
    for name, fn in sorted(qs.items()):
        try:
            df = fn(spark, sf_dir)
        except Exception as e:  # noqa: BLE001
            problems.append(f"{name}: spark build failed: {e}")
            continue
        if name in oracles:
            problems += lint_spark_types(name, df)

    for p in problems:
        print("LINT", p)
    print(f"\n{len(problems)} problems")
    return 1 if problems else 0


if __name__ == "__main__":
    raise SystemExit(main())
