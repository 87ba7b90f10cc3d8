"""Canonicalizer-hazard gate: every oracled output column must have a
pandas-stable declared type in DuckDB.

The driver hashes results after canonicalizing through pandas; DuckDB
HUGEINT / DECIMAL / FLOAT / LIST outputs reach pandas as object or
narrowed columns that hash differently from Spark's, even when values
are numerically identical (q08 round 1, q100 round 2). This is the
cheap half of tools/lint_outputs.py (DESCRIBE only — no Spark), run on
every pytest invocation so the idiom can never regress.
"""

from __future__ import annotations

import duckdb
import pytest

from grouper_spark.queries import load_all
from grouper_spark.sources import TABLES
from tools.lint_outputs import DIV_IDIOM, duck_type_ok

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    return con


def test_all_oracle_output_types_are_pandas_stable(duck):
    bad = []
    for name, qdef in sorted(load_all().items()):
        if qdef.oracle is None:
            continue
        for col, typ, *_ in duck.execute(f"DESCRIBE {qdef.oracle}").fetchall():
            if not duck_type_ok(typ):
                bad.append(f"{name}.{col}: {typ}")
    assert not bad, f"fragile oracle output types: {bad}"


def test_no_bare_integer_sum_division_idiom():
    """A bare SUM(..)/<decimal literal> is HUGEINT/DECIMAL arithmetic in
    DuckDB — it must be wrapped in an explicit terminal CAST."""
    offenders = []
    for name, qdef in sorted(load_all().items()):
        if qdef.oracle is None:
            continue
        flat = " ".join(qdef.oracle.split())
        for m in DIV_IDIOM.finditer(flat):
            if f"CAST({m.group(0)}" not in flat:
                offenders.append(f"{name}: {m.group(0)}")
    assert not offenders, offenders
