"""Dump .explain('formatted') for named queries to plans/<tag>/<name>_<suffix>.txt.

Usage: python tools/explain_to_file.py <tag> <suffix> <sf_dir> <query> [query ...]

The judge reads these files to check plan claims (Exchange counts, join
strategies, PushedFilters, Python-eval nodes) without running Spark.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from grouper_spark.queries import load_all  # noqa: E402
from grouper_spark.session import get_spark  # noqa: E402


def main() -> None:
    tag, suffix, sf_dir = sys.argv[1], sys.argv[2], sys.argv[3]
    names = sys.argv[4:]
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        tag,
    )
    os.makedirs(out_dir, exist_ok=True)
    registry = load_all()
    spark = get_spark("explain-dump")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        df = registry[name].fn(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")


if __name__ == "__main__":
    main()
