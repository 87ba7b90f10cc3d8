"""Time individual queries with the bench's exact methodology (noop sink,
min-of-N after warmup) without running the whole headline set.

Usage: python tools/time_query.py [--sf DIR] [--n N] query [query ...]

Prints one line per query: name, min, and all samples. Jobs are labeled
with setJobDescription so the Spark UI attributes stages per query.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from grouper_spark.queries import load_all  # noqa: E402
from grouper_spark.session import get_spark, silence_accumulator_spam  # noqa: E402


def main() -> None:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    n = 3
    names = []
    it = iter(args)
    for a in it:
        if a == "--sf":
            sf_dir = next(it)
        elif a == "--n":
            n = int(next(it))
        else:
            names.append(a)

    registry = load_all()
    spark = get_spark("time-query")
    spark.sparkContext.setLogLevel("ERROR")
    silence_accumulator_spam(spark)

    # same warmup as bench.py
    warm_dir = "/root/testdata/sf0.001"
    if os.path.isdir(warm_dir):
        qd = registry["q01_pricing_summary"]
        df = qd.fn(spark, warm_dir)
        df.write.format("noop").mode("overwrite").save()

    for name in names:
        qdef = registry[name]
        samples = []
        for i in range(n):
            spark.sparkContext.setJobDescription(f"{name} run {i}")
            t0 = time.time()
            df = qdef.fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            samples.append(round(time.time() - t0, 3))
            spark.sparkContext.setJobDescription(None)
        print(f"{name}: min={min(samples)} samples={samples}", flush=True)


if __name__ == "__main__":
    main()
