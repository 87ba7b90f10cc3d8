"""Physical-plan flip survey: bench headline queries at two fixture
scales, executed to completion so AQE's FINAL plan is observed, then
diff the join/exchange strategy counts (r5 verdict #2 / r6 verdict #4:
"note per query whose physical plan flipped (broadcast->SMJ,
skew-split) vs sf0.1").

Usage: python tools/plan_flip_survey.py [dir_a] [dir_b] [query ...]
Defaults: /root/testdata/sf0.1 vs spark-warehouse/scale10, the bench
HEADLINE set.
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, ".")

from bench import HEADLINE  # noqa: E402
from grouper_spark.queries import load_all  # noqa: E402
from grouper_spark.session import get_spark  # noqa: E402

MARKS = {
    "bhj": "BroadcastHashJoin",
    "smj": "SortMergeJoin",
    "shj": "ShuffledHashJoin",
    "bnl": "BroadcastNestedLoopJoin",
    "cart": "CartesianProduct",
    "skew": "skew=true",
    "coalesced": "Coalesced",
}


def plan_counts(spark, fn, sf_dir):
    df = fn(spark, sf_dir)
    # Execute the df's OWN QueryExecution (a noop write would run a
    # SEPARATE execution, leaving this one un-executed and its adaptive
    # plan initial/isFinalPlan=false — r7 ADVICE). toRdd().count() runs
    # the job entirely JVM-side: no rows cross to the Python driver.
    qe = df._jdf.queryExecution()
    qe.toRdd().count()
    plan = qe.executedPlan().toString()
    if "AdaptiveSparkPlan" in plan and "isFinalPlan=true" not in plan:
        raise RuntimeError("adaptive plan did not finalize after execution")
    return {k: len(re.findall(v, plan)) for k, v in MARKS.items()}


def main() -> None:
    dir_a = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dir_b = (
        sys.argv[2] if len(sys.argv) > 2 else "spark-warehouse/scale10"
    )
    names = sys.argv[3:] or list(HEADLINE)
    registry = load_all()
    spark = get_spark("plan-flip-survey")
    spark.sparkContext.setLogLevel("ERROR")
    n_flips = 0
    for name in names:
        fn = registry[name].fn
        try:
            ca = plan_counts(spark, fn, dir_a)
            cb = plan_counts(spark, fn, dir_b)
        except Exception as exc:  # noqa: BLE001
            print(f"{name}: ERROR {type(exc).__name__}: {exc}")
            continue
        diffs = {
            k: (ca[k], cb[k]) for k in MARKS if ca[k] != cb[k]
        }
        if diffs:
            n_flips += 1
            detail = ", ".join(
                f"{k} {a}->{b}" for k, (a, b) in diffs.items()
            )
            print(f"{name}: FLIP {detail}")
        else:
            same = ", ".join(
                f"{k}={v}" for k, v in ca.items() if v
            )
            print(f"{name}: stable ({same or 'no joins'})")
    print(f"\n{n_flips}/{len(names)} queries changed physical strategy")


if __name__ == "__main__":
    main()
