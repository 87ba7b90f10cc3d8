"""Engine-only single-shot screen of every registered query at a
fixture dir (default sf0.1): name + noop-sink seconds, one line each.

The parity sweep's wall includes the DuckDB oracle, which hides
corpus-bound engine time when the oracle is fast at small sf; this
screen is the cheap instrument that surfaced a361 (20.9 s, invisible
in the sweep's top-30). Single-shot timings are noisy — re-time
anything slow with tools/time_query.py min-of-N before acting.

Usage: python tools/screen_all.py [sf_dir] > screen.log
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from grouper_spark.queries import load_all  # noqa: E402
from grouper_spark.session import get_spark, silence_accumulator_spam  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    registry = load_all()
    spark = get_spark("screen-all")
    spark.sparkContext.setLogLevel("ERROR")
    silence_accumulator_spam(spark)
    qd = registry["q01_pricing_summary"]
    qd.fn(spark, "/root/testdata/sf0.001").write.format("noop").mode(
        "overwrite"
    ).save()
    for name in sorted(registry):
        spark.sparkContext.setJobDescription(f"screen: {name}")
        t0 = time.time()
        try:
            df = registry[name].fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            print(f"{time.time() - t0:8.3f} {name}", flush=True)
        except Exception as e:  # noqa: BLE001
            msg = str(e).split("\n", 1)[0][:200]
            print(f"   ERROR {name}: {type(e).__name__}: {msg}", flush=True)
        spark.sparkContext.setJobDescription(None)


if __name__ == "__main__":
    main()
