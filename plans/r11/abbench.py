"""A/B experiment harness for round-11 optimization work.

Runs named catalog queries (or ad-hoc DataFrame builders) through the
same methodology as bench.py -- noop sink, one cold pass, min over N
warm passes -- inside ONE SparkSession, and prints per-arm seconds.
Not part of the driver contract; a scratch tool committed for
reproducibility of the numbers quoted in OPTIMIZATION_r11.md.

Usage:
    python plans/r10/abbench.py flagship_route_counts tpch_q1 ...
    python plans/r10/abbench.py --all            # all 12 headline
    python plans/r10/abbench.py --plans NAME ... # dump explain only
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from xmidt_event_streams_spark.catalog import QUERIES  # noqa: E402
from xmidt_event_streams_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
WARM = int(os.environ.get("AB_WARM", "3"))


def run_query(spark, fn, label: str) -> float:
    spark.sparkContext.setJobDescription(label)
    t0 = time.perf_counter()
    fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
    dt = time.perf_counter() - t0
    spark.sparkContext.setJobDescription(None)
    return dt


def main() -> None:
    args = sys.argv[1:]
    plans_only = "--plans" in args
    args = [a for a in args if not a.startswith("--plans")]
    if "--all" in args:
        names = [n for n, s in QUERIES.items() if s.headline]
    else:
        names = args
    spark = get_spark("xes-ab")
    spark.sparkContext.setLogLevel("ERROR")
    if plans_only:
        for n in names:
            print(f"===== {n} =====")
            print(QUERIES[n].fn(spark, SF_DIR)._sc is None)  # never
        return
    results = {}
    for n in names:
        fn = QUERIES[n].fn
        cold = run_query(spark, fn, f"{n}-cold")
        warms = [run_query(spark, fn, f"{n}-warm{i}") for i in range(WARM)]
        results[n] = (round(min(warms), 3), round(cold, 3), [round(w, 3) for w in warms])
        print(f"{n}: min={results[n][0]} cold={results[n][1]} warms={results[n][2]}", flush=True)
    total = round(sum(v[0] for v in results.values()), 3)
    print(f"TOTAL(min-warm)={total}")
    spark.stop()


if __name__ == "__main__":
    main()
