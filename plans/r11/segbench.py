"""Per-query BUILD / PLAN / EXECUTE split for round-11 optimization
work (guide §1: decide whether time goes to driver-side construction,
Catalyst planning, or task execution before touching anything).

  build   = the catalog fn returns a DataFrame (py4j chatter, schema
            lookups, Column composition)
  plan    = force analysis+optimization+physical planning
            (queryExecution().executedPlan()) on a FRESH build
  exec    = noop-sink write on another fresh build (includes build+
            plan again; exec_only = exec - build - plan)

Not part of the driver contract; a scratch tool committed for
reproducibility of the numbers quoted in OPTIMIZATION_r11.md.

Usage: python plans/r11/segbench.py tpch_q3 minhash_lsh_pairs ...
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
WARM = int(os.environ.get("AB_WARM", "5"))


def main() -> None:
    names = sys.argv[1:]
    if "--all" in names:
        names = [n for n, s in QUERIES.items() if s.headline]
    spark = get_spark("xes-seg")
    spark.sparkContext.setLogLevel("ERROR")
    for n in names:
        fn = QUERIES[n].fn
        fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()  # warmup
        builds, plans, execs = [], [], []
        for _ in range(WARM):
            t0 = time.perf_counter()
            df = fn(spark, SF_DIR)
            t1 = time.perf_counter()
            df._jdf.queryExecution().executedPlan()
            t2 = time.perf_counter()
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            t3 = time.perf_counter()
            builds.append(t1 - t0)
            plans.append(t2 - t1)
            execs.append(t3 - t2)
        b, p, e = min(builds), min(plans), min(execs)
        print(
            f"{n}: build={b:.3f} plan={p:.3f} wall={e:.3f} "
            f"exec_only~={e - b - p:.3f}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
