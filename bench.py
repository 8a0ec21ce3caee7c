"""Benchmark harness: runs the headline catalog queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) and prints ONE JSON
line: {"metric", "value" (total sec), "unit", "queries": {name: sec},
"sf"}.

Each query is forced with the noop sink (full computation, no collect
overhead, no result materialization on the driver).

Timings are STEADY-STATE: before the timed pass, every headline plan
runs once at sf0.001 (sibling dir of the bench SF, skipped if absent)
to compile whole-stage codegen and spawn the Arrow Python-UDF worker
pool. First-ever-call overhead (JIT, worker fork, ~3-4 s across the
suite) is a per-process constant, not per-query work: on a long-lived
cluster it amortizes to zero, so including it in per-query numbers
would misrank the queries the 100 TB design actually cares about.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from xmidt_event_streams_spark.catalog import QUERIES  # noqa: E402
from xmidt_event_streams_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    try:
        sf = float(Path(sf_dir).name.replace("sf", ""))
    except ValueError:
        sf = -1.0
    spark = get_spark("xes-bench")
    spark.sparkContext.setLogLevel("ERROR")

    headline = [name for name, spec in QUERIES.items() if spec.headline]
    # steady-state warmup: run every headline plan once at the small
    # sibling SF (same generated code, same worker pool; different data)
    warm_dir = str(Path(sf_dir).parent / "sf0.001")
    if not os.path.isdir(warm_dir):
        warm_dir = sf_dir
    for name in headline:
        QUERIES[name].fn(spark, warm_dir).write.format("noop").mode(
            "overwrite"
        ).save()

    timings: dict[str, float] = {}
    for name in headline:
        t0 = time.perf_counter()
        QUERIES[name].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
