"""Benchmark harness: runs the headline catalog queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) and prints ONE JSON
line: {"metric", "value" (total sec), "unit", "queries": {name: sec},
"sf"}.

Each query is forced with the noop sink (full computation, no collect
overhead, no result materialization on the driver).

Timings are STEADY-STATE and the JSON says so: two passes run at the
bench SF; the first (cold: whole-stage-codegen JIT, Arrow worker
fork) is reported as ``cold_total_sec``, the second (warm) is the
headline ``value`` with ``"warm": true``. First-ever-call overhead is
a per-process constant, not per-query work: on a long-lived cluster
it amortizes to zero, so ranking queries by cold numbers would
misrank the ones the 100 TB design actually cares about — but the
cold total stays in the artifact so cross-round comparisons are
self-describing (a methodology change can't masquerade as a speedup).
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

    def run_pass() -> dict[str, float]:
        t: dict[str, float] = {}
        for name in headline:
            t0 = time.perf_counter()
            QUERIES[name].fn(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            t[name] = round(time.perf_counter() - t0, 3)
        return t

    # pass 1 = cold (codegen JIT + Arrow worker fork). JIT tiering is
    # still settling during the second pass (measured ~10% above the
    # converged state), so steady state = per-query MIN over two warm
    # passes.
    cold = run_pass()
    warm1, warm2 = run_pass(), run_pass()
    timings = {n: min(warm1[n], warm2[n]) for n in warm1}

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_sec",
                "value": total,
                "unit": "sec",
                "warm": True,
                "warm_passes": 2,
                "cold_total_sec": round(sum(cold.values()), 3),
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
