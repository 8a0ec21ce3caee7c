"""Dump .explain('formatted') for catalog queries to
plans/r11/<query>_<suffix>.txt (driver deliverable: the judge checks
plan claims against these files).

Usage: python plans/r11/dump_plans.py before q1 q2 ...   # or --all
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from xmidt_event_streams_spark.catalog import QUERIES  # noqa: E402
from xmidt_event_streams_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = Path(__file__).resolve().parent


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    if "--all" in names:
        names = [n for n, s in QUERIES.items() if s.headline]
    spark = get_spark("xes-plans")
    spark.sparkContext.setLogLevel("ERROR")
    for n in names:
        df = QUERIES[n].fn(spark, SF_DIR)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        (OUT / f"{n}_{suffix}.txt").write_text(txt)
        print(f"wrote {n}_{suffix}.txt ({len(txt)} bytes)")
    spark.stop()


if __name__ == "__main__":
    main()
