"""Driver contract for the spark-graft builder (PySpark target).

Backed by the query catalog in ``xmidt_event_streams_spark.catalog``:
one entry per implemented operator from SURVEY.md §2 (reference parity)
plus the beyond-reference LLM-pipeline operators (dedup, similarity,
text analysis, multimodal plumbing). Each query has a DuckDB oracle
twin unless marked rows-only.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from xmidt_event_streams_spark.catalog import QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: fan-out routing of the
    event stream against the filter config, aggregated per
    (stream, event type) -- the reference's hot path end-to-end."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return QUERIES["flagship_route_counts"].fn(spark, "/root/testdata/sf0.001")


def _wrap(fn) -> Callable[[SparkSession, str], DataFrame]:
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        # the driver may hand us a vanilla session; apply the configs
        # the catalog depends on (UTC + nanos-timestamp reading)
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        return fn(spark, sf_dir)

    return run


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: _wrap(spec.fn) for name, spec in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: spec.sql for name, spec in QUERIES.items() if spec.sql is not None
    }
