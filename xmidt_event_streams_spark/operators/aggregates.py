"""Observability-plane aggregates as real DataFrame queries
(SURVEY.md §2.6 M1-M7).

The reference computes these as Prometheus counters; here they are
first-class grouped aggregates (map-side partial aggregation + one
shuffle on the group key, the minimal plan).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from xmidt_event_streams_spark.enrich import extract_event_type

# queue_submit_duration histogram bucket upper bounds, ms
# (internal/metrics/fx.go:67-73)
SUBMIT_DURATION_BUCKETS_MS = (10, 100, 1000, 10_000, 60_000, 600_000, 2_000_000)


def event_type_counts(df: DataFrame, dest_col: str = "dest") -> DataFrame:
    """M1: COUNT(*) GROUP BY extracted event type
    (filter/filter_manager.go:132)."""
    return (
        df.groupBy(extract_event_type(dest_col).alias("event_type"))
        .agg(F.count("*").alias("n"))
    )


def drop_counts(
    df: DataFrame, stream_col: str = "stream_name", reason_col: str = "reject_reason"
) -> DataFrame:
    """M2/M3: COUNT(*) GROUP BY (stream, drop-reason) over the
    rejects/drops side-output (stream_dispatcher.go:42-98)."""
    return (
        df.filter(F.col(reason_col) != "")
        .groupBy(stream_col, reason_col)
        .agg(F.count("*").alias("n"))
    )


def duration_histogram(
    df: DataFrame,
    value_col: str,
    buckets=SUBMIT_DURATION_BUCKETS_MS,
    bucket_col: str = "le_ms",
) -> DataFrame:
    """M7: histogram bucketing via CASE cascade + groupBy; 'inf' is the
    overflow bucket. Cumulative counts are left to the reader (plain
    Prometheus convention would need a running sum)."""
    v = F.col(value_col)
    expr = F.lit("inf")
    for b in reversed(buckets):
        expr = F.when(v <= b, F.lit(str(b))).otherwise(expr)
    return df.groupBy(expr.alias(bucket_col)).agg(F.count("*").alias("n"))
