"""Event-time sessionization and per-key latest-row dedup.

The reference keys Kinesis partitioning by session id but never
computes sessions (SURVEY.md §2.8 -- event timestamps exist in the
data, never used for windowing). These are the natural event-time
upgrades; identical semantics in batch and Structured Streaming
(streaming adds a watermark).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
    watermark: str | None = None,
) -> DataFrame:
    """Session windows: events of one key within ``gap`` of each other
    merge into one session. Output (key, session_start, session_end,
    n_events) where session_end = last event + gap (Spark
    session_window convention).

    Batch and streaming share this exact code path; pass ``watermark``
    (e.g. '10 minutes') on the streaming side for state eviction.
    """
    if watermark:
        df = df.withWatermark(ts_col, watermark)
    gap = f"{gap_minutes} minutes"
    out = df.groupBy(
        F.col(key_col), F.session_window(F.col(ts_col), gap).alias("w")
    ).agg(F.count("*").alias("n_events"))
    return out.select(
        F.col(key_col),
        F.col("w.start").alias("session_start"),
        F.col("w.end").alias("session_end"),
        "n_events",
    )


def latest_per_key(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Keep the most recent row per key (CDC-style compaction /
    snapshot dedup). One shuffle on the key; max_by avoids a full
    window sort when only the winner is needed -- but row_number is
    used so ALL columns survive; ties broken deterministically."""
    order = [F.col(ts_col).desc()]
    if tiebreak_col:
        order.append(F.col(tiebreak_col).desc())
    w = Window.partitionBy(key_col).orderBy(*order)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
