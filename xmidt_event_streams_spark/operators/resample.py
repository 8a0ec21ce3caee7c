"""Time-series resampling: fixed-interval grid with forward fill.

Event streams are irregular; dashboards, joins against other series,
and window models want a regular grid ("the value per user per 6 h,
carrying the last observation across gaps"). Spark has no native
resample; this is the DataFrame composition:

  1. bucket events to the grid (pure epoch arithmetic, narrow);
  2. per-(key, bucket) last value -- max_by over a (ts, id) struct,
     so ties break deterministically (one hash-agg shuffle);
  3. per-key grid from min to max bucket (sequence + explode --
     the only row amplification: span/interval rows per key);
  4. left-join observations onto the grid and forward-fill with
     last(ignorenulls) over an ordered per-key window.

Scale notes: the window in (4) partitions by key -- fine at any key
cardinality, but a SINGLE key spanning years at second granularity
makes span/interval huge; pick intervals so per-key grid length stays
~1e6 or less (the same discipline as session windows' gap). The grid
join keys are (key, bucket) -- uniform by construction. The whole
plan shuffles on key twice (agg + window), both unavoidable for
per-key order semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _resample_grid(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    id_col: str,
    interval_seconds: int,
) -> DataFrame:
    """Shared steps 1-4 head: (key, bucket_ts, _last, n_events) with
    null _last on gap buckets."""
    if interval_seconds <= 0:
        raise ValueError("interval_seconds must be positive")
    bucket = F.timestamp_seconds(
        (F.unix_timestamp(F.col(ts_col)) / interval_seconds).cast("long")
        * interval_seconds
    )
    per_bucket = (
        df.withColumn("_bkt", bucket)
        .groupBy(key_col, "_bkt")
        .agg(
            F.max_by(value_col, F.struct(ts_col, id_col)).alias("_last"),
            F.count("*").alias("n_events"),
        )
    )
    spans = per_bucket.groupBy(key_col).agg(
        F.min("_bkt").alias("_lo"), F.max("_bkt").alias("_hi")
    )
    grid = spans.select(
        key_col,
        F.explode(
            F.sequence(
                "_lo", "_hi", F.expr(f"INTERVAL {interval_seconds} SECONDS")
            )
        ).alias("bucket_ts"),
    )
    return grid.join(
        per_bucket,
        (grid[key_col] == per_bucket[key_col])
        & (grid["bucket_ts"] == per_bucket["_bkt"]),
        "left",
    ).select(grid[key_col], "bucket_ts", "_last", "n_events")


def resample_ffill(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    id_col: str = "event_id",
    interval_seconds: int = 3600,
) -> DataFrame:
    """(key, bucket_ts, value_ffill, n_events) on the regular grid.
    ``value_ffill`` is the last observed value at or before the
    bucket (ties within a bucket break by (ts, id) -- deterministic);
    gap buckets carry the previous value with n_events = 0. The grid
    spans each key's own [first, last] bucket -- no extrapolation
    beyond observed data."""
    joined = _resample_grid(
        df, key_col, ts_col, value_col, id_col, interval_seconds
    )
    w = (
        Window.partitionBy(key_col)
        .orderBy("bucket_ts")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return joined.select(
        key_col,
        "bucket_ts",
        F.round(F.last("_last", ignorenulls=True).over(w), 6).alias(
            "value_ffill"
        ),
        F.coalesce("n_events", F.lit(0)).alias("n_events"),
    )


def resample_interpolate(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    id_col: str = "event_id",
    interval_seconds: int = 3600,
) -> DataFrame:
    """Linear interpolation across gap buckets instead of carrying
    the last value: gap value = prev + (next - prev) * elapsed
    fraction. Every gap is interior by construction (the grid starts
    and ends on observed buckets), so the interpolation is always
    defined -- no extrapolation arm to get wrong. Two ordered per-key
    windows (preceding + following) on the same shuffle."""
    joined = _resample_grid(
        df, key_col, ts_col, value_col, id_col, interval_seconds
    )
    t = F.unix_timestamp("bucket_ts").cast("double")
    obs_t = F.when(F.col("_last").isNotNull(), t)
    wp = (
        Window.partitionBy(key_col)
        .orderBy("bucket_ts")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wn = (
        Window.partitionBy(key_col)
        .orderBy("bucket_ts")
        .rowsBetween(0, Window.unboundedFollowing)
    )
    prev_v = F.last("_last", ignorenulls=True).over(wp)
    prev_t = F.last(obs_t, ignorenulls=True).over(wp)
    next_v = F.first("_last", ignorenulls=True).over(wn)
    next_t = F.first(obs_t, ignorenulls=True).over(wn)
    interp = prev_v + (next_v - prev_v) * (t - prev_t) / (next_t - prev_t)
    return joined.select(
        key_col,
        "bucket_ts",
        F.round(
            F.when(F.col("_last").isNotNull(), F.col("_last")).otherwise(
                interp
            ),
            6,
        ).alias("value_interp"),
        F.coalesce("n_events", F.lit(0)).alias("n_events"),
    )
