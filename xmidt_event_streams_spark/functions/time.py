"""Time scalar functions (SURVEY.md §2.7 F1-F5).

Canonical stored form is UTC epoch-microseconds int64
(reference: internal/mytime/time.go:60-66); internally we carry
TimestampType and convert at the edges.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def ts_from_rfc3339(col: Column | str) -> Column:
    """F1: RFC3339Nano string -> timestamp (mytime/time.go:21-23).
    ISO-8601 is handled natively by to_timestamp."""
    return F.to_timestamp(F.col(col) if isinstance(col, str) else col)


def ts_from_number_string(col: Column | str) -> Column:
    """F2: numeric-string epoch -> UTC timestamp (mytime/time.go:26-41).

    The reference treats values >= 1e15 as microseconds, else seconds
    (heuristic for mixed epoch precisions).
    """
    col = F.col(col) if isinstance(col, str) else col
    n = col.cast("double")
    return F.when(
        n >= 1e15, F.timestamp_micros(col.cast("long"))
    ).otherwise(F.timestamp_seconds(n))


def ts_from_date_string(col: Column | str) -> Column:
    """F3: RFC3339 -> timestamp with Unix(0,0) sentinel on parse error
    (mytime/time.go:44-50)."""
    col = F.col(col) if isinstance(col, str) else col
    return F.coalesce(F.try_to_timestamp(col), F.timestamp_seconds(F.lit(0)))


def duration_seconds_from_string(col: Column | str) -> Column:
    """F4: Go duration string ('30s', '5m', '1h30m' unsupported ->
    simple unit suffix forms) -> seconds as double (mytime/time.go:52-58)."""
    col = F.col(col) if isinstance(col, str) else col
    num = F.regexp_extract(col, r"^([0-9.]+)", 1).cast("double")
    unit = F.regexp_extract(col, r"(ms|s|m|h)$", 1)
    return (
        F.when(unit == "ms", num / 1000.0)
        .when(unit == "s", num)
        .when(unit == "m", num * 60.0)
        .when(unit == "h", num * 3600.0)
        .otherwise(F.lit(None).cast("double"))
    )


def time_to_stored(col: Column | str) -> Column:
    """F5: timestamp -> UTC epoch-micros int64 (mytime/time.go:60-62)."""
    return F.unix_micros(F.col(col) if isinstance(col, str) else col)


def stored_to_time(col: Column | str) -> Column:
    """F5: epoch-micros int64 -> timestamp (mytime/time.go:64-66)."""
    return F.timestamp_micros(F.col(col) if isinstance(col, str) else col)
