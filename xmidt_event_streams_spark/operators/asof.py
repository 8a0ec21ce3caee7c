"""As-of (point-in-time) join -- an operator Spark's DataFrame API
lacks, composed from union + window (no UDF, one shuffle).

Semantics: for each left row, attach the latest right row with the
same key and right_ts <= left_ts (ties at equal timestamps include the
right row -- DuckDB/pandas ``merge_asof`` convention).

Physical shape (the 100 TB story): tag both sides, unionByName, one
shuffle on the key, per-key sort, ``last(value, ignoreNulls=True)``
running window. This is exactly the sort-merge any dedicated as-of
implementation performs -- but expressed so Catalyst plans it; no
broadcast of either side, no range-explosion, skew handled by AQE.
The right side should be pre-deduplicated to one row per (key, ts)
for deterministic output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    value_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Left as-of join. Output = all left columns + value_cols (null
    when no right row precedes)."""
    value_cols = tuple(value_cols)
    lcols = left.columns

    lt = left.withColumn("_ts", F.col(left_ts)).withColumn("_side", F.lit(1))
    for c in value_cols:
        if c not in lt.columns:
            lt = lt.withColumn(c, F.lit(None))
    rt = right.select(
        F.col(key),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        *[F.col(c) for c in value_cols],
    )
    for c in lcols:
        if c not in rt.columns:
            rt = rt.withColumn(c, F.lit(None))

    u = lt.select(*lcols, "_ts", "_side", *value_cols).unionByName(
        rt.select(*lcols, "_ts", "_side", *value_cols)
    )
    # right rows sort before left rows at equal ts => <= semantics
    w = (
        Window.partitionBy(key)
        .orderBy(F.col("_ts").asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = u.select(
        *lcols,
        F.col("_side"),
        *[
            F.last(F.when(F.col("_side") == 0, F.col(c)), ignorenulls=True)
            .over(w)
            .alias(f"_asof_{c}")
            for c in value_cols
        ],
    )
    return filled.filter(F.col("_side") == 1).select(
        *lcols, *[F.col(f"_asof_{c}").alias(c) for c in value_cols]
    )
