"""Bounded-interval (range) join via time-bucket binning.

Spark compiles a raw non-equi time-range join ``l.key = r.key AND
r.ts BETWEEN l.ts - W AND l.ts`` to BroadcastNestedLoopJoin (small
right) or a cartesian per key group -- both collapse at 100 TB. The
scalable plan is the classic *binning* rewrite:

  bucket(ts) = floor(unix_micros(ts) / W)

A right row in window ``(l.ts - W, l.ts]`` can only live in the left
row's bucket or the one before it, so replicating the LEFT side into
its two candidate buckets (2x the smaller, probe-side relation) turns
the range join into an equi-join on (key, bucket) followed by the
exact range filter. Shuffle keys are (key, bucket): bounded fan-out,
AQE-splittable, no nested loop. Flink's interval join and KDB's
window join use the same decomposition.

The reference has no joins at all (SURVEY.md §2.8) -- this is part of
the beyond-reference relational layer, and the primitive behind
"events within X minutes of each other" stream correlation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    window_seconds: int = 3600,
    strict_before: bool = True,
) -> DataFrame:
    """Join each left row to right rows with the same ``key`` and
    ``right_ts`` in ``(left_ts - window, left_ts]`` (or ``[.., l)``
    when ``strict_before``: right strictly earlier than left).

    Columns of both inputs are preserved; right's ts is suffixed
    ``_r`` if names collide. Inner join: left rows with no right rows
    in range are absent (wrap with a left join on the output keys to
    keep them).
    """
    w_us = window_seconds * 1_000_000
    rts = right_ts if right_ts != left_ts else f"{right_ts}_r"
    r = right.withColumnRenamed(right_ts, rts) if rts != right_ts else right

    lb = (F.unix_micros(F.col(left_ts)) / w_us).cast("long")
    # left row probes its own bucket and the previous one
    lx = left.withColumn("_bucket", F.explode(F.array(lb - 1, lb)))
    rx = r.withColumn("_bucket", (F.unix_micros(F.col(rts)) / w_us).cast("long"))

    upper = (
        F.col(rts) < F.col(left_ts)
        if strict_before
        else F.col(rts) <= F.col(left_ts)
    )
    lower = F.col(rts) >= F.col(left_ts) - F.expr(
        f"INTERVAL {window_seconds} SECONDS"
    )
    return lx.join(rx, on=["_bucket", key]).filter(upper & lower).drop("_bucket")
