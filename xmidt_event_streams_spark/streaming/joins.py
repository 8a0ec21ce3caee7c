"""Stream-stream joins: event-time-bounded correlation of two live
streams (click -> purchase attribution, request -> response pairing,
event -> ack tracking).

The reference correlates nothing across streams -- every WRP message
is routed independently (SURVEY.md §2.8 'joins: none'). A
training-data/analytics engine needs the correlation primitive, and
Structured Streaming provides it natively IF the query gives the
planner two things (Spark's stream-stream join contract):

  * a watermark on BOTH sides -- bounds how late each side can be;
  * a time-range predicate tying the two event times -- bounds how
    long one side's row must be buffered awaiting the other.

Together they make the join state FINITE: a left row is dropped from
the state store once the right watermark passes ``left_ts + within``,
so state size tracks the (rate x window) product, not the stream's
lifetime. Without the time bound Spark would have to keep every row
forever (the planner rejects outer joins outright in that case).

Scale notes for the 1000-executor case:
  * state lives in the state store keyed by join key -- use
    session.ROCKSDB_STATE_CONF so buffered rows spill to SSD;
  * both sides shuffle on the join key once; skewed keys salt the
    same way batch joins do (operators/skew.py) at the cost of
    key-local ordering;
  * outer-join nulls emit only after the watermark closes the bound,
    so end-to-end latency of "no match" verdicts = watermark delay +
    ``within`` -- size the watermark to the real late-data tail, not
    defensively large.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_stream_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    within: str = "1 hour",
    watermark: str = "10 minutes",
    how: str = "inner",
) -> DataFrame:
    """Join two streams on ``key`` where the right event lands within
    ``(left_ts, left_ts + within]`` -- the attribution shape (a
    purchase follows the click it converts). Both inputs may also be
    batch DataFrames: the same plan runs in either mode, which is how
    the correctness tests pin semantics.

    ``how``: 'inner' (matches only), 'leftOuter' (left rows with no
    match in the bound emit once, null-padded, after the watermark
    expires the bound), 'rightOuter' symmetric.

    Columns are disambiguated with ``l_`` / ``r_`` prefixes (a
    self-join on the same source is the common case and Spark's
    duplicate-attribute resolution cannot be left to chance in a
    checkpointed query).
    """
    lpref = left.select(
        *[F.col(c).alias(f"l_{c}") for c in left.columns]
    )
    rpref = right.select(
        *[F.col(c).alias(f"r_{c}") for c in right.columns]
    )
    if left.isStreaming:
        lpref = lpref.withWatermark(f"l_{left_ts}", watermark)
    if right.isStreaming:
        rpref = rpref.withWatermark(f"r_{right_ts}", watermark)
    cond = (
        (F.col(f"l_{key}") == F.col(f"r_{key}"))
        & (F.col(f"r_{right_ts}") > F.col(f"l_{left_ts}"))
        & (
            F.col(f"r_{right_ts}")
            <= F.col(f"l_{left_ts}") + F.expr(f"INTERVAL {within}")
        )
    )
    return lpref.join(rpref, cond, how)


def attribution_join(
    clicks: DataFrame,
    purchases: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    within: str = "1 hour",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Click-through attribution: every (click, purchase) pair of the
    same ``key`` with the purchase inside the post-click window.
    Output: key, click_ts, purchase_ts, lag_seconds. Batch twin of
    the same plan is oracle-checked (range_join_clicks is the
    binned-equi-join variant for batch backfills; this one is the
    streaming-native shape)."""
    j = stream_stream_join(
        clicks, purchases, key, ts_col, ts_col, within, watermark, "inner"
    )
    return j.select(
        F.col(f"l_{key}").alias(key),
        F.col(f"l_{ts_col}").alias("click_ts"),
        F.col(f"r_{ts_col}").alias("purchase_ts"),
        (
            F.unix_micros(F.col(f"r_{ts_col}"))
            - F.unix_micros(F.col(f"l_{ts_col}"))
        ).alias("lag_micros"),
    )
