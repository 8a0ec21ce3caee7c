"""V5 admission control: load-shedding beyond an outstanding-work cap.

The reference's ingress handler sheds load when the global incoming
queue depth exceeds ``maxOutstanding`` (default 10,000): the request
is answered 503 and never enters the pipeline (atomic counter check,
internal/event/request_handler.go:79-88; default :19; config
install/config.go:89-91).

Structured Streaming's native answer is back-pressure, not shedding
(``maxFilesPerTrigger`` / ``maxOffsetsPerTrigger`` bound each
micro-batch at the durable source with no data loss) — that remains
the documented SURVEY.md §2.2 semantic upgrade and the default
posture. This operator exists for reference parity and for pipelines
that genuinely must cap per-trigger work at any cost: it marks each
row admitted/shed so the shed rows can flow to a rejects sink (the
503 analog) instead of silently vanishing.

Two modes, mirroring the reference's own precision trade-off:

* ``exact``    — one global ``row_number`` (an unpartitioned window =
  a single-task sort). This IS the atomic counter: a serialization
  point, correct to the row, fine for control-plane volumes. Not the
  100 TB path — just like a single atomic counter isn't.
* ``best_effort`` — per-partition quota via ``mapInPandas``: no
  shuffle, no coordination; admits at most
  ``ceil(max_outstanding / n_shards)`` rows per partition. The
  reference's own check is racy (``len(chan) < cap(chan)`` is
  non-atomic across goroutines — SURVEY.md §2.4 B1 note), so
  best-effort shedding is faithful, and it is the shape that scales:
  each task decides locally. ``n_shards`` defaults to the DataFrame's
  actual partition count for BATCH inputs (each partition is one
  quota shard, so the aggregate cap is exact at
  quota*num_partitions ≈ max_outstanding regardless of how many
  partitions the plan produced) and to the session's
  ``defaultParallelism`` for STREAMING inputs, where resolving the
  partition count would need an RDD plan conversion that is ILLEGAL
  on a streaming DataFrame — there, parallelism is how many tasks
  can race concurrently, the direct analog of the reference's racing
  goroutines. If a streaming micro-batch arrives with more partitions
  than ``defaultParallelism``, the aggregate cap loosens by that
  ratio; pass ``n_shards`` explicitly to pin it.
"""

from __future__ import annotations

import math
from typing import Iterator

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import BooleanType, StructField, StructType

DEFAULT_MAX_OUTSTANDING = 10_000  # defaultMaxOutstanding, request_handler.go:19

ADMITTED_COL = "admitted"
REJECT_STATUS = 503  # request_handler.go:83 (http.StatusServiceUnavailable)


def admission_mark(
    df: DataFrame,
    max_outstanding: int = DEFAULT_MAX_OUTSTANDING,
    order_col: str | None = None,
    mode: str = "best_effort",
    n_shards: int | None = None,
) -> DataFrame:
    """Add a boolean ``admitted`` column: True for rows within the
    ``max_outstanding`` cap, False for shed rows.

    ``order_col`` (exact mode) fixes WHICH rows are admitted
    (ascending order wins); best-effort mode admits each partition's
    first rows in partition order, like the reference admits whichever
    requests raced in before the counter tripped. ``n_shards``
    (best-effort) divides the cap into per-partition quotas; defaults
    to the input's partition count for batch DataFrames (exact
    aggregate cap) and to the session's ``defaultParallelism`` for
    streaming ones (no RDD conversion is possible there).
    """
    if mode == "exact":
        order = F.col(order_col) if order_col else F.monotonically_increasing_id()
        w = Window.orderBy(order)
        return df.withColumn(
            ADMITTED_COL, F.row_number().over(w) <= F.lit(max_outstanding)
        )
    if mode != "best_effort":
        raise ValueError(f"mode must be 'exact' or 'best_effort', got {mode!r}")

    if n_shards is None:
        if df.isStreaming:
            n_shards = df.sparkSession.sparkContext.defaultParallelism
        else:
            # batch: the partition count is knowable, so the cap can be
            # exact -- quota * num_partitions ~= max_outstanding even
            # when the plan produced more partitions than parallelism
            n_shards = df.rdd.getNumPartitions()
    quota = max(1, math.ceil(max_outstanding / max(1, n_shards)))
    out_schema = StructType(df.schema.fields + [StructField(ADMITTED_COL, BooleanType())])

    def mark(batches: Iterator) -> Iterator:
        taken = 0
        for pdf in batches:
            n = len(pdf)
            room = max(0, quota - taken)
            pdf[ADMITTED_COL] = [i < room for i in range(n)]
            taken += min(n, room)
            yield pdf

    return df.mapInPandas(mark, schema=out_schema)


def admission_control(
    df: DataFrame,
    max_outstanding: int = DEFAULT_MAX_OUTSTANDING,
    order_col: str | None = None,
    mode: str = "best_effort",
    n_shards: int | None = None,
) -> tuple[DataFrame, DataFrame]:
    """(admitted, rejected) split; rejected rows carry
    ``reject_status`` 503 for the rejects sink, mirroring the
    reference's HTTP answer."""
    marked = admission_mark(df, max_outstanding, order_col, mode, n_shards)
    admitted = marked.filter(F.col(ADMITTED_COL)).drop(ADMITTED_COL)
    rejected = (
        marked.filter(~F.col(ADMITTED_COL))
        .drop(ADMITTED_COL)
        .withColumn("reject_status", F.lit(REJECT_STATUS))
    )
    return admitted, rejected
