"""Micro-batch chunk assignment and partition keying (SURVEY.md §2.4/2.5).

The reference chunks delivery batches to <= 500 records (AWS PutRecords
limit, internal/kinesis/kinesis.go:27, chunk arithmetic
internal/batch/batch.go:6-38) and keys Kinesis partitioning by
session_id (internal/sender/kinesis_sender.go:99). Here both are pure
column expressions so the planner sees them; the only shuffle is the
(optional) repartition for sink-ordering.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

MAX_PUT_RECORDS_BATCH_SIZE = 500  # internal/kinesis/kinesis.go:27


def assign_batches(
    df: DataFrame,
    partition_col: str,
    order_col: str,
    batch_size: int = MAX_PUT_RECORDS_BATCH_SIZE,
    batch_col: str = "batch_no",
) -> DataFrame:
    """B6: 0-based chunk number within each partition group, by a
    deterministic order. floor((row_number-1)/size) reproduces
    batch.GetBatches arithmetic (internal/batch/batch.go:19-38):
    n items -> ceil(n/size) chunks, last one ragged.

    Scale note: the window shuffles by partition_col only (same
    shuffle the sink ordering needs anyway); within-group sort is
    local. For the streaming path the chunking happens per micro-batch
    partition in the writer instead (no global window needed).
    """
    w = Window.partitionBy(partition_col).orderBy(order_col)
    rn = F.row_number().over(w)
    return df.withColumn(batch_col, F.floor((rn - F.lit(1)) / F.lit(batch_size)))


def partition_key(session_col: Column | str = "session_id") -> Column:
    """K2: delivery partition key = session id (all events of one
    session -> same shard, ordered)."""
    return F.col(session_col) if isinstance(session_col, str) else session_col


def chunk_local(rows: list, batch_size: int = MAX_PUT_RECORDS_BATCH_SIZE) -> list[list]:
    """Driver/writer-side chunking of an already-materialized list
    (the foreachBatch writer's per-partition loop). Mirrors
    batch.GetBatches (internal/batch/batch.go:19-38): returns [] for
    empty input, last chunk ragged."""
    if batch_size <= 0:
        raise ValueError("batch_size must be positive")
    return [rows[i : i + batch_size] for i in range(0, len(rows), batch_size)]
