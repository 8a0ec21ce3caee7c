"""Bucketed (co-located) table layout: shuffle-free fact-fact joins.

At 100 TB the dominant cost of a fact-fact equi-join (lineitem ⋈
orders, corpus ⋈ index, events ⋈ sessions) is the shuffle of BOTH
sides on the join key. Broadcasting is off the table when neither side
is small, and AQE can only resize the shuffle it still has to run.
The classical fix is a **bucketed layout**: write each table hashed
into N buckets on its join key (optionally sorted within buckets).
Two tables bucketed on their join keys with the same bucket count
join with ZERO Exchange -- each task reads bucket i of both sides and
sort-merge-joins locally. The shuffle is paid once at write time and
amortized over every subsequent join, which is exactly the trade a
long-lived training-data corpus wants (write once, join daily).

Follow-on aggregations grouped by the bucket key also skip their
exchange (the scan already satisfies the required hash distribution).

This is Spark's native `bucketBy` (Hive-compatible bucketing on the
session catalog -- no Hive metastore needed; the in-memory/derby
catalog records bucket specs). Reference analog: the closest thing
the reference has is partition-key affinity on the sink
(internal/sender/kinesis_sender.go:99 -- SessionID keys all events
of a session to one shard); bucketing is the storage-layout
generalization of the same idea.

Scale notes:
  * Pick `n_buckets` so one bucket of the LARGER table fits an
    executor's working memory (bucket = total_bytes / n_buckets);
    at 100 TB with 512 MB targets that is ~200k buckets -- Spark
    handles large bucket counts fine because bucket->task mapping is
    1:1 and AQE-coalescible since 3.1.
  * `sort_by` the join key at write time: the join then runs as a
    merge of pre-sorted runs (no per-task sort at read).
  * Bucket pruning: equality predicates on the bucket key prune to
    a single bucket file per partition at PLAN time.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: Sequence[str],
    n_buckets: int,
    sort_cols: Sequence[str] | None = None,
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed parquet table in the session
    catalog. ``path`` makes it an external table (object-store
    layout); omitted -> warehouse dir."""
    if n_buckets <= 0:
        raise ValueError("n_buckets must be positive")
    if not bucket_cols:
        raise ValueError("bucket_cols must be non-empty")
    writer = df.write.format("parquet").mode(mode).bucketBy(
        n_buckets, *bucket_cols
    )
    # sorted buckets let the read side merge pre-sorted runs instead
    # of sorting every task's input
    writer = writer.sortBy(*(sort_cols or bucket_cols))
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def count_exchanges(df: DataFrame) -> int:
    """Number of shuffle Exchange operators in the physical plan.
    Used by tests to prove the co-located path, and by capacity
    reviews to audit a plan before it ships to the 100 TB cluster.

    Counts only nodes whose line BEGINS (after tree art) with
    ``Exchange`` -- a plain substring test would also count
    ``BroadcastExchange`` (not a shuffle) and ``ReusedExchange``
    lines (whose description embeds the reused child's ``Exchange
    hashpartitioning(...)`` text; reuse is not a second shuffle, and
    a reused *broadcast* is not a shuffle at all)."""
    import re

    plan = df._jdf.queryExecution().executedPlan().toString()
    node = re.compile(r"^[\s:+\-*(\d)]*Exchange\b")
    return sum(1 for line in plan.splitlines() if node.match(line))
