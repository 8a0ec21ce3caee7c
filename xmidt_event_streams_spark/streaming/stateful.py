"""Custom stateful streaming operator: the reference's hybrid
size-OR-time micro-batch flush as applyInPandasWithState.

The reference's per-filter queue loop (internal/queue/queue.go:142-207)
accumulates matched messages and flushes when EITHER
  * the buffer reaches ``batch_size``   (B2, queue.go:177-182), or
  * the 15 s ticker fires               (B3, queue.go:169-172).

Structured Streaming's triggers are time-based only, so the size arm
needs state: this operator keeps the per-stream buffer in the state
store (checkpointed -- unlike the reference's in-memory channel, a
crash loses nothing) and emits one output row per flushed delivery
batch. ProcessingTimeTimeout plays the ticker's role: when a stream
key sees no new data for ``time_limit_ms``, the remainder flushes.

This is the documented SURVEY.md §2.4 parity gap closed with the
"custom stateful operator" tool (applyInPandasWithState), and the
pattern to copy for any bespoke buffering/windowing semantics Spark
lacks natively.

Operational note: do NOT run this operator under
``trigger(availableNow=True)`` expecting termination -- while any key
holds state with a pending processing-time timeout, Spark spins empty
micro-batches until the timeout fires, so the query only stops once
all buffers have flushed. Use a processing-time trigger in production
(the natural mode) or ``processAllAvailable()`` + ``stop()`` in tests.

Scale notes: state is partitioned by stream key (the natural shard
key -- the reference runs one goroutine per filter, we run one state
partition per key, which AQE/state-store scale horizontally). Arrow
batches in/out; the Python hot loop touches only buffered row
payloads, never the full stream.
"""

from __future__ import annotations

from typing import Any, Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

DEFAULT_BATCH_SIZE = 100  # default_batch_size, install/config.go:232
DEFAULT_TIME_LIMIT_MS = 15_000  # DefaultBatchTimeLimitSeconds, queue.go:25

FLUSH_OUTPUT_SCHEMA = StructType(
    [
        StructField("stream_name", StringType()),
        StructField("items", ArrayType(StringType())),
        StructField("n", IntegerType()),
        StructField("flush_reason", StringType()),  # 'size' | 'time'
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("buffered", ArrayType(StringType())),
        StructField("emitted_batches", LongType()),
    ]
)


def hybrid_flush(
    routed: DataFrame,
    item_col: str = "item",
    key_col: str = "stream_name",
    batch_size: int = DEFAULT_BATCH_SIZE,
    time_limit_ms: int = DEFAULT_TIME_LIMIT_MS,
) -> DataFrame:
    """Group ``routed`` (a streaming DF with a serialized ``item_col``)
    by ``key_col`` and emit delivery batches under size-OR-time flush.

    Output rows: (stream_name, items array<string>, n, flush_reason).
    """

    def flush(
        key: tuple,
        pdfs: Iterator[Any],
        state: GroupState,
    ) -> Iterator[Any]:
        import pandas as pd

        if state.exists:
            (buffered, emitted) = state.get
            buf = list(buffered)
        else:
            buf, emitted = [], 0

        if not state.hasTimedOut:
            for pdf in pdfs:
                buf.extend(pdf[item_col].tolist())

        flushed: list[tuple[list, str]] = []
        while len(buf) >= batch_size:  # B2 size arm
            flushed.append((buf[:batch_size], "size"))
            buf = buf[batch_size:]
        if state.hasTimedOut and buf:  # B3 ticker arm
            flushed.append((buf, "time"))
            buf = []

        if buf:
            state.update((buf, emitted + len(flushed)))
            state.setTimeoutDuration(time_limit_ms)
        elif state.exists:
            state.remove()

        if flushed:
            yield pd.DataFrame(
                {
                    "stream_name": [key[0]] * len(flushed),
                    "items": [items for items, _ in flushed],
                    "n": [len(items) for items, _ in flushed],
                    "flush_reason": [reason for _, reason in flushed],
                }
            )

    return (
        routed.groupBy(F.col(key_col))
        .applyInPandasWithState(
            flush,
            outputStructType=FLUSH_OUTPUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )
