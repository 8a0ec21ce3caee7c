"""Custom stateful streaming operator: the reference's hybrid
size-OR-time micro-batch flush as applyInPandasWithState.

The reference's per-filter queue loop (internal/queue/queue.go:142-207)
accumulates matched messages and flushes when EITHER
  * the buffer reaches ``batch_size``   (B2, queue.go:177-182), or
  * the 15 s ticker fires               (B3, queue.go:169-172), or
  * the incoming channel drains with ``SubmitOnEmptyQueue`` set
                                        (B4, queue.go:209-216).

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
DEFAULT_QUEUE_SIZE = 1000  # default_queue_size, install/config.go:231

FLUSH_OUTPUT_SCHEMA = StructType(
    [
        StructField("stream_name", StringType()),
        StructField("items", ArrayType(StringType())),
        StructField("n", IntegerType()),
        StructField("flush_reason", StringType()),  # 'size' | 'time' | 'idle'
        StructField("dropped_total", LongType()),  # B1 counter (0 if unbounded)
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("buffered", ArrayType(StringType())),
        StructField("emitted_batches", LongType()),
        StructField("first_buffered_ms", LongType()),
        StructField("dropped_total", LongType()),
    ]
)


def hybrid_flush(
    routed: DataFrame,
    item_col: str = "item",
    key_col: str = "stream_name",
    batch_size: int = DEFAULT_BATCH_SIZE,
    time_limit_ms: int = DEFAULT_TIME_LIMIT_MS,
    submit_on_empty_queue: bool = False,
    queue_size: int | None = None,
) -> DataFrame:
    """Group ``routed`` (a streaming DF with a serialized ``item_col``)
    by ``key_col`` and emit delivery batches under size-OR-time flush.

    Output rows: (stream_name, items array<string>, n, flush_reason).

    B3 latency bound: the timeout is anchored at the FIRST buffered
    item's processing time -- an arrival does not reset the clock, so
    no item waits longer than ``time_limit_ms`` even under a steady
    trickle (the reference's free-running 15 s ticker, queue.go:169,
    gives the same bound; anchoring differs only in phase).

    ``submit_on_empty_queue`` is B4 (``SubmitOnEmptyQueue``,
    queue.go:209-216; spec queue_test.go:444-483): once the incoming
    channel drains, the remainder submits immediately instead of
    waiting for size/time. A micro-batch IS the drain here, so with
    this flag each invocation's leftover flushes with reason
    ``'idle'`` and no state is carried.

    ``queue_size`` is B1 (bounded buffer with drop-on-full:
    ``MyQueue.AddItem``, queue.go:133-140; default capacity
    ``default_queue_size`` 1000, install/config.go:231): when set,
    arrivals beyond ``queue_size`` buffered items are DROPPED (newest
    shed first, matching AddItem's reject-the-arrival) and counted;
    the cumulative per-key counter rides every output row as
    ``dropped_total`` (the M2 ``queue_full`` metric twin). Default
    ``None`` keeps the Spark-native semantic upgrade: Structured
    Streaming back-pressures at the durable source and never sheds
    (SURVEY.md §2.4 B1 note) — use the bound only for reference
    parity or when a key's backlog must be capped at any cost.
    """
    flush = _make_flush_handler(
        item_col, batch_size, time_limit_ms, submit_on_empty_queue,
        queue_size,
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


def _make_flush_handler(
    item_col: str,
    batch_size: int,
    time_limit_ms: int,
    submit_on_empty_queue: bool,
    queue_size: int | None,
):
    """The size-OR-time flush handler as a module-level factory, so
    the B3 anchoring semantics can be pinned DETERMINISTICALLY
    against a fake GroupState (test_stateful_streaming's unit pins):
    a wall-clock e2e discriminator between anchored and
    reset-on-arrival flushes is inherently box-sensitive -- scheduler
    latency on a loaded machine blurs the two fire times together --
    but the semantic lives entirely in what this handler passes to
    ``setTimeoutDuration``, which a fake state observes exactly."""

    def flush(
        key: tuple,
        pdfs: Iterator[Any],
        state: GroupState,
    ) -> Iterator[Any]:
        import pandas as pd

        if state.exists:
            (buffered, emitted, first_ms, dropped) = state.get
            buf = list(buffered)
        else:
            buf, emitted, first_ms, dropped = [], 0, None, 0

        now_ms = state.getCurrentProcessingTimeMs()
        if not state.hasTimedOut:
            was_empty = not buf
            for pdf in pdfs:
                items = pdf[item_col].tolist()
                if queue_size is not None:  # B1 drop-on-full
                    room = queue_size - len(buf)
                    if len(items) > room:
                        dropped += len(items) - max(room, 0)
                        items = items[: max(room, 0)]
                buf.extend(items)
            if buf and was_empty:
                first_ms = now_ms

        flushed: list[tuple[list, str]] = []
        while len(buf) >= batch_size:  # B2 size arm
            flushed.append((buf[:batch_size], "size"))
            buf = buf[batch_size:]
        if state.hasTimedOut and buf:  # B3 ticker arm
            flushed.append((buf, "time"))
            buf = []
        if submit_on_empty_queue and buf:  # B4: the batch drained
            flushed.append((buf, "idle"))
            buf = []

        # keep state while anything is buffered, and keep the B1
        # counter alive once a drop has happened (Prometheus-counter
        # lifetime: one tiny row per key)
        if buf or dropped:
            state.update((buf, emitted + len(flushed), first_ms, dropped))
            if buf:
                # remaining time until the oldest buffered item
                # reaches the limit -- never a fresh full interval
                state.setTimeoutDuration(
                    max(1, time_limit_ms - (now_ms - (first_ms or now_ms)))
                )
        elif state.exists:
            state.remove()

        if flushed:
            yield pd.DataFrame(
                {
                    "stream_name": [key[0]] * len(flushed),
                    "items": [items for items, _ in flushed],
                    "n": [len(items) for items, _ in flushed],
                    "flush_reason": [reason for _, reason in flushed],
                    "dropped_total": [dropped] * len(flushed),
                }
            )

    return flush
