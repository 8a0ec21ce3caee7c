"""Streaming heavy hitters: the stateful twin of
operators/frequency.frequent_tokens_exact.

A live ingest pipeline wants to see boilerplate/token drift as it
happens, not at the next batch audit. This operator shards the token
stream by a deterministic md5 bucket and keeps ONE Misra-Gries
summary per bucket in the checkpointed state store -- the same
mergeable-summaries decrement rule as the batch operator, folded
micro-batch by micro-batch via ``applyInPandasWithState``.

Sharding is what makes the state bounded AND the guarantee hold: an
md5 bucket owns its tokens exclusively (a token's global count IS its
in-bucket count), so a per-bucket summary of

    s >= 2 / (phi * n_buckets)

counters keeps every token whose global support reaches ``phi`` --
the bucket sees ~1/n_buckets of the stream, so the pigeonhole bound
divides by the fan-out. State per bucket: s (token, count) pairs plus
one total; n_buckets * s counters across the store, regardless of
stream length.

Output (update-shaped, one row per summary entry per trigger):
(bucket, token, est_count, bucket_total). ``est_count`` carries the
MG undercount bound est <= true <= est + bucket_total/(s+1);
consumers screen with the bound and, when exactness matters, recount
the (tiny) screened candidate set against the at-rest corpus --
exactly the batch operator's verify pass. This est-then-verify split
is the standard sketch/stream discipline; the estimates themselves
are deliberately NOT presented as exact counts.

Scale: state partitions by bucket key (n_buckets tasks touch state
per trigger); the Python loop touches only value_counts output per
Arrow batch. Crash-safe via the checkpoint like every stateful op
here (streaming/stateful.py is the pattern source).
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
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

from xmidt_event_streams_spark.functions.text import md5_bucket, tokens
from xmidt_event_streams_spark.operators.frequency import _merge_mg

_STATE_SCHEMA = StructType(
    [
        StructField("toks", ArrayType(StringType())),
        StructField("cnts", ArrayType(LongType())),
        StructField("total", LongType()),
    ]
)

_OUT_SCHEMA = StructType(
    [
        StructField("bucket", IntegerType()),
        StructField("token", StringType()),
        StructField("est_count", LongType()),
        StructField("bucket_total", LongType()),
    ]
)


def streaming_frequent_tokens(
    stream: DataFrame,
    s_per_bucket: int = 256,
    n_buckets: int = 32,
    text_col: str = "text",
) -> DataFrame:
    """Per-trigger heavy-hitter summaries over a text stream. See the
    module docstring for the guarantee; pick ``s_per_bucket`` >=
    2 / (phi * n_buckets) for the support floor you care about."""

    def update(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            toks, cnts, total = state.get
            summary = dict(zip(toks, cnts))
        else:
            summary, total = {}, 0
        for pdf in pdfs:
            vc = pdf["tok"].value_counts()
            total += int(vc.sum())
            summary = _merge_mg(summary, vc, s_per_bucket)
        state.update((list(summary), [summary[t] for t in summary], total))
        bucket = int(key[0])
        yield pd.DataFrame(
            {
                "bucket": bucket,
                "token": sorted(summary),
                "est_count": [summary[t] for t in sorted(summary)],
                "bucket_total": total,
            }
        )

    toks = stream.select(F.explode(tokens(text_col)).alias("tok")).select(
        "tok", md5_bucket("tok", n_buckets).cast("int").alias("bucket")
    )
    return toks.groupBy("bucket").applyInPandasWithState(
        update,
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def screen_heavy_hitters(
    summaries: DataFrame, phi: float, s_per_bucket: int
) -> DataFrame:
    """Batch post-filter over one trigger's summary rows: tokens that
    CANNOT be phi-frequent are dropped using the undercount bound
    (true <= est + bucket_total/(s+1) < phi*N => safely out); the
    survivors are the candidate set to exact-recount when exactness
    matters. N = sum of bucket totals over the latest summaries."""
    # one bucket_total per bucket (every summary row of a bucket
    # repeats it -- summing rows directly would multiply it by the
    # summary size)
    totals = (
        summaries.select("bucket", "bucket_total")
        .distinct()
        .agg(F.sum("bucket_total").alias("n"))
    )
    return (
        summaries.crossJoin(F.broadcast(totals))
        .filter(
            F.col("est_count")
            + F.col("bucket_total") / F.lit(float(s_per_bucket + 1))
            >= F.lit(float(phi)) * F.col("n")
        )
        .select("token", "est_count", "bucket_total", "n")
    )
