"""Embedding ingest: the vector-side twin of ingest_dedup.

A live embedding pipeline (encoder output, re-embedding jobs) needs
the same admission discipline documents get: validate, ledger the
rejects, fold the admitted vectors into the searchable index --
per micro-batch, replay-safe.

Per trigger: ``validate_embeddings`` splits the batch into
(valid, rejects-with-reason); valid vectors are assigned to their IVF
cells and folded into the index under the checkpoint-deterministic
batch id (``append_to_ivf_index(batch_id=...)`` dynamically
overwrites only this batch's (cell, batch) partitions, so an
at-least-once replay rewrites its own rows instead of duplicating
ids in every later search); rejects land partitioned by batch id the
same way. Probe-side cell pruning is unaffected -- cell stays the
leading partition key.

Layout contract: the streaming index must use the batch-partitioned
layout from its FIRST row -- initialize empty
(``write_ivf_index(df.limit(0), path, centroids)`` writes the
centroid sidecar and no data files) and fold any pre-existing corpus
as ``append_to_ivf_index(corpus, path, batch_id=-1)``. Mixing plain
appends and batch appends under one root breaks Spark's partition
discovery (inconsistent partition columns), which is a loud error,
not a wrong answer.

Centroid drift over a long-lived stream is the operational caveat --
same story as append_to_ivf_index: monitor assignment balance
(operators/drift.psi over the cell histogram), rebuild + atomic-swap
when it alarms.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from xmidt_event_streams_spark.functions.vectors import validate_embeddings
from xmidt_event_streams_spark.operators.ivf import append_to_ivf_index
from xmidt_event_streams_spark.streaming.ingest_dedup import (
    idempotent_batch_append,
)


def start_ingest_vectors(
    stream_df: DataFrame,
    index_path: str,
    rejects_path: str,
    checkpoint_dir: str,
    dim: int,
    vec_col: str = "embedding",
    allow_zero: bool = False,
    availableNow: bool = False,
    trigger_seconds: int = 15,
    query_name: str | None = None,
):
    """Start the vector-ingest query. Returns the StreamingQuery.

    The index at ``index_path`` must exist with a centroid sidecar
    (see module docstring for the layout contract)."""

    def _write(batch: DataFrame, batch_id: int) -> None:
        valid, rejects = validate_embeddings(
            batch, dim, vec_col, allow_zero=allow_zero
        )
        append_to_ivf_index(valid, index_path, vec_col, batch_id=batch_id)
        idempotent_batch_append(rejects, batch_id, rejects_path, max_files=1)

    writer = stream_df.writeStream.foreachBatch(_write).option(
        "checkpointLocation", checkpoint_dir
    )
    if query_name:
        writer = writer.queryName(query_name)
    if availableNow:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    return writer.start()
