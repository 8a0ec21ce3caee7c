"""Dedup-on-ingest: a streaming document source deduplicated against
the persistent corpus index, micro-batch by micro-batch.

Composes the streaming spine with operators/incremental.py: each
micro-batch is (1) marked against the index — prior corpus AND every
earlier batch of this stream, since survivors are appended — (2) its
unique docs land in the corpus sink and the index, (3) its duplicates
land in a rejects sink with the id they duplicate (the same
never-silently-drop posture as validation rejects and admission
shedding).

Exactly-once story: the source offsets are checkpointed, and BOTH
writes inside the batch (corpus append + index append) are idempotent
per doc id at the read layer — a replayed batch re-appends the same
rows, and every downstream consumer of the corpus/index already
dedups by id (min-id survivor rules), so replays cannot change any
retention verdict. A doc that duplicates something seen in ANY prior
trigger is caught by the index probe, which is what
``dropDuplicatesWithinWatermark`` cannot do: its state is bounded by
the watermark, while the index IS the unbounded state, kept on
storage instead of in executor memory.

Scale shape per trigger: signature the batch only (narrow), broadcast
its band keys against the prefix-partitioned index (big side never
shuffles, dynamic partition pruning prunes untouched directories),
two appends. Cost tracks batch size, never corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from xmidt_event_streams_spark.operators.incremental import (
    append_to_minhash_index,
    incremental_dedup_mark,
)


def start_ingest_dedup(
    stream_df: DataFrame,
    index_path: str,
    corpus_path: str,
    rejects_path: str,
    checkpoint_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_agreement: float = 0.5,
    num_hashes: int = 8,
    bands: int = 4,
    shingle_n: int = 3,
    availableNow: bool = False,
    trigger_seconds: int = 15,
    query_name: str | None = None,
):
    """Start the dedup-on-ingest query over a streaming document
    DataFrame. Returns the StreamingQuery.

    The index at ``index_path`` must exist (write_minhash_index over
    the prior corpus, or over an empty frame for a cold start).
    Uniques append to ``corpus_path``; duplicates append to
    ``rejects_path`` with their ``dup_of`` id.
    """

    def _process(batch_df: DataFrame, _batch_id: int) -> None:
        spark = batch_df.sparkSession
        # one probe per batch; persist so marks feed both sinks
        # without re-running the index join
        batch = batch_df.persist()
        try:
            if batch.isEmpty():
                return
            marks = incremental_dedup_mark(
                spark,
                index_path,
                batch,
                min_agreement=min_agreement,
                text_col=text_col,
                id_col=id_col,
                num_hashes=num_hashes,
                bands=bands,
                shingle_n=shingle_n,
            ).persist()
            try:
                uniques = batch.join(
                    marks.filter("is_unique").select(id_col), id_col
                )
                rejects = batch.join(
                    marks.filter("NOT is_unique").select(id_col, "dup_of"),
                    id_col,
                )
                uniques.write.mode("append").parquet(corpus_path)
                rejects.write.mode("append").parquet(rejects_path)
                # survivors join the index so later triggers (and
                # later batches' intra-stream dups) see them
                append_to_minhash_index(
                    uniques,
                    index_path,
                    text_col=text_col,
                    id_col=id_col,
                    num_hashes=num_hashes,
                    bands=bands,
                    shingle_n=shingle_n,
                )
            finally:
                marks.unpersist()
        finally:
            batch.unpersist()

    writer = stream_df.writeStream.foreachBatch(_process).option(
        "checkpointLocation", checkpoint_dir
    )
    if query_name:
        writer = writer.queryName(query_name)
    if availableNow:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    return writer.start()
