"""Dedup-on-ingest: a streaming document source deduplicated against
the persistent corpus index, micro-batch by micro-batch.

Composes the streaming spine with operators/incremental.py: each
micro-batch is (1) marked against the index — prior corpus AND every
earlier batch of this stream, since survivors are appended — (2) its
unique docs land in the corpus sink and the index, (3) its duplicates
land in a rejects sink with the id they duplicate (the same
never-silently-drop posture as validation rejects and admission
shedding).

Delivery semantics, precisely: ``foreachBatch`` is at-least-once — a
crash between a sink write and the checkpoint commit replays the
batch. The corpus and rejects sinks are made IDEMPOTENT per batch:
rows are partitioned by the deterministic ``_ingest_batch_id`` and a
replay dynamically overwrites exactly its own partition, so reading
``corpus_path`` (row counts, training-shard writes) never
double-counts. The index append is not partition-overwritten (it is
bucket-prefix-partitioned for probe pruning); a replay re-appends
byte-identical signature rows, which cannot change any retention
verdict (candidate pairs are distinct, survivor rules are min-id) and
which ``compact_minhash_index`` reclaims. Net: retention verdicts are
exactly-once; the index is at-least-once-with-stable-verdicts. A doc
that duplicates something seen in ANY prior trigger is caught by the
index probe, which is what ``dropDuplicatesWithinWatermark`` cannot
do: its state is bounded by the watermark, while the index IS the
unbounded state, kept on storage instead of in executor memory.

Cold start: initialize the index with
``operators.incremental.init_minhash_index`` (or write_minhash_index
over an empty frame) — probes read the meta-derived explicit schema,
so an index with zero data files is a valid empty relation, not an
inference error.

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


def idempotent_batch_append(df: DataFrame, batch_id: int, path: str) -> None:
    """Per-batch idempotent sink write: partition by the
    (checkpoint-deterministic) batch id and dynamically overwrite ONLY
    that partition, so an at-least-once replay of batch N rewrites
    rows ``_ingest_batch_id=N`` in place instead of duplicating them.
    Other batches' partitions are untouched (dynamic overwrite mode is
    scoped to the partitions present in the write)."""
    (
        df.withColumn("_ingest_batch_id", F.lit(batch_id))
        .write.option("partitionOverwriteMode", "dynamic")
        .partitionBy("_ingest_batch_id")
        .mode("overwrite")
        .parquet(path)
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
    the prior corpus, or init_minhash_index for a cold start).
    Uniques land in ``corpus_path``; duplicates land in
    ``rejects_path`` with their ``dup_of`` id; both sinks are
    partitioned by ``_ingest_batch_id`` and per-batch idempotent.
    """

    def _process(batch_df: DataFrame, batch_id: int) -> None:
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
                idempotent_batch_append(uniques, batch_id, corpus_path)
                idempotent_batch_append(rejects, batch_id, rejects_path)
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
