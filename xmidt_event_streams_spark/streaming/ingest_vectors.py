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

Semantic dedup on ingest (``dedup_threshold``): the vector twin of
ingest_dedup's MinHash gate, built on the kNN-join shape
(operators/knn.py) instead of cluster-then-verify -- candidate volume
per batch is bounded by (batch x probed-cell occupancy) by
construction. A batch vector is a duplicate when some ALREADY-INDEXED
vector (any earlier trigger, or the prior corpus) or some
smaller-id batch peer sits at cosine >= threshold in its probed
cells; uniques fold into the index, duplicates land in the rejects
ledger with ``dup_of`` + ``reject_reason='semantic_duplicate'``.
Replay is EXACTLY-ONCE for verdicts, one better than the MinHash arm:
the index's ``_ingest_batch_id`` partition column lets a replayed
batch exclude its own prior append from the probe, so a crash between
the index fold and the checkpoint commit cannot make batch peers
"duplicate" each other on replay.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from xmidt_event_streams_spark.functions.vectors import (
    cosine_pairs,
    validate_embeddings,
)
from xmidt_event_streams_spark.fsutil import (
    has_data_files,
    read_json_sidecar,
)
from xmidt_event_streams_spark.operators.ivf import (
    _IVF_META_FILE,
    append_to_ivf_index,
    assign_cells,
    probe_cells,
    read_probed_cells,
)
from xmidt_event_streams_spark.streaming.ingest_dedup import (
    idempotent_batch_append,
)


def incremental_vector_dedup_mark(
    spark: SparkSession,
    index_path: str,
    batch: DataFrame,
    threshold: float,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_batch_id: int | None = None,
) -> DataFrame:
    """Retention verdict for every batch vector against a
    materialized IVF index: (id, is_unique, dup_of) -- ``dup_of`` the
    smallest id at cosine >= ``threshold`` (an indexed vector, or a
    smaller-id batch peer sharing a probed cell; null when unique).
    The vector twin of ``incremental.incremental_dedup_mark``, same
    min-id survivor rule.

    Scale shape: the batch probes its ``n_probe`` nearest cells; the
    probed-cell set (a driver list bounded by the centroid count, not
    the batch) statically prunes the index scan at PLAN time, and the
    batch side broadcasts -- the 100 TB index never shuffles and
    reads only probed directories. Batch-vs-batch pairs join on the
    single assigned cell of the smaller-id side (a row can only dup
    toward a peer whose assigned cell it probes -- the same
    one-sided-visibility rule as ``knn_join``'s corpus side).

    ``exclude_batch_id``: rows the index holds under this
    ``_ingest_batch_id`` are ignored -- pass the current batch id so
    an at-least-once REPLAY (crash after the index fold) does not see
    the batch's own first-attempt rows and mark peers against them.
    Ignored when the index has no batch column (plain appends).

    Recall contract: like every IVF probe, a duplicate whose nearest
    indexed copy lives outside the probed cells is missed; raise
    ``n_probe`` (or the index's cell count at build time) to trade
    cost for recall. Exactness within probed cells.
    """
    meta = read_json_sidecar(spark, index_path, _IVF_META_FILE)
    if meta is None:
        raise ValueError(
            f"no centroid sidecar at {index_path}: initialize with "
            "write_ivf_index"
        )
    if vec_col != meta["vec_col"]:
        raise ValueError(
            f"index at {index_path} stores vec_col={meta['vec_col']!r}, "
            f"probe supplied {vec_col!r}"
        )
    centroids = meta["centroids"]
    n_probe = min(n_probe, len(centroids))

    # no persist: every subtree here is batch-sized and narrow (the
    # index side is lazily pruned, never materialized driver-side)
    probed = probe_cells(
        batch.select(
            F.col(id_col).alias("_xes_qid"),
            F.col(vec_col).cast("array<double>").alias("_xes_qv"),
        ),
        centroids,
        n_probe=n_probe,
        vec_col="_xes_qv",
        cell_col="_xes_cell",
    )
    cells = sorted(
        r[0] for r in probed.select("_xes_cell").distinct().collect()
    )
    sim = F.round(cosine_pairs("_xes_iv", "_xes_qv"), 6)

    cands = None
    if cells and has_data_files(spark, index_path):
        # leaf-dir read of only the probed cells (ivf.read_probed_
        # cells): per-trigger cost then tracks the batch's probe set,
        # not the index's directory count
        raw = read_probed_cells(spark, index_path, cells)
        if exclude_batch_id is not None and "_ingest_batch_id" in raw.columns:
            raw = raw.filter(
                F.col("_ingest_batch_id") != F.lit(exclude_batch_id)
            )
        idx = raw.select(
            F.col(id_col).alias("_xes_iid"),
            F.col(vec_col).cast("array<double>").alias("_xes_iv"),
            F.col("cell").alias("_xes_icell"),
        ).filter(F.col("_xes_icell").isin(cells))
        cands = (
            idx.join(
                F.broadcast(probed),
                (F.col("_xes_icell") == F.col("_xes_cell"))
                & (F.col("_xes_iid") != F.col("_xes_qid")),
            )
            .filter(sim >= F.lit(threshold))
            .select(
                F.col("_xes_qid"), F.col("_xes_iid").alias("_xes_dup")
            )
        )

    peers = assign_cells(
        batch.select(
            F.col(id_col).alias("_xes_iid"),
            F.col(vec_col).cast("array<double>").alias("_xes_iv"),
        ),
        centroids,
        vec_col="_xes_iv",
        cell_col="_xes_icell",
    )
    vs_new = (
        F.broadcast(peers)
        .join(
            probed,
            (F.col("_xes_icell") == F.col("_xes_cell"))
            & (F.col("_xes_iid") < F.col("_xes_qid")),
        )
        .filter(sim >= F.lit(threshold))
        .select(F.col("_xes_qid"), F.col("_xes_iid").alias("_xes_dup"))
    )
    cands = vs_new if cands is None else cands.unionByName(vs_new)
    dup_of = cands.groupBy("_xes_qid").agg(
        F.min("_xes_dup").alias("dup_of")
    )
    return (
        batch.select(id_col)
        .join(dup_of, F.col(id_col) == F.col("_xes_qid"), "left")
        .select(
            F.col(id_col),
            F.col("dup_of").isNull().alias("is_unique"),
            "dup_of",
        )
    )


def start_ingest_vectors(
    stream_df: DataFrame,
    index_path: str,
    rejects_path: str,
    checkpoint_dir: str,
    dim: int,
    vec_col: str = "embedding",
    allow_zero: bool = False,
    dedup_threshold: float | None = None,
    dedup_n_probe: int = 2,
    id_col: str = "vec_id",
    ivfpq_index_path: str | None = None,
    availableNow: bool = False,
    trigger_seconds: int = 15,
    query_name: str | None = None,
):
    """Start the vector-ingest query. Returns the StreamingQuery.

    The index at ``index_path`` must exist with a centroid sidecar
    (see module docstring for the layout contract).

    ``dedup_threshold``: also semantic-dedup each batch against the
    index and its smaller-id peers
    (:func:`incremental_vector_dedup_mark`); duplicates skip the index
    and land in the rejects ledger with ``dup_of`` and
    ``reject_reason='semantic_duplicate'``. Verdicts are replay-
    exactly-once (the probe excludes the current batch id's own
    prior append).

    ``ivfpq_index_path``: also fold each batch's accepted rows into a
    COMPRESSED IVF-PQ serving index under its stamped quantizers
    (``ivfpq.append_to_ivfpq_index``, the same replay-idempotent
    (cell, batch) dynamic overwrite) -- the raw IVF index stays the
    dedup/exact tier, the PQ index the cheap-ADC-scan serving tier,
    and both advance in lockstep per micro-batch. The PQ index must
    be streaming-seeded (``write_ivfpq_index(df.limit(0), ...)``)."""

    def _fold_ivfpq(rows: DataFrame, batch_id: int) -> None:
        if ivfpq_index_path is None:
            return
        from xmidt_event_streams_spark.operators.ivfpq import (
            append_to_ivfpq_index,
        )

        append_to_ivfpq_index(
            rows, ivfpq_index_path, vec_col, batch_id=batch_id
        )

    def _write(batch: DataFrame, batch_id: int) -> None:
        valid, rejects = validate_embeddings(
            batch, dim, vec_col, allow_zero=allow_zero
        )
        if dedup_threshold is not None:
            spark = batch.sparkSession
            valid = valid.persist()
            try:
                marks = incremental_vector_dedup_mark(
                    spark,
                    index_path,
                    valid,
                    dedup_threshold,
                    n_probe=dedup_n_probe,
                    id_col=id_col,
                    vec_col=vec_col,
                    exclude_batch_id=batch_id,
                ).persist()
                try:
                    uniques = valid.join(
                        marks.filter("is_unique").select(id_col), id_col
                    )
                    dups = valid.join(
                        marks.filter("NOT is_unique").select(
                            id_col, "dup_of"
                        ),
                        id_col,
                    ).withColumn(
                        "reject_reason", F.lit("semantic_duplicate")
                    )
                    rejects = rejects.withColumn(
                        "dup_of",
                        F.lit(None).cast(dict(valid.dtypes)[id_col]),
                    ).unionByName(dups)
                    append_to_ivf_index(
                        uniques, index_path, vec_col, batch_id=batch_id
                    )
                    _fold_ivfpq(uniques, batch_id)
                    idempotent_batch_append(
                        rejects, batch_id, rejects_path, max_files=1
                    )
                finally:
                    marks.unpersist()
            finally:
                valid.unpersist()
            return
        append_to_ivf_index(valid, index_path, vec_col, batch_id=batch_id)
        _fold_ivfpq(valid, batch_id)
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


def validate_token_matrices(
    batch: DataFrame, dim: int, vecs_col: str = "token_vecs"
) -> tuple[DataFrame, DataFrame]:
    """(valid, rejects) split for multi-vector rows -- pure JVM column
    predicates (no Python): a row is valid iff its token list is
    non-null, non-empty, and EVERY token has exactly ``dim`` finite
    entries. Rejects carry ``reject_reason``."""
    v = F.col(vecs_col)
    bad_token = F.exists(
        v,
        lambda t: t.isNull()
        | (F.size(t) != F.lit(dim))
        | F.exists(t, lambda x: x.isNull() | F.isnan(x)),
    )
    reason = (
        F.when(v.isNull(), "null_tokens")
        .when(F.size(v) == 0, "empty_tokens")
        .when(bad_token, "bad_token")
        .otherwise("")
    )
    tagged = batch.withColumn("reject_reason", reason)
    return (
        tagged.filter(F.col("reject_reason") == "").drop("reject_reason"),
        tagged.filter(F.col("reject_reason") != ""),
    )


def start_ingest_multivec(
    stream_df: DataFrame,
    index_path: str,
    rejects_path: str,
    checkpoint_dir: str,
    dim: int,
    vecs_col: str = "token_vecs",
    id_col: str = "doc_id",
    availableNow: bool = False,
    trigger_seconds: int = 15,
    query_name: str | None = None,
):
    """Streaming ingest for the late-interaction (MaxSim) serving
    tier: validate each micro-batch's multi-vector rows (JVM-side
    split; poison rows land in the rejects ledger with a reason,
    never silently dropped), then fold the valid rows into the
    maxsim index under its stamped centroids with the family's
    replay-idempotent (cell, batch) dynamic overwrite
    (``multivec.append_to_maxsim_index(batch_id=...)``).

    The index must be streaming-seeded first:
    ``write_maxsim_index(docs.limit(0), path, centroids)`` writes the
    sidecar + manifest with zero data files (dim comes from the
    centroids). Compaction in the maintenance window folds the batch
    partitions into one file per cell (``compact_maxsim_index``)."""
    from xmidt_event_streams_spark.operators.multivec import (
        append_to_maxsim_index,
    )

    def _write(batch: DataFrame, batch_id: int) -> None:
        valid, rejects = validate_token_matrices(batch, dim, vecs_col)
        append_to_maxsim_index(
            valid, index_path, id_col=id_col, vecs_col=vecs_col,
            batch_id=batch_id,
        )
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
