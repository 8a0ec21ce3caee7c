"""Incremental deduplication against a materialized MinHash index.

The batch operators in operators/dedup.py answer "which pairs in THIS
corpus are near-dups". A production training-data pipeline asks a
different question every day: "which of TODAY'S documents duplicate
anything already ingested" -- and recomputing signatures over 100 TB
of history per batch is not an option. The index decouples the two:

  * :func:`write_minhash_index` materializes the (band-bucket, doc_id,
    signature) relation ONCE per corpus, partitioned by a bucket
    prefix so a probe is a pruned scan;
  * :func:`incremental_dedup_candidates` signatures only the NEW batch
    (same md5/universal-hash pipeline as dedup.py -- bit-identical
    signatures), broadcasts its band keys against the index (the big
    side never shuffles), and unions the new-vs-new self-join;
  * :func:`append_to_minhash_index` folds the deduplicated batch into
    the index (append, no rewrite), so tomorrow's probe sees today's
    survivors. Assignment is a pure row function, so an append never
    perturbs existing rows (the ingestion-stability property shared
    with operators/traindata.py).

Verification tier: signature agreement (fraction of equal MinHash
components) is an unbiased estimator of shingle-set Jaccard; the index
stores the full signature so candidates verify WITHOUT re-reading old
document text. Exact-text confirmation (ngram_jaccard over the pair
list) remains available when the raw corpus is reachable.

Equivalence contract (pytest-enforced, tests/test_incremental.py):
probing batch B against index(A) plus B's self-pairs yields EXACTLY
the pairs touching B that a from-scratch batch run over A ∪ B yields
-- incremental is an execution strategy, not a semantics change.

Reference has no dedup surface (SURVEY.md §2.8); this extends the
beyond-reference LLM-pipeline mandate to the incremental-ingest shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from xmidt_event_streams_spark.fsutil import (
    count_data_files,
    hadoop_fs,
    read_json_sidecar,
    swap_into_place,
    write_json_sidecar,
)
from xmidt_event_streams_spark.operators.dedup import (
    minhash_signatures_df,
)

_META_FILE = "_xes_minhash_index_meta.json"
_PREFIX_LEN = 2  # 256 bucket-prefix partitions


# Meta sidecar mechanics live in fsutil (Hadoop FileSystem API, so the
# parameter-mismatch guard works on file:/hdfs:/s3a: alike); this
# module stamps (num_hashes, bands, shingle_n, id_col, id_type).


def _fs_and_path(spark: SparkSession, path_str: str):
    return hadoop_fs(spark, path_str)


def _write_meta(spark: SparkSession, path: str, meta: dict) -> None:
    write_json_sidecar(spark, path, _META_FILE, meta)


def _read_meta(spark: SparkSession, path: str) -> dict | None:
    """The index's stamped parameters, or None for a foreign index
    (a bucket/signature layout produced by some other writer)."""
    return read_json_sidecar(spark, path, _META_FILE)


def _index_schema(meta: dict) -> StructType:
    """The index relation's exact schema, reconstructed from the meta
    sidecar. Reading with an explicit schema (a) skips file-listing
    schema inference and (b) makes the COLD-START case work: an index
    initialized over an empty corpus has a meta sidecar but zero
    parquet files, and a schema-less read would fail with
    UNABLE_TO_INFER_SCHEMA on the very first probe."""
    id_col, id_type = meta["id_col"], meta.get("id_type", "bigint")
    ddl = ", ".join(
        [f"`{id_col}` {id_type}"]
        + [f"h{i} bigint" for i in range(meta["num_hashes"])]
        + ["bucket string", "bp string"]
    )
    return StructType.fromDDL(ddl)


def _band_key_cols(num_hashes: int, bands: int) -> list:
    r = num_hashes // bands
    return [
        F.md5(
            F.concat(
                F.lit(f"b{b}:"),
                F.concat_ws(
                    "|",
                    *[F.col(f"h{b * r + j}").cast("string") for j in range(r)],
                ),
            )
        )
        for b in range(bands)
    ]


def _keyed_signatures(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_hashes: int,
    bands: int,
    shingle_n: int,
) -> DataFrame:
    """(bucket, bp, id, h0..h{k-1}): one row per (doc, band)."""
    sig = minhash_signatures_df(df, text_col, id_col, num_hashes, shingle_n)
    return (
        sig.withColumn(
            "bucket", F.explode(F.array(*_band_key_cols(num_hashes, bands)))
        )
        .withColumn("bp", F.substring("bucket", 1, _PREFIX_LEN))
    )


def write_minhash_index(
    df: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 8,
    bands: int = 4,
    shingle_n: int = 3,
) -> None:
    """Materialize the corpus MinHash index: (bucket, doc_id,
    signature) partitioned by the 2-hex-char bucket prefix (256
    directories -- md5 keys are uniform, so partitions are balanced).

    A probe with a broadcast new-batch key set prunes to the matching
    prefixes (dynamic partition pruning); each partition is written by
    one task (repartition on the prefix), so no small-file explosion.
    Banding parameters are stamped into a meta file and re-checked at
    probe time: a probe with mismatched parameters would silently find
    nothing, so it raises instead.
    """
    assert num_hashes % bands == 0
    keyed = _keyed_signatures(df, text_col, id_col, num_hashes, bands, shingle_n)
    (
        keyed.repartition(F.col("bp"))
        .write.partitionBy("bp")
        .mode("overwrite")
        .parquet(path)
    )
    _write_meta(
        df.sparkSession,
        path,
        {
            "num_hashes": num_hashes,
            "bands": bands,
            "shingle_n": shingle_n,
            "id_col": id_col,
            "id_type": df.schema[id_col].dataType.simpleString(),
        },
    )


def init_minhash_index(
    spark: SparkSession,
    path: str,
    id_type: str = "bigint",
    id_col: str = "doc_id",
    num_hashes: int = 8,
    bands: int = 4,
    shingle_n: int = 3,
) -> None:
    """Cold-start initializer: stamp an EMPTY index (meta sidecar, no
    data files). The first probe reads it with the meta-derived schema
    and sees an empty relation; the first append folds the first batch
    in. Equivalent to write_minhash_index over an empty frame, without
    needing to construct one."""
    assert num_hashes % bands == 0
    fs, hpath, _ = _fs_and_path(spark, path)
    fs.mkdirs(hpath)
    _write_meta(
        spark,
        path,
        {
            "num_hashes": num_hashes,
            "bands": bands,
            "shingle_n": shingle_n,
            "id_col": id_col,
            "id_type": id_type,
        },
    )


def _check_meta(
    spark: SparkSession, path: str, num_hashes: int, bands: int, shingle_n: int
) -> dict | None:
    """Validate probe/append parameters against the stamped meta;
    returns the meta (None for a foreign index, where the caller owns
    parameter agreement)."""
    meta = _read_meta(spark, path)
    if meta is None:
        return None
    got = (meta["num_hashes"], meta["bands"], meta["shingle_n"])
    want = (num_hashes, bands, shingle_n)
    if got != want:
        raise ValueError(
            f"minhash index at {path} was built with "
            f"(num_hashes, bands, shingle_n)={got}, probe asked {want}"
        )
    return meta


def _read_index(spark: SparkSession, path: str, meta: dict | None) -> DataFrame:
    """Index relation: explicit meta-derived schema when stamped (cold
    -start safe -- zero data files is a valid empty index), schema
    inference only for foreign indexes."""
    if meta is not None:
        return spark.read.schema(_index_schema(meta)).parquet(path)
    return spark.read.parquet(path)


def append_to_minhash_index(
    df: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 8,
    bands: int = 4,
    shingle_n: int = 3,
) -> None:
    """Fold a new batch into an existing index (append-only: existing
    files are never rewritten -- signatures are pure row functions, so
    prior rows cannot change). Re-appending the same docs (e.g. a
    replayed streaming micro-batch) adds byte-identical rows; probe
    verdicts are unaffected (candidates are distinct pairs) and
    :func:`compact_minhash_index` reclaims the space."""
    _check_meta(df.sparkSession, path, num_hashes, bands, shingle_n)
    keyed = _keyed_signatures(df, text_col, id_col, num_hashes, bands, shingle_n)
    (
        keyed.repartition(F.col("bp"))
        .write.partitionBy("bp")
        .mode("append")
        .parquet(path)
    )


def _sig_agreement(num_hashes: int, a: str, b: str) -> F.Column:
    """Fraction of equal MinHash components between two signature row
    aliases -- the unbiased Jaccard estimate used as the verify tier."""
    agree = None
    for i in range(num_hashes):
        term = F.when(
            F.col(f"{a}.h{i}") == F.col(f"{b}.h{i}"), 1
        ).otherwise(0)
        agree = term if agree is None else agree + term
    return F.round(agree.cast("double") / num_hashes, 6)


def incremental_dedup_candidates(
    spark: SparkSession,
    index_path: str,
    new_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 8,
    bands: int = 4,
    shingle_n: int = 3,
    broadcast_new: bool = True,
) -> DataFrame:
    """Near-dup candidate pairs touching the NEW batch: new-vs-index
    plus new-vs-new, verified by signature agreement.

    Output: (new_id, dup_id, agreement) -- dup_id is an indexed corpus
    doc or a new-batch peer; agreement in [0, 1] is the fraction of
    equal signature components (Jaccard estimate). Each pair appears
    once (min distinct over shared buckets).

    Scale shape: only the new batch is signatured (index rows ride
    as-is); with ``broadcast_new`` the index side joins against a
    broadcast of the (small) new key set -- the 100 TB index never
    shuffles and the scan prunes to the probed bucket prefixes. Set
    ``broadcast_new=False`` for bulk backfills where the "new" batch
    is itself huge; the join degrades to a shuffled equi-join on the
    uniform bucket key.
    """
    meta = _check_meta(spark, index_path, num_hashes, bands, shingle_n)
    new_keyed = _keyed_signatures(
        new_df, text_col, id_col, num_hashes, bands, shingle_n
    )
    idx = _read_index(spark, index_path, meta)

    n = new_keyed.alias("n")
    o = (F.broadcast(new_keyed) if broadcast_new else new_keyed).alias("n")
    # bp term is redundant with the bucket equi-key (bp is a prefix of
    # bucket) but makes the partition column a join key, so dynamic
    # partition pruning drops index directories no probe key touches
    vs_old = (
        idx.alias("o")
        .join(
            o,
            (F.col("o.bucket") == F.col("n.bucket"))
            & (F.col("o.bp") == F.col("n.bp")),
        )
        .filter(F.col("o." + id_col) != F.col("n." + id_col))
        .select(
            F.col(f"n.{id_col}").alias("new_id"),
            F.col(f"o.{id_col}").alias("dup_id"),
            _sig_agreement(num_hashes, "n", "o").alias("agreement"),
        )
    )
    n2 = new_keyed.alias("m")
    vs_new = (
        n.join(
            n2,
            (F.col("n.bucket") == F.col("m.bucket"))
            & (F.col(f"n.{id_col}") > F.col(f"m.{id_col}")),
        )
        .select(
            F.col(f"n.{id_col}").alias("new_id"),
            F.col(f"m.{id_col}").alias("dup_id"),
            _sig_agreement(num_hashes, "n", "m").alias("agreement"),
        )
    )
    return vs_old.unionByName(vs_new).distinct()


def incremental_dedup_mark(
    spark: SparkSession,
    index_path: str,
    new_df: DataFrame,
    min_agreement: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 8,
    bands: int = 4,
    shingle_n: int = 3,
) -> DataFrame:
    """Retention verdict for every new-batch doc: ``is_unique`` and
    ``dup_of`` (the smallest id it duplicates -- an indexed doc, or a
    new-batch peer with a smaller id; null when unique).

    A doc survives iff nothing at or above ``min_agreement`` precedes
    it: indexed docs always precede; within the batch the min id wins
    (deterministic, matching exact_dedup's survivor rule). One left
    join of the batch against its own candidate relation.
    """
    cands = incremental_dedup_candidates(
        spark,
        index_path,
        new_df,
        text_col,
        id_col,
        num_hashes,
        bands,
        shingle_n,
    ).filter(F.col("agreement") >= min_agreement)
    dup_of = cands.groupBy("new_id").agg(F.min("dup_id").alias("dup_of"))
    return (
        new_df.select(id_col)
        .join(dup_of, F.col(id_col) == F.col("new_id"), "left")
        .select(
            F.col(id_col),
            F.col("dup_of").isNull().alias("is_unique"),
            "dup_of",
        )
    )


def compact_minhash_index(
    spark: SparkSession,
    path: str,
    tombstones: DataFrame | list | None = None,
) -> dict:
    """Rewrite the index in place, dropping (a) duplicate band rows --
    the residue of replayed/overlapping appends (signatures are pure
    row functions, so re-appended rows are byte-identical; one
    (bucket, id) row carries all the information) -- and (b) rows for
    tombstoned ids (docs deleted upstream). Probe results over live
    ids are EXACTLY preserved (pytest-enforced).

    Mechanics: read with the meta-derived schema, dedup on
    (bucket, id), anti-join the broadcast tombstone set, rewrite
    prefix-partitioned into a sibling temp directory (one file per
    prefix again), re-stamp the meta, then swap via FileSystem
    delete + rename. The swap is atomic on HDFS/local; on S3 rename
    is copy+delete, so schedule compaction in a maintenance window
    there (standard practice for any non-transactional table format).

    Returns {"rows_before", "rows_after", "files_before",
    "files_after"} so operators can alert on compaction yield.
    """
    meta = _read_meta(spark, path)
    if meta is None:
        raise ValueError(
            f"cannot compact a foreign index (no {_META_FILE} at {path})"
        )
    id_col = meta["id_col"]
    idx = _read_index(spark, path, meta)

    rows_before = idx.count()
    files_before = count_data_files(spark, path)

    compacted = idx.dropDuplicates(["bucket", id_col])
    if tombstones is not None:
        if isinstance(tombstones, DataFrame):
            tomb = tombstones.select(
                F.col(tombstones.columns[0]).alias(id_col)
            )
        else:
            id_type = meta.get("id_type", "bigint")
            tomb = spark.createDataFrame(
                [(t,) for t in tombstones], f"`{id_col}` {id_type}"
            )
        compacted = compacted.join(F.broadcast(tomb), id_col, "left_anti")

    tmp = path.rstrip("/") + "__compact_tmp"
    (
        compacted.repartition(F.col("bp"))
        .write.partitionBy("bp")
        .mode("overwrite")
        .parquet(tmp)
    )
    _write_meta(spark, tmp, meta)
    rows_after = spark.read.schema(_index_schema(meta)).parquet(tmp).count()
    files_after = count_data_files(spark, tmp)

    swap_into_place(spark, tmp, path)
    return {
        "rows_before": rows_before,
        "rows_after": rows_after,
        "files_before": files_before,
        "files_after": files_after,
    }


def cross_corpus_candidates(
    corpus: DataFrame,
    reference: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 8,
    bands: int = 4,
    shingle_n: int = 3,
    broadcast_reference: bool = True,
) -> DataFrame:
    """Near-dup pairs BETWEEN two corpora (never within either):
    (corpus_id, ref_id, agreement). The near-dup tier of benchmark
    decontamination -- operators/contamination.py catches exact
    n-gram overlap; this catches paraphrased/reformatted benchmark
    leakage the exact tier misses (the Lee et al. 2107.06499 /
    GPT-3-appendix concern).

    Shape: both sides run the standard banded-signature pipeline
    (bit-identical to dedup.py); the join is corpus-bands vs
    REFERENCE-bands on the uniform md5 bucket key with the reference
    side broadcast (eval suites are small by construction) -- the
    100 TB corpus never shuffles for the join. Set
    ``broadcast_reference=False`` for corpus-vs-corpus runs; the join
    degrades to a shuffled equi-join on the bucket key.
    """
    ck = _keyed_signatures(
        corpus, text_col, id_col, num_hashes, bands, shingle_n
    ).alias("c")
    rk = _keyed_signatures(
        reference, text_col, id_col, num_hashes, bands, shingle_n
    )
    r = (F.broadcast(rk) if broadcast_reference else rk).alias("r")
    return (
        ck.join(r, F.col("c.bucket") == F.col("r.bucket"))
        .select(
            F.col(f"c.{id_col}").alias("corpus_id"),
            F.col(f"r.{id_col}").alias("ref_id"),
            _sig_agreement(num_hashes, "c", "r").alias("agreement"),
        )
        .distinct()
    )


def decontaminate_near_dups(
    corpus: DataFrame,
    reference: DataFrame,
    min_agreement: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 8,
    bands: int = 4,
    shingle_n: int = 3,
    broadcast_reference: bool = True,
) -> tuple[DataFrame, DataFrame]:
    """(kept, dropped) split of ``corpus``: a doc drops when its
    signature agreement with ANY reference doc reaches
    ``min_agreement``. ``dropped`` carries ``contaminated_by`` (the
    min matching ref id) and ``agreement`` (the best match) -- the
    ledger row; ``kept`` is schema-identical to the input. One
    left join of the corpus against the aggregated candidate
    relation."""
    cands = cross_corpus_candidates(
        corpus,
        reference,
        text_col,
        id_col,
        num_hashes,
        bands,
        shingle_n,
        broadcast_reference,
    ).filter(F.col("agreement") >= F.lit(min_agreement))
    # Underscore-prefixed internal names for the join-side columns: a
    # corpus that itself carries 'corpus_id' / 'contaminated_by' /
    # 'agreement' must neither hit ambiguous-column errors nor have
    # its own column silently dropped. The ledger names appear only
    # on the returned `dropped` frame.
    verdicts = (
        cands.groupBy("corpus_id")
        .agg(
            F.min("ref_id").alias("_xes_contaminated_by"),
            F.max("agreement").alias("_xes_agreement"),
        )
        .withColumnRenamed("corpus_id", "_xes_corpus_id")
    )
    marked = corpus.join(
        verdicts, F.col(id_col) == F.col("_xes_corpus_id"), "left"
    )
    kept = marked.filter(F.col("_xes_contaminated_by").isNull()).drop(
        "_xes_corpus_id", "_xes_contaminated_by", "_xes_agreement"
    )
    dropped = (
        marked.filter(F.col("_xes_contaminated_by").isNotNull())
        .drop("_xes_corpus_id")
        .withColumnRenamed("_xes_contaminated_by", "contaminated_by")
        .withColumnRenamed("_xes_agreement", "agreement")
    )
    return kept, dropped


def sync_minhash_index_with_snapshot(
    spark: SparkSession,
    table_path: str,
    index_path: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 8,
    bands: int = 4,
    shingle_n: int = 3,
    max_polls: int = 1_000_000,
) -> dict:
    """Keep the corpus MinHash index caught up with a SNAPSHOT TABLE
    through the checkpointed change feed -- the near-dup tier's
    instance of ``snapshots.sync_index_with_snapshot`` (the inverted
    index has ``invindex.sync_inverted_index_with_snapshot``; a full
    replica has ``snapshots.replicate_snapshot``). Per interval:
    ``compact_minhash_index(tombstones = deleted + updated ids)``
    (an updated doc's OLD signature must stop answering probes) then
    ``append_to_minhash_index(inserts + update after-images)``; the
    cursor acks only after both land, so a crash replays the interval
    and converges (same argument as the inverted-index sync --
    signatures are pure row functions, replay duplicates are absorbed
    by probes and reclaimed by the next compaction). Returns
    {intervals, appended_docs, removed_docs}.
    """
    from xmidt_event_streams_spark.operators.snapshots import (
        compact_then_append_interval,
        snapshot_read,
        sync_index_with_snapshot,
    )

    params = dict(
        text_col=text_col,
        id_col=id_col,
        num_hashes=num_hashes,
        bands=bands,
        shingle_n=shingle_n,
    )

    def _exists() -> bool:
        return _read_meta(spark, index_path) is not None

    def _bootstrap(version: int) -> int:
        base = snapshot_read(spark, table_path, version=version).select(
            id_col, text_col
        )
        write_minhash_index(base, index_path, **params)
        return base.count()

    def _apply(ch: DataFrame) -> tuple[int, int]:
        return compact_then_append_interval(
            ch,
            id_col,
            text_col,
            lambda stale: compact_minhash_index(
                spark, index_path, tombstones=stale
            ),
            lambda fresh: append_to_minhash_index(
                fresh, index_path, **params
            ),
        )

    out = sync_index_with_snapshot(
        spark, table_path, checkpoint_dir, _exists, _bootstrap, _apply,
        max_polls=max_polls,
    )
    return {
        "intervals": out["intervals"],
        "appended_docs": out["appended"],
        "removed_docs": out["removed"],
    }
