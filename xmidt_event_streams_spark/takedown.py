"""Composed takedown flows over every surface a document lives on.

Two shapes a production corpus actually receives:

  * BY ID -- right-to-be-forgotten / DMCA on a whole document:
    tombstone MERGE on the keyed corpus + MinHash-index tombstone
    compaction (:func:`takedown_ids`). The e2e property
    (gone from corpus reads, index probes, and re-exported shards;
    untouched rows byte-identical) is pinned in
    tests/test_takedown_e2e.py -- the shape of the reference's
    integration suite (integrationTests/integration_test.go:226-236).

  * BY CONTENT -- a PASSAGE must disappear (copyright text, leaked
    secret, quoted benchmark) from every document that carries it,
    without dropping those documents: span scrub
    (operators/dedup.remove_contaminated_spans) + replacement MERGE
    (:func:`takedown_phrases`). Documents reduced to nothing are
    tombstoned rather than left as empty husks.

Both return a stats dict; ledger it, never discard it.

Both flows run against either corpus layout via ``table_format``:
``"keyed"`` (operators/upsert.py, in-place bucket overwrite — single-
tenant maintenance windows) or ``"snapshot"`` (operators/snapshots.py,
immutable files + manifest commits — continuously-read corpora). On a
snapshot table the tombstone/rewrite MERGE makes the content
unreadable AT HEAD immediately, but older snapshots still reference
the bytes (time travel — the layout's honesty rule); pass
``expire_keep_last`` to run ``snapshot_expire`` as the COMPLETION
step in the same call, or schedule it in the next maintenance window
(``run_maintenance(snapshot_tables=...)``).
"""

from __future__ import annotations

from xmidt_event_streams_spark.functions.text import py_tokens

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from xmidt_event_streams_spark.operators.upsert import (
    DELETED_COL,
    merge_upsert,
    read_keyed_table,
)

# driver-side tokenizer twin now lives with the column contract
_py_tokens = py_tokens

_FORMATS = ("keyed", "snapshot")


def _read_table(spark: SparkSession, path: str, fmt: str) -> DataFrame:
    if fmt == "snapshot":
        from xmidt_event_streams_spark.operators.snapshots import (
            snapshot_read,
        )

        return snapshot_read(spark, path)
    return read_keyed_table(spark, path)


def _merge(spark: SparkSession, path: str, updates: DataFrame, fmt: str) -> dict:
    if fmt == "snapshot":
        from xmidt_event_streams_spark.operators.snapshots import (
            snapshot_merge,
        )

        return snapshot_merge(spark, path, updates)
    return merge_upsert(spark, path, updates)


def _check_format(fmt: str) -> None:
    if fmt not in _FORMATS:
        raise ValueError(f"table_format must be one of {_FORMATS}, got {fmt!r}")


def _maybe_expire(
    spark: SparkSession, path: str, fmt: str, keep_last: int | None
) -> dict | None:
    """The snapshot-takedown COMPLETION step: a tombstone merge hides
    the row at head, but its bytes persist in every older manifest
    that references them (time travel is the feature); expiring down
    to ``keep_last`` is what makes the takedown physically complete.
    No-op for the keyed layout (its merge rewrites in place)."""
    if keep_last is None or fmt != "snapshot":
        return None
    from xmidt_event_streams_spark.operators.snapshots import (
        snapshot_expire,
    )

    return snapshot_expire(spark, path, keep_last=keep_last)


def takedown_ids(
    spark: SparkSession,
    corpus_path: str,
    ids: list,
    index_path: str | None = None,
    table_format: str = "keyed",
    expire_keep_last: int | None = None,
    ivf_index_path: str | None = None,
    ivfpq_index_path: str | None = None,
) -> dict:
    """Tombstone ``ids`` out of the corpus table (keyed or snapshot,
    per ``table_format``) and (when given) compact them out of the
    MinHash index, the IVF vector index (``ivf_index_path`` --
    without it the removed documents' EMBEDDINGS keep answering
    similarity probes; report key ``"ivf_index"``), and/or the
    IVF-PQ index (``ivfpq_index_path`` -- the CODES tier: quantized
    vectors keep answering ADC probes until compacted out; report
    key ``"ivfpq_index"``). Shards are
    derived artifacts: re-export them from the post-takedown corpus
    (operators/traindata.write_training_shards -- placement of
    surviving rows is a pure row hash, so nobody else moves).

    Snapshot layout: the merge hides the ids at head atomically (no
    reader ever sees a torn table -- the reason to prefer this layout
    for continuously-read corpora); ``expire_keep_last`` runs
    ``snapshot_expire`` afterwards so the bytes are GONE, not just
    unreferenced at head (report key ``"expire"``). Leave it None to
    keep time travel and expire in the next maintenance window.
    """
    _check_format(table_format)
    if not ids:
        return {
            "upserts": 0,
            "deletes": 0,
            "touched_buckets": [],
            "index": None,
            "ivf_index": None,
            "ivfpq_index": None,
            "expire": None,
        }
    table = _read_table(spark, corpus_path, table_format)
    key_col = _key_col(spark, corpus_path, table_format)
    tomb = (
        spark.createDataFrame([(i,) for i in ids], [key_col])
        .join(table.limit(0), key_col, "left")  # null all other cols
        .withColumn(DELETED_COL, F.lit(True))
    )
    stats = _merge(spark, corpus_path, tomb, table_format)
    report = None
    if index_path is not None:
        from xmidt_event_streams_spark.operators.incremental import (
            compact_minhash_index,
        )

        report = compact_minhash_index(
            spark, index_path, tombstones=list(ids)
        )
    ivf_report = None
    if ivf_index_path is not None:
        from xmidt_event_streams_spark.operators.ivf import (
            compact_ivf_index,
        )

        ivf_report = compact_ivf_index(
            spark, ivf_index_path, tombstones=list(ids)
        )
    ivfpq_report = None
    if ivfpq_index_path is not None:
        from xmidt_event_streams_spark.operators.ivfpq import (
            compact_ivfpq_index,
        )

        ivfpq_report = compact_ivfpq_index(
            spark, ivfpq_index_path, tombstones=list(ids)
        )
    expire = _maybe_expire(
        spark, corpus_path, table_format, expire_keep_last
    )
    return {
        **stats,
        "index": report,
        "ivf_index": ivf_report,
        "ivfpq_index": ivfpq_report,
        "expire": expire,
    }


def takedown_phrases(
    spark: SparkSession,
    corpus_path: str,
    phrases: list[str],
    window: int = 5,
    text_col: str = "text",
    index_path: str | None = None,
    tombstone_empty: bool = True,
    invindex_path: str | None = None,
    invindex_stale_ok: bool = False,
    invindex_buckets: int | None = None,
    table_format: str = "keyed",
    expire_keep_last: int | None = None,
) -> dict:
    """Cut every occurrence of each phrase's ``window``-gram content
    from every document in the corpus (keyed or snapshot, per
    ``table_format``), MERGE the rewritten documents back, and keep
    the MinHash index consistent (touched docs' signatures are
    stale: compact them out, re-append the scrubbed rows). On a
    snapshot table, ``expire_keep_last`` completes the takedown by
    expiring the manifests that still reference the pre-scrub bytes
    (see :func:`takedown_ids`).

    Match semantics are the benchmark scrub's: a document span is cut
    when its ``window``-gram appears in any phrase -- so spans
    OVERLAPPING the phrase boundary by >= ``window`` tokens are cut
    too, which is what a takedown wants (partial quotes die with the
    full ones). Case-insensitive match, case-preserving rewrite.
    Every phrase must carry at least ``window`` tokens; shorter ones
    cannot match anything and are refused loudly rather than silently
    ignored.

    ``tombstone_empty``: a document that was NOTHING BUT the
    taken-down content is deleted, not left as an empty husk.

    Scale shape: phrases are a takedown request -- tiny by nature --
    so their window hashes broadcast and the corpus scan never
    shuffles for the match; the MERGE touches only the buckets of
    rewritten docs (update-set-bounded); index repair is
    tombstone-compaction + one append of the touched rows.

    ``invindex_path``: a positional inverted index over the corpus
    (operators/invindex.py) skips even that one corpus scan -- the
    scrub runs only on ``phrase_candidates`` (docs holding some
    phrase window-gram; exact, because untouched docs are never
    revisited by the fixpoint). The index MUST reflect the current
    corpus state: a takedown driven by a stale index silently misses
    recently-written documents, so any corpus file newer than every
    index file is refused (``invindex_stale_ok=True`` overrides, for
    layouts whose mtimes lie). The index is NOT rewritten here --
    after the merge it is stale for the touched docs and should be
    rebuilt in the next maintenance window before its next use.
    """
    _check_format(table_format)
    if not phrases:
        return {
            "docs_touched": 0,
            "tokens_removed": 0,
            "upserts": 0,
            "deletes": 0,
            "touched_buckets": [],
            "index": None,
            "expire": None,
        }
    short = [p for p in phrases if len(_py_tokens(p)) < window]
    if short:
        raise ValueError(
            f"phrases shorter than window={window} tokens cannot "
            f"match and would be silently ignored: {short!r}"
        )
    from xmidt_event_streams_spark.operators.dedup import (
        remove_contaminated_spans,
    )

    key_col = _key_col(spark, corpus_path, table_format)
    table = _read_table(spark, corpus_path, table_format)
    scrub_input = table
    if invindex_path is not None:
        from xmidt_event_streams_spark.fsutil import (
            latest_mtime_recursive_ms,
        )
        from xmidt_event_streams_spark.operators.invindex import (
            DEFAULT_BUCKETS,
            phrase_candidates,
            read_inverted_index,
        )

        n_bkts = (
            DEFAULT_BUCKETS if invindex_buckets is None else invindex_buckets
        )
        if not invindex_stale_ok:
            corpus_mt = latest_mtime_recursive_ms(spark, corpus_path)
            index_mt = latest_mtime_recursive_ms(spark, invindex_path)
            if index_mt is None or (
                corpus_mt is not None and corpus_mt > index_mt
            ):
                raise ValueError(
                    f"inverted index at {invindex_path} is older than the "
                    f"corpus at {corpus_path} (index mtime {index_mt}, "
                    f"corpus mtime {corpus_mt}): a stale index silently "
                    "misses documents. Rebuild it, or pass "
                    "invindex_stale_ok=True."
                )
        cands = phrase_candidates(
            read_inverted_index(spark, invindex_path, n_bkts),
            phrases,
            window,
            n_buckets=n_bkts,
        )
        scrub_input = table.join(
            cands.withColumnRenamed("doc_id", key_col), key_col, "left_semi"
        )
    bench = spark.createDataFrame([(p,) for p in phrases], [text_col])
    # fixpoint: excision can stitch surviving neighbors into a fresh
    # occurrence of the phrase -- a single pass may ship taken-down
    # content verbatim. touched_only skips the corpus-sized rebuild
    # for the (vast) untouched majority.
    touched = remove_contaminated_spans(
        scrub_input,
        bench,
        text_col=text_col,
        id_col=key_col,
        window=window,
        preserve_case=True,
        touched_only=True,
        fixpoint=True,
    ).persist()
    try:
        agg = touched.agg(
            F.count("*").alias("docs"),
            F.sum("n_removed").alias("toks"),
        ).collect()[0]
        # collect the touched ids BEFORE the MERGE: the merge's
        # empty-bucket cleanup refreshes the corpus path, which
        # invalidates any cached relation whose lineage reads it --
        # a post-merge recompute of `touched` would scan the
        # already-scrubbed table and find nothing. Bounded by the
        # takedown request size, same as the MERGE.
        ids = [r[0] for r in touched.select(key_col).collect()]
        if not agg["docs"]:
            return {
                "docs_touched": 0,
                "tokens_removed": 0,
                "upserts": 0,
                "deletes": 0,
                "touched_buckets": [],
                "index": None,
                "expire": None,
            }
        empty = F.col("_xes_clean") == ""
        updates = (
            table.join(
                touched.select(
                    F.col(key_col),
                    F.col("clean_text").alias("_xes_clean"),
                ),
                key_col,
            )
            .withColumn(text_col, F.col("_xes_clean"))
            .withColumn(
                DELETED_COL,
                empty if tombstone_empty else F.lit(False),
            )
            .drop("_xes_clean")
        )
        stats = _merge(spark, corpus_path, updates, table_format)
        report = None
        if index_path is not None:
            from xmidt_event_streams_spark.operators.incremental import (
                _read_meta,
                append_to_minhash_index,
                compact_minhash_index,
            )

            report = compact_minhash_index(
                spark, index_path, tombstones=ids
            )
            meta = _read_meta(spark, index_path) or {}
            survivors = _read_table(spark, corpus_path, table_format).join(
                F.broadcast(
                    spark.createDataFrame([(i,) for i in ids], [key_col])
                ),
                key_col,
                "left_semi",
            )
            append_to_minhash_index(
                survivors,
                index_path,
                text_col=text_col,
                id_col=key_col,
                num_hashes=meta.get("num_hashes", 8),
                bands=meta.get("bands", 4),
                shingle_n=meta.get("shingle_n", 3),
            )
        expire = _maybe_expire(
            spark, corpus_path, table_format, expire_keep_last
        )
        return {
            "docs_touched": int(agg["docs"]),
            "tokens_removed": int(agg["toks"] or 0),
            **stats,
            "index": report,
            "expire": expire,
        }
    finally:
        touched.unpersist()


def _key_col(spark: SparkSession, path: str, fmt: str = "keyed") -> str:
    if fmt == "snapshot":
        from xmidt_event_streams_spark.operators.snapshots import (
            _read_manifest,
            snapshot_head,
        )

        return _read_manifest(spark, path, snapshot_head(spark, path))[
            "key_col"
        ]
    from xmidt_event_streams_spark.fsutil import check_sidecar_params
    from xmidt_event_streams_spark.operators.upsert import _META

    meta = check_sidecar_params(spark, path, _META, {}, "keyed table")
    if meta is None:
        raise ValueError(
            f"{path} is not a keyed table (missing {_META}); "
            "initialize with write_keyed_table"
        )
    return meta["key_col"]
