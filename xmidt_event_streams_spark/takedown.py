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


def takedown_ids(
    spark: SparkSession,
    corpus_path: str,
    ids: list,
    index_path: str | None = None,
) -> dict:
    """Tombstone ``ids`` out of the keyed corpus table and (when
    given) compact them out of the MinHash index. Shards are derived
    artifacts: re-export them from the post-takedown corpus
    (operators/traindata.write_training_shards -- placement of
    surviving rows is a pure row hash, so nobody else moves).
    """
    if not ids:
        return {
            "upserts": 0,
            "deletes": 0,
            "touched_buckets": [],
            "index": None,
        }
    table = read_keyed_table(spark, corpus_path)
    key_col = _key_col(spark, corpus_path)
    tomb = (
        spark.createDataFrame([(i,) for i in ids], [key_col])
        .join(table.limit(0), key_col, "left")  # null all other cols
        .withColumn(DELETED_COL, F.lit(True))
    )
    stats = merge_upsert(spark, corpus_path, tomb)
    report = None
    if index_path is not None:
        from xmidt_event_streams_spark.operators.incremental import (
            compact_minhash_index,
        )

        report = compact_minhash_index(
            spark, index_path, tombstones=list(ids)
        )
    return {**stats, "index": report}


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
) -> dict:
    """Cut every occurrence of each phrase's ``window``-gram content
    from every document in the keyed corpus, MERGE the rewritten
    documents back, and keep the MinHash index consistent (touched
    docs' signatures are stale: compact them out, re-append the
    scrubbed rows).

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
    if not phrases:
        return {
            "docs_touched": 0,
            "tokens_removed": 0,
            "upserts": 0,
            "deletes": 0,
            "touched_buckets": [],
            "index": None,
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

    key_col = _key_col(spark, corpus_path)
    table = read_keyed_table(spark, corpus_path)
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
        stats = merge_upsert(spark, corpus_path, updates)
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
            survivors = read_keyed_table(spark, corpus_path).join(
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
        return {
            "docs_touched": int(agg["docs"]),
            "tokens_removed": int(agg["toks"] or 0),
            **stats,
            "index": report,
        }
    finally:
        touched.unpersist()


def _key_col(spark: SparkSession, path: str) -> str:
    from xmidt_event_streams_spark.fsutil import check_sidecar_params
    from xmidt_event_streams_spark.operators.upsert import _META

    meta = check_sidecar_params(spark, path, _META, {}, "keyed table")
    if meta is None:
        raise ValueError(
            f"{path} is not a keyed table (missing {_META}); "
            "initialize with write_keyed_table"
        )
    return meta["key_col"]
