"""Incremental exact-substring dedup: a materialized WINDOW-HASH
index, so each new batch is excised against the corpus HISTORY
without rescanning it -- the span-level twin of the incremental
MinHash index (operators/incremental.py), carrying Lee et al.'s
ExactSubstr semantics (arXiv:2107.06499) across batches: history
wins, the new copy is cut.

Layout mirrors the MinHash index: one row per distinct window hash,
partitioned by the 2-hex md5 prefix (256 balanced directories), a
parameter-stamped meta sidecar (a probe with a mismatched window
width would silently find nothing, so it raises instead), and a
``src_batch`` column for replay-safe streaming: a replayed micro-batch
probes with its own batch id EXCLUDED, so it reaches the same verdict
as its first run instead of excising itself against the windows it
already appended (the same at-least-once honesty as the ingest
sinks).

Scale shape: the index holds one 32-char hash (+ one bigint) per
distinct corpus window -- bytes per corpus token, not bytes per
token-pair; probing is one columnar scan of the index against a
BROADCAST batch-window set (the batch side is trigger-sized), and the
excise/rebuild tail is batch-bounded (touched-only). Appends are
blind `mode("append")` writes; re-appended rows are byte-identical
duplicates that :func:`compact_window_index` reclaims, probe verdicts
unaffected (semi-join).

Reference has no dedup surface (SURVEY.md §2.8); this extends the
repo's LLM-pipeline mandate the same way incremental MinHash did.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from xmidt_event_streams_spark.fsutil import (
    read_json_sidecar,
    write_json_sidecar,
)

_META = "_xes_window_index.json"


def _meta(spark: SparkSession, path: str) -> dict:
    meta = read_json_sidecar(spark, path, _META)
    if meta is None:
        raise ValueError(
            f"{path} is not a window index (missing {_META}); "
            "initialize with write_window_index or init_window_index"
        )
    return meta


def _batch_windows(
    df: DataFrame, text_col: str, window: int, winnow: int | None = None
) -> DataFrame:
    """Distinct (bp, whash) for a batch -- the probe/append payload.
    No ids: the index stores CONTENT history, not provenance.
    ``winnow=k`` stores only the winnowing-selected fingerprints
    (Schleimer et al. 2003), shrinking the relation ~(k+1)/2x with
    selection done in the array domain (no added shuffle)."""
    from xmidt_event_streams_spark.functions.text import (
        let_bind,
        word_ngrams,
    )

    if winnow is None:
        hashes = df.select(
            F.explode(word_ngrams(text_col, window)).alias("win")
        ).select(F.md5("win").alias("whash"))
    else:
        from xmidt_event_streams_spark.operators.dedup import (
            _winnow_selected,
        )

        picked = let_bind(
            F.transform(word_ngrams(text_col, window), F.md5),
            lambda hs: _winnow_selected(hs, winnow),
        )
        hashes = df.select(F.explode(picked).alias("s")).select(
            F.col("s.whash").alias("whash")
        )
    return hashes.distinct().withColumn(
        "bp", F.substring("whash", 1, 2)
    )


def write_window_index(
    df: DataFrame,
    path: str,
    text_col: str = "text",
    window: int = 20,
    src_batch: int = -1,
    winnow: int | None = None,
) -> None:
    """Materialize the window index over a corpus (one row per
    distinct window hash), prefix-partitioned, meta-stamped.

    ``winnow=k`` (requires k <= window) is the 100 TB arm: store only
    the winnowing-selected fingerprints -- ~(k+1)/2x fewer index rows
    (the index is otherwise one row per distinct corpus window).
    Probes still use the batch's EXACT window census, so the
    Schleimer t = w + k - 1 theorem gives DETECTION of every shared
    span of >= window + k - 1 tokens; EXCISION covers the span's
    interior fully (selected positions are <= k apart and k <= w
    makes their cut intervals merge) but up to k - 1 tokens can
    survive at each boundary. The right trade for cross-batch
    boilerplate dedup; for takedown-grade guarantees use the exact
    index."""
    if window < 2:
        raise ValueError(f"window must be >= 2, got {window}")
    if winnow is not None and not 1 <= winnow <= window:
        raise ValueError(
            f"winnow must be in [1, window]; got winnow={winnow}, "
            f"window={window} (k > w leaves holes INSIDE excised "
            "spans, not just at boundaries)"
        )
    rel = _batch_windows(df, text_col, window, winnow).withColumn(
        "src_batch", F.lit(src_batch).cast("long")
    )
    (
        rel.repartition(F.col("bp"))
        .write.partitionBy("bp")
        .mode("overwrite")
        .parquet(path)
    )
    write_json_sidecar(
        df.sparkSession, path, _META, {"window": window, "winnow": winnow}
    )


def init_window_index(
    spark: SparkSession, path: str, window: int = 20,
    winnow: int | None = None,
) -> None:
    """Cold start: stamp an EMPTY index (meta only); the first probe
    sees an empty relation, the first append folds the first batch."""
    if window < 2:
        raise ValueError(f"window must be >= 2, got {window}")
    if winnow is not None and not 1 <= winnow <= window:
        raise ValueError(
            f"winnow must be in [1, window]; got winnow={winnow}"
        )
    from xmidt_event_streams_spark.operators.incremental import (
        _fs_and_path,
    )

    fs, hpath, _ = _fs_and_path(spark, path)
    fs.mkdirs(hpath)
    write_json_sidecar(
        spark, path, _META, {"window": window, "winnow": winnow}
    )


def append_to_window_index(
    df: DataFrame,
    path: str,
    text_col: str = "text",
    window: int | None = None,
    src_batch: int = -1,
) -> None:
    """Fold a batch's distinct windows in (append-only; replayed
    appends add byte-identical rows that compaction reclaims)."""
    meta = _meta(df.sparkSession, path)
    if window is not None and window != meta["window"]:
        raise ValueError(
            f"index at {path} was built with window={meta['window']}, "
            f"append asked for {window}"
        )
    rel = _batch_windows(
        df, text_col, meta["window"], meta.get("winnow")
    ).withColumn("src_batch", F.lit(src_batch).cast("long"))
    (
        rel.repartition(F.col("bp"))
        .write.partitionBy("bp")
        .mode("append")
        .parquet(path)
    )


def _read_index(spark: SparkSession, path: str) -> DataFrame:
    # explicit schema: an empty (cold-start) index has no files to
    # infer from, and the meta-derived schema keeps the probe alive
    return spark.read.schema("whash string, src_batch long, bp string").parquet(
        path
    )


def scrub_batch_against_index(
    spark: SparkSession,
    path: str,
    batch: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    preserve_case: bool = True,
    touched_only: bool = True,
    fixpoint: bool = True,
    max_passes: int = 16,
    exclude_batch: int | None = None,
    update_index: bool = False,
) -> DataFrame:
    """Excise from ``batch`` every span whose window content already
    exists in the index -- history wins, the streaming keep-first.
    Returns the excision output ((id, n_tokens, n_removed,
    clean_text); ``touched_only`` default True -- feed it to
    :func:`~xmidt_event_streams_spark.operators.dedup.apply_clean_text`).

    ``exclude_batch``: ignore index rows appended by that src_batch
    id -- pass the current micro-batch's id so a REPLAYED batch
    reaches its first-run verdict instead of excising itself against
    its own windows.

    ``update_index=True`` appends the batch's post-scrub windows
    (stamped ``src_batch=exclude_batch`` when given) after computing
    the verdicts -- the one-call ingest shape.

    Probe shape: the batch's distinct windows BROADCAST against the
    index scan, joined on (bp, whash) so partition pruning applies
    when the batch touches few prefixes; the matched-hash relation is
    batch-bounded and broadcasts back into the cut. Each fixpoint
    pass RE-PROBES the index: a stitched window can match history the
    original batch's window set never contained.
    """
    meta = _meta(spark, path)
    window = meta["window"]
    from xmidt_event_streams_spark.operators.dedup import (
        _scrub_to_fixpoint,
    )

    idx = _read_index(spark, path)
    if exclude_batch is not None:
        idx = idx.filter(F.col("src_batch") != F.lit(exclude_batch))

    def lookup(wins: DataFrame) -> DataFrame:
        probe = wins.select("whash").distinct().withColumn(
            "bp", F.substring("whash", 1, 2)
        )
        matched = idx.join(
            F.broadcast(probe), ["bp", "whash"], "left_semi"
        ).select("whash")
        return F.broadcast(matched.distinct())

    out = _scrub_to_fixpoint(
        batch,
        lookup,
        window,
        text_col,
        id_col,
        preserve_case,
        touched_only,
        fixpoint,
        max_passes,
    )
    if update_index:
        from xmidt_event_streams_spark.operators.dedup import (
            apply_clean_text,
        )

        # PIN the verdicts BEFORE appending: the returned plan
        # otherwise re-probes the index lazily at the caller's
        # action, and by then it contains this batch's own windows --
        # without exclude_batch (or on the non-checkpointed scrub
        # arms) every doc would excise itself against itself. The
        # output is touched-/batch-bounded, so materializing is
        # trigger-sized. (r5 review finding, pinned by test.)
        out = out.localCheckpoint(eager=True)
        cleaned = apply_clean_text(batch, out, text_col, id_col)
        append_to_window_index(
            cleaned,
            path,
            text_col=text_col,
            src_batch=-1 if exclude_batch is None else exclude_batch,
        )
    return out


def compact_window_index(spark: SparkSession, path: str) -> dict:
    """Rewrite the index dropping duplicate (whash) rows -- the
    residue of replayed/overlapping appends. Keeps each hash's MIN
    src_batch (the first writer: replay exclusion must keep excluding
    exactly the rows that batch wrote). Same temp-dir + swap dance as
    compact_minhash_index; returns {rows_before, rows_after}."""
    from xmidt_event_streams_spark.operators.incremental import (
        _fs_and_path,
    )

    meta = _meta(spark, path)
    idx = _read_index(spark, path)
    before = idx.count()
    deduped = (
        idx.groupBy("bp", "whash")
        .agg(F.min("src_batch").alias("src_batch"))
        .localCheckpoint(eager=True)
    )
    after = deduped.count()
    tmp = path.rstrip("/") + "__compact_tmp"
    (
        deduped.repartition(F.col("bp"))
        .write.partitionBy("bp")
        .mode("overwrite")
        .parquet(tmp)
    )
    write_json_sidecar(spark, tmp, _META, meta)
    from xmidt_event_streams_spark.fsutil import swap_into_place

    swap_into_place(spark, tmp, path)
    return {"rows_before": before, "rows_after": after}
