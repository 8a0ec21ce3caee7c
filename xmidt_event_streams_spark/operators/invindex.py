"""Positional inverted index + phrase search over the documents table.

BM25 (operators/relevance.py) scores bag-of-words relevance but keeps
no positions, and the window-hash index (operators/spandedup.py) keys
fixed-width w-grams -- neither can answer "which documents contain
THIS exact phrase, and where" for an arbitrary-length phrase without a
full corpus scan. A positional inverted index is the classic structure
(Manning, Raghavan & Schütze, *Introduction to Information Retrieval*
§2.4, public): one row per (term, doc) carrying the sorted position
list, so a phrase query touches only its own terms' postings and
verifies adjacency by position arithmetic. Uses: corpus search,
takedown-request triage (find every doc carrying the phrase BEFORE
running the scrub -- the candidate set takedown_phrases then cuts),
quote/citation mining.

Build shape (the 100 TB contract):
  * one posexplode of the token stream -> hash agg on (term, doc_id)
    -> sort_array(collect_list(pos)). The agg key INCLUDES doc_id, so
    a stopword term is millions of (term, doc) rows, not one hot row
    -- per-group state is bounded by a single document's length;
  * the index is written partitioned by ``bkt = md5_bucket(term)``:
    a probe for an n-term phrase prunes to <= n partition directories
    at PLAN time (PartitionFilters), and the term equality pushes to
    the parquet scan (PushedFilters) -- same discipline as the IVF
    cell layout (operators/ivf.py).

Search shape:
  * filter postings to the phrase's distinct terms (bucket-pruned,
    predicate-pushed) -> one groupBy doc_id collecting a term ->
    positions map (bounded by the phrase's postings in THAT doc) ->
    a JVM higher-order-function intersection: position p matches when
    every phrase term i has p+i in its list. No Python in the hot
    path; the only shuffle is keyed by doc_id over the filtered
    postings -- corpus-size-independent for rare phrases.

Tokenization is functions/text.tokens (the engine-wide contract), so
index positions line up with every other token-addressed operator
(substring spans, chunking, token counts).

Incremental lifecycle (mirrors the MinHash index,
operators/incremental.py): a growing corpus must not rebuild the
world to keep takedown pre-filters fresh.

  * :func:`init_inverted_index` stamps an EMPTY index (meta sidecar,
    zero data files) for cold starts;
  * :func:`append_to_inverted_index` folds a new batch in
    (append-only: a document's postings are a pure row function of
    that document, so prior rows never change; a replayed streaming
    micro-batch re-appends byte-identical rows, which the probe's
    set-collect absorbs and :func:`compact_inverted_index` reclaims);
  * :func:`compact_inverted_index` rewrites in place, dropping replay
    duplicates and tombstoned documents' postings (the takedown
    completion step for the index tier).

UPDATING a document's text is tombstone-then-append (same contract as
the snapshot table): appending new text under a live id would leave
two conflicting posting rows per shared term, and the probe raises on
the conflicting map keys rather than silently picking one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from xmidt_event_streams_spark.fsutil import (
    check_sidecar_params,
    count_data_files,
    hadoop_fs,
    swap_into_place,
    write_json_sidecar,
)
from xmidt_event_streams_spark.functions.text import (
    md5_bucket,
    py_tokens,
    tokens,
)

_META = "_invindex_meta.json"
DEFAULT_BUCKETS = 64


def build_inverted_index(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = DEFAULT_BUCKETS,
) -> DataFrame:
    """-> (term, doc_id, positions array<int> sorted 0-based, tf, bkt).

    ``tf`` is the term's in-document frequency (= size(positions)),
    carried so consumers can score without re-aggregating. Documents
    with NULL/empty text contribute no rows.
    """
    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    return (
        df.select(
            F.col(id_col).alias("doc_id"),
            F.posexplode(tokens(text_col)).alias("pos", "term"),
        )
        .groupBy("term", "doc_id")
        .agg(F.sort_array(F.collect_list("pos")).alias("positions"))
        .select(
            "term",
            "doc_id",
            "positions",
            F.size("positions").alias("tf"),
            md5_bucket("term", n_buckets).alias("bkt"),
        )
    )


def _index_schema(meta: dict):
    """Exact index relation schema from the meta sidecar. An explicit
    schema makes the cold-start case work (an initialized index has a
    sidecar but zero parquet files, where inference would fail with
    UNABLE_TO_INFER_SCHEMA) and skips listing-time inference."""
    from pyspark.sql.types import StructType

    id_type = meta.get("id_type", "bigint")
    return StructType.fromDDL(
        f"term string, doc_id {id_type}, positions array<int>, "
        "tf int, bkt bigint"
    )


def write_inverted_index(
    df: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = DEFAULT_BUCKETS,
) -> None:
    """Materialize the index partitioned by term bucket, stamped with
    a parameter sidecar (the family's foreign-index guard)."""
    ix = build_inverted_index(df, id_col, text_col, n_buckets)
    (
        ix.repartition(F.col("bkt"))
        .write.partitionBy("bkt")
        .mode("overwrite")
        .parquet(path)
    )
    write_json_sidecar(
        df.sparkSession,
        path,
        _META,
        {
            "n_buckets": n_buckets,
            "id_type": df.schema[id_col].dataType.simpleString(),
        },
    )


def init_inverted_index(
    spark: SparkSession,
    path: str,
    id_type: str = "bigint",
    n_buckets: int = DEFAULT_BUCKETS,
) -> None:
    """Cold-start initializer: stamp an EMPTY index (meta sidecar, no
    data files). The first probe reads the meta-derived schema and
    sees an empty relation; the first append folds the first batch
    in — same contract as ``init_minhash_index``."""
    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    fs, hpath, _ = hadoop_fs(spark, path)
    fs.mkdirs(hpath)
    write_json_sidecar(
        spark, path, _META, {"n_buckets": n_buckets, "id_type": id_type}
    )


def append_to_inverted_index(
    df: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = DEFAULT_BUCKETS,
) -> None:
    """Fold a new batch of documents into an existing index without
    touching prior files (append-only: postings are pure row functions
    of their document). Re-appending the same docs — an at-least-once
    streaming replay — adds byte-identical rows that probes absorb
    (set-collect) and compaction reclaims; appending CHANGED text for
    a live id is a contract violation (tombstone-compact first)."""
    meta = check_sidecar_params(
        df.sparkSession, path, _META, {"n_buckets": n_buckets},
        "inverted index",
    )
    if meta is None:
        # a sidecar-less append would create an UNGUARDED index whose
        # probes can silently mis-prune under a bucket-count mismatch
        # (exactly the failure mode the sidecar family exists for)
        raise ValueError(
            f"no inverted index at {path}: initialize with "
            "init_inverted_index or write_inverted_index before "
            "appending"
        )
    ix = build_inverted_index(df, id_col, text_col, n_buckets)
    (
        ix.repartition(F.col("bkt"))
        .write.partitionBy("bkt")
        .mode("append")
        .parquet(path)
    )


def compact_inverted_index(
    spark: SparkSession,
    path: str,
    tombstones: DataFrame | list | None = None,
) -> dict:
    """Rewrite the index in place, dropping (a) replay-duplicate
    (term, doc) posting rows and (b) every posting of tombstoned
    documents — the index tier of a takedown: after compaction a
    phrase probe cannot surface the removed doc, by absence rather
    than by filter. Probe results over live ids are exactly preserved
    (pytest-enforced). Same swap mechanics as
    ``compact_minhash_index``: rewrite to a sibling temp dir, restamp
    the meta, delete + rename (atomic on HDFS/local; schedule inside
    a maintenance window on object stores). Single-writer: run while
    appending streams are stopped (run_maintenance enforces via its
    checkpoint guard).

    Returns {rows_before, rows_after, files_before, files_after}.
    """
    meta = check_sidecar_params(
        spark, path, _META, {}, "inverted index"
    )
    if meta is None:
        raise ValueError(
            f"cannot compact a foreign index (no {_META} at {path})"
        )
    # legacy sidecars (pre-incremental) lack id_type: fall back to
    # inference rather than breaking non-bigint-keyed indexes with
    # the bigint default (read_inverted_index has the same guard)
    idx = (
        spark.read.schema(_index_schema(meta)).parquet(path)
        if "id_type" in meta
        else spark.read.parquet(path)
    )

    rows_before = idx.count()
    files_before = count_data_files(spark, path)

    compacted = idx.dropDuplicates(["term", "doc_id"])
    if tombstones is not None:
        if isinstance(tombstones, DataFrame):
            tomb = tombstones.select(
                F.col(tombstones.columns[0]).alias("doc_id")
            )
        else:
            tomb = spark.createDataFrame(
                [(t,) for t in tombstones],
                f"doc_id {meta.get('id_type', 'bigint')}",
            )
        compacted = compacted.join(F.broadcast(tomb), "doc_id", "left_anti")

    tmp = path.rstrip("/") + "__compact_tmp"
    (
        compacted.repartition(F.col("bkt"))
        .write.partitionBy("bkt")
        .mode("overwrite")
        .parquet(tmp)
    )
    write_json_sidecar(spark, tmp, _META, meta)
    rows_after = (
        spark.read.schema(_index_schema(meta)).parquet(tmp)
        if "id_type" in meta
        else spark.read.parquet(tmp)
    ).count()
    files_after = count_data_files(spark, tmp)

    swap_into_place(spark, tmp, path)
    return {
        "rows_before": rows_before,
        "rows_after": rows_after,
        "files_before": files_before,
        "files_after": files_after,
    }


def read_inverted_index(
    spark: SparkSession, path: str, n_buckets: int = DEFAULT_BUCKETS
) -> DataFrame:
    """Open a materialized index, refusing a bucket-count mismatch
    (probe pruning would silently miss terms otherwise). Reads with
    the meta-derived explicit schema, so an initialized-but-empty
    index is a valid empty relation."""
    meta = check_sidecar_params(
        spark, path, _META, {"n_buckets": n_buckets}, "inverted index"
    )
    if meta is not None and "id_type" in meta:
        return spark.read.schema(_index_schema(meta)).parquet(path)
    return spark.read.parquet(path)


def _py_bkts(terms: list[str], n_buckets: int) -> list[int]:
    """Driver-side twin of functions/text.md5_bucket for the probe's
    partition IN-list (60 bits of the md5, pmod n)."""
    import hashlib

    return sorted(
        {
            int(hashlib.md5(t.encode()).hexdigest()[:15], 16) % n_buckets
            for t in terms
        }
    )


def _pm_positions(term: str):
    """pm[term] with a missing key reading as the empty list."""
    return F.coalesce(
        F.col("pm").getItem(term), F.array().cast("array<int>")
    )


def _phrase_hits_expr(terms: list[str]):
    """Column expr over a ``pm`` (term -> positions) map column: the
    sorted array of match START positions for the phrase."""
    base = _pm_positions(terms[0])
    if len(terms) == 1:
        return base
    return F.filter(
        base,
        lambda p: F.aggregate(
            F.array(
                *[
                    F.array_contains(_pm_positions(t), p + F.lit(i))
                    for i, t in enumerate(terms)
                    if i > 0
                ]
            ),
            F.lit(True),
            lambda acc, x: acc & x,
        ),
    )


def phrase_search(
    index: DataFrame,
    phrase: str,
    n_buckets: int | None = DEFAULT_BUCKETS,
) -> DataFrame:
    """-> (doc_id, n_hits, first_pos, hit_positions): every document
    containing ``phrase`` as consecutive tokens, with 0-based match
    start positions (overlapping matches all count: 'a a a' holds two
    'a a' hits -- the same census rule as the substring-span family).

    ``phrase`` is tokenized with the engine contract (py_tokens, the
    driver-side twin of functions/text.tokens). Pass ``n_buckets``
    matching the index build so the bucket IN-list prunes partitions;
    pass None for an index relation without a ``bkt`` column.
    """
    terms = py_tokens(phrase)
    if not terms:
        raise ValueError("phrase has no tokens")
    distinct = sorted(set(terms))
    probe = index.filter(F.col("term").isin(distinct))
    if n_buckets is not None:
        probe = probe.filter(F.col("bkt").isin(_py_bkts(distinct, n_buckets)))
    per_doc = (
        probe.groupBy("doc_id")
        .agg(
            # collect_SET: replayed appends re-add byte-identical
            # (term, positions) rows, which dedup here instead of
            # tripping map_from_entries' duplicate-key error; a live
            # id re-appended with DIFFERENT text still raises (loud,
            # per the tombstone-then-append contract)
            F.map_from_entries(
                F.collect_set(F.struct("term", "positions"))
            ).alias("pm")
        )
        # every distinct phrase term must appear in the doc at all
        .filter(F.size("pm") == len(distinct))
    )
    hits = per_doc.select(
        "doc_id", _phrase_hits_expr(terms).alias("hit_positions")
    ).filter(F.size("hit_positions") > 0)
    return hits.select(
        "doc_id",
        F.size("hit_positions").cast("long").alias("n_hits"),
        F.array_min("hit_positions").cast("long").alias("first_pos"),
        "hit_positions",
    )


def phrase_candidates(
    index: DataFrame,
    phrases: list[str],
    window: int,
    n_buckets: int | None = DEFAULT_BUCKETS,
) -> DataFrame:
    """-> (doc_id): every document containing ANY ``window``-gram of
    any phrase as consecutive tokens -- exactly the set of documents
    a window-hash scrub (takedown_phrases /
    remove_contaminated_spans) can touch, probed from the index
    instead of scanning the corpus. A doc outside this set holds no
    phrase window-gram, is untouched by the scrub's first pass, and
    fixpoint re-passes only revisit touched docs -- so pre-filtering
    the corpus to these candidates is semantics-preserving.

    One probe: postings filtered to the union of all grams' terms
    (bucket-pruned + pushed), one groupBy doc, and an OR over the
    grams' position-intersection predicates. Phrases shorter than
    ``window`` tokens are refused (the takedown surface's rule).
    """
    if window < 1:
        raise ValueError(f"window must be >= 1, got {window}")
    grams: set[tuple[str, ...]] = set()
    for p in phrases:
        toks = py_tokens(p)
        if len(toks) < window:
            raise ValueError(
                f"phrase shorter than window={window} tokens cannot "
                f"match: {p!r}"
            )
        for i in range(len(toks) - window + 1):
            grams.add(tuple(toks[i : i + window]))
    terms = sorted({t for g in grams for t in g})
    probe = index.filter(F.col("term").isin(terms))
    if n_buckets is not None:
        probe = probe.filter(F.col("bkt").isin(_py_bkts(terms, n_buckets)))
    per_doc = probe.groupBy("doc_id").agg(
        # collect_set for replay-duplicate absorption, as phrase_search
        F.map_from_entries(
            F.collect_set(F.struct("term", "positions"))
        ).alias("pm")
    )
    cond = F.lit(False)
    for g in sorted(grams):
        cond = cond | (F.size(_phrase_hits_expr(list(g))) > 0)
    return per_doc.filter(cond).select("doc_id")


def sync_inverted_index_with_snapshot(
    spark: SparkSession,
    table_path: str,
    index_path: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = DEFAULT_BUCKETS,
    max_polls: int = 1_000_000,
) -> dict:
    """Keep a positional inverted index caught up with a SNAPSHOT
    TABLE through the checkpointed change feed -- an instance of
    ``snapshots.sync_index_with_snapshot`` (the index-tier twin of
    ``snapshots.replicate_snapshot``). Call at any cadence (e.g. the
    maintenance window); each call drains every pending change
    interval and returns {intervals, appended_docs, removed_docs}.

    Per interval, in this order:

      1. ``compact_inverted_index(tombstones = deleted + updated
         ids)`` -- removes STALE postings (an updated doc's old terms
         must stop answering probes; append-only postings cannot
         express replacement). Skipped when the interval carries no
         deletes/updates, so insert-dominated workloads pay
         append-only cost.
      2. ``append_to_inverted_index(inserts + update after-images)``.
      3. cursor ack (inside the harness).

    Crash convergence: a crash before ack redelivers the interval;
    re-compacting re-removes the same ids (now including any postings
    the first attempt already appended for updated docs) and
    re-appending restores them -- the index converges to exactly the
    table's live postings. A crash after append duplicates insert
    postings until the next compaction, the documented at-least-once
    posture of ``append_to_inverted_index``.

    Bootstrap: a FRESH checkpoint pins the table head and the index
    is (re)built from a full read at that version -- the index must
    not pre-exist (fork refusal, see the harness).
    """
    from xmidt_event_streams_spark.fsutil import read_json_sidecar
    from xmidt_event_streams_spark.operators.snapshots import (
        compact_then_append_interval,
        snapshot_read,
        sync_index_with_snapshot,
    )

    def _exists() -> bool:
        return read_json_sidecar(spark, index_path, _META) is not None

    def _bootstrap(version: int) -> int:
        base = snapshot_read(spark, table_path, version=version).select(
            id_col, text_col
        )
        write_inverted_index(base, index_path, id_col, text_col, n_buckets)
        return base.count()

    def _apply(ch: DataFrame) -> tuple[int, int]:
        return compact_then_append_interval(
            ch,
            id_col,
            text_col,
            lambda stale: compact_inverted_index(
                spark, index_path, tombstones=stale
            ),
            lambda fresh: append_to_inverted_index(
                fresh, index_path, id_col, text_col, n_buckets
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
