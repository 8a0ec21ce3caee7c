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
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from xmidt_event_streams_spark.fsutil import (
    check_sidecar_params,
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
        df.sparkSession, path, _META, {"n_buckets": n_buckets}
    )


def read_inverted_index(
    spark: SparkSession, path: str, n_buckets: int = DEFAULT_BUCKETS
) -> DataFrame:
    """Open a materialized index, refusing a bucket-count mismatch
    (probe pruning would silently miss terms otherwise)."""
    check_sidecar_params(
        spark, path, _META, {"n_buckets": n_buckets}, "inverted index"
    )
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
            F.map_from_entries(
                F.collect_list(F.struct("term", "positions"))
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
        F.map_from_entries(
            F.collect_list(F.struct("term", "positions"))
        ).alias("pm")
    )
    cond = F.lit(False)
    for g in sorted(grams):
        cond = cond | (F.size(_phrase_hits_expr(list(g))) > 0)
    return per_doc.filter(cond).select("doc_id")
