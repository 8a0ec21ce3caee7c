"""Corpus relevance scoring: TF-IDF term weights and BM25 query
scores, expressed as two hash-aggregations over one exploded token
stream plus broadcast-sized statistics joins.

Why this shape at 100 TB:

  * the token explode + (doc, term) count is the only pass over the
    raw text; every downstream relation (per-doc length, document
    frequency, corpus stats) derives from that aggregate, so the scan
    and the explode run once (the dl/df branches reuse the tf
    exchange -- verified in the plan audit).
  * document frequency for a FIXED query vocabulary and the corpus
    stats row are tiny: broadcast joins, no shuffle of the big side
    beyond the two aggs the semantics require.
  * scores are rounded to 6 dp before leaving the operator: the
    per-doc sum over query terms is FP-order-dependent at the 1-ulp
    level across engines; 6 dp is >> the drift and << the signal
    (the DuckDB oracle reproduces bit-identical rounded values).

Reference has no text surface at all; this belongs to the
beyond-reference LLM-pipeline mandate (BASELINE.json north star).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from xmidt_event_streams_spark.functions.text import let_bind, md5_bucket, tokens


def term_frequencies(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, term, tf): the single text pass everything else derives
    from. Docs with zero tokens are absent (they have no terms)."""
    tok = df.select(F.col(id_col), F.explode(tokens(text_col)).alias("term"))
    return tok.groupBy(id_col, "term").agg(F.count("*").alias("tf"))


def tfidf(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Classic smoothed TF-IDF per (doc, term):
    ``tf * ln(1 + N / df)`` with N = docs that have >= 1 token.

    Derived entirely from the tf relation: df(term) is one more
    hash-agg; N is a one-row broadcast. Output: (id, term, tf,
    tfidf rounded 6 dp).
    """
    tf = term_frequencies(df, text_col, id_col)
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    n_docs = tf.select(id_col).distinct().agg(F.count("*").alias("n_docs"))
    return (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            F.col(id_col),
            F.col("term"),
            F.col("tf"),
            F.round(
                F.col("tf") * F.log(F.lit(1.0) + F.col("n_docs") / F.col("df")), 6
            ).alias("tfidf"),
        )
    )


def bm25_scores(
    df: DataFrame,
    query_terms: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Okapi BM25 score of every document against a fixed query
    vocabulary.

    score(d) = sum over query terms t of
        idf(t) * tf * (k1+1) / (tf + k1 * (1 - b + b * dl/avgdl))
    with idf(t) = ln(1 + (N - df + 0.5) / (df + 0.5)).

    Plan: tf filtered to the query vocabulary (|Q| rows per matching
    doc) joins per-doc length on the id key; df and (N, avgdl) are
    broadcast. Docs sharing no query term are absent (score would
    be 0). Output: (id, bm25) rounded 6 dp.
    """
    qt = [t.lower() for t in query_terms]
    tf = term_frequencies(df, text_col, id_col)
    dl = tf.groupBy(id_col).agg(F.sum("tf").alias("dl"))
    tfq = tf.filter(F.col("term").isin(qt))
    dfreq = tfq.groupBy("term").agg(F.count("*").alias("df"))
    stats = dl.agg(
        F.avg("dl").alias("avgdl"), F.count("*").alias("n_docs")
    )
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    contrib = idf * (
        F.col("tf")
        * F.lit(k1 + 1.0)
        / (
            F.col("tf")
            + F.lit(k1)
            * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl"))
        )
    )
    return (
        tfq.join(dl, id_col)
        .join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(stats))
        .withColumn("contrib", contrib)
        .groupBy(id_col)
        .agg(F.round(F.sum("contrib"), 6).alias("bm25"))
    )


def tfidf_hashed_vectors(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    dim: int = 64,
    use_idf: bool = True,
) -> DataFrame:
    """(id, embedding): L2-normalized hashed TF-IDF document vectors —
    the bridge from raw text to the package's ENTIRE vector stack
    (brute_force_topk, LSH/IVF/PQ indexes, semdedup_survivors,
    mixture/mining) without an external embedding model. Lexical
    cosine over these vectors approximates n-gram Jaccard at a tiny
    fraction of the pair cost, which is exactly the SemDeDup shape on
    corpora that ship no embeddings column.

    Shape: one token explode + (doc, hashed-idx) hash-agg; idf is the
    vocab-bounded document-frequency relation joined back (broadcast);
    the dense array assembles per doc from a map literal of its own
    sparse entries (map_from_entries over the collect_list — per-doc
    cost dim x nnz, zero extra shuffle beyond the one per-doc agg).
    Token-free docs emit the zero vector (cosine kernels guard /0).

    Hashing = the md5-bucket trick (engine-portable, uniform); dim is
    a declared constant, so downstream index layouts never depend on
    vocabulary growth.
    """
    tf = term_frequencies(df, text_col, id_col)
    n_docs = tf.select(id_col).distinct().agg(F.count("*").alias("n_docs"))
    if use_idf:
        dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
        weighted = (
            tf.join(F.broadcast(dfreq), "term")
            .crossJoin(F.broadcast(n_docs))
            .select(
                F.col(id_col),
                F.col("term"),
                (
                    F.col("tf")
                    * F.log(F.lit(1.0) + F.col("n_docs") / F.col("df"))
                ).alias("w"),
            )
        )
    else:
        weighted = tf.select(
            F.col(id_col), "term", F.col("tf").cast("double").alias("w")
        )
    idx = md5_bucket("term", dim).alias("idx")
    sparse = (
        weighted.select(F.col(id_col), idx, "w")
        .groupBy(id_col, "idx")
        .agg(F.sum("w").alias("w"))
    )
    assembled = (
        sparse.groupBy(id_col)
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct("idx", "w"))
            ).alias("_m")
        )
        .select(
            F.col(id_col),
            F.transform(
                F.sequence(F.lit(0), F.lit(dim - 1)),
                lambda i: F.coalesce(
                    F.element_at(F.col("_m"), i.cast("long")), F.lit(0.0)
                ),
            ).alias("_raw"),
        )
    )
    # let-bind the L2 norm: computed ONCE per doc, not once per
    # element (an aggregate inside the transform lambda would make
    # normalization O(dim^2) work per document)
    normed = assembled.select(
        F.col(id_col),
        let_bind(
            F.sqrt(
                F.aggregate(F.col("_raw"), F.lit(0.0), lambda a, v: a + v * v)
            ),
            lambda nrm: F.transform(F.col("_raw"), lambda x: x / nrm),
        ).alias("embedding"),
    )
    zero_vec = F.array_repeat(F.lit(0.0), dim)
    return (
        df.select(id_col)
        .join(normed, [id_col], "left")
        .select(
            id_col,
            F.coalesce("embedding", zero_vec).alias("embedding"),
        )
    )
