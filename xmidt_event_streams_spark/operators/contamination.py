"""Benchmark-contamination detection: what fraction of each training
document's word n-grams appear anywhere in a held-out benchmark set.

The standard pre-training hygiene check (n-gram overlap against eval
benchmarks) as a join, not a scan-per-benchmark loop:

  * both sides reduce to DISTINCT n-gram hash relations -- md5 of the
    joined n-gram, so the join key is a fixed-width uniform string,
    never the raw text;
  * the benchmark side collapses to its distinct hash set (one
    hash-agg, typically small enough to broadcast -- hinted, with the
    shuffle equi-join as the automatic fallback when it is not);
  * hits are a LEFT SEMI join (no row blow-up when an n-gram occurs
    in many benchmark docs) counted per training doc, left-joined
    back so uncontaminated docs report 0.0.

At 100 TB the training side shuffles only on (doc, hash-agg) keys;
the benchmark side is the small relation by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from xmidt_event_streams_spark.functions.text import word_ngrams


def _doc_ngram_hashes(
    df: DataFrame, text_col: str, id_col: str, n: int
) -> DataFrame:
    """(id, h): distinct md5 per word n-gram per doc. Docs with fewer
    than n tokens contribute no rows."""
    return df.select(
        F.col(id_col),
        F.explode(F.array_distinct(word_ngrams(text_col, n))).alias("g"),
    ).select(F.col(id_col), F.md5("g").alias("h"))


def contamination(
    train: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    ngram_n: int = 5,
    broadcast_benchmark: bool = True,
) -> DataFrame:
    """Per training doc: distinct n-gram count, how many of those
    n-grams occur in the benchmark set, and the contaminated
    fraction (6 dp). Docs with < ``ngram_n`` tokens are absent (no
    n-grams -> contamination undefined).

    Output: (id, n_ngrams, n_hit, contamination).
    """
    tr = _doc_ngram_hashes(train, text_col, id_col, ngram_n)
    bench = (
        _doc_ngram_hashes(benchmark, text_col, id_col, ngram_n)
        .select("h")
        .distinct()
    )
    if broadcast_benchmark:
        bench = F.broadcast(bench)
    totals = tr.groupBy(id_col).agg(F.count("*").alias("n_ngrams"))
    hits = (
        tr.join(bench, "h", "left_semi")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_hit"))
    )
    return (
        totals.join(hits, id_col, "left")
        .select(
            F.col(id_col),
            F.col("n_ngrams"),
            F.coalesce("n_hit", F.lit(0)).alias("n_hit"),
            F.round(
                F.coalesce("n_hit", F.lit(0)) / F.col("n_ngrams").cast("double"), 6
            ).alias("contamination"),
        )
    )
