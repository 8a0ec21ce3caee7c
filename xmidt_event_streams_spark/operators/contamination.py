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


# ---------------------------------------------------------------------------
# KMV corpus-overlap sketch
# ---------------------------------------------------------------------------


def kmv_bottom_k(
    df: DataFrame,
    text_col: str = "text",
    ngram_n: int = 5,
    k: int = 1024,
) -> list[str]:
    """Bottom-k md5 hashes of the corpus's DISTINCT word n-grams --
    a k-minimum-values sketch (Bar-Yossef et al., RANDOM 2002): under
    a uniform hash, the k smallest distinct hash values summarize the
    whole distinct-shingle SET well enough to estimate cardinality
    and, merged with another corpus's sketch, Jaccard overlap.

    Cost: one distinct-hash hash-agg shuffle (the same shuffle
    :func:`contamination` pays on its benchmark side) + a global
    ascending top-k (TakeOrderedAndProject: per-task heaps of k, the
    driver merges k per task). The sketch itself is k strings --
    bounded BY DECLARATION, so comparing two 100 TB crawls costs two
    independent corpus passes and a driver-side set intersection of
    2k elements. Returned ascending; shorter than k iff the corpus
    has fewer than k distinct n-grams (the exact regime).
    """
    if k <= 0:
        raise ValueError("k must be positive")
    hashes = (
        df.select(
            F.explode(
                F.array_distinct(word_ngrams(text_col, ngram_n))
            ).alias("g")
        )
        .select(F.md5("g").alias("h"))
        .dropDuplicates(["h"])
    )
    return [r["h"] for r in hashes.orderBy("h").limit(int(k)).collect()]


def _hash_frac(h: str) -> float:
    """md5 hex -> uniform fraction in (0, 1) from 60 leading bits
    (exact in a double)."""
    return (int(h[:15], 16) + 1.0) / float(16**15)


def _kmv_distinct(sketch: list[str], k: int) -> float:
    """KMV cardinality: exact when the sketch caught everything,
    (k-1)/frac(kth smallest) otherwise."""
    if len(sketch) < k:
        return float(len(sketch))
    return (k - 1) / _hash_frac(sketch[-1])


def corpus_overlap_report(
    a: DataFrame,
    b: DataFrame,
    text_col: str = "text",
    ngram_n: int = 5,
    k: int = 1024,
) -> dict:
    """Estimate the n-gram-set overlap of two corpora from their KMV
    sketches -- the cheap "how much does this crawl duplicate that
    one" probe to run BEFORE committing to a full cross-corpus dedup
    or decontamination pass.

    Jaccard: over the k smallest hashes of the UNION of the sketches,
    count how many appear in both -- an unbiased |A∩B|/|A∪B|
    estimator with ~1/sqrt(k) relative error (k=1024 -> ~3%).
    Containments derive as J * D_union / D_side. All values exact
    (error 0) when both corpora hold fewer than k distinct n-grams.

    Returns {"k", "exact", "jaccard", "containment_a", "containment_b",
    "distinct_a", "distinct_b", "distinct_union"} -- plain Python
    scalars off two bounded sketches; nothing corpus-sized leaves the
    executors.
    """
    sa = kmv_bottom_k(a, text_col, ngram_n, k)
    sb = kmv_bottom_k(b, text_col, ngram_n, k)
    set_a, set_b = set(sa), set(sb)
    union_bottom = sorted(set_a | set_b)[:k]
    exact = len(sa) < k and len(sb) < k
    inter = sum(1 for h in union_bottom if h in set_a and h in set_b)
    denom = len(union_bottom) if union_bottom else 1
    jaccard = inter / denom
    d_a = _kmv_distinct(sa, k)
    d_b = _kmv_distinct(sb, k)
    if exact:
        d_union = float(len(set_a | set_b))
    else:
        d_union = _kmv_distinct(union_bottom, k)
    return {
        "k": k,
        "exact": exact,
        "jaccard": round(jaccard, 6),
        "containment_a": round(
            min(1.0, jaccard * d_union / d_a) if d_a else 0.0, 6
        ),
        "containment_b": round(
            min(1.0, jaccard * d_union / d_b) if d_b else 0.0, 6
        ),
        "distinct_a": round(d_a, 1),
        "distinct_b": round(d_b, 1),
        "distinct_union": round(d_union, 1),
    }
