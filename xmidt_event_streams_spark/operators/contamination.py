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
    return overlap_from_sketches(sa, sb, k)


def overlap_from_sketches(sa: list[str], sb: list[str], k: int) -> dict:
    """The driver-side half of :func:`corpus_overlap_report`: merge
    two bottom-k sketches (as returned by :func:`kmv_bottom_k`) into
    the overlap estimates. Pure Python over 2k strings -- also the
    entry point when one side is a PERSISTED sketch (see
    :func:`save_kmv` / :func:`kmv_drift`)."""
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


_KMV_META_FILE = "_xes_kmv_sketch_meta.json"


def save_kmv(
    spark,
    sketch: list[str],
    path: str,
    ngram_n: int,
    k: int,
) -> None:
    """Persist a KMV sketch as a k-row parquet dataset with the
    (ngram_n, k) parameters in a Hadoop-FS meta sidecar -- sketches
    hashed under different parameters are NOT comparable, and the
    sidecar is what lets :func:`kmv_drift` refuse a mismatched
    baseline instead of reporting a meaningless Jaccard. Object-store
    safe (all I/O via Spark/Hadoop)."""
    from xmidt_event_streams_spark.fsutil import write_json_sidecar

    base = path.rstrip("/")
    spark.createDataFrame(
        [(h,) for h in sketch], "h string"
    ).coalesce(1).write.mode("overwrite").parquet(base + "/sketch")
    write_json_sidecar(
        spark,
        base,
        _KMV_META_FILE,
        {"ngram_n": int(ngram_n), "k": int(k), "kind": "kmv"},
    )


def load_kmv(spark, path: str) -> tuple[list[str], dict]:
    """Load a :func:`save_kmv` artifact -> (ascending sketch, meta);
    raises without the sidecar."""
    from xmidt_event_streams_spark.fsutil import read_json_sidecar

    base = path.rstrip("/")
    meta = read_json_sidecar(spark, base, _KMV_META_FILE)
    if meta is None or meta.get("kind") != "kmv":
        raise ValueError(f"no KMV meta sidecar at {path}")
    rows = spark.read.parquet(base + "/sketch").collect()
    return sorted(r["h"] for r in rows), meta


# corpus-content drift verdict thresholds: Jaccard of the current
# corpus's n-gram set vs the stamped baseline. Content turnover is
# gradual in healthy pipelines; a sudden collapse means the upstream
# source changed (crawl config, extraction regression, wrong path).
KMV_DRIFT_STABLE = 0.8
KMV_DRIFT_DRIFTING = 0.5


def kmv_drift(
    spark,
    baseline_path: str,
    corpus: DataFrame,
    text_col: str = "text",
) -> dict:
    """Compare a corpus against a persisted KMV baseline: the
    cheapest whole-content drift alarm (one corpus pass, k-bounded
    driver state) -- the ivf_occupancy_drift of TEXT. Returns the
    :func:`overlap_from_sketches` report plus a verdict:
    jaccard >= 0.8 "stable", >= 0.5 "drifting", else "shifted"
    (re-baseline with :func:`save_kmv` after investigating). The
    sketch parameters come from the baseline's sidecar, so current
    and baseline are always hashed identically."""
    base_sketch, meta = load_kmv(spark, baseline_path)
    cur = kmv_bottom_k(corpus, text_col, int(meta["ngram_n"]), int(meta["k"]))
    rep = overlap_from_sketches(base_sketch, cur, int(meta["k"]))
    j = rep["jaccard"]
    rep["verdict"] = (
        "stable"
        if j >= KMV_DRIFT_STABLE
        else "drifting" if j >= KMV_DRIFT_DRIFTING else "shifted"
    )
    rep["ngram_n"] = int(meta["ngram_n"])
    return rep
