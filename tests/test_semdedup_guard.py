"""Candidate-pair budget guard for cluster-then-verify dedup.

The degenerate corpus: every doc shares one vocabulary (boilerplate-
dominated web shards before cleaning), so k-means has no cosine
structure to split on, the hot cell holds ~everything, and the verify
join would go quadratic. VERDICT r4's finding: the repo's own sf0.1
drive OOM'd a 1g driver on exactly this shape. These tests pin the
guard: measured budget, bounded failure, ledgered fallback — no OOM.
"""

import warnings

import pytest
from pyspark.sql import functions as F


def _structureless_docs(spark, n=60):
    """n docs over ONE shared vocabulary (word order shuffled by a
    deterministic rotation): pairwise cosine ~1 on hashed tf-idf, so
    every doc lands in the hot cell — the degenerate shape."""
    words = ("terms of service privacy policy cookie consent all "
             "rights reserved contact us about careers").split()
    rows = [
        (i, " ".join(words[i % len(words):] + words[: i % len(words)]))
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_measure_candidate_pairs_exact(spark):
    """The budget probe returns the exact pre-distinct pair volume:
    sum over cells of n*(n-1)/2, plus hottest-cell and total counts."""
    from xmidt_event_streams_spark.operators.similarity import (
        measure_candidate_pairs,
    )

    cells = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "a"), (4, "b"), (5, "b"), (6, "c")],
        "vec_id long, cell string",
    )
    pairs, hottest, total = measure_candidate_pairs(cells)
    assert pairs == 3 + 1 + 0  # C(3,2) + C(2,2) + C(1,2)
    assert hottest == 3
    assert total == 6


def test_clustered_pairs_raises_over_budget(spark):
    """Over budget -> typed error BEFORE the verify join, carrying the
    measured counts (bounded failure, not an OOM)."""
    from xmidt_event_streams_spark.operators.ivf import kmeans_fit_portable
    from xmidt_event_streams_spark.operators.relevance import (
        tfidf_hashed_vectors,
    )
    from xmidt_event_streams_spark.operators.similarity import (
        CandidatePairBudgetExceeded,
        clustered_near_dup_pairs,
    )

    vecs = tfidf_hashed_vectors(_structureless_docs(spark), "text", "doc_id", 32)
    cents = kmeans_fit_portable(vecs, 4, n_iters=2, vec_col="embedding",
                                id_col="doc_id")
    with pytest.raises(CandidatePairBudgetExceeded) as ei:
        clustered_near_dup_pairs(
            vecs, cents, 0.8, n_probe=2, id_col="doc_id",
            vec_col="embedding", max_candidate_pairs=100,
        )
    exc = ei.value
    assert exc.candidate_pairs > 100 and exc.budget == 100
    # structureless corpus: the hot cell holds a large share of the
    # n_probe-exploded assignments
    assert exc.hottest_cell_n >= exc.n_rows // 4
    assert exc.n_rows == 60 * 2  # n_probe=2 assignments per doc


def test_clustered_pairs_under_budget_unchanged(spark):
    """A generous budget changes nothing: same pairs as the unguarded
    run (guard is measurement + comparison only)."""
    from xmidt_event_streams_spark.operators.ivf import kmeans_fit_portable
    from xmidt_event_streams_spark.operators.relevance import (
        tfidf_hashed_vectors,
    )
    from xmidt_event_streams_spark.operators.similarity import (
        clustered_near_dup_pairs,
    )

    vecs = tfidf_hashed_vectors(_structureless_docs(spark, 20), "text",
                                "doc_id", 32)
    cents = kmeans_fit_portable(vecs, 3, n_iters=2, vec_col="embedding",
                                id_col="doc_id")
    kw = dict(n_probe=2, id_col="doc_id", vec_col="embedding")
    unguarded = sorted(
        (r["id_a"], r["id_b"])
        for r in clustered_near_dup_pairs(vecs, cents, 0.9, **kw).collect()
    )
    guarded = sorted(
        (r["id_a"], r["id_b"])
        for r in clustered_near_dup_pairs(
            vecs, cents, 0.9, max_candidate_pairs=10_000, **kw
        ).collect()
    )
    assert guarded == unguarded and len(guarded) > 0


def test_lexical_semdedup_fallback_ledgered(spark):
    """The degenerate corpus under a tiny budget: lexical_semdedup
    falls back to the MinHash band path, warns, fills the ledger, and
    still returns one verdict per doc with the same schema."""
    from xmidt_event_streams_spark.operators.components import lexical_semdedup

    df = _structureless_docs(spark)
    report = {}
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        out = lexical_semdedup(
            df, threshold=0.95, k=4, max_candidate_pairs=50, report=report
        )
        rows = out.collect()
    out.unpersist()
    assert report["path"] == "minhash_fallback"
    assert report["candidate_pairs"] > 50 and report["budget"] == 50
    assert 0.0 < report["hottest_cell_frac"] <= 1.0
    assert any("falling back" in str(x.message) for x in w)
    assert len(rows) == 60
    assert set(rows[0].asDict()) == {"doc_id", "cluster_id", "is_survivor"}
    # rotations of one word list share every 3-shingle band -> one
    # cluster, exactly one survivor
    assert sum(r["is_survivor"] for r in rows) < 60


def test_lexical_semdedup_raise_mode(spark):
    from xmidt_event_streams_spark.operators.components import lexical_semdedup
    from xmidt_event_streams_spark.operators.similarity import (
        CandidatePairBudgetExceeded,
    )

    report = {}
    with pytest.raises(CandidatePairBudgetExceeded):
        lexical_semdedup(
            _structureless_docs(spark), threshold=0.95, k=4,
            max_candidate_pairs=50, on_over_budget="raise", report=report,
        )
    assert report["path"] == "minhash_fallback"  # ledger records the verdict
    assert report["candidate_pairs"] > 50


def test_lexical_semdedup_structured_corpus_stays_clustered(spark):
    """A corpus WITH cosine structure under the default budget takes
    the clustered path and matches the pre-guard behavior."""
    from xmidt_event_streams_spark.operators.components import lexical_semdedup

    rows = [
        (0, "spark shuffles data across the cluster for large joins"),
        (1, "shuffles spark the across data large cluster joins for"),
        (10, "pelicans migrate over coastal wetlands every autumn"),
        (11, "quarterly revenue guidance exceeded analyst expectations"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    report = {}
    out = lexical_semdedup(df, threshold=0.95, k=2, report=report)
    got = {r["doc_id"]: (r["cluster_id"], r["is_survivor"])
           for r in out.collect()}
    out.unpersist()
    assert report["path"] == "clustered"
    assert got[0] == (0, True) and got[1] == (0, False)
    assert got[10][1] and got[11][1]
