"""Round-4 curation extras: quality-aware dup survivors
(operators/components.py), deterministic global shuffle
(operators/traindata.py), HTML -> text extraction
(functions/text.py)."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from xmidt_event_streams_spark.functions.text import html_to_text
from xmidt_event_streams_spark.operators.components import (
    dup_cluster_survivors,
)
from xmidt_event_streams_spark.operators.traindata import global_shuffle


# -- quality-aware survivors ------------------------------------------


def _corpus(spark, scores):
    return spark.createDataFrame(
        [(i, s) for i, s in scores.items()], "doc_id long, score double"
    )


def _pairs(spark, edges):
    return spark.createDataFrame(edges, "a long, b long").select(
        F.col("a").alias("id_a"), F.col("b").alias("id_b")
    )


def test_prefer_col_picks_highest_score(spark):
    # cluster {1,2,3} (3 has the best score), cluster {10,11} (tie ->
    # min id), singleton 20
    df = _corpus(
        spark, {1: 0.1, 2: 0.5, 3: 0.9, 10: 0.7, 11: 0.7, 20: 0.2}
    )
    pairs = _pairs(spark, [(1, 2), (2, 3), (10, 11)])
    out = {
        r["doc_id"]: (r["cluster_id"], r["is_survivor"])
        for r in dup_cluster_survivors(
            df, pairs, prefer_col="score"
        ).collect()
    }
    assert out[3] == (1, True) and not out[1][1] and not out[2][1]
    assert out[10] == (10, True) and out[11] == (10, False)
    assert out[20] == (20, True)
    # exactly one survivor per cluster
    assert sum(v[1] for v in out.values()) == 3


def test_prefer_constant_score_equals_min_id_rule(spark):
    df = _corpus(spark, {i: 1.0 for i in range(8)})
    pairs = _pairs(spark, [(0, 3), (3, 5), (1, 7)])
    a = sorted(
        map(tuple, dup_cluster_survivors(df, pairs).collect())
    )
    b = sorted(
        map(tuple, dup_cluster_survivors(df, pairs, prefer_col="score").collect())
    )
    assert a == b


def test_prefer_null_scores_lose(spark):
    df = spark.createDataFrame(
        [(1, None), (2, 0.2)], "doc_id long, score double"
    )
    pairs = _pairs(spark, [(1, 2)])
    out = {
        r["doc_id"]: r["is_survivor"]
        for r in dup_cluster_survivors(df, pairs, prefer_col="score").collect()
    }
    assert out == {1: False, 2: True}  # desc_nulls_last


# -- deterministic global shuffle -------------------------------------


def test_global_shuffle_is_md5_permutation(spark):
    df = spark.createDataFrame(
        [(i, f"t{i}") for i in range(200)], "doc_id long, text string"
    )
    got = [r["doc_id"] for r in global_shuffle(df, seed="epoch-1").collect()]
    want = sorted(
        range(200),
        key=lambda i: hashlib.md5(f"epoch-1|{i}".encode()).hexdigest(),
    )
    assert got == want                      # exact reproducible order
    assert sorted(got) == list(range(200))  # a permutation, no loss
    got2 = [r["doc_id"] for r in global_shuffle(df, seed="epoch-2").collect()]
    assert got2 != got and sorted(got2) == sorted(got)


# -- HTML -> text -----------------------------------------------------

_HTML = """<html><head><title>skip me</title>
<style>body { color: red; }</style></head>
<body>
<script type="text/javascript">var x = "<p>not text</p>";</script>
<!-- a comment -->
<h1>Heading</h1>
<p>First &amp; second &lt;para&gt;.</p>
<div>Item one<br>Item two</div>
<span>inline &nbsp;text</span>
</body></html>"""


def test_html_to_text_extracts_prose(spark):
    df = spark.createDataFrame([(1, _HTML)], "doc_id long, html string")
    out = df.select(html_to_text("html").alias("t")).collect()[0]["t"]
    assert "skip me" not in out          # head elided with contents
    assert "color" not in out            # style elided
    assert "var x" not in out            # script elided entirely
    assert "not text" not in out         # even though it looks like a tag
    assert "a comment" not in out
    assert "Heading" in out and "Item one\nItem two" in out
    assert "First & second <para>." in out   # entities decoded
    assert "inline text" in out
    assert "<" not in out.replace("<para>", "")  # no tags remain
    assert "\n\n\n" not in out           # blank runs squeezed


def test_html_to_text_passthrough_and_escapes(spark):
    df = spark.createDataFrame(
        [
            (1, "plain prose, no markup."),
            (2, "tricky &amp;lt; stays one decode"),
        ],
        "doc_id long, html string",
    )
    rows = {
        r["doc_id"]: r["t"]
        for r in df.select(
            "doc_id", html_to_text("html").alias("t")
        ).collect()
    }
    assert rows[1] == "plain prose, no markup."
    # &amp;lt; -> &lt; (one decode, not "<"): amp decodes LAST
    assert rows[2] == "tricky &lt; stays one decode"


def test_strip_html_stage_in_corpus_build(spark, tmp_path):
    from xmidt_event_streams_spark.corpus import build_training_corpus

    df = spark.createDataFrame(
        [
            (1, "<p>real prose here</p><script>var x;</script>"),
            (2, "<div>real prose here</div>"),  # same prose post-strip
        ],
        "doc_id long, text string",
    )
    ledger = build_training_corpus(
        df, str(tmp_path / "o"), quality=None, dedup="exact",
        strip_html=True, n_shards=1,
    )
    # stripping normalizes both docs to identical prose -> exact dup
    assert ledger["exact_dups_dropped"] == 1
    back = spark.read.parquet(str(tmp_path / "o"))
    assert back.collect()[0]["text"] == "real prose here"


def test_lexical_semdedup_clusters_paraphrases(spark):
    """tfidf vectors + portable kmeans + semdedup: order-destroyed
    rewrites of the same text cluster together and keep one survivor;
    lexically distinct docs all survive."""
    from xmidt_event_streams_spark.operators.components import (
        lexical_semdedup,
    )

    base = "spark shuffles data across the cluster for large joins".split()
    import random

    rng = random.Random(3)
    rows = []
    for i in range(3):  # three orderings of the same bag of words
        w = base[:]
        rng.shuffle(w)
        rows.append((i, " ".join(w)))
    rows += [
        (10, "pelicans migrate over coastal wetlands every autumn"),
        (11, "quarterly revenue guidance exceeded analyst expectations"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: (r["cluster_id"], r["is_survivor"])
        for r in lexical_semdedup(df, threshold=0.95, k=2).collect()
    }
    assert len(out) == 5
    # the three bag-equal docs share one cluster, min id survives
    assert out[0] == (0, True)
    assert out[1] == (0, False) and out[2] == (0, False)
    assert out[10][1] and out[11][1]
    assert out[10][0] != out[0][0] and out[11][0] != out[0][0]


def test_soft_quality_sample(spark):
    from xmidt_event_streams_spark.operators.traindata import (
        soft_quality_sample,
    )

    df = spark.createDataFrame(
        [(i, (i - 500) / 100.0) for i in range(1000)],
        "doc_id long, score double",
    )
    kept = soft_quality_sample(df, "score", temperature=1.0)
    # deterministic: same seed -> identical verdicts
    a = sorted(r["doc_id"] for r in kept.collect())
    b = sorted(r["doc_id"] for r in soft_quality_sample(
        df, "score", temperature=1.0).collect())
    assert a == b
    # monotone in score: keep-rate rises across score bands
    bands = [
        len([i for i in a if lo <= i < lo + 200]) / 200
        for lo in range(0, 1000, 200)
    ]
    assert all(x <= y + 0.05 for x, y in zip(bands, bands[1:])), bands
    assert bands[0] < 0.2 and bands[-1] > 0.8
    # near-zero temperature recovers the hard threshold
    hard = sorted(
        r["doc_id"]
        for r in soft_quality_sample(
            df, "score", temperature=1e-9
        ).collect()
    )
    assert hard == list(range(501, 1000)) or hard == list(range(500, 1000))
    # fresh seed -> a different borderline draw, same edges
    c = sorted(r["doc_id"] for r in soft_quality_sample(
        df, "score", temperature=1.0, seed="softq-1").collect())
    assert c != a


def test_token_budget_sample(spark):
    from xmidt_event_streams_spark.operators.traindata import (
        token_budget_sample,
    )

    rows = (
        [(i, "web", 100) for i in range(400)]          # 40k tokens
        + [(1000 + i, "code", 500) for i in range(100)]  # 50k tokens
        + [(2000 + i, "junk", 10) for i in range(50)]
    )
    df = spark.createDataFrame(rows, "doc_id long, domain string, n_tokens int")
    out = token_budget_sample(
        df, "domain", "n_tokens", budgets={"web": 10_000, "code": 25_000}
    )
    got = {
        r["domain"]: r["t"]
        for r in out.groupBy("domain")
        .agg(F.sum("n_tokens").alias("t"))
        .collect()
    }
    # junk has no budget -> dropped entirely
    assert set(got) == {"web", "code"}
    # expected kept tokens ~ budget (docs are sampled, so +/- sampling
    # noise; tolerance = 4 sigma of the binomial token sum)
    assert abs(got["web"] - 10_000) < 4_000, got
    assert abs(got["code"] - 25_000) < 10_000, got
    # under-budget domain keeps everything
    out2 = token_budget_sample(
        df, "domain", "n_tokens", budgets={"web": 10_000_000}
    )
    assert out2.count() == 400
    # deterministic
    a = sorted(r["doc_id"] for r in out.collect())
    b = sorted(
        r["doc_id"]
        for r in token_budget_sample(
            df, "domain", "n_tokens",
            budgets={"web": 10_000, "code": 25_000},
        ).collect()
    )
    assert a == b


def test_soft_quality_sample_null_and_zero_temperature(spark):
    from xmidt_event_streams_spark.operators.traindata import (
        soft_quality_sample,
    )

    df = spark.createDataFrame(
        [(1, 5.0), (2, None), (3, 5.0)], "doc_id long, score double"
    )
    kept = {r["doc_id"] for r in soft_quality_sample(df, "score").collect()}
    assert 2 not in kept          # null score: no probability -> dropped
    assert kept == {1, 3}         # high scores pass
    import pytest as _pytest

    with _pytest.raises(ValueError):
        soft_quality_sample(df, "score", temperature=0.0)
