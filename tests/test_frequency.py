"""Exact heavy hitters (operators/frequency.py): the candidate set is
bounded AND a guaranteed superset, the verified output is exactly the
naive full-shuffle answer, and the merge rule keeps the Misra-Gries
undercount bound. The corpus here has real summary pressure: far more
distinct tokens than counters, so the MG decrement path actually runs
(unlike the tiny-vocabulary documents table the registry query uses)."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from xmidt_event_streams_spark.functions.text import tokens
from xmidt_event_streams_spark.operators.frequency import (
    _merge_mg,
    frequent_candidates,
    frequent_ngrams_exact,
    frequent_tokens_exact,
)


@pytest.fixture(scope="module")
def tail_corpus(spark):
    """60 docs; 'common' in every doc, 'shared' in half, and a long
    tail of doc-unique tokens (u{i}a..u{i}h) so distinct tokens
    (~480) far exceed the MG summary (s=40 at phi=0.05)."""
    rows = [
        (
            i,
            "common "
            + ("shared " if i % 2 == 0 else "")
            + " ".join(f"u{i}{c}" for c in "abcdefgh"),
        )
        for i in range(60)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _naive(df, phi):
    toks = df.select(F.explode(tokens("text")).alias("tok"))
    total = toks.count()
    return sorted(
        (r["tok"], r["cnt"], total)
        for r in toks.groupBy("tok")
        .agg(F.count("*").alias("cnt"))
        .filter(F.col("cnt") >= phi * total)
        .collect()
    )


def test_exact_equals_naive_under_summary_pressure(spark, tail_corpus):
    phi = 0.05
    got = sorted(
        tuple(r) for r in frequent_tokens_exact(tail_corpus, phi).collect()
    )
    assert got == _naive(tail_corpus, phi)
    assert [t for t, _, _ in got] == ["common", "shared"]


def test_candidates_bounded_and_superset(spark, tail_corpus):
    s = 40
    # 2 partitions -> ~240 distinct tokens per partition, far over the
    # 40 counters: the decrement path must actually prune
    toks = tail_corpus.select(
        F.explode(tokens("text")).alias("tok")
    ).coalesce(2)
    cand = frequent_candidates(toks, s)
    n_cand = cand.count()
    n_parts = toks.rdd.getNumPartitions()
    assert n_cand <= s * n_parts
    assert n_cand < toks.select("tok").distinct().count()  # real pruning
    got = {r["tok"] for r in cand.collect()}
    assert {"common", "shared"} <= got  # the guarantee: no heavy miss


def test_merge_rule_undercount_bound():
    """Feeding a stream through batch merges never undercounts any
    item by more than N/(s+1) (the mergeable-summaries bound)."""
    s = 4
    stream = (
        ["hot"] * 50 + ["warm"] * 20 + [f"t{i}" for i in range(40)]
    )
    summary: dict = {}
    for i in range(0, len(stream), 7):  # uneven batches
        batch = pd.Series(stream[i : i + 7]).value_counts()
        summary = _merge_mg(summary, batch, s)
    n = len(stream)
    assert summary["hot"] >= 50 - n / (s + 1)
    assert summary["warm"] >= 20 - n / (s + 1)
    assert len(summary) <= s + 1


def test_frequent_ngrams_boilerplate(spark):
    rows = [
        (i, f"all rights reserved unique{i} filler{i} words{i}")
        for i in range(20)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["ngram"]: r["cnt"]
        for r in frequent_ngrams_exact(df, n=2, phi=0.1).collect()
    }
    assert got == {"all rights": 20, "rights reserved": 20}


def test_phi_validation(spark, tail_corpus):
    with pytest.raises(ValueError, match="phi"):
        frequent_tokens_exact(tail_corpus, 0.0)
    with pytest.raises(ValueError, match="phi"):
        frequent_ngrams_exact(tail_corpus, phi=1.5)


# -- properties (hypothesis): the merge rule's bound on ANY stream ----

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=150, deadline=None)
@given(
    stream=st.lists(st.integers(min_value=0, max_value=30), max_size=400),
    s=st.integers(min_value=2, max_value=12),
    batch=st.integers(min_value=1, max_value=50),
)
def test_merge_mg_properties(stream, s, batch):
    """For ANY stream, batching, and summary size: (a) the summary
    never exceeds s+1 entries, (b) no estimate overcounts, (c) no
    item is undercounted by more than N/(s+1) -- so every item with
    true count > N/(s+1) is present."""
    from collections import Counter

    toks = [f"t{i}" for i in stream]
    summary: dict = {}
    for i in range(0, len(toks), batch):
        summary = _merge_mg(
            summary, pd.Series(toks[i : i + batch]).value_counts(), s
        )
    true = Counter(toks)
    n = len(toks)
    assert len(summary) <= s + 1
    for tok, est in summary.items():
        assert est <= true[tok]
    for tok, cnt in true.items():
        assert summary.get(tok, 0) >= cnt - n / (s + 1)


# -- frequency drift --------------------------------------------------


def test_token_drift_stable_and_shifted(spark, tmp_path, tail_corpus):
    from xmidt_event_streams_spark.operators.frequency import (
        save_token_baseline,
        token_drift,
    )

    base = str(tmp_path / "freq_base")
    info = save_token_baseline(tail_corpus, base, phi=0.05)
    assert info["n_tokens"] == 2 and info["total"] > 0

    same = token_drift(spark, base, tail_corpus)
    assert same["verdict"] == "stable" and same["psi"] < 0.01

    shifted_corpus = spark.createDataFrame(
        [(i, "entirely different boilerplate inventory here") for i in range(60)],
        "doc_id long, text string",
    )
    moved = token_drift(spark, base, shifted_corpus)
    assert moved["verdict"] == "shifted"
    assert moved["psi"] > same["psi"]


def test_token_drift_requires_baseline_sidecar(spark, tmp_path, tail_corpus):
    from xmidt_event_streams_spark.operators.frequency import token_drift

    plain = str(tmp_path / "plain")
    tail_corpus.write.parquet(plain)
    with pytest.raises(ValueError, match="frequency-baseline sidecar"):
        token_drift(spark, plain, tail_corpus)


def test_token_drift_in_maintenance_window(spark, tmp_path, tail_corpus):
    from xmidt_event_streams_spark.maintenance import run_maintenance
    from xmidt_event_streams_spark.operators.frequency import (
        save_token_baseline,
    )

    base = str(tmp_path / "freq_base")
    corpus_path = str(tmp_path / "corpus")
    save_token_baseline(tail_corpus, base, phi=0.05)
    tail_corpus.write.parquet(corpus_path)
    report = run_maintenance(
        spark, token_baselines=((base, corpus_path),)
    )
    assert report[base]["kind"] == "token_drift"
    assert report[base]["verdict"] == "stable"
