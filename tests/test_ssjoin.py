"""Exact prefix-filtered set-similarity join (operators/ssjoin.py).

The operator's exactness contract is tested three ways: brute-force
parity on real corpora, a Python-set oracle over adversarial random
set collections (including float-boundary sizes like t=0.55/|x|=20
where an unslackened ceil() silently shortens the prefix), and
filter-losslessness (positional on == positional off). The candidate
budget guard and plan shape (no cartesian/BNLJ) are pinned separately.
"""

from __future__ import annotations

import itertools
import random

import pytest
from pyspark.sql import functions as F

from xmidt_event_streams_spark.operators.dedup import ngram_jaccard_pairs
from xmidt_event_streams_spark.operators.similarity import (
    CandidatePairBudgetExceeded,
)
from xmidt_event_streams_spark.operators.ssjoin import (
    jaccard_join,
    jaccard_join_sets,
)


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _python_oracle(sets: dict, t: float):
    """Brute-force all-pairs Jaccard >= t over Python sets."""
    out = set()
    for (ia, xa), (ib, xb) in itertools.combinations(sorted(sets.items()), 2):
        if not xa or not xb:
            continue
        j = len(xa & xb) / len(xa | xb)
        if j >= t:
            out.add((ia, ib, round(j, 6)))
    return out


@pytest.mark.parametrize("threshold", [0.3, 0.8])
def test_brute_parity_on_documents(spark, sf_dir, threshold):
    docs = _docs(spark, sf_dir)
    got = {
        (r.id_a, r.id_b, r.jaccard)
        for r in jaccard_join(docs, threshold, shingle_n=3).collect()
    }
    brute = {
        (r.id_a, r.id_b, r.jaccard)
        for r in ngram_jaccard_pairs(
            docs.withColumn("_one", F.lit(1)), ("_one",), shingle_n=3
        ).collect()
        if r.jaccard >= threshold
    }
    assert got == brute


@pytest.mark.parametrize(
    "threshold,seed",
    [(0.5, 1), (0.55, 2), (0.7, 3), (0.9, 4), (1.0, 5), (0.25, 6)],
)
def test_python_set_oracle_random_collections(spark, threshold, seed):
    """Adversarial random set collections vs a Python brute-force
    oracle. Sizes are drawn around the float-boundary regimes (20
    elements at t=0.55 puts t*|x| on 11.000000000000002; unslackened
    ceil() would shorten the prefix and drop true pairs). High overlap
    is planted so every threshold has pairs on BOTH sides of it."""
    rng = random.Random(seed)
    universe = [f"tok{i}" for i in range(60)]
    rows = []
    for i in range(80):
        size = rng.choice([3, 5, 10, 19, 20, 21, 40])
        rows.append((i, rng.sample(universe, size)))
    # planted near-identical families (jaccard near / at 1.0)
    base = rng.sample(universe, 20)
    for i in range(80, 90):
        s = list(base)
        if i % 2:
            s[0] = f"alt{i}"  # one-element swap: j = 19/21
        rows.append((i, s))
    df = spark.createDataFrame(rows, "doc_id int, sh array<string>")
    got = {
        (r.id_a, r.id_b, r.jaccard)
        for r in jaccard_join_sets(
            df, threshold, set_col="sh", id_col="doc_id"
        ).collect()
    }
    expected = _python_oracle({i: set(s) for i, s in rows}, threshold)
    assert got == expected


def test_positional_filter_is_lossless(spark, sf_dir):
    docs = _docs(spark, sf_dir).limit(200)
    on = {
        tuple(r)
        for r in jaccard_join(docs, 0.4, shingle_n=3, positional=True).collect()
    }
    off = {
        tuple(r)
        for r in jaccard_join(docs, 0.4, shingle_n=3, positional=False).collect()
    }
    assert on == off


def test_candidate_budget_raises_on_degenerate_corpus(spark):
    """Near-identical docs collapse even the rare-token prefixes into
    one bucket; the guard must raise the typed error with measured
    counts BEFORE the self-join, not OOM inside it."""
    rows = [(i, "alpha beta gamma delta epsilon zeta eta theta") for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    with pytest.raises(CandidatePairBudgetExceeded) as ei:
        jaccard_join(df, 0.5, shingle_n=2, max_candidate_pairs=100)
    assert ei.value.candidate_pairs > 100
    assert ei.value.budget == 100
    assert ei.value.hottest_cell_n > 1


def test_candidate_pruning_beats_all_pairs(spark, sf_dir):
    """On the corpus the registry query runs, prefix candidates are a
    small fraction of brute-force pairs: a budget two orders of
    magnitude under all-pairs (124,750 at 500 docs) must NOT trip."""
    docs = _docs(spark, sf_dir)
    out = jaccard_join(docs, 0.5, shingle_n=3, max_candidate_pairs=10_000)
    assert out.count() > 0  # guard passed AND true pairs found


def test_empty_and_degenerate_inputs(spark):
    rows = [
        (1, "a b c d"),
        (2, "a b c d"),  # identical -> jaccard 1.0
        (3, ""),  # empty set: never pairs
        (4, "zz"),  # single token -> zero bigrams
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = jaccard_join(df, 1.0, shingle_n=2).collect()
    assert [(r.id_a, r.id_b, r.jaccard) for r in got] == [(1, 2, 1.0)]


def test_threshold_validation(spark):
    df = spark.createDataFrame([(1, "a b")], "doc_id int, text string")
    with pytest.raises(ValueError):
        jaccard_join(df, 0.0)
    with pytest.raises(ValueError):
        jaccard_join(df, 1.5)


def test_plan_has_no_cartesian(spark, sf_dir):
    plan = jaccard_join(
        _docs(spark, sf_dir), 0.5, shingle_n=3
    )._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
