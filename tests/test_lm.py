"""Behavioral tests for the learned quality gates: the bigram-LM
perplexity scorer (operators/lm.py) and the NB / logistic-regression
classifiers (operators/classifier.py).

Value-parity with DuckDB is pinned by the registry oracles
(lm_perplexity, nb_quality_scores in tests/test_oracle_parity.py);
these tests pin the MODEL behavior the oracle cannot see — ranking on
planted distributions, convergence, determinism — because the shared
testdata's languages deliberately share one vocabulary (lang is not
recoverable from content there).
"""

from __future__ import annotations
from tests.streamutil import await_stream

import random

import pytest
from pyspark.sql import functions as F

from xmidt_event_streams_spark.operators.classifier import (
    accuracy,
    hashed_features,
    logreg_fit,
    logreg_score,
    nb_fit,
    nb_score,
)
from xmidt_event_streams_spark.operators.lm import (
    lm_perplexity,
    ngram_lm_fit,
    perplexity_filter,
)

# -- planted corpora --------------------------------------------------

_CHAIN = ("alpha beta gamma delta epsilon zeta eta theta "
          "iota kappa lam mu").split()
_NOISE = "xq1 zk2 qv3 wj4 vv5 kz6 jx7 qq8".split()


def _chain_doc(rng: random.Random, n: int = 40) -> str:
    """High-predictability text: walk the chain, occasionally jump."""
    i = rng.randrange(len(_CHAIN))
    out = []
    for _ in range(n):
        out.append(_CHAIN[i])
        i = (i + 1) % len(_CHAIN) if rng.random() < 0.9 else rng.randrange(
            len(_CHAIN)
        )
    return " ".join(out)


def _gibberish_doc(rng: random.Random, n: int = 40) -> str:
    return " ".join(rng.choice(_NOISE) for _ in range(n))


def _shuffled_doc(rng: random.Random, n: int = 40) -> str:
    """In-vocabulary but order-destroyed: the subtler OOD case."""
    return " ".join(rng.choice(_CHAIN) for _ in range(n))


@pytest.fixture(scope="module")
def planted(spark):
    rng = random.Random(1234)
    train = [(i, _chain_doc(rng)) for i in range(60)]
    probe = (
        [(100 + i, _chain_doc(rng), "in") for i in range(10)]
        + [(200 + i, _shuffled_doc(rng), "shuffled") for i in range(10)]
        + [(300 + i, _gibberish_doc(rng), "noise") for i in range(10)]
    )
    train_df = spark.createDataFrame(train, "doc_id long, text string")
    probe_df = spark.createDataFrame(
        probe, "doc_id long, text string, kind string"
    )
    return train_df, probe_df


# -- LM ---------------------------------------------------------------


def test_lm_ranks_planted_distributions(spark, planted):
    train_df, probe_df = planted
    lm = ngram_lm_fit(train_df)
    scored = lm_perplexity(probe_df, lm).join(
        probe_df.select("doc_id", "kind"), "doc_id"
    )
    means = {
        r["kind"]: r["m"]
        for r in scored.groupBy("kind").agg(F.avg("ppl").alias("m")).collect()
    }
    # the gate-relevant ordering: in-distribution text scores far below
    # BOTH out-of-distribution kinds. (Add-alpha gives a fully-unseen
    # context exactly mass 1/V per token -- ppl(noise) == V -- while
    # wrong-order transitions in SEEN contexts divide by large seen
    # c_cnt, so shuffled scores even worse than alien vocabulary. A
    # backoff LM would reverse those two; the filter decision -- keep
    # "in", drop both -- is the same either way.)
    assert means["in"] < means["noise"] < means["shuffled"], means
    assert means["noise"] == pytest.approx(12.0)  # == train vocab size
    # and the gap is decisive at the doc level, not just on average
    worst_in = scored.filter(F.col("kind") == "in").agg(
        F.max("ppl")
    ).collect()[0][0]
    best_ood = scored.filter(F.col("kind") != "in").agg(
        F.min("ppl")
    ).collect()[0][0]
    assert worst_in < best_ood


def test_lm_short_docs_score_null(spark, planted):
    train_df, _ = planted
    lm = ngram_lm_fit(train_df)
    shorts = spark.createDataFrame(
        [(1, ""), (2, "alpha"), (3, "alpha beta")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in lm_perplexity(shorts, lm).collect()}
    assert rows[1]["n_bigrams"] == 0 and rows[1]["ppl"] is None
    assert rows[2]["n_bigrams"] == 0 and rows[2]["ppl"] is None
    assert rows[3]["n_bigrams"] == 1 and rows[3]["ppl"] is not None


def test_lm_broadcast_off_is_equivalent(spark, planted):
    train_df, probe_df = planted
    lm = ngram_lm_fit(train_df)
    a = sorted(
        map(tuple, lm_perplexity(probe_df, lm, broadcast_lm=True).collect())
    )
    b = sorted(
        map(tuple, lm_perplexity(probe_df, lm, broadcast_lm=False).collect())
    )
    assert a == b


def test_perplexity_filter_splits_without_loss(spark, planted):
    train_df, probe_df = planted
    lm = ngram_lm_fit(train_df)
    with_short = probe_df.unionByName(
        spark.createDataFrame(
            [(999, "solo", "short")], "doc_id long, text string, kind string"
        )
    )
    ceiling = 40.0
    kept, dropped = perplexity_filter(with_short, lm, max_ppl=ceiling)
    kept_ids = {r["doc_id"] for r in kept.select("doc_id").collect()}
    drop_ids = {r["doc_id"] for r in dropped.select("doc_id").collect()}
    all_ids = {r["doc_id"] for r in with_short.select("doc_id").collect()}
    assert kept_ids | drop_ids == all_ids
    assert kept_ids & drop_ids == set()
    assert 999 in drop_ids  # unscorable -> dropped, not lost
    assert kept.filter(F.col("ppl") > ceiling).count() == 0


# -- Naive Bayes ------------------------------------------------------


@pytest.fixture(scope="module")
def labeled(spark):
    rng = random.Random(99)
    rows = []
    for i in range(40):
        rows.append((i, _chain_doc(rng, 30), True))
    for i in range(40, 80):
        rows.append((i, _gibberish_doc(rng, 30), False))
    return spark.createDataFrame(rows, "doc_id long, text string, label boolean")


def test_nb_separates_planted(spark, labeled):
    model = nb_fit(labeled, label_col="label")
    scored = nb_score(labeled, model).join(
        labeled.select("doc_id", "label"), "doc_id"
    )
    wrong = scored.filter(F.col("pred") != F.col("label")).count()
    assert wrong == 0


def test_nb_handles_unseen_and_empty(spark, labeled):
    model = nb_fit(labeled, label_col="label")
    oov = spark.createDataFrame(
        [(1, "totallynew unseenword"), (2, "")], "doc_id long, text string"
    )
    rows = {r["doc_id"]: r for r in nb_score(oov, model).collect()}
    # unseen-only doc: finite score via w_oov, no nulls
    assert rows[1]["score"] is not None
    assert rows[1]["n_terms"] == 2
    # empty doc scores the bare prior (classes balanced -> ln(1) = 0)
    assert rows[2]["n_terms"] == 0
    assert rows[2]["score"] == pytest.approx(0.0, abs=1e-9)


# -- hashed-feature logistic regression -------------------------------


def test_hashed_features_shape(spark, labeled):
    dim = 64
    feats = hashed_features(labeled, dim=dim)
    # bias present for every doc, at idx == dim
    assert feats.filter(F.col("idx") == dim).count() == labeled.count()
    # token features L1-normalize to 1 per non-empty doc
    sums = (
        feats.filter(F.col("idx") < dim)
        .groupBy("doc_id")
        .agg(F.sum("x").alias("s"))
        .collect()
    )
    assert all(abs(r["s"] - 1.0) < 1e-9 for r in sums)
    assert feats.filter((F.col("idx") < 0) | (F.col("idx") > dim)).count() == 0


def test_logreg_converges_separates_deterministic(spark, labeled):
    dim = 64
    feats = hashed_features(labeled, dim=dim).persist()
    labels = labeled.select("doc_id", "label")
    try:
        w1, losses = logreg_fit(feats, labels, dim=dim, iters=16, lr=3.0)
        # full-batch GD at a safe lr: loss decreases EVERY iteration
        # (losses[i] is measured before update i, so the last update's
        # gain isn't in the list -- hence monotonicity + halving-ish,
        # not an exact endpoint)
        assert all(a > b for a, b in zip(losses, losses[1:])), losses
        assert losses[-1] < losses[0] * 0.55, losses
        acc = accuracy(logreg_score(feats, w1), labels)
        assert acc >= 0.95, acc
        # replayable up to reduce-order float drift (sums over shuffled
        # partitions commute only approximately)
        w2, _ = logreg_fit(feats, labels, dim=dim, iters=16, lr=3.0)
        assert max(abs(a - b) for a, b in zip(w1, w2)) < 1e-6
    finally:
        feats.unpersist()


# -- gate protocol: chaining + streaming composition ------------------


def test_chain_gates_attributes_first_reason(spark, planted, labeled):
    from xmidt_event_streams_spark.corpus import chain_gates
    from xmidt_event_streams_spark.operators.classifier import (
        nb_fit,
        nb_quality_gate,
    )
    from xmidt_event_streams_spark.operators.lm import lm_quality_gate

    train_df, probe_df = planted
    lm = ngram_lm_fit(train_df)
    nb = nb_fit(labeled, label_col="label")
    gate = chain_gates(
        lm_quality_gate(lm, max_ppl=11.0),
        nb_quality_gate(nb),
    )
    passing, failing = gate(probe_df.drop("kind"))
    pass_ids = {r["doc_id"] for r in passing.select("doc_id").collect()}
    reasons = {
        r["doc_id"]: r["reject_reason"]
        for r in failing.select("doc_id", "reject_reason").collect()
    }
    assert pass_ids == set(range(100, 110))  # in-dist only
    # the LM ceiling fires first for every OOD doc (short-circuit
    # order); the NB gate never sees them
    assert set(reasons) == set(range(200, 210)) | set(range(300, 310))
    assert set(reasons.values()) == {"lm_perplexity"}
    assert pass_ids.isdisjoint(reasons)


def test_streaming_ingest_with_lm_gate(spark, tmp_path, planted):
    """start_ingest_dedup(quality=<callable>): the CCNet gate runs
    inside each micro-batch; OOD docs land in rejects with
    reject_reason='lm_perplexity' and never touch the index."""
    import json as _json
    import random

    from xmidt_event_streams_spark.operators.incremental import (
        incremental_dedup_mark,
        init_minhash_index,
    )
    from xmidt_event_streams_spark.operators.lm import lm_quality_gate
    from xmidt_event_streams_spark.streaming.ingest_dedup import (
        start_ingest_dedup,
    )

    train_df, _ = planted
    lm = ngram_lm_fit(train_df)
    rng = random.Random(5)

    idx = str(tmp_path / "index")
    corpus_out = str(tmp_path / "corpus")
    rejects_out = str(tmp_path / "rejects")
    init_minhash_index(spark, idx, id_type="bigint")

    src = tmp_path / "in"
    src.mkdir()
    rows = [
        (1, _chain_doc(rng)),
        (2, _gibberish_doc(rng)),  # ppl == V -> gate reject
        (3, _chain_doc(rng)),
    ]
    with open(src / "b1.json", "w") as f:
        for doc_id, text in rows:
            f.write(_json.dumps({"doc_id": doc_id, "text": text}) + "\n")

    stream = spark.readStream.schema("doc_id long, text string").json(str(src))
    # min_agreement=0.95: chain docs legitimately share shingles (the
    # same 12-token walk), so the default 0.5 near-dup tier flags doc 3
    # as a near-dup of doc 1 -- correct dedup behavior, but this test
    # isolates the LM gate, so only exact-ish dups may reject here
    q = start_ingest_dedup(
        stream, idx, corpus_out, rejects_out,
        checkpoint_dir=str(tmp_path / "ckpt"),
        quality=lm_quality_gate(lm, max_ppl=11.0),
        min_agreement=0.95,
        availableNow=True,
    )
    await_stream(q, 300)

    kept = {r["doc_id"] for r in spark.read.parquet(corpus_out).collect()}
    rej = {
        r["doc_id"]: r["reject_reason"]
        for r in spark.read.parquet(rejects_out).collect()
    }
    assert kept == {1, 3}
    assert rej == {2: "lm_perplexity"}
    # the gated-out doc never entered the index
    probe = spark.createDataFrame(
        [(900, rows[1][1])], "doc_id long, text string"
    )
    assert incremental_dedup_mark(spark, idx, probe).collect()[0]["is_unique"]


# -- multiclass NB (domain tagging) -----------------------------------


def _third_doc(rng, n=30):
    vocab = "red blue green cyan pink onyx teal ruby".split()
    return " ".join(rng.choice(vocab) for _ in range(n))


@pytest.fixture(scope="module")
def three_domains(spark):
    rng = random.Random(17)
    rows = (
        [(i, _chain_doc(rng, 30), "chain") for i in range(30)]
        + [(100 + i, _gibberish_doc(rng, 30), "noise") for i in range(30)]
        + [(200 + i, _third_doc(rng), "color") for i in range(30)]
    )
    return spark.createDataFrame(
        rows, "doc_id long, text string, domain string"
    )


def test_multiclass_nb_tags_domains(spark, three_domains):
    from xmidt_event_streams_spark.operators.classifier import (
        nb_multiclass_fit,
        nb_multiclass_score,
    )

    model = nb_multiclass_fit(three_domains, label_col="domain")
    scored = nb_multiclass_score(three_domains, model).join(
        three_domains.select("doc_id", "domain"), "doc_id"
    )
    assert scored.count() == 90
    wrong = scored.filter(F.col("pred") != F.col("domain")).count()
    assert wrong == 0
    # held-out docs from each distribution tag correctly too
    rng = random.Random(18)
    probe = spark.createDataFrame(
        [(1, _chain_doc(rng, 25)), (2, _gibberish_doc(rng, 25)),
         (3, _third_doc(rng, 25))],
        "doc_id long, text string",
    )
    preds = {
        r["doc_id"]: r["pred"]
        for r in nb_multiclass_score(probe, model).collect()
    }
    assert preds == {1: "chain", 2: "noise", 3: "color"}


def test_multiclass_nb_empty_doc_takes_max_prior(spark, three_domains):
    from xmidt_event_streams_spark.operators.classifier import (
        nb_multiclass_fit,
        nb_multiclass_score,
    )

    # skew priors: drop most of one class
    skewed = three_domains.filter(
        (F.col("domain") != "noise") | (F.col("doc_id") < 105)
    )
    model = nb_multiclass_fit(skewed, label_col="domain")
    out = nb_multiclass_score(
        spark.createDataFrame([(9, "")], "doc_id long, text string"), model
    ).collect()[0]
    # equal-size chain/color, tiny noise: tie between chain/color
    # breaks lexicographically -> 'chain'
    assert out["pred"] == "chain"
    assert out["score"] is not None


def test_multiclass_nb_binary_agrees_with_nb_fit(spark, labeled):
    """k=2 multiclass argmax == binary log-odds sign (same alpha,
    same shared-V smoothing)."""
    from xmidt_event_streams_spark.operators.classifier import (
        nb_multiclass_fit,
        nb_multiclass_score,
    )

    two = labeled.withColumn(
        "cls", F.when(F.col("label"), F.lit("pos")).otherwise(F.lit("neg"))
    )
    mc = nb_multiclass_fit(two, label_col="cls")
    bi = nb_fit(labeled, label_col="label")
    joined = (
        nb_multiclass_score(two, mc)
        .withColumnRenamed("pred", "mc_pred")
        .join(nb_score(labeled, bi).select("doc_id", "pred"), "doc_id")
    )
    disagree = joined.filter(
        (F.col("mc_pred") == "pos") != F.col("pred")
    ).count()
    assert disagree == 0


# -- stupid backoff ---------------------------------------------------


def test_backoff_restores_ccnet_ordering(spark, planted):
    """With stupid backoff, reordered in-vocab text scores BETTER than
    alien vocabulary (add-alpha inverts those two -- see
    test_lm_ranks_planted_distributions); in-distribution still wins."""
    train_df, probe_df = planted
    lm = ngram_lm_fit(train_df, backoff=0.4)
    means = {
        r["kind"]: r["m"]
        for r in lm_perplexity(probe_df, lm)
        .join(probe_df.select("doc_id", "kind"), "doc_id")
        .groupBy("kind")
        .agg(F.avg("ppl").alias("m"))
        .collect()
    }
    assert means["in"] < means["shuffled"] < means["noise"], means


def test_backoff_seen_bigrams_score_mle(spark):
    """Seen bigrams score raw MLE count(c,w)/count(c); unseen fall to
    the discounted unigram mass."""
    train = spark.createDataFrame(
        [(1, "a b a b a c")], "doc_id long, text string"
    )
    lm = ngram_lm_fit(train, alpha=1.0, backoff=0.4)
    import math

    probe = spark.createDataFrame([(9, "a b")], "doc_id long, text string")
    ppl = lm_perplexity(probe, lm).collect()[0]["ppl"]
    # P(b|a) = 2/3 exactly (bigrams: ab,ba,ab,ba,ac -> a: b=2,c=1)
    assert ppl == pytest.approx(round(math.exp(-round(math.log(2 / 3), 6)), 4))

    oov = spark.createDataFrame([(9, "a zzz")], "doc_id long, text string")
    ppl2 = lm_perplexity(oov, lm).collect()[0]["ppl"]
    # S(zzz|a) = 0.4 * (0 + 1) / (6 + 1*3): N=6 tokens, V=3 types
    assert ppl2 == pytest.approx(
        round(math.exp(-round(math.log(0.4 * 1 / 9), 6)), 4)
    )


def test_backoff_matches_duckdb_twin(spark):
    """Full backoff scoring replayed in SQL over planted multi-doc
    data -- the oracle-expressibility claim, pinned."""
    import duckdb
    import pandas as pd

    rng = random.Random(21)
    train_rows = [(i, _chain_doc(rng, 20)) for i in range(20)]
    probe_rows = (
        [(100 + i, _chain_doc(rng, 15)) for i in range(5)]
        + [(200 + i, _gibberish_doc(rng, 15)) for i in range(5)]
        + [(300, "alpha"), (301, "")]
    )
    train = spark.createDataFrame(train_rows, "doc_id long, text string")
    probe = spark.createDataFrame(probe_rows, "doc_id long, text string")
    lm = ngram_lm_fit(train, backoff=0.4)
    got = sorted(map(tuple, lm_perplexity(probe, lm).collect()))

    con = duckdb.connect()
    con.register("train", pd.DataFrame(train_rows, columns=["doc_id", "text"]))
    con.register("probe", pd.DataFrame(probe_rows, columns=["doc_id", "text"]))
    want = sorted(
        tuple(r)
        for r in con.execute(
            """
WITH tw AS (
  SELECT list_filter(string_split(trim(regexp_replace(lower(text),
    '[ \t\n\x0B\f\r]+', ' ', 'g')), ' '), t -> t <> '') AS w FROM train
),
pw AS (
  SELECT doc_id, list_filter(string_split(trim(regexp_replace(lower(text),
    '[ \t\n\x0B\f\r]+', ' ', 'g')), ' '), t -> t <> '') AS w FROM probe
),
tbg AS (SELECT unnest(w[1:len(w)-1]) AS c, unnest(w[2:len(w)]) AS t FROM tw),
cw AS (SELECT c, t, count(*) AS cw_cnt FROM tbg GROUP BY 1, 2),
ctx AS (SELECT c, sum(cw_cnt) AS c_cnt FROM cw GROUP BY 1),
uni AS (SELECT tok AS t, count(*) AS w_cnt
        FROM (SELECT unnest(w) AS tok FROM tw) GROUP BY 1),
v AS (SELECT count(DISTINCT tok) AS vs, count(*) AS nt
      FROM (SELECT unnest(w) AS tok FROM tw)),
pbg AS (SELECT doc_id, unnest(w[1:len(w)-1]) AS c, unnest(w[2:len(w)]) AS t
        FROM pw),
sc AS (
  SELECT p.doc_id,
    ln(CASE WHEN cw.cw_cnt IS NOT NULL
         THEN cw.cw_cnt / CAST(ctx.c_cnt AS DOUBLE)
         ELSE 0.4 * (coalesce(uni.w_cnt, 0) + CAST(1.0 AS DOUBLE))
              / (v.nt + CAST(1.0 AS DOUBLE) * v.vs) END) AS lp
  FROM pbg p
  LEFT JOIN cw ON p.c = cw.c AND p.t = cw.t
  LEFT JOIN ctx ON p.c = ctx.c
  LEFT JOIN uni ON p.t = uni.t
  CROSS JOIN v
),
agg AS (SELECT doc_id, count(*) AS nb,
        round(exp(-round(avg(lp), 6)), 4) AS ppl FROM sc GROUP BY 1)
SELECT pr.doc_id, CAST(coalesce(nb, 0) AS BIGINT) AS n_bigrams, ppl
FROM probe pr LEFT JOIN agg ON pr.doc_id = agg.doc_id
"""
        ).fetchall()
    )
    con.close()
    assert got == want


def test_gate_report_calibration(spark, labeled, planted):
    from xmidt_event_streams_spark.operators.classifier import gate_report
    from xmidt_event_streams_spark.operators.lm import lm_quality_gate

    train_df, _ = planted
    lm = ngram_lm_fit(train_df)
    rep = gate_report(lm_quality_gate(lm, max_ppl=11.0), labeled)
    # chain docs (label True) pass the ceiling, gibberish fails
    assert rep["tp"] == 40 and rep["tn"] == 40
    assert rep["fp"] == 0 and rep["fn"] == 0
    assert rep["precision"] == 1.0 and rep["recall"] == 1.0
    assert rep["keep_rate"] == 0.5


# -- order-n (trigram) ------------------------------------------------


def test_trigram_exact_closed_form(spark):
    import math

    train = spark.createDataFrame(
        [(1, "a b c a b c a b d")], "doc_id long, text string"
    )
    lm = ngram_lm_fit(train, n=3)
    assert lm.n == 3
    probe = spark.createDataFrame([(9, "a b c")], "doc_id long, text string")
    row = lm_perplexity(probe, lm).collect()[0]
    # trigrams: "a b"->c x2, "b c"->a x2, "c a"->b x2, "a b"->d x1
    # P(c | "a b") = (2 + 1) / (3 + 1*4): ctx "a b" count 3, V=4 types
    assert row["n_bigrams"] == 1  # column name is historical; 1 trigram
    assert row["ppl"] == pytest.approx(
        round(math.exp(-round(math.log(3 / 7), 6)), 4)
    )


def test_trigram_backoff_ordering(spark, planted):
    train_df, probe_df = planted
    lm = ngram_lm_fit(train_df, backoff=0.4, n=3)
    means = {
        r["kind"]: r["m"]
        for r in lm_perplexity(probe_df, lm)
        .join(probe_df.select("doc_id", "kind"), "doc_id")
        .groupBy("kind")
        .agg(F.avg("ppl").alias("m"))
        .collect()
    }
    assert means["in"] < means["shuffled"] < means["noise"], means
    # measured property worth pinning: under SINGLE-LEVEL backoff the
    # trigram's reorder penalty is SOFTER than the bigram's (shuffled
    # text's 3-token contexts are mostly unseen, so they fall through
    # to reasonable unigram mass, while the bigram arm scores wrong
    # transitions against large SEEN-context denominators). The order
    # knob buys in-distribution sharpness, not a bigger OOD gap — a
    # full recursive backoff chain would be needed for that.
    bi = ngram_lm_fit(train_df, backoff=0.4, n=2)
    bi_means = {
        r["kind"]: r["m"]
        for r in lm_perplexity(probe_df, bi)
        .join(probe_df.select("doc_id", "kind"), "doc_id")
        .groupBy("kind")
        .agg(F.avg("ppl").alias("m"))
        .collect()
    }
    assert (means["shuffled"] / means["in"]) < (
        bi_means["shuffled"] / bi_means["in"]
    )


def test_order_validation(spark, planted):
    train_df, _ = planted
    with pytest.raises(ValueError):
        ngram_lm_fit(train_df, n=1)


def test_lm_save_load_roundtrip(spark, planted, tmp_path):
    from xmidt_event_streams_spark.operators.lm import load_lm, save_lm

    train_df, probe_df = planted
    for kwargs in ({}, {"backoff": 0.4, "n": 3}):
        lm = ngram_lm_fit(train_df, **kwargs)
        path = str(tmp_path / f"lm_{kwargs.get('n', 2)}")
        save_lm(lm, path)
        back = load_lm(spark, path)
        assert (back.alpha, back.backoff, back.n) == (
            lm.alpha, lm.backoff, lm.n
        )
        a = sorted(map(tuple, lm_perplexity(probe_df, lm).collect()))
        b = sorted(map(tuple, lm_perplexity(probe_df, back).collect()))
        assert a == b

    with pytest.raises(ValueError):
        load_lm(spark, str(tmp_path / "nowhere"))


def test_min_count_pruning(spark):
    """Count pruning drops rare n-gram TYPES while context mass keeps
    surviving probabilities unchanged; pruned types score through the
    smoothing mass."""
    import math

    train = spark.createDataFrame(
        [(1, "a b a b a b a c")], "doc_id long, text string"
    )  # bigrams: ab x3(+...), ba x3, ac x1 -> "a c" is the singleton
    full = ngram_lm_fit(train)
    pruned = ngram_lm_fit(train, min_count=2)
    assert pruned.ngram_counts.count() < full.ngram_counts.count()

    # surviving bigram "a b": identical probability in both models
    probe = spark.createDataFrame([(9, "a b")], "doc_id long, text string")
    same = [
        lm_perplexity(probe, m).collect()[0]["ppl"] for m in (full, pruned)
    ]
    assert same[0] == same[1]

    # pruned singleton "a c": falls to smoothing mass (higher ppl than
    # in the full model, where it scored its own count)
    probe2 = spark.createDataFrame([(9, "a c")], "doc_id long, text string")
    ppl_full = lm_perplexity(probe2, full).collect()[0]["ppl"]
    ppl_pruned = lm_perplexity(probe2, pruned).collect()[0]["ppl"]
    assert ppl_pruned > ppl_full
    # denominator unchanged: P_pruned(c|a) = alpha/(c_cnt + alpha*V)
    # with c_cnt still 4 (a's full mass) and V = 3
    assert ppl_pruned == pytest.approx(
        round(math.exp(-round(math.log(1 / 7), 6)), 4)
    )


def test_nb_save_load_roundtrip(spark, labeled, tmp_path):
    from xmidt_event_streams_spark.operators.classifier import (
        load_nb,
        save_nb,
    )

    model = nb_fit(labeled, label_col="label")
    save_nb(model, str(tmp_path / "nb"))
    back = load_nb(spark, str(tmp_path / "nb"))
    assert back.alpha == model.alpha
    a = sorted(map(tuple, nb_score(labeled, model).collect()))
    b = sorted(map(tuple, nb_score(labeled, back).collect()))
    assert a == b
    with pytest.raises(ValueError):
        load_nb(spark, str(tmp_path / "missing"))


def test_multiclass_nb_save_load_and_kind_guard(spark, three_domains, tmp_path):
    from xmidt_event_streams_spark.operators.classifier import (
        load_nb,
        load_nb_multiclass,
        nb_multiclass_fit,
        nb_multiclass_score,
        save_nb_multiclass,
    )

    model = nb_multiclass_fit(three_domains, label_col="domain")
    save_nb_multiclass(model, str(tmp_path / "mc"))
    back = load_nb_multiclass(spark, str(tmp_path / "mc"))
    a = sorted(map(tuple, nb_multiclass_score(three_domains, model).collect()))
    b = sorted(map(tuple, nb_multiclass_score(three_domains, back).collect()))
    assert a == b
    # kind tags: a multiclass artifact refuses to load as binary
    with pytest.raises(ValueError):
        load_nb(spark, str(tmp_path / "mc"))


def test_streaming_gate_from_loaded_artifact(spark, tmp_path, planted):
    """The restart-realistic shape: fit + save in one 'process', load
    + gate the stream in another -- no refit, the artifact drives
    start_ingest_dedup directly."""
    import json as _json
    import random

    from xmidt_event_streams_spark.operators.incremental import (
        init_minhash_index,
    )
    from xmidt_event_streams_spark.operators.lm import (
        lm_quality_gate,
        load_lm,
        save_lm,
    )
    from xmidt_event_streams_spark.streaming.ingest_dedup import (
        start_ingest_dedup,
    )

    train_df, _ = planted
    save_lm(ngram_lm_fit(train_df, backoff=0.4), str(tmp_path / "model"))

    loaded = load_lm(spark, str(tmp_path / "model"))
    rng = random.Random(61)
    src = tmp_path / "in"
    src.mkdir()
    with open(src / "b.json", "w") as f:
        for i, t in [(1, _chain_doc(rng)), (2, _gibberish_doc(rng))]:
            f.write(_json.dumps({"doc_id": i, "text": t}) + "\n")
    idx = str(tmp_path / "idx")
    init_minhash_index(spark, idx, id_type="bigint")
    q = start_ingest_dedup(
        spark.readStream.schema("doc_id long, text string").json(str(src)),
        idx, str(tmp_path / "corpus"), str(tmp_path / "rej"),
        checkpoint_dir=str(tmp_path / "ck"),
        quality=lm_quality_gate(loaded, max_ppl=11.0),
        min_agreement=0.95,
        availableNow=True,
    )
    await_stream(q, 300)
    kept = {r["doc_id"] for r in spark.read.parquet(str(tmp_path / "corpus")).collect()}
    rej = {
        r["doc_id"]: r["reject_reason"]
        for r in spark.read.parquet(str(tmp_path / "rej")).collect()
    }
    assert kept == {1} and rej == {2: "lm_perplexity"}


def test_gate_report_calibrates_dsir_gate(spark, labeled):
    """The third learned gate ships the same pre-deployment evidence
    as LM/NB: gate_report over dsir_quality_gate on planted target
    (label=True) vs off-target docs. The model is fit labeled
    (target = the True slice), so in-distribution docs carry positive
    log-weights and gibberish negative; a 0.0 floor separates them."""
    from xmidt_event_streams_spark.operators.classifier import gate_report
    from xmidt_event_streams_spark.operators.dsir import (
        dsir_fit_labeled,
        dsir_log_weights,
        dsir_quality_gate,
    )

    model = dsir_fit_labeled(labeled, "label", dim=512)
    # calibration pass: pick the floor from the scored distribution
    # (the documented batch-calibration workflow), then report
    scored = dsir_log_weights(labeled, model).join(
        labeled.select("doc_id", "label"), "doc_id"
    )
    mins = {
        r["label"]: (r["lo"], r["hi"])
        for r in scored.groupBy("label")
        .agg(F.min("log_w").alias("lo"), F.max("log_w").alias("hi"))
        .collect()
    }
    # planted separation: every target doc above every off-target doc
    assert mins[True][0] > mins[False][1]
    floor = (mins[True][0] + mins[False][1]) / 2
    rep = gate_report(dsir_quality_gate(model, min_log_w=floor), labeled)
    assert rep["tp"] == 40 and rep["tn"] == 40
    assert rep["fp"] == 0 and rep["fn"] == 0
    assert rep["precision"] == 1.0 and rep["recall"] == 1.0
    assert rep["keep_rate"] == 0.5
