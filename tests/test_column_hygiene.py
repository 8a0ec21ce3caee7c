"""Internal-column hygiene: operators that join score/ledger columns
onto caller frames must not collide with (or silently drop) columns
the caller already owns — join-side names ride underscore-prefixed
and surface only on returned ledger frames."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_decontaminate_survives_caller_ledger_columns(spark):
    """A corpus that already carries 'corpus_id' / 'contaminated_by' /
    'agreement' columns: kept keeps them untouched; dropped carries
    the operator's ledger names (the caller's clashing columns are the
    price on the dropped ledger only, documented)."""
    from xmidt_event_streams_spark.operators.incremental import (
        decontaminate_near_dups,
    )

    corpus = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog today", 0.9),
            (2, "completely unrelated text about maritime navigation", 0.1),
        ],
        "doc_id long, text string, agreement double",
    )
    reference = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog today")],
        "doc_id long, text string",
    )
    kept, dropped = decontaminate_near_dups(corpus, reference, 0.5)
    k = kept.collect()
    assert [r["doc_id"] for r in k] == [2]
    # caller's own 'agreement' column survives on kept, value intact
    assert k[0]["agreement"] == 0.1
    d = dropped.collect()
    assert len(d) == 1 and d[0]["doc_id"] == 1
    assert d[0]["contaminated_by"] == 100


def test_lm_gate_survives_caller_ppl_column(spark):
    from xmidt_event_streams_spark.operators.lm import (
        lm_quality_gate,
        ngram_lm_fit,
    )

    train = spark.createDataFrame(
        [(i, "good clean text flows nicely here") for i in range(5)],
        "doc_id long, text string",
    )
    lm = ngram_lm_fit(train)
    batch = spark.createDataFrame(
        [
            (1, "good clean text flows nicely here", 42.0),
            (2, "zxq qqq vvv kkk jjj www", 7.0),
        ],
        "doc_id long, text string, ppl double",
    )
    keep, drop = lm_quality_gate(lm, max_ppl=3.0)(batch)
    krows = keep.collect()
    assert [r["doc_id"] for r in krows] == [1]
    # the batch's own 'ppl' column is preserved, not the score
    assert krows[0]["ppl"] == 42.0
    drows = drop.collect()
    assert [r["doc_id"] for r in drows] == [2]
    assert drows[0]["ppl"] == 7.0
    assert drows[0]["reject_reason"] == "lm_perplexity"


def test_logreg_bias_not_decayed(spark):
    """L2 must not shrink the intercept: on an imbalanced set with
    empty-ish features the fitted bias should push mean predicted
    probability toward the base rate; decaying it holds probabilities
    nearer 0.5. Assert the mean prediction tracks the 90% base rate."""
    from xmidt_event_streams_spark.operators.classifier import (
        hashed_features,
        logreg_fit,
        logreg_score,
    )

    rows = [(i, "common words shared by every doc", i < 18) for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id long, text string, label boolean")
    feats = hashed_features(df, dim=16).persist()
    try:
        w, _ = logreg_fit(
            feats, df.select("doc_id", "label"), dim=16, iters=24, l2=0.5
        )
        probs = [r["prob"] for r in logreg_score(feats, w).collect()]
        mean_prob = sum(probs) / len(probs)
        # base rate 0.9; with the bias free of decay the model reaches
        # it despite the heavy l2 on feature weights
        assert mean_prob > 0.8, mean_prob
    finally:
        feats.unpersist()
