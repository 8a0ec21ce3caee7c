"""DSIR importance resampling (operators/dsir.py) -- constructed-data
semantics plus sampling-law checks. Fit/score value parity vs DuckDB
is covered by the registry twin (``dsir_weights`` in
tests/test_oracle_parity.py)."""

import pytest
from pyspark.sql import functions as F

from xmidt_event_streams_spark.operators.dsir import (
    dsir_fit,
    dsir_log_weights,
    dsir_sample,
    hashed_ngram_buckets,
)

EN = [
    "the cat sat on the mat and the dog slept",
    "a quick brown fox jumps over the lazy dog",
    "the rain in spain stays mainly on the plain",
    "to be or not to be that is the question",
]
XX = [
    "zzq wvx qqp lmnop zzq fdsa qwerty zxcv",
    "qqp wvx zzq asdf zxcv poiuy fdsa lmnop",
    "blorp zint quux flarn blorp zint quux flarn",
    "xylo phon qrst uvwx xylo phon qrst uvwx",
]


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(i, t) for i, t in enumerate(EN + XX)]
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture(scope="module")
def scored(spark, docs):
    target = docs.filter(F.col("doc_id") < len(EN))
    model = dsir_fit(target, docs, dim=512)
    return dsir_log_weights(docs, model)


def test_buckets_are_unigrams_plus_bigrams(spark):
    df = spark.createDataFrame([("a b c",), ("solo",), ("",)], "text string")
    sizes = [
        r[0]
        for r in df.select(
            F.size(hashed_ngram_buckets("text", 64))
        ).collect()
    ]
    # 3 unigrams + 2 bigrams / 1 unigram + 0 bigrams / empty
    assert sizes == [5, 1, 0]


def test_target_like_docs_score_higher(scored):
    w = {r["doc_id"]: r["log_w"] for r in scored.collect()}
    en = [w[i] for i in range(len(EN))]
    xx = [w[i + len(EN)] for i in range(len(XX))]
    assert min(en) > max(xx), (en, xx)


def test_labeled_fit_equals_two_pass_fit(spark, docs):
    from xmidt_event_streams_spark.operators.dsir import dsir_fit_labeled

    two = dsir_fit(docs.filter(F.col("doc_id") < len(EN)), docs, dim=256)
    one = dsir_fit_labeled(
        docs.withColumn("_t", F.col("doc_id") < len(EN)), "_t", dim=256
    )
    a = dict(dsir_log_weights(docs, two).select("doc_id", "log_w").collect())
    b = dict(dsir_log_weights(docs, one).select("doc_id", "log_w").collect())
    assert a == b


def test_scores_invariant_to_partitioning(spark, docs, scored):
    target = docs.filter(F.col("doc_id") < len(EN))
    model = dsir_fit(
        target.repartition(7), docs.repartition(5), dim=512
    )
    relaid = dsir_log_weights(docs.repartition(11), model)
    want = {r["doc_id"]: r["log_w"] for r in scored.collect()}
    assert {r["doc_id"]: r["log_w"] for r in relaid.collect()} == want


def test_empty_doc_scores_zero(spark):
    docs = spark.createDataFrame(
        [(0, "the cat"), (1, "")], "doc_id long, text string"
    )
    model = dsir_fit(docs.filter("doc_id = 0"), docs, dim=64)
    got = {
        r["doc_id"]: (r["n_feats"], r["log_w"])
        for r in dsir_log_weights(docs, model).collect()
    }
    assert got[1] == (0, 0.0)
    assert got[0][0] == 3  # 2 unigrams + 1 bigram


def test_sample_k_is_deterministic_and_weight_biased(scored):
    a = {r["doc_id"] for r in dsir_sample(scored, k=4, seed="s1").collect()}
    b = {r["doc_id"] for r in dsir_sample(scored, k=4, seed="s1").collect()}
    assert a == b and len(a) == 4
    # near the temperature->0 limit, Gumbel noise is negligible and
    # selection collapses to deterministic top-k by weight = the EN docs
    cold = {
        r["doc_id"]
        for r in dsir_sample(
            scored, k=4, seed="s1", temperature=1e-6
        ).collect()
    }
    assert cold == set(range(len(EN)))


def test_sample_fresh_seed_is_a_fresh_draw(scored):
    # across many seeds at high temperature the union of picks must
    # leave the top-4-by-weight set (pure top-k would never do that)
    picked = set()
    for s in range(8):
        picked |= {
            r["doc_id"]
            for r in dsir_sample(
                scored, k=4, seed=f"seed-{s}", temperature=25.0
            ).collect()
        }
    assert picked - set(range(len(EN)))


def test_sample_fraction_thresholds(scored):
    kept = dsir_sample(scored, fraction=0.5, seed="f1").collect()
    # percentile_approx is exact at 8 rows; 1-based upper-rank keeps 4
    assert 3 <= len(kept) <= 5
    again = dsir_sample(scored, fraction=0.5, seed="f1").collect()
    assert {r["doc_id"] for r in kept} == {r["doc_id"] for r in again}
    assert {r["doc_id"] for r in kept} <= set(range(len(EN) + len(XX)))


def test_sample_argument_contract(scored):
    with pytest.raises(ValueError, match="exactly one"):
        dsir_sample(scored, k=2, fraction=0.5)
    with pytest.raises(ValueError, match="exactly one"):
        dsir_sample(scored)
    with pytest.raises(ValueError, match="temperature"):
        dsir_sample(scored, k=2, temperature=0.0)
    with pytest.raises(ValueError, match="fraction"):
        dsir_sample(scored, fraction=1.5)


def test_artifact_roundtrip(spark, docs, scored, tmp_path):
    from xmidt_event_streams_spark.operators.dsir import load_dsir, save_dsir

    target = docs.filter(F.col("doc_id") < len(EN))
    model = dsir_fit(target, docs, dim=512)
    save_dsir(model, str(tmp_path / "m"))
    loaded = load_dsir(spark, str(tmp_path / "m"))
    assert (loaded.dim, loaded.alpha) == (512, 1.0)
    again = dsir_log_weights(docs, loaded).collect()
    want = {r["doc_id"]: r["log_w"] for r in scored.collect()}
    assert {r["doc_id"]: r["log_w"] for r in again} == want
    with pytest.raises(ValueError, match="sidecar"):
        load_dsir(spark, str(tmp_path / "nowhere"))


def test_corpus_build_dsir_stage(spark, docs, tmp_path):
    from xmidt_event_streams_spark.corpus import build_training_corpus

    target = docs.filter(F.col("doc_id") < len(EN))
    model = dsir_fit(target, docs, dim=512)
    ledger = build_training_corpus(
        docs,
        str(tmp_path / "corpus"),
        quality=None,
        dedup=None,
        dsir_model=model,
        dsir_fraction=0.5,
        dsir_temperature=1e-6,  # ~deterministic: keep the EN half
        n_shards=2,
    )
    assert ledger["dsir_dropped"] + ledger["written"] == ledger["input"]
    assert 3 <= ledger["written"] <= 5
    back = spark.read.parquet(str(tmp_path / "corpus"))
    # at the cold-temperature limit selection is weight-ordered: all
    # EN docs survive, and the quantile boundary admits at most one XX
    kept = {r["doc_id"] for r in back.select("doc_id").collect()}
    assert set(range(len(EN))) <= kept
    assert len(kept - set(range(len(EN)))) <= 1
    with pytest.raises(ValueError, match="dsir_fraction"):
        build_training_corpus(
            docs, str(tmp_path / "c2"), dsir_model=model
        )


def test_dsir_quality_gate_partitions_and_chains(spark, docs, scored):
    from xmidt_event_streams_spark.corpus import chain_gates
    from xmidt_event_streams_spark.operators.dsir import dsir_quality_gate

    target = docs.filter(F.col("doc_id") < len(EN))
    model = dsir_fit(target, docs, dim=512)
    # threshold between the EN and XX weight ranges (asserted apart in
    # test_target_like_docs_score_higher)
    w = {r["doc_id"]: r["log_w"] for r in scored.collect()}
    thr = (min(w[i] for i in range(len(EN)))
           + max(w[i + len(EN)] for i in range(len(XX)))) / 2
    gate = dsir_quality_gate(model, thr)
    passing, failing = gate(docs)
    assert {r["doc_id"] for r in passing.collect()} == set(range(len(EN)))
    fails = failing.collect()
    assert {r["doc_id"] for r in fails} == {i + len(EN) for i in range(len(XX))}
    assert all(r["reject_reason"] == "dsir" for r in fails)
    # chained behind an always-pass gate, attribution stays 'dsir'
    chained = chain_gates(lambda b: (b, b.limit(0).withColumn(
        "reject_reason", F.lit("noop"))), gate)
    p2, f2 = chained(docs)
    assert p2.count() == len(EN)
    assert {r["reject_reason"] for r in f2.collect()} == {"dsir"}


def test_null_weight_rows_dropped(spark):
    df = spark.createDataFrame(
        [(0, 1.0), (1, None)], "doc_id long, log_w double"
    )
    kept = dsir_sample(df, k=5).collect()
    assert [r["doc_id"] for r in kept] == [0]
