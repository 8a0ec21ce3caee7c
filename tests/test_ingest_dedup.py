"""Dedup-on-ingest streaming composition: every micro-batch probes
the persistent MinHash index, uniques feed corpus + index, dups feed
the rejects sink. The cross-trigger case (a doc duplicating a
survivor from an EARLIER trigger) is the property in-memory
dropDuplicates state cannot give unboundedly."""
from tests.streamutil import await_stream

import json

from pyspark.sql import functions as F

from xmidt_event_streams_spark.operators.incremental import (
    write_minhash_index,
)
from xmidt_event_streams_spark.streaming.ingest_dedup import (
    start_ingest_dedup,
)


def _text(seed: str) -> str:
    # 8 distinct-ish tokens -> 6 word-3-grams; distinct seeds give
    # disjoint shingle sets (agreement ~0), identical seeds give 1.0
    return " ".join(f"{seed}w{i}" for i in range(8))


def test_ingest_dedup_stream(spark, tmp_path):
    corpus_seed = [(i, _text(f"corp{i}")) for i in range(10)]
    prior = spark.createDataFrame(corpus_seed, "doc_id: long, text: string")

    idx = str(tmp_path / "index")
    corpus_out = str(tmp_path / "corpus")
    rejects_out = str(tmp_path / "rejects")
    write_minhash_index(prior, idx)

    src = tmp_path / "in"
    src.mkdir()
    batch1 = [
        (100, _text("corp0")),   # dup of prior corpus doc 0
        (101, _text("new101")),  # unique
        (102, _text("new102")),  # unique
    ]
    batch2 = [
        (200, _text("new101")),  # dup of batch1 survivor -> cross-trigger
        (201, _text("corp5")),   # dup of prior corpus doc 5
        (202, _text("new202")),  # unique
    ]
    for fname, rows in (("b1.json", batch1), ("b2.json", batch2)):
        with open(src / fname, "w") as f:
            for doc_id, text in rows:
                f.write(json.dumps({"doc_id": doc_id, "text": text}) + "\n")

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    q = start_ingest_dedup(
        stream,
        idx,
        corpus_out,
        rejects_out,
        checkpoint_dir=str(tmp_path / "ckpt"),
        availableNow=True,
        query_name="ingest-dedup-test",
    )
    await_stream(q, 300)

    kept = {
        r["doc_id"] for r in spark.read.parquet(corpus_out).collect()
    }
    rejects = {
        r["doc_id"]: r["dup_of"]
        for r in spark.read.parquet(rejects_out).collect()
    }
    assert kept == {101, 102, 202}
    assert rejects == {100: 0, 200: 101, 201: 5}

    # survivors joined the index: a follow-up batch sees them
    from xmidt_event_streams_spark.operators.incremental import (
        incremental_dedup_mark,
    )

    probe = spark.createDataFrame(
        [(300, _text("new202"))], "doc_id: long, text: string"
    )
    verdict = incremental_dedup_mark(spark, idx, probe).collect()[0]
    assert not verdict["is_unique"] and verdict["dup_of"] == 202


def _write_batch_file(src, fname, rows):
    with open(src / fname, "w") as f:
        for doc_id, text in rows:
            f.write(json.dumps({"doc_id": doc_id, "text": text}) + "\n")


def _run_ingest(spark, src, idx, corpus_out, rejects_out, ckpt):
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    return start_ingest_dedup(
        stream,
        idx,
        corpus_out,
        rejects_out,
        checkpoint_dir=ckpt,
        availableNow=True,
    )


def _verdicts(spark, corpus_out, rejects_out):
    kept = {
        r["doc_id"] for r in spark.read.parquet(corpus_out).collect()
    }
    rejects = {
        r["doc_id"]: r["dup_of"]
        for r in spark.read.parquet(rejects_out).collect()
    }
    return kept, rejects


def test_restart_from_checkpoint_resumes_not_repeats(spark, tmp_path):
    """Kill the stream between micro-batches, restart from the
    checkpoint with MORE input waiting, and assert the final corpus /
    rejects / index state is identical to an uninterrupted run: no
    doc processed twice (checkpointed offsets), no doc skipped, no
    verdict changed, and row counts exact (idempotent per-batch
    sinks). The reference's integration suite asserts the same
    end-to-end read-back shape (integrationTests/integration_test.go:
    226-236)."""
    from xmidt_event_streams_spark.operators.incremental import (
        incremental_dedup_mark,
        write_minhash_index,
    )

    prior = spark.createDataFrame(
        [(i, _text(f"corp{i}")) for i in range(10)],
        "doc_id: long, text: string",
    )
    idx = str(tmp_path / "index")
    corpus_out = str(tmp_path / "corpus")
    rejects_out = str(tmp_path / "rejects")
    ckpt = str(tmp_path / "ckpt")
    write_minhash_index(prior, idx)

    src = tmp_path / "in"
    src.mkdir()
    batch1 = [(100, _text("corp0")), (101, _text("new101"))]
    _write_batch_file(src, "b1.json", batch1)

    # run 1: drain what's available (batch1 only), then stop -- the
    # checkpoint now holds committed offsets through b1.json
    q1 = _run_ingest(spark, src, idx, corpus_out, rejects_out, ckpt)
    await_stream(q1, 300)
    kept1, rejects1 = _verdicts(spark, corpus_out, rejects_out)
    assert kept1 == {101} and rejects1 == {100: 0}

    # more input lands while the stream is down; 200 dups a RUN-1
    # survivor (cross-restart state lives in the index), 202 is new
    batch2 = [(200, _text("new101")), (201, _text("corp5")), (202, _text("new202"))]
    _write_batch_file(src, "b2.json", batch2)

    # run 2: restart from the same checkpoint -- must process ONLY
    # b2.json (offsets say b1 is done)
    q2 = _run_ingest(spark, src, idx, corpus_out, rejects_out, ckpt)
    await_stream(q2, 300)

    kept, rejects = _verdicts(spark, corpus_out, rejects_out)
    assert kept == {101, 202}
    assert rejects == {100: 0, 200: 101, 201: 5}

    # exact-count check: idempotent sinks mean one physical row per
    # doc even across the restart boundary
    assert spark.read.parquet(corpus_out).count() == 2
    assert spark.read.parquet(rejects_out).count() == 3

    # index state matches an uninterrupted run bit-for-bit: rebuild
    # from scratch in one pass and compare probe verdicts
    idx2 = str(tmp_path / "index2")
    corpus2 = str(tmp_path / "corpus2")
    rejects2 = str(tmp_path / "rejects2")
    write_minhash_index(prior, idx2)
    q3 = _run_ingest(
        spark, src, idx2, corpus2, rejects2, str(tmp_path / "ckpt2")
    )
    await_stream(q3, 300)
    kept_u, rejects_u = _verdicts(spark, corpus2, rejects2)
    assert (kept, rejects) == (kept_u, rejects_u)

    probe = spark.createDataFrame(
        [(900, _text("new202")), (901, _text("new101")), (902, _text("fresh"))],
        "doc_id: long, text: string",
    )
    v_restarted = {
        r["doc_id"]: (r["is_unique"], r["dup_of"])
        for r in incremental_dedup_mark(spark, idx, probe).collect()
    }
    v_uninterrupted = {
        r["doc_id"]: (r["is_unique"], r["dup_of"])
        for r in incremental_dedup_mark(spark, idx2, probe).collect()
    }
    assert v_restarted == v_uninterrupted
    assert v_restarted[900] == (False, 202)
    assert v_restarted[902] == (True, None)


def test_cold_start_stream(spark, tmp_path):
    """A stream over a just-initialized EMPTY index must not crash on
    its first micro-batch (the r3 cold-start defect: schema inference
    over a data-file-less index raised UNABLE_TO_INFER_SCHEMA)."""
    from xmidt_event_streams_spark.operators.incremental import (
        init_minhash_index,
    )

    idx = str(tmp_path / "index")
    corpus_out = str(tmp_path / "corpus")
    rejects_out = str(tmp_path / "rejects")
    init_minhash_index(spark, idx, id_type="bigint")

    src = tmp_path / "in"
    src.mkdir()
    _write_batch_file(src, "b1.json", [(1, _text("alpha")), (2, _text("beta"))])
    _write_batch_file(src, "b2.json", [(3, _text("alpha")), (4, _text("gamma"))])

    q = _run_ingest(spark, src, idx, corpus_out, rejects_out, str(tmp_path / "ckpt"))
    await_stream(q, 300)

    kept, rejects = _verdicts(spark, corpus_out, rejects_out)
    assert kept == {1, 2, 4}
    assert rejects == {3: 1}


def test_idempotent_batch_append_replay(spark, tmp_path):
    """The at-least-once replay case directly: writing the SAME batch
    id twice leaves exactly one physical copy; other batches'
    partitions are untouched."""
    from xmidt_event_streams_spark.streaming.ingest_dedup import (
        idempotent_batch_append,
    )

    path = str(tmp_path / "sink")
    b0 = spark.createDataFrame([(1, "a"), (2, "b")], "doc_id: long, text: string")
    b1 = spark.createDataFrame([(3, "c")], "doc_id: long, text: string")

    idempotent_batch_append(b0, 0, path)
    idempotent_batch_append(b1, 1, path)
    # replay batch 1 (e.g. crash after write, before checkpoint commit)
    idempotent_batch_append(b1, 1, path)

    rows = spark.read.parquet(path).collect()
    assert sorted(r["doc_id"] for r in rows) == [1, 2, 3]
    assert {r["_ingest_batch_id"] for r in rows} == {0, 1}


def test_compact_ingest_sink(spark, tmp_path):
    """Compaction merges finalized batch partitions into coarse groups
    (row-identical read-back, fewer files) while the NEWEST batch's
    partition stays untouched so an in-flight replay remains
    idempotent."""
    import os

    from xmidt_event_streams_spark.streaming.ingest_dedup import (
        compact_ingest_sink,
        idempotent_batch_append,
    )

    path = str(tmp_path / "sink")
    for bid in range(7):
        df = spark.createDataFrame(
            [(bid * 10 + i, f"t{bid}-{i}") for i in range(5)],
            "doc_id: long, text: string",
        ).repartition(4)
        idempotent_batch_append(df, bid, path)

    before = sorted(
        map(tuple, spark.read.parquet(path).select("doc_id", "text").collect())
    )
    stats = compact_ingest_sink(spark, path, batches_per_partition=3)
    after_df = spark.read.parquet(path)
    after = sorted(map(tuple, after_df.select("doc_id", "text").collect()))

    assert after == before  # row-identical
    assert stats["files_after"] < stats["files_before"]
    assert stats["rows"] == len(before)
    parts = sorted(
        int(d.split("=")[1])
        for d in os.listdir(path)
        if d.startswith("_ingest_batch_id=")
    )
    # batches 0-5 merged into groups 0 and 3; batch 6 (newest) untouched
    assert parts == [0, 3, 6]

    # replay of the newest batch after compaction: still exactly-once
    df6 = spark.createDataFrame(
        [(60 + i, f"t6-{i}") for i in range(5)], "doc_id: long, text: string"
    )
    idempotent_batch_append(df6, 6, path)
    assert sorted(
        map(tuple, spark.read.parquet(path).select("doc_id", "text").collect())
    ) == before


def test_ingest_with_quality_gate(spark, tmp_path):
    """quality='gopher+c4': failing docs land in rejects with the
    failing rule as reject_reason and never enter the index;
    duplicates keep reject_reason='duplicate'. One ledger."""
    from xmidt_event_streams_spark.operators.incremental import (
        incremental_dedup_mark,
        init_minhash_index,
    )

    idx = str(tmp_path / "index")
    corpus_out = str(tmp_path / "corpus")
    rejects_out = str(tmp_path / "rejects")
    init_minhash_index(spark, idx, id_type="bigint")

    def good(seed):
        # passes gopher (>=10 varied tokens, low repetition) and c4
        # (>=5 terminal-punct sentences of >=3 words); seed-prefixed
        # tokens never allow 3 consecutive shared tokens, so different
        # seeds share ZERO 3-gram shingles (no accidental near-dups)
        return "\n".join(
            f"Document {seed}{i} carries sentence {seed}word{i} reading fine{seed}{i}."
            for i in range(6)
        )

    src = tmp_path / "in"
    src.mkdir()
    _write_batch_file(
        src,
        "b1.json",
        [
            (1, good("first")),
            (2, "word " * 30),        # gopher: excessive repetition
            (3, good("third") + "\nvar x = {1};"),  # c4: curly_brace
            (4, good("first")),       # duplicate of 1
        ],
    )
    q = _run_ingest_q(spark, src, idx, corpus_out, rejects_out,
                      str(tmp_path / "ckpt"), quality="gopher+c4")
    await_stream(q, 300)

    kept = {r["doc_id"] for r in spark.read.parquet(corpus_out).collect()}
    rej = {
        r["doc_id"]: (r["reject_reason"], r["dup_of"])
        for r in spark.read.parquet(rejects_out).collect()
    }
    assert kept == {1}
    assert rej[2][0] in ("excessive_token_repetition", "dominant_bigram")
    assert rej[3] == ("curly_brace", None)
    assert rej[4] == ("duplicate", 1)

    # quality-rejected docs never entered the index: doc 3's text is
    # still "unseen" for dedup purposes
    probe = spark.createDataFrame(
        [(900, good("third") + "\nvar x = {1};")], "doc_id: long, text: string"
    )
    assert incremental_dedup_mark(spark, idx, probe).collect()[0]["is_unique"]


def _run_ingest_q(spark, src, idx, corpus_out, rejects_out, ckpt, **kw):
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    return start_ingest_dedup(
        stream, idx, corpus_out, rejects_out, checkpoint_dir=ckpt,
        availableNow=True, **kw,
    )


class TestReadSinkAsOf:
    """Exact time travel over the batch-partitioned sink, across
    compaction (the _src_batch_id preservation contract)."""

    @staticmethod
    def _fill(spark, path, n_batches=6, rows_per=3):
        from xmidt_event_streams_spark.streaming.ingest_dedup import (
            idempotent_batch_append,
        )

        for b in range(n_batches):
            df = spark.createDataFrame(
                [(b * 100 + i, f"doc-{b}-{i}") for i in range(rows_per)],
                "doc_id long, text string",
            )
            idempotent_batch_append(df, b, path)

    @staticmethod
    def _ids(df):
        return sorted(r["doc_id"] for r in df.collect())

    def _expect(self, n, rows_per=3):
        return sorted(
            b * 100 + i for b in range(n + 1) for i in range(rows_per)
        )

    def test_as_of_before_compaction(self, spark, tmp_path):
        from xmidt_event_streams_spark.streaming.ingest_dedup import (
            read_sink_as_of,
        )

        path = str(tmp_path / "sink")
        self._fill(spark, path)
        snap = read_sink_as_of(spark, path, 3)
        assert self._ids(snap) == self._expect(3)
        assert "_ingest_batch_id" not in snap.columns

    def test_as_of_survives_compaction(self, spark, tmp_path):
        """Compaction merges partitions 2,3 into one group; as-of 2
        must still cut INSIDE the group via _src_batch_id."""
        from xmidt_event_streams_spark.streaming.ingest_dedup import (
            compact_ingest_sink,
            read_sink_as_of,
        )

        path = str(tmp_path / "sink")
        self._fill(spark, path)
        before = {
            n: self._ids(read_sink_as_of(spark, path, n)) for n in (1, 2, 3)
        }
        rep = compact_ingest_sink(spark, path, batches_per_partition=2)
        assert rep["files_after"] < rep["files_before"]
        for n in (1, 2, 3):
            assert self._ids(read_sink_as_of(spark, path, n)) == before[n], n
            assert before[n] == self._expect(n)

    def test_as_of_exact_after_repeated_compaction_and_append(
        self, spark, tmp_path
    ):
        """Second compaction with a coarser group + a fresh append
        (schema-merge path: new files lack _src_batch_id)."""
        from xmidt_event_streams_spark.streaming.ingest_dedup import (
            compact_ingest_sink,
            idempotent_batch_append,
            read_sink_as_of,
        )

        path = str(tmp_path / "sink")
        self._fill(spark, path)
        compact_ingest_sink(spark, path, batches_per_partition=2)
        df6 = spark.createDataFrame(
            [(600 + i, f"doc-6-{i}") for i in range(3)],
            "doc_id long, text string",
        )
        idempotent_batch_append(df6, 6, path)
        compact_ingest_sink(spark, path, batches_per_partition=4)
        for n in (0, 2, 3, 5, 6):
            got = self._ids(read_sink_as_of(spark, path, n))
            want = sorted(
                b * 100 + i
                for b in range(n + 1)
                for i in range(3)
                if b * 100 + i < 700
            )
            assert got == want, n

    def test_as_of_prunes_partitions(self, spark, tmp_path):
        """The partition-column filter must reach the scan as a
        PartitionFilter (later batches never read)."""
        from xmidt_event_streams_spark.streaming.ingest_dedup import (
            read_sink_as_of,
        )

        path = str(tmp_path / "sink")
        self._fill(spark, path)
        snap = read_sink_as_of(spark, path, 2)
        plan = snap._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        pf = [l for l in plan.splitlines() if "PartitionFilters" in l]
        assert pf and "_ingest_batch_id" in pf[0], plan


def test_ingest_with_span_scrub_gate(spark, tmp_path):
    """span_scrub_gate as the streaming quality hook: a doc quoting a
    benchmark sentence lands in the corpus SCRUBBED (rejected
    nothing), and the scrubbed form is what the dedup index learned --
    a later doc equal to the scrubbed text is flagged duplicate."""
    from xmidt_event_streams_spark.corpus import chain_gates, span_scrub_gate
    from xmidt_event_streams_spark.operators.incremental import (
        init_minhash_index,
    )

    idx = str(tmp_path / "index")
    corpus_out = str(tmp_path / "corpus")
    rejects_out = str(tmp_path / "rejects")
    init_minhash_index(spark, idx, id_type="bigint")

    bench_sent = "the quick brown fox jumps over the lazy dog tonight"
    bench = spark.createDataFrame(
        [(900, f"prompt {bench_sent} answer")], "doc_id: long, text: string"
    )
    base = (
        "Document alpha0 carries long sentence alphaword0 reading fine. "
        "Document alpha1 carries long sentence alphaword1 reading fine."
    )
    src = tmp_path / "in"
    src.mkdir()
    _write_batch_file(
        src,
        "b1.json",
        [(1, f"{base} Quoted: {bench_sent} end of quote here.")],
    )
    gate = chain_gates(span_scrub_gate(bench, window=5))
    q = _run_ingest_q(spark, src, idx, corpus_out, rejects_out,
                      str(tmp_path / "ckpt"), quality=gate)
    await_stream(q, 300)

    rows = spark.read.parquet(corpus_out).collect()
    assert [r["doc_id"] for r in rows] == [1]
    shipped = rows[0]["text"]
    assert bench_sent not in shipped.lower()
    assert "Quoted:" in shipped and "end of quote here." in shipped
    # nothing rejected: the rejects sink never materialized a file
    import pathlib

    assert not list(pathlib.Path(rejects_out).rglob("*.parquet"))


def test_ingest_keeps_inverted_index_fresh_across_restart(spark, tmp_path):
    """The invindex streaming arm: survivors' postings are folded per
    micro-batch, so phrase search (and the takedown pre-filter) sees
    them WITHOUT a rebuild; duplicates never enter the index; the
    verdict survives a restart-from-checkpoint; compaction after a
    takedown removes the postings."""
    from xmidt_event_streams_spark.operators.incremental import (
        init_minhash_index,
    )
    from xmidt_event_streams_spark.operators.invindex import (
        compact_inverted_index,
        init_inverted_index,
        phrase_search,
        read_inverted_index,
    )
    from xmidt_event_streams_spark.streaming.ingest_dedup import (
        start_ingest_dedup,
    )

    idx = str(tmp_path / "index")
    inv = str(tmp_path / "invindex")
    corpus_out = str(tmp_path / "corpus")
    rejects_out = str(tmp_path / "rejects")
    ckpt = str(tmp_path / "ckpt")
    init_minhash_index(spark, idx)
    init_inverted_index(spark, inv)

    src = tmp_path / "in"
    src.mkdir()

    def run():
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .json(str(src))
        )
        q = start_ingest_dedup(
            stream, idx, corpus_out, rejects_out,
            checkpoint_dir=ckpt, invindex_path=inv, availableNow=True,
        )
        await_stream(q, 300)

    _write_batch_file(
        src, "b1.json", [(1, "alpha beta gamma"), (2, "delta beta alpha")]
    )
    run()
    hits1 = {
        r["doc_id"]
        for r in phrase_search(
            read_inverted_index(spark, inv), "alpha beta"
        ).collect()
    }
    assert hits1 == {1}

    # restart with more input: 3 is a near-dup of 1 (never indexed),
    # 4 is new and phrase-matching
    _write_batch_file(
        src, "b2.json",
        [(3, "alpha beta gamma"), (4, "omega alpha beta tail")],
    )
    run()
    hits2 = {
        r["doc_id"]
        for r in phrase_search(
            read_inverted_index(spark, inv), "alpha beta"
        ).collect()
    }
    assert hits2 == {1, 4}  # 3 was a duplicate: no postings for it

    # takedown tier: tombstone-compact doc 1 out of the index
    compact_inverted_index(spark, inv, tombstones=[1])
    ix = read_inverted_index(spark, inv)
    assert {
        r["doc_id"] for r in phrase_search(ix, "alpha beta").collect()
    } == {4}
    assert ix.filter("doc_id = 1").count() == 0
