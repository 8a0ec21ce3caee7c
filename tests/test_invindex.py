"""Positional inverted index (operators/invindex.py): build contract,
DuckDB phrase oracle, overlapping matches, persisted-index pruning,
sidecar guard, tokenizer parity with the takedown surface.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from xmidt_event_streams_spark.operators.invindex import (
    build_inverted_index,
    phrase_search,
    read_inverted_index,
    write_inverted_index,
)

PHRASE = "table value"


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


@pytest.fixture(scope="module")
def index(docs):
    return build_inverted_index(docs).persist()


def _oracle_hits(sf_dir, t0, t1):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    return {
        (r[0], r[1], r[2])
        for r in con.execute(
            r"""
WITH words AS (
  SELECT doc_id,
    list_filter(
      string_split(trim(regexp_replace(lower(text),
        '[ \t\n\x0B\f\r]+', ' ', 'g')), ' '),
      t -> t <> ''
    ) AS w
  FROM documents
),
h AS (
  SELECT doc_id, i FROM words,
    unnest(generate_series(1, len(w) - 1)) AS t(i)
  WHERE w[i] = ? AND w[i+1] = ?
)
SELECT doc_id, count(*)::BIGINT, CAST(min(i) - 1 AS BIGINT)
FROM h GROUP BY doc_id
""",
            [t0, t1],
        ).fetchall()
    }


def test_build_contract(index):
    """Positions are sorted, 0-based, tf = len(positions), one row
    per (term, doc)."""
    rows = index.filter(F.col("term") == "table").limit(20).collect()
    assert rows
    for r in rows:
        assert r["positions"] == sorted(r["positions"])
        assert r["tf"] == len(r["positions"])
        assert all(p >= 0 for p in r["positions"])
        assert 0 <= r["bkt"] < 64
    dup = (
        index.groupBy("term", "doc_id").count().filter("count > 1").count()
    )
    assert dup == 0


def test_phrase_search_matches_duckdb(index, sf_dir):
    got = {
        (r["doc_id"], r["n_hits"], r["first_pos"])
        for r in phrase_search(index, PHRASE).collect()
    }
    assert got == _oracle_hits(sf_dir, "table", "value")


def test_overlapping_matches_count(spark):
    """'a a a a' holds three 'a a' hits (overlap counted, the span
    family's census rule); hit positions are the match starts."""
    df = spark.createDataFrame(
        [(1, "a a a a"), (2, "b a b"), (3, "A  a\tx")], ["doc_id", "text"]
    )
    ix = build_inverted_index(df)
    rows = {r["doc_id"]: r for r in phrase_search(ix, "a a").collect()}
    assert rows[1]["n_hits"] == 3
    assert rows[1]["hit_positions"] == [0, 1, 2]
    assert rows[3]["hit_positions"] == [0]  # case-folded + ws collapsed
    assert 2 not in rows


def test_single_and_missing_terms(spark):
    df = spark.createDataFrame(
        [(1, "x y z"), (2, "y z x y")], ["doc_id", "text"]
    )
    ix = build_inverted_index(df)
    single = {r["doc_id"]: r["n_hits"] for r in phrase_search(ix, "y").collect()}
    assert single == {1: 1, 2: 2}
    assert phrase_search(ix, "z q").count() == 0
    with pytest.raises(ValueError, match="no tokens"):
        phrase_search(ix, "   ")


def test_persisted_index_prunes_partitions(docs, tmp_path):
    """A materialized probe reads <= #distinct-phrase-term buckets:
    PartitionFilters carries the bkt IN-list at plan time, and the
    result matches the in-memory index's."""
    path = str(tmp_path / "ix")
    write_inverted_index(docs, path)
    ix = read_inverted_index(docs.sparkSession, path)
    got = phrase_search(ix, PHRASE)
    want = {
        (r["doc_id"], r["n_hits"]) for r in
        phrase_search(build_inverted_index(docs), PHRASE).collect()
    }
    assert {(r["doc_id"], r["n_hits"]) for r in got.collect()} == want
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    scan_line = next(
        ln for ln in plan.splitlines() if "PartitionFilters" in ln
    )
    assert "bkt" in scan_line


def test_sidecar_guard(docs, tmp_path):
    path = str(tmp_path / "ix2")
    write_inverted_index(docs, path, n_buckets=16)
    with pytest.raises(ValueError, match="built with"):
        read_inverted_index(docs.sparkSession, path, n_buckets=64)
    assert read_inverted_index(docs.sparkSession, path, n_buckets=16)


def test_py_tokens_shared_with_takedown():
    """One tokenizer contract: takedown's driver-side twin IS the
    shared functions/text.py_tokens."""
    from xmidt_event_streams_spark.functions.text import py_tokens
    from xmidt_event_streams_spark.takedown import _py_tokens

    assert _py_tokens is py_tokens
    assert py_tokens("  Foo\tBAR \n baz ") == ["foo", "bar", "baz"]


def test_phrase_candidates_window_gram_semantics(spark):
    """Candidacy = contains ANY window-gram of any phrase: a doc
    holding only an interior fragment >= window tokens is a
    candidate; a doc sharing no gram is not; short phrases refused."""
    from xmidt_event_streams_spark.operators.invindex import (
        phrase_candidates,
    )

    phrase = "one two three four five six"
    df = spark.createDataFrame(
        [
            (1, f"intro {phrase} outro"),       # full phrase
            (2, "x three four five y"),          # interior 3-gram
            (3, "one two x three four"),         # only 2-token pieces
            (4, "unrelated words entirely"),
        ],
        ["doc_id", "text"],
    )
    ix = build_inverted_index(df)
    got = {
        r["doc_id"]
        for r in phrase_candidates(ix, [phrase], window=3).collect()
    }
    assert got == {1, 2}
    with pytest.raises(ValueError, match="shorter than window"):
        phrase_candidates(ix, ["too short"], window=3)


# ---------------------------------------------------------------- #
# incremental lifecycle: init -> append -> probe -> tombstone ->
# compact (mirrors the MinHash index; tests mirror test_incremental) #
# ---------------------------------------------------------------- #


def _mini_docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def _hits(index_df, phrase):
    return sorted(
        (r.doc_id, r.n_hits, tuple(r.hit_positions))
        for r in phrase_search(index_df, phrase).collect()
    )


def test_incremental_append_equals_full_rebuild(spark, tmp_path):
    """Equivalence contract: init + N appends probes EXACTLY like one
    full build over the union -- incremental is an execution
    strategy, not a semantics change."""
    from xmidt_event_streams_spark.operators.invindex import (
        append_to_inverted_index,
        init_inverted_index,
    )

    a = _mini_docs(
        spark,
        [(1, "the red table value"), (2, "no match here"), (3, "table value twice table value")],
    )
    b = _mini_docs(
        spark, [(4, "late arrival with table value"), (5, "still nothing")]
    )
    inc, full = str(tmp_path / "inc"), str(tmp_path / "full")
    init_inverted_index(spark, inc)
    # cold probe over the EMPTY initialized index: valid empty relation
    assert _hits(read_inverted_index(spark, inc), "table value") == []
    append_to_inverted_index(a, inc)
    append_to_inverted_index(b, inc)
    write_inverted_index(a.unionByName(b), full)
    assert _hits(read_inverted_index(spark, inc), "table value") == _hits(
        read_inverted_index(spark, full), "table value"
    )


def test_incremental_replay_and_tombstone_compact(spark, tmp_path):
    """The verdict's demanded shape: append a batch, phrase-search
    without rebuild, take a doc down, compact, assert its postings
    are GONE from the files (absence, not filtering); replayed
    appends don't change probe verdicts and compact reclaims them."""
    from xmidt_event_streams_spark.operators.invindex import (
        append_to_inverted_index,
        compact_inverted_index,
        init_inverted_index,
    )

    docs = _mini_docs(
        spark,
        [(1, "secret phrase lives here"), (2, "benign text"), (3, "another secret phrase doc")],
    )
    path = str(tmp_path / "ix")
    init_inverted_index(spark, path)
    append_to_inverted_index(docs, path)
    before = _hits(read_inverted_index(spark, path), "secret phrase")
    assert [d for d, _, _ in before] == [1, 3]
    # at-least-once replay: byte-identical re-append, verdict stable
    append_to_inverted_index(docs, path)
    assert _hits(read_inverted_index(spark, path), "secret phrase") == before
    rep = compact_inverted_index(spark, path, tombstones=[1])
    assert rep["rows_before"] > rep["rows_after"]
    ix = read_inverted_index(spark, path)
    assert [d for d, _, _ in _hits(ix, "secret phrase")] == [3]
    # absence, not filtering: no posting row for doc 1 remains at all
    assert ix.filter(F.col("doc_id") == 1).count() == 0
    # untouched doc's postings byte-stable through the compact
    assert _hits(ix, "benign text") == [(2, 1, (0,))]


def test_inverted_index_maintenance_target(spark, tmp_path):
    from xmidt_event_streams_spark.maintenance import run_maintenance
    from xmidt_event_streams_spark.operators.invindex import (
        append_to_inverted_index,
        init_inverted_index,
    )

    path = str(tmp_path / "mix")
    init_inverted_index(spark, path)
    docs = _mini_docs(spark, [(7, "maintained table value")])
    append_to_inverted_index(docs, path)
    append_to_inverted_index(docs, path)  # replay residue
    report = run_maintenance(
        spark, inverted_indexes=(path,), tombstones={path: [99]}
    )
    assert report[path]["kind"] == "inverted_index"
    assert report[path]["rows_after"] < report[path]["rows_before"]
    assert _hits(read_inverted_index(spark, path), "table value") == [
        (7, 1, (1,))
    ]


def test_append_to_uninitialized_index_refused(spark, tmp_path):
    """An append without a stamped sidecar would create an UNGUARDED
    index whose probes silently mis-prune on bucket-count mismatch --
    refused loudly instead."""
    import pytest

    from xmidt_event_streams_spark.operators.invindex import (
        append_to_inverted_index,
    )

    with pytest.raises(ValueError, match="initialize"):
        append_to_inverted_index(
            _mini_docs(spark, [(1, "some text")]), str(tmp_path / "nope")
        )


class TestSnapshotSyncedIndex:
    """sync_inverted_index_with_snapshot: the index follows the table
    through the checkpointed change feed -- bootstrap, incremental
    drains, update/delete correctness, crash-replay convergence."""

    def _mk(self, spark, tmp_path):
        from xmidt_event_streams_spark.operators.snapshots import (
            snapshot_create,
        )

        table = str(tmp_path / "tab")
        rows = [
            (1, "alpha beta gamma"),
            (2, "beta delta"),
            (3, "epsilon zeta"),
        ]
        snapshot_create(
            spark.createDataFrame(rows, "doc_id int, text string"),
            table,
            "doc_id",
        )
        return table

    def _hits(self, spark, ix, phrase):
        from xmidt_event_streams_spark.operators.invindex import (
            phrase_search,
            read_inverted_index,
        )

        return sorted(
            r.doc_id
            for r in phrase_search(
                read_inverted_index(spark, ix), phrase
            ).collect()
        )

    def test_bootstrap_and_incremental_sync(self, spark, tmp_path):
        from pyspark.sql import functions as F

        from xmidt_event_streams_spark.operators.invindex import (
            sync_inverted_index_with_snapshot,
        )
        from xmidt_event_streams_spark.operators.snapshots import (
            snapshot_merge,
        )

        table = self._mk(spark, tmp_path)
        ix = str(tmp_path / "ix")
        ck = str(tmp_path / "ck")
        r = sync_inverted_index_with_snapshot(spark, table, ix, ck)
        assert r["intervals"] == 0 and r["appended_docs"] == 3
        assert self._hits(spark, ix, "beta") == [1, 2]

        # update doc 2 (old term must stop answering), insert 4,
        # delete 3
        ups = spark.createDataFrame(
            [(2, "beta rewritten"), (4, "zeta fresh")],
            "doc_id int, text string",
        ).withColumn("_deleted", F.lit(False))
        tomb = spark.createDataFrame(
            [(3, "x")], "doc_id int, text string"
        ).withColumn("_deleted", F.lit(True))
        snapshot_merge(spark, table, ups.unionByName(tomb))
        r2 = sync_inverted_index_with_snapshot(spark, table, ix, ck)
        assert r2["intervals"] == 1
        assert self._hits(spark, ix, "delta") == []  # doc 2's old term
        assert self._hits(spark, ix, "rewritten") == [2]
        assert self._hits(spark, ix, "epsilon") == []  # doc 3 deleted
        assert self._hits(spark, ix, "zeta") == [4]
        # idle drain
        assert sync_inverted_index_with_snapshot(spark, table, ix, ck)[
            "intervals"
        ] == 0

    def test_crash_replay_converges(self, spark, tmp_path, monkeypatch):
        """Kill the sync after the interval's index writes but before
        the cursor ack: the rerun re-applies the SAME interval and the
        index converges to exactly the table's live postings."""
        from pyspark.sql import functions as F

        from xmidt_event_streams_spark.operators import invindex as IV
        from xmidt_event_streams_spark.operators.snapshots import (
            snapshot_merge,
        )

        table = self._mk(spark, tmp_path)
        ix = str(tmp_path / "ix")
        ck = str(tmp_path / "ck")
        IV.sync_inverted_index_with_snapshot(spark, table, ix, ck)
        snapshot_merge(
            spark,
            table,
            spark.createDataFrame(
                [(1, "alpha only"), (5, "beta newdoc")],
                "doc_id int, text string",
            ),
        )

        # crash: the sync's ack raises AFTER compact+append ran
        from xmidt_event_streams_spark.operators import snapshots as S

        real_follow = S.follow_snapshot_changes

        def follow_with_dying_ack(spark_, path_, ck_):
            out = real_follow(spark_, path_, ck_)
            if out is not None:
                def dying():
                    raise RuntimeError("crash before ack")
                out = dict(out, ack=dying)
            return out

        monkeypatch.setattr(
            S, "follow_snapshot_changes", follow_with_dying_ack
        )
        import pytest as _pytest

        with _pytest.raises(RuntimeError, match="crash"):
            IV.sync_inverted_index_with_snapshot(spark, table, ix, ck)
        monkeypatch.setattr(S, "follow_snapshot_changes", real_follow)

        # rerun: same interval redelivered; index converges
        r = IV.sync_inverted_index_with_snapshot(spark, table, ix, ck)
        assert r["intervals"] == 1
        assert self._hits(spark, ix, "beta") == [2, 5]
        assert self._hits(spark, ix, "gamma") == []  # doc 1's old term
        assert self._hits(spark, ix, "only") == [1]
        # replay may leave duplicate insert postings until the NEXT
        # compaction (the documented at-least-once posture); probes
        # absorb them, and one compact reclaims them exactly
        from xmidt_event_streams_spark.operators.invindex import (
            compact_inverted_index,
            read_inverted_index,
        )

        compact_inverted_index(spark, ix)
        idx = read_inverted_index(spark, ix)
        assert (
            idx.groupBy("term", "doc_id").count().filter("count > 1").count()
            == 0
        )
        assert self._hits(spark, ix, "beta") == [2, 5]

    def test_fresh_checkpoint_over_existing_index_refused(
        self, spark, tmp_path
    ):
        from xmidt_event_streams_spark.operators.invindex import (
            sync_inverted_index_with_snapshot,
            write_inverted_index,
        )

        table = self._mk(spark, tmp_path)
        ix = str(tmp_path / "ix")
        write_inverted_index(
            spark.createDataFrame(
                [(9, "stale content")], "doc_id int, text string"
            ),
            ix,
        )
        with pytest.raises(ValueError, match="fork"):
            sync_inverted_index_with_snapshot(
                spark, table, ix, str(tmp_path / "ck")
            )
