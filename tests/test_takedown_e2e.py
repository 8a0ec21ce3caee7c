"""Right-to-be-forgotten, end to end: one id driven through every
place a document lives — the keyed corpus table (tombstone MERGE),
the materialized MinHash index (tombstone compaction), and the
exported training shards (re-export from the post-takedown corpus) —
asserting it is GONE everywhere while everything untouched is
byte-identical.

The pieces each have their own tests (test_upsert / test_ingest_dedup
/ test_traindata); this is the composed flow a takedown request
actually runs, the shape of the reference's integration suite
(integrationTests/integration_test.go:226-236: drive one event
through, assert the observable end state everywhere)."""

from __future__ import annotations

from pyspark.sql import functions as F

from xmidt_event_streams_spark.operators.incremental import (
    compact_minhash_index,
    incremental_dedup_candidates,
    write_minhash_index,
)
from xmidt_event_streams_spark.operators.traindata import (
    write_training_shards,
)
from xmidt_event_streams_spark.operators.upsert import (
    DELETED_COL,
    merge_upsert,
    read_keyed_table,
    write_keyed_table,
)

TARGET = 7


def _corpus_rows():
    return [
        (i, f"document {i} discusses topic {i % 5} with unique terms "
            f"alpha{i} beta{i} gamma{i} delta{i}")
        for i in range(40)
    ]


def _shard_rows(spark, path):
    return sorted(
        tuple(r)
        for r in spark.read.parquet(path)
        .select("doc_id", "text", "split", "shard")
        .collect()
    )


def test_takedown_single_id_end_to_end(spark, tmp_path):
    corpus_path = str(tmp_path / "corpus")
    index_path = str(tmp_path / "index")
    shards_a = str(tmp_path / "shards_a")
    shards_b = str(tmp_path / "shards_b")

    df = spark.createDataFrame(_corpus_rows(), "doc_id long, text string")
    write_keyed_table(df, corpus_path, "doc_id")
    write_minhash_index(read_keyed_table(spark, corpus_path), index_path)
    with_tokens = read_keyed_table(spark, corpus_path).withColumn(
        "n_tokens", F.size(F.split("text", " "))
    )
    write_training_shards(
        with_tokens, shards_a, token_col="n_tokens", n_shards=4
    )

    # -- pre-takedown observability: the id is visible everywhere
    probe = spark.createDataFrame(
        [
            (999, _corpus_rows()[TARGET][1]),   # near-copy of the target
            (998, _corpus_rows()[12][1]),       # near-copy of a bystander
        ],
        "doc_id long, text string",
    )
    pre_hits = {
        (r["new_id"], r["dup_id"])
        for r in incremental_dedup_candidates(
            spark, index_path, probe
        ).collect()
    }
    assert (999, TARGET) in pre_hits and (998, 12) in pre_hits
    pre_corpus = {
        r["doc_id"]: r["text"]
        for r in read_keyed_table(spark, corpus_path).collect()
    }
    assert TARGET in pre_corpus
    pre_shards = _shard_rows(spark, shards_a)
    assert any(r[0] == TARGET for r in pre_shards)

    # -- the takedown flow
    tomb = spark.createDataFrame(
        [(TARGET, None, True)],
        f"doc_id long, text string, {DELETED_COL} boolean",
    )
    stats = merge_upsert(spark, corpus_path, tomb)
    assert stats["deletes"] == 1
    report = compact_minhash_index(spark, index_path, tombstones=[TARGET])
    assert report["rows_after"] < report["rows_before"]
    post_corpus_df = read_keyed_table(spark, corpus_path)
    write_training_shards(
        post_corpus_df.withColumn(
            "n_tokens", F.size(F.split("text", " "))
        ),
        shards_b,
        token_col="n_tokens",
        n_shards=4,
    )

    # -- gone from corpus reads; survivors byte-identical
    post_corpus = {
        r["doc_id"]: r["text"] for r in post_corpus_df.collect()
    }
    assert TARGET not in post_corpus
    assert post_corpus == {
        k: v for k, v in pre_corpus.items() if k != TARGET
    }

    # -- gone from index probes; bystander candidates unchanged
    post_hits = {
        (r["new_id"], r["dup_id"])
        for r in incremental_dedup_candidates(
            spark, index_path, probe
        ).collect()
    }
    assert all(dup != TARGET for _, dup in post_hits)
    # probe pairs among the new batch itself may appear on both runs;
    # compare only index-side hits
    assert {p for p in pre_hits if p[1] not in (TARGET, 998, 999)} == {
        p for p in post_hits if p[1] not in (998, 999)
    }

    # -- gone from exported shards; surviving rows identical, with
    # identical (split, shard) assignment (pure row-hash: a takedown
    # cannot reshuffle anyone else's placement)
    post_shards = _shard_rows(spark, shards_b)
    assert all(r[0] != TARGET for r in post_shards)
    assert post_shards == [r for r in pre_shards if r[0] != TARGET]


def test_takedown_is_idempotent(spark, tmp_path):
    """Replaying the same takedown (retry after a partial failure)
    changes nothing further — every stage tolerates the replay."""
    corpus_path = str(tmp_path / "corpus")
    index_path = str(tmp_path / "index")

    df = spark.createDataFrame(_corpus_rows(), "doc_id long, text string")
    write_keyed_table(df, corpus_path, "doc_id")
    write_minhash_index(df, index_path)

    tomb = spark.createDataFrame(
        [(TARGET, None, True)],
        f"doc_id long, text string, {DELETED_COL} boolean",
    )
    merge_upsert(spark, corpus_path, tomb)
    compact_minhash_index(spark, index_path, tombstones=[TARGET])
    snap_corpus = sorted(
        tuple(r) for r in read_keyed_table(spark, corpus_path).collect()
    )
    first = compact_minhash_index(spark, index_path, tombstones=[TARGET])
    merge_upsert(spark, corpus_path, tomb)  # replay both stages
    second = compact_minhash_index(spark, index_path, tombstones=[TARGET])
    assert sorted(
        tuple(r) for r in read_keyed_table(spark, corpus_path).collect()
    ) == snap_corpus
    assert second["rows_after"] == first["rows_after"]


def test_takedown_ids_api_matches_manual_flow(spark, tmp_path):
    """The packaged takedown_ids wrapper = tombstone MERGE + index
    compaction, one call."""
    from xmidt_event_streams_spark.takedown import takedown_ids

    corpus_path = str(tmp_path / "corpus")
    index_path = str(tmp_path / "index")
    df = spark.createDataFrame(_corpus_rows(), "doc_id long, text string")
    write_keyed_table(df, corpus_path, "doc_id")
    write_minhash_index(read_keyed_table(spark, corpus_path), index_path)

    stats = takedown_ids(spark, corpus_path, [TARGET], index_path)
    assert stats["deletes"] == 1 and stats["upserts"] == 0
    assert stats["index"]["rows_after"] < stats["index"]["rows_before"]
    post = {r["doc_id"] for r in read_keyed_table(spark, corpus_path).collect()}
    assert TARGET not in post and len(post) == 39


def test_takedown_phrases_end_to_end(spark, tmp_path):
    """Content takedown: one passage driven out of every document
    that quotes it -- corpus reads, index probes, and re-exported
    shards -- while untouched documents and placements stay
    byte-identical, and a document that WAS the passage is
    tombstoned, not left an empty husk."""
    from xmidt_event_streams_spark.operators.incremental import (
        incremental_dedup_candidates,
    )
    from xmidt_event_streams_spark.takedown import takedown_phrases

    passage = ("The Forbidden Passage Must Vanish From Every "
               "Document It Appears In Completely")
    rows = [
        (i, f"document {i} original terms alpha{i} beta{i} gamma{i} "
            f"delta{i} epsilon{i} zeta{i}")
        for i in range(20)
    ]
    rows[3] = (3, rows[3][1] + f" quoted here: {passage} end of quote")
    rows[11] = (11, f"{passage} and then {rows[11][1]}")
    rows.append((50, passage))  # nothing but the passage

    corpus_path = str(tmp_path / "corpus")
    index_path = str(tmp_path / "index")
    shards_a = str(tmp_path / "shards_a")
    shards_b = str(tmp_path / "shards_b")
    df = spark.createDataFrame(rows, "doc_id long, text string")
    write_keyed_table(df, corpus_path, "doc_id")
    write_minhash_index(read_keyed_table(spark, corpus_path), index_path)
    pre_corpus = {
        r["doc_id"]: r["text"]
        for r in read_keyed_table(spark, corpus_path).collect()
    }
    write_training_shards(
        read_keyed_table(spark, corpus_path).withColumn(
            "n_tokens", F.size(F.split("text", " "))
        ),
        shards_a,
        token_col="n_tokens",
        n_shards=4,
    )

    stats = takedown_phrases(
        spark, corpus_path, [passage], window=5, index_path=index_path
    )
    assert stats["docs_touched"] == 3
    assert stats["deletes"] == 1          # doc 50 tombstoned
    assert stats["upserts"] == 2          # docs 3, 11 rewritten
    assert stats["tokens_removed"] >= 3 * len(passage.split())

    post_corpus = {
        r["doc_id"]: r["text"]
        for r in read_keyed_table(spark, corpus_path).collect()
    }
    # passage gone everywhere; quoting docs survive, case preserved
    assert 50 not in post_corpus
    for did, text in post_corpus.items():
        assert "Forbidden Passage" not in text and "vanish" not in text.lower()
    assert "quoted here:" in post_corpus[3] and "alpha3" in post_corpus[3]
    assert "and then" in post_corpus[11]
    # untouched docs byte-identical
    for did in set(pre_corpus) - {3, 11, 50}:
        assert post_corpus[did] == pre_corpus[did]

    # index: a near-copy of the passage finds NO candidates; a
    # near-copy of an untouched doc still does
    probe = spark.createDataFrame(
        [(999, passage + " extra"), (998, pre_corpus[7])],
        "doc_id long, text string",
    )
    hits = {
        (r["new_id"], r["dup_id"])
        for r in incremental_dedup_candidates(spark, index_path, probe).collect()
    }
    assert all(new != 999 for new, _ in hits)
    assert (998, 7) in hits

    # shards re-exported from the post-takedown corpus: no passage,
    # untouched rows keep identical (split, shard) placement
    write_training_shards(
        read_keyed_table(spark, corpus_path).withColumn(
            "n_tokens", F.size(F.split("text", " "))
        ),
        shards_b,
        token_col="n_tokens",
        n_shards=4,
    )
    pre_shards = _shard_rows(spark, shards_a)
    post_shards = _shard_rows(spark, shards_b)
    assert all("Forbidden Passage" not in r[1] for r in post_shards)
    pre_untouched = [r for r in pre_shards if r[0] not in (3, 11, 50)]
    post_untouched = [r for r in post_shards if r[0] not in (3, 11)]
    assert pre_untouched == post_untouched


def test_takedown_phrases_refuses_short_phrase(spark, tmp_path):
    from xmidt_event_streams_spark.takedown import takedown_phrases

    corpus_path = str(tmp_path / "corpus")
    df = spark.createDataFrame(_corpus_rows(), "doc_id long, text string")
    write_keyed_table(df, corpus_path, "doc_id")
    import pytest

    with pytest.raises(ValueError, match="shorter than window"):
        takedown_phrases(spark, corpus_path, ["too short"], window=5)


def test_takedown_phrases_with_invindex_prefilter(spark, tmp_path):
    """Index-accelerated takedown: with a fresh positional inverted
    index the scrub runs only on phrase_candidates, and the end state
    is IDENTICAL to the scan-everything flow — including a doc that
    holds only an interior window-gram of the passage (overlap
    semantics), which the pre-filter must keep. A stale index (corpus
    written after the index) is refused."""
    import pytest

    from xmidt_event_streams_spark.operators.invindex import (
        write_inverted_index,
    )
    from xmidt_event_streams_spark.takedown import takedown_phrases

    passage = ("The Forbidden Passage Must Vanish From Every "
               "Document It Appears In Completely")
    interior = " ".join(passage.split()[3:8])  # one window-gram only
    rows = [
        (i, f"document {i} original terms alpha{i} beta{i} gamma{i} "
            f"delta{i} epsilon{i} zeta{i}")
        for i in range(20)
    ]
    rows[3] = (3, rows[3][1] + f" quoted: {passage} end")
    rows[8] = (8, f"partially {interior} quoted " + rows[8][1])
    rows.append((50, passage))

    def build(path_tag):
        corpus_path = str(tmp_path / f"corpus_{path_tag}")
        df = spark.createDataFrame(rows, "doc_id long, text string")
        write_keyed_table(df, corpus_path, "doc_id")
        return corpus_path

    # arm A: full-scan flow
    scan_path = build("scan")
    stats_scan = takedown_phrases(spark, scan_path, [passage], window=5)
    post_scan = {
        r["doc_id"]: r["text"]
        for r in read_keyed_table(spark, scan_path).collect()
    }

    # arm B: index-prefiltered flow
    ix_path = str(tmp_path / "invindex")
    pref_path = build("pref")
    write_inverted_index(
        read_keyed_table(spark, pref_path), ix_path, id_col="doc_id"
    )
    stats_pref = takedown_phrases(
        spark, pref_path, [passage], window=5, invindex_path=ix_path
    )
    post_pref = {
        r["doc_id"]: r["text"]
        for r in read_keyed_table(spark, pref_path).collect()
    }

    assert post_pref == post_scan
    for k in ("docs_touched", "tokens_removed", "upserts", "deletes"):
        assert stats_pref[k] == stats_scan[k], k
    assert stats_scan["docs_touched"] == 3  # docs 3, 8(interior), 50
    assert "partially" in post_pref[8] and interior not in post_pref[8]

    # staleness: the merge above rewrote the corpus AFTER the index
    # was built -> a second indexed takedown must refuse
    with pytest.raises(ValueError, match="stale index|older than"):
        takedown_phrases(
            spark, pref_path, [passage], window=5, invindex_path=ix_path
        )
    # explicit override still runs (and finds nothing: already cut)
    again = takedown_phrases(
        spark, pref_path, [passage], window=5,
        invindex_path=ix_path, invindex_stale_ok=True,
    )
    assert again["docs_touched"] == 0


def test_takedown_ids_on_snapshot_table_e2e(spark, tmp_path):
    """The snapshot-layout takedown: takedown_ids(table_format=
    'snapshot') hides the id at head atomically; before expire the
    row is still time-travelable (the layout's honesty rule); the
    expire completion step makes it physically gone while survivors
    stay byte-identical; the MinHash index tier composes the same
    way as the keyed flow."""
    import pytest

    from xmidt_event_streams_spark.operators.snapshots import (
        snapshot_create,
        snapshot_read,
    )
    from xmidt_event_streams_spark.takedown import takedown_ids

    corpus_path = str(tmp_path / "snapcorpus")
    index_path = str(tmp_path / "index")
    df = spark.createDataFrame(_corpus_rows(), "doc_id long, text string")
    assert snapshot_create(df, corpus_path, "doc_id") == 1
    write_minhash_index(
        snapshot_read(spark, corpus_path), index_path
    )
    pre = {
        r["doc_id"]: r["text"]
        for r in snapshot_read(spark, corpus_path).collect()
    }

    # merge WITHOUT expire: unreadable at head, still time-travelable
    stats = takedown_ids(
        spark, corpus_path, [TARGET], index_path=index_path,
        table_format="snapshot",
    )
    assert stats["deletes"] == 1 and stats["version"] == 2
    assert stats["expire"] is None
    head = {
        r["doc_id"]: r["text"]
        for r in snapshot_read(spark, corpus_path).collect()
    }
    assert TARGET not in head
    assert head == {k: v for k, v in pre.items() if k != TARGET}
    assert (
        snapshot_read(spark, corpus_path, version=1)
        .filter(F.col("doc_id") == TARGET)
        .count()
        == 1
    )
    # index tier already clean
    probe = spark.createDataFrame(
        [(999, _corpus_rows()[TARGET][1])], "doc_id long, text string"
    )
    assert not any(
        r["dup_id"] == TARGET
        for r in incremental_dedup_candidates(
            spark, index_path, probe
        ).collect()
    )

    # completion: a second takedown call with expire_keep_last=1
    # (no new ids -- drive expire through the flow's own parameter)
    stats2 = takedown_ids(
        spark, corpus_path, [39], table_format="snapshot",
        expire_keep_last=1,
    )
    assert stats2["expire"]["deleted_files"] > 0
    with pytest.raises(ValueError):
        snapshot_read(spark, corpus_path, version=1)
    final = {
        r["doc_id"]: r["text"]
        for r in snapshot_read(spark, corpus_path).collect()
    }
    assert TARGET not in final and 39 not in final
    assert final == {k: v for k, v in pre.items() if k not in (TARGET, 39)}


def test_takedown_phrases_on_snapshot_table(spark, tmp_path):
    """Content takedown over the snapshot layout: the phrase is cut
    from head reads, the pre-scrub text stays time-travelable until
    expire, and a doc that was nothing but the phrase is
    tombstoned."""
    from xmidt_event_streams_spark.operators.snapshots import (
        snapshot_create,
        snapshot_read,
    )
    from xmidt_event_streams_spark.takedown import takedown_phrases

    corpus_path = str(tmp_path / "snapcorpus2")
    phrase = "leaked secret passage token five"
    rows = [
        (1, f"prefix words here {phrase} suffix words after"),
        (2, "a perfectly clean document with enough words"),
        (3, phrase),  # nothing but the phrase -> tombstone
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    snapshot_create(df, corpus_path, "doc_id")

    stats = takedown_phrases(
        spark, corpus_path, [phrase], window=5,
        table_format="snapshot",
    )
    assert stats["docs_touched"] == 2
    assert stats["deletes"] == 1  # doc 3 tombstoned
    head = {
        r["doc_id"]: r["text"]
        for r in snapshot_read(spark, corpus_path).collect()
    }
    assert set(head) == {1, 2}
    assert "secret" not in head[1] and head[2] == rows[1][1]
    # pre-scrub content still at v1 (honesty until expire)
    assert (
        snapshot_read(spark, corpus_path, version=1)
        .filter(F.col("text").contains("secret"))
        .count()
        == 2
    )
