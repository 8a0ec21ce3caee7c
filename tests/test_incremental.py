"""Incremental dedup vs from-scratch batch recompute: the index is an
execution strategy, not a semantics change. Probing batch B against
index(A) (+ B's self-pairs) must yield exactly the candidate pairs
touching B that minhash_lsh_candidates finds over A ∪ B."""

import pytest
from pyspark.sql import functions as F

from xmidt_event_streams_spark.operators.dedup import (
    minhash_lsh_candidates,
    minhash_signatures_df,
)
from xmidt_event_streams_spark.operators.incremental import (
    append_to_minhash_index,
    incremental_dedup_candidates,
    incremental_dedup_mark,
    write_minhash_index,
)


def _docs(spark, sf="/root/testdata/sf0.01"):
    return spark.read.parquet(f"{sf}/documents.parquet").select("doc_id", "text")


def _pairs_touching(pairs_df, ids):
    return {
        (r["id_a"], r["id_b"])
        for r in pairs_df.collect()
        if r["id_a"] in ids or r["id_b"] in ids
    }


def _norm(cand_rows):
    return {
        (min(r["new_id"], r["dup_id"]), max(r["new_id"], r["dup_id"]))
        for r in cand_rows
    }


def test_incremental_equals_batch_recompute(spark, tmp_path):
    docs = _docs(spark)
    corpus = docs.filter(F.col("doc_id") % 3 != 0)
    batch = docs.filter(F.col("doc_id") % 3 == 0)
    batch_ids = {r["doc_id"] for r in batch.select("doc_id").collect()}

    idx = str(tmp_path / "mh_index")
    write_minhash_index(corpus, idx)

    inc = incremental_dedup_candidates(spark, idx, batch).collect()
    got = _norm(inc)

    full = minhash_lsh_candidates(corpus.unionByName(batch))
    want = _pairs_touching(full, batch_ids)

    assert got == want, (
        f"incremental != batch: only-inc {sorted(got - want)[:5]}, "
        f"only-batch {sorted(want - got)[:5]}"
    )
    assert want, "fixture should contain near-dup candidates"

    # agreement is the component-equality Jaccard estimate -- verify
    # against signatures computed directly
    sig = minhash_signatures_df(docs).collect()
    by_id = {r["doc_id"]: [r[f"h{i}"] for i in range(8)] for r in sig}
    for r in inc:
        sa, sb = by_id[r["new_id"]], by_id[r["dup_id"]]
        expect = sum(x == y for x, y in zip(sa, sb)) / 8
        assert abs(r["agreement"] - expect) < 1e-9


def test_append_then_probe_next_batch(spark, tmp_path):
    """Day-2 shape: append yesterday's batch, probe today's -- still
    identical to a from-scratch run over the full union."""
    docs = _docs(spark)
    corpus = docs.filter(F.col("doc_id") % 3 == 1)
    day1 = docs.filter(F.col("doc_id") % 3 == 2)
    day2 = docs.filter(F.col("doc_id") % 3 == 0)
    day2_ids = {r["doc_id"] for r in day2.select("doc_id").collect()}

    idx = str(tmp_path / "mh_index")
    write_minhash_index(corpus, idx)
    append_to_minhash_index(day1, idx)

    got = _norm(incremental_dedup_candidates(spark, idx, day2).collect())
    full = minhash_lsh_candidates(docs)
    want = _pairs_touching(full, day2_ids)
    assert got == want


def test_mark_survivors_deterministic(spark, tmp_path):
    docs = _docs(spark)
    corpus = docs.filter(F.col("doc_id") % 3 != 0)
    batch = docs.filter(F.col("doc_id") % 3 == 0)
    idx = str(tmp_path / "mh_index")
    write_minhash_index(corpus, idx)

    marks = incremental_dedup_mark(spark, idx, batch, min_agreement=0.5)
    rows = {r["doc_id"]: (r["is_unique"], r["dup_of"]) for r in marks.collect()}
    assert len(rows) == batch.count()  # one verdict per batch doc
    cands = {
        (r["new_id"], r["dup_id"]): r["agreement"]
        for r in incremental_dedup_candidates(spark, idx, batch).collect()
        if r["agreement"] >= 0.5
    }
    for doc, (uniq, dup_of) in rows.items():
        mine = [d for (n, d) in cands if n == doc]
        if mine:
            assert not uniq and dup_of == min(mine)
        else:
            assert uniq and dup_of is None

    # determinism: a second run yields the identical verdict set
    again = {
        r["doc_id"]: (r["is_unique"], r["dup_of"])
        for r in incremental_dedup_mark(
            spark, idx, batch, min_agreement=0.5
        ).collect()
    }
    assert again == rows


def test_probe_rejects_mismatched_parameters(spark, tmp_path):
    docs = _docs(spark).limit(50)
    idx = str(tmp_path / "mh_index")
    write_minhash_index(docs, idx, num_hashes=8, bands=4)
    with pytest.raises(ValueError, match="was built with"):
        incremental_dedup_candidates(spark, idx, docs, num_hashes=8, bands=2)


def test_index_layout_prefix_partitioned(spark, tmp_path):
    import os

    docs = _docs(spark)
    idx = str(tmp_path / "mh_index")
    write_minhash_index(docs, idx)
    prefixes = [d for d in os.listdir(idx) if d.startswith("bp=")]
    assert len(prefixes) > 64  # md5 prefixes cover the space uniformly
    # each partition dir written by one task -> exactly one data file
    inside = os.listdir(os.path.join(idx, prefixes[0]))
    assert sum(1 for f in inside if f.endswith(".parquet")) == 1


def test_cold_start_empty_index(spark, tmp_path):
    """An index initialized with zero data files is a valid empty
    relation (meta-derived explicit schema), not an inference error --
    the first probe of a cold-start ingest stream must work."""
    from xmidt_event_streams_spark.operators.incremental import (
        init_minhash_index,
    )

    idx = str(tmp_path / "cold_index")
    init_minhash_index(spark, idx, id_type="bigint")

    batch = _docs(spark).limit(20)
    cands = incremental_dedup_candidates(spark, idx, batch)
    # vs_old is empty; only new-vs-new pairs can appear
    ids = {r["doc_id"] for r in batch.select("doc_id").collect()}
    for r in cands.collect():
        assert r["new_id"] in ids and r["dup_id"] in ids

    marks = incremental_dedup_mark(spark, idx, batch)
    assert marks.count() == 20

    # first append folds the first batch in; a re-probe of the same
    # docs now sees them as indexed dups
    append_to_minhash_index(batch, idx)
    verdicts = incremental_dedup_mark(
        spark,
        idx,
        batch.withColumn("doc_id", F.col("doc_id") + 1_000_000),
    )
    assert verdicts.filter("is_unique").count() == 0


def test_cold_start_via_empty_frame_write(spark, tmp_path):
    """The documented alternative: write_minhash_index over an empty
    frame produces a probe-able empty index."""
    empty = _docs(spark).limit(0)
    idx = str(tmp_path / "cold_index2")
    write_minhash_index(empty, idx)
    batch = _docs(spark).limit(5)
    assert incremental_dedup_mark(spark, idx, batch).count() == 5


def test_meta_guard_on_hadoop_scheme_path(spark, tmp_path):
    """The parameter-mismatch guard must survive non-local-FS path
    handling: write and probe through an explicit file:-scheme URI
    (exercising the Hadoop FileSystem API, the same code path as
    hdfs:/s3a:) and assert the guard still raises."""
    docs = _docs(spark).limit(50)
    idx = "file://" + str(tmp_path / "mh_index_uri")
    write_minhash_index(docs, idx, num_hashes=8, bands=4)

    # meta went through the Hadoop FS: no plain-python artifact check,
    # the sidecar must be discoverable via the same scheme
    from xmidt_event_streams_spark.operators.incremental import _read_meta

    meta = _read_meta(spark, idx)
    assert meta is not None and meta["num_hashes"] == 8
    assert meta["id_type"] == "bigint"

    with pytest.raises(ValueError, match="was built with"):
        incremental_dedup_candidates(spark, idx, docs, num_hashes=8, bands=2)

    # matched-parameter probe works through the URI too
    assert incremental_dedup_mark(spark, idx, docs).count() == 50


def test_compaction_preserves_probe_results(spark, tmp_path):
    """compact_minhash_index drops replay-duplicate band rows (and
    tombstoned ids) without changing any probe verdict."""
    from xmidt_event_streams_spark.operators.incremental import (
        compact_minhash_index,
    )

    docs = _docs(spark)
    corpus = docs.filter(F.col("doc_id") % 3 != 0)
    batch = docs.filter(F.col("doc_id") % 3 == 0)

    idx = str(tmp_path / "mh_index")
    write_minhash_index(corpus, idx)
    # simulate replayed appends: the same day-1 batch folded twice
    day1 = corpus.limit(100)
    append_to_minhash_index(day1, idx)
    append_to_minhash_index(day1, idx)

    before = _norm(incremental_dedup_candidates(spark, idx, batch).collect())
    stats = compact_minhash_index(spark, idx)
    after = _norm(incremental_dedup_candidates(spark, idx, batch).collect())

    assert after == before
    assert stats["rows_after"] < stats["rows_before"]
    assert stats["files_after"] < stats["files_before"]

    # meta survives the swap: the guard still raises post-compaction
    with pytest.raises(ValueError, match="was built with"):
        incremental_dedup_candidates(spark, idx, batch, bands=2)


def test_compaction_tombstones(spark, tmp_path):
    """Tombstoned ids vanish from probe results after compaction."""
    from xmidt_event_streams_spark.operators.incremental import (
        compact_minhash_index,
    )

    docs = _docs(spark)
    corpus = docs.filter(F.col("doc_id") % 3 != 0)
    batch = docs.filter(F.col("doc_id") % 3 == 0)
    idx = str(tmp_path / "mh_index")
    write_minhash_index(corpus, idx)

    before = incremental_dedup_candidates(spark, idx, batch).collect()
    hit_ids = {r["dup_id"] for r in before} - {
        r["doc_id"] for r in batch.select("doc_id").collect()
    }
    assert hit_ids, "fixture should have index-side hits"
    dead = sorted(hit_ids)[:2]

    compact_minhash_index(spark, idx, tombstones=dead)
    after = incremental_dedup_candidates(spark, idx, batch).collect()
    want = {
        (r["new_id"], r["dup_id"]) for r in before if r["dup_id"] not in dead
    }
    assert {(r["new_id"], r["dup_id"]) for r in after} == want


def test_probe_gets_dynamic_partition_pruning(spark, tmp_path):
    """The index scan must carry a dynamicpruning expression on the
    bucket-prefix partition column -- the band keys are deterministic
    built-in md5 expressions, so DPP fires (unlike the Arrow-kernel
    LSH probe, which needs static pruning; see similarity.py). A
    regression here means every probe scans all 256 prefix dirs of a
    100 TB index."""
    docs = _docs(spark)
    idx = str(tmp_path / "mh_index")
    write_minhash_index(docs.filter(F.col("doc_id") % 3 != 0), idx)
    cands = incremental_dedup_candidates(
        spark, idx, docs.filter(F.col("doc_id") % 3 == 0).limit(20)
    )
    plan = cands._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    pf = [l for l in plan.splitlines() if "PartitionFilters" in l]
    assert pf and "dynamicpruning" in pf[0], pf


def test_compaction_through_scheme_path(spark, tmp_path):
    """Compaction's delete+rename swap must work through an explicit
    file:-scheme URI (the Hadoop FileSystem code path shared with
    hdfs:/s3a:), preserving probe results and the meta sidecar."""
    from xmidt_event_streams_spark.operators.incremental import (
        compact_minhash_index,
    )

    docs = _docs(spark).limit(300)
    idx = "file://" + str(tmp_path / "mh_uri")
    write_minhash_index(docs, idx)
    append_to_minhash_index(docs.limit(50), idx)  # replay-style dups

    probe = _docs(spark).filter(F.col("doc_id") % 7 == 0).limit(40)
    before = _norm(incremental_dedup_candidates(spark, idx, probe).collect())
    stats = compact_minhash_index(spark, idx)
    after = _norm(incremental_dedup_candidates(spark, idx, probe).collect())
    assert after == before
    assert stats["rows_after"] < stats["rows_before"]
    with pytest.raises(ValueError, match="was built with"):
        incremental_dedup_candidates(spark, idx, probe, bands=2)


def test_bulk_backfill_arm_matches_broadcast_arm(spark, tmp_path):
    """broadcast_new=False (the bulk-backfill shape: the 'new' batch
    is itself huge, so the probe degrades to a shuffled equi-join on
    the uniform bucket key) must return exactly the broadcast arm's
    candidates."""
    docs = _docs(spark)
    corpus = docs.filter(F.col("doc_id") % 3 != 0)
    batch = docs.filter(F.col("doc_id") % 3 == 0)
    idx = str(tmp_path / "mh_index")
    write_minhash_index(corpus, idx)

    a = _norm(
        incremental_dedup_candidates(
            spark, idx, batch, broadcast_new=True
        ).collect()
    )
    b = _norm(
        incremental_dedup_candidates(
            spark, idx, batch, broadcast_new=False
        ).collect()
    )
    assert a == b and a


class TestCrossCorpusDecontamination:
    """Near-dup tier of benchmark decontamination: corpus-vs-reference
    banded signatures, broadcast reference, never intra-corpus."""

    @staticmethod
    def _text(seed, n=10):
        return " ".join(f"{seed}tok{i}" for i in range(n))

    def _frames(self, spark):
        t = self._text
        corpus = spark.createDataFrame(
            [
                (1, t("bench0")),              # exact copy of ref 900
                (2, t("bench1") + " extra0 tail1"),  # near-dup of 901
                (3, t("clean0")),
                (4, t("clean1")),
                (5, t("clean0")),              # intra-corpus dup: must NOT drop
            ],
            "doc_id long, text string",
        )
        reference = spark.createDataFrame(
            [(900, t("bench0")), (901, t("bench1"))],
            "doc_id long, text string",
        )
        return corpus, reference

    def test_pairs_cross_only(self, spark):
        from xmidt_event_streams_spark.operators.incremental import (
            cross_corpus_candidates,
        )

        corpus, reference = self._frames(spark)
        pairs = cross_corpus_candidates(corpus, reference).collect()
        assert all(r["ref_id"] in (900, 901) for r in pairs)
        assert all(r["corpus_id"] in (1, 2) for r in pairs)
        exact = [r for r in pairs if r["corpus_id"] == 1][0]
        assert exact["agreement"] == 1.0

    def test_decontaminate_split_and_ledger(self, spark):
        from xmidt_event_streams_spark.operators.incremental import (
            decontaminate_near_dups,
        )

        corpus, reference = self._frames(spark)
        kept, dropped = decontaminate_near_dups(
            corpus, reference, min_agreement=0.5
        )
        kept_ids = {r["doc_id"] for r in kept.collect()}
        led = {
            r["doc_id"]: (r["contaminated_by"], r["agreement"])
            for r in dropped.collect()
        }
        # intra-corpus dup pair (3, 5) survives: decontamination only
        # ever measures against the reference
        assert kept_ids == {3, 4, 5}
        assert set(led) == {1, 2}
        assert led[1][0] == 900 and led[1][1] == 1.0
        assert led[2][0] == 901 and 0.5 <= led[2][1] <= 1.0
        assert sorted(kept.columns) == sorted(corpus.columns)

    def test_broadcast_off_equivalent(self, spark):
        from xmidt_event_streams_spark.operators.incremental import (
            cross_corpus_candidates,
        )

        corpus, reference = self._frames(spark)
        a = sorted(map(tuple, cross_corpus_candidates(
            corpus, reference, broadcast_reference=True).collect()))
        b = sorted(map(tuple, cross_corpus_candidates(
            corpus, reference, broadcast_reference=False).collect()))
        assert a == b


def test_minhash_sync_with_snapshot_table(spark, tmp_path):
    """The MinHash index follows a snapshot table through the change
    feed: bootstrap at the pinned head; updates replace the old
    signature (a near-dup probe of the OLD text stops matching);
    deletes stop answering; inserts answer; fork refusal on a fresh
    checkpoint over an existing index."""
    import pytest
    from pyspark.sql import functions as F

    from xmidt_event_streams_spark.operators.incremental import (
        incremental_dedup_candidates,
        sync_minhash_index_with_snapshot,
        write_minhash_index,
    )
    from xmidt_event_streams_spark.operators.snapshots import (
        snapshot_create,
        snapshot_merge,
    )

    base_text = "the quick brown fox jumps over the lazy dog again and again"
    other = "completely different content with no shared shingles at all here"
    table = str(tmp_path / "tab")
    snapshot_create(
        spark.createDataFrame(
            [(1, base_text), (2, other)], "doc_id bigint, text string"
        ),
        table,
        "doc_id",
    )
    ix = str(tmp_path / "mh")
    ck = str(tmp_path / "ck")

    def probes_matching(text):
        probe = spark.createDataFrame(
            [(99, text)], "doc_id bigint, text string"
        )
        return {
            r.dup_id
            for r in incremental_dedup_candidates(spark, ix, probe).collect()
        }

    r = sync_minhash_index_with_snapshot(spark, table, ix, ck)
    assert r["intervals"] == 0 and r["appended_docs"] == 2
    assert probes_matching(base_text) == {1}

    # update doc 1 away from base_text; insert doc 3 near it; delete 2
    ups = spark.createDataFrame(
        [(1, other + " rewritten edition"), (3, base_text + " encore")],
        "doc_id bigint, text string",
    ).withColumn("_deleted", F.lit(False))
    tomb = spark.createDataFrame(
        [(2, "x")], "doc_id bigint, text string"
    ).withColumn("_deleted", F.lit(True))
    snapshot_merge(spark, table, ups.unionByName(tomb))

    r2 = sync_minhash_index_with_snapshot(spark, table, ix, ck)
    assert r2["intervals"] == 1
    # old signature of doc 1 replaced: base_text now matches only doc 3
    assert probes_matching(base_text) == {3}
    # doc 2 deleted: its content stops answering
    got = probes_matching(other)
    assert 2 not in got and 1 in got  # doc 1's NEW text is near `other`

    # fork refusal
    write_minhash_index(
        spark.createDataFrame([(9, "stale")], "doc_id bigint, text string"),
        str(tmp_path / "mh2"),
    )
    with pytest.raises(ValueError, match="fork"):
        sync_minhash_index_with_snapshot(
            spark, table, str(tmp_path / "mh2"), str(tmp_path / "ck2")
        )
