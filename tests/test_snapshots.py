"""Snapshot-isolated keyed table (operators/snapshots.py): immutable
data files + atomic manifest commits. The contracts under test:

  * MERGE correctness (insert / replace / tombstone) at the head;
  * TIME TRAVEL: every prior version stays byte-stable under later
    merges;
  * READER ISOLATION: a plan resolved before a merge still reads its
    snapshot after the merge lands (the torn-read hazard the in-place
    keyed table has);
  * untouched buckets are inherited by file PATH (no rewrite);
  * optimistic concurrency: a lost manifest race is a typed conflict;
  * expire: GC of unreferenced files, and the takedown honesty rule —
    a tombstoned row is only GONE gone once every manifest that
    references its files has expired.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from xmidt_event_streams_spark.operators.snapshots import (
    SnapshotConflict,
    _manifest_path,
    _read_manifest,
    snapshot_create,
    snapshot_expire,
    snapshot_head,
    snapshot_merge,
    snapshot_read,
    snapshot_versions,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id int, text string")


def _content(df):
    return sorted((r.doc_id, r.text) for r in df.collect())


@pytest.fixture()
def table(spark, tmp_path):
    path = str(tmp_path / "snaptab")
    rows = [(i, f"doc {i}") for i in range(40)]
    assert snapshot_create(_df(spark, rows), path, "doc_id") == 1
    return path, rows


def test_merge_insert_replace_tombstone(spark, table):
    path, rows = table
    updates = _df(spark, [(1, "doc 1 v2"), (100, "new doc")]).withColumn(
        "_deleted", F.lit(False)
    )
    tomb = _df(spark, [(2, "ignored")]).withColumn("_deleted", F.lit(True))
    stats = snapshot_merge(spark, path, updates.unionByName(tomb))
    assert stats["version"] == 2
    assert stats["upserts"] == 2 and stats["deletes"] == 1
    expect = sorted(
        [(i, f"doc {i}") for i in range(40) if i not in (1, 2)]
        + [(1, "doc 1 v2"), (100, "new doc")]
    )
    assert _content(snapshot_read(spark, path)) == expect
    # time travel: v1 unchanged
    assert _content(snapshot_read(spark, path, version=1)) == sorted(rows)
    log = snapshot_versions(spark, path)
    assert [m["version"] for m in log] == [1, 2]
    assert log[1]["stats"] == {"upserts": 2, "deletes": 1}


def test_reader_isolation_across_merge(spark, table):
    path, rows = table
    pinned = snapshot_read(spark, path)  # plan resolved at v1
    snapshot_merge(
        spark,
        path,
        _df(spark, [(i, "rewritten") for i in range(40)]),
    )
    # the pinned plan still reads v1 content AFTER the merge landed
    assert _content(pinned) == sorted(rows)
    assert all(
        r.text == "rewritten" for r in snapshot_read(spark, path).collect()
    )


def test_untouched_buckets_inherited_by_path(spark, table):
    path, _ = table
    m1 = _read_manifest(spark, path, 1)
    snapshot_merge(spark, path, _df(spark, [(1, "doc 1 v2")]))
    m2 = _read_manifest(spark, path, 2)
    changed = [b for b in m1["buckets"] if m1["buckets"][b] != m2["buckets"].get(b)]
    assert len(changed) == 1  # exactly the bucket holding doc_id 1
    untouched = [b for b in m1["buckets"] if b not in changed]
    assert untouched and all(
        m2["buckets"][b] == m1["buckets"][b] for b in untouched
    )


def test_conflict_raises_typed_error(spark, table):
    path, _ = table
    # fabricate another writer winning version 2
    import json as _json

    from xmidt_event_streams_spark.fsutil import hadoop_fs

    fs, _, jvm = hadoop_fs(spark, path)
    head = _read_manifest(spark, path, 1)
    head["version"], head["parent"] = 2, 1
    out = fs.create(jvm.org.apache.hadoop.fs.Path(_manifest_path(path, 2)), True)
    try:
        out.write(bytearray(_json.dumps(head).encode()))
    finally:
        out.close()
    with pytest.raises(SnapshotConflict):
        # this writer read head BEFORE the fabricated commit... so
        # simulate by racing the same target version explicitly
        from xmidt_event_streams_spark.operators.snapshots import (
            _commit_manifest,
        )

        _commit_manifest(spark, path, 2, head)
    # table remains readable at the (fabricated) head
    assert snapshot_head(spark, path) == 2
    assert snapshot_read(spark, path, version=1).count() == 40


def test_expire_gc_and_takedown_honesty(spark, table):
    path, _ = table
    tomb = _df(spark, [(7, "x")]).withColumn("_deleted", F.lit(True))
    snapshot_merge(spark, path, tomb)  # v2: doc 7 tombstoned
    snapshot_merge(spark, path, _df(spark, [(8, "doc 8 v2")]))  # v3
    # takedown honesty: before expire, time travel still reads doc 7
    assert (
        snapshot_read(spark, path, version=1)
        .filter(F.col("doc_id") == 7)
        .count()
        == 1
    )
    res = snapshot_expire(spark, path, keep_last=2)
    assert res["expired_versions"] == [1]
    assert res["deleted_files"] > 0
    # v1 gone; v2/v3 intact; doc 7 unreachable at every surviving version
    with pytest.raises(ValueError):
        snapshot_read(spark, path, version=1)
    for v in (2, 3):
        assert (
            snapshot_read(spark, path, version=v)
            .filter(F.col("doc_id") == 7)
            .count()
            == 0
        )
    assert snapshot_read(spark, path).count() == 39


def test_expire_keeps_shared_files_alive(spark, table):
    path, _ = table
    snapshot_merge(spark, path, _df(spark, [(1, "v2")]))
    snapshot_merge(spark, path, _df(spark, [(2, "v3")]))
    # keep v2+v3: v2 still references most of v1's ORIGINAL files --
    # GC must not delete files a surviving manifest references
    snapshot_expire(spark, path, keep_last=2)
    assert snapshot_read(spark, path, version=2).count() == 40
    assert snapshot_read(spark, path, version=3).count() == 40


def test_duplicate_keys_rejected(spark, tmp_path):
    path = str(tmp_path / "dup")
    with pytest.raises(ValueError, match="unique"):
        snapshot_create(
            _df(spark, [(1, "a"), (1, "b")]), path, "doc_id"
        )
    snapshot_create(_df(spark, [(1, "a")]), path, "doc_id")
    with pytest.raises(ValueError, match="unique"):
        snapshot_merge(spark, path, _df(spark, [(2, "a"), (2, "b")]))


def test_create_refuses_existing_table(spark, table):
    path, _ = table
    with pytest.raises(ValueError, match="already"):
        snapshot_create(_df(spark, [(1, "a")]), path, "doc_id")


def test_corpus_diff_between_versions(spark, table):
    """Time travel composes with corpus_diff: release-to-release
    verdicts between any two snapshots of the same table."""
    from xmidt_event_streams_spark.corpus import corpus_diff

    path, _ = table
    ups = _df(spark, [(1, "changed"), (100, "added")]).withColumn(
        "_deleted", F.lit(False)
    )
    tomb = _df(spark, [(3, "x")]).withColumn("_deleted", F.lit(True))
    snapshot_merge(spark, path, ups.unionByName(tomb))
    old = snapshot_read(spark, path, version=1)
    new = snapshot_read(spark, path, version=2)
    diff = corpus_diff(old, new, id_col="doc_id", text_col="text")
    verdicts = {r.doc_id: r.status for r in diff.collect()}
    assert verdicts[1] == "changed"
    assert verdicts[100] == "added"
    assert verdicts[3] == "removed"


def test_snapshot_expire_as_maintenance_target(spark, table):
    from xmidt_event_streams_spark.maintenance import run_maintenance

    path, _ = table
    snapshot_merge(spark, path, _df(spark, [(1, "v2")]))
    snapshot_merge(spark, path, _df(spark, [(2, "v3")]))
    report = run_maintenance(spark, snapshot_tables=((path, 2),))
    assert report[path]["kind"] == "snapshot_expire"
    assert report[path]["expired_versions"] == [1]
    assert snapshot_head(spark, path) == 3


def test_expire_orphan_grace_period(spark, table):
    """Files referenced by NO manifest (in-flight merges, conflict
    losers) survive expire inside the grace window and are GC'd past
    it -- the Iceberg expire/orphan split. An immediate sweep would
    race an in-flight snapshot_merge, whose data files land BEFORE
    its manifest rename."""
    import os

    path, _ = table
    snapshot_merge(spark, path, _df(spark, [(1, "v2")]))
    snapshot_merge(spark, path, _df(spark, [(2, "v3")]))
    # simulate an in-flight merge: data file on disk, no manifest yet
    cdir = f"{path}/data/c00000099-000/_kbucket=zz"
    os.makedirs(cdir)
    orphan = f"{cdir}/part-inflight.parquet"
    with open(orphan, "wb") as f:
        f.write(b"not yet committed")
    res = snapshot_expire(spark, path, keep_last=2)
    assert os.path.exists(orphan), "in-flight file GC'd inside grace"
    assert res["deleted_orphans"] == 0
    assert res["deleted_files"] > 0  # expired v1-only files still go
    # past the grace window the same file IS an orphan to collect
    res2 = snapshot_expire(
        spark, path, keep_last=2, orphan_grace_hours=0.0
    )
    assert not os.path.exists(orphan)
    assert res2["deleted_orphans"] >= 1


def test_commit_claim_is_exclusive(spark, table):
    """The per-version claim file admits exactly one writer: a
    pre-existing claim (another writer mid-publish) forces
    SnapshotConflict even though the manifest itself is absent."""
    from xmidt_event_streams_spark.operators.snapshots import (
        _claim_path,
        _commit_manifest,
    )

    path, _ = table
    head = _read_manifest(spark, path, 1)
    head["version"], head["parent"] = 2, 1
    with open(_claim_path(path, 2), "wb"):
        pass  # rival writer holds the claim
    with pytest.raises(SnapshotConflict):
        _commit_manifest(spark, path, 2, head)
    # table unharmed: head is still v1, readable
    assert snapshot_head(spark, path) == 1
    assert snapshot_read(spark, path).count() == 40


def test_conflict_releases_claim_for_retry(spark, table):
    """A claim winner that cannot publish (out-of-band manifest at
    the destination) must RELEASE its claim -- otherwise the version
    becomes permanently unpublishable after a transient failure."""
    import os

    from xmidt_event_streams_spark.operators.snapshots import (
        _claim_path,
        _commit_manifest,
    )

    path, _ = table
    head = _read_manifest(spark, path, 1)
    head["version"], head["parent"] = 2, 1
    # fabricate an out-of-band v2 manifest (no claim)
    import json as _json

    from xmidt_event_streams_spark.fsutil import hadoop_fs

    fs, _, jvm = hadoop_fs(spark, path)
    out = fs.create(
        jvm.org.apache.hadoop.fs.Path(_manifest_path(path, 2)), True
    )
    try:
        out.write(bytearray(_json.dumps(head).encode()))
    finally:
        out.close()
    with pytest.raises(SnapshotConflict):
        _commit_manifest(spark, path, 2, head)
    assert not os.path.exists(_claim_path(path, 2)), (
        "claim must be released after a failed publish"
    )
    # the writer can still publish the NEXT version normally
    snapshot_merge(spark, path, _df(spark, [(0, "retry v3")]))
    assert snapshot_head(spark, path) == 3


def test_point_lookup_reads_only_key_buckets(spark, table):
    """snapshot_read_keys: verdicts identical to a full-read filter,
    while the scan lists ONLY the keys' buckets' files (manifest-level
    file skipping); time-travel variant sees the pre-merge row; a
    tombstoned key is absent at head; absent buckets yield an empty
    relation."""
    from xmidt_event_streams_spark.operators.snapshots import (
        snapshot_read_keys,
    )

    path, rows = table
    snapshot_merge(
        spark,
        path,
        _df(spark, [(7, "ignored")]).withColumn("_deleted", F.lit(True)),
    )

    got = snapshot_read_keys(spark, path, [3, 7, 11])
    assert _content(got) == _content(
        snapshot_read(spark, path).filter(F.col("doc_id").isin([3, 7, 11]))
    )
    assert {r.doc_id for r in got.collect()} == {3, 11}  # 7 tombstoned
    # time travel still surfaces 7 at v1
    v1 = snapshot_read_keys(spark, path, [7], version=1)
    assert [r.doc_id for r in v1.collect()] == [7]

    # pruning: the lookup plan reads a strict subset of the
    # manifest's files -- only the probed buckets'
    m = _read_manifest(spark, path, 2)
    total_files = sum(len(fl) for fl in m["buckets"].values())
    assert 0 < len(got.inputFiles()) < total_files

    # keys that hash to no live bucket: empty, not an error
    assert snapshot_read_keys(spark, path, [99999999]).count() == 0


def test_stale_claim_is_broken_after_grace(spark, table, monkeypatch):
    """A writer that crashed between claiming and renaming must not
    wedge the version forever: past CLAIM_GRACE_SEC with no published
    manifest, the next writer breaks the stale claim and commits."""
    import os

    from xmidt_event_streams_spark.operators import snapshots as S

    path, _ = table
    claim = S._claim_path(path, 2)
    with open(claim, "wb"):
        pass  # crashed claimant's leftover
    old = os.path.getmtime(claim) - 10_000
    os.utime(claim, (old, old))  # age it past any grace
    # fresh claim (inside grace) still blocks
    with pytest.raises(SnapshotConflict):
        monkeypatch.setattr(S, "CLAIM_GRACE_SEC", 1_000_000)
        snapshot_merge(spark, path, _df(spark, [(1, "blocked")]))
    # past grace: broken and committed
    monkeypatch.setattr(S, "CLAIM_GRACE_SEC", 60)
    stats = snapshot_merge(spark, path, _df(spark, [(1, "recovered")]))
    assert stats["version"] == 2
    assert snapshot_head(spark, path) == 2


def test_point_lookup_on_fully_tombstoned_table(spark, tmp_path):
    """A takedown-verification probe against a fully-tombstoned head
    returns ZERO rows (its success case), not an error; schema comes
    from an older manifest's files."""
    from xmidt_event_streams_spark.operators.snapshots import (
        snapshot_read_keys,
    )

    path = str(tmp_path / "tombed")
    snapshot_create(_df(spark, [(1, "a"), (2, "b")]), path, "doc_id")
    snapshot_merge(
        spark,
        path,
        _df(spark, [(1, "x"), (2, "x")]).withColumn(
            "_deleted", F.lit(True)
        ),
    )
    got = snapshot_read_keys(spark, path, [1, 2, 3])
    assert got.count() == 0
    assert set(got.columns) == {"doc_id", "text"}


def test_snapshot_changes_cdc_is_manifest_bounded(spark, table):
    """CDC between versions: insert/update/delete images exact;
    byte-identical bucket-rewrite rows suppressed; the scan reads
    only CHANGED buckets' files (manifest-bounded, not table-sized);
    multi-version spans compose (v1 -> v3 nets out)."""
    from xmidt_event_streams_spark.operators.snapshots import (
        snapshot_changes,
    )

    path, _ = table
    # v2: update doc 1, insert 100, delete 2
    snapshot_merge(
        spark,
        path,
        _df(spark, [(1, "doc 1 v2"), (100, "new doc")])
        .withColumn("_deleted", F.lit(False))
        .unionByName(
            _df(spark, [(2, "x")]).withColumn("_deleted", F.lit(True))
        ),
    )
    got = {
        r.doc_id: (r.text, r._change)
        for r in snapshot_changes(spark, path, 1, 2).collect()
    }
    assert got == {
        1: ("doc 1 v2", "update"),
        100: ("new doc", "insert"),
        2: ("doc 2", "delete"),  # before-image text
    }
    # bounded read: only the touched buckets' files are scanned
    m1, m2 = _read_manifest(spark, path, 1), _read_manifest(spark, path, 2)
    all_files = {
        f
        for m in (m1, m2)
        for fl in m["buckets"].values()
        for f in fl
    }
    changed_buckets = {
        b
        for b in set(m1["buckets"]) | set(m2["buckets"])
        if m1["buckets"].get(b) != m2["buckets"].get(b)
    }
    expect_files = {
        f
        for m in (m1, m2)
        for b in changed_buckets
        for f in m["buckets"].get(b, [])
    }
    def _norm(f):
        return "/" + f.split(":", 1)[1].lstrip("/")

    scanned = {_norm(f) for f in snapshot_changes(spark, path, 1, 2).inputFiles()}
    expect_norm = {_norm(f) for f in expect_files}
    assert scanned <= expect_norm and len(expect_files) < len(all_files)

    # v3: doc 1 updated again -- v1 -> v3 nets to a single update
    snapshot_merge(spark, path, _df(spark, [(1, "doc 1 v3")]))
    net = {
        r.doc_id: (r.text, r._change)
        for r in snapshot_changes(spark, path, 1).collect()
    }
    assert net[1] == ("doc 1 v3", "update")
    assert net[2][1] == "delete" and net[100][1] == "insert"
    # rows merely REWRITTEN by bucket compaction (same bytes) absent
    assert all(k in (1, 2, 100) for k in net)

    with pytest.raises(ValueError, match="precede"):
        snapshot_changes(spark, path, 2, 2)


def test_schema_evolution_add_column(spark, table):
    """Add-column evolution: the merge's new column is stamped into
    the manifest schema; pre-evolution files read null for it; time
    travel to v1 pins the NARROWER v1 schema; CDC images carry the
    evolved column set."""
    from xmidt_event_streams_spark.operators.snapshots import (
        snapshot_changes,
    )

    path, _ = table
    ups = spark.createDataFrame(
        [(1, "doc 1 v2", "en"), (100, "new doc", "fr")],
        "doc_id int, text string, lang string",
    )
    snapshot_merge(spark, path, ups)
    head = snapshot_read(spark, path)
    assert head.columns == ["doc_id", "text", "lang"]
    langs = {r.doc_id: r.lang for r in head.collect()}
    assert langs[1] == "en" and langs[100] == "fr"
    # rows kept from pre-evolution files: null, not an error
    assert langs[2] is None and head.count() == 41
    # time travel: v1 still presents its own (narrower) schema
    assert snapshot_read(spark, path, version=1).columns == [
        "doc_id",
        "text",
    ]
    # CDC images carry the evolved schema
    ch = snapshot_changes(spark, path, 1, 2)
    assert ch.columns == ["doc_id", "text", "lang", "_change"]
    got = {r.doc_id: (r.lang, r._change) for r in ch.collect()}
    assert got[1] == ("en", "update") and got[100] == ("fr", "insert")
    # a further merge WITHOUT the new column is refused (a merge row
    # replaces the whole row; silently nulling lang would be data
    # loss) -- callers must carry every table column
    with pytest.raises(ValueError, match="missing table columns"):
        snapshot_merge(spark, path, _df(spark, [(5, "v3")]))


def test_schema_evolution_refuses_type_change(spark, table):
    path, _ = table
    bad = spark.createDataFrame([(1, 5)], "doc_id int, text int")
    with pytest.raises(ValueError, match="ADDING columns only"):
        snapshot_merge(spark, path, bad)
    # table unharmed
    assert snapshot_head(spark, path) == 1


def test_empty_change_feed_is_empty_dataframe(spark, tmp_path):
    """A span with NO changed data files is an EMPTY change feed with
    the table schema + _change -- not an exception (CDC consumers
    poll this in a loop)."""
    from xmidt_event_streams_spark.operators.snapshots import (
        snapshot_changes,
    )

    path = str(tmp_path / "emptycdc")
    empty = spark.createDataFrame([], "doc_id int, text string")
    snapshot_create(empty, path, "doc_id")
    # v2: tombstone a key that never existed -> no data files anywhere
    tomb = _df(spark, [(1, "x")]).withColumn("_deleted", F.lit(True))
    snapshot_merge(spark, path, tomb)
    ch = snapshot_changes(spark, path, 1, 2)
    assert ch.count() == 0
    assert ch.columns == ["doc_id", "text", "_change"]


def test_point_lookup_non_string_cast_keys(spark, tmp_path):
    """Keys whose Python str() differs from Spark's cast-to-string
    (doubles: str(1e-7)='1e-07' vs Spark '1.0E-7') must still hit the
    right bucket -- the driver computes the bucket with Spark's own
    cast semantics instead of silently returning zero rows."""
    from xmidt_event_streams_spark.operators.snapshots import (
        snapshot_read_keys,
    )

    path = str(tmp_path / "dkeys")
    df = spark.createDataFrame(
        [(0.5, "a"), (1e-7, "b"), (2.25, "c"), (123.0, "d")],
        "k double, text string",
    )
    snapshot_create(df, path, "k")
    got = snapshot_read_keys(spark, path, [1e-7, 2.25])
    assert sorted(r.text for r in got.collect()) == ["b", "c"]
    # parity with the full-read filter
    assert _norm_rows(got) == _norm_rows(
        snapshot_read(spark, path).filter(F.col("k").isin([1e-7, 2.25]))
    )


def _norm_rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_commit_aborts_on_stolen_claim(spark, table, monkeypatch):
    """Token re-verify before the manifest rename: a writer whose
    claim was broken and re-taken by a stale-claim breaker (token
    mismatch) aborts WITHOUT publishing and WITHOUT deleting the
    rival's live claim -- the two-winner race the token closes."""
    from xmidt_event_streams_spark.operators import snapshots as S

    path, _ = table
    head = _read_manifest(spark, path, 1)
    head["version"], head["parent"] = 2, 1
    real = S._claim_version

    def steal(spark_, p, v, token):
        ok = real(spark_, p, v, token)
        with open(S._claim_path(p, v), "w") as f:
            f.write("rival-token")  # breaker re-took our claim
        return ok

    monkeypatch.setattr(S, "_claim_version", steal)
    with pytest.raises(SnapshotConflict, match="broken"):
        S._commit_manifest(spark, path, 2, head)
    # the rival's claim survives (it is not ours to delete)...
    with open(S._claim_path(path, 2)) as f:
        assert f.read() == "rival-token"
    # ...and nothing was published
    assert snapshot_head(spark, path) == 1


def test_follow_snapshot_changes_crash_replay(spark, table, tmp_path):
    """Checkpointed CDC follow: fresh checkpoint pins head without
    history; un-acked intervals are REDELIVERED identically (crash
    mid-interval); acked intervals never redeliver; acked batches
    tile the history with no lost or duplicated change rows."""
    from xmidt_event_streams_spark.operators.snapshots import (
        follow_snapshot_changes,
        snapshot_changes,
    )

    path, _ = table
    ckpt = str(tmp_path / "cdc_ckpt")

    # fresh checkpoint: pins v1, delivers nothing
    assert follow_snapshot_changes(spark, path, ckpt) is None
    assert follow_snapshot_changes(spark, path, ckpt) is None

    # v2 lands
    snapshot_merge(
        spark,
        path,
        _df(spark, [(1, "v2"), (100, "new")]).unionByName(
            _df(spark, [(2, "x")]).withColumn("_deleted", F.lit(True)),
            allowMissingColumns=True,
        ).withColumn("_deleted", F.coalesce("_deleted", F.lit(False))),
    )
    b1 = follow_snapshot_changes(spark, path, ckpt)
    assert (b1["from_version"], b1["to_version"]) == (1, 2)
    rows1 = sorted(tuple(r) for r in b1["changes"].collect())
    assert len(rows1) == 3

    # crash BEFORE ack: the same interval is redelivered, identical
    b1again = follow_snapshot_changes(spark, path, ckpt)
    assert (b1again["from_version"], b1again["to_version"]) == (1, 2)
    assert sorted(tuple(r) for r in b1again["changes"].collect()) == rows1
    b1again["ack"]()

    # acked: not redelivered
    assert follow_snapshot_changes(spark, path, ckpt) is None

    # v3, v4 land before the next poll: ONE interval covers both
    snapshot_merge(spark, path, _df(spark, [(5, "v3")]))
    snapshot_merge(spark, path, _df(spark, [(6, "v4")]))
    b2 = follow_snapshot_changes(spark, path, ckpt)
    assert (b2["from_version"], b2["to_version"]) == (2, 4)
    rows2 = sorted(tuple(r) for r in b2["changes"].collect())
    b2["ack"]()
    assert follow_snapshot_changes(spark, path, ckpt) is None

    # tiling: acked batches together equal the full-span change feed
    full = sorted(
        tuple(r) for r in snapshot_changes(spark, path, 1, 4).collect()
    )
    # rows changed in BOTH intervals net out in the full span only if
    # keys overlap; here they don't, so concatenation must match
    assert sorted(rows1 + rows2) == full

    # a checkpoint is bound to its table
    import pytest as _pytest

    other = str(tmp_path / "other_table")
    snapshot_create(_df(spark, [(1, "a")]), other, "doc_id")
    with _pytest.raises(ValueError, match="follows"):
        follow_snapshot_changes(spark, other, ckpt)


def test_follow_raises_when_cursor_expired(spark, table, tmp_path):
    """An expired cursor version is LOUD (exact changes are gone;
    silently skipping the gap would be data loss)."""
    from xmidt_event_streams_spark.operators.snapshots import (
        follow_snapshot_changes,
    )

    path, _ = table
    ckpt = str(tmp_path / "lagging")
    assert follow_snapshot_changes(spark, path, ckpt) is None  # pins v1
    snapshot_merge(spark, path, _df(spark, [(1, "v2")]))
    snapshot_merge(spark, path, _df(spark, [(2, "v3")]))
    snapshot_expire(spark, path, keep_last=2)  # v1 (the cursor) gone
    with pytest.raises(ValueError, match="expired"):
        follow_snapshot_changes(spark, path, ckpt)


def test_replicate_snapshot_end_to_end(spark, table, tmp_path):
    """CDC replication: bootstrap pins the source head; each drain
    applies only the change volume; replayed intervals (crash before
    ack) cannot fork the replica; schema evolution propagates; a
    stale replica under a fresh checkpoint is refused."""
    from xmidt_event_streams_spark.operators.snapshots import (
        replicate_snapshot,
    )

    path, rows = table
    dst = str(tmp_path / "replica")
    ckpt = str(tmp_path / "repl_ckpt")

    r = replicate_snapshot(spark, path, dst, ckpt)
    assert r["intervals"] == 0 and r["src_version"] == 1
    assert _content(snapshot_read(spark, dst)) == sorted(rows)

    # source advances: update, insert, delete; then another merge
    snapshot_merge(
        spark,
        path,
        _df(spark, [(1, "v2"), (100, "new")])
        .withColumn("_deleted", F.lit(False))
        .unionByName(
            _df(spark, [(2, "x")]).withColumn("_deleted", F.lit(True))
        ),
    )
    snapshot_merge(spark, path, _df(spark, [(5, "v3")]))
    r2 = replicate_snapshot(spark, path, dst, ckpt)
    assert r2["intervals"] == 1 and r2["src_version"] == 3
    assert _content(snapshot_read(spark, dst)) == _content(
        snapshot_read(spark, path)
    )
    # change-volume-bounded: the drain applied ~4 rows, not the table
    assert r2["rows_applied"] <= 6

    # replay safety: re-apply the SAME interval manually (as a crash
    # between merge and ack would) -- the replica must not fork
    from xmidt_event_streams_spark.operators.snapshots import (
        snapshot_changes,
    )

    ch = snapshot_changes(spark, path, 1, 3)
    data_cols = [c for c in ch.columns if c != "_change"]
    replay = ch.select(
        *data_cols, (F.col("_change") == "delete").alias("_deleted")
    )
    snapshot_merge(spark, dst, replay)
    assert _content(snapshot_read(spark, dst)) == _content(
        snapshot_read(spark, path)
    )

    # schema evolution propagates through the feed
    snapshot_merge(
        spark,
        path,
        spark.createDataFrame(
            [(7, "doc 7 v4", "en")], "doc_id int, text string, lang string"
        ),
    )
    r3 = replicate_snapshot(spark, path, dst, ckpt)
    assert r3["intervals"] == 1
    got = snapshot_read(spark, dst)
    assert got.columns == ["doc_id", "text", "lang"]
    assert {r.lang for r in got.filter("doc_id = 7").collect()} == {"en"}

    # idle drain: nothing pending
    assert replicate_snapshot(spark, path, dst, ckpt)["intervals"] == 0

    # fresh checkpoint + existing replica = refused (silent fork)
    with pytest.raises(ValueError, match="fork"):
        replicate_snapshot(
            spark, path, dst, str(tmp_path / "fresh_ckpt")
        )


def test_replication_survives_replica_expire(spark, table, tmp_path):
    """The replica is a real snapshot table with its OWN expire; once
    its v00000001.json is gone, the next drain must still see the
    replica as existing (ANY retained manifest counts) instead of
    taking the crashed-bootstrap branch and crashing into
    snapshot_create on a live table -- the wedge that probing
    version 1 specifically caused."""
    from xmidt_event_streams_spark.operators.snapshots import (
        replicate_snapshot,
    )

    path, _ = table
    dst = str(tmp_path / "replica")
    ckpt = str(tmp_path / "repl_ckpt")
    replicate_snapshot(spark, path, dst, ckpt)  # bootstrap (replica v1)

    snapshot_merge(spark, path, _df(spark, [(1, "v2")]))
    replicate_snapshot(spark, path, dst, ckpt)  # replica v2
    # replica-side maintenance drops v1 (keep_last=1)
    snapshot_expire(spark, dst, keep_last=1, orphan_grace_hours=0)
    assert snapshot_head(spark, dst) == 2

    snapshot_merge(spark, path, _df(spark, [(2, "v3"), (200, "new")]))
    r = replicate_snapshot(spark, path, dst, ckpt)  # must not wedge
    assert r["intervals"] == 1
    assert _content(snapshot_read(spark, dst)) == _content(
        snapshot_read(spark, path)
    )


def test_point_lookup_large_key_set_bounded_plan(spark, tmp_path):
    """A 10k-key point lookup must not build a 10k-literal IN: above
    SMALL_FETCH_IDS the residual filter rides the fetch operator's
    broadcast semi-join (bucket pruning still bounds the file list),
    and the plan stays O(MAX_FETCH_INTERVALS) regardless of key
    count. Results stay exact vs the full-read filter."""
    from xmidt_event_streams_spark.operators.snapshots import (
        snapshot_read_keys,
    )

    path = str(tmp_path / "bigkeys")
    rows = [(i, f"doc {i}") for i in range(5000)]
    snapshot_create(_df(spark, rows), path, "doc_id")
    keys = list(range(0, 5000, 2)) + list(range(9000, 16500))  # >10k
    got = snapshot_read_keys(spark, path, keys)
    plan = got._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert "LeftSemi" in plan, plan
    # no literal-IN over the key set: the longest IN list in the plan
    # stays at the fetch small-set bound, not the 10k keys
    import re

    for m in re.finditer(r"\bIN \(([^)]*)\)", plan):
        assert m.group(1).count(",") < 64, m.group(0)[:200]
    assert got.count() == 2500
    assert {r.doc_id for r in got.limit(5).collect()} <= set(keys)


def test_point_lookup_int_keys_on_string_keyed_table(spark, tmp_path):
    """Integer keys against a STRING key column, above the small-set
    threshold: the fetch routing must build its id relation in the
    COLUMN's type (str(int) == Spark's int->string cast), not crash
    createDataFrame's strict verification with int rows under a
    string schema -- the 32-key isin path always handled this, so the
    33+-key path must too."""
    from xmidt_event_streams_spark.operators.snapshots import (
        snapshot_read_keys,
    )

    path = str(tmp_path / "strkeys")
    snapshot_create(
        spark.createDataFrame(
            [(str(i), f"doc {i}") for i in range(200)],
            "k string, text string",
        ),
        path,
        "k",
    )
    got = snapshot_read_keys(spark, path, list(range(100)))
    assert got.count() == 100
    assert {r.k for r in got.limit(3).collect()} <= {
        str(i) for i in range(100)
    }


def test_rebucket_layout_evolution(spark, tmp_path):
    """snapshot_rebucket: create at 16 buckets -> rebucket to 256 ->
    content, point lookups, and CDC are correct on BOTH sides of the
    boundary (bucket generation is per-manifest); the cross-boundary
    change feed is empty (movement, not change); merges keep working
    under the new layout; expire GCs the old generation's files."""
    import re

    from xmidt_event_streams_spark.operators.snapshots import (
        snapshot_changes,
        snapshot_read_keys,
        snapshot_rebucket,
    )

    path = str(tmp_path / "rebucket")
    rows = [(i, f"doc {i}") for i in range(120)]
    snapshot_create(_df(spark, rows), path, "doc_id", bucket_hex=1)
    snapshot_merge(spark, path, _df(spark, [(5, "v2"), (200, "new")]))

    r = snapshot_rebucket(spark, path, 2)
    assert r["version"] == 3 and r["bucket_hex"] == 2
    m3 = _read_manifest(spark, path, 3)
    assert m3["bucket_hex"] == 2
    assert all(len(b) == 2 for b in m3["buckets"])
    # content identical across the boundary
    assert _content(snapshot_read(spark, path)) == _content(
        snapshot_read(spark, path, version=2)
    )
    # cross-boundary CDC: pure movement, zero change rows
    assert snapshot_changes(spark, path, 2, 3).count() == 0
    # point lookups pick each version's own generation
    assert {
        r.doc_id for r in snapshot_read_keys(spark, path, [5, 200]).collect()
    } == {5, 200}
    assert {
        r.doc_id
        for r in snapshot_read_keys(spark, path, [5, 200], version=2).collect()
    } == {5, 200}
    assert [
        r.text for r in snapshot_read_keys(spark, path, [7], version=1).collect()
    ] == ["doc 7"]

    # merges keep working under the new layout (head generation)
    snapshot_merge(spark, path, _df(spark, [(5, "v4")]))
    assert [
        r.text for r in snapshot_read_keys(spark, path, [5]).collect()
    ] == ["v4"]
    m4 = _read_manifest(spark, path, 4)
    assert m4["bucket_hex"] == 2

    # no-op rebucket commits nothing
    assert snapshot_rebucket(spark, path, 2)["version"] == 4

    # expire past the boundary GCs the old generation's files
    import os

    old_gen = [
        f
        for v in (1, 2)
        for fl in _read_manifest(spark, path, v)["buckets"].values()
        for f in fl
    ]
    rep = snapshot_expire(spark, path, keep_last=2, orphan_grace_hours=0)
    assert rep["expired_versions"] == [1, 2]
    for f in old_gen:
        local = re.sub(r"^file:(//)?", "", f)
        assert not os.path.exists(local), f


def test_replication_as_maintenance_target(spark, table, tmp_path):
    """One maintenance window drains the replica BEFORE expiring the
    source -- the operational pairing that keeps a lagging follower
    inside retained history."""
    from xmidt_event_streams_spark.maintenance import run_maintenance
    from xmidt_event_streams_spark.operators.snapshots import (
        replicate_snapshot,
    )

    path, _ = table
    dst = str(tmp_path / "mrep")
    ckpt = str(tmp_path / "mrep_ckpt")
    replicate_snapshot(spark, path, dst, ckpt)  # bootstrap at v1
    snapshot_merge(spark, path, _df(spark, [(1, "v2")]))
    snapshot_merge(spark, path, _df(spark, [(2, "v3")]))
    report = run_maintenance(
        spark,
        replications=((path, dst, ckpt),),
        snapshot_tables=((path, 1),),  # expire would strand a lagger
    )
    assert report[dst]["kind"] == "snapshot_replicate"
    assert report[dst]["src_version"] == 3
    assert "error" not in report[dst]
    assert report[path]["kind"] == "snapshot_expire"
    # replica caught up even though only v3 survived the expire
    assert _content(snapshot_read(spark, dst)) == _content(
        snapshot_read(spark, path)
    )


def test_legacy_table_merge_keeps_missing_column_guard(spark, table):
    """Pre-schema-stamp tables (legacy manifests) must still REFUSE a
    merge that omits an existing column -- silently adopting the
    update's narrower schema would drop the column table-wide (the
    review's data-loss finding)."""
    import json as _json

    from xmidt_event_streams_spark.fsutil import hadoop_fs

    path, _ = table
    # strip the schema stamp to simulate a pre-r7 manifest
    m = _read_manifest(spark, path, 1)
    del m["schema"]
    fs, _, jvm = hadoop_fs(spark, path)
    out = fs.create(jvm.org.apache.hadoop.fs.Path(_manifest_path(path, 1)), True)
    try:
        out.write(bytearray(_json.dumps(m).encode()))
    finally:
        out.close()
    bad = spark.createDataFrame([(1,)], "doc_id int")
    with pytest.raises(ValueError, match="missing table columns"):
        snapshot_merge(spark, path, bad)
    # type changes refused on legacy tables too
    with pytest.raises(ValueError, match="ADDING columns only"):
        snapshot_merge(
            spark, path, spark.createDataFrame([(1, 5)], "doc_id int, text int")
        )
    # a full-width merge still works and re-stamps the schema
    snapshot_merge(spark, path, _df(spark, [(1, "legacy v2")]))
    m2 = _read_manifest(spark, path, 2)
    assert m2["schema"] == [["doc_id", "int"], ["text", "string"]]


def test_commits_dir_stays_clean_and_cursor_never_vanishes(
    spark, table, tmp_path
):
    """Publish must not litter _commits (one orphaned .crc per commit
    would bloat every listStatus forever), and cursor acks must leave
    a readable cursor at every step (the delete-then-rename crash
    window deleted it outright)."""
    import os

    from xmidt_event_streams_spark.operators.snapshots import (
        _read_follow_cursor,
        follow_snapshot_changes,
    )

    path, _ = table
    ckpt = str(tmp_path / "ck")
    assert follow_snapshot_changes(spark, path, ckpt) is None
    for i in range(3):
        snapshot_merge(spark, path, _df(spark, [(i, f"round {i}")]))
        b = follow_snapshot_changes(spark, path, ckpt)
        b["ack"]()
        cur = _read_follow_cursor(spark, ckpt)
        assert cur is not None and cur["version"] == i + 2
    # manifests + claims only (claims are GC'd by expire, by design);
    # no tmp manifests and no orphaned .crc sidecars of consumed tmps
    commits = sorted(os.listdir(f"{path}/_commits"))
    stray = [
        f for f in commits if ".tmp" in f or f.endswith(".crc")
    ]
    assert not stray, commits
    assert [f for f in commits if f.startswith("v")] == [
        f"v{v:08d}.json" for v in range(1, 5)
    ], commits
    ck_files = {f for f in os.listdir(ckpt) if not f.endswith(".crc")}
    assert ck_files == {"cursor.json"}, ck_files


def test_rebucket_as_maintenance_target(spark, table, tmp_path):
    """run_maintenance(snapshot_rebuckets=...): the layout evolution
    commits inside the window, before expiry; point lookups work
    under the new generation."""
    from xmidt_event_streams_spark.maintenance import run_maintenance
    from xmidt_event_streams_spark.operators.snapshots import (
        snapshot_read_keys,
    )

    path, _ = table
    rep = run_maintenance(
        spark,
        snapshot_rebuckets=((path, 3),),
        snapshot_tables=((path, 2),),
    )
    assert rep[path]["kind"] == "snapshot_rebucket"
    assert rep[path]["bucket_hex"] == 3
    assert rep[f"{path}#snapshot_expire"]["kept_versions"] == [1, 2]
    assert snapshot_read_keys(spark, path, [5]).count() == 1
