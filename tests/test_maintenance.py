"""run_maintenance: one window, three compactor kinds, one report;
a failing target records its error without stopping the rest."""

from __future__ import annotations

from pyspark.sql import functions as F

from xmidt_event_streams_spark.maintenance import run_maintenance


def test_all_kinds_in_one_window(spark, tmp_path):
    from xmidt_event_streams_spark.operators.incremental import (
        append_to_minhash_index,
        write_minhash_index,
    )
    from xmidt_event_streams_spark.streaming.ingest_dedup import (
        idempotent_batch_append,
    )
    from xmidt_event_streams_spark.streaming.rollup import (
        read_rollup,
        rollup_partial,
    )

    # ingest sink with 5 tiny batch partitions
    sink = str(tmp_path / "sink")
    for b in range(5):
        idempotent_batch_append(
            spark.createDataFrame([(b, f"d{b}")], "doc_id long, text string"),
            b, sink, max_files=1,
        )
    # minhash index with a replay-duplicated append
    index = str(tmp_path / "index")
    docs = spark.createDataFrame(
        [(i, f"document number {i} with words to shingle here. " * 3)
         for i in range(4)],
        "doc_id long, text string",
    )
    write_minhash_index(docs, index)
    append_to_minhash_index(docs.filter("doc_id = 0"), index)  # dup rows
    # rollup with 3 partials
    roll = str(tmp_path / "roll")
    m = {"n": ("count", "v")}
    for b in range(3):
        idempotent_batch_append(
            rollup_partial(
                spark.createDataFrame([("a", 1.0)], "k string, v double"),
                ["k"], m,
            ),
            b, roll, max_files=1,
        )

    # window-hash index with a replay-duplicated append
    from xmidt_event_streams_spark.operators.spandedup import (
        append_to_window_index,
        write_window_index,
    )

    widx = str(tmp_path / "widx")
    write_window_index(docs, widx, window=5, src_batch=1)
    append_to_window_index(docs.filter("doc_id = 0"), widx, src_batch=1)

    report = run_maintenance(
        spark,
        ingest_sinks=(sink,),
        minhash_indexes=(index,),
        window_indexes=(widx,),
        rollups=((roll, ["k"], m),),
        batches_per_partition=10,
    )
    assert report[sink]["kind"] == "ingest_sink" and "error" not in report[sink]
    assert report[index]["kind"] == "minhash_index" and "error" not in report[index]
    assert report[widx]["kind"] == "window_index" and "error" not in report[widx]
    assert report[widx]["rows_after"] < report[widx]["rows_before"]
    assert report[roll]["kind"] == "rollup" and "error" not in report[roll]
    # the compacted state still answers correctly
    assert spark.read.parquet(sink).count() == 5
    assert read_rollup(spark, roll, ["k"], m).collect()[0]["n"] == 3


def test_failing_target_is_isolated(spark, tmp_path):
    from xmidt_event_streams_spark.streaming.ingest_dedup import (
        idempotent_batch_append,
    )

    good = str(tmp_path / "good")
    idempotent_batch_append(
        spark.createDataFrame([(1, "x")], "doc_id long, text string"),
        0, good, max_files=1,
    )
    bad = str(tmp_path / "missing")  # nothing there
    report = run_maintenance(spark, ingest_sinks=(bad, good))
    assert "error" in report[bad]
    assert "error" not in report[good]


def test_ivf_drift_target_reports_verdict(spark, tmp_path):
    from xmidt_event_streams_spark.maintenance import run_maintenance
    from xmidt_event_streams_spark.operators.ivf import write_ivf_index
    from xmidt_event_streams_spark.operators.similarity import (
        deterministic_planes,
    )

    idx = tmp_path / "ivf"
    cents = deterministic_planes(4, 8, seed="maint")
    vecs = spark.createDataFrame(
        [(i, [((i * (d + 3)) % 17) / 17.0 + 0.05 for d in range(8)])
         for i in range(32)],
        "vec_id long, embedding array<double>",
    )
    write_ivf_index(vecs, str(idx), cents)
    report = run_maintenance(spark, ivf_indexes=(str(idx),))
    entry = report[str(idx)]
    assert entry["kind"] == "ivf_drift"
    assert entry["verdict"] == "stable" and "error" not in entry
    # read-only: a second check still sees the same baseline
    report2 = run_maintenance(spark, ivf_indexes=(str(idx),))
    assert report2[str(idx)]["psi"] == entry["psi"]


def _fake_checkpoint(tmp_path, name, *, offsets=(), commits=()):
    """Fabricate a structured-streaming checkpoint layout: the guard
    reads only file mtimes under offsets/ and commits/."""
    import os

    ckpt = tmp_path / name
    (ckpt / "offsets").mkdir(parents=True)
    (ckpt / "commits").mkdir(parents=True)
    for n, age_sec in offsets:
        p = ckpt / "offsets" / str(n)
        p.write_text("{}")
        os.utime(p, times=(p.stat().st_atime, p.stat().st_mtime - age_sec))
    for n, age_sec in commits:
        p = ckpt / "commits" / str(n)
        p.write_text("{}")
        os.utime(p, times=(p.stat().st_atime, p.stat().st_mtime - age_sec))
    return str(ckpt)


def test_guard_refuses_recent_commit(spark, tmp_path):
    """A commit inside the quiesce window means the stream was writing
    moments ago: the whole window refuses before compacting anything."""
    import pytest

    from xmidt_event_streams_spark.maintenance import WriterActiveError
    from xmidt_event_streams_spark.streaming.ingest_dedup import (
        idempotent_batch_append,
    )

    sink = str(tmp_path / "sink")
    idempotent_batch_append(
        spark.createDataFrame([(1, "a")], "id long, v string"), 0, sink
    )
    ckpt = _fake_checkpoint(
        tmp_path, "ckpt", offsets=((0, 5),), commits=((0, 5),)
    )
    with pytest.raises(WriterActiveError, match="quiesce"):
        run_maintenance(
            spark, ingest_sinks=(sink,), checkpoints={sink: ckpt}
        )
    # force=True overrides; the compactor then runs normally
    report = run_maintenance(
        spark, ingest_sinks=(sink,), checkpoints={sink: ckpt}, force=True
    )
    assert report[sink]["kind"] == "ingest_sink"
    assert "error" not in report[sink]


def test_guard_refuses_inflight_batch(spark, tmp_path):
    """offsets/<n> newer than the newest commit == a batch mid-flight:
    refused regardless of age or quiesce window."""
    import pytest

    from xmidt_event_streams_spark.maintenance import WriterActiveError

    sink = str(tmp_path / "sink2")
    ckpt = _fake_checkpoint(
        tmp_path, "ckpt2", offsets=((0, 9000), (1, 7000)), commits=((0, 9000),)
    )
    with pytest.raises(WriterActiveError, match="in-flight"):
        run_maintenance(
            spark,
            ingest_sinks=(sink,),
            checkpoints={sink: ckpt},
            writer_quiesce_sec=0,
        )


def test_guard_allows_quiesced_and_unstarted(spark, tmp_path):
    """Old commits beyond the quiesce window pass; so does a
    checkpoint that never started; unguarded targets are untouched
    by the checkpoints of other paths."""
    from xmidt_event_streams_spark.streaming.ingest_dedup import (
        idempotent_batch_append,
    )

    sink = str(tmp_path / "sink3")
    idempotent_batch_append(
        spark.createDataFrame([(1, "a")], "id long, v string"), 0, sink
    )
    quiesced = _fake_checkpoint(
        tmp_path, "ckpt3", offsets=((0, 9000),), commits=((0, 9000),)
    )
    never_started = str(tmp_path / "ckpt4")  # no dirs at all
    report = run_maintenance(
        spark,
        ingest_sinks=(sink,),
        checkpoints={sink: quiesced, str(tmp_path / "other"): never_started},
    )
    assert "error" not in report[sink]


def test_same_path_as_two_targets_keeps_both_reports(spark, tmp_path):
    """An IVF index both drift-checked and compacted in one window
    must surface BOTH entries (the compaction previously overwrote
    the drift verdict in the path-keyed report)."""
    from xmidt_event_streams_spark.maintenance import run_maintenance
    from xmidt_event_streams_spark.operators.ivf import (
        append_to_ivf_index,
        write_ivf_index,
    )
    from xmidt_event_streams_spark.operators.similarity import (
        deterministic_planes,
    )

    dim = 8
    idx = str(tmp_path / "both")
    cents = deterministic_planes(4, dim, seed="vec-ingest")
    base = spark.createDataFrame(
        [(i, [((i * (d + 3)) % 17) / 17.0 + 0.05 for d in range(dim)])
         for i in range(32)],
        "vec_id long, embedding array<double>",
    )
    write_ivf_index(base, idx, cents)
    report = run_maintenance(
        spark, ivf_indexes=(idx,), ivf_compactions=(idx,)
    )
    kinds = {v["kind"] for v in report.values()}
    assert {"ivf_drift", "ivf_index"} <= kinds
    assert len([k for k in report if k.startswith(idx)]) == 2


class TestSwapRecovery:
    """fsutil.recover_swap + the run_maintenance(swap_recoveries=)
    pre-step: the compactor swap's one non-atomic window (dst deleted,
    tmp not yet renamed) is recoverable because tmp IS the complete
    replacement -- verified by crashing a fake swap at each point."""

    def _index(self, spark, path):
        from xmidt_event_streams_spark.operators.ivf import (
            kmeans_fit,
            write_ivf_index,
        )

        emb = spark.createDataFrame(
            [(i, [float(i % 7), float(i % 3), 1.0, 0.5]) for i in range(60)],
            "vec_id long, embedding array<double>",
        )
        cents = kmeans_fit(emb, 4, 2)
        write_ivf_index(emb, path, cents)
        return emb, cents

    def _probe(self, spark, path):
        from xmidt_event_streams_spark.operators.ivf import (
            probe_ivf_index,
        )

        qdf = spark.createDataFrame(
            [(999, [1.0, 1.0, 1.0, 0.5])],
            "vec_id long, embedding array<double>",
        )
        return sorted(
            (r["query_id"], r["vec_id"], r["rank"])
            for r in probe_ivf_index(
                spark, path, qdf, k=5, n_probe=4
            ).collect()
        )

    def test_crash_between_delete_and_rename_is_completed(
        self, spark, tmp_path
    ):
        import shutil

        from xmidt_event_streams_spark.fsutil import recover_swap

        path = str(tmp_path / "ix")
        self._index(spark, path)
        want = self._probe(spark, path)
        # simulate the crash window: replacement fully written to tmp,
        # dst deleted, rename never happened
        tmp = path + "__compact_tmp"
        shutil.copytree(path, tmp)
        shutil.rmtree(path)
        out = recover_swap(spark, path)
        assert out["completed"] == [tmp] and not out["removed"]
        assert self._probe(spark, path) == want

    def test_stale_tmp_next_to_live_index_is_removed(
        self, spark, tmp_path
    ):
        import os
        import shutil

        from xmidt_event_streams_spark.fsutil import recover_swap

        path = str(tmp_path / "ix")
        self._index(spark, path)
        tmp = path + "__rebuild_tmp"
        shutil.copytree(path, tmp)
        out = recover_swap(spark, path)
        assert out["removed"] == [tmp] and not out["completed"]
        assert not os.path.exists(tmp) and os.path.exists(path)

    def test_incomplete_tmp_with_missing_index_refuses(
        self, spark, tmp_path
    ):
        import os

        import pytest

        from xmidt_event_streams_spark.fsutil import recover_swap

        path = str(tmp_path / "ix")
        tmp = path + "__compact_tmp"
        os.makedirs(tmp)  # no parquet inside, no live index
        with pytest.raises(IOError, match="recover by hand"):
            recover_swap(spark, path)

    def test_clean_path_is_noop_and_window_wiring(self, spark, tmp_path):
        import shutil

        path = str(tmp_path / "ix")
        self._index(spark, path)
        # one crashed swap + one clean path through the window pre-step
        tmp = path + "__compact_tmp"
        shutil.copytree(path, tmp)
        shutil.rmtree(path)
        clean = str(tmp_path / "ix2")
        self._index(spark, clean)
        report = run_maintenance(
            spark, swap_recoveries=(path, clean)
        )
        assert report[path]["kind"] == "swap_recovery"
        assert report[path]["completed"] == [tmp]
        assert report[clean]["completed"] == []
        assert report[clean]["removed"] == []

    def test_two_complete_tmps_newest_wins(self, spark, tmp_path):
        """r9 (ADVICE fix): with BOTH suffixes holding complete tmps
        and dst missing, the later maintenance attempt must win --
        suffix order would resurrect the older layout. Recency is the
        ``_SUCCESS`` MARKER's mtime (r10): directory mtimes are
        synthetic (often 0) on object stores like S3A, so the
        directory-status tiebreak was arbitrary exactly where crash
        recovery matters most. The older tmp's DIRECTORY is left
        newer here on purpose -- the marker must decide anyway.
        Completeness is the committer's _SUCCESS marker, not an
        any-parquet sniff (a marker-less tmp with data files is a
        crashed partial write and must refuse)."""
        import os
        import shutil
        import time as _t

        from xmidt_event_streams_spark.fsutil import recover_swap

        path = str(tmp_path / "ix")
        self._index(spark, path)
        older = path + "__compact_tmp"
        shutil.copytree(path, older)
        _t.sleep(0.05)
        newer = path + "__rebuild_tmp"
        shutil.copytree(path, newer)
        past = _t.time() - 3600
        os.utime(os.path.join(older, "_SUCCESS"), (past, past))
        # adversarial: directory mtimes say the OPPOSITE (older dir
        # touched now, newer dir backdated) -- the marker must win
        os.utime(older, None)
        os.utime(newer, (past - 3600, past - 3600))
        shutil.rmtree(path)
        out = recover_swap(spark, path)
        assert out["completed"] == [newer]
        assert out["removed"] == [older]

    def test_partial_write_without_success_marker_refuses(
        self, spark, tmp_path
    ):
        import os
        import shutil

        import pytest

        from xmidt_event_streams_spark.fsutil import recover_swap

        path = str(tmp_path / "ix")
        self._index(spark, path)
        tmp = path + "__compact_tmp"
        shutil.copytree(path, tmp)
        os.remove(os.path.join(tmp, "_SUCCESS"))  # crashed mid-write
        shutil.rmtree(path)
        with pytest.raises(IOError, match="recover by hand"):
            recover_swap(spark, path)

    def test_incomplete_tmp_does_not_block_completable_one(
        self, spark, tmp_path
    ):
        """Review fix: a long-dead incomplete __compact_tmp must not
        block healing a COMPLETE __rebuild_tmp whose swap crashed --
        recovery completes the rebuild first, after which the
        incomplete tmp is stale and deleted, not raised on."""
        import os
        import shutil

        from xmidt_event_streams_spark.fsutil import recover_swap

        path = str(tmp_path / "ix")
        self._index(spark, path)
        want = self._probe(spark, path)
        stale = path + "__compact_tmp"
        os.makedirs(stale)  # incomplete: no parquet
        done = path + "__rebuild_tmp"
        shutil.copytree(path, done)
        shutil.rmtree(path)
        out = recover_swap(spark, path)
        assert out["completed"] == [done]
        assert out["removed"] == [stale]
        assert self._probe(spark, path) == want
