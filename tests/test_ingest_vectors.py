"""Streaming embedding ingest (streaming/ingest_vectors.py):
validate -> idempotent IVF-index fold -> rejects ledger."""

from __future__ import annotations
from tests.streamutil import await_stream

import json

from pyspark.sql import functions as F

from xmidt_event_streams_spark.operators.ivf import (
    append_to_ivf_index,
    probe_ivf_index,
    write_ivf_index,
)
from xmidt_event_streams_spark.operators.similarity import deterministic_planes
from xmidt_event_streams_spark.streaming.ingest_vectors import (
    start_ingest_vectors,
)

DIM = 8
SCHEMA = "vec_id long, embedding array<double>"


def _vec(seed):
    return [((seed * (d + 3)) % 17) / 17.0 + 0.05 for d in range(DIM)]


def _write_items(path, items):
    with open(path, "w") as f:
        for it in items:
            f.write(json.dumps(it) + "\n")


def _run(spark, src, index, rejects, ckpt):
    q = start_ingest_vectors(
        spark.readStream.schema(SCHEMA).json(str(src)),
        str(index), str(rejects), str(ckpt), dim=DIM,
        availableNow=True,
    )
    await_stream(q, 120)


def test_stream_folds_batches_and_ledgers_rejects(spark, tmp_path):
    src = tmp_path / "in"
    src.mkdir()
    index, rejects, ckpt = tmp_path / "idx", tmp_path / "rej", tmp_path / "ck"
    cents = deterministic_planes(4, DIM, seed="vec-ingest")
    seed = spark.createDataFrame([], SCHEMA)
    write_ivf_index(seed, str(index), cents)  # empty init, sidecar only

    _write_items(
        src / "b1.json",
        [{"vec_id": i, "embedding": _vec(i)} for i in range(10)]
        + [{"vec_id": 90, "embedding": None},
           {"vec_id": 91, "embedding": [1.0, 2.0]}],
    )
    _run(spark, src, index, rejects, ckpt)
    _write_items(
        src / "b2.json",
        [{"vec_id": 10 + i, "embedding": _vec(40 + i)} for i in range(5)],
    )
    _run(spark, src, index, rejects, ckpt)  # restart from checkpoint

    idx = spark.read.parquet(str(index))
    assert idx.count() == 15
    assert set(idx.columns) >= {"vec_id", "embedding", "cell",
                                "_ingest_batch_id"}
    rej = spark.read.parquet(str(rejects))
    got = {r["vec_id"]: r["reject_reason"] for r in rej.collect()}
    assert got == {90: "null", 91: "wrong_dim"}

    # the folded index is searchable: probe retrieves an appended id
    q = spark.createDataFrame([(0, _vec(0))], SCHEMA)
    hits = probe_ivf_index(spark, str(index), q, cents, k=3, n_probe=2)
    assert hits.count() == 3


def test_replayed_batch_fold_is_idempotent(spark, tmp_path):
    index = tmp_path / "idx"
    cents = deterministic_planes(4, DIM, seed="vec-ingest")
    write_ivf_index(spark.createDataFrame([], SCHEMA), str(index), cents)
    batch = spark.createDataFrame(
        [(i, _vec(i)) for i in range(6)], SCHEMA
    )
    append_to_ivf_index(batch, str(index), batch_id=3)
    before = sorted(
        r["vec_id"] for r in spark.read.parquet(str(index)).collect()
    )
    append_to_ivf_index(batch, str(index), batch_id=3)  # replay
    after = sorted(
        r["vec_id"] for r in spark.read.parquet(str(index)).collect()
    )
    assert before == after == list(range(6))


def test_seed_corpus_folds_as_batch_minus_one(spark, tmp_path):
    index = tmp_path / "idx"
    cents = deterministic_planes(4, DIM, seed="vec-ingest")
    write_ivf_index(spark.createDataFrame([], SCHEMA), str(index), cents)
    corpus = spark.createDataFrame([(i, _vec(i)) for i in range(8)], SCHEMA)
    append_to_ivf_index(corpus, str(index), batch_id=-1)
    append_to_ivf_index(
        spark.createDataFrame([(100, _vec(100))], SCHEMA),
        str(index),
        batch_id=0,
    )
    idx = spark.read.parquet(str(index))
    assert idx.count() == 9
    assert {r["_ingest_batch_id"] for r in idx.collect()} == {-1, 0}


def test_occupancy_drift_alarm(spark, tmp_path):
    """write stamps the fit-time cell histogram; appends from the same
    distribution stay 'stable', a hot-spot append trips the PSI alarm
    (the rebuild signal for frozen IVF centroids)."""
    from xmidt_event_streams_spark.operators.ivf import ivf_occupancy_drift

    idx = tmp_path / "drift_idx"
    cents = deterministic_planes(4, DIM, seed="vec-ingest")
    base = spark.createDataFrame(
        [(i, _vec(i)) for i in range(64)], SCHEMA
    )
    write_ivf_index(base, str(idx), cents)

    r0 = ivf_occupancy_drift(spark, str(idx))
    assert r0["verdict"] == "stable" and r0["psi"] < 1e-9
    assert r0["n_baseline"] == r0["n_current"] == 64

    # same-distribution append: histogram shape preserved -> stable
    append_to_ivf_index(
        spark.createDataFrame([(100 + i, _vec(i)) for i in range(64)], SCHEMA),
        str(idx),
    )
    r1 = ivf_occupancy_drift(spark, str(idx))
    assert r1["verdict"] == "stable", r1
    assert r1["n_current"] == 128

    # hot-spot append: every new vector lands in one cell -> alarm
    hot = next(
        v for v in (_vec(s) for s in range(1000, 1100))
    )
    append_to_ivf_index(
        spark.createDataFrame(
            [(500 + i, hot) for i in range(400)], SCHEMA
        ),
        str(idx),
    )
    r2 = ivf_occupancy_drift(spark, str(idx))
    assert r2["verdict"] in ("drifting", "shifted"), r2
    assert r2["psi"] > r1["psi"]
    assert 0 <= r2["hottest_cell"] < 4 and r2["hottest_frac"] > 0.5


def test_occupancy_drift_no_baseline_verdict(spark, tmp_path):
    """A streaming-seeded index (empty write + appends) has no
    fit-time histogram: the check reports 'no_baseline' instead of a
    false 'shifted' against the smoothed uniform prior -- and does not
    crash on a stamped-but-never-appended index."""
    from xmidt_event_streams_spark.operators.ivf import ivf_occupancy_drift

    idx = tmp_path / "seeded_idx"
    cents = deterministic_planes(4, DIM, seed="vec-ingest")
    write_ivf_index(spark.createDataFrame([], SCHEMA), str(idx), cents)

    r0 = ivf_occupancy_drift(spark, str(idx))  # zero data files
    assert r0["verdict"] == "no_baseline" and r0["psi"] is None

    append_to_ivf_index(
        spark.createDataFrame([(i, _vec(1)) for i in range(64)], SCHEMA),
        str(idx),
    )  # maximally skewed corpus: one cell holds everything
    r1 = ivf_occupancy_drift(spark, str(idx))
    assert r1["verdict"] == "no_baseline"  # NOT a false 'shifted'


# ---------------------------------------------------------------- #
# semantic dedup on ingest (incremental_vector_dedup_mark +
# start_ingest_vectors(dedup_threshold=...))                        #
# ---------------------------------------------------------------- #


def _onehot(i, bump=0.0):
    v = [0.0] * DIM
    v[i % DIM] = 1.0
    v[(i + 1) % DIM] = bump
    return v


def test_stream_semantic_dedup_across_restart(spark, tmp_path):
    """Crash-replay e2e for the vector dedup gate: batch 2 (after a
    restart from checkpoint) must catch duplicates of batch 1's
    SURVIVORS via the index, and in-batch smaller-id peers; rejects
    ledger carries dup_of; sinks stay exactly-once across the
    restart."""
    src = tmp_path / "in"
    src.mkdir()
    index, rejects, ckpt = tmp_path / "idx", tmp_path / "rej", tmp_path / "ck"
    cents = deterministic_planes(4, DIM, seed="vec-ingest")
    write_ivf_index(spark.createDataFrame([], SCHEMA), str(index), cents)

    def run():
        q = start_ingest_vectors(
            spark.readStream.schema(SCHEMA).json(str(src)),
            str(index), str(rejects), str(ckpt), dim=DIM,
            dedup_threshold=0.99, dedup_n_probe=2,
            availableNow=True,
        )
        await_stream(q, 300)

    # b1: 0..3 distinct one-hots; 4 duplicates 0 (same vector)
    _write_items(
        src / "b1.json",
        [{"vec_id": i, "embedding": _onehot(i)} for i in range(4)]
        + [{"vec_id": 4, "embedding": _onehot(0)}],
    )
    run()
    # b2 lands while the stream is down: 10 dups indexed survivor 1,
    # 11 is genuinely new (distinct direction), 12 dups its smaller-id
    # batch peer 11
    _write_items(
        src / "b2.json",
        [
            {"vec_id": 10, "embedding": _onehot(1)},
            {"vec_id": 11, "embedding": _onehot(5)},
            {"vec_id": 12, "embedding": _onehot(5)},
        ],
    )
    run()  # restart from checkpoint: processes only b2

    idx = spark.read.parquet(str(index))
    kept = {r["vec_id"] for r in idx.collect()}
    assert kept == {0, 1, 2, 3, 11}
    rej = {
        r["vec_id"]: (r["reject_reason"], r["dup_of"])
        for r in spark.read.parquet(str(rejects)).collect()
    }
    assert rej == {
        4: ("semantic_duplicate", 0),
        10: ("semantic_duplicate", 1),
        12: ("semantic_duplicate", 11),
    }
    # exactly-once: one physical row per id across the restart
    assert idx.count() == 5
    assert spark.read.parquet(str(rejects)).count() == 3


def test_vector_dedup_replay_excludes_own_batch(spark, tmp_path):
    """The crash-after-index-fold replay: the batch's own first-
    attempt rows are already IN the index under this batch id; with
    exclude_batch_id the re-mark returns the same verdicts (peers do
    not 'duplicate' their own first attempt), without it they
    would."""
    from xmidt_event_streams_spark.streaming.ingest_vectors import (
        incremental_vector_dedup_mark,
    )

    index = str(tmp_path / "idx")
    cents = deterministic_planes(4, DIM, seed="vec-ingest")
    write_ivf_index(spark.createDataFrame([], SCHEMA), index, cents)
    # two near-dup peers (distinct ids, identical vectors) whose
    # first attempt folded BOTH into the index under batch 7
    batch = spark.createDataFrame(
        [(1, _onehot(0)), (2, _onehot(0))], SCHEMA
    )
    append_to_ivf_index(batch, index, batch_id=7)  # first attempt
    marks = {
        r["vec_id"]: r["is_unique"]
        for r in incremental_vector_dedup_mark(
            spark, index, batch, threshold=0.99, exclude_batch_id=7
        ).collect()
    }
    # replay verdicts = first-attempt verdicts: min-id peer survives
    assert marks == {1: True, 2: False}
    # without the exclusion, peer 1 'duplicates' its own first
    # attempt's row 2 and BOTH are rejected -- data loss on replay
    naive = {
        r["vec_id"]: r["is_unique"]
        for r in incremental_vector_dedup_mark(
            spark, index, batch, threshold=0.99, exclude_batch_id=None
        ).collect()
    }
    assert naive == {1: False, 2: False}


# ---------------------------------------------------------------- #
# compact_ivf_index: small-file fold + vector-tier takedown          #
# ---------------------------------------------------------------- #


def test_compact_ivf_index_folds_batches_and_takes_down(spark, tmp_path):
    """Streaming batch partitions fold into one file per cell with
    live-id probe results EXACTLY preserved; tombstoned ids are gone
    by absence (no row in any file); duplicate plain appends dedup;
    later batch appends still work on the compacted layout."""
    from xmidt_event_streams_spark.operators.ivf import compact_ivf_index

    index = str(tmp_path / "idx")
    cents = deterministic_planes(4, DIM, seed="vec-ingest")
    write_ivf_index(spark.createDataFrame([], SCHEMA), index, cents)
    batch = lambda lo, hi: spark.createDataFrame(
        [(i, _vec(i)) for i in range(lo, hi)], SCHEMA
    )
    for b, (lo, hi) in enumerate([(0, 6), (6, 12), (12, 18)]):
        append_to_ivf_index(batch(lo, hi), index, batch_id=b)

    q = spark.createDataFrame([(0, _vec(3))], SCHEMA)
    before = sorted(
        (r["vec_id"], r["cos_sim"])
        for r in probe_ivf_index(spark, index, q, cents, k=5, n_probe=4).collect()
    )
    rep = compact_ivf_index(spark, index, tombstones=[4])
    assert rep["files_after"] < rep["files_before"]
    assert rep["rows_after"] == 17  # 18 - 1 tombstone
    idx = spark.read.parquet(index)
    assert idx.filter("vec_id = 4").count() == 0  # absence, not filter
    assert {r["_ingest_batch_id"] for r in idx.select("_ingest_batch_id").distinct().collect()} == {-1}
    after = sorted(
        (r["vec_id"], r["cos_sim"])
        for r in probe_ivf_index(spark, index, q, cents, k=5, n_probe=4).collect()
    )
    # live-id preservation: every pre-compaction hit except the
    # tombstone survives with an identical score
    before_d, after_d = dict(before), dict(after)
    for vid, sim in before_d.items():
        if vid == 4:
            assert vid not in after_d
        else:
            assert after_d.get(vid) == sim
    # the compacted layout still accepts streaming appends
    append_to_ivf_index(batch(18, 20), index, batch_id=3)
    assert spark.read.parquet(index).count() == 19


def test_takedown_ids_reaches_vector_index(spark, tmp_path):
    """The composed takedown's vector tier: after takedown_ids with
    ivf_index_path, the removed doc's embedding no longer answers
    probes."""
    from xmidt_event_streams_spark.operators.upsert import (
        write_keyed_table,
    )
    from xmidt_event_streams_spark.takedown import takedown_ids

    corpus = str(tmp_path / "corpus")
    index = str(tmp_path / "vidx")
    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(8)], "vec_id long, text string"
    )
    write_keyed_table(docs, corpus, "vec_id")
    cents = deterministic_planes(4, DIM, seed="vec-ingest")
    emb = spark.createDataFrame([(i, _vec(i)) for i in range(8)], SCHEMA)
    write_ivf_index(emb, index, cents)

    stats = takedown_ids(
        spark, corpus, [3], ivf_index_path=index
    )
    assert stats["deletes"] == 1
    assert stats["ivf_index"]["rows_after"] == 7
    q = spark.createDataFrame([(99, _vec(3))], SCHEMA)
    hits = probe_ivf_index(spark, index, q, cents, k=8, n_probe=4).collect()
    assert all(r["vec_id"] != 3 for r in hits)


def test_ivf_compaction_as_maintenance_target(spark, tmp_path):
    from xmidt_event_streams_spark.maintenance import run_maintenance

    index = str(tmp_path / "midx")
    cents = deterministic_planes(4, DIM, seed="vec-ingest")
    write_ivf_index(spark.createDataFrame([], SCHEMA), index, cents)
    append_to_ivf_index(
        spark.createDataFrame([(i, _vec(i)) for i in range(6)], SCHEMA),
        index,
        batch_id=0,
    )
    report = run_maintenance(
        spark, ivf_compactions=(index,), tombstones={index: [2]}
    )
    assert report[index]["kind"] == "ivf_index"
    assert report[index]["rows_after"] == 5


def test_compact_keeps_newest_batch_deterministically(spark, tmp_path):
    """A backfill that re-appends a CORRECTED embedding under a later
    batch id must win compaction deterministically (dropDuplicates
    kept an arbitrary row)."""
    from xmidt_event_streams_spark.operators.ivf import compact_ivf_index

    index = str(tmp_path / "idx")
    cents = deterministic_planes(4, DIM, seed="vec-ingest")
    write_ivf_index(spark.createDataFrame([], SCHEMA), index, cents)
    append_to_ivf_index(
        spark.createDataFrame([(1, _vec(1))], SCHEMA), index, batch_id=0
    )
    corrected = _vec(2)
    append_to_ivf_index(
        spark.createDataFrame([(1, corrected)], SCHEMA), index, batch_id=5
    )
    for _ in range(3):  # stable across repeated compaction reads
        compact_ivf_index(spark, index)
        rows = spark.read.parquet(index).collect()
        assert len(rows) == 1
        assert list(rows[0]["embedding"]) == corrected


def test_stream_folds_ivfpq_serving_index_in_lockstep(spark, tmp_path):
    """ivfpq_index_path=: each micro-batch's accepted rows also fold
    into a compressed IVF-PQ serving index under its stamped
    quantizers -- probes of the PQ tier see exactly the rows the raw
    IVF tier accepted, and a replay cannot duplicate them (same
    (cell, batch) overwrite discipline)."""
    import numpy as np

    from xmidt_event_streams_spark.operators.ivfpq import (
        probe_ivfpq_index,
        write_ivfpq_index,
    )

    src = tmp_path / "in"
    src.mkdir()
    index, rejects, ckpt = tmp_path / "idx", tmp_path / "rej", tmp_path / "ck"
    pq_index = tmp_path / "pq"
    cents = deterministic_planes(4, DIM, seed="vec-ingest")
    seed = spark.createDataFrame([], SCHEMA)
    write_ivf_index(seed, str(index), cents)
    # PQ quantizers fit offline on a bootstrap slice, index seeded empty
    boot = spark.createDataFrame(
        [(i, _vec(i)) for i in range(64)], SCHEMA
    )
    from xmidt_event_streams_spark.operators.ivfpq import ivfpq_fit

    pq_cents, pq_cbs = ivfpq_fit(boot, n_cells=4, m=4, k=8, n_iters=2)
    write_ivfpq_index(seed, str(pq_index), pq_cents, pq_cbs)

    _write_items(
        src / "b1.json",
        [{"vec_id": i, "embedding": _vec(i)} for i in range(20)]
        + [{"vec_id": 90, "embedding": None}],  # rejected: never folds
    )
    q = start_ingest_vectors(
        spark.readStream.schema(SCHEMA).json(str(src)),
        str(index), str(rejects), str(ckpt), dim=DIM,
        availableNow=True, ivfpq_index_path=str(pq_index),
    )
    await_stream(q, 120)

    pq_rows = spark.read.parquet(str(pq_index))
    assert pq_rows.count() == 20  # accepted rows only, once each
    assert {r["vec_id"] for r in pq_rows.select("vec_id").collect()} == set(
        range(20)
    )
    got = probe_ivfpq_index(
        spark, str(pq_index), [(999, _vec(3))], k_neighbors=3, n_probe=4
    )
    assert got.count() == 3
    # second batch advances both tiers
    _write_items(
        src / "b2.json",
        [{"vec_id": i, "embedding": _vec(i)} for i in range(20, 30)],
    )
    q = start_ingest_vectors(
        spark.readStream.schema(SCHEMA).json(str(src)),
        str(index), str(rejects), str(ckpt), dim=DIM,
        availableNow=True, ivfpq_index_path=str(pq_index),
    )
    await_stream(q, 120)
    assert spark.read.parquet(str(pq_index)).count() == 30
    assert spark.read.parquet(str(index)).count() == 30


def test_rebuild_ivf_index_closes_drift(spark, tmp_path):
    """rebuild_ivf_index: re-fit on current contents + atomic swap --
    the action the drift alarm's 'shifted' verdict calls for. New
    centroids/occupancy stamped (the next drift check baselines
    against the refit), probes load the new sidecar, appends keep
    working, and a streaming-shaped index keeps its layout."""
    from xmidt_event_streams_spark.operators.ivf import (
        rebuild_ivf_index,
    )

    df = spark.createDataFrame(
        [(i, _vec(i)) for i in range(500)], SCHEMA
    )
    idx = str(tmp_path / "rebuild")
    write_ivf_index(df, idx, deterministic_planes(4, DIM, seed="x"))
    rep = rebuild_ivf_index(spark, idx, n_iters=2)
    assert rep["n_cells_before"] == 4
    assert rep["n_cells_after"] == int(500**0.5)
    got = probe_ivf_index(spark, idx, df.limit(2), None, k=3, n_probe=3)
    assert got.count() == 6
    append_to_ivf_index(
        spark.createDataFrame([(1000, _vec(9))], SCHEMA), idx
    )
    assert spark.read.parquet(idx).count() == 501

    # streaming-shaped index folds to _ingest_batch_id=-1 and later
    # batch appends keep working
    sidx = str(tmp_path / "srebuild")
    write_ivf_index(
        spark.createDataFrame([], SCHEMA), sidx,
        deterministic_planes(4, DIM, seed="x"),
    )
    append_to_ivf_index(df, sidx, batch_id=0)
    rebuild_ivf_index(spark, sidx, n_iters=2)
    cols = spark.read.parquet(sidx).columns
    assert "_ingest_batch_id" in cols
    append_to_ivf_index(
        spark.createDataFrame([(2000, _vec(5))], SCHEMA), sidx,
        batch_id=1,
    )
    assert spark.read.parquet(sidx).count() == 501


def test_maintenance_rebuilds_on_shifted_drift(
    spark, tmp_path, monkeypatch
):
    """ivf_rebuild_on_shift=True closes the drift loop inside the
    maintenance window: a 'shifted' verdict triggers the rebuild
    (report key suffixed ivf_rebuild); without the flag the window
    stays read-only for drift targets."""
    from xmidt_event_streams_spark.maintenance import run_maintenance

    df = spark.createDataFrame(
        [(i, _vec(i)) for i in range(400)], SCHEMA
    )
    idx = str(tmp_path / "driftidx")
    write_ivf_index(df, idx, deterministic_planes(4, DIM, seed="x"))

    monkeypatch.setattr(
        "xmidt_event_streams_spark.operators.ivf.ivf_occupancy_drift",
        lambda s, p: {"verdict": "shifted", "psi": 9.9},
    )
    rep = run_maintenance(spark, ivf_indexes=(idx,))
    assert rep[idx]["verdict"] == "shifted"
    assert f"{idx}#ivf_rebuild" not in rep  # read-only without the flag

    rep2 = run_maintenance(
        spark, ivf_indexes=(idx,), ivf_rebuild_on_shift=True
    )
    rb = rep2[f"{idx}#ivf_rebuild"]
    assert rb["kind"] == "ivf_rebuild"
    assert rb["n_cells_after"] == int(400**0.5)
    got = probe_ivf_index(spark, idx, df.limit(2), None, k=3, n_probe=3)
    assert got.count() == 6


class TestMultivecIngest:
    """Streaming ingest for the MaxSim tier: JVM-side validation to
    the rejects ledger, replay-idempotent (cell, batch) folds, and a
    cold-seeded index that fills from the stream."""

    DIM = 4

    def _toks(self, i, t=2):
        import numpy as np

        rng = np.random.default_rng(500 + i)
        m = rng.normal(size=(t, self.DIM))
        m /= np.linalg.norm(m, axis=1, keepdims=True)
        return [[float(x) for x in r] for r in m]

    def _seed(self, spark, path):
        from xmidt_event_streams_spark.operators.multivec import (
            write_maxsim_index,
        )
        from xmidt_event_streams_spark.operators.similarity import (
            deterministic_planes,
        )

        cents = deterministic_planes(2, self.DIM, seed="mv-ingest")
        empty = spark.createDataFrame(
            [], "doc_id long, token_vecs array<array<double>>"
        )
        write_maxsim_index(empty, path, cents)
        return cents

    def test_stream_fills_cold_index_and_rejects_poison(
        self, spark, tmp_path
    ):
        import json

        from xmidt_event_streams_spark.operators.multivec import (
            probe_maxsim_index,
        )
        from xmidt_event_streams_spark.streaming.ingest_vectors import (
            start_ingest_multivec,
        )

        ix = str(tmp_path / "mvix")
        rejects = str(tmp_path / "rejects")
        src = tmp_path / "in"
        src.mkdir()
        self._seed(spark, ix)
        rows = [
            {"doc_id": i, "token_vecs": self._toks(i)} for i in range(4)
        ] + [
            {"doc_id": 90, "token_vecs": None},
            {"doc_id": 91, "token_vecs": []},
            {"doc_id": 92, "token_vecs": [[1.0, 2.0]]},  # wrong dim
        ]
        with open(src / "b1.json", "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")
        q = start_ingest_multivec(
            spark.readStream.schema(
                "doc_id long, token_vecs array<array<double>>"
            ).json(str(src)),
            ix,
            rejects,
            str(tmp_path / "ck"),
            dim=self.DIM,
            availableNow=True,
        )
        await_stream(q, 300)
        got = probe_maxsim_index(
            spark, ix, [(999, self._toks(999))], k_neighbors=10,
            n_probe=2, prefilter_c=100,
        ).collect()
        assert sorted(r["doc_id"] for r in got) == [0, 1, 2, 3]
        led = {
            r["doc_id"]: r["reject_reason"]
            for r in spark.read.parquet(rejects).collect()
        }
        assert led == {
            90: "null_tokens", 91: "empty_tokens", 92: "bad_token"
        }

    def test_token_assigned_streaming_replay_idempotent(
        self, spark, tmp_path
    ):
        """The token-ASSIGNED layout rides the same streaming-append
        contract: a replayed (cell, batch) overwrite rewrites its own
        replicas instead of duplicating them -- each doc's replica
        set lands in the SAME partitions on replay because cell
        assignment is a pure function of the stamped centroids."""
        from xmidt_event_streams_spark.operators.multivec import (
            append_to_maxsim_index,
            probe_maxsim_index,
            write_maxsim_index,
        )
        from xmidt_event_streams_spark.operators.similarity import (
            deterministic_planes,
        )

        ix = str(tmp_path / "mvixtok")
        cents = deterministic_planes(2, self.DIM, seed="mv-ingest")
        empty = spark.createDataFrame(
            [], "doc_id long, token_vecs array<array<double>>"
        )
        write_maxsim_index(empty, ix, cents, assign="token")
        batch = spark.createDataFrame(
            [(i, self._toks(i)) for i in range(5)],
            "doc_id long, token_vecs array<array<double>>",
        )
        append_to_maxsim_index(batch, ix, batch_id=3)
        once = spark.read.parquet(ix).count()
        append_to_maxsim_index(batch, ix, batch_id=3)  # replay
        assert spark.read.parquet(ix).count() == once
        got = probe_maxsim_index(
            spark, ix, [(999, self._toks(999))], k_neighbors=20,
            n_probe=2, retrieval="token",
        ).collect()
        assert sorted(r["doc_id"] for r in got) == [0, 1, 2, 3, 4]

    def test_replayed_batch_id_does_not_duplicate(self, spark, tmp_path):
        from xmidt_event_streams_spark.operators.multivec import (
            append_to_maxsim_index,
            probe_maxsim_index,
        )

        ix = str(tmp_path / "mvix")
        self._seed(spark, ix)
        batch = spark.createDataFrame(
            [(i, self._toks(i)) for i in range(5)],
            "doc_id long, token_vecs array<array<double>>",
        )
        append_to_maxsim_index(batch, ix, batch_id=7)
        append_to_maxsim_index(batch, ix, batch_id=7)  # replay
        got = probe_maxsim_index(
            spark, ix, [(999, self._toks(999))], k_neighbors=20,
            n_probe=2, prefilter_c=100,
        ).collect()
        ids = sorted(r["doc_id"] for r in got)
        assert ids == [0, 1, 2, 3, 4]  # no duplicate rows rank twice
