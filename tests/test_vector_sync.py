"""Vector index tiers following a snapshot table through the CDC
sync harness (ivf.sync_ivf_with_snapshot / ivfpq.sync_ivfpq_with_
snapshot): bootstrap-at-pinned-head, incremental drains, and the
takedown-propagation loop -- a MERGE deleting a row from the table
removes its vector/codes from the serving index at the next sync,
with no separate tombstone bookkeeping.

Same harness contracts as the inverted-index/MinHash syncs
(tests/test_invindex.py, tests/test_incremental.py); these tests pin
the vector-tier specifics: probes stop answering for deleted ids,
updated vectors answer at their NEW location only, and the IVF-PQ
bootstrap stamps the refine codec so the synced index can rerank
from its own payload.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F


def _vec(i: int, dim: int = 8) -> list[float]:
    rng = np.random.default_rng(i)
    v = rng.normal(size=dim)
    return [float(x) for x in (v / np.linalg.norm(v))]


def _mk_table(spark, tmp_path, n=60):
    from xmidt_event_streams_spark.operators.snapshots import (
        snapshot_create,
    )

    table = str(tmp_path / "tab")
    rows = [(int(i), _vec(i)) for i in range(n)]
    snapshot_create(
        spark.createDataFrame(rows, "vec_id long, embedding array<double>"),
        table,
        "vec_id",
    )
    return table


def _merge(spark, table, upserts=(), deletes=()):
    from xmidt_event_streams_spark.operators.snapshots import (
        snapshot_merge,
    )

    ups = spark.createDataFrame(
        [(int(i), v) for i, v in upserts] or [],
        "vec_id long, embedding array<double>",
    ).withColumn("_deleted", F.lit(False))
    tomb = spark.createDataFrame(
        [(int(i), _vec(i)) for i in deletes] or [],
        "vec_id long, embedding array<double>",
    ).withColumn("_deleted", F.lit(True))
    snapshot_merge(spark, table, ups.unionByName(tomb))


class TestIvfpqSync:
    def test_bootstrap_merge_propagation(self, spark, tmp_path):
        from xmidt_event_streams_spark.operators.ivfpq import (
            probe_ivfpq_index,
            sync_ivfpq_with_snapshot,
        )

        table = _mk_table(spark, tmp_path)
        ix = str(tmp_path / "ix")
        ck = str(tmp_path / "ck")
        r = sync_ivfpq_with_snapshot(
            spark, table, ix, ck, m=4, k=8, n_cells=4
        )
        assert r["intervals"] == 0 and r["appended"] == 60

        def hits(qid, rerank=None):
            return [
                row["vec_id"]
                for row in probe_ivfpq_index(
                    spark, ix, [(qid, _vec(qid))], k_neighbors=60,
                    n_probe=4, rerank=rerank,
                ).collect()
            ]

        assert 7 in hits(999)  # present pre-merge
        # delete 7, move 11 to 999's neighborhood, insert 100
        _merge(
            spark,
            table,
            upserts=[(11, _vec(999)), (100, _vec(100))],
            deletes=[7],
        )
        r2 = sync_ivfpq_with_snapshot(
            spark, table, ix, ck, m=4, k=8, n_cells=4
        )
        assert r2["intervals"] == 1 and r2["removed"] == 2
        got = hits(999)
        assert 7 not in got          # takedown propagated
        assert 100 in got            # insert landed
        assert got.count(11) == 1    # updated id answers exactly once
        # the moved vector now ranks FIRST for its new location
        top = probe_ivfpq_index(
            spark, ix, [(999, _vec(999))], k_neighbors=1, n_probe=4
        ).collect()
        assert top[0]["vec_id"] == 11
        # bootstrap stamped the refine codec: rerank without vectors=
        rr = probe_ivfpq_index(
            spark, ix, [(999, _vec(999))], k_neighbors=5, n_probe=4,
            rerank=20,
        )
        assert "refine_dist" in rr.columns and rr.count() == 5
        # idle drain
        assert sync_ivfpq_with_snapshot(
            spark, table, ix, ck, m=4, k=8, n_cells=4
        )["intervals"] == 0

    def test_opq_bootstrap_and_follow(self, spark, tmp_path):
        """opq=True bootstraps the composed OPQ x IVF-PQ shape: the
        rotation lands in the sidecar with its quantizers and the
        INCREMENTAL appliers (append after a snapshot MERGE) encode
        under it read-from-sidecar -- delete/insert propagation is
        identical to the plain tier, with raw queries throughout."""
        import numpy as np

        from xmidt_event_streams_spark.fsutil import read_json_sidecar
        from xmidt_event_streams_spark.operators.ivfpq import (
            _IVFPQ_META_FILE,
            probe_ivfpq_index,
            sync_ivfpq_with_snapshot,
        )

        table = _mk_table(spark, tmp_path)
        ix = str(tmp_path / "ix")
        ck = str(tmp_path / "ck")
        r = sync_ivfpq_with_snapshot(
            spark, table, ix, ck, m=4, k=8, n_cells=4, opq=True
        )
        assert r["appended"] == 60
        meta = read_json_sidecar(spark, ix, _IVFPQ_META_FILE)
        R = np.asarray(meta["rotation"])
        assert np.allclose(R @ R.T, np.eye(R.shape[0]), atol=1e-9)

        def hits(qid):
            return [
                row["vec_id"]
                for row in probe_ivfpq_index(
                    spark, ix, [(qid, _vec(qid))], k_neighbors=60,
                    n_probe=4,
                ).collect()
            ]

        assert 7 in hits(999)
        _merge(
            spark,
            table,
            upserts=[(11, _vec(999)), (100, _vec(100))],
            deletes=[7],
        )
        r2 = sync_ivfpq_with_snapshot(
            spark, table, ix, ck, m=4, k=8, n_cells=4, opq=True
        )
        assert r2["intervals"] == 1 and r2["removed"] == 2
        got = hits(999)
        assert 7 not in got and 100 in got and got.count(11) == 1
        # the follow path preserved the stamped rotation untouched
        meta2 = read_json_sidecar(spark, ix, _IVFPQ_META_FILE)
        assert meta2["rotation"] == meta["rotation"]

    def test_fork_refusal_on_fresh_checkpoint(self, spark, tmp_path):
        import pytest

        from xmidt_event_streams_spark.operators.ivfpq import (
            ivfpq_fit,
            sync_ivfpq_with_snapshot,
            write_ivfpq_index,
        )

        table = _mk_table(spark, tmp_path)
        ix = str(tmp_path / "ix")
        emb = spark.createDataFrame(
            [(int(i), _vec(i)) for i in range(20)],
            "vec_id long, embedding array<double>",
        )
        cents, cbs = ivfpq_fit(emb, n_cells=2, m=4, k=8)
        write_ivfpq_index(emb, ix, cents, cbs)
        with pytest.raises(ValueError, match="fork"):
            sync_ivfpq_with_snapshot(
                spark, table, ix, str(tmp_path / "ck"), m=4, k=8
            )


class TestIvfSync:
    def test_bootstrap_merge_propagation(self, spark, tmp_path):
        from xmidt_event_streams_spark.operators.ivf import (
            probe_ivf_index,
            sync_ivf_with_snapshot,
        )

        table = _mk_table(spark, tmp_path)
        ix = str(tmp_path / "ix")
        ck = str(tmp_path / "ck")
        r = sync_ivf_with_snapshot(spark, table, ix, ck, n_cells=4)
        assert r["intervals"] == 0 and r["appended"] == 60

        def hits(qid):
            qdf = spark.createDataFrame(
                [(int(qid), _vec(qid))],
                "vec_id long, embedding array<double>",
            )
            return [
                row["vec_id"]
                for row in probe_ivf_index(
                    spark, ix, qdf, k=60, n_probe=4
                ).collect()
            ]

        assert 7 in hits(999)
        _merge(spark, table, upserts=[(100, _vec(100))], deletes=[7])
        r2 = sync_ivf_with_snapshot(spark, table, ix, ck, n_cells=4)
        assert r2["intervals"] == 1 and r2["removed"] == 1
        got = hits(999)
        assert 7 not in got and 100 in got


def test_full_takedown_interval_empties_index_without_crash(
    spark, tmp_path
):
    """Review fix: an interval deleting EVERY remaining row used to
    crash the compactor's read-back ('unable to infer schema' on a
    zero-data-file write) and strand the tmp. The empty index is a
    legitimate end state: the sync drains cleanly, a later insert
    interval refills it under the stamped quantizers."""
    from xmidt_event_streams_spark.operators.ivf import (
        probe_ivf_index,
        sync_ivf_with_snapshot,
    )

    table = _mk_table(spark, tmp_path, n=20)
    ix = str(tmp_path / "ix")
    ck = str(tmp_path / "ck")
    sync_ivf_with_snapshot(spark, table, ix, ck, n_cells=2)
    _merge(spark, table, deletes=list(range(20)))
    r = sync_ivf_with_snapshot(spark, table, ix, ck, n_cells=2)
    assert r["removed"] == 20 and r["appended"] == 0
    # refill
    _merge(spark, table, upserts=[(100, _vec(100)), (101, _vec(101))])
    r2 = sync_ivf_with_snapshot(spark, table, ix, ck, n_cells=2)
    assert r2["appended"] == 2
    qdf = spark.createDataFrame(
        [(999, _vec(100))], "vec_id long, embedding array<double>"
    )
    got = [
        row["vec_id"]
        for row in probe_ivf_index(spark, ix, qdf, k=2, n_probe=2).collect()
    ]
    assert 100 in got


def _toks(i: int, t: int = 3, dim: int = 8) -> list[list[float]]:
    rng = np.random.default_rng(10_000 + i)
    m = rng.normal(size=(t, dim))
    m /= np.linalg.norm(m, axis=1, keepdims=True)
    return [[float(x) for x in r] for r in m]


class TestMaxsimSync:
    """The late-interaction tier follows a snapshot table of
    multi-vector documents: deletes stop answering MaxSim probes,
    updates answer with their NEW token matrices, inserts appear --
    all through the shared checkpointed harness."""

    def _mk_doc_table(self, spark, tmp_path, n=40):
        from xmidt_event_streams_spark.operators.snapshots import (
            snapshot_create,
        )

        table = str(tmp_path / "dtab")
        rows = [(int(i), _toks(i)) for i in range(n)]
        snapshot_create(
            spark.createDataFrame(
                rows, "doc_id long, token_vecs array<array<double>>"
            ),
            table,
            "doc_id",
        )
        return table

    def _merge_docs(self, spark, table, upserts=(), deletes=()):
        from xmidt_event_streams_spark.operators.snapshots import (
            snapshot_merge,
        )

        ups = spark.createDataFrame(
            [(int(i), m) for i, m in upserts] or [],
            "doc_id long, token_vecs array<array<double>>",
        ).withColumn("_deleted", F.lit(False))
        tomb = spark.createDataFrame(
            [(int(i), _toks(i)) for i in deletes] or [],
            "doc_id long, token_vecs array<array<double>>",
        ).withColumn("_deleted", F.lit(True))
        snapshot_merge(spark, table, ups.unionByName(tomb))

    def test_bootstrap_merge_propagation(self, spark, tmp_path):
        from xmidt_event_streams_spark.operators.multivec import (
            probe_maxsim_index,
            sync_maxsim_with_snapshot,
        )

        table = self._mk_doc_table(spark, tmp_path)
        ix = str(tmp_path / "mvix")
        ck = str(tmp_path / "ck")
        r = sync_maxsim_with_snapshot(
            spark, table, ix, ck, n_cells=4
        )
        assert r["intervals"] == 0 and r["appended"] == 40

        def hits(qid):
            return {
                row["doc_id"]: row["maxsim"]
                for row in probe_maxsim_index(
                    spark, ix, [(qid, _toks(qid))], k_neighbors=40,
                    n_probe=4, prefilter_c=1000,
                ).collect()
            }

        base = hits(0)
        assert 1 in base and 0 not in base  # self excluded
        # delete 1, update 2 with a NEW token matrix, insert 77
        new_m = _toks(2_000_002)
        self._merge_docs(
            spark, table, upserts=[(2, new_m), (77, _toks(77))],
            deletes=[1],
        )
        r2 = sync_maxsim_with_snapshot(spark, table, ix, ck, n_cells=4)
        assert r2["intervals"] >= 1 and r2["removed"] >= 1
        after = hits(0)
        assert 1 not in after  # takedown propagated
        assert 77 in after  # insert landed
        # the updated doc answers with its NEW matrix: probing with
        # the new matrix as the query now scores doc 2 as (near) its
        # own content, far above its old random alignment
        q_new = hits_q = {
            row["doc_id"]: row["maxsim"]
            for row in probe_maxsim_index(
                spark, ix, [(999, new_m)], k_neighbors=5, n_probe=4,
                prefilter_c=1000,
            ).collect()
        }
        assert 2 in q_new
        assert q_new[2] == max(q_new.values())

    def test_token_assign_bootstrap_and_follow(self, spark, tmp_path):
        """assign='token' bootstraps the inverted-file layout through
        the CDC sync; the follow path (compact + append) preserves
        replica semantics -- delete removes every replica, an update's
        OLD matrix compacts out of all its cells, the stamped
        assignment survives."""
        from xmidt_event_streams_spark.fsutil import read_json_sidecar
        from xmidt_event_streams_spark.operators.multivec import (
            _MAXSIM_META_FILE,
            probe_maxsim_index,
            sync_maxsim_with_snapshot,
        )

        table = self._mk_doc_table(spark, tmp_path)
        ix = str(tmp_path / "mvix")
        ck = str(tmp_path / "ck")
        r = sync_maxsim_with_snapshot(
            spark, table, ix, ck, n_cells=4, assign="token"
        )
        assert r["appended"] == 40
        meta = read_json_sidecar(spark, ix, _MAXSIM_META_FILE)
        assert meta["assign"] == "token"

        def hits(qid):
            return {
                row["doc_id"]
                for row in probe_maxsim_index(
                    spark, ix, [(qid, _toks(qid))], k_neighbors=40,
                    n_probe=4, retrieval="token",
                ).collect()
            }

        assert 1 in hits(0)
        self._merge_docs(
            spark, table,
            upserts=[(2, _toks(2_000_002)), (77, _toks(77))],
            deletes=[1],
        )
        sync_maxsim_with_snapshot(
            spark, table, ix, ck, n_cells=4, assign="token"
        )
        after = hits(0)
        assert 1 not in after and 77 in after
        idx = spark.read.parquet(ix)
        assert idx.filter(F.col("doc_id") == 1).count() == 0
        # replicas stay deduped per (id, cell) after the follow
        assert (
            idx.groupBy("doc_id", "cell").count()
            .filter(F.col("count") > 1).count() == 0
        )
        meta = read_json_sidecar(spark, ix, _MAXSIM_META_FILE)
        assert meta["assign"] == "token"

    def test_fork_refusal(self, spark, tmp_path):
        import pytest

        from xmidt_event_streams_spark.operators.multivec import (
            sync_maxsim_with_snapshot,
        )

        table = self._mk_doc_table(spark, tmp_path, n=10)
        ix = str(tmp_path / "mvix")
        sync_maxsim_with_snapshot(
            spark, table, ix, str(tmp_path / "ck1"), n_cells=2
        )
        # a FRESH checkpoint against the existing index must refuse
        # (it cannot know which intervals the index already folded)
        with pytest.raises(ValueError, match="checkpoint"):
            sync_maxsim_with_snapshot(
                spark, table, ix, str(tmp_path / "ck2"), n_cells=2
            )
