"""Hard-negative mining (operators/mining.py): exclusion semantics
against a numpy reference, shortfall ledger, and index-candidate
composition."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from xmidt_event_streams_spark.operators.mining import (
    mine_hard_negatives,
    mining_report,
)

K, OVERFETCH = 5, 10


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


@pytest.fixture(scope="module")
def anchors(emb):
    return emb.filter(F.col("vec_id") % 50 == 3)


@pytest.fixture(scope="module")
def np_ref(emb):
    rows = sorted(
        (r["vec_id"], list(r["embedding"]), r["label"])
        for r in emb.collect()
    )
    ids = np.array([r[0] for r in rows])
    mat = np.array([r[1] for r in rows], dtype=np.float64)
    lbl = {r[0]: r[2] for r in rows}
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    return ids, mat, lbl


def _ref_negatives(np_ref, aid, k, exclude_label=None, exclude_ids=()):
    ids, mat, lbl = np_ref
    ai = int(np.where(ids == aid)[0][0])
    sims = np.round(mat @ mat[ai], 6)
    order = sorted(
        range(len(ids)), key=lambda i: (-sims[i], ids[i])
    )
    out = []
    for i in order:
        if ids[i] == aid or ids[i] in exclude_ids:
            continue
        if exclude_label is not None and lbl[ids[i]] == exclude_label:
            continue
        out.append(int(ids[i]))
        if len(out) == k:
            break
    return out


def test_matches_numpy_reference_no_exclusions(spark, emb, anchors, np_ref):
    mined = mine_hard_negatives(emb, anchors, k=K, overfetch=OVERFETCH)
    got = {}
    for r in mined.collect():
        got.setdefault(r["anchor_id"], []).append((r["rank"], r["neg_id"]))
    for aid, rr in got.items():
        ordered = [n for _, n in sorted(rr)]
        assert ordered == _ref_negatives(np_ref, aid, K), aid


def test_label_exclusion(spark, emb, anchors, np_ref):
    mined = mine_hard_negatives(
        emb, anchors, k=K, overfetch=OVERFETCH, label_col="label"
    )
    _ids, _mat, lbl = np_ref
    got = {}
    for r in mined.collect():
        got.setdefault(r["anchor_id"], []).append((r["rank"], r["neg_id"]))
    assert got, "no negatives mined"
    for aid, rr in got.items():
        ordered = [n for _, n in sorted(rr)]
        # no negative shares the anchor's label
        assert all(lbl[n] != lbl[aid] for n in ordered), aid
        assert ordered == _ref_negatives(
            np_ref, aid, K, exclude_label=lbl[aid]
        ), aid


def test_positive_pairs_excluded(spark, emb, anchors, np_ref):
    base = mine_hard_negatives(emb, anchors, k=K, overfetch=OVERFETCH)
    top1 = {
        r["anchor_id"]: r["neg_id"]
        for r in base.filter(F.col("rank") == 1).collect()
    }
    pos = spark.createDataFrame(
        [(a, n) for a, n in top1.items()], "anchor_id long, pos_id long"
    )
    mined = mine_hard_negatives(
        emb, anchors, k=K, overfetch=OVERFETCH, positives=pos
    )
    for r in mined.collect():
        assert r["neg_id"] != top1[r["anchor_id"]]
    # and the reference agrees on the re-ranked list
    got = {}
    for r in mined.collect():
        got.setdefault(r["anchor_id"], []).append((r["rank"], r["neg_id"]))
    for aid, rr in got.items():
        ordered = [n for _, n in sorted(rr)]
        assert ordered == _ref_negatives(
            np_ref, aid, K, exclude_ids={top1[aid]}
        ), aid


def test_shortfall_ledger(spark, emb):
    """An anchor whose overfetch window is saturated by exclusions
    reports a shortfall instead of silently under-delivering."""
    one = emb.filter(F.col("vec_id") == 3)
    base = mine_hard_negatives(emb, one, k=3, overfetch=2)
    # exclude every retrieved candidate -> shortfall
    pos = base.select(
        F.col("anchor_id"), F.col("neg_id").alias("pos_id")
    )
    mined = mine_hard_negatives(emb, one, k=3, overfetch=2, positives=pos)
    rep = mining_report(mined, one, k=3).collect()[0]
    assert rep["shortfall"] and rep["n_negatives"] < 3


def test_candidates_passthrough(spark, emb, anchors):
    """A pre-computed candidate set (index-probe shape) skips
    retrieval but keeps exclusion + re-rank semantics."""
    cand = spark.createDataFrame(
        [(3, 10, 0.9), (3, 11, 0.8), (3, 3, 1.0)],
        "query_id long, vec_id long, cos_sim double",
    )
    mined = mine_hard_negatives(
        emb, anchors, k=2, candidates=cand
    ).collect()
    assert [(r["neg_id"], r["rank"]) for r in sorted(
        mined, key=lambda r: r["rank"]
    )] == [(10, 1), (11, 2)]  # self-match (3,3) dropped
