"""OPQ (operators/opq.py): learned orthogonal rotation ahead of PQ --
distortion never worse than plain PQ (dual-start contract), recall
strictly better on rotation-favorable corpora, exact distance
preservation, index sidecar refusal contract.

The test corpus is the regime OPQ exists for: variance mixed across
the fixed coordinate blocks (a random mixing matrix with a decaying
spectrum, normalized rows). Plain PQ's fixed blocks see correlated,
unbalanced signal; the learned rotation re-axes it (measured here:
recall@10 roughly triples at the same bytes/row).
"""

from __future__ import annotations

import numpy as np
import pytest

from xmidt_event_streams_spark.operators.opq import (
    _reconstruct,
    eigenvalue_allocation_init,
    opq_encode,
    opq_fit,
    opq_topk,
    probe_opq_index,
    rotate_vectors,
    write_opq_index,
)

N, DIM, M, K = 8000, 16, 4, 16


def _corpus(n=N, dim=DIM, seed=5):
    rng = np.random.default_rng(seed)
    A = rng.normal(size=(dim, dim)) * np.geomspace(1, 0.02, dim)[:, None]
    X = rng.normal(size=(n, dim)) @ A
    X /= np.linalg.norm(X, axis=1, keepdims=True)
    return X


@pytest.fixture(scope="module")
def oc(spark):
    X = _corpus()
    df = spark.createDataFrame(
        [(int(i), [float(x) for x in X[i]]) for i in range(len(X))],
        "vec_id long, embedding array<double>",
    )
    R, cb = opq_fit(df, m=M, k=K, n_iters=3, opq_iters=6)
    return {"X": X, "df": df, "R": R, "cb": cb}


def test_rotation_is_orthogonal(oc):
    R = np.asarray(oc["R"])
    assert np.abs(R @ R.T - np.eye(DIM)).max() < 1e-9


def test_eigenvalue_allocation_init_is_orthogonal():
    X = _corpus(n=2000)
    R = eigenvalue_allocation_init(X, M)
    assert np.abs(R @ R.T - np.eye(DIM)).max() < 1e-9


def test_opq_distortion_never_worse_than_pq(oc):
    """The dual-start contract: opq_fit runs the alternation from
    both the identity and the eigen-allocation init and keeps the
    lower final distortion; the identity start's first codebook fit
    IS plain PQ and the alternation is monotone, so OPQ sample
    distortion <= PQ's. Verified here against an independently-fit
    plain-PQ codebook on the same sample."""
    from xmidt_event_streams_spark.operators.ivfpq import (
        _lloyd_l2_subspaces,
    )
    from xmidt_event_streams_spark.operators.pq import _encode_block

    X = oc["X"]

    def err(Y, cb):
        cb = np.asarray(cb)
        return float(
            ((Y - _reconstruct(_encode_block(Y, cb), cb)) ** 2)
            .sum(axis=1)
            .mean()
        )

    cb_pq = _lloyd_l2_subspaces(X, M, K, 3)
    R = np.asarray(oc["R"])
    assert err(X @ R, oc["cb"]) <= err(X, cb_pq) + 1e-9


def test_opq_recall_beats_pq_on_mixed_corpus(spark, oc):
    """The headline claim at equal bytes/row: the rotation lifts
    recall@10 on a variance-mixed corpus. Measured 0.09 (PQ) vs ~0.3
    (OPQ) at 30k rows; pinned with margin at this 8k-row size."""
    from xmidt_event_streams_spark.operators.pq import (
        pq_encode,
        pq_fit,
        pq_topk,
    )
    from xmidt_event_streams_spark.operators.similarity import (
        brute_force_topk,
    )

    df = oc["df"]
    qdf = df.filter("vec_id % 400 = 7")
    qrows = [
        (int(r["vec_id"]), list(r["embedding"])) for r in qdf.collect()
    ]
    exact: dict = {}
    for r in brute_force_topk(df, qdf, k=10).collect():
        exact.setdefault(r["query_id"], set()).add(r["vec_id"])

    def recall(rows_):
        got: dict = {}
        for r in rows_:
            got.setdefault(r["query_id"], set()).add(r["vec_id"])
        return sum(
            len(exact[q] & (got.get(q, set()) - {q})) / len(exact[q])
            for q in exact
        ) / len(exact)

    cb_pq = pq_fit(df.filter("vec_id % 3 = 0"), m=M, k=K, n_iters=3)
    r_pq = recall(
        pq_topk(
            pq_encode(df, cb_pq).select("vec_id", "codes"),
            qrows,
            cb_pq,
            11,
        ).collect()
    )
    codes = opq_encode(df, oc["R"], oc["cb"]).select("vec_id", "codes")
    r_opq = recall(
        opq_topk(codes, qrows, oc["R"], oc["cb"], 11).collect()
    )
    assert r_opq > r_pq, (r_opq, r_pq)
    assert r_opq >= 0.2, r_opq


def test_rotate_vectors_preserves_distances(spark, oc):
    rows = (
        rotate_vectors(oc["df"].limit(50), oc["R"])
        .select("vec_id", "embedding")
        .collect()
    )
    X = oc["X"]
    got = {r["vec_id"]: np.asarray(r["embedding"]) for r in rows}
    ids = sorted(got)[:10]
    for a in ids[:3]:
        for b in ids:
            orig = float(((X[a] - X[b]) ** 2).sum())
            rot = float(((got[a] - got[b]) ** 2).sum())
            assert abs(orig - rot) < 1e-9


def test_rotate_vectors_nulls_ragged(spark, oc):
    df = spark.createDataFrame(
        [(1, [0.1] * DIM), (2, None), (3, [0.2] * (DIM - 1))],
        "vec_id long, embedding array<double>",
    )
    rows = {
        r["vec_id"]: r["embedding"]
        for r in rotate_vectors(df, oc["R"]).collect()
    }
    assert rows[1] is not None
    assert rows[2] is None and rows[3] is None


def test_opq_index_roundtrip_and_refusals(spark, oc, tmp_path):
    path = str(tmp_path / "opq_ix")
    write_opq_index(oc["df"], path, oc["R"], oc["cb"])
    qrows = [(int(i), [float(x) for x in oc["X"][i]]) for i in range(3)]
    got = probe_opq_index(spark, path, qrows, k_neighbors=5)
    assert got.count() == 15
    assert set(got.columns) == {"query_id", "vec_id", "adc_dist", "rank"}
    # rerank arm returns exact distances against the ORIGINAL relation
    rr = probe_opq_index(
        spark, path, qrows, k_neighbors=5, rerank=30, vectors=oc["df"]
    )
    assert "exact_dist" in rr.columns and rr.count() == 15
    with pytest.raises(ValueError, match="sidecar"):
        probe_opq_index(spark, str(tmp_path / "nope"), qrows)


def test_opq_equals_pq_under_identity_rotation(spark, oc):
    """R = I must reproduce pq_topk EXACTLY (same codes, same LUTs,
    same tie-breaks): the rotation is the only moving part."""
    from xmidt_event_streams_spark.operators.ivfpq import (
        _lloyd_l2_subspaces,
    )
    from xmidt_event_streams_spark.operators.pq import (
        pq_encode,
        pq_topk,
    )

    df = oc["df"].limit(2000)
    cb = _lloyd_l2_subspaces(oc["X"][:2000], M, K, 2).tolist()
    eye = np.eye(DIM).tolist()
    qrows = [(int(i), [float(x) for x in oc["X"][i]]) for i in range(3)]
    a = sorted(
        (r["query_id"], r["vec_id"], r["rank"])
        for r in pq_topk(
            pq_encode(df, cb).select("vec_id", "codes"), qrows, cb, 7
        ).collect()
    )
    b = sorted(
        (r["query_id"], r["vec_id"], r["rank"])
        for r in opq_topk(
            opq_encode(df, eye, cb).select("vec_id", "codes"),
            qrows,
            eye,
            cb,
            7,
        ).collect()
    )
    assert a == b


def test_opq_composes_with_ivfpq(spark, oc, tmp_path):
    """The FAISS `OPQd,IVFx,PQy` shape by plain column composition
    (USAGE.md's recipe): rotate once, index the rotated column, rotate
    queries driver-side. Ids are rotation-independent and L2 is
    rotation-invariant, so recall against the ORIGINAL-space exact
    top-k is the apples-to-apples check."""
    from xmidt_event_streams_spark.operators.ivfpq import (
        ivfpq_fit,
        probe_ivfpq_index,
        write_ivfpq_index,
    )
    from xmidt_event_streams_spark.operators.similarity import (
        brute_force_topk,
    )

    df, R = oc["df"], np.asarray(oc["R"])
    rot = rotate_vectors(df, oc["R"], "embedding", out_col="emb_r")
    cents, cbs = ivfpq_fit(
        rot, n_cells=8, m=M, k=K, n_iters=2, vec_col="emb_r"
    )
    path = str(tmp_path / "opq_ivfpq")
    write_ivfpq_index(rot, path, cents, cbs, vec_col="emb_r",
                      refine="sq8")
    qdf = df.filter("vec_id % 400 = 7")
    exact: dict = {}
    for r in brute_force_topk(df, qdf, k=10).collect():
        exact.setdefault(r["query_id"], set()).add(r["vec_id"])
    qrows = [
        (int(r["vec_id"]), list(np.asarray(r["embedding"]) @ R))
        for r in qdf.collect()
    ]
    got: dict = {}
    for r in probe_ivfpq_index(
        spark, path, qrows, k_neighbors=10, n_probe=6, rerank=40
    ).collect():
        got.setdefault(r["query_id"], set()).add(r["vec_id"])
    recall = sum(
        len(exact[q] & got.get(q, set())) / len(exact[q]) for q in exact
    ) / len(exact)
    # rotated-space IVF-PQ with in-index refine must recover original-
    # space neighbors (floor with margin; measured well above)
    assert recall >= 0.6, recall
