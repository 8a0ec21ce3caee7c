"""Late-interaction MaxSim search (operators/multivec.py): kernel
arithmetic vs a literal python reference, ragged documents, rank/tie
contracts, the embedding-chunk derivation, and retrieval behavior a
single-vector cosine provably misses (the operator's reason to
exist)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from xmidt_event_streams_spark.operators.multivec import (
    chunk_embedding_tokens,
    maxsim_score_block,
    maxsim_topk,
)


def _ref_maxsim(Q, D):
    return sum(max(float(np.dot(q, d)) for d in D) for q in Q)


def test_score_block_matches_reference():
    rng = np.random.default_rng(4)
    docs = [rng.normal(size=(t, 6)) for t in (3, 1, 5, 2)]
    flat = np.concatenate(docs, axis=0)
    starts = np.concatenate(
        [[0], np.cumsum([d.shape[0] for d in docs])[:-1]]
    )
    Q = rng.normal(size=(4, 6))
    got = maxsim_score_block(flat, starts, Q)
    want = [_ref_maxsim(Q, d) for d in docs]
    assert np.allclose(got, want)


def test_topk_matches_reference_and_rank_contract(spark):
    rng = np.random.default_rng(9)
    docs = {
        i: rng.normal(size=(int(rng.integers(1, 6)), 4)) for i in range(40)
    }
    df = spark.createDataFrame(
        [(i, [[float(x) for x in row] for row in m]) for i, m in docs.items()],
        "doc_id long, token_vecs array<array<double>>",
    )
    Q = rng.normal(size=(3, 4))
    got = maxsim_topk(df, [(7, Q.tolist())], k_neighbors=5).collect()
    want = sorted(
        ((round(_ref_maxsim(Q, m), 6), -i) for i, m in docs.items()),
        reverse=True,
    )[:5]
    assert [(r["maxsim"], -r["doc_id"]) for r in sorted(
        got, key=lambda r: r["rank"]
    )] == [(s, i) for s, i in want]
    assert [r["rank"] for r in sorted(got, key=lambda r: r["rank"])] == [
        1, 2, 3, 4, 5,
    ]


def test_null_and_empty_docs_skipped(spark):
    df = spark.createDataFrame(
        [
            (1, [[1.0, 0.0]]),
            (2, None),
            (3, []),
        ],
        "doc_id long, token_vecs array<array<double>>",
    )
    got = maxsim_topk(df, [(0, [[1.0, 0.0]])], k_neighbors=5).collect()
    assert [r["doc_id"] for r in got] == [1]


def test_dim_mismatch_raises(spark):
    df = spark.createDataFrame(
        [(1, [[1.0, 0.0, 0.0]])],
        "doc_id long, token_vecs array<array<double>>",
    )
    with pytest.raises(Exception, match="dim"):
        maxsim_topk(df, [(0, [[1.0, 0.0]])], k_neighbors=2).collect()


def test_empty_queries_empty_result(spark):
    df = spark.createDataFrame(
        [(1, [[1.0, 0.0]])], "doc_id long, token_vecs array<array<double>>"
    )
    out = maxsim_topk(df, [], k_neighbors=3)
    assert out.count() == 0 and "maxsim" in out.columns


def test_chunk_embedding_tokens_slices_exactly(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").limit(5)
    toks = chunk_embedding_tokens(emb, 4).collect()
    for r in toks:
        full = list(r["embedding"])
        flat = [x for t in r["token_vecs"] for x in t]
        assert len(r["token_vecs"]) == 4
        assert np.allclose(flat, full)


def test_maxsim_finds_phrase_match_cosine_misses(spark):
    """The operator's reason to exist: a document sharing one strong
    token-level match with the query outranks a document that is
    diffusely similar, even when the MEAN-pooled cosine says the
    opposite. Construct it: doc A has one token exactly equal to one
    query token (plus orthogonal noise tokens); doc B's tokens all
    weakly align with the query's mean direction."""
    q1 = [1.0, 0.0, 0.0, 0.0]
    q2 = [0.0, 1.0, 0.0, 0.0]
    # A: exact matches for both query tokens + an orthogonal token
    a = [[1.0, 0.0, 0.0, 0.0], [0.0, 1.0, 0.0, 0.0], [0.0, 0.0, 1.0, 0.0]]
    # B: three copies of the diffuse mean direction (0.55, 0.55, ~0)
    b = [[0.55, 0.55, 0.0, 0.0]] * 3
    df = spark.createDataFrame(
        [(1, a), (2, b)], "doc_id long, token_vecs array<array<double>>"
    )
    got = {
        r["doc_id"]: r["maxsim"]
        for r in maxsim_topk(df, [(0, [q1, q2])], k_neighbors=2).collect()
    }
    assert got[1] > got[2], got
    # mean-pooled cosine prefers B (the single-vector blind spot)
    am = np.mean(a, axis=0)
    bm = np.mean(b, axis=0)
    qm = np.mean([q1, q2], axis=0)
    cos = lambda x, y: float(  # noqa: E731
        np.dot(x, y) / (np.linalg.norm(x) * np.linalg.norm(y))
    )
    assert cos(bm, qm) > cos(am, qm)
