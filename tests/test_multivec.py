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


class TestTwoStageServing:
    """maxsim_rerank_topk: the retrieve-then-rerank scale shape. The
    contract: with a shortlist covering the corpus it EQUALS brute
    maxsim_topk; with a tight shortlist it scores only candidates and
    recall follows the pooled retriever's recall@C."""

    def _docs(self, spark, n=60, seed=2):
        rng = np.random.default_rng(seed)
        rows = []
        for i in range(n):
            m = rng.normal(size=(4, 8))
            m /= np.linalg.norm(m, axis=1, keepdims=True)
            rows.append((i, [[float(x) for x in r] for r in m]))
        return spark.createDataFrame(
            rows, "doc_id long, token_vecs array<array<double>>"
        ), rows

    def test_full_shortlist_equals_brute(self, spark):
        from xmidt_event_streams_spark.operators.multivec import (
            maxsim_rerank_topk,
        )

        df, rows = self._docs(spark)
        queries = [(int(i), rows[i][1]) for i in (0, 7)]
        # the staged operator inherits the retrievers' self-exclusion
        # (docstring contract); compare against brute WITHOUT self
        brute_rows = maxsim_topk(df, queries, k_neighbors=6).collect()
        per_q: dict = {}
        for r in brute_rows:
            if r["doc_id"] != r["query_id"]:
                per_q.setdefault(r["query_id"], []).append(
                    (-r["maxsim"], r["doc_id"])
                )
        brute = sorted(
            (q, d, rk + 1)
            for q, cands in per_q.items()
            for rk, (_, d) in enumerate(sorted(cands)[:5])
        )
        staged = sorted(
            (r["query_id"], r["doc_id"], r["rank"])
            for r in maxsim_rerank_topk(
                df, queries, k_neighbors=5, prefilter_c=60
            ).collect()
        )
        assert staged == brute

    def test_tight_shortlist_restricts_to_candidates(self, spark):
        from xmidt_event_streams_spark.operators.multivec import (
            maxsim_rerank_topk,
            pooled_tokens,
        )
        from xmidt_event_streams_spark.operators.similarity import (
            brute_force_topk,
        )

        df, rows = self._docs(spark)
        queries = [(0, rows[0][1])]
        got = maxsim_rerank_topk(
            df, queries, k_neighbors=5, prefilter_c=8
        ).collect()
        assert len(got) == 5
        pooled = pooled_tokens(df)
        qdf = spark.createDataFrame(
            [(0, [float(x) for x in np.mean(rows[0][1], axis=0)])],
            "doc_id long, embedding array<double>",
        )
        short = {
            r["doc_id"]
            for r in brute_force_topk(
                pooled, qdf, k=8, id_col="doc_id"
            ).collect()
        }
        assert {r["doc_id"] for r in got} <= short

    def test_ivf_prefilter_arm(self, spark, tmp_path):
        from xmidt_event_streams_spark.operators.ivf import (
            kmeans_fit,
            write_ivf_index,
        )
        from xmidt_event_streams_spark.operators.multivec import (
            maxsim_rerank_topk,
            pooled_tokens,
        )

        df, rows = self._docs(spark)
        pooled = pooled_tokens(df).withColumnRenamed("doc_id", "doc_id")
        path = str(tmp_path / "pooled_ix")
        cents = kmeans_fit(pooled, 4, 2, id_col="doc_id")
        write_ivf_index(pooled, path, cents, id_col="doc_id")
        got = maxsim_rerank_topk(
            df,
            [(0, rows[0][1])],
            k_neighbors=5,
            prefilter_c=20,
            pooled_index_path=path,
            n_probe=4,
        ).collect()
        assert len(got) == 5
        assert all(r["query_id"] == 0 for r in got)

    def test_pooled_tokens_mean_and_nulls(self, spark):
        from xmidt_event_streams_spark.operators.multivec import (
            pooled_tokens,
        )

        df = spark.createDataFrame(
            [(1, [[2.0, 0.0], [0.0, 2.0]]), (2, None), (3, [])],
            "doc_id long, token_vecs array<array<double>>",
        )
        rows = {r["doc_id"]: r["embedding"] for r in pooled_tokens(df).collect()}
        assert rows[1] == [1.0, 1.0]
        assert rows[2] is None and rows[3] is None


def test_divergent_shortlists_keep_each_querys_candidates(spark):
    """Review fix: the inner MaxSim pass used to truncate to the
    UNION's top-C, so a query whose shortlist scored uniformly lower
    than another query's lost its entire result set. Two queries in
    orthogonal subspaces with small C must EACH return k rows from
    their own shortlists."""
    from xmidt_event_streams_spark.operators.multivec import (
        maxsim_rerank_topk,
    )

    rng = np.random.default_rng(6)
    rows = []
    # docs 0-19 live in dims 0-3 (query A's subspace), scaled LOW;
    # docs 20-39 in dims 4-7 (query B's subspace), scaled HIGH --
    # every B-doc outscores every A-doc for ANY query, so the union
    # top-C would be all B docs
    for i in range(20):
        m = np.zeros((2, 8)); m[:, :4] = rng.normal(size=(2, 4)) * 0.2
        rows.append((i, [[float(x) for x in r] for r in m]))
    for i in range(20, 40):
        m = np.zeros((2, 8)); m[:, 4:] = rng.normal(size=(2, 4)) * 5.0
        rows.append((i, [[float(x) for x in r] for r in m]))
    df = spark.createDataFrame(
        rows, "doc_id long, token_vecs array<array<double>>"
    )
    qa = np.zeros((2, 8)); qa[:, :4] = rng.normal(size=(2, 4))
    qb = np.zeros((2, 8)); qb[:, 4:] = rng.normal(size=(2, 4))
    got = maxsim_rerank_topk(
        df,
        [(100, qa.tolist()), (200, qb.tolist())],
        k_neighbors=4,
        prefilter_c=6,
    ).collect()
    per_q: dict = {}
    for r in got:
        per_q.setdefault(r["query_id"], []).append(r["doc_id"])
    assert len(per_q[100]) == 4 and all(d < 20 for d in per_q[100]), per_q
    assert len(per_q[200]) == 4 and all(d >= 20 for d in per_q[200]), per_q
