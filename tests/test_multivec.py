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


class TestInIndexMaxSim:
    """write_maxsim_index / probe_maxsim_index: the fetch-free
    two-stage -- token payload carried by the probe's own scan
    (the ivfpq refine='sq8' posture applied to multi-vector)."""

    def _docs(self, spark, n=60, seed=11):
        rng = np.random.default_rng(seed)
        rows = []
        for i in range(n):
            t = int(rng.integers(2, 6))  # ragged token counts
            m = rng.normal(size=(t, 8))
            m /= np.linalg.norm(m, axis=1, keepdims=True)
            rows.append((i, [[float(x) for x in r] for r in m]))
        df = spark.createDataFrame(
            rows, "doc_id long, token_vecs array<array<double>>"
        )
        return df, rows

    def _index(self, spark, tmp_path, df):
        from xmidt_event_streams_spark.operators.ivf import kmeans_fit
        from xmidt_event_streams_spark.operators.multivec import (
            pooled_tokens,
            write_maxsim_index,
        )

        path = str(tmp_path / "mvix")
        cents = kmeans_fit(pooled_tokens(df), 4, 2, id_col="doc_id")
        write_maxsim_index(df, path, cents)
        return path, cents

    def test_full_probe_matches_sq8_reference(self, spark, tmp_path):
        """n_probe = all cells, C >= corpus: the output is EXACTLY the
        top-k by MaxSim over SQ8-decoded tokens (self excluded) -- the
        whole pipeline (encode -> write -> manifest probe -> in-scan
        payload carry -> driver decode -> rerank) against a literal
        numpy reference."""
        from xmidt_event_streams_spark.operators.multivec import (
            probe_maxsim_index,
        )
        from xmidt_event_streams_spark.operators.sq import (
            sq8_decode_block,
            sq8_encode_block,
        )

        df, rows = self._docs(spark)
        path, _ = self._index(spark, tmp_path, df)
        queries = [(int(i), rows[i][1]) for i in (0, 5)]
        got = sorted(
            (r["query_id"], r["rank"], r["doc_id"], r["maxsim"])
            for r in probe_maxsim_index(
                spark, path, queries, k_neighbors=5, n_probe=4,
                prefilter_c=1000,
            ).collect()
        )
        want = []
        for qid, qm in queries:
            Q = np.asarray(qm)
            scored = []
            for i, m in rows:
                if i == qid:
                    continue
                raw, lo, step = sq8_encode_block(np.asarray(m))
                dec = sq8_decode_block(raw, lo, step)
                scored.append(
                    (-round(_ref_maxsim(Q, dec), 6), i)
                )
            for rk, (neg, i) in enumerate(sorted(scored)[:5], start=1):
                want.append((qid, rk, i, -neg))
        assert got == sorted(want)

    def test_pooled_only_matches_numpy_cosine(self, spark, tmp_path):
        from xmidt_event_streams_spark.operators.multivec import (
            probe_maxsim_index,
        )

        df, rows = self._docs(spark)
        path, _ = self._index(spark, tmp_path, df)
        q = rows[3][1]
        got = [
            (r["rank"], r["doc_id"], r["cos_sim"])
            for r in sorted(
                probe_maxsim_index(
                    spark, path, [(3, q)], k_neighbors=5, n_probe=4,
                    pooled_only=True,
                ).collect(),
                key=lambda r: r["rank"],
            )
        ]
        qv = np.mean(np.asarray(q), axis=0)
        qv = qv / np.linalg.norm(qv)
        scored = []
        for i, m in rows:
            if i == 3:
                continue
            dv = np.mean(np.asarray(m), axis=0)
            dv = dv / np.linalg.norm(dv)
            scored.append((-round(float(dv @ qv), 6), i))
        want = [
            (rk, i, -neg)
            for rk, (neg, i) in enumerate(sorted(scored)[:5], start=1)
        ]
        assert got == want

    def test_two_stage_adds_zero_spark_jobs(self, spark, tmp_path):
        """The payload's whole point: a reranking probe costs exactly
        the Spark jobs of the pooled-only probe -- the shortlist's
        token matrices ride the probe's own scan, never a second
        fetch job. (maxsim_rerank_topk, the fetch arm, pays extra
        jobs for the same work -- measured in the bench sidecar.)"""
        from tests.jobcount import count_jobs
        from xmidt_event_streams_spark.operators.multivec import (
            probe_maxsim_index,
        )

        df, rows = self._docs(spark)
        path, _ = self._index(spark, tmp_path, df)
        queries = [(int(i), rows[i][1]) for i in (0, 5)]
        # warm both paths (first-call footer reads / listener catch-up)
        probe_maxsim_index(
            spark, path, queries, k_neighbors=5, n_probe=2,
            pooled_only=True,
        )
        probe_maxsim_index(
            spark, path, queries, k_neighbors=5, n_probe=2,
            prefilter_c=20,
        )
        pooled = count_jobs(spark, lambda: probe_maxsim_index(
            spark, path, queries, k_neighbors=5, n_probe=2,
            pooled_only=True,
        ))
        staged = count_jobs(spark, lambda: probe_maxsim_index(
            spark, path, queries, k_neighbors=5, n_probe=2,
            prefilter_c=20,
        ))
        assert staged == pooled, (staged, pooled)

    def test_probe_triggers_no_listing_job(self, spark, tmp_path):
        from tests.jobcount import listing_jobs
        from xmidt_event_streams_spark.operators.multivec import (
            probe_maxsim_index,
        )

        df, rows = self._docs(spark)
        path, _ = self._index(spark, tmp_path, df)
        key = "spark.sql.sources.parallelPartitionDiscovery.threshold"
        prev = spark.conf.get(key)
        spark.conf.set(key, "1")
        try:
            res: dict = {}
            hits = listing_jobs(spark, lambda: res.setdefault(
                "n",
                probe_maxsim_index(
                    spark, path, [(0, rows[0][1])], k_neighbors=5,
                    n_probe=2, prefilter_c=20,
                ).count(),
            ))
            assert res["n"] > 0
            assert hits == []
        finally:
            spark.conf.set(key, prev)

    def test_recall_vs_exact_maxsim(self, spark, tmp_path):
        """Full-probe recall@5 vs exact (unquantized) MaxSim: SQ8
        reconstruction may flip only near-ties, so recall stays high;
        the pooled-retriever ceiling is exercised separately in the
        bench sidecar."""
        from xmidt_event_streams_spark.operators.multivec import (
            probe_maxsim_index,
        )

        df, rows = self._docs(spark, n=80, seed=23)
        path, _ = self._index(spark, tmp_path, df)
        queries = [(int(i), rows[i][1]) for i in (0, 7, 11)]
        got = probe_maxsim_index(
            spark, path, queries, k_neighbors=5, n_probe=4,
            prefilter_c=1000,
        ).collect()
        by_q: dict = {}
        for r in got:
            by_q.setdefault(r["query_id"], set()).add(r["doc_id"])
        hits = tot = 0
        for qid, qm in queries:
            Q = np.asarray(qm)
            exact = sorted(
                (-round(_ref_maxsim(Q, np.asarray(m)), 6), i)
                for i, m in rows
                if i != qid
            )[:5]
            want = {i for _, i in exact}
            hits += len(want & by_q[qid])
            tot += 5
        assert hits / tot >= 0.9, hits / tot

    def test_ragged_and_poison_rows_skipped(self, spark, tmp_path):
        """Null/empty token lists and wrong-dim rows are contained at
        write time (V9 posture): the index holds only valid docs."""
        from xmidt_event_streams_spark.operators.ivf import kmeans_fit
        from xmidt_event_streams_spark.operators.multivec import (
            pooled_tokens,
            probe_maxsim_index,
            write_maxsim_index,
        )

        good = [
            (1, [[1.0, 0.0], [0.0, 1.0]]),
            (2, [[0.6, 0.8]]),
            (3, [[0.0, 1.0], [1.0, 0.0], [0.6, 0.8]]),
        ]
        # 7-9: null list / empty / uniform-wrong-dim; 10: INTRA-doc
        # ragged (np.asarray raises ValueError before any shape
        # check); 11: a null token entry (TypeError) -- both must be
        # contained, not crash the whole write job
        bad = [
            (7, None),
            (8, []),
            (9, [[1.0, 0.0, 0.0]]),
            (10, [[1.0, 0.0], [1.0]]),
            (11, [[1.0, 0.0], None]),
        ]
        df = spark.createDataFrame(
            good + bad, "doc_id long, token_vecs array<array<double>>"
        )
        path = str(tmp_path / "mvix")
        good_df = spark.createDataFrame(
            good, "doc_id long, token_vecs array<array<double>>"
        )
        cents = kmeans_fit(pooled_tokens(good_df), 2, 2, id_col="doc_id")
        write_maxsim_index(df, path, cents)
        got = probe_maxsim_index(
            spark, path, [(0, [[1.0, 0.0]])], k_neighbors=10,
            n_probe=2, prefilter_c=100,
        ).collect()
        assert sorted(r["doc_id"] for r in got) == [1, 2, 3]

    def test_token_stats_stamped_and_folded(self, spark, tmp_path):
        """The sidecar carries the corpus's (n_docs, mean_tokens):
        stamped exactly at write, weighted-merged on append, resynced
        exactly at compaction -- the probe's byte-aware driver-merge
        guard sizes carried payload from it (a hardcoded tokens/doc
        underestimates real late-interaction corpora ~25x)."""
        from xmidt_event_streams_spark.fsutil import read_json_sidecar
        from xmidt_event_streams_spark.operators.multivec import (
            _MAXSIM_META_FILE,
            append_to_maxsim_index,
            compact_maxsim_index,
        )

        df, rows = self._docs(spark)
        path, _ = self._index(spark, tmp_path, df)
        tok_counts = [len(m) for _, m in rows]
        meta = read_json_sidecar(spark, path, _MAXSIM_META_FILE)
        assert meta["n_docs"] == len(rows)
        assert meta["mean_tokens"] == pytest.approx(
            sum(tok_counts) / len(tok_counts)
        )

        more, more_rows = self._docs(spark, n=20, seed=99)
        more = more.withColumn(
            "doc_id", F.col("doc_id") + F.lit(1000)
        )
        append_to_maxsim_index(more, path)
        all_counts = tok_counts + [len(m) for _, m in more_rows]
        meta = read_json_sidecar(spark, path, _MAXSIM_META_FILE)
        assert meta["n_docs"] == len(all_counts)
        assert meta["mean_tokens"] == pytest.approx(
            sum(all_counts) / len(all_counts)
        )

        compact_maxsim_index(spark, path)
        meta = read_json_sidecar(spark, path, _MAXSIM_META_FILE)
        assert meta["n_docs"] == len(all_counts)
        assert meta["mean_tokens"] == pytest.approx(
            sum(all_counts) / len(all_counts)
        )

    def test_compact_and_takedown_preserve_probe(self, spark, tmp_path):
        """The maxsim index rides the family's shared lifecycle:
        compact_maxsim_index dedups/rewrites through the shared
        compactor (manifest regenerated, id-sort preserved) and
        tombstoned ids disappear from probes while every other
        result row is bit-identical."""
        from xmidt_event_streams_spark.operators.multivec import (
            compact_maxsim_index,
            probe_maxsim_index,
        )

        df, rows = self._docs(spark)
        path, _ = self._index(spark, tmp_path, df)
        queries = [(int(i), rows[i][1]) for i in (0, 5)]

        def probe():
            return sorted(
                (r["query_id"], r["doc_id"], r["maxsim"])
                for r in probe_maxsim_index(
                    spark, path, queries, k_neighbors=50, n_probe=4,
                    prefilter_c=1000,
                ).collect()
            )

        before = probe()
        out = compact_maxsim_index(spark, path)
        assert out["rows_after"] == out["rows_before"]
        assert probe() == before  # pure rewrite: results identical
        victims = {int(before[0][1]), int(before[1][1])}
        compact_maxsim_index(spark, path, tombstones=sorted(victims))
        after = probe()
        assert not {d for _, d, _ in after} & victims
        # every surviving before-row keeps its exact score (removal
        # can only ADD new tail entries, never perturb the rest)
        assert {t for t in before if t[1] not in victims} <= set(after)

    def test_distributed_merge_path_identical(
        self, spark, tmp_path, monkeypatch
    ):
        """The driver-merge guard's fallback (pre-fold partials to
        queries x n_short rows via a repartition-by-query merge before
        the collect) must be result-identical to the direct path --
        forced here by shrinking the imported row cap to 1."""
        import xmidt_event_streams_spark.operators.ivfpq as ivfpq
        from xmidt_event_streams_spark.operators.multivec import (
            probe_maxsim_index,
        )

        df, rows = self._docs(spark)
        path, _ = self._index(spark, tmp_path, df)
        queries = [(int(i), rows[i][1]) for i in (0, 5)]

        def run():
            return sorted(
                tuple(r)
                for r in probe_maxsim_index(
                    spark, path, queries, k_neighbors=5, n_probe=4,
                    prefilter_c=20,
                ).collect()
            )

        direct = run()
        monkeypatch.setattr(ivfpq, "_DRIVER_MERGE_MAX_ROWS", 1)
        assert run() == direct
        # and the pooled-only arm through the same fallback
        pooled = sorted(
            tuple(r)
            for r in probe_maxsim_index(
                spark, path, queries, k_neighbors=5, n_probe=4,
                pooled_only=True,
            ).collect()
        )
        monkeypatch.undo()
        assert sorted(
            tuple(r)
            for r in probe_maxsim_index(
                spark, path, queries, k_neighbors=5, n_probe=4,
                pooled_only=True,
            ).collect()
        ) == pooled


class TestTokenRetrieval:
    """retrieval='token' (r10): per-query-token probed-cell union +
    exact-over-SQ8 MaxSim scored IN the scan -- the published
    ColBERT/PLAID candidate-generation shape over this layout. Lifts
    the pooled retriever's recall ceiling; only (query_id, id, score)
    rows reach the driver."""

    _docs = TestInIndexMaxSim._docs
    _index = TestInIndexMaxSim._index

    def test_full_width_matches_sq8_reference(self, spark, tmp_path):
        """n_probe = all cells: the token arm's output is EXACTLY the
        top-k by MaxSim over SQ8-decoded tokens (self excluded) --
        same literal-numpy oracle as the pooled full-probe test, so
        the two arms agree wherever both have full coverage."""
        from xmidt_event_streams_spark.operators.multivec import (
            probe_maxsim_index,
        )
        from xmidt_event_streams_spark.operators.sq import (
            sq8_decode_block,
            sq8_encode_block,
        )

        df, rows = self._docs(spark)
        path, _ = self._index(spark, tmp_path, df)
        queries = [(int(i), rows[i][1]) for i in (0, 5)]
        got = sorted(
            (r["query_id"], r["rank"], r["doc_id"], r["maxsim"])
            for r in probe_maxsim_index(
                spark, path, queries, k_neighbors=5, n_probe=4,
                retrieval="token",
            ).collect()
        )
        want = []
        for qid, qm in queries:
            Q = np.asarray(qm)
            scored = []
            for i, m in rows:
                if i == qid:
                    continue
                raw, lo, step = sq8_encode_block(np.asarray(m))
                dec = sq8_decode_block(raw, lo, step)
                scored.append((-round(_ref_maxsim(Q, dec), 6), i))
            for rk, (neg, i) in enumerate(sorted(scored)[:5], start=1):
                want.append((qid, rk, i, -neg))
        assert got == sorted(want)

    def test_token_probe_costs_no_extra_jobs(self, spark, tmp_path):
        """Same manifest machinery as the pooled arm: job count of a
        token probe equals a pooled-only probe's (no listing job, no
        second scan, no fetch)."""
        from tests.jobcount import count_jobs
        from xmidt_event_streams_spark.operators.multivec import (
            probe_maxsim_index,
        )

        df, rows = self._docs(spark)
        path, _ = self._index(spark, tmp_path, df)
        queries = [(int(i), rows[i][1]) for i in (0, 5)]
        # warm both paths (first-call footer reads / listener catch-up)
        probe_maxsim_index(
            spark, path, queries, k_neighbors=5, n_probe=2,
            pooled_only=True,
        )
        probe_maxsim_index(
            spark, path, queries, k_neighbors=5, n_probe=2,
            retrieval="token",
        )
        pooled = count_jobs(spark, lambda: probe_maxsim_index(
            spark, path, queries, k_neighbors=5, n_probe=2,
            pooled_only=True,
        ))
        token = count_jobs(spark, lambda: probe_maxsim_index(
            spark, path, queries, k_neighbors=5, n_probe=2,
            retrieval="token",
        ))
        assert token == pooled, (token, pooled)

    def test_token_arm_merge_fallback_identical(
        self, spark, tmp_path, monkeypatch
    ):
        """The driver-merge guard's pre-fold fallback must be
        result-identical for the TOKEN arm on a token-ASSIGNED index
        too -- the combination the pooled-arm pin
        (test_distributed_merge_path_identical) never exercises:
        dup_width > 1 widens the fold to n_short x max_cells_per_doc
        and replicas of one doc (identical exact scores) arrive from
        SEVERAL partitions, so the fallback's repartition-by-query
        fold must keep enough slots for k DISTINCT docs to survive
        into the driver dedupe."""
        import xmidt_event_streams_spark.operators.ivfpq as ivfpq
        from xmidt_event_streams_spark.operators.multivec import (
            probe_maxsim_index,
            write_maxsim_index,
        )

        df, rows = self._docs(spark)
        _, cents = self._index(spark, tmp_path, df)
        tpath = str(tmp_path / "tok_ix")
        write_maxsim_index(
            df, tpath, cents, assign="token", max_cells_per_doc=3
        )
        queries = [(int(i), rows[i][1]) for i in (0, 5)]

        def run():
            return sorted(
                tuple(r)
                for r in probe_maxsim_index(
                    spark, tpath, queries, k_neighbors=5, n_probe=4,
                    retrieval="token",
                ).collect()
            )

        direct = run()
        monkeypatch.setattr(ivfpq, "_DRIVER_MERGE_MAX_ROWS", 1)
        assert run() == direct

    def test_token_assign_lifts_pooled_ceiling(self, spark, tmp_path):
        """The arm's reason to exist: a doc whose POOLED mean lands in
        a cell the pooled probe never opens is still retrieved through
        one strongly-matching token -- PROVIDED the index is token-
        ASSIGNED (assign='token': the doc rides in every capped token
        cell, the ColBERT/PLAID inverted-file shape). Constructed
        corpus: doc 100's tokens = [query-token match, far-away
        filler], so its mean sits in the b-cluster's cell and the
        pooled-assigned pooled probe at n_probe=1 can never see it."""
        from xmidt_event_streams_spark.operators.ivf import kmeans_fit
        from xmidt_event_streams_spark.operators.multivec import (
            _MAXSIM_META_FILE,
            pooled_tokens,
            probe_maxsim_index,
            write_maxsim_index,
        )
        from xmidt_event_streams_spark.fsutil import read_json_sidecar

        e = [0.0] * 8
        a = list(e); a[0] = 1.0          # query direction
        b = list(e); b[1] = 1.0          # a far-away cluster
        mixed = [list(a), [0.0] + [3.0] + [0.0] * 6]  # mean near b
        rows = [(int(i), [b, b]) for i in range(40)]
        rows += [(int(50 + i), [a, a]) for i in range(4)]
        rows.append((100, mixed))
        df = spark.createDataFrame(
            rows, "doc_id long, token_vecs array<array<double>>"
        )
        cents = kmeans_fit(pooled_tokens(df), 2, 4, id_col="doc_id")
        pooled_path = str(tmp_path / "mvp")
        token_path = str(tmp_path / "mvt")
        write_maxsim_index(df, pooled_path, cents)
        write_maxsim_index(df, token_path, cents, assign="token")
        q = [(999, [a])]
        pooled_hits = {
            r["doc_id"]
            for r in probe_maxsim_index(
                spark, pooled_path, q, k_neighbors=5, n_probe=1,
                prefilter_c=100,
            ).collect()
        }
        token_hits = {
            r["doc_id"]
            for r in probe_maxsim_index(
                spark, token_path, q, k_neighbors=5, n_probe=1,
                retrieval="token",
            ).collect()
        }
        # the pooled arm's ceiling: doc 100 maximizes MaxSim against
        # [a] (its first token IS a) but lives in the b-cluster cell,
        # and with n_probe=1 the pooled probe opens only the a-cell
        assert 100 not in pooled_hits
        # the token-assigned arm retrieves it through its a-token
        # replica AND ranks it first (exact-over-SQ8 scoring)
        assert 100 in token_hits
        meta = read_json_sidecar(spark, token_path, _MAXSIM_META_FILE)
        assert meta["assign"] == "token"
        # doc 100 is the only 2-cell doc: amplification (40+4+2)/45
        assert meta["row_amplification"] == pytest.approx(
            46 / 45, abs=1e-3
        )
        # a doc retrieved from MULTIPLE probed cells appears ONCE
        got = probe_maxsim_index(
            spark, token_path, q, k_neighbors=45, n_probe=2,
            retrieval="token",
        ).collect()
        ids = [r["doc_id"] for r in got]
        assert len(ids) == len(set(ids))

    def test_token_assign_lifecycle(self, spark, tmp_path):
        """append honors the stamped token assignment (replicas land
        in the batch docs' token cells); compaction dedups on
        (id, cell) -- never collapsing legitimate replicas -- while a
        tombstone still removes EVERY replica of its id."""
        from xmidt_event_streams_spark.operators.ivf import kmeans_fit
        from xmidt_event_streams_spark.operators.multivec import (
            append_to_maxsim_index,
            compact_maxsim_index,
            pooled_tokens,
            probe_maxsim_index,
            write_maxsim_index,
        )

        df, rows = self._docs(spark)
        cents = kmeans_fit(pooled_tokens(df), 4, 2, id_col="doc_id")
        path = str(tmp_path / "mvt")
        old = df.filter(F.col("doc_id") < 40)
        new = df.filter(F.col("doc_id") >= 40)
        write_maxsim_index(old, path, cents, assign="token")
        append_to_maxsim_index(new, path)
        # incremental == full rebuild, the family equality contract
        full = str(tmp_path / "mvtfull")
        write_maxsim_index(df, full, cents, assign="token")
        queries = [(int(i), rows[i][1]) for i in (0, 5)]
        got = sorted(map(tuple, probe_maxsim_index(
            spark, path, queries, k_neighbors=5, n_probe=4,
            retrieval="token",
        ).collect()))
        want = sorted(map(tuple, probe_maxsim_index(
            spark, full, queries, k_neighbors=5, n_probe=4,
            retrieval="token",
        ).collect()))
        assert got == want
        rows_before = spark.read.parquet(path).count()
        # double-append = true duplicate (id, cell) rows to compact
        append_to_maxsim_index(new.limit(3), path)
        rep = compact_maxsim_index(spark, path, tombstones=[0, 1])
        idx = spark.read.parquet(path)
        # replicas survived (row count back to the pre-dup layout
        # minus the tombstoned ids' replicas), duplicates did not
        tomb_rows = rows_before - idx.count()
        assert rep["rows_after"] == idx.count()
        assert tomb_rows >= 2  # both ids' replicas gone
        assert idx.filter(F.col("doc_id").isin([0, 1])).count() == 0
        assert (
            idx.groupBy("doc_id", "cell").count()
            .filter(F.col("count") > 1).count() == 0
        )
        after = sorted(map(tuple, probe_maxsim_index(
            spark, path, queries[1:], k_neighbors=5, n_probe=4,
            retrieval="token",
        ).collect()))
        want_after = [
            t for t in want
            if t[0] == queries[1][0] and t[1] not in (0, 1)
        ]
        # rank values shift after removals; compare ordered ids
        assert [t[1] for t in after][:3] == [
            t[1] for t in want_after
        ][:3]

    def test_corrected_reappend_converges_on_compaction(
        self, spark, tmp_path
    ):
        """r10 review finding: a corrected document re-appended to a
        token-ASSIGNED index whose new tokens map to a DIFFERENT cell
        set left its old replicas alive in the vacated cells (no
        (id, cell) duplicate there to evict them), so probes could
        serve the superseded content forever. Compaction now picks
        the id's winning version FIRST (the family's deterministic
        order) and drops every losing-version replica."""
        from xmidt_event_streams_spark.operators.multivec import (
            append_to_maxsim_index,
            compact_maxsim_index,
            probe_maxsim_index,
            write_maxsim_index,
        )

        e = [0.0] * 4
        a = list(e); a[0] = 1.0
        b = list(e); b[1] = 1.0
        cents = [a, b]
        path = str(tmp_path / "mvcorr")
        # doc 7 v1: tokens in BOTH cells; fillers anchor each cell
        rows = [
            (1, [a, a]),
            (2, [b, b]),
            (7, [a, b]),
        ]
        df = spark.createDataFrame(
            rows, "doc_id long, token_vecs array<array<double>>"
        )
        # streaming layout so "newest batch wins" is well-defined
        write_maxsim_index(
            df.limit(0), path, cents, assign="token"
        )
        append_to_maxsim_index(df, path, batch_id=1)
        # corrected doc 7 v2: tokens ONLY in the b-cell -- the a-cell
        # replica of v1 is now stale and has no (id, cell) duplicate
        fix = spark.createDataFrame(
            [(7, [b, [0.0, 0.9, 0.1, 0.0]])],
            "doc_id long, token_vecs array<array<double>>",
        )
        append_to_maxsim_index(fix, path, batch_id=2)
        compact_maxsim_index(spark, path)
        idx = spark.read.parquet(path).select("doc_id", "cell").collect()
        cells_of_7 = sorted(r["cell"] for r in idx if r["doc_id"] == 7)
        assert cells_of_7 == [1], cells_of_7  # a-cell replica GONE
        # and a probe of the a-direction no longer surfaces doc 7's
        # old a-token content
        got = probe_maxsim_index(
            spark, path, [(999, [a])], k_neighbors=3, n_probe=1,
            retrieval="token",
        ).collect()
        top = {r["doc_id"]: r["maxsim"] for r in got}
        assert top[1] == max(top.values())
        assert top.get(7, 0.0) < 1.0  # old exact-match token is gone

    def test_pooled_probe_on_token_assigned_index(
        self, spark, tmp_path
    ):
        """The pooled arm stays correct on a token-ASSIGNED layout:
        replicas enter the carried-payload shortlist from multiple
        cells, the fold width scales by the stamped cap, and the
        driver merge dedupes -- so a full-width pooled probe on the
        token layout equals the same probe on the pooled layout,
        column for column."""
        from xmidt_event_streams_spark.operators.ivf import kmeans_fit
        from xmidt_event_streams_spark.operators.multivec import (
            pooled_tokens,
            probe_maxsim_index,
            write_maxsim_index,
        )

        df, rows = self._docs(spark)
        cents = kmeans_fit(pooled_tokens(df), 4, 2, id_col="doc_id")
        pooled_path = str(tmp_path / "pp")
        token_path = str(tmp_path / "tt")
        write_maxsim_index(df, pooled_path, cents)
        write_maxsim_index(df, token_path, cents, assign="token")
        queries = [(int(i), rows[i][1]) for i in (0, 5)]
        for kw in (
            {"prefilter_c": 1000},              # two-stage rerank
            {"pooled_only": True},              # pooled-only
        ):
            got = sorted(map(tuple, probe_maxsim_index(
                spark, token_path, queries, k_neighbors=5, n_probe=4,
                **kw,
            ).collect()))
            want = sorted(map(tuple, probe_maxsim_index(
                spark, pooled_path, queries, k_neighbors=5, n_probe=4,
                **kw,
            ).collect()))
            assert got == want, kw

    def test_rejects_contradictory_flags(self, spark, tmp_path):
        from xmidt_event_streams_spark.operators.multivec import (
            probe_maxsim_index,
        )

        df, rows = self._docs(spark)
        path, _ = self._index(spark, tmp_path, df)
        with pytest.raises(ValueError, match="pooled_only"):
            probe_maxsim_index(
                spark, path, [(0, rows[0][1])], pooled_only=True,
                retrieval="token",
            )
        with pytest.raises(ValueError, match="retrieval"):
            probe_maxsim_index(
                spark, path, [(0, rows[0][1])], retrieval="centroid",
            )
