"""Two-sided k-NN join (operators/knn.py): exactness of the
n_probe=all arm vs brute force, recall floor under cell pruning,
salt invariance, self-exclusion, poison rows, short-corpus ranks.

The embeddings table is uniform random unit vectors — no cluster
structure, the hardest IVF regime (same context note as test_ivfpq).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from xmidt_event_streams_spark.operators.ivf import kmeans_fit_portable
from xmidt_event_streams_spark.operators.knn import knn_join
from xmidt_event_streams_spark.operators.similarity import brute_force_topk

N_CELLS = 8


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


@pytest.fixture(scope="module")
def cents(emb):
    return kmeans_fit_portable(emb, k=N_CELLS, n_iters=3)


def _as_map(rows):
    out = {}
    for r in rows:
        out.setdefault(r["query_id"], []).append(
            (r["rank"], r["vec_id"], r["cos_sim"])
        )
    for v in out.values():
        v.sort()
    return out


def test_exact_arm_matches_brute_force(emb, cents):
    """n_probe = n_cells covers every (query, corpus) pair: the join
    must reproduce brute_force_topk row for row (same rounding, same
    tie-break) — the block-nested exact arm the oracle replays."""
    queries = emb.filter(F.col("vec_id") % 50 == 3)
    got = _as_map(
        knn_join(
            emb, queries, cents, k=10, n_probe=N_CELLS, exclude_self=True
        ).collect()
    )
    want = _as_map(brute_force_topk(emb, queries, k=10).collect())
    assert got == want


def test_recall_floor_under_pruning(emb, cents):
    """n_probe=6 of 8 on structureless vectors: recall@10 must stay
    above a floor comfortably below the measured value."""
    queries = emb.filter(F.col("vec_id") % 50 == 3)
    exact: dict = {}
    for r in brute_force_topk(emb, queries, k=10).collect():
        exact.setdefault(r["query_id"], set()).add(r["vec_id"])
    approx: dict = {}
    for r in knn_join(
        emb, queries, cents, k=10, n_probe=6, exclude_self=True
    ).collect():
        approx.setdefault(r["query_id"], set()).add(r["vec_id"])
    hits = sum(
        len(exact[q] & approx.get(q, set())) for q in exact
    )
    recall = hits / sum(len(v) for v in exact.values())
    assert recall >= 0.6, recall


def test_cell_salt_invariance(emb, cents):
    """Salting splits groups but must not change a single output row
    (partials stay disjoint; the merge is associative)."""
    queries = emb.filter(F.col("vec_id") % 100 == 7)
    plain = _as_map(
        knn_join(emb, queries, cents, k=5, n_probe=N_CELLS).collect()
    )
    salted = _as_map(
        knn_join(emb, queries, cents, k=5, n_probe=N_CELLS,
                 cell_salt=3).collect()
    )
    assert plain == salted


def test_exclude_self(emb, cents):
    rows = knn_join(
        emb, emb.limit(20), cents, k=3, n_probe=N_CELLS, exclude_self=True
    ).collect()
    assert rows and all(r["query_id"] != r["vec_id"] for r in rows)


def test_poison_rows_excluded(spark, cents):
    """Null and dim-mismatched vectors on either side yield no pairs
    and poison nothing else."""
    dim = len(cents[0])
    good = [float(i % 7) + 1.0 for i in range(dim)]
    corpus = spark.createDataFrame(
        [(1, good), (2, None), (3, [1.0, 2.0])],
        T.StructType([
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.DoubleType())),
        ]),
    )
    queries = spark.createDataFrame(
        [(10, good), (11, None)],
        T.StructType([
            T.StructField("query_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.DoubleType())),
        ]),
    )
    rows = knn_join(
        corpus, queries, cents, k=5, n_probe=N_CELLS,
        query_id_col="query_id",
    ).collect()
    assert {(r["query_id"], r["vec_id"]) for r in rows} == {(10, 1)}
    assert all(r["cos_sim"] is not None for r in rows)


def test_short_corpus_ranks(emb, cents):
    """Corpus smaller than k: every query gets exactly |corpus|-1
    rows (self excluded) with contiguous ranks from 1."""
    small = emb.limit(4)
    rows = knn_join(
        small, small, cents, k=10, n_probe=N_CELLS, exclude_self=True
    ).collect()
    per_q: dict = {}
    for r in rows:
        per_q.setdefault(r["query_id"], []).append(r["rank"])
    assert len(per_q) == 4
    for ranks in per_q.values():
        assert sorted(ranks) == [1, 2, 3]


def test_validation():
    import pyspark.sql  # noqa: F401

    with pytest.raises(ValueError, match="n_probe"):
        knn_join(None, None, [[0.0]], k=1, n_probe=2)
    with pytest.raises(ValueError, match="cell_salt"):
        knn_join(None, None, [[0.0]], k=1, n_probe=1, cell_salt=0)
    with pytest.raises(ValueError, match="k must"):
        knn_join(None, None, [[0.0]], k=0)


class TestKnnGraphSurvivors:
    def test_planted_clusters_and_boundedness(self, spark, cents):
        """Three planted near-dup groups + singletons: every group
        collapses to one survivor (min id), singletons survive, and
        the structureless one-hot-cell corpus still yields <= n*k
        candidate edges (the boundedness claim vs cluster-verify)."""
        import numpy as np

        from xmidt_event_streams_spark.operators.knn import (
            knn_graph_survivors,
        )

        dim = len(cents[0])
        rng = np.random.default_rng(7)
        rows = []
        # 3 groups of 4 near-identical vectors + 8 singletons
        for g in range(3):
            base = rng.normal(size=dim)
            for j in range(4):
                v = base + rng.normal(scale=1e-3, size=dim)
                rows.append((g * 10 + j, [float(x) for x in v]))
        for s in range(8):
            rows.append((100 + s, [float(x) for x in rng.normal(size=dim)]))
        df = spark.createDataFrame(rows, "vec_id: long, embedding: array<double>")
        out = {
            r["vec_id"]: (r["cluster_id"], r["is_survivor"])
            for r in knn_graph_survivors(
                df, cents, threshold=0.95, k=5, n_probe=len(cents)
            ).collect()
        }
        assert len(out) == 20
        for g in range(3):
            ids = [g * 10 + j for j in range(4)]
            cids = {out[i][0] for i in ids}
            assert cids == {min(ids)}, (g, cids)
            assert [i for i in ids if out[i][1]] == [min(ids)]
        for s in range(8):
            assert out[100 + s] == (100 + s, True)

    def test_prefer_col_keeps_best(self, spark, cents):
        import numpy as np

        from xmidt_event_streams_spark.operators.knn import (
            knn_graph_survivors,
        )

        dim = len(cents[0])
        rng = np.random.default_rng(3)
        base = rng.normal(size=dim)
        rows = [
            (i, [float(x) for x in base + rng.normal(scale=1e-3, size=dim)], float(sc))
            for i, sc in [(1, 0.2), (2, 0.9), (3, 0.5)]
        ]
        df = spark.createDataFrame(
            rows, "vec_id: long, embedding: array<double>, score: double"
        )
        out = {
            r["vec_id"]: r["is_survivor"]
            for r in knn_graph_survivors(
                df, cents, threshold=0.9, k=5, n_probe=len(cents),
                prefer_col="score",
            ).collect()
        }
        assert out == {1: False, 2: True, 3: False}
