"""Hamming-1 multi-probe LSH ANN: recall lift on data with real
near-neighbor structure.

The sf* embeddings tables are near-random (max pairwise cosine ~0.51
at sf0.01), so top-k "recall" there only measures the random baseline.
This fixture builds what multi-probe exists FOR: clusters of perturbed
copies around base vectors, where each query's true top-k are its
cluster peers (cosine ~0.98). A peer that straddles one hyperplane
lands at Hamming distance 1 -- the exact bucket misses it, the
multi-probe set recovers it. Expected recall (noise angle theta ~= 0.1
rad, p_flip ~= theta/pi per plane, 8 planes): single ~= (1-p)^8 ~=
0.77, multi ~= single + 8p(1-p)^7 ~= 0.97 -- asserted with slack
below.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from xmidt_event_streams_spark.operators.similarity import (
    brute_force_topk,
    lsh_topk,
    probe_lsh_index,
    write_lsh_index,
)

DIM = 64
N_BASE = 40
COPIES = 5  # cluster size (base + 4 perturbed)
K = COPIES - 1  # true top-k = the cluster peers


@pytest.fixture(scope="module")
def clustered(spark):
    rng = np.random.default_rng(7)  # fixed seed: deterministic fixture
    rows = []
    vid = 0
    for b in range(N_BASE):
        base = rng.standard_normal(DIM)
        base /= np.linalg.norm(base)
        for _ in range(COPIES):
            # noise norm ~= 0.01*sqrt(64) = 0.08 -> peer cosine ~0.997,
            # peer angle ~0.11 rad, per-plane flip prob ~0.036:
            # expected single ~0.75, multi ~0.97
            v = base + 0.01 * rng.standard_normal(DIM)
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    return spark.createDataFrame(
        rows, "vec_id: long, embedding: array<double>"
    ).persist()


def _recall(result_df, gt):
    got = {(r["query_id"], r["vec_id"]) for r in result_df.collect()}
    return len(got & gt) / len(gt)


def test_multi_probe_recall_lift(spark, clustered):
    queries = clustered.filter(F.col("vec_id") % COPIES == 0)  # one per cluster
    gt = {
        (r["query_id"], r["vec_id"])
        for r in brute_force_topk(clustered, queries, k=K).collect()
        if r["cos_sim"] > 0.8  # true peers only, not noise fill-ins
    }
    assert len(gt) > N_BASE * (COPIES - 2)  # fixture sanity: clusters are tight

    single = _recall(lsh_topk(clustered, queries, k=K, n_planes=8, dim=DIM), gt)
    multi = _recall(
        lsh_topk(clustered, queries, k=K, n_planes=8, dim=DIM, multi_probe=True),
        gt,
    )
    # the lift is the point: one extra Hamming ring recovers almost
    # every straddled peer
    assert multi >= 0.9
    assert multi > single + 0.05
    assert single >= 0.5  # exact-bucket floor (sanity on the fixture)


def test_multi_probe_matches_index_path(spark, clustered, tmp_path):
    """In-memory lsh_topk and the materialized-index probe agree row
    for row under multi_probe (same buckets, same scores)."""
    queries = clustered.filter(F.col("vec_id") % (COPIES * 4) == 0)
    path = str(tmp_path / "lsh_index")
    write_lsh_index(clustered, path, n_planes=8, dim=DIM)

    mem = lsh_topk(clustered, queries, k=K, n_planes=8, dim=DIM, multi_probe=True)
    idx = probe_lsh_index(
        spark, path, queries, k=K, n_planes=8, dim=DIM, multi_probe=True
    )
    norm = lambda df: sorted(
        (r["query_id"], r["vec_id"], r["cos_sim"], r["rank"]) for r in df.collect()
    )
    assert norm(mem) == norm(idx)


def test_multi_probe_supersets_single(spark, clustered):
    """Multi-probe candidates strictly contain the exact-bucket
    candidates, so per-rank scores dominate: for every query, rank-r
    multi-probe cos_sim >= rank-r single-probe cos_sim."""
    queries = clustered.filter(F.col("vec_id") % COPIES == 0).limit(20)
    single = lsh_topk(clustered, queries, k=K, n_planes=8, dim=DIM).collect()
    multi = lsh_topk(
        clustered, queries, k=K, n_planes=8, dim=DIM, multi_probe=True
    ).collect()
    m_by_rank = {(r["query_id"], r["rank"]): r["cos_sim"] for r in multi}
    for r in single:
        key = (r["query_id"], r["rank"])
        assert key in m_by_rank
        assert m_by_rank[key] >= r["cos_sim"] - 1e-9


def test_query_row_budget_raises_instead_of_collecting(spark):
    """r11 (VERDICT r10 #6): the 'queries are small by contract'
    driver collects are bounded -- a contract-violating query side
    raises a typed error instead of OOMing the driver. The limit(n+1)
    shape means the driver never materializes more than budget+1
    rows even on the failure path."""
    from xmidt_event_streams_spark.operators.similarity import (
        QueryRowBudgetExceeded,
        collect_query_rows,
    )

    big = spark.range(50)
    with pytest.raises(QueryRowBudgetExceeded) as ei:
        collect_query_rows(big, max_query_rows=10)
    assert ei.value.budget == 10
    # under budget: all rows come back
    assert len(collect_query_rows(big, max_query_rows=50)) == 50


def test_ivf_topk_masks_invalid_query_rows(spark):
    """r11 (r10 ADVICE): a null or dim-mismatched query vector is
    EXCLUDED (the pre-fusion probe_cells behavior), not an error; a
    non-integral id column raises the documented contract error."""
    from xmidt_event_streams_spark.operators.ivf import ivf_topk

    corpus = spark.createDataFrame(
        [(i, [float(i % 3), 1.0]) for i in range(12)],
        "vec_id long, embedding array<double>",
    )
    queries = spark.createDataFrame(
        [
            (100, [1.0, 1.0]),
            (101, None),          # null vector: masked
            (102, [1.0, 1.0, 9.0]),  # dim mismatch: masked
        ],
        "vec_id long, embedding array<double>",
    )
    cents = [[0.0, 1.0], [1.0, 0.5], [2.0, 0.3]]
    out = ivf_topk(corpus, queries, cents, k=3, n_probe=2)
    got_q = {r["query_id"] for r in out.collect()}
    assert got_q == {100}

    str_queries = spark.createDataFrame(
        [("a", [1.0, 1.0])], "vec_id string, embedding array<double>"
    )
    with pytest.raises(TypeError, match="integral"):
        ivf_topk(corpus.withColumn("vec_id", F.col("vec_id")), str_queries, cents)
