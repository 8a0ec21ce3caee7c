"""Product quantization (operators/pq.py): fit, encode, ADC search.

Recall is measured against exact L2 top-k over the same corpus --
PQ is an approximation; the test pins the floor so a kernel
regression (wrong subspace split, LUT transpose, argmin axis) shows
up as a recall collapse, not a silent wrong-answer."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from xmidt_event_streams_spark.operators.pq import (
    pq_encode,
    pq_fit,
    pq_topk,
)

M, K, TOPK = 16, 32, 10


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


@pytest.fixture(scope="module")
def codebooks(emb):
    return pq_fit(emb, m=M, k=K, n_iters=4)


def test_fit_shapes_and_encode_domain(emb, codebooks):
    cb = np.asarray(codebooks)
    dim = len(emb.select("embedding").first()[0])
    assert cb.shape == (M, K, dim // M)
    coded = pq_encode(emb, codebooks)
    rows = coded.select("codes").collect()
    assert all(len(r[0]) == M for r in rows)
    flat = [c for r in rows for c in r[0]]
    assert min(flat) >= 0 and max(flat) < K
    # codes must use a real spread of cells (a collapsed fit would
    # still satisfy the domain check)
    assert len(set(flat)) > K // 2


def test_encode_poison_rows_yield_null(spark, codebooks):
    dim = len(codebooks) * len(codebooks[0][0])
    rows = [
        (1, [0.5] * dim),
        (2, None),
        (3, [0.5] * (dim - 1)),  # ragged
    ]
    df = spark.createDataFrame(rows, "vec_id: long, embedding: array<double>")
    got = {
        r["vec_id"]: r["codes"]
        for r in pq_encode(df, codebooks).collect()
    }
    assert got[1] is not None and len(got[1]) == M
    assert got[2] is None and got[3] is None


def test_adc_recall_vs_exact_l2(spark, emb, codebooks):
    """ADC top-10 must recover most of the exact-L2 top-10. The floor
    (0.40) is ~15 points under the measured 0.56 at (m=16, k=32) on
    the synthetic near-isotropic corpus (the hardest case for PQ: no
    cluster structure for the codebooks to exploit -- measured 0.72
    at k=128); real embedding corpora sit far above it."""
    queries = [
        (int(r["vec_id"]), list(r["embedding"]))
        for r in emb.orderBy("vec_id").limit(5).collect()
    ]
    coded = pq_encode(emb, codebooks).select("vec_id", "codes").cache()
    try:
        got = pq_topk(coded, queries, codebooks, TOPK).collect()
        approx = {}
        for r in got:
            approx.setdefault(r["query_id"], set()).add(r["vec_id"])

        mat = np.stack(
            [np.asarray(r["embedding"]) for r in emb.orderBy("vec_id").collect()]
        )
        ids = [int(r["vec_id"]) for r in emb.orderBy("vec_id").collect()]
        recalls = []
        for qid, qv in queries:
            d = ((mat - np.asarray(qv)) ** 2).sum(axis=1)
            exact = {
                ids[i]
                for i in np.argsort(d, kind="stable")[:TOPK]
            }
            recalls.append(len(exact & approx[qid]) / TOPK)
        assert sum(recalls) / len(recalls) >= 0.40, recalls
        # every query returned exactly TOPK ranked rows
        assert all(len(v) == TOPK for v in approx.values())
    finally:
        coded.unpersist()


def test_adc_distances_are_plausible(emb, codebooks):
    """The ADC distance of a vector to ITSELF as query must be the
    quantization residual -- strictly the minimum over the corpus for
    a well-separated row, and rank 1 must be the query row itself for
    most queries (self-retrieval sanity)."""
    queries = [
        (int(r["vec_id"]), list(r["embedding"]))
        for r in emb.orderBy("vec_id").limit(10).collect()
    ]
    coded = pq_encode(emb, codebooks).select("vec_id", "codes")
    top1 = (
        pq_topk(coded, queries, codebooks, 1)
        .filter(F.col("rank") == 1)
        .collect()
    )
    hits = sum(1 for r in top1 if r["query_id"] == r["vec_id"])
    assert hits >= len(queries) // 2, f"self-retrieval {hits}/{len(queries)}"


def test_compression_ratio_claim(emb, codebooks):
    """The compact index carries m ints per row instead of dim
    doubles -- the written codes relation must be an order of
    magnitude smaller per row than the float vectors."""
    dim = len(emb.select("embedding").first()[0])
    assert dim // M >= 4  # 64-dim at m=16 -> 16 bytes of uint8 codes vs 256B float32
    # (storage-level assert would measure parquet bytes; the schema
    # contract is the invariant that survives format/codec choices)
    coded = pq_encode(emb, codebooks)
    assert dict(coded.dtypes)["codes"] == "array<int>"


def test_ivf_pq_composition(spark, emb, codebooks):
    """IVF-ADC: restricting the ADC scan to the query's IVF cells
    (the 100 TB composition) must return a subset of full-scan ADC
    results for the same query while scanning fewer rows."""
    from xmidt_event_streams_spark.operators.ivf import assign_cells
    from xmidt_event_streams_spark.operators.ivf import kmeans_fit

    cents = kmeans_fit(emb, k=4, n_iters=2)
    cells = assign_cells(emb, cents)
    coded = pq_encode(cells, codebooks).select("vec_id", "cell", "codes")
    q = emb.orderBy("vec_id").limit(1).collect()[0]
    queries = [(int(q["vec_id"]), list(q["embedding"]))]
    qcell = (
        assign_cells(
            spark.createDataFrame(
                [(int(q["vec_id"]), list(q["embedding"]))],
                "vec_id: long, embedding: array<double>",
            ),
            cents,
        )
        .collect()[0]["cell"]
    )
    pruned = coded.filter(F.col("cell") == qcell)
    n_pruned, n_all = pruned.count(), coded.count()
    assert 0 < n_pruned < n_all
    got = pq_topk(
        pruned.select("vec_id", "codes"), queries, codebooks, 5
    ).collect()
    assert len(got) == 5
    full = {
        r["vec_id"]: r["adc_dist"]
        for r in pq_topk(
            coded.select("vec_id", "codes"), queries, codebooks, n_all
        ).collect()
    }
    for r in got:
        assert full[r["vec_id"]] == r["adc_dist"]


def test_materialized_index_probe_equals_direct(spark, emb, codebooks, tmp_path):
    from xmidt_event_streams_spark.operators.pq import (
        probe_pq_index,
        write_pq_index,
    )

    path = str(tmp_path / "pqidx")
    write_pq_index(emb, path, codebooks)
    queries = [
        (int(r["vec_id"]), list(r["embedding"]))
        for r in emb.orderBy("vec_id").limit(3).collect()
    ]
    direct = pq_topk(
        pq_encode(emb, codebooks).select("vec_id", "codes"),
        queries, codebooks, 5,
    )
    via_index = probe_pq_index(spark, path, queries, 5)
    assert sorted(map(tuple, direct.collect())) == sorted(
        map(tuple, via_index.collect())
    )
    # loaded == stamped; a foreign codebook set is refused
    import numpy as np
    import pytest

    other = (np.asarray(codebooks) + 0.5).tolist()
    with pytest.raises(ValueError, match="different codebooks"):
        probe_pq_index(spark, path, queries, 5, codebooks=other)

    plain = str(tmp_path / "plain")
    emb.write.parquet(plain)
    with pytest.raises(ValueError, match="no codebook sidecar"):
        probe_pq_index(spark, plain, queries, 5)


def test_search_and_fit_survive_poison_rows(spark, codebooks):
    """Null/ragged vectors must not kill the search scan (their null
    codes are excluded from scoring) nor corrupt the fit (ragged rows
    are dropped before the codebook update -- numpy would read a NULL
    cell index as np.newaxis and clobber a centroid)."""
    import numpy as np

    dim = len(codebooks) * len(codebooks[0][0])
    rows = [(i, [0.1 * i + 0.01 * d for d in range(dim)]) for i in range(40)]
    poison = [(100, None), (101, [0.5] * (dim - 3))]
    df = spark.createDataFrame(
        rows + poison, "vec_id: long, embedding: array<double>"
    )
    coded = pq_encode(df, codebooks).select("vec_id", "codes")
    got = pq_topk(coded, [(0, rows[0][1])], codebooks, 5).collect()
    assert len(got) == 5
    assert all(r["vec_id"] not in (100, 101) for r in got)

    clean_cb = pq_fit(
        spark.createDataFrame(rows, "vec_id: long, embedding: array<double>"),
        m=M, k=16, n_iters=2,
    )
    dirty_cb = pq_fit(df, m=M, k=16, n_iters=2)
    assert np.allclose(np.asarray(clean_cb), np.asarray(dirty_cb))


def test_rerank_recovers_recall(spark, emb, codebooks):
    """The refine stage (Jegou et al. §V): exact re-scoring of the
    ADC top-C lifts recall@10 from the measured 0.56 to 0.98 at C=50
    on this corpus. Floor pinned at 0.85 (13 points of margin); also
    must strictly beat the unreranked arm."""
    queries = [
        (int(r["vec_id"]), list(r["embedding"]))
        for r in emb.orderBy("vec_id").limit(5).collect()
    ]
    coded = pq_encode(emb, codebooks).select("vec_id", "codes").cache()
    try:
        def recall(rows):
            approx = {}
            for r in rows:
                approx.setdefault(r["query_id"], set()).add(r["vec_id"])
            mat = np.stack(
                [np.asarray(r["embedding"])
                 for r in emb.orderBy("vec_id").collect()]
            )
            ids = [int(r["vec_id"]) for r in emb.orderBy("vec_id").collect()]
            rs = []
            for qid, qv in queries:
                d = ((mat - np.asarray(qv)) ** 2).sum(axis=1)
                exact = {ids[i] for i in np.argsort(d, kind="stable")[:TOPK]}
                rs.append(len(exact & approx[qid]) / TOPK)
            return sum(rs) / len(rs)

        base = recall(pq_topk(coded, queries, codebooks, TOPK).collect())
        rr_rows = pq_topk(
            coded, queries, codebooks, TOPK, rerank=50, vectors=emb
        ).collect()
        rr = recall(rr_rows)
        assert rr >= 0.85, rr
        assert rr > base, (rr, base)
        # contract: exact_dist present, ranked ascending per query,
        # exactly TOPK rows per query
        per_q = {}
        for r in rr_rows:
            per_q.setdefault(r["query_id"], []).append(r)
        for rows in per_q.values():
            assert len(rows) == TOPK
            rows.sort(key=lambda r: r["rank"])
            ds = [r["exact_dist"] for r in rows]
            assert ds == sorted(ds)
        # self-query at rank 1 with exact_dist 0 (the vector itself
        # is its own true nearest neighbor under exact re-scoring)
        for qid, _ in queries:
            top1 = [r for r in per_q[qid] if r["rank"] == 1][0]
            assert top1["vec_id"] == qid and top1["exact_dist"] == 0.0
    finally:
        coded.unpersist()


def test_rerank_requires_vectors(spark, emb, codebooks):
    coded = pq_encode(emb, codebooks).select("vec_id", "codes")
    q = [(0, list(emb.orderBy("vec_id").first()["embedding"]))]
    with pytest.raises(ValueError, match="vectors"):
        pq_topk(coded, q, codebooks, TOPK, rerank=50)


def test_rerank_driver_and_distributed_paths_agree(spark, emb, codebooks, monkeypatch):
    """The size-switched refine paths are the same operator: forcing
    the distributed join path must reproduce the driver-side numpy
    path row for row."""
    import xmidt_event_streams_spark.operators.pq as pqmod

    queries = [
        (int(r["vec_id"]), list(r["embedding"]))
        for r in emb.orderBy("vec_id").limit(3).collect()
    ]
    coded = pq_encode(emb, codebooks).select("vec_id", "codes").cache()
    try:
        def run():
            return sorted(
                (r["query_id"], r["vec_id"], r["adc_dist"],
                 r["exact_dist"], r["rank"])
                for r in pq_topk(
                    coded, queries, codebooks, TOPK, rerank=30, vectors=emb
                ).collect()
            )

        driver_side = run()
        monkeypatch.setattr(pqmod, "_DRIVER_REFINE_MAX_FLOATS", 0)
        distributed = run()
        assert driver_side == distributed and len(driver_side) == 3 * TOPK
    finally:
        coded.unpersist()


def test_keep_top_by_dist_id_matches_full_lexsort():
    """The O(n) partial-top-k fold must pick EXACTLY the winners a
    full (dist, id) lexsort picks, including id tie-breaks at the
    boundary distance (the case argpartition alone gets wrong)."""
    import numpy as np

    from xmidt_event_streams_spark.operators.pq import keep_top_by_dist_id

    rng = np.random.RandomState(7)
    for trial in range(50):
        n = rng.randint(1, 500)
        # coarse grid -> many exact distance ties
        d = rng.randint(0, 8, size=n).astype(np.float64)
        ids = rng.permutation(10_000)[:n].astype(np.int64)
        for n_short in (1, 3, 17, n, n + 5):
            keep = np.lexsort((ids, d))[:n_short]
            want = list(zip(d[keep], ids[keep]))
            got_ids, got_d = keep_top_by_dist_id(ids, d, n_short)
            got = sorted(zip(got_d, got_ids))
            assert got == sorted(want), (trial, n_short)


def test_keep_top_by_dist_id_nan_guard():
    """NaN distances (a NaN query vector makes every ADC distance
    NaN) must not collapse the fold to zero rows: the function keeps
    exactly the rows a full lexsort keeps (NaN sorts last,
    id-ascending among themselves), so it never returns fewer rows
    than the lexsort path it replaced."""
    import numpy as np

    from xmidt_event_streams_spark.operators.pq import keep_top_by_dist_id

    rng = np.random.RandomState(11)
    for frac in (1.0, 0.5, 0.1):
        for trial in range(20):
            n = rng.randint(5, 200)
            d = rng.randint(0, 6, size=n).astype(np.float64)
            d[rng.rand(n) < frac] = np.nan
            ids = rng.permutation(100_000)[:n].astype(np.int64)
            for n_short in (1, 3, 17, n - 1, n):
                keep = np.lexsort((ids, d))[:n_short]
                got_ids, got_d = keep_top_by_dist_id(ids, d, n_short)
                assert len(got_ids) == min(n_short, n), (frac, trial)
                assert sorted(got_ids) == sorted(ids[keep]), (
                    frac, trial, n_short,
                )


def test_empty_query_batch_is_empty_result(spark, sf_dir):
    """An empty probe batch returns an empty, correctly-shaped result
    instead of crashing in the LUT tensor build."""
    from xmidt_event_streams_spark.operators.pq import pq_encode, pq_fit, pq_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cb = pq_fit(emb.limit(400), m=4, k=8, n_iters=1)
    codes = pq_encode(emb.limit(400), cb).select("vec_id", "codes")
    out = pq_topk(codes, [], cb)
    assert out.count() == 0
    assert out.columns == ["query_id", "vec_id", "adc_dist", "rank"]
    out_rr = pq_topk(codes, [], cb, rerank=8, vectors=emb)
    assert out_rr.count() == 0
    assert "exact_dist" in out_rr.columns
