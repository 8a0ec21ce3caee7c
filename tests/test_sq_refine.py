"""SQ8 scalar quantization (operators/sq.py) and the IVF-PQ in-index
refine tier: the rerank path that re-scores the ADC shortlist from
refine payload stored NEXT TO the codes, so a reranking probe runs
zero Spark actions beyond the probe scan itself (no point fetch, no
second corpus read -- the r7-measured residue that kept rerank wall
at ~1x brute was exactly those extra actions).

Reference context: the reference engine (Go) has no ANN layer; this
tier is part of the beyond-reference LLM-pipeline mandate, built from
the published formulation (Jegou et al. TPAMI 2011 SS V re-ranking,
FAISS's IVFPQ+refine composition as the publicly documented shape).
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from xmidt_event_streams_spark.operators.ivfpq import (
    ivfpq_fit,
    probe_ivfpq_index,
    write_ivfpq_index,
)
from xmidt_event_streams_spark.operators.sq import (
    sq8_decode_block,
    sq8_encode_block,
    sq8_max_abs_error,
)

N_CELLS, M, K, ITERS, N_PROBE = 8, 16, 64, 4, 6


# ---------------------------------------------------------------- sq8


def test_sq8_roundtrip_error_bound():
    rng = np.random.default_rng(11)
    mat = rng.normal(size=(257, 48)) * rng.uniform(0.1, 9.0, size=(257, 1))
    raw, lo, step = sq8_encode_block(mat)
    dec = sq8_decode_block(raw, lo, step)
    bound = sq8_max_abs_error(lo, step)[:, None] + 1e-12
    assert np.all(np.abs(dec - mat) <= bound)


def test_sq8_constant_and_empty_rows():
    mat = np.asarray([[3.5] * 8, [0.0] * 8])
    raw, lo, step = sq8_encode_block(mat)
    dec = sq8_decode_block(raw, lo, step)
    # constant vectors reconstruct exactly (step=1.0, all-zero bytes)
    assert np.allclose(dec, mat)
    assert sq8_decode_block([], np.asarray([]), np.asarray([])).shape == (
        0,
        0,
    )


def test_sq8_nonfinite_rows_stay_in_range():
    mat = np.asarray([[1.0, np.nan, 2.0, np.inf]])
    raw, lo, step = sq8_encode_block(mat)
    dec = sq8_decode_block(raw, lo, step)
    assert np.all(np.isfinite(dec))


def test_keep_top_return_index_matches_values():
    from xmidt_event_streams_spark.operators.pq import keep_top_by_dist_id

    rng = np.random.default_rng(3)
    ids = rng.permutation(500).astype(np.int64)
    d = np.round(rng.uniform(0, 1, 500), 2)  # force distance ties
    d[rng.choice(500, 17, replace=False)] = np.nan  # NaN branch too
    kept_ids, kept_d = keep_top_by_dist_id(ids, d, 25)
    i_ids, i_d, idx = keep_top_by_dist_id(ids, d, 25, return_index=True)
    assert np.array_equal(kept_ids, i_ids)
    assert np.array_equal(kept_ids, ids[idx])
    assert np.array_equal(
        np.isnan(kept_d), np.isnan(d[idx])
    ) and np.array_equal(kept_d[~np.isnan(kept_d)], d[idx][~np.isnan(d[idx])])


def test_fold_into_extras_stay_row_aligned():
    from xmidt_event_streams_spark.operators.ivfpq import _fold_into

    best: dict = {}
    ids1 = np.asarray([5, 1, 9], dtype=np.int64)
    d1 = np.asarray([0.3, 0.1, 0.2])
    tag1 = np.asarray([b"five", b"one", b"nine"], dtype=object)
    _fold_into(best, 7, ids1, d1, 2, (tag1,))
    ids2 = np.asarray([4], dtype=np.int64)
    d2 = np.asarray([0.05])
    tag2 = np.asarray([b"four"], dtype=object)
    _fold_into(best, 7, ids2, d2, 2, (tag2,))
    kept_ids, kept_d, kept_tag = best[7]
    assert list(kept_ids) == [4, 1]
    assert list(kept_tag) == [b"four", b"one"]


# ------------------------------------------------- in-index refine


@pytest.fixture(scope="module")
def rix(spark, sf_dir, tmp_path_factory):
    """An IVF-PQ index built with refine='sq8' over the embeddings
    table, plus the same fixture surface as test_ivfpq.ix."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cents, cbs = ivfpq_fit(emb, n_cells=N_CELLS, m=M, k=K, n_iters=ITERS)
    path = str(tmp_path_factory.mktemp("ivfpq_sq8") / "ix")
    write_ivfpq_index(emb, path, cents, cbs, refine="sq8")
    qdf = emb.filter(F.col("vec_id") % 100 == 7)
    qrows = [
        (int(r["vec_id"]), [float(x) for x in r["embedding"]])
        for r in qdf.collect()
    ]
    return {"emb": emb, "path": path, "cents": cents, "cbs": cbs,
            "qdf": qdf, "qrows": qrows}


def _topk_sets(df):
    out: dict = {}
    for r in df.collect():
        out.setdefault(r["query_id"], set()).add(r["vec_id"])
    return out


def test_in_index_refine_matches_exact_rerank(spark, rix):
    """The SQ8 refine must agree with the exact refine on the top-k
    SETS except on sub-quantization-step ties: assert >= 95% id
    agreement and the full schema/rank contract. (On this corpus the
    agreement is exact; the margin absorbs float-tie drift across
    partitionings.)"""
    exact = _topk_sets(
        probe_ivfpq_index(
            spark, rix["path"], rix["qrows"], k_neighbors=10,
            n_probe=N_PROBE, rerank=50, vectors=rix["emb"],
        )
    )
    got_df = probe_ivfpq_index(
        spark, rix["path"], rix["qrows"], k_neighbors=10,
        n_probe=N_PROBE, rerank=50,
    )
    rows = got_df.collect()
    assert {"query_id", "vec_id", "adc_dist", "refine_dist", "rank"} == set(
        rows[0].asDict()
    )
    got = _topk_sets(got_df)
    inter = sum(len(exact[q] & got.get(q, set())) for q in exact)
    total = sum(len(exact[q]) for q in exact)
    assert inter / total >= 0.95, (inter, total)
    # rank contract: ascending refine_dist per query, ties to lower id
    per_q: dict = {}
    for r in rows:
        per_q.setdefault(r["query_id"], []).append(r)
    for rs in per_q.values():
        rs.sort(key=lambda r: r["rank"])
        keys = [(r["refine_dist"], r["vec_id"]) for r in rs]
        assert keys == sorted(keys)
    # self-matches stay excluded through the refine stage
    assert all(r["vec_id"] != r["query_id"] for r in rows)


def test_in_index_refine_lifts_recall_over_adc(spark, rix):
    from xmidt_event_streams_spark.operators.similarity import (
        brute_force_topk,
    )

    exact: dict = {}
    for r in brute_force_topk(rix["emb"], rix["qdf"], k=10).collect():
        exact.setdefault(r["query_id"], set()).add(r["vec_id"])

    def recall(df):
        approx = _topk_sets(df)
        return sum(
            len(exact[q] & approx.get(q, set())) / len(exact[q])
            for q in exact
        ) / len(exact)

    base = recall(probe_ivfpq_index(
        spark, rix["path"], rix["qrows"], k_neighbors=10, n_probe=N_PROBE
    ))
    rr = recall(probe_ivfpq_index(
        spark, rix["path"], rix["qrows"], k_neighbors=10, n_probe=N_PROBE,
        rerank=50,
    ))
    assert rr > base, (rr, base)
    assert rr >= 0.75, rr


def test_rerank_without_refine_or_vectors_raises(spark, rix, sf_dir,
                                                 tmp_path):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    path = str(tmp_path / "plain_ix")
    write_ivfpq_index(emb, path, rix["cents"], rix["cbs"])  # no refine
    with pytest.raises(ValueError, match="refine"):
        probe_ivfpq_index(
            spark, path, rix["qrows"][:2], k_neighbors=5, n_probe=2,
            rerank=20,
        )


def test_plain_probe_never_reads_refine_bytes(spark, rix):
    """Column pruning: a probe WITHOUT rerank must keep the codes-only
    ReadSchema -- the refine payload is dim+16 bytes/row and parquet
    must not decode it for probes that will not use it."""
    from xmidt_event_streams_spark.operators.ivfpq import (
        probed_codes_relation,
    )

    plan = probed_codes_relation(
        spark, rix["path"], [0, 1], "vec_id"
    )._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    read_schema = [
        ln for ln in plan.splitlines() if "ReadSchema" in ln
    ]
    assert read_schema and all("sq8" not in ln for ln in read_schema), plan
    # and the refine probe DOES read it
    plan_r = probed_codes_relation(
        spark, rix["path"], [0, 1], "vec_id",
        extra_cols=("sq8", "sq8_lo", "sq8_step"),
    )._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert any(
        "sq8" in ln for ln in plan_r.splitlines() if "ReadSchema" in ln
    ), plan_r


def test_refine_survives_append_and_compact(spark, rix, tmp_path):
    """Lifecycle: append encodes the refine payload under the STAMPED
    codec (sidecar-driven, not caller-supplied); compaction rewrites
    full rows so the payload survives; rerank probes keep working on
    both, still without a vectors relation."""
    import shutil

    from xmidt_event_streams_spark.operators.ivfpq import (
        append_to_ivfpq_index,
        compact_ivfpq_index,
    )

    path = str(tmp_path / "ix")
    shutil.copytree(rix["path"], path)
    emb = rix["emb"]
    half_a = emb.filter(F.col("vec_id") % 2 == 0)
    half_b = emb.filter(F.col("vec_id") % 2 == 1)
    rebuilt = str(tmp_path / "seeded")
    write_ivfpq_index(
        half_a, rebuilt, rix["cents"], rix["cbs"], refine="sq8"
    )
    append_to_ivfpq_index(half_b, rebuilt)
    got = probe_ivfpq_index(
        spark, rebuilt, rix["qrows"][:4], k_neighbors=5, n_probe=N_PROBE,
        rerank=25,
    )
    want = probe_ivfpq_index(
        spark, rix["path"], rix["qrows"][:4], k_neighbors=5,
        n_probe=N_PROBE, rerank=25,
    )
    key = lambda df: sorted(  # noqa: E731
        (r["query_id"], r["vec_id"], r["rank"]) for r in df.collect()
    )
    assert key(got) == key(want)
    compact_ivfpq_index(spark, rebuilt)
    assert key(
        probe_ivfpq_index(
            spark, rebuilt, rix["qrows"][:4], k_neighbors=5,
            n_probe=N_PROBE, rerank=25,
        )
    ) == key(want)


def test_refine_through_distributed_merge_guard(spark, rix, monkeypatch):
    """The guarded (distributed-reduce) merge must carry the refine
    payload and yield EXACTLY the direct path's verdicts."""
    from xmidt_event_streams_spark.operators import ivfpq as IP

    direct = sorted(
        (r["query_id"], r["vec_id"], r["rank"])
        for r in probe_ivfpq_index(
            spark, rix["path"], rix["qrows"], k_neighbors=10,
            n_probe=N_PROBE, rerank=30,
        ).collect()
    )
    monkeypatch.setattr(IP, "_DRIVER_MERGE_MAX_ROWS", 1)
    guarded = sorted(
        (r["query_id"], r["vec_id"], r["rank"])
        for r in probe_ivfpq_index(
            spark, rix["path"], rix["qrows"], k_neighbors=10,
            n_probe=N_PROBE, rerank=30,
        ).collect()
    )
    assert guarded == direct


def test_rebuild_preserves_refine_codec(spark, rix, tmp_path):
    import shutil

    from xmidt_event_streams_spark.operators.ivfpq import (
        rebuild_ivfpq_index,
    )

    path = str(tmp_path / "ix")
    shutil.copytree(rix["path"], path)
    rebuild_ivfpq_index(spark, path, rix["emb"], n_cells=N_CELLS)
    # rerank without vectors still works -> codec survived the rebuild
    got = probe_ivfpq_index(
        spark, path, rix["qrows"][:2], k_neighbors=5, n_probe=N_PROBE,
        rerank=20,
    )
    assert got.count() > 0 and "refine_dist" in got.columns


# --------------------------------------------- standalone SQ8 tier


class TestSq8ScanTier:
    """sq8_encode + sq8_topk: the compressed-SCAN tier (1/8th bytes,
    near-exact). Contracts mirror pq_topk (driver query list, partial
    top-k fold, ties to lower id, self-match NOT excluded)."""

    def test_near_exact_recall_vs_brute(self, spark, sf_dir):
        from xmidt_event_streams_spark.operators.similarity import (
            brute_force_topk,
        )
        from xmidt_event_streams_spark.operators.sq import (
            sq8_encode,
            sq8_topk,
        )

        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        qdf = emb.filter(F.col("vec_id") % 100 == 7)
        qrows = [
            (int(r["vec_id"]), [float(x) for x in r["embedding"]])
            for r in qdf.collect()
        ]
        exact: dict = {}
        for r in brute_force_topk(emb, qdf, k=10).collect():
            exact.setdefault(r["query_id"], set()).add(r["vec_id"])
        enc = sq8_encode(emb).select("vec_id", "sq8", "sq8_lo", "sq8_step")
        got: dict = {}
        # k+1: sq8_topk keeps self-matches (the pq_topk contract);
        # brute excludes them
        for r in sq8_topk(enc, qrows, k_neighbors=11).collect():
            got.setdefault(r["query_id"], set()).add(r["vec_id"])
        recall = sum(
            len(exact[q] & (got.get(q, set()) - {q})) / len(exact[q])
            for q in exact
        ) / len(exact)
        # 8 bits/dim on unit vectors: reconstruction error ~1e-3 per
        # dim vs O(1) neighbor gaps -- near-exact by construction
        assert recall >= 0.95, recall

    def test_distance_error_within_codec_bound(self, spark, sf_dir):
        import numpy as np

        from xmidt_event_streams_spark.operators.sq import (
            sq8_encode,
            sq8_topk,
        )

        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        rows = emb.filter(F.col("vec_id") < 40).collect()
        vmap = {
            int(r["vec_id"]): np.asarray(r["embedding"], dtype=np.float64)
            for r in rows
        }
        qrows = [(0, list(vmap[0]))]
        enc = sq8_encode(emb.filter(F.col("vec_id") < 40)).select(
            "vec_id", "sq8", "sq8_lo", "sq8_step"
        )
        got = sq8_topk(enc, qrows, k_neighbors=40).collect()
        q = vmap[0]
        dim = len(q)
        for r in got:
            true = float(((vmap[int(r["vec_id"])] - q) ** 2).sum())
            # |d_sq8 - d_true| <= sum_i (2|v_i - q_i| e + e^2), e =
            # step/2; bound loosely with e <= max step observed (~1e-2
            # on unit vectors) -- assert a generous absolute envelope
            assert abs(r["sq8_dist"] - true) < 0.05 * dim ** 0.5, (
                r["vec_id"], r["sq8_dist"], true
            )

    def test_null_and_ragged_vectors_null_out(self, spark):
        from xmidt_event_streams_spark.operators.sq import sq8_encode

        df = spark.createDataFrame(
            [(1, [0.1] * 8), (2, None), (3, [0.2] * 5)],
            "vec_id long, embedding array<double>",
        )
        rows = {r["vec_id"]: r["sq8"] for r in sq8_encode(df).collect()}
        assert rows[1] is not None
        assert rows[2] is None and rows[3] is None

    def test_empty_queries_empty_result(self, spark, sf_dir):
        from xmidt_event_streams_spark.operators.sq import (
            sq8_encode,
            sq8_topk,
        )

        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").limit(10)
        enc = sq8_encode(emb).select("vec_id", "sq8", "sq8_lo", "sq8_step")
        out = sq8_topk(enc, [], k_neighbors=5)
        assert out.count() == 0 and "sq8_dist" in out.columns


def test_in_index_refine_adds_zero_spark_jobs(spark, rix):
    """The tier's entire reason to exist: a reranking probe must cost
    exactly the jobs of a plain probe (the shortlist's refine payload
    rides the probe scan; the re-score is driver-side numpy). The
    exact-rerank arm, which fetches from the corpus, must cost MORE
    jobs -- proving the counter distinguishes the two designs.

    Counting is job-group-scoped (tests/jobcount.py): only jobs THIS
    thread submits inside the measured call are attributed, so
    concurrent suite activity (streaming micro-batches, coordinators)
    cannot land in the window -- the r8 full-suite flake."""
    from tests.jobcount import count_jobs

    def _jobs(fn):
        return count_jobs(spark, fn)

    # warm both paths once: a first call can carry one-off jobs
    # (footer reads, listener catch-up) that are not the design's
    probe_ivfpq_index(
        spark, rix["path"], rix["qrows"][:4], k_neighbors=5,
        n_probe=N_PROBE,
    )
    probe_ivfpq_index(
        spark, rix["path"], rix["qrows"][:4], k_neighbors=5,
        n_probe=N_PROBE, rerank=25,
    )
    plain = _jobs(lambda: probe_ivfpq_index(
        spark, rix["path"], rix["qrows"][:4], k_neighbors=5,
        n_probe=N_PROBE,
    ))
    refine = _jobs(lambda: probe_ivfpq_index(
        spark, rix["path"], rix["qrows"][:4], k_neighbors=5,
        n_probe=N_PROBE, rerank=25,
    ))
    exact = _jobs(lambda: probe_ivfpq_index(
        spark, rix["path"], rix["qrows"][:4], k_neighbors=5,
        n_probe=N_PROBE, rerank=25, vectors=rix["emb"],
    ).collect())
    # strict equality: group scoping removed the cross-talk that
    # forced r8's <= deflake, so the design property -- refining adds
    # exactly ZERO jobs -- is pinned exactly
    assert refine == plain, (refine, plain)
    assert exact > refine, (exact, refine)
