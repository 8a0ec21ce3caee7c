"""Connected components / duplicate clustering, plus oracle parity
for catalog shapes rotated off the 50-entry driver registry (the
driver checks at most 50 queries; rotated-out shapes keep their DuckDB
parity here so the coverage claim stays verified, not aspirational).
"""

import pytest
from pyspark.sql import functions as F

from xmidt_event_streams_spark.operators.components import (
    connected_components,
    dup_cluster_survivors,
)


def _cc(edges_df, **kw):
    return sorted(tuple(r) for r in connected_components(edges_df, **kw).collect())


class TestConnectedComponents:
    def test_chain_and_second_component(self, spark):
        """Chain 1-2-3-4 (diameter 3 -> multi-round convergence) plus
        disjoint pair {10,11}; parallel/reversed edges and self-loops
        are tolerated."""
        edges = spark.createDataFrame(
            [(1, 2), (2, 3), (3, 4), (10, 11), (2, 1), (5, 5)],
            "id_a: long, id_b: long",
        )
        assert _cc(edges) == [
            (1, 1), (2, 1), (3, 1), (4, 1), (10, 10), (11, 10),
        ]

    def test_clique_converges_in_one_round(self, spark):
        """A clique (the LSH near-dup shape) has diameter 1; a chain
        of length > max_rounds must raise, not return partial labels."""
        clique = spark.createDataFrame(
            [(i, j) for i in range(5) for j in range(i + 1, 5)],
            "id_a: long, id_b: long",
        )
        assert _cc(clique, max_rounds=2) == [(i, 0) for i in range(5)]

        chain = spark.createDataFrame(
            [(i, i + 1) for i in range(12)], "id_a: long, id_b: long"
        )
        with pytest.raises(RuntimeError, match="did not converge"):
            connected_components(chain, max_rounds=2)

    def test_error_path_releases_caches_and_conf(self, spark):
        """A mid-loop abort (max_rounds too small for the diameter)
        must leave NOTHING cached for the session's lifetime and must
        not touch session conf (components.py round-2 defect: sym /
        labels unpersist sat outside the finally, and the loop DOP was
        set via session-global spark.sql.shuffle.partitions)."""
        import time

        def cached_rdd_count():
            return len(spark.sparkContext._jsc.sc().getRDDStorageInfo())

        baseline = cached_rdd_count()
        conf_before = spark.conf.get("spark.sql.shuffle.partitions")
        chain = spark.createDataFrame(
            [(i, i + 1) for i in range(8)], "id_a: long, id_b: long"
        )
        for rounds in (0, 1):
            with pytest.raises(RuntimeError, match="did not converge"):
                connected_components(chain, max_rounds=rounds)
            # conf untouched at every point (the fix computes the loop
            # DOP per-operation via repartition, never via conf)
            assert (
                spark.conf.get("spark.sql.shuffle.partitions") == conf_before
            )
            # unpersist is async; poll briefly before declaring a leak
            deadline = time.monotonic() + 10
            while cached_rdd_count() > baseline and time.monotonic() < deadline:
                time.sleep(0.2)
            assert cached_rdd_count() <= baseline

    def test_survivors_label_singletons(self, spark):
        docs = spark.createDataFrame(
            [(i,) for i in range(6)], "doc_id: long"
        )
        pairs = spark.createDataFrame([(1, 3), (3, 5)], "id_a: long, id_b: long")
        out = {
            r["doc_id"]: (r["cluster_id"], r["is_survivor"])
            for r in dup_cluster_survivors(docs, pairs).collect()
        }
        assert out == {
            0: (0, True), 1: (1, True), 2: (2, True),
            3: (1, False), 4: (4, True), 5: (1, False),
        }
        # retention: exactly one survivor per cluster
        survivors = [d for d, (_, s) in out.items() if s]
        assert sorted(survivors) == [0, 1, 2, 4]


def test_semdedup_pipeline_on_embeddings(spark, sf_dir):
    """Full SemDeDup composition over the driver's embeddings table:
    every corpus row is labeled, exactly one survivor per cluster,
    survivor = min id, and every near-dup pair is intra-cluster."""
    from xmidt_event_streams_spark.catalog import (
        NEARDUP_N_PROBE,
        NEARDUP_THRESHOLD,
        _emb,
        neardup_centroids,
    )
    from xmidt_event_streams_spark.operators.components import semdedup_survivors
    from xmidt_event_streams_spark.operators.similarity import (
        clustered_near_dup_pairs,
    )

    emb = _emb(spark, sf_dir)
    cents = neardup_centroids(emb)
    out = semdedup_survivors(
        emb, cents, NEARDUP_THRESHOLD, NEARDUP_N_PROBE
    ).collect()
    assert len(out) == emb.count()
    label = {r["vec_id"]: r["cluster_id"] for r in out}
    by_cluster: dict = {}
    for r in out:
        by_cluster.setdefault(r["cluster_id"], []).append(r)
    for cid, rows in by_cluster.items():
        survivors = [r["vec_id"] for r in rows if r["is_survivor"]]
        assert survivors == [min(r["vec_id"] for r in rows)] and min(
            r["vec_id"] for r in rows
        ) == cid
    pairs = clustered_near_dup_pairs(
        emb, cents, NEARDUP_THRESHOLD, NEARDUP_N_PROBE
    ).collect()
    assert pairs, "expected a non-empty high-similarity tail"
    for p in pairs:
        assert label[p["id_a"]] == label[p["id_b"]]


def test_neardup_sampled_fit_scale_path(spark):
    """The 100 TB fit path: centroids learned on a deterministic
    md5-sample of the corpus (k still sized by the full count) must be
    (a) deterministic across runs, (b) fitted from roughly the asked
    fraction, (c) still useful -- recall within 10 points of the
    full-fit default at sf0.01."""
    from xmidt_event_streams_spark.catalog import (
        NEARDUP_N_PROBE,
        NEARDUP_THRESHOLD,
        _emb,
        neardup_centroids,
        q_embedding_near_dup,
    )
    from xmidt_event_streams_spark.operators.similarity import (
        clustered_near_dup_pairs,
    )

    sf = "/root/testdata/sf0.01"
    emb = _emb(spark, sf)
    c1 = neardup_centroids(emb, fit_fraction=0.5)
    c2 = neardup_centroids(emb, fit_fraction=0.5)
    assert c1 == c2  # pure-row-function sample + portable fit
    full = neardup_centroids(emb)
    assert len(c1) == len(full)  # k sized by the FULL corpus count

    exact = {
        (r["id_a"], r["id_b"])
        for r in q_embedding_near_dup(spark, sf, exact=True).collect()
    }
    sampled_pairs = {
        (r["id_a"], r["id_b"])
        for r in clustered_near_dup_pairs(
            emb, c1, NEARDUP_THRESHOLD, NEARDUP_N_PROBE
        ).collect()
    }
    full_pairs = {
        (r["id_a"], r["id_b"])
        for r in clustered_near_dup_pairs(
            emb, full, NEARDUP_THRESHOLD, NEARDUP_N_PROBE
        ).collect()
    }
    r_sampled = len(sampled_pairs & exact) / len(exact)
    r_full = len(full_pairs & exact) / len(exact)
    assert r_sampled >= r_full - 0.10, (r_sampled, r_full)


def test_neardup_autosized_recall_and_candidates(spark):
    """The shipped near-dup default must be measured, not asserted:
    at sf0.01 (near-isotropic synthetic embeddings -- the worst case
    for any clustering scheme) the learned auto-sized centroids must
    (a) return a strict subset of the exact pair set (the verify tier
    is exact), (b) recall >= 0.95 of it (the old 32 fixed md5 cells
    measured 0.80), and (c) keep the candidate join within the
    16/sqrt(n) law the auto-sizing rule promises (<= 5% of all pairs
    once the corpus exceeds ~102k rows; at n=500 the floor is ~55%)."""
    import math

    from xmidt_event_streams_spark.catalog import (
        NEARDUP_N_PROBE,
        _emb,
        neardup_centroids,
        neardup_k,
        q_embedding_near_dup,
    )
    from xmidt_event_streams_spark.functions.vectors import nearest_cells

    sf = "/root/testdata/sf0.01"
    exact = {
        (r["id_a"], r["id_b"])
        for r in q_embedding_near_dup(spark, sf, exact=True).collect()
    }
    approx = {
        (r["id_a"], r["id_b"]) for r in q_embedding_near_dup(spark, sf).collect()
    }
    assert approx <= exact  # exact verify => no false positives
    recall = len(approx & exact) / len(exact)
    assert recall >= 0.95, f"recall {recall:.3f} below target"

    emb = _emb(spark, sf)
    n = emb.count()
    cents = neardup_centroids(emb)
    cells = emb.select(
        F.col("vec_id"),
        F.explode(
            nearest_cells("embedding", cents, NEARDUP_N_PROBE)
        ).alias("cell"),
    )
    a = cells.select(F.col("vec_id").alias("ia"), "cell")
    b = cells.select(F.col("vec_id").alias("ib"), "cell")
    n_cand = (
        a.join(b, "cell")
        .filter(F.col("ia") < F.col("ib"))
        .select("ia", "ib")
        .distinct()
        .count()
    )
    frac = n_cand / (n * (n - 1) / 2)
    k = neardup_k(n)
    assert k == math.ceil(math.sqrt(n))  # the rule actually sizes k
    assert frac <= min(1.0, 1.2 * NEARDUP_N_PROBE**2 / k), (
        f"candidate fraction {frac:.3f} breaks the p^2/k bound"
    )


# -- oracle parity for rotated-off-registry catalog shapes ------------

OFF_REGISTRY = [
    "tpch_q4_semi",
    "tpch_q5ish",
    "tpch_q21ish",
    "tpch_q22ish",
    "tpch_q7ish",
    "tpch_q10ish",
    "tpch_q12ish",
    "tpch_q14ish",
    "tpch_q18ish",
    "tpch_q19ish",
    "tpch_q2ish",
    "tpch_q8ish",
    "tpch_q9ish",
    "tpch_q11ish",
    "tpch_q13ish",
    "tpch_q15ish",
    "tpch_q16ish",
    "tpch_q17ish",
    "tpch_q20ish",
    "clicked_not_purchased",
    "props_json",
    "value_outliers",
    "resample_ffill",
    "user_value_trend",
    "table_profile",
    "top_users_per_type",
    "running_user_value",
    "events_cube",
    "value_percentiles",
    "events_windowed",
    "latest_per_key",
    "events_pivot",
    "doc_fingerprint_rolling",
    "ngram_jaccard",
    "dedup_by_txn",
    "simhash",
    "session_gaps",
    "embedding_centroids",
    "lsh_ann",
    "ann_rerank_exact",
    "approx_distinct_users",
    "maxsim_inindex",
    "maxsim_token",
]

# every catalog q_* not in the 50-entry driver registry must appear
# here, mapped to where its parity evidence lives (README "Registry
# rotation policy"); test_off_registry_set_is_fully_covered enforces it
OFF_REGISTRY_EVIDENCE = {
    "tpch_q4_semi": "tests/test_components.py::test_off_registry_parity",
    "tpch_q5ish": "tests/test_components.py::test_off_registry_parity",
    "tpch_q21ish": "tests/test_components.py::test_off_registry_parity",
    "tpch_q22ish": "tests/test_components.py::test_off_registry_parity",
    "clicked_not_purchased": "tests/test_components.py::test_off_registry_parity",
    "props_json": "tests/test_components.py::test_off_registry_parity",
    "value_outliers": "tests/test_components.py::test_off_registry_parity",
    "resample_ffill": "tests/test_components.py::test_off_registry_parity",
    "tpch_q7ish": "tests/test_components.py::test_off_registry_parity",
    "tpch_q10ish": "tests/test_components.py::test_off_registry_parity",
    "tpch_q12ish": "tests/test_components.py::test_off_registry_parity",
    "tpch_q14ish": "tests/test_components.py::test_off_registry_parity",
    "tpch_q18ish": "tests/test_components.py::test_off_registry_parity",
    "tpch_q19ish": "tests/test_components.py::test_off_registry_parity",
    "tpch_q2ish": "tests/test_components.py::test_off_registry_parity",
    "tpch_q8ish": "tests/test_components.py::test_off_registry_parity",
    "tpch_q9ish": "tests/test_components.py::test_off_registry_parity",
    "tpch_q11ish": "tests/test_components.py::test_off_registry_parity",
    "tpch_q13ish": "tests/test_components.py::test_off_registry_parity",
    "tpch_q15ish": "tests/test_components.py::test_off_registry_parity",
    "tpch_q16ish": "tests/test_components.py::test_off_registry_parity",
    "tpch_q17ish": "tests/test_components.py::test_off_registry_parity",
    "tpch_q20ish": "tests/test_components.py::test_off_registry_parity",
    "ivf_ann_kmeans": "tests/test_msgpack_asof.py::TestIvfKmeansQuery",
    # rotated out in r4 to admit the learned quality gates
    # (lm_perplexity, nb_quality_scores)
    "user_value_trend": "tests/test_components.py::test_off_registry_parity",
    "table_profile": "tests/test_components.py::test_off_registry_parity",
    # rotated out in r4 to admit DSIR importance weights
    "top_users_per_type": "tests/test_components.py::test_off_registry_parity",
    # rotated out in r5 to admit ann_rerank_exact + frequent_tokens
    "running_user_value": "tests/test_components.py::test_off_registry_parity",
    "events_cube": "tests/test_components.py::test_off_registry_parity",
    # rotated out in r5 to admit dup_span_removal (exact-substring
    # span excision, the substring_spans ledger's consumer)
    "value_percentiles": "tests/test_components.py::test_off_registry_parity",
    # rotated out in r5 to admit ngram_scrub (benchmark span
    # decontamination, GPT-3 appendix-C shape)
    "events_windowed": "tests/test_components.py::test_off_registry_parity",
    # rotated out in r5 to admit corpus_diff (release diff verdicts)
    "latest_per_key": "tests/test_components.py::test_off_registry_parity",
    # rotated out in r5 to admit knn_join_exact (two-sided distributed
    # kNN join, exact block-nested arm) -- grouping-set evidence stays
    # via the off-registry twin + events_cube's parity row
    "events_pivot": "tests/test_components.py::test_off_registry_parity",
    # rotated out in r5 to admit phrase_hits (positional inverted
    # index + phrase search) -- rolling-hash evidence stays via
    # substring_spans (window-hash census) and the off-registry twin
    "doc_fingerprint_rolling": "tests/test_components.py::test_off_registry_parity",
    # rotated out in r5 to admit jaccard_join_prefix (exact
    # corpus-wide prefix-filtered similarity join) -- the bucketed
    # exact tier keeps its off-registry twin + the bucket-cap pytest
    "ngram_jaccard": "tests/test_components.py::test_off_registry_parity",
    # rotated out in r5 to admit packed_sequences (exact fixed-length
    # training-sequence packing) -- keyed-min evidence stays via
    # dedup_exact (registry) + latest_per_key (off-registry twin)
    "dedup_by_txn": "tests/test_components.py::test_off_registry_parity",
    # rotated out in r6 to admit snapshot_timetravel (the snapshot
    # storage layer's driver CORRECTNESS row) -- hash-fingerprint
    # near-dup evidence stays via minhash_lsh_pairs (registry) + the
    # off-registry simhash twin + tests/test_snapshots.py
    "simhash": "tests/test_components.py::test_off_registry_parity",
    # rotated out in r7 to admit snapshot_cdc (the change-data-feed's
    # driver CORRECTNESS row) -- gap/window evidence stays via
    # session_windows (registry) + the off-registry session_gaps twin
    "session_gaps": "tests/test_components.py::test_off_registry_parity",
    # rotated out in r8 to admit point_fetch (the scale-safe id-fetch
    # operator's driver CORRECTNESS row) -- grouped-centroid evidence
    # stays via embedding_near_dup (registry, same fit machinery) +
    # the off-registry twin
    "embedding_centroids": "tests/test_components.py::test_off_registry_parity",
    # rotated out in r8 to admit ann_refine_sq8 (the in-index SQ8
    # refine tier's driver CORRECTNESS row) -- LSH-bucketed ANN
    # evidence stays via the off-registry DuckDB twin +
    # tests/test_similarity_multiprobe.py (Hamming-1 multi-probe
    # recall floors); the ANN family keeps embedding_topk / ivf_ann /
    # ann_rerank_exact / knn_join_exact driver rows
    "lsh_ann": "tests/test_components.py::test_off_registry_parity",
    # rotated out in r9 to admit maxsim_topk (late-interaction MaxSim
    # earned its driver row per the rotation precedent) -- the
    # corpus-fetch exact rerank was demoted to an option in r8
    # (in-index SQ8 is the production refine and holds the
    # ann_refine_sq8 registry row); exact-rerank evidence stays via
    # the off-registry twin + tests/test_pq.py
    "ann_rerank_exact": "tests/test_components.py::test_off_registry_parity",
    # rotated out in r9 to admit sq8_topk (the byte ladder's middle
    # rung earned its driver row) -- generic built-in HLL agg; the
    # exact twin distinct_users_salted keeps its registry row
    "approx_distinct_users": "tests/test_components.py::test_off_registry_parity",
    # added directly off-registry in r9: the in-index MaxSim
    # two-stage, end to end vs a DuckDB twin that re-derives the SQ8
    # token codec AND the MaxSim score in SQL (the registry is at its
    # 50-row cap; maxsim_topk holds the family's driver row)
    "maxsim_inindex": "tests/test_components.py::test_off_registry_parity",
    # r10: the token-level serving arm's exact-recovery twin (same
    # SQL oracle as maxsim_inindex -- full-width probes of both arms
    # must recover the identical exact-over-SQ8 ranking)
    "maxsim_token": "tests/test_components.py::test_off_registry_parity",
}


def test_off_registry_set_is_fully_covered():
    """Rotation-policy gate: derive the off-registry set from the
    catalog source and fail if a future rotation leaves a catalog
    shape without documented parity evidence (or leaves stale
    evidence entries behind)."""
    import re

    import xmidt_event_streams_spark.catalog as cat

    defined = set(
        re.findall(r"^def q_(\w+)\(", open(cat.__file__).read(), re.M)
    )
    registered = set(cat.QUERIES)
    # alias-registered functions count as on-registry (e.g.
    # q_contamination -> "contamination_check")
    aliased = {
        spec.fn.__name__.removeprefix("q_") for spec in cat.QUERIES.values()
    }
    off = defined - registered - aliased
    assert off == set(OFF_REGISTRY_EVIDENCE), (
        f"off-registry set changed: missing evidence for "
        f"{sorted(off - set(OFF_REGISTRY_EVIDENCE))}, stale entries "
        f"{sorted(set(OFF_REGISTRY_EVIDENCE) - off)} -- update "
        f"OFF_REGISTRY_EVIDENCE and README's rotation-policy table"
    )
    assert len(cat.QUERIES) <= 50, "driver registry cap exceeded"


@pytest.mark.parametrize("name", OFF_REGISTRY)
def test_off_registry_parity(spark, sf_dir, name):
    import xmidt_event_streams_spark.catalog as cat
    from tests.test_oracle_parity import _rowset, duck_run

    fn = getattr(cat, f"q_{name}")
    sql = getattr(cat, f"SQL_{name.upper()}")
    sdf = fn(spark, sf_dir)
    dcols, drows = duck_run(sql, sf_dir)
    assert sorted(sdf.columns) == sorted(dcols)
    assert _rowset(sdf.columns, [tuple(r) for r in sdf.collect()]) == _rowset(
        dcols, drows
    )
