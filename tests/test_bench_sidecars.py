"""Smoke coverage for bench.py's curation sidecar: the driver runs
bench once per round, so a sidecar broken by a refactor costs a whole
round's perf artifact. This drives the composite at sf0.001 (cheap)
and pins the emitted shape."""

from __future__ import annotations


def test_curation_bench_smoke(spark, monkeypatch):
    import bench

    monkeypatch.setenv("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    out = bench.curation_bench(spark)
    assert out["docs"] > 0 and out["written"] > 0
    assert out["curation_total_sec"] > 0 and out["fit_sec"] > 0
    # every stage that ran reports a wall time
    assert set(out["per_stage"]) == {
        "line_dedup", "ngram_scrub", "quality", "lm_gate", "nb_gate",
        "dsir", "exact_dedup", "near_dedup", "span_excise",
        "shard_write",
    }
    assert all(v >= 0 for v in out["per_stage"].values())
    # the ledger discipline: drops are accounted, never silent
    assert set(out["dropped"]) >= {
        "quality_dropped", "lm_dropped", "classifier_dropped",
        "dsir_dropped", "exact_dups_dropped", "near_dups_dropped",
    }
