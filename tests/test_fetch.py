"""Point fetch (operators/fetch.py): bounded-plan id fetch with
row-group pruning on id-sorted stores -- the refine-stage fix for the
rerank-slower-than-brute defect (a multi-thousand-literal IN pruned
nothing and cost seconds of plan analysis)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from xmidt_event_streams_spark.operators.fetch import (
    SMALL_FETCH_IDS,
    coalesce_id_intervals,
    fetch_by_ids,
    scan_output_rows,
)


def test_interval_coalescing_cuts_largest_gaps():
    ids = [1, 2, 3, 100, 101, 500]
    assert coalesce_id_intervals(ids, 3) == [(1, 3), (100, 101), (500, 500)]
    # budget of 2: the SMALLER gap (3 -> 100) is absorbed first
    assert coalesce_id_intervals(ids, 2) == [(1, 101), (500, 500)]
    assert coalesce_id_intervals(ids, 1) == [(1, 500)]
    assert coalesce_id_intervals([7], 4) == [(7, 7)]
    assert coalesce_id_intervals([], 4) == []
    # duplicates and order don't matter
    assert coalesce_id_intervals([5, 5, 3, 4], 8) == [(3, 5)]


def test_interval_cover_is_exact_superset():
    ids = [0, 9, 10, 11, 40, 41, 99, 100, 103, 2000]
    for budget in (1, 2, 3, 5, 10):
        ranges = coalesce_id_intervals(ids, budget)
        assert len(ranges) <= budget
        for i in ids:
            assert any(lo <= i <= hi for lo, hi in ranges), (budget, i)
        # ranges are disjoint and ordered
        for (a, b), (c, d) in zip(ranges, ranges[1:]):
            assert b < c


@pytest.fixture(scope="module")
def sorted_store(spark, tmp_path_factory):
    """200k-row store, id-sorted files with ~tiny row groups -- the
    write contract of the package's vector writers, at test scale."""
    path = str(tmp_path_factory.mktemp("fetch") / "store")
    (
        spark.range(200_000)
        .select(
            F.col("id").alias("vec_id"),
            F.concat(F.lit("payload-"), F.col("id")).alias("body"),
        )
        .sortWithinPartitions("vec_id")
        .write.option("parquet.block.size", 64 * 1024)
        .parquet(path)
    )
    return path


def test_fetch_exactness_large_set(spark, sorted_store):
    store = spark.read.parquet(sorted_store)
    # two tight clusters + stragglers, well above the isin threshold
    ids = (
        list(range(1_000, 1_100))
        + list(range(150_000, 150_080))
        + [5, 42, 199_999]
    )
    assert len(ids) > SMALL_FETCH_IDS
    got = fetch_by_ids(store, ids, id_col="vec_id")
    assert sorted(r.vec_id for r in got.collect()) == sorted(ids)
    assert got.columns == ["vec_id", "body"]
    # rows in the gaps between clusters are NOT admitted
    assert got.filter(F.col("vec_id") == 1_500).count() == 0


def test_fetch_scans_bounded_row_fraction(spark, sorted_store):
    """On an id-sorted store the pushed-down id ranges prune at
    row-group grain: the scan's surviving-row count is a small
    fraction of the store, not a full scan (the r6 failure mode)."""
    store = spark.read.parquet(sorted_store)
    ids = list(range(1_000, 1_100)) + list(range(150_000, 150_080))
    got = fetch_by_ids(store, ids, id_col="vec_id")
    got.collect()
    frac = scan_output_rows(got) / 200_000
    # nonzero guards the metric plumbing itself (an unpopulated
    # metric must not read as perfect pruning)
    assert 0 < frac < 0.10, frac


def test_fetch_small_set_and_empty(spark, sorted_store):
    store = spark.read.parquet(sorted_store)
    got = fetch_by_ids(store, [3, 77], id_col="vec_id")
    assert sorted(r.vec_id for r in got.collect()) == [3, 77]
    assert fetch_by_ids(store, [], id_col="vec_id").count() == 0
    # absent ids: just absent, not an error
    assert fetch_by_ids(
        store, list(range(300_000, 300_100)), id_col="vec_id"
    ).count() == 0


def test_fetch_non_integer_ids(spark, tmp_path):
    df = spark.createDataFrame(
        [(f"doc-{i}", i) for i in range(200)], "doc_id string, n int"
    )
    ids = [f"doc-{i}" for i in range(0, 120, 2)]  # > SMALL_FETCH_IDS
    got = fetch_by_ids(df, ids, id_col="doc_id")
    assert sorted(r.doc_id for r in got.collect()) == sorted(ids)


def test_fetch_float_and_mixed_ids(spark):
    """Non-int, non-str id sets above SMALL_FETCH_IDS must not
    TypeError in the id-relation build: float sets infer their type,
    hopeless mixed sets fall back to the literal filter -- both
    return exactly the matching rows (the small-set isin path always
    handled these; the large-set path must too)."""
    df = spark.createDataFrame(
        [(float(i) / 2, i) for i in range(200)], "fid double, n int"
    )
    ids = [float(i) / 2 for i in range(0, 120, 2)]  # 60 floats
    got = fetch_by_ids(df, ids, id_col="fid")
    assert sorted(r.fid for r in got.collect()) == sorted(ids)
    # explicit id_type pins the relation's type
    got2 = fetch_by_ids(df, ids, id_col="fid", id_type="double")
    assert got2.count() == len(ids)
    # mixed int/str: unsortable and uninferable -- literal fallback
    sdf = spark.createDataFrame(
        [(str(i),) for i in range(100)], "sid string"
    )
    mixed = [str(i) for i in range(0, 60)] + list(range(60, 80))
    gotm = fetch_by_ids(sdf, mixed, id_col="sid")
    assert gotm.count() == 80


def test_fetch_plan_is_bounded(spark, sorted_store):
    """Thousands of candidate ids must NOT become thousands of plan
    literals: the pushed predicate carries at most MAX_FETCH_INTERVALS
    ranges and the exact id set rides a broadcast semi-join."""
    store = spark.read.parquet(sorted_store)
    ids = list(range(0, 100_000, 16))  # 6,250 ids, like a rerank fetch
    got = fetch_by_ids(store, ids, id_col="vec_id")
    plan = got._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan, plan
    # exactness at this volume too
    assert got.count() == len(ids)


def test_compaction_preserves_id_sorted_files(spark, tmp_path):
    """The point-fetch write contract (id-sorted rows within each
    data file, row-group pruning's precondition) must survive
    compaction: the compactor's row_number window shuffles by id, so
    without an explicit per-partition sort the rewritten files would
    silently degrade every later ranged fetch to full-file scans."""
    from pyspark.sql import functions as F

    from xmidt_event_streams_spark.operators.ivf import (
        compact_ivf_index,
        kmeans_fit,
        write_ivf_index,
    )

    emb = spark.createDataFrame(
        [
            (int(i), [float((i * 13) % 7), float(i % 5), 1.0, 0.25])
            for i in range(500)
        ],
        "vec_id long, embedding array<double>",
    )
    path = str(tmp_path / "ix")
    cents = kmeans_fit(emb, 4, 2)
    write_ivf_index(emb, path, cents)
    # a second append creates multi-file cells so compaction must merge
    from xmidt_event_streams_spark.operators.ivf import (
        append_to_ivf_index,
    )

    more = spark.createDataFrame(
        [
            (int(i), [float((i * 13) % 7), float(i % 5), 1.0, 0.25])
            for i in range(500, 900)
        ],
        "vec_id long, embedding array<double>",
    )
    append_to_ivf_index(more, path)
    compact_ivf_index(spark, path)
    import glob

    for f in glob.glob(f"{path}/cell=*/*.parquet"):
        ids = [
            r["vec_id"]
            for r in spark.read.parquet(f).select("vec_id").collect()
        ]
        assert ids == sorted(ids), f
