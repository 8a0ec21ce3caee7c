"""Parameter sidecars for materialized ANN indexes (fsutil): a probe
with mismatched hash parameters / centroids silently finds nothing or
searches the wrong directories -- the stamped sidecar turns that into
a loud ValueError, on any storage scheme (Hadoop FS API)."""

import pytest
from pyspark.sql import functions as F

from xmidt_event_streams_spark.operators.ivf import (
    probe_ivf_index,
    write_ivf_index,
)
from xmidt_event_streams_spark.operators.similarity import (
    deterministic_planes,
    lsh_topk,
    probe_lsh_index,
    write_lsh_index,
)


def _emb(spark):
    return spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")


def test_lsh_probe_rejects_mismatched_params(spark, tmp_path):
    emb = _emb(spark)
    path = str(tmp_path / "lsh")
    write_lsh_index(emb, path, n_planes=8, dim=64, seed="xes")

    q = emb.limit(3)
    # matched probe works
    assert probe_lsh_index(spark, path, q, k=3, n_planes=8, dim=64).count() >= 0
    for bad in (
        {"n_planes": 6},
        {"seed": "other"},
        {"dim": 32},
    ):
        kw = {"n_planes": 8, "dim": 64, "seed": "xes", **bad}
        with pytest.raises(ValueError, match="LSH index .* was built with"):
            probe_lsh_index(spark, path, q, k=3, **kw)


def test_ivf_probe_loads_stamped_centroids(spark, tmp_path):
    emb = _emb(spark)
    cents = deterministic_planes(8, 64, seed="ivf-test")
    path = str(tmp_path / "ivf")
    write_ivf_index(emb, path, cents)

    q = emb.orderBy("vec_id").limit(3)
    explicit = probe_ivf_index(spark, path, q, cents, k=3, n_probe=2)
    loaded = probe_ivf_index(spark, path, q, None, k=3, n_probe=2)
    assert sorted(map(tuple, explicit.collect())) == sorted(
        map(tuple, loaded.collect())
    )


def test_ivf_probe_rejects_foreign_centroids(spark, tmp_path):
    emb = _emb(spark)
    cents = deterministic_planes(8, 64, seed="ivf-test")
    path = str(tmp_path / "ivf")
    write_ivf_index(emb, path, cents)

    q = emb.limit(2)
    other = deterministic_planes(8, 64, seed="different-fit")
    with pytest.raises(ValueError, match="different centroids"):
        probe_ivf_index(spark, path, q, other, k=3)


def test_ivf_probe_without_sidecar_requires_centroids(spark, tmp_path):
    """Foreign index (bare partitioned parquet, no sidecar):
    centroids=None must raise, not guess."""
    emb = _emb(spark)
    cents = deterministic_planes(4, 64, seed="ivf-test")
    path = str(tmp_path / "bare")
    from xmidt_event_streams_spark.operators.ivf import assign_cells

    (
        assign_cells(emb, cents)
        .write.partitionBy("cell")
        .mode("overwrite")
        .parquet(path)
    )
    with pytest.raises(ValueError, match="no centroid sidecar"):
        probe_ivf_index(spark, path, emb.limit(2), None, k=3)
    # explicit centroids still probe a foreign index fine
    assert (
        probe_ivf_index(spark, path, emb.limit(2), cents, k=3).count() >= 0
    )


def test_sidecars_ignored_by_spark_reads(spark, tmp_path):
    """The `_`-prefixed sidecar must be invisible to the parquet
    reader (no schema corruption from the JSON file)."""
    emb = _emb(spark)
    path = str(tmp_path / "lsh")
    write_lsh_index(emb, path, n_planes=4, dim=64)
    back = spark.read.parquet(path)
    assert set(back.columns) == set(emb.columns) | {"bucket"}
    assert back.count() == emb.count()


def test_lsh_probe_prunes_partitions_at_plan_time(spark, tmp_path):
    """The probe scan must carry the probed buckets as a static
    PartitionFilters IN-list (DPP does not trigger through the
    nondeterministic Arrow bucket kernel -- without the static filter
    the probe reads EVERY bucket directory of a 100 TB index)."""
    emb = _emb(spark)
    path = str(tmp_path / "lsh")
    write_lsh_index(emb, path, n_planes=8, dim=64)
    q = emb.limit(3)

    for mp in (False, True):
        out = probe_lsh_index(spark, path, q, k=3, multi_probe=mp)
        plan = out._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        pf = [l for l in plan.splitlines() if "PartitionFilters" in l]
        assert pf and "bucket" in pf[0], (mp, pf)
        assert ("INSET" in pf[0]) or (" IN " in pf[0]), (mp, pf)

    # pruning must not change results: same rows as the full-scan path
    full = lsh_topk(emb, q, k=3)
    pruned = probe_lsh_index(spark, path, q, k=3)
    norm = lambda df: sorted(
        (r["query_id"], r["vec_id"], r["cos_sim"]) for r in df.collect()
    )
    assert norm(full) == norm(pruned)


class TestIvfAppend:
    """append_to_ivf_index: the streaming-corpus arm of the IVF
    lifecycle (write -> append batches -> probe finds appended rows
    in the right pruned directories)."""

    def test_append_then_probe_incremental_equals_rebuild(self, spark, tmp_path):
        from xmidt_event_streams_spark.operators.ivf import append_to_ivf_index

        emb = _emb(spark)
        old = emb.filter(F.col("vec_id") < 400)
        new = emb.filter(F.col("vec_id") >= 400)
        cents = deterministic_planes(8, 64, seed="ivf-test")

        inc = str(tmp_path / "inc")
        write_ivf_index(old, inc, cents)
        append_to_ivf_index(new, inc)

        full = str(tmp_path / "full")
        write_ivf_index(emb, full, cents)

        q = emb.orderBy("vec_id").limit(3)
        got = sorted(
            map(tuple, probe_ivf_index(spark, inc, q, k=5, n_probe=2).collect())
        )
        want = sorted(
            map(tuple, probe_ivf_index(spark, full, q, k=5, n_probe=2).collect())
        )
        assert got == want
        # appended rows really landed (an appended id is retrievable)
        new_ids = {r["vec_id"] for r in new.select("vec_id").collect()}
        assert any(r[1] in new_ids for r in got)

    def test_append_refuses_foreign_or_missing_sidecar(self, spark, tmp_path):
        from xmidt_event_streams_spark.operators.ivf import append_to_ivf_index

        emb = _emb(spark)
        plain = str(tmp_path / "plain")
        emb.write.parquet(plain)
        with pytest.raises(ValueError, match="no centroid sidecar"):
            append_to_ivf_index(emb, plain)

        idx = str(tmp_path / "idx")
        write_ivf_index(emb, idx, deterministic_planes(8, 64, seed="ivf-test"))
        with pytest.raises(ValueError, match="stores vec_col"):
            append_to_ivf_index(emb, idx, vec_col="other_vec")


class TestIvfFilesManifest:
    """The cell->files manifest every IVF/IVF-PQ writer maintains
    (ivf._IVF_FILES_FILE): probes open files straight from it -- no
    directory listing -- so the manifest must track every mutation
    (build, plain append, batched append, compaction) exactly."""

    def _manifest(self, spark, path):
        from xmidt_event_streams_spark.fsutil import read_json_sidecar
        from xmidt_event_streams_spark.operators.ivf import (
            _IVF_FILES_FILE,
        )

        man = read_json_sidecar(spark, path, _IVF_FILES_FILE)
        assert man is not None, "writer did not stamp a file manifest"
        return man["cells"]

    def _fs_files(self, path):
        from pathlib import Path

        root = Path(path)
        return {
            str(p.relative_to(root))
            for p in root.rglob("*.parquet")
            if p.parts
        }

    def test_manifest_tracks_build_append_compact(self, spark, tmp_path):
        from xmidt_event_streams_spark.operators.ivf import (
            append_to_ivf_index,
            compact_ivf_index,
            read_probed_cells,
        )

        emb = _emb(spark)
        path = str(tmp_path / "ivfman")
        cents = deterministic_planes(8, 64, seed="ivf-test")
        write_ivf_index(emb.filter(F.col("vec_id") < 300), path, cents)
        by_cell = self._manifest(spark, path)
        assert set().union(*by_cell.values()) == self._fs_files(path)

        # plain append: only touched cells re-listed, files superset
        append_to_ivf_index(
            emb.filter(
                (F.col("vec_id") >= 300) & (F.col("vec_id") < 500)
            ),
            path,
        )
        by_cell2 = self._manifest(spark, path)
        assert set().union(*by_cell2.values()) == self._fs_files(path)

        # batched (streaming) append: dynamic-overwrite layout tracked
        append_to_ivf_index(
            emb.filter(F.col("vec_id") >= 500), path, batch_id=3
        )
        by_cell3 = self._manifest(spark, path)
        assert set().union(*by_cell3.values()) == self._fs_files(path)
        # a probe through the manifest sees every row ever written
        all_cells = [int(c) for c in by_cell3]
        got = read_probed_cells(spark, path, all_cells)
        assert got.count() == emb.count()

        # compaction regenerates the manifest from the new layout
        compact_ivf_index(spark, path, tombstones=[0, 1])
        by_cell4 = self._manifest(spark, path)
        assert set().union(*by_cell4.values()) == self._fs_files(path)
        got = read_probed_cells(
            spark, path, [int(c) for c in by_cell4]
        )
        assert got.count() == emb.count() - 2

    def test_probed_cells_with_no_rows_are_empty_not_error(
        self, spark, tmp_path
    ):
        from xmidt_event_streams_spark.operators.ivf import (
            read_probed_cells,
        )

        emb = _emb(spark)
        path = str(tmp_path / "ivfempty")
        cents = deterministic_planes(8, 64, seed="ivf-test")
        write_ivf_index(emb, path, cents)
        by_cell = self._manifest(spark, path)
        empty_cell = max(int(c) for c in by_cell) + 17
        got = read_probed_cells(spark, path, [empty_cell])
        assert got.count() == 0
        assert "cell" in got.columns  # index schema preserved


def test_lsh_probe_triggers_no_listing_job(spark, tmp_path):
    """The LSH index shares the file-manifest contract: a probe opens
    the probed buckets' files from the manifest, so NO listing Spark
    job runs (the root read previously listed all 2^n_planes bucket
    dirs -- a per-probe job above the discovery threshold). Same
    detector discipline as the IVF-PQ pin: the threshold is forced to
    1 so any listing would surface as a job."""
    from tests.jobcount import listing_jobs

    emb = _emb(spark)
    path = str(tmp_path / "lshman")
    write_lsh_index(emb, path)
    q = emb.orderBy("vec_id").limit(4)

    key = "spark.sql.sources.parallelPartitionDiscovery.threshold"
    prev = spark.conf.get(key)
    spark.conf.set(key, "1")
    try:
        counts: dict = {}
        hits = listing_jobs(spark, lambda: counts.setdefault(
            "n",
            probe_lsh_index(
                spark, path, q, k=3, multi_probe=True
            ).count(),
        ))
        assert counts["n"] > 0
        assert hits == []
    finally:
        spark.conf.set(key, prev)


def test_ivf_append_with_null_vectors_updates_manifest(spark, tmp_path):
    """Poison rows (null/ragged vectors) assign a NULL cell; the
    append's touched-cell collect must skip them (they land in the
    default partition probes never read) instead of crashing on
    int(None), and the manifest still tracks the valid rows."""
    from pyspark.sql import functions as F

    from xmidt_event_streams_spark.operators.ivf import (
        append_to_ivf_index,
        read_probed_cells,
    )

    emb = _emb(spark)
    path = str(tmp_path / "ivfnull")
    cents = deterministic_planes(8, 64, seed="ivf-test")
    write_ivf_index(emb.filter(F.col("vec_id") < 100), path, cents)
    batch = emb.filter(
        (F.col("vec_id") >= 100) & (F.col("vec_id") < 160)
    ).withColumn(
        "embedding",
        F.when(F.col("vec_id") % 7 == 0, F.lit(None)).otherwise(
            F.col("embedding")
        ),
    )
    append_to_ivf_index(batch, path)  # must not raise
    got = read_probed_cells(spark, path, list(range(8)))
    want = 100 + batch.filter(F.col("embedding").isNotNull()).count()
    assert got.count() == want
