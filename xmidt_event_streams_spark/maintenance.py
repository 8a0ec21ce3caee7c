"""One maintenance entry point for everything that accumulates.

Long-running pipelines grow three kinds of residue: small files (one
partition per 15 s trigger -- millions over months), replay/append
duplicates in the MinHash index, and per-batch rollup partials whose
merge cost tracks stream age. Each has its own compactor; operators
schedule ONE maintenance window, so this module gives them one call
with one report.

Every underlying compactor is single-writer: run while the streams
writing these paths are STOPPED (checkpoint committed). Each target
is independent -- a failure on one is recorded in the report and the
rest still run; the report is the ledger (log it, alert on "error").
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def run_maintenance(
    spark: SparkSession,
    ingest_sinks: tuple[str, ...] = (),
    minhash_indexes: tuple[str, ...] = (),
    rollups: tuple[tuple[str, list, dict], ...] = (),
    ivf_indexes: tuple[str, ...] = (),
    kmv_baselines: tuple[tuple[str, str], ...] = (),
    tombstones: dict[str, list] | None = None,
    batches_per_partition: int = 1_000,
) -> dict:
    """Run the maintenance window across targets.

    ``ingest_sinks``: corpus/rejects paths (batch-partition merge,
    ``ingest_dedup.compact_ingest_sink``). ``minhash_indexes``: index
    paths (replay-dup + tombstone rewrite,
    ``incremental.compact_minhash_index``; per-path tombstone id
    lists via ``tombstones``). ``rollups``: (path, dims, measures)
    triples (partial fold, ``rollup.compact_rollup``).
    ``ivf_indexes``: IVF index paths -- a READ-ONLY occupancy-drift
    check (``ivf.ivf_occupancy_drift``): the report carries the PSI
    verdict so the window that compacts everything else also tells
    you when frozen centroids need a refit ("shifted" = schedule a
    rebuild; nothing is rewritten here). ``kmv_baselines``:
    (sketch_path, corpus_parquet_path) pairs -- a READ-ONLY content
    drift check (``contamination.kmv_drift``): n-gram-set Jaccard of
    the corpus today vs its stamped baseline, with a
    stable/drifting/shifted verdict (keyed by sketch_path in the
    report).

    Returns {target_path: {"kind": ..., **compactor_report}} with
    {"kind", "error"} for targets whose compactor raised.
    """
    from xmidt_event_streams_spark.operators.contamination import kmv_drift
    from xmidt_event_streams_spark.operators.incremental import (
        compact_minhash_index,
    )
    from xmidt_event_streams_spark.operators.ivf import ivf_occupancy_drift
    from xmidt_event_streams_spark.streaming.ingest_dedup import (
        compact_ingest_sink,
    )
    from xmidt_event_streams_spark.streaming.rollup import compact_rollup

    report: dict = {}

    def _run(path, kind, fn):
        try:
            out = fn() or {}
            report[path] = {"kind": kind, **out}
        except Exception as exc:  # independent targets: record, go on
            report[path] = {"kind": kind, "error": f"{type(exc).__name__}: {exc}"}

    for path in ingest_sinks:
        _run(
            path,
            "ingest_sink",
            lambda p=path: compact_ingest_sink(
                spark, p, batches_per_partition
            ),
        )
    for path in minhash_indexes:
        tl = (tombstones or {}).get(path)
        _run(
            path,
            "minhash_index",
            lambda p=path, t=tl: compact_minhash_index(spark, p, tombstones=t),
        )
    for path, dims, measures in rollups:
        _run(
            path,
            "rollup",
            lambda p=path, d=dims, m=measures: compact_rollup(spark, p, d, m),
        )
    for path in ivf_indexes:
        _run(
            path,
            "ivf_drift",
            lambda p=path: ivf_occupancy_drift(spark, p),
        )
    for sketch_path, corpus_path in kmv_baselines:
        _run(
            sketch_path,
            "kmv_drift",
            lambda s=sketch_path, c=corpus_path: kmv_drift(
                spark, s, spark.read.parquet(c)
            ),
        )
    return report
