"""One maintenance entry point for everything that accumulates.

Long-running pipelines grow three kinds of residue: small files (one
partition per 15 s trigger -- millions over months), replay/append
duplicates in the MinHash index, and per-batch rollup partials whose
merge cost tracks stream age. Each has its own compactor; operators
schedule ONE maintenance window, so this module gives them one call
with one report.

Every underlying compactor is single-writer: run while the streams
writing these paths are STOPPED (checkpoint committed). That contract
is ENFORCED, not just documented: pass ``checkpoints`` mapping each
write-target path to the checkpoint dir of the stream that writes it,
and the window refuses (``WriterActiveError``) to compact any target
whose checkpoint shows an in-flight batch (newest offset newer than
newest commit) or a commit younger than ``writer_quiesce_sec`` --
``force=True`` overrides for operators who know the stream is down.
Each target is independent -- a failure on one is recorded in the
report and the rest still run; the report is the ledger (log it,
alert on "error").
"""

from __future__ import annotations

import time

from pyspark.sql import SparkSession

from xmidt_event_streams_spark.fsutil import latest_file_mtime_ms


class WriterActiveError(RuntimeError):
    """A maintenance target's writing stream looks live (in-flight
    batch, or a commit inside the quiesce window): compacting now
    would race the stream's appends. Stop the stream (or wait out the
    quiesce window), or pass force=True."""


def assert_writer_quiesced(
    spark: SparkSession,
    target: str,
    checkpoint_dir: str,
    quiesce_sec: int = 300,
) -> None:
    """Refuse unless the checkpoint at ``checkpoint_dir`` shows a
    fully-committed, quiesced stream. Structured Streaming writes
    ``offsets/<n>`` at batch START and ``commits/<n>`` at batch END,
    so newest(offsets) > newest(commits) == a batch mid-flight; a
    newest commit younger than ``quiesce_sec`` == the stream was
    writing moments ago and is likely still running. Two flat
    Hadoop-FS listings; no data files touched."""
    base = checkpoint_dir.rstrip("/")
    off = latest_file_mtime_ms(spark, base + "/offsets")
    com = latest_file_mtime_ms(spark, base + "/commits")
    if off is None and com is None:
        return  # never started: nothing can race
    if com is None or (off is not None and off > com):
        raise WriterActiveError(
            f"target {target}: checkpoint {checkpoint_dir} shows an "
            "in-flight batch (offset written, commit missing) -- a "
            "stream is writing this path now"
        )
    age = time.time() - com / 1000.0
    if age < quiesce_sec:
        raise WriterActiveError(
            f"target {target}: checkpoint {checkpoint_dir} committed a "
            f"batch {age:.0f}s ago (< quiesce window {quiesce_sec}s) -- "
            "stop the stream or wait before compacting"
        )


def run_maintenance(
    spark: SparkSession,
    ingest_sinks: tuple[str, ...] = (),
    minhash_indexes: tuple[str, ...] = (),
    window_indexes: tuple[str, ...] = (),
    inverted_indexes: tuple[str, ...] = (),
    rollups: tuple[tuple[str, list, dict], ...] = (),
    ivf_indexes: tuple[str, ...] = (),
    ivf_rebuild_on_shift: bool = False,
    ivf_compactions: tuple[str, ...] = (),
    ivfpq_compactions: tuple[str, ...] = (),
    kmv_baselines: tuple[tuple[str, str], ...] = (),
    token_baselines: tuple[tuple[str, str], ...] = (),
    snapshot_tables: tuple[tuple[str, int], ...] = (),
    snapshot_rebuckets: tuple[tuple[str, int], ...] = (),
    replications: tuple[tuple[str, str, str], ...] = (),
    swap_recoveries: tuple[str, ...] = (),
    tombstones: dict[str, list] | None = None,
    batches_per_partition: int = 1_000,
    checkpoints: dict[str, str] | None = None,
    force: bool = False,
    writer_quiesce_sec: int = 300,
) -> dict:
    """Run the maintenance window across targets.

    ``ingest_sinks``: corpus/rejects paths (batch-partition merge,
    ``ingest_dedup.compact_ingest_sink``). ``minhash_indexes``: index
    paths (replay-dup + tombstone rewrite,
    ``incremental.compact_minhash_index``; per-path tombstone id
    lists via ``tombstones``). ``window_indexes``: window-hash index
    paths (replay-dup rewrite keeping each hash's first writer,
    ``spandedup.compact_window_index``). ``inverted_indexes``:
    positional inverted-index paths (replay-dup + tombstone rewrite,
    ``invindex.compact_inverted_index``; per-path tombstone id lists
    via ``tombstones`` — the index tier of a takedown).
    ``rollups``: (path, dims, measures)
    triples (partial fold, ``rollup.compact_rollup``).
    ``ivf_indexes``: IVF index paths -- a READ-ONLY occupancy-drift
    check (``ivf.ivf_occupancy_drift``): the report carries the PSI
    verdict so the window that compacts everything else also tells
    you when frozen centroids need a refit ("shifted" = schedule a
    rebuild; nothing is rewritten here) -- unless
    ``ivf_rebuild_on_shift=True``, which closes the loop in the same
    window: a "shifted" verdict triggers ``ivf.rebuild_ivf_index``
    (re-fit on current contents + atomic swap, report key suffix
    ``ivf_rebuild``; the path is then guarded as a write target). ``ivf_compactions``: IVF
    index paths to REWRITE (``ivf.compact_ivf_index``): folds
    streaming batch partitions into one file per cell and drops
    duplicate/tombstoned ids (per-path tombstone lists via
    ``tombstones`` -- the vector tier of a takedown); guarded like
    other write targets. ``ivfpq_compactions``: the same rewrite for
    IVF-PQ indexes (``ivfpq.compact_ivfpq_index`` -- the CODES tier
    of a takedown; report key suffix ``ivfpq_index``).
    ``kmv_baselines``:
    (sketch_path, corpus_parquet_path) pairs -- a READ-ONLY content
    drift check (``contamination.kmv_drift``): n-gram-set Jaccard of
    the corpus today vs its stamped baseline, with a
    stable/drifting/shifted verdict (keyed by sketch_path in the
    report). ``token_baselines``: (baseline_path, corpus_parquet_path)
    pairs -- a READ-ONLY heavy-token frequency drift check
    (``frequency.token_drift``): PSI of the exact heavy-hitter
    profile vs its stamped baseline, same verdict bands.

    ``snapshot_tables``: (path, keep_last) pairs -- snapshot-table
    history expiry (``snapshots.snapshot_expire``): drops all but the
    newest keep_last manifests and GCs every data file no surviving
    manifest references (including conflict-loser orphans). This is
    also what COMPLETES takedowns on snapshot tables: a tombstoned
    row's bytes persist until the last manifest referencing them
    expires. Guarded like other write targets via ``checkpoints``.

    ``snapshot_rebuckets``: (path, new_bucket_hex) pairs -- layout
    evolution (``snapshots.snapshot_rebucket``, one claim-protected
    full-rewrite commit; run it when per-bucket size has outgrown the
    merge economics). Commits before replications/expiry in the same
    window. ``replications``: (src_path, dst_path, checkpoint_dir) triples --
    CDC replica catch-up (``snapshots.replicate_snapshot``): drains
    every pending change interval into the replica at change-volume
    cost. The DESTINATION is the write target for guarding purposes;
    scheduling the drain in the same window as the source's expire is
    the operational pairing that keeps the follower inside retained
    history (drain first: ``replications`` run before
    ``snapshot_tables``).

    ``swap_recoveries``: index/sink paths to run crash recovery on
    BEFORE anything else in the window (``fsutil.recover_swap``): a
    compaction/rebuild that crashed inside the swap window leaves the
    target missing with its complete replacement stranded in a
    ``__compact_tmp``/``__rebuild_tmp`` dir -- recovery finishes that
    rename; a stale tmp next to a live target is deleted. Listing a
    path here makes every later target in the same window see a
    healthy index. Report key suffix ``swap_recovery``.

    ``checkpoints`` maps write-target paths (sinks/indexes/rollups)
    to the checkpoint dirs of the streams that write them; guarded
    targets are checked with :func:`assert_writer_quiesced` BEFORE
    anything is compacted, and a live writer raises
    :class:`WriterActiveError` for the whole window (a mis-scheduled
    window is an operator error -- fail loudly, don't half-run).
    ``force=True`` skips the guard. Read-only checks (ivf/kmv drift)
    are never guarded.

    Returns {target_path: {"kind": ..., **compactor_report}} with
    {"kind", "error"} for targets whose compactor raised.
    """
    from xmidt_event_streams_spark.operators.contamination import kmv_drift
    from xmidt_event_streams_spark.operators.frequency import token_drift
    from xmidt_event_streams_spark.operators.incremental import (
        compact_minhash_index,
    )
    from xmidt_event_streams_spark.operators.invindex import (
        compact_inverted_index,
    )
    from xmidt_event_streams_spark.operators.ivf import (
        compact_ivf_index,
        ivf_occupancy_drift,
    )
    from xmidt_event_streams_spark.operators.spandedup import (
        compact_window_index,
    )
    from xmidt_event_streams_spark.streaming.ingest_dedup import (
        compact_ingest_sink,
    )
    from xmidt_event_streams_spark.operators.snapshots import (
        replicate_snapshot,
        snapshot_expire,
        snapshot_rebucket,
    )
    from xmidt_event_streams_spark.streaming.rollup import compact_rollup

    if checkpoints and not force:
        write_targets = (
            set(ingest_sinks)
            | set(minhash_indexes)
            | set(window_indexes)
            | set(inverted_indexes)
            | set(ivf_compactions)
            | set(ivfpq_compactions)
            | (set(ivf_indexes) if ivf_rebuild_on_shift else set())
            | {p for p, _, _ in rollups}
            | {p for p, _ in snapshot_tables}
            | {p for p, _ in snapshot_rebuckets}
            | {d for _, d, _ in replications}
        )
        for target, ckpt in checkpoints.items():
            if target in write_targets:
                assert_writer_quiesced(
                    spark, target, ckpt, writer_quiesce_sec
                )

    report: dict = {}

    def _run(path, kind, fn):
        # one path can legitimately be several targets (e.g. an IVF
        # index both drift-checked and compacted): suffix the report
        # key instead of silently overwriting the earlier entry
        key = path if path not in report else f"{path}#{kind}"
        try:
            out = fn() or {}
            report[key] = {"kind": kind, **out}
        except Exception as exc:  # independent targets: record, go on
            report[key] = {"kind": kind, "error": f"{type(exc).__name__}: {exc}"}

    # crash recovery FIRST: later targets in this window must see a
    # healthy index, not a swap-crashed one
    from xmidt_event_streams_spark.fsutil import recover_swap

    for path in swap_recoveries:
        _run(
            path,
            "swap_recovery",
            lambda p=path: recover_swap(spark, p),
        )

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
    for path in window_indexes:
        _run(
            path,
            "window_index",
            lambda p=path: compact_window_index(spark, p),
        )
    for path in inverted_indexes:
        tl = (tombstones or {}).get(path)
        _run(
            path,
            "inverted_index",
            lambda p=path, t=tl: compact_inverted_index(
                spark, p, tombstones=t
            ),
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
        drift_key = next(
            k
            for k in (path, f"{path}#ivf_drift")
            if report.get(k, {}).get("kind") == "ivf_drift"
        )
        if (
            ivf_rebuild_on_shift
            and report[drift_key].get("verdict") == "shifted"
        ):
            # close the drift loop in the same window: 'shifted' means
            # the frozen centroids no longer match the corpus -- the
            # documented response is a re-fit + atomic swap, which the
            # rebuild performs (new occupancy becomes the baseline)
            from xmidt_event_streams_spark.operators.ivf import (
                rebuild_ivf_index,
            )

            _run(
                path,
                "ivf_rebuild",
                lambda p=path: rebuild_ivf_index(spark, p),
            )
    for path in ivf_compactions:
        tl = (tombstones or {}).get(path)
        _run(
            path,
            "ivf_index",
            lambda p=path, t=tl: compact_ivf_index(spark, p, tombstones=t),
        )
    for path in ivfpq_compactions:
        from xmidt_event_streams_spark.operators.ivfpq import (
            compact_ivfpq_index,
        )

        tl = (tombstones or {}).get(path)
        _run(
            path,
            "ivfpq_index",
            lambda p=path, t=tl: compact_ivfpq_index(
                spark, p, tombstones=t
            ),
        )
    for sketch_path, corpus_path in kmv_baselines:
        _run(
            sketch_path,
            "kmv_drift",
            lambda s=sketch_path, c=corpus_path: kmv_drift(
                spark, s, spark.read.parquet(c)
            ),
        )
    for base_path, corpus_path in token_baselines:
        _run(
            base_path,
            "token_drift",
            lambda b=base_path, c=corpus_path: token_drift(
                spark, b, spark.read.parquet(c)
            ),
        )
    # rebuckets commit BEFORE expiry (the rebucket is one more
    # version; expiring first would be pointless churn) and before
    # replication drains (followers then receive the empty cross-
    # boundary interval instead of racing the rewrite)
    for path, new_hex in snapshot_rebuckets:
        _run(
            path,
            "snapshot_rebucket",
            lambda p=path, h=new_hex: snapshot_rebucket(spark, p, h),
        )
    # replication drains run BEFORE expiry so a lagging follower is
    # caught up while its cursor's manifest is still retained
    for src, dst, ckpt in replications:
        _run(
            dst,
            "snapshot_replicate",
            lambda s_=src, d=dst, c=ckpt: replicate_snapshot(
                spark, s_, d, c
            ),
        )
    for path, keep_last in snapshot_tables:
        _run(
            path,
            "snapshot_expire",
            lambda p=path, k=keep_last: snapshot_expire(spark, p, k),
        )
    return report
