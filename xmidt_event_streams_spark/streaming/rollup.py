"""Incremental rollup maintenance: a streaming materialized view for
additive aggregates.

The reference's only aggregations are its Prometheus counters
(SURVEY.md §2.6) -- monotone, additive, maintained incrementally.
This module is the general form: a rollup table over any dimension
set, maintained per micro-batch, queryable at any time without
rescanning history.

Design: each micro-batch writes its PARTIAL aggregate (a few rows per
dimension combination), partitioned by batch id via
``ingest_dedup.idempotent_batch_append`` -- so an at-least-once
replay overwrites its own partition instead of double-counting.
Reading the view merges the partials: COUNT/SUM re-add, MIN/MAX
re-min/max, AVG derives from (sum, count). Merge cost is bounded by
(#batches x #groups), not event history; ``compact_rollup`` folds all
partials into one when the batch count grows (same single-writer
maintenance posture as ``compact_minhash_index``).

Why not just ``outputMode("complete")`` + a memory/Delta sink? A
complete-mode streaming agg holds EVERY group in the state store
forever -- at 100 TB dimension cardinalities that is unbounded state.
Here the state store holds nothing: partials live on storage, the
stream stays stateless (append-only foreachBatch), and a restart
resumes from the checkpoint with no state recovery at all.

Only re-mergeable aggregates are admitted: count/sum/min/max, the
avg derivation, approx_distinct (Datasketches HLL -- the partial
stored per batch IS the binary sketch, merged with hll_union_agg on
read, so distinct-count rollups compose across batches without
keeping member sets anywhere), top_k (Datasketches frequent-items:
the partial is the accumulate state, combined+estimated on read --
heavy hitters per dimension slice, exact below sketch capacity), and
hist (fixed-edge bin counts -- EXACTLY mergeable by element-wise
addition; quantiles derive from the merged histogram with a
bin-width error bound, see ``rollup_percentile``). Non-decomposable exact aggregates (exact
median, exact distinct) need a different machine -- see
value_percentiles (approx_percentile) for the one-shot quantile
story; the hist measure is its rollup-native replacement: p99 over
any dimension slice without ever touching raw history, at the price
of a KNOWN, edge-chosen resolution.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from xmidt_event_streams_spark.streaming.ingest_dedup import (
    idempotent_batch_append,
)

_MERGEABLE = (
    "count", "sum", "min", "max", "avg", "approx_distinct", "hist", "top_k"
)
_BATCH_COL = "_ingest_batch_id"

# capacity of the frequent-items sketch state: counts are EXACT while
# a group's distinct item count stays below this (the intended regime
# for enum-ish dimensions); past it, standard approx_top_k error
_TOPK_MAX_TRACKED = 10_000


def _spec(value):
    fn, src = value[0], value[1]
    extra = value[2] if len(value) > 2 else None
    if fn == "hist" and extra is not None:
        extra = tuple(extra)
    return fn, src, extra


def _check_measures(measures: dict) -> None:
    for out, value in measures.items():
        fn, _src, extra = _spec(value)
        if fn not in _MERGEABLE:
            raise ValueError(
                f"{out}: '{fn}' is not re-mergeable "
                f"(supported: {_MERGEABLE})"
            )
        if fn == "hist":
            edges = extra
            if not edges or list(edges) != sorted(edges) or len(edges) < 2:
                raise ValueError(
                    f"{out}: hist needs >= 2 strictly sorted bin edges, "
                    f"('hist', src, edges)"
                )
        if fn == "top_k" and (not isinstance(extra, int) or extra < 1):
            raise ValueError(
                f"{out}: top_k needs a positive k, ('top_k', src, k)"
            )


def log_edges(lo: float, hi: float, per_decade: int = 10) -> tuple[float, ...]:
    """Log-spaced histogram edges covering [lo, hi]: relative
    quantile error is bounded by the edge ratio (10^(1/per_decade)-1,
    e.g. ~26% at 10/decade, ~12% at 20/decade)."""
    assert 0 < lo < hi
    n = math.ceil(per_decade * math.log10(hi / lo))
    return tuple(lo * (10 ** (i / per_decade)) for i in range(n + 1))


def _bin_index(src: str, edges: tuple[float, ...]) -> Column:
    """Bin i holds values in (edges[i-1], edges[i]]; bin 0 is the
    underflow (<= edges[0]), bin len(edges) the overflow."""
    arr = F.array(*[F.lit(float(e)) for e in edges])
    return F.size(F.filter(arr, lambda e: e < F.col(src)))


def rollup_partial(
    df: DataFrame, dims: list[str], measures: dict[str, tuple[str, str]]
) -> DataFrame:
    """One batch's partial aggregate. ``measures`` maps output column
    -> (fn, source_col); avg is stored as its (sum, count) pair in
    ``<out>__sum`` / ``<out>__cnt`` hidden columns."""
    _check_measures(measures)
    aggs = []
    for out, value in measures.items():
        fn, src, extra = _spec(value)
        edges = extra
        if fn == "count":
            aggs.append(F.count(src).alias(out))
        elif fn == "avg":
            aggs.append(F.sum(src).alias(f"{out}__sum"))
            aggs.append(F.count(src).alias(f"{out}__cnt"))
        elif fn == "approx_distinct":
            # Datasketches HLL: the partial IS the sketch (binary,
            # mergeable) -- distinct-count rollups compose across
            # batches without keeping member sets anywhere
            aggs.append(F.hll_sketch_agg(src).alias(f"{out}__hll"))
        elif fn == "top_k":
            # Datasketches frequent-items: the partial IS the sketch
            # state (mergeable); heavy hitters per dimension slice
            # compose across batches like the HLL sketches
            aggs.append(
                F.expr(
                    f"approx_top_k_accumulate({src}, {_TOPK_MAX_TRACKED})"
                ).alias(f"{out}__topk")
            )
        elif fn == "hist":
            idx = _bin_index(src, edges)
            aggs.append(
                F.array(
                    *[
                        F.sum((idx == i).cast("long")).alias(f"b{i}")
                        for i in range(len(edges) + 1)
                    ]
                ).alias(f"{out}__hist")
            )
        else:
            aggs.append(getattr(F, fn)(src).alias(out))
    return df.groupBy(*dims).agg(*aggs)


def _hist_merge(out: str, edges: tuple[float, ...]) -> Column:
    """Element-wise sum of bin-count arrays across partials."""
    return F.array(
        *[
            F.sum(F.col(f"{out}__hist")[i])
            for i in range(len(edges) + 1)
        ]
    )


def _merge_exprs(measures: dict) -> list:
    exprs = []
    for out, value in measures.items():
        fn, _src, extra = _spec(value)
        edges = extra
        if fn in ("count", "sum"):
            exprs.append(F.sum(out).alias(out))
        elif fn in ("min", "max"):
            exprs.append(getattr(F, fn)(out).alias(out))
        elif fn == "approx_distinct":
            exprs.append(
                F.hll_sketch_estimate(
                    F.hll_union_agg(f"{out}__hll")
                ).alias(out)
            )
        elif fn == "top_k":
            exprs.append(
                F.expr(
                    f"approx_top_k_estimate("
                    f"approx_top_k_combine(`{out}__topk`), {extra})"
                ).alias(out)
            )
        elif fn == "hist":
            exprs.append(_hist_merge(out, edges).alias(out))
        else:  # avg
            exprs.append(
                (F.sum(f"{out}__sum") / F.sum(f"{out}__cnt")).alias(out)
            )
    return exprs


def rollup_percentile(
    hist: Column | str, edges: tuple[float, ...], q: float
) -> Column:
    """Quantile estimate from a merged hist measure: struct(lo, hi,
    est) where the EXACT q-quantile is guaranteed inside [lo, hi]
    (the containing bin's edges) and ``est`` is the bin's upper edge
    (the conservative SLO read: 'p99 <= est'). With ``log_edges`` the
    relative width of that guarantee is fixed by bins-per-decade.

    A pure expression over the merged array, so per-group percentiles
    stay distributed (no collect): find the first bin where the
    cumulative count reaches ceil(q * total). Underflow resolves to
    [0 (or -inf conceptually), edges[0]]; overflow to
    [edges[-1], +inf] with est = +inf -- widen the edge range if that
    fires."""
    h = F.col(hist) if isinstance(hist, str) else hist
    n = len(edges) + 1
    total = F.aggregate(h, F.lit(0).cast("long"), lambda a, x: a + x)
    target = F.ceil(F.lit(q) * total.cast("double")).cast("long")
    # first index whose inclusive prefix sum >= target (O(n^2) over
    # ~tens of bins -- a per-group constant)
    idx = F.array_min(
        F.filter(
            F.transform(
                F.sequence(F.lit(0), F.lit(n - 1)),
                lambda i: F.when(
                    F.aggregate(
                        F.slice(h, F.lit(1), i + 1),
                        F.lit(0).cast("long"),
                        lambda a, x: a + x,
                    )
                    >= target,
                    i,
                ),
            ),
            lambda x: x.isNotNull(),
        )
    )
    lo_edges = [0.0] + [float(e) for e in edges]
    hi_edges = [float(e) for e in edges] + [float("inf")]
    lo = F.element_at(F.array(*[F.lit(e) for e in lo_edges]), idx + 1)
    hi = F.element_at(F.array(*[F.lit(e) for e in hi_edges]), idx + 1)
    return F.struct(lo.alias("lo"), hi.alias("hi"), hi.alias("est"))


def read_rollup(
    spark: SparkSession,
    path: str,
    dims: list[str],
    measures: dict[str, tuple[str, str]],
    as_of_batch: int | None = None,
) -> DataFrame:
    """The current view: merge all batch partials. One small shuffle
    over (#batches x #groups) rows.

    ``as_of_batch`` pins the view to triggers <= that batch id (the
    fold partition -1 always participates -- it summarizes batches
    that no longer exist individually, so as-of reads only reach
    BEHIND the last compaction's frontier; pin before compacting if
    historical as-of matters). Gives reproducibility: a training run
    records the batch id it read, and the same view is re-derivable
    until a later compaction folds it."""
    _check_measures(measures)
    df = spark.read.parquet(path)
    if as_of_batch is not None:
        df = df.filter(
            (F.col(_BATCH_COL) <= as_of_batch) | (F.col(_BATCH_COL) == -1)
        )
    return df.groupBy(*dims).agg(*_merge_exprs(measures))


def start_rollup(
    stream_df: DataFrame,
    dims: list[str],
    measures: dict[str, tuple[str, str]],
    rollup_path: str,
    checkpoint_dir: str,
    availableNow: bool = False,
    trigger_seconds: int = 15,
    query_name: str | None = None,
):
    """Maintain the rollup from a stream. Returns the StreamingQuery.

    The stream itself is STATELESS (plain foreachBatch): each trigger
    aggregates only its own batch and appends the partial
    idempotently. Exactly-once view semantics follow from the
    checkpoint (batch ids are stable on replay) + partition
    overwrite."""
    _check_measures(measures)

    def _write(batch: DataFrame, batch_id: int) -> None:
        partial = rollup_partial(batch, dims, measures)
        idempotent_batch_append(partial, batch_id, rollup_path, max_files=1)

    writer = stream_df.writeStream.foreachBatch(_write).option(
        "checkpointLocation", checkpoint_dir
    )
    if query_name:
        writer = writer.queryName(query_name)
    if availableNow:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    return writer.start()


def compact_rollup(
    spark: SparkSession,
    path: str,
    dims: list[str],
    measures: dict[str, tuple[str, str]],
) -> None:
    """Fold every batch partial into a single partial so merge cost
    stops growing with stream age. Pre-merged avg pairs stay pairs
    (sums of sums / sums of counts), so compaction composes with
    later appends. Single-writer maintenance op: run it while the
    stream is stopped (or accept that a concurrently-appended batch
    partition is preserved -- the fold rewrites only the partitions
    it read). The folded partial lands in the reserved batch
    partition -1, which real triggers (non-negative ids) never
    touch; an at-least-once replay of a PRE-compaction batch would
    double-count with the fold, so pair compaction with a stream
    stop/checkpoint-commit boundary."""
    _check_measures(measures)
    cur = spark.read.parquet(path)
    batch_ids = [r[0] for r in cur.select(_BATCH_COL).distinct().collect()]
    exprs = []
    for out, value in measures.items():
        fn, _src, extra = _spec(value)
        edges = extra
        if fn in ("count", "sum"):
            exprs.append(F.sum(out).alias(out))
        elif fn in ("min", "max"):
            exprs.append(getattr(F, fn)(out).alias(out))
        elif fn == "approx_distinct":
            # fold sketches into ONE sketch (still mergeable later)
            exprs.append(F.hll_union_agg(f"{out}__hll").alias(f"{out}__hll"))
        elif fn == "top_k":
            # fold sketches into ONE sketch state (still mergeable)
            exprs.append(
                F.expr(f"approx_top_k_combine(`{out}__topk`)").alias(
                    f"{out}__topk"
                )
            )
        elif fn == "hist":
            # folded bins stay bins (still mergeable later)
            exprs.append(_hist_merge(out, edges).alias(f"{out}__hist"))
        else:
            exprs.append(F.sum(f"{out}__sum").alias(f"{out}__sum"))
            exprs.append(F.sum(f"{out}__cnt").alias(f"{out}__cnt"))
    # materialize the fold BEFORE touching the directory it reads
    # from (writing partition -1 while the lazy plan still scans the
    # old partition -1 is a self-overwrite)
    folded = cur.groupBy(*dims).agg(*exprs).localCheckpoint(eager=True)
    idempotent_batch_append(folded, -1, path, max_files=1)

    from xmidt_event_streams_spark.fsutil import delete_path

    for b in batch_ids:
        if b != -1:
            delete_path(spark, f"{path}/{_BATCH_COL}={b}")
