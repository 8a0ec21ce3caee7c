"""Scale-safe point fetch: read a bounded id set out of a huge
columnar store.

The naive shape -- ``df.filter(col(id).isin(<thousands of ids>))`` --
fails twice at scale: (a) a multi-thousand-literal expression tree
costs seconds of analysis/codegen before a single row is read, and
(b) parquet cannot prune row groups from it (above
``spark.sql.parquet.pushdown.inFilterThreshold`` the pushed filter
degrades to one [min, max] range over the WHOLE set, which on ids
spread across the corpus covers every row group), so the "point"
fetch scans the table.

This operator splits the problem the way a storage engine would:

  * the sorted id set is coalesced into at most
    :data:`MAX_FETCH_INTERVALS` contiguous RANGES (cut at the largest
    gaps), pushed down as an OR-of-BETWEENs -- parquet row-group
    stats prune everything outside the ranges, so on an id-sorted /
    id-clustered store the scan reads ~|ids| rows plus gap slack, not
    the corpus. The plan stays O(MAX_FETCH_INTERVALS) regardless of
    |ids|;
  * exactness comes from a BROADCAST SEMI-JOIN against the id set
    (a hash probe per surviving row -- O(1), tiny plan), which drops
    the in-gap rows the coarse ranges admit.

Point-lookup locality is a WRITE-side contract: stores written by
this package sort by id within files (``bench.py`` corpus writer,
``streaming/ingest_vectors.py``) so the range predicates align with
row-group stats. On an unsorted store the ranges prune nothing and
the fetch degrades to one full scan + semi-join -- still correct,
still a bounded plan, never a multi-thousand-literal expression.

Consumers: the ANN refine stage (``pq.exact_rerank_l2`` fetches the
top-C candidate vectors for exact re-scoring) and any id-addressed
fetch over an unbucketed store (bucketed snapshot tables already
prune at the manifest level -- ``snapshots.snapshot_read_keys``).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# at or below this many ids a literal IN is both pushable (parquet
# keeps per-value filters under the pushdown threshold's reach) and
# plan-cheap; matches the order of Spark's own in-filter thresholds
SMALL_FETCH_IDS = 32

# cap on pushed-down id ranges. 64 is the measured sweet spot on BOTH
# channels (r8 decomposition, 2M-row id-sorted store, 6k rerank-shaped
# candidate ids):
#   * per-ROW cost: the OR-of-BETWEENs is evaluated on every row that
#     survives row-group pruning, and past ~100 branches janino fails
#     to compile the expression (64 KB method limit) -- Spark falls
#     back to INTERPRETED evaluation and the "pruned" fetch measured
#     3.7 s where 64 compiled branches measured 0.67 s (slower than
#     scanning everything through the bare semi-join, 0.46 s);
#   * pruning: row groups are thousands of rows, so interval budgets
#     past the candidate clusters' count stop mattering -- 64 and 256
#     intervals scanned IDENTICAL row counts (533k of 2M) on the
#     rerank workload, because sub-row-group cover tightening prunes
#     nothing.
# The plan stays O(64) nodes regardless of |ids|.
MAX_FETCH_INTERVALS = 64


def coalesce_id_intervals(
    ids, max_intervals: int = MAX_FETCH_INTERVALS
) -> list[tuple[int, int]]:
    """Cover the sorted integer id set with at most ``max_intervals``
    [lo, hi] ranges, cutting at the LARGEST gaps (the cover with
    minimal total slack for a fixed interval budget). Deterministic:
    equal gaps cut left-to-right."""
    arr = np.asarray(sorted(set(int(i) for i in ids)), dtype=np.int64)
    if len(arr) == 0:
        return []
    if len(arr) == 1 or max_intervals <= 1:
        return [(int(arr[0]), int(arr[-1]))]
    gaps = np.diff(arr)
    # only true gaps can be cut (adjacent ids are already one run)
    cuttable = np.nonzero(gaps > 1)[0]
    k = min(max_intervals - 1, len(cuttable))
    # the k largest gaps; stable tie-break on position
    order = cuttable[
        np.lexsort((cuttable, -gaps[cuttable]))
    ]
    cuts = np.sort(order[:k])
    starts = np.concatenate(([arr[0]], arr[cuts + 1]))
    ends = np.concatenate((arr[cuts], [arr[-1]]))
    return [(int(a), int(b)) for a, b in zip(starts, ends)]


# a range cover wider than this many rows per requested id is LOOSE:
# the ids are scattered, the pushed ranges would admit (and evaluate
# a ~64-branch predicate over) most of the store while pruning
# little -- measured 10x SLOWER than the bare semi-join's one clean
# hash-filtered scan when the cover reached ~83% of a 2M-row store.
# Tight covers keep the ranges and prune to ~|ids| rows. 192 is set
# from the two measured regimes: ANN rerank candidates land at
# ~73x (cover ~22% of the bench store -- ranges clearly win, and at
# 100 TB a 192x-slack cover is a vanishing store fraction), while
# uniformly random ids land at ~270x (cover ~ the whole store --
# ranges only add predicate cost). Only small stores can lose from
# a kept cover, and small stores are cheap either way.
FETCH_COVER_SLACK = 192


def fetch_by_ids(
    df: DataFrame,
    ids,
    id_col: str = "vec_id",
    max_intervals: int = MAX_FETCH_INTERVALS,
    id_type: str | None = None,
) -> DataFrame:
    """Rows of ``df`` whose ``id_col`` is in ``ids`` (driver-side,
    bounded-by-contract like the probe query lists), via range
    pushdown + broadcast semi-join (module docstring). The range
    cover is applied only when TIGHT (:data:`FETCH_COVER_SLACK`);
    scattered or non-integer id sets use the semi-join alone (one
    hash-filtered scan -- still a bounded plan). The range predicate
    is built as ONE SQL string: a Column-algebra reduce of this
    many betweens costs seconds of py4j round-trips per plan.

    ``id_type`` (Spark DDL, e.g. ``"decimal(10,2)"``) pins the id
    relation's type for callers that know the column's schema
    (snapshot point lookups do); without it, int sets build a
    ``long`` relation, str sets a ``string`` one, and anything else
    (float, mixed) falls back to schema inference, then to a plain
    ``isin`` filter if inference cannot type the set -- never a
    TypeError for ids the small-set path would have handled."""
    ids = list(set(ids))
    if not ids:
        return df.filter(F.lit(False))
    if len(ids) <= SMALL_FETCH_IDS:
        return df.filter(F.col(id_col).isin(ids))
    spark = df.sparkSession
    numeric = all(
        isinstance(i, (int, np.integer)) and not isinstance(i, bool)
        for i in ids
    )
    int_types = {"tinyint", "smallint", "int", "integer", "bigint", "long"}
    if numeric and (id_type is None or id_type.lower() in int_types):
        ranges = coalesce_id_intervals(ids, max_intervals)
        cover = sum(hi - lo + 1 for lo, hi in ranges)
        if cover <= FETCH_COVER_SLACK * len(ids):
            df = df.filter(
                F.expr(
                    " OR ".join(
                        f"`{id_col}` BETWEEN {lo} AND {hi}"
                        for lo, hi in ranges
                    )
                )
            )
        id_rows = [(int(i),) for i in sorted(ids)]
        id_type = id_type or "long"
    elif numeric and id_type is not None and id_type.lower() == "string":
        # integer keys against a STRING column (a stringified-int
        # snapshot table): the id relation must match the column's
        # type -- createDataFrame verifies strictly, so int rows under
        # a string schema would raise. Python str(int) equals Spark's
        # int->string cast, and integer BETWEENs would not align with
        # a string column's stats anyway, so no range arm.
        id_rows = [(str(int(i)),) for i in sorted(ids)]
    else:
        try:
            id_rows = [(i,) for i in sorted(ids)]
        except TypeError:  # mixed-type set: unsortable, order is moot
            id_rows = [(i,) for i in ids]
        if id_type is None and all(isinstance(i, str) for i in ids):
            id_type = "string"
    if id_type is not None:
        try:
            idset = spark.createDataFrame(
                id_rows, f"`{id_col}` {id_type}"
            )
        except Exception:
            # values don't verify under the pinned type (e.g. int keys
            # against a decimal column): fall through to inference
            id_type = None
    if id_type is None:
        try:  # float/decimal/date ids: let Spark infer the type
            idset = spark.createDataFrame(id_rows, [id_col])
        except Exception:
            # inference failed (mixed types): the literal filter is
            # the last exact expression of the set -- but a giant IN
            # is the exact plan-size hazard this module exists to
            # avoid, so refuse past a bounded literal budget instead
            # of silently building a multi-second interpreted plan
            if len(ids) > 1024:
                raise ValueError(
                    f"fetch_by_ids: {len(ids)} ids of mixed/"
                    "uninferable type cannot form a typed id relation; "
                    "pass id_type= (Spark DDL) or normalize the id set"
                )
            return df.filter(F.col(id_col).isin(ids))
    return df.join(F.broadcast(idset), id_col, "left_semi")


def ranged_scan(
    df: DataFrame,
    ids,
    id_col: str = "vec_id",
    max_intervals: int = MAX_FETCH_INTERVALS,
    max_slack: int = 4,
) -> DataFrame | None:
    """The range-cover SUPERSET scan alone -- one pushed-filter stage,
    no semi-join -- for callers that post-filter to the exact id set
    themselves (the driver-side rescore path: its id-keyed lookup
    ignores in-gap rows for free, so the semi-join stage is pure
    overhead there). The RESULT carries the in-gap rows, so the
    tightness bar (``max_slack``, default 4x) is much stricter than
    fetch_by_ids' scan-side one: a caller collecting this relation
    pays transfer for every cover row. Returns None when the cover
    is looser than that or the ids non-integer (the caller should
    fall back to fetch_by_ids, whose semi-join returns exact rows)."""
    ids = sorted(set(ids))
    if not ids or not all(
        isinstance(i, (int, np.integer)) and not isinstance(i, bool)
        for i in ids
    ):
        return None
    ranges = coalesce_id_intervals(ids, max_intervals)
    if sum(hi - lo + 1 for lo, hi in ranges) > max_slack * len(ids):
        return None
    return df.filter(
        F.expr(
            " OR ".join(
                f"`{id_col}` BETWEEN {lo} AND {hi}" for lo, hi in ranges
            )
        )
    )


def arrow_collect_pandas(df: DataFrame):
    """``df.toPandas()`` with Arrow transfer forced on for this one
    call (restoring the session setting): the row-based path spends
    tens of x longer deserializing wide array columns."""
    sess = df.sparkSession
    key = "spark.sql.execution.arrow.pyspark.enabled"
    prev = sess.conf.get(key, None)
    sess.conf.set(key, "true")
    try:
        return df.toPandas()
    finally:
        if prev is None:
            sess.conf.unset(key)
        else:
            sess.conf.set(key, prev)


def scan_output_rows(df: DataFrame) -> int:
    """Total ``number of output rows`` across the executed plan's
    scan leaves -- the rows that SURVIVED row-group/page pruning (the
    vectorized reader prunes on pushed filters; residual per-row
    filtering happens above the scan). Call AFTER an action on ``df``
    (the metric is populated by execution). Test/benchmark
    instrumentation for the pruning claims above."""
    total = 0

    def _walk(node):
        nonlocal total
        name = node.nodeName()
        # AQE wraps: AdaptiveSparkPlan and *QueryStage are leaves of
        # the outer tree -- unwrap (same walk as scale_audit.py)
        if "AdaptiveSparkPlan" in name:
            _walk(node.finalPhysicalPlan())
            return
        if "QueryStage" in name:
            _walk(node.plan())
            return
        ch = node.children()
        if ch.size() == 0 and "LocalTableScan" not in name:
            m = node.metrics()
            if m.contains("numOutputRows"):
                total += m.apply("numOutputRows").value()
        for i in range(ch.size()):
            _walk(ch.apply(i))

    _walk(df._jdf.queryExecution().executedPlan())
    return int(total)
