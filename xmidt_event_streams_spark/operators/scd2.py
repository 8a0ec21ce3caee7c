"""Slowly-changing-dimension (SCD type-2) building and temporal joins.

A change log (key, ts, attrs...) becomes a versioned dimension with
validity intervals, and facts join to the version that was valid AT
THEIR OWN timestamp -- the "what did we know then" join that an
event pipeline needs for attribution, replayable feature
computation, and training-serving skew audits (a model trained on
today's dimension values for yesterday's events is leaking the
future; the temporal join is the fix).

Scale shapes:

  * ``scd2_build`` is one window shuffle on the key (lead() closes
    each version with the next change's timestamp); the optional
    ``collapse`` drops no-op changes (same attrs as the previous
    version) BEFORE interval assignment, so repeated heartbeats of
    an unchanged value produce one long version, not N slivers.
  * ``temporal_join`` is an EQUI join on the key with the interval
    predicate as a residual condition -- per key the version count
    is small (bounded by change frequency), so the residual scan per
    matched key is cheap and no interval binning is needed (contrast
    operators/rangejoin.py, which exists for the keyless case).
    Broadcast the dimension when it fits; otherwise both sides
    shuffle once on the uniform key.

Both are DuckDB-expressible (lead() window + interval join), so the
tests carry oracle twins like the rest of the relational operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_build(
    changes: DataFrame,
    key_col: str,
    ts_col: str,
    attr_cols: list[str],
    collapse: bool = True,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Change log -> versioned dimension:
    (key, attrs..., valid_from, valid_to, version) with half-open
    validity [valid_from, valid_to); the current version has
    valid_to NULL.

    ``collapse=True`` drops records whose attrs equal the previous
    record's attrs for the key (no-op changes). ``tiebreak_col``
    orders same-timestamp changes deterministically (last one wins
    the interval start; required if the log can carry ts ties --
    without it same-ts ordering is nondeterministic)."""
    order = [F.col(ts_col).asc()]
    if tiebreak_col:
        order.append(F.col(tiebreak_col).asc())
    w = Window.partitionBy(key_col).orderBy(*order)
    df = changes
    if collapse:
        same = F.lit(True)
        for a in attr_cols:
            prev = F.lag(a).over(w)
            same = same & (
                (F.col(a) == prev) | (F.col(a).isNull() & prev.isNull())
            )
        # explicit first-row marker: attr-based lag-NULL detection
        # would misfire when the attr itself is legitimately null
        first = F.lag(F.lit(1)).over(w).isNull()
        df = df.withColumn(
            "_noop", ~first & F.coalesce(same, F.lit(False))
        ).filter(~F.col("_noop")).drop("_noop")
    w2 = Window.partitionBy(key_col).orderBy(*order)
    return df.select(
        key_col,
        *attr_cols,
        F.col(ts_col).alias("valid_from"),
        F.lead(ts_col).over(w2).alias("valid_to"),
        F.row_number().over(w2).alias("version"),
    )


def temporal_join(
    facts: DataFrame,
    dim: DataFrame,
    key_col: str,
    fact_ts_col: str,
    broadcast_dim: bool = True,
    how: str = "inner",
) -> DataFrame:
    """Join each fact to the dimension version valid at the fact's
    own timestamp: equi on the key, residual
    ``valid_from <= ts AND (valid_to IS NULL OR ts < valid_to)``.
    Facts before the key's first version drop (inner) or survive
    with null attrs (``how='left'``). At most ONE version matches
    per fact by construction (intervals partition the timeline)."""
    if how not in ("inner", "left"):
        raise ValueError(f"how must be inner|left, got {how}")
    d = dim.alias("d")
    f_ = facts.alias("f")
    dk = F.col(f"d.{key_col}")
    cond = (
        (F.col(f"f.{key_col}") == dk)
        & (F.col("d.valid_from") <= F.col(f"f.{fact_ts_col}"))
        & (
            F.col("d.valid_to").isNull()
            | (F.col(f"f.{fact_ts_col}") < F.col("d.valid_to"))
        )
    )
    right = F.broadcast(d) if broadcast_dim else d
    dim_cols = [
        F.col(f"d.{c}")
        for c in dim.columns
        if c != key_col
    ]
    return f_.join(right, cond, how).select("f.*", *dim_cols)


# ------------------- materialized dimension + incremental maintenance

_SCD2_META = "_xes_scd2_table_meta.json"
_BUCKET = "_kbucket"
_SEQ = "_change_seq"


def _bucket(key_col: str, bucket_hex: int):
    return F.substring(F.md5(F.col(key_col).cast("string")), 1, bucket_hex)


def write_scd2_table(
    changes: DataFrame,
    path: str,
    key_col: str,
    ts_col: str,
    attr_cols: list[str],
    tiebreak_col: str,
    bucket_hex: int = 2,
) -> None:
    """Materialize the versioned dimension from a full change log,
    hash-bucketed by key (the keyed-table layout of operators/upsert:
    16^bucket_hex balanced directories), parameters stamped in a
    sidecar. The tiebreak value is persisted per version (``_change_
    seq``) so later incremental rebuilds order same-timestamp changes
    exactly as the original build did."""
    from xmidt_event_streams_spark.fsutil import write_json_sidecar

    dim = scd2_build(
        changes.withColumn(_SEQ, F.col(tiebreak_col)),
        key_col, ts_col, attr_cols + [_SEQ], collapse=False,
        tiebreak_col=_SEQ,
    )
    # collapse no-ops on the REAL attrs only (the seq column always
    # differs, so scd2_build's own collapse cannot fire through it)
    dim = _collapse_versions(dim, key_col, attr_cols)
    (
        dim.withColumn(_BUCKET, _bucket(key_col, bucket_hex))
        .write.mode("overwrite")
        .partitionBy(_BUCKET)
        .parquet(path)
    )
    write_json_sidecar(
        changes.sparkSession,
        path,
        _SCD2_META,
        {
            "key_col": key_col,
            "ts_col": ts_col,
            "attr_cols": list(attr_cols),
            "bucket_hex": bucket_hex,
        },
    )


def _collapse_versions(
    dim: DataFrame, key_col: str, attr_cols: list[str]
) -> DataFrame:
    """Drop versions whose attrs equal the previous version's, then
    re-derive valid_to/version -- used when the change log that built
    ``dim`` carried extra ordering columns that defeat scd2_build's
    inline collapse."""
    w = Window.partitionBy(key_col).orderBy("valid_from", _SEQ)
    same = F.lit(True)
    for a in attr_cols:
        prev = F.lag(a).over(w)
        same = same & ((F.col(a) == prev) | (F.col(a).isNull() & prev.isNull()))
    first = F.lag(F.lit(1)).over(w).isNull()
    kept = dim.withColumn(
        "_noop", ~first & F.coalesce(same, F.lit(False))
    ).filter(~F.col("_noop")).drop("_noop")
    w2 = Window.partitionBy(key_col).orderBy("valid_from", _SEQ)
    return kept.select(
        key_col,
        *attr_cols,
        _SEQ,
        "valid_from",
        F.lead("valid_from").over(w2).alias("valid_to"),
        F.row_number().over(w2).alias("version"),
    )


def read_scd2_table(spark, path: str) -> DataFrame:
    """The current versioned dimension (helper columns dropped) --
    feed straight into temporal_join."""
    return spark.read.parquet(path).drop(_BUCKET, _SEQ)


def scd2_apply_changes(spark, path: str, changes: DataFrame) -> dict:
    """Incremental maintenance: fold a batch of change-log rows into
    the materialized dimension, rewriting ONLY the hash buckets whose
    keys the batch touches (bounded cost: |touched buckets| x
    table_size / n_buckets, never the table -- the merge_upsert cost
    argument, adapted to multi-row-per-key version tables).

    Per affected key the versions are REBUILT from (existing versions
    reinterpreted as changes) union (new changes): late-arriving
    changes splice into the middle of history correctly, not just
    append. Replays are idempotent: a re-applied batch contributes
    duplicate identical change rows, which collapse as no-ops.
    foreachBatch-ready (single writer, same posture as the other
    maintenance ops).

    Returns {"keys": n_affected, "buckets": n_rewritten}.
    """
    from xmidt_event_streams_spark.fsutil import read_json_sidecar

    meta = read_json_sidecar(spark, path, _SCD2_META)
    if meta is None:
        raise ValueError(
            f"no scd2 sidecar at {path} (foreign table?): build with "
            "write_scd2_table"
        )
    key_col, ts_col = meta["key_col"], meta["ts_col"]
    attr_cols, bucket_hex = list(meta["attr_cols"]), meta["bucket_hex"]

    keys = changes.select(key_col).distinct()
    buckets = [
        r[0]
        for r in keys.select(
            _bucket(key_col, bucket_hex).alias("b")
        ).distinct().collect()
    ]
    existing = spark.read.parquet(path).filter(F.col(_BUCKET).isin(buckets))
    affected = existing.join(F.broadcast(keys), key_col, "left_semi")
    keep = existing.join(F.broadcast(keys), key_col, "left_anti")

    old_changes = affected.select(
        key_col,
        F.col("valid_from").alias(ts_col),
        *attr_cols,
        F.col(_SEQ),
    )
    # the batch must carry the same tiebreak column the build used --
    # same-timestamp ordering has to match the original build exactly
    if _SEQ not in changes.columns:
        raise ValueError(
            f"changes must carry the '{_SEQ}' tiebreak column "
            "(same-timestamp ordering must match the original build)"
        )
    new_changes = changes.select(key_col, ts_col, *attr_cols, _SEQ)

    merged = old_changes.unionByName(new_changes).dropDuplicates(
        [key_col, ts_col, _SEQ, *attr_cols]
    )
    rebuilt = scd2_build(
        merged, key_col, ts_col, attr_cols + [_SEQ],
        collapse=False, tiebreak_col=_SEQ,
    )
    rebuilt = _collapse_versions(rebuilt, key_col, attr_cols)

    out = keep.drop(_BUCKET).unionByName(rebuilt).withColumn(
        _BUCKET, _bucket(key_col, bucket_hex)
    )
    (
        out.repartition(F.col(_BUCKET))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(_BUCKET)
        .parquet(path)
    )
    return {"keys": keys.count(), "buckets": len(buckets)}
