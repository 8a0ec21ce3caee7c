"""Keyed-table MERGE upsert without a table format.

A corpus at 100 TB is not append-only forever: documents get
re-crawled (update), newly discovered (insert), and taken down /
opted out (delete -- a hard requirement for training-data pipelines).
Plain parquet has no MERGE; rewriting 100 TB per maintenance cycle
is not a plan. This module gives parquet a bounded-cost MERGE by
fixing the layout: the table is hash-partitioned into 16^bucket_hex
directories by an md5 prefix of the key (the same balanced-prefix
scheme as the MinHash index, operators/incremental.py), so a merge

  1. computes the buckets the updates touch (<= 256 values, exact,
     from a distinct over the small update set);
  2. reads ONLY those partitions of the target (partition pruning on
     the bucket directory);
  3. anti-joins current rows against update keys (updates win),
     unions the updates, drops tombstoned keys;
  4. dynamically overwrites ONLY the touched partitions.

Cost scales with |updates| x (table_size / n_buckets), never with
the table: a 1%-churn daily merge on 4096 buckets rewrites ~1% of
partitions. Untouched partition files are bit-identical afterwards
(tested), which also preserves their object-store cache/etag state.

Semantics: last-writer-wins per key within the table; the update set
must be key-unique (checked -- a duplicate-key update batch has no
deterministic winner and fails fast rather than nondeterministically).
Deletes are explicit tombstone rows in the update set (``_deleted``
boolean column), applied atomically with the upserts of the same
batch. Single-writer maintenance op, same posture as
compact_minhash_index; replays are idempotent (same inputs -> same
partition contents).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from xmidt_event_streams_spark.fsutil import (
    check_sidecar_params,
    write_json_sidecar,
)

_META = "_xes_keyed_table_meta.json"
_BUCKET = "_kbucket"
DELETED_COL = "_deleted"


def _bucket_expr(key_col: str, bucket_hex: int) -> F.Column:
    return F.substring(F.md5(F.col(key_col).cast("string")), 1, bucket_hex)


def write_keyed_table(
    df: DataFrame, path: str, key_col: str, bucket_hex: int = 2
) -> None:
    """(Re)write the full table in the keyed layout and stamp the
    sidecar. 16^bucket_hex buckets; md5 keys balance them regardless
    of key skew."""
    if df.groupBy(key_col).count().filter("count > 1").limit(1).count():
        raise ValueError(f"table rows must be unique on {key_col}")
    (
        df.withColumn(_BUCKET, _bucket_expr(key_col, bucket_hex))
        .write.mode("overwrite")
        .partitionBy(_BUCKET)
        .parquet(path)
    )
    write_json_sidecar(
        df.sparkSession,
        path,
        _META,
        {"key_col": key_col, "bucket_hex": bucket_hex},
    )


def read_keyed_table(spark: SparkSession, path: str) -> DataFrame:
    # mergeSchema: after an additive-evolution merge (see
    # merge_upsert(allow_new_columns=True)) touched partitions carry
    # the wider schema while untouched ones keep the old; the union
    # schema with nulls for absent columns is exactly the evolved
    # table's contract
    return (
        spark.read.option("mergeSchema", "true").parquet(path).drop(_BUCKET)
    )


def merge_upsert(
    spark: SparkSession,
    path: str,
    updates: DataFrame,
    key_col: str | None = None,
    allow_new_columns: bool = False,
) -> dict:
    """Apply ``updates`` (inserts + replacements + ``_deleted``
    tombstones) to the keyed table at ``path``. Returns a stats dict
    {touched_buckets, upserts, deletes} -- maintenance jobs should
    ledger it, never discard it.

    Schema evolution is ADDITIVE and explicit: with
    ``allow_new_columns=True`` the update set may carry columns the
    table lacks -- kept current rows in touched partitions gain them
    as nulls, untouched partitions stay bit-identical (their readers
    see nulls via mergeSchema -- read_keyed_table's contract). An
    update set may never OMIT an existing table column (a replacement
    row missing a column would silently null stored data) and never
    evolve the schema without the flag; both raise."""
    meta = check_sidecar_params(
        spark,
        path,
        _META,
        {"key_col": key_col} if key_col else {},
        "keyed table",
    )
    if meta is None:
        raise ValueError(
            f"{path} is not a keyed table (missing {_META}); "
            "initialize with write_keyed_table"
        )
    key_col = meta["key_col"]
    bucket_hex = meta["bucket_hex"]

    if updates.groupBy(key_col).count().filter("count > 1").limit(1).count():
        raise ValueError(
            f"update set must be unique on {key_col} (no deterministic "
            "winner for duplicate update keys)"
        )
    has_tombstones = DELETED_COL in updates.columns
    up = updates.withColumn(_BUCKET, _bucket_expr(key_col, bucket_hex))
    if not has_tombstones:
        up = up.withColumn(DELETED_COL, F.lit(False))
    up = up.persist()
    try:
        table_cols = set(
            spark.read.option("mergeSchema", "true").parquet(path).columns
        ) - {_BUCKET}
        update_cols = set(up.columns) - {_BUCKET, DELETED_COL}
        missing = table_cols - update_cols
        if missing:
            raise ValueError(
                f"update set omits existing table columns "
                f"{sorted(missing)}: a replacement row without them "
                "would silently null stored data -- select them "
                "through (or supply their current values)"
            )
        new_cols = update_cols - table_cols
        if new_cols and not allow_new_columns:
            raise ValueError(
                f"update set adds columns {sorted(new_cols)} the table "
                "lacks; pass allow_new_columns=True to evolve the "
                "schema additively"
            )

        touched = [r[0] for r in up.select(_BUCKET).distinct().collect()]
        n_del = up.filter(F.col(DELETED_COL)).count()
        n_ups = up.count() - n_del

        current = (
            spark.read.option("mergeSchema", "true")
            .parquet(path)
            .filter(F.col(_BUCKET).isin(touched))
        )
        keys = up.select(key_col)
        keep = current.join(F.broadcast(keys), key_col, "left_anti")
        # kept current rows gain any new columns as nulls
        # (allowMissingColumns is safe HERE because the omit-existing
        # check above already ruled out data-nulling in the other
        # direction)
        merged = keep.unionByName(
            up.filter(~F.col(DELETED_COL)).drop(DELETED_COL),
            allowMissingColumns=bool(new_cols),
        )
        # localCheckpoint: materialize BEFORE overwriting the
        # partitions the plan reads from (self-overwrite hazard, same
        # as rollup compaction)
        merged = merged.localCheckpoint(eager=True)
        (
            merged.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy(_BUCKET)
            .parquet(path)
        )
        # dynamic overwrite only rewrites partitions PRESENT in the
        # write: a bucket whose every row was tombstoned has no rows
        # in `merged` and must be cleared explicitly
        nonempty = {
            r[0] for r in merged.select(_BUCKET).distinct().collect()
        }
        from xmidt_event_streams_spark.fsutil import delete_path

        cleared = [b for b in touched if b not in nonempty]
        for b in cleared:
            delete_path(spark, f"{path}/{_BUCKET}={b}")
        if cleared:
            # the dynamic overwrite refreshed Spark's file-listing
            # cache, but this raw FS delete did not: without an
            # explicit refresh the next read of the table still lists
            # the deleted bucket's files and fails with
            # FAILED_READ_FILE (caught by the phrase-takedown e2e:
            # a bucket whose only doc was tombstoned)
            spark.catalog.refreshByPath(path)
        return {
            "touched_buckets": sorted(touched),
            "upserts": n_ups,
            "deletes": n_del,
        }
    finally:
        up.unpersist()
