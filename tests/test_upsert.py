"""Keyed-table MERGE upsert (operators/upsert.py): insert/update/
delete semantics, untouched-partition immutability, idempotence,
empty-bucket clearing, and the duplicate-key / foreign-table guards."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from xmidt_event_streams_spark.operators.upsert import (
    DELETED_COL,
    merge_upsert,
    read_keyed_table,
    write_keyed_table,
)

SCHEMA = "doc_id long, text string"


def _table(spark, tmp_path, rows):
    path = str(tmp_path / "tbl")
    write_keyed_table(
        spark.createDataFrame(rows, SCHEMA), path, "doc_id", bucket_hex=1
    )
    return path


def _snapshot(spark, path):
    return {
        r["doc_id"]: r["text"] for r in read_keyed_table(spark, path).collect()
    }


def _file_states(path):
    return {
        f: os.stat(f).st_mtime_ns
        for f in glob.glob(f"{path}/_kbucket=*/*.parquet")
    }


def test_insert_update_delete(spark, tmp_path):
    path = _table(spark, tmp_path, [(i, f"v{i}") for i in range(20)])
    updates = spark.createDataFrame(
        [(5, "v5-new", False), (100, "v100", False), (7, None, True)],
        f"doc_id long, text string, {DELETED_COL} boolean",
    )
    stats = merge_upsert(spark, path, updates)
    got = _snapshot(spark, path)
    assert got[5] == "v5-new"  # update
    assert got[100] == "v100"  # insert
    assert 7 not in got  # delete
    assert got[3] == "v3"  # untouched
    assert len(got) == 20  # 20 - 1 delete + 1 insert
    assert stats["upserts"] == 2 and stats["deletes"] == 1


def test_untouched_partitions_not_rewritten(spark, tmp_path):
    path = _table(spark, tmp_path, [(i, f"v{i}") for i in range(200)])
    before = _file_states(path)
    updates = spark.createDataFrame([(5, "new")], SCHEMA)
    stats = merge_upsert(spark, path, updates)
    assert len(stats["touched_buckets"]) == 1
    after = _file_states(path)
    changed_dirs = {
        os.path.dirname(f)
        for f in set(before) ^ set(after)
        | {f for f in before.keys() & after.keys() if before[f] != after[f]}
    }
    want_dir = {
        os.path.dirname(f)
        for f in after
        if f"_kbucket={stats['touched_buckets'][0]}" in f
    }
    assert changed_dirs == want_dir  # exactly the touched bucket


def test_merge_is_idempotent(spark, tmp_path):
    path = _table(spark, tmp_path, [(i, f"v{i}") for i in range(20)])
    updates = spark.createDataFrame(
        [(1, "x", False), (2, None, True)],
        f"doc_id long, text string, {DELETED_COL} boolean",
    )
    merge_upsert(spark, path, updates)
    snap = _snapshot(spark, path)
    merge_upsert(spark, path, updates)  # replay
    assert _snapshot(spark, path) == snap


def test_fully_tombstoned_bucket_is_cleared(spark, tmp_path):
    # bucket_hex=1 -> 16 buckets; tombstone EVERY key of one bucket
    rows = [(i, f"v{i}") for i in range(64)]
    path = _table(spark, tmp_path, rows)
    df = spark.createDataFrame(rows, SCHEMA).withColumn(
        "b", F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1)
    )
    target_bucket = df.select("b").first()[0]
    doomed = [r["doc_id"] for r in df.filter(F.col("b") == target_bucket).collect()]
    updates = spark.createDataFrame(
        [(d, None, True) for d in doomed],
        f"doc_id long, text string, {DELETED_COL} boolean",
    )
    merge_upsert(spark, path, updates)
    got = _snapshot(spark, path)
    assert not set(doomed) & set(got)
    assert len(got) == 64 - len(doomed)
    assert not glob.glob(f"{path}/_kbucket={target_bucket}/*.parquet")


def test_guards(spark, tmp_path):
    path = _table(spark, tmp_path, [(1, "a"), (2, "b")])
    dup = spark.createDataFrame([(1, "x"), (1, "y")], SCHEMA)
    with pytest.raises(ValueError, match="unique on doc_id"):
        merge_upsert(spark, path, dup)
    with pytest.raises(ValueError, match="was built with"):
        merge_upsert(
            spark, path, spark.createDataFrame([(1, "x")], SCHEMA),
            key_col="text",
        )
    plain = str(tmp_path / "plain")
    spark.createDataFrame([(1, "a")], SCHEMA).write.parquet(plain)
    with pytest.raises(ValueError, match="not a keyed table"):
        merge_upsert(
            spark, plain, spark.createDataFrame([(1, "x")], SCHEMA)
        )


def test_additive_schema_evolution(spark, tmp_path):
    """allow_new_columns=True: updates carry a column the table lacks.
    Touched partitions rewrite with the wider schema; untouched
    partition FILES stay bit-identical and their rows read back with
    nulls via mergeSchema -- additive evolution without a table
    rewrite."""
    path = _table(spark, tmp_path, [(i, f"v{i}") for i in range(200)])
    before = _file_states(path)
    updates = spark.createDataFrame(
        [(5, "v5-new", 0.9), (1000, "v1000", 0.5)],
        "doc_id long, text string, quality double",
    )
    stats = merge_upsert(spark, path, updates, allow_new_columns=True)
    back = {
        r["doc_id"]: (r["text"], r["quality"])
        for r in read_keyed_table(spark, path).collect()
    }
    assert back[5] == ("v5-new", 0.9)
    assert back[1000] == ("v1000", 0.5)
    assert back[3][1] is None  # pre-evolution row: null quality
    assert len(back) == 201
    # untouched partitions: same files, byte-for-byte mtimes
    touched_dirs = {f"_kbucket={b}" for b in stats["touched_buckets"]}
    after = _file_states(path)
    for f in before:
        if not any(d in f for d in touched_dirs):
            assert after.get(f) == before[f]


def test_schema_evolution_requires_flag(spark, tmp_path):
    path = _table(spark, tmp_path, [(i, f"v{i}") for i in range(10)])
    updates = spark.createDataFrame(
        [(5, "x", 1.0)], "doc_id long, text string, quality double"
    )
    with pytest.raises(ValueError, match="allow_new_columns"):
        merge_upsert(spark, path, updates)


def test_update_omitting_existing_column_refused(spark, tmp_path):
    """A replacement row missing a stored column would null data on
    that key -- refused loudly, with or without the evolution flag."""
    path = _table(spark, tmp_path, [(i, f"v{i}") for i in range(10)])
    updates = spark.createDataFrame([(5,)], "doc_id long")
    with pytest.raises(ValueError, match="omits existing table columns"):
        merge_upsert(spark, path, updates)
    with pytest.raises(ValueError, match="omits existing table columns"):
        merge_upsert(spark, path, updates, allow_new_columns=True)
