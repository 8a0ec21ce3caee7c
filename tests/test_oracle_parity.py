"""Local replica of the driver's correctness gate: run every catalog
query on Spark AND its DuckDB oracle on the same parquet tables;
compare row count, column names, and order-insensitive value content.
"""

from __future__ import annotations

import datetime
import math

import duckdb
import pytest

from xmidt_event_streams_spark.catalog import QUERIES


def _canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # normalize -0.0 and int-valued floats
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return repr(v)
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def _rowset(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_canon(r[i]) for i in idx) for r in rows)


def duck_run(sql: str, sf_dir: str):
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    rows = cur.fetchall()
    con.close()
    return cols, rows


@pytest.mark.parametrize("name", [n for n, s in QUERIES.items() if s.sql])
def test_oracle_parity(spark, sf_dir, name):
    spec = QUERIES[name]
    sdf = spec.fn(spark, sf_dir)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    dcols, drows = duck_run(spec.sql, sf_dir)

    assert sorted(scols) == sorted(dcols), f"{name}: column names differ"
    assert len(srows) == len(drows), (
        f"{name}: row count {len(srows)} (spark) != {len(drows)} (duckdb)"
    )
    sset = _rowset(scols, srows)
    dset = _rowset(dcols, drows)
    if sset != dset:
        diff_s = [r for r in sset if r not in set(map(tuple, dset))][:5]
        diff_d = [r for r in dset if r not in set(map(tuple, sset))][:5]
        raise AssertionError(
            f"{name}: value mismatch.\n spark-only: {diff_s}\n duck-only: {diff_d}"
        )


def test_every_registry_query_ships_an_oracle():
    """Regression guard: the rows-only set (registry queries with no
    DuckDB oracle) reached empty in round 3 and must STAY empty -- a
    new query shipped without an oracle silently downgrades the
    driver's correctness gate to a rows-only check, so fail loudly
    here instead."""
    rows_only = sorted(n for n, s in QUERIES.items() if not s.sql)
    assert rows_only == [], (
        f"registry queries missing oracle_sql: {rows_only} -- every "
        "queries() entry needs a DuckDB oracle twin (see SURVEY.md §5)"
    )


def test_salted_join_matches_plain_join(spark, sf_dir):
    """salted_join must be row-identical to the straight equi-join."""
    from pyspark.sql import functions as F

    from xmidt_event_streams_spark.operators.skew import salted_join
    from xmidt_event_streams_spark.session import load_tables

    t = load_tables(spark, sf_dir, ("orders", "customer"))
    orders = t["orders"].withColumnRenamed("o_custkey", "c_custkey")
    plain = orders.join(t["customer"], ["c_custkey"]).select("o_orderkey", "c_name")
    salted = salted_join(
        orders, t["customer"], ["c_custkey"], salt_from="o_orderkey", n_salts=4
    ).select("o_orderkey", "c_name")
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_join_rejects_small_side_preserving_joins(spark):
    """right/full joins would emit unmatched small rows once per salt
    replica -- plan-time rejection, not silent corruption."""
    import pytest

    from xmidt_event_streams_spark.operators.skew import salted_join

    a = spark.range(10).withColumnRenamed("id", "k")
    b = spark.range(5).withColumnRenamed("id", "k")
    for how in ("right", "full", "outer", "right_outer", "full_outer"):
        with pytest.raises(ValueError, match="salted_join"):
            salted_join(a, b, ["k"], salt_from="k", how=how)
    # safe modes still construct
    for how in ("inner", "left", "left_semi", "left_anti"):
        salted_join(a, b, ["k"], salt_from="k", how=how)


def test_hot_keys_finds_planted_skew(spark):
    """hot_keys must surface a planted zipf-hot key with the right
    fraction, on both the exact and the sampled path."""
    from pyspark.sql import functions as F

    from xmidt_event_streams_spark.operators.skew import hot_keys

    n = 200_000
    df = spark.range(n).select(
        F.when(F.col("id") % 2 == 0, F.lit(0))
        .otherwise(F.pmod(F.xxhash64("id"), 10_000))
        .alias("user_id")
    )
    hot = hot_keys(df, "user_id", min_frac=0.01)
    rows = hot.collect()
    assert rows and rows[0]["user_id"] == 0
    assert abs(rows[0]["frac"] - 0.5) < 0.01
    # every other key is ~1/20000 of the rows: far below the floor
    assert all(r["user_id"] == 0 for r in rows)

    est = hot_keys(df, "user_id", min_frac=0.01, sample_fraction=0.05).collect()
    assert est and est[0]["user_id"] == 0
    assert abs(est[0]["frac"] - 0.5) < 0.05
