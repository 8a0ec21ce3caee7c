"""Bucketed co-located joins: the write-once/join-free layout for
fact-fact joins at 100 TB (operators/bucketing.py).

Proves, on real testdata, that
  * lineitem and orders bucketed on their join keys with equal bucket
    counts join with ZERO shuffle Exchange on either side (the same
    join unbucketed shuffles both sides when broadcast is disabled);
  * the co-located join's result is identical to the plain join;
  * a follow-on groupBy on the bucket key also plans without its own
    exchange (the scan's distribution already satisfies it);
  * equality predicates on the bucket key prune buckets at plan time.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from xmidt_event_streams_spark.operators.bucketing import (
    count_exchanges,
    write_bucketed,
)

N_BUCKETS = 8


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir, tmp_path_factory):
    base = tmp_path_factory.mktemp("bucketed")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    od = spark.read.parquet(f"{sf_dir}/orders.parquet")
    write_bucketed(
        li, "li_b", ["l_orderkey"], N_BUCKETS, path=str(base / "li")
    )
    write_bucketed(
        od, "od_b", ["o_orderkey"], N_BUCKETS, path=str(base / "od")
    )
    yield "li_b", "od_b"
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS od_b")


def test_bucketed_join_has_zero_shuffles(spark, sf_dir, bucketed_tables):
    lt, rt = bucketed_tables
    li, od = spark.table(lt), spark.table(rt)
    # disable broadcast so the comparison is shuffle-join vs bucketed
    # SMJ -- at 100 TB neither fact side is broadcastable anyway
    with _no_broadcast(spark):
        joined = li.join(od, li["l_orderkey"] == od["o_orderkey"])
        assert count_exchanges(joined) == 0, (
            joined._jdf.queryExecution().executedPlan().toString()
        )

        # the identical join over the raw (unbucketed) parquet
        # shuffles both sides
        raw = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        od_raw = spark.read.parquet(f"{sf_dir}/orders.parquet")
        unbucketed = raw.join(
            od_raw, raw["l_orderkey"] == od_raw["o_orderkey"]
        )
        assert count_exchanges(unbucketed) == 2


def test_bucketed_join_matches_plain_join(spark, sf_dir, bucketed_tables):
    lt, rt = bucketed_tables
    li, od = spark.table(lt), spark.table(rt)
    got = (
        li.join(od, li["l_orderkey"] == od["o_orderkey"])
        .groupBy()
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("q"),
        )
        .collect()[0]
    )
    li0 = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    od0 = spark.read.parquet(f"{sf_dir}/orders.parquet")
    want = (
        li0.join(od0, li0["l_orderkey"] == od0["o_orderkey"])
        .groupBy()
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("q"),
        )
        .collect()[0]
    )
    assert (got["n"], got["q"]) == (want["n"], want["q"])


def test_groupby_on_bucket_key_skips_exchange(spark, bucketed_tables):
    lt, _ = bucketed_tables
    agg = spark.table(lt).groupBy("l_orderkey").agg(F.count("*").alias("n"))
    assert count_exchanges(agg) == 0


def test_bucket_pruning_on_key_equality(spark, bucketed_tables):
    # DisableUnnecessaryBucketedScan turns bucketed scans off when no
    # join/agg needs the distribution -- it does not account for
    # bucket PRUNING, so point lookups on the bucket key must pin
    # autoBucketedScan off to read 1/N of the files.
    lt, _ = bucketed_tables
    key = spark.table(lt).select(F.min("l_orderkey")).collect()[0][0]
    conf = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    prev = spark.conf.get(conf)
    spark.conf.set(conf, "false")
    try:
        pruned = spark.table(lt).filter(F.col("l_orderkey") == key)
        plan = pruned._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        assert f"SelectedBucketsCount: 1 out of {N_BUCKETS}" in plan, plan
        assert pruned.count() > 0
    finally:
        spark.conf.set(conf, prev)


class _no_broadcast:
    def __init__(self, spark):
        self.spark = spark

    def __enter__(self):
        self.prev = self.spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        self.spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    def __exit__(self, *exc):
        self.spark.conf.set("spark.sql.autoBroadcastJoinThreshold", self.prev)


def test_count_exchanges_ignores_broadcast_and_reuse(spark):
    """BroadcastExchange and ReusedExchange (incl. a ReusedExchange
    whose description embeds the reused child's 'Exchange
    hashpartitioning' text) must not count as shuffles."""
    agg = (
        spark.range(10_000)
        .select((F.col("id") % 7).alias("g"))
        .groupBy("g")
        .count()
    )
    with _no_broadcast(spark):
        self_join = agg.alias("x").join(agg.alias("y"), "g")
        # one logical shuffle feeds both sides (2 at most if reuse
        # doesn't fire at plan time) -- never 3+, and never counts
        # the broadcastless plan's Reused node twice
        n = count_exchanges(self_join)
        assert 1 <= n <= 2, self_join._jdf.queryExecution().executedPlan().toString()
    dim = spark.range(100).select(
        F.col("id").alias("k"), F.md5(F.col("id").cast("string")).alias("v")
    )
    fact = spark.range(1000).select((F.col("id") % 100).alias("k"))
    bj = fact.join(dim, "k")
    assert count_exchanges(bj) == 0  # broadcast only
