"""V5 admission control (request_handler.go:79-88): shed load beyond
max_outstanding, rejects carry the 503 analog."""
from tests.streamutil import await_stream

from pyspark.sql import functions as F

from xmidt_event_streams_spark.operators.admission import (
    REJECT_STATUS,
    admission_control,
    admission_mark,
)


def test_admission_exact_cap_and_order(spark):
    df = spark.range(100).withColumnRenamed("id", "seq")
    admitted, rejected = admission_control(
        df, max_outstanding=30, order_col="seq", mode="exact"
    )
    got = sorted(r.seq for r in admitted.collect())
    assert got == list(range(30))  # ascending order wins, to the row
    rej = rejected.collect()
    assert len(rej) == 70
    assert {r.reject_status for r in rej} == {REJECT_STATUS}


def test_admission_best_effort_quota(spark):
    # 100 rows round-robin over 4 partitions, n_shards=4 -> quota 5
    # each, 20 admitted
    df = spark.range(100).repartition(4)
    marked = admission_mark(df, max_outstanding=20, mode="best_effort", n_shards=4)
    per_part = (
        marked.groupBy(F.spark_partition_id().alias("p"))
        .agg(F.sum(F.col("admitted").cast("int")).alias("a"))
        .collect()
    )
    assert all(r.a <= 5 for r in per_part)  # no partition exceeds its quota
    assert marked.filter("admitted").count() == 20


def test_admission_best_effort_default_shards(spark):
    # batch default: n_shards = the ACTUAL partition count, so the
    # per-partition quota is ceil(cap / num_partitions) and the
    # aggregate cap is exact (within per-partition rounding)
    df = spark.range(10_000).repartition(4)
    marked = admission_mark(df, max_outstanding=64, mode="best_effort")
    quota = -(-64 // 4)
    per_part = (
        marked.groupBy(F.spark_partition_id().alias("p"))
        .agg(F.sum(F.col("admitted").cast("int")).alias("a"))
        .collect()
    )
    assert all(r.a <= quota for r in per_part)
    assert marked.filter("admitted").count() <= quota * 4


def test_admission_best_effort_streaming(spark, tmp_path):
    # the reference semantic (ingress shedding) is inherently
    # streaming: admission_mark must build and run on a streaming DF
    # without any RDD plan conversion (admission.py:71 regression).
    src = tmp_path / "in"
    src.mkdir()
    spark.range(100).repartition(2).write.mode("overwrite").parquet(str(src))
    stream = spark.readStream.schema("id long").parquet(str(src))
    marked = admission_mark(stream, max_outstanding=8, mode="best_effort", n_shards=2)
    assert marked.isStreaming
    out = tmp_path / "out"
    ckpt = tmp_path / "ckpt"
    q = (
        marked.writeStream.format("parquet")
        .option("path", str(out))
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
    )
    await_stream(q, 120)
    res = spark.read.parquet(str(out))
    assert res.count() == 100  # every row marked, none dropped
    # quota = ceil(8/2) = 4 per task partition: per-partition quota
    # math is covered by the batch tests; here the contract is that
    # the stream ran, every row got a verdict, and some were admitted
    admitted = res.filter("admitted").count()
    assert admitted >= 1
    assert res.filter("NOT admitted").count() == 100 - admitted


def test_admission_under_cap_admits_all(spark):
    df = spark.range(50).repartition(4)
    admitted, rejected = admission_control(df, max_outstanding=10_000)
    assert admitted.count() == 50
    assert rejected.count() == 0


def test_batch_quota_exact_with_many_partitions(spark):
    """Batch inputs derive the shard count from the ACTUAL partition
    count: with more partitions than defaultParallelism the aggregate
    admitted total must still respect max_outstanding (the r3 default
    overshot by partitions/parallelism)."""
    from xmidt_event_streams_spark.operators.admission import admission_mark

    n_parts = spark.sparkContext.defaultParallelism * 4
    df = spark.range(0, 10_000).repartition(n_parts)
    marked = admission_mark(df, max_outstanding=1_000, mode="best_effort")
    admitted = marked.filter("admitted").count()
    # quota = ceil(1000 / n_parts); aggregate <= quota * n_parts,
    # which is within one-per-partition rounding of the cap
    assert admitted <= 1_000 + n_parts
    assert admitted >= 1_000 - n_parts
