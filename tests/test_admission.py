"""V5 admission control (request_handler.go:79-88): shed load beyond
max_outstanding, rejects carry the 503 analog."""

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
    # 100 rows round-robin over 4 partitions -> quota 5 each, 20 admitted
    df = spark.range(100).repartition(4)
    marked = admission_mark(df, max_outstanding=20, mode="best_effort")
    per_part = (
        marked.groupBy(F.spark_partition_id().alias("p"))
        .agg(F.sum(F.col("admitted").cast("int")).alias("a"))
        .collect()
    )
    assert all(r.a <= 5 for r in per_part)  # no partition exceeds its quota
    assert marked.filter("admitted").count() == 20


def test_admission_under_cap_admits_all(spark):
    df = spark.range(50).repartition(4)
    admitted, rejected = admission_control(df, max_outstanding=10_000)
    assert admitted.count() == 50
    assert rejected.count() == 0
