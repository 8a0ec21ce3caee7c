"""run_maintenance: one window, three compactor kinds, one report;
a failing target records its error without stopping the rest."""

from __future__ import annotations

from pyspark.sql import functions as F

from xmidt_event_streams_spark.maintenance import run_maintenance


def test_all_kinds_in_one_window(spark, tmp_path):
    from xmidt_event_streams_spark.operators.incremental import (
        append_to_minhash_index,
        write_minhash_index,
    )
    from xmidt_event_streams_spark.streaming.ingest_dedup import (
        idempotent_batch_append,
    )
    from xmidt_event_streams_spark.streaming.rollup import (
        read_rollup,
        rollup_partial,
    )

    # ingest sink with 5 tiny batch partitions
    sink = str(tmp_path / "sink")
    for b in range(5):
        idempotent_batch_append(
            spark.createDataFrame([(b, f"d{b}")], "doc_id long, text string"),
            b, sink, max_files=1,
        )
    # minhash index with a replay-duplicated append
    index = str(tmp_path / "index")
    docs = spark.createDataFrame(
        [(i, f"document number {i} with words to shingle here. " * 3)
         for i in range(4)],
        "doc_id long, text string",
    )
    write_minhash_index(docs, index)
    append_to_minhash_index(docs.filter("doc_id = 0"), index)  # dup rows
    # rollup with 3 partials
    roll = str(tmp_path / "roll")
    m = {"n": ("count", "v")}
    for b in range(3):
        idempotent_batch_append(
            rollup_partial(
                spark.createDataFrame([("a", 1.0)], "k string, v double"),
                ["k"], m,
            ),
            b, roll, max_files=1,
        )

    report = run_maintenance(
        spark,
        ingest_sinks=(sink,),
        minhash_indexes=(index,),
        rollups=((roll, ["k"], m),),
        batches_per_partition=10,
    )
    assert report[sink]["kind"] == "ingest_sink" and "error" not in report[sink]
    assert report[index]["kind"] == "minhash_index" and "error" not in report[index]
    assert report[roll]["kind"] == "rollup" and "error" not in report[roll]
    # the compacted state still answers correctly
    assert spark.read.parquet(sink).count() == 5
    assert read_rollup(spark, roll, ["k"], m).collect()[0]["n"] == 3


def test_failing_target_is_isolated(spark, tmp_path):
    from xmidt_event_streams_spark.streaming.ingest_dedup import (
        idempotent_batch_append,
    )

    good = str(tmp_path / "good")
    idempotent_batch_append(
        spark.createDataFrame([(1, "x")], "doc_id long, text string"),
        0, good, max_files=1,
    )
    bad = str(tmp_path / "missing")  # nothing there
    report = run_maintenance(spark, ingest_sinks=(bad, good))
    assert "error" in report[bad]
    assert "error" not in report[good]
