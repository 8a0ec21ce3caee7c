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


def test_ivf_drift_target_reports_verdict(spark, tmp_path):
    from xmidt_event_streams_spark.maintenance import run_maintenance
    from xmidt_event_streams_spark.operators.ivf import write_ivf_index
    from xmidt_event_streams_spark.operators.similarity import (
        deterministic_planes,
    )

    idx = tmp_path / "ivf"
    cents = deterministic_planes(4, 8, seed="maint")
    vecs = spark.createDataFrame(
        [(i, [((i * (d + 3)) % 17) / 17.0 + 0.05 for d in range(8)])
         for i in range(32)],
        "vec_id long, embedding array<double>",
    )
    write_ivf_index(vecs, str(idx), cents)
    report = run_maintenance(spark, ivf_indexes=(str(idx),))
    entry = report[str(idx)]
    assert entry["kind"] == "ivf_drift"
    assert entry["verdict"] == "stable" and "error" not in entry
    # read-only: a second check still sees the same baseline
    report2 = run_maintenance(spark, ivf_indexes=(str(idx),))
    assert report2[str(idx)]["psi"] == entry["psi"]
