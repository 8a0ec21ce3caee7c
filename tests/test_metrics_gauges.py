"""M4/M5 queue gauges: per-trigger queue_waiting_events /
queue_batch_size via observe() + StreamingQueryListener, mirroring
internal/queue/queue.go:165,195 and internal/metrics/fx.go:44-54.
"""
from tests.streamutil import await_stream

import json

from pyspark.sql import functions as F

from xmidt_event_streams_spark.config import FilterConfig
from xmidt_event_streams_spark.enrich import fix_wrp, valid_msg_type
from xmidt_event_streams_spark.sinks.writer import DirSenderFactory
from xmidt_event_streams_spark.streaming.metrics import (
    GAUGE_BATCH_SIZE,
    GAUGE_WAITING,
    GaugeListener,
    observe_batch_gauges,
)
from xmidt_event_streams_spark.streaming.router import (
    read_wrp_stream,
    start_routing,
)


def _wrp_event(i, dest, session, msg_type=4):
    return {
        "msg_type": msg_type,
        "source": f"mac:{i:012x}",
        "dest": dest,
        "transaction_uuid": f"txn-{i}",
        "content_type": "application/json",
        "session_id": session,
        "partner_ids": ["comcast"],
        "metadata": {"/hw-model": "m1"},
    }


def test_streaming_gauges_listener(spark, tmp_path):
    """A short stream populates both gauges: waiting = trigger input
    rows, batch size = rows that reached the sink stage (here equal:
    the observation sits on the source side of the foreachBatch)."""
    src = tmp_path / "in"
    src.mkdir()
    n = 7
    with open(src / "b1.json", "w") as f:
        for i in range(n):
            f.write(json.dumps(_wrp_event(i, "event:a/x", f"s{i}")) + "\n")

    listener = GaugeListener()
    spark.streams.addListener(listener)
    try:
        q = start_routing(
            read_wrp_stream(spark, str(src)),
            (FilterConfig("all", events=(".*",)),),
            DirSenderFactory(str(tmp_path / "out")),
            checkpoint_dir=str(tmp_path / "ckpt"),
            availableNow=True,
            query_name="gauge-test",
        )
        await_stream(q, 120)

        batch = listener.wait_for(GAUGE_BATCH_SIZE, min_records=1)
        waiting = listener.wait_for(GAUGE_WAITING, min_records=1)
    finally:
        spark.streams.removeListener(listener)

    # M5: the data-carrying trigger submitted exactly n rows
    assert max(r.value for r in batch) == n
    assert all(r.queue_name == "gauge-test" for r in batch)
    # M4: the same trigger saw n rows waiting at the source
    assert max(r.value for r in waiting) == n
    assert all(r.query_name == "gauge-test" for r in waiting)

    # gauges are queryable as a DataFrame
    gdf = listener.to_df(spark)
    got = {
        r["gauge"]: r["mx"]
        for r in gdf.groupBy("gauge").agg(F.max("value").alias("mx")).collect()
    }
    assert got[GAUGE_BATCH_SIZE] == float(n)
    assert got[GAUGE_WAITING] == float(n)


def test_streaming_gauge_tracks_backlog_across_triggers(spark, tmp_path):
    """M4 under backlog (queue.go:165-166 analog): ``numInputRows``
    equals the waiting depth only when the SOURCE caps each trigger.
    Pre-load a 4-file backlog and drain with maxFilesPerTrigger=1:
    the stream runs 4 data triggers, and the waiting gauge reports
    each trigger's drained slice (per-file row count) while the rest
    of the backlog keeps waiting -- one gauge sample per drain, with
    monotonically increasing batch ids, exactly like the reference
    gauge sampled on each queue drain."""
    src = tmp_path / "in"
    src.mkdir()
    sizes = [3, 5, 2, 7]
    for fno, sz in enumerate(sizes):
        with open(src / f"b{fno}.json", "w") as f:
            for i in range(sz):
                f.write(
                    json.dumps(_wrp_event(fno * 100 + i, "event:a/x", f"s{fno}"))
                    + "\n"
                )

    listener = GaugeListener()
    spark.streams.addListener(listener)
    try:
        q = start_routing(
            read_wrp_stream(spark, str(src), max_files_per_trigger=1),
            (FilterConfig("all", events=(".*",)),),
            DirSenderFactory(str(tmp_path / "out")),
            checkpoint_dir=str(tmp_path / "ckpt"),
            availableNow=True,
            query_name="backlog-test",
        )
        await_stream(q, 180)
        waiting = [
            r
            for r in listener.wait_for(GAUGE_WAITING, min_records=len(sizes))
            if r.value > 0
        ]
    finally:
        spark.streams.removeListener(listener)

    # one drain per file; each gauge sample = that drain's depth
    assert sorted(r.value for r in waiting) == sorted(float(s) for s in sizes)
    # drains are successive triggers (distinct, increasing batch ids)
    batch_ids = [r.batch_id for r in sorted(waiting, key=lambda r: r.batch_id)]
    assert len(set(batch_ids)) == len(sizes)
    assert batch_ids == sorted(batch_ids)


def test_streaming_gauge_reflects_validation_drops(spark, tmp_path):
    """Batch-size gauge counts post-validation survivors when the
    observation is placed after the transform (the reference gauge
    measures the queue AFTER ingest-side rejects). The V3 msg_type
    equality predicate additionally pushes down INTO the json scan,
    so the source's own numInputRows (M4) also reports survivors --
    asserting that here pins the pushdown."""
    src = tmp_path / "in"
    src.mkdir()
    rows = [_wrp_event(i, "event:a/x", f"s{i}") for i in range(4)]
    rows.append(_wrp_event(99, "event:a/x", "s99", msg_type=3))  # V3 reject
    with open(src / "b1.json", "w") as f:
        for e in rows:
            f.write(json.dumps(e) + "\n")

    listener = GaugeListener()
    spark.streams.addListener(listener)
    try:
        q = start_routing(
            read_wrp_stream(spark, str(src)),
            (FilterConfig("all", events=(".*",)),),
            DirSenderFactory(str(tmp_path / "out")),
            checkpoint_dir=str(tmp_path / "ckpt"),
            availableNow=True,
            query_name="gauge-drop-test",
            transform=lambda df: fix_wrp(df.filter(valid_msg_type("msg_type"))),
        )
        await_stream(q, 120)
        batch = listener.wait_for(GAUGE_BATCH_SIZE, min_records=1)
        waiting = listener.wait_for(GAUGE_WAITING, min_records=1)
    finally:
        spark.streams.removeListener(listener)

    # observation sits downstream of the V3 filter: 4 survivors
    assert max(r.value for r in batch) == 4
    # the pushed-down V3 predicate makes the scan itself emit 4
    assert max(r.value for r in waiting) == 4


def test_batch_observation_twin(spark):
    """Synchronous batch-side gauge (pyspark Observation)."""
    df = spark.range(123).withColumn("v", F.col("id") * 2)
    observed, obs = observe_batch_gauges(df, name="batch-q")
    assert observed.count() == 123
    assert obs.get[GAUGE_BATCH_SIZE] == 123
