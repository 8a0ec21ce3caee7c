"""End-to-end streaming integration: file source -> validate/enrich ->
route -> per-stream DirSender sinks -> read back and assert (mirrors
the reference's integration pattern: post event, poll Kinesis, match
by session id -- integrationTests/kinesis_test.go:39-62).
"""
from tests.streamutil import await_stream

import json
import os
import time

from pyspark.sql import functions as F

from xmidt_event_streams_spark.config import FilterConfig
from xmidt_event_streams_spark.enrich import fix_wrp, valid_msg_type
from xmidt_event_streams_spark.sinks.writer import DirSenderFactory as _DirSenderFactory
from xmidt_event_streams_spark.streaming.router import read_wrp_stream, start_routing


def _wrp_event(i, dest, session):
    return {
        "msg_type": 4,
        "source": f"mac:{i:012x}",
        "dest": dest,
        "transaction_uuid": f"txn-{i}",
        "content_type": "application/json",
        "session_id": session,
        "partner_ids": ["comcast"],
        "metadata": {"/hw-model": "m1"},
    }


def test_stream_route_deliver_readback(spark, tmp_path):
    src = tmp_path / "in"
    out = tmp_path / "out"
    ckpt = tmp_path / "ckpt"
    src.mkdir()

    events = [
        _wrp_event(1, "event:device-status/mac:1/online", "sess-a"),
        _wrp_event(2, "event:device-status/mac:2/offline", "sess-b"),
        _wrp_event(3, "event:boot-time/mac:3", "sess-c"),
        {**_wrp_event(4, "event:device-status/mac:4/online", "sess-d"), "msg_type": 3},
        {**_wrp_event(5, "event:device-status/mac:5/online", "sess-e"),
         "transaction_uuid": ""},
    ]
    with open(src / "batch1.json", "w") as f:
        for e in events:
            f.write(json.dumps(e) + "\n")

    filters = (
        FilterConfig("device-status-stream", events=("device-status.*",),
                     alt_streams=("device-status-alt",)),
        FilterConfig("boot-stream", events=("boot-time",)),
    )

    def transform(df):
        # V3 validation + V6 enrichment: identical Columns to batch
        return fix_wrp(df.filter(valid_msg_type("msg_type")))

    q = start_routing(
        read_wrp_stream(spark, str(src)),
        filters,
        _DirSenderFactory(str(out)),
        checkpoint_dir=str(ckpt),
        transform=transform,
        availableNow=True,
    )
    await_stream(q, 120)

    def read_stream_dir(stream):
        recs = []
        d = out / stream
        if d.exists():
            for p in d.iterdir():
                with open(p) as f:
                    recs.extend(json.loads(line) for line in f)
        return recs

    dev = read_stream_dir("device-status-stream")
    boot = read_stream_dir("boot-stream")

    # msg_type=3 rejected (V3) -> only events 1,2,5 in device-status
    assert sorted(r["partition_key"] for r in dev) == ["sess-a", "sess-b", "sess-e"]
    assert [r["partition_key"] for r in boot] == ["sess-c"]

    # round-trip payload integrity + enrichment applied
    payloads = {json.loads(r["data"])["session_id"]: json.loads(r["data"]) for r in dev}
    assert payloads["sess-a"]["dest"] == "event:device-status/mac:1/online"
    assert payloads["sess-a"]["transaction_uuid"] == "txn-1"
    # event 5 had empty txn uuid -> fixWrp generated one, tagged reason
    assert payloads["sess-e"]["transaction_uuid"] not in ("", None)
    assert payloads["sess-e"]["fix_reason"] == "empty_uuid"


def test_streaming_incremental_batches(spark, tmp_path):
    """Second micro-batch: checkpoint resumes, no reprocessing of
    already-delivered events (B7 graceful-restart analog)."""
    src = tmp_path / "in"
    out = tmp_path / "out"
    ckpt = tmp_path / "ckpt"
    src.mkdir()
    filters = (FilterConfig("all", events=(".*",)),)

    with open(src / "b1.json", "w") as f:
        f.write(json.dumps(_wrp_event(1, "event:a", "s1")) + "\n")
    q = start_routing(
        read_wrp_stream(spark, str(src)), filters, _DirSenderFactory(str(out)),
        checkpoint_dir=str(ckpt), availableNow=True,
    )
    await_stream(q, 120)

    with open(src / "b2.json", "w") as f:
        f.write(json.dumps(_wrp_event(2, "event:b", "s2")) + "\n")
    q = start_routing(
        read_wrp_stream(spark, str(src)), filters, _DirSenderFactory(str(out)),
        checkpoint_dir=str(ckpt), availableNow=True,
    )
    await_stream(q, 120)

    recs = []
    for p in (out / "all").iterdir():
        with open(p) as f:
            recs.extend(json.loads(line) for line in f)
    assert sorted(r["partition_key"] for r in recs) == ["s1", "s2"]
