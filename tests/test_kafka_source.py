"""Kafka source adapter: the decode path is fully testable against
Kafka-SHAPED frames (the connector jar is only needed by the thin
reader, which is asserted to fail with actionable guidance here)."""

import pytest
from pyspark.sql import functions as F

from xmidt_event_streams_spark.sources.kafka import (
    decode_kafka_records,
    kafka_wrp_stream,
)
from xmidt_event_streams_spark.sources.msgpack_wrp import msgpack_encode

KAFKA_SHAPE = (
    "key binary, value binary, topic string, partition int, offset long, "
    "timestamp timestamp, timestampType int"
)


def _wrp(i: int) -> dict:
    return {
        "msg_type": 4,
        "source": f"mac:112233445{i:03x}/emu",
        "dest": "event:device-status/foo",
        "transaction_uuid": f"txn-{i}",
        "content_type": "application/json",
        "partner_ids": ["comcast"],
        "metadata": {"/trust": "0"},
        "payload": b'{"ts":"2021-01-01T00:00:00Z"}',
    }


def _kafka_frame(spark, values, partition=0):
    rows = [
        (None, v, "wrp-events", partition, i, None, 0)
        for i, v in enumerate(values)
    ]
    return spark.createDataFrame(rows, KAFKA_SHAPE)


def test_decode_msgpack_records_with_provenance(spark):
    vals = [bytearray(msgpack_encode(_wrp(i))) for i in range(3)]
    df = _kafka_frame(spark, vals)
    out = decode_kafka_records(df, value_format="msgpack")
    rows = sorted(out.collect(), key=lambda r: r["offset"])
    assert [r["transaction_uuid"] for r in rows] == ["txn-0", "txn-1", "txn-2"]
    assert all(r["msg_type"] == 4 and r["decode_error"] is None for r in rows)
    # provenance rides along: the audit trail to the exact record
    assert [(r["topic"], r["partition"], r["offset"]) for r in rows] == [
        ("wrp-events", 0, 0),
        ("wrp-events", 0, 1),
        ("wrp-events", 0, 2),
    ]


def test_decode_msgpack_malformed_record_contained(spark):
    vals = [
        bytearray(msgpack_encode(_wrp(0))),
        bytearray(b"\xc1 not msgpack"),  # 0xc1 is the never-used byte
    ]
    out = decode_kafka_records(_kafka_frame(spark, vals))
    rows = sorted(out.collect(), key=lambda r: r["offset"])
    assert rows[0]["decode_error"] is None
    assert rows[1]["msg_type"] == -1 and rows[1]["decode_error"]
    assert rows[1]["offset"] == 1  # the reject is traceable to its offset


def test_decode_json_records(spark):
    import json

    vals = [
        bytearray(json.dumps({k: v for k, v in _wrp(0).items() if k != "payload"}).encode()),
        bytearray(b"{ not json"),
    ]
    out = decode_kafka_records(_kafka_frame(spark, vals), value_format="json")
    rows = sorted(out.collect(), key=lambda r: r["offset"])
    assert rows[0]["transaction_uuid"] == "txn-0"
    assert rows[1]["msg_type"] is None and rows[1]["decode_error"] == "invalid json"


def test_decode_rejects_unknown_format(spark):
    with pytest.raises(ValueError, match="value_format"):
        decode_kafka_records(_kafka_frame(spark, []), value_format="avro")


def test_reader_raises_actionable_error_without_connector(spark):
    """This container has no spark-sql-kafka jar: the thin reader must
    fail with packaging guidance, not a bare ClassNotFound."""
    with pytest.raises(RuntimeError, match="--packages"):
        kafka_wrp_stream(spark, "broker:9092", "wrp-events")


def test_decoded_stream_feeds_routing(spark):
    """The decoded frame drops straight into the routing plan (the
    production composition: kafka -> decode -> validate -> route)."""
    from xmidt_event_streams_spark.enrich import extract_event_type

    vals = [bytearray(msgpack_encode(_wrp(i))) for i in range(2)]
    decoded = decode_kafka_records(_kafka_frame(spark, vals))
    routed = decoded.withColumn("event_type", extract_event_type())
    assert routed.select("event_type").distinct().collect()[0][0] == "device-status"
