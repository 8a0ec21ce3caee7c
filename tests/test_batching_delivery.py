"""Ports of internal/batch/batch_test.go (chunk arithmetic) and
filter/stream_dispatcher_test.go + internal/sender/kinesis_sender_test.go
(failover order, retry, partial failure) against the Python writer.
"""

from pyspark.sql import functions as F

from xmidt_event_streams_spark.config import FilterConfig
from xmidt_event_streams_spark.operators.batching import assign_batches, chunk_local
from xmidt_event_streams_spark.sinks.writer import (
    DirSenderFactory,
    MemorySender,
    deliver_batch,
    route_and_deliver,
)


class TestChunkArithmetic:
    """batch_test.go:13-114: 0, <n, =n, n+1 cases."""

    def test_empty(self):
        assert chunk_local([], 500) == []

    def test_less_than_batch(self):
        assert chunk_local([1, 2, 3], 500) == [[1, 2, 3]]

    def test_exact_batch(self):
        out = chunk_local(list(range(500)), 500)
        assert len(out) == 1 and len(out[0]) == 500

    def test_one_over(self):
        out = chunk_local(list(range(501)), 500)
        assert [len(c) for c in out] == [500, 1]

    def test_multiple(self):
        out = chunk_local(list(range(1250)), 500)
        assert [len(c) for c in out] == [500, 500, 250]


class TestAssignBatches:
    def test_window_chunking(self, spark):
        df = spark.range(1203).select(
            F.lit("k").alias("g"), F.col("id").alias("i")
        )
        out = assign_batches(df, "g", "i", 500)
        counts = {
            r["batch_no"]: r["n"]
            for r in out.groupBy("batch_no").agg(F.count("*").alias("n")).collect()
        }
        assert counts == {0: 500, 1: 500, 2: 203}


def _items(n):
    return [(f"pk{i}", f"{{\"i\":{i}}}") for i in range(n)]


class TestDelivery:
    def test_happy_path(self):
        s = MemorySender()
        res = deliver_batch(_items(3), ("primary",), s, retries=3, retry_interval_s=0)
        assert res.delivered == 3 and res.dropped == 0
        assert len(s.records["primary"]) == 3

    def test_chunking_500(self):
        s = MemorySender()
        deliver_batch(_items(1001), ("p",), s, retry_interval_s=0)
        assert [n for _, n in s.calls] == [500, 500, 1]

    def test_failover_order(self):
        """stream_dispatcher_test.go:239-312: primary fails -> alts in
        order; delivery to first healthy stream."""
        s = MemorySender(fail_streams={"primary", "alt1"})
        res = deliver_batch(
            _items(2), ("primary", "alt1", "alt2"), s, retries=2, retry_interval_s=0
        )
        assert res.delivered == 2
        assert "alt2" in s.records and "primary" not in s.records
        # primary and alt1 each retried `retries` times before failover
        streams_tried = [st for st, _ in s.calls]
        assert streams_tried == ["primary", "primary", "alt1", "alt1", "alt2"]

    def test_all_fail_drops_and_counts(self):
        """stream_dispatcher.go:69: all streams fail -> batch dropped."""
        s = MemorySender(fail_streams={"p", "a"})
        res = deliver_batch(_items(5), ("p", "a"), s, retries=2, retry_interval_s=0)
        assert res.dropped == 5 and res.delivered == 0
        assert res.failed_streams == ["p", "a"]

    def test_partial_failure_retries_whole_chunk(self):
        """kinesis_sender.go:103-116: FailedRecordCount>0 is an error;
        whole chunk retried (at-least-once)."""
        s = MemorySender(partial_fail_streams={"p"})
        res = deliver_batch(_items(2), ("p", "alt"), s, retries=2, retry_interval_s=0)
        assert res.delivered == 2
        assert len(s.records["alt"]) == 2
        assert [st for st, _ in s.calls] == ["p", "p", "alt"]

    def test_retry_then_recover(self):
        """kinesis_sender_test.go:227-304: transient error recovers
        within the retry budget."""
        s = MemorySender(fail_streams={"p"}, fail_times=1)
        res = deliver_batch(_items(1), ("p",), s, retries=3, retry_interval_s=0)
        assert res.delivered == 1 and res.attempts == 2


class TestRouteAndDeliver:
    def test_batch_fanout_serialize_deliver(self, spark, tmp_path):
        import json

        df = spark.createDataFrame(
            [
                ("event:device-status/m1", "mac:1", "sess-1"),
                ("event:boot-time/m2", "mac:2", "sess-2"),
            ],
            "dest string, source string, session_id string",
        )
        filters = (
            FilterConfig("dev-stream", events=("device-status.*",)),
            FilterConfig("all-stream", events=(".*",)),
        )
        route_and_deliver(df, filters, DirSenderFactory(str(tmp_path)), retry_interval_s=0)
        by_stream = {}
        for d in tmp_path.iterdir():
            for p in d.iterdir():
                with open(p) as f:
                    for line in f:
                        r = json.loads(line)
                        by_stream.setdefault(d.name, []).append(
                            (r["partition_key"], r["data"])
                        )
        assert len(by_stream["dev-stream"]) == 1
        assert len(by_stream["all-stream"]) == 2
        pk, payload = by_stream["dev-stream"][0]
        assert pk == "sess-1"  # K2: partition key = session id
        assert '"dest":"event:device-status/m1"' in payload  # K1 JSON
