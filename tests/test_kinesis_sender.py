"""KinesisSender + deliver_batch against a scripted fake that speaks
the AWS PutRecords response shape (FailedRecordCount, per-record
SequenceNumber/ErrorCode). Ports the mock-driven cases from the
reference: internal/sender/kinesis_sender_test.go:227-345 (service
error, throttling, partial failure) and
filter/stream_dispatcher_test.go:239-312 (failover order, give-up).
No boto3 / AWS anywhere -- the client is injected.
"""

from xmidt_event_streams_spark.sinks.writer import (
    DeliveryResult,
    KinesisSender,
    deliver_batch,
)


class FakeKinesisClient:
    """Scripted boto3-kinesis stand-in. ``script`` maps stream name to
    a list of per-call behaviors, consumed in order (last one repeats):
      int n     -> respond with FailedRecordCount=n (first n records
                   get ErrorCode=ProvisionedThroughputExceededException)
      Exception -> raised (transport/service error)
    """

    def __init__(self, script):
        self.script = {k: list(v) for k, v in script.items()}
        self.calls = []  # (stream, n_records)
        self.seen_records = {}  # stream -> delivered records

    def put_records(self, Records, StreamName):
        self.calls.append((StreamName, len(Records)))
        behaviors = self.script.get(StreamName, [0])
        b = behaviors.pop(0) if len(behaviors) > 1 else behaviors[0]
        if isinstance(b, Exception):
            raise b
        failed = int(b)
        out = []
        for i, _r in enumerate(Records):
            if i < failed:
                out.append(
                    {
                        "ErrorCode": "ProvisionedThroughputExceededException",
                        "ErrorMessage": "Rate exceeded",
                    }
                )
            else:
                out.append({"SequenceNumber": str(i), "ShardId": "shard-0"})
        if failed == 0:
            self.seen_records.setdefault(StreamName, []).extend(Records)
        return {"FailedRecordCount": failed, "Records": out}


def _items(n):
    return [(f"session-{i}", f'{{"i": {i}}}') for i in range(n)]


def test_success_encodes_partition_key_and_data():
    fake = FakeKinesisClient({"test-stream": [0]})
    sender = KinesisSender(client=fake)
    res = deliver_batch(_items(3), ("test-stream",), sender)
    assert (res.delivered, res.dropped, res.attempts) == (3, 0, 1)
    recs = fake.seen_records["test-stream"]
    assert recs[0]["PartitionKey"] == "session-0"
    assert isinstance(recs[0]["Data"], bytes)


def test_partial_failure_retries_whole_chunk():
    """FailedRecordCount > 0 counts as failure and the WHOLE chunk is
    retried (K5 at-least-once; kinesis_sender_test.go throttling
    case): second attempt succeeds, duplicates possible by design."""
    fake = FakeKinesisClient({"test-stream": [2, 0]})
    sender = KinesisSender(client=fake)
    res = deliver_batch(_items(5), ("test-stream",), sender)
    assert (res.delivered, res.dropped, res.attempts) == (5, 0, 2)
    # the retry resent all 5 records, not just the 2 failed ones
    assert fake.calls == [("test-stream", 5), ("test-stream", 5)]


def test_service_error_fails_over_to_alt_stream():
    """Persistent service error on the primary exhausts its retries,
    then the alt stream takes the chunk (K4 cascade,
    stream_dispatcher_test.go:239-312)."""
    fake = FakeKinesisClient(
        {
            "primary": [RuntimeError("kinesis service error")],
            "alt": [0],
        }
    )
    sender = KinesisSender(client=fake)
    res = deliver_batch(_items(4), ("primary", "alt"), sender, retries=3)
    assert (res.delivered, res.dropped) == (4, 0)
    assert res.failed_streams == ["primary"]
    assert fake.calls == [("primary", 4)] * 3 + [("alt", 4)]


def test_all_streams_fail_drops_and_accounts():
    fake = FakeKinesisClient(
        {
            "primary": [RuntimeError("err")],
            "alt": [1],  # persistent partial failure
        }
    )
    sender = KinesisSender(client=fake)
    res = deliver_batch(_items(2), ("primary", "alt"), sender, retries=2)
    assert isinstance(res, DeliveryResult)
    assert (res.delivered, res.dropped) == (0, 2)
    assert res.failed_streams == ["primary", "alt"]
    assert res.attempts == 4  # 2 retries x 2 streams


def test_chunking_respects_put_records_limit():
    """K6: 1200 records -> three puts of <= 500 (kinesis.go:27)."""
    fake = FakeKinesisClient({"s": [0]})
    sender = KinesisSender(client=fake)
    res = deliver_batch(_items(1200), ("s",), sender)
    assert res.delivered == 1200
    assert fake.calls == [("s", 500), ("s", 500), ("s", 200)]


def test_recovery_mid_chunks():
    """Throttling on the first chunk only: first chunk retries then
    lands; later chunks go straight through -- per-chunk isolation."""
    fake = FakeKinesisClient({"s": [1, 0]})
    sender = KinesisSender(client=fake)
    res = deliver_batch(_items(700), ("s",), sender)
    assert (res.delivered, res.dropped) == (700, 0)
    assert fake.calls == [("s", 500), ("s", 500), ("s", 200)]


class _FakeClock:
    def __init__(self, t=0.0):
        self.t = t

    def __call__(self):
        return self.t


def test_refreshing_factory_rebuilds_near_expiry():
    """K8 (kinesis.go:115-193, 323-337): the client is cached until
    creds come within the 3-min margin of expiry, then rebuilt from a
    fresh assume-role call."""
    from xmidt_event_streams_spark.sinks.writer import RefreshingClientFactory

    clock = _FakeClock(0.0)
    issued = []

    def provider():
        issued.append(clock.t)
        return {"token": f"tok-{len(issued)}"}, clock.t + 600  # 10-min creds

    built = []

    def build(creds):
        built.append(creds["token"])
        return FakeKinesisClient({"s": [0]})

    fac = RefreshingClientFactory(build, provider, refresh_margin_s=180, clock=clock)
    c0 = fac.get()
    assert built == ["tok-1"]
    clock.t = 100.0
    assert fac.get() is c0  # 500 s left > margin: cached
    clock.t = 421.0  # 179 s left <= 180 margin: refresh
    c1 = fac.get()
    assert c1 is not c0
    assert built == ["tok-1", "tok-2"]
    assert issued == [0.0, 421.0]


def test_refreshing_factory_non_expiring_builds_once():
    from xmidt_event_streams_spark.sinks.writer import RefreshingClientFactory

    clock = _FakeClock(0.0)
    built = []

    def build(creds):
        built.append(1)
        return object()

    fac = RefreshingClientFactory(build, lambda: ({}, None), clock=clock)
    c0 = fac.get()
    clock.t = 1e9
    assert fac.get() is c0 and built == [1]


def test_sender_puts_through_refreshed_client():
    """KinesisSender with a factory picks up the rebuilt client: puts
    before and after expiry land on different clients."""
    from xmidt_event_streams_spark.sinks.writer import RefreshingClientFactory

    clock = _FakeClock(0.0)
    clients = []

    def build(_creds):
        c = FakeKinesisClient({"test-stream": [0]})
        clients.append(c)
        return c

    fac = RefreshingClientFactory(
        build, lambda: ({}, clock.t + 600), refresh_margin_s=180, clock=clock
    )
    sender = KinesisSender(client_factory=fac)
    deliver_batch(_items(2), ("test-stream",), sender)
    clock.t = 500.0  # within margin -> next put rebuilds
    deliver_batch(_items(2), ("test-stream",), sender)
    assert len(clients) == 2
    assert [len(c.seen_records.get("test-stream", [])) for c in clients] == [2, 2]
