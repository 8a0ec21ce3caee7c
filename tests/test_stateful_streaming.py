"""Stateful streaming: hybrid size/time flush (B2/B3 parity via
applyInPandasWithState), watermark late-data policy, and
dropDuplicatesWithinWatermark (the §2.8 at-least-once fix)."""
from tests.streamutil import await_stream, drain_and_stop

import json
import time

from pyspark.sql import functions as F

from xmidt_event_streams_spark.streaming.stateful import hybrid_flush


def _write_items(path, items):
    with open(path, "w") as f:
        for it in items:
            f.write(json.dumps(it) + "\n")


def _read_stream(spark, src, schema):
    return spark.readStream.schema(schema).json(str(src))


def _run_available_now(df, ckpt, out_rows):
    q = (
        df.writeStream.outputMode("append")
        .foreachBatch(lambda b, _i: out_rows.extend(b.collect()))
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
    )
    await_stream(q, 120)


def _run_flush(df, ckpt, out_rows, expect_rows):
    """hybrid_flush variant of _run_available_now: ProcessingTime-
    timeout operators never self-terminate (shouldRunAnotherBatch is
    always true -- Spark spins state-cleanup batches even under
    availableNow), so wait for the expected flush rows and stop."""
    q = (
        df.writeStream.outputMode("append")
        .foreachBatch(lambda b, _i: out_rows.extend(b.collect()))
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
    )
    drain_and_stop(q, lambda: len(out_rows) >= expect_rows, 120)


def _run_stateful(df, ckpt, out_rows, expect_rows, max_wait=60.0):
    """For stateful-timeout queries: neither availableNow nor
    processAllAvailable terminates while a processing-time timeout is
    pending (Spark spins empty micro-batches until it fires). Poll
    the collected output until ``expect_rows`` arrive (or the
    deadline), then stop the query."""
    q = (
        df.writeStream.outputMode("append")
        .foreachBatch(lambda b, _i: out_rows.extend(b.collect()))
        .option("checkpointLocation", str(ckpt))
        .start()
    )
    deadline = time.time() + max_wait
    while time.time() < deadline and len(out_rows) < expect_rows:
        time.sleep(0.3)
    q.stop()
    await_stream(q, 60)


def test_hybrid_flush_size_arm(spark, tmp_path):
    """5 items, batch_size=2 -> two 'size' flushes, 1 item held in
    state (no time flush yet)."""
    src = tmp_path / "in"
    src.mkdir()
    _write_items(
        src / "b1.json",
        [{"stream_name": "s1", "item": f"m{i}"} for i in range(5)],
    )
    stream = _read_stream(spark, src, "stream_name string, item string")
    out: list = []
    _run_stateful(
        hybrid_flush(stream, batch_size=2, time_limit_ms=60_000),
        tmp_path / "ckpt",
        out,
        expect_rows=2,
    )
    assert [(r.n, r.flush_reason) for r in out] == [(2, "size"), (2, "size")]
    assert sorted(x for r in out for x in r["items"]) == ["m0", "m1", "m2", "m3"]


def test_hybrid_flush_time_arm(spark, tmp_path):
    """An under-sized buffer flushes via ProcessingTimeTimeout once
    the key goes idle past the limit (the 15 s-ticker analog,
    queue.go:169-172): flush_reason 'time' proves the size arm never
    triggered for it."""
    src = tmp_path / "in"
    src.mkdir()
    _write_items(src / "b1.json", [{"stream_name": "s1", "item": "m0"}])
    schema = "stream_name string, item string"
    out: list = []
    _run_stateful(
        hybrid_flush(
            _read_stream(spark, src, schema), batch_size=10, time_limit_ms=500
        ),
        tmp_path / "ckpt",
        out,
        expect_rows=1,
        max_wait=45.0,
    )
    assert [(r.stream_name, r.n, r.flush_reason) for r in out] == [("s1", 1, "time")]
    assert out[0]["items"] == ["m0"]


def test_hybrid_flush_idle_arm(spark, tmp_path):
    """B4 SubmitOnEmptyQueue (queue.go:209-216; spec
    queue_test.go:444-483): batch_size=10 but a single arrival flushes
    immediately once the channel drains -- reason 'idle', no state
    held (state.remove() after the flush, proving nothing is
    buffered)."""
    src = tmp_path / "in"
    src.mkdir()
    _write_items(src / "b1.json", [{"stream_name": "s1", "item": "m0"}])
    stream = _read_stream(spark, src, "stream_name string, item string")
    out: list = []
    _run_flush(
        hybrid_flush(
            stream, batch_size=10, time_limit_ms=60_000,
            submit_on_empty_queue=True,
        ),
        tmp_path / "ckpt",
        out,
        expect_rows=1,
    )
    assert [(r.stream_name, r.n, r.flush_reason) for r in out] == [("s1", 1, "idle")]
    assert out[0]["items"] == ["m0"]


def test_hybrid_flush_idle_after_size(spark, tmp_path):
    """B4 composes with B2: 5 items at batch_size=2 emit two full
    'size' batches and the drained remainder as 'idle' (the reference
    drains the channel one item at a time, submitting a full batch
    whenever reached, then the leftovers when empty)."""
    src = tmp_path / "in"
    src.mkdir()
    _write_items(
        src / "b1.json",
        [{"stream_name": "s1", "item": f"m{i}"} for i in range(5)],
    )
    stream = _read_stream(spark, src, "stream_name string, item string")
    out: list = []
    _run_flush(
        hybrid_flush(
            stream, batch_size=2, time_limit_ms=60_000,
            submit_on_empty_queue=True,
        ),
        tmp_path / "ckpt",
        out,
        expect_rows=3,
    )
    assert [(r.n, r.flush_reason) for r in out] == [
        (2, "size"), (2, "size"), (1, "idle")
    ]
    assert sorted(x for r in out for x in r["items"]) == [f"m{i}" for i in range(5)]


class _FakeState:
    """Deterministic GroupState stand-in for unit-pinning the flush
    handler: records update()/setTimeoutDuration()/remove() calls and
    serves a scripted processing-time clock. The real GroupState's
    surface used by the handler is exists/get/getCurrentProcessing-
    TimeMs/hasTimedOut/update/setTimeoutDuration/remove -- nothing
    else."""

    def __init__(self, now_ms, value=None, timed_out=False):
        self._now = now_ms
        self._value = value
        self.hasTimedOut = timed_out
        self.timeout_set = None
        self.removed = False

    @property
    def exists(self):
        return self._value is not None

    @property
    def get(self):
        return self._value

    def getCurrentProcessingTimeMs(self):
        return self._now

    def update(self, value):
        self._value = value

    def setTimeoutDuration(self, ms):
        self.timeout_set = ms

    def remove(self):
        self._value, self.removed = None, True


def _drive(handler, state, items):
    import pandas as pd

    pdfs = iter([pd.DataFrame({"item": items})]) if items else iter([])
    return list(handler(("s1",), pdfs, state))


def test_hybrid_flush_timer_anchored_at_first_item():
    """B3 divergence pin, deterministic: a later arrival must NOT
    reset the flush clock. The semantic lives entirely in what the
    handler passes to setTimeoutDuration, so a fake GroupState with a
    scripted clock observes it exactly -- the previous wall-clock e2e
    discriminator (fire at ~t0+limit vs >= t0+gap+limit) was
    box-sensitive: it needed micro-batch latency below the arrival
    gap, flaked at a 3 s gap under full-suite load, was widened to
    6.5 s in r8, and a contended host still blew past that (+28.4 s
    measured in the r10 continuation, beyond BOTH semantics'
    predictions -- pure scheduler latency, no signal)."""
    from xmidt_event_streams_spark.streaming.stateful import (
        _make_flush_handler,
    )

    handler = _make_flush_handler(
        item_col="item", batch_size=10, time_limit_ms=10_000,
        submit_on_empty_queue=False, queue_size=None,
    )
    # first item folds at t=1000: full interval armed
    st = _FakeState(now_ms=1_000)
    assert _drive(handler, st, ["m0"]) == []
    assert st.timeout_set == 10_000
    buffered, _, first_ms, _ = st.get
    assert (list(buffered), first_ms) == (["m0"], 1_000)
    # second item folds 6.5 s later: the clock does NOT reset -- the
    # timer re-arms with the REMAINDER of the first item's interval
    # (reset-on-arrival semantics would arm a fresh 10_000 here)
    st._now = 7_500
    assert _drive(handler, st, ["m1"]) == []
    assert st.timeout_set == 3_500, (
        f"timer re-armed with {st.timeout_set} ms -- anchored "
        "semantics require the remainder (10000 - 6500)"
    )
    buffered, _, first_ms, _ = st.get
    assert (list(buffered), first_ms) == (["m0", "m1"], 1_000)
    # the timeout fires: both items flush as one 'time' batch and the
    # state is torn down
    st._now = 11_000
    st.hasTimedOut = True
    [out] = _drive(handler, st, [])
    assert out["flush_reason"].tolist() == ["time"]
    assert sorted(out["items"][0]) == ["m0", "m1"]
    assert st.removed and not st.exists


def test_hybrid_flush_timer_floor_when_overdue():
    """An item already past its limit when the handler next runs
    (e.g. a stalled micro-batch) re-arms with the 1 ms floor, not a
    zero/negative duration (setTimeoutDuration rejects <= 0)."""
    from xmidt_event_streams_spark.streaming.stateful import (
        _make_flush_handler,
    )

    handler = _make_flush_handler(
        item_col="item", batch_size=10, time_limit_ms=10_000,
        submit_on_empty_queue=False, queue_size=None,
    )
    st = _FakeState(now_ms=1_000)
    _drive(handler, st, ["m0"])
    st._now = 20_000  # 9 s overdue, but not via hasTimedOut
    _drive(handler, st, ["m1"])
    assert st.timeout_set == 1


def test_hybrid_flush_time_fires_e2e(spark, tmp_path):
    """B3 e2e smoke on the REAL state store: a sub-batch-size buffer
    flushes as 'time' without further arrivals (the semantics pin --
    anchored, not reset -- is the deterministic unit test above; this
    only asserts the wired-up operator fires at all, so it carries no
    load-sensitive geometry)."""
    src = tmp_path / "in"
    src.mkdir()
    _write_items(src / "b1.json", [{"stream_name": "s1", "item": "m0"}])
    stream = _read_stream(spark, src, "stream_name string, item string")
    out: list = []
    t0 = time.time()
    q = (
        hybrid_flush(stream, batch_size=10, time_limit_ms=3_000)
        .writeStream.outputMode("append")
        .foreachBatch(lambda b, _i: out.extend(b.collect()))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        deadline = t0 + 90.0
        while time.time() < deadline and not out:
            time.sleep(0.2)
    finally:
        q.stop()
        await_stream(q, 60)
    assert out, "time flush never fired"
    assert out[0]["flush_reason"] == "time"
    assert out[0]["items"] == ["m0"]


def test_hybrid_flush_drop_on_full(spark, tmp_path):
    """B1 bounded buffer (MyQueue.AddItem, queue.go:133-140): capacity
    3, five arrivals -> the two overflow items are dropped (newest
    shed, matching AddItem rejecting the arrival) and counted on the
    output row as dropped_total."""
    src = tmp_path / "in"
    src.mkdir()
    _write_items(
        src / "b1.json",
        [{"stream_name": "s1", "item": f"m{i}"} for i in range(5)],
    )
    stream = _read_stream(spark, src, "stream_name string, item string")
    out: list = []
    _run_flush(
        hybrid_flush(
            stream, batch_size=10, time_limit_ms=60_000,
            submit_on_empty_queue=True, queue_size=3,
        ),
        tmp_path / "ckpt",
        out,
        expect_rows=1,
    )
    assert [(r.n, r.flush_reason, r.dropped_total) for r in out] == [(3, "idle", 2)]
    assert out[0]["items"] == ["m0", "m1", "m2"]


def test_hybrid_flush_drop_counter_cumulative(spark, tmp_path):
    """The B1 drop counter is a per-key cumulative gauge (the M2
    queue_full metric twin): drops in a later micro-batch add to the
    checkpointed count rather than resetting it."""
    src = tmp_path / "in"
    src.mkdir()
    _write_items(
        src / "b1.json",
        [{"stream_name": "s1", "item": f"a{i}"} for i in range(5)],
    )
    stream = (
        spark.readStream.schema("stream_name string, item string")
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    out: list = []
    q = (
        hybrid_flush(
            stream, batch_size=10, time_limit_ms=60_000,
            submit_on_empty_queue=True, queue_size=3,
        )
        .writeStream.outputMode("append")
        .foreachBatch(lambda b, _i: out.extend(b.collect()))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        deadline = time.time() + 60
        while time.time() < deadline and len(out) < 1:
            time.sleep(0.2)
        _write_items(
            src / "b2.json",
            [{"stream_name": "s1", "item": f"b{i}"} for i in range(4)],
        )
        while time.time() < deadline and len(out) < 2:
            time.sleep(0.2)
    finally:
        q.stop()
        await_stream(q, 60)
    assert [(r.n, r.dropped_total) for r in out] == [(3, 2), (3, 3)]


def test_watermark_drops_late_rows(spark, tmp_path):
    """Windowed streaming agg with watermark: rows older than
    (max event time - delay) are dropped in later micro-batches."""
    src = tmp_path / "in"
    src.mkdir()
    ckpt = tmp_path / "ckpt"
    schema = "ts timestamp, k string"

    def agg(df):
        return (
            df.withWatermark("ts", "10 minutes")
            .groupBy(F.window("ts", "1 hour").alias("w"), "k")
            .agg(F.count("*").alias("n"))
        )

    # batch 1: watermark advances to 12:00 - 10min = 11:50
    _write_items(
        src / "b1.json",
        [
            {"ts": "2024-01-01 10:00:00", "k": "a"},
            {"ts": "2024-01-01 12:00:00", "k": "a"},
        ],
    )
    out: list = []
    _run_available_now(agg(_read_stream(spark, src, schema)), ckpt, out)

    # batch 2: 10:05 is behind the checkpointed watermark -> dropped;
    # 13:00 advances the watermark past the 12:00 window's end
    _write_items(
        src / "b2.json",
        [
            {"ts": "2024-01-01 10:05:00", "k": "a"},  # late: dropped
            {"ts": "2024-01-01 13:00:00", "k": "a"},
        ],
    )
    _run_available_now(agg(_read_stream(spark, src, schema)), ckpt, out)
    # close remaining windows
    _write_items(src / "b3.json", [{"ts": "2024-01-01 15:00:00", "k": "a"}])
    _run_available_now(agg(_read_stream(spark, src, schema)), ckpt, out)

    counts = {r.w.start.hour: r.n for r in out}
    assert counts[10] == 1  # the late 10:05 row did NOT land
    assert counts[12] == 1


def test_drop_duplicates_within_watermark(spark, tmp_path):
    """Cross-micro-batch dedup by transaction_uuid within the
    watermark: the at-least-once duplicate (SURVEY.md §2.8) is
    eliminated upstream of delivery."""
    src = tmp_path / "in"
    src.mkdir()
    ckpt = tmp_path / "ckpt"
    schema = "ts timestamp, transaction_uuid string"

    def dedup(df):
        return df.withWatermark("ts", "1 hour").dropDuplicatesWithinWatermark(
            ["transaction_uuid"]
        )

    _write_items(
        src / "b1.json",
        [
            {"ts": "2024-01-01 10:00:00", "transaction_uuid": "t1"},
            {"ts": "2024-01-01 10:00:05", "transaction_uuid": "t1"},  # dup in-batch
            {"ts": "2024-01-01 10:01:00", "transaction_uuid": "t2"},
        ],
    )
    out: list = []
    _run_available_now(dedup(_read_stream(spark, src, schema)), ckpt, out)

    # redelivery of t1 in a later micro-batch (the K5 whole-batch retry)
    _write_items(
        src / "b2.json",
        [
            {"ts": "2024-01-01 10:00:10", "transaction_uuid": "t1"},  # dup
            {"ts": "2024-01-01 10:02:00", "transaction_uuid": "t3"},
        ],
    )
    _run_available_now(dedup(_read_stream(spark, src, schema)), ckpt, out)

    assert sorted(r.transaction_uuid for r in out) == ["t1", "t2", "t3"]


def test_hybrid_flush_under_rocksdb_state_store(spark, tmp_path):
    """The 100 TB stateful config: hybrid_flush on the RocksDB state
    store provider (state bounded by executor disk, not heap; see
    session.ROCKSDB_STATE_CONF). Same size-arm semantics as the
    default provider, and the query's state-operator metrics prove
    RocksDB actually backed the store."""
    from xmidt_event_streams_spark.session import ROCKSDB_STATE_CONF

    src = tmp_path / "in"
    src.mkdir()
    _write_items(
        src / "b1.json",
        [{"stream_name": "s1", "item": f"m{i}"} for i in range(4)],
    )
    stream = _read_stream(spark, src, "stream_name string, item string")

    saved = {
        k: spark.conf.get(k, None) for k in ROCKSDB_STATE_CONF
    }
    for k, v in ROCKSDB_STATE_CONF.items():
        spark.conf.set(k, v)
    out: list = []
    try:
        q = (
            hybrid_flush(stream, batch_size=2, time_limit_ms=60_000)
            .writeStream.outputMode("append")
            .foreachBatch(lambda b, _i: out.extend(b.collect()))
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .start()
        )
        # generous deadline: under full-suite load (32 concurrent
        # Spark threads) RocksDB store init can push the first
        # batches past a 60 s budget (observed flake)
        deadline = time.time() + 150
        while time.time() < deadline and len(out) < 2:
            time.sleep(0.3)
        # the progress entry carrying stateOperators can lag the
        # batch output -- poll for it instead of snapshotting once
        progresses = list(q.recentProgress)
        prog_deadline = time.time() + 30
        while time.time() < prog_deadline and not any(
            (p or {}).get("stateOperators") for p in progresses
        ):
            time.sleep(0.5)
            progresses = list(q.recentProgress)
        q.stop()
        await_stream(q, 60)
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)

    assert [(r.n, r.flush_reason) for r in out] == [(2, "size"), (2, "size")]
    assert sorted(x for r in out for x in r["items"]) == ["m0", "m1", "m2", "m3"]
    # any committed batch's state operator must expose rocksdb metrics
    # (scan all progress entries -- the most recent one may be an
    # empty spin batch with no state operator attached)
    ops = [o for p in progresses for o in (p or {}).get("stateOperators", [])]
    assert ops, "expected a stateful operator in query progress"
    rocks_metrics = [
        k
        for o in ops
        for k in o.get("customMetrics", {})
        if k.startswith("rocksdb")
    ]
    assert rocks_metrics, "state operator did not run on RocksDB"


def test_hybrid_flush_state_survives_restart(spark, tmp_path):
    """Checkpointed operator state across a stop/restart: 3 items
    buffer (under batch_size=5), the query stops, 2 more arrive, the
    RESTARTED query must flush one batch of 5 -- i.e. the pre-restart
    buffer was recovered from the state store, not lost (the durable
    upgrade over the reference's in-memory queue, which loses its
    buffer on crash -- B7-abrupt)."""
    src = tmp_path / "in"
    src.mkdir()
    _write_items(
        src / "b1.json",
        [{"stream_name": "s1", "item": f"pre{i}"} for i in range(3)],
    )
    schema = "stream_name string, item string"
    ckpt = tmp_path / "ckpt"

    def _run_until_rows_committed(out_rows, expect_input, max_wait=90.0):
        # a pending processing-time timeout keeps even availableNow
        # queries spinning empty batches, so await-termination never
        # returns early; poll committed input rows instead, then stop
        # (state commits with each batch, so stopping after the data
        # batch is committed preserves it in the checkpoint)
        q = (
            hybrid_flush(
                _read_stream(spark, src, schema), batch_size=5,
                time_limit_ms=600_000,
            )
            .writeStream.outputMode("append")
            .foreachBatch(lambda b, _i: out_rows.extend(b.collect()))
            .option("checkpointLocation", str(ckpt))
            .start()
        )
        deadline = time.time() + max_wait
        while time.time() < deadline:
            seen = sum(
                int(p["numInputRows"]) for p in q.recentProgress
            )
            if seen >= expect_input:
                break
            time.sleep(0.3)
        q.stop()
        await_stream(q, 60)

    out1: list = []
    _run_until_rows_committed(out1, expect_input=3)
    assert out1 == []  # under size, no time-out: everything buffered

    _write_items(
        src / "b2.json",
        [{"stream_name": "s1", "item": f"post{i}"} for i in range(2)],
    )
    out2: list = []
    _run_until_rows_committed(out2, expect_input=2)
    assert [(r.n, r.flush_reason) for r in out2] == [(5, "size")]
    assert sorted(out2[0]["items"]) == ["post0", "post1", "pre0", "pre1", "pre2"]


def test_streaming_sessionize_merges_across_batches(spark, tmp_path):
    """operators/sessions.sessionize in a real stream: events of one
    key arriving in DIFFERENT micro-batches within the gap merge into
    ONE session, finalized (append-mode emit) only after the
    watermark passes the session end."""
    from xmidt_event_streams_spark.operators.sessions import sessionize

    src = tmp_path / "in"
    src.mkdir()
    ckpt = tmp_path / "ckpt"
    schema = "ts timestamp, user_id long"

    def run():
        out: list = []
        _run_available_now(
            sessionize(
                _read_stream(spark, src, schema),
                gap_minutes=30,
                watermark="10 minutes",
            ),
            ckpt,
            out,
        )
        return out

    # batch 1: two u1 events 10 min apart (one session), u9 frontier
    _write_items(
        src / "b1.json",
        [
            {"ts": "2024-01-01 10:00:00", "user_id": 1},
            {"ts": "2024-01-01 10:10:00", "user_id": 1},
            {"ts": "2024-01-01 10:05:00", "user_id": 2},
        ],
    )
    out1 = run()
    # batch 2: u2's second event lands within the gap -> must MERGE
    # into the batch-1 session; u9 pushes event time far ahead
    _write_items(
        src / "b2.json",
        [
            {"ts": "2024-01-01 10:20:00", "user_id": 2},
            {"ts": "2024-01-01 15:00:00", "user_id": 9},
        ],
    )
    out2 = run()
    # batch 3: another frontier push gives the engine a batch in
    # which the advanced watermark finalizes remaining sessions
    _write_items(src / "b3.json", [{"ts": "2024-01-01 16:00:00", "user_id": 9}])
    out3 = run()

    done = {
        (r["user_id"], str(r["session_start"]), str(r["session_end"])): r[
            "n_events"
        ]
        for r in out1 + out2 + out3
    }
    assert done[(1, "2024-01-01 10:00:00", "2024-01-01 10:40:00")] == 2
    # the cross-batch merge: ONE u2 session spanning both batches,
    # end anchored to the batch-2 event + gap
    assert done[(2, "2024-01-01 10:05:00", "2024-01-01 10:50:00")] == 2
    assert not any(
        k[0] == 2 and k[2] == "2024-01-01 10:35:00" for k in done
    ), "u2's batch-1 session leaked out unmerged"
