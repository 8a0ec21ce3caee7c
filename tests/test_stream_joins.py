"""Stream-stream joins (streaming/joins.py): inner + leftOuter with
event-time bounds, cross-micro-batch matching, state expiry via
watermark, and batch/streaming plan parity."""

from __future__ import annotations
from tests.streamutil import await_stream

import json

import pytest
from pyspark.sql import functions as F

from xmidt_event_streams_spark.streaming.joins import (
    attribution_join,
    stream_stream_join,
)


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


SCHEMA = "ts timestamp, user_id long, kind string"


def test_inner_join_matches_within_bound_across_batches(spark, tmp_path):
    """A purchase in a LATER micro-batch still matches a click
    buffered in join state; a purchase outside the 1 h bound does
    not."""
    clicks_dir = tmp_path / "clicks"
    buys_dir = tmp_path / "buys"
    clicks_dir.mkdir(), buys_dir.mkdir()
    ckpt = tmp_path / "ckpt"

    _write_items(
        clicks_dir / "c1.json",
        [
            {"ts": "2024-01-01 10:00:00", "user_id": 1, "kind": "click"},
            {"ts": "2024-01-01 10:00:00", "user_id": 2, "kind": "click"},
        ],
    )
    _write_items(
        buys_dir / "b1.json",
        [{"ts": "2024-01-01 10:30:00", "user_id": 1, "kind": "buy"}],
    )
    out: list = []
    j = attribution_join(
        _read_stream(spark, clicks_dir, SCHEMA),
        _read_stream(spark, buys_dir, SCHEMA),
    )
    _run_available_now(j, ckpt, out)
    assert [(r.user_id, r.lag_micros) for r in out] == [(1, 1800 * 10**6)]

    # later batch: user 2 buys 30 min after their click (match, state
    # survived the restart from checkpoint); user 1 buys 2 h after
    # (outside the bound -> no row)
    _write_items(
        buys_dir / "b2.json",
        [
            {"ts": "2024-01-01 10:31:00", "user_id": 2, "kind": "buy"},
            {"ts": "2024-01-01 12:30:00", "user_id": 1, "kind": "buy"},
        ],
    )
    out2: list = []
    j2 = attribution_join(
        _read_stream(spark, clicks_dir, SCHEMA),
        _read_stream(spark, buys_dir, SCHEMA),
    )
    _run_available_now(j2, ckpt, out2)
    assert [(r.user_id, r.lag_micros) for r in out2] == [(2, 1860 * 10**6)]


def test_left_outer_emits_null_after_watermark_expiry(spark, tmp_path):
    """leftOuter: the unmatched click emits a null-padded row only
    once the right watermark passes click_ts + within (state expiry,
    not timeout-by-wall-clock)."""
    clicks_dir = tmp_path / "clicks"
    buys_dir = tmp_path / "buys"
    clicks_dir.mkdir(), buys_dir.mkdir()
    ckpt = tmp_path / "ckpt"

    def join():
        return stream_stream_join(
            _read_stream(spark, clicks_dir, SCHEMA),
            _read_stream(spark, buys_dir, SCHEMA),
            "user_id",
            within="1 hour",
            watermark="10 minutes",
            how="leftOuter",
        )

    # The GLOBAL watermark is min(left, right): BOTH sides must
    # advance past click_ts + within (11:00) + delay before the
    # buffered left row can be finalized -- a one-sided advance
    # (the first draft of this test) never expires anything.
    _write_items(
        clicks_dir / "c1.json",
        [{"ts": "2024-01-01 10:00:00", "user_id": 1, "kind": "click"}],
    )
    _write_items(
        buys_dir / "b1.json",
        [{"ts": "2024-01-01 13:00:00", "user_id": 99, "kind": "buy"}],
    )
    out: list = []
    _run_available_now(join(), ckpt, out)

    # advance both event-time frontiers past the bound...
    _write_items(
        clicks_dir / "c2.json",
        [{"ts": "2024-01-01 14:00:00", "user_id": 98, "kind": "click"}],
    )
    _write_items(
        buys_dir / "b2.json",
        [{"ts": "2024-01-01 14:00:00", "user_id": 99, "kind": "buy"}],
    )
    _run_available_now(join(), ckpt, out)
    # ...and run one more batch carrying data so the checkpointed
    # watermark (computed at the END of the previous batch) is applied
    # and expired state flushes
    _write_items(
        clicks_dir / "c3.json",
        [{"ts": "2024-01-01 15:00:00", "user_id": 97, "kind": "click"}],
    )
    _write_items(
        buys_dir / "b3.json",
        [{"ts": "2024-01-01 15:00:00", "user_id": 99, "kind": "buy"}],
    )
    _run_available_now(join(), ckpt, out)
    unmatched = [r for r in out if r.l_user_id == 1]
    assert len(unmatched) == 1
    assert unmatched[0].r_user_id is None and unmatched[0].r_ts is None


def test_batch_mode_same_plan_matches_oracle(spark, sf_dir):
    """The identical attribution_join call on BATCH events must match
    a DuckDB interval-join oracle -- pinning the semantics the
    streaming plan enforces incrementally."""
    import duckdb

    from xmidt_event_streams_spark.session import load_tables

    ev = load_tables(spark, sf_dir, ("events",))["events"]
    clicks = ev.filter(F.col("event_type") == "click").select("ts", "user_id")
    buys = ev.filter(F.col("event_type") == "purchase").select("ts", "user_id")
    got = sorted(
        (r.user_id, str(r.click_ts), str(r.purchase_ts), r.lag_micros)
        for r in attribution_join(clicks, buys, within="1 hour").collect()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf_dir}/events.parquet')"
    )
    want = sorted(
        (r[0], str(r[1]), str(r[2]), r[3])
        for r in con.execute(
            """
            SELECT c.user_id, c.ts AS click_ts, p.ts AS purchase_ts,
                   epoch_us(p.ts) - epoch_us(c.ts) AS lag_micros
            FROM (SELECT ts, user_id FROM events WHERE event_type = 'click') c
            JOIN (SELECT ts, user_id FROM events WHERE event_type = 'purchase') p
              ON c.user_id = p.user_id
             AND p.ts > c.ts
             AND p.ts <= c.ts + INTERVAL 1 HOUR
            """
        ).fetchall()
    )
    assert got and got == want


def test_streaming_requires_watermark_contract(spark, tmp_path):
    """Outer stream-stream joins without a time bound are rejected by
    Spark's planner -- assert our API surfaces that early rather than
    at runtime (guard against silently dropping the bound)."""
    clicks_dir = tmp_path / "c"
    buys_dir = tmp_path / "b"
    clicks_dir.mkdir(), buys_dir.mkdir()
    _write_items(
        clicks_dir / "x.json",
        [{"ts": "2024-01-01 10:00:00", "user_id": 1, "kind": "click"}],
    )
    _write_items(
        buys_dir / "x.json",
        [{"ts": "2024-01-01 10:30:00", "user_id": 1, "kind": "buy"}],
    )
    left = _read_stream(spark, clicks_dir, SCHEMA)
    right = _read_stream(spark, buys_dir, SCHEMA)
    # with the bound: planner accepts the outer join (smoke)
    df = stream_stream_join(left, right, "user_id", how="leftOuter")
    q = (
        df.writeStream.format("memory")
        .queryName("ssj_contract_ok")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck1"))
        .trigger(availableNow=True)
        .start()
    )
    await_stream(q, 60)

    # stripped bound -> AnalysisException at start()
    bare = left.selectExpr(
        "ts as l_ts", "user_id as l_user_id"
    ).join(
        right.selectExpr("ts as r_ts", "user_id as r_user_id"),
        F.col("l_user_id") == F.col("r_user_id"),
        "leftOuter",
    )
    from pyspark.errors.exceptions.captured import AnalysisException

    with pytest.raises(AnalysisException):
        (
            bare.writeStream.format("memory")
            .queryName("ssj_contract_bad")
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ck2"))
            .trigger(availableNow=True)
            .start()
        )
