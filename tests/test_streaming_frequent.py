"""Streaming heavy hitters (streaming/frequent.py): checkpointed MG
summaries folded across micro-batches, est-then-screen discipline,
and restart continuity (the state store carries the summary across a
query restart)."""

from __future__ import annotations
from tests.streamutil import await_stream

import json

from pyspark.sql import functions as F

from xmidt_event_streams_spark.streaming.frequent import (
    screen_heavy_hitters,
    streaming_frequent_tokens,
)


def _write_docs(path, texts):
    with open(path, "w") as f:
        for i, t in enumerate(texts):
            f.write(json.dumps({"doc_id": i, "text": t}) + "\n")


def _drive(spark, src, ckpt, out_batches, **kw):
    stream = spark.readStream.schema("doc_id long, text string").json(str(src))
    q = (
        streaming_frequent_tokens(stream, **kw)
        .writeStream.outputMode("update")
        .foreachBatch(lambda b, i: out_batches.append((i, b.collect())))
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
    )
    await_stream(q, 120)


def test_summaries_track_stream_and_survive_restart(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    ckpt = tmp_path / "ckpt"
    _write_docs(
        src / "a.json",
        ["hot hot hot warm rare1 rare2"] * 5,
    )
    out: list = []
    _drive(spark, src, ckpt, out, s_per_bucket=64, n_buckets=4)
    rows = [r for _, b in out for r in b]
    est = {r["token"]: r["est_count"] for r in rows}
    assert est["hot"] == 15 and est["warm"] == 5
    # bucket totals partition the token stream
    assert sum({r["bucket"]: r["bucket_total"] for r in rows}.values()) == 30

    # restart with MORE data: the checkpointed summary continues --
    # counts accumulate across the restart, not reset
    _write_docs(src / "b.json", ["hot cold cold"] * 4)
    out2: list = []
    _drive(spark, src, ckpt, out2, s_per_bucket=64, n_buckets=4)
    rows2 = [r for _, b in out2 for r in b]
    est2 = {r["token"]: r["est_count"] for r in rows2}
    assert est2["hot"] == 19  # 15 + 4 across the restart
    assert est2["cold"] == 8
    # only updated buckets re-emit in update mode; untouched buckets
    # keep their state but produce no rows this trigger
    assert "warm" not in est2 or est2["warm"] == 5


def test_screen_keeps_heavy_drops_impossible(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    ckpt = tmp_path / "ckpt"
    texts = ["common common common tail%d" % i for i in range(30)]
    _write_docs(src / "a.json", texts)
    out: list = []
    _drive(spark, src, ckpt, out, s_per_bucket=64, n_buckets=4)
    last_rows = out[-1][1] if out else []
    all_rows = [r for _, b in out for r in b]
    summaries = spark.createDataFrame(
        all_rows or last_rows,
        "bucket int, token string, est_count long, bucket_total long",
    )
    kept = {
        r["token"]
        for r in screen_heavy_hitters(
            summaries, phi=0.5, s_per_bucket=64
        ).collect()
    }
    assert "common" in kept
    assert not any(t.startswith("tail") for t in kept)


def test_state_is_bounded_under_pressure(spark, tmp_path):
    """600 distinct tokens through s=16 x 2 buckets: per-bucket
    summaries never exceed s+1 entries (the decrement rule prunes),
    while the planted heavy token survives."""
    src = tmp_path / "src"
    src.mkdir()
    ckpt = tmp_path / "ckpt"
    texts = [
        "anchor anchor anchor anchor " + " ".join(
            f"u{d}x{j}" for j in range(20)
        )
        for d in range(30)
    ]
    _write_docs(src / "a.json", texts)
    out: list = []
    _drive(spark, src, ckpt, out, s_per_bucket=16, n_buckets=2)
    rows = [r for _, b in out for r in b]
    per_bucket: dict = {}
    for r in rows:
        per_bucket.setdefault(r["bucket"], set()).add(r["token"])
    assert per_bucket and all(len(v) <= 17 for v in per_bucket.values())
    assert any(r["token"] == "anchor" for r in rows)
