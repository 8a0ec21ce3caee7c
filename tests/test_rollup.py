"""Incremental rollup maintenance (streaming/rollup.py): the merged
view must equal the batch aggregate over all input, stay correct
across stream restarts and batch replays, and compact without
changing the view."""

from __future__ import annotations
from tests.streamutil import await_stream

import json

from pyspark.sql import functions as F

from xmidt_event_streams_spark.streaming.rollup import (
    compact_rollup,
    read_rollup,
    rollup_partial,
    start_rollup,
)

DIMS = ["event_type"]
MEASURES = {
    "n": ("count", "value"),
    "sum_value": ("sum", "value"),
    "max_value": ("max", "value"),
    "avg_value": ("avg", "value"),
}
SCHEMA = "event_type string, value double"


def _write_items(path, items):
    with open(path, "w") as f:
        for it in items:
            f.write(json.dumps(it) + "\n")


def _run(spark, src, rollup_dir, ckpt):
    q = start_rollup(
        spark.readStream.schema(SCHEMA).json(str(src)),
        DIMS,
        MEASURES,
        str(rollup_dir),
        str(ckpt),
        availableNow=True,
    )
    await_stream(q, 120)


def _view(spark, rollup_dir):
    return {
        r["event_type"]: (r["n"], r["sum_value"], r["max_value"], r["avg_value"])
        for r in read_rollup(spark, str(rollup_dir), DIMS, MEASURES).collect()
    }


def test_view_equals_batch_aggregate_across_restarts(spark, tmp_path):
    src = tmp_path / "in"
    src.mkdir()
    rollup_dir, ckpt = tmp_path / "rollup", tmp_path / "ckpt"

    b1 = [
        {"event_type": "click", "value": 1.0},
        {"event_type": "click", "value": 3.0},
        {"event_type": "view", "value": 10.0},
    ]
    b2 = [
        {"event_type": "click", "value": 5.0},
        {"event_type": "purchase", "value": 7.0},
    ]
    _write_items(src / "b1.json", b1)
    _run(spark, src, rollup_dir, ckpt)  # run 1
    _write_items(src / "b2.json", b2)
    _run(spark, src, rollup_dir, ckpt)  # run 2: restart from ckpt

    got = _view(spark, rollup_dir)
    want = {
        r["event_type"]: (r["n"], r["sum_value"], r["max_value"], r["avg_value"])
        for r in spark.read.json(
            spark.sparkContext.parallelize(
                [json.dumps(x) for x in b1 + b2]
            )
        )
        .groupBy("event_type")
        .agg(
            F.count("value").alias("n"),
            F.sum("value").alias("sum_value"),
            F.max("value").alias("max_value"),
            F.avg("value").alias("avg_value"),
        )
        .collect()
    }
    assert got == want
    # two triggers -> two batch partitions on storage
    parts = {
        p.name
        for p in rollup_dir.iterdir()
        if p.name.startswith("_ingest_batch_id=")
    }
    assert len(parts) == 2


def test_replayed_batch_does_not_double_count(spark, tmp_path):
    """At-least-once replay: re-running the same (batch, batch_id)
    through the writer overwrites its own partition -- the view is
    unchanged."""
    rollup_dir = tmp_path / "rollup"
    batch = spark.createDataFrame(
        [("click", 2.0), ("click", 4.0)], SCHEMA
    )
    from xmidt_event_streams_spark.streaming.ingest_dedup import (
        idempotent_batch_append,
    )

    partial = rollup_partial(batch, DIMS, MEASURES)
    idempotent_batch_append(partial, 7, str(rollup_dir), max_files=1)
    before = _view(spark, rollup_dir)
    idempotent_batch_append(partial, 7, str(rollup_dir), max_files=1)  # replay
    assert _view(spark, rollup_dir) == before
    assert before["click"] == (2, 6.0, 4.0, 3.0)


def test_compact_preserves_view_and_composes_with_appends(spark, tmp_path):
    rollup_dir = tmp_path / "rollup"
    from xmidt_event_streams_spark.streaming.ingest_dedup import (
        idempotent_batch_append,
    )

    for i, rows in enumerate(
        [[("click", 1.0)], [("click", 2.0), ("view", 9.0)], [("click", 4.0)]]
    ):
        partial = rollup_partial(
            spark.createDataFrame(rows, SCHEMA), DIMS, MEASURES
        )
        idempotent_batch_append(partial, i, str(rollup_dir), max_files=1)

    before = _view(spark, rollup_dir)
    compact_rollup(spark, str(rollup_dir), DIMS, MEASURES)
    assert _view(spark, rollup_dir) == before
    parts = {
        p.name
        for p in rollup_dir.iterdir()
        if p.name.startswith("_ingest_batch_id=")
    }
    assert parts == {"_ingest_batch_id=-1"}

    # appends after compaction merge correctly (avg pairs survived)
    partial = rollup_partial(
        spark.createDataFrame([("click", 9.0)], SCHEMA), DIMS, MEASURES
    )
    idempotent_batch_append(partial, 3, str(rollup_dir), max_files=1)
    after = _view(spark, rollup_dir)
    assert after["click"] == (4, 16.0, 9.0, 4.0)
    assert after["view"] == (1, 9.0, 9.0, 9.0)

    # a second compaction folds fold+append
    compact_rollup(spark, str(rollup_dir), DIMS, MEASURES)
    assert _view(spark, rollup_dir) == after


def test_non_mergeable_measure_rejected(spark):
    import pytest

    with pytest.raises(ValueError, match="not re-mergeable"):
        rollup_partial(
            spark.createDataFrame([("click", 1.0)], SCHEMA),
            DIMS,
            {"p50": ("median", "value")},
        )


def test_approx_distinct_measure_merges_sketches(spark, tmp_path):
    """HLL sketches as rollup partials: the merged estimate must
    track the exact distinct count across batches (including overlap
    between batches, which additive counts cannot express), survive
    replay, and survive compaction."""
    rollup_dir = tmp_path / "rollup"
    from xmidt_event_streams_spark.streaming.ingest_dedup import (
        idempotent_batch_append,
    )

    m = {"users": ("approx_distinct", "user")}
    schema = "event_type string, user long"
    batches = [
        [("click", u) for u in range(0, 60)],
        [("click", u) for u in range(40, 110)],  # overlaps 40-59
        [("view", u) for u in range(0, 25)],
    ]
    for i, rows in enumerate(batches):
        partial = rollup_partial(
            spark.createDataFrame(rows, schema), ["event_type"], m
        )
        idempotent_batch_append(partial, i, str(rollup_dir), max_files=1)

    def view():
        return {
            r["event_type"]: r["users"]
            for r in read_rollup(
                spark, str(rollup_dir), ["event_type"], m
            ).collect()
        }

    got = view()
    # HLL at default lgk is exact-ish at these cardinalities
    assert abs(got["click"] - 110) <= 110 * 0.05
    assert abs(got["view"] - 25) <= 25 * 0.05

    # replay batch 1 -> unchanged (a COUNT would have double-added)
    partial = rollup_partial(
        spark.createDataFrame(batches[1], schema), ["event_type"], m
    )
    idempotent_batch_append(partial, 1, str(rollup_dir), max_files=1)
    assert view() == got

    compact_rollup(spark, str(rollup_dir), ["event_type"], m)
    assert view() == got


def test_as_of_batch_pins_the_view(spark, tmp_path):
    rollup_dir = tmp_path / "rollup"
    from xmidt_event_streams_spark.streaming.ingest_dedup import (
        idempotent_batch_append,
    )

    for i, rows in enumerate(
        [[("click", 1.0)], [("click", 2.0)], [("click", 4.0)]]
    ):
        idempotent_batch_append(
            rollup_partial(spark.createDataFrame(rows, SCHEMA), DIMS, MEASURES),
            i, str(rollup_dir), max_files=1,
        )
    full = _view(spark, rollup_dir)
    assert full["click"][0] == 3

    def at(b):
        return {
            r["event_type"]: r["n"]
            for r in read_rollup(
                spark, str(rollup_dir), DIMS, MEASURES, as_of_batch=b
            ).collect()
        }

    assert at(0)["click"] == 1
    assert at(1)["click"] == 2
    assert at(2) == {k: v[0] for k, v in full.items()}
    # compaction folds history: as-of behind the fold frontier is
    # gone (the fold partition always participates)
    compact_rollup(spark, str(rollup_dir), DIMS, MEASURES)
    assert at(0)["click"] == 3


def test_routed_stream_feeds_rollup(spark, tmp_path, sf_dir):
    """Composition: the reference's hot path (wrp_view -> route_union)
    feeding a materialized per-(stream, event_type) count rollup --
    the M1 metric as a queryable view instead of a Prometheus counter
    (SURVEY.md S2.6)."""
    import glob

    from xmidt_event_streams_spark.config import DEFAULT_FILTERS
    from xmidt_event_streams_spark.enrich import extract_event_type
    from xmidt_event_streams_spark.routing import route_union
    from xmidt_event_streams_spark.schema import wrp_view
    from xmidt_event_streams_spark.session import load_tables

    src = tmp_path / "in"
    src.mkdir()
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    ev.limit(500).write.mode("overwrite").parquet(str(src / "b1"))

    stream = spark.readStream.schema(
        spark.read.parquet(str(src / "b1")).schema
    ).parquet(str(src) + "/*")
    routed = route_union(wrp_view(stream), DEFAULT_FILTERS).select(
        "stream_name", extract_event_type("dest").alias("event_type")
    )
    m = {"n": ("count", "event_type")}
    q = start_rollup(
        routed, ["stream_name", "event_type"], m,
        str(tmp_path / "roll"), str(tmp_path / "ck"), availableNow=True,
    )
    await_stream(q, 120)

    got = {
        (r["stream_name"], r["event_type"]): r["n"]
        for r in read_rollup(
            spark, str(tmp_path / "roll"), ["stream_name", "event_type"], m
        ).collect()
    }
    want = {
        (r["stream_name"], r["event_type"]): r["n"]
        for r in route_union(
            wrp_view(spark.read.parquet(*glob.glob(str(src) + "/b1"))),
            DEFAULT_FILTERS,
        )
        .groupBy("stream_name", extract_event_type("dest").alias("event_type"))
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert got and got == want


class TestHistMeasure:
    """hist: exactly-mergeable bin counts + bounded-error quantiles
    (rollup_percentile) -- p99 from pre-aggregates, no raw rescans."""

    EDGES = (1.0, 2.0, 4.0, 8.0, 16.0, 32.0)
    HM = {"lat": ("hist", "value", EDGES), "n": ("count", "value")}

    @staticmethod
    def _batches():
        import random

        rng = random.Random(7)
        return [
            [("click", round(rng.uniform(0.5, 30.0), 3)) for _ in range(80)]
            for _ in range(4)
        ]

    def _exact_hist(self, values):
        bins = [0] * (len(self.EDGES) + 1)
        for v in values:
            bins[sum(1 for e in self.EDGES if e < v)] += 1
        return bins

    def test_merged_hist_is_exact(self, spark, tmp_path):
        from xmidt_event_streams_spark.streaming.rollup import (
            rollup_partial,
        )
        from xmidt_event_streams_spark.streaming.ingest_dedup import (
            idempotent_batch_append,
        )

        path = str(tmp_path / "ru")
        batches = self._batches()
        for b, rows in enumerate(batches):
            idempotent_batch_append(
                rollup_partial(
                    spark.createDataFrame(rows, SCHEMA), DIMS, self.HM
                ),
                b,
                path,
            )
        got = read_rollup(spark, path, DIMS, self.HM).collect()[0]
        all_vals = [v for rows in batches for _, v in rows]
        # bin counts are EXACT under merge -- not approximate
        assert list(got["lat"]) == self._exact_hist(all_vals)
        assert got["n"] == len(all_vals)

    def test_percentile_bound_contains_exact(self, spark, tmp_path):
        from xmidt_event_streams_spark.streaming.rollup import (
            rollup_partial,
            rollup_percentile,
        )
        from xmidt_event_streams_spark.streaming.ingest_dedup import (
            idempotent_batch_append,
        )

        path = str(tmp_path / "ru")
        batches = self._batches()
        for b, rows in enumerate(batches):
            idempotent_batch_append(
                rollup_partial(
                    spark.createDataFrame(rows, SCHEMA), DIMS, self.HM
                ),
                b,
                path,
            )
        view = read_rollup(spark, path, DIMS, self.HM)
        all_vals = sorted(v for rows in batches for _, v in rows)
        import math

        for q in (0.5, 0.9, 0.99):
            r = view.select(
                rollup_percentile("lat", self.EDGES, q).alias("p")
            ).collect()[0]["p"]
            exact = all_vals[math.ceil(q * len(all_vals)) - 1]
            assert r["lo"] <= exact <= r["hi"], (q, exact, r)
            assert r["est"] == r["hi"]  # conservative SLO read

    def test_hist_survives_compaction(self, spark, tmp_path):
        from xmidt_event_streams_spark.streaming.rollup import (
            rollup_partial,
        )
        from xmidt_event_streams_spark.streaming.ingest_dedup import (
            idempotent_batch_append,
        )

        path = str(tmp_path / "ru")
        batches = self._batches()
        for b, rows in enumerate(batches[:3]):
            idempotent_batch_append(
                rollup_partial(
                    spark.createDataFrame(rows, SCHEMA), DIMS, self.HM
                ),
                b,
                path,
            )
        compact_rollup(spark, path, DIMS, self.HM)
        # post-compaction append still composes
        idempotent_batch_append(
            rollup_partial(
                spark.createDataFrame(batches[3], SCHEMA), DIMS, self.HM
            ),
            3,
            path,
        )
        got = read_rollup(spark, path, DIMS, self.HM).collect()[0]
        all_vals = [v for rows in batches for _, v in rows]
        assert list(got["lat"]) == self._exact_hist(all_vals)

    def test_bad_edges_rejected(self, spark):
        import pytest

        from xmidt_event_streams_spark.streaming.rollup import (
            rollup_partial,
        )

        df = spark.createDataFrame([("click", 1.0)], SCHEMA)
        with pytest.raises(ValueError, match="sorted bin edges"):
            rollup_partial(df, DIMS, {"x": ("hist", "value", (3.0, 1.0))})
        with pytest.raises(ValueError, match="sorted bin edges"):
            rollup_partial(df, DIMS, {"x": ("hist", "value")})

    def test_log_edges_error_bound(self):
        from xmidt_event_streams_spark.streaming.rollup import log_edges

        e = log_edges(1.0, 1000.0, per_decade=10)
        assert e[0] == 1.0 and e[-1] >= 1000.0
        ratios = [e[i + 1] / e[i] for i in range(len(e) - 1)]
        # constant ratio -> fixed relative error bound
        assert max(ratios) - min(ratios) < 1e-9
        assert abs(ratios[0] - 10 ** 0.1) < 1e-12

    def test_bin_semantics_property(self, spark):
        """Property: Spark's bin index == the (lo, hi] reference rule
        for arbitrary values INCLUDING exact edge hits (v == edge
        belongs to the bin BELOW-or-at, i.e. count of edges strictly
        below v)."""
        from hypothesis import given, settings, strategies as st

        from xmidt_event_streams_spark.streaming.rollup import (
            rollup_partial,
        )

        edges = self.EDGES

        @settings(max_examples=10, deadline=None)
        @given(
            st.lists(
                st.one_of(
                    st.floats(0.01, 64.0, allow_nan=False),
                    st.sampled_from(list(edges)),  # force edge hits
                ),
                min_size=1,
                max_size=40,
            )
        )
        def check(vals):
            df = spark.createDataFrame(
                [("k", float(v)) for v in vals], SCHEMA
            )
            got = rollup_partial(df, DIMS, {"h": ("hist", "value", edges)})
            bins = list(got.collect()[0]["h__hist"])
            assert bins == self._exact_hist(vals), vals

        check()


class TestTopKMeasure:
    """top_k: mergeable frequent-items sketch state -- heavy hitters
    per dimension slice; counts EXACT while distinct items stay under
    the sketch capacity (the enum-ish dimension regime)."""

    TM = {"hot": ("top_k", "item", 3), "n": ("count", "item")}
    DIMS2 = ["grp"]
    SCHEMA2 = "grp string, item string"

    @staticmethod
    def _batches():
        # deterministic skewed items per group, no count ties in the
        # top 3 (sketch tie order is not contractual)
        out = []
        for b in range(3):
            rows = []
            for i, (item, reps) in enumerate(
                [("a", 9), ("b", 6), ("c", 4), ("d", 2), ("e", 1)]
            ):
                rows += [("g1", item)] * reps
            rows += [("g2", "x")] * 5 + [("g2", "y")] * 2
            out.append(rows)
        return out

    def _write(self, spark, path):
        from xmidt_event_streams_spark.streaming.ingest_dedup import (
            idempotent_batch_append,
        )
        from xmidt_event_streams_spark.streaming.rollup import (
            rollup_partial,
        )

        for b, rows in enumerate(self._batches()):
            idempotent_batch_append(
                rollup_partial(
                    spark.createDataFrame(rows, self.SCHEMA2),
                    self.DIMS2,
                    self.TM,
                ),
                b,
                path,
            )

    def test_merged_top_k_exact_below_capacity(self, spark, tmp_path):
        path = str(tmp_path / "ru")
        self._write(spark, path)
        got = {
            r["grp"]: [(x["item"], x["count"]) for x in r["hot"]]
            for r in read_rollup(
                spark, path, self.DIMS2, self.TM
            ).collect()
        }
        # 3 batches x per-batch counts; exact merged counts, ranked
        assert got["g1"] == [("a", 27), ("b", 18), ("c", 12)]
        assert got["g2"] == [("x", 15), ("y", 6)]

    def test_top_k_survives_compaction_and_append(self, spark, tmp_path):
        from xmidt_event_streams_spark.streaming.ingest_dedup import (
            idempotent_batch_append,
        )
        from xmidt_event_streams_spark.streaming.rollup import (
            rollup_partial,
        )

        path = str(tmp_path / "ru")
        self._write(spark, path)
        compact_rollup(spark, path, self.DIMS2, self.TM)
        idempotent_batch_append(
            rollup_partial(
                spark.createDataFrame(
                    [("g1", "b")] * 20, self.SCHEMA2
                ),
                self.DIMS2,
                self.TM,
            ),
            3,
            path,
        )
        got = {
            r["grp"]: [(x["item"], x["count"]) for x in r["hot"]]
            for r in read_rollup(spark, path, self.DIMS2, self.TM).collect()
        }
        # the post-compaction append flips the leader
        assert got["g1"] == [("b", 38), ("a", 27), ("c", 12)]

    def test_bad_k_rejected(self, spark):
        import pytest

        from xmidt_event_streams_spark.streaming.rollup import (
            rollup_partial,
        )

        df = spark.createDataFrame([("g", "a")], self.SCHEMA2)
        with pytest.raises(ValueError, match="top_k needs"):
            rollup_partial(df, self.DIMS2, {"h": ("top_k", "item")})
        with pytest.raises(ValueError, match="top_k needs"):
            rollup_partial(df, self.DIMS2, {"h": ("top_k", "item", 0)})
