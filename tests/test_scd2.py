"""SCD2 build + temporal join (operators/scd2.py) with DuckDB oracle
twins over the events table, plus constructed-case semantics."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from xmidt_event_streams_spark.operators.scd2 import scd2_build, temporal_join


def _duck(sf_dir, sql):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{sf_dir}/events.parquet')"
    )
    rows = con.execute(sql).fetchall()
    con.close()
    return rows


class TestBuild:
    def test_constructed(self, spark):
        chg = spark.createDataFrame(
            [
                (1, 10, "bronze"),
                (1, 20, "bronze"),  # no-op -> collapsed
                (1, 30, "silver"),
                (2, 5, "gold"),
            ],
            "user_id long, ts long, tier string",
        )
        got = {
            (r["user_id"], r["version"]): (
                r["tier"], r["valid_from"], r["valid_to"]
            )
            for r in scd2_build(chg, "user_id", "ts", ["tier"]).collect()
        }
        assert got == {
            (1, 1): ("bronze", 10, 30),
            (1, 2): ("silver", 30, None),
            (2, 1): ("gold", 5, None),
        }

    def test_no_collapse_keeps_noops(self, spark):
        chg = spark.createDataFrame(
            [(1, 10, "a"), (1, 20, "a")], "k long, ts long, v string"
        )
        rows = scd2_build(chg, "k", "ts", ["v"], collapse=False).collect()
        assert len(rows) == 2

    def test_null_attr_transitions(self, spark):
        chg = spark.createDataFrame(
            [(1, 10, None), (1, 20, None), (1, 30, "x")],
            "k long, ts long, v string",
        )
        rows = sorted(
            (r["version"], r["v"])
            for r in scd2_build(chg, "k", "ts", ["v"]).collect()
        )
        # null==null counts as no-op; null->x is a change
        assert rows == [(1, None), (2, "x")]

    def test_ts_tiebreak(self, spark):
        chg = spark.createDataFrame(
            [(1, 10, 100, "a"), (1, 10, 200, "b")],
            "k long, ts long, seq long, v string",
        )
        rows = scd2_build(
            chg, "k", "ts", ["v"], tiebreak_col="seq"
        ).collect()
        cur = [r for r in rows if r["valid_to"] is None]
        assert len(cur) == 1 and cur[0]["v"] == "b"

    def test_build_matches_duckdb_on_events(self, spark, sf_dir):
        """Versioned dimension from the events log (each user's
        event_type stream, no-ops collapsed) vs the DuckDB twin."""
        ev = spark.read.parquet(f"{sf_dir}/events.parquet")
        got = sorted(
            (r["user_id"], r["version"], r["event_type"],
             str(r["valid_from"]), str(r["valid_to"]))
            for r in scd2_build(
                ev, "user_id", "ts", ["event_type"], tiebreak_col="event_id"
            ).collect()
        )
        want = sorted(
            (r[0], r[1], r[2], str(r[3]), str(r[4]))
            for r in _duck(
                sf_dir,
                """
                WITH dedup AS (
                  SELECT * FROM (
                    SELECT user_id, ts, event_id, event_type,
                      lag(event_type) OVER w AS prev
                    FROM events
                    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
                  ) WHERE prev IS NULL OR prev <> event_type
                )
                SELECT user_id,
                  CAST(row_number() OVER w AS INT) AS version,
                  event_type, ts AS valid_from,
                  lead(ts) OVER w AS valid_to
                FROM dedup
                WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
                """,
            )
        )
        assert got == want


class TestTemporalJoin:
    @pytest.fixture()
    def dim(self, spark):
        return scd2_build(
            spark.createDataFrame(
                [(1, 10, "bronze"), (1, 30, "silver"), (2, 5, "gold")],
                "user_id long, ts long, tier string",
            ),
            "user_id", "ts", ["tier"],
        )

    def test_each_fact_gets_its_contemporary_version(self, spark, dim):
        facts = spark.createDataFrame(
            [(100, 1, 15), (101, 1, 30), (102, 1, 9), (103, 2, 99)],
            "fact_id long, user_id long, ts long",
        )
        got = {
            r["fact_id"]: r["tier"]
            for r in temporal_join(facts, dim, "user_id", "ts").collect()
        }
        # ts=15 -> bronze; ts=30 -> silver (half-open: boundary goes
        # to the NEW version); ts=9 predates -> dropped (inner)
        assert got == {100: "bronze", 101: "silver", 103: "gold"}

    def test_left_keeps_prehistory_facts(self, spark, dim):
        facts = spark.createDataFrame(
            [(102, 1, 9)], "fact_id long, user_id long, ts long"
        )
        rows = temporal_join(facts, dim, "user_id", "ts", how="left").collect()
        assert len(rows) == 1 and rows[0]["tier"] is None

    def test_at_most_one_version_per_fact(self, spark, dim):
        facts = spark.createDataFrame(
            [(i, 1, t) for i, t in enumerate(range(10, 50))],
            "fact_id long, user_id long, ts long",
        )
        joined = temporal_join(facts, dim, "user_id", "ts")
        assert joined.count() == joined.select("fact_id").distinct().count()

    def test_join_matches_duckdb_on_events(self, spark, sf_dir):
        """Each event joined to the user's event-type version valid
        one hour earlier ('what was the user's state an hour ago')."""
        ev = spark.read.parquet(f"{sf_dir}/events.parquet")
        dim = scd2_build(
            ev, "user_id", "ts", ["event_type"], tiebreak_col="event_id"
        ).withColumnRenamed("event_type", "state")
        facts = ev.select(
            "event_id", "user_id",
            (F.col("ts") - F.expr("INTERVAL 1 HOUR")).alias("asof_ts"),
        )
        got = sorted(
            (r["event_id"], r["state"])
            for r in temporal_join(
                facts, dim.select("user_id", "state", "valid_from", "valid_to"),
                "user_id", "asof_ts",
            ).collect()
        )
        want = sorted(
            (r[0], r[1])
            for r in _duck(
                sf_dir,
                """
                WITH dedup AS (
                  SELECT * FROM (
                    SELECT user_id, ts, event_id, event_type,
                      lag(event_type) OVER w AS prev
                    FROM events
                    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
                  ) WHERE prev IS NULL OR prev <> event_type
                ), dim AS (
                  SELECT user_id, event_type AS state, ts AS valid_from,
                    lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                      AS valid_to
                  FROM dedup
                )
                SELECT f.event_id, d.state
                FROM (SELECT event_id, user_id,
                        ts - INTERVAL 1 HOUR AS asof_ts FROM events) f
                JOIN dim d
                  ON f.user_id = d.user_id
                 AND d.valid_from <= f.asof_ts
                 AND (d.valid_to IS NULL OR f.asof_ts < d.valid_to)
                """,
            )
        )
        assert got == want


class TestMaterializedDim:
    """write_scd2_table / scd2_apply_changes: bounded-bucket
    incremental maintenance, late-change splicing, replay
    idempotence, full-rebuild equivalence."""

    CH = "k long, ts long, v string, _change_seq long"

    @staticmethod
    def _read(spark, path):
        from xmidt_event_streams_spark.operators.scd2 import read_scd2_table

        return sorted(
            (r["k"], r["version"], r["v"], r["valid_from"], r["valid_to"])
            for r in read_scd2_table(spark, path).collect()
        )

    def _build(self, spark, path, rows):
        from xmidt_event_streams_spark.operators.scd2 import write_scd2_table

        write_scd2_table(
            spark.createDataFrame(rows, self.CH),
            path, "k", "ts", ["v"], tiebreak_col="_change_seq",
        )

    def test_incremental_equals_full_rebuild(self, spark, tmp_path):
        from xmidt_event_streams_spark.operators.scd2 import (
            scd2_apply_changes,
        )

        base = [(1, 10, "a", 1), (1, 30, "b", 2), (2, 10, "x", 3)]
        batch = [(1, 50, "c", 4), (3, 5, "q", 5)]
        inc = str(tmp_path / "inc")
        self._build(spark, inc, base)
        rep = scd2_apply_changes(
            spark, inc, spark.createDataFrame(batch, self.CH)
        )
        assert rep["keys"] == 2
        full = str(tmp_path / "full")
        self._build(spark, full, base + batch)
        assert self._read(spark, inc) == self._read(spark, full)

    def test_late_change_splices_into_history(self, spark, tmp_path):
        from xmidt_event_streams_spark.operators.scd2 import (
            scd2_apply_changes,
        )

        path = str(tmp_path / "dim")
        self._build(spark, path, [(1, 10, "a", 1), (1, 40, "c", 2)])
        scd2_apply_changes(
            spark, path,
            spark.createDataFrame([(1, 25, "b", 9)], self.CH),
        )
        got = self._read(spark, path)
        assert got == [
            (1, 1, "a", 10, 25),
            (1, 2, "b", 25, 40),
            (1, 3, "c", 40, None),
        ]

    def test_replay_is_idempotent(self, spark, tmp_path):
        from xmidt_event_streams_spark.operators.scd2 import (
            scd2_apply_changes,
        )

        path = str(tmp_path / "dim")
        self._build(spark, path, [(1, 10, "a", 1)])
        batch = spark.createDataFrame([(1, 20, "b", 2)], self.CH)
        scd2_apply_changes(spark, path, batch)
        before = self._read(spark, path)
        scd2_apply_changes(spark, path, batch)  # replay
        assert self._read(spark, path) == before

    def test_untouched_keys_unchanged(self, spark, tmp_path):
        from xmidt_event_streams_spark.operators.scd2 import (
            scd2_apply_changes,
        )

        path = str(tmp_path / "dim")
        rows = [(k, 10, f"v{k}", k) for k in range(1, 30)]
        self._build(spark, path, rows)
        before = {t for t in self._read(spark, path) if t[0] != 7}
        scd2_apply_changes(
            spark, path,
            spark.createDataFrame([(7, 20, "new", 99)], self.CH),
        )
        after = {t for t in self._read(spark, path) if t[0] != 7}
        assert after == before

    def test_missing_seq_rejected(self, spark, tmp_path):
        import pytest

        from xmidt_event_streams_spark.operators.scd2 import (
            scd2_apply_changes,
        )

        path = str(tmp_path / "dim")
        self._build(spark, path, [(1, 10, "a", 1)])
        with pytest.raises(ValueError, match="_change_seq"):
            scd2_apply_changes(
                spark, path,
                spark.createDataFrame(
                    [(1, 20, "b")], "k long, ts long, v string"
                ),
            )

    def test_foreign_table_rejected(self, spark, tmp_path):
        import pytest

        from xmidt_event_streams_spark.operators.scd2 import (
            scd2_apply_changes,
        )

        spark.createDataFrame([(1,)], "k long").write.parquet(
            str(tmp_path / "bare")
        )
        with pytest.raises(ValueError, match="foreign table"):
            scd2_apply_changes(
                spark, str(tmp_path / "bare"),
                spark.createDataFrame([(1, 2, "a", 1)], self.CH),
            )
