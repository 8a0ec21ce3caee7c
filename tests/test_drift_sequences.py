"""Drift detection (operators/drift.py) and ordered user sequences
(operators/traindata.py:build_user_sequences)."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from xmidt_event_streams_spark.operators.drift import psi, psi_report
from xmidt_event_streams_spark.operators.traindata import build_user_sequences
from xmidt_event_streams_spark.session import load_tables

SF = "/root/testdata/sf0.01"


class TestDrift:
    def test_self_psi_is_zero(self, spark):
        ev = load_tables(spark, SF, ("events",))["events"]
        assert psi(ev, ev, "value") == pytest.approx(0.0, abs=1e-9)

    def test_detects_injected_shift(self, spark):
        ev = load_tables(spark, SF, ("events",))["events"]
        shifted = ev.withColumn("value", F.col("value") * 1.5 + 20)
        v = psi(ev, shifted, "value")
        assert v > 0.25, v

    def test_split_halves_are_stable(self, spark):
        """Two deterministic halves of the same distribution must NOT
        alarm (the false-positive guard)."""
        ev = load_tables(spark, SF, ("events",))["events"]
        a = ev.filter(F.col("event_id") % 2 == 0)
        b = ev.filter(F.col("event_id") % 2 == 1)
        assert psi(a, b, "value") < 0.1

    def test_report_labels(self, spark):
        ev = load_tables(spark, SF, ("events",))["events"]
        shifted = ev.withColumn("value", F.col("value") + 1000)
        rep = {r["col"]: r["verdict"] for r in psi_report(ev, shifted, ["value", "user_id"])}
        assert rep["value"] == "shifted"
        assert rep["user_id"] == "stable"

    def test_out_of_range_mass_is_counted(self, spark):
        """Mass entirely outside the reference range must clamp into
        the end bins and alarm, not vanish."""
        ref = spark.range(1000).select((F.col("id") % 100).cast("double").alias("x"))
        cur = spark.range(1000).select((F.col("id") % 100 + 10_000).cast("double").alias("x"))
        assert psi(ref, cur, "x") > 0.25


class TestUserSequences:
    def test_matches_duckdb_ordered_lists(self, spark):
        ev = load_tables(spark, SF, ("events",))["events"]
        got = {
            r["user_id"]: (
                r["n_events"],
                [(str(e["ts"]), e["event_type"]) for e in r["seq"]],
            )
            for r in build_user_sequences(ev).collect()
        }
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF}/events.parquet')"
        )
        want = {
            r[0]: (r[1], [(str(t), e) for t, e in zip(r[2], r[3])])
            for r in con.execute(
                """
                SELECT user_id, count(*) AS n,
                  list(ts ORDER BY ts, event_type) AS ts_list,
                  list(event_type ORDER BY ts, event_type) AS et_list
                FROM events GROUP BY user_id
                """
            ).fetchall()
        }
        assert got == want

    def test_truncation_keeps_most_recent(self, spark):
        rows = [(1, f"2024-01-01 10:00:{s:02d}", f"e{s}") for s in range(10)]
        df = spark.createDataFrame(
            rows, "user_id long, ts string, event_type string"
        ).withColumn("ts", F.to_timestamp("ts"))
        out = build_user_sequences(df, max_len=3).collect()[0]
        assert out["n_events"] == 10
        assert [e["event_type"] for e in out["seq"]] == ["e7", "e8", "e9"]


class TestDriftNulls:
    def test_nulls_excluded_from_bins_and_reported(self, spark):
        """30% nulls in the reference must not masquerade as bin-0
        mass (self-PSI stays ~0 even with differing null rates); the
        null rate itself rides on the report."""
        ref = spark.range(1000).select(
            F.when(F.col("id") % 10 < 3, None)
            .otherwise((F.col("id") % 100).cast("double"))
            .alias("x")
        )
        cur = spark.range(1000).select(
            F.when(F.col("id") % 2 == 0, None)
            .otherwise((F.col("id") % 100).cast("double"))
            .alias("x")
        )
        assert psi(ref, ref, "x") == pytest.approx(0.0, abs=1e-9)
        # same value distribution, different null rate: values stable
        assert psi(ref, cur, "x") < 0.1
        rep = psi_report(ref, cur, ["x"])[0]
        assert rep["null_frac_ref"] == pytest.approx(0.3, abs=0.01)
        assert rep["null_frac_cur"] == pytest.approx(0.5, abs=0.01)


class TestChunkDocuments:
    def test_matches_duckdb_reconstruction(self, spark):
        """Chunk windows vs a DuckDB list-slice twin over the real
        documents table: same chunk texts, counts, and coverage."""
        import duckdb

        from xmidt_event_streams_spark.operators.traindata import (
            chunk_documents,
        )

        docs = spark.read.parquet(f"{SF}/documents.parquet").select(
            "doc_id", "text"
        )
        got = sorted(
            (r["doc_id"], r["chunk_id"], r["n_chunks"], r["chunk_start"],
             r["chunk_n_tokens"], r["chunk_text"])
            for r in chunk_documents(docs, max_tokens=12, overlap=4).collect()
        )
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')"
        )
        want = sorted(
            tuple(r)
            for r in con.execute(
                r"""
                WITH t AS (
                  SELECT doc_id, list_filter(string_split(
                    trim(regexp_replace(lower(text), '[ \t\n\x0B\f\r]+', ' ', 'g')),
                    ' '), x -> x <> '') AS w
                  FROM documents
                ), meta AS (
                  SELECT doc_id, w,
                    greatest(CAST(ceil((len(w) - 4) / 8.0) AS INT), 1) AS n_chunks
                  FROM t
                )
                SELECT doc_id,
                  CAST(i AS INT) AS chunk_id,
                  n_chunks,
                  CAST(i * 8 + 1 AS INT) AS chunk_start,
                  CAST(len(w[i*8+1 : i*8+12]) AS INT) AS chunk_n_tokens,
                  array_to_string(w[i*8+1 : i*8+12], ' ') AS chunk_text
                FROM meta, unnest(generate_series(0, n_chunks - 1)) AS u(i)
                """
            ).fetchall()
        )
        assert got == want

    def test_coverage_and_overlap_properties(self, spark):
        from xmidt_event_streams_spark.operators.traindata import (
            chunk_documents,
        )

        text = " ".join(f"w{i}" for i in range(25))
        df = spark.createDataFrame([(1, text)], "doc_id long, text string")
        rows = sorted(
            chunk_documents(df, max_tokens=10, overlap=3).collect(),
            key=lambda r: r["chunk_id"],
        )
        # stride 7: starts 1,8,15,22 -> 4 chunks
        assert [r["chunk_start"] for r in rows] == [1, 8, 15, 22]
        assert rows[0]["n_chunks"] == 4
        # consecutive chunks share exactly `overlap` tokens
        a = rows[0]["chunk_text"].split()
        b = rows[1]["chunk_text"].split()
        assert a[-3:] == b[:3]
        # every token is covered
        covered = set()
        for r in rows:
            covered.update(r["chunk_text"].split())
        assert covered == set(text.split())
        # tail chunk is short, not dropped
        assert rows[-1]["chunk_n_tokens"] == 4

    def test_edge_cases_and_guards(self, spark):
        import pytest

        from xmidt_event_streams_spark.operators.traindata import (
            chunk_documents,
        )

        df = spark.createDataFrame(
            [(1, "just three words"), (2, "")],
            "doc_id long, text string",
        )
        rows = {r["doc_id"]: r for r in chunk_documents(df, 10).collect()}
        assert rows[1]["n_chunks"] == 1 and rows[1]["chunk_n_tokens"] == 3
        assert rows[2]["n_chunks"] == 1 and rows[2]["chunk_n_tokens"] == 0
        with pytest.raises(ValueError, match="overlap"):
            chunk_documents(df, 10, overlap=10)
        with pytest.raises(ValueError, match="max_tokens"):
            chunk_documents(df, 0)


class TestResample:
    def test_gap_fill_semantics(self, spark):
        from xmidt_event_streams_spark.operators.resample import (
            resample_ffill,
        )

        rows = [
            (1, "2024-01-01 00:10:00", 1, 5.0),
            (2, "2024-01-01 00:50:00", 1, 7.0),   # same bucket: later wins
            (3, "2024-01-01 03:20:00", 1, 9.0),   # 2 gap buckets before
            (4, "2024-01-01 01:00:00", 2, 2.0),
        ]
        df = spark.createDataFrame(
            rows, "event_id long, ts string, user_id long, value double"
        ).withColumn("ts", F.to_timestamp("ts"))
        got = {
            (r["user_id"], str(r["bucket_ts"])): (r["value_ffill"], r["n_events"])
            for r in resample_ffill(df, interval_seconds=3600).collect()
        }
        assert got[(1, "2024-01-01 00:00:00")] == (7.0, 2)  # last-in-bucket
        assert got[(1, "2024-01-01 01:00:00")] == (7.0, 0)  # gap: ffill
        assert got[(1, "2024-01-01 02:00:00")] == (7.0, 0)
        assert got[(1, "2024-01-01 03:00:00")] == (9.0, 1)
        assert got[(2, "2024-01-01 01:00:00")] == (2.0, 1)
        # no extrapolation beyond each key's span
        assert len([k for k in got if k[0] == 2]) == 1

    def test_in_bucket_tie_is_deterministic(self, spark):
        from xmidt_event_streams_spark.operators.resample import (
            resample_ffill,
        )

        rows = [
            (10, "2024-01-01 00:30:00", 1, 3.0),
            (11, "2024-01-01 00:30:00", 1, 4.0),  # same ts: max id wins
        ]
        df = spark.createDataFrame(
            rows, "event_id long, ts string, user_id long, value double"
        ).withColumn("ts", F.to_timestamp("ts"))
        out = resample_ffill(df, interval_seconds=3600).collect()
        assert out[0]["value_ffill"] == 4.0


class TestResampleInterpolate:
    def test_linear_gap_values_and_duckdb_twin(self, spark):
        import duckdb

        from xmidt_event_streams_spark.operators.resample import (
            resample_interpolate,
        )

        rows = [
            (1, "2024-01-01 00:00:00", 1, 10.0),
            (2, "2024-01-01 04:00:00", 1, 30.0),  # 3 gap hours between
        ]
        df = spark.createDataFrame(
            rows, "event_id long, ts string, user_id long, value double"
        ).withColumn("ts", F.to_timestamp("ts"))
        got = {
            str(r["bucket_ts"]): r["value_interp"]
            for r in resample_interpolate(df, interval_seconds=3600).collect()
        }
        assert got["2024-01-01 01:00:00"] == 15.0
        assert got["2024-01-01 02:00:00"] == 20.0
        assert got["2024-01-01 03:00:00"] == 25.0
        assert got["2024-01-01 00:00:00"] == 10.0
        assert got["2024-01-01 04:00:00"] == 30.0

        # DuckDB twin over real data: same prev/next window construct
        sf = "/root/testdata/sf0.001"
        ev = load_tables(spark, sf, ("events",))["events"]
        I = 6 * 3600
        sgot = sorted(
            tuple(str(x) for x in r)
            for r in resample_interpolate(ev, interval_seconds=I).collect()
        )
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf}/events.parquet')"
        )
        cur = con.execute(f"""
            WITH b AS (
              SELECT user_id,
                CAST(to_timestamp((epoch(ts)::BIGINT // {I}) * {I}) AS TIMESTAMP) AS bkt,
                value, ts, event_id
              FROM events
            ), lastv AS (
              SELECT user_id, bkt, value AS lastv, n_events FROM (
                SELECT user_id, bkt, value,
                  row_number() OVER (PARTITION BY user_id, bkt
                                     ORDER BY ts DESC, event_id DESC) AS rn,
                  count(*) OVER (PARTITION BY user_id, bkt) AS n_events
                FROM b
              ) WHERE rn = 1
            ), spans AS (
              SELECT user_id, min(bkt) AS lo, max(bkt) AS hi
              FROM lastv GROUP BY user_id
            ), grid AS (
              SELECT user_id,
                unnest(generate_series(lo, hi, INTERVAL {I} SECONDS)) AS bucket_ts
              FROM spans
            ), j AS (
              SELECT g.user_id, g.bucket_ts, l.lastv, coalesce(l.n_events, 0) AS n_events,
                epoch(g.bucket_ts) AS t,
                CASE WHEN l.lastv IS NOT NULL THEN epoch(g.bucket_ts) END AS obs_t
              FROM grid g LEFT JOIN lastv l
                ON l.user_id = g.user_id AND l.bkt = g.bucket_ts
            )
            SELECT user_id, bucket_ts,
              round(CASE WHEN lastv IS NOT NULL THEN lastv ELSE
                last_value(lastv IGNORE NULLS) OVER wp
                + (first_value(lastv IGNORE NULLS) OVER wn
                   - last_value(lastv IGNORE NULLS) OVER wp)
                  * (t - last_value(obs_t IGNORE NULLS) OVER wp)
                  / (first_value(obs_t IGNORE NULLS) OVER wn
                     - last_value(obs_t IGNORE NULLS) OVER wp)
              END, 6) AS value_interp,
              n_events
            FROM j
            WINDOW
              wp AS (PARTITION BY user_id ORDER BY bucket_ts
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
              wn AS (PARTITION BY user_id ORDER BY bucket_ts
                     ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
        """)
        cols = [d[0] for d in cur.description]
        order = [cols.index(c) for c in
                 ["user_id", "bucket_ts", "value_interp", "n_events"]]
        swant = sorted(
            tuple(str(r[i]) for i in order) for r in cur.fetchall()
        )
        assert sgot == swant
