"""Declarative expectations gate (expectations.py): split/report
semantics, null-pass composition rules, and a DuckDB twin for the
violation counts over the events table."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from xmidt_event_streams_spark.expectations import (
    VIOLATIONS_COL,
    enforce,
    with_violations,
)

SCHEMA = "id long, color string, score double, ref long"
ROWS = [
    (1, "red", 5.0, 10),
    (2, "blue", 50.0, 11),
    (3, None, 5.0, 10),      # null color
    (4, "green", -1.0, 99),  # bad value + dangling ref
    (4, "red", 5.0, 10),     # duplicate id
    (5, "red", None, None),  # nulls pass range + FK
]


@pytest.fixture()
def df(spark):
    return spark.createDataFrame(ROWS, SCHEMA)


@pytest.fixture()
def ref(spark):
    return spark.createDataFrame([(10,), (11,)], "ref_id long")


def checks(ref):
    return [
        ("not_null", ["color"]),
        ("unique", ["id"]),
        ("accepted_values", "color", ["red", "blue"]),
        ("in_range", "score", 0.0, 100.0),
        ("foreign_key", "ref", ref, "ref_id"),
    ]


def test_row_level_ledger(spark, df, ref):
    ann = {
        (r["id"], r["color"]): sorted(r[VIOLATIONS_COL])
        for r in with_violations(df, checks(ref)).collect()
    }
    assert ann[(1, "red")] == []
    assert ann[(2, "blue")] == []
    assert ann[(3, None)] == ["not_null:color"]
    assert ann[(4, "green")] == [
        "accepted_values:color",
        "foreign_key:ref",
        "in_range:score",
        "unique:id",
    ]
    assert ann[(4, "red")] == ["unique:id"]  # BOTH dup copies flagged
    assert ann[(5, "red")] == []  # nulls pass range and FK


def test_enforce_split_and_report(spark, df, ref):
    passed, quarantined, report = enforce(df, checks(ref))
    assert sorted(r["id"] for r in passed.collect()) == [1, 2, 5]
    assert VIOLATIONS_COL not in passed.columns
    assert sorted(r["id"] for r in quarantined.collect()) == [3, 4, 4]
    rep = {r["check"]: r["n_violations"] for r in report.collect()}
    assert rep == {
        "not_null:color": 1,
        "unique:id": 2,
        "accepted_values:color": 1,
        "in_range:score": 1,
        "foreign_key:ref": 1,
    }
    assert report.collect()[0]["n_rows"] == len(ROWS)


def test_zero_violation_checks_visible(spark, df, ref):
    _, _, report = enforce(df, [("matches", "color", "^[a-z]*$")])
    rep = report.collect()
    assert rep[0]["check"] == "matches:color"
    assert rep[0]["n_violations"] == 0


def test_unknown_kind_rejected(spark, df):
    with pytest.raises(ValueError, match="unknown expectation"):
        with_violations(df, [("sorted", ["id"])])


def test_counts_match_duckdb_on_events(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    _, _, report = enforce(
        ev,
        [
            ("not_null", ["event_type"]),
            ("unique", ["event_id"]),
            ("matches", "event_type", "^[a-z_]+$"),
            ("in_range", "value", 0.0, 50.0),
        ],
    )
    rep = {r["check"]: r["n_violations"] for r in report.collect()}
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{sf_dir}/events.parquet')"
    )
    want = con.execute(
        """
        SELECT
          sum(CASE WHEN event_type IS NULL THEN 1 ELSE 0 END),
          sum(CASE WHEN cnt > 1 THEN 1 ELSE 0 END),
          sum(CASE WHEN event_type IS NOT NULL
                AND NOT regexp_matches(event_type, '^[a-z_]+$')
              THEN 1 ELSE 0 END),
          sum(CASE WHEN value IS NOT NULL
                AND NOT (value BETWEEN 0.0 AND 50.0) THEN 1 ELSE 0 END)
        FROM (SELECT *, count(*) OVER (PARTITION BY event_id) AS cnt
              FROM events)
        """
    ).fetchall()[0]
    con.close()
    assert rep["not_null:event_type"] == want[0]
    assert rep["unique:event_id"] == want[1]
    assert rep["matches:event_type"] == want[2]
    assert rep["in_range:value"] == want[3]


def test_narrow_checks_add_no_shuffle(spark, sf_dir):
    """Row-level checks must stay zero-Exchange (the unique/FK
    shuffles are opt-in costs, not a gate tax)."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    ann = with_violations(
        ev,
        [
            ("not_null", ["event_type"]),
            ("in_range", "value", 0.0, 100.0),
            ("matches", "event_type", "^[a-z_]+$"),
        ],
    )
    plan = ann._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert "Exchange" not in plan
