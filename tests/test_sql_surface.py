"""The SQL-first entry surface (xmidt_event_streams_spark.sql):
registered views must make the whole engine usable from spark.sql
alone, compiling to the same results as the DataFrame API.
"""

from __future__ import annotations

from xmidt_event_streams_spark.sql import register_views


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_views_registered(spark, sf_dir):
    views = register_views(spark, sf_dir)
    for name in ("events", "lineitem", "wrp", "routed", "filters"):
        assert name in views
        assert spark.sql(f"SELECT * FROM {name} LIMIT 1").columns


def test_sql_equals_dataframe_on_flagship(spark, sf_dir):
    """The flagship aggregate written in pure SQL over the registered
    views must produce exactly the catalog DataFrame query's result
    (same Catalyst planning underneath)."""
    from xmidt_event_streams_spark.catalog import QUERIES

    register_views(spark, sf_dir)
    via_sql = spark.sql(
        """
        SELECT stream_name,
               CASE WHEN regexp_extract(dest, '^event:([^/]+)', 1) = ''
                    THEN 'unknown'
                    ELSE regexp_extract(dest, '^event:([^/]+)', 1)
               END AS event_type,
               count(*) AS n
        FROM routed GROUP BY 1, 2
        """
    )
    via_df = QUERIES["flagship_route_counts"].fn(spark, sf_dir)
    assert sorted(via_sql.columns) == sorted(via_df.columns)
    assert _rows(via_sql.select(*via_df.columns)) == _rows(via_df)


def test_filters_relation_contents(spark, sf_dir):
    from xmidt_event_streams_spark.config import DEFAULT_FILTERS

    register_views(spark, sf_dir)
    rows = spark.sql(
        "SELECT stream_name, size(events) AS ne FROM filters ORDER BY 1"
    ).collect()
    assert {r["stream_name"] for r in rows} == {
        fc.stream_name for fc in DEFAULT_FILTERS
    }


def test_sql_joins_wrp_to_dims(spark, sf_dir):
    """Cross-relation SQL works: wrp x events-derived aggregates."""
    register_views(spark, sf_dir)
    n = spark.sql(
        "SELECT count(*) AS n FROM wrp WHERE msg_type = 4"
    ).collect()[0]["n"]
    total = spark.sql("SELECT count(*) AS n FROM events").collect()[0]["n"]
    assert 0 < n < total
