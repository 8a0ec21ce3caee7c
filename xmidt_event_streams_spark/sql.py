"""SQL-first entry surface: register every relation as a temp view so
the whole engine is usable from ``spark.sql`` alone.

``load_tables`` already registers the raw driver tables; this module
adds the derived relations a SQL user needs (the WRP envelope view,
the routed fan-out, the static filter relation), so queries like

    SELECT stream_name, count(*) FROM routed GROUP BY 1

work with no DataFrame code. Views are lazy logical plans -- SQL over
them compiles to the SAME Catalyst plans as the DataFrame API (one
plan audit covers both surfaces; tests/test_sql_surface.py pins the
equivalence on the flagship aggregate).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from xmidt_event_streams_spark.config import DEFAULT_FILTERS, FilterConfig
from xmidt_event_streams_spark.routing import filters_to_df, route_union
from xmidt_event_streams_spark.schema import wrp_view
from xmidt_event_streams_spark.session import load_tables


def register_views(
    spark: SparkSession,
    sf_dir: str,
    filters: tuple[FilterConfig, ...] = DEFAULT_FILTERS,
) -> dict[str, DataFrame]:
    """Register the raw tables plus derived relations as temp views:

      * the 10 driver tables (``events``, ``lineitem``, ...);
      * ``wrp``      -- the WRP envelope view over events;
      * ``routed``   -- the fan-out relation (one row per message x
                        matching filter), tagged with ``stream_name``;
      * ``filters``  -- the static filter-config relation.

    Returns name -> DataFrame for callers that want both surfaces.

    Works on a VANILLA session: the two runtime confs the data
    requires (nanos-typed parquet timestamps; UTC canonical time) are
    set here, same as the driver contract does.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    out = dict(load_tables(spark, sf_dir))
    wrp = wrp_view(out["events"])
    routed = route_union(wrp, filters)
    fdf = filters_to_df(spark, filters)
    for name, df in (("wrp", wrp), ("routed", routed), ("filters", fdf)):
        df.createOrReplaceTempView(name)
        out[name] = df
    return out
