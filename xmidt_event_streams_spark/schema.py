"""Schemas: the WRP message envelope and adapters for the test tables.

The WRP (Web Routing Protocol) message is the single data abstraction
of the reference (SURVEY.md §1.1; fields per wrp-go v3 as used by
internal/event/request_handler.go and filter/filter.go).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    IntegerType,
    MapType,
    StringType,
    StructField,
    StructType,
)

SIMPLE_EVENT_MSG_TYPE = 4  # wrp SimpleEventMessageType (request_handler.go:108)

# The WRP envelope as a Spark schema (SURVEY.md §1.1 field table).
WRP_SCHEMA = StructType(
    [
        StructField("msg_type", IntegerType(), False),
        StructField("source", StringType(), True),
        StructField("dest", StringType(), True),
        StructField("transaction_uuid", StringType(), True),
        StructField("content_type", StringType(), True),
        StructField("session_id", StringType(), True),
        StructField("partner_ids", ArrayType(StringType()), True),
        StructField("metadata", MapType(StringType(), StringType()), True),
        StructField("payload", BinaryType(), True),
    ]
)


def wrp_from_json(col: Column | str) -> Column:
    """V2: bytes/string -> WRP struct (from_json with the fixed schema).

    The JSON wire format of the reference (request_handler.go:62-77);
    the msgpack path is an edge decoder (see sources), everything
    downstream of decode is identical.
    """
    col = F.col(col) if isinstance(col, str) else col
    return F.from_json(col.cast("string"), WRP_SCHEMA)


def wrp_view(events: DataFrame) -> DataFrame:
    """Adapt the driver's generic ``events`` table to WRP shape.

    Deterministic, SQL-expressible mapping (the DuckDB oracle applies
    the same expressions -- see ``WRP_VIEW_SQL``):

      dest    = 'event:<event_type>/user-<user_id>/v'   (the reference's
                'event:<type>/<device>/<subtype>' layout,
                integrationTests/standard_events_test.go:16)
      source  = 'mac:<user_id zero-padded>'             (device locator)
      session_id, transaction_uuid derived from ids.
    """
    # SQL-text build (r10): the Column composition of these eleven
    # projections cost ~0.18 s of py4j round trips per query BUILD on
    # the driver; selectExpr parses the identical expressions in one
    # call (same CASE/concat/lpad semantics; every literal is fixed
    # text, no regex/escape surface). Works for batch and streaming
    # inputs alike.
    return events.selectExpr(
        "event_id",
        "ts",
        "user_id",
        "value",
        "props",
        # sprinkle non-SimpleEvent types so the V3 reject filter has work
        f"cast(CASE WHEN event_id % 17 = 0 THEN 3 ELSE "
        f"{SIMPLE_EVENT_MSG_TYPE} END as int) as msg_type",
        "concat('event:', event_type, '/user-', cast(user_id as string), "
        "'/v') as dest",
        "concat('mac:', lpad(cast(user_id as string), 12, '0')) as source",
        "concat('session-', cast(user_id as string)) as session_id",
        "CASE WHEN event_id % 10 = 0 THEN '' ELSE "
        "concat('txn-', cast(event_id as string)) END as transaction_uuid",
        "CASE WHEN event_id % 7 = 0 THEN '' ELSE 'application/json' END "
        "as content_type",
        "array('comcast', concat('partner-', cast(user_id % 5 as string))) "
        "as partner_ids",
    )


# DuckDB twin of wrp_view (kept column-for-column in sync; the harness
# composes oracles on top of this CTE).
WRP_VIEW_SQL = """
SELECT
  event_id,
  ts,
  user_id,
  value,
  props,
  CAST(CASE WHEN event_id % 17 = 0 THEN 3 ELSE 4 END AS INTEGER) AS msg_type,
  'event:' || event_type || '/user-' || CAST(user_id AS VARCHAR) || '/v' AS dest,
  'mac:' || lpad(CAST(user_id AS VARCHAR), 12, '0') AS source,
  'session-' || CAST(user_id AS VARCHAR) AS session_id,
  CASE WHEN event_id % 10 = 0 THEN '' ELSE 'txn-' || CAST(event_id AS VARCHAR) END AS transaction_uuid,
  CASE WHEN event_id % 7 = 0 THEN '' ELSE 'application/json' END AS content_type,
  ['comcast', 'partner-' || CAST(user_id % 5 AS VARCHAR)] AS partner_ids
FROM events
"""
