"""Validation, enrichment, and extraction operators (SURVEY.md §2.2).

All pure Column expressions -- no UDFs, fully codegen'd, identical in
batch and streaming plans.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from xmidt_event_streams_spark.schema import SIMPLE_EVENT_MSG_TYPE

DEFAULT_CONTENT_TYPE = "application/json"  # request_handler.go:146-148

EVENT_TYPE_RE = r"^event:([^/]+)"  # wrp FindEventStringSubMatch analog


def valid_msg_type(col: Column | str = "msg_type") -> Column:
    """V3: accept only SimpleEvent (msg_type == 4)
    (reference: internal/event/request_handler.go:108-119)."""
    col = F.col(col) if isinstance(col, str) else col
    return col == SIMPLE_EVENT_MSG_TYPE


def not_null_guard(*cols: str) -> Column:
    """V7: nil-message guard (filter/filter_manager.go:121-124)."""
    pred = F.lit(True)
    for c in cols:
        pred = pred & F.col(c).isNotNull()
    return pred


def extract_event_type(dest: Column | str = "dest") -> Column:
    """V8: first path segment of an ``event:``-scheme destination;
    ``'unknown'`` when absent (filter/filter_manager.go:132,
    internal/metrics/tags.go:74-79 GetUnknownTagIfEmpty)."""
    dest = F.col(dest) if isinstance(dest, str) else dest
    ext = F.regexp_extract(dest, EVENT_TYPE_RE, 1)
    return F.when((ext == "") | dest.isNull(), F.lit("unknown")).otherwise(ext)


def fix_wrp(
    df: DataFrame,
    content_type_col: str = "content_type",
    txn_col: str = "transaction_uuid",
    reason_col: str = "fix_reason",
    deterministic_uuid_from: str | None = None,
) -> DataFrame:
    """V6 ``fixWrp`` enrichment (request_handler.go:140-162).

    Empty content_type -> 'application/json'; empty transaction UUID ->
    a fresh UUID; the modification is tagged in ``reason_col`` with the
    reference's reason taxonomy (event/metrics.go:34-37):
    empty_uuid / empty_content_type / empty_uuid_and_content_type / ''.

    ``deterministic_uuid_from``: when set, derive the replacement UUID
    from that column via md5 (UUIDv4-shaped, deterministic -- used by
    the oracle-checked queries; production path uses ``uuid()``).
    """
    ct = F.col(content_type_col)
    tx = F.col(txn_col)
    empty_ct = ct.isNull() | (ct == "")
    empty_tx = tx.isNull() | (tx == "")

    if deterministic_uuid_from:
        h = F.md5(F.col(deterministic_uuid_from).cast("string"))
        new_uuid = F.concat_ws(
            "-",
            F.substring(h, 1, 8),
            F.substring(h, 9, 4),
            F.substring(h, 13, 4),
            F.substring(h, 17, 4),
            F.substring(h, 21, 12),
        )
    else:
        new_uuid = F.expr("uuid()")

    reason = (
        F.when(empty_tx & empty_ct, F.lit("empty_uuid_and_content_type"))
        .when(empty_tx, F.lit("empty_uuid"))
        .when(empty_ct, F.lit("empty_content_type"))
        .otherwise(F.lit(""))
    )
    return (
        df.withColumn(reason_col, reason)
        .withColumn(
            content_type_col,
            F.when(empty_ct, F.lit(DEFAULT_CONTENT_TYPE)).otherwise(ct),
        )
        .withColumn(txn_col, F.when(empty_tx, new_uuid).otherwise(tx))
    )


def classify_rejects(
    df: DataFrame,
    msg_type_col: str | None = "msg_type",
    required_cols: tuple[str, ...] = (),
    reason_col: str = "reject_reason",
) -> DataFrame:
    """V3/V4/V7 as a rejects side-output: every row tagged with its
    first reject reason ('' = accepted). Feeds the M2/M3 drop counters
    as a real aggregate instead of a metrics side-channel."""
    reason = F.lit("")
    for c in reversed(required_cols):
        reason = F.when(F.col(c).isNull(), F.lit(f"null_{c}")).otherwise(reason)
    if msg_type_col is not None:
        reason = F.when(
            ~valid_msg_type(msg_type_col), F.lit("invalid_msg_type")
        ).otherwise(reason)
    return df.withColumn(reason_col, reason)
