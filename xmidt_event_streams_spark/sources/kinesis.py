"""Kinesis source adapter: read back the WRP stream the reference's
own sink writes (internal/sender/kinesis_sender.go publishes each
event as a JSON-serialized WRP record with a device partition key --
the K1/K2 path this package mirrors in sinks/writer.py).

Same split as sources/kafka.py: the thin reader needs a Kinesis
connector on the cluster classpath (absent here, raises guidance);
:func:`decode_kinesis_records` is a pure DataFrame transformation
from the Kinesis record shape (``data`` binary + stream/shard/sequence
provenance) to WRP columns, fully tested in-container -- including the
ROUND TRIP: rows delivered through this package's chunked sender
decode back to the original events (tests/test_kinesis_source.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from xmidt_event_streams_spark.schema import WRP_SCHEMA
from xmidt_event_streams_spark.sources.msgpack_wrp import decode_wrp_msgpack

KINESIS_PROVENANCE = ("streamName", "shardId", "sequenceNumber")


def decode_kinesis_records(
    df: DataFrame, value_format: str = "json"
) -> DataFrame:
    """Kinesis record frame -> WRP columns + provenance.

    ``df`` carries the connector's record shape (at minimum ``data``
    binary plus ``streamName``/``shardId``/``sequenceNumber``).
    Default ``value_format="json"`` because that is what the
    reference PUBLISHES (wrp JSON marshal, K1); ``"msgpack"`` decodes
    the edge wire format for pipelines that forward raw WRP.
    Undecodable records surface as reject rows with ``decode_error``
    set and their provenance intact (traceable to the exact shard
    position), never task failures.
    """
    if value_format == "msgpack":
        return decode_wrp_msgpack(
            df, payload_col="data", keep_cols=KINESIS_PROVENANCE
        )
    if value_format == "json":
        parsed = df.select(
            F.from_json(F.col("data").cast("string"), WRP_SCHEMA).alias("w"),
            *KINESIS_PROVENANCE,
        )
        bad = (
            F.col("w.msg_type").isNull()
            & F.col("w.source").isNull()
            & F.col("w.dest").isNull()
        )
        return parsed.select(
            "w.*",
            F.when(bad, F.lit("invalid json")).alias("decode_error"),
            *KINESIS_PROVENANCE,
        )
    raise ValueError(f"value_format must be json|msgpack, got {value_format!r}")


def kinesis_wrp_stream(
    spark: SparkSession,
    stream_name: str,
    region: str,
    endpoint_url: str | None = None,
    starting_position: str = "TRIM_HORIZON",
    value_format: str = "json",
) -> DataFrame:
    """Streaming WRP source over Kinesis: reader options + decode.
    Requires a Kinesis connector (e.g. spark-streaming-sql-kinesis)
    on the classpath; raises with packaging guidance when absent so
    the failure is actionable."""
    reader = (
        spark.readStream.format("aws-kinesis")
        .option("kinesis.streamName", stream_name)
        .option("kinesis.region", region)
        .option("kinesis.startingPosition", starting_position)
    )
    if endpoint_url:
        reader = reader.option("kinesis.endpointUrl", endpoint_url)
    try:
        raw = reader.load()
    except Exception as exc:
        if "kinesis" in str(exc).lower():
            raise RuntimeError(
                "Kinesis connector not on the classpath; submit with the "
                "spark-streaming-sql-kinesis connector package "
                "(decode_kinesis_records itself has no connector dependency)"
            ) from exc
        raise
    return decode_kinesis_records(raw, value_format)
