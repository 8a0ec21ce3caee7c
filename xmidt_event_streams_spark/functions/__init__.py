from xmidt_event_streams_spark.functions import text, time, vectors  # noqa: F401
