from xmidt_event_streams_spark.streaming.router import start_routing

__all__ = ["start_routing"]
