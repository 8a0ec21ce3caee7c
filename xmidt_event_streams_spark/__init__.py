"""PySpark-native event-streams analytics engine.

A from-scratch re-expression of the capabilities of
``xmidt-org/xmidt-event-streams`` (a Go WRP event-routing service:
regex filter fan-out -> bounded micro-batch queues -> Kinesis delivery
with retry/failover) on Apache Spark, plus the large-scale
training-data-pipeline operators (dedup, similarity search, multimodal
columns, text analysis) such an engine needs at 100 TB scale.

Design rules (see SURVEY.md):
  * DataFrame/SQL everywhere; Catalyst does the optimizing.
  * The routing "query" is compiled from config to Column predicates
    (reference: filter/filter_factory.go:129-168) -- no per-row Python.
  * Streaming = Structured Streaming; the same Column transformations
    serve batch and stream.
  * Python UDFs only where built-ins genuinely cannot express the
    semantics (msgpack edge decode, multimodal feature stubs).
"""

from xmidt_event_streams_spark.config import FilterConfig, load_filter_configs
from xmidt_event_streams_spark.routing import compile_filters, route, route_crossjoin

__all__ = [
    "FilterConfig",
    "load_filter_configs",
    "compile_filters",
    "route",
    "route_crossjoin",
]

__version__ = "0.1.0"
