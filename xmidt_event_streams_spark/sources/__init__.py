from xmidt_event_streams_spark.sources.msgpack_wrp import (
    decode_wrp_msgpack,
    msgpack_decode,
    msgpack_encode,
)

__all__ = ["decode_wrp_msgpack", "msgpack_decode", "msgpack_encode"]
