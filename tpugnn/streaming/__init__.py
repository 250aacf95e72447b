"""Streaming (sliding-window) decoding over unbounded syndrome streams."""

from tpugnn.streaming.window import (  # noqa: F401
    SlidingWindowDecoder,
    sample_stream,
    stream_ler,
)

__all__ = ["SlidingWindowDecoder", "sample_stream", "stream_ler"]
