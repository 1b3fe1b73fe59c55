"""Structured Streaming layer: event-time ops over CDC streams, stats
instrumentation, and snapshot-maintaining sinks."""
