"""Structured Streaming surface: watermarked windowed aggregation and
custom stateful sessionization over the events stream."""
