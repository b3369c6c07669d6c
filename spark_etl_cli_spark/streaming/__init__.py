"""Structured Streaming support: stream sources/sinks and serdes."""
