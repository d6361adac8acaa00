"""Windowed/stateful event processing: batch-exact forms + Structured Streaming."""
