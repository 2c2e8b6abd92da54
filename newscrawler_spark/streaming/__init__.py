"""Structured Streaming analogs of the reference's scheduler loop."""
