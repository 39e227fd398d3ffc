"""Structured Streaming surface: micro-batch merge (the reference's
stream pattern) and real windows/watermarks/stateful ops."""
