"""Structured Streaming: incremental index maintenance + windowed analytics."""
