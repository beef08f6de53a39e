"""Structured Streaming surface of the quality filter."""
