"""Structured Streaming variant of the pipeline (SURVEY §2.11)."""
