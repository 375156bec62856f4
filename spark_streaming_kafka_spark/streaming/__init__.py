"""Structured Streaming pipelines (SURVEY.md §2.10, X1–X5)."""
