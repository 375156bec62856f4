"""Operators (SURVEY.md §2.2–2.7 + LLM-data-pipeline additions)."""
