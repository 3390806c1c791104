"""Structured Streaming variant of the engine (SURVEY.md §2.3)."""
