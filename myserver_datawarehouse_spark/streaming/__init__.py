"""Structured Streaming variants of the hourly batch pipeline
(SURVEY.md §2.12)."""
