"""Structured Streaming variants of the pipeline (SURVEY §2a T1-T3)."""
