"""Structured Streaming surface (scale extension; the reference is
batch-only — SURVEY.md §2.10)."""
