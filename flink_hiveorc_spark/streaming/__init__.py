"""Structured Streaming surface (SURVEY.md §2.8 T1-T8 parity)."""
