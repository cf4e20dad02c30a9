"""Structured Streaming surface (SURVEY.md §2 J1-J5)."""
