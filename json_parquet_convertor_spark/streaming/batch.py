"""Streaming operators, batch-mode equivalents (SURVEY.md §2 B9) — Phase 3."""
