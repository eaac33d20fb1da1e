"""Scalar function families (SURVEY.md §2 B8) — populated in Phase 2."""
