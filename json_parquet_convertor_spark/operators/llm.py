"""LLM-data-pipeline operators (SURVEY.md §2 B11) — Phase 4."""
