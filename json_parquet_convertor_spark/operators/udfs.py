"""UDF / UDAF / UDTF surface (SURVEY.md §2 B10) — Phase 4."""
