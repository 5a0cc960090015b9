"""Ingestion lifecycle jobs (SURVEY.md §3): full rebuild, incremental
merge-append, plus the streaming variant in ``streaming/``."""
