"""Source connectors (SURVEY.md §2.1): schema-explicit readers for the
formats the reference ingests, and partition-aware writers."""
