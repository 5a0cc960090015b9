"""nfl_data_pipeline_spark — a PySpark-native analytics engine.

A from-scratch reimplementation of the query and data-processing
capabilities of the reference repo ``guga31bb/nfl_data_pipeline``
(R + dplyr + SQLite), re-expressed Spark-first:

- declarative DataFrame/SQL plans (Catalyst optimizes; we never
  hand-schedule what the optimizer does),
- explicit schemas (the reference infers everything —
  ``1_rebuild_db.R:30``),
- partition-aware storage (``season``-partitioned parquet replaces the
  single SQLite file),
- order-made-explicit semantics (the reference silently relies on row
  order; see SURVEY.md §7 "hard parts"),
- plus the large-scale training-data operators the reference lacks:
  dedup (exact / MinHash-LSH / SimHash / Jaccard / embedding),
  similarity search, text analysis, multimodal column plumbing.
"""

from nfl_data_pipeline_spark.session import get_spark  # noqa: F401

__version__ = "0.1.0"
