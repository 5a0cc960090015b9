"""Query registry: the SURVEY.md §2 operator inventory, each entry a
(PySpark plan, DuckDB oracle SQL) pair.

Every operator the reference exercises gets at least one registered
query over the driver fixture tables; the driver (and our tests) run
both sides at sf0.01 and hash-compare. Column names are aliased
identically on both sides (the driver sorts columns by name before
hashing).

Determinism rules applied throughout (see ``exact.py``):

- SUMs of money-scale doubles go through exact DECIMAL accumulation
  (order-independent) then back to double — a groupBy sum's merge
  order differs between Spark and DuckDB, and at sf0.1 the float
  error exceeds any sane rounding step.
- Window running sums are computed in the ORDER BY order on both
  engines, so they match bit-for-bit without the decimal detour.
- Every ranking window has a total-order tiebreak (the reference
  relies on silent row order — SURVEY §7 hard-part 1).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]


@dataclass
class QuerySpec:
    name: str
    spark: SparkQuery
    oracle: str | None  # ANSI SQL for DuckDB; None → rows-only check
    survey_ids: tuple[str, ...] = ()  # SURVEY.md §2 operator ids covered
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def register(
    name: str,
    oracle: str | None,
    survey_ids: tuple[str, ...] = (),
    doc: str = "",
):
    """Decorator: add a (spark_fn, oracle_sql) pair to the registry."""

    def deco(fn: SparkQuery) -> SparkQuery:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name}")
        REGISTRY[name] = QuerySpec(
            name=name, spark=fn, oracle=oracle, survey_ids=survey_ids, doc=doc or (fn.__doc__ or "")
        )
        return fn

    return deco


def all_queries() -> dict[str, QuerySpec]:
    # Import side-effect modules exactly once.
    from nfl_data_pipeline_spark.queries import (  # noqa: F401
        relational,
        windows,
        reshape,
        scalars,
        textops,
        dedup,
        similarity,
        udfs,
        sessions,
        extra,
        subqueries,
    )

    return REGISTRY
