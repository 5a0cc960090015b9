"""Driver-rows → DataFrame without a Python-worker scan.

``spark.createDataFrame(list_of_rows)`` builds a PICKLED PARALLELIZE
plan: ``Scan ExistingRDD`` whose every task round-trips through a
Python worker — measured (r13, warm local[32] session) at ~0.1-0.5 s
of executor time PER TASK, i.e. 3-15 s of executor time per action
for a 32-slice frame, EVEN when the frame is empty and EVEN after a
``localCheckpoint`` (the checkpointed RDD still re-enters Python on
every scan). Every driver-computed table the engine attaches back to
a query — union-find labels, per-stratum quotas and offsets, collected
state deltas — was paying that tax once per consumer action.

Two replacements (guide §4 — eliminate the JVM↔Python boundary):

- ``local_frame(spark, rows, schema)``: routes the rows through
  pandas + Arrow (``spark.sql.execution.arrow.pyspark.enabled``),
  which converts ONCE on the driver into Arrow record batches; the
  executed scan is pure JVM (measured ~50× less executor time than
  the pickled path). Falls back to plain ``createDataFrame`` when the
  conversion cannot represent a value (exotic objects) — correctness
  never depends on the fast path.
- ``empty_frame(spark, schema)``: a ``WHERE false`` projection that
  the optimizer folds to an empty ``LocalRelation`` —
  ``LocalTableScan <empty>``, ZERO tasks, where
  ``createDataFrame([], schema)`` schedules a full-width empty
  Python scan per action.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _as_struct(schema) -> T.StructType:
    if isinstance(schema, T.StructType):
        return schema
    return T._parse_datatype_string(schema)


def empty_frame(spark: SparkSession, schema) -> DataFrame:
    """Empty DataFrame with ``schema`` as a true empty LocalRelation
    (the ``Filter(false)`` → ``PruneFilters`` fold): zero tasks on
    every action, vs 32 Python-worker tasks for the parallelize
    form."""
    st = _as_struct(schema)
    cols = [
        F.lit(None).cast(f.dataType).alias(f.name) for f in st.fields
    ]
    return spark.range(1).select(*cols).where(F.lit(False))


def local_frame(spark: SparkSession, rows, schema) -> DataFrame:
    """Driver rows (list of tuples / Rows / dicts) → DataFrame whose
    executed scan never enters a Python worker (Arrow batches built
    once on the driver). Semantics match ``createDataFrame(rows,
    schema)``; the pickled path remains as fallback for values pandas
    or Arrow cannot represent."""
    st = _as_struct(schema)
    rows = list(rows)
    if not rows:
        return empty_frame(spark, st)
    try:
        import pandas as pd

        names = [f.name for f in st.fields]
        if isinstance(rows[0], dict):
            recs = [[r.get(n) for n in names] for r in rows]
        else:  # tuples / pyspark Rows (positional — createDataFrame
            # applies list schemas positionally too)
            recs = [list(r) for r in rows]
        # object dtype AT CONSTRUCTION: pandas must not infer (ints
        # with None would become float64 + NaN, and NaN converts to
        # NULL where the pickled path keeps it); the Arrow conversion
        # casts per the explicit schema, None stays NULL, NaN stays
        # NaN
        pdf = pd.DataFrame(recs, columns=names, dtype=object)
        return spark.createDataFrame(pdf, st)
    except Exception:  # pragma: no cover - exotic-value fallback
        return spark.createDataFrame(rows, st)
