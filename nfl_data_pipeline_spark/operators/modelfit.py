"""Grouped model fitting — the reference's per-slice ``lm()``/GAM
pattern (R/preseason_predictiveness.R:150-151 fits on a slice;
darko/2_ourlads_projections.R:123-139 scores per position group) as a
distributed grouped-map.

``applyInPandas`` (GroupedData grouped-map) is the right Spark shape:
each group's rows co-locate on one executor via the groupBy shuffle,
the fit runs where the data lives (numpy, Arrow-batched), and only
the coefficients come back — one small row per group, never the
training data. Fits as many models as groups, in parallel, bounded
by the largest single group (a skewed group is the scale limit — at
100 TB sample within group before fitting).
"""

from __future__ import annotations

from collections.abc import Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T


def grouped_ols(
    df: DataFrame,
    group_cols: Sequence[str],
    y_col: str,
    x_cols: Sequence[str],
) -> DataFrame:
    """Per-group ordinary least squares (with intercept): returns one
    row per group — coefficients (ordered as ``x_cols``), intercept,
    R², n. Null rows are dropped per group (R's ``lm`` na.omit).
    Singular/underdetermined groups return NULL coefficients.
    """
    group_cols = list(group_cols)
    x_cols = list(x_cols)
    group_fields = [df.schema[c] for c in group_cols]
    out_schema = T.StructType(
        [
            *group_fields,
            T.StructField("coefs", T.ArrayType(T.DoubleType())),
            T.StructField("intercept", T.DoubleType()),
            T.StructField("r2", T.DoubleType()),
            T.StructField("n", T.LongType()),
        ]
    )

    def _fit(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        keys = {c: pdf[c].iloc[0] for c in group_cols}
        sub = pdf[[y_col, *x_cols]].dropna()
        n = len(sub)
        coefs, intercept, r2 = None, None, None
        if n >= len(x_cols) + 1:
            x = np.column_stack(
                [np.ones(n)] + [sub[c].to_numpy(dtype=float) for c in x_cols]
            )
            y = sub[y_col].to_numpy(dtype=float)
            beta, *_ = np.linalg.lstsq(x, y, rcond=None)
            pred = x @ beta
            ss_res = float(((y - pred) ** 2).sum())
            ss_tot = float(((y - y.mean()) ** 2).sum())
            intercept = float(beta[0])
            coefs = [float(b) for b in beta[1:]]
            r2 = 1.0 - ss_res / ss_tot if ss_tot > 0 else None
        return pd.DataFrame(
            [{**keys, "coefs": coefs, "intercept": intercept, "r2": r2, "n": n}]
        )

    return (
        df.select(*group_cols, y_col, *x_cols)
        .groupBy(*group_cols)
        .applyInPandas(_fit, out_schema)
    )
