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


# ---- exact distributed IRLS logistic regression --------------------------
# The iterative counterpart of the SQL regression aggregates: each
# IRLS step is ONE corpus pass computing 9 weighted moment sums in
# DECIMAL (exact, order-independent — queries/exact.py), and the 3×3
# weighted normal equations solve with Cramer expressions whose
# ARITHMETIC SHAPE is shared between the Python driver (computed
# directly, same operation order) and the DuckDB oracle (the
# templates below as SQL) — identical parse trees → identical double
# arithmetic → bit-identical betas on both engines.
# The per-row stage embeds the previous betas (literals on the Spark
# side, CTE columns on the oracle side — same values), so the whole
# 3-iteration fit hash-matches.

IRLS_SUM_NAMES = ("s11", "s12", "s13", "s22", "s23", "s33", "r1", "r2", "r3")

_DET = (
    "(({s11})*(({s22})*({s33})-({s23})*({s23}))"
    " - ({s12})*(({s12})*({s33})-({s23})*({s13}))"
    " + ({s13})*(({s12})*({s23})-({s22})*({s13})))"
)
IRLS_BETA_TEMPLATES = {
    "beta0": (
        "((({r1})*(({s22})*({s33})-({s23})*({s23}))"
        " - ({s12})*(({r2})*({s33})-({s23})*({r3}))"
        " + ({s13})*(({r2})*({s23})-({s22})*({r3}))) / " + _DET + ")"
    ),
    "beta1": (
        "((({s11})*(({r2})*({s33})-({s23})*({r3}))"
        " - ({r1})*(({s12})*({s33})-({s23})*({s13}))"
        " + ({s13})*(({s12})*({r3})-({r2})*({s13}))) / " + _DET + ")"
    ),
    "beta2": (
        "((({s11})*(({s22})*({r3})-({r2})*({s23}))"
        " - ({s12})*(({s12})*({r3})-({r2})*({s13}))"
        " + ({r1})*(({s12})*({s23})-({s22})*({s13}))) / " + _DET + ")"
    ),
}


def irls_row_exprs(
    y: str, x1: str, x2: str, b0: str, b1: str, b2: str
) -> dict[str, str]:
    """Per-row IRLS working quantities as engine-portable SQL: the
    logistic mean under the CURRENT betas, its variance weight, and
    the working response z = η + (y − μ)/w."""
    eta = f"(({b0}) + ({b1})*({x1}) + ({b2})*({x2}))"
    mu = f"(1.0 / (1.0 + exp(-{eta})))"
    w = f"({mu} * (1.0 - {mu}))"
    z = f"({eta} + (({y}) - {mu}) / {w})"
    return {"eta": eta, "mu": mu, "w": w, "z": z, "x1": x1, "x2": x2}


def irls_sum_exprs(
    y: str, x1: str, x2: str, b0: str, b1: str, b2: str
) -> dict[str, str]:
    """The 9 decimal-exact moment sums of one IRLS step (same SQL
    text on both engines; DECIMAL accumulate → DOUBLE result)."""
    q = irls_row_exprs(y, x1, x2, b0, b1, b2)
    w, z = q["w"], q["z"]
    raw = {
        "s11": f"{w}",
        "s12": f"{w}*({x1})",
        "s13": f"{w}*({x2})",
        "s22": f"{w}*({x1})*({x1})",
        "s23": f"{w}*({x1})*({x2})",
        "s33": f"{w}*({x2})*({x2})",
        "r1": f"{w}*{z}",
        "r2": f"{w}*({x1})*{z}",
        "r3": f"{w}*({x2})*{z}",
    }
    return {
        k: f"CAST(SUM(CAST(({v}) AS DECIMAL(30,6))) AS DOUBLE)"
        for k, v in raw.items()
    }


def cramer_solve_3x3(
    vals: dict[str, float],
) -> tuple[float, float, float]:
    """The 3×3 weighted-normal-equations Cramer solve, computed
    directly in Python with EXACTLY the operation order and grouping
    of ``IRLS_BETA_TEMPLATES`` (which the DuckDB oracle executes as
    SQL). IEEE doubles with the same parse shape give bit-identical
    results on both engines — no ``eval`` needed, the templates stay
    the oracle-side contract."""
    s11, s12, s13 = vals["s11"], vals["s12"], vals["s13"]
    s22, s23, s33 = vals["s22"], vals["s23"], vals["s33"]
    r1, r2, r3 = vals["r1"], vals["r2"], vals["r3"]
    det = (
        s11 * (s22 * s33 - s23 * s23)
        - s12 * (s12 * s33 - s23 * s13)
        + s13 * (s12 * s23 - s22 * s13)
    )
    beta0 = (
        r1 * (s22 * s33 - s23 * s23)
        - s12 * (r2 * s33 - s23 * r3)
        + s13 * (r2 * s23 - s22 * r3)
    ) / det
    beta1 = (
        s11 * (r2 * s33 - s23 * r3)
        - r1 * (s12 * s33 - s23 * s13)
        + s13 * (s12 * r3 - r2 * s13)
    ) / det
    beta2 = (
        s11 * (s22 * r3 - r2 * s23)
        - s12 * (s12 * r3 - r2 * s13)
        + r1 * (s12 * s23 - s22 * s13)
    ) / det
    return beta0, beta1, beta2


def logistic_irls_exact(
    df: DataFrame,
    y: str,
    x1: str,
    x2: str,
    n_iter: int = 3,
) -> tuple[float, float, float]:
    """Fit logit(y) ~ 1 + x1 + x2 by ``n_iter`` IRLS steps from
    β = 0, one exact-decimal aggregate pass per step. The Cramer
    solve runs driver-side with the SAME arithmetic shape the oracle
    executes as SQL (``cramer_solve_3x3`` mirrors
    ``IRLS_BETA_TEMPLATES`` operation-for-operation), so the betas
    are bit-identical on both engines."""
    from pyspark.sql import functions as F

    beta = (0.0, 0.0, 0.0)
    for _ in range(n_iter):
        sums = irls_sum_exprs(
            y, x1, x2, repr(beta[0]), repr(beta[1]), repr(beta[2])
        )
        row = df.agg(
            *[F.expr(e).alias(k) for k, e in sums.items()]
        ).first()
        beta = cramer_solve_3x3(
            {k: float(row[k]) for k in IRLS_SUM_NAMES}
        )
    return beta


def grouped_logit(
    df: DataFrame,
    group_cols: Sequence[str],
    y_col: str,
    x_cols: Sequence[str],
    n_iter: int = 8,
) -> DataFrame:
    """Per-group logistic regression (with intercept) — the
    classification sibling of ``grouped_ols``, same distributed
    shape: groups co-locate via the groupBy shuffle, each fits where
    its rows live (numpy IRLS, Arrow-batched), one coefficient row
    returns per group. Degenerate groups (single class, fewer rows
    than parameters, or a separated/singular IRLS step) return NULL
    coefficients instead of diverging."""
    group_cols = list(group_cols)
    x_cols = list(x_cols)
    group_fields = [df.schema[c] for c in group_cols]
    out_schema = T.StructType(
        [
            *group_fields,
            T.StructField("coefs", T.ArrayType(T.DoubleType())),
            T.StructField("intercept", T.DoubleType()),
            T.StructField("n", T.LongType()),
        ]
    )

    def _fit(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        keys = {c: pdf[c].iloc[0] for c in group_cols}
        sub = pdf[[y_col, *x_cols]].dropna()
        n = len(sub)
        coefs, intercept = None, None
        y = sub[y_col].to_numpy(dtype=float)
        if n >= len(x_cols) + 1 and 0.0 < y.mean() < 1.0:
            x = np.column_stack(
                [np.ones(n)]
                + [sub[c].to_numpy(dtype=float) for c in x_cols]
            )
            beta = np.zeros(x.shape[1])
            ok = True
            for _ in range(n_iter):
                mu = 1.0 / (1.0 + np.exp(-(x @ beta)))
                w = mu * (1.0 - mu)
                if not np.all(np.isfinite(w)) or w.max() < 1e-12:
                    ok = False
                    break
                z = x @ beta + (y - mu) / np.maximum(w, 1e-12)
                a = x.T @ (w[:, None] * x)
                try:
                    beta = np.linalg.solve(a, x.T @ (w * z))
                except np.linalg.LinAlgError:
                    ok = False
                    break
            if ok and np.all(np.isfinite(beta)):
                intercept = float(beta[0])
                coefs = [float(b) for b in beta[1:]]
        return pd.DataFrame(
            [{**keys, "coefs": coefs, "intercept": intercept, "n": n}]
        )

    return (
        df.select(*group_cols, y_col, *x_cols)
        .groupBy(*group_cols)
        .applyInPandas(_fit, out_schema)
    )


def grouped_logistic_irls_exact(
    df: DataFrame,
    group_col: str,
    y: str,
    x1: str,
    x2: str,
    n_iter: int = 3,
) -> list[tuple]:
    """Per-group ``logistic_irls_exact``: fit logit(y) ~ 1 + x1 + x2
    independently for every value of ``group_col`` with the SAME
    exact-decimal contract as the corpus fit — each iteration is ONE
    grouped aggregate pass (the 9 moment sums per group, map-side
    combined), the per-group Cramer solves run driver-side over
    #groups rows, and the next iteration's betas enter the plan as a
    CASE over repr literals. Group count is the driver-memory bound
    (the low-cardinality contract shared with grouped_ols's
    coefficients frame); string group keys.

    Returns [(group, beta0, beta1, beta2, n)] sorted by group — the
    distributed-IRLS sibling of ``grouped_logit`` (numpy
    applyInPandas) for when the ORACLE-exact arithmetic matters more
    than per-group vectorization."""
    from pyspark.sql import functions as F

    if n_iter < 1:
        # counts and the NULL-key refusal ride iteration 1's
        # aggregate (r12); with zero iterations nothing would be
        # scanned and the result would silently be [] — refuse
        # explicitly (ADVICE r12)
        raise ValueError(
            f"grouped_logistic_irls_exact needs n_iter >= 1, got "
            f"{n_iter}"
        )
    betas: dict = {}
    counts: dict = {}

    def _q(g: str) -> str:
        return "'" + str(g).replace("'", "''") + "'"

    def case_of(i: int) -> str:
        arms = " ".join(
            f"WHEN {_q(g)} THEN {betas[g][i]!r}"
            for g in sorted(betas)
            if betas[g][0] is not None
        )
        return f"(CASE {group_col} {arms} ELSE 0.0 END)"

    dead = (None, None, None)
    for it in range(n_iter):
        if it == 0:
            # β = 0 everywhere on the first pass, so no CASE is
            # needed — and the per-group row counts ride this pass's
            # aggregate instead of costing their own corpus scan
            # (one fewer action; the NULL-key refusal below fires
            # after this first collect instead of before any work).
            sums = irls_sum_exprs(y, x1, x2, "0.0", "0.0", "0.0")
        else:
            sums = irls_sum_exprs(
                y, x1, x2, case_of(0), case_of(1), case_of(2)
            )
        aggs = [F.expr(e).alias(k) for k, e in sums.items()]
        if it == 0:
            aggs.append(F.count("*").alias("_n"))
        rows = df.groupBy(group_col).agg(*aggs).collect()
        if it == 0:
            counts = {r[group_col]: r["_n"] for r in rows}
            if any(g is None for g in counts):
                # a NULL key never matches the CASE arms (its betas
                # would silently freeze at the first iteration) and
                # the grouped oracle's USING join drops it — refuse
                # rather than diverge
                raise ValueError(
                    f"grouped_logistic_irls_exact: NULL {group_col} "
                    "group — filter NULL keys out (or impute) before "
                    "fitting"
                )
            betas = {g: (0.0, 0.0, 0.0) for g in counts}
        for r in rows:
            g = r[group_col]
            if betas[g][0] is None:
                continue  # degenerate group stays dead
            try:
                vals = {k: float(r[k]) for k in IRLS_SUM_NAMES}
                betas[g] = cramer_solve_3x3(vals)
                if not all(
                    b == b and abs(b) != float("inf") for b in betas[g]
                ):
                    betas[g] = dead
            except (TypeError, ZeroDivisionError):
                # all-NULL feature sums / exactly singular normal
                # equations: NULL coefficients, like grouped_logit —
                # one bad slice must not abort the other groups'
                # fits (the oracle contract covers non-degenerate
                # groups only; declared in the query doc)
                betas[g] = dead
    return [
        (g, *betas[g], int(counts[g])) for g in sorted(betas)
    ]
