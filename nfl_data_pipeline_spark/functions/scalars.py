"""Domain scalar vocabulary — the reference's repeated formulas as
named Column builders (all JVM-side expressions, codegen-friendly).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def american_odds_to_prob(odds: Column | str) -> Column:
    """Implied probability from signed American odds —
    ``R/nfl_draft_espn_dk.R:21-26`` (`100/(odds+100)` favorites,
    `|odds|/(|odds|+100)` underdogs)."""
    o = _c(odds).cast("double")
    # branch on o > 0 exactly as the reference (`odds > 0`,
    # R/nfl_draft_espn_dk.R:21-26); odds == 0 is not a real American
    # line but the branch shape is aligned anyway.
    return F.when(o > 0, 100.0 / (o + 100.0)).otherwise(
        F.abs(o) / (F.abs(o) + 100.0)
    )


def logit(p: Column | str) -> Column:
    """``log(qbr/(1-qbr))`` — R/epa_predict.R:224-225."""
    p = _c(p)
    return F.log(p / (1.0 - p))


def inv_logit(z: Column | str) -> Column:
    z = _c(z)
    return 1.0 / (1.0 + F.exp(-z))


def clamp(col: Column | str, lo: float, hi: float) -> Column:
    """``if_else(epa < -4.5, -4.5, epa)`` generalized —
    R/epa_predict.R:197-200. NULL- and NaN-preserving (both map to
    NULL): R's if_else on an NA OR NaN condition yields NA (is.na(NaN)
    is TRUE), but Spark's GREATEST/LEAST SKIP nulls and total-order
    NaN as the LARGEST double — either input would silently clamp to
    a bound (a NULL qb_epa play became adjusted_epa = hi = 1e9; a NaN
    would too — both caught by the r9 strict-aggregate audit +
    review)."""
    c = _c(col)
    return F.when(
        c.isNull() | F.isnan(c), F.lit(None).cast("double")
    ).otherwise(F.greatest(F.least(c, F.lit(hi)), F.lit(lo)))


def calibration_bin(p: Column | str, width: float = 0.01) -> Column:
    """WP calibration bin — ``round(wp/0.01)*.01`` (R/espn_wp.R:89).

    Uses bround (R's HALF_EVEN) for R parity; oracle-facing queries
    use floor-binning instead (exact across engines).
    """
    return F.bround(_c(p) / width, 0) * width


def log_loss_expr(y: Column | str, p: Column | str) -> Column:
    """Aggregate LogLoss — MLmetrics::LogLoss (R/espn_wp.R:236-274):
    mean of -(y·ln p + (1-y)·ln(1-p)), inputs pre-clamped."""
    y = _c(y).cast("double")
    p = _c(p)
    return F.avg(-(y * F.log(p) + (1.0 - y) * F.log(1.0 - p)))


def minmax_rescale(col: Column | str, lo: Column, hi: Column) -> Column:
    """``100*(x-min)/max(x-min)`` per group (pff/99_passblock_piece.R:43-53);
    lo/hi are window aggregates supplied by the caller."""
    c = _c(col)
    return 100.0 * (c - lo) / (hi - lo)
