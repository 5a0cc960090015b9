"""The vig-removal fixed point must actually converge: post-loop
per-group probability sums ≈ 1.0 (the reference's implicit contract —
R/nfl_draft_espn_dk.R:30-40 iterates until the books balance)."""

from __future__ import annotations

from pyspark.sql import functions as F

from nfl_data_pipeline_spark.queries import all_queries
from tests.conftest import SF_SMOKE


def test_vig_sums_converge_to_one(spark):
    out = all_queries()["vig_removal"].spark(spark, SF_SMOKE)
    bad = (
        out.groupBy("player")
        .agg(F.sum("pct").alias("s"))
        .filter(F.abs(F.col("s") - 1.0) >= 1e-6)
        .count()
    )
    assert bad == 0
    assert out.count() == 3000  # 1500 books × 2 legs at sf0.001
