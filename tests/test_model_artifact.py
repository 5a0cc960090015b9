"""Persisted-model round-trip (U1-U3): the artifact on disk is the
source of truth for scoring — save → load → score must survive a
process-fresh reload, matching R/epa_predict.R:10-16's
readRDS-then-predict contract."""

from __future__ import annotations

import math
import os

from nfl_data_pipeline_spark.models import (
    clear_artifact_cache,
    load_artifact,
    save_artifact,
)
from tests.conftest import SF_SMOKE


def test_artifact_roundtrip_bit_exact(tmp_path):
    m = load_artifact()
    p = str(tmp_path / "model.json")
    save_artifact(m, p)
    clear_artifact_cache()
    m2 = load_artifact(p)
    # shortest-roundtrip json floats reload bit-identically
    assert m2 == m


def test_refit_reproduces_committed_artifact():
    """The committed artifact is exactly what tools/fit_return_model.py
    produces on the sf0.001 fixture — deterministic GD, no RNG."""
    import numpy as np
    import pyarrow.parquet as pq

    import tools.fit_return_model as fit

    t = pq.read_table(
        f"{SF_SMOKE}/lineitem.parquet",
        columns=["l_quantity", "l_discount", "l_extendedprice", "l_returnflag"],
    ).to_pandas()
    X = t[["l_quantity", "l_discount", "l_extendedprice"]].to_numpy(np.float64)
    y = (t["l_returnflag"] == "R").to_numpy(np.float64)
    b0, b_qty, b_disc, b_price = fit.fit_logistic(X, y)
    m = load_artifact()
    # rel_tol 1e-9, not ==: the GD loop itself is deterministic, but
    # numpy's BLAS matmul reduction order varies across builds/thread
    # counts, shifting the last few ULPs between container images.
    for got, want in zip(
        (b0, b_qty, b_disc, b_price),
        (m["b0"], m["b_qty"], m["b_disc"], m["b_price"]),
    ):
        assert math.isclose(got, want, rel_tol=1e-9, abs_tol=1e-15)


def test_udf_scores_from_artifact(spark):
    """Scoring goes through the persisted file: scores computed by the
    pandas_udf equal a driver-side sigmoid of the artifact
    coefficients, and the artifact file actually exists on disk."""
    from nfl_data_pipeline_spark.models import _DEFAULT_PATH
    from nfl_data_pipeline_spark.queries import all_queries

    assert os.path.exists(_DEFAULT_PATH)
    m = load_artifact()
    df = all_queries()["udf_model_score"].spark(spark, SF_SMOKE)
    rows = df.limit(50).collect()
    assert rows
    # re-derive one score driver-side from the artifact
    li = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
    r0 = rows[0]
    # (l_orderkey, l_linenumber) is not unique in the fixture; the
    # score must match ONE of the rows carrying that key
    srcs = (
        li.filter(
            (li.l_orderkey == r0["okey"]) & (li.l_linenumber == r0["line"])
        )
        .select("l_quantity", "l_discount", "l_extendedprice")
        .collect()
    )
    expected = [
        1.0
        / (
            1.0
            + math.exp(
                -(
                    m["b0"]
                    + m["b_qty"] * s["l_quantity"]
                    + m["b_disc"] * s["l_discount"]
                    + m["b_price"] * s["l_extendedprice"]
                )
            )
        )
        for s in srcs
    ]
    assert any(math.isclose(r0["xreturn"], e, rel_tol=1e-12) for e in expected)
