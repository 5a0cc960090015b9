"""Multi-season scale guard for the epa panel (VERDICT r1 item 9):
the lag-metric grid and correlation tables must be correct on a
fixture ~7× the golden one (8 seasons × 8 weeks vs 3 × 4), with every
value re-derived independently in pandas — not just the handful of
hardcoded season cells the golden test pins. Catches
fixture-size-overfit logic (lags keyed to literal seasons, corr
denominators assuming 3 seasons, playcaller flags assuming one
change year)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from nfl_data_pipeline_spark import fixtures
from nfl_data_pipeline_spark.plans import epa_panel

SEASONS = list(range(2020, 2028))
WEEKS = 8


@pytest.fixture(scope="module")
def scaled(spark):
    sdfs = fixtures.spark_fixtures(spark, seasons=SEASONS, weeks=WEEKS)
    pdfs = fixtures.build_all(seasons=SEASONS, weeks=WEEKS)
    return sdfs, pdfs


def _pandas_qb_seasons(pbp: pd.DataFrame, min_plays: int = 50) -> pd.DataFrame:
    sel = pbp[
        ((pbp["pass"] == 1) | (pbp["rush"] == 1))
        & pbp["down"].notna()  # R/epa_predict.R:196 !is.na(down)
        & pbp["epa"].notna()
        & (pbp["season_type"] == "REG")
        & pbp["id"].notna()
    ].copy()
    sel["epa_c"] = sel["qb_epa"].clip(lower=-4.5)
    g = sel.groupby(["id", "season"])
    out = pd.DataFrame(
        {
            "n_plays": g.size(),
            "n_dropbacks": g["pass"].sum(),
            "epa_play": g["epa_c"].mean(),
            "success_rate": g["success"].mean(),
        }
    ).reset_index()
    # reference gates (R/epa_predict.R:213-214): strict dropback gate
    # + fixture-scale min_plays (declared deviation from qb_min=320)
    return out[(out["n_dropbacks"] > 30) & (out["n_plays"] >= min_plays)]


def _pandas_ya_counts(pbp: pd.DataFrame) -> pd.DataFrame:
    """The ya-frame counts (R/epa_predict.R:172 load filter + :177
    attempt filter) — the panel's yards/ints/pass_tds/n source."""
    sel = pbp[
        (pbp["season_type"] == "REG")
        & pbp["epa"].notna()
        & ((pbp["rush"] == 1) | (pbp["pass"] == 1))
        & (pbp["play_type"] == "pass")
        & (
            (pbp["incomplete_pass"] == 1)
            | (pbp["complete_pass"] == 1)
            | (pbp["interception"] == 1)
        )
    ]
    g = sel.groupby(["id", "season"])
    return pd.DataFrame(
        {
            "yards": g["yards_gained"].sum(),
            "ints": g["interception"].sum(),
            "pass_tds": g["pass_touchdown"].sum(),
            "n": g.size(),
        }
    ).reset_index()


def test_scaled_panel_matches_pandas(scaled, spark):
    sdfs, pdfs = scaled
    panel = epa_panel.build_panel(
        sdfs["cleaned_pbp"], sdfs["qbr"], sdfs["playcallers"]
    ).toPandas()
    want = _pandas_qb_seasons(pdfs["cleaned_pbp"])

    assert len(panel) == len(want)  # every QB-season, no dupes
    assert panel.duplicated(["id", "season"]).sum() == 0

    merged = panel.merge(want, on=["id", "season"], suffixes=("", "_want"))
    assert len(merged) == len(want)
    for c in ("epa_play", "success_rate"):
        assert np.allclose(merged[c], merged[f"{c}_want"], rtol=1e-9)
    assert (merged["n_plays"] == merged["n_plays_want"]).all()

    # yards/ints/pass_tds/n come from the ya frame (pass attempts
    # only, :172+:177 filters), joined by (id, name, season)
    ya_want = _pandas_ya_counts(pdfs["cleaned_pbp"])
    ym = panel.merge(ya_want, on=["id", "season"], suffixes=("", "_want"))
    both = ym["yards"].notna()
    assert both.any()
    for c in ("yards", "ints", "pass_tds", "n"):
        assert np.allclose(
            ym.loc[both, c].astype(float),
            ym.loc[both, f"{c}_want"].astype(float),
            rtol=1e-9,
        )

    # lag columns: exactly pandas groupby-shift over season order, at
    # EVERY season — not only the first
    want_lag = (
        want.sort_values(["id", "season"])
        .groupby("id")["epa_play"]
        .shift(1)
        .rename("want_lag")
    )
    wl = want.sort_values(["id", "season"]).assign(want_lag=want_lag.values)
    ml = panel.merge(wl[["id", "season", "want_lag"]], on=["id", "season"])
    both = ml["lag_epa_play"].notna() & ml["want_lag"].notna()
    assert (ml["lag_epa_play"].isna() == ml["want_lag"].isna()).all()
    assert np.allclose(ml.loc[both, "lag_epa_play"], ml.loc[both, "want_lag"])


def test_scaled_stability_corrs_match_pandas(scaled, spark):
    sdfs, pdfs = scaled
    panel_df = epa_panel.build_panel(
        sdfs["cleaned_pbp"], sdfs["qbr"], sdfs["playcallers"]
    )
    got = {r["metric"]: r for r in epa_panel.stability_corrs(panel_df).collect()}

    pp = panel_df.toPandas().sort_values(["id", "season"])
    for metric in ("epa_play", "success_rate", "n_plays"):
        cur, lag = pp[metric], pp[f"lag_{metric}"]
        mask = cur.notna() & lag.notna()
        assert got[metric]["n_pairs"] == int(mask.sum())
        # with 8 seasons the pair count must dwarf the golden 16
        # (not exactly 7×8: the reference row gates — !is.na(down),
        # n_dropbacks > 30 — can legitimately drop a QB-season)
        assert got[metric]["n_pairs"] >= 50
        want_corr = np.corrcoef(cur[mask], lag[mask])[0, 1]
        assert got[metric]["yoy_corr"] == pytest.approx(want_corr, rel=1e-9)
