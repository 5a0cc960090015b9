"""Fit the return-probability logistic model and persist the artifact.

Reproduces nfl_data_pipeline_spark/models/return_model.json: a
logistic regression P(l_returnflag == 'R') ~ quantity + discount +
extendedprice fit on the sf0.001 fixture lineitem table with
deterministic full-batch gradient descent (float64, zero init, fixed
step count — no RNG, no early stopping), so the artifact reproduces
to ~1e-9 relative on any machine (BLAS reduction order moves the
last few ULPs between builds; nothing else varies).

Mirrors the reference's train-offline-score-online split
(R/epa_predict.R trains GAMs offline, 10-16 loads and applies them);
run this ONLY to regenerate the artifact after changing the feature
set — queries load the committed artifact and never refit.

Usage: python tools/fit_return_model.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow.parquet as pq

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def fit_logistic(X: np.ndarray, y: np.ndarray, iters: int = 400, lr: float = 0.5) -> np.ndarray:
    """Full-batch GD on standardized features, mapped back to raw
    scale. Deterministic: zero init, fixed iteration count."""
    mu, sd = X.mean(axis=0), X.std(axis=0)
    Xs = (X - mu) / sd
    n, d = Xs.shape
    w = np.zeros(d + 1)  # [b0, w...]
    A = np.hstack([np.ones((n, 1)), Xs])
    for _ in range(iters):
        p = 1.0 / (1.0 + np.exp(-(A @ w)))
        w -= lr * (A.T @ (p - y)) / n
    # unstandardize: z = b0 + sum(wi * (x - mu)/sd)
    raw_w = w[1:] / sd
    raw_b0 = w[0] - float((w[1:] * mu / sd).sum())
    return np.concatenate([[raw_b0], raw_w])


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    t = pq.read_table(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_quantity", "l_discount", "l_extendedprice", "l_returnflag"],
    )
    df = t.to_pandas()
    X = df[["l_quantity", "l_discount", "l_extendedprice"]].to_numpy(np.float64)
    y = (df["l_returnflag"] == "R").to_numpy(np.float64)
    b0, b_qty, b_disc, b_price = fit_logistic(X, y)

    from nfl_data_pipeline_spark.models import save_artifact

    save_artifact(
        {
            "model": "logistic",
            "target": "l_returnflag == 'R'",
            "features": ["l_quantity", "l_discount", "l_extendedprice"],
            "b0": b0,
            "b_qty": b_qty,
            "b_disc": b_disc,
            "b_price": b_price,
            "fit_on": "sf0.001 lineitem, full-batch GD 400 iters lr=0.5",
        }
    )
    print("saved:", {"b0": b0, "b_qty": b_qty, "b_disc": b_disc, "b_price": b_price})


if __name__ == "__main__":
    main()
