"""Persisted model artifacts — the load-then-score contract of
R/epa_predict.R:10-16 (``readRDS`` a fitted model, apply it inside the
pipeline).

The reference's .rda GAM binaries aren't reproducible (SURVEY §7
hard-part 5), so the shipped artifact is a logistic model FIT BY
``tools/fit_return_model.py`` on the sf0.001 fixture with
deterministic full-batch gradient descent (numpy float64, fixed
iteration count, zero init — same artifact on every machine). The
contract exercised is identical to the reference's: an artifact file
persisted ahead of time, loaded at scoring time, applied to batches.

At cluster scale the artifact ships with the application (py-files /
container image); executors read it from the package path, never from
the driver.
"""

from __future__ import annotations

import json
import os
from functools import lru_cache

_DEFAULT_PATH = os.path.join(os.path.dirname(__file__), "return_model.json")


def save_artifact(coeffs: dict, path: str = _DEFAULT_PATH) -> None:
    """Persist model coefficients. Floats are written with full repr
    precision (json keeps shortest-roundtrip), so a reload is
    bit-identical."""
    with open(path, "w") as f:
        json.dump(coeffs, f, indent=2, sort_keys=True)


@lru_cache(maxsize=8)
def load_artifact(path: str = _DEFAULT_PATH) -> dict:
    """Load persisted coefficients. Cached: scoring functions call
    this per-batch on executors; the file is read once per process."""
    with open(path) as f:
        return json.load(f)


def clear_artifact_cache() -> None:
    load_artifact.cache_clear()
