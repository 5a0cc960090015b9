"""Size-gated broadcast hints.

A forced ``F.broadcast()`` on a table whose size is proportional to
data content — a near-dup cluster label table, a shared-shingle set —
is a 100×-scale hazard: Spark honors explicit hints regardless of the
8 GB broadcast limit right up until the build fails, so at web scale
(where duplicated docs are commonly 30-80% of rows) the job ABORTS
instead of degrading to a shuffle join. ``gated_broadcast`` keeps the
zero-corpus-shuffle plan whenever the table is genuinely small and
degrades to a plain (AQE-planned) join above a row threshold.

Why a count gate rather than no hint at all: without the hint, AQE
only converts the sort-merge join to broadcast AFTER shuffling the
build side (the probe side becomes a local shuffle read — cheap but
not free, and the initial plan still stages an exchange on the
corpus). The tables gated here sit just downstream of an aggregation
or an iterative local checkpoint, so one ``count()`` is a cheap
metadata-ish action against already-materialized partitions, and it
buys the true broadcast plan in the common case.

The threshold is rows, not bytes, because every gated table here is
a narrow (id, small-payload) frame: at the 4M-row default a 2×int64
label table is ~64 MB of payload — comfortably under the driver
collect and executor broadcast budgets even with JVM overhead, and
~100× below the hard 8 GB abort line.
"""

from __future__ import annotations

import logging
import os
import sys
from collections import deque

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# ~64 MB of payload for a 2-column long table; two orders of
# magnitude under the 8 GB broadcast abort line.
BROADCAST_MAX_ROWS = 4_000_000

_LOG = logging.getLogger(__name__)

# Gate telemetry (VERDICT r10 next #5): every gate decision records
# its call site, the measured row count and the chosen path, so a
# 100-TB run's logs show WHERE each crossover landed (the difference
# between "the gate saved this job" and "the gate cost a count for
# nothing" is exactly this record). Bounded ring buffer — a
# long-running stream calls gates every batch and the buffer must
# not become the leak; bench.py drains it per run.
GATE_EVENTS: deque = deque(maxlen=4096)


def drain_gate_events() -> list[dict]:
    """Return and clear the recorded gate decisions."""
    out = list(GATE_EVENTS)
    GATE_EVENTS.clear()
    return out


def gated_broadcast(
    df: DataFrame,
    max_rows: int = BROADCAST_MAX_ROWS,
    materialize: bool = False,
) -> DataFrame:
    """Broadcast hint applied only when ``df`` has at most
    ``max_rows`` rows; otherwise the frame is returned unhinted (the
    join degrades to a shuffle join, AQE may still re-plan it).

    By default this does NOT checkpoint the frame before counting: a
    localCheckpoint would replace the subtree with an ExistingRDD
    scan whose size statistics are defaulted, blinding Catalyst's
    auto-broadcast decisions DOWNSTREAM of the gated join (measured:
    it flipped exact_substring's stats-chosen self-join broadcast to
    a sort-merge). Default when the gated table sits one aggregation
    above an already-checkpointed (or cheap-to-rescan) input, where
    the count's recompute is a single cheap pass.

    ``materialize=True`` checkpoints the frame first so the count and
    the join share ONE materialization — use it when the table's
    lineage re-derives from a full corpus scan (e.g. a term-frequency
    table straight off an explode) AND no downstream join decision
    depends on this subtree's statistics.
    """
    if materialize:
        df = df.localCheckpoint()
    n = df.count()
    path = "broadcast" if n <= max_rows else "shuffle"
    f = sys._getframe(1)
    site = f"{os.path.basename(f.f_code.co_filename)}:{f.f_lineno}"
    GATE_EVENTS.append(
        {"site": site, "rows": n, "max_rows": max_rows, "path": path}
    )
    _LOG.info(
        "gated_broadcast site=%s rows=%d max_rows=%d path=%s",
        site, n, max_rows, path,
    )
    if path == "broadcast":
        return F.broadcast(df)
    return df


def metadata_gated_broadcast(
    df: DataFrame,
    rows_bound: int,
    max_rows: int = BROADCAST_MAX_ROWS,
    site: str | None = None,
) -> DataFrame:
    """``gated_broadcast`` with the row count supplied from METADATA
    the caller already holds (an exact driver-side bound: a sampler's
    ``k``, a Σ of per-range counts that rode an existing aggregate) —
    ZERO extra Spark actions, where the counting gate costs one
    ``count()`` job (plus a materialization when the lineage is
    expensive). Same decision rule and the same telemetry ring, with
    the event marked ``derived: "metadata-bound"`` so a bench run
    shows the count was a bound, not a measurement. The bound must be
    an UPPER bound on the true row count — broadcasting at most
    ``max_rows`` rows is the safety contract."""
    path = "broadcast" if rows_bound <= max_rows else "shuffle"
    if site is None:
        f = sys._getframe(1)
        site = f"{os.path.basename(f.f_code.co_filename)}:{f.f_lineno}"
    GATE_EVENTS.append(
        {
            "site": site,
            "rows": rows_bound,
            "max_rows": max_rows,
            "path": path,
            "derived": "metadata-bound",
        }
    )
    _LOG.info(
        "metadata_gated_broadcast site=%s rows<=%d max_rows=%d path=%s",
        site, rows_bound, max_rows, path,
    )
    if path == "broadcast":
        return F.broadcast(df)
    return df
