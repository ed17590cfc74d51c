"""Custom stateful streaming operator via ``applyInPandasWithState``.

[EXT] SURVEY §2.2's "custom stateful operators" row. Built-in stateful
ops (windowed aggs, dropDuplicatesWithinWatermark) cover the common
cases; this is the escape hatch for semantics they can't express —
here a per-key running accumulator that survives across micro-batches
(the streaming twin of a grand-total ``groupBy``), the canonical shape
for sessionization/enrichment state machines.

Scale notes: state lives in the state store partitioned by group key —
one shuffle per batch on the key, state size O(distinct keys), and
Arrow batches the per-group data into pandas. Keys must be bounded or
timeout-evicted (``GroupStateTimeout``) for an unbounded stream; the
replay test drives a closed stream, where NoTimeout is correct.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

if TYPE_CHECKING:  # pragma: no cover
    import pandas as pd

OUTPUT_SCHEMA = "user_id BIGINT, n_events BIGINT, total_value DOUBLE"
STATE_SCHEMA = "n BIGINT, total DOUBLE"


def _update_totals(key, batches: Iterator["pd.DataFrame"], state: GroupState):
    """Merge this batch's rows for one user into the running state and
    emit the updated totals."""
    import pandas as pd

    n, total = state.get if state.exists else (0, 0.0)
    for pdf in batches:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame({"user_id": [key[0]], "n_events": [n], "total_value": [total]})


def running_user_totals(stream: DataFrame) -> DataFrame:
    """Per-user running (count, total value) maintained across
    micro-batches; each batch emits the keys it touched with their
    post-batch totals (update semantics)."""
    return stream.groupBy("user_id").applyInPandasWithState(
        _update_totals,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


CENTS_OUTPUT_SCHEMA = "user_id BIGINT, n_events BIGINT, value_cents BIGINT"
CENTS_STATE_SCHEMA = "n BIGINT, cents BIGINT"


def _update_totals_cents(key, batches: Iterator["pd.DataFrame"], state: GroupState):
    """Integer-cents twin of ``_update_totals``: the running value total
    accumulates as BIGINT cents, so the state merge is associative and
    EXACT — emissions are bit-identical for any micro-batch split or
    arrival order, which is what lets the replay carry a full DuckDB
    hash oracle (float accumulation order would wobble in the last
    ulp). The same discipline as the batch side's exact-DECIMAL policy
    (functions/exact.py), applied to streaming state."""
    import numpy as np
    import pandas as pd

    n, cents = state.get if state.exists else (0, 0)
    for pdf in batches:
        n += len(pdf)
        # Half-AWAY-FROM-ZERO, matching DuckDB ROUND() and Spark
        # F.round — pandas Series.round() is banker's (half-to-even)
        # and would diverge on exact half-cent inputs like 0.125.
        v = pdf["value"].to_numpy() * 100.0
        cents += int(np.copysign(np.floor(np.abs(v) + 0.5), v).astype("int64").sum())
    state.update((n, cents))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "value_cents": [cents]}
    )


def running_user_totals_cents(stream: DataFrame) -> DataFrame:
    """Per-user exact running (count, cents) across micro-batches —
    update semantics: each batch emits the keys it touched with their
    post-batch state."""
    return stream.groupBy("user_id").applyInPandasWithState(
        _update_totals_cents,
        outputStructType=CENTS_OUTPUT_SCHEMA,
        stateStructType=CENTS_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


EWMA_OUTPUT_SCHEMA = (
    "event_type STRING, day_i INT, daily_cents BIGINT, ewma_cents BIGINT, n_days BIGINT"
)
EWMA_STATE_SCHEMA = "days ARRAY<INT>, cents ARRAY<BIGINT>"


def _update_ewma(key, batches: Iterator["pd.DataFrame"], state: GroupState):
    """ORDER-SENSITIVE sequential fold across micro-batches: state
    holds the per-day cent totals seen so far (a sorted day->cents
    map as two arrays — bounded: one entry per calendar day), and
    every batch re-folds the exponential smoothing over the sorted
    series. Late/out-of-order days slot into place and the fold
    repairs downstream values — the semantics a watermark-windowed agg
    cannot express (each day's EWMA depends on ALL prior days).

    The smoothing step is PURE INTEGER: with alpha = 3/10,
    ``e_i = (3*v_i + 7*e_{i-1} + 5) // 10`` (cents in, cents out,
    half-away rounding folded into the +5 floor-division for the
    all-positive fixture) — no float enters the recursion, so any
    batch split, arrival order, or engine replays to bit-identical
    state, and DuckDB can run the IDENTICAL formula in a recursive
    CTE as a full value oracle."""
    import numpy as np
    import pandas as pd

    if state.exists:
        days0, cents0 = state.get
        acc = dict(zip(days0, cents0))
    else:
        acc = {}
    for pdf in batches:
        v = pdf["value"].to_numpy() * 100.0
        c = np.copysign(np.floor(np.abs(v) + 0.5), v).astype("int64")
        for d, cc in zip(pdf["day_i"].to_numpy(), c):
            acc[int(d)] = acc.get(int(d), 0) + int(cc)
    days = sorted(acc)
    state.update((days, [acc[d] for d in days]))
    e, series = 0, []
    for d in days:
        e = (3 * acc[d] + 7 * e + 5) // 10
        series.append(e)
    n = len(days)
    yield pd.DataFrame(
        {
            "event_type": [key[0]] * n,
            "day_i": days,
            "daily_cents": [acc[d] for d in days],
            "ewma_cents": series,
            "n_days": [n] * n,
        }
    )


def ewma_daily_cents(stream: DataFrame) -> DataFrame:
    """Per-event-type daily EWMA maintained across micro-batches —
    update semantics: each batch emits the touched key's FULL
    recomputed series stamped with ``n_days`` so a consumer (or the
    replay's post-sink view) keeps only the latest fold per day."""
    return stream.groupBy("event_type").applyInPandasWithState(
        _update_ewma,
        outputStructType=EWMA_OUTPUT_SCHEMA,
        stateStructType=EWMA_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
