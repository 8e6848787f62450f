"""Custom stateful streaming operator: gap-based sessionization with
``applyInPandasWithState``.

The batch twin is ``operators/windows.sessionize`` (lag + running sum —
one window pass). A stream cannot window over unbounded history, so state
carries each user's open session across microbatches: (session_id,
last_ts, n_events, sum_value). Per batch and per user the handler sorts
its Arrow batch by time, closes sessions whose gap exceeds the threshold,
and emits updated rows (update output mode → the sink's last row per
(user, session) is the session's final shape).

Scale notes: state is partitioned by the group key across executors and
checkpointed by the state store — the operator scales like any keyed agg.
The Arrow path moves whole per-user batches into pandas; session
assignment is a vectorized diff/cumsum + groupby, no per-row Python
loop. In production the
NoTimeout config below becomes an event-time timeout + watermark so idle
sessions close and state is evicted; a finite replay has no late data, so
the final update rows are already correct.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = "user_id bigint, session_id bigint, n_events bigint, sum_value double"
STATE_SCHEMA = "session_id bigint, last_ts_us bigint, n_events bigint, sum_value double"


def streaming_sessionize_stats(stream: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """events stream (event_id, user_id, ts timestamp, value) → per-session
    stats rows, update-mode. A gap strictly greater than ``gap_minutes``
    starts a new session (same boundary rule as the batch operator)."""
    gap_us = gap_minutes * 60 * 1_000_000

    def handle(
        key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.exists:
            sid, last_us, n, sv = state.get
        else:
            sid, last_us, n, sv = 1, None, 0, 0.0

        import numpy as np

        batch = pd.concat(list(pdfs), ignore_index=True)
        if len(batch) == 0:
            return

        # ts ties break by event_id — the batch twin's window orders by
        # (ts, event_id), and a tie crossing a gap comparison must see
        # the same predecessor on both paths
        batch = batch.sort_values(["ts", "event_id"], kind="mergesort")
        ts_us = (batch["ts"].astype("int64") // 1000).to_numpy()
        vals = batch["value"].to_numpy(dtype="float64")

        # vectorized session assignment: gap > threshold vs predecessor
        # (the first event compares against the carried state timestamp)
        prev = np.empty_like(ts_us)
        prev[0] = ts_us[0]
        prev[1:] = ts_us[:-1]
        new_sess = (ts_us - prev) > gap_us
        state_closed = last_us is not None and ts_us[0] - last_us > gap_us
        new_sess[0] = state_closed
        sess = sid + np.cumsum(new_sess)

        g = (
            pd.DataFrame({"sess": sess, "v": vals})
            .groupby("sess", sort=True)
            .agg(n=("v", "size"), sv=("v", "sum"))
        )
        rows = [(user_id, int(s), int(r.n), float(r.sv)) for s, r in g.iterrows()]
        if state_closed:
            rows.insert(0, (user_id, sid, n, sv))  # close the carried session
        else:
            # first batch session continues the carried one: fold state in
            rows[0] = (user_id, sid, rows[0][2] + n, rows[0][3] + sv)

        open_sid = int(sess[-1])
        open_row = rows[-1]
        state.update((open_sid, int(ts_us[-1]), int(open_row[2]), float(open_row[3])))
        yield pd.DataFrame(rows, columns=["user_id", "session_id", "n_events", "sum_value"])

    return stream.groupBy("user_id").applyInPandasWithState(
        handle, OUT_SCHEMA, STATE_SCHEMA, "update", GroupStateTimeout.NoTimeout
    )


ZS_OUT_SCHEMA = "event_id bigint, user_id bigint, ts string, value double, z_score double"
ZS_STATE_SCHEMA = "n bigint, s1 double, s2 double"


def streaming_zscore_monitor(
    stream: DataFrame, z: float = 3.0, min_history: int = 5
) -> DataFrame:
    """Streaming online anomaly monitor: each user's running (n, Σv, Σv²)
    moments live in state; every incoming event is scored against the
    PRIOR moments (expanding z-score) and emitted only when flagged —
    the alerting stream of operators/windows.expanding_zscore_flags.

    Bit-exact with the batch twin by construction: the handler extends
    the carried sums with a SEQUENTIAL numpy cumsum in event order — the
    same left-to-right accumulation Spark's running-window sum performs —
    and applies the identical var = (Σv² − (Σv)²/n)/(n−1) formula, so a
    replay across any microbatch split reproduces the batch output
    exactly (tested), not within a tolerance.

    State is three scalars per user — O(users), watermark-evictable in
    production (event-time timeout); the Arrow batch path is fully
    vectorized, no per-row Python.
    """

    def handle(key, pdfs, state):
        import numpy as np

        (user_id,) = key
        if state.exists:
            pn, ps1, ps2 = state.get
        else:
            pn, ps1, ps2 = 0, 0.0, 0.0

        batch = pd.concat(list(pdfs), ignore_index=True)
        if len(batch) == 0:
            return
        batch = batch.sort_values(["ts", "event_id"], kind="mergesort")
        v = batch["value"].to_numpy(dtype="float64")
        ev = batch["event_id"].to_numpy()
        ts = batch["ts"]

        # prior-history sums BEFORE each event: carried state + exclusive
        # sequential cumsum (matches the batch window's frame end -1)
        c1 = np.cumsum(v)
        c2 = np.cumsum(v * v)
        n_prior = pn + np.arange(len(v))
        s1_prior = ps1 + np.concatenate(([0.0], c1[:-1]))
        s2_prior = ps2 + np.concatenate(([0.0], c2[:-1]))

        with np.errstate(divide="ignore", invalid="ignore"):
            mean = s1_prior / n_prior
            var = (s2_prior - s1_prior * s1_prior / n_prior) / (n_prior - 1)
            zs = (v - mean) / np.sqrt(var)
        flag = (n_prior >= min_history) & (var > 0) & (np.abs(zs) > z)

        state.update((int(pn + len(v)), float(ps1 + c1[-1]), float(ps2 + c2[-1])))
        if not flag.any():
            return
        out = pd.DataFrame(
            {
                "event_id": ev[flag],
                "user_id": user_id,
                "ts": ts[flag].dt.strftime("%Y-%m-%d %H:%M:%S"),
                "value": np.round(v[flag], 6),
                "z_score": np.round(zs[flag], 6),
            }
        )
        yield out

    return stream.groupBy("user_id").applyInPandasWithState(
        handle, ZS_OUT_SCHEMA, ZS_STATE_SCHEMA, "append", GroupStateTimeout.NoTimeout
    )
