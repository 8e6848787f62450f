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

        batch = batch.sort_values("ts", kind="mergesort")
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
