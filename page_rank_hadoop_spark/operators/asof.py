"""As-of (point-in-time) join — an operator the reference lacks and Spark
has no builtin for (SURVEY.md §2.2: joins the engine adds beyond the
reference's semi/index joins).

``as_of_join(left, right, ...)`` attaches, to every left row, the payload
of the latest right row with the same key and ``right_ts <= left_ts`` —
the standard trades⋈quotes / event⋈dimension-history shape.

Spark-first formulation (no per-row lookups, no range cross-join): tag and
union both inputs, then one window pass per key ordered by (ts, side)
carries the last-seen right payload forward onto left rows:

    union → Window.partitionBy(key).orderBy(ts, side).rowsBetween(-∞, 0)
          → last(payload, ignorenulls=True) → filter side == left

Cost at scale: ONE shuffle (the window partitioning) over |L|+|R| rows and
a per-partition sort — the same profile as a sort-merge join, with no
equality-match blowup. Hot keys are the hazard (all rows of a key in one
partition); mitigate upstream by splitting the time range per key into
sub-keys when a key exceeds partition budget.

Right rows sort BEFORE left rows at equal ts (side 0 < 1), so a right row
with ``right_ts == left_ts`` is visible to that left row — standard as-of
inclusivity, matching DuckDB's ``ASOF JOIN ... ON l.ts >= r.ts`` oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_payload: list[str] | None = None,
    prefix: str = "r_",
    how: str = "inner",
    tolerance_seconds: float | None = None,
) -> DataFrame:
    """For each left row: the latest right row with same ``on`` key and
    ``right_ts <= left_ts``. ``how`` is 'inner' (drop unmatched) or 'left'.

    ``tolerance_seconds`` bounds the match's STALENESS (pandas
    ``merge_asof(tolerance=...)`` semantics): a carried right row older
    than ``left_ts − tolerance`` is treated as no-match (NULL payload
    under 'left', dropped under 'inner') — the quote-too-old guard every
    point-in-time feature join needs. Requires timestamp ``ts`` columns;
    the comparison is exact integer µs (``unix_micros``), never double
    epoch arithmetic (a 0.5 µs representation error can flip a
    staleness == tolerance boundary). Zero extra shuffles: the check is
    a map-side conditional on the already-carried payload.

    If several right rows share (key, ts), the caller should pre-dedup
    (e.g. ``groupBy(key, ts).agg(max_by(...))``) — the window keeps the
    last one in (ts, input-order), which is not deterministic across
    shuffles otherwise.
    """
    if right_payload is None:
        right_payload = [c for c in right.columns if c not in (on, right_ts)]

    l_tagged = left.select(
        F.col(on).alias("__k"),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__l"),
        F.lit(None).cast(
            right.select(F.struct(F.col(right_ts).alias("__rts"), *right_payload).alias("s"))
            .schema["s"].dataType.simpleString()
        ).alias("__r"),
    )
    r_tagged = right.select(
        F.col(on).alias("__k"),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        F.lit(None).cast(
            left.select(F.struct(*[F.col(c) for c in left.columns]).alias("s"))
            .schema["s"].dataType.simpleString()
        ).alias("__l"),
        F.struct(F.col(right_ts).alias("__rts"), *right_payload).alias("__r"),
    )
    w = (
        Window.partitionBy("__k")
        .orderBy("__ts", "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = (
        l_tagged.unionByName(r_tagged)
        .withColumn("__match", F.last("__r", ignorenulls=True).over(w))
        .filter(F.col("__side") == 1)
    )
    if tolerance_seconds is not None:
        tol_us = int(round(tolerance_seconds * 1_000_000))
        fresh = (
            F.unix_micros(F.col("__ts")) - F.unix_micros(F.col("__match.__rts"))
        ) <= F.lit(tol_us)
        carried = carried.withColumn("__match", F.when(fresh, F.col("__match")))
    out_cols = [F.col(f"__l.{c}").alias(c) for c in left.columns]
    out_cols.append(F.col("__match.__rts").alias(f"{prefix}{right_ts}"))
    out_cols.extend(F.col(f"__match.{c}").alias(f"{prefix}{c}") for c in right_payload)
    out = carried.select(*out_cols)
    if how == "inner":
        out = out.filter(F.col(f"{prefix}{right_ts}").isNotNull())
    elif how != "left":
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")
    return out
