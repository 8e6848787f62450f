"""Window-function and event-time operators over the ``events`` table.

- ranking windows (top-N per group)
- lag/cumsum sessionization (gap > threshold starts a new session)
- tumbling event-time windows (batch form; streaming/replay.py runs the
  same aggregation as a Structured Streaming query with a watermark)

Scale notes: every window here partitions by a high-cardinality key
(user_id, lang) so the sort-within-partition stays bounded; tumbling
windows are a plain groupBy on a derived bucket — no window sort at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def top_n_per_group(
    documents: DataFrame, n: int = 2, group_col: str = "lang", order_col: str = "n_chars"
) -> DataFrame:
    """Top-n docs per group by order_col desc (row_number ranking window).
    Ties broken by doc_id for determinism."""
    w = Window.partitionBy(group_col).orderBy(F.desc(order_col), F.col("doc_id"))
    return (
        documents.select(group_col, "doc_id", order_col, F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= n)
    )


def sessionize(
    events: DataFrame, gap_minutes: int = 30, carry: list[str] | None = None
) -> DataFrame:
    """Assign session ids per user: a gap > ``gap_minutes`` since the
    previous event starts a new session (lag + running sum of boundary
    flags). Returns (event_id, user_id, ts, *carry, session_id) —
    ``carry`` columns ride along through the window pass so downstream
    rollups never need to join back to the source (one shuffle total)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # exact integer microseconds: double epoch has ~0.5µs representation
    # error at 2026 magnitudes, enough to flip a gap==threshold boundary
    gap_us = gap_minutes * 60 * 1_000_000
    epoch = F.unix_micros("ts")
    prev_epoch = F.lag(epoch).over(w)
    new_sess = F.when(
        prev_epoch.isNull() | ((epoch - prev_epoch) > gap_us),
        F.lit(1),
    ).otherwise(F.lit(0))
    return events.select(
        "event_id",
        "user_id",
        "ts",
        *(carry or []),
        F.sum(new_sess).over(w.rowsBetween(Window.unboundedPreceding, 0)).alias("session_id"),
    )


def session_stats(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Per (user, session): event count and value sum — the useful rollup
    on top of sessionize. ``value`` is carried through the window pass, so
    the plan is one shuffle (user_id) + the final agg — no join back."""
    s = sessionize(events, gap_minutes, carry=["value"])
    return s.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 6).alias("sum_value"),
    )


def session_intervals(
    events: DataFrame, gap_minutes: int = 30, min_events: int = 2
) -> DataFrame:
    """Per (user, session): [t0, t1] activity interval, sessions with
    ≥ ``min_events`` events — the interval table the overlap join runs on."""
    s = sessionize(events, gap_minutes)
    return (
        s.groupBy("user_id", "session_id")
        .agg(F.min("ts").alias("t0"), F.max("ts").alias("t1"), F.count("*").alias("n_events"))
        .filter(F.col("n_events") >= min_events)
    )


def interval_overlap_pairs(
    intervals: DataFrame, cell_seconds: int = 3600, max_cell_size: int | None = None
) -> DataFrame:
    """Cross-user overlapping interval pairs — the scalable form of the
    interval/range join. A naive ``a.t0 <= b.t1 AND b.t0 <= a.t1`` theta
    join is a cartesian product at scale; instead each interval explodes
    to the grid cells it covers (``cell_seconds`` wide — ~1-2 cells for
    short sessions), candidates equi-join on the cell (ONE shuffle on a
    short key, the same shape as every LSH dedup pipeline), the exact
    overlap predicate filters, and ``distinct`` drops the duplicate hit
    when a pair shares several cells. Pick ``cell_seconds`` near the
    median interval length: too small explodes cells, too big packs
    everything into few cells (the standard grid-join dial).

    Returns (user_a, session_a, user_b, session_b, overlap_s), user_a <
    user_b (same-user sessions never overlap by construction).

    ``max_cell_size`` (None = off, the exact/declared-oracle mode) drops
    cells covering more intervals before the self-join — the same viral-
    key guard as the LSH band caps (a flash-crowd hour is quadratic in
    concurrent sessions; see operators/dedup._drop_hot_keys).
    """
    from page_rank_hadoop_spark.operators.dedup import _drop_hot_keys

    iv = intervals.select(
        "user_id",
        "session_id",
        F.unix_micros("t0").alias("e0"),
        F.unix_micros("t1").alias("e1"),
    )
    cell_us = cell_seconds * 1_000_000
    cells = F.sequence(
        (F.col("e0") / cell_us).cast("long"), (F.col("e1") / cell_us).cast("long")
    )
    g = iv.withColumn("cell", F.explode(cells))
    if max_cell_size is not None:
        g = _drop_hot_keys(g, ["cell"], max_cell_size)
    a, b = g.alias("a"), g.alias("b")
    return (
        a.join(b, "cell")
        .filter(
            (F.col("a.user_id") < F.col("b.user_id"))
            & (F.col("a.e0") <= F.col("b.e1"))
            & (F.col("b.e0") <= F.col("a.e1"))
        )
        .select(
            F.col("a.user_id").alias("user_a"),
            F.col("a.session_id").alias("session_a"),
            F.col("b.user_id").alias("user_b"),
            F.col("b.session_id").alias("session_b"),
            F.round(
                (
                    F.least(F.col("a.e1"), F.col("b.e1"))
                    - F.greatest(F.col("a.e0"), F.col("b.e0"))
                )
                / 1_000_000.0,
                6,
            ).alias("overlap_s"),
        )
        .distinct()
    )


def funnel_stats(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Session conversion funnel view → click → purchase: per session the
    stages must occur in strict time order (first view before first click
    before first purchase). One row out: total sessions and cumulative
    stage completions. Plan: the sessionize window pass (one shuffle on
    user_id) + per-session min-when aggregate + a global single-row agg —
    scale-independent output size."""
    s = sessionize(events, gap_minutes, carry=["event_type"])
    stage_ts = s.groupBy("user_id", "session_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("view_ts"),
        F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias("click_ts"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias("purchase_ts"),
    )
    vc = F.col("view_ts").isNotNull() & (F.col("view_ts") < F.col("click_ts"))
    return stage_ts.agg(
        F.count("*").alias("n_sessions"),
        F.sum(F.col("view_ts").isNotNull().cast("int")).alias("n_view"),
        F.sum(vc.cast("int")).alias("n_view_click"),
        F.sum((vc & (F.col("click_ts") < F.col("purchase_ts"))).cast("int")).alias(
            "n_view_click_purchase"
        ),
    )


def cohort_retention(events: DataFrame, max_offset: int = 3) -> DataFrame:
    """Cohort retention: users grouped by first-activity day; for each
    (cohort day, day offset ≤ max_offset) the count of distinct users
    active that day. Two aggregations (distinct user-days, cohort min)
    + one join back — the join key (user_id) is the natural partitioning,
    and output is O(days × offsets), scale-independent."""
    days = events.select("user_id", F.to_date("ts").alias("day")).distinct()
    cohort = days.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    return (
        days.join(cohort, "user_id")
        .select(
            "user_id",
            F.date_format("cohort_day", "yyyy-MM-dd").alias("cohort_day"),
            F.datediff("day", "cohort_day").alias("day_offset"),
        )
        .filter(F.col("day_offset") <= max_offset)
        .groupBy("cohort_day", "day_offset")
        .agg(F.countDistinct("user_id").cast("bigint").alias("n_users"))
    )


def range_count_preceding(
    events: DataFrame,
    anchor_type: str = "purchase",
    count_type: str = "click",
    window_seconds: int = 600,
) -> DataFrame:
    """For each ``anchor_type`` event: how many ``count_type`` events the
    same user produced in the strictly-preceding ``window_seconds``.

    This is a range join (events ⋈ events ON user AND ts BETWEEN ...)
    expressed as ONE range-frame window pass — no self-join, no pair
    blowup: sum an indicator over RANGE [-window, -1µs) per user, then
    keep anchor rows. Scale profile: single shuffle on user_id + one
    bounded sort, versus a range self-join's quadratic per-user fanout.
    """
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-window_seconds * 1_000_000, -1)
    )
    counted = events.select(
        "event_id",
        "user_id",
        "ts",
        "event_type",
        F.coalesce(
            F.sum(F.when(F.col("event_type") == count_type, 1).otherwise(0)).over(w),
            F.lit(0),
        ).alias("n_preceding"),
    )
    return counted.filter(F.col("event_type") == anchor_type).select(
        "event_id", "user_id", F.unix_micros("ts").alias("ts_us"), "n_preceding"
    )


def sliding_window_counts(
    events: DataFrame, minutes: int = 15, slide_minutes: int = 5
) -> DataFrame:
    """Hopping/sliding event-time windows: each event lands in
    window/slide overlapping buckets (``F.window`` with a slide —
    Catalyst expands to a generate + groupBy, one shuffle)."""
    w = F.window("ts", f"{minutes} minutes", f"{slide_minutes} minutes")
    return (
        events.groupBy(w.alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 6).alias("sum_value"))
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def pivot_counts_by_day(events: DataFrame, types: list[str] | None = None) -> DataFrame:
    """Pivot/crosstab surface: one row per day, one count column per
    event_type (explicit value list keeps the schema static — required
    for a deterministic plan; Spark would otherwise collect the distinct
    values first)."""
    types = types or ["click", "error", "purchase", "signup", "view"]
    return (
        events.select(F.date_format("ts", "yyyy-MM-dd").alias("day"), "event_type")
        .groupBy("day")
        .pivot("event_type", types)
        .count()
        .na.fill(0, types)
    )


def unpivot_counts(pivoted: DataFrame, types: list[str] | None = None) -> DataFrame:
    """Unpivot/melt surface — the inverse of ``pivot_counts_by_day``:
    (day, click, error, …) wide rows back to (day, event_type, n) long
    form via ``DataFrame.unpivot`` (Catalyst Expand, no shuffle)."""
    types = types or ["click", "error", "purchase", "signup", "view"]
    return pivoted.unpivot("day", types, "event_type", "n")


def daily_event_breakdown(events: DataFrame) -> DataFrame:
    """Date/time function surface: truncate to day, ISO day-of-week, hour
    bucketing — grouped counts. All built-in datetime expressions."""
    return (
        events.select(
            F.date_format("ts", "yyyy-MM-dd").alias("day"),
            F.dayofweek("ts").alias("dow"),
            F.hour("ts").alias("hour"),
            "event_type",
        )
        .groupBy("day", "dow", "hour", "event_type")
        .agg(F.count("*").alias("n"))
    )


def json_props_stats(events: DataFrame) -> DataFrame:
    """JSON column surface: parse ``props`` (a JSON object string), extract
    the numeric field, aggregate per event_type. ``from_json`` with an
    explicit schema stays JVM-side (Jackson in codegen), never Python."""
    k = F.from_json("props", "k int")["k"]
    return (
        events.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum("k").alias("sum_k"),
            F.round(F.avg("k"), 6).alias("avg_k"),
        )
    )


def variant_props_stats(events: DataFrame) -> DataFrame:
    """Open-schema JSON via the VARIANT type (Spark 4): ``parse_json``
    keeps the full value in the shredded binary variant encoding and
    ``variant_get`` does typed path extraction — the scale path for
    heterogeneous / evolving ``props`` payloads, where ``from_json``
    (json_props_stats) needs a fixed schema up front and silently nulls
    everything outside it. Stored as a variant column, the 100 TB corpus
    parses each payload ONCE at ingest and every later query does
    binary path lookup, not a Jackson re-parse. All JVM expressions;
    one partial-agg'd groupBy."""
    k = F.variant_get(F.parse_json("props"), "$.k", "int")
    return (
        events.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.count("k").cast("bigint").alias("n_k"),
            F.sum("k").cast("bigint").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
    )


def tumbling_window_counts(events: DataFrame, minutes: int = 15) -> DataFrame:
    """Per-``minutes`` tumbling window: event count + value sum per
    event_type. Derived-bucket groupBy (window start as a truncated
    timestamp string for oracle-stable comparison)."""
    bucket = F.from_unixtime(
        (F.unix_timestamp("ts") / (minutes * 60)).cast("long") * (minutes * 60),
        "yyyy-MM-dd HH:mm:ss",
    )
    return (
        events.groupBy(bucket.alias("window_start"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 6).alias("sum_value"))
    )


def session_window_stats(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Native gap-based session windows: ``F.session_window`` merges an
    event into the running session when its ts is ≤ the session end
    (inclusive boundary — a gap of exactly ``gap_minutes`` still merges,
    measured; the same convention as ``sessionize``'s strict-> new-session
    test, so the two operators produce identical partitions). Emits per
    (user, session): activity bounds as epoch seconds, event count,
    value sum.

    This is the batch twin of the Structured Streaming session window
    (same expression under a watermark merges sessions across
    microbatches with state cleanup for free — no applyInPandasWithState
    needed for plain gap sessionization). One shuffle on user_id; the
    session merge is a sort-within-partition, the same cost shape as the
    lag/cumsum formulation.
    """
    g = (
        events.groupBy("user_id", F.session_window("ts", f"{gap_minutes} minutes"))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
    )
    return g.select(
        "user_id",
        F.round(F.col("session_window.start").cast("double"), 6).alias("session_start_s"),
        F.round(F.col("session_window.end").cast("double"), 6).alias("session_end_s"),
        "n_events",
        "sum_value",
    )


def ranking_function_suite(documents: DataFrame, n_tiles: int = 4) -> DataFrame:
    """The full ranking-window function family in one pass — ntile,
    percent_rank, cume_dist, dense_rank over n_chars within each
    language — the analytic-SQL surface a warehouse replacement must
    expose (reference has only a global sort, SURVEY §2.2).

    ONE window spec serves all four functions: a single shuffle on lang
    + one within-partition sort; Catalyst evaluates the functions in a
    single Window node. Deterministic under ties because the order key
    (n_chars, doc_id) is unique.
    """
    w = Window.partitionBy("lang").orderBy("n_chars", "doc_id")
    return (
        documents.select(
            "doc_id",
            "lang",
            "n_chars",
            F.ntile(n_tiles).over(w).alias("quartile"),
            F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
            F.round(F.cume_dist().over(w), 6).alias("cume"),
            F.dense_rank().over(w).alias("drank"),
        )
        .orderBy("doc_id")
    )


def running_totals(events: DataFrame) -> DataFrame:
    """Per-type running event-time totals: cumulative sum and count of
    `value` ordered by (ts, event_id) within each event_type — the
    frame-based aggregation window shape (rows between unbounded
    preceding and current).

    One shuffle on event_type, one sort; the cumulative frame is
    evaluated streamingly within each partition (no per-row rescan).
    Rounded per row so the oracle's float accumulation matches ours:
    both engines sum in the same (ts, event_id) order.
    """
    w = (
        Window.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        events.select(
            "event_id",
            "event_type",
            "ts",
            F.round(F.sum("value").over(w), 6).alias("running_value"),
            F.count("*").over(w).alias("running_n"),
        )
        .orderBy("event_id")
    )


def moving_average(events: DataFrame, n_preceding: int = 3) -> DataFrame:
    """Bounded-frame window shapes in one pass per event_type ordered by
    (ts, event_id): moving average over the last ``n_preceding``+1 rows,
    the next value (lead), and the first/last values of the bounded
    frame — the remaining window-frame vocabulary after running totals
    (unbounded) and range frames (q_range_count).

    One shuffle + one sort serves all four expressions (same window
    spec); the bounded frame is O(1) per row (incremental add/evict),
    never a rescan.
    """
    base = Window.partitionBy("event_type").orderBy("ts", "event_id")
    framed = base.rowsBetween(-n_preceding, 0)
    return (
        events.select(
            "event_id",
            "event_type",
            F.round(F.avg("value").over(framed), 6).alias("moving_avg"),
            F.lead("event_id").over(base).alias("next_event_id"),
            F.round(F.first("value").over(framed), 6).alias("frame_first"),
            F.round(F.last("value").over(framed), 6).alias("frame_last"),
        )
        .orderBy("event_id")
    )


def merge_event_intervals(events: DataFrame, cover_seconds: int = 600) -> DataFrame:
    """Gaps-and-islands interval merge: each event covers
    [ts, ts + cover_seconds]; overlapping/touching covers per user merge
    into maximal activity spans. Output (user_id, span_start_us,
    span_end_us, n_events) — the classic coverage/uptime consolidation
    shape (and the batch twin of compacting a session-window state
    store).

    One window pass: an event opens a new island iff its start lies
    strictly after the running max end of all PRIOR events (exact
    integer µs — see sessionize); island id is the running sum of those
    flags; one groupBy merges each island. Single shuffle on user_id,
    no self-join, no interval pair blowup.
    """
    cover_us = cover_seconds * 1_000_000
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    start = F.unix_micros("ts")
    prev_max_end = F.max(start + cover_us).over(w.rowsBetween(Window.unboundedPreceding, -1))
    new_island = F.when(
        prev_max_end.isNull() | (start > prev_max_end), F.lit(1)
    ).otherwise(F.lit(0))
    islands = events.select(
        "user_id",
        start.alias("s_us"),
        (start + cover_us).alias("e_us"),
        F.sum(new_island)
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .alias("island"),
    )
    return islands.groupBy("user_id", "island").agg(
        F.min("s_us").alias("span_start_us"),
        F.max("e_us").alias("span_end_us"),
        F.count("*").alias("n_events"),
    ).select("user_id", "island", "span_start_us", "span_end_us", "n_events")


def event_type_bigrams(events: DataFrame) -> DataFrame:
    """Sequential-pattern surface: counts of consecutive event-type
    transitions (prev_type → event_type) per user ordered by (ts,
    event_id), aggregated corpus-wide — the first-order Markov
    transition table behavioral/funnel analytics start from.

    One shuffle on user_id for the lag window, then a tiny partial-agg'd
    count on the (25-ish) transition pairs."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        events.select("user_id", "ts", "event_id", "event_type")
        .withColumn("prev_type", F.lag("event_type").over(w))
        .filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", "event_type")
        .agg(F.count("*").alias("n"))
    )


def gap_fill_hourly(events: DataFrame) -> DataFrame:
    """Time-series resample + forward fill: per user, an hourly grid from
    the user's first to last active hour; observed hours carry the hourly
    event count and value sum, gap hours are forward-filled from the most
    recent observed hour (``last(..., ignorenulls)`` running window).

    The classic gap-fill/interpolation operator of a time-series engine,
    expressed shuffle-minimally: one groupBy to the hourly rollup, a
    per-user ``sequence()`` explode for the grid (fan-out bounded by the
    time SPAN, never by event count), a left join back on the same
    (user_id, hour) key, and one per-user window for the fill — every
    stage partitions on user_id, so at 100 TB the whole pipeline is a
    single exchange reused end to end.
    """
    hourly = events.groupBy(
        "user_id", F.date_trunc("hour", "ts").alias("hour_ts")
    ).agg(
        F.count("*").alias("n_obs"),
        F.round(F.sum("value"), 6).alias("hour_value"),
    )
    spans = hourly.groupBy("user_id").agg(
        F.min("hour_ts").alias("h0"), F.max("hour_ts").alias("h1")
    )
    grid = spans.select(
        "user_id",
        F.explode(F.sequence("h0", "h1", F.expr("INTERVAL 1 HOUR"))).alias("hour_ts"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("hour_ts")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    joined = grid.join(hourly, ["user_id", "hour_ts"], "left")
    return joined.select(
        "user_id",
        F.date_format("hour_ts", "yyyy-MM-dd HH:mm:ss").alias("hour"),
        F.coalesce("n_obs", F.lit(0)).cast("bigint").alias("n_events"),
        F.last("hour_value", ignorenulls=True).over(w).alias("filled_value"),
        F.col("n_obs").isNull().cast("int").alias("is_gap"),
    )


def seasonal_profile(events: DataFrame) -> DataFrame:
    """Seasonality matrix: event count and value stats per (day-of-week,
    hour-of-day) cell — the load-shape rollup behind capacity planning
    and anomaly baselines. One partial-agg'd groupBy on a ≤168-row key;
    dow is Spark's 1-based-from-Sunday convention (the oracle shifts
    DuckDB's 0-based dayofweek to match)."""
    return (
        events.groupBy(
            F.dayofweek("ts").alias("dow"), F.hour("ts").alias("hour")
        )
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.avg("value"), 6).alias("avg_value"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
    )


def cusum_changepoints(events: DataFrame, z: float = 3.0) -> DataFrame:
    """Changepoint screening per user via CUSUM: the running sum of
    (value − user mean) in event order; a large |CUSUM| excursion marks
    a sustained level shift. Returns per user the peak |CUSUM|, when it
    occurred (earliest event on ties), and whether it exceeds
    ``z · stddev`` — the classic two-pass screen (one stats pass, one
    ordered window pass), both partitioned on user_id so the exchange
    is reused; no driver-side loop, no UDF.

    The peak row is selected with max(struct(abs, −µs, cusum)) — a
    deterministic argmax (ties break to the earliest event) that both
    engines evaluate identically because the running sums accumulate in
    the same frame order.
    """
    # the mean/std are ROUNDED to 6dp before the cumsum: partial-agg
    # summation order differs between engines by ~1 ulp, and a raw mean
    # leaks that ulp into every (value − mean) term — with the rounded
    # mean both engines accumulate bit-identical doubles in the same
    # frame order, so the 6dp output rounding can never straddle a
    # boundary (hit once at sf0.1: 332.322188 vs …87)
    stats = events.groupBy("user_id").agg(
        F.round(F.avg("value"), 6).alias("_mean"),
        F.round(F.stddev_samp("value"), 6).alias("_std"),
        F.count("*").alias("n_events"),
    ).filter(F.col("n_events") >= 2)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    dev = events.join(stats, "user_id").withColumn(
        "_cusum", F.sum(F.col("value") - F.col("_mean")).over(w)
    )
    peak = F.max(
        F.struct(
            F.abs("_cusum").alias("a"),
            (-F.unix_micros("ts")).alias("negus"),
            F.col("_cusum").alias("c"),
        )
    ).alias("_pk")
    out = dev.groupBy("user_id", "_mean", "_std", "n_events").agg(peak)
    return out.select(
        "user_id",
        "n_events",
        F.round("_mean", 6).alias("mean_value"),
        F.round(F.col("_pk.a"), 6).alias("max_abs_cusum"),
        F.date_format(
            F.timestamp_micros(-F.col("_pk.negus")), "yyyy-MM-dd HH:mm:ss"
        ).alias("peak_ts"),
        (F.col("_pk.a") > z * F.col("_std")).cast("int").alias("flagged"),
    )


def expanding_zscore_flags(
    events: DataFrame, z: float = 3.0, min_history: int = 5
) -> DataFrame:
    """Online anomaly detection, batch form: each event is scored against
    the running mean/std of the user's PRIOR events (expanding window,
    current row excluded) and flagged when |z| exceeds the threshold
    after ≥ ``min_history`` observations. This is exactly what the
    streaming twin (streaming/stateful.streaming_zscore_monitor) computes
    from carried (n, Σv, Σv²) state — the batch/stream pair share the
    formula var = (Σv² − (Σv)²/n)/(n−1) on sequentially-accumulated sums,
    so replay equality is bit-exact, not approximate.

    One user_id window pass (the cumulative sums reuse one exchange);
    degenerate windows (n < min_history, zero variance) are excluded on
    both sides.
    """
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    n = F.count("value").over(w)
    s1 = F.sum("value").over(w)
    s2 = F.sum(F.col("value") * F.col("value")).over(w)
    mean = s1 / n
    var = (s2 - s1 * s1 / n) / (n - 1)
    zscore = (F.col("value") - mean) / F.sqrt(var)
    base = events.select(
        "event_id",
        "user_id",
        "ts",
        "value",
        n.alias("_n"),
        var.alias("_var"),
        zscore.alias("_z"),
    )
    return base.filter(
        (F.col("_n") >= min_history) & (F.col("_var") > 0) & (F.abs("_z") > z)
    ).select(
        "event_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts"),
        F.round("value", 6).alias("value"),
        F.round("_z", 6).alias("z_score"),
    )


def session_path_mining(
    events: DataFrame, gap_minutes: int = 30, top_k: int = 20, max_len: int = 8
) -> DataFrame:
    """Sequential-pattern mining one level up from bigrams: the top-k
    full event-type PATHS users take within a session (view→click→
    purchase…), truncated to ``max_len`` steps so a pathological
    session cannot blow up the key space.

    Rides the sessionize window pass (one user_id shuffle), builds each
    session's ordered path with sort_array over (ts, event_id, type)
    structs — deterministic under concurrent timestamps — then one
    partial-agg'd count on the path string and a TakeOrderedAndProject
    top-k. Path cardinality is bounded by |types|^max_len in theory but
    Zipfian in practice; the count agg's map-side combine absorbs it.
    """
    s = sessionize(events, gap_minutes, carry=["event_type"])
    paths = s.groupBy("user_id", "session_id").agg(
        F.array_join(
            F.transform(
                F.slice(
                    F.array_sort(
                        F.collect_list(F.struct("ts", "event_id", "event_type"))
                    ),
                    1,
                    max_len,
                ),
                lambda x: x["event_type"],
            ),
            ">",
        ).alias("path")
    )
    return (
        paths.groupBy("path")
        .agg(F.count("*").alias("n_sessions"))
        .orderBy(F.desc("n_sessions"), "path")
        .limit(top_k)
    )


def time_to_convert(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Conversion-latency distribution: per session with a strict
    view→purchase order, the seconds from first view to first purchase;
    rolled up to one row of count + exact interpolated p50/p90 and mean
    — the funnel's "how fast" companion (funnel_stats is the "how
    many").

    Rides the same sessionize pass (one user_id shuffle); latencies are
    exact integer microseconds converted to seconds at the end, and the
    output is a single scale-independent row.
    """
    s = sessionize(events, gap_minutes, carry=["event_type"])
    stage = s.groupBy("user_id", "session_id").agg(
        F.min(
            F.when(F.col("event_type") == "view", F.unix_micros("ts"))
        ).alias("v_us"),
        F.min(
            F.when(F.col("event_type") == "purchase", F.unix_micros("ts"))
        ).alias("p_us"),
    )
    lat = stage.filter(
        F.col("v_us").isNotNull()
        & F.col("p_us").isNotNull()
        & (F.col("v_us") < F.col("p_us"))
    ).select(((F.col("p_us") - F.col("v_us")) / 1_000_000.0).alias("lat_s"))
    return lat.agg(
        F.count("*").cast("bigint").alias("n_conversions"),
        F.round(F.expr("percentile(lat_s, 0.5)"), 6).alias("p50_s"),
        F.round(F.expr("percentile(lat_s, 0.9)"), 6).alias("p90_s"),
        F.round(F.avg("lat_s"), 6).alias("mean_s"),
    )


def conversion_durations(events: DataFrame) -> DataFrame:
    """Shared survival cohort: per user with a ``signup``, t0 = first
    signup (exact µs), the event = first ``purchase`` strictly after
    t0, right-censored at the corpus max timestamp. Returns
    ``(user_id, t0, dur, observed)`` with ``dur`` in whole elapsed days
    (exact integer µs division). Two user_id-keyed partial-agg passes —
    fact-scale linear, the base both the Kaplan–Meier life table and
    the log-rank test ride. The result is eagerly localCheckpointed:
    it is user-dimension-sized, and every consumer scans it 2-4× (risk
    + event legs, cohort split + sizes) — materializing once is the
    dsir materialize-the-counts rule, without it each leg would re-run
    the fact-scale cohort join."""
    us = F.unix_micros("ts")
    t0s = (
        events.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min(us).alias("t0"))
    )
    conv = (
        events.filter(F.col("event_type") == "purchase")
        .select("user_id", us.alias("p_us"))
        .join(t0s, "user_id")
        .filter(F.col("p_us") > F.col("t0"))
        .groupBy("user_id")
        .agg(F.min("p_us").alias("te"))
    )
    maxts = events.agg(F.max(us).alias("max_us"))
    return (
        t0s.join(conv, "user_id", "left")
        .crossJoin(F.broadcast(maxts))
        .select(
            "user_id",
            "t0",
            F.expr("(coalesce(te, max_us) - t0) div 86400000000").alias("dur"),
            F.col("te").isNotNull().alias("observed"),
        )
        .localCheckpoint()
    )


def kaplan_meier(events: DataFrame) -> DataFrame:
    """Kaplan–Meier survival life table for signup→purchase conversion:
    per user, t0 = first ``signup``, the event = first ``purchase``
    strictly after t0; users who never convert are right-CENSORED at
    the corpus max timestamp (they stay in the at-risk set through the
    end — dropping them is the classic survivorship bias this
    estimator exists to avoid). Durations are whole elapsed days from
    exact integer microsecond arithmetic.

    Output: one row per observed event day — at-risk count n_risk,
    event count d_events, hazard d/n, and the product-limit survival
    S(t) = Π_{t'≤t}(1 − d/n).

    Scale shape: two user_id-keyed partial-agg passes build the
    per-user duration table (fact-scale, linear), the life table
    itself is ≤ #distinct-days rows, so the cumulative-product window
    runs over a result-sized frame (the cusum/equidepth precedent —
    never a fact-table global window). Engine determinism: counts and
    day durations are exact integers; the hazard rounds to 6dp BEFORE
    entering the product so both engines fold bit-identical factors,
    and the product runs as exp∘Σ∘ln over an ORDER BY-fixed sequence
    (ln floored at 1e-12 so a saturated day yields survival 0.0, not
    Spark's log(0)=NULL vs DuckDB's -inf divergence).
    """
    durs = conversion_durations(events).select("dur", "observed")
    # ONE aggregate yields both the total and the observed count per
    # day; the suffix-sum at-risk window then sits DIRECTLY over the
    # aggregate (no join before the window — the plan-audit pin for
    # benign global windows), and filtering to event days afterwards
    # preserves the full at-risk accounting
    base = (
        durs.groupBy("dur")
        .agg(
            F.count("*").alias("c"),
            F.sum(F.col("observed").cast("long")).alias("d_events"),
        )
        .withColumn(
            "n_risk",
            F.sum("c").over(
                Window.orderBy(F.desc("dur")).rowsBetween(
                    Window.unboundedPreceding, Window.currentRow
                )
            ),
        )
    )
    life = base.filter(F.col("d_events") > 0).withColumn(
        "hazard", F.round(F.col("d_events") / F.col("n_risk"), 6)
    )
    surv = F.round(
        F.exp(
            F.sum(F.log(F.greatest(F.lit(1.0) - F.col("hazard"), F.lit(1e-12)))).over(
                Window.orderBy("dur").rowsBetween(
                    Window.unboundedPreceding, Window.currentRow
                )
            )
        ),
        6,
    )
    return (
        life.withColumn("survival", surv)
        .select(
            F.col("dur").cast("bigint").alias("t_day"),
            F.col("n_risk").cast("bigint").alias("n_risk"),
            F.col("d_events").cast("bigint").alias("d_events"),
            "hazard",
            "survival",
        )
        .orderBy("t_day")
    )


def log_rank_test(events: DataFrame) -> DataFrame:
    """Log-rank test between two acquisition cohorts' conversion
    survival curves: users whose first signup lands in the corpus's
    first half ('early') vs second half ('late'), split at the exact
    integer-µs midpoint of observed signup times. The classic
    Kaplan–Meier companion — "do later signups convert at a different
    rate?" — computed from the pooled life table: at each observed
    event day, the early cohort's expected events under H0 are
    d·n₁/n and the hypergeometric variance is
    d·n₁·(n−n₁)·(n−d) / (n²·(n−1)); χ² = (O₁−E₁)²/V.

    Engine determinism: every per-day term casts its integer counts to
    double then multiplies in the same left-assoc order as the oracle —
    overflow-free at any cohort size, and IEEE-correctly-rounded
    products of identical operands are bit-identical cross-engine —
    over a SINGLE division; E₁ and V round after their sums, then χ²
    derives from the rounded moments (the cusum rule). Scale shape: everything after the fact-scale cohort
    pass operates on the ≤#days×2 life table; the at-risk suffix sums
    are a broadcast inequality join of two result-sized frames."""
    durs = conversion_durations(events)
    mid = durs.agg(F.expr("(min(t0) + max(t0)) div 2").alias("mid"))
    g = (
        durs.crossJoin(F.broadcast(mid))
        .select(
            F.when(F.col("t0") <= F.col("mid"), "early")
            .otherwise("late")
            .alias("g"),
            "dur",
            "observed",
        )
    )
    cnt = g.groupBy("g", "dur").agg(
        F.count("*").alias("c"),
        F.sum(F.col("observed").cast("long")).alias("d"),
    )
    days = g.filter("observed").select(F.col("dur").alias("t")).distinct()
    atrisk = (
        cnt.join(F.broadcast(days), F.col("dur") >= F.col("t"))
        .groupBy("t", "g")
        .agg(
            F.sum("c").alias("n_g"),
            F.sum(F.when(F.col("dur") == F.col("t"), F.col("d")).otherwise(0)).alias("d_g"),
        )
    )
    tab = (
        atrisk.groupBy("t")
        .agg(
            F.sum(F.when(F.col("g") == "early", F.col("n_g")).otherwise(0)).alias("n1"),
            F.sum(F.when(F.col("g") == "late", F.col("n_g")).otherwise(0)).alias("n2"),
            F.sum(F.when(F.col("g") == "early", F.col("d_g")).otherwise(0)).alias("d1"),
            F.sum(F.when(F.col("g") == "late", F.col("d_g")).otherwise(0)).alias("d2"),
        )
        .select(
            "d1",
            (F.col("n1") + F.col("n2")).alias("n"),
            (F.col("d1") + F.col("d2")).alias("d"),
            "n1",
        )
    )
    # counts cast to double BEFORE multiplying: the 4-term variance
    # numerator overflows int64 at ~100k-per-day cohorts, while double
    # products are overflow-free and IEEE-correctly-rounded — identical
    # cross-engine for the identical left-assoc operand order (the
    # oracle casts and associates the same way). One division each;
    # the n=1 guard drops degenerate days from V
    dd = F.col("d").cast("double")
    nn = F.col("n").cast("double")
    n1d = F.col("n1").cast("double")
    e1 = (dd * n1d) / nn
    v = F.when(
        F.col("n") > 1,
        (dd * n1d * (nn - n1d) * (nn - dd)) / (nn * nn * (nn - F.lit(1.0))),
    ).otherwise(F.lit(0.0))
    moments = tab.agg(
        F.sum("d1").cast("bigint").alias("obs_early"),
        F.round(F.sum(e1), 6).alias("exp_early"),
        F.round(F.sum(v), 6).alias("v"),
    )
    sizes = g.groupBy().agg(
        F.sum(F.when(F.col("g") == "early", 1).otherwise(0)).cast("bigint").alias("n_early"),
        F.sum(F.when(F.col("g") == "late", 1).otherwise(0)).cast("bigint").alias("n_late"),
    )
    diff = F.col("obs_early") - F.col("exp_early")
    return (
        sizes.crossJoin(F.broadcast(moments))
        .select(
            "n_early",
            "n_late",
            "obs_early",
            "exp_early",
            F.when(F.col("v") > 0, F.round(diff * diff / F.col("v"), 6)).alias("chi2"),
        )
    )


def ewma_smoothing(events: DataFrame, alpha: float = 0.5, k: int = 8) -> DataFrame:
    """Per-user bounded-lag EWMA of the event value: a finite-window
    exponential smoother — ewma_t = Σ_{j<k} α^j·x_{t−j} / Σ_{j<k} α^j
    over the lags that exist (early rows normalize by the weights
    actually present, the standard bias correction). The k-lag cutoff
    is what makes it a WINDOW expression instead of a recursion: state
    is k lag columns, not an unbounded scan, so it runs identically in
    batch and (with a k-row state buffer) streaming.

    Scale shape: ONE per-user window (never global) materializing k lag
    columns; everything after is a map-side arithmetic fold. Engine
    determinism: α defaults to 0.5 whose powers are exact binary
    scalings (x·0.5^j only shifts the exponent — no mantissa rounding),
    the fold is written left-to-right identically in the oracle, and
    the final quotient rounds 6dp.
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    num = None
    den = None
    for j in range(k):
        lj = F.lag("value", j).over(w)
        term = F.when(lj.isNotNull(), lj * F.lit(alpha**j)).otherwise(F.lit(0.0))
        wgt = F.when(lj.isNotNull(), F.lit(alpha**j)).otherwise(F.lit(0.0))
        num = term if num is None else num + term
        den = wgt if den is None else den + wgt
    return events.select(
        "user_id",
        "event_id",
        F.round("value", 6).alias("value"),
        F.round(num / den, 6).alias("ewma"),
    )


def autocorrelation(orders: DataFrame, max_lag: int = 7) -> DataFrame:
    """Autocorrelation function (ACF) of the daily-revenue series at
    calendar lags 1..``max_lag``: acf_l = Pearson corr(rev_d, rev_{d−l})
    over every day d where both endpoints exist. The series-analysis
    primitive the reference's batch jobs never had — drift/seasonality
    detection over ingest volume is the first chart every 100 TB
    pipeline owner asks for (q_seasonal_profile gives the profile; this
    gives the dependence structure).

    Spark-first shape: NO global window. The series is first reduced to
    one row per day (a partial-agg groupBy — days are bounded by the
    calendar, not the data), lags become an exploded literal array, and
    each lagged pair is recovered with an equi-JOIN on the shifted date
    — shuffles scale with #days × max_lag, never with row count, and
    the big fact scan aggregates map-side before anything moves. corr()
    is the built-in co-moment aggregate in both engines; rounding to
    6dp absorbs the engines' accumulation-order difference (the float
    contract every stats query here uses).
    """
    daily = (
        orders.groupBy(F.to_date("o_orderdate").alias("d"))
        .agg(F.sum("o_totalprice").alias("rev"))
    )
    lagged = daily.select(
        "d",
        "rev",
        F.explode(F.array([F.lit(i) for i in range(1, max_lag + 1)])).alias("lag"),
    )
    prev = daily.select(F.col("d").alias("d_prev"), F.col("rev").alias("rev_prev"))
    pairs = lagged.join(
        prev, F.expr("date_sub(d, lag)") == F.col("d_prev"), "inner"
    )
    return (
        pairs.groupBy("lag")
        .agg(
            F.count("*").cast("bigint").alias("n_pairs"),
            F.round(F.corr("rev", "rev_prev"), 6).alias("acf"),
        )
        .select(F.col("lag").cast("int").alias("lag"), "n_pairs", "acf")
    )
