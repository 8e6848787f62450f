"""Round-3 operators: skyline, gaps-and-islands interval merge,
event-type bigrams, blocked fuzzy name matching, dispersion stats,
char entropy."""

import datetime as dt
import math

from pyspark.sql import functions as F

from page_rank_hadoop_spark.operators import dedup, relational, textstats, windows


# ---------------------------------------------------------------------------
# skyline (Pareto frontier)
# ---------------------------------------------------------------------------

def _parts(spark, rows):
    return spark.createDataFrame(
        [(k, f"part{k}", float(p), s) for k, p, s in rows],
        "p_partkey LONG, p_name STRING, p_retailprice DOUBLE, p_size INT",
    )


def test_skyline_basic_dominance(spark):
    # (price, size): (1,5) and (3,2) are the frontier; (3,5) dominated by
    # both; (4,2) dominated by (3,2); (2,4) on the frontier (cheaper than
    # (3,2), smaller than (1,5))
    df = _parts(spark, [(1, 1, 5), (2, 3, 2), (3, 3, 5), (4, 4, 2), (5, 2, 4)])
    got = {r["p_partkey"] for r in relational.skyline_parts(df).collect()}
    assert got == {1, 2, 5}


def test_skyline_ties_both_dims_survive_together(spark):
    # two identical points: neither strictly dominates — both survive
    df = _parts(spark, [(1, 2, 3), (2, 2, 3), (3, 5, 5)])
    got = {r["p_partkey"] for r in relational.skyline_parts(df).collect()}
    assert got == {1, 2}


def test_skyline_same_price_smaller_size_dominates(spark):
    df = _parts(spark, [(1, 2, 3), (2, 2, 4)])
    got = {r["p_partkey"] for r in relational.skyline_parts(df).collect()}
    assert got == {1}


# ---------------------------------------------------------------------------
# gaps-and-islands interval merge
# ---------------------------------------------------------------------------

def _events(spark, rows):
    t0 = dt.datetime(2024, 6, 1)
    return spark.createDataFrame(
        [
            (i, t0 + dt.timedelta(seconds=s), uid, "view", 0.0)
            for i, (uid, s) in enumerate(rows)
        ],
        "event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING, value DOUBLE",
    )


def test_interval_merge_overlap_and_gap(spark):
    # user 1: events at t=0 and t=300 overlap (cover 600s) -> one span;
    # t=1500 starts past the merged end (600+300=900 < 1500) -> new span
    ev = _events(spark, [(1, 0), (1, 300), (1, 1500)])
    out = windows.merge_event_intervals(ev, cover_seconds=600).collect()
    spans = sorted((r["span_start_us"], r["span_end_us"], r["n_events"]) for r in out)
    base = int(dt.datetime(2024, 6, 1).timestamp()) * 1_000_000
    assert spans == [
        (base, base + 900_000_000, 2),
        (base + 1_500_000_000, base + 2_100_000_000, 1),
    ]


def test_interval_merge_touching_merges(spark):
    # end == next start: "touching" merges (strict > starts a new island)
    ev = _events(spark, [(1, 0), (1, 600)])
    out = windows.merge_event_intervals(ev, cover_seconds=600).collect()
    assert len(out) == 1 and out[0]["n_events"] == 2


def test_interval_merge_users_independent(spark):
    ev = _events(spark, [(1, 0), (2, 0)])
    assert windows.merge_event_intervals(ev).count() == 2


# ---------------------------------------------------------------------------
# event-type bigrams
# ---------------------------------------------------------------------------

def test_event_bigrams_counts_transitions(spark):
    t0 = dt.datetime(2024, 6, 1)
    rows = [
        (1, t0, 1, "view", 0.0),
        (2, t0 + dt.timedelta(seconds=1), 1, "click", 0.0),
        (3, t0 + dt.timedelta(seconds=2), 1, "view", 0.0),
        (4, t0 + dt.timedelta(seconds=3), 1, "click", 0.0),
        (5, t0, 2, "view", 0.0),  # single event user: no bigram
    ]
    ev = spark.createDataFrame(
        rows, "event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING, value DOUBLE"
    )
    got = {
        (r["prev_type"], r["event_type"]): r["n"]
        for r in windows.event_type_bigrams(ev).collect()
    }
    assert got == {("view", "click"): 2, ("click", "view"): 1}


# ---------------------------------------------------------------------------
# fuzzy name matching
# ---------------------------------------------------------------------------

def test_fuzzy_name_pairs_blocked(spark):
    df = spark.createDataFrame(
        [
            (1, "acme corp", 10),
            (2, "acme corp.", 10),   # distance 1 -> match
            (3, "acme corp", 20),    # other block: never compared
            (4, "zenith ltd", 10),   # distance > 2 -> no match
        ],
        "id LONG, name STRING, nat INT",
    )
    out = dedup.fuzzy_name_pairs(df, key="id", name_col="name", block_col="nat").collect()
    assert [(r["key_a"], r["key_b"], r["distance"]) for r in out] == [(1, 2, 1)]


# ---------------------------------------------------------------------------
# dispersion stats
# ---------------------------------------------------------------------------

def test_dispersion_stats_known_values(spark):
    df = spark.createDataFrame(
        [("A", 1.0), ("A", 2.0), ("A", 3.0), ("A", 4.0)],
        "l_returnflag STRING, l_extendedprice DOUBLE",
    )
    r = relational.dispersion_stats(df).collect()[0]
    assert r["median_price"] == 2.5      # interpolated
    assert r["avg_price"] == 2.5
    assert r["min_price"] == 1.0 and r["max_price"] == 4.0
    assert abs(r["stddev_price"] - round(math.sqrt(5.0 / 3.0), 4)) < 1e-9
    assert r["n"] == 4


# ---------------------------------------------------------------------------
# char entropy
# ---------------------------------------------------------------------------

def test_char_entropy_uniform_and_degenerate(spark):
    df = spark.createDataFrame(
        [(1, "aaaa", "xx"), (2, "abab", "yy")], "doc_id LONG, text STRING, lang STRING"
    )
    got = {r["lang"]: (r["char_entropy"], r["n_distinct_chars"])
           for r in textstats.char_entropy_by_lang(df).collect()}
    assert got["xx"] == (-0.0, 1) or got["xx"] == (0.0, 1)
    assert got["yy"] == (1.0, 2)
