"""Round-2 extension operators: phrase search, native session windows,
token budget, co-occurrence/PMI, column profiling, TPC-H Q4/Q22 shapes,
triangle counting."""

import pytest
from pyspark.sql import functions as F

from page_rank_hadoop_spark.operators import graph, index, relational, textstats, windows

SF0001 = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# phrase search
# ---------------------------------------------------------------------------

def test_phrase_matches_hand_built(spark):
    df = spark.createDataFrame(
        [
            (1, "big data stream data flows"),      # one "stream data" at pos 2
            (2, "stream data stream data"),          # two matches, overlapping terms
            (3, "data stream"),                      # reversed — no match
            (4, "stream of data"),                   # gap — no match
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: (r["phrase_tf"], r["first_pos"]) for r in
           index.phrase_matches(df, ["stream", "data"]).collect()}
    assert out == {1: (1, 2), 2: (2, 0)}


def test_phrase_matches_three_terms(spark):
    df = spark.createDataFrame(
        [(1, "a quick brown fox and a quick brown cat"), (2, "quick fox brown")],
        ["doc_id", "text"],
    )
    out = index.phrase_matches(df, ["quick", "brown", "fox"]).collect()
    assert [(r["doc_id"], r["phrase_tf"], r["first_pos"]) for r in out] == [(1, 1, 1)]


def test_phrase_matches_repeated_term_phrase(spark):
    df = spark.createDataFrame([(1, "go go go stop")], ["doc_id", "text"])
    out = index.phrase_matches(df, ["go", "go"]).collect()
    assert [(r["phrase_tf"], r["first_pos"]) for r in out] == [(2, 0)]


# ---------------------------------------------------------------------------
# session windows (native)
# ---------------------------------------------------------------------------

def test_session_window_matches_sessionize_counts(spark, events):
    """Native session_window and lag/cumsum sessionize produce the same
    session partition (both merge at a gap of exactly the window size —
    measured inclusive boundary, see session_window_stats docstring)."""
    native = windows.session_window_stats(events, gap_minutes=30)
    manual = windows.session_stats(events, gap_minutes=30)
    # same number of sessions and same multiset of (n_events, sum_value)
    assert native.count() == manual.count()
    a = sorted((r["n_events"], r["sum_value"]) for r in native.collect())
    b = sorted((r["n_events"], r["sum_value"]) for r in manual.collect())
    assert a == b


def test_session_window_boundary_semantics(spark):
    """A gap of exactly the window size MERGES (inclusive boundary) —
    same convention as sessionize's strict-> new-session test."""
    df = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00", 7, "c", 1.0),
         (2, "2024-01-01 00:30:00", 7, "c", 1.0),
         (3, "2024-01-01 01:00:00.000001", 7, "c", 1.0)],  # 1µs past gap → new
        ["event_id", "ts", "user_id", "event_type", "value"],
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = windows.session_window_stats(df, gap_minutes=30).collect()
    assert sorted(r["n_events"] for r in out) == [1, 2]
    assert windows.session_stats(df, gap_minutes=30).count() == 2


# ---------------------------------------------------------------------------
# token budget
# ---------------------------------------------------------------------------

def test_token_budget_hand_checked(spark):
    df = spark.createDataFrame(
        [(1, "Hello world, it's 42 degrees!", 29)],
        ["doc_id", "text", "n_chars"],
    )
    r = textstats.token_budget(df).collect()[0]
    assert r["ws_tokens"] == 5
    # lower: "hello world, it's 42 degrees!" →
    # [hello][ world][,][ it]['s][ 42][ degrees][!]
    assert r["bpe_tokens"] == 8
    assert r["chars_per_bpe_token"] == round(29 / 8, 4)


def test_token_budget_empty_text(spark):
    df = spark.createDataFrame([(1, "", 0)], ["doc_id", "text", "n_chars"])
    r = textstats.token_budget(df).collect()[0]
    assert (r["ws_tokens"], r["bpe_tokens"], r["chars_per_bpe_token"]) == (0, 0, None)


# ---------------------------------------------------------------------------
# co-occurrence
# ---------------------------------------------------------------------------

def test_term_cooccurrence_hand_built(spark):
    # "x y" together in 3 docs; "x z" in 1; vocab covers all terms
    # (distinct one-off filler words so no filler pair reaches min_docs)
    rows = [(0, "x y aaa"), (1, "x y bbb"), (2, "x y ccc"), (3, "x z"), (4, "y alone")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = textstats.term_cooccurrence(df, vocab_size=10, min_docs=2).collect()
    pairs = {(r["term_a"], r["term_b"]): r["n_both"] for r in out}
    assert pairs == {("x", "y"): 3}


def test_term_cooccurrence_pmi_sign(spark):
    # pair present in every doc → pmi = ln(n·N/(n·n)) = ln(N/n) = 0 when df==N
    df = spark.createDataFrame([(i, "a b") for i in range(5)], ["doc_id", "text"])
    out = textstats.term_cooccurrence(df, vocab_size=5, min_docs=2).collect()
    assert len(out) == 1 and abs(out[0]["pmi"]) < 1e-9


# ---------------------------------------------------------------------------
# column profile
# ---------------------------------------------------------------------------

def test_column_profile_hand_built(spark):
    df = spark.createDataFrame(
        [(1.0, None), (2.0, 5.0), (2.0, 5.0), (None, 7.0)], ["a", "b"]
    )
    out = {r["column_name"]: r for r in relational.column_profile(df, ["a", "b"]).collect()}
    assert out["a"]["n_nulls"] == 1 and out["a"]["n_distinct"] == 2
    assert out["a"]["min_v"] == 1.0 and out["a"]["max_v"] == 2.0
    assert out["b"]["n_nulls"] == 1 and out["b"]["n_distinct"] == 2
    assert out["b"]["avg_v"] == round((5 + 5 + 7) / 3, 6)


def test_column_profile_single_job(spark):
    """The profile is ONE aggregation plan, not per-column scans: the
    optimized plan contains exactly one scan of the input."""
    df = spark.range(100).select(
        F.col("id").cast("double").alias("a"), (F.col("id") % 7).cast("double").alias("b")
    )
    plan = relational.column_profile(df, ["a", "b"])._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("Range (0, 100") == 1


# ---------------------------------------------------------------------------
# TPC-H Q4 / Q22 shapes
# ---------------------------------------------------------------------------

def test_order_priority_counts_semi_join_semantics(spark):
    orders = spark.createDataFrame(
        [(1, "1-URGENT", "1996-03-01"), (2, "1-URGENT", "1996-03-01"),
         (3, "2-HIGH", "1995-01-01")],  # outside date range
        ["o_orderkey", "o_orderpriority", "o_orderdate"],
    ).withColumn("o_orderdate", F.col("o_orderdate").cast("timestamp"))
    lineitem = spark.createDataFrame(
        [(1, "1996-08-01"), (1, "1996-03-02"),   # one late, one on-time → counts ONCE
         (2, "1996-03-05"),                       # on-time only → not counted
         (3, "1996-08-01")],                      # late but order outside range
        ["l_orderkey", "l_shipdate"],
    ).withColumn("l_shipdate", F.col("l_shipdate").cast("timestamp"))
    out = relational.order_priority_counts(orders, lineitem).collect()
    assert [(r["o_orderpriority"], r["n_orders"]) for r in out] == [("1-URGENT", 1)]


def test_idle_customers_nonempty_at_sf0001(spark):
    from page_rank_hadoop_spark.sources.catalog import load_table

    out = relational.idle_customer_stats(
        load_table(spark, SF0001, "customer"), load_table(spark, SF0001, "orders")
    )
    assert out.agg(F.sum("n_customers")).collect()[0][0] == 5


# ---------------------------------------------------------------------------
# triangle count
# ---------------------------------------------------------------------------

def test_triangle_count_hand_built(spark):
    # K4 on {1,2,3,4} has 4 triangles; plus a pendant edge and a duplicate
    # + reversed edge that must not change the count
    edges = [(a, b) for a in range(1, 5) for b in range(1, 5) if a != b]
    edges += [(5, 1), (1, 5), (2, 1)]
    df = spark.createDataFrame(edges, ["src", "dst"])
    assert graph.triangle_count(df).collect()[0]["n_triangles"] == 4


def test_triangle_count_no_triangles(spark):
    df = spark.createDataFrame([(1, 2), (2, 3), (3, 4)], ["src", "dst"])
    assert graph.triangle_count(df).collect()[0]["n_triangles"] == 0


def test_triangle_count_matches_bruteforce(spark):
    """Property check vs an O(n³) reference on a small random-ish graph."""
    import itertools

    edges = [(i, (i * 7 + 3) % 13) for i in range(13)] + [(i, (i * 5 + 1) % 13) for i in range(13)]
    und = {(min(a, b), max(a, b)) for a, b in edges if a != b}
    expected = sum(
        1 for a, b, c in itertools.combinations(sorted({v for e in und for v in e}), 3)
        if (a, b) in und and (a, c) in und and (b, c) in und
    )
    df = spark.createDataFrame(list(und), ["src", "dst"])
    assert graph.triangle_count(df).collect()[0]["n_triangles"] == expected


# ---------------------------------------------------------------------------
# proximity search (NEAR/k)
# ---------------------------------------------------------------------------

def test_proximity_matches_hand_built(spark):
    df = spark.createDataFrame(
        [
            (1, "alpha beta gamma"),            # dist 1 → match at k=2
            (2, "alpha x y beta"),              # dist 3 → no match at k=2
            (3, "beta z alpha"),                # dist 2, order-agnostic → match
            (4, "alpha only here"),             # missing beta → no row
            (5, "beta beta x alpha beta"),      # min over all pairs = 1
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: (r["min_dist"], r["tf_a"], r["tf_b"]) for r in
           index.proximity_matches(df, "alpha", "beta", max_dist=2).collect()}
    assert out == {1: (1, 1, 1), 3: (2, 1, 1), 5: (1, 1, 3)}


# ---------------------------------------------------------------------------
# document chunking (RAG prep)
# ---------------------------------------------------------------------------

def test_chunk_documents_windows_and_overlap(spark):
    # 10 tokens, size=4, stride=3 → starts 0,3,6,9 → lengths 4,4,4,1
    toks = "ta tb tc td te tf tg th ti tj".split()
    df = spark.createDataFrame([(1, " ".join(toks)), (2, "")], ["doc_id", "text"])
    rows = textstats.chunk_documents(df, size=4, stride=3).collect()
    assert [r["doc_id"] for r in rows] == [1, 1, 1, 1]  # empty doc → no chunks
    assert [r["chunk_id"] for r in rows] == [0, 1, 2, 3]
    assert [r["n_tokens"] for r in rows] == [4, 4, 4, 1]
    assert rows[0]["chunk_text"] == "ta tb tc td"
    assert rows[1]["chunk_text"] == "td te tf tg"   # stride-3 overlap of 1
    assert rows[3]["chunk_text"] == "tj"
    # every token is covered by at least one chunk
    covered = {t for r in rows for t in r["chunk_text"].split()}
    assert covered == set(toks)


def test_chunk_documents_short_doc_single_chunk(spark):
    df = spark.createDataFrame([(7, "just three tokens")], ["doc_id", "text"])
    rows = textstats.chunk_documents(df, size=64, stride=48).collect()
    assert [(r["chunk_id"], r["n_tokens"]) for r in rows] == [(0, 3)]


# ---------------------------------------------------------------------------
# mixture sampling
# ---------------------------------------------------------------------------

def test_mixture_sample_deterministic_and_monotone(spark):
    from page_rank_hadoop_spark.operators import pipeline as pl

    df = spark.createDataFrame(
        [(i, "a" if i % 2 else "b") for i in range(400)], ["doc_id", "source"]
    )
    kept1 = {r["doc_id"] for r in pl.mixture_sample(df, {"a": 0.5, "b": 0.1}).collect()}
    kept2 = {r["doc_id"] for r in pl.mixture_sample(df, {"a": 0.5, "b": 0.1}).collect()}
    assert kept1 == kept2  # reproducible
    # rate=1.0 keeps everything in that group; rate=0.0 keeps nothing
    all_a = {r["doc_id"] for r in pl.mixture_sample(df, {"a": 1.0}).collect()}
    assert all_a == {i for i in range(400) if i % 2}
    # a row's fate in group a is unchanged when only b's rate changes
    kept3 = {r["doc_id"] for r in pl.mixture_sample(df, {"a": 0.5, "b": 0.9}).collect()}
    assert {d for d in kept1 if d % 2} == {d for d in kept3 if d % 2}
    # approximate rate honored (md5 uniformity; generous tolerance)
    n_a = sum(1 for d in kept1 if d % 2)
    assert 60 <= n_a <= 140  # E=100 of 200 at p=.5


def test_mixture_sample_unknown_group_default_rate(spark):
    from page_rank_hadoop_spark.operators import pipeline as pl

    df = spark.createDataFrame([(i, "zzz") for i in range(50)], ["doc_id", "source"])
    assert pl.mixture_sample(df, {"a": 1.0}).count() == 0
    assert pl.mixture_sample(df, {"a": 0.0}, default_rate=1.0).count() == 50


# ---------------------------------------------------------------------------
# TPC-H Q5 shape (local supplier volume)
# ---------------------------------------------------------------------------

def test_local_supplier_volume_hand_built(spark):
    region = spark.createDataFrame([(1, "ASIA"), (2, "EUROPE")], ["r_regionkey", "r_name"])
    nation = spark.createDataFrame(
        [(10, 1, "JAPAN"), (11, 1, "CHINA"), (20, 2, "FRANCE")],
        ["n_nationkey", "n_regionkey", "n_name"],
    )
    supplier = spark.createDataFrame(
        [(100, 10), (101, 11), (102, 20)], ["s_suppkey", "s_nationkey"]
    )
    customer = spark.createDataFrame(
        [(200, 10), (201, 11), (202, 20)], ["c_custkey", "c_nationkey"]
    )
    orders = spark.createDataFrame(
        [(300, 200, "1995-06-01"), (301, 201, "1994-01-01"), (302, 200, "1996-01-01")],
        ["o_orderkey", "o_custkey", "o_orderdate"],
    )
    lineitem = spark.createDataFrame(
        [
            (300, 100, 100.0, 0.1),   # cust JP + supp JP, in range → 90 to JAPAN
            (300, 101, 50.0, 0.0),    # cust JP + supp CN → nation mismatch, dropped
            (301, 100, 999.0, 0.0),   # order out of date range, dropped
            (302, 100, 10.0, 0.5),    # cust JP + supp JP → 5 to JAPAN
            (302, 102, 77.0, 0.0),    # supp FRANCE (not ASIA), dropped
        ],
        ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
    )
    rows = relational.local_supplier_volume(
        customer, orders, lineitem, supplier, nation, region
    ).collect()
    assert [(r["n_name"], r["revenue"]) for r in rows] == [("JAPAN", 95.0)]


# ---------------------------------------------------------------------------
# ranking window suite + running totals
# ---------------------------------------------------------------------------

def test_ranking_suite_hand_checked(spark):
    from page_rank_hadoop_spark.operators import windows as W

    df = spark.createDataFrame(
        [(1, "en", 10), (2, "en", 20), (3, "en", 20), (4, "en", 40), (5, "fr", 7)],
        ["doc_id", "lang", "n_chars"],
    )
    out = {r["doc_id"]: r for r in W.ranking_function_suite(df, n_tiles=2).collect()}
    # en: order 10,20,20,40 → ntile(2)=[1,1,2,2]; pct_rank=[0,1/3,2/3,1]
    assert [out[i]["quartile"] for i in (1, 2, 3, 4)] == [1, 1, 2, 2]
    assert out[2]["pct_rank"] == round(1 / 3, 6) and out[4]["pct_rank"] == 1.0
    # dense_rank ties on n_chars=20 would share rank only if order key tied;
    # (n_chars, doc_id) is unique so ranks are 1..4
    assert [out[i]["drank"] for i in (1, 2, 3, 4)] == [1, 2, 3, 4]
    assert out[5]["cume"] == 1.0  # single row in fr


def test_running_totals_cumulative(spark):
    import datetime as dt

    from page_rank_hadoop_spark.operators import windows as W

    t0 = dt.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [
            (1, t0, "click", 1.0),
            (2, t0 + dt.timedelta(minutes=1), "click", 2.5),
            (3, t0, "view", 10.0),
        ],
        "event_id LONG, ts TIMESTAMP, event_type STRING, value DOUBLE",
    )
    rows = {r["event_id"]: r for r in W.running_totals(df).collect()}
    assert (rows[1]["running_value"], rows[1]["running_n"]) == (1.0, 1)
    assert (rows[2]["running_value"], rows[2]["running_n"]) == (3.5, 2)
    assert (rows[3]["running_value"], rows[3]["running_n"]) == (10.0, 1)


def test_moving_average_hand_checked(spark):
    import datetime as dt

    from page_rank_hadoop_spark.operators import windows as W

    t0 = dt.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [(i, t0 + dt.timedelta(minutes=i), "click", float(i)) for i in range(1, 7)],
        "event_id LONG, ts TIMESTAMP, event_type STRING, value DOUBLE",
    )
    rows = {r["event_id"]: r for r in W.moving_average(df, n_preceding=3).collect()}
    # row 5: frame = values 2,3,4,5 → avg 3.5, first 2, last 5, lead = 6
    assert rows[5]["moving_avg"] == 3.5
    assert rows[5]["frame_first"] == 2.0 and rows[5]["frame_last"] == 5.0
    assert rows[5]["next_event_id"] == 6
    # row 2: partial frame 1,2 → avg 1.5; final row has no lead
    assert rows[2]["moving_avg"] == 1.5
    assert rows[6]["next_event_id"] is None
