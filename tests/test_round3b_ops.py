"""Round-3b operators: time-series gap fill, MAD outliers, market
basket, link prediction, training shards, vocab coverage, Gram matrix,
RFM segmentation."""

import datetime as dt
import math

from pyspark.sql import functions as F

from page_rank_hadoop_spark.operators import dedup, graph, pipeline, relational
from page_rank_hadoop_spark.operators import similarity, textstats, windows


def _ev(spark, rows):
    """rows: (event_id, user_id, minutes_from_t0, value)"""
    t0 = dt.datetime(2024, 6, 1)
    return spark.createDataFrame(
        [
            (i, t0 + dt.timedelta(minutes=m), uid, "view", float(v))
            for i, uid, m, v in rows
        ],
        "event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING, value DOUBLE",
    )


# ---------------------------------------------------------------------------
# gap fill
# ---------------------------------------------------------------------------

def test_gap_fill_fills_missing_hours_forward(spark):
    # user 1: events in hour 0 and hour 3 → grid has 4 hours, hours 1-2
    # are gaps carrying hour 0's value
    df = _ev(spark, [(0, 1, 5, 10.0), (1, 1, 10, 20.0), (2, 1, 185, 7.0)])
    out = {r["hour"]: r for r in windows.gap_fill_hourly(df).collect()}
    assert len(out) == 4
    assert out["2024-06-01 00:00:00"]["n_events"] == 2
    assert out["2024-06-01 00:00:00"]["filled_value"] == 30.0
    assert out["2024-06-01 01:00:00"]["n_events"] == 0
    assert out["2024-06-01 01:00:00"]["is_gap"] == 1
    assert out["2024-06-01 01:00:00"]["filled_value"] == 30.0
    assert out["2024-06-01 02:00:00"]["filled_value"] == 30.0
    assert out["2024-06-01 03:00:00"]["filled_value"] == 7.0
    assert out["2024-06-01 03:00:00"]["is_gap"] == 0


def test_gap_fill_per_user_grids_are_independent(spark):
    df = _ev(spark, [(0, 1, 0, 1.0), (1, 1, 120, 2.0), (2, 2, 60, 5.0)])
    rows = windows.gap_fill_hourly(df).collect()
    by_user = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r)
    assert len(by_user[1]) == 3  # hours 0,1,2
    assert len(by_user[2]) == 1  # only its own hour — no global grid


# ---------------------------------------------------------------------------
# MAD outliers
# ---------------------------------------------------------------------------

def test_mad_outliers_flags_only_extreme_values(spark):
    vals = [10.0, 11.0, 12.0, 10.5, 11.5, 9.5, 10.2, 11.8, 500.0]
    df = _ev(spark, [(i, 1, i, v) for i, v in enumerate(vals)])
    out = relational.mad_outliers(df).collect()
    assert [r["event_id"] for r in out] == [8]
    r = out[0]
    assert r["med"] == 11.0
    # MAD of |v-11| = {1,0,1,0.5,0.5,1.5,0.8,0.8,489} → median 0.8
    assert abs(r["mad"] - 0.8) < 1e-9
    assert r["mz_score"] > 100


def test_mad_outliers_constant_group_excluded(spark):
    df = _ev(spark, [(i, 1, i, 5.0) for i in range(10)])
    assert relational.mad_outliers(df).count() == 0


# ---------------------------------------------------------------------------
# market basket
# ---------------------------------------------------------------------------

def test_market_basket_pair_support_and_jaccard(spark):
    # orders: {1,2} ×3, {1,3} ×1 → pair (1,2) support 3; (1,3) below min
    rows = []
    for o in range(3):
        rows += [(o, 1), (o, 2)]
    rows += [(3, 1), (3, 3)]
    li = spark.createDataFrame(rows, "l_orderkey LONG, l_partkey LONG")
    out = relational.market_basket(li, min_pair_orders=3).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["part_a"], r["part_b"], r["n_both"]) == (1, 2, 3)
    assert (r["n_a"], r["n_b"]) == (4, 3)
    assert abs(r["jaccard"] - 3 / 4) < 1e-9


def test_market_basket_duplicate_lines_count_once(spark):
    li = spark.createDataFrame(
        [(1, 10), (1, 10), (1, 20)] * 3, "l_orderkey LONG, l_partkey LONG"
    )
    out = relational.market_basket(li, min_pair_orders=1).collect()
    assert len(out) == 1
    assert out[0]["n_both"] == 1  # distinct (order, part) before pairing


# ---------------------------------------------------------------------------
# link prediction
# ---------------------------------------------------------------------------

def test_common_neighbor_pairs_jaccard(spark):
    # 1→{a,b,c}, 2→{a,b}, 3→{c}: (1,2) share 2, jaccard 2/(3+2-2)=2/3
    e = spark.createDataFrame(
        [(1, 100), (1, 101), (1, 102), (2, 100), (2, 101), (3, 102)],
        "src LONG, dst LONG",
    )
    out = graph.common_neighbor_pairs(e, min_common=2).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["u"], r["v"], r["n_common"]) == (1, 2, 2)
    assert abs(r["jaccard"] - 2 / 3) < 1e-6  # output rounded to 6dp


def test_common_neighbor_pairs_hot_target_capped(spark):
    # one target with fan-in above the cap contributes no wedges
    e = spark.createDataFrame(
        [(u, 999) for u in range(10)], "src LONG, dst LONG"
    )
    assert graph.common_neighbor_pairs(e, min_common=1, max_dst_fanout=5).count() == 0
    assert graph.common_neighbor_pairs(e, min_common=1, max_dst_fanout=20).count() == 45


# ---------------------------------------------------------------------------
# training shards
# ---------------------------------------------------------------------------

def test_training_shards_partitions_everything_evenly(spark, docs):
    out = pipeline.training_shards(docs, n_shards=4).collect()
    assert len(out) == 4
    assert sum(r["n_docs"] for r in out) == docs.count()
    # balance: every shard within 60% of the ideal even split
    for r in out:
        assert 0.4 < r["balance_ratio"] < 1.6, r


def test_training_shards_deterministic(spark, docs):
    a = sorted(map(tuple, pipeline.training_shards(docs, n_shards=4).collect()))
    b = sorted(map(tuple, pipeline.training_shards(docs, n_shards=4).collect()))
    assert a == b


# ---------------------------------------------------------------------------
# vocab coverage
# ---------------------------------------------------------------------------

def test_vocab_coverage_monotone_and_bounded(spark, docs):
    out = {r["vocab_size"]: r for r in textstats.vocab_coverage(docs).collect()}
    assert set(out) == {100, 300, 1000, 3000, 10000}
    cov = [out[s]["coverage"] for s in sorted(out)]
    assert cov == sorted(cov)
    assert all(0.0 < c <= 1.0 for c in cov)
    totals = {out[s]["total_tokens"] for s in out}
    assert len(totals) == 1  # denominator independent of V


def test_vocab_coverage_tiny_exact(spark):
    d = spark.createDataFrame(
        [(1, "a a a b"), (2, "a b c")], "doc_id LONG, text STRING"
    )
    out = {r["vocab_size"]: r for r in
           textstats.vocab_coverage(d, sizes=(1, 2, 3)).collect()}
    assert out[1]["covered_tokens"] == 4  # 'a' ×4
    assert out[2]["covered_tokens"] == 6  # + 'b' ×2
    assert out[3]["covered_tokens"] == 7
    assert abs(out[3]["coverage"] - 1.0) < 1e-9


# ---------------------------------------------------------------------------
# Gram matrix
# ---------------------------------------------------------------------------

def test_gram_matrix_matches_numpy(spark):
    import numpy as np

    rng = [[float((i * 7 + j * 3) % 5) - 2.0 for j in range(4)] for i in range(6)]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(rng)], "vec_id LONG, embedding ARRAY<FLOAT>"
    )
    out = similarity.gram_matrix(df, dim=4).collect()
    assert len(out) == 10  # upper triangle of 4×4
    X = np.array(rng)
    G = X.T @ X
    for r in out:
        assert abs(r["gram"] - round(G[r["i"], r["j"]], 4)) < 1e-6


def test_gram_matrix_partition_invariant(spark):
    import numpy as np

    vals = [[float(x) for x in np.arange(8) + i] for i in range(20)]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "vec_id LONG, embedding ARRAY<FLOAT>"
    )
    one = sorted(map(tuple, similarity.gram_matrix(df.coalesce(1), dim=8).collect()))
    many = sorted(map(tuple, similarity.gram_matrix(df.repartition(7), dim=8).collect()))
    assert one == many  # partial-sum association absorbed by rounding


# ---------------------------------------------------------------------------
# RFM
# ---------------------------------------------------------------------------

def test_rfm_scores_cover_all_customers(spark):
    t0 = dt.datetime(2024, 1, 1)
    rows = []
    k = 0
    for c in range(8):
        for o in range(c + 1):  # frequency varies 1..8
            rows.append((k, c, "O", 100.0 * (c + 1), t0 + dt.timedelta(days=o)))
            k += 1
    orders = spark.createDataFrame(
        rows,
        "o_orderkey LONG, o_custkey LONG, o_orderstatus STRING, "
        "o_totalprice DOUBLE, o_orderdate TIMESTAMP",
    )
    out = relational.rfm_scores(orders, n_tiles=4).collect()
    assert sum(r["n_customers"] for r in out) == 8
    for r in out:
        for c in ("r_tile", "f_tile", "m_tile"):
            assert 1 <= r[c] <= 4
    # the highest-spend, most-frequent customer lands in f=1, m=1
    top = [r for r in out if r["f_tile"] == 1 and r["m_tile"] == 1]
    assert top


# ---------------------------------------------------------------------------
# repeated-chunk boilerplate removal
# ---------------------------------------------------------------------------

def test_remove_repeated_chunks_drops_cross_doc_boilerplate(spark):
    boiler = "alpha beta gamma delta epsilon zeta eta theta"  # exactly 8 words
    d = spark.createDataFrame(
        [
            (1, boiler + " one two three four five six seven eight"),
            (2, boiler + " nine ten eleven twelve thirteen fourteen fifteen sixteen"),
            (3, boiler + " a b c d e f g h"),
            (4, "unique words entirely different content here now ok"),
        ],
        "doc_id LONG, text STRING",
    )
    out = {r["doc_id"]: r for r in
           textstats.remove_repeated_chunks(d, chunk_words=8, max_doc_freq=2).collect()}
    # boilerplate chunk occurs in 3 docs > max_df 2 → dropped from each
    assert out[1]["n_chunks"] == 2 and out[1]["n_kept"] == 1
    assert out[4]["n_chunks"] == 1 and out[4]["n_kept"] == 1
    assert out[4]["fingerprint"] is not None


def test_remove_repeated_chunks_all_boilerplate_doc_null_fingerprint(spark):
    boiler = "alpha beta gamma delta epsilon zeta eta theta"
    d = spark.createDataFrame(
        [(i, boiler) for i in range(1, 5)], "doc_id LONG, text STRING"
    )
    out = textstats.remove_repeated_chunks(d, chunk_words=8, max_doc_freq=2).collect()
    assert all(r["n_kept"] == 0 and r["fingerprint"] is None for r in out)


# ---------------------------------------------------------------------------
# sorted neighborhood
# ---------------------------------------------------------------------------

def test_sorted_neighborhood_finds_adjacent_near_dups(spark):
    d = spark.createDataFrame(
        [
            (1, "apple banana cherry date fig grape"),
            (2, "apple banana cherry date fig plum"),      # 5/7 with doc 1
            (3, "zebra yak xylophone wombat vulture tiger"),
        ],
        "doc_id LONG, text STRING",
    )
    out = dedup.sorted_neighborhood_pairs(d, w=2, min_jaccard=0.5).collect()
    assert {(r["doc_a"], r["doc_b"]) for r in out} == {(1, 2)}
    assert abs(out[0]["jaccard"] - 5 / 7) < 1e-6


def test_sorted_neighborhood_window_limits_candidates(spark):
    # identical docs sorted >w apart are missed — SNM's documented tradeoff
    rows = [(i, f"{chr(97 + i)} filler words here") for i in range(6)]
    rows.append((100, "a filler words here"))  # sorts adjacent to doc 0
    d = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    out = dedup.sorted_neighborhood_pairs(d, w=1, min_jaccard=0.9).collect()
    assert {(r["doc_a"], r["doc_b"]) for r in out} == {(0, 100)}


# ---------------------------------------------------------------------------
# seasonal profile / cusum
# ---------------------------------------------------------------------------

def test_seasonal_profile_cells(spark):
    # 2024-06-01 is a Saturday → Spark dow 7
    df = _ev(spark, [(0, 1, 0, 1.0), (1, 1, 30, 3.0), (2, 1, 90, 10.0)])
    out = {(r["dow"], r["hour"]): r for r in windows.seasonal_profile(df).collect()}
    assert out[(7, 0)]["n_events"] == 2
    assert abs(out[(7, 0)]["sum_value"] - 4.0) < 1e-9
    assert out[(7, 1)]["n_events"] == 1


def test_cusum_flags_level_shift(spark):
    # 10 events at 0, then 10 at 10 → cusum peaks at the shift point
    vals = [0.0] * 10 + [10.0] * 10
    df = _ev(spark, [(i, 1, i, v) for i, v in enumerate(vals)])
    out = windows.cusum_changepoints(df, z=1.0).collect()
    assert len(out) == 1
    r = out[0]
    assert r["flagged"] == 1
    # peak |cusum| = 10·|0−5| = 50 at the 10th event (minute 9)
    assert abs(r["max_abs_cusum"] - 50.0) < 1e-6
    assert r["peak_ts"].endswith("00:09:00")


def test_cusum_requires_two_events(spark):
    df = _ev(spark, [(0, 1, 0, 1.0), (1, 2, 0, 1.0), (2, 2, 5, 2.0)])
    out = windows.cusum_changepoints(df).collect()
    assert {r["user_id"] for r in out} == {2}


# ---------------------------------------------------------------------------
# skew report / equi-depth histogram
# ---------------------------------------------------------------------------

def test_skew_report_identifies_heavy_key(spark):
    rows = [(1,)] * 50 + [(2,)] * 5 + [(3,)] * 5
    df = spark.createDataFrame(rows, "l_partkey LONG")
    r = relational.skew_report(df, "l_partkey").collect()[0]
    assert r["n_keys"] == 3
    assert r["max_cnt"] == 50
    assert r["top_key"] == 1
    assert abs(r["skew_ratio"] - 50 / 20.0) < 1e-6


def test_equidepth_histogram_balanced_buckets(spark):
    df = spark.createDataFrame(
        [(float(i),) for i in range(1, 101)], "l_extendedprice DOUBLE"
    )
    out = sorted(relational.equidepth_histogram(df, n_buckets=10).collect(),
                 key=lambda r: r["bucket"])
    assert [r["bucket"] for r in out] == list(range(10))
    assert sum(r["n_rows"] for r in out) == 100
    # equi-depth: every bucket within ±1 of 10 rows
    assert all(9 <= r["n_rows"] <= 11 for r in out)
    assert out[0]["lo"] == 1.0 and out[-1]["hi"] == 100.0


# ---------------------------------------------------------------------------
# linreg / t-test / label centroids / SQL API
# ---------------------------------------------------------------------------

def test_linreg_recovers_exact_linear_relation(spark):
    # y tokens = exactly x/5 words of 4 chars + spaces ⇒ near-perfect fit
    rows = [(i, "en", "word " * (10 * (i + 1)), 50 * (i + 1)) for i in range(5)]
    d = spark.createDataFrame(
        [(i, t.strip(), lang, n) for i, (i2, lang, t, n) in enumerate(rows)],
        "doc_id LONG, text STRING, lang STRING, n_chars INT",
    )
    r = textstats.linreg_by_lang(d).collect()[0]
    assert r["n_docs"] == 5
    assert abs(r["slope"] - 0.2) < 1e-6  # 10 tokens per 50 chars
    assert abs(r["r2"] - 1.0) < 1e-6


def test_ab_ttest_detects_mean_shift(spark):
    rows = [(i, 1, i, 10.0 + (i % 3) * 0.1) for i in range(20)]
    df_a = _ev(spark, rows)  # all "view"
    clicks = _ev(spark, [(100 + i, 2, i, 20.0 + (i % 3) * 0.1) for i in range(20)])
    clicks = clicks.withColumn("event_type", F.lit("click"))
    r = relational.ab_ttest(df_a.unionByName(clicks)).collect()[0]
    assert r["n_a"] == 20 and r["n_b"] == 20
    assert abs(r["mean_a"] - r["mean_b"] - 10.0) < 1e-6
    assert r["t_stat"] > 50  # tiny variance, huge shift
    assert 30 <= r["welch_df"] <= 38


def test_label_centroids_cosine_separates_orthogonal_classes(spark):
    rows = []
    for i in range(10):
        rows.append((i, [1.0, 0.0, 0.0, 0.0], "a"))
        rows.append((100 + i, [0.0, 1.0, 0.0, 0.0], "b"))
        rows.append((200 + i, [1.0, 1.0, 0.0, 0.0], "c"))
    df = spark.createDataFrame(rows, "vec_id LONG, embedding ARRAY<FLOAT>, label STRING")
    out = {(r["label_a"], r["label_b"]): r["centroid_cosine"]
           for r in similarity.label_centroids_cosine(df, dim=4).collect()}
    assert abs(out[("a", "b")]) < 1e-6            # orthogonal
    assert abs(out[("a", "c")] - 2 ** -0.5) < 1e-5  # 45°
    assert abs(out[("b", "c")] - 2 ** -0.5) < 1e-5


def test_sql_report_matches_dsl_star_join(spark):
    import __spark_entry__ as m

    sf = "/root/testdata/sf0.001"
    out = m.queries()["q_sql_report"](spark, sf)
    rows = out.collect()
    assert rows
    # shares within each region sum to ~1, ranks start at 1
    by_region = {}
    for r in rows:
        by_region.setdefault(r["region"], []).append(r)
    for region, rs in by_region.items():
        assert min(x["rnk"] for x in rs) == 1
        assert abs(sum(x["region_share"] for x in rs) - 1.0) < 1e-3


# ---------------------------------------------------------------------------
# incremental MV maintenance / data quality
# ---------------------------------------------------------------------------

def test_incremental_agg_matches_recompute_with_group_moves(spark):
    old = spark.createDataFrame(
        [(1, "en", 100), (2, "en", 200), (3, "de", 300), (4, "fr", 400)],
        "doc_id LONG, lang STRING, n_chars INT",
    )
    # delete 4 (fr group vanishes), update 3 MOVES de→en, insert 5 (es)
    new = spark.createDataFrame(
        [(1, "en", 100), (2, "en", 250), (3, "en", 300), (5, "es", 50)],
        "doc_id LONG, lang STRING, n_chars INT",
    )
    feed = pipeline.snapshot_diff(old, new, "doc_id")
    got = {
        r["lang"]: (r["n_rows"], r["total"])
        for r in pipeline.incremental_agg_maintain(
            old, feed, "doc_id", "lang", "n_chars"
        ).collect()
    }
    want = {
        r["lang"]: (r["n"], r["s"])
        for r in new.groupBy("lang")
        .agg(F.count("*").alias("n"), F.sum("n_chars").alias("s"))
        .collect()
    }
    assert got == want          # incremental == full recompute
    assert "fr" not in got      # zero-count group dropped
    assert got["en"] == (3, 650)  # absorbed the group-moving update


def test_incremental_agg_empty_feed_is_identity(spark):
    old = spark.createDataFrame(
        [(1, "en", 100), (2, "de", 200)], "doc_id LONG, lang STRING, n_chars INT"
    )
    feed = pipeline.snapshot_diff(old, old, "doc_id")
    got = pipeline.incremental_agg_maintain(old, feed, "doc_id", "lang", "n_chars")
    assert {tuple(r) for r in got.collect()} == {("en", 1, 100), ("de", 1, 200)}


def test_data_quality_checks_report(spark):
    li = spark.createDataFrame(
        [
            (1, 1, 10.0, 0.05, dt.datetime(2024, 1, 1)),
            (1, 1, 48.0, 0.05, dt.datetime(2024, 1, 1)),  # dup PK + qty>45
            (2, 1, 20.0, 0.09, dt.datetime(2024, 1, 1)),  # discount > 0.08
            (9, 1, 20.0, 0.05, None),                     # orphan FK + null date
        ],
        "l_orderkey LONG, l_linenumber INT, l_quantity DOUBLE, l_discount DOUBLE, l_shipdate TIMESTAMP",
    )
    orders = spark.createDataFrame([(1,), (2,)], "o_orderkey LONG")
    got = {r["check_name"]: (r["n_violations"], r["passed"])
           for r in relational.data_quality_checks(li, orders).collect()}
    assert got["l_quantity_in_1_45"] == (1, 0)
    assert got["l_discount_le_0.08"] == (1, 0)
    assert got["l_shipdate_not_null"] == (1, 0)
    assert got["l_orderkey_fk_orders"] == (1, 0)
    assert got["pk_orderkey_linenumber_unique"] == (1, 0)


def test_data_quality_all_pass_on_clean_data(spark):
    li = spark.createDataFrame(
        [(1, 1, 10.0, 0.05, dt.datetime(2024, 1, 1))],
        "l_orderkey LONG, l_linenumber INT, l_quantity DOUBLE, l_discount DOUBLE, l_shipdate TIMESTAMP",
    )
    orders = spark.createDataFrame([(1,)], "o_orderkey LONG")
    out = relational.data_quality_checks(li, orders).collect()
    assert all(r["passed"] == 1 and r["n_violations"] == 0 for r in out)
    assert len(out) == 5


# ---------------------------------------------------------------------------
# path mining / cohort LTV / Benford
# ---------------------------------------------------------------------------

def test_path_mining_orders_within_session(spark):
    rows = [
        (0, dt.datetime(2024, 6, 1, 10, 0), 1, "view", 0.0),
        (1, dt.datetime(2024, 6, 1, 10, 5), 1, "click", 0.0),
        (2, dt.datetime(2024, 6, 1, 10, 9), 1, "purchase", 0.0),
        # > 30 min gap → new session with a single view
        (3, dt.datetime(2024, 6, 1, 12, 0), 1, "view", 0.0),
        (4, dt.datetime(2024, 6, 1, 10, 0), 2, "view", 0.0),
        (5, dt.datetime(2024, 6, 1, 10, 1), 2, "click", 0.0),
        (6, dt.datetime(2024, 6, 1, 10, 2), 2, "purchase", 0.0),
    ]
    ev = spark.createDataFrame(
        rows, "event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING, value DOUBLE"
    )
    out = {r["path"]: r["n_sessions"] for r in windows.session_path_mining(ev).collect()}
    assert out["view>click>purchase"] == 2
    assert out["view"] == 1


def test_path_mining_truncates_long_sessions(spark):
    rows = [
        (i, dt.datetime(2024, 6, 1, 10, i), 1, "view", 0.0) for i in range(12)
    ]
    ev = spark.createDataFrame(
        rows, "event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING, value DOUBLE"
    )
    out = windows.session_path_mining(ev, max_len=8).collect()
    assert len(out) == 1
    assert out[0]["path"].count("view") == 8  # truncated, not 12


def test_cohort_ltv_offsets_and_revenue(spark):
    rows = [
        (1, 1, "O", 100.0, dt.datetime(2024, 1, 10)),
        (2, 1, "O", 50.0, dt.datetime(2024, 2, 20)),   # offset 1
        (3, 2, "O", 70.0, dt.datetime(2024, 2, 5)),    # cohort 2024-02
    ]
    orders = spark.createDataFrame(
        rows,
        "o_orderkey LONG, o_custkey LONG, o_orderstatus STRING, "
        "o_totalprice DOUBLE, o_orderdate TIMESTAMP",
    )
    out = {(r["cohort_month"], r["month_offset"]): r for r in
           relational.cohort_ltv(orders).collect()}
    assert out[("2024-01", 0)]["revenue"] == 100.0
    assert out[("2024-01", 1)]["revenue"] == 50.0
    assert out[("2024-02", 0)]["n_customers"] == 1


def test_benford_shares_sum_to_one(spark):
    import random

    rng = random.Random(7)
    rows = [(i, 1, "O", float(rng.randint(1, 99999)) + 0.5, dt.datetime(2024, 1, 1))
            for i in range(500)]
    orders = spark.createDataFrame(
        rows,
        "o_orderkey LONG, o_custkey LONG, o_orderstatus STRING, "
        "o_totalprice DOUBLE, o_orderdate TIMESTAMP",
    )
    out = relational.benford_screen(orders).collect()
    assert abs(sum(r["observed"] for r in out) - 1.0) < 1e-4
    assert sum(r["n"] for r in out) == 500
    for r in out:
        assert 0 < r["expected"] < 0.31


def test_benford_first_significant_digit_below_one(spark):
    orders = spark.createDataFrame(
        [(1, 1, "O", 0.057, dt.datetime(2024, 1, 1))],
        "o_orderkey LONG, o_custkey LONG, o_orderstatus STRING, "
        "o_totalprice DOUBLE, o_orderdate TIMESTAMP",
    )
    out = relational.benford_screen(orders).collect()
    assert len(out) == 1 and out[0]["digit"] == 5


# ---------------------------------------------------------------------------
# privacy / governance
# ---------------------------------------------------------------------------

def test_k_anonymity_flags_small_classes(spark):
    rows = [(i, "t", "en", "web", 100) for i in range(10)]
    rows += [(100, "t", "de", "web", 100)]  # singleton class → at risk
    d = spark.createDataFrame(
        rows, "doc_id LONG, text STRING, lang STRING, source STRING, n_chars INT"
    )
    out = {(r["lang"], r["source"]): r for r in
           pipeline.k_anonymity_report(d, k=5).collect()}
    assert out[("en", "web")]["at_risk"] == 0
    assert out[("de", "web")]["at_risk"] == 1
    assert out[("de", "web")]["class_size"] == 1


def test_pseudonymize_stable_and_linkage_preserving(spark):
    ev = _ev(spark, [(0, 1, 0, 1.0), (1, 1, 5, 2.0), (2, 2, 0, 3.0)])
    out = pipeline.pseudonymize(ev).collect()
    tokens = {}
    for r in out:
        tokens.setdefault(r["pseudo_id"], set()).add(r["event_id"])
    # two distinct users → two distinct tokens; same user → same token
    assert len(tokens) == 2
    assert {0, 1} in tokens.values()
    # deterministic across invocations
    again = {r["event_id"]: r["pseudo_id"] for r in pipeline.pseudonymize(ev).collect()}
    first = {r["event_id"]: r["pseudo_id"] for r in out}
    assert first == again
    # salt changes every token
    other = {r["event_id"]: r["pseudo_id"]
             for r in pipeline.pseudonymize(ev, salt="other").collect()}
    assert all(other[k] != first[k] for k in first)


def test_forget_keys_audit_counts(spark):
    ev = _ev(spark, [(i, uid, i, 1.0) for i, uid in enumerate([37, 74, 5, 6])])
    rep = {r["table_name"]: r for r in
           pipeline.forget_keys([("events", ev, "user_id")]).collect()}
    r = rep["events"]
    assert (r["rows_before"], r["rows_deleted"], r["rows_after"]) == (4, 2, 2)


# ---------------------------------------------------------------------------
# embedding quantization / conversion latency
# ---------------------------------------------------------------------------

def test_quantize_error_bounded_by_half_step(spark):
    rows = [(i, [float(i), float(i) * 2, 5.0, -1.0 + i * 0.1]) for i in range(10)]
    df = spark.createDataFrame(rows, "vec_id LONG, embedding ARRAY<FLOAT>")
    out = {r["dim"]: r for r in
           similarity.quantize_embeddings_report(df, dim=4).collect()}
    # constant dim 2 is excluded (mx == mn)
    assert 2 not in out
    for d, r in out.items():
        step = (r["mx"] - r["mn"]) / 255.0
        assert r["max_abs_err"] <= step / 2 + 1e-9, (d, r)


def test_time_to_convert_exact_latency(spark):
    rows = [
        (0, dt.datetime(2024, 6, 1, 10, 0), 1, "view", 0.0),
        (1, dt.datetime(2024, 6, 1, 10, 2), 1, "purchase", 0.0),  # 120s
        (2, dt.datetime(2024, 6, 1, 10, 0), 2, "purchase", 0.0),  # no prior view
        (3, dt.datetime(2024, 6, 1, 10, 1), 2, "view", 0.0),
    ]
    ev = spark.createDataFrame(
        rows, "event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING, value DOUBLE"
    )
    r = windows.time_to_convert(ev).collect()[0]
    assert r["n_conversions"] == 1
    assert r["p50_s"] == 120.0 and r["mean_s"] == 120.0


# ---------------------------------------------------------------------------
# modularity
# ---------------------------------------------------------------------------

def test_modularity_two_clean_communities(spark):
    # two triangles joined by one bridge edge: strong structure, Q ≈ 0.357
    e = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (4, 5), (5, 6), (4, 6), (3, 4)],
        "src LONG, dst LONG",
    )
    labels = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (4, 4), (5, 4), (6, 4)], "id LONG, label LONG"
    )
    out = {r["label"]: r for r in
           graph.modularity_by_community(e, labels).collect()}
    total = sum(r["q_contrib"] for r in out.values())
    # Q = 2*(3/7 - (7/14)^2) for the symmetric split
    assert abs(total - 2 * (3 / 7 - 0.25)) < 1e-6
    assert out[1]["e_in"] == 3 and out[1]["n_nodes"] == 3


def test_modularity_random_partition_near_zero(spark):
    # everything in ONE community: Q = m/m - (2m/2m)^2 = 0 exactly
    e = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 1)], "src LONG, dst LONG"
    )
    labels = spark.createDataFrame([(i, 9) for i in range(1, 5)], "id LONG, label LONG")
    out = graph.modularity_by_community(e, labels).collect()
    assert len(out) == 1
    assert abs(out[0]["q_contrib"]) < 1e-9


def test_monthly_churn_rates(spark):
    rows = [
        # Jan: custs 1,2 — cust 1 returns in Feb, cust 2 does not
        (1, 1, "O", 10.0, dt.datetime(2024, 1, 5)),
        (2, 2, "O", 10.0, dt.datetime(2024, 1, 9)),
        (3, 1, "O", 10.0, dt.datetime(2024, 2, 2)),
        # Feb extra: cust 3; Mar (last month) is lookahead only
        (4, 3, "O", 10.0, dt.datetime(2024, 2, 20)),
        (5, 3, "O", 10.0, dt.datetime(2024, 3, 1)),
    ]
    orders = spark.createDataFrame(
        rows,
        "o_orderkey LONG, o_custkey LONG, o_orderstatus STRING, "
        "o_totalprice DOUBLE, o_orderdate TIMESTAMP",
    )
    out = {r["month"]: r for r in relational.monthly_churn(orders).collect()}
    assert set(out) == {"2024-01", "2024-02"}  # last month excluded
    jan = out["2024-01"]
    assert (jan["n_active"], jan["n_retained"]) == (2, 1)
    assert abs(jan["churn_rate"] - 0.5) < 1e-9
    feb = out["2024-02"]
    assert (feb["n_active"], feb["n_retained"]) == (2, 1)  # cust 3 retained


def test_sorted_neighborhood_empty_and_single_doc(spark):
    """Degenerate inputs through the distributed-rank path: an empty
    corpus produces an empty offsets frame (createDataFrame([], schema))
    and no pairs; a single doc has no forward neighbors."""
    empty = spark.createDataFrame([], "doc_id long, text string")
    assert dedup.sorted_neighborhood_pairs(empty, w=2).count() == 0
    one = spark.createDataFrame([(1, "hello world")], ["doc_id", "text"])
    assert dedup.sorted_neighborhood_pairs(one, w=2).count() == 0
