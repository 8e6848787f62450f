"""Round-3b operators: time-series gap fill, MAD outliers, market
basket, link prediction, training shards, vocab coverage, Gram matrix,
RFM segmentation."""

import datetime as dt
import math

from pyspark.sql import functions as F

from page_rank_hadoop_spark.operators import graph, pipeline, relational, similarity
from page_rank_hadoop_spark.operators import textstats, windows


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
