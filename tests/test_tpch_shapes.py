"""TPC-H plan-shape operators (Q6/Q7/Q10/Q13/Q15/Q17/Q19/Q21 analogs) and
the round-2 pipeline ops (quality signals, decontamination, k-means step)
on hand-built inputs with hand-checked expected values."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from page_rank_hadoop_spark.operators import pipeline, relational, similarity, textstats

TS = dt.datetime


def test_forecast_revenue_hand_built(spark):
    li = spark.createDataFrame(
        [
            (TS(1996, 2, 1), 0.05, 10.0, 100.0),   # in: 5.0
            (TS(1996, 2, 1), 0.06, 23.0, 200.0),   # in: 12.0
            (TS(1996, 2, 1), 0.08, 10.0, 100.0),   # discount out of band
            (TS(1996, 2, 1), 0.05, 24.0, 100.0),   # quantity not < 24
            (TS(1997, 2, 1), 0.05, 10.0, 100.0),   # date out of range
        ],
        ["l_shipdate", "l_discount", "l_quantity", "l_extendedprice"],
    )
    r = relational.forecast_revenue(li).collect()[0]
    assert (r["revenue"], r["n_items"]) == (17.0, 2)


def test_nation_volume_shipping_directions(spark):
    nation = spark.createDataFrame(
        [(1, "A"), (2, "B"), (3, "C")], ["n_nationkey", "n_name"]
    )
    supplier = spark.createDataFrame([(10, 1), (11, 2), (12, 3)], ["s_suppkey", "s_nationkey"])
    customer = spark.createDataFrame([(20, 2), (21, 1), (22, 3)], ["c_custkey", "c_nationkey"])
    orders = spark.createDataFrame(
        [(30, 20), (31, 21), (32, 22)], ["o_orderkey", "o_custkey"]
    )
    li = spark.createDataFrame(
        [
            (30, 10, TS(1995, 5, 1), 100.0, 0.0),  # supp A → cust B: 100, year 1995
            (31, 11, TS(1996, 5, 1), 50.0, 0.2),   # supp B → cust A: 40, year 1996
            (31, 10, TS(1995, 5, 1), 70.0, 0.0),   # supp A → cust A: same nation, dropped
            (32, 10, TS(1995, 5, 1), 80.0, 0.0),   # cust C not in pair, dropped
            (30, 10, TS(1999, 5, 1), 60.0, 0.0),   # out of date range
        ],
        ["l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount"],
    )
    rows = relational.nation_volume_shipping(
        li, orders, customer, supplier, nation, nation_a="A", nation_b="B"
    ).collect()
    assert [(r["supp_nation"], r["cust_nation"], r["l_year"], r["revenue"]) for r in rows] == [
        ("A", "B", 1995, 100.0),
        ("B", "A", 1996, 40.0),
    ]


def test_customer_distribution_zero_bucket(spark):
    customer = spark.createDataFrame([(i,) for i in range(5)], ["c_custkey"])
    orders = spark.createDataFrame(
        [(100, 0), (101, 0), (102, 1)], ["o_orderkey", "o_custkey"]
    )
    rows = relational.customer_distribution(customer, orders).collect()
    # 3 customers with 0 orders, 1 with 1, 1 with 2
    assert [(r["c_count"], r["custdist"]) for r in rows] == [(0, 3), (2, 1), (1, 1)]


def test_top_supplier_keeps_ties(spark):
    li = spark.createDataFrame(
        [
            (1, TS(1996, 2, 1), 100.0, 0.0),
            (2, TS(1996, 2, 1), 50.0, 0.0),
            (2, TS(1996, 2, 1), 50.0, 0.0),
            (3, TS(1996, 2, 1), 30.0, 0.0),
            (1, TS(1997, 2, 1), 999.0, 0.0),  # outside the quarter
        ],
        ["l_suppkey", "l_shipdate", "l_extendedprice", "l_discount"],
    )
    supplier = spark.createDataFrame(
        [(1, "s1"), (2, "s2"), (3, "s3")], ["s_suppkey", "s_name"]
    )
    rows = relational.top_supplier_revenue(li, supplier).collect()
    assert [(r["s_suppkey"], r["total_revenue"]) for r in rows] == [(1, 100.0), (2, 100.0)]


def test_small_quantity_revenue_hand_math(spark):
    part = spark.createDataFrame(
        [(1, "Brand#1"), (2, "Brand#1"), (3, "Brand#9")], ["p_partkey", "p_brand"]
    )
    li = spark.createDataFrame(
        [
            # part 1: avg qty = 10 → cutoff 5; the qty-2 row qualifies (70.0)
            (1, 2.0, 70.0),
            (1, 18.0, 500.0),
            # part 2: avg qty = 4 → cutoff 2; nothing strictly below 2
            (2, 2.0, 300.0),
            (2, 6.0, 400.0),
            # part 3: wrong brand, excluded from both sides
            (3, 1.0, 900.0),
        ],
        ["l_partkey", "l_quantity", "l_extendedprice"],
    )
    r = relational.small_quantity_revenue(li, part, brand="Brand#1", factor=0.5).collect()[0]
    assert (r["avg_yearly"], r["n_items"]) == (10.0, 1)


def test_disjunctive_brand_revenue_clause_isolation(spark):
    part = spark.createDataFrame(
        [(1, "Brand#1", 3), (2, "Brand#2", 8), (3, "Brand#1", 40)],
        ["p_partkey", "p_brand", "p_size"],
    )
    li = spark.createDataFrame(
        [
            (1, 5.0, 100.0, 0.0),    # clause 1 (size 3, qty 5 in 0..20) → 100
            (1, 25.0, 999.0, 0.0),   # brand1 size ok but qty out of 0..20
            (2, 15.0, 200.0, 0.5),   # clause 2 (qty in 10..30) → 100
            (2, 5.0, 999.0, 0.0),    # brand2 qty below 10
            (3, 5.0, 999.0, 0.0),    # size 40 matches no clause
        ],
        ["l_partkey", "l_quantity", "l_extendedprice", "l_discount"],
    )
    r = relational.disjunctive_brand_revenue(
        li, part,
        cases=(("Brand#1", 1, 5, 0.0, 20.0), ("Brand#2", 1, 10, 10.0, 30.0)),
    ).collect()[0]
    assert (r["revenue"], r["n_items"]) == (200.0, 2)


def test_waiting_suppliers_sole_late_semantics(spark):
    orders = spark.createDataFrame(
        [(1, TS(1995, 1, 1)), (2, TS(1995, 1, 1)), (3, TS(1995, 1, 1))],
        ["o_orderkey", "o_orderdate"],
    )
    late, ontime = TS(1995, 6, 1), TS(1995, 2, 1)
    li = spark.createDataFrame(
        [
            # order 1: supp 10 late, supp 11 on time → 10 is the sole late culprit
            (1, 10, late), (1, 11, ontime),
            # order 2: both late → nobody qualifies
            (2, 10, late), (2, 11, late),
            # order 3: single-supplier order, late → not multi-supplier
            (3, 12, late),
        ],
        ["l_orderkey", "l_suppkey", "l_shipdate"],
    )
    supplier = spark.createDataFrame(
        [(10, "sA"), (11, "sB"), (12, "sC")], ["s_suppkey", "s_name"]
    )
    rows = relational.waiting_suppliers(li, orders, supplier, late_days=90).collect()
    assert [(r["s_name"], r["numwait"]) for r in rows] == [("sA", 1)]


def test_quality_signals_hand_checked(spark):
    df = spark.createDataFrame(
        [
            (1, "spam spam spam spam eggs"),   # 5 tokens, 2 distinct, top 4/5
            (2, "all words are unique here"),  # ttr 1.0, top 1/5
            (3, ""),                            # no tokens → no row
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in textstats.quality_signals(df).collect()}
    assert set(out) == {1, 2}
    r1 = out[1]
    assert (r1["n_tokens"], r1["ttr"], r1["top_share"]) == (5, 0.4, 0.8)
    assert r1["mean_token_len"] == 4.0  # (4*4 + 4)/5
    assert r1["flagged"] is True
    r2 = out[2]
    assert (r2["ttr"], r2["flagged"]) == (1.0, False)
    assert r2["top_share"] == 0.2  # not > 0.2 → unflagged


def test_decontaminate_hand_built(spark):
    bench = "alpha beta gamma delta epsilon zeta"
    df = spark.createDataFrame(
        [
            (0, bench),                                   # holdout (0 % 10 == 0)
            (1, "x alpha beta gamma delta epsilon y"),    # shares 1 distinct 5-gram
            (2, "alpha beta gamma x delta epsilon"),      # no full 5-gram shared
            (3, "completely different words here now"),   # clean
        ],
        ["doc_id", "text"],
    )
    rows = pipeline.decontaminate(df, n=5, holdout_mod=10).collect()
    assert [(r["doc_id"], r["n_shared"]) for r in rows] == [(1, 1)]


def test_kmeans_step_matches_numpy(spark):
    import math

    import numpy as np

    dim, n_c = 4, 3
    vecs = [[math.sin(i * 13 + j) for j in range(dim)] for i in range(30)]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)], ["vec_id", "embedding"]
    )
    rows = similarity.kmeans_step(df, n_centroids=n_c, dim=dim).collect()
    cents = np.array(
        [[math.sin(c * 2971 + j * 7919) for j in range(dim)] for c in range(n_c)]
    )
    V = np.array(vecs)
    sims = (V @ cents.T) / (
        np.linalg.norm(V, axis=1)[:, None] * np.linalg.norm(cents, axis=1)[None, :]
    )
    assign = sims.argmax(axis=1)
    for r in rows:
        members = V[assign == r["centroid"]]
        assert r["n_vectors"] == len(members)
        assert r["mean_val"] == pytest.approx(
            round(float(members[:, r["dim"]].mean()), 6), abs=1e-9
        )


def test_min_cost_supplier_ties_and_region(spark):
    region = spark.createDataFrame([(1, "EUROPE"), (2, "ASIA")], ["r_regionkey", "r_name"])
    nation = spark.createDataFrame(
        [(1, "N_EU", 1), (2, "N_AS", 2)], ["n_nationkey", "n_name", "n_regionkey"]
    )
    supplier = spark.createDataFrame(
        [(10, "sA", 5.0, 1), (11, "sB", 9.0, 1), (12, "sC", 7.0, 2)],
        ["s_suppkey", "s_name", "s_acctbal", "s_nationkey"],
    )
    part = spark.createDataFrame(
        [(1, "PROMO", 3), (2, "PROMO", 4), (3, "LARGE", 3)],
        ["p_partkey", "p_type", "p_size"],
    )
    li = spark.createDataFrame(
        [
            # part 1: sA unit cost 2.0, sB unit cost 2.0 (tie), sC cheaper but ASIA
            (1, 10, 4.0, 8.0), (1, 11, 2.0, 4.0), (1, 12, 1.0, 1.0),
            # part 2: only sB supplies → min trivially
            (2, 11, 5.0, 15.0),
            # part 3: wrong type, excluded
            (3, 10, 1.0, 1.0),
        ],
        ["l_partkey", "l_suppkey", "l_quantity", "l_extendedprice"],
    )
    rows = relational.min_cost_supplier(
        li, part, supplier, nation, region, region_name="EUROPE",
        p_type="PROMO", max_size=5,
    ).collect()
    assert [(r["s_name"], r["p_partkey"], r["unit_cost"]) for r in rows] == [
        ("sB", 1, 2.0), ("sB", 2, 3.0), ("sA", 1, 2.0),
    ]


def test_market_share_conditional_ratio(spark):
    region = spark.createDataFrame([(1, "ASIA")], ["r_regionkey", "r_name"])
    nation = spark.createDataFrame(
        [(1, "N_TARGET", 1), (2, "N_OTHER", 1)], ["n_nationkey", "n_name", "n_regionkey"]
    )
    customer = spark.createDataFrame([(20, 1)], ["c_custkey", "c_nationkey"])
    supplier = spark.createDataFrame(
        [(10, 1), (11, 2)], ["s_suppkey", "s_nationkey"]
    )
    part = spark.createDataFrame([(1, "STANDARD"), (2, "PROMO")], ["p_partkey", "p_type"])
    orders = spark.createDataFrame(
        [(30, 20, TS(1995, 3, 1)), (31, 20, TS(1996, 3, 1))],
        ["o_orderkey", "o_custkey", "o_orderdate"],
    )
    li = spark.createDataFrame(
        [
            (30, 1, 10, 60.0, 0.0),   # 1995 target-nation volume 60
            (30, 1, 11, 40.0, 0.0),   # 1995 other-nation volume 40
            (31, 1, 11, 50.0, 0.0),   # 1996 all other → share 0
            (30, 2, 10, 999.0, 0.0),  # wrong part type
        ],
        ["l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"],
    )
    rows = relational.market_share(
        li, orders, customer, supplier, nation, region, part,
        target_nation="N_TARGET", region_name="ASIA", p_type="STANDARD",
    ).collect()
    assert [(r["o_year"], r["mkt_share"], r["total_volume"]) for r in rows] == [
        (1995, 0.6, 100.0), (1996, 0.0, 50.0),
    ]


def test_product_profit_cost_proxy(spark):
    part = spark.createDataFrame(
        [(1, "red widget", 10.0), (2, "blue bolt", 10.0)],
        ["p_partkey", "p_name", "p_retailprice"],
    )
    nation = spark.createDataFrame([(1, "N1")], ["n_nationkey", "n_name"])
    supplier = spark.createDataFrame([(10, 1)], ["s_suppkey", "s_nationkey"])
    orders = spark.createDataFrame(
        [(30, TS(1995, 3, 1))], ["o_orderkey", "o_orderdate"]
    )
    li = spark.createDataFrame(
        [
            # profit = 100*(1-0.1) - 0.6*10*2 = 90 - 12 = 78
            (30, 1, 10, 2.0, 100.0, 0.1),
            (30, 2, 10, 2.0, 999.0, 0.0),  # name doesn't contain 'widget'
        ],
        ["l_orderkey", "l_partkey", "l_suppkey", "l_quantity", "l_extendedprice", "l_discount"],
    )
    rows = relational.product_profit(li, orders, part, supplier, nation).collect()
    assert [(r["nation"], r["o_year"], r["sum_profit"]) for r in rows] == [("N1", 1995, 78.0)]


def test_important_parts_mean_threshold(spark):
    nation = spark.createDataFrame([(1, "NATION_3"), (2, "OTHER")], ["n_nationkey", "n_name"])
    supplier = spark.createDataFrame([(10, 1), (11, 2)], ["s_suppkey", "s_nationkey"])
    li = spark.createDataFrame(
        [
            (1, 10, 100.0, 0.0),  # part 1 val 100
            (2, 10, 10.0, 0.0),   # part 2 val 10
            (3, 10, 10.0, 0.0),   # part 3 val 10
            (4, 11, 999.0, 0.0),  # other nation, excluded
        ],
        ["l_partkey", "l_suppkey", "l_extendedprice", "l_discount"],
    )
    # mean = 40; only part 1 (100) > 2*40
    rows = relational.important_parts(li, supplier, nation, factor=2.0).collect()
    assert [(r["p_partkey"], r["part_value"]) for r in rows] == [(1, 100.0)]


def test_late_priority_lines_split(spark):
    orders = spark.createDataFrame(
        [(1, TS(1996, 1, 1), "1-URGENT"), (2, TS(1996, 1, 1), "5-LOW")],
        ["o_orderkey", "o_orderdate", "o_orderpriority"],
    )
    li = spark.createDataFrame(
        [
            (1, "A", TS(1996, 6, 1)),   # late, high
            (2, "A", TS(1996, 6, 1)),   # late, low
            (1, "A", TS(1996, 1, 15)),  # on time → excluded
            (2, "R", TS(1999, 6, 1)),   # outside window
        ],
        ["l_orderkey", "l_returnflag", "l_shipdate"],
    )
    rows = relational.late_priority_lines(li, orders, late_days=60).collect()
    assert [(r["l_returnflag"], r["high_line_count"], r["low_line_count"]) for r in rows] == [
        ("A", 1, 1),
    ]


def test_supplier_part_counts_exclusions(spark):
    part = spark.createDataFrame(
        [
            (1, "Brand#2", "LARGE", 5),
            (2, "Brand#1", "LARGE", 5),    # excluded brand
            (3, "Brand#2", "PROMO", 5),    # excluded type
            (4, "Brand#2", "LARGE", 30),   # size > 25
        ],
        ["p_partkey", "p_brand", "p_type", "p_size"],
    )
    supplier = spark.createDataFrame(
        [(10, 5.0), (11, -1.0)], ["s_suppkey", "s_acctbal"]
    )
    li = spark.createDataFrame(
        [
            (1, 10), (1, 10),  # dup pair → one supplier
            (1, 11),           # complaint supplier → excluded
            (2, 10), (3, 10), (4, 10),  # excluded parts
        ],
        ["l_partkey", "l_suppkey"],
    )
    rows = relational.supplier_part_counts(li, part, supplier).collect()
    assert [(r["p_brand"], r["p_type"], r["p_size"], r["supplier_cnt"]) for r in rows] == [
        ("Brand#2", "LARGE", 5, 1),
    ]


def test_promotion_suppliers_domination(spark):
    nation = spark.createDataFrame([(1, "N1")], ["n_nationkey", "n_name"])
    supplier = spark.createDataFrame(
        [(10, "sA", 1), (11, "sB", 1)], ["s_suppkey", "s_name", "s_nationkey"]
    )
    d = TS(1996, 6, 1)
    li = spark.createDataFrame(
        [
            # parts 1-3: sA ships 9 of 10 (dominant, contested)
            (1, 10, 9.0, d), (1, 11, 1.0, d),
            (2, 10, 9.0, d), (2, 11, 1.0, d),
            (3, 10, 9.0, d), (3, 11, 1.0, d),
            # part 4: sB alone → uncontested, ignored
            (4, 11, 99.0, d),
            # part 5: sB dominates but only one dominated part total
            (5, 11, 9.0, d), (5, 10, 1.0, d),
        ],
        ["l_partkey", "l_suppkey", "l_quantity", "l_shipdate"],
    )
    rows = relational.promotion_suppliers(
        li, supplier, nation, share=0.5, min_parts=3
    ).collect()
    assert [(r["s_name"], r["n_name"], r["n_dominated"]) for r in rows] == [("sA", "N1", 3)]
