"""Round-11 second-wave operators: rank-1 ALS recommender + Kaplan–Meier.

Oracle-gated end-to-end by the driver (q_als_factors, q_als_recommend,
q_kaplan_meier); these tests pin the SEMANTIC invariants a hash
equality can't explain: the ALS normal-equation identity and
recommendation exclusion rules, and the estimator laws of the
product-limit life table (monotone survival, at-risk accounting).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF0001 = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def ratings(spark):
    from page_rank_hadoop_spark.operators.recommend import build_ratings
    from page_rank_hadoop_spark.sources.catalog import load_table

    r = build_ratings(
        load_table(spark, SF0001, "lineitem"), load_table(spark, SF0001, "orders")
    ).persist()
    r.count()
    yield r
    r.unpersist()


class TestALS:
    @pytest.fixture(scope="class")
    def factors(self, ratings):
        from page_rank_hadoop_spark.operators.recommend import als_rank1

        uf, vf = als_rank1(ratings)
        uf = uf.persist()
        vf = vf.persist()
        uf.count(), vf.count()
        yield uf, vf
        uf.unpersist(), vf.unpersist()

    def test_every_rated_entity_gets_a_factor(self, ratings, factors):
        uf, vf = factors
        assert uf.count() == ratings.select("u").distinct().count()
        assert vf.count() == ratings.select("it").distinct().count()

    def test_factors_positive_on_positive_ratings(self, factors):
        # all r_ij > 0 and v0 ≡ 1 > 0: every alternation preserves
        # strict positivity (numerator and denominator are sums of
        # positive terms), so a non-positive factor means the update
        # formula is wrong
        uf, vf = factors
        assert uf.filter(F.col("uf") <= 0).count() == 0
        assert vf.filter(F.col("v") <= 0).count() == 0

    def test_user_update_solves_the_normal_equation(self, ratings, spark):
        # one alternation from v≡1: u_i must equal Σr/(λ+n_i) exactly
        # (integer sums, one division) — the closed form of the rank-1
        # regularized least-squares step
        from page_rank_hadoop_spark.operators.recommend import als_rank1

        uf, _ = als_rank1(ratings, iters=1)
        # v after iters=1 has moved, but u inside iteration 1 used v0
        expected = ratings.groupBy("u").agg(
            (F.sum("r") / (F.lit(0.1) + F.count("*"))).alias("want")
        )
        joined = uf.join(expected, "u")
        bad = joined.filter(F.abs(F.col("uf") - F.col("want")) > 1e-12).count()
        assert bad == 0

    def test_recommendations_exclude_purchased_pairs(self, ratings):
        from page_rank_hadoop_spark.operators.recommend import als_recommend

        recs = als_recommend(ratings)
        seen = ratings.select(
            F.col("u").alias("cust_id"), F.col("it").alias("part_id")
        )
        assert recs.join(seen, ["cust_id", "part_id"], "inner").count() == 0

    def test_recommendations_shape(self, ratings):
        from page_rank_hadoop_spark.operators.recommend import als_recommend

        recs = als_recommend(ratings).collect()
        by_user: dict = {}
        for r in recs:
            by_user.setdefault(r["cust_id"], []).append(r)
        assert len(by_user) == 5
        for rows in by_user.values():
            assert [r["rk"] for r in sorted(rows, key=lambda x: x["rk"])] == [1, 2, 3]
            # scores non-increasing in rank
            ordered = sorted(rows, key=lambda x: x["rk"])
            assert all(
                ordered[i]["score"] >= ordered[i + 1]["score"]
                for i in range(len(ordered) - 1)
            )


class TestLogRank:
    def test_identical_cohorts_give_zero_chi2(self, spark):
        # two cohorts with IDENTICAL event patterns: every day's
        # observed events split exactly as expected under H0
        # (d1 = d·n1/n), so O1 == E1 and χ² must be exactly 0
        import datetime

        from page_rank_hadoop_spark.operators.windows import log_rank_test

        base = datetime.datetime(2024, 1, 1)
        rows = []
        for u in range(20):
            # users 0-9 sign up day 0 (early), 10-19 day 20 (late);
            # conversion delays are STAGGERED (1 + u%5 days) with the
            # identical delay distribution in both cohorts, so every
            # pooled event day splits exactly as H0 expects while the
            # hypergeometric variance stays positive
            t0 = base + datetime.timedelta(days=0 if u < 10 else 20)
            delay = 1 + (u % 5)
            rows.append((u * 2, t0, u, "signup", 0.0, None))
            rows.append(
                (u * 2 + 1, t0 + datetime.timedelta(days=delay), u, "purchase", 1.0, None)
            )
        ev = spark.createDataFrame(
            rows, "event_id long, ts timestamp, user_id long, "
            "event_type string, value double, props string"
        )
        r = log_rank_test(ev).first()
        assert r["n_early"] == 10 and r["n_late"] == 10
        assert r["obs_early"] == 10
        assert r["exp_early"] == 10.0
        assert r["chi2"] == 0.0

    def test_real_cohort_moments_are_sane(self, events):
        from page_rank_hadoop_spark.operators.windows import log_rank_test

        r = log_rank_test(events).first()
        assert r["n_early"] + r["n_late"] > 0
        assert 0 <= r["obs_early"] <= r["n_early"]
        assert r["exp_early"] >= 0.0
        if r["chi2"] is not None:
            assert r["chi2"] >= 0.0


def test_als_gate_idempotent_under_redelivery(spark, tmp_path):
    """foreachBatch gives at-least-once batch delivery; the ratings-MV
    gate must not double-count a replayed batch. Delivering batch 0
    TWICE then batch 1 once must yield a merged matrix cell-for-cell
    equal to the one-shot aggregate over the union (the CMS gate's
    overwrite-at-batch-path contract, applied to ratings)."""
    from page_rank_hadoop_spark.streaming.replay import (
        als_ratings_gate_batch,
        read_ratings_mv,
    )

    rows = [(i % 5, i % 11, float(1 + i % 3)) for i in range(200)]
    df = spark.createDataFrame(rows, "u long, it long, r double")
    b0 = df.filter("it % 2 = 0")
    b1 = df.filter("it % 2 = 1")
    mv_dir = str(tmp_path / "ratings_mv")

    als_ratings_gate_batch(b0, mv_dir, 0)
    als_ratings_gate_batch(b0, mv_dir, 0)  # redelivery
    als_ratings_gate_batch(b1, mv_dir, 1)

    merged = {
        (r["u"], r["it"]): r["r"] for r in read_ratings_mv(spark, mv_dir).collect()
    }
    direct = {
        (r["u"], r["it"]): r["r"]
        for r in df.groupBy("u", "it").agg(F.sum("r").alias("r")).collect()
    }
    assert merged == direct


class TestKaplanMeier:
    @pytest.fixture(scope="class")
    def life(self, events):
        from page_rank_hadoop_spark.operators.windows import kaplan_meier

        rows = kaplan_meier(events).collect()
        assert rows, "life table must be non-empty on sf0.001"
        return rows

    def test_survival_monotone_nonincreasing_from_one(self, life):
        prev = 1.0
        for r in life:
            assert 0.0 <= r["survival"] <= prev + 1e-9
            prev = r["survival"]

    def test_n_risk_strictly_decreasing(self, life):
        # each event day removes at least its own d_events from the
        # at-risk set, so n_risk decreases strictly across event days
        for a, b in zip(life, life[1:]):
            assert b["n_risk"] <= a["n_risk"] - a["d_events"]

    def test_hazard_bounds_and_product_limit(self, life):
        import math

        s = 1.0
        for r in life:
            assert 0.0 < r["hazard"] <= 1.0
            assert r["d_events"] <= r["n_risk"]
            s *= 1.0 - r["hazard"]
            assert math.isclose(r["survival"], s, abs_tol=5e-6)

    def test_censoring_keeps_nonconverters_at_risk(self, events, life):
        # users with a signup but no later purchase must still be
        # counted in the at-risk set (right censoring): day-0 at-risk
        # is the FULL signup cohort, not just the converters
        cohort = (
            events.filter(F.col("event_type") == "signup")
            .select("user_id")
            .distinct()
            .count()
        )
        first = life[0]
        assert first["n_risk"] <= cohort
        if first["t_day"] == 0:
            assert first["n_risk"] == cohort
