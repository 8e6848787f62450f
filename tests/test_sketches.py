"""Deterministic-HLL sketch: accuracy, both estimator branches, and the
O(m) state contract (operators/sketches.py)."""

import pytest
from pyspark.sql import functions as F

from page_rank_hadoop_spark.operators.sketches import hll_distinct


def _keyed_range(spark, n, group="g"):
    return spark.range(n).select(
        F.lit(group).alias("event_type"), F.col("id").alias("user_id")
    )


def test_hll_raw_branch_accuracy(spark):
    """50k distinct keys: every register is occupied, so the RAW
    estimator serves, and must land within the 3σ bound (19.5% at
    m=256) of the truth."""
    row = hll_distinct(_keyed_range(spark, 50_000)).first()
    assert row["n_exact"] == 50_000
    assert row["v_zero"] == 0
    assert row["within_3sigma"] is True
    assert row["hll_est"] == row["hll_raw"]  # correction gated off


def test_hll_linear_counting_branch(spark):
    """60 distinct keys: most registers empty → the linear-counting
    branch serves a DIFFERENT (and much better) estimate than raw."""
    row = hll_distinct(_keyed_range(spark, 60)).first()
    assert row["n_exact"] == 60
    assert row["v_zero"] > 0
    assert row["hll_est"] != row["hll_raw"]
    assert abs(row["hll_est"] - 60) / 60 < 0.15


def test_hll_insensitive_to_duplication(spark):
    """The sketch sees values, not rows: duplicating every row 5×
    changes nothing — the property that makes the estimator a DISTINCT
    counter."""
    base = _keyed_range(spark, 1000)
    dup = base.crossJoin(F.broadcast(
        base.sparkSession.range(5).select(F.lit(1).alias("_j"))
    )).drop("_j")
    a = hll_distinct(base).first()
    b = hll_distinct(dup).first()
    assert (a["hll_est"], a["v_zero"]) == (b["hll_est"], b["v_zero"])


def test_hll_p_validation(spark):
    df = _keyed_range(spark, 10)
    with pytest.raises(ValueError):
        hll_distinct(df, p=3)
    with pytest.raises(ValueError):
        hll_distinct(df, p=10)  # not a multiple of 4 → hex slice invalid


def test_hll_merge_equals_direct(spark):
    """Register-wise max over independently-sketched slices equals the
    direct sketch of the union — the mergeability property, on an
    adversarial split (each slice sees a different key range)."""
    from pyspark.sql import functions as F

    from page_rank_hadoop_spark.operators import sketches

    base = _keyed_range(spark, 5000)
    slices = [base.filter(F.col("user_id") % 4 == i) for i in range(4)]
    merged = sketches.hll_merge(*[sketches.hll_registers(s) for s in slices])
    direct = sketches.hll_registers(base)
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, direct.collect()))


class TestCMS:
    def test_never_undercounts_all_keys(self, spark):
        """The CMS hard guarantee holds for EVERY key, not just the
        probed top-k: each of a key's d cells contains its full count
        plus non-negative collision mass."""
        from page_rank_hadoop_spark.operators import sketches
        from page_rank_hadoop_spark.sources.catalog import load_table

        ev = load_table(spark, "/root/testdata/sf0.001", "events")
        rep = sketches.cms_topk_report(ev, key="user_id", k=10**9)
        bad = rep.filter(~F.col("never_undercounts")).count()
        assert bad == 0

    def test_estimate_exact_when_no_collision(self, spark):
        """A single-key input has nothing to collide with: est == exact."""
        from page_rank_hadoop_spark.operators import sketches

        df = spark.range(25).select(F.lit(7).alias("user_id"))
        rep = sketches.cms_topk_report(df, key="user_id", k=5).collect()
        assert len(rep) == 1
        assert rep[0]["cms_est"] == rep[0]["n_exact"] == 25

    def test_merge_equals_direct(self, spark):
        """Cell-wise-summed slice sketches == the one-pass sketch —
        CMS linearity, the property q_cms_merge gates cross-engine."""
        from page_rank_hadoop_spark.operators import sketches
        from page_rank_hadoop_spark.sources.catalog import load_table

        ev = load_table(spark, "/root/testdata/sf0.001", "events")
        direct = sketches.cms_cells(ev, key="user_id")
        merged = sketches.cms_merge(
            *[
                sketches.cms_cells(
                    ev.filter(F.col("event_id") % 3 == i), key="user_id"
                )
                for i in range(3)
            ]
        )
        d = {(r["r"], r["b"]): r["c"] for r in direct.collect()}
        m = {(r["r"], r["b"]): r["c"] for r in merged.collect()}
        assert d == m

    def test_collisions_overcount_but_stay_bounded(self, spark):
        """Force collisions: 300 distinct keys into w=16 cells — many
        keys must overcount (pigeonhole), none may undercount, and the
        report's bound flag replays deterministically."""
        from page_rank_hadoop_spark.operators import sketches

        df = spark.range(300).select((F.col("id") % 300).alias("user_id"))
        rep = sketches.cms_topk_report(df, key="user_id", k=300, w=16).collect()
        assert all(r["never_undercounts"] for r in rep)
        assert any(r["cms_est"] > r["n_exact"] for r in rep)
