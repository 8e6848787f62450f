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
