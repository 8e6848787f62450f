"""Physical-plan regression gate: the structural properties we rely on at
scale (pushdown, pruning, broadcast, top-k, no cartesian/Python eval)
must survive refactors. Thin wrapper over tools/plan_audit.py."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))


def test_plan_expectations(spark):
    import plan_audit

    assert plan_audit.main() == 0


def test_window_over_agg_rejects_corpus_scale_global_window(spark):
    """The whitelist pin must actually discriminate: a Window whose input
    subtree is a raw scan (the round-3 sorted-neighborhood shape) fails,
    a window over an aggregate passes."""
    from pyspark.sql import Window, functions as F

    import plan_audit

    df = spark.range(100).select(F.col("id"), (F.col("id") % 7).alias("k"))

    def fmt(d):
        return spark._jvm.PythonSQLUtils.explainString(
            d._jdf.queryExecution(), "formatted"
        )

    bad = df.select("id", F.row_number().over(Window.orderBy("id")).alias("rn"))
    assert plan_audit.windows_over_aggregates(fmt(bad)) is False

    agg = df.groupBy("k").agg(F.count("*").alias("c"))
    good = agg.select("k", F.rank().over(Window.orderBy(F.desc("c"))).alias("r"))
    assert plan_audit.windows_over_aggregates(fmt(good)) is True
