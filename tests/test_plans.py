"""Physical-plan regression gate: the structural properties we rely on at
scale (pushdown, pruning, broadcast, top-k, no cartesian/Python eval)
must survive refactors. Thin wrapper over tools/plan_audit.py."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))


def test_plan_expectations(spark):
    import plan_audit

    assert plan_audit.main() == 0


def test_no_unbounded_global_windows_anywhere(spark):
    """Repo-wide guard over ALL declared queries (sf0.001 — plans are
    SF-independent): the only unbounded global window in the surface is
    the whitelisted q_pack_sequences gate form, whose sharded production
    twin is declared and gated; and NO query plans a CartesianProduct or
    row-at-a-time BatchEvalPython. Any regression anywhere in the
    declared surface fails here instead of warning into the bench log."""
    import plan_audit

    assert plan_audit.audit_global_windows(spark, "/root/testdata/sf0.001") == 0


def test_global_window_detector_distinguishes_partitioned(spark):
    """The globality detector reads the windowspecdefinition: a
    partitioned window (first spec argument not ordered) never flags; a
    global window over a raw scan does; a global window over an
    aggregate is bounded and passes."""
    from pyspark.sql import Window, functions as F

    import plan_audit

    df = spark.range(100).select(F.col("id"), (F.col("id") % 7).alias("k"))

    def fmt(d):
        return spark._jvm.PythonSQLUtils.explainString(
            d._jdf.queryExecution(), "formatted"
        )

    part = df.select(F.row_number().over(Window.partitionBy("k").orderBy("id")).alias("rn"))
    assert plan_audit.unbounded_global_windows(fmt(part)) == []

    glob = df.select(F.row_number().over(Window.orderBy("id")).alias("rn"))
    assert plan_audit.unbounded_global_windows(fmt(glob)) != []

    agg = df.groupBy("k").agg(F.count("*").alias("c"))
    bounded = agg.select(F.rank().over(Window.orderBy(F.desc("c"))).alias("r"))
    assert plan_audit.unbounded_global_windows(fmt(bounded)) == []


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


def test_global_window_detector_not_fooled_by_aggregated_join_side(spark):
    """Round-4 advisor nit: an aggregate on only the SMALL side of a join
    must NOT launder a global window over the joined (corpus-scale)
    stream — the aggregate has to sit on the window's direct input path,
    above the nearest join."""
    from pyspark.sql import Window, functions as F

    import plan_audit

    def fmt(d):
        return spark._jvm.PythonSQLUtils.explainString(
            d._jdf.queryExecution(), "formatted"
        )

    fact = spark.range(1000).select(F.col("id"), (F.col("id") % 7).alias("k"))
    dim = (
        spark.range(100)
        .select((F.col("id") % 7).alias("k"))
        .groupBy("k")
        .agg(F.count("*").alias("c"))
    )
    # global window over raw-fact ⋈ aggregated-dim: corpus-scale, must flag
    bad = fact.join(dim, "k").select(
        "id", F.row_number().over(Window.orderBy("id")).alias("rn")
    )
    assert plan_audit.unbounded_global_windows(fmt(bad)) != []
    # aggregate ABOVE the join (direct input path): bounded, must pass
    good = (
        fact.join(dim, "k")
        .groupBy("k")
        .agg(F.sum("c").alias("s"))
        .select("k", F.rank().over(Window.orderBy(F.desc("s"))).alias("r"))
    )
    assert plan_audit.unbounded_global_windows(fmt(good)) == []
