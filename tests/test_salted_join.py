"""Salted skew-join: result equality with a plain join, and the salt
actually spreads a hot key across sub-keys."""

from pyspark.sql import functions as F

from page_rank_hadoop_spark.operators.relational import salted_join


def _skewed(spark):
    # 90% of fact rows hit key 1 (the hot key)
    facts = spark.range(1000).select(
        F.col("id").alias("row_id"),
        F.when(F.col("id") % 10 < 9, F.lit(1)).otherwise(F.col("id") % 5).alias("k"),
        (F.col("id") * 2).alias("v"),
    )
    dims = spark.createDataFrame(
        [(0, "zero"), (1, "one"), (2, "two"), (3, "three"), (4, "four")], ["k", "name"]
    )
    return facts, dims


def test_salted_join_equals_plain_join(spark):
    facts, dims = _skewed(spark)
    plain = facts.join(dims, "k").select("row_id", "k", "v", "name")
    salted = salted_join(facts, dims, on="k", n_salts=4, salt_cols=["row_id"]).select(
        "row_id", "k", "v", "name"
    )
    assert {tuple(r) for r in salted.collect()} == {tuple(r) for r in plain.collect()}


def test_salt_spreads_hot_key(spark):
    facts, _ = _skewed(spark)
    b = facts.withColumn(
        "__salt", F.pmod(F.xxhash64("row_id"), F.lit(4)).cast("int")
    )
    per_salt = (
        b.filter(F.col("k") == 1).groupBy("__salt").count().collect()
    )
    assert len(per_salt) == 4  # hot key present in every salt bucket
    counts = [r["count"] for r in per_salt]
    assert max(counts) < sum(counts)  # no single bucket holds everything
