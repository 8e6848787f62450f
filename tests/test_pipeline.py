"""Dataset-maintenance operator semantics (operators/pipeline.py)."""

from pyspark.sql import functions as F

from page_rank_hadoop_spark.operators import pipeline


def test_merge_upsert_semantics(spark):
    base = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)], ["doc_id", "lang", "n_chars"]
    )
    updates = spark.createDataFrame(
        [(2, "b", 99), (5, "e", 50)], ["doc_id", "lang", "n_chars"]
    )
    out = {r["doc_id"]: r["n_chars"] for r in pipeline.merge_upsert(base, updates, "doc_id").collect()}
    # update wins on collision (2), base kept (1, 3), brand-new key inserted (5)
    assert out == {1: 10, 2: 99, 3: 30, 5: 50}


def test_hash_split_deterministic_and_partitioned(spark, docs):
    a = pipeline.hash_split(docs.select("doc_id"), "doc_id", 80)
    b = pipeline.hash_split(docs.select("doc_id"), "doc_id", 80)
    rows_a = {(r["doc_id"], r["split"]) for r in a.collect()}
    rows_b = {(r["doc_id"], r["split"]) for r in b.collect()}
    assert rows_a == rows_b  # stable across runs
    n = docs.count()
    n_train = sum(1 for _, s in rows_a if s == "train")
    assert 0 < n_train < n  # both splits populated
    assert abs(n_train / n - 0.8) < 0.1  # md5 buckets are roughly uniform


def test_quantile_filter_median(spark):
    d = spark.createDataFrame(
        [(i, "en", v) for i, v in enumerate([10, 20, 30, 40, 50])]
        + [(10, "fr", 5), (11, "fr", 15)],
        ["doc_id", "lang", "n_chars"],
    )
    kept = {r["doc_id"] for r in pipeline.quantile_filter(d, "lang", "n_chars", 0.5).collect()}
    # en median = 30 -> keep 40, 50; fr interpolated median = 10 -> keep 15
    assert kept == {3, 4, 11}


def test_balanced_sample_caps_groups(spark, docs):
    out = pipeline.balanced_sample(docs.select("doc_id", "lang"), "lang", 5)
    counts = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    totals = {r["lang"]: r["n"] for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    for lang, n in counts.items():
        assert n == min(5, totals[lang])
    # deterministic: same selection twice
    a = {r["doc_id"] for r in out.collect()}
    b = {r["doc_id"] for r in pipeline.balanced_sample(docs.select("doc_id", "lang"), "lang", 5).collect()}
    assert a == b


def test_hash_split_no_shuffle(spark, docs):
    plan = pipeline.hash_split(docs.select("doc_id"), "doc_id")._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # pure projection
