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


def test_merge_upsert_duplicate_update_keys(spark):
    """Delta MERGE multiple-match semantics: duplicate keys in updates
    raise by default; keep_min resolves deterministically."""
    import pytest

    base = spark.createDataFrame([(1, "a", 10)], ["doc_id", "lang", "n_chars"])
    dup_updates = spark.createDataFrame(
        [(1, "a", 99), (1, "a", 42)], ["doc_id", "lang", "n_chars"]
    )
    with pytest.raises(ValueError, match="duplicate"):
        pipeline.merge_upsert(base, dup_updates, "doc_id")
    out = pipeline.merge_upsert(base, dup_updates, "doc_id", on_duplicates="keep_min").collect()
    assert len(out) == 1 and out[0]["n_chars"] == 42  # lexicographically least row wins


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


def test_ivf_partitioned_layout_prunes(spark, tmp_path):
    """The IVF scale path: assignment written partitionBy(centroid) lets a
    probe query prune to its bucket's files — PartitionFilters in the
    scan, not a post-read filter (the 1/C scan-cost claim in SCALING.md)."""
    from page_rank_hadoop_spark.operators import similarity

    emb = spark.createDataFrame(
        [(i, [float(i % 4 == b) for b in range(4)]) for i in range(40)],
        "vec_id INT, embedding ARRAY<DOUBLE>",
    )
    path = str(tmp_path / "ivf")
    similarity.ivf_assign(emb, n_centroids=4, dim=4).write.partitionBy(
        "centroid"
    ).parquet(path)
    full = spark.read.parquet(path)
    target, n_target = (
        full.groupBy("centroid").count().orderBy(F.desc("count"), "centroid").first()
    )
    scan = full.filter(F.col("centroid") == int(target))
    plan = scan._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "centroid" in plan.split("PartitionFilters")[1][:120]
    # the filter is partition-level: pruned files only, counts intact
    assert scan.count() == n_target and n_target < 40


def test_merge_upsert_bucketed_no_shuffle(spark, docs):
    """With base and updates saved as bucketed tables on the merge key,
    the anti-join runs shuffle-free (SCALING.md's MERGE claim)."""
    import shutil

    from page_rank_hadoop_spark.sources.serving import write_bucketed

    for t in ("t_merge_base", "t_merge_upd"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"spark-warehouse/{t}", ignore_errors=True)
    base = docs.select("doc_id", "lang", "n_chars")
    upd = base.filter(F.col("doc_id") % 7 == 0).withColumn("n_chars", F.col("n_chars") + 1)
    write_bucketed(base, "t_merge_base", "doc_id", n_buckets=4)
    write_bucketed(upd, "t_merge_upd", "doc_id", n_buckets=4)
    b, u = spark.table("t_merge_base"), spark.table("t_merge_upd")
    merged = pipeline.merge_upsert(b, u, "doc_id")
    merged.count()
    plan = merged._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" not in plan, plan
    assert merged.count() == base.count()


def test_merge_scd2_history_chain(spark):
    """Two sequential SCD2 merges build a 3-row timeline for the changed
    key: closed -> closed -> open, with contiguous validity bounds."""
    import datetime as dt

    t0, t1, t2 = (dt.datetime(2024, m, 1) for m in (1, 3, 6))
    base = spark.createDataFrame(
        [(1, 10, t0, None), (2, 20, t0, None)],
        "doc_id LONG, n_chars LONG, valid_from TIMESTAMP, valid_to TIMESTAMP",
    )
    u1 = spark.createDataFrame([(1, 11, t1)], "doc_id LONG, n_chars LONG, effective_ts TIMESTAMP")
    u2 = spark.createDataFrame([(1, 12, t2)], "doc_id LONG, n_chars LONG, effective_ts TIMESTAMP")
    v1 = pipeline.merge_scd2(base, u1, "doc_id")
    v2 = pipeline.merge_scd2(v1, u2, "doc_id")
    rows = sorted(
        ((r["doc_id"], r["n_chars"], r["valid_from"], r["valid_to"]) for r in v2.collect()),
        key=lambda x: (x[0], x[2]),
    )
    assert rows == [
        (1, 10, t0, t1),
        (1, 11, t1, t2),
        (1, 12, t2, None),
        (2, 20, t0, None),  # untouched key keeps its open row
    ]
    # as-of query: key 1's value on 2024-04-15 is the middle generation
    asof = v2.filter(
        (F.col("doc_id") == 1)
        & (F.col("valid_from") <= dt.datetime(2024, 4, 15))
        & (F.col("valid_to").isNull() | (F.col("valid_to") > dt.datetime(2024, 4, 15)))
    ).collect()
    assert len(asof) == 1 and asof[0]["n_chars"] == 11
