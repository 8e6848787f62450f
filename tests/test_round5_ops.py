"""Round-5 operators: trained-centroid wiring for the ANN family
(kmeans_train → centroids_from_kmeans → assign/mine), the enforced
C ∝ n auto-scaling rule, and the end-to-end train→assign→mine pipeline.
"""

import os

import pytest
from pyspark.sql import functions as F

from page_rank_hadoop_spark.operators import similarity
from page_rank_hadoop_spark.sources.catalog import load_table

SF0001 = "/root/testdata/sf0.001"
DIM = 64


@pytest.fixture(scope="module")
def emb(spark):
    return load_table(spark, SF0001, "embeddings")


def test_centroids_from_kmeans_shape(spark, emb):
    km = similarity.kmeans_train(emb, n_iter=2, n_centroids=8, dim=DIM)
    cents = similarity.centroids_from_kmeans(km, dim=DIM)
    ids = [c for c, _ in cents]
    assert ids == sorted(ids) and len(set(ids)) == len(ids)
    assert all(len(v) == DIM for _, v in cents)
    # trained means are the 6dp-rounded values kmeans_train emitted
    assert all(round(x, 6) == x for _, v in cents for x in v)


def test_trained_assignment_expr_equals_arrow(spark, emb):
    """The expression and Arrow-matmul assignment paths agree on a
    TRAINED (non-dense-id-safe) codebook, same as they do on the seed
    codebook — the argmax/tie contract is codebook-independent."""
    km = similarity.kmeans_train(emb, n_iter=2, n_centroids=8, dim=DIM)
    cents = similarity.centroids_from_kmeans(km, dim=DIM)
    a = similarity.ivf_assign(emb, dim=DIM, centroids=cents).select(
        "vec_id", "centroid"
    )
    b = similarity.ivf_assign_arrow(emb, dim=DIM, centroids=cents).select(
        "vec_id", "centroid"
    )
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    # trained assignment differs from the seed assignment (training moved
    # the codebook — otherwise the pipeline demonstrates nothing)
    seed = similarity.ivf_assign(emb, n_centroids=8, dim=DIM).select(
        "vec_id", "centroid"
    )
    assert a.exceptAll(seed).count() > 0


def test_resolve_n_centroids_auto(spark, emb):
    n = emb.count()
    # small corpus floors at 16
    assert similarity.resolve_n_centroids(emb, "auto") == max(16, -(-n // 256))
    assert similarity.resolve_n_centroids(emb, "auto", target_bucket=10) == max(
        16, -(-n // 10)
    )
    assert similarity.resolve_n_centroids(emb, 32) == 32


def test_train_assign_mine_semantics(spark, emb):
    out = similarity.train_assign_mine(emb, k=3, n_iter=2, n_centroids=8, dim=DIM)
    rows = out.collect()
    assert rows, "pipeline produced negatives"
    per_anchor = {}
    for r in rows:
        per_anchor.setdefault(r["vec_id"], []).append(r["rnk"])
    assert all(sorted(v) == list(range(1, len(v) + 1)) and len(v) <= 3
               for v in per_anchor.values())
    # every mined negative has a different label than its anchor
    lab = {r["vec_id"]: r["label"] for r in emb.select("vec_id", "label").collect()}
    assert all(lab[r["vec_id"]] != lab[r["neg_id"]] for r in rows)


def _fmt(spark, d):
    return spark._jvm.PythonSQLUtils.explainString(
        d._jdf.queryExecution(), "formatted"
    )


def test_distinct_join_rewrite_equals_naive_and_plan(spark):
    """q_distinct_join_rewrite: the fact is DISTINCTed below the join
    (shrinks orders to its key set before any join shuffle) — result
    identical to the naive count(DISTINCT)-above-the-join form, plan
    free of Expand/distinct-above-join, nation dim broadcast."""
    from page_rank_hadoop_spark.plans.registry import q_distinct_join_rewrite
    from page_rank_hadoop_spark.sources.catalog import load_table

    out = q_distinct_join_rewrite(spark, SF0001)
    cust = load_table(spark, SF0001, "customer")
    orders = load_table(spark, SF0001, "orders")
    nation = load_table(spark, SF0001, "nation")
    naive = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(nation, cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(F.countDistinct("o_custkey").cast("bigint").alias("n_customers"))
    )
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, naive.collect()))
    plan = _fmt(spark, out)
    assert "Expand" not in plan  # no distinct-aggregate expansion
    assert "BroadcastHashJoin" in plan
    # the distinct aggregate sits below the joins: naive plan has a
    # count(distinct) ABOVE a join, the rewrite must not
    assert "distinct" not in plan.split("Join", 1)[0].lower()


def test_approx_distinct_join_rewrite_demo(spark):
    """The sketch variant: when only the COUNT is needed, the distinct
    shuffle disappears entirely — approx_count_distinct aggregates
    map-side (partial HLL sketches merge, no Expand, no key shuffle of
    the fact) and lands within HLL error of the exact count."""
    from page_rank_hadoop_spark.sources.catalog import load_table

    cust = load_table(spark, SF0001, "customer")
    orders = load_table(spark, SF0001, "orders")
    nation = load_table(spark, SF0001, "nation")
    joined = orders.join(cust, orders.o_custkey == cust.c_custkey).join(
        F.broadcast(nation), cust.c_nationkey == nation.n_nationkey
    )
    approx = joined.groupBy("n_name").agg(
        F.approx_count_distinct("o_custkey", 0.02).alias("n_customers")
    )
    exact = joined.groupBy("n_name").agg(
        F.countDistinct("o_custkey").alias("n_customers")
    )
    a = {r["n_name"]: r["n_customers"] for r in approx.collect()}
    e = {r["n_name"]: r["n_customers"] for r in exact.collect()}
    assert set(a) == set(e)
    assert all(abs(a[k] - e[k]) <= max(3, 0.05 * e[k]) for k in e)
    plan = _fmt(spark, approx)
    assert "Expand" not in plan and "approx_count_distinct" in plan


def test_kafka_capability_gate(spark):
    """No Kafka jars in this container: the connector must fail at plan
    time with the actionable message, and the value decoder must produce
    the documents shape from a Kafka-shaped static frame."""
    from page_rank_hadoop_spark.sources.connectors import (
        kafka_value_to_docs,
        read_kafka_stream,
    )

    with pytest.raises(ImportError, match="spark-sql-kafka"):
        read_kafka_stream(spark, "broker:9092", "crawl")

    fake = spark.createDataFrame(
        [
            (b'{"doc_id": 1, "text": "hello world"}',),
            (b'{"doc_id": 2, "text": "second doc"}',),
        ],
        "value binary",
    ).withColumn("timestamp", F.current_timestamp())
    docs = kafka_value_to_docs(fake, "doc_id long, text string")
    assert docs.columns == ["doc_id", "text", "kafka_ts"]
    got = sorted((r["doc_id"], r["text"]) for r in docs.collect())
    assert got == [(1, "hello world"), (2, "second doc")]


def test_cli_dedup_index_build_probe_append(spark, tmp_path, capsys):
    """The band-index MV verbs as CLI commands: build over a corpus,
    probe a batch with a dup + a novel doc, append the survivors, probe
    again (the appended doc now collides)."""
    from page_rank_hadoop_spark.cli import main
    from tests.conftest import drop_warehouse_table

    drop_warehouse_table(spark, "t_cli_band_mv")
    corpus = str(tmp_path / "corpus")
    text_a = "the quick brown fox jumps over the lazy dog again and again"
    text_b = "entirely novel material that shares no shingles with the fox"
    spark.createDataFrame([(1, text_a)], ["doc_id", "text"]).write.parquet(corpus)
    assert main(["dedup-index", "build", corpus, "--table", "t_cli_band_mv"]) == 0

    batch = str(tmp_path / "batch")
    spark.createDataFrame(
        [(10, text_a), (11, text_b)], ["doc_id", "text"]
    ).write.parquet(batch)
    assert main(["dedup-index", "probe", batch, "--table", "t_cli_band_mv"]) == 0
    assert "1 of 2 batch docs collide" in capsys.readouterr().out

    assert main(["dedup-index", "append", batch, "--table", "t_cli_band_mv"]) == 0
    batch2 = str(tmp_path / "batch2")
    spark.createDataFrame([(20, text_b)], ["doc_id", "text"]).write.parquet(batch2)
    assert main(["dedup-index", "probe", batch2, "--table", "t_cli_band_mv"]) == 0
    assert "1 of 1 batch docs collide" in capsys.readouterr().out
    spark.sql("DROP TABLE IF EXISTS t_cli_band_mv")


def test_cli_ann_mine(spark, tmp_path, capsys):
    from page_rank_hadoop_spark.cli import main

    out = str(tmp_path / "negs")
    assert main(
        [
            "ann-mine",
            f"{SF0001}/embeddings.parquet",
            out,
            "--k", "2",
            "--centroids", "8",
        ]
    ) == 0
    printed = capsys.readouterr().out
    assert "hard negatives" in printed and "C=8" in printed
    got = spark.read.parquet(out)
    assert got.columns == ["vec_id", "neg_id", "cos_sim", "rnk"]
    assert got.filter(F.col("rnk") > 2).count() == 0


def test_cli_dedup_index_across_processes(spark, tmp_path):
    """The workflow the CLI actually advertises: build in one PROCESS,
    probe in another. Each invocation is a fresh JVM with its own
    session; the hive/derby metastore (cli.main's persistent catalog)
    must carry the bucketed band table across them. ~1 min (two JVM
    cold starts) — the only test of the cross-invocation path."""
    import subprocess
    import sys

    corpus = str(tmp_path / "corpus")
    batch = str(tmp_path / "batch")
    text_a = "the quick brown fox jumps over the lazy dog again and again"
    text_b = "entirely novel material that shares no shingles with the fox"
    spark.createDataFrame([(1, text_a)], ["doc_id", "text"]).write.parquet(corpus)
    spark.createDataFrame(
        [(10, text_a), (11, text_b)], ["doc_id", "text"]
    ).write.parquet(batch)

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(
        os.environ,
        SPARK_GRAFT_CPUS="4",
        SPARK_GRAFT_DRIVER_MEM="2g",
        PYTHONPATH=repo + os.pathsep + os.environ.get("PYTHONPATH", ""),
    )
    def run(*argv):
        return subprocess.run(
            [sys.executable, "-m", "page_rank_hadoop_spark.cli", *argv],
            cwd=tmp_path, env=env, capture_output=True, text=True, timeout=240,
        )

    r1 = run("dedup-index", "build", corpus, "--table", "xp_band_mv")
    assert r1.returncode == 0, r1.stderr[-2000:]
    r2 = run("dedup-index", "probe", batch, "--table", "xp_band_mv")
    assert r2.returncode == 0, r2.stderr[-2000:]
    assert "1 of 2 batch docs collide" in r2.stdout
    # compact (staging + catalog rename) in a third process, probe in a
    # fourth — the rename must survive the hive metastore round-trip
    r3 = run("dedup-index", "compact", "--table", "xp_band_mv")
    assert r3.returncode == 0, r3.stderr[-2000:]
    assert "rewritten to" in r3.stdout
    r4 = run("dedup-index", "probe", batch, "--table", "xp_band_mv")
    assert r4.returncode == 0, r4.stderr[-2000:]
    assert "1 of 2 batch docs collide" in r4.stdout


def test_serving_latency_bench_smoke(spark):
    """The reference-M1 serving micro-bench must keep producing sane
    numbers (it feeds every BENCH payload): positive latencies, and the
    point probe touching exactly one file of the keyed layout."""
    import bench

    r = bench.serving_latency_bench(spark, SF0001, n_lookups=3)
    assert r["n_lookups"] == 3
    assert r["cold_ms"] > 0 and r["warm_p50_ms"] > 0
    assert r["point_lookup_files_touched"] == 1


def test_trained_mining_plan_shape(spark, emb):
    """The mining stage over a TRAINED codebook keeps the seed-codebook
    plan shape: per-anchor top-k compiles to WindowGroupLimit inside the
    trained buckets, no cartesian, no Python eval. (Pinned here because
    the declared q_trained_hard_negatives returns the materialized
    pipeline result, whose visible plan is the checkpoint scan.)"""
    km = similarity.kmeans_train(emb, n_iter=2, n_centroids=8, dim=DIM)
    cents = similarity.centroids_from_kmeans(km, dim=DIM)
    hn = similarity.hard_negatives(emb, k=3, dim=DIM, centroids=cents)
    plan = _fmt(spark, hn)
    assert "WindowGroupLimit" in plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan


def test_hard_negatives_auto_c(spark, emb):
    """n_centroids='auto' runs end-to-end and respects the rule (floors
    at 16 here, so it must equal the explicit C=16 result)."""
    auto = similarity.hard_negatives(emb, k=2, n_centroids="auto", dim=DIM)
    fixed = similarity.hard_negatives(emb, k=2, n_centroids=16, dim=DIM)
    assert auto.exceptAll(fixed).count() == 0 and fixed.exceptAll(auto).count() == 0
