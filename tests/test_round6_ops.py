"""Round-6 operators: IVF recall measurement (ivf_recall), the Zipf
vocabulary diagnostic (zipf_slope), and the declared band-index
compaction lifecycle query's plan shape.
"""

import pytest
from pyspark.sql import functions as F

from page_rank_hadoop_spark.operators import similarity, textstats
from page_rank_hadoop_spark.sources.catalog import load_table

SF0001 = "/root/testdata/sf0.001"
DIM = 64


@pytest.fixture(scope="module")
def emb(spark):
    return load_table(spark, SF0001, "embeddings")


def test_ivf_recall_bounds_and_self_hit(spark, emb):
    out = similarity.ivf_recall(emb, k=10, n_probes=8, n_centroids=16, dim=DIM)
    rows = {r["probe_id"]: r for r in out.collect()}
    assert sorted(rows) == list(range(8))
    for r in rows.values():
        # a probe always retrieves itself on both sides → ≥ 1 hit
        assert 1 <= r["n_hit"] <= 10
        assert r["recall"] == round(r["n_hit"] / 10, 6)


def test_ivf_recall_degenerates_to_exact_with_one_bucket(spark, emb):
    """C=1 puts every vector in the probe's bucket — approx == exact,
    recall exactly 1.0 for every probe (the ivf_knn n_probe=C analog)."""
    out = similarity.ivf_recall(emb, k=5, n_probes=6, n_centroids=1, dim=DIM)
    assert [r["recall"] for r in out.collect()] == [1.0] * 6


def test_ivf_recall_plan_shape(spark, emb):
    """Exact side: broadcast nested-loop over the tiny probe table (the
    corpus never shuffles for the cross product); both top-k filters
    compile to WindowGroupLimit; no CartesianProduct anywhere."""
    df = similarity.ivf_recall(emb, k=10, n_probes=8, n_centroids=16, dim=DIM)
    plan = spark._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "BroadcastNestedLoopJoin" in plan
    assert "WindowGroupLimit" in plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan


def test_zipf_slope_exact_two_term_corpus(spark):
    """a×4 + b×2 over two docs: ranks (1, 2), x = (0, ln 2),
    y = (ln 4, ln 2) → slope = (ln2 − ln4)/ln2 = −1 exactly."""
    docs = spark.createDataFrame(
        [(1, "aa aa bb"), (2, "aa aa bb")], ["doc_id", "text"]
    )
    row = textstats.zipf_slope(docs).collect()[0]
    assert row["n_terms"] == 2
    assert row["slope"] == pytest.approx(-1.0, abs=1e-5)
    # intercept = mean(y) − slope·mean(x) = ln 4 + ... ≈ ln 4
    assert row["intercept"] == pytest.approx(1.386294, abs=1e-4)


def test_zipf_slope_on_testdata_is_negative(spark):
    docs = load_table(spark, SF0001, "documents")
    row = textstats.zipf_slope(docs).collect()[0]
    assert row["n_terms"] > 10
    assert row["slope"] < 0


def test_band_index_compacted_query_matches_one_shot(spark):
    """Declared-query twin sanity at sf0.001: build(evens) + append(odds)
    + rename-swap compact must equal one-shot shingling of the corpus."""
    from page_rank_hadoop_spark.operators import dedup
    from page_rank_hadoop_spark.plans.registry import q_band_index_compacted

    got = sorted(
        tuple(r) for r in q_band_index_compacted(spark, SF0001).collect()
    )
    docs = load_table(spark, SF0001, "documents").select("doc_id", "text")
    want = sorted(tuple(r) for r in dedup.minhash_band_table(docs).collect())
    assert got == want
