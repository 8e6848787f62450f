"""Trained IVF-PQ ADC search: arrow/expr parity, ranking contract, and
recall floor (operators/similarity.pq_train_codebooks + pq_adc_knn)."""

import pytest
from pyspark.sql import functions as F

from page_rank_hadoop_spark.operators import similarity
from page_rank_hadoop_spark.sources.catalog import load_table

SF0001 = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return load_table(spark, SF0001, "embeddings")


@pytest.fixture(scope="module")
def books(emb):
    return similarity.pq_train_codebooks(emb, n_codes=32, n_iter=2, scale=0.2)


def test_train_arrow_equals_expr(emb):
    """The Arrow assignment accumulates distances in the same left-fold
    order as the expression path, so the TRAINED codebooks — every
    6dp-rounded mean after 2 rounds — must be equal exactly."""
    b_arrow = similarity.pq_train_codebooks(emb, n_codes=16, n_iter=2, impl="arrow")
    b_expr = similarity.pq_train_codebooks(emb, n_codes=16, n_iter=2, impl="expr")
    assert b_arrow == b_expr


def test_adc_arrow_equals_expr(emb, books):
    r_arrow = similarity.pq_adc_knn(emb, books=books, impl="arrow").collect()
    r_expr = similarity.pq_adc_knn(emb, books=books, impl="expr").collect()
    assert sorted(map(tuple, r_arrow)) == sorted(map(tuple, r_expr))


def test_adc_ranking_contract(emb, books):
    rows = similarity.pq_adc_knn(emb, k=5, n_probes=8, books=books).collect()
    assert len(rows) == 40
    by_probe = {}
    for r in rows:
        by_probe.setdefault(r.probe_id, []).append(r)
    assert set(by_probe) == set(range(8))
    for pid, rs in by_probe.items():
        rs.sort(key=lambda r: r.rn)
        assert [r.rn for r in rs] == [1, 2, 3, 4, 5]
        dists = [r.adc_dist for r in rs]
        assert dists == sorted(dists)
        assert all(r.vec_id != pid for r in rs)


def test_adc_recall_floor(spark, emb, books):
    """ADC top-5 must overlap exact in-bucket squared-L2 top-5 well
    above chance — the point of TRAINING the sub-quantizers (untrained
    sin codebooks sit ~5x off the data shell and measured 30% here;
    trained lands ~60%). Floor at 45% for slack."""
    from pyspark.sql import Window

    adc = similarity.pq_adc_knn(emb, k=5, n_probes=8, books=books)
    assigned = similarity.ivf_assign(emb)
    probes = assigned.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("probe_id"),
        F.col("embedding").alias("p"),
        F.col("centroid").alias("pc"),
    )
    sq = F.aggregate(
        F.zip_with(F.col("embedding"), F.col("p"), lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda a, t: a + t,
    )
    cand = assigned.join(F.broadcast(probes), assigned["centroid"] == probes["pc"]).filter(
        F.col("vec_id") != F.col("probe_id")
    )
    w = Window.partitionBy("probe_id").orderBy(F.round(sq, 6).asc(), F.col("vec_id"))
    exact = (
        cand.withColumn("rn", F.row_number().over(w))
        .filter("rn <= 5")
        .select("probe_id", "vec_id")
    )
    hits = adc.join(exact, ["probe_id", "vec_id"]).count()
    assert hits / 40 >= 0.45


def test_hard_negatives_pair_impl_parity(spark, emb):
    """BLAS bucket-matmul pair scoring must reproduce the expression
    path exactly: the 6dp pre-rank round + (cos desc, neg_id) tie-break
    absorb the ~1-ulp raw-cosine difference."""
    a = similarity.hard_negatives(emb, k=3, n_centroids=16, dim=64)
    b = similarity.hard_negatives(emb, k=3, n_centroids=16, dim=64, pair_impl="arrow")
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_kmeans_train_impl_parity(spark, emb):
    a = similarity.kmeans_train(emb, n_iter=2, impl="expr")
    b = similarity.kmeans_train(emb, n_iter=2, impl="arrow")
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
