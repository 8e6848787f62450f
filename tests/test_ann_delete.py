"""IVF index deletion lane (similarity.delete_from_ivf_index): the
GDPR/forget path for ANN serving — tombstone append, serve-time
exclusion in every probe path (Spark probe, ADC probe, cursor), and
physical application at compact time.

Reference parity note: the reference has no vector index at all; this
lane extends the engine's own write/append/compact lifecycle
(SURVEY.md §2 extension surface), mirroring q_forget_users' document-
side contract."""

import os

import pytest

from tests.conftest import SF0001


@pytest.fixture(scope="module")
def forget_index(spark, tmp_path_factory):
    """A PQ-capable index over sf0.001 embeddings with ids 3, 7, 11
    tombstoned (list form) and every vec_id % 50 == 0 tombstoned
    (DataFrame form) — both delete entry points exercised at build."""
    import pyspark.sql.functions as F

    from page_rank_hadoop_spark.operators import similarity
    from page_rank_hadoop_spark.sources.catalog import load_table

    d = str(tmp_path_factory.mktemp("ivf_del") / "idx")
    emb = load_table(spark, SF0001, "embeddings")
    books = similarity.pq_train_codebooks(emb, m=8, n_codes=16, dim=64, n_iter=1)
    similarity.write_ivf_index(emb, d, n_centroids=16, dim=64, pq_books=books)
    n1 = similarity.delete_from_ivf_index(spark, d, [3, 7, 11, 7])  # dup collapses
    n2 = similarity.delete_from_ivf_index(
        spark, d, emb.select("vec_id").filter(F.col("vec_id") % 50 == 0)
    )
    dead = set(similarity.load_ivf_tombstones(spark, d))
    all_ids = {r["vec_id"] for r in emb.select("vec_id").collect()}
    return {"path": d, "emb": emb, "n1": n1, "n2": n2, "dead": dead, "all": all_ids}


def _probe_vec(emb, vec_id=1):
    row = emb.filter(f"vec_id = {vec_id}").select("embedding").first()
    return [float(x) for x in row["embedding"]]


def test_tombstone_counts_and_load(spark, forget_index):
    fi = forget_index
    assert fi["n1"] == 3  # the duplicate 7 collapsed
    assert fi["n2"] >= 1
    assert {3, 7, 11}.issubset(fi["dead"])
    assert all(v % 50 == 0 for v in fi["dead"] - {3, 7, 11})


def test_probe_excludes_tombstones(spark, forget_index):
    from page_rank_hadoop_spark.operators import similarity

    fi = forget_index
    p = _probe_vec(fi["emb"])
    got = similarity.probe_ivf_index(
        spark, fi["path"], p, k=10_000, n_probe=16
    ).collect()
    ids = {r["vec_id"] for r in got}
    assert ids == fi["all"] - fi["dead"]  # full scan minus exactly the dead


def test_adc_probe_and_cursor_exclude_tombstones(spark, forget_index):
    from page_rank_hadoop_spark.operators import similarity
    from page_rank_hadoop_spark.sources.search import VectorSearchCursor

    fi = forget_index
    p = _probe_vec(fi["emb"])
    adc = similarity.probe_ivf_index_adc(
        spark, fi["path"], p, k=10_000, n_probe=16
    ).collect()
    assert {r["vec_id"] for r in adc} == fi["all"] - fi["dead"]

    cur = VectorSearchCursor(fi["path"])
    assert {r["vec_id"] for r in cur.topk(p, k=10_000, n_probe=16)} == (
        fi["all"] - fi["dead"]
    )
    assert {r["vec_id"] for r in cur.adc_topk(p, k=10_000, n_probe=16)} == (
        fi["all"] - fi["dead"]
    )
    # refined path reads full vectors for the shortlist — still excluded
    ref = cur.adc_topk(p, k=5, n_probe=16, refine=4)
    assert not ({r["vec_id"] for r in ref} & fi["dead"])


def test_cursor_spark_parity_after_delete(spark, forget_index):
    from page_rank_hadoop_spark.operators import similarity
    from page_rank_hadoop_spark.sources.search import VectorSearchCursor

    fi = forget_index
    p = _probe_vec(fi["emb"])
    spark_rows = [
        (r["vec_id"], r["cos_sim"])
        for r in similarity.probe_ivf_index(spark, fi["path"], p, k=10).collect()
    ]
    cur_rows = [
        (r["vec_id"], r["cos_sim"])
        for r in VectorSearchCursor(fi["path"]).topk(p, k=10)
    ]
    assert spark_rows == cur_rows


def test_compact_applies_tombstones_physically(spark, forget_index):
    from page_rank_hadoop_spark.operators import similarity
    from page_rank_hadoop_spark.sources.search import VectorSearchCursor

    fi = forget_index
    similarity.compact_ivf_index(spark, fi["path"])
    # tombstone dir is gone with the swap, data rows physically dropped
    assert similarity.load_ivf_tombstones(spark, fi["path"]) == []
    assert not os.path.isdir(os.path.join(fi["path"], "_tombstones"))
    raw_ids = {r["vec_id"] for r in spark.read.parquet(fi["path"]).select("vec_id").collect()}
    assert raw_ids == fi["all"] - fi["dead"]
    # serving answers are unchanged by the physical apply
    p = _probe_vec(fi["emb"])
    got = {r["vec_id"] for r in VectorSearchCursor(fi["path"]).topk(p, k=10_000, n_probe=16)}
    assert got == fi["all"] - fi["dead"]
    # ADC capability survives the compact (codes + meta carried over)
    adc = similarity.probe_ivf_index_adc(spark, fi["path"], p, k=5)
    assert adc.count() == 5


def test_delete_errors(spark, tmp_path):
    from page_rank_hadoop_spark.operators import similarity

    with pytest.raises(FileNotFoundError):
        similarity.delete_from_ivf_index(spark, str(tmp_path / "nope"), [1])
    # empty batch is a no-op, not an error
    from page_rank_hadoop_spark.sources.catalog import load_table

    emb = load_table(spark, SF0001, "embeddings")
    d = str(tmp_path / "idx")
    similarity.write_ivf_index(emb.limit(20), d, n_centroids=4, dim=64)
    assert similarity.delete_from_ivf_index(spark, d, []) == 0
    assert similarity.load_ivf_tombstones(spark, d) == []
