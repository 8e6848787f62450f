"""The persisted MinHash band-index MV — the round-5 scale artifact:
the corpus is shingled ONCE into a bucketed (band, key) warehouse table;
every later batch probes and appends to the STORED table. These tests pin
(a) probe-vs-self-contained equivalence, (b) the plan property that makes
it incremental (no corpus scan / no corpus re-shingle in the probe), and
(c) total idempotency including band-less (NULL-text) docs via the
exact-content sentinel fallback.
"""

import pytest
from pyspark.sql import functions as F

from page_rank_hadoop_spark.operators import dedup


TEXT_A = "the quick brown fox jumps over the lazy dog again and again"
TEXT_B = "entirely novel material that shares no shingles with the fox"
TEXT_C = "a third corpus document with its own distinctive shingle content"


def _drop(spark, table):
    from tests.conftest import drop_warehouse_table

    drop_warehouse_table(spark, table)


def test_probe_against_stored_index_matches_self_contained(spark, tmp_path):
    corpus = spark.createDataFrame(
        [(1, TEXT_A), (2, TEXT_C)], ["doc_id", "text"]
    )
    batch = spark.createDataFrame(
        [(10, TEXT_A), (11, TEXT_B), (12, TEXT_B)], ["doc_id", "text"]
    )
    _drop(spark, "t_band_mv_eq")
    dedup.write_band_index(corpus, "t_band_mv_eq", fallback=False)
    flagged_mv, _ = dedup.incremental_dedup_against_index(
        spark.table("t_band_mv_eq"), batch, fallback=False
    )
    flagged_direct = dedup.incremental_minhash_dedup(corpus, batch)
    got = sorted(tuple(r) for r in flagged_mv.collect())
    want = sorted(tuple(r) for r in flagged_direct.collect())
    assert got == want
    # 10 dups corpus doc 1; 12 dups earlier-batch 11
    assert [r[:2] for r in got] == [(10, 1), (12, 11)]
    _drop(spark, "t_band_mv_eq")


def test_probe_plan_scans_mv_not_corpus(spark, tmp_path):
    """THE incrementality proof: batch N+1's probe plan reads the stored
    band MV and the batch — and never the corpus documents (no corpus
    parquet scan, no second shingling of corpus text). Also pins the
    bucket-join property: the only Exchanges in the probe feed the
    aggregation / batch side; the MV side has none before the join."""
    corpus_dir = str(tmp_path / "corpus_docs")
    spark.createDataFrame(
        [(1, TEXT_A), (2, TEXT_C)], ["doc_id", "text"]
    ).write.parquet(corpus_dir)
    corpus = spark.read.parquet(corpus_dir)
    _drop(spark, "t_band_mv_plan")
    dedup.write_band_index(corpus, "t_band_mv_plan")
    batch = spark.createDataFrame([(10, TEXT_A), (11, TEXT_B)], ["doc_id", "text"])
    flagged, _ = dedup.incremental_dedup_against_index(
        spark.table("t_band_mv_plan"), batch
    )
    plan = spark._jvm.PythonSQLUtils.explainString(
        flagged._jdf.queryExecution(), "formatted"
    )
    assert "corpus_docs" not in plan, "probe must not rescan the corpus"
    assert "t_band_mv_plan" in plan, "probe must read the stored MV"
    # the MV side arrives pre-bucketed: its scan shows the bucket spec
    assert "Bucketed: true" in plan
    _drop(spark, "t_band_mv_plan")


def test_append_maintenance_batch2_sees_batch1(spark):
    corpus = spark.createDataFrame([(1, TEXT_A)], ["doc_id", "text"])
    _drop(spark, "t_band_mv_append")
    dedup.write_band_index(corpus, "t_band_mv_append")
    # batch 1: novel doc survives; append its band rows
    b1 = spark.createDataFrame([(10, TEXT_B)], ["doc_id", "text"])
    flagged1, bands1 = dedup.incremental_dedup_against_index(
        spark.table("t_band_mv_append"), b1
    )
    assert flagged1.count() == 0
    dedup.append_band_index(bands1, "t_band_mv_append")
    # batch 2: dup of batch-1's doc is caught by the MAINTAINED index
    b2 = spark.createDataFrame([(20, TEXT_B)], ["doc_id", "text"])
    flagged2, _ = dedup.incremental_dedup_against_index(
        spark.table("t_band_mv_append"), b2
    )
    rows = flagged2.collect()
    assert [(r["doc_id"], r["dup_of"]) for r in rows] == [(20, 10)]
    _drop(spark, "t_band_mv_append")


def test_every_doc_is_banded_and_null_text_replay_dedups(spark):
    """The idempotency guarantee is TOTAL: char_shingles gives short docs
    a whole-text shingle, and NULL text degenerates to all-NULL minhashes
    whose band keys concat to md5('') — so even NULL-text docs land band
    rows and collide with their replayed copies. The structural sentinel
    (band = -1) therefore has nothing to cover today (empty set — the
    belt for future signature changes, not a live path)."""
    docs = spark.createDataFrame(
        [(1, None), (2, "ab"), (3, TEXT_A)], "doc_id long, text string"
    )
    bt = dedup.band_table_with_fallback(docs)
    # every doc produces band rows through the signature path itself
    assert sorted(
        r["doc_id"] for r in bt.select("doc_id").distinct().collect()
    ) == [1, 2, 3]
    assert bt.filter(F.col("band") == -1).count() == 0
    # a replayed NULL-text doc collides with its first copy
    probe, _ = dedup.incremental_dedup_against_index(
        bt, spark.createDataFrame([(10, None)], "doc_id long, text string")
    )
    assert [(r["doc_id"], r["dup_of"]) for r in probe.collect()] == [(10, 1)]


def test_gate_heals_crash_between_mv_and_corpus_write(spark, tmp_path):
    """Crash-safety contract: the MV is appended first (commit marker).
    Simulate dying between the two writes — bands in the MV, doc absent
    from the corpus — and replay the batch: the doc is self-marked
    (dup_of == doc_id), the heal path appends EXACTLY the missing doc,
    and a second replay appends nothing (no duplicates, no loss)."""
    from page_rank_hadoop_spark.streaming.ingest import dedup_gate_batch

    corpus = str(tmp_path / "corpus")
    table = "t_band_mv_heal"
    _drop(spark, table)
    spark.createDataFrame([(1, TEXT_A)], ["doc_id", "text"]).write.parquet(corpus)
    dedup.write_band_index(spark.read.parquet(corpus), table)
    # "crashed" half-commit of batch doc 10: band rows landed, corpus did not
    bands10 = dedup.band_table_with_fallback(
        spark.createDataFrame([(10, TEXT_B)], ["doc_id", "text"])
    )
    dedup.append_band_index(bands10, table)
    # replayed batch
    batch = spark.createDataFrame([(10, TEXT_B)], ["doc_id", "text"]).localCheckpoint()
    out1 = dedup_gate_batch(batch, corpus, table)
    assert [r["doc_id"] for r in out1.collect()] == [10]  # healed into corpus
    kept = sorted(r["doc_id"] for r in spark.read.parquet(corpus).collect())
    assert kept == [1, 10]
    # second replay: fully committed now — nothing appended
    out2 = dedup_gate_batch(batch, corpus, table)
    assert out2.count() == 0
    kept2 = sorted(r["doc_id"] for r in spark.read.parquet(corpus).collect())
    assert kept2 == [1, 10]
    _drop(spark, table)


def test_gate_bootstraps_missing_mv_from_corpus(spark, tmp_path):
    """A corpus sink whose band table is gone (dropped table, restarted
    catalog, pre-MV sink) must not silently admit duplicates of existing
    docs: the gate rebuilds the index from the sink before probing."""
    from page_rank_hadoop_spark.streaming.ingest import dedup_gate_batch

    corpus = str(tmp_path / "corpus")
    table = "t_band_mv_boot"
    _drop(spark, table)
    spark.createDataFrame(
        [(1, TEXT_A), (2, TEXT_C)], ["doc_id", "text"]
    ).write.parquet(corpus)
    batch = spark.createDataFrame(
        [(10, TEXT_A), (11, TEXT_B)], ["doc_id", "text"]
    ).localCheckpoint()
    out = dedup_gate_batch(batch, corpus, table)  # no table exists yet
    assert [r["doc_id"] for r in out.collect()] == [11]  # dup of 1 dropped
    kept = sorted(r["doc_id"] for r in spark.read.parquet(corpus).collect())
    assert kept == [1, 2, 11]
    # the rebuilt + maintained MV covers corpus and the new doc
    mv_docs = sorted(
        r["doc_id"] for r in spark.table(table).select("doc_id").distinct().collect()
    )
    assert mv_docs == [1, 2, 11]
    _drop(spark, table)


def test_compact_band_index_shrinks_files_preserves_probe(spark):
    """After many appends the MV is fragmented (each append writes its
    own files per bucket); compaction rewrites to ~n_buckets files via
    staging + atomic rename, with probe results identical before/after
    and the bucket spec intact (Bucketed: true still in the probe plan)."""
    import os

    table = "t_band_mv_compact"
    _drop(spark, table)
    dedup.write_band_index(
        spark.createDataFrame([(0, TEXT_A)], ["doc_id", "text"]), table, n_buckets=4
    )
    for i in range(1, 5):
        bands = dedup.band_table_with_fallback(
            spark.createDataFrame([(i * 10, f"{TEXT_B} variant {i}")], ["doc_id", "text"])
        )
        dedup.append_band_index(bands, table, n_buckets=4)
    loc = (
        spark.sql(f"DESCRIBE FORMATTED {table}")
        .filter("col_name = 'Location'")
        .collect()[0]["data_type"]
    ).removeprefix("file:")
    files_before = sum(
        1 for f in os.listdir(loc) if f.endswith(".parquet") and not f.startswith("_")
    )
    batch = spark.createDataFrame([(99, TEXT_A), (98, TEXT_B)], ["doc_id", "text"])
    before, _ = dedup.incremental_dedup_against_index(spark.table(table), batch)
    before_rows = sorted(tuple(r) for r in before.collect())

    n_files = dedup.compact_band_index(spark, table, n_buckets=4)
    assert 0 < n_files < files_before
    after, _ = dedup.incremental_dedup_against_index(spark.table(table), batch)
    assert sorted(tuple(r) for r in after.collect()) == before_rows
    plan = spark._jvm.PythonSQLUtils.explainString(
        after._jdf.queryExecution(), "formatted"
    )
    assert "Bucketed: true" in plan
    _drop(spark, table)


def test_streaming_gate_rides_stored_mv(spark, tmp_path):
    """End-to-end: the foreachBatch gate maintains the MV; cross-batch
    near-dup dropped, novel doc kept, NULL-text doc deduplicated on
    replay, and the MV holds band rows for exactly the kept docs."""
    from page_rank_hadoop_spark.streaming.ingest import run_dedup_gated_ingest

    src = str(tmp_path / "in")
    corpus = str(tmp_path / "corpus")
    table = "t_band_mv_stream"
    _drop(spark, table)
    spark.createDataFrame(
        [(1, TEXT_A), (2, TEXT_A), (5, None)], "doc_id long, text string"
    ).coalesce(1).write.mode("append").parquet(src)
    spark.createDataFrame(
        [(3, TEXT_A), (4, TEXT_B), (6, None)], "doc_id long, text string"
    ).coalesce(1).write.mode("append").parquet(src)

    run_dedup_gated_ingest(
        spark, src, corpus, str(tmp_path / "ck"), "doc_id long, text string",
        band_table=table,
    )
    kept = sorted(
        r["doc_id"] for r in spark.read.parquet(corpus).collect()
    )
    assert len(kept) == 3
    assert 4 in kept
    # exactly one survivor of the text_a cluster and one NULL-text doc
    assert len({1, 3} & set(kept)) == 1
    assert len({5, 6} & set(kept)) == 1
    # the MV covers exactly the kept docs
    mv_docs = sorted(
        r["doc_id"] for r in spark.table(table).select("doc_id").distinct().collect()
    )
    assert mv_docs == kept
    # replay the whole input under a FRESH checkpoint (at-least-once
    # redelivery): same doc_ids collide with their own MV rows → corpus
    # unchanged (total idempotency, NULL-text doc included)
    run_dedup_gated_ingest(
        spark, src, corpus, str(tmp_path / "ck2"), "doc_id long, text string",
        band_table=table,
    )
    kept2 = sorted(r["doc_id"] for r in spark.read.parquet(corpus).collect())
    assert kept2 == kept
    _drop(spark, table)


def test_gate_refuses_foreign_corpus_binding(spark, tmp_path):
    """The index records its corpus path in table properties; pointing
    the gate at the same table with a DIFFERENT corpus fails loudly
    instead of silently cross-deduping two corpora (the persistent-
    metastore name-collision hazard)."""
    from page_rank_hadoop_spark.streaming.ingest import dedup_gate_batch

    corpus_a = str(tmp_path / "corpus_a")
    corpus_b = str(tmp_path / "corpus_b")
    table = "t_band_mv_bind"
    _drop(spark, table)
    spark.createDataFrame([(1, TEXT_A)], ["doc_id", "text"]).write.parquet(corpus_a)
    spark.createDataFrame([(2, TEXT_C)], ["doc_id", "text"]).write.parquet(corpus_b)
    batch = spark.createDataFrame([(10, TEXT_B)], ["doc_id", "text"]).localCheckpoint()
    dedup_gate_batch(batch, corpus_a, table)  # bootstrap binds table→corpus_a
    import os

    assert dedup.band_index_binding(spark, table) == os.path.abspath(corpus_a)
    with pytest.raises(ValueError, match="bound to corpus"):
        dedup_gate_batch(batch, corpus_b, table)
    # corpus_b untouched by the refused gate
    assert sorted(
        r["doc_id"] for r in spark.read.parquet(corpus_b).collect()
    ) == [2]
    _drop(spark, table)


def test_compact_preserves_corpus_binding_and_liveness(spark, tmp_path):
    """Compaction's rename-based swap keeps (a) the corpus binding
    property on the live name and (b) a queryable live table with
    identical contents; no __old / __compacting leftovers."""
    corpus = str(tmp_path / "corpus")
    table = "t_band_mv_compact_bind"
    _drop(spark, table)
    docs = spark.createDataFrame(
        [(1, TEXT_A), (2, TEXT_B), (3, TEXT_C)], ["doc_id", "text"]
    )
    docs.write.parquet(corpus)
    dedup.write_band_index(spark.read.parquet(corpus), table)
    dedup.bind_band_index(spark, table, corpus)
    before = sorted(tuple(r) for r in spark.table(table).collect())
    n_files = dedup.compact_band_index(spark, table)
    assert n_files >= 1
    after = sorted(tuple(r) for r in spark.table(table).collect())
    assert after == before
    import os

    assert dedup.band_index_binding(spark, table) == os.path.abspath(corpus)
    assert not spark.catalog.tableExists(f"{table}__old")
    assert not spark.catalog.tableExists(f"{table}__compacting")
    _drop(spark, table)


def test_default_band_table_is_per_corpus(tmp_path):
    a = dedup.default_band_table(str(tmp_path / "a"))
    b = dedup.default_band_table(str(tmp_path / "b"))
    assert a != b
    assert a == dedup.default_band_table(str(tmp_path / "a"))
    assert a.startswith("corpus_band_index_")
