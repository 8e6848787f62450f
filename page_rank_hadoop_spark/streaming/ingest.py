"""Continuous corpus ingestion — the streaming twin of the `prepare` CLI
pass: normalize → quality-gate → content-dedup → append sink, running
incrementally as new crawl files land.

Streaming constraints shape the operator choices (and document the
batch/stream split honestly):
- the quality gate must be a PURE PROJECTION (``functions/text.
  quality_score``), not the two-aggregation ``quality_signals`` rollup —
  chaining an aggregation into the stateful dedup is not a supported
  streaming plan;
- dedup is ``dropDuplicatesWithinWatermark`` on the NORMALIZED text
  hash with an ingest-time watermark: state is bounded by the horizon,
  the production answer to at-least-once file/Kafka delivery. A
  duplicate arriving after the horizon passes is kept (late-dup
  tradeoff) — the batch `prepare` pass remains the exact global dedup.

Two MV-gated exact/near-dup gates live below the watermark path:
- ``dedup_gate_batch``/``run_dedup_gated_ingest`` — TEXT near-dup over
  the persisted MinHash band index (crash-safe two-write protocol;
  semantics hash-gated as q_dedup_gate_replay);
- ``ann_gate_batch``/``run_ann_gated_ingest`` — EMBEDDING near-dup over
  the persisted IVF index (single-artifact append, replay-idempotent by
  self-collision; semantics hash-gated as q_ann_gate_replay).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from page_rank_hadoop_spark.functions.text import normalize_text, quality_score


def ingest_transform(
    stream: DataFrame, min_quality: float = 0.3, watermark: str = "10 minutes"
) -> DataFrame:
    """The incremental ingest plan over a streaming documents source:
    normalized text, map-side quality filter, watermark-bounded exact
    dedup on the normalized content hash."""
    cleaned = (
        stream.withColumn("text", normalize_text("text"))
        .withColumn("quality", F.round(quality_score("text"), 6))
        .filter(F.col("quality") >= min_quality)
        .withColumn("content_md5", F.md5("text"))
        .withColumn("ingest_ts", F.current_timestamp())
    )
    return cleaned.withWatermark("ingest_ts", watermark).dropDuplicatesWithinWatermark(
        ["content_md5"]
    )


def run_ingest_to_parquet(
    spark: SparkSession,
    in_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    schema,
    min_quality: float = 0.3,
) -> None:
    """Drive the ingest pipeline over a file-source directory to
    completion (one ``processAllAvailable`` pass — the test vehicle; in
    production the same query runs unbounded with a trigger)."""
    stream = spark.readStream.schema(schema).parquet(in_dir)
    out = ingest_transform(stream, min_quality)
    q = (
        out.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()


BAND_INDEX_SCHEMA = "doc_id long, band int, key string"


def dedup_gate_batch(
    batch_df: DataFrame,
    corpus_dir: str,
    band_table: str,
    n_buckets: int = 8,
    on_mv_appended=None,
) -> DataFrame:
    """One micro-batch through the MV-backed near-dup gate — the unit
    ``run_dedup_gated_ingest`` drives per trigger, factored out so the
    probe plan is directly assertable in tests: probe the STORED band
    index (no corpus rescan, no corpus re-shingling), append the
    survivors' band rows to the MV, append the survivors to the corpus
    sink. Returns the surviving (materialized) batch slice.

    CRASH-SAFETY under at-least-once redelivery (each parquet write is
    job-atomic via the commit protocol; the exposure is a crash BETWEEN
    the two writes):

    - The MV is appended FIRST — it is the commit marker. A replayed doc
      whose bands are already in the MV collides with ITSELF, which the
      probe reports as ``dup_of == doc_id`` — and ONLY then: a doc that
      was never accepted has no stored rows of its own, so its minimum
      colliding partner is necessarily some OTHER doc (≠ its id), while
      an accepted doc's replay can only collide with itself (anything it
      shared a band with would have kept it out of the MV originally).
    - Self-marked docs take the HEAL path: only those actually missing
      from the corpus sink are (re)appended — so MV-appended-but-
      corpus-crashed docs are recovered, fully-committed replays append
      nothing, and no doc is ever duplicated or lost. The corpus
      doc_id scan runs ONLY when self-collisions exist (replay/heal);
      the normal path stays batch-sized at any corpus size.

    MISSING-MV BOOTSTRAP: a corpus sink without its band table (dropped
    table, restarted in-memory catalog, pre-MV sink) must not silently
    disable dedup against the existing docs — the index is rebuilt from
    the sink once (corpus-sized, one time) before probing.

    CORPUS↔INDEX BINDING: the index records its corpus path in table
    properties (``dedup.bind_band_index``); an existing table bound to a
    DIFFERENT corpus fails the gate loudly — with a persistent
    metastore, a name collision would otherwise silently flag a fresh
    corpus's docs as dups of a long-gone corpus's doc_ids (and the heal
    path could append foreign docs). An unbound table (built by batch
    tooling) is adopted and bound on first use."""
    import os as _os

    from pyspark.errors import AnalysisException
    from pyspark.sql import functions as F2

    from page_rank_hadoop_spark.operators import dedup as _dedup

    sess = batch_df.sparkSession
    if sess.catalog.tableExists(band_table):
        bound = _dedup.band_index_binding(sess, band_table)
        here = _os.path.abspath(corpus_dir)
        if bound is None:
            _dedup.bind_band_index(sess, band_table, corpus_dir)
        elif bound != here:
            raise ValueError(
                f"band index table {band_table!r} is bound to corpus "
                f"{bound!r}, not {here!r} — refusing to cross-dedup two "
                "corpora; pass the right table (or default_band_table"
                "(corpus_dir)) or drop the stale one"
            )
    if not sess.catalog.tableExists(band_table):
        try:
            corpus = sess.read.schema("doc_id long, text string").parquet(corpus_dir)
            has_corpus = bool(corpus.take(1))
        except AnalysisException:
            has_corpus = False
        if has_corpus:
            _dedup.write_band_index(corpus, band_table, n_buckets=n_buckets)
            _dedup.bind_band_index(sess, band_table, corpus_dir)
    if sess.catalog.tableExists(band_table):
        corpus_bands = sess.table(band_table)
    else:
        corpus_bands = sess.createDataFrame([], BAND_INDEX_SCHEMA)
    flagged, batch_bands = _dedup.incremental_dedup_against_index(
        corpus_bands, batch_df.select("doc_id", "text")
    )
    # one shingling pass feeds both the probe and the MV append
    batch_bands = batch_bands.localCheckpoint()
    flagged = flagged.localCheckpoint()
    dups = flagged.filter(F2.col("dup_of") != F2.col("doc_id")).select("doc_id")
    self_marked = flagged.filter(F2.col("dup_of") == F2.col("doc_id")).select("doc_id")
    # materialize the (batch-sized) survivors BEFORE appending, so the
    # index read never overlaps the writes
    keep = batch_df.join(dups, "doc_id", "left_anti").localCheckpoint()
    fresh_ids = keep.select("doc_id").join(self_marked, "doc_id", "left_anti")
    # MV first (the commit marker); self-marked docs' bands are already in
    _dedup.append_band_index(
        batch_bands.join(fresh_ids, "doc_id", "left_semi"),
        band_table,
        n_buckets=n_buckets,
    )
    if on_mv_appended is not None:
        # fault-injection point for crash rehearsal/pytest: raising HERE
        # leaves exactly the half-commit window (bands in the MV, docs
        # not yet in the corpus) that the heal path exists to recover
        on_mv_appended()
    if self_marked.take(1):
        # heal/replay path: append only docs the corpus doesn't hold yet
        # (a crash before the FIRST batch's corpus write leaves no sink —
        # then everything in keep is missing by definition)
        try:
            existing = sess.read.schema("doc_id long, text string").parquet(
                corpus_dir
            ).select("doc_id")
            existing.take(1)  # surface a missing path HERE, not mid-join
            to_corpus = keep.join(existing, "doc_id", "left_anti")
        except AnalysisException:  # missing sink: first batch crashed pre-write
            to_corpus = keep
    else:
        to_corpus = keep
    to_corpus = to_corpus.localCheckpoint()
    to_corpus.write.mode("append").parquet(corpus_dir)
    return to_corpus


def run_dedup_gated_ingest(
    spark: SparkSession,
    in_dir: str,
    corpus_dir: str,
    checkpoint_dir: str,
    schema,
    band_table: str | None = None,
    n_buckets: int = 8,
) -> None:
    """NEAR-dup-gated continuous ingestion riding a MAINTAINED band-index
    MV: every micro-batch shingles only ITSELF, probes the stored
    bucketed (band, key) index (``dedup.incremental_dedup_against_index``
    — an equi-join whose corpus side is the MV scan, never the corpus),
    appends survivors to the corpus sink AND their band rows to the MV.
    Per-batch cost is ∝ batch size + collisions at ANY corpus size — the
    property the batch-twin docstring promises and this loop delivers.
    Runs via ``foreachBatch`` (the documented escape hatch for per-batch
    logic a streaming plan can't express: the probe joins against state
    the stream itself accumulates).

    Exactly-once: foreachBatch + checkpoint gives at-least-once batch
    delivery; the gate makes replayed batches idempotent — a replayed
    doc collides with its first copy's band rows in the MV and is
    dropped, and the ``band_table_with_fallback`` sentinel (exact
    content hash for any doc the signature path produced no band rows
    for, e.g. NULL text) makes that guarantee total, not just for
    shingle-bearing docs.

    ``band_table=None`` (the default) derives the table name from the
    corpus path (``dedup.default_band_table``) so distinct corpora can
    never share an index by default; an explicit name is verified
    against the table's recorded corpus binding in the gate.
    """
    from page_rank_hadoop_spark.operators import dedup as _dedup

    if band_table is None:
        band_table = _dedup.default_band_table(corpus_dir)

    def gate(batch_df: DataFrame, batch_id: int) -> None:
        batch_df = batch_df.localCheckpoint()
        if not batch_df.take(1):
            return
        dedup_gate_batch(batch_df, corpus_dir, band_table, n_buckets)

    stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(in_dir)
    q = (
        stream.writeStream.foreachBatch(gate)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def ann_gate_batch(
    batch_df: DataFrame,
    index_dir: str,
    min_cosine: float = 0.95,
    n_centroids: int = 16,
    dim: int = 64,
) -> DataFrame:
    """One micro-batch through the EMBEDDING near-dup gate riding the
    persisted IVF index (similarity.write_ivf_index layout) — the
    vector twin of ``dedup_gate_batch``: assign the batch to its
    centroids (one map pass), scan ONLY those bucket directories of the
    index (partition pruning — the index side of the join is
    ~batch-buckets/C of the index, never the full corpus), drop batch
    vectors with a stored neighbor at cosine ≥ ``min_cosine``, append
    the survivors to the index. Returns the surviving batch slice.

    CRASH-SAFETY is simpler than the text gate BY CONSTRUCTION: the
    index IS the corpus sink for vectors (one artifact, one job-atomic
    append), so there is no two-write window to protect. At-least-once
    replay is idempotent via TWO independent drops: (a) a replayed
    vector finds ITSELF stored (same vec_id at cosine 1.0 — and only a
    replay can, since a first-delivery vector with a stored neighbor
    would have been dropped before ever being appended); (b) an EXACT
    vec_id anti-join against the probed buckets, which also covers the
    degenerate vectors cosine can't (an all-zero embedding yields NaN
    cosine — 0/0 — which never passes ``>= min_cosine``, so without
    the id drop a replayed zero vector would be re-appended on every
    redelivery; round-6 ADVICE). Deterministic assignment guarantees a
    replayed vector probes the bucket its first delivery landed in.

    The codebook comes from the index's own meta file when the index
    exists (``n_centroids``/``dim`` are only used to SEED a brand-new
    index); a gate pointed at an index built with different parameters
    fails loudly instead of misfiling.
    """
    from pyspark.sql import functions as F2

    from page_rank_hadoop_spark.functions.vectors import cosine as _cos
    from page_rank_hadoop_spark.operators import similarity as _sim

    sess = batch_df.sparkSession
    meta = _sim.load_ivf_meta(index_dir)
    if meta is not None:
        cents, dim = meta["centroids"], meta["dim"]
    else:
        cents = _sim.seed_centroids(n_centroids, dim)
    assigned = _sim.ivf_assign(batch_df, dim=dim, centroids=cents).localCheckpoint()
    # bounded collect: distinct centroids of ONE micro-batch, ≤ the
    # codebook size C (≤ a few thousand ints at any corpus scale) — it
    # exists to turn the probe into a partition-pruning isin filter
    buckets = [r["centroid"] for r in assigned.select("centroid").distinct().collect()]
    if _sim.ivf_index_has_data(index_dir):
        stored = (
            sess.read.parquet(index_dir)
            .filter(F2.col("centroid").isin(buckets))
            .select(
                F2.col("vec_id").alias("s_id"),
                F2.col("embedding").alias("s_emb"),
                "centroid",
            )
        )
        hits = (
            assigned.join(stored, "centroid")
            .filter(
                F2.round(_cos(F2.col("embedding"), F2.col("s_emb")), 6)
                >= F2.lit(min_cosine)
            )
            .groupBy("vec_id")
            .agg(F2.min("s_id").alias("dup_of"))
        )
        fresh = assigned.join(hits, "vec_id", "left_anti").join(
            stored.select(F2.col("s_id").alias("vec_id")), "vec_id", "left_anti"
        )
    else:
        fresh = assigned
    # within-batch keep-first: a vector colliding with a SMALLER vec_id
    # in its own batch defers to it (the text gate's batch-1 semantics)
    a = fresh.select("centroid", F2.col("vec_id").alias("a_id"), F2.col("embedding").alias("a_emb"))
    b = fresh.select("centroid", F2.col("vec_id").alias("b_id"), F2.col("embedding").alias("b_emb"))
    self_hits = (
        a.join(b, "centroid")
        .filter(F2.col("a_id") > F2.col("b_id"))
        .filter(
            F2.round(_cos(F2.col("a_emb"), F2.col("b_emb")), 6)
            >= F2.lit(min_cosine)
        )
        .select(F2.col("a_id").alias("vec_id"))
        .distinct()
    )
    survivors = (
        fresh.join(self_hits, "vec_id", "left_anti")
        .select("vec_id", "embedding")
        .localCheckpoint()
    )
    if survivors.take(1):
        _sim.append_ivf_index(survivors, index_dir, centroids=cents, dim=dim)
    return survivors


def run_ann_gated_ingest(
    spark: SparkSession,
    in_dir: str,
    index_dir: str,
    checkpoint_dir: str,
    schema,
    min_cosine: float = 0.95,
    n_centroids: int = 16,
    dim: int = 64,
) -> None:
    """Embedding-dedup-gated continuous ingestion over the persisted IVF
    index: every micro-batch probes only its own bucket directories and
    appends survivors — per-batch cost ∝ batch size + bucket hits at
    any index size. foreachBatch + checkpoint gives at-least-once batch
    delivery; the gate's self-collision rule makes replays idempotent
    (see ann_gate_batch)."""

    def gate(batch_df: DataFrame, batch_id: int) -> None:
        batch_df = batch_df.localCheckpoint()
        if not batch_df.take(1):
            return
        ann_gate_batch(
            batch_df, index_dir, min_cosine=min_cosine,
            n_centroids=n_centroids, dim=dim,
        )

    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(in_dir)
    )
    q = (
        stream.writeStream.foreachBatch(gate)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
