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
) -> DataFrame:
    """One micro-batch through the MV-backed near-dup gate — the unit
    ``run_dedup_gated_ingest`` drives per trigger, factored out so the
    probe plan is directly assertable in tests: probe the STORED band
    index (no corpus rescan, no corpus re-shingling), append survivors
    to the corpus sink, append the survivors' band rows to the MV.
    Returns the surviving (materialized) batch slice."""
    from page_rank_hadoop_spark.operators import dedup as _dedup

    sess = batch_df.sparkSession
    if sess.catalog.tableExists(band_table):
        corpus_bands = sess.table(band_table)
    else:
        corpus_bands = sess.createDataFrame([], BAND_INDEX_SCHEMA)
    flagged, batch_bands = _dedup.incremental_dedup_against_index(
        corpus_bands, batch_df.select("doc_id", "text")
    )
    # one shingling pass feeds both the probe and the MV append
    batch_bands = batch_bands.localCheckpoint()
    # materialize the (batch-sized) survivors BEFORE appending, so the
    # index read never overlaps the writes
    clean = batch_df.join(
        flagged.select("doc_id"), "doc_id", "left_anti"
    ).localCheckpoint()
    clean.write.mode("append").parquet(corpus_dir)
    _dedup.append_band_index(
        batch_bands.join(clean.select("doc_id"), "doc_id", "left_semi"),
        band_table,
        n_buckets=n_buckets,
    )
    return clean


def run_dedup_gated_ingest(
    spark: SparkSession,
    in_dir: str,
    corpus_dir: str,
    checkpoint_dir: str,
    schema,
    band_table: str = "corpus_band_index",
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
    """

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
