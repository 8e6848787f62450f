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


def run_dedup_gated_ingest(
    spark: SparkSession,
    in_dir: str,
    corpus_dir: str,
    checkpoint_dir: str,
    schema,
) -> None:
    """NEAR-dup-gated continuous ingestion: every micro-batch is probed
    against the ACCUMULATED corpus with the asymmetric MinHash gate
    (``dedup.incremental_minhash_dedup``) and only non-colliding docs
    append — the streaming composition of the batch ingest gate, via
    ``foreachBatch`` (the documented escape hatch for per-batch
    batch-DataFrame logic a streaming plan can't express: the probe
    joins against the sink itself).

    Scale shape per batch: batch-side shingling/banding only; the
    corpus side re-derives its band table from the sink here — at
    production scale that side IS the maintained band-index MV
    (``minhash_band_table`` written bucketed by (band, key) and appended
    alongside the corpus, so the probe is a bucket join with no corpus
    rescan). Exactly-once: foreachBatch + checkpoint gives at-least-once
    batch delivery; the gate itself makes replayed batches idempotent
    (a replayed doc collides with its first copy and is dropped) —
    noted because that property, not the sink, is what bounds duplicate
    damage here.
    """
    from pyspark.errors import AnalysisException

    from page_rank_hadoop_spark.operators import dedup as _dedup

    def gate(batch_df: DataFrame, batch_id: int) -> None:
        batch_df = batch_df.localCheckpoint()
        if not batch_df.take(1):
            return
        sess = batch_df.sparkSession
        # FS-agnostic corpus probe: read through Spark (works on HDFS/S3,
        # not just the driver's local disk); an explicit schema makes a
        # missing path raise instead of failing schema inference
        try:
            corpus = sess.read.schema("doc_id long, text string").parquet(corpus_dir)
            if not corpus.take(1):
                corpus = None
        except AnalysisException:
            corpus = None
        if corpus is None:
            # first batch: self-dedup only (keep-first within the batch)
            corpus = sess.createDataFrame([], "doc_id long, text string")
        flagged = _dedup.incremental_minhash_dedup(
            corpus, batch_df.select("doc_id", "text")
        )
        # materialize the (batch-sized) survivors BEFORE appending, so the
        # corpus scan never overlaps the write to the same path
        clean = batch_df.join(
            flagged.select("doc_id"), "doc_id", "left_anti"
        ).localCheckpoint()
        clean.write.mode("append").parquet(corpus_dir)

    stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(in_dir)
    q = (
        stream.writeStream.foreachBatch(gate)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
