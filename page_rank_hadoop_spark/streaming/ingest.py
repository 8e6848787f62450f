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
