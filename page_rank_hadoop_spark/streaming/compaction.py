"""Rate-limited file-source ingestion + sink small-file compaction.

A streaming file sink accretes one file per (trigger × partition): a
rate-limited stream (``maxFilesPerTrigger``) over a long backlog leaves
thousands of tiny files, and at 100 TB tiny files are a read-side
scale-killer (one scan task each, footer overhead per file, NameNode /
object-store listing pressure). The production loop is therefore:
ingest rate-limited → measure the sink's file-size distribution →
compact when the small-file fraction crosses a threshold. The reference
has no streaming surface at all (batch MR only); this is the
Spark-first extension of its TSV sink family (S3), not a port.

All three steps here are DataFrame-shaped and testable without a
long-running cluster: ``Trigger.AvailableNow`` drains the backlog in
rate-limited micro-batches then stops, and the metrics query is a plain
batch aggregation over ``input_file_name()`` — one scan, one
(file)-keyed partial agg, output rows = number of files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def rate_limited_file_ingest(
    spark: SparkSession,
    src_dir: str,
    dst_dir: str,
    checkpoint_dir: str,
    schema: str,
    max_files_per_trigger: int = 1,
) -> None:
    """Drain a file-source backlog into a parquet sink, at most
    ``max_files_per_trigger`` input files per micro-batch — the
    back-pressure knob that keeps a catch-up run from scheduling the
    whole backlog as one giant batch. ``availableNow`` processes
    everything currently present (honoring the rate limit batch by
    batch) and terminates, so the call is deterministic and testable;
    drop it for a continuously-tailing production ingest."""
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(src_dir)
    )
    q = (
        stream.writeStream.format("parquet")
        .option("path", dst_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def sink_file_metrics(
    spark: SparkSession, path: str, small_file_rows: int = 1000
) -> DataFrame:
    """Per-file row counts of a parquet sink plus the compaction
    decision inputs, from ONE scan: file count, total rows, min/avg/max
    rows per file, and how many files fall under ``small_file_rows``
    (the compact-now signal). ``input_file_name()`` is evaluated
    map-side; the aggregation is (file)-keyed then single-row — output
    is one row regardless of sink size."""
    per_file = (
        spark.read.parquet(path)
        .select(F.input_file_name().alias("file"))
        .groupBy("file")
        .agg(F.count("*").alias("rows"))
    )
    return per_file.agg(
        F.count("*").cast("bigint").alias("n_files"),
        F.sum("rows").cast("bigint").alias("total_rows"),
        F.min("rows").cast("bigint").alias("min_rows"),
        F.round(F.avg("rows"), 2).alias("avg_rows"),
        F.max("rows").cast("bigint").alias("max_rows"),
        F.sum((F.col("rows") < small_file_rows).cast("int"))
        .cast("bigint")
        .alias("n_small_files"),
    )


def compact_sink(
    spark: SparkSession,
    path: str,
    out_path: str,
    target_rows_per_file: int = 100_000,
    total_rows: int | None = None,
) -> int:
    """Rewrite a fragmented sink into ``ceil(total / target)`` files:
    one scan + one round-robin repartition (the only shuffle — it
    carries each row once) + one write. Returns the file count written.
    Compact-to-new-path then swap is the object-store-safe pattern (an
    in-place overwrite that fails mid-write loses the sink).
    ``total_rows`` is a sizing HINT, clamped against an actual count:
    a parquet ``count(*)`` reads only footers (no data pages), so the
    verification is nearly free, and it guards the streaming scenario
    this module targets — a sink appended to between the caller's
    metrics read and the compaction would otherwise be under-partitioned
    relative to ``target_rows_per_file`` (round-4 advisor)."""
    df = spark.read.parquet(path)
    actual = df.count()  # footer-only on parquet — cheap at any size
    total = actual if total_rows is None else max(total_rows, actual)
    n_files = max(1, -(-total // target_rows_per_file))
    df.repartition(n_files).write.mode("overwrite").parquet(out_path)
    return n_files
