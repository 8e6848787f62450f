"""Structured Streaming surface: event replay with watermarked windows.

The reference is batch-only (SURVEY.md §2.2); this is the extension
surface. The streaming aggregation mirrors the batch
``operators/windows.tumbling_window_counts`` contract so the batch oracle
validates the same logic the stream runs: read the events table as a
file-source stream, apply a watermark for late data, aggregate per
tumbling window × event_type.

At scale this is the same plan Spark runs on a Kafka source — the
file-source replay is the local test vehicle (``format("memory")`` +
``processAllAvailable`` drives it to completion synchronously).
"""

from __future__ import annotations

import glob
import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

NANOS_CONF = "spark.sql.legacy.parquet.nanosAsLong"


def streaming_tumbling_counts(stream: DataFrame, minutes: int = 15, watermark: str = "30 minutes") -> DataFrame:
    """Watermarked tumbling-window aggregation over a streaming events
    DataFrame with (ts timestamp, event_type, value). Same output contract
    as the batch ``tumbling_window_counts`` (window_start string key)."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", f"{minutes} minutes").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 6).alias("sum_value"))
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def streaming_dedup(
    stream: DataFrame, keys: list[str] | None = None, watermark: str = "30 minutes"
) -> DataFrame:
    """Streaming exactly-once-per-key dedup: drop any event whose key was
    already seen within the watermark horizon
    (``dropDuplicatesWithinWatermark``, Spark 3.5+). The state store keeps
    one entry per key only until the watermark passes it, so state size
    is bounded by the horizon — the production answer to at-least-once
    sources (Kafka redelivery, replayed checkpoints), where a global
    ``dropDuplicates`` would grow state forever."""
    keys = keys or ["event_id"]
    return stream.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(keys)


def run_replay_to_memory(
    spark: SparkSession, sf_dir: str, minutes: int = 15, query_name: str = "replay_out"
) -> DataFrame:
    """Replay ``events.parquet`` through the streaming aggregation to
    completion (complete mode → memory sink); returns the batch result.

    ts arrives however the parquet writer annotated it (long nanos under
    the legacy conf, TIMESTAMP_NTZ, or plain timestamp); ``normalize_ts``
    converts to a microsecond LTZ timestamp before the watermark,
    identically to the batch catalog reader.
    """
    from page_rank_hadoop_spark.sources.catalog import normalize_ts

    tmp = tempfile.mkdtemp(prefix="events_replay_")
    for f in glob.glob(os.path.join(sf_dir, "events.parquet")):
        shutil.copy(f, tmp)

    prev = spark.conf.get(NANOS_CONF, None)
    spark.conf.set(NANOS_CONF, "true")
    try:
        raw_schema = spark.read.parquet(tmp).schema
        stream = normalize_ts(spark.readStream.schema(raw_schema).parquet(tmp))
        agg = streaming_tumbling_counts(stream, minutes)
        q = (
            agg.writeStream.outputMode("complete")
            .format("memory")
            .queryName(query_name)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        return spark.table(query_name)
    finally:
        if prev is None:
            spark.conf.unset(NANOS_CONF)
        else:
            spark.conf.set(NANOS_CONF, prev)
        shutil.rmtree(tmp, ignore_errors=True)
