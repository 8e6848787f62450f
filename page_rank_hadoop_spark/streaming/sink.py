"""foreachBatch incremental sink: stream → keyed parquet upsert.

The production pattern for landing a stream into an analytical table
without a lakehouse format: every microbatch runs the same batch MERGE
(`operators/pipeline.merge_upsert`) against the target directory —
last-writer-wins per key, exactly the semantics `cli.py`'s batch path
uses, so the streaming and batch write paths share one implementation.

Scale notes: foreachBatch hands the microbatch to arbitrary batch code
with exactly-once guarantees conditioned on an idempotent write — here
the write is a full keyed overwrite per batch, which is correct and
idempotent but rewrites the table each batch; at 100 TB the overwrite
becomes a partition-scoped (`replaceWhere`-style) or Delta/Iceberg MERGE
(see sources/connectors.py capability gates) while THIS orchestration —
watermark upstream, merge_upsert per batch — stays unchanged.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def stream_upsert_to_parquet(
    stream: DataFrame,
    spark: SparkSession,
    target_dir: str,
    key: str,
    checkpoint_dir: str,
):
    """Start a foreachBatch query that merges each microbatch into the
    keyed parquet table at ``target_dir`` (creating it on first batch).
    Returns the StreamingQuery; caller drives/stops it."""
    from page_rank_hadoop_spark.operators.pipeline import merge_upsert

    def upsert_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        updates = batch_df.dropDuplicates([key])  # last-writer within batch
        if os.path.isdir(target_dir) and any(
            f.endswith(".parquet") for f in os.listdir(target_dir)
        ):
            base = spark.read.parquet(target_dir)
            merged = merge_upsert(base, updates, key=key)
        else:
            merged = updates
        # materialize before overwrite: the plan reads target_dir
        merged.localCheckpoint(eager=True).write.mode("overwrite").parquet(target_dir)

    return (
        stream.writeStream.foreachBatch(upsert_batch)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
