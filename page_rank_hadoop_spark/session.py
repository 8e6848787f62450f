"""SparkSession factory with scale-aware defaults.

Local testing runs on ``local[$SPARK_GRAFT_CPUS]`` (single JVM); the same
settings are what we would ship to a 1000-executor cluster, with the two
local-only knobs (master, driver memory) overridden by the cluster
submitter. AQE is on so shuffles re-plan at runtime (partition coalescing,
skew-join splitting) — at 100 TB that is the difference between a static
200-partition guess and right-sized stages.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "page_rank_hadoop_spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) the engine SparkSession.

    Deterministic-comparison settings (UTC session timezone, ANSI off) are
    pinned so results hash-match the DuckDB oracles; performance settings
    (AQE, Arrow, partition sizing) are the ones we want at scale.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    n_shuffle = shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(n_shuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.debug.maxToStringFields", "200")
        # 10MB (Spark's default) measured better than 64MB here: the dedup
        # self-joins' shingle/band tables fall under a bigger threshold and
        # the driver-side hashed-relation build is slower + GC-noisier than
        # the sort-merge join it replaces. Dimension tables stay broadcast.
        .config("spark.sql.autoBroadcastJoinThreshold", "10MB")
        # ANSI mode off: we want permissive casts identical to the lenient
        # semantics the oracles assume (no runtime errors on edge values).
        .config("spark.sql.ansi.enabled", "false")
        # Round 11 (guide §3.1): let the planner pick shuffled-hash join
        # when its build side fits, and let AQE rewrite sort-merge→SHJ at
        # runtime when every post-shuffle partition is under the local-map
        # threshold. A/B over the shuffle-join-heavy queries (alternating,
        # same session, 4 rounds): q_ngram_jaccard_prefix 4.23→3.44s,
        # q_market_basket 2.44→1.66s, q_repeated_chunks 1.55→1.08s,
        # q_containment_pairs 1.84→1.50s, q_waiting_suppliers 2.41→2.09s,
        # no regressions (worst wash: +0.07s min on band_index_compacted
        # with a better median). Both paths are SIZE-GUARDED — the planner
        # only builds a local hash map it estimates to fit, and the AQE
        # rewrite checks real partition bytes — so the OOM risk SMJ
        # protects against stays bounded; at cluster scale tune the
        # threshold (or restore SMJ) via the env knobs.
        .config(
            "spark.sql.join.preferSortMergeJoin",
            os.environ.get("SPARK_GRAFT_PREFER_SMJ", "false"),
        )
        .config(
            "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold",
            os.environ.get("SPARK_GRAFT_SHJ_THRESHOLD", "64MB"),
        )
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
