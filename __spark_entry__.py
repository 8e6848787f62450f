"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship search-engine query (tokenize →
inverted index → PageRank → TF-IDF scoring, the reference's full
capability in one plan) at sf0.001. ``queries()``/``oracle_sql()`` expose
the full declared inventory from SURVEY.md §2.3, implemented in
``page_rank_hadoop_spark/`` and mirrored by DuckDB oracles in
``page_rank_hadoop_spark/plans/registry.py``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from page_rank_hadoop_spark.plans import registry

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Full reference capability end-to-end: corpus → graph → 10-iteration
    PageRank → TF-IDF × PageRank scoring for a term set → ranked results
    (reference Q3, /root/reference/src/main/scala/Query.scala:83-90).
    """
    return registry.q_tfidf_score(spark, SF0001).limit(50)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return registry.build_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query key (q_approx_distinct is omitted:
    HLL sketch output is approximate by design → rows-only check)."""
    return registry.build_oracles()
