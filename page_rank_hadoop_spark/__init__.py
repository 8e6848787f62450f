"""PySpark-native analytics engine with the capabilities of the reference
mini search engine (d2207197/page-rank-hadoop): corpus ingestion,
tokenization, positional inverted indexing, TF-IDF, iterative PageRank,
top-k serving and snippet extraction — re-expressed on Catalyst-optimized
DataFrames — plus the large-scale training-data-pipeline extension surface
(dedup, similarity search, text analysis, event windows, streaming).

Everything here is DataFrame/SQL-first: the logical plan is declared with
the PySpark DataFrame API and Catalyst/Tungsten pick the physical strategy.
Python-side loops exist only for genuinely iterative algorithms (PageRank)
with explicit persist/checkpoint hygiene.
"""

from page_rank_hadoop_spark.session import get_spark

__all__ = ["get_spark"]
