from page_rank_hadoop_spark.sources.catalog import TABLES, load_table, register_views
from page_rank_hadoop_spark.sources.corpus import parse_corpus_lines, read_corpus

__all__ = ["TABLES", "load_table", "register_views", "parse_corpus_lines", "read_corpus"]
