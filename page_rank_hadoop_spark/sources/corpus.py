"""Reference corpus-format reader (wiki-like line-oriented dumps).

The reference parses one document per line with ``<title>X</title>``
markup, ``[[link]]`` outlinks and a ``<text ...>...</text>`` body
(regexes at /root/reference/src/main/scala/pageRank.scala:136-137 and
invertedIndex.scala:42-43). Here the same extraction is a pure columnar
projection — ``regexp_extract`` / ``regexp_extract_all`` run inside
whole-stage codegen, and the null-title guard (pageRank.scala:140-151)
is an ordinary filter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TITLE_RE = r"<title>(.*?)</title>"
LINK_RE = r"\[\[(.*?)\]\]"
TEXT_RE = r"<text[^>]*>(.*?)</text>"


def parse_corpus_lines(lines: DataFrame, line_col: str = "line") -> DataFrame:
    """``line`` → ``(title, links array<string>, text)``.

    Mirrors the reference's ExtractInfoMapper (pageRank.scala:136-151):
    extract title, extract+trim every ``[[...]]`` outlink, keep the body.
    Lines without a title are dropped (the reference logs and skips them).
    """
    col = F.col(line_col)
    parsed = lines.select(
        F.nullif(F.regexp_extract(col, TITLE_RE, 1), F.lit("")).alias("title"),
        F.transform(
            F.regexp_extract_all(col, F.lit(LINK_RE), F.lit(1)),
            lambda s: F.trim(s),
        ).alias("links"),
        F.regexp_extract(col, TEXT_RE, 1).alias("text"),
    )
    return parsed.filter(F.col("title").isNotNull())


def read_corpus(spark: SparkSession, paths: str | list[str]) -> DataFrame:
    """Line-oriented text scan (reference S1, TextFileSource) → parsed docs."""
    return parse_corpus_lines(spark.read.text(paths), line_col="value")
