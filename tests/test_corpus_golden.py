"""Golden worked-example tests from the reference README (FIXTURES.md §B).

The reference documents the expected graph for a 4-page corpus
(/root/reference/README.md:169-222): link `3` is rejected because page 3
does not exist, and the virtual NULL node is wired per pageRank.scala's
3-case adjacency rule (:259-273).
"""

from pyspark.sql import functions as F

from page_rank_hadoop_spark.operators import graph
from page_rank_hadoop_spark.sources.corpus import parse_corpus_lines

CORPUS = [
    "<title>1</title> [[2]] [[4]]",
    "<title>2</title> [[1]] [[3]]",
    "<title>4</title>",
]


def _parsed(spark):
    return parse_corpus_lines(spark.createDataFrame([(line,) for line in CORPUS], ["line"]))


def test_parse_titles_and_links(spark):
    rows = {r["title"]: r["links"] for r in _parsed(spark).collect()}
    assert rows == {"1": ["2", "4"], "2": ["1", "3"], "4": []}


def test_null_title_line_dropped(spark):
    df = parse_corpus_lines(
        spark.createDataFrame([("no markup here [[x]]",), (CORPUS[0],)], ["line"])
    )
    assert df.count() == 1


def test_golden_graph_build(spark):
    """README.md:219-222 expected adjacency: 1→[2,4,NULL]… with link 3
    rejected and NULL kept only for the dangling page 4."""
    parsed = _parsed(spark)
    edges = parsed.select(
        F.col("title").alias("src"), F.explode("links").alias("dst")
    )
    verts = parsed.select(F.col("title").alias("id")).distinct()

    rejected = graph.rejected_edges(edges, verts)
    assert [(r["src"], r["dst"]) for r in rejected.collect()] == [("2", "3")]

    kept = graph.resolve_edges(edges, verts)
    adj = graph.adjacency(kept, verts, null_vid="NULL")
    got = {r["id"]: sorted(r["links"]) for r in adj.collect()}
    assert got == {
        "1": ["2", "4"],          # NULL stripped: real out-links exist
        "2": ["1"],               # link 3 rejected, NULL stripped
        "4": ["NULL"],            # dangling: NULL is the sole out-link
        "NULL": ["1", "2", "4"],  # virtual node links every page
    }
