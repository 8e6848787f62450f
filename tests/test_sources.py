"""Source/sink parity: the reference's text sink (S3, tab-separated final
output, pageRank.scala:380) and Pig-style schema-on-read load (S6) as a
CSV roundtrip, plus corpus-format reading already covered by the golden
corpus test."""

from pyspark.sql import functions as F
from pyspark.sql import types as T


def test_tsv_sink_roundtrip(spark, tmp_path):
    path = str(tmp_path / "ranks_tsv")
    ranks = spark.createDataFrame(
        [("pageA", 0.35), ("pageB", 0.251), ("pageC", 0.1)], ["title", "pr"]
    )
    # reference S3: TextFileSink writes "title\tpr" lines
    ranks.orderBy(F.desc("pr"), "title").write.option("sep", "\t").csv(path)

    # reference S6: Pig load with declared schema-on-read
    schema = T.StructType(
        [T.StructField("title", T.StringType()), T.StructField("pr", T.DoubleType())]
    )
    back = spark.read.schema(schema).option("sep", "\t").csv(path)
    assert {tuple(r) for r in back.collect()} == {tuple(r) for r in ranks.collect()}


def test_csv_scan_pushdown(spark, tmp_path):
    path = str(tmp_path / "kv_csv")
    spark.range(100).select(
        F.col("id"), (F.col("id") * 2).alias("v")
    ).write.option("header", True).csv(path)
    df = spark.read.option("header", True).schema("id long, v long").csv(path)
    got = df.filter(F.col("id") == 42).collect()
    assert len(got) == 1 and got[0]["v"] == 84
