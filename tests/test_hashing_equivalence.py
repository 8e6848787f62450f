"""functions/hashing.py holds the per-doc ARRAY-form reference
implementations of the signature math that operators/dedup.py inlines as
exploded aggregations (the fast, map-side-combined form). These tests pin
the two formulations to identical outputs — an in-repo independent check
of the dedup hash pipelines, beyond the DuckDB oracles."""

from pyspark.sql import functions as F

from page_rank_hadoop_spark.functions.hashing import (
    MINHASH_PRIME,
    hamming64,
    lsh_bands,
    md5_hash,
    minhash_signature,
    simhash64,
)
from page_rank_hadoop_spark.functions.text import char_shingles, tokens
from page_rank_hadoop_spark.operators import dedup

TEXTS = [
    (1, "the quick brown fox jumps over the lazy dog again and again"),
    (2, "spark query engines scale when shuffles stay on short keys"),
    (3, "tiny"),
]


def test_minhash_array_form_matches_exploded_agg(spark):
    d = spark.createDataFrame(TEXTS, ["doc_id", "text"])
    # array form (functions/hashing.py)
    arr = d.select(
        "doc_id",
        minhash_signature(F.array_distinct(char_shingles("text", 8)), 12).alias("sig"),
    )
    array_sigs = {r["doc_id"]: list(r["sig"]) for r in arr.collect()}
    # exploded-agg form exactly as minhash_lsh_pairs builds it
    sh = d.select("doc_id", F.explode(F.array_distinct(char_shingles("text", 8))).alias("s"))
    m = F.md5("s")
    ab = sh.select(
        "doc_id",
        F.conv(F.substring(m, 1, 8), 16, 10).cast("long").alias("a"),
        F.conv(F.substring(m, 9, 8), 16, 10).cast("long").alias("b"),
    )
    mh = ab.groupBy("doc_id").agg(
        *[F.min((F.col("a") + i * F.col("b")) % MINHASH_PRIME).alias(f"h{i}") for i in range(12)]
    )
    agg_sigs = {r["doc_id"]: [r[f"h{i}"] for i in range(12)] for r in mh.collect()}
    assert array_sigs == agg_sigs


def test_lsh_bands_match_operator_band_keys(spark):
    d = spark.createDataFrame(TEXTS, ["doc_id", "text"])
    sig = d.select(
        "doc_id",
        minhash_signature(F.array_distinct(char_shingles("text", 8)), 12).alias("sig"),
    )
    banded = sig.select("doc_id", F.explode(lsh_bands(F.col("sig"), 4, 3)).alias("b")).select(
        "doc_id", F.col("b.band").alias("band"), F.col("b.key").alias("key")
    )
    fn_keys = {(r["doc_id"], r["band"]): r["key"] for r in banded.collect()}
    # identical docs must produce identical band keys through BOTH paths:
    # run the full operator on a duplicate pair and check it pairs them
    dup = spark.createDataFrame(
        [(10, TEXTS[0][1]), (11, TEXTS[0][1])], ["doc_id", "text"]
    )
    pairs = dedup.minhash_lsh_pairs(dup).collect()
    assert {(r["doc_a"], r["doc_b"], r["n_bands_shared"]) for r in pairs} == {(10, 11, 4)}
    assert len(fn_keys) == 12  # 3 docs × 4 bands


def test_simhash_array_form_matches_exploded_agg(spark):
    d = spark.createDataFrame(TEXTS, ["doc_id", "text"])
    arr = {
        r["doc_id"]: r["sh"]
        for r in d.select("doc_id", simhash64(tokens("text")).alias("sh")).collect()
    }
    agg = {r["doc_id"]: r["simhash"] for r in dedup.simhash_signatures(d).collect()}
    assert arr == agg


def test_hamming64_and_salted_md5(spark):
    row = (
        spark.range(1)
        .select(
            hamming64(F.lit(0b1011).cast("long"), F.lit(0b0110).cast("long")).alias("h"),
            md5_hash(F.lit("x"), salt=3).alias("m3"),
            md5_hash(F.lit("x")).alias("m"),
        )
        .collect()[0]
    )
    assert row["h"] == 3  # 0b1011 ^ 0b0110 = 0b1101
    assert row["m3"] != row["m"] and len(row["m3"]) == 32
