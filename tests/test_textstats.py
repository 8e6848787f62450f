"""Text-analysis functions: language-ID, quality, fingerprint, shingles."""

from pyspark.sql import functions as F

from page_rank_hadoop_spark.functions.text import (
    char_shingles,
    fingerprint,
    language_id,
    quality_score,
    token_count,
    word_shingles,
)
from page_rank_hadoop_spark.operators import textstats


def test_language_id_markers(spark):
    df = spark.createDataFrame(
        [
            (1, "the cat and the dog of the house"),
            (2, "der hund und die katze ist hier"),
            (3, "le chat et la maison est grande"),
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r["pred"] for r in df.select("doc_id", language_id("text").alias("pred")).collect()}
    assert out == {1: "en", 2: "de", 3: "fr"}


def test_language_id_tie_breaks_lexicographic(spark):
    df = spark.createDataFrame([(1, "xyz qqq")], ["doc_id", "text"])
    out = df.select(language_id("text").alias("pred")).collect()[0]["pred"]
    assert out == "de"  # all scores 0 → first lang alphabetically


def test_quality_score_bounds(docs):
    vals = [r["q"] for r in docs.select(quality_score("text", "n_chars").alias("q")).collect()]
    assert all(0.0 <= v <= 1.0 for v in vals)


def test_token_count_and_fingerprint(spark):
    df = spark.createDataFrame([(1, "Hello world HELLO")], ["doc_id", "text"])
    row = df.select(
        token_count("text").alias("n"), fingerprint("text").alias("fp")
    ).collect()[0]
    assert row["n"] == 3
    assert len(row["fp"]) == 16
    # case-normalized: same fingerprint as the lower-cased text
    row2 = spark.createDataFrame([(1, "hello world hello")], ["i", "text"]).select(
        fingerprint("text").alias("fp")
    ).collect()[0]
    assert row["fp"] == row2["fp"]


def test_shingle_edge_cases(spark):
    df = spark.createDataFrame([(1, "abc")], ["doc_id", "text"])  # shorter than k
    ch = df.select(char_shingles("text", 8).alias("s")).collect()[0]["s"]
    assert ch == ["abc"]
    ws = df.select(word_shingles("text", 3).alias("s")).collect()[0]["s"]
    assert ws == ["abc"]


def test_rollup_counts(docs):
    out = textstats.rollup_stats(docs).collect()
    total = [r for r in out if r["lang"] is None and r["source"] is None]
    assert total[0]["n_docs"] == docs.count()
    per_lang = {r["lang"]: r["n_docs"] for r in out if r["lang"] and r["source"] is None}
    assert sum(per_lang.values()) == docs.count()


def test_winnowing_overlap_guarantee(spark):
    """Schleimer/Wilkerson/Aiken guarantee: two docs sharing a token run
    of >= w + k - 1 (= 7) tokens share >= 1 fingerprint; disjoint-vocab
    docs share none."""
    from page_rank_hadoop_spark.operators.textstats import winnow_fingerprint_table

    shared = "alpha bravo charlie delta echo foxtrot golf"  # 7 tokens
    d = spark.createDataFrame(
        [
            (1, f"one two {shared} three four"),
            (2, f"nine ten {shared} eleven twelve"),
            (3, "unrelated words entirely different vocabulary here now"),
        ],
        ["doc_id", "text"],
    )
    fps = winnow_fingerprint_table(d).collect()
    by_doc = {}
    for r in fps:
        by_doc.setdefault(r["doc_id"], set()).add(r["fp"])
    assert by_doc[1] & by_doc[2]  # overlap detected
    assert not (by_doc[1] & by_doc[3]) and not (by_doc[2] & by_doc[3])


def test_bpe_pair_stats_hand_checked(spark):
    from page_rank_hadoop_spark.operators.textstats import bpe_pair_stats

    df = spark.createDataFrame(
        [(1, "abab ab x cd"), (2, "ab")],
        ["doc_id", "text"],
    )
    # words: abab, ab, x, cd, ab → pairs: ab,ba,ab | ab | (x dropped) | cd | ab
    rows = bpe_pair_stats(df, top_k=10).collect()
    assert [(r["pair"], r["n"]) for r in rows] == [("ab", 4), ("ba", 1), ("cd", 1)]


def test_approx_topk_terms_exact_below_capacity(spark):
    """Below sketch capacity nothing is evicted, so the frequent-items
    result must equal the exact top-k (the property the oracle gate
    relies on); the k boundary honors exact counts."""
    from pyspark.sql import functions as F

    from page_rank_hadoop_spark.functions.text import tokens
    from page_rank_hadoop_spark.operators.textstats import approx_topk_terms

    d = spark.createDataFrame(
        [(i, "alpha " * 5 + "beta " * 3 + "gamma " * 2 + "delta") for i in range(4)],
        ["doc_id", "text"],
    )
    got = {(r["term"], r["cnt"]) for r in approx_topk_terms(d, k=3, max_items=64).collect()}
    exact = (
        d.select(F.explode(tokens("text")).alias("term"))
        .groupBy("term")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), "term")
        .limit(3)
        .collect()
    )
    assert got == {(r["term"], r["cnt"]) for r in exact}
    assert got == {("alpha", 20), ("beta", 12), ("gamma", 8)}


def test_lang_confusion_shares_sum_to_one(spark):
    from page_rank_hadoop_spark.operators.textstats import lang_id_confusion

    d = spark.createDataFrame(
        [(1, "en", "the and of hello"), (2, "en", "xyz qqq zzz"),
         (3, "fr", "le la et bonjour")],
        ["doc_id", "lang", "text"],
    )
    rows = lang_id_confusion(d).collect()
    by_lang = {}
    for r in rows:
        by_lang.setdefault(r["lang"], 0.0)
        by_lang[r["lang"]] += r["share"]
    for lang, total in by_lang.items():
        assert abs(total - 1.0) < 1e-6, lang
    en_correct = [r for r in rows if r["lang"] == "en" and r["lang_pred"] == "en"]
    assert en_correct and en_correct[0]["n"] >= 1
