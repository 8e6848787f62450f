"""Inverted-index semantics on the FIXTURES.md §B2 fixture."""

from pyspark.sql import functions as F

from page_rank_hadoop_spark.operators import index


def _fixture(spark):
    return spark.createDataFrame(
        [
            (1, "spark makes pagerank easy"),
            (2, "pagerank ranks pages pagerank"),
        ],
        ["doc_id", "text"],
    )


def test_postings(spark):
    inv = index.inverted_index(_fixture(spark))
    row = inv.filter(F.col("term") == "pagerank").collect()[0]
    assert row["df"] == 2
    postings = [(p["doc_id"], p["tf"], list(p["positions"])) for p in row["postings"]]
    assert postings == [(1, 1, [2]), (2, 2, [0, 3])]


def test_token_offsets_golden(spark):
    """Char offsets are 1-based positions of token starts, robust to
    punctuation/digit separators and a leading token at position 1."""
    d = spark.createDataFrame([(1, "Spark 2.0, spark!  SPARK")], ["doc_id", "text"])
    occ = index.token_stream_with_offsets(d).collect()
    got = sorted((r["term"], r["off"]) for r in occ)
    assert got == [("spark", 1), ("spark", 12), ("spark", 20)]


def test_postings_with_offsets(spark):
    out = index.postings_with_offsets(_fixture(spark), ["pagerank"]).collect()
    rows = {r["doc_id"]: (r["tf"], r["offsets_json"]) for r in out}
    # doc 1: "spark makes pagerank easy" -> offset 13
    # doc 2: "pagerank ranks pages pagerank" -> offsets 1, 22
    assert rows == {1: (1, "[13]"), 2: (2, "[1,22]")}


def test_bm25_semantics(spark):
    """BM25 invariants: rarer terms outscore common ones at equal tf; tf
    growth raises the score with saturation (bounded by idf*(k1+1))."""
    d = spark.createDataFrame(
        [
            (1, "rare common common filler words here"),
            (2, "common filler other words again now"),
            (3, "common rare rare rare filler pad pad"),
        ],
        ["doc_id", "text"],
    )
    rows = {
        (r["term"], r["doc_id"]): r["bm25"]
        for r in index.bm25_scores(d, ["rare", "common"]).collect()
    }
    # same doc 1: 'rare' (df=2) beats 'common' (df=3) despite lower tf? no —
    # compare at equal tf: doc1 has tf(rare)=1; doc2 tf(common)=1 and both
    # docs have similar length, so idf dominates:
    assert rows[("rare", 1)] > rows[("common", 2)]
    # tf saturation: tf=3 scores higher than tf=1 for the same term
    assert rows[("rare", 3)] > rows[("rare", 1)]
    # all scores positive and bounded by idf*(k1+1)
    assert all(v > 0 for v in rows.values())


def test_df_cutoff(spark):
    inv = index.inverted_index(_fixture(spark), cutoff=2)
    terms = {r["term"] for r in inv.collect()}
    assert "pagerank" not in terms  # df=2 not < 2
    assert "spark" in terms


def test_df_from_tf_matches_document_frequencies(docs):
    tf = index.term_frequencies(docs)
    a = {(r["term"], r["df"]) for r in index.df_from_tf(tf, cutoff=10**9).collect()}
    b = {(r["term"], r["df"]) for r in index.document_frequencies(docs, cutoff=10**9).collect()}
    assert a == b


def test_snippet_window(spark):
    docs = spark.createDataFrame(
        [(1, "x" * 40 + "needle" + "y" * 40), (2, "no hit here")], ["doc_id", "text"]
    )
    out = {r["doc_id"]: r["snippet"] for r in index.snippet_window(docs, "needle").collect()}
    assert list(out) == [1]
    assert "needle" in out[1]
    assert len(out[1]) == 50


def test_tfidf_scoring_order(spark):
    docs = _fixture(spark)
    ranks = spark.createDataFrame([(1, 0.5), (2, 0.9)], ["doc_id", "pr"])
    scored = index.tfidf_scores(docs, ranks, ["pagerank"], cutoff=10**9)
    rows = scored.collect()
    # df=2, N=2 → ln(1)=0 → score = 0.5·pr: doc 2 first
    assert [r["doc_id"] for r in rows] == [2, 1]
    assert rows[0]["score"] == 0.45


def test_merge_df_incremental_equals_rebuild(spark, docs):
    """Incremental dictionary maintenance (round 7): merging disjoint
    slices' df counts equals the from-scratch df over the union; a term
    present in only one side passes through; overlap sums."""
    from pyspark.sql import functions as F

    from page_rank_hadoop_spark.operators import index as idx

    old = idx.document_frequencies(docs.filter(F.col("doc_id") % 10 != 0), cutoff=10**9)
    batch = idx.document_frequencies(docs.filter(F.col("doc_id") % 10 == 0), cutoff=10**9)
    merged = {r["term"]: r["df"] for r in idx.merge_df(old, batch).collect()}
    full = {
        r["term"]: r["df"]
        for r in idx.document_frequencies(docs, cutoff=10**9).collect()
    }
    assert merged == full

    # hand case: one-sided terms pass through, shared terms sum
    a = spark.createDataFrame([("x", 3), ("y", 1)], ["term", "df"])
    b = spark.createDataFrame([("y", 2), ("z", 5)], ["term", "df"])
    got = {r["term"]: r["df"] for r in idx.merge_df(a, b).collect()}
    assert got == {"x": 3, "y": 3, "z": 5}
