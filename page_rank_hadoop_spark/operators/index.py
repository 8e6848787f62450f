"""Positional inverted index + TF-IDF serving, DataFrame-native.

Reference pipeline (/root/reference/src/main/scala/invertedIndex.scala):
mapper emits one record per token occurrence with byte offsets (P3, :47-53),
a combiner merges same-(term,doc) postings map-side (A5, :68-76), the
reducer collects the posting list per term, computes df, and drops terms
with df ≥ 3000 (A6, :89-96). Query-time scoring joins postings with
PageRank: ``0.5·tf·ln(N/df) + 0.5·pr`` (Query.scala:52, 89).

Spark-first mapping:
- token stream  = ``posexplode(tokens(text))`` — one shuffle-free projection
- tf            = groupBy(term, doc).count() — Catalyst generates the
  partial/final HashAggregate pair automatically (the combiner for free)
- postings/df   = one more agg by term; HAVING df < cutoff
- positions     = ``collect_list(pos)`` token indexes for the compact
  index; byte-faithful char offsets via ``token_stream_with_offsets`` /
  ``postings_with_offsets`` (the reference's (lineOffset, textOffset))

At scale the only shuffles are the two aggregations, both map-side
combined; the index output should be written partitioned/sorted by term so
point lookups (Q1) become row-group prunes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from page_rank_hadoop_spark.functions.text import tokens

DF_CUTOFF = 3000  # reference stop-word/skew guard, invertedIndex.scala:93


def token_stream(documents: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """One row per token occurrence: (doc_id, pos, term). Reference P3."""
    return documents.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(tokens(text_col)).alias("pos", "term"),
    )


def token_stream_with_offsets(
    documents: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """One row per token occurrence with its 1-based CHAR OFFSET in the
    text: (doc_id, term, off) — the reference-faithful posting position.

    The reference stores a (lineOffset, textOffset) pair per occurrence
    (Writables.scala:24-44, consumed for snippet seeks at
    Query.scala:97-101). The documents table is a single text field with
    no line structure, so the char offset is the faithful analog (a
    line-oriented source would add a cumulative-newline-count column the
    same way). Offsets are computed JVM-side, no Python: a token start is
    any position i where text[i] is a letter and text[i-1] is not, and
    [a-zA-Z]+ runs are in bijection with such positions, so
    ``arrays_zip(tokens, starts)`` aligns exactly.
    """
    from page_rank_hadoop_spark.sources.catalog import ensure_parallel

    # lower(text) MUST be its own projected column: referenced inside the
    # filter lambda it would re-lowercase the whole string once per
    # character position — O(n²) per doc (subexpression elimination does
    # not cross HOF lambda scopes; see functions/text.gram_hashes_of).
    base = ensure_parallel(documents).select(
        F.col(id_col).alias("doc_id"),
        tokens(text_col).alias("toks"),
        F.lower(F.col(text_col)).alias("lo"),
    )
    lo = F.col("lo")

    def is_alpha(pos):
        c = F.ascii(lo.substr(pos, F.lit(1)))
        return (c >= 97) & (c <= 122)

    starts = F.filter(
        F.sequence(F.lit(1), F.length(lo)),
        lambda i: is_alpha(i) & ((i == 1) | ~is_alpha(i - 1)),
    )
    return (
        base.select(
            "doc_id",
            F.explode(F.arrays_zip(F.col("toks").alias("term"), starts.alias("off"))).alias("z"),
        )
        .select("doc_id", F.col("z.term").alias("term"), F.col("z.off").alias("off"))
    )


def postings_with_offsets(documents: DataFrame, terms: list[str]) -> DataFrame:
    """(term, doc_id) → tf + sorted char-offset array (JSON-serialized for
    the oracle hash) for the given term set — the byte-faithful posting
    payload the reference serves from HBase (S5/Q2)."""
    occ = token_stream_with_offsets(documents).filter(F.col("term").isin(terms))
    return occ.groupBy("term", "doc_id").agg(
        F.count("*").cast("int").alias("tf"),
        F.to_json(F.sort_array(F.collect_list("off"))).alias("offsets_json"),
    )


def term_frequencies(documents: DataFrame) -> DataFrame:
    """(term, doc_id) → tf + position list. Reference A5 (combiner merge).

    ``collect_list(pos)`` arrives sorted because positions are generated
    in order within a single input row, but we ``sort_array`` anyway:
    at scale a doc's tokens can split across combiner batches.
    """
    from page_rank_hadoop_spark.sources.catalog import ensure_parallel

    return (
        token_stream(ensure_parallel(documents))
        .groupBy("term", "doc_id")
        .agg(
            F.count("*").cast("int").alias("tf"),
            F.sort_array(F.collect_list("pos")).alias("positions"),
        )
    )


def document_frequencies(documents: DataFrame, cutoff: int = DF_CUTOFF) -> DataFrame:
    """term → df with the reference's HAVING df < cutoff (A6)."""
    return (
        token_stream(documents)
        .groupBy("term")
        .agg(F.countDistinct("doc_id").cast("int").alias("df"))
        .filter(F.col("df") < cutoff)
    )


def merge_df(stored: DataFrame, batch: DataFrame) -> DataFrame:
    """Incremental inverted-index maintenance (round 7): merge a new
    batch's (term, df) counts into the stored dictionary — full outer
    join, per-side null → 0, sum. For DISJOINT doc sets (the ingest
    contract: a batch is new documents) the merge is EXACTLY the
    from-scratch df over the union corpus, which is what the declared
    oracle checks (q_index_delta_merge); the reference instead rebuilt
    its whole index per run (invertedIndex.scala:101-123 — a full
    MapReduce over the corpus each time). At 100 TB the batch side is
    tiny against the dictionary: cost is one join keyed on term
    (dictionary side bucketable), never a corpus re-scan.

    Same shape maintains any additive MV (term counts, n-gram counts,
    per-source stats); non-additive metrics (countDistinct over
    OVERLAPPING batches) need the band/IVF-index treatment instead."""
    s = stored.select("term", F.col("df").alias("_s"))
    b = batch.select("term", F.col("df").alias("_b"))
    return s.join(b, "term", "full_outer").select(
        "term",
        (F.coalesce("_s", F.lit(0)) + F.coalesce("_b", F.lit(0)))
        .cast("int")
        .alias("df"),
    )


def df_from_tf(tf: DataFrame, cutoff: int = DF_CUTOFF) -> DataFrame:
    """df derived from an existing term-frequency table — one small agg
    instead of re-tokenizing the corpus (tf already has one row per
    (term, doc))."""
    return (
        tf.groupBy("term")
        .agg(F.count("*").cast("int").alias("df"))
        .filter(F.col("df") < cutoff)
    )


def inverted_index(
    documents: DataFrame, cutoff: int = DF_CUTOFF, tf: DataFrame | None = None
) -> DataFrame:
    """term → (df, postings array<struct<doc_id, tf, positions>>).

    Postings are sorted by doc_id (reference SH5 secondary sort delivered
    titles in order; ``sort_array`` on the struct array gives the same
    determinism without a custom shuffle comparator).

    ``tf``: optionally a prebuilt ``term_frequencies`` table (the shared
    MV in plans/registry) so the corpus is tokenized once per session,
    not once per index consumer.
    """
    if tf is None:
        tf = term_frequencies(documents)
    return (
        tf.groupBy("term")
        .agg(
            F.count("*").cast("int").alias("df"),
            F.sort_array(
                F.collect_list(F.struct("doc_id", "tf", "positions"))
            ).alias("postings"),
        )
        .filter(F.col("df") < cutoff)
    )


def tfidf_scores(
    documents: DataFrame,
    ranks: DataFrame,
    query_terms: list[str],
    cutoff: int = DF_CUTOFF,
    w_tfidf: float = 0.5,
    w_pr: float = 0.5,
    tf: DataFrame | None = None,
) -> DataFrame:
    """Reference Q3: for each query term, score every posting's page by
    ``w_tfidf·tf·ln(N/df) + w_pr·pr`` and rank (the reference printed
    postings unsorted, Query.scala:92 — we add the sensible orderBy).

    ``ranks`` must have (doc_id, pr). N = document count (reference read it
    from a Hadoop counter, pageRank.scala:355; here it is a count() action).

    ``tf``: optionally a prebuilt ``term_frequencies`` table — the
    registry passes its shared tf MV so scoring is an isin probe of an
    already-materialized index (the reference likewise served Q3 from
    the HBase-materialized index, not by re-tokenizing the corpus).
    Without it, the corpus is tokenized in-line; the isin filter pushes
    below the tf aggregate either way, so the shuffle carries only the
    query terms' rows.
    """
    n_docs = documents.count()
    if tf is None:
        tf = term_frequencies(documents)
    tf = tf.filter(F.col("term").isin(query_terms))
    # df derived from tf — avoids a second full tokenization pass; both
    # aggs touch only the query terms
    df_ = df_from_tf(tf, cutoff)
    scored = (
        tf.join(df_, "term")
        .join(ranks, "doc_id")
        .select(
            "term",
            "doc_id",
            F.round(
                w_tfidf * F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df"))
                + w_pr * F.col("pr"),
                6,
            ).alias("score"),
        )
    )
    return scored.orderBy(F.desc("score"), "term", "doc_id")


def bm25_scores(
    documents: DataFrame,
    query_terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Okapi BM25 per (term, doc) for the query terms — the standard
    upgrade over the reference's tf·ln(N/df) weighting (Robertson &
    Zaragoza 2009): idf = ln(1 + (N − df + 0.5)/(df + 0.5)), tf saturates
    at k1 and is normalized by doc length vs the corpus average.

    ONE tokenize per corpus scan: a shared base projects the token array
    once and derives BOTH the doc length and the query-term occurrences
    from it (size + filter over the same attribute); n_docs and avgdl
    come from a single scalar aggregate action over that base. Two scans
    total (the stats action, the query), versus four in the naive
    count/avg/tf/lens formulation.
    """
    from page_rank_hadoop_spark.sources.catalog import ensure_parallel

    terms_arr = F.array(*[F.lit(t) for t in query_terms])
    base = ensure_parallel(documents).select(
        "doc_id",
        F.size(tokens("text")).alias("dl"),
        F.filter(tokens("text"), lambda t: F.array_contains(terms_arr, t)).alias("hits"),
    )
    row = base.agg(F.count("*").alias("n"), F.avg("dl").alias("avgdl")).collect()[0]
    n_docs, avgdl = row["n"], row["avgdl"] or 1.0
    tf = (
        base.select("doc_id", "dl", F.explode("hits").alias("term"))
        .groupBy("term", "doc_id", "dl")
        .agg(F.count("*").cast("int").alias("tf"))
    )
    df_ = tf.groupBy("term").agg(F.count("*").cast("int").alias("df"))
    idf = F.log(1.0 + (F.lit(float(n_docs)) - F.col("df") + 0.5) / (F.col("df") + 0.5))
    norm = F.col("tf") * (k1 + 1) / (
        F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.lit(float(avgdl)))
    )
    return (
        tf.join(df_, "term")
        .select("term", "doc_id", F.round(idf * norm, 6).alias("bm25"))
        .orderBy(F.desc("bm25"), "term", "doc_id")
    )


def point_lookup(index: DataFrame, terms: list[str]) -> DataFrame:
    """Serving-style point predicate (reference Q1/Q2 HBase Get): an
    ``isin`` filter Catalyst pushes into the parquet scan (row-group
    pruning when the index is written sorted by term)."""
    return index.filter(F.col("term").isin(terms))


def snippet_window(
    documents: DataFrame, term: str, before: int = 20, width: int = 50
) -> DataFrame:
    """Reference Q4: 50-char window around the first hit of ``term``.

    The reference seeked a local RandomAccessFile by stored byte offset
    (Query.scala:97-101); with the text co-resident in the documents table
    this is ``substring(text, locate(term)-before, width)`` — no I/O beyond
    the column read.
    """
    pos = F.locate(term, F.col("text"))
    return (
        documents.filter(pos > 0)
        .select(
            "doc_id",
            F.substring(F.col("text"), F.greatest(pos - before, F.lit(1)), width).alias("snippet"),
        )
    )


def proximity_matches(
    documents: DataFrame, term_a: str, term_b: str, max_dist: int = 5
) -> DataFrame:
    """Proximity query over the positional index: documents where
    ``term_a`` and ``term_b`` occur within ``max_dist`` token positions
    of each other (the NEAR/k operator phrase search generalizes to),
    with the closest distance and per-term occurrence counts.

    Same plan shape as ``phrase_matches``: term-filtered token stream,
    ONE groupBy(doc) collecting both position arrays, then pure array
    algebra — all pairwise |pa−pb| via nested ``transform`` + ``flatten``
    + ``array_min``. The per-doc cost is tf_a·tf_b (single-digit
    typically); no self-join, one shuffle of a two-term stream.
    """
    occ = token_stream(documents).filter(F.col("term").isin([term_a, term_b]))
    per_doc = (
        occ.groupBy("doc_id")
        .agg(
            F.collect_list(F.when(F.col("term") == term_a, F.col("pos"))).alias("_pa"),
            F.collect_list(F.when(F.col("term") == term_b, F.col("pos"))).alias("_pb"),
        )
        .filter((F.size("_pa") > 0) & (F.size("_pb") > 0))
    )
    dists = F.flatten(
        F.transform("_pa", lambda a: F.transform(F.col("_pb"), lambda b: F.abs(a - b)))
    )
    return (
        per_doc.select(
            "doc_id",
            F.array_min(dists).alias("min_dist"),
            F.size("_pa").alias("tf_a"),
            F.size("_pb").alias("tf_b"),
        )
        .filter(F.col("min_dist") <= max_dist)
        .orderBy("doc_id")
    )


def phrase_matches(documents: DataFrame, phrase: list[str]) -> DataFrame:
    """Exact phrase query over the positional index: documents containing
    the terms of ``phrase`` at consecutive token positions, with the
    phrase frequency and first match position — WHY the reference stores
    positions per posting (Writables.scala:24-44) rather than bare tf.

    Plan shape: one token-stream pass filtered to the phrase's terms
    (tiny fraction of the stream), ONE groupBy(doc) collecting the
    position list per phrase slot, then pure array algebra: a phrase
    start is a position p with p ∈ pos(t0), p+1 ∈ pos(t1), ... — i.e.
    ``array_intersect`` of the slot arrays shifted by their offsets. No
    self-joins, no explode-back; at scale this is a single shuffle on
    doc_id of a term-filtered stream.
    """
    occ = token_stream(documents).filter(F.col("term").isin(phrase))
    slots = [
        F.sort_array(
            F.collect_list(F.when(F.col("term") == t, F.col("pos")))
        ).alias(f"_p{i}")
        for i, t in enumerate(phrase)
    ]
    per_doc = occ.groupBy("doc_id").agg(*slots)

    def shifted(name: str, by: int):
        # NB: the lambda must be unary — F.transform treats a binary
        # lambda as (element, array_index), not a captured default.
        return F.transform(F.col(name), lambda x: x - F.lit(by))

    starts = F.col("_p0")
    for i in range(1, len(phrase)):
        starts = F.array_intersect(starts, shifted(f"_p{i}", i))
    return (
        per_doc.select(
            "doc_id",
            F.size(starts).alias("phrase_tf"),
            F.array_min(starts).alias("first_pos"),
        )
        .filter(F.col("phrase_tf") > 0)
        .orderBy("doc_id")
    )


def doc_keywords(documents: DataFrame, k: int = 3) -> DataFrame:
    """Per-document keyword extraction: the k terms with the highest
    tf·ln(N/df) in each document — the classic summarize/tag/route
    query (and the representation behind cheap topic clustering).
    Output: (doc_id, term, score, rnk), ties broken by term.

    Scale shape: one (doc, term) tf shuffle (map-side combined), one
    df aggregate joined back keyed on term, N rides a collected scalar
    (count-only job), and the per-doc top-k compiles to
    WindowGroupLimit — ≤k rows per doc cross the exchange. Scores are
    6dp-rounded before ranking so both engines order identically.
    """
    from pyspark.sql import Window

    from page_rank_hadoop_spark.sources.catalog import ensure_parallel

    docs = ensure_parallel(documents)
    # N = distinct documents, matching the oracle's count(DISTINCT
    # doc_id) — a plain count() diverges the moment the table carries a
    # duplicate doc_id row (round-6 ADVICE)
    n_docs = float(docs.select("doc_id").distinct().count())
    tf = (
        token_stream(docs)
        .groupBy("doc_id", "term")
        .agg(F.count("*").cast("long").alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(F.count("*").cast("long").alias("df"))
    scored = tf.join(dfreq, "term").select(
        "doc_id",
        "term",
        F.round(F.col("tf") * F.log(F.lit(n_docs) / F.col("df")), 6).alias("score"),
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), "term")
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("doc_id", "term", "score", F.col("rnk").cast("int").alias("rnk"))
    )
