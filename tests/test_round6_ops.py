"""Round-6 operators: IVF recall measurement (ivf_recall), the Zipf
vocabulary diagnostic (zipf_slope), and the declared band-index
compaction lifecycle query's plan shape.
"""

import pytest
from pyspark.sql import functions as F

from page_rank_hadoop_spark.operators import similarity, textstats
from page_rank_hadoop_spark.sources.catalog import load_table

SF0001 = "/root/testdata/sf0.001"
DIM = 64


@pytest.fixture(scope="module")
def emb(spark):
    return load_table(spark, SF0001, "embeddings")


def test_ivf_recall_bounds_and_self_hit(spark, emb):
    out = similarity.ivf_recall(emb, k=10, n_probes=8, n_centroids=16, dim=DIM)
    rows = {r["probe_id"]: r for r in out.collect()}
    assert sorted(rows) == list(range(8))
    for r in rows.values():
        # a probe always retrieves itself on both sides → ≥ 1 hit
        assert 1 <= r["n_hit"] <= 10
        assert r["recall"] == round(r["n_hit"] / 10, 6)


def test_ivf_recall_degenerates_to_exact_with_one_bucket(spark, emb):
    """C=1 puts every vector in the probe's bucket — approx == exact,
    recall exactly 1.0 for every probe (the ivf_knn n_probe=C analog)."""
    out = similarity.ivf_recall(emb, k=5, n_probes=6, n_centroids=1, dim=DIM)
    assert [r["recall"] for r in out.collect()] == [1.0] * 6


def test_ivf_recall_plan_shape(spark, emb):
    """Exact side: broadcast nested-loop over the tiny probe table (the
    corpus never shuffles for the cross product); both top-k filters
    compile to WindowGroupLimit; no CartesianProduct anywhere."""
    df = similarity.ivf_recall(emb, k=10, n_probes=8, n_centroids=16, dim=DIM)
    plan = spark._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "BroadcastNestedLoopJoin" in plan
    assert "WindowGroupLimit" in plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan


def test_zipf_slope_exact_two_term_corpus(spark):
    """a×4 + b×2 over two docs: ranks (1, 2), x = (0, ln 2),
    y = (ln 4, ln 2) → slope = (ln2 − ln4)/ln2 = −1 exactly."""
    docs = spark.createDataFrame(
        [(1, "aa aa bb"), (2, "aa aa bb")], ["doc_id", "text"]
    )
    row = textstats.zipf_slope(docs).collect()[0]
    assert row["n_terms"] == 2
    assert row["slope"] == pytest.approx(-1.0, abs=1e-5)
    # intercept = mean(y) − slope·mean(x) = ln 4 + ... ≈ ln 4
    assert row["intercept"] == pytest.approx(1.386294, abs=1e-4)


def test_zipf_slope_on_testdata_is_negative(spark):
    docs = load_table(spark, SF0001, "documents")
    row = textstats.zipf_slope(docs).collect()[0]
    assert row["n_terms"] > 10
    assert row["slope"] < 0


def test_band_index_compacted_query_matches_one_shot(spark):
    """Declared-query twin sanity at sf0.001: build(evens) + append(odds)
    + rename-swap compact must equal one-shot shingling of the corpus."""
    from page_rank_hadoop_spark.operators import dedup
    from page_rank_hadoop_spark.plans.registry import q_band_index_compacted

    got = sorted(
        tuple(r) for r in q_band_index_compacted(spark, SF0001).collect()
    )
    docs = load_table(spark, SF0001, "documents").select("doc_id", "text")
    want = sorted(tuple(r) for r in dedup.minhash_band_table(docs).collect())
    assert got == want


def test_split_leakage_counts_match_md5_arithmetic(spark):
    """Known pairs + split recomputed in-test via the same md5 bucket
    arithmetic → exact group counts."""
    import hashlib

    from page_rank_hadoop_spark.operators import pipeline

    ids = list(range(1, 41))

    def split(i):
        return "train" if int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) % 100 < 80 else "val"

    pairs = [(a, a + 20) for a in ids[:20]]
    pdf = spark.createDataFrame(pairs, ["doc_a", "doc_b"])
    got = {
        (r["split_a"], r["split_b"]): r["n_pairs"]
        for r in pipeline.split_leakage(pdf, train_pct=80).collect()
    }
    want = {}
    for a, b in pairs:
        k = (split(a), split(b))
        want[k] = want.get(k, 0) + 1
    assert got == want
    assert sum(got.values()) == 20


def test_unigram_logprob_exact_tiny_corpus(spark):
    import math

    docs = spark.createDataFrame(
        [(1, "aa aa bb"), (2, "aa")], ["doc_id", "text"]
    )
    rows = {r["doc_id"]: r for r in textstats.unigram_logprob(docs).collect()}
    # vocab: aa=3, bb=1, total=4
    lp_aa, lp_bb = round(math.log(3 / 4), 6), round(math.log(1 / 4), 6)
    assert rows[1]["n_tokens"] == 3
    assert rows[1]["avg_logprob"] == pytest.approx(
        round((2 * lp_aa + lp_bb) / 3, 6), abs=1e-6
    )
    assert rows[2]["n_tokens"] == 1
    assert rows[2]["avg_logprob"] == pytest.approx(lp_aa, abs=1e-6)


def test_ivf_balance_shares_sum_to_one(spark, emb):
    out = similarity.ivf_balance(emb, n_centroids=16, dim=DIM).collect()
    n = emb.count()
    assert sum(r["n_vecs"] for r in out) == n
    assert sum(r["share"] for r in out) == pytest.approx(1.0, abs=1e-3)
    one = similarity.ivf_balance(emb, n_centroids=1, dim=DIM).collect()
    assert len(one) == 1 and one[0]["share"] == 1.0 and one[0]["n_vecs"] == n


def test_containment_pairs_subset_doc(spark):
    """A doc wholly contained in a longer one: containment(A→B)=1.0 while
    Jaccard is low — the case the operator exists for."""
    from page_rank_hadoop_spark.operators import dedup

    inner = "alpha beta gamma delta epsilon zeta"
    # filler must be alphabetic — the tokenizer regex drops digits
    outer = inner + " " + " ".join(
        f"fill{chr(97 + i)} pad{chr(97 + i)} bulk{chr(97 + i)}" for i in range(26)
    )
    docs = spark.createDataFrame(
        [(1, inner), (2, outer), (3, "totally unrelated text here")],
        ["doc_id", "text"],
    )
    rows = dedup.containment_pairs(docs, n=3, min_containment=0.9).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["doc_a"], r["doc_b"]) == (1, 2)
    assert r["cont_a_in_b"] == 1.0  # all of A's shingles inside B
    assert r["cont_b_in_a"] < 0.1  # but B is mostly NOT in A


def test_containment_pairs_symmetric_on_identical(spark):
    from page_rank_hadoop_spark.operators import dedup

    t = "one two three four five six seven"
    docs = spark.createDataFrame([(1, t), (2, t)], ["doc_id", "text"])
    r = dedup.containment_pairs(docs, n=3, min_containment=0.9).collect()[0]
    assert r["cont_a_in_b"] == 1.0 and r["cont_b_in_a"] == 1.0


def test_pq_report_covers_all_vectors_and_codes_in_range(spark, emb):
    out = similarity.pq_quantization_report(emb, m=8, n_codes=16, dim=DIM).collect()
    n = emb.count()
    by_sub = {}
    for r in out:
        assert 0 <= r["subspace"] < 8 and 0 <= r["code"] < 16
        assert r["avg_sq_err"] >= 0
        by_sub[r["subspace"]] = by_sub.get(r["subspace"], 0) + r["n_vecs"]
    # every subspace partitions the full corpus
    assert by_sub == {s: n for s in range(8)}


def test_pq_report_matches_numpy_argmin(spark, emb):
    """Spark's per-subspace assignment equals a NumPy recomputation —
    pins the subvector slicing, codebook layout, and argmin tie rule."""
    import numpy as np

    books = similarity.pq_codebook(m=8, n_codes=16, subdim=8)
    vecs = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64) for r in emb.collect()}
    want = {}
    for s in range(8):
        codes = np.array([cv for _, cv in books[s]])
        for v in vecs.values():
            sub = v[s * 8:(s + 1) * 8]
            d = ((sub - codes) ** 2).sum(axis=1)
            k = int(d.argmin())
            key = (s, k)
            want[key] = want.get(key, 0) + 1
    got = {
        (r["subspace"], r["code"]): r["n_vecs"]
        for r in similarity.pq_quantization_report(emb, m=8, n_codes=16, dim=DIM).collect()
    }
    assert got == want


def test_embedding_dim_profile_exact_tiny(spark):
    import statistics

    data = [(1, [1.0, 10.0]), (2, [3.0, 20.0]), (3, [5.0, 60.0])]
    df = spark.createDataFrame(data, ["vec_id", "embedding"])
    rows = {r["d"]: r for r in similarity.embedding_dim_profile(df, dim=2).collect()}
    assert rows[1]["n_vecs"] == 3 and rows[1]["mean"] == 3.0
    assert rows[1]["min_x"] == 1.0 and rows[1]["max_x"] == 5.0
    assert rows[2]["std"] == pytest.approx(
        round(statistics.stdev([10.0, 20.0, 60.0]), 6), abs=1e-6
    )


def test_bigram_logprob_tiny_exact(spark):
    """Hand-computed add-0.5 bigram logprob on a 2-doc corpus: pins the
    count tables, smoothing formula, and the micro-unit floor mean."""
    import math

    docs = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b c")], ["doc_id", "text"]
    )
    rows = {r["doc_id"]: r for r in textstats.bigram_logprob(docs).collect()}
    # bigrams: d1 = (a,b),(b,a),(a,b); d2 = (a,b),(b,c)
    # c2: (a,b)=3, (b,a)=1, (b,c)=1; c1: a=3, b=2; V=3
    v = 3
    lp = {
        ("a", "b"): math.log((3 + 0.5) / (3 + 0.5 * v)),
        ("b", "a"): math.log((1 + 0.5) / (2 + 0.5 * v)),
        ("b", "c"): math.log((1 + 0.5) / (2 + 0.5 * v)),
    }
    lpm = {k: round(x * 1e6) for k, x in lp.items()}
    d1 = math.floor((lpm[("a", "b")] * 2 + lpm[("b", "a")]) / 3) / 1e6
    d2 = math.floor((lpm[("a", "b")] + lpm[("b", "c")]) / 2) / 1e6
    assert rows[1]["n_bigrams"] == 3 and rows[1]["avg_logprob"] == d1
    assert rows[2]["n_bigrams"] == 2 and rows[2]["avg_logprob"] == d2


def test_bigram_logprob_short_docs_drop(spark):
    """Docs with <2 tokens produce no bigram rows (inner semantics)."""
    docs = spark.createDataFrame(
        [(1, "single"), (2, ""), (3, "two tokens")], ["doc_id", "text"]
    )
    out = textstats.bigram_logprob(docs).collect()
    assert [r["doc_id"] for r in out] == [3]


def test_lsh_verified_pairs_drops_false_positives(spark):
    """A pair of near-identical docs survives the edit-distance verify;
    candidates whose texts differ wholesale are dropped even when LSH
    banding proposes them (min_edit_sim gate)."""
    from page_rank_hadoop_spark.operators import dedup

    base = "the quick brown fox jumps over the lazy dog " * 8
    near = base.replace("lazy", "hazy")
    docs = spark.createDataFrame(
        [(1, base), (2, near), (3, base)], ["doc_id", "text"]
    )
    out = dedup.lsh_verified_pairs(docs, min_edit_sim=0.9, verify_prefix=500)
    got = {(r["doc_a"], r["doc_b"]): r["edit_sim"] for r in out.collect()}
    assert (1, 3) in got and got[(1, 3)] == 1.0
    # near pair differs by 1 char per repeat within the 500-char prefix
    if (1, 2) in got:
        assert 0.9 <= got[(1, 2)] < 1.0


def test_lsh_verified_pairs_verify_prefix_caps_cost(spark):
    """edit_sim is computed on the prefix only: two docs identical in the
    first verify_prefix chars score 1.0 even if their tails diverge."""
    from page_rank_hadoop_spark.operators import dedup

    head = "shared prefix text that is long enough to shingle " * 4
    docs = spark.createDataFrame(
        [(1, head + "tail one"), (2, head + "completely different ending")],
        ["doc_id", "text"],
    )
    out = dedup.lsh_verified_pairs(
        docs, min_edit_sim=0.5, verify_prefix=len(head)
    ).collect()
    assert len(out) == 1 and out[0]["edit_sim"] == 1.0


def test_blocklist_matches_counts_and_lengths(spark):
    """Mixed 2-/3-gram blocklist on a hand corpus: overlapping starts
    count separately, token-normalization matches across punctuation,
    and clean docs emit nothing."""
    docs = spark.createDataFrame(
        [
            (1, "bad word here bad word again"),
            (2, "Bad, WORD! (case and punctuation differ)"),
            (3, "totally clean text"),
            (4, "very bad word chain"),
        ],
        ["doc_id", "text"],
    )
    out = textstats.blocklist_matches(
        docs, ["bad word", "very bad word", "no such phrase"]
    )
    got = {(r["doc_id"], r["phrase"]): r["n_matches"] for r in out.collect()}
    assert got == {
        (1, "bad word"): 2,
        (2, "bad word"): 1,
        (4, "bad word"): 1,
        (4, "very bad word"): 1,
    }


def test_blocklist_matches_overlapping_starts(spark):
    """'a a a a' contains 'a a' at three start positions."""
    docs = spark.createDataFrame([(1, "a a a a")], ["doc_id", "text"])
    out = textstats.blocklist_matches(docs, ["a a"]).collect()
    assert len(out) == 1 and out[0]["n_matches"] == 3


def test_quality_funnel_hand_corpus(spark):
    """Each gate drops exactly the doc built to fail it; stage n_in
    chains from the previous stage's n_out."""
    import string

    # distinct ALPHABETIC words (the token regex is [a-zA-Z]+ — digits
    # would collapse "w0".."w29" into thirty copies of "w")
    long_ok = " ".join(f"w{a}{b}" for a in string.ascii_lowercase[:6]
                       for b in string.ascii_lowercase[:5])  # 30 distinct
    short = "too short"                                      # fails length
    repetitive = " ".join(["spam"] * 40)                     # fails ttr+share
    dup_of_ok = long_ok + " tail that differs after prefix"  # same 30-char prefix
    docs = spark.createDataFrame(
        [(1, long_ok), (2, short), (3, repetitive), (4, dup_of_ok)],
        ["doc_id", "text"],
    )
    rows = {r["stage"]: r for r in textstats.quality_funnel(docs).collect()}
    assert rows["00_all"]["n_out"] == 4
    assert rows["01_length"]["n_out"] == 3          # drops doc 2
    assert rows["02_repetition"]["n_out"] == 2      # drops doc 3
    assert rows["03_dedup_prefix"]["n_out"] == 1    # doc 4 loses to doc 1
    assert rows["02_repetition"]["n_in"] == 3
    assert rows["03_dedup_prefix"]["n_in"] == 2


def test_quality_funnel_zero_token_doc_fails_length(spark):
    docs = spark.createDataFrame(
        [(1, "!!! ... ???"), (2, " ".join(f"w{i}" for i in range(25)))],
        ["doc_id", "text"],
    )
    rows = {r["stage"]: r["n_out"] for r in textstats.quality_funnel(docs).collect()}
    assert rows["00_all"] == 2 and rows["01_length"] == 1


def test_ngram_novelty_hand_corpus(spark):
    """Doc sharing every 8-gram with another scores 0; a fully unique
    doc scores 1; short docs emit no row."""
    shared = " ".join(f"s{c}" for c in "abcdefghij")    # 10 tokens
    unique = " ".join(f"u{c}" for c in "abcdefghij")
    docs = spark.createDataFrame(
        [(1, shared), (2, shared), (3, unique), (4, "too short")],
        ["doc_id", "text"],
    )
    rows = {r["doc_id"]: r for r in textstats.ngram_novelty(docs, n=8).collect()}
    assert set(rows) == {1, 2, 3}
    assert rows[1]["novelty"] == 0.0 and rows[2]["novelty"] == 0.0
    assert rows[3]["novelty"] == 1.0 and rows[3]["n_grams"] == 3


def test_ngram_novelty_distinct_grams_counted_once(spark):
    """A doc repeating its own 8-gram internally still counts it once
    (per-doc distinct), and self-repetition does not destroy novelty."""
    block = " ".join(f"x{c}" for c in "abcdefgh")       # exactly 8 tokens
    docs = spark.createDataFrame([(1, block + " " + block)], ["doc_id", "text"])
    r = textstats.ngram_novelty(docs, n=8).collect()[0]
    # 16 tokens -> 9 start positions, but duplicates collapse
    assert r["n_grams"] == 8 and r["novelty"] == 1.0


def test_source_overlap_hand_corpus(spark):
    """Two sources sharing one doc's text overlap on exactly its grams;
    a disjoint third source pairs with nobody."""
    shared = " ".join(f"s{c}" for c in "abcdefghij")    # 10 toks -> 3 grams
    other = " ".join(f"o{c}" for c in "abcdefghij")
    docs = spark.createDataFrame(
        [
            (1, "sa", shared),
            (2, "sb", shared + " " + other),
            (3, "sc", " ".join(f"z{c}" for c in "abcdefghij")),
        ],
        ["doc_id", "source", "text"],
    )
    out = textstats.source_overlap(docs, n=8).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["source_a"], r["source_b"]) == ("sa", "sb")
    assert r["n_shared"] == 3                      # shared's 3 grams
    assert r["share_a"] == 1.0                     # all of sa's grams
    assert r["share_b"] == round(3 / 13, 6)        # 20-token doc -> 13 grams


def test_mrl_fidelity_full_width_is_exact(spark, emb):
    """Truncating to the FULL dim must show zero error; narrower widths
    degrade monotonically on average."""
    out = {r["trunc_dim"]: r for r in
           similarity.mrl_fidelity(emb, trunc_dims=(16, DIM)).collect()}
    assert out[DIM]["mean_abs_err"] == 0.0 and out[DIM]["max_abs_err"] == 0.0
    assert out[16]["mean_abs_err"] >= 0.0
    n = emb.count()
    n_probes = sum(1 for r in emb.select("vec_id").collect() if r[0] % 37 == 0)
    assert out[16]["n_pairs"] == n_probes * (n - 1)


def test_mrl_fidelity_narrower_is_worse(spark, emb):
    out = {r["trunc_dim"]: r["mean_abs_err"] for r in
           similarity.mrl_fidelity(emb, trunc_dims=(8, 32)).collect()}
    assert out[8] >= out[32]


def test_vocab_growth_hand_corpus(spark):
    """Four docs with known first occurrences: the curve is exact and
    cumulative, and frac=1.0 covers the whole corpus."""
    docs = spark.createDataFrame(
        [
            (0, "aa bb"),          # vocab {aa, bb}
            (1, "aa cc"),          # + cc
            (2, "aa bb cc"),       # + nothing
            (3, "dd"),             # + dd
        ],
        ["doc_id", "text"],
    )
    rows = {r["frac"]: r for r in
            textstats.vocab_growth(docs, fractions=(0.5, 1.0)).collect()}
    # 0.5-quantile of {0,1,2,3} = 1.5 -> prefix {0, 1}
    assert rows[0.5]["n_docs"] == 2 and rows[0.5]["n_tokens"] == 4
    assert rows[0.5]["vocab_size"] == 3
    assert rows[1.0]["n_docs"] == 4 and rows[1.0]["n_tokens"] == 8
    assert rows[1.0]["vocab_size"] == 4


def test_vocab_growth_monotone_on_testdata(spark):
    docs = load_table(spark, SF0001, "documents")
    out = sorted(textstats.vocab_growth(docs).collect(), key=lambda r: r["frac"])
    for a, b in zip(out, out[1:]):
        assert a["n_docs"] <= b["n_docs"]
        assert a["n_tokens"] <= b["n_tokens"]
        assert a["vocab_size"] <= b["vocab_size"]


def test_degree_assortativity_star_graph_is_negative(spark):
    """A hub-and-spoke graph (hub -> every leaf, every leaf -> hub) must
    be disassortative (high-outdeg hub feeds indeg-1 leaves and
    vice versa)."""
    from page_rank_hadoop_spark.operators import graph

    edges = [(0, i) for i in range(1, 11)] + [(i, 0) for i in range(1, 11)]
    e = spark.createDataFrame(edges, ["src", "dst"])
    r = graph.degree_assortativity(e).collect()[0]
    assert r["n_edges"] == 20
    assert r["assortativity"] < 0


def test_degree_assortativity_regular_graph_undefined_variance(spark):
    """A directed cycle has constant degrees -> zero variance -> NULL
    correlation (0/0), not a crash and not a fake 0."""
    from page_rank_hadoop_spark.operators import graph

    n = 6
    e = spark.createDataFrame([(i, (i + 1) % n) for i in range(n)], ["src", "dst"])
    r = graph.degree_assortativity(e).collect()[0]
    assert r["n_edges"] == n and r["assortativity"] is None


def test_rrf_fusion_scores_and_topk(spark):
    """RRF on the test corpus: 5 rows per query term, scores within the
    theoretical bounds (both-lists max 2/61, one-list min 1/70), and a
    doc ranked #1 by BOTH rankers must fuse to exactly 2/61."""
    from page_rank_hadoop_spark.plans.registry import build_queries

    out = build_queries()["q_rrf_fusion"](spark, SF0001).collect()
    by_term = {}
    for r in out:
        by_term.setdefault(r["term"], []).append(r["rrf_score"])
        assert round(1 / 70, 6) <= r["rrf_score"] <= round(2 / 61, 6)
    for term, scores in by_term.items():
        assert len(scores) == 5
        assert scores == sorted(scores, reverse=True)


def test_vocab_drift_identical_halves_is_zero(spark):
    """Same distribution in both halves -> all divergences exactly 0."""
    t = "alpha beta gamma alpha"
    docs = spark.createDataFrame([(i, t) for i in range(4)], ["doc_id", "text"])
    r = textstats.vocab_drift(docs).collect()[0]
    assert r["kl_first_second"] == 0.0
    assert r["kl_second_first"] == 0.0
    assert r["js_divergence"] == 0.0
    assert r["n_terms"] == 3


def test_vocab_drift_disjoint_halves_positive_and_bounded(spark):
    """Disjoint vocabularies: all divergences positive; JS ≤ ln 2."""
    import math

    docs = spark.createDataFrame(
        [(0, "aa bb cc"), (1, "aa bb cc"), (2, "xx yy zz"), (3, "xx yy zz")],
        ["doc_id", "text"],
    )
    r = textstats.vocab_drift(docs).collect()[0]
    assert r["kl_first_second"] > 0 and r["kl_second_first"] > 0
    assert 0 < r["js_divergence"] <= round(math.log(2), 6)


def test_media_near_dup_exact_dup_at_zero(spark):
    """Byte-identical payloads land at distance exactly 0; unrelated
    payloads in different cells never pair."""
    from page_rank_hadoop_spark.multimodal.binary_ops import (
        media_from_documents,
        media_near_dup,
    )

    t = "identical payload bytes for both media rows here"
    docs = spark.createDataFrame(
        # doc_ids 0 and 3 share media_type 'image' (id % 3)
        [(0, t), (3, t), (6, "zz" * 200)],
        ["doc_id", "text"],
    )
    media = media_from_documents(docs)
    out = media_near_dup(media, grid=200, max_l2=0.002).collect()
    got = {(r["media_id_a"], r["media_id_b"]): r["l2"] for r in out}
    assert got == {(0, 3): 0.0}


def test_media_near_dup_blocking_key_prunes(spark):
    """Same type but far-apart features (>1 grid cell apart — 'a' vs 'z'
    payloads put f1 ~0.0127 apart, >2 cells at grid=200) are never even
    candidates. The guarantee after the round-6 boundary fix is
    cells-differ-by-more-than-one → pruned (adjacent cells ARE candidates
    now, by design)."""
    from page_rank_hadoop_spark.multimodal.binary_ops import (
        media_from_documents,
        media_near_dup,
    )

    docs = spark.createDataFrame(
        [(0, "aaaa " * 20), (3, "zzzz " * 20)], ["doc_id", "text"]
    )
    media = media_from_documents(docs)
    assert media_near_dup(media, grid=200, max_l2=10.0).count() == 0


def test_media_near_dup_finds_cell_boundary_straddlers(spark):
    """The round-6 ADVICE recall fix pinned: payloads 'b' (f1=0.3843,
    cell 76) and 'c' (f1=0.3882, cell 77) are a true near-dup at
    l2=0.0039 that STRADDLES a grid-cell boundary — the pre-fix
    home-cell-only blocking silently missed exactly this class. The
    3×3 neighborhood probe must surface it (and exactly once: one
    offset combination matches, so no duplicate pair either)."""
    from page_rank_hadoop_spark.multimodal.binary_ops import (
        media_from_documents,
        media_near_dup,
    )

    docs = spark.createDataFrame([(0, "b"), (3, "c")], ["doc_id", "text"])
    media = media_from_documents(docs)
    rows = media_near_dup(media, grid=200, max_l2=0.004).collect()
    assert len(rows) == 1
    assert (rows[0]["media_id_a"], rows[0]["media_id_b"]) == (0, 3)
    assert abs(rows[0]["l2"] - 0.0039) < 1e-9


def test_ewma_smoothing_hand_sequence(spark):
    """Three events for one user: EWMA with alpha=0.5 normalizes by the
    weights present, so the first row equals its own value."""
    import datetime as dt

    rows = [
        (1, 1, dt.datetime(2026, 1, 1, 0, 0, 0), 10.0),
        (1, 2, dt.datetime(2026, 1, 1, 0, 1, 0), 20.0),
        (1, 3, dt.datetime(2026, 1, 1, 0, 2, 0), 30.0),
    ]
    from page_rank_hadoop_spark.operators import windows as W

    df = spark.createDataFrame(rows, ["user_id", "event_id", "ts", "value"])
    got = {r["event_id"]: r["ewma"] for r in W.ewma_smoothing(df).collect()}
    assert got[1] == 10.0
    assert got[2] == round((20.0 + 0.5 * 10.0) / 1.5, 6)
    assert got[3] == round((30.0 + 0.5 * 20.0 + 0.25 * 10.0) / 1.75, 6)


def test_similarity_histogram_bins(spark):
    """Hand pairs at known Jaccard levels land in the right deciles;
    identical docs hit bin 10 (jaccard exactly 1.0)."""
    from page_rank_hadoop_spark.operators import dedup

    a = "one two three four five six"
    docs = spark.createDataFrame(
        [(1, a), (2, a), (3, "one two three nine ten eleven")],
        ["doc_id", "text"],
    )
    rows = {r["bin"]: r for r in
            dedup.similarity_histogram(docs, n=3, min_jaccard=0.1).collect()}
    assert rows[10]["n_pairs"] == 1            # (1,2) identical
    assert rows[10]["min_jaccard"] == 1.0
    # (1,3)/(2,3): shingles {one two three, two three nine, ...} share 1
    # of 4+4-1=7 -> j = 1/7 ≈ 0.142857 -> bin 1
    assert rows[1]["n_pairs"] == 2
    assert rows[1]["min_jaccard"] == round(1 / 7, 6)


def test_lsh_precision_consistency(spark):
    """Precision table internally consistent, and n_verified sums to the
    verified-pairs count for the same corpus and thresholds."""
    from page_rank_hadoop_spark.operators import dedup

    docs = load_table(spark, SF0001, "documents").select("doc_id", "text")
    prec = dedup.lsh_precision(docs, min_edit_sim=0.4).collect()
    assert prec
    for r in prec:
        assert 1 <= r["n_bands_shared"] <= 4
        assert 0 <= r["n_verified"] <= r["n_candidates"]
        assert r["precision"] == round(r["n_verified"] / r["n_candidates"], 6)
    total_verified = sum(r["n_verified"] for r in prec)
    assert total_verified == dedup.lsh_verified_pairs(docs, min_edit_sim=0.4).count()


def test_edge_reciprocity_hand_graph(spark):
    """2 mutual + 1 one-way edge: reciprocity = 2/3 exactly."""
    from page_rank_hadoop_spark.operators import graph

    e = spark.createDataFrame(
        [(1, 2), (2, 1), (3, 4)], ["src", "dst"]
    )
    r = graph.edge_reciprocity(e).collect()[0]
    assert (r["n_edges"], r["n_reciprocal"]) == (3, 2)
    assert r["reciprocity"] == round(2 / 3, 6)


def test_bpe_compression_consistency(spark):
    """Per-source rollup sums to the per-doc encode stats; ratios are
    exact quotients; pieces never exceed chars."""
    from page_rank_hadoop_spark.operators import textstats as T

    docs = load_table(spark, SF0001, "documents")
    per_doc = {r["doc_id"]: r for r in T.bpe_encode_stats(docs).collect()}
    out = T.bpe_compression_by_source(docs).collect()
    assert sum(r["n_words"] for r in out) == sum(
        r["n_words"] for r in per_doc.values()
    )
    for r in out:
        assert r["n_pieces"] <= r["n_chars"]
        assert r["pieces_per_word"] == round(r["n_pieces"] / r["n_words"], 6)


def test_winsorize_report_tiny_exact(spark):
    """Ten values per dim: p01/p99 interpolated bounds leave exactly the
    extremes outside; clip counts and rate are exact."""
    vals = [float(v) for v in range(1, 11)]            # 1..10
    df = spark.createDataFrame(
        [(i, [v]) for i, v in enumerate(vals)], ["vec_id", "embedding"]
    )
    r = similarity.winsorize_report(df, p_lo=0.1, p_hi=0.9).collect()[0]
    # percentile(0.1) of 1..10 = 1.9; percentile(0.9) = 9.1
    assert r["lo"] == 1.9 and r["hi"] == 9.1
    assert r["n_below"] == 1 and r["n_above"] == 1    # 1.0 and 10.0
    assert r["clip_rate"] == 0.2


def test_winsorize_report_testdata_shape(spark, emb):
    rows = similarity.winsorize_report(emb).collect()
    assert len(rows) == DIM
    for r in rows:
        assert r["lo"] <= r["hi"]
        assert 0 <= r["clip_rate"] <= 0.05            # p01/p99 → ~2%


def test_label_typicality_identical_cluster(spark):
    """A label whose vectors are all identical scores cosine exactly 1.0
    for every member; ranks tie-break by vec_id ascending."""
    v = [1.0, 2.0, 3.0, 4.0]
    df = spark.createDataFrame(
        [(1, "a", v), (2, "a", v), (3, "a", v), (4, "b", [4.0, 3.0, 2.0, 1.0])],
        ["vec_id", "label", "embedding"],
    )
    rows = similarity.label_typicality(df, k=2).collect()
    got = {(r["label"], r["rnk"]): (r["vec_id"], r["cos_sim"]) for r in rows}
    assert got[("a", 1)] == (1, 1.0) and got[("a", 2)] == (2, 1.0)
    assert got[("b", 1)] == (4, 1.0)


def test_label_typicality_testdata_topk_shape(spark, emb):
    out = similarity.label_typicality(emb, k=3).collect()
    by_label = {}
    for r in out:
        by_label.setdefault(r["label"], []).append(r)
    for rows in by_label.values():
        assert len(rows) == 3
        sims = [r["cos_sim"] for r in sorted(rows, key=lambda r: r["rnk"])]
        assert sims == sorted(sims, reverse=True)


def test_doc_keywords_prefers_rare_terms(spark):
    """A term unique to one doc outranks a corpus-wide common term with
    equal tf; ubiquitous terms score ln(1) = 0."""
    from page_rank_hadoop_spark.operators import index as idx

    docs = spark.createDataFrame(
        [
            (1, "common rare common"),
            (2, "common other common"),
        ],
        ["doc_id", "text"],
    )
    rows = {(r["doc_id"], r["rnk"]): r for r in idx.doc_keywords(docs, k=2).collect()}
    import math
    assert rows[(1, 1)]["term"] == "rare"
    assert rows[(1, 1)]["score"] == round(math.log(2), 6)
    assert rows[(1, 2)]["term"] == "common"
    assert rows[(1, 2)]["score"] == 0.0   # df == N -> ln(1) == 0


def test_ivf_index_build_probe_append_lifecycle(spark, emb, tmp_path):
    """Persisted-index probe equals inline IVF; the probe's centroid
    filter is a PARTITION filter (directory pruning, plan-pinned); an
    appended batch becomes visible to subsequent probes."""
    import pyspark.sql.functions as F

    d = str(tmp_path / "ivf_idx")
    n_buckets = similarity.write_ivf_index(emb, d, n_centroids=16, dim=DIM)
    assert 1 <= n_buckets <= 16

    probe_vec = emb.filter(F.col("vec_id") == 0).collect()[0]["embedding"]
    probe_vec = [float(x) for x in probe_vec]
    served = similarity.probe_ivf_index(
        spark, d, probe_vec, k=10, n_probe=1, n_centroids=16, dim=DIM
    )
    inline = similarity.ivf_knn_cosine(
        emb, probe_vec, k=10, n_centroids=16, dim=DIM, n_probe=1
    )
    assert [tuple(r) for r in served.collect()] == [tuple(r) for r in inline.collect()]

    plan = spark._jvm.PythonSQLUtils.explainString(
        served._jdf.queryExecution(), "formatted"
    )
    assert "PartitionFilters" in plan and "centroid" in plan

    # append a synthetic near-duplicate of the probe: must rank #1
    batch = spark.createDataFrame(
        [(999_999, [float(x) for x in probe_vec])], ["vec_id", "embedding"]
    )
    similarity.append_ivf_index(batch, d, n_centroids=16, dim=DIM)
    after = similarity.probe_ivf_index(
        spark, d, probe_vec, k=2, n_probe=1, n_centroids=16, dim=DIM
    ).collect()
    assert {r["vec_id"] for r in after} == {0, 999_999}
    assert all(r["cos_sim"] == 1.0 for r in after)


def test_ivf_index_compaction(spark, emb, tmp_path):
    """Appends fragment bucket dirs (one file per touched bucket per
    batch); compact_ivf_index rewrites to ONE file per bucket via the
    rename-based swap (no staging/__old residue) and probe results are
    bit-identical before and after."""
    import glob
    import os

    import pyspark.sql.functions as F

    d = str(tmp_path / "ivf_idx")
    similarity.write_ivf_index(emb, d, n_centroids=16, dim=DIM)
    for b in range(3):
        batch = emb.filter(F.col("vec_id") % 7 == b).withColumn(
            "vec_id", F.col("vec_id") + 100_000 * (b + 1)
        )
        similarity.append_ivf_index(batch, d, n_centroids=16, dim=DIM)

    def files_per_bucket():
        return {
            os.path.basename(bd): len(glob.glob(os.path.join(bd, "*.parquet")))
            for bd in glob.glob(os.path.join(d, "centroid=*"))
        }

    frag = files_per_bucket()
    assert max(frag.values()) > 1  # appends fragmented at least one bucket

    probe_vec = [float(x) for x in emb.filter(F.col("vec_id") == 0).collect()[0]["embedding"]]
    before = [
        tuple(r)
        for r in similarity.probe_ivf_index(
            spark, d, probe_vec, k=10, n_probe=2, n_centroids=16, dim=DIM
        ).collect()
    ]

    reported = similarity.compact_ivf_index(spark, d)
    assert reported == max(frag.values())
    assert set(files_per_bucket().values()) == {1}
    assert not os.path.exists(d + "__staging") and not os.path.exists(d + "__old")

    after = [
        tuple(r)
        for r in similarity.probe_ivf_index(
            spark, d, probe_vec, k=10, n_probe=2, n_centroids=16, dim=DIM
        ).collect()
    ]
    assert after == before
