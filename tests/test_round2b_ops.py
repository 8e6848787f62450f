"""Late round-2 operators: label propagation, SCD2 as-of reads, the
iterative BPE merge-training loop, and prefix-filtered similarity join."""

import pytest
from pyspark.sql import functions as F

from page_rank_hadoop_spark.operators import dedup, graph, pipeline, textstats


# ---------------------------------------------------------------------------
# label propagation
# ---------------------------------------------------------------------------

def test_label_propagation_two_communities(spark):
    # two triangles {0,1,2} and {10,11,12} bridged by one edge 2-10.
    # Hand-traced synchronous rounds: triangle A settles on 0; triangle B
    # first votes 10, but node 10's round-1 tie (nbr labels {11,12,2})
    # resolves to min=2, which then wins B's frequency vote — the classic
    # sync-LPA label leak across a bridge. Deterministic, so pinned.
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (0, 2), (10, 11), (11, 12), (10, 12), (2, 10)],
        ["src", "dst"],
    )
    out = {r["id"]: r["label"] for r in graph.label_propagation(edges, n_iter=3).collect()}
    assert out == {0: 0, 1: 0, 2: 0, 10: 2, 11: 2, 12: 2}
    # the two communities remain distinct
    assert len({out[0], out[10]}) == 2


def test_label_propagation_tie_breaks_to_min_label(spark):
    # path 0-1-2: node 1 sees labels {0, 2} once each -> tie -> min (0).
    edges = spark.createDataFrame([(0, 1), (1, 2)], ["src", "dst"])
    out = {r["id"]: r["label"] for r in graph.label_propagation(edges, n_iter=1).collect()}
    assert out[1] == 0
    # endpoints have a single neighbor; they adopt its label
    assert out[0] == 1 and out[2] == 1


def test_label_propagation_directed_input_symmetrized(spark):
    # both orientations + a duplicate collapse to ONE undirected edge, and
    # a 2-cycle oscillates under synchronous updates (each node adopts the
    # other's previous label every round) — deterministic per round count.
    edges = spark.createDataFrame([(0, 1), (1, 0), (0, 1)], ["src", "dst"])
    r1 = {r["id"]: r["label"] for r in graph.label_propagation(edges, n_iter=1).collect()}
    r2 = {r["id"]: r["label"] for r in graph.label_propagation(edges, n_iter=2).collect()}
    assert r1 == {0: 1, 1: 0}
    assert r2 == {0: 0, 1: 1}


# ---------------------------------------------------------------------------
# SCD2 as-of
# ---------------------------------------------------------------------------

def _scd2_fixture(spark):
    rows = [
        # key 1: updated at 06-01 (closed + new current row)
        (1, "v1", "2024-01-01 00:00:00", "2024-06-01 00:00:00"),
        (1, "v2", "2024-06-01 00:00:00", None),
        # key 2: never updated
        (2, "w1", "2024-01-01 00:00:00", None),
    ]
    return spark.createDataFrame(
        rows, ["id", "val", "valid_from", "valid_to"]
    ).select(
        "id",
        "val",
        F.col("valid_from").cast("timestamp").alias("valid_from"),
        F.col("valid_to").cast("timestamp").alias("valid_to"),
    )


def test_scd2_asof_before_at_after_boundary(spark):
    hist = _scd2_fixture(spark)

    def snap(ts):
        return {r["id"]: r["val"] for r in pipeline.scd2_asof(hist, ts).collect()}

    # before the update: original row
    assert snap("2024-03-01 00:00:00") == {1: "v1", 2: "w1"}
    # exactly at the boundary: half-open [from, to) -> the NEW row
    assert snap("2024-06-01 00:00:00") == {1: "v2", 2: "w1"}
    # after: still the new row
    assert snap("2024-07-01 00:00:00") == {1: "v2", 2: "w1"}
    # before history began: nothing
    assert snap("2023-12-31 00:00:00") == {}


def test_scd2_asof_over_merge_output(spark):
    # merge then read as-of: the round-trip a history table actually serves
    base = spark.createDataFrame(
        [(1, 10), (2, 20)], ["id", "x"]
    ).select(
        "id",
        "x",
        F.lit("2024-01-01 00:00:00").cast("timestamp").alias("valid_from"),
        F.lit(None).cast("timestamp").alias("valid_to"),
    )
    updates = spark.createDataFrame([(1, 11)], ["id", "x"]).withColumn(
        "effective_ts", F.lit("2024-05-01 00:00:00").cast("timestamp")
    )
    hist = pipeline.merge_scd2(base, updates, "id")
    before = {r["id"]: r["x"] for r in pipeline.scd2_asof(hist, "2024-02-01 00:00:00").collect()}
    after = {r["id"]: r["x"] for r in pipeline.scd2_asof(hist, "2024-08-01 00:00:00").collect()}
    assert before == {1: 10, 2: 20}
    assert after == {1: 11, 2: 20}


# ---------------------------------------------------------------------------
# BPE merge training
# ---------------------------------------------------------------------------

def test_bpe_train_merges_hand_computed(spark):
    # vocab collapses to {aaab: 3}; the merge sequence is hand-derivable:
    #   1. pairs aa:6 ab:3 -> merge (a,a); seq [aa,a,b] (left-to-right:
    #      the second aa overlap is NOT merged)
    #   2. pairs (aa,a):3 (a,b):3 -> tie -> lexicographic min (a,b)
    #   3. (aa,ab):3 -> merge; words fully merged
    #   4. no pairs left -> loop stops early at 3 rules
    docs = spark.createDataFrame(
        [(1, "aaab aaab"), (2, "aaab")], ["doc_id", "text"]
    )
    out = [
        (r["step"], r["left"], r["right"], r["merged"], r["n"])
        for r in textstats.bpe_train_merges(docs, n_merges=5)
        .orderBy("step")
        .collect()
    ]
    assert out == [
        (1, "a", "a", "aa", 6),
        (2, "a", "b", "ab", 3),
        (3, "aa", "ab", "aaab", 3),
    ]


# ---------------------------------------------------------------------------
# k-core peeling
# ---------------------------------------------------------------------------

def test_kcore_triangle_survives_tail_peeled(spark):
    # triangle {0,1,2} with a tail 2-3: node 3 (deg 1) peels first, then
    # the triangle is stable at degree 2.
    edges = spark.createDataFrame([(0, 1), (1, 2), (0, 2), (2, 3)], ["src", "dst"])
    out = {r["id"]: r["degree"] for r in graph.k_core(edges, k=2).collect()}
    assert out == {0: 2, 1: 2, 2: 2}


def test_kcore_cascading_collapse(spark):
    # path graph: peeling the endpoints cascades until nothing is left
    edges = spark.createDataFrame([(0, 1), (1, 2), (2, 3)], ["src", "dst"])
    assert graph.k_core(edges, k=2).count() == 0


def test_kcore_raises_when_not_converged(spark):
    # max_iter=1 on the cascading path cannot reach a fixpoint: the old
    # code silently returned a non-k-core; now it must raise (ADVICE r2)
    edges = spark.createDataFrame([(0, 1), (1, 2), (2, 3)], ["src", "dst"])
    with pytest.raises(RuntimeError, match="no fixpoint"):
        graph.k_core(edges, k=2, max_iter=1)


def test_kcore_converges_within_oracle_unroll_depth(spark):
    """The q_kcore oracle unrolls 8 peel rounds; the Spark side runs to
    fixpoint with max_iter=20. Pin the coupling: at the gate SF the
    fixpoint must be reachable within the oracle's depth (so both
    engines agree), i.e. max_iter=8 neither raises nor differs."""
    from page_rank_hadoop_spark.plans import registry

    g = registry._graph(spark, "/root/testdata/sf0.001")["kept"]
    deep = {(r["id"], r["degree"]) for r in graph.k_core(g, k=30, max_iter=20).collect()}
    shallow = {(r["id"], r["degree"]) for r in graph.k_core(g, k=30, max_iter=8).collect()}
    assert deep == shallow


# ---------------------------------------------------------------------------
# snapshot diff (CDC derivation)
# ---------------------------------------------------------------------------

def test_snapshot_diff_all_ops(spark):
    from page_rank_hadoop_spark.operators.pipeline import snapshot_diff

    old = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30), (4, None, 40)],
        ["id", "lang", "n"],
    )
    new = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 25), (4, None, 40), (5, "e", 50)],
        ["id", "lang", "n"],
    )
    rows = {r["id"]: r["op"] for r in snapshot_diff(old, new, "id").collect()}
    # 1 unchanged (absent), 2 updated, 3 deleted, 4 unchanged despite the
    # NULL attribute (eqNullSafe), 5 inserted
    assert rows == {2: "update", 3: "delete", 5: "insert"}


def test_snapshot_diff_null_transitions(spark):
    from page_rank_hadoop_spark.operators.pipeline import snapshot_diff

    old = spark.createDataFrame([(1, None)], "id long, v string")
    new = spark.createDataFrame([(1, "x")], ["id", "v"])
    out = snapshot_diff(old, new, "id").collect()
    assert len(out) == 1 and out[0]["op"] == "update"
    assert out[0]["v_old"] is None and out[0]["v_new"] == "x"


# ---------------------------------------------------------------------------
# prefix-filtered n-gram Jaccard (PPJoin-style)
# ---------------------------------------------------------------------------

def test_prefix_jaccard_equals_plain_on_corpus(spark, docs):
    plain = {(r["doc_a"], r["doc_b"]): r["jaccard"]
             for r in dedup.ngram_jaccard_pairs(docs, n=3, min_jaccard=0.5).collect()}
    pref = {(r["doc_a"], r["doc_b"]): r["jaccard"]
            for r in dedup.ngram_jaccard_pairs_prefix(docs, n=3, min_jaccard=0.5).collect()}
    assert pref == plain


def test_prefix_jaccard_hot_shingle_bounded_fanout(spark):
    # 60 docs all sharing one viral boilerplate prefix ("click here to
    # subscribe ...") but pairwise-distinct bodies, plus one true near-dup
    # pair. The plain inverted-index join forms ~60^2/2 candidates from
    # the hot shingles alone; the rarity-ordered prefix drops them while
    # still finding the real pair losslessly.
    boiler = "click here to subscribe to our newsletter today"
    rows = [(i, f"{boiler} unique body {i} alpha beta gamma delta value{i}")
            for i in range(60)]
    rows.append((100, "the quick brown fox jumps over the lazy dog tonight"))
    rows.append((101, "the quick brown fox jumps over the lazy dog tonight friends"))
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {(r["doc_a"], r["doc_b"]): r["jaccard"]
           for r in dedup.ngram_jaccard_pairs_prefix(df, n=3, min_jaccard=0.7).collect()}
    plain = {(r["doc_a"], r["doc_b"]): r["jaccard"]
             for r in dedup.ngram_jaccard_pairs(df, n=3, min_jaccard=0.7).collect()}
    assert out == plain
    assert (100, 101) in out


# ---------------------------------------------------------------------------
# k-means training loop
# ---------------------------------------------------------------------------

def test_kmeans_train_one_iter_equals_step(spark):
    from page_rank_hadoop_spark.operators import similarity
    from page_rank_hadoop_spark.sources.catalog import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    step = similarity.kmeans_step(emb, n_centroids=4, dim=64).collect()
    train1 = similarity.kmeans_train(emb, n_iter=1, n_centroids=4, dim=64).collect()
    assert sorted(map(tuple, step)) == sorted(map(tuple, train1))


def test_kmeans_train_deterministic_and_partitions_corpus(spark):
    from page_rank_hadoop_spark.operators import similarity
    from page_rank_hadoop_spark.sources.catalog import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    n_vec = emb.count()
    a = similarity.kmeans_train(emb, n_iter=3, n_centroids=4, dim=64).collect()
    b = similarity.kmeans_train(emb, n_iter=3, n_centroids=4, dim=64).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    # every vector lands in exactly one cluster (each cluster contributes
    # one n_vectors per dim row; divide by dim)
    assert sum(r["n_vectors"] for r in a) // 64 == n_vec


def test_bpe_merge_fold_no_overlap_and_no_remerge(spark):
    # [b,a,a,b]: merging (a,a) must not let the merged "aa" join a
    # later match, and [a,a,a] must merge only the leftmost pair.
    docs = spark.createDataFrame([(1, "aaa")], ["doc_id", "text"])
    out = textstats.bpe_train_merges(docs, n_merges=1).collect()
    assert (out[0]["left"], out[0]["right"], out[0]["n"]) == ("a", "a", 2)


# ---------------------------------------------------------------------------
# approximate quantiles + salted join
# ---------------------------------------------------------------------------

def test_approx_quantiles_error_envelope(spark):
    # the sketch must land within 1% relative error of the exact
    # percentile at accuracy=10000 on this data size
    from page_rank_hadoop_spark.sources.catalog import load_table

    li = load_table(spark, "/root/testdata/sf0.001", "lineitem")
    exact = {
        r["l_returnflag"]: r["p"]
        for r in li.groupBy("l_returnflag")
        .agg(F.expr("percentile(l_extendedprice, array(0.25, 0.5, 0.75))").alias("p"))
        .collect()
    }
    approx = {
        r["l_returnflag"]: r["p"]
        for r in li.groupBy("l_returnflag")
        .agg(F.expr("approx_percentile(l_extendedprice, array(0.25, 0.5, 0.75), 10000)").alias("p"))
        .collect()
    }
    for flag, ps in exact.items():
        for e, a in zip(ps, approx[flag]):
            assert abs(a - e) / e < 0.01, (flag, e, a)


def test_salted_join_query_matches_plain(spark, events):
    from page_rank_hadoop_spark.operators.relational import salted_join

    dim = events.select("event_type").distinct().withColumn(
        "weight", F.length("event_type").cast("int")
    )
    salted = salted_join(events, dim, on="event_type", n_salts=8, salt_cols=["event_id"])
    plain = events.join(dim, "event_type")
    assert salted.count() == plain.count()
    s = {tuple(r) for r in salted.groupBy("event_type").count().collect()}
    p = {tuple(r) for r in plain.groupBy("event_type").count().collect()}
    assert s == p


def test_weighted_sample_favors_heavy_weights(spark):
    # 100 light rows (w=1) + 10 heavy rows (w=500): the weighted sample
    # must over-represent heavy rows far beyond their 9% population share
    rows = [(i, 1) for i in range(100)] + [(1000 + i, 500) for i in range(10)]
    df = spark.createDataFrame(rows, ["id", "w"])
    out = pipeline.weighted_sample(df, key="id", weight_col="w", k=10)
    ids = [r["id"] for r in out.collect()]
    heavy = sum(1 for i in ids if i >= 1000)
    assert heavy >= 5, ids
    # deterministic: same top-k on a second run
    ids2 = [r["id"] for r in pipeline.weighted_sample(df, "id", "w", k=10).collect()]
    assert ids == ids2


def test_bpe_encode_hand_computed(spark):
    # rules (t,h)(th,e)(i,n)(e,r)(a,n): "the"->[the]=1 piece,
    # "other"->[o,the,r]=3, "in"->[in]=1, "and"->[an,d]=2
    docs = spark.createDataFrame([(1, "the other"), (2, "in and")], ["doc_id", "text"])
    out = {r["doc_id"]: (r["n_pieces"], r["n_words"])
           for r in textstats.bpe_encode_stats(docs).collect()}
    assert out == {1: (4, 2), 2: (3, 2)}


def test_normalize_text_hand_cases(spark):
    from page_rank_hadoop_spark.functions.text import normalize_text

    df = spark.createDataFrame(
        [(1, "  Hello\x00\x01 WORLD\t\t x \r\n y  "), (2, "already clean")],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r["t"] for r in df.select("doc_id", normalize_text("text").alias("t")).collect()}
    assert out[1] == "hello world x y"
    assert out[2] == "already clean"


def test_zorder_key_bit_interleave(spark):
    # zkey(x=0,y=0)=0; zkey(1,0)=0b10=2; zkey(0,1)=0b01=1; zkey(3,1)=0b1011=11
    df = spark.createDataFrame([(0, 0), (1, 0), (0, 1), (3, 1)], ["x", "y"])
    out = [r["z"] for r in df.select(pipeline.zorder_key("x", "y").alias("z"))
           .orderBy("x", "y").collect()]
    # ordered by (x,y): (0,0)->0 (0,1)->1 (1,0)->2 (3,1)->11
    assert out == [0, 1, 2, 11]


def test_zorder_key_locality(spark):
    # points in the same 2x2 cell share all but the lowest 2 interleaved
    # bits: |zkey(a)-zkey(b)| small for neighbors, large across cells
    df = spark.createDataFrame([(4, 4), (5, 5), (4, 100)], ["x", "y"])
    z = {(r["x"], r["y"]): r["z"] for r in
         df.select("x", "y", pipeline.zorder_key("x", "y").alias("z")).collect()}
    assert abs(z[(4, 4)] - z[(5, 5)]) < abs(z[(4, 4)] - z[(4, 100)])


def test_hits_star_graph(spark):
    # 1,2,3 -> 0: node 0 is the only authority; 1-3 are equal pure hubs
    edges = spark.createDataFrame([(1, 0), (2, 0), (3, 0)], ["src", "dst"])
    out = {r["id"]: (r["hub"], r["authority"]) for r in graph.hits(edges, n_iter=4).collect()}
    assert out[0] == (0.0, 1.0)
    for i in (1, 2, 3):
        assert out[i][1] == 0.0
        assert abs(out[i][0] - 1 / 3) < 1e-6


def test_deterministic_walks_path_graph(spark):
    # 0 -> 1 -> 2: single-neighbor hops are forced; dead end 2 stalls
    edges = spark.createDataFrame([(0, 1), (1, 2)], ["src", "dst"])
    verts = spark.createDataFrame([(0,), (1,), (2,)], ["id"])
    out = {r["start"]: r["walk_json"] for r in
           graph.deterministic_walks(edges, verts, walk_len=4).collect()}
    assert out[0] == "[0,1,2,2,2]"
    assert out[1] == "[1,2,2,2,2]"
    assert out[2] == "[2,2,2,2,2]"
    # reproducible
    out2 = {r["start"]: r["walk_json"] for r in
            graph.deterministic_walks(edges, verts, walk_len=4).collect()}
    assert out == out2


def test_walks_broadcast_gate(spark):
    """Both sides of the size gate (graph.py broadcast_max_rows): above
    the vertex count the adjacency is explicitly broadcast into every
    step join; below it the plan degrades to the documented shuffle join
    rather than an OOM-prone forced broadcast — with Catalyst's own
    auto-broadcast disabled so the gate, not the optimizer, decides."""
    from pyspark.sql import functions as F

    edges = spark.range(200).select(
        (F.col("id") % 50).alias("src"), ((F.col("id") * 7 + 1) % 50).alias("dst")
    )
    verts = spark.range(50).select("id")

    def fmt(d):
        return spark._jvm.PythonSQLUtils.explainString(
            d._jdf.queryExecution(), "formatted"
        )

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        on = graph.deterministic_walks(
            edges, verts, walk_len=2, broadcast_max_rows=10**6, materialize=False
        )
        assert "BroadcastHashJoin" in fmt(on)
        off = graph.deterministic_walks(
            edges, verts, walk_len=2, broadcast_max_rows=10, materialize=False
        )
        plan = fmt(off)
        assert "BroadcastHashJoin" not in plan
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        # the degraded plan computes the identical walk corpus
        assert sorted(r["walk_json"] for r in on.collect()) == sorted(
            r["walk_json"] for r in off.collect()
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_hits_empty_edges(spark):
    edges = spark.createDataFrame([], "src long, dst long")
    assert graph.hits(edges, n_iter=2).count() == 0


def test_bpe_train_no_pairs(spark):
    # 1-char words only: no adjacent pairs, no merges, empty rule table
    docs = spark.createDataFrame([(1, "a b c")], ["doc_id", "text"])
    out = textstats.bpe_train_merges(docs, n_merges=3)
    assert out.count() == 0
    assert out.columns == ["step", "left", "right", "merged", "n"]


def test_attribution_weights_u_shape(spark):
    # purchase credited 40/20/40 across 3 clicks; single click gets 100%
    import sys
    sys.path.insert(0, "/root/repo")
    import __spark_entry__  # noqa: F401 — ensures registry import side effects
    from page_rank_hadoop_spark.plans.registry import q_attribution_weights

    # build a tiny events table shaped like the testdata and run the same
    # logic via the operator path (window over attribution pairs)
    from pyspark.sql import Window
    from page_rank_hadoop_spark.streaming.join import click_purchase_join_batch

    rows = [
        (1, "2024-01-01 10:00:00", 7, "click", 0.0, None),
        (2, "2024-01-01 10:05:00", 7, "click", 0.0, None),
        (3, "2024-01-01 10:10:00", 7, "click", 0.0, None),
        (4, "2024-01-01 10:20:00", 7, "purchase", 100.0, None),
        (5, "2024-01-01 11:00:00", 8, "click", 0.0, None),
        (6, "2024-01-01 11:10:00", 8, "purchase", 50.0, None),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string, value double, props string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    pairs = click_purchase_join_batch(ev, horizon_minutes=30)
    w = Window.partitionBy("purchase_id").orderBy("click_ts", "click_id")
    ranked = pairs.select(
        "click_id", "purchase_id", "purchase_value",
        F.row_number().over(w).alias("pos"),
        F.count("*").over(Window.partitionBy("purchase_id")).alias("n_clicks"),
    )
    weight = (
        F.when(F.col("n_clicks") == 1, F.lit(1.0))
        .when(F.col("pos") == 1, F.lit(0.4))
        .when(F.col("pos") == F.col("n_clicks"), F.lit(0.4))
        .otherwise(F.lit(0.2) / (F.col("n_clicks") - 2))
    )
    out = {(r["click_id"], r["purchase_id"]): r["credit"] for r in ranked.select(
        "click_id", "purchase_id", F.round(weight * F.col("purchase_value"), 6).alias("credit")
    ).collect()}
    assert out == {(1, 4): 40.0, (2, 4): 20.0, (3, 4): 40.0, (5, 6): 50.0}


def test_pack_sequences_bin_boundaries(spark):
    import __spark_entry__ as m

    out = {r["doc_id"]: (r["bin_id"], r["bin_offset"], r["n_tokens"]) for r in
           m.queries()["q_pack_sequences"](spark, "/root/testdata/sf0.001").collect()}
    # contiguity: each doc starts where the previous ended (mod budget)
    ids = sorted(out)
    run = 0
    for i in ids:
        b, off, n = out[i]
        assert b == run // 2048 and off == run % 2048
        run += n


def test_redact_pii_hand_cases(spark):
    from page_rank_hadoop_spark.functions.text import redact_pii

    df = spark.createDataFrame(
        [(1, "mail me at jane.doe+x@example.co.uk or call 555-123-4567 now"),
         (2, "no pii here, just 42 and v2.0")],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r["t"] for r in df.select("doc_id", redact_pii("text").alias("t")).collect()}
    assert out[1] == "mail me at <EMAIL> or call <NUM> now"
    assert out[2] == "no pii here, just 42 and v2.0"


def test_temperature_mixture_flattens_distribution(spark):
    import __spark_entry__ as m

    sf = "/root/testdata/sf0.001"
    kept = m.queries()["q_temperature_mixture"](spark, sf).groupBy("lang").count()
    kept = {r["lang"]: r["count"] for r in kept.collect()}
    from page_rank_hadoop_spark.sources.catalog import load_table
    orig = {r["lang"]: r["count"] for r in
            load_table(spark, sf, "documents").groupBy("lang").count().collect()}
    # the dominant language is downsampled hardest; the smallest keeps ~all
    big = max(orig, key=orig.get)
    small = min(orig, key=orig.get)
    assert kept[big] / orig[big] < kept[small] / orig[small]
    assert kept[small] >= orig[small] * 0.9
    # post-mixture ratio between biggest and smallest shrinks
    assert kept[big] / kept[small] < orig[big] / orig[small]


def test_dedup_report_consistency(spark):
    import __spark_entry__ as m

    sf = "/root/testdata/sf0.001"
    row = m.queries()["q_dedup_report"](spark, sf).collect()[0]
    comp = m.queries()["q_dedup_components"](spark, sf)
    assert row["n_dropped"] == comp.count() - comp.select("component_id").distinct().count()
    assert 0 <= row["dedup_rate"] < 1
    assert row["n_candidate_pairs"] >= row["n_dropped"]
