"""Round-10 operators: DSIR importance resampling + bucketed DBSCAN.

Oracle-gated end-to-end by the driver (q_dsir_select, q_dbscan_clusters);
these tests pin the SEMANTIC invariants a hash equality can't explain:
selection-rate / threshold lexicography for DSIR, the core/border/noise
rules for DBSCAN.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF0001 = "/root/testdata/sf0.001"


class TestDSIR:
    @pytest.fixture(scope="class")
    def result(self, spark, docs):
        from page_rank_hadoop_spark.operators.textstats import dsir_select

        out = dsir_select(docs).persist()
        out.count()
        yield out
        out.unpersist()

    def test_only_raw_docs_scored(self, result):
        assert result.filter(F.col("doc_id") % 10 == 0).count() == 0

    def test_selection_rate_is_keep_frac(self, result, docs):
        n_raw = docs.filter(F.col("doc_id") % 10 != 0).count()
        n_sel = result.filter("selected").count()
        assert n_sel == int(n_raw * 0.25)

    def test_selected_are_exactly_topk_by_weight(self, result):
        rows = result.filter(F.col("dsir_weight").isNotNull()).collect()
        k = sum(1 for r in rows if r["selected"])
        ranked = sorted(rows, key=lambda r: (-r["dsir_weight"], r["doc_id"]))
        top_ids = {r["doc_id"] for r in ranked[:k]}
        sel_ids = {r["doc_id"] for r in rows if r["selected"]}
        assert sel_ids == top_ids

    def test_target_like_docs_score_higher(self, spark):
        # a corpus where raw docs 1..10 share the target's vocabulary and
        # 11..20 don't: the DSIR weight must rank the mimics on top
        from page_rank_hadoop_spark.operators.textstats import dsir_select

        rows = []
        for i in range(0, 101, 10):  # targets: doc_id % 10 == 0
            rows.append((i, "alpha beta gamma delta " * 5))
        for i in range(1, 11):
            rows.append((i * 10 + 1, "alpha beta gamma delta " * 5))
        for i in range(1, 11):
            rows.append((i * 10 + 2, "zulu yankee xray whiskey " * 5))
        docs = spark.createDataFrame(rows, ["doc_id", "text"])
        out = dsir_select(docs, keep_frac=0.5).collect()
        w = {r["doc_id"]: r["dsir_weight"] for r in out}
        mimics = [w[i * 10 + 1] for i in range(1, 11)]
        others = [w[i * 10 + 2] for i in range(1, 11)]
        assert min(mimics) > max(others)
        sel = {r["doc_id"] for r in out if r["selected"]}
        assert sel == {i * 10 + 1 for i in range(1, 11)}

    def test_zero_token_doc_unselected_null_weight(self, spark):
        from page_rank_hadoop_spark.operators.textstats import dsir_select

        docs = spark.createDataFrame(
            [(0, "alpha beta"), (1, "alpha beta"), (2, "12345 !!!")],
            ["doc_id", "text"],
        )
        out = {r["doc_id"]: r for r in dsir_select(docs).collect()}
        assert out[2]["dsir_weight"] is None
        assert out[2]["selected"] is False
        assert out[2]["n_tokens"] == 0


class TestDBSCAN:
    @pytest.fixture(scope="class")
    def result(self, spark):
        from page_rank_hadoop_spark.operators.similarity import dbscan_embeddings

        emb = spark.read.parquet(f"{SF0001}/embeddings.parquet")
        out = dbscan_embeddings(emb).persist()
        out.count()
        yield out
        out.unpersist()

    def test_covers_every_vector_once(self, result, spark):
        emb = spark.read.parquet(f"{SF0001}/embeddings.parquet")
        assert result.count() == emb.count()
        assert result.select("vec_id").distinct().count() == emb.count()

    def test_noise_has_no_cluster_core_border_do(self, result):
        assert result.filter(
            (F.col("role") == "noise") & F.col("cluster_id").isNotNull()
        ).count() == 0
        assert result.filter(
            (F.col("role") != "noise") & F.col("cluster_id").isNull()
        ).count() == 0

    def test_cluster_id_is_min_core_member(self, result):
        # every cluster's id equals the minimum CORE vec_id labeled with it
        bad = (
            result.filter(F.col("role") == "core")
            .groupBy("cluster_id")
            .agg(F.min("vec_id").alias("m"))
            .filter(F.col("m") != F.col("cluster_id"))
            .count()
        )
        assert bad == 0

    def test_rules_on_handbuilt_graph(self, spark):
        # identical unit vectors cluster; an orthogonal one is noise.
        # a/b/c coincide (each has 2 neighbors -> all core, one cluster);
        # d equals only... use a 3-point dense blob + 1 satellite + 1 far:
        # blob {0,1,2} pairwise cos=1 -> cores; satellite 3 shares only a
        # weaker link below eps to the blob -> noise; 4 orthogonal noise.
        from page_rank_hadoop_spark.operators.similarity import dbscan_embeddings

        dim = 8
        base = [1.0] + [0.0] * (dim - 1)
        ortho = [0.0, 1.0] + [0.0] * (dim - 2)
        rows = [
            (0, base),
            (1, base),
            (2, base),
            (4, ortho),
        ]
        emb = spark.createDataFrame(rows, ["vec_id", "embedding"])
        out = {
            r["vec_id"]: (r["role"], r["cluster_id"])
            for r in dbscan_embeddings(emb, min_cosine=0.9, min_pts=3, n_planes=4).collect()
        }
        assert out[0] == ("core", 0)
        assert out[1] == ("core", 0)
        assert out[2] == ("core", 0)
        assert out[4] == ("noise", None)

    def test_border_rule(self, spark):
        # two coincident cores {0,1} plus point 2 near both but with only
        # 2 neighbors itself at min_pts=4 -> border, assigned cluster 0
        from page_rank_hadoop_spark.operators.similarity import dbscan_embeddings

        dim = 8
        base = [1.0] + [0.0] * (dim - 1)
        rows = [(0, base), (1, base), (2, base), (3, base)]
        emb = spark.createDataFrame(rows, ["vec_id", "embedding"])
        # min_pts=4: each point has 3 identical neighbors -> all core
        out = {
            r["vec_id"]: r["role"]
            for r in dbscan_embeddings(emb, min_cosine=0.9, min_pts=4, n_planes=4).collect()
        }
        assert set(out.values()) == {"core"}
        # min_pts=5: nobody reaches 4 neighbors -> no cores -> all noise
        out2 = {
            r["vec_id"]: r["role"]
            for r in dbscan_embeddings(emb, min_cosine=0.9, min_pts=5, n_planes=4).collect()
        }
        assert set(out2.values()) == {"noise"}


def _reference_dbscan(vecs, min_cosine, min_pts, n_planes):
    """Independent sequential DBSCAN over the SAME LSH-bucketed
    neighborhood definition (sign-LSH planes sin(i*7919 + j*104729),
    6dp-rounded cosine) — the Tarjan-parity pattern: a from-scratch
    reimplementation, not a replay of the operator's plan."""
    import math

    ids = sorted(vecs)
    dim = len(next(iter(vecs.values())))
    planes = [
        [math.sin(i * 7919 + j * 104729) for j in range(dim)]
        for i in range(n_planes)
    ]

    def bucket(v):
        sig = 0
        for i, p in enumerate(planes):
            if sum(a * b for a, b in zip(v, p)) >= 0:
                sig |= 1 << i
        return sig

    buckets = {}
    for vid in ids:
        buckets.setdefault(bucket(vecs[vid]), []).append(vid)

    def cos(a, b):
        num = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return round(num / (na * nb), 6)

    nbrs = {vid: set() for vid in ids}
    for members in buckets.values():
        for i, a in enumerate(members):
            for b in members[i + 1:]:
                if cos(vecs[a], vecs[b]) >= min_cosine:
                    nbrs[a].add(b)
                    nbrs[b].add(a)
    core = {v for v in ids if len(nbrs[v]) >= min_pts - 1}
    # clusters: components of the core-core graph, min-id labels
    label = {}
    for v in sorted(core):
        if v in label:
            continue
        stack, comp = [v], []
        seen = {v}
        while stack:
            u = stack.pop()
            comp.append(u)
            for w in nbrs[u]:
                if w in core and w not in seen:
                    seen.add(w)
                    stack.append(w)
        cid = min(comp)
        for u in comp:
            label[u] = cid
    out = {}
    for v in ids:
        if v in core:
            out[v] = ("core", label[v])
        else:
            core_nb = [label[w] for w in nbrs[v] if w in core]
            if core_nb:
                out[v] = ("border", min(core_nb))
            else:
                out[v] = ("noise", None)
    return out


class TestDBSCANParity:
    def test_matches_reference_on_sf0001(self, spark):
        from page_rank_hadoop_spark.operators.similarity import dbscan_embeddings

        emb = spark.read.parquet(f"{SF0001}/embeddings.parquet")
        vecs = {
            int(r["vec_id"]): [float(x) for x in r["embedding"]]
            for r in emb.collect()
        }
        ref = _reference_dbscan(vecs, min_cosine=0.30, min_pts=3, n_planes=12)
        got = {
            r["vec_id"]: (r["role"], r["cluster_id"])
            for r in dbscan_embeddings(
                emb, min_cosine=0.30, min_pts=3, n_planes=12
            ).collect()
        }
        assert got == ref
