"""Round-11 optimization-phase internals.

These pin the VALUE-PRESERVATION contracts of the optimization round's
rewrites (the oracle gate already pins end-to-end hashes; these explain
WHY the rewrites are safe and catch drift at the unit level):

- lit_doubles/lit_longs/lit_double_matrix build the same literals as
  the old F.array(F.lit(...)*n) py4j path, bit-for-bit, including the
  IEEE edge cases (subnormal, -0.0, max double, NaN, infinities).
- The fused HITS round (one tagged symmetric edge table, one groupBy)
  produces the same 6dp scores as the unfused two-leg form.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F


class TestLitHelpers:
    def test_doubles_bit_parity(self, spark):
        from page_rank_hadoop_spark.functions.vectors import lit_doubles

        vals = [
            0.1,
            -0.0,
            5e-324,  # min subnormal
            1.7976931348623157e308,  # max double
            0.1 + 0.2,  # classic non-representable sum
            -3.5e300,
            1e-17,
            math.pi,
        ]
        row = spark.range(1).select(
            F.array(*[F.lit(float(v)) for v in vals]).alias("old"),
            lit_doubles(vals).alias("new"),
        ).first()
        import struct

        for o, n in zip(row["old"], row["new"]):
            assert struct.pack("<d", o) == struct.pack("<d", n)

    def test_doubles_nonfinite(self, spark):
        from page_rank_hadoop_spark.functions.vectors import lit_doubles

        row = spark.range(1).select(
            lit_doubles([float("nan"), float("inf"), float("-inf")]).alias("v")
        ).first()
        assert math.isnan(row["v"][0])
        assert row["v"][1] == math.inf and row["v"][2] == -math.inf

    def test_longs_type_and_values(self, spark):
        from page_rank_hadoop_spark.functions.vectors import lit_longs

        ids = [0, -1, 2**62, 7]
        df = spark.range(1).select(
            F.array(*[F.lit(int(v)) for v in ids]).alias("old"),
            lit_longs(ids).alias("new"),
        )
        # F.lit(python int) maps to LongType; the helper must match so
        # downstream casts/joins see the identical schema
        assert df.schema["old"].dataType == df.schema["new"].dataType
        row = df.first()
        assert list(row["old"]) == list(row["new"])

    def test_matrix_matches_nested_arrays(self, spark):
        from page_rank_hadoop_spark.functions.vectors import lit_double_matrix

        rows = [[0.5, -1.25, 3e-7], [1.0, 2.0, -0.125]]
        got = spark.range(1).select(
            F.array(
                *[F.array(*[F.lit(float(x)) for x in r]) for r in rows]
            ).alias("old"),
            lit_double_matrix(rows).alias("new"),
        ).first()
        assert [list(r) for r in got["old"]] == [list(r) for r in got["new"]]


class TestHitsFusion:
    def test_fused_round_matches_two_leg_form(self, spark, docs):
        """The round-11 fused HITS loop must reproduce the unfused
        two-join form's 6dp scores on the real sf0.001 link graph."""
        from page_rank_hadoop_spark.operators import graph as G

        verts = G.vertices(docs)
        kept = G.resolve_edges(G.extract_edges(docs), verts)
        new = {
            (r["id"]): (r["hub"], r["authority"])
            for r in G.hits(kept, n_iter=4).collect()
        }

        # reference: the pre-fusion two-leg implementation, inline
        e = kept.select("src", "dst").filter(F.col("src") != F.col("dst")).distinct()
        nodes = (
            e.select(F.col("src").alias("id"))
            .unionByName(e.select(F.col("dst").alias("id")))
            .distinct()
            .localCheckpoint()
        )
        n = nodes.count()
        scores = nodes.select(
            "id", (F.lit(1.0) / n).alias("hub"), (F.lit(1.0) / n).alias("authority")
        ).localCheckpoint()
        for _ in range(4):
            auth = (
                e.join(scores.select(F.col("id").alias("src"), "hub"), "src")
                .groupBy(F.col("dst").alias("id"))
                .agg(F.sum("hub").alias("a_raw"))
            )
            hub = (
                e.join(scores.select(F.col("id").alias("dst"), "authority"), "dst")
                .groupBy(F.col("src").alias("id"))
                .agg(F.sum("authority").alias("h_raw"))
            )
            joined = (
                nodes.join(auth, "id", "left")
                .join(hub, "id", "left")
                .select(
                    "id",
                    F.coalesce("h_raw", F.lit(0.0)).alias("h_raw"),
                    F.coalesce("a_raw", F.lit(0.0)).alias("a_raw"),
                )
                .localCheckpoint()
            )
            mass = joined.agg(
                F.sum("h_raw").alias("hm"), F.sum("a_raw").alias("am")
            ).first()
            scores = joined.select(
                "id",
                (F.col("h_raw") / F.lit(mass["hm"])).alias("hub"),
                (F.col("a_raw") / F.lit(mass["am"])).alias("authority"),
            )
        old = {
            r["id"]: (round(r["hub"], 6), round(r["authority"], 6))
            for r in scores.collect()
        }
        assert set(old) == set(new)
        for k, (h, a) in old.items():
            assert abs(new[k][0] - h) < 2e-6 and abs(new[k][1] - a) < 2e-6
