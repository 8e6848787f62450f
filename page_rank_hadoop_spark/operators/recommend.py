"""Collaborative-filtering recommender: rank-1 alternating least
squares over the customer × part purchase matrix.

The reference engine ranks *pages* by link structure
(/root/reference/src/main/scala/pageRank.scala:331-393 — iterative
score propagation to a fixpoint); this module is the same iterative
DataFrame-loop shape applied to a bipartite user-item graph: factor
tables take the place of rank vectors, and each half-step is one join
+ one partial-agg'd groupBy instead of a scatter/gather pair.

Rank-1 ALS (one latent factor per user / item, L2 regularization λ):

    u_i ← Σ_j r_ij·v_j / (λ + Σ_j v_j²)       over items i rated
    v_j ← Σ_i r_ij·u_i / (λ + Σ_i u_i²)       over users that rated j

Unrolled a fixed number of iterations it is pure join+agg relational
algebra — the DuckDB oracle replays the identical CTE chain (the
q_hits pattern: deterministic alternating fixpoint, rounded 6dp at
the output boundary only; all base sums are integer-valued doubles so
the iteration inputs are exact).

Scale shape (100 TB): every half-step shuffles the RATINGS table once
on its join key and once for the groupBy — linear in |ratings| with
map-side partial aggregation; factor tables are dimension-sized and
never widen. Nothing materializes a user × item cross product: the
recommend stage scores candidates for an explicit user subset
(factor join + anti-join on seen pairs), and a full-catalog serving
path would hand the trained factors to the ANN lane (similarity.py)
rather than cross-join here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

__all__ = ["build_ratings", "als_rank1", "als_rank2", "als_recommend", "als_rmse"]


def build_ratings(lineitem: DataFrame, orders: DataFrame) -> DataFrame:
    """Implicit-feedback ratings: customer × part with total purchased
    quantity as the rating. The lineitem⋈orders join is co-keyed on
    orderkey (both sides shuffle once at fact scale); the (u, it)
    groupBy is partial-agg'd. Quantities are integer-valued, so the
    summed rating is EXACT in double regardless of partial-agg order —
    the ALS iteration starts from bit-identical inputs cross-engine.
    """
    return (
        lineitem.select("l_orderkey", "l_partkey", "l_quantity")
        .join(orders.select("o_orderkey", "o_custkey"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(
            F.col("o_custkey").alias("u"),
            F.col("l_partkey").alias("it"),
        )
        .agg(F.sum("l_quantity").cast("double").alias("r"))
    )


def als_rank1(
    ratings: DataFrame, iters: int = 2, lam: float = 0.1
) -> tuple[DataFrame, DataFrame]:
    """Train rank-1 ALS for ``iters`` full alternations from v≡1.0.

    Returns ``(user_factors(u, uf), item_factors(it, v))``. The
    ratings frame is persisted once (each iteration scans it twice);
    join strategy is left to AQE — at test scale the factor side
    broadcasts, at 100 TB both sides are large and the join degrades
    gracefully to a co-partitioned shuffle join, still linear. The
    unrolled plan is 2·iters joins deep — shallow enough that no
    checkpoint relay is needed (contrast the 50-round PageRank loop,
    pagerank.py:54, which must break lineage). Ratings are eagerly
    localCheckpointed rather than persisted: each half-step scans them,
    and checkpoint blocks are reclaimed by the ContextCleaner once the
    query objects die — a CacheManager persist would pin a ratings copy
    per invocation for the session lifetime.
    """
    if iters < 1:
        raise ValueError(f"als_rank1: iters must be >= 1, got {iters}")
    ratings = ratings.localCheckpoint()
    v = ratings.select("it").distinct().select("it", F.lit(1.0).alias("v"))
    u = None
    for _ in range(iters):
        u = (
            ratings.join(v, "it")
            .groupBy("u")
            .agg(
                (
                    F.sum(F.col("r") * F.col("v"))
                    / (F.lit(lam) + F.sum(F.col("v") * F.col("v")))
                ).alias("uf")
            )
        )
        v = (
            ratings.join(u, "u")
            .groupBy("it")
            .agg(
                (
                    F.sum(F.col("r") * F.col("uf"))
                    / (F.lit(lam) + F.sum(F.col("uf") * F.col("uf")))
                ).alias("v")
            )
        )
    return u, v


def _solve2(s11, s12, s22, b1, b2, lam: float):
    """Closed-form 2×2 regularized normal-equation solve
    (A + λI)x = b: the per-entity least-squares step real featurized
    ALS runs, written as column expressions so it stays inside
    whole-stage codegen. det ≥ λ·(s11+s22) by Cauchy–Schwarz (the
    moment matrix is PSD), so the regularizer bounds the denominator
    away from 0 even for single-rating entities."""
    a11 = s11 + F.lit(lam)
    a22 = s22 + F.lit(lam)
    det = a11 * a22 - s12 * s12
    return (b1 * a22 - b2 * s12) / det, (b2 * a11 - b1 * s12) / det


def als_rank2(
    ratings: DataFrame, iters: int = 2, lam: float = 0.1
) -> tuple[DataFrame, DataFrame]:
    """Rank-2 ALS: the k-dimensional generalization of ``als_rank1`` —
    each half-step aggregates the k(k+1)/2 Gram moments plus k
    right-hand sides per entity (one partial-agg'd groupBy over the
    ratings join, exactly rank-1's plan shape with 5 sum columns
    instead of 2) and solves the regularized 2×2 normal equations in
    closed form. Init v = (1, ((it mod 19) − 9)/9): the second column's
    deterministic spread keeps the factor columns independent (an
    all-constant init would make the Gram matrix rank-1 forever).

    Returns ``(user_factors(u, u1, u2), item_factors(it, v1, v2))``.
    Scale shape identical to rank-1: one ratings-sized exchange per
    half-step, factor tables dimension-sized, nothing to the driver;
    general rank-k is the same plan with k(k+1)/2 moment columns (at
    which point the solve moves into a small-matrix expression or a
    Pandas UDF over the per-entity moment rows — still never a
    per-round collect)."""
    if iters < 1:
        raise ValueError(f"als_rank2: iters must be >= 1, got {iters}")
    ratings = ratings.localCheckpoint()
    v = ratings.select("it").distinct().select(
        "it",
        F.lit(1.0).alias("v1"),
        ((F.col("it") % 19 - F.lit(9)) / F.lit(9.0)).alias("v2"),
    )
    u = None
    for _ in range(iters):
        m = (
            ratings.join(v, "it")
            .groupBy("u")
            .agg(
                F.sum(F.col("v1") * F.col("v1")).alias("s11"),
                F.sum(F.col("v1") * F.col("v2")).alias("s12"),
                F.sum(F.col("v2") * F.col("v2")).alias("s22"),
                F.sum(F.col("r") * F.col("v1")).alias("b1"),
                F.sum(F.col("r") * F.col("v2")).alias("b2"),
            )
        )
        x1, x2 = _solve2(
            F.col("s11"), F.col("s12"), F.col("s22"), F.col("b1"), F.col("b2"), lam
        )
        u = m.select("u", x1.alias("u1"), x2.alias("u2"))
        m = (
            ratings.join(u, "u")
            .groupBy("it")
            .agg(
                F.sum(F.col("u1") * F.col("u1")).alias("s11"),
                F.sum(F.col("u1") * F.col("u2")).alias("s12"),
                F.sum(F.col("u2") * F.col("u2")).alias("s22"),
                F.sum(F.col("r") * F.col("u1")).alias("b1"),
                F.sum(F.col("r") * F.col("u2")).alias("b2"),
            )
        )
        x1, x2 = _solve2(
            F.col("s11"), F.col("s12"), F.col("s22"), F.col("b1"), F.col("b2"), lam
        )
        v = m.select("it", x1.alias("v1"), x2.alias("v2"))
    return u, v


def als_rmse(
    ratings: DataFrame,
    iters: int = 2,
    lam: float = 0.1,
    factors: tuple[DataFrame, DataFrame] | None = None,
) -> DataFrame:
    """Training-set fit of the rank-1 model: RMSE / MAE of û = u_i·v_j
    against the observed ratings, plus the trivial-baseline (global
    mean) RMSE it must beat — the evaluate leg of the train /
    recommend / evaluate triad. One factor join per side then a single
    partial-agg'd pass over ratings; one output row at any scale.
    Pass ``factors=(uf, vf)`` to evaluate an already-trained model
    instead of retraining (the CLI triad trains once).

    The error moments round at 6dp BEFORE the sqrt (the cusum rule:
    partial-agg summation order differs ~1 ulp between engines; round
    the moment, then derive).
    """
    uf, vf = factors if factors is not None else als_rank1(ratings, iters=iters, lam=lam)
    scored = (
        ratings.join(uf, "u")
        .join(vf, "it")
        .select("r", (F.col("uf") * F.col("v")).alias("pred"))
    )
    mean_r = ratings.agg(F.round(F.avg("r"), 6).alias("mu"))
    d = F.col("r") - F.col("pred")
    db = F.col("r") - F.col("mu")
    return (
        scored.crossJoin(F.broadcast(mean_r))
        .agg(
            F.count("*").cast("bigint").alias("n_ratings"),
            F.round(F.avg(d * d), 6).alias("mse"),
            F.round(F.avg(F.abs(d)), 6).alias("mae"),
            F.round(F.avg(db * db), 6).alias("mse_baseline"),
        )
        .select(
            "n_ratings",
            F.round(F.sqrt("mse"), 6).alias("rmse"),
            "mae",
            F.round(F.sqrt("mse_baseline"), 6).alias("rmse_baseline"),
        )
    )


def als_recommend(
    ratings: DataFrame,
    n_users: int = 5,
    top_k: int = 3,
    iters: int = 2,
    lam: float = 0.1,
    factors: tuple[DataFrame, DataFrame] | None = None,
) -> DataFrame:
    """Top-k unseen-item recommendations for the ``n_users`` smallest
    customer keys: score = u_i·v_j over the candidate set (selected
    users × catalog, minus already-purchased pairs, anti-join on the
    exact (u, it) key).

    Candidate volume is |selected users| × |items| — bounded by the
    explicit user subset, never a full bipartite cross product. Scores
    round to 6dp BEFORE ranking so the top-k cut is deterministic
    cross-engine (rounded-score desc, item asc tiebreak). Pass
    ``factors=(uf, vf)`` to score an already-trained model.
    """
    uf, vf = factors if factors is not None else als_rank1(ratings, iters=iters, lam=lam)
    sel = (
        ratings.select("u").distinct()
        .orderBy("u").limit(n_users)
        .join(uf, "u")
    )
    scored = (
        F.broadcast(sel).crossJoin(vf)
        .join(ratings.select("u", "it"), ["u", "it"], "left_anti")
        .select(
            "u",
            "it",
            F.round(F.col("uf") * F.col("v"), 6).alias("score"),
        )
    )
    w = Window.partitionBy("u").orderBy(F.desc("score"), F.asc("it"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= top_k)
        .select(
            F.col("u").alias("cust_id"),
            F.col("it").alias("part_id"),
            "score",
            F.col("rk").cast("int").alias("rk"),
        )
    )
