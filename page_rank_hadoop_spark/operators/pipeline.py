"""Dataset-maintenance operators for a training-data pipeline: snapshot
merge (upsert), deterministic train/val splitting, and quantile-based
quality filtering. All single-shuffle or broadcast-only plans.

These extend the reference's batch surface (SURVEY.md §2.2 "reference
lacks") with the operations a 100 TB corpus refresh actually runs:
merge the new crawl into the corpus, re-split, re-filter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_upsert(
    base: DataFrame, updates: DataFrame, key: str, on_duplicates: str = "error"
) -> DataFrame:
    """Upsert ``updates`` into ``base`` on ``key``: an updated row replaces
    the base row, unmatched base rows are kept — the Delta/Iceberg MERGE
    semantics expressed engine-neutrally, including the multiple-match
    rule: ``on_duplicates='error'`` (default, Delta's behavior) raises if
    updates carry the same key twice — a silent pass would emit duplicate
    keys into the snapshot and corrupt every downstream keyed join/agg;
    'keep_min' deterministically keeps the lexicographically-least row
    per key; 'allow' skips the check (caller guarantees uniqueness —
    avoids the validation action).

    Plan: one left-anti join (base minus updated keys) + union. At scale
    the anti-join shuffles on the key once; with both tables bucketed by
    key (sources/serving.write_bucketed) it is shuffle-free. Columns must
    match by name (unionByName). The 'error' check is one cheap
    map-side-combined aggregate action, the same price Delta pays.
    """
    if on_duplicates == "error":
        n_dup = (
            updates.groupBy(key).count().filter(F.col("count") > 1).limit(1).count()
        )
        if n_dup:
            raise ValueError(
                f"merge_upsert: updates contain duplicate {key!r} values "
                "(MERGE multiple-match); dedupe first or pass "
                "on_duplicates='keep_min'"
            )
    elif on_duplicates == "keep_min":
        others = [c for c in updates.columns if c != key]
        packed = updates.groupBy(key).agg(F.min(F.struct(*others)).alias("_r"))
        updates = packed.select(key, *[F.col(f"_r.{c}").alias(c) for c in others])
    elif on_duplicates != "allow":
        raise ValueError("on_duplicates must be 'error', 'keep_min', or 'allow'")
    kept = base.join(updates.select(key).distinct(), key, "left_anti")
    return updates.unionByName(kept.select(*updates.columns))


def merge_scd2(
    base: DataFrame,
    updates: DataFrame,
    key: str,
    effective_col: str = "effective_ts",
) -> DataFrame:
    """Slowly-changing-dimension type 2 merge (the CDC/history pattern
    Delta's MERGE INTO serves; emulated engine-neutrally with anti-join +
    union): ``base`` rows carry (``valid_from``, ``valid_to`` NULL =
    current); each update CLOSES the key's current row (valid_to :=
    update's ``effective_col``) and APPENDS a new current row — history
    rows pass through untouched, so every key's attribute timeline is
    queryable as-of any date.

    Plan: one equi-join (close) + one anti-join (untouched current) +
    unions, all on the key — shuffle-free when base/updates are bucketed
    by the key, like merge_upsert. Updates must be key-unique (validate
    upstream with merge_upsert's on_duplicates='error' check).
    """
    eff = F.col(effective_col)
    attrs = [c for c in updates.columns if c not in (key, effective_col)]
    current = base.filter(F.col("valid_to").isNull())
    history = base.filter(F.col("valid_to").isNotNull())
    closed = (
        current.drop("valid_to")
        .join(updates.select(key, eff.alias("_eff")), key)
        .withColumn("valid_to", F.col("_eff"))
        .drop("_eff")
        .select(*base.columns)
    )
    untouched = current.join(updates.select(key), key, "left_anti").select(*base.columns)
    new_rows = updates.select(
        key,
        *attrs,
        eff.alias("valid_from"),
        F.lit(None).cast("timestamp").alias("valid_to"),
    ).select(*base.columns)
    return history.unionByName(closed).unionByName(untouched).unionByName(new_rows)


def snapshot_diff(
    old: DataFrame, new: DataFrame, key: str, compare_cols: list[str] | None = None
) -> DataFrame:
    """Derive a change feed from two table snapshots: one row per key that
    was INSERTed, DELETEd, or UPDATEd between ``old`` and ``new`` (the
    reverse of applying CDC — what you run when the upstream can't emit
    change events and ships full dumps). Output: (key, op, old/new value
    columns suffixed _old/_new).

    ONE full-outer equi-join on the key; change detection is a null-safe
    column comparison (``eqNullSafe`` per compared column), so the diff
    never hashes or serializes rows Python-side. At 100 TB both snapshots
    bucket by the key and the join is shuffle-free; unchanged keys are
    filtered before the result materializes, so the output is
    proportional to the churn, not the table.
    """
    compare_cols = compare_cols or [c for c in new.columns if c != key]
    # presence is keyed on the join side, not attribute nullability:
    # explicit markers keep all-NULL attribute rows diffing correctly
    o = old.select(
        key, *[F.col(c).alias(f"{c}_old") for c in compare_cols]
    ).withColumn("_in_old", F.lit(True))
    n = new.select(
        key, *[F.col(c).alias(f"{c}_new") for c in compare_cols]
    ).withColumn("_in_new", F.lit(True))
    joined = o.join(n, key, "full_outer")
    same = F.lit(True)
    for c in compare_cols:
        same = same & F.col(f"{c}_old").eqNullSafe(F.col(f"{c}_new"))
    op = (
        F.when(F.col("_in_old").isNull(), F.lit("insert"))
        .when(F.col("_in_new").isNull(), F.lit("delete"))
        .when(~same, F.lit("update"))
    )
    return (
        joined.withColumn("op", op)
        .filter(F.col("op").isNotNull())
        .select(
            key,
            "op",
            *[F.col(f"{c}_old") for c in compare_cols],
            *[F.col(f"{c}_new") for c in compare_cols],
        )
    )


def apply_changes(base: DataFrame, feed: DataFrame, key: str) -> DataFrame:
    """Apply a ``snapshot_diff`` change feed to a base snapshot — the CDC
    APPLY side (what MERGE INTO ... WHEN MATCHED/NOT MATCHED compiles to):
    delete the deletes, upsert the updates+inserts. Inverse property (the
    round-trip the tests pin): ``apply_changes(old, snapshot_diff(old,
    new), key)`` reproduces ``new`` exactly.

    Plan: one anti-join removing touched keys + one union of the feed's
    new-side rows — both on the key, shuffle-free when base and feed are
    bucketed by it (same argument as merge_upsert)."""
    touched = feed.select(key)
    new_rows = feed.filter(F.col("op") != "delete").select(
        key,
        *[
            F.col(f"{c}_new").alias(c)
            for c in base.columns
            if c != key
        ],
    )
    untouched = base.join(touched, key, "left_anti")
    return untouched.unionByName(new_rows)


def scd2_asof(scd2: DataFrame, ts) -> DataFrame:
    """Point-in-time (time-travel) read of an SCD2 history table: the rows
    valid at ``ts`` under the half-open convention ``valid_from <= ts <
    valid_to`` (NULL valid_to = still current). The read side of
    ``merge_scd2`` — what "SELECT ... FOR SYSTEM_TIME AS OF" compiles to
    over an attribute-history table.

    Pure filter: both predicates push down to the scan (min/max row-group
    pruning on valid_from/valid_to), so an as-of read over a 100 TB
    history table touches only row groups whose validity range can
    overlap ``ts``."""
    t = F.lit(ts).cast("timestamp")
    return scd2.filter(
        (F.col("valid_from") <= t)
        & (F.col("valid_to").isNull() | (F.col("valid_to") > t))
    )


def hash_split(df: DataFrame, key: str, train_pct: int = 80) -> DataFrame:
    """Deterministic, engine-portable train/val split: bucket =
    md5(key) first-8-hex-digits mod 100, split = 'train' if bucket <
    ``train_pct``. Pure projection — no shuffle, no RNG, stable across
    engines and runs (the property a reproducible data pipeline needs;
    sample-by-seed is neither portable nor stable under repartitioning).
    """
    bucket = (
        F.conv(F.substring(F.md5(F.col(key).cast("string")), 1, 8), 16, 10)
        .cast("long") % 100
    )
    return df.withColumn(
        "split", F.when(bucket < train_pct, F.lit("train")).otherwise(F.lit("val"))
    )


def split_leakage(pairs: DataFrame, train_pct: int = 80) -> DataFrame:
    """Train/eval CONTAMINATION audit (round 6): near-dup pairs whose
    members land on opposite sides of the deterministic hash split — the
    leakage that silently inflates eval scores when a test doc's
    near-duplicate sits in training. Input is any (doc_a, doc_b)
    candidate-pair table (MinHash-LSH pairs here); the split is
    recomputed from the same md5 arithmetic as ``hash_split``, so the
    audit needs NO join against a split assignment table — two pure
    projections on an already-blocked pair set, then a 4-row-bounded
    groupBy. The (train, val)+(val, train) rows ARE the leak; a clean
    pipeline drops one member of every cross-split pair (or re-splits by
    dedup component, q_dedup_components' output) before training."""

    def split_of(col: str):
        bucket = (
            F.conv(F.substring(F.md5(F.col(col).cast("string")), 1, 8), 16, 10)
            .cast("long") % 100
        )
        return F.when(bucket < train_pct, F.lit("train")).otherwise(F.lit("val"))

    return (
        pairs.select(
            split_of("doc_a").alias("split_a"), split_of("doc_b").alias("split_b")
        )
        .groupBy("split_a", "split_b")
        .agg(F.count("*").cast("bigint").alias("n_pairs"))
    )


def zorder_key(xcol: str, ycol: str, bits: int = 16) -> "F.Column":
    """Morton/Z-order curve key: interleave the low ``bits`` of two int
    columns (x gets odd bit positions, y even). Sorting or range-
    partitioning by this key clusters BOTH dimensions at once, so
    parquet min/max row-group pruning works for predicates on either
    column — the engine-neutral form of Delta's OPTIMIZE ZORDER BY. The
    key is a linear 2·bits-term integer expression: map-side, exactly
    reproducible in any engine (the oracle computes the same sum).

    Layout use at 100 TB: ``repartitionByRange(zorder_key(...))`` +
    sortWithinPartitions before the write — same serving pattern as
    write_bucketed, but for two-dimensional point/range probes."""
    x = F.col(xcol).cast("long")
    y = F.col(ycol).cast("long")
    key = F.lit(0).cast("long")
    # bitwiseAND(1), not % 2: Spark % keeps the dividend sign, so negative
    # inputs would yield -1 "bits" and a corrupt key (engine-portable for
    # any int input this way)
    for b in range(bits):
        key = key + F.shiftleft(F.shiftright(x, b).bitwiseAND(1), 2 * b + 1)
        key = key + F.shiftleft(F.shiftright(y, b).bitwiseAND(1), 2 * b)
    return key


def weighted_sample(
    df: DataFrame, key: str, weight_col: str, k: int = 20
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement (Efraimidis–
    Spirakis A-ES): each row gets priority u^(1/w) for u uniform — the
    top-k priorities are a weighted sample. The uniform comes from md5 of
    the key (not an RNG), so the sample is reproducible across runs,
    engines, and repartitioning — the same portability argument as
    hash_split/balanced_sample, now for WEIGHTED mixture construction
    (e.g. longer docs proportionally more likely).

    Weights must be strictly positive (ln(u) < 0; w ≤ 0 would flip or
    blow up the priority). Ranked by ln(u)/w (monotone in u^(1/w), numerically tamer), rounded
    to 6dp with a key tie-break so both engines order identically; the
    top-k is TakeOrderedAndProject — per-partition heaps, no global
    sort. Map-side otherwise: no shuffle before the top-k merge.
    """
    h = F.conv(F.substring(F.md5(F.col(key).cast("string")), 1, 8), 16, 10).cast(
        "double"
    )
    u = (h + 1.0) / F.lit(float(2**32 + 1))
    priority = F.round(F.log(u) / F.col(weight_col), 6)
    return (
        df.select(key, weight_col, priority.alias("priority"))
        .orderBy(F.desc("priority"), key)
        .limit(k)
    )


def balanced_sample(
    df: DataFrame, group_col: str = "lang", n_per_group: int = 50, key: str = "doc_id"
) -> DataFrame:
    """Deterministic per-group downsampling to ``n_per_group`` rows — the
    language/source-balancing step of corpus assembly. Rows are ranked
    inside each group by md5(key) (a stable pseudo-random order — same
    portability argument as hash_split) and the first n kept, so the
    sample is reproducible across runs, engines, and repartitioning,
    unlike ``sampleBy`` seeds. One shuffle on the group key; the
    within-group sort is bounded per partition (row_number window)."""
    from pyspark.sql import Window

    w = Window.partitionBy(group_col).orderBy(F.md5(F.col(key).cast("string")), key)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= n_per_group)
        .drop("_rn")
    )


def mixture_sample(
    df: DataFrame,
    rates: dict[str, float],
    group_col: str = "source",
    key: str = "doc_id",
    default_rate: float = 0.0,
) -> DataFrame:
    """Deterministic data-mixture sampling: keep each row with its
    group's probability (``rates[group]``, else ``default_rate``) — the
    per-source up/down-weighting step that assembles an LLM training mix
    ("keep 10% of crawl, 100% of curated"). The coin flip is
    md5(key)-derived (first 8 hex digits / 2³²), so the sample is exactly
    reproducible across runs, engines, and repartitioning, and a row's
    fate is stable as rates for OTHER groups change. Pure projection —
    no shuffle, no RNG state; the rate table rides along as a literal
    map expression (broadcast-free at any scale).
    """
    rate_map = F.create_map(*[F.lit(x) for kv in rates.items() for x in kv])
    uniform = (
        F.conv(F.substring(F.md5(F.col(key).cast("string")), 1, 8), 16, 10)
        .cast("double") / F.lit(4294967296.0)
    )
    rate = F.coalesce(rate_map[F.col(group_col)], F.lit(float(default_rate)))
    return df.filter(uniform < rate)


def quantile_filter(
    documents: DataFrame,
    group_col: str = "lang",
    value_col: str = "n_chars",
    quantile: float = 0.5,
) -> DataFrame:
    """Keep rows strictly above their group's exact interpolated
    ``quantile`` of ``value_col`` — per-language quality-threshold
    filtering. The per-group thresholds are a tiny aggregate joined back
    with a broadcast: one shuffle for the agg, zero for the filter join.
    """
    thresholds = documents.groupBy(group_col).agg(
        F.percentile(value_col, F.lit(quantile)).alias("_thr")
    )
    return (
        documents.join(F.broadcast(thresholds), group_col)
        .filter(F.col(value_col) > F.col("_thr"))
        .drop("_thr")
    )


def decontaminate(
    documents: DataFrame, n: int = 5, holdout_mod: int = 10
) -> DataFrame:
    """Benchmark decontamination: find training documents sharing any
    token ``n``-gram with a holdout set (here: docs where
    doc_id % ``holdout_mod`` == 0 stand in for the eval benchmark),
    returning (doc_id, n_shared) distinct-shared-gram counts — the
    contamination scan every LLM training corpus runs against its eval
    suites.

    One tokenize pass feeds both sides: grams materialize map-side
    (sequence → slice → array_join, all JVM HOFs), the holdout
    distinct-gram set is tiny relative to the corpus (eval benchmarks
    are ~10⁴-10⁶ grams at production scale — it broadcasts; here we
    leave join selection to AQE since the stand-in holdout is 10% of
    the corpus), and the hit count is one partial-agg shuffle. n-grams
    join as strings for oracle parity; at 100 TB hash them first
    (``xxhash64``) to shrink the exchange.
    """
    from page_rank_hadoop_spark.functions.text import tokens
    from page_rank_hadoop_spark.sources.catalog import ensure_parallel

    toks = ensure_parallel(documents).select("doc_id", tokens("text").alias("_t"))
    grams = toks.filter(F.size("_t") >= n).select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.size("_t") - n),
                lambda i: F.array_join(F.slice("_t", i + 1, n), " "),
            )
        ).alias("gram"),
    )
    holdout = (
        grams.filter(F.col("doc_id") % holdout_mod == 0).select("gram").distinct()
    )
    return (
        grams.filter(F.col("doc_id") % holdout_mod != 0)
        .join(holdout, "gram")
        .groupBy("doc_id")
        .agg(F.countDistinct("gram").alias("n_shared"))
        .orderBy("doc_id")
    )


def training_shards(
    documents: DataFrame, n_shards: int = 8, n_buckets: int = 32
) -> DataFrame:
    """Deterministic size-balanced shard assignment for training-data
    export, plus the per-shard manifest (doc count, token totals, skew
    vs the ideal even split).

    A single global size-sorted round-robin would balance perfectly but
    serializes into one sort partition; instead docs are salted into
    ``n_buckets`` md5 hash buckets, ranked by token count WITHIN each
    bucket (bounded window partitions), and dealt
    ``(rank * n_buckets + bucket) % n_shards`` — every shard receives
    the k-th largest doc of every bucket in rotation, so shard token
    totals concentrate tightly around the mean (law of large numbers
    across buckets) while every stage stays fully distributed and
    deterministic (md5 salt, doc_id tie-breaks, no RNG).
    """
    from pyspark.sql import Window

    from page_rank_hadoop_spark.functions.text import token_count

    base = documents.select(
        "doc_id",
        token_count("text").alias("n_tokens"),
        (
            F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
            .cast("long") % n_buckets
        ).alias("bucket"),
    )
    w = Window.partitionBy("bucket").orderBy(F.desc("n_tokens"), "doc_id")
    dealt = base.select(
        "doc_id",
        "n_tokens",
        "bucket",
        F.pmod(
            (F.row_number().over(w) - 1) * F.lit(n_buckets) + F.col("bucket"),
            F.lit(n_shards),
        ).cast("int").alias("shard"),
    )
    total = dealt.agg(F.sum("n_tokens").alias("all_tokens"))
    return (
        dealt.groupBy("shard")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("shard_tokens"),
            F.max("n_tokens").alias("max_doc_tokens"),
        )
        .crossJoin(F.broadcast(total))
        .select(
            "shard",
            "n_docs",
            "shard_tokens",
            "max_doc_tokens",
            F.round(
                F.col("shard_tokens") / (F.col("all_tokens") / F.lit(n_shards)), 6
            ).alias("balance_ratio"),
        )
    )


def incremental_agg_maintain(
    old: DataFrame, feed: DataFrame, key: str, group_col: str, sum_col: str
) -> DataFrame:
    """Incremental materialized-view maintenance: update a grouped
    (count, sum) aggregate under a ``snapshot_diff`` change feed WITHOUT
    rescanning the base table — the delta-maintenance algebra behind
    every incremental MV engine.

    Deltas: a delete retracts (−value, −1) from its old group, an insert
    adds (+value, +1) to its new group, an update does both (the row may
    MOVE groups — both legs are emitted, which is the subtlety naive
    implementations miss). The merge is one full-outer join of the
    delta table (churn-sized) onto the stored aggregate
    (group-cardinality-sized) — the base table is never touched, so the
    cost is O(churn + groups) however big the base is. Groups whose
    count reaches zero are dropped, exactly like a re-aggregation would.

    The gate's oracle recomputes the aggregate FROM THE NEW SNAPSHOT —
    an independent derivation, so a hash match proves the maintenance
    algebra, not just the arithmetic.
    """
    old_agg = old.groupBy(group_col).agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum(sum_col).cast("bigint").alias("s"),
    )
    gc_old = F.col(f"{group_col}_old")
    gc_new = F.col(f"{group_col}_new")
    retract = feed.filter(F.col("op").isin("delete", "update")).select(
        gc_old.alias(group_col),
        F.lit(-1).alias("dn"),
        (-F.col(f"{sum_col}_old")).alias("ds"),
    )
    add = feed.filter(F.col("op").isin("insert", "update")).select(
        gc_new.alias(group_col),
        F.lit(1).alias("dn"),
        F.col(f"{sum_col}_new").alias("ds"),
    )
    deltas = retract.unionByName(add).groupBy(group_col).agg(
        F.sum("dn").cast("bigint").alias("dn"),
        F.sum("ds").cast("bigint").alias("ds"),
    )
    merged = old_agg.join(deltas, group_col, "full_outer")
    return (
        merged.select(
            group_col,
            (F.coalesce("n", F.lit(0)) + F.coalesce("dn", F.lit(0))).alias("n_rows"),
            (F.coalesce("s", F.lit(0)) + F.coalesce("ds", F.lit(0))).alias("total"),
        )
        .filter(F.col("n_rows") > 0)
    )


def k_anonymity_report(
    documents: DataFrame, k: int = 5, bucket_width: int = 500
) -> DataFrame:
    """Privacy risk report for a quasi-identifier tuple (lang, source,
    n_chars bucket): every equivalence class with its size and an
    at-risk flag for classes smaller than ``k`` — the k-anonymity check
    run before releasing a dataset whose attribute combination could
    re-identify contributors.

    One partial-agg'd groupBy on the (coarse, bounded-cardinality) QI
    key; output is O(|lang|·|source|·buckets), scale-independent. The
    remediation (suppress or generalize the at-risk classes) composes
    from existing operators: anti-join the flagged classes or widen
    ``bucket_width`` and re-check.
    """
    bucket = (F.col("n_chars") / bucket_width).cast("long") * bucket_width
    return (
        documents.groupBy("lang", "source", bucket.alias("chars_bucket"))
        .agg(F.count("*").cast("bigint").alias("class_size"))
        .select(
            "lang",
            "source",
            "chars_bucket",
            "class_size",
            (F.col("class_size") < k).cast("int").alias("at_risk"),
        )
    )


def pseudonymize(
    events: DataFrame, key_col: str = "user_id", salt: str = "spark-graft-v1"
) -> DataFrame:
    """Deterministic pseudonymization of an identifier column: the id is
    replaced by a 16-hex-char token md5(salt ‖ id) — stable across runs
    and tables (joins on the pseudonym still work), irreversible without
    the salt, engine-portable (the oracle computes the identical token).

    Pure projection, no shuffle. This is pseudonymization, NOT
    anonymization — linkage structure is preserved by design (that is
    what keeps sessionization/attribution working on the pseudonymized
    stream); combine with k_anonymity_report before release.
    """
    token = F.substring(
        F.md5(F.concat(F.lit(salt), F.lit("|"), F.col(key_col).cast("string"))), 1, 16
    )
    return events.select(
        "event_id",
        token.alias("pseudo_id"),
        "event_type",
        F.round("value", 6).alias("value"),
    )


def forget_keys(
    tables: list[tuple[str, DataFrame, str]], predicate_mod: int = 37
) -> DataFrame:
    """Right-to-be-forgotten cascade: delete every row whose key matches
    the deletion predicate across ALL keyed tables, returning the audit
    report (table, rows_before, rows_deleted, rows_after) compliance
    requires. ``tables`` is [(name, df, key_col)].

    The deletion set here is the deterministic ``key % predicate_mod ==
    0`` (the gate needs reproducibility); production passes an explicit
    key list and the per-table delete becomes a broadcast anti-join.
    Each table contributes one conditional-aggregation scan — counts
    derive from ONE pass per table, not three.
    """
    reports = []
    for name, df, key_col in tables:
        hit = (F.col(key_col) % predicate_mod == 0).cast("int")
        rep = df.agg(
            F.count("*").cast("bigint").alias("rows_before"),
            F.sum(hit).cast("bigint").alias("rows_deleted"),
        ).select(
            F.lit(name).alias("table_name"),
            "rows_before",
            "rows_deleted",
            (F.col("rows_before") - F.col("rows_deleted")).alias("rows_after"),
        )
        reports.append(rep)
    out = reports[0]
    for r in reports[1:]:
        out = out.unionByName(r)
    return out


def token_budget_mixture(
    df: DataFrame,
    budget: int,
    group_col: str = "source",
    key: str = "doc_id",
) -> DataFrame:
    """Token-budget-bounded mixture assembly (round 9): per source,
    take documents in deterministic ``key`` order until the source's
    token budget is reached — the "N billion tokens per source" recipe
    step of an LLM training mix (mixture_sample weights by PROBABILITY;
    this caps by VOLUME, which is what data recipes actually specify).
    Greedy prefix rule: a doc is kept iff the tokens BEFORE it are under
    the budget, so the last kept doc may overshoot (deterministic and
    engine-portable; no fractional doc splitting).

    Output: kept rows (source, doc_id, n_tokens, tokens_before). One
    partitioned running-sum window per source — n_sources independent
    streams at full parallelism, no global sort (the
    q_pack_sequences_sharded scale shape)."""
    from pyspark.sql import Window

    from page_rank_hadoop_spark.functions.text import token_count

    from page_rank_hadoop_spark.sources.catalog import ensure_parallel

    d = ensure_parallel(df).select(
        F.col(group_col).alias("source"),
        F.col(key).alias("doc_id"),
        token_count("text").alias("n_tokens"),
    )
    w = Window.partitionBy("source").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, -1
    )
    before = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    return (
        d.select(
            "source",
            "doc_id",
            F.col("n_tokens").cast("int").alias("n_tokens"),
            before.cast("int").alias("tokens_before"),
        )
        .filter(F.col("tokens_before") < budget)
        .orderBy("source", "doc_id")
    )
