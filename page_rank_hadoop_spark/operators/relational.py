"""General relational surface: multi-way broadcast joins, set ops,
approximate aggregates — the operators the reference lacked entirely
(SURVEY.md §2.2) that any engine replacement must provide.

Join strategy: dimension tables (region/nation/customer/supplier/part)
are broadcast explicitly — at 100 TB lineitem/orders are the only big
sides, so the whole star join is one shuffle-free pass over the fact
table plus the final aggregation exchange."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def revenue_by_nation(
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    nation: DataFrame,
    region: DataFrame,
) -> DataFrame:
    """TPC-H-Q5-shaped star join: revenue per nation, dims broadcast."""
    return (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias(
                "revenue"
            ),
            F.count("*").alias("n_items"),
        )
    )


def shipping_priority(
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    segment: str = "BUILDING",
    cut_date: str = "1998-06-01",
    k: int = 10,
) -> DataFrame:
    """TPC-H-Q3-shaped: top-k unshipped orders by revenue for a market
    segment. Filters reach both scans (pushdown), the filtered customer
    side broadcasts, revenue aggregates with partial agg, and the top-k
    compiles to TakeOrderedAndProject — the canonical selective star
    join + rank pattern."""
    cust = customer.filter(F.col("c_mktsegment") == segment).select("c_custkey")
    ord_f = orders.filter(F.col("o_orderdate") < F.lit(cut_date).cast("timestamp"))
    li_f = lineitem.filter(F.col("l_shipdate") > F.lit(cut_date).cast("timestamp"))
    return (
        li_f.join(ord_f, li_f.l_orderkey == ord_f.o_orderkey)
        .join(F.broadcast(cust), ord_f.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"))
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias(
                "revenue"
            )
        )
        .orderBy(F.desc("revenue"), "o_orderdate", "l_orderkey")
        .limit(k)
    )


def large_volume_orders(
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    min_quantity: float = 250.0,
    k: int = 100,
) -> DataFrame:
    """TPC-H-Q18-shaped: customers whose orders exceed ``min_quantity``
    total units — the aggregate-HAVING-then-join pattern. The qualifying
    set is a groupBy reduction of lineitem (map-side combined, one row
    per big order), so the subsequent joins carry only qualifying orders;
    top-k by order value compiles to TakeOrderedAndProject."""
    big = (
        lineitem.groupBy("l_orderkey")
        .agg(F.round(F.sum("l_quantity"), 4).alias("total_qty"))
        .filter(F.col("total_qty") > min_quantity)
    )
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            "o_totalprice",
            "total_qty",
        )
        .orderBy(F.desc("o_totalprice"), "o_orderdate", "o_orderkey")
        .limit(k)
    )


def pricing_summary(lineitem: DataFrame) -> DataFrame:
    """TPC-H-Q1-shaped wide aggregation (partial agg + one exchange)."""
    return (
        lineitem.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 4).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
            F.count("*").alias("count_order"),
        )
    )


def promo_revenue_by_month(lineitem: DataFrame, part: DataFrame) -> DataFrame:
    """TPC-H-Q14-shaped: per ship-month, the PROMO share of revenue
    ACROSS ALL part types (grouping must differ from the conditioned
    column or the ratio degenerates to 100/0 — Q14's point is the
    sum(when)/sum ratio over a mixed population in one agg pass), plus
    total revenue. Big-fact ⋈ broadcast-dim, one shuffle."""
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        lineitem.join(F.broadcast(part), lineitem.l_partkey == part.p_partkey)
        .groupBy(F.date_format("l_shipdate", "yyyy-MM").alias("ship_month"))
        .agg(
            F.round(
                100.0
                * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0)))
                / F.sum(rev),
                6,
            ).alias("promo_pct"),
            F.round(F.sum(rev), 4).alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


def supplier_revenue(lineitem: DataFrame, supplier: DataFrame, nation: DataFrame) -> DataFrame:
    """Supplier-side star join (TPC-H-Q5 supplier leg): revenue per
    supplier nation, dims broadcast, one fact shuffle for the agg."""
    return (
        lineitem.join(F.broadcast(supplier), lineitem.l_suppkey == supplier.s_suppkey)
        .join(F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias(
                "revenue"
            ),
            F.countDistinct("s_suppkey").cast("bigint").alias("n_suppliers"),
        )
    )


def customers_with_without_orders(customer: DataFrame, orders: DataFrame) -> DataFrame:
    """Set-op surface: INTERSECT (has orders) tagged against EXCEPT (no
    orders) — returns (c_custkey, has_orders)."""
    cust_keys = customer.select("c_custkey")
    order_cust = orders.select(F.col("o_custkey").alias("c_custkey"))
    with_orders = cust_keys.intersect(order_cust).withColumn("has_orders", F.lit(1))
    without = cust_keys.exceptAll(order_cust.distinct()).withColumn("has_orders", F.lit(0))
    return with_orders.unionByName(without)


def price_percentiles(lineitem: DataFrame) -> DataFrame:
    """Exact interpolated percentiles of extended price per return flag.

    ``percentile`` (exact, linear interpolation) matches DuckDB's
    ``quantile_cont`` semantics so the oracle hash-compares; the scale
    path would switch to ``percentile_approx`` (t-digest sketch,
    single-pass mergeable) and a rows-only check.
    """
    pct = F.percentile("l_extendedprice", F.lit([0.25, 0.5, 0.75, 0.95]))
    return lineitem.groupBy("l_returnflag").agg(
        F.to_json(F.transform(pct, lambda x: F.round(x, 4))).alias("pct_json"),
        F.count("*").alias("n"),
    )


def cube_stats(documents: DataFrame) -> DataFrame:
    """CUBE(lang, source) — all 4 grouping sets in one pass (Catalyst
    expands to a single Expand + aggregate, one shuffle)."""
    return (
        documents.cube("lang", "source")
        .agg(F.count("*").alias("n_docs"), F.round(F.avg("n_chars"), 6).alias("avg_chars"))
        .select(
            F.coalesce("lang", F.lit("ALL")).alias("lang"),
            F.coalesce("source", F.lit("ALL")).alias("source"),
            "n_docs",
            "avg_chars",
        )
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    n_salts: int = 8,
    salt_cols: list[str] | None = None,
) -> DataFrame:
    """Skew-resistant equi-join: spread each hot key's big-side rows over
    ``n_salts`` sub-keys (deterministic hash of ``salt_cols``), replicate
    the small side once per salt, join on (key, salt).

    AQE's skew-join split handles sort-merge skew at runtime; this manual
    form is for the cases AQE cannot touch — skewed SHUFFLE-HASH/broadcast
    build sides, pre-aggregation hot keys, or static plans. Cost model: the
    small side grows ×n_salts (keep it the genuinely small side); the big
    side's hot partitions shrink ÷n_salts.
    """
    salt_src = [F.col(c) for c in (salt_cols or big.columns)]
    b = big.withColumn("__salt", F.pmod(F.xxhash64(*salt_src), F.lit(n_salts)).cast("int"))
    s = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return b.join(s, [on, "__salt"]).drop("__salt")


def customer_order_counts(customer: DataFrame, orders: DataFrame) -> DataFrame:
    """LEFT OUTER join surface: every customer with their order count —
    zero for customers without orders (the rows an inner join drops)."""
    counts = orders.groupBy(F.col("o_custkey").alias("c_custkey")).agg(
        F.count("*").alias("n_orders")
    )
    return (
        customer.select("c_custkey")
        .join(counts, "c_custkey", "left")
        .select("c_custkey", F.coalesce("n_orders", F.lit(0)).alias("n_orders"))
    )


def grouping_sets_stats(documents: DataFrame) -> DataFrame:
    """Explicit GROUPING SETS ((lang), (source)) — the two one-dimension
    marginals in one pass, distinct from rollup/cube. Uses the SQL form
    (the DataFrame API has no groupingSets builder)."""
    documents.createOrReplaceTempView("_gs_docs")
    return documents.sparkSession.sql(
        """
        SELECT coalesce(lang, 'ALL') AS lang, coalesce(source, 'ALL') AS source,
               count(*) AS n_docs
        FROM _gs_docs GROUP BY GROUPING SETS ((lang), (source))
        """
    )


def approx_users_per_event_type(events: DataFrame) -> DataFrame:
    """HLL approximate distinct users per event type (sketch aggregate;
    rows-only correctness check — approx by design)."""
    return events.groupBy("event_type").agg(
        F.approx_count_distinct("user_id").alias("approx_users"),
        F.count("*").alias("n_events"),
    )


def local_supplier_volume(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    region: DataFrame,
    region_name: str = "ASIA",
    date_lo: str = "1995-01-01",
    date_hi: str = "1997-01-01",
) -> DataFrame:
    """TPC-H-Q5-shaped snowflake join: revenue per nation from line items
    where the customer and the supplier share the nation, restricted to
    one region and an order-date range.

    Join strategy at scale: region→nation→supplier is a pure dim chain —
    broadcast every step, so the only shuffles are fact-side
    (lineitem⋈orders on orderkey, then ⋈customer on custkey). The
    c_nationkey = s_nationkey co-location predicate rides the broadcast
    supplier join as a residual, never a join reorder hazard. Date and
    region filters sit below every join (pushdown on orders, dim
    pre-filter before broadcast).
    """
    n = nation.join(
        F.broadcast(region.filter(F.col("r_name") == region_name)),
        nation["n_regionkey"] == F.col("r_regionkey"),
    ).select("n_nationkey", "n_name")
    s = supplier.join(
        F.broadcast(n), supplier["s_nationkey"] == F.col("n_nationkey")
    ).select("s_suppkey", "s_nationkey", "n_name")
    o = orders.filter(
        (F.col("o_orderdate") >= F.lit(date_lo)) & (F.col("o_orderdate") < F.lit(date_hi))
    ).select("o_orderkey", "o_custkey")
    lo = lineitem.select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    ).join(o, F.col("l_orderkey") == o["o_orderkey"])
    loc = lo.join(customer.select("c_custkey", "c_nationkey"),
                  F.col("o_custkey") == F.col("c_custkey"))
    full = loc.join(
        F.broadcast(s),
        (F.col("l_suppkey") == s["s_suppkey"])
        & (F.col("c_nationkey") == s["s_nationkey"]),
    )
    return (
        full.groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), "n_name")
    )


def column_profile(df: DataFrame, cols: list[str]) -> DataFrame:
    """One-pass data-quality profile of the given numeric columns, long
    form: (column_name, n_nulls, n_distinct, min_v, max_v, avg_v).

    ONE aggregation job computes every metric for every column (Catalyst
    plans the multi-distinct via a single Expand), then an explode of a
    literal struct array melts the 1-row wide result to long form — no
    per-column scans, no driver loop. At 100 TB the exact multi-column
    countDistinct Expand (×|cols| row multiplier before the partial agg)
    is the knob to watch: swap ``approx_count_distinct`` in for the
    exact one and the profile is a plain single-pass partial agg.
    """
    aggs = []
    for c in cols:
        aggs += [
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"_nulls_{c}"),
            F.countDistinct(c).alias(f"_nd_{c}"),
            F.min(F.col(c).cast("double")).alias(f"_min_{c}"),
            F.max(F.col(c).cast("double")).alias(f"_max_{c}"),
            F.round(F.avg(F.col(c).cast("double")), 6).alias(f"_avg_{c}"),
        ]
    one = df.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(c).alias("column_name"),
                F.col(f"_nulls_{c}").alias("n_nulls"),
                F.col(f"_nd_{c}").alias("n_distinct"),
                F.col(f"_min_{c}").alias("min_v"),
                F.col(f"_max_{c}").alias("max_v"),
                F.col(f"_avg_{c}").alias("avg_v"),
            )
            for c in cols
        ]
    )
    return one.select(F.explode(rows).alias("s")).select("s.*").orderBy("column_name")


def order_priority_counts(
    orders: DataFrame,
    lineitem: DataFrame,
    date_lo: str = "1996-01-01",
    date_hi: str = "1997-01-01",
    late_days: int = 60,
) -> DataFrame:
    """TPC-H-Q4-shaped EXISTS decorrelation: orders in a date range that
    have at least one line item shipped > ``late_days`` after the order
    date, counted per priority. (Q4's commit-vs-receipt predicate is
    adapted to the columns this schema has: ship lag vs order date.)

    The EXISTS becomes a LEFT SEMI join on the order key with the lag
    predicate as a residual condition — the fact table is touched once,
    no correlated re-scan per order. Both sides pushdown-filter before
    the join (date range on orders; the semi join keeps at most one
    match per order so no post-dedup is needed).
    """
    o = orders.filter(
        (F.col("o_orderdate") >= F.lit(date_lo)) & (F.col("o_orderdate") < F.lit(date_hi))
    )
    l = lineitem.select("l_orderkey", "l_shipdate")
    cond = (o["o_orderkey"] == l["l_orderkey"]) & (
        l["l_shipdate"] > o["o_orderdate"] + F.expr(f"INTERVAL {late_days} DAYS")
    )
    return (
        o.join(l, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_orders"))
        .orderBy("o_orderpriority")
    )


def idle_customer_stats(
    customer: DataFrame, orders: DataFrame, since: str = "2000-01-01"
) -> DataFrame:
    """TPC-H-Q22-shaped anti-join + scalar subquery: customers richer
    than the average positive account balance with no order since
    ``since`` (every testdata customer has SOME order, so the recency
    cutoff is what keeps the anti-join arm observable), rolled up per
    market segment.

    The scalar average stays IN the plan: a 1-row aggregate cross-joined
    (Catalyst broadcasts it) rather than collected to the driver; the
    NOT EXISTS is a LEFT ANTI join on the customer key with the date
    filter pushed below the join. Shuffle profile at scale: one agg over
    customer, one anti-join shuffle on custkey (orders projected and
    filtered to the recent keys only), final tiny agg.
    """
    avg_df = customer.filter(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("_avg_bal")
    )
    rich = customer.crossJoin(F.broadcast(avg_df)).filter(
        F.col("c_acctbal") > F.col("_avg_bal")
    )
    recent = orders.filter(F.col("o_orderdate") >= F.lit(since)).select("o_custkey")
    idle = rich.join(recent, rich["c_custkey"] == F.col("o_custkey"), "left_anti")
    return (
        idle.groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_customers"),
            F.round(F.sum("c_acctbal"), 2).alias("total_acctbal"),
        )
        .orderBy("c_mktsegment")
    )


def forecast_revenue(
    lineitem: DataFrame,
    date_lo: str = "1996-01-01",
    date_hi: str = "1997-01-01",
    discount_mid: float = 0.05,
    max_qty: float = 24.0,
) -> DataFrame:
    """TPC-H-Q6-shaped forecasting scan: revenue delta from dropping
    small-quantity discounts in one shipping year — a pure
    filter-and-aggregate with NO join.

    The whole query is a single scan: all three predicates (ship-date
    range, discount band, quantity cap) push into the parquet reader
    (row-group pruning on l_shipdate when the table is date-sorted), the
    projection reads 4 columns, and the aggregate is one partial-agg
    exchange producing one row. The canonical "is pushdown working"
    probe — at 100 TB this should read a small fraction of the table.
    """
    return (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit(date_lo).cast("timestamp"))
            & (F.col("l_shipdate") < F.lit(date_hi).cast("timestamp"))
            & (F.col("l_discount") >= discount_mid - 0.011)
            & (F.col("l_discount") <= discount_mid + 0.011)
            & (F.col("l_quantity") < max_qty)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 4).alias(
                "revenue"
            ),
            F.count("*").alias("n_items"),
        )
    )


def nation_volume_shipping(
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    nation_a: str = "JAPAN",
    nation_b: str = "CHINA",
    date_lo: str = "1995-01-01",
    date_hi: str = "1997-01-01",
) -> DataFrame:
    """TPC-H-Q7-shaped two-nation volume shipping: revenue shipped
    between ``nation_a`` and ``nation_b`` (both directions kept as
    separate rows) per supplier-nation/customer-nation/ship-year.

    The nation pair predicate is a disjunction ACROSS the two broadcast
    dim joins — supplier and customer each pre-join their (2-row
    filtered, broadcast) nation dim, and the cross-nation XOR-ish filter
    `(sn=a AND cn=b) OR (sn=b AND cn=a)` runs after both, on already
    co-located fact rows. Shuffles at scale: lineitem⋈orders on orderkey
    and ⋈customer on custkey only; both nation sides ride broadcasts.
    """
    nat = nation.filter(F.col("n_name").isin([nation_a, nation_b]))
    supp = supplier.join(
        F.broadcast(nat), supplier["s_nationkey"] == nat["n_nationkey"]
    ).select("s_suppkey", F.col("n_name").alias("supp_nation"))
    cust = customer.join(
        F.broadcast(nat), customer["c_nationkey"] == nat["n_nationkey"]
    ).select("c_custkey", F.col("n_name").alias("cust_nation"))
    li = lineitem.filter(
        (F.col("l_shipdate") >= F.lit(date_lo).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(date_hi).cast("timestamp"))
    )
    joined = (
        li.join(orders.select("o_orderkey", "o_custkey"), li["l_orderkey"] == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == cust["c_custkey"])
        .join(F.broadcast(supp), li["l_suppkey"] == supp["s_suppkey"])
        .filter(
            ((F.col("supp_nation") == nation_a) & (F.col("cust_nation") == nation_b))
            | ((F.col("supp_nation") == nation_b) & (F.col("cust_nation") == nation_a))
        )
    )
    return (
        joined.groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue")
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


def returned_items(
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    nation: DataFrame,
    date_lo: str = "1995-01-01",
    date_hi: str = "1995-07-01",
    k: int = 20,
) -> DataFrame:
    """TPC-H-Q10-shaped returned-item ranking: top-k customers by revenue
    lost to returned items (l_returnflag = 'R') for orders in a quarter.

    Plan shape: date filter pushes into the orders scan and the R-flag
    filter into lineitem BEFORE their orderkey shuffle join; the
    customer join shuffles only qualifying rows; nation broadcasts onto
    the agg output (post-agg, one row per customer — join AFTER the
    groupBy so the broadcast touches k-ish rows, not the fact table).
    Top-k compiles to TakeOrderedAndProject.
    """
    o = orders.filter(
        (F.col("o_orderdate") >= F.lit(date_lo).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(date_hi).cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    li = lineitem.filter(F.col("l_returnflag") == "R").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    per_cust = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(
            customer.select("c_custkey", "c_name", "c_acctbal", "c_nationkey"),
            o["o_custkey"] == F.col("c_custkey"),
        )
        .groupBy("c_custkey", "c_name", "c_acctbal", "c_nationkey")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue")
        )
    )
    return (
        per_cust.join(
            F.broadcast(nation.select("n_nationkey", "n_name")),
            per_cust["c_nationkey"] == F.col("n_nationkey"),
        )
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(k)
    )


def customer_distribution(customer: DataFrame, orders: DataFrame) -> DataFrame:
    """TPC-H-Q13-shaped customer-order distribution: how many customers
    placed exactly N orders, including the zero-order bucket — the
    double-aggregation-over-outer-join histogram.

    LEFT join customer→orders (count(o_orderkey) counts only matches, so
    no-order customers land in bucket 0), first groupBy on custkey, then
    the tiny second agg on the count. At scale the first agg can skip
    the join entirely for matched keys (count orders per custkey, then
    right-outer fill) — Catalyst's agg-pushdown handles the projection;
    the orders side is projected to the join key only.
    """
    per_cust = (
        customer.select("c_custkey")
        .join(
            orders.select("o_custkey", "o_orderkey"),
            customer["c_custkey"] == F.col("o_custkey"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


def top_supplier_revenue(
    lineitem: DataFrame,
    supplier: DataFrame,
    date_lo: str = "1996-01-01",
    date_hi: str = "1996-04-01",
) -> DataFrame:
    """TPC-H-Q15-shaped top supplier: supplier(s) whose quarter revenue
    equals the global maximum — Q15's CREATE VIEW + scalar-max subquery
    collapsed into one plan.

    Per-supplier revenue is one partial-agg shuffle over the date-pruned
    fact scan; the max is an empty-frame window over that (tiny) agg
    output, so there's no second scan and no driver round-trip; the
    supplier dim broadcasts onto the ≤#suppliers-row result.
    """
    from pyspark.sql import Window

    rev = (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit(date_lo).cast("timestamp"))
            & (F.col("l_shipdate") < F.lit(date_hi).cast("timestamp"))
        )
        .groupBy("l_suppkey")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("total_revenue")
        )
    )
    w = Window.partitionBy()
    best = rev.withColumn("_max_rev", F.max("total_revenue").over(w)).filter(
        F.col("total_revenue") == F.col("_max_rev")
    )
    return (
        best.join(
            F.broadcast(supplier.select("s_suppkey", "s_name")),
            best["l_suppkey"] == F.col("s_suppkey"),
        )
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


def small_quantity_revenue(
    lineitem: DataFrame, part: DataFrame, brand: str = "Brand#1", factor: float = 0.5
) -> DataFrame:
    """TPC-H-Q17-shaped small-quantity revenue: average yearly revenue
    lost if tiny orders (quantity < ``factor``·avg for that part) of one
    brand's parts weren't filled — the correlated-scalar-AVG
    decorrelation pattern.

    The correlated `(SELECT 0.5*avg(l_quantity) WHERE partkey = outer)`
    becomes ONE groupBy(partkey) avg over the same brand-pruned fact
    subset, joined back on partkey — the fact table is scanned once for
    the avg and once for the probe (both pruned by the broadcast brand
    filter), never per-row. Output is a single row: sum/7.
    """
    bparts = F.broadcast(part.filter(F.col("p_brand") == brand).select("p_partkey"))
    li = lineitem.join(bparts, lineitem["l_partkey"] == F.col("p_partkey")).select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    avg_q = li.groupBy(F.col("l_partkey").alias("_pk")).agg(
        (F.avg("l_quantity") * factor).alias("_cut")
    )
    return (
        li.join(F.broadcast(avg_q), li["l_partkey"] == F.col("_pk"))
        .filter(F.col("l_quantity") < F.col("_cut"))
        .agg(
            F.round(F.sum("l_extendedprice") / 7.0, 4).alias("avg_yearly"),
            F.count("*").alias("n_items"),
        )
    )


def disjunctive_brand_revenue(
    lineitem: DataFrame,
    part: DataFrame,
    cases: tuple = (
        ("Brand#1", 1, 5, 0.0, 20.0),
        ("Brand#2", 1, 10, 10.0, 30.0),
        ("Brand#3", 1, 15, 20.0, 50.0),
    ),
) -> DataFrame:
    """TPC-H-Q19-shaped disjunctive-predicate join: revenue from line
    items matching ANY of several (brand, size range, quantity range)
    clause groups — the OR-of-ANDs residual that defeats naive pushdown.

    The part side pre-filters to the UNION of the brand/size clauses
    (that part IS pushdown-able and broadcasts); the mixed
    part-AND-lineitem conjuncts evaluate as a post-join residual OR. At
    scale the win is that the broadcast carries only clause-matching
    parts, so the fact scan's join selectivity does the heavy pruning.
    """
    psel = None
    for b, slo, shi, _, _ in cases:
        c = (F.col("p_brand") == b) & F.col("p_size").between(slo, shi)
        psel = c if psel is None else (psel | c)
    p = part.filter(psel).select("p_partkey", "p_brand", "p_size")
    joined = lineitem.join(F.broadcast(p), lineitem["l_partkey"] == p["p_partkey"])
    resid = None
    for b, slo, shi, qlo, qhi in cases:
        c = (
            (F.col("p_brand") == b)
            & F.col("p_size").between(slo, shi)
            & F.col("l_quantity").between(qlo, qhi)
        )
        resid = c if resid is None else (resid | c)
    return joined.filter(resid).agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias(
            "revenue"
        ),
        F.count("*").alias("n_items"),
    )


def waiting_suppliers(
    lineitem: DataFrame,
    orders: DataFrame,
    supplier: DataFrame,
    late_days: int = 90,
    k: int = 25,
) -> DataFrame:
    """TPC-H-Q21-shaped sole-late-supplier ranking: suppliers whose line
    item was late on a multi-supplier order where NO other supplier was
    late (lateness = shipped > ``late_days`` after order date, adapting
    Q21's receipt-vs-commit columns to this schema).

    Q21's EXISTS + NOT-EXISTS self-join pair decorrelates into ONE
    per-order aggregate: n_supp = distinct suppliers, n_late_supp =
    distinct late suppliers; a qualifying row is late ∧ n_supp > 1 ∧
    n_late_supp = 1. The fact table is scanned once and shuffled once on
    orderkey (the agg and the probe reuse the same exchange under AQE)
    instead of three times for the three correlated appearances; the
    oracle states the EXISTS form to prove equivalence.
    """
    li = lineitem.join(
        orders.select("o_orderkey", "o_orderdate"),
        lineitem["l_orderkey"] == F.col("o_orderkey"),
    ).select(
        "l_orderkey",
        "l_suppkey",
        (
            F.col("l_shipdate") > F.col("o_orderdate") + F.expr(f"INTERVAL {late_days} DAYS")
        ).alias("_late"),
    )
    per_order = li.groupBy(F.col("l_orderkey").alias("_ok")).agg(
        F.countDistinct("l_suppkey").alias("_n_supp"),
        F.countDistinct(F.when(F.col("_late"), F.col("l_suppkey"))).alias("_n_late"),
    )
    culprit = (
        li.filter(F.col("_late"))
        .join(per_order, F.col("l_orderkey") == F.col("_ok"))
        .filter((F.col("_n_supp") > 1) & (F.col("_n_late") == 1))
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    return (
        culprit.join(
            F.broadcast(supplier.select("s_suppkey", "s_name")),
            culprit["l_suppkey"] == F.col("s_suppkey"),
        )
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(k)
    )


def min_cost_supplier(
    lineitem: DataFrame,
    part: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    region: DataFrame,
    region_name: str = "EUROPE",
    p_type: str = "PROMO",
    max_size: int = 5,
    k: int = 100,
) -> DataFrame:
    """TPC-H-Q2-shaped minimum-cost supplier: for each qualifying part,
    the region's supplier(s) achieving the minimum unit cost.

    This schema has no partsupp, so the supply relationship derives from
    the fact table: unit_cost(part, supp) = min(l_extendedprice /
    l_quantity) over their line items (one partial-agg shuffle on the
    composite key). Q2's correlated `= (SELECT min(ps_supplycost) ...)`
    subquery decorrelates into a per-part min window over the (tiny)
    region-pruned agg output — no second fact scan, no join-back. The
    supplier/nation/region dim chain and the part filter both broadcast.
    """
    from pyspark.sql import Window

    eligible_supp = (
        supplier.join(
            F.broadcast(nation), supplier["s_nationkey"] == nation["n_nationkey"]
        )
        .join(
            F.broadcast(region.filter(F.col("r_name") == region_name)),
            nation["n_regionkey"] == region["r_regionkey"],
        )
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    qparts = part.filter(
        (F.col("p_type") == p_type) & (F.col("p_size") <= max_size)
    ).select("p_partkey")
    cost = (
        lineitem.join(
            F.broadcast(qparts), lineitem["l_partkey"] == F.col("p_partkey")
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost"))
        .join(F.broadcast(eligible_supp), F.col("l_suppkey") == F.col("s_suppkey"))
    )
    w = Window.partitionBy("l_partkey")
    best = cost.withColumn("_min_cost", F.min("unit_cost").over(w)).filter(
        F.col("unit_cost") == F.col("_min_cost")
    )
    return (
        best.select(
            "s_acctbal",
            "s_name",
            "n_name",
            F.col("l_partkey").alias("p_partkey"),
            # portable 4dp rounding: floor(x*1e4 + 0.5)/1e4 runs the same
            # IEEE ops in every engine. F.round would go through Java's
            # shortest-decimal string (10500.67875 -> .6788) while DuckDB
            # rounds the raw double (…74999 -> .6787) — measured drift at
            # sf0.1 on exactly one boundary value.
            (F.floor(F.col("unit_cost") * 10000 + F.lit(0.5)) / 10000).alias("unit_cost"),
        )
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(k)
    )


def market_share(
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    region: DataFrame,
    part: DataFrame,
    target_nation: str = "NATION_3",
    region_name: str = "ASIA",
    p_type: str = "STANDARD",
) -> DataFrame:
    """TPC-H-Q8-shaped national market share: the target nation's share
    of supplier revenue per order-year, within one part type sold to one
    customer region.

    The share's numerator and denominator come from ONE pass: sum(when
    supp_nation = target) / sum(volume) per year — Q8's nested
    all_nations subquery is just a conditional aggregate. Every dim
    (part-type filter, customer→nation→region chain, supplier→nation)
    broadcasts; the only shuffles are the two fact-fact joins on
    orderkey and the final 7-row year aggregation.
    """
    qpart = part.filter(F.col("p_type") == p_type).select("p_partkey")
    cust_region = (
        customer.join(
            F.broadcast(nation), customer["c_nationkey"] == nation["n_nationkey"]
        )
        .join(
            F.broadcast(region.filter(F.col("r_name") == region_name)),
            nation["n_regionkey"] == region["r_regionkey"],
        )
        .select("c_custkey")
    )
    supp_nation = supplier.join(
        F.broadcast(nation.select("n_nationkey", F.col("n_name").alias("supp_nation"))),
        supplier["s_nationkey"] == F.col("n_nationkey"),
    ).select("s_suppkey", "supp_nation")
    vol = (
        lineitem.join(F.broadcast(qpart), lineitem["l_partkey"] == qpart["p_partkey"])
        .join(
            orders.select("o_orderkey", "o_custkey", "o_orderdate"),
            lineitem["l_orderkey"] == F.col("o_orderkey"),
        )
        .join(F.broadcast(cust_region), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(supp_nation), lineitem["l_suppkey"] == F.col("s_suppkey"))
        .select(
            F.year("o_orderdate").alias("o_year"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("volume"),
            F.col("supp_nation"),
        )
    )
    return (
        vol.groupBy("o_year")
        .agg(
            F.round(
                F.sum(F.when(F.col("supp_nation") == target_nation, F.col("volume")).otherwise(0.0))
                / F.sum("volume"),
                6,
            ).alias("mkt_share"),
            F.round(F.sum("volume"), 4).alias("total_volume"),
        )
        .orderBy("o_year")
    )


def product_profit(
    lineitem: DataFrame,
    orders: DataFrame,
    part: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    name_token: str = "widget",
    cost_factor: float = 0.6,
) -> DataFrame:
    """TPC-H-Q9-shaped product-type profit: per supplier-nation × year
    profit on parts whose name contains a token.

    No partsupp/ps_supplycost in this schema, so cost is proxied as
    ``cost_factor · p_retailprice · l_quantity`` (the proxy is a
    broadcast part attribute, preserving Q9's plan shape: fact ⋈
    broadcast part ⋈ broadcast supplier-nation ⋈ orders for the year,
    then one nation×year aggregation). The part-name LIKE prunes the
    broadcast side before the join, so fact selectivity comes free.
    """
    qpart = part.filter(F.col("p_name").contains(name_token)).select(
        "p_partkey", "p_retailprice"
    )
    supp_nation = supplier.join(
        F.broadcast(nation.select("n_nationkey", "n_name")),
        supplier["s_nationkey"] == F.col("n_nationkey"),
    ).select("s_suppkey", "n_name")
    return (
        lineitem.join(F.broadcast(qpart), lineitem["l_partkey"] == qpart["p_partkey"])
        .join(F.broadcast(supp_nation), lineitem["l_suppkey"] == F.col("s_suppkey"))
        .join(
            orders.select("o_orderkey", "o_orderdate"),
            lineitem["l_orderkey"] == F.col("o_orderkey"),
        )
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
            (
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
                - F.lit(cost_factor) * F.col("p_retailprice") * F.col("l_quantity")
            ).alias("amount"),
        )
        .groupBy("nation", "o_year")
        .agg(F.round(F.sum("amount"), 4).alias("sum_profit"))
        .orderBy("nation", F.desc("o_year"))
    )


def important_parts(
    lineitem: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    nation_name: str = "NATION_3",
    factor: float = 2.0,
) -> DataFrame:
    """TPC-H-Q11-shaped important stock: parts whose revenue through one
    nation's suppliers exceeds ``factor`` × that nation's mean part
    value (Q11 uses a fixed fraction of the total; a mean-relative
    threshold keeps the filter observably selective at every SF since
    the part count is fixed while volume grows).

    Q11's HAVING-vs-scalar-subquery shape: ONE groupBy(partkey) agg over
    the nation-pruned fact subset, then the global mean as an
    empty-frame window over the agg output (no second scan, no driver
    round-trip, no cross join) — the same decorrelation used by
    top_supplier_revenue for Q15.
    """
    from pyspark.sql import Window

    nat_supp = supplier.join(
        F.broadcast(nation.filter(F.col("n_name") == nation_name)),
        supplier["s_nationkey"] == F.col("n_nationkey"),
    ).select("s_suppkey")
    per_part = (
        lineitem.join(F.broadcast(nat_supp), lineitem["l_suppkey"] == F.col("s_suppkey"))
        .groupBy(F.col("l_partkey").alias("p_partkey"))
        .agg(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("_val"))
    )
    w = Window.partitionBy()
    return (
        per_part.withColumn("_mean", F.avg("_val").over(w))
        .filter(F.col("_val") > F.lit(factor) * F.col("_mean"))
        .select("p_partkey", F.round("_val", 4).alias("part_value"))
        .orderBy(F.desc("part_value"), "p_partkey")
    )


def late_priority_lines(
    lineitem: DataFrame,
    orders: DataFrame,
    late_days: int = 60,
    date_lo: str = "1996-01-01",
    date_hi: str = "1998-01-01",
) -> DataFrame:
    """TPC-H-Q12-shaped priority split of late shipments: per return
    flag (the schema's shipmode analog), how many late-shipped line
    items belonged to high- vs low-priority orders.

    Late = shipped more than ``late_days`` after the order date
    (adapting Q12's commit/receipt columns). The priority CASE is a
    conditional count inside one partial-agg shuffle; the shipdate range
    predicates push into the parquet scan, and the orders join carries
    only (orderkey, orderdate, orderpriority).
    """
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit(date_lo).cast("timestamp"))
            & (F.col("l_shipdate") < F.lit(date_hi).cast("timestamp"))
        )
        .join(
            orders.select("o_orderkey", "o_orderdate", "o_orderpriority"),
            lineitem["l_orderkey"] == F.col("o_orderkey"),
        )
        .filter(
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr(f"INTERVAL {late_days} DAYS")
        )
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(hi, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(hi, 0).otherwise(1)).alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


def supplier_part_counts(
    lineitem: DataFrame,
    part: DataFrame,
    supplier: DataFrame,
    brand_excl: str = "Brand#1",
    type_excl: str = "PROMO",
    max_size: int = 25,
) -> DataFrame:
    """TPC-H-Q16-shaped parts/supplier relationship: distinct supplier
    count per (brand, type, size) bucket, excluding one brand/type and
    "complaint" suppliers (adapted here as negative account balance).

    The supply relationship is the distinct (partkey, suppkey) pair set
    from the fact table — one partial-agg dedup shuffle. The complaint
    exclusion is Q16's NOT IN: a broadcast LEFT ANTI against the (tiny)
    bad-supplier list, never a shuffle. Part attributes broadcast onto
    the deduped pairs, then one count-distinct aggregation.
    """
    qpart = part.filter(
        (F.col("p_brand") != brand_excl)
        & (~F.col("p_type").startswith(type_excl))
        & (F.col("p_size") <= max_size)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    bad = supplier.filter(F.col("s_acctbal") < 0).select(
        F.col("s_suppkey").alias("_bad_supp")
    )
    pairs = (
        lineitem.select("l_partkey", "l_suppkey")
        .distinct()
        .join(
            F.broadcast(bad), F.col("l_suppkey") == F.col("_bad_supp"), "left_anti"
        )
    )
    return (
        pairs.join(F.broadcast(qpart), pairs["l_partkey"] == qpart["p_partkey"])
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


def promotion_suppliers(
    lineitem: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    date_lo: str = "1996-01-01",
    date_hi: str = "1997-01-01",
    share: float = 0.5,
    min_parts: int = 3,
) -> DataFrame:
    """TPC-H-Q20-shaped dominant suppliers: suppliers who shipped more
    than ``share`` of a contested part's yearly volume for at least
    ``min_parts`` parts.

    Q20's nested `ps_availqty > 0.5 * (SELECT sum(l_quantity) ...)`
    becomes: per-(part, supplier) quantity agg over the year-pruned
    fact scan, per-part totals as a window over that agg (re-using the
    same shuffle partitioning — no second exchange), filter to dominant
    rows on contested parts (≥2 suppliers), then a HAVING count per
    supplier. The supplier/nation dims broadcast onto the final rows.
    """
    from pyspark.sql import Window

    sq = (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit(date_lo).cast("timestamp"))
            & (F.col("l_shipdate") < F.lit(date_hi).cast("timestamp"))
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum("l_quantity").alias("_q"))
    )
    w = Window.partitionBy("l_partkey")
    dominant = (
        sq.withColumn("_tq", F.sum("_q").over(w))
        .withColumn("_ns", F.count("*").over(w))
        .filter((F.col("_ns") >= 2) & (F.col("_q") > F.lit(share) * F.col("_tq")))
    )
    qualifying = (
        dominant.groupBy("l_suppkey")
        .agg(F.count("*").alias("n_dominated"))
        .filter(F.col("n_dominated") >= min_parts)
    )
    return (
        qualifying.join(
            F.broadcast(
                supplier.join(
                    F.broadcast(nation.select("n_nationkey", "n_name")),
                    supplier["s_nationkey"] == F.col("n_nationkey"),
                ).select("s_suppkey", "s_name", "n_name")
            ),
            qualifying["l_suppkey"] == F.col("s_suppkey"),
        )
        .select("s_name", "n_name", "n_dominated")
        .orderBy(F.desc("n_dominated"), "s_name")
    )


def skyline_parts(part: DataFrame) -> DataFrame:
    """2-D SKYLINE (Pareto frontier) over parts, minimizing
    (p_retailprice, p_size): a part survives iff no other part is ≤ on
    both dimensions and < on at least one (Börzsönyi et al., "The
    Skyline Operator", ICDE'01). The cheap-AND-small frontier is the
    classic multi-criteria pick an optimizer or buyer query wants.

    Distributed formulation — NOT the O(n²) dominance self-join: collapse
    to one row per distinct price with the group's min size (one partial-
    agg shuffle), take the running min of size over strictly-cheaper
    prices with a window over DISTINCT prices (tiny), broadcast that
    frontier back onto the parts. A row is dominated iff a strictly
    cheaper price reached its size (prev_min ≤ size) or a same-price
    part is strictly smaller (group min < size). Cost: one agg shuffle
    over distinct prices + a broadcast probe of the fact table — no
    pairwise join anywhere, so it scales to any row count (the frontier
    table is bounded by |distinct prices|).
    """
    from pyspark.sql import Window

    by_price = (
        part.groupBy("p_retailprice")
        .agg(F.min("p_size").alias("grp_min_size"))
    )
    w = Window.orderBy("p_retailprice").rowsBetween(Window.unboundedPreceding, -1)
    frontier = by_price.select(
        "p_retailprice",
        "grp_min_size",
        F.min("grp_min_size").over(w).alias("prev_min_size"),
    )
    return (
        part.join(F.broadcast(frontier), "p_retailprice")
        .filter(
            (F.col("prev_min_size").isNull() | (F.col("prev_min_size") > F.col("p_size")))
            & (F.col("grp_min_size") >= F.col("p_size"))
        )
        .select("p_partkey", "p_name", F.col("p_retailprice"), "p_size")
    )


def dispersion_stats(lineitem: DataFrame) -> DataFrame:
    """Central-tendency/dispersion function surface per return flag:
    interpolated median (the SQL percentile_cont 0.5 both engines
    implement identically), sample stddev, avg, min, max of
    extendedprice — one partial-agg pass; percentile is the only
    full-sort-per-group member and Spark evaluates it with a
    per-partition digest merge, not a global sort."""
    return (
        lineitem.groupBy("l_returnflag")
        .agg(
            F.round(F.expr("percentile(l_extendedprice, 0.5)"), 6).alias("median_price"),
            # 4dp, not 6: stddev/avg accumulate over the whole group and the
            # two engines' summation orders differ at the ~1e-5 level
            F.round(F.stddev_samp("l_extendedprice"), 4).alias("stddev_price"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.min("l_extendedprice"), 6).alias("min_price"),
            F.round(F.max("l_extendedprice"), 6).alias("max_price"),
            F.count("*").alias("n"),
        )
    )


def mad_outliers(events: DataFrame, cutoff: float = 3.5) -> DataFrame:
    """Robust anomaly detection: per event_type median + MAD (median
    absolute deviation), then the modified z-score
    ``0.6745 * (value - med) / mad`` flags events with |score| > cutoff.

    Two aggregation passes over the stream, each a partial-agg'd groupBy
    on the tiny event_type key (exact interpolated ``percentile`` — the
    robust-statistics analog of q_percentiles), and the per-event scoring
    join broadcasts the 5-row stats frame, so the fact table is scanned
    twice and never shuffled on a data-sized key. Groups with mad == 0
    (constant-valued types) are excluded rather than dividing by zero.
    """
    med = events.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("med")
    )
    dev = events.join(F.broadcast(med), "event_type").withColumn(
        "absdev", F.abs(F.col("value") - F.col("med"))
    )
    stats = dev.groupBy("event_type", "med").agg(
        F.expr("percentile(absdev, 0.5)").alias("mad")
    )
    score = F.lit(0.6745) * (F.col("value") - F.col("med")) / F.col("mad")
    return (
        events.join(F.broadcast(stats), "event_type")
        .filter(F.col("mad") > 0)
        .filter(F.abs(score) > cutoff)
        .select(
            "event_id",
            "event_type",
            F.round("value", 6).alias("value"),
            F.round("med", 6).alias("med"),
            F.round("mad", 6).alias("mad"),
            F.round(score, 6).alias("mz_score"),
        )
    )


def market_basket(
    lineitem: DataFrame, min_pair_orders: int = 3, top_k: int = 100
) -> DataFrame:
    """Frequent-itemset pairs (market basket): parts co-ordered in the
    same order, with pair support and Jaccard affinity
    ``n_both / (n_a + n_b - n_both)``.

    The within-order self-join's fan-out is bounded by order SIZE
    (≤ lines²/order, ~50 rows per order), not table size — the shuffle
    key is l_orderkey on both sides, so the pair generation is a single
    co-partitioned join. Per-part supports come from a separate
    partial-agg'd count; the support table is part-dimension-scale, so
    the enrichment joins are left to AQE (broadcast when it fits,
    shuffle otherwise) rather than force-broadcast. Top-k with full
    deterministic tie-break (support desc, part_a, part_b) →
    TakeOrderedAndProject.
    """
    op = lineitem.select("l_orderkey", "l_partkey").distinct()
    a = op.alias("a")
    b = op.alias("b")
    pairs = (
        a.join(b, "l_orderkey")
        .filter(F.col("a.l_partkey") < F.col("b.l_partkey"))
        .groupBy(
            F.col("a.l_partkey").alias("part_a"),
            F.col("b.l_partkey").alias("part_b"),
        )
        .agg(F.count("*").alias("n_both"))
        .filter(F.col("n_both") >= min_pair_orders)
    )
    support = op.groupBy("l_partkey").agg(F.count("*").alias("n_orders"))
    return (
        pairs.join(
            support.withColumnRenamed("l_partkey", "part_a")
            .withColumnRenamed("n_orders", "n_a"),
            "part_a",
        )
        .join(
            support.withColumnRenamed("l_partkey", "part_b")
            .withColumnRenamed("n_orders", "n_b"),
            "part_b",
        )
        .select(
            "part_a",
            "part_b",
            "n_both",
            "n_a",
            "n_b",
            F.round(
                F.col("n_both") / (F.col("n_a") + F.col("n_b") - F.col("n_both")), 6
            ).alias("jaccard"),
        )
        .orderBy(F.desc("n_both"), "part_a", "part_b")
        .limit(top_k)
    )


def rfm_scores(orders: DataFrame, n_tiles: int = 4) -> DataFrame:
    """Customer RFM segmentation: per-customer recency (days since last
    order, vs the corpus max date), frequency (order count) and monetary
    (total spend) are each quartiled with ``ntile`` (deterministic
    custkey tie-breaks), and the result is the segment-level rollup
    (count + average spend per (r, f, m) cell, ≤ n_tiles³ rows).

    One shuffle builds the per-customer aggregate; the ntile windows
    run over the CUSTOMER table (dimension-sized, not fact-sized). At
    100 TB the global ntile sort would become approx-quantile bucket
    boundaries (percentile_approx + broadcast range lookup) — same
    contract, documented swap.
    """
    from pyspark.sql import Window

    maxd = orders.agg(F.max("o_orderdate").alias("max_d"))
    cust = (
        orders.crossJoin(F.broadcast(maxd))
        .groupBy("o_custkey")
        .agg(
            F.datediff(F.first("max_d"), F.max("o_orderdate")).alias("rec_days"),
            F.count("*").alias("freq"),
            F.sum("o_totalprice").alias("monetary"),
        )
    )
    scored = cust.select(
        "o_custkey",
        "rec_days",
        "freq",
        "monetary",
        F.ntile(n_tiles)
        .over(Window.orderBy(F.col("rec_days").asc(), F.col("o_custkey")))
        .alias("r_tile"),
        F.ntile(n_tiles)
        .over(Window.orderBy(F.col("freq").desc(), F.col("o_custkey")))
        .alias("f_tile"),
        F.ntile(n_tiles)
        .over(Window.orderBy(F.col("monetary").desc(), F.col("o_custkey")))
        .alias("m_tile"),
    )
    return scored.groupBy("r_tile", "f_tile", "m_tile").agg(
        F.count("*").alias("n_customers"),
        F.round(F.avg("monetary"), 6).alias("avg_monetary"),
    )


def skew_report(df: DataFrame, key_col: str) -> DataFrame:
    """Join-key skew diagnostic: one summary row over the per-key count
    distribution — key cardinality, mean/median/p99/max counts, the
    heaviest key, and the max/mean skew ratio that predicts whether a
    shuffle on this key needs salting or AQE skew handling.

    Two aggregations: the per-key count (partial-agg'd on the key being
    diagnosed — the same shuffle the real join would do) and a single-row
    rollup over the count distribution (exact interpolated percentiles;
    keys-space-sized input, scale-independent output). The heaviest key
    is a deterministic argmax — min(struct(−count, key)) breaks count
    ties toward the smallest key, and only negates the COUNT (always
    numeric), so the key column may be any orderable type (string join
    keys are the common skew-diagnostic target).
    """
    counts = df.groupBy(F.col(key_col).alias("k")).agg(F.count("*").alias("c"))
    top = F.min(F.struct((-F.col("c")).alias("negc"), F.col("k").alias("k")))
    return counts.agg(
        F.count("*").cast("bigint").alias("n_keys"),
        F.round(F.avg("c"), 6).alias("mean_cnt"),
        F.round(F.expr("percentile(c, 0.5)"), 6).alias("p50_cnt"),
        F.round(F.expr("percentile(c, 0.99)"), 6).alias("p99_cnt"),
        F.max("c").alias("max_cnt"),
        top.alias("_t"),
    ).select(
        "n_keys",
        "mean_cnt",
        "p50_cnt",
        "p99_cnt",
        "max_cnt",
        F.col("_t.k").alias("top_key"),
        F.round(F.col("max_cnt") / F.col("mean_cnt"), 6).alias("skew_ratio"),
    )


def equidepth_histogram(
    lineitem: DataFrame, col: str = "l_extendedprice", n_buckets: int = 10
) -> DataFrame:
    """Equi-depth (quantile) histogram: bucket boundaries from ONE exact
    interpolated percentile aggregate, then a second pass assigns each
    row by counting boundaries below its value (an ``F.aggregate`` fold
    over the broadcast boundary array — pure JVM arithmetic).

    This is the scale-correct alternative to ``ntile`` over the fact
    table: ntile needs a GLOBAL sort window (one partition holds
    everything); boundaries + fold is two partial-agg'd scans with a
    9-element broadcast in between — same result bucketing, no global
    sort anywhere. The measured cost is ~all in the exact percentile
    aggregate (value-multiset merge); at 100 TB swap it for
    ``percentile_approx`` (fixed-size mergeable sketch) — the bucket
    depths become approximate but the plan shape is unchanged (the
    q_percentiles/q_approx_quantiles pairing documents the same dial).
    """
    qs = [i / n_buckets for i in range(1, n_buckets)]
    bounds = lineitem.agg(
        F.percentile(col, F.lit(qs)).alias("bs")
    )
    v = F.col(col)
    bucket = F.aggregate(
        F.col("bs"),
        F.lit(0),
        lambda acc, b: acc + F.when(v > b, 1).otherwise(0),
    )
    return (
        lineitem.select(col)
        .crossJoin(F.broadcast(bounds))
        .groupBy(bucket.alias("bucket"))
        .agg(
            F.count("*").alias("n_rows"),
            F.round(F.min(v), 4).alias("lo"),
            F.round(F.max(v), 4).alias("hi"),
            F.round(F.sum(v), 4).alias("total"),
        )
    )


def ab_ttest(
    events: DataFrame, type_a: str = "click", type_b: str = "view"
) -> DataFrame:
    """Welch's two-sample t-test between two event types on ``value``:
    one conditional-aggregation pass computes both groups' n/mean/var,
    then the t statistic and Welch–Satterthwaite degrees of freedom are
    closed-form scalar arithmetic — the A/B-readout operator, one
    partial-agg'd scan, single-row output at any scale.

    Means and variances are ROUNDED to 6dp before entering the t
    formula (the cusum lesson: partial-agg summation order differs
    between engines by ~1 ulp; rounding the inputs makes the derived
    statistic bit-identical rather than hoping the output rounding
    doesn't straddle a boundary).
    """
    a = F.col("event_type") == type_a
    b = F.col("event_type") == type_b
    # n_a/n_b count NON-NULL observations (F.count over the same
    # conditional column the moments use) so t and the Welch df stay
    # consistent with mean/var if `value` is ever nullable
    agg = events.filter(a | b).agg(
        F.count(F.when(a, F.col("value"))).cast("bigint").alias("n_a"),
        F.count(F.when(b, F.col("value"))).cast("bigint").alias("n_b"),
        F.round(F.avg(F.when(a, F.col("value"))), 6).alias("mean_a"),
        F.round(F.avg(F.when(b, F.col("value"))), 6).alias("mean_b"),
        F.round(F.var_samp(F.when(a, F.col("value"))), 6).alias("var_a"),
        F.round(F.var_samp(F.when(b, F.col("value"))), 6).alias("var_b"),
    )
    sa = F.col("var_a") / F.col("n_a")
    sb = F.col("var_b") / F.col("n_b")
    t = (F.col("mean_a") - F.col("mean_b")) / F.sqrt(sa + sb)
    df_w = (sa + sb) * (sa + sb) / (
        sa * sa / (F.col("n_a") - 1) + sb * sb / (F.col("n_b") - 1)
    )
    return agg.select(
        "n_a",
        "n_b",
        "mean_a",
        "mean_b",
        "var_a",
        "var_b",
        F.round(t, 6).alias("t_stat"),
        F.round(df_w, 6).alias("welch_df"),
    )


def data_quality_checks(lineitem: DataFrame, orders: DataFrame) -> DataFrame:
    """Declarative data-quality validation (the Deequ/expectations
    surface): a fixed suite of constraint checks — range, not-null,
    referential integrity, key uniqueness — each evaluated as a
    violation COUNT so one report row per check comes back regardless
    of table size.

    Plan shape per check class: range/not-null checks share ONE
    conditional-aggregation scan of the fact table (no per-check
    passes); the FK check is a left-anti join (violations ∝ orphans);
    uniqueness is a keyed partial-agg count HAVING >1. The union is a
    five-row frame — scale-independent output, and every check's scan
    prunes to just the columns it validates.
    """
    spark = lineitem.sparkSession

    def one(name: str, cnt):
        return F.struct(F.lit(name).alias("check_name"), cnt.alias("n_violations"))

    scans = lineitem.agg(
        one(
            "l_quantity_in_1_45",
            F.sum(
                (~F.col("l_quantity").between(1.0, 45.0)).cast("int")
            ).cast("bigint"),
        ).alias("c1"),
        one(
            "l_discount_le_0.08",
            F.sum((F.col("l_discount") > 0.08).cast("int")).cast("bigint"),
        ).alias("c2"),
        one(
            "l_shipdate_not_null",
            F.sum(F.col("l_shipdate").isNull().cast("int")).cast("bigint"),
        ).alias("c3"),
    ).select(F.explode(F.array("c1", "c2", "c3")).alias("r")).select("r.*")
    fk = (
        lineitem.select("l_orderkey")
        .join(orders.select(F.col("o_orderkey").alias("l_orderkey")), "l_orderkey", "left_anti")
        .agg(F.count("*").cast("bigint").alias("n_violations"))
        .select(F.lit("l_orderkey_fk_orders").alias("check_name"), "n_violations")
    )
    uniq = (
        lineitem.groupBy("l_orderkey", "l_linenumber")
        .agg(F.count("*").alias("c"))
        .filter(F.col("c") > 1)
        .agg(F.count("*").cast("bigint").alias("n_violations"))
        .select(F.lit("pk_orderkey_linenumber_unique").alias("check_name"), "n_violations")
    )
    report = scans.unionByName(fk).unionByName(uniq)
    return report.select(
        "check_name",
        "n_violations",
        (F.col("n_violations") == 0).cast("int").alias("passed"),
    )


def cohort_ltv(orders: DataFrame, max_offset: int = 3) -> DataFrame:
    """Cohort lifetime value: customers grouped by first-order month;
    for each (cohort month, month offset ≤ max_offset) the number of
    active customers and their revenue — the revenue-sided sibling of
    cohort retention.

    Two keyed aggregations (per-customer cohort min; per (cohort,
    offset) rollup) + one join back on o_custkey — the fact table's
    natural partitioning, reused. Output is O(months × offsets),
    scale-independent. Month arithmetic is integer (yyyy·12 + mm), no
    date subtraction ambiguity between engines.
    """
    om = (F.year("o_orderdate") * 12 + F.month("o_orderdate") - 1).alias("om")
    base = orders.select("o_custkey", "o_totalprice", om)
    first = base.groupBy("o_custkey").agg(F.min("om").alias("cohort_m"))
    j = base.join(first, "o_custkey").withColumn(
        "offset", F.col("om") - F.col("cohort_m")
    )
    return (
        j.filter(F.col("offset") <= max_offset)
        .groupBy("cohort_m", "offset")
        .agg(
            F.countDistinct("o_custkey").cast("bigint").alias("n_customers"),
            F.round(F.sum("o_totalprice"), 4).alias("revenue"),
        )
        .select(
            F.concat_ws(
                "-",
                (F.col("cohort_m") / 12).cast("int").cast("string"),
                F.lpad((F.col("cohort_m") % 12 + 1).cast("string"), 2, "0"),
            ).alias("cohort_month"),
            F.col("offset").cast("int").alias("month_offset"),
            "n_customers",
            "revenue",
        )
    )


# Benford first-digit expectations log10(1 + 1/d), precomputed as
# literals so NEITHER engine's libm log is in the compared output.
_BENFORD = {
    1: 0.30103, 2: 0.176091, 3: 0.124939, 4: 0.09691, 5: 0.079181,
    6: 0.066947, 7: 0.057992, 8: 0.051153, 9: 0.045757,
}


def benford_screen(orders: DataFrame, col: str = "o_totalprice") -> DataFrame:
    """Benford's-law screen over a monetary column (the classic fraud /
    synthetic-data detector): observed first-significant-digit shares
    vs the log10(1+1/d) expectation, with each digit's absolute
    deviation. One map-side digit extraction (string head of the
    absolute value — no float log in the hot path or the output) + one
    9-key partial-agg count.
    """
    d = F.substring(F.regexp_replace(F.abs(F.col(col)).cast("string"), "[.0]*", ""), 1, 1)
    counts = (
        orders.filter(F.col(col) != 0)
        .select(d.cast("int").alias("digit"))
        .filter(F.col("digit").between(1, 9))
        .groupBy("digit")
        .agg(F.count("*").alias("n"))
    )
    total = counts.agg(F.sum("n").alias("t"))
    expected = F.element_at(
        F.create_map(*[F.lit(x) for kv in _BENFORD.items() for x in kv]),
        F.col("digit"),
    )
    return (
        counts.crossJoin(F.broadcast(total))
        .select(
            "digit",
            F.col("n").cast("bigint").alias("n"),
            F.round(F.col("n") / F.col("t"), 6).alias("observed"),
            expected.alias("expected"),
            F.round(F.abs(F.col("n") / F.col("t") - expected), 6).alias("abs_dev"),
        )
    )


def monthly_churn(orders: DataFrame) -> DataFrame:
    """Monthly customer churn: for every month m (except the last, which
    has no lookahead), the active customers, how many came back in m+1,
    and the churn rate 1 − retained/active — the subscription-health
    counterpart of cohort retention (which tracks a fixed cohort; churn
    re-bases every month).

    Distinct (customer, month) pairs → ONE self-join keyed on
    (customer, month+1) → month rollup. Integer month index arithmetic
    (yyyy·12+mm) keeps the join key exact; the last-month cutoff is a
    single-row max broadcast. Everything partial-aggregates; output is
    O(months).
    """
    om = (F.year("o_orderdate") * 12 + F.month("o_orderdate") - 1).alias("om")
    cm = orders.select("o_custkey", om).distinct()
    nxt = cm.select("o_custkey", (F.col("om") - 1).alias("om"))
    maxm = cm.agg(F.max("om").alias("mx"))
    joined = cm.join(
        nxt.withColumn("_next", F.lit(1)), ["o_custkey", "om"], "left"
    )
    return (
        joined.crossJoin(F.broadcast(maxm))
        .filter(F.col("om") < F.col("mx"))
        .groupBy("om")
        .agg(
            F.count("*").cast("bigint").alias("n_active"),
            F.sum(F.coalesce("_next", F.lit(0))).cast("bigint").alias("n_retained"),
        )
        .select(
            F.concat_ws(
                "-",
                (F.col("om") / 12).cast("int").cast("string"),
                F.lpad((F.col("om") % 12 + 1).cast("string"), 2, "0"),
            ).alias("month"),
            "n_active",
            "n_retained",
            F.round(F.lit(1.0) - F.col("n_retained") / F.col("n_active"), 6).alias(
                "churn_rate"
            ),
        )
    )
