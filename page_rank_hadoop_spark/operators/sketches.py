"""Deterministic, engine-portable sketches built from first principles.

The built-in sketch aggregates (``approx_count_distinct`` = HLL++,
``approx_percentile`` = KLL) are estimator-IMPLEMENTATION-specific: two
engines disagree on the estimate even over identical input, which is why
q_approx_distinct / q_approx_quantiles are rows-only checks and their
accuracy is pinned separately (q_sketch_error_bounds). This module takes
the other route the reference's counter-style analytics suggest
(pageRank.scala's driver-read counters): build the sketch FROM ITS
DEFINITION with a deterministic hash, so the full estimator — registers
AND estimate — is reproducible bit-for-bit by any engine, and the DuckDB
oracle can hash-check the whole thing.

HyperLogLog (Flajolet et al. 2007), p=8 → m=256 registers:

- register index = first ``p`` bits of md5(key); rank ``rho`` = position
  of the leftmost 1-bit in the next 56 bits (57 if all zero)
- register value M_j = max rho over rows landing in bucket j — a plain
  ``groupBy(bucket).agg(max(rho))``, map-side combinable, ONE shuffle of
  ≤ groups×256 tiny rows whatever the input size. This is the whole
  scale story: the sketch state is O(m) per group, merged associatively
  — the same property that makes production HLL mergeable across
  partitions, days, and clusters.
- estimate = alpha_m·m²/Z with Z = Σ 2^(−M_j); small-range (linear
  counting) correction below 2.5·m when empty registers remain.

Engine-determinism choices (the repo's float discipline):
- 2^(−M) is computed as 1.0 / (1 << M) — an exact power-of-two division,
  never libm ``pow``.
- Z folds the present registers in ascending bucket order (Spark
  ``F.aggregate`` left fold ≡ DuckDB ``SUM(... ORDER BY bucket)``), then
  adds the empty-register mass as one trailing term — identical
  association both sides.
- the linear-counting ``ln(m/V)`` is the one libm call: its argument is
  an exact small-int ratio and the result is 6dp-rounded BEFORE the
  multiply (the moment-rounding rule), so a ≤1-ulp libm difference
  cannot reach the output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hll_distinct(
    events: DataFrame,
    key: str = "user_id",
    group: str = "event_type",
    p: int = 8,
) -> DataFrame:
    """Per-``group`` deterministic-HLL distinct-count estimate of
    ``key``, beside the exact count and the 3σ accuracy verdict.

    Returns (group, n_exact, v_zero, hll_raw, hll_est, within_3sigma):
    ``v_zero`` = empty registers, ``hll_raw`` the uncorrected estimator,
    ``hll_est`` the served estimate (linear counting below 2.5·m),
    ``within_3sigma`` = |est−exact|/exact ≤ 3·1.04/√m — the published
    error bound, hash-checked as part of the result."""
    regs = hll_registers(events, key=key, group=group, p=p)
    exact = events.groupBy(group).agg(
        F.countDistinct(key).cast("bigint").alias("n_exact")
    )
    return hll_finish(regs, exact, group=group, p=p)


def hll_registers(
    events: DataFrame,
    key: str = "user_id",
    group: str = "event_type",
    p: int = 8,
) -> DataFrame:
    """The sketch STATE: per (group, bucket) max rank — O(m) rows per
    group whatever the input, merged associatively with a plain
    ``max`` (hll_merge). This split is the production shape: registers
    are what you persist per partition/day/source; the estimate is a
    cheap finishing pass."""
    if not 4 <= p <= 12:
        raise ValueError(f"hll_registers: p={p} outside the sane 4..12 range")
    n_hex_bucket = p // 4  # p must be a multiple of 4 for the hex slice
    if n_hex_bucket * 4 != p:
        raise ValueError(f"hll_registers: p={p} must be a multiple of 4")
    w_bits = 56  # 14 hex chars after the bucket slice (md5 has 32)
    h = F.md5(F.col(key).cast("string"))
    bucket = F.conv(F.substring(h, 1, n_hex_bucket), 16, 10).cast("int")
    w = F.conv(F.substring(h, n_hex_bucket + 1, 14), 16, 10).cast("bigint")
    rho = (
        F.when(w == 0, F.lit(w_bits + 1))
        .otherwise(F.lit(w_bits + 1) - F.length(F.bin(w)))
        .cast("int")
    )
    return (
        events.select(F.col(group), bucket.alias("bucket"), rho.alias("rho"))
        .groupBy(group, "bucket")
        .agg(F.max("rho").alias("M"))
    )


def hll_merge(*register_frames: DataFrame, group: str = "event_type") -> DataFrame:
    """Merge independently-built register tables register-wise
    (max per (group, bucket)) — HLL's defining property: the merged
    sketch IS the sketch of the union, exactly. q_hll_merge proves it
    cross-engine by sharing q_hll_sketch's oracle verbatim: the oracle
    sketches the union directly, Spark merges per-slice sketches, and
    the hashes must coincide."""
    merged = register_frames[0]
    for r in register_frames[1:]:
        merged = merged.unionByName(r)
    return merged.groupBy(group, "bucket").agg(F.max("M").alias("M"))


def hll_finish(
    regs: DataFrame,
    exact: DataFrame,
    group: str = "event_type",
    p: int = 8,
) -> DataFrame:
    """Registers → served estimate (the hll_distinct output contract):
    ordered power-of-two fold, linear-counting correction, 3σ verdict
    against the supplied exact counts."""
    m = 1 << p
    regs = regs.withColumn(
        # 2^-M as an exact power-of-two division (bigint shift, no pow)
        "term",
        F.expr("cast(1.0 as double) / cast(shiftleft(cast(1 as bigint), M) as double)"),
    )
    alpha = 0.7213 / (1.0 + 1.079 / m)
    per = regs.groupBy(group).agg(
        F.count("*").alias("n_present"),
        F.array_sort(F.collect_list(F.struct("bucket", "term"))).alias("rs"),
    )
    z = (
        F.aggregate(
            "rs", F.lit(0.0), lambda acc, r: acc + r["term"]
        )
        + (F.lit(float(m)) - F.col("n_present").cast("double"))
    )
    v_zero = (F.lit(m) - F.col("n_present")).cast("int")
    scored = per.select(
        F.col(group),
        v_zero.alias("v_zero"),
        (F.lit(alpha) * m * m / z).alias("raw"),
    )
    # linear counting below 2.5·m while empty registers remain; the ln
    # result is 6dp-prerounded so libm drift cannot reach the output
    corrected = F.when(
        (F.col("raw") <= F.lit(2.5 * m)) & (F.col("v_zero") > 0),
        F.lit(float(m)) * F.round(F.log(F.lit(float(m)) / F.col("v_zero")), 6),
    ).otherwise(F.col("raw"))
    est = scored.select(
        group,
        "v_zero",
        F.round("raw", 6).alias("hll_raw"),
        F.round(corrected, 6).alias("hll_est"),
        corrected.alias("_est_full"),
    )
    bound = 3.0 * 1.04 / (m ** 0.5)
    return (
        est.join(exact, group)
        .select(
            group,
            "n_exact",
            "v_zero",
            "hll_raw",
            "hll_est",
            (
                F.abs(F.col("_est_full") - F.col("n_exact"))
                / F.col("n_exact")
                <= F.lit(bound)
            ).alias("within_3sigma"),
        )
    )


def cms_cells(
    df: DataFrame, key: str = "user_id", d: int = 4, w: int = 256
) -> DataFrame:
    """Count-Min Sketch state (Cormode & Muthukrishnan 2005): d×w counter
    cells over ``key`` occurrences — the frequency sketch beside the
    module's HLL (distinct) and bloom.py (membership). Row r's hash is
    the salted md5 the whole repo uses for engine portability
    (functions/hashing.py): bucket_r = int(md5("r|" + key)[:8], 16) mod w.

    Physical shape: one map-side explode to d (r, bucket) rows per input
    row, then ONE groupBy — the sketch is O(d·w) rows (1024 here) no
    matter the input size, and merges across slices by plain cell-wise
    SUM (cms_merge), the property that makes it shippable across
    partitions/days/sources at 100 TB. Everything is integer arithmetic:
    the estimator has no floats anywhere to drift between engines.
    """
    rows = F.array(
        *[
            F.struct(
                F.lit(r).alias("r"),
                F.pmod(
                    F.conv(
                        F.substring(
                            F.md5(F.concat(F.lit(f"{r}|"), F.col(key).cast("string"))),
                            1,
                            8,
                        ),
                        16,
                        10,
                    ).cast("long"),
                    F.lit(w),
                ).alias("b"),
            )
            for r in range(d)
        ]
    )
    return (
        df.select(F.explode(rows).alias("rb"))
        .select(F.col("rb.r").alias("r"), F.col("rb.b").alias("b"))
        .groupBy("r", "b")
        .agg(F.count("*").cast("long").alias("c"))
    )


def cms_merge(*cell_frames: DataFrame) -> DataFrame:
    """Merge independently-built CMS cell tables cell-wise (SUM per
    (r, b)) — CMS's defining linearity: the merged sketch IS the sketch
    of the concatenated input, exactly. q_cms_merge proves it
    cross-engine by sharing q_cms_topk's oracle verbatim (the hll_merge
    pattern)."""
    merged = cell_frames[0]
    for f in cell_frames[1:]:
        merged = merged.unionByName(f)
    return merged.groupBy("r", "b").agg(F.sum("c").cast("long").alias("c"))


def cms_topk_report(
    df: DataFrame,
    cells: DataFrame | None = None,
    key: str = "user_id",
    k: int = 20,
    d: int = 4,
    w: int = 256,
) -> DataFrame:
    """CMS accuracy report over the ``k`` heaviest keys (exact count
    DESC, key ASC — deterministic): per key, the exact count, the CMS
    estimate (min over its d cells), and two integer verdicts —
    ``never_undercounts`` (est ≥ exact, the sketch's HARD guarantee:
    every cell the key hashes to contains its full count plus
    non-negative collision mass) and ``within_bound``
    (overcount ≤ 3N/w — wider than the e/w·N Markov bound, determinist-
    ically replayed by the oracle either way).

    Probe-side shape: top-k exact keys via TakeOrderedAndProject, d
    probe rows each, equi-joined against the BROADCAST d·w-row cell
    table, one min-groupBy. All integers end to end.
    """
    if cells is None:
        cells = cms_cells(df, key=key, d=d, w=w)
    n_total = df.count()
    bound = (3 * n_total) // w
    exact = df.groupBy(key).agg(F.count("*").cast("long").alias("n_exact"))
    probes = exact.orderBy(F.desc("n_exact"), F.asc(key)).limit(k)
    probe_rows = probes.select(
        key,
        "n_exact",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("r"),
                        F.pmod(
                            F.conv(
                                F.substring(
                                    F.md5(
                                        F.concat(
                                            F.lit(f"{r}|"), F.col(key).cast("string")
                                        )
                                    ),
                                    1,
                                    8,
                                ),
                                16,
                                10,
                            ).cast("long"),
                            F.lit(w),
                        ).alias("b"),
                    )
                    for r in range(d)
                ]
            )
        ).alias("rb"),
    ).select(key, "n_exact", F.col("rb.r").alias("r"), F.col("rb.b").alias("b"))
    return (
        probe_rows.join(F.broadcast(cells), ["r", "b"])
        .groupBy(key, "n_exact")
        .agg(F.min("c").alias("cms_est"))
        .select(
            key,
            "n_exact",
            "cms_est",
            (F.col("cms_est") >= F.col("n_exact")).alias("never_undercounts"),
            ((F.col("cms_est") - F.col("n_exact")) <= F.lit(bound)).alias(
                "within_bound"
            ),
        )
    )
