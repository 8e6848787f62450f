"""Arrow-batched Python operators — the surfaces Catalyst has no builtin
for, each used only where a column expression cannot express the
semantics (SURVEY.md §2.2 UDF row). Completes the UDF taxonomy together
with multimodal/binary_ops (mapInPandas) and streaming/stateful
(applyInPandasWithState):

- ``zscore_per_group``  : applyInPandas group-map (whole-group pandas
  transform; here a per-language z-score — in production, per-group model
  scoring or resampling)
- ``weighted_avg_chars``: grouped-aggregate pandas_udf (custom UDAF shape)

Scale notes: both shuffle once on the group key and stream Arrow batches
per group; group size bounds executor memory (a 100 TB run keys by a
high-cardinality column, exactly like these)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


def zscore_per_group(documents: DataFrame, group_col: str = "lang") -> DataFrame:
    """Per-group population z-score of n_chars via applyInPandas.

    Python is genuinely required only for group-local logic no expression
    covers (imagine sklearn scoring per group); z-score keeps the oracle
    expressible (window avg/stddev_pop in SQL) so the Arrow plumbing is
    gate-checked.
    """

    def norm(pdf: pd.DataFrame) -> pd.DataFrame:
        mu = pdf["n_chars"].mean()
        sd = pdf["n_chars"].std(ddof=0)  # population, matches stddev_pop
        z = (pdf["n_chars"] - mu) / sd if sd > 0 else pdf["n_chars"] * 0.0
        return pd.DataFrame(
            {"doc_id": pdf["doc_id"], group_col: pdf[group_col], "z": z.round(6)}
        )

    return documents.select("doc_id", group_col, "n_chars").groupBy(group_col).applyInPandas(
        norm, schema=f"doc_id long, {group_col} string, z double"
    )


@pandas_udf("double")
def _weighted_avg(v: pd.Series, w: pd.Series) -> float:
    return float((v * w).sum() / w.sum())


def weighted_avg_chars(documents: DataFrame) -> DataFrame:
    """Custom UDAF shape: weighted average of n_chars per lang with a
    deterministic per-doc weight, as a grouped-aggregate pandas_udf."""
    d = documents.select(
        "lang",
        F.col("n_chars").cast("double").alias("v"),
        (F.pmod("doc_id", F.lit(5)) + 1).cast("double").alias("w"),
    )
    # NB: a grouped-agg pandas UDF cannot share an Aggregate with built-in
    # aggregate functions (INVALID_PANDAS_UDF_PLACEMENT) — keep it alone
    return d.groupBy("lang").agg(F.round(_weighted_avg("v", "w"), 6).alias("wavg_chars"))
