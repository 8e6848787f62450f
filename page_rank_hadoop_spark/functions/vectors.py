"""Vector (array<float/double>) column math for similarity search.

All pure built-in higher-order functions — ``zip_with`` + ``aggregate``
compile to codegen'd loops over the array, no Python. At 100 TB the
brute-force form is a map-side score + top-k; the LSH/IVF variants in
operators/similarity.py bound the candidate set first.
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F


def _sql_double(x: float) -> str:
    """Exact SQL literal for a Python float. ``repr`` emits the shortest
    string that round-trips to the same IEEE-754 double in Python, and
    Spark's parser reads it back to the nearest double — i.e. the same
    bits — so values are identical to ``F.lit(x)`` (pinned in
    tests/test_round11c_opt.py, including subnormals and -0.0)."""
    if math.isnan(x):
        return "double('NaN')"
    if math.isinf(x):
        return "double('Infinity')" if x > 0 else "double('-Infinity')"
    return repr(float(x)) + "D"


def lit_doubles(vals) -> Column:
    """``F.array(*[F.lit(float(v)) for v in vals])``, built as ONE parsed
    SQL expression instead of 1 + len(vals) py4j round trips. Building a
    64-dim literal vector costs ~70 ms through py4j and ~1 ms here; the
    ANN family assembles hundreds of such vectors per query (centroid
    codebooks, hyperplanes, PQ sub-codebooks), so the py4j path charged
    whole seconds of driver time to every probe/assign plan
    (guide §7.3: planning time is driver-side, single-threaded)."""
    vals = list(vals)
    if not vals:
        return F.array().cast("array<double>")
    return F.expr("array(" + ",".join(_sql_double(float(v)) for v in vals) + ")")


def lit_longs(vals) -> Column:
    """``F.array(*[F.lit(int(v)) for v in vals])`` (LongType elements,
    matching ``F.lit``'s Python-int mapping) as one parsed expression."""
    vals = list(vals)
    if not vals:
        return F.array().cast("array<bigint>")
    return F.expr("array(" + ",".join(f"{int(v)}L" for v in vals) + ")")


def lit_double_matrix(rows) -> Column:
    """2-D literal: ``F.array(*[lit_doubles(r) for r in rows])`` in one
    parsed expression (PQ codebooks: m × n_codes × subdim literals)."""
    rows = [list(r) for r in rows]
    inner = [
        "array(" + ",".join(_sql_double(float(v)) for v in r) + ")" for r in rows
    ]
    return F.expr("array(" + ",".join(inner) + ")")


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double"))
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))
