"""Vector (array<float/double>) column math for similarity search.

All pure built-in higher-order functions — ``zip_with`` + ``aggregate``
compile to codegen'd loops over the array, no Python. At 100 TB the
brute-force form is a map-side score + top-k; the LSH/IVF variants in
operators/similarity.py bound the candidate set first.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


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
