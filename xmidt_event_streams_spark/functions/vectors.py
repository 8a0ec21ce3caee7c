"""Vector column functions over array<float|double> embeddings.

Built-in higher-order functions only (zip_with/aggregate run inside
codegen; no Python in the hot path). Inputs are cast to double before
accumulation so results are deterministic and engine-comparable.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def as_double(col: Column | str) -> Column:
    return _c(col).cast("array<double>")


def dot(a: Column | str, b: Column | str) -> Column:
    """Dot product via zip_with + ordered aggregate (deterministic
    summation order: element order)."""
    prod = F.zip_with(as_double(a), as_double(b), lambda x, y: x * y)
    return F.aggregate(prod, F.lit(0.0), lambda acc, x: acc + x)


def norm(a: Column | str) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column | str, b: Column | str) -> Column:
    d = norm(a) * norm(b)
    return F.when(d > 0, dot(a, b) / d).otherwise(F.lit(0.0))


def l2_distance(a: Column | str, b: Column | str) -> Column:
    diff = F.zip_with(as_double(a), as_double(b), lambda x, y: (x - y) * (x - y))
    return F.sqrt(F.aggregate(diff, F.lit(0.0), lambda acc, x: acc + x))


def random_projection_sign_bits(a: Column | str, planes: list[list[float]]) -> Column:
    """SimHash-for-vectors: sign bit per hyperplane -> bucket id string.

    ``planes`` is a plan-time constant (deterministic pseudo-random
    hyperplanes); the result is an LSH bucket key for cosine similarity.
    The input vector is let-bound so the array<double> cast happens once
    per row, not once per hyperplane.
    """
    from xmidt_event_streams_spark.functions.text import let_bind

    def body(v: Column) -> Column:
        bits = [
            F.when(
                F.aggregate(
                    F.zip_with(
                        v,
                        F.array(*[F.lit(float(x)) for x in p]),
                        lambda x, y: x * y,
                    ),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                )
                >= 0,
                "1",
            ).otherwise("0")
            for p in planes
        ]
        return F.concat(*bits)

    return let_bind(as_double(a), body)
