"""Vector column functions over array<float|double> embeddings.

Two tiers:

  * Built-in higher-order functions (`dot`, `cosine`, `l2_distance`,
    `random_projection_sign_bits`) -- pure Catalyst expressions, no
    Python anywhere. These define the portable semantics (sequential
    left-to-right fold, `when(den > 0)` zero-guard) and are fine for
    per-row use, but Spark evaluates HOF lambdas interpreted
    per-element, which is slow in O(pairs) join hot paths.

  * Arrow-batched numpy kernels (`cosine_pairs`, `sign_bits`,
    `nearest_cells`) -- `pandas_udf`s whose bodies are single BLAS
    matrix ops per Arrow batch. This is the idiomatic Spark answer for
    dense linear algebra the expression language can't vectorize:
    stays narrow (no shuffle), scales linearly with partitions, and
    constant side-inputs (hyperplanes, centroids) ride along in the
    UDF closure -- the moral equivalent of a broadcast variable.
    float64 summation order differs from the sequential fold only at
    the ~1e-15 relative level; every consumer rounds scores to 6dp
    before comparison/ranking, so results are engine-stable.

Inputs are cast to double before accumulation so results are
deterministic and engine-comparable (oracle SQL casts `::DOUBLE[]`).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


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


# ------------------------------------------------- numpy batch kernels


def _stack(s: pd.Series) -> np.ndarray:
    return np.vstack(s.to_numpy())


def cosine_pairs(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity of two vector columns, one Arrow batch at a
    time: three einsum reductions over the stacked batch matrix. Same
    zero-denominator semantics as `cosine` (den > 0 else 0.0)."""

    @pandas_udf("double")
    def _cos(pa: pd.Series, pb: pd.Series) -> pd.Series:
        if len(pa) == 0:
            return pd.Series([], dtype="float64")
        av, bv = _stack(pa), _stack(pb)
        num = np.einsum("ij,ij->i", av, bv)
        den = np.sqrt(np.einsum("ij,ij->i", av, av)) * np.sqrt(
            np.einsum("ij,ij->i", bv, bv)
        )
        out = np.where(den > 0, num / np.where(den > 0, den, 1.0), 0.0)
        return pd.Series(out)

    # asNondeterministic: results ARE deterministic, but this stops
    # Catalyst from substituting the UDF into pushed-down filters
    # (e.g. a threshold on the rounded score), which would evaluate
    # the kernel twice per row (observed in .explain as a second
    # ArrowEvalPython below the Filter)
    return _cos.asNondeterministic()(as_double(a), as_double(b))


def sign_bits(vec: Column | str, planes: list[list[float]]) -> Column:
    """Cosine-LSH bucket key: sign bit per hyperplane, as a '01'
    string. One (batch x dim) @ (dim x planes) matmul per Arrow batch;
    the plane matrix is a plan-time constant in the UDF closure."""
    pm = np.asarray(planes, dtype=np.float64)

    @pandas_udf("string")
    def _bits(v: pd.Series) -> pd.Series:
        if len(v) == 0:
            return pd.Series([], dtype="object")
        signs = _stack(v) @ pm.T >= 0
        chars = np.where(signs, "1", "0")
        return pd.Series(["".join(row) for row in chars])

    # see cosine_pairs: prevents double evaluation under the bucket
    # equi-join's implied isnotnull pushdown
    return _bits.asNondeterministic()(as_double(vec))


def nearest_cells(
    vec: Column | str, centroids: list[list[float]], n_probe: int
) -> Column:
    """The ``n_probe`` nearest centroid indices (array<int>) by cosine,
    rounded to 6dp before ranking so ordering matches any engine that
    rounds the same way; ties broken by lowest cell index (stable
    argsort). One matmul against the centroid matrix per Arrow batch."""
    cm = np.asarray(centroids, dtype=np.float64)
    cn = np.sqrt((cm * cm).sum(axis=1))

    @pandas_udf("array<int>")
    def _cells(v: pd.Series) -> pd.Series:
        if len(v) == 0:
            return pd.Series([], dtype="object")
        m = _stack(v)
        vn = np.sqrt(np.einsum("ij,ij->i", m, m))
        den = np.outer(vn, cn)
        sims = np.where(den > 0, (m @ cm.T) / np.where(den > 0, den, 1.0), 0.0)
        # order by (sim desc, cell asc): stable argsort of -sim keeps
        # equal-sim cells in ascending index order
        order = np.argsort(-np.round(sims, 6), axis=1, kind="stable")
        return pd.Series(list(order[:, :n_probe].astype(np.int32)))

    # see cosine_pairs: prevents double evaluation under the cell
    # equi-join's implied isnotnull pushdown
    return _cells.asNondeterministic()(as_double(vec))


def random_projection_sign_bits(a: Column | str, planes: list[list[float]]) -> Column:
    """SimHash-for-vectors: sign bit per hyperplane -> bucket id string.

    Pure-expression twin of `sign_bits` (reference semantics; slow in
    hot paths). ``planes`` is a plan-time constant; the input vector is
    let-bound so the array<double> cast happens once per row, not once
    per hyperplane.
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
