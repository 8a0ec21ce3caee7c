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


def _stack_masked(s: pd.Series, dim: int | None = None):
    """Stack a series of vector cells, masking out rows a dense matrix
    can't hold: NULL cells and cells whose length deviates from
    ``dim`` (the constant matrix's dim when given, else the batch's
    modal length). Returns (matrix_of_valid_rows, valid_bool_array).
    Poison rows become NULL in the kernel output instead of killing
    the task (same containment story as multimodal.py)."""
    vals = s.tolist()
    lens = np.array([len(v) if v is not None else -1 for v in vals])
    if dim is None:
        pos = lens[lens >= 0]
        dim = int(np.bincount(pos).argmax()) if len(pos) else 0
    valid = lens == dim
    if valid.any():
        m = np.vstack([vals[i] for i in np.nonzero(valid)[0]]).astype(np.float64)
    else:
        m = np.zeros((0, max(dim, 1)), dtype=np.float64)
    return m, valid


def _scatter(values: np.ndarray, valid: np.ndarray) -> pd.Series:
    """Re-expand kernel outputs over the valid mask; invalid -> None."""
    out = np.full(len(valid), np.nan, dtype="float64")
    out[valid] = values
    s = pd.Series(out)
    return s.where(valid, None)


def cosine_pairs(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity of two vector columns, one Arrow batch at a
    time: three einsum reductions over the stacked batch matrix. Same
    zero-denominator semantics as `cosine` (den > 0 else 0.0); NULL
    cells, length-mismatched pairs, and rows deviating from the
    batch's modal dim yield NULL (masked before the stack -- a poison
    row must not fail the task)."""

    @pandas_udf("double")
    def _cos(pa: pd.Series, pb: pd.Series) -> pd.Series:
        if len(pa) == 0:
            return pd.Series([], dtype="float64")
        va_list, vb_list = pa.tolist(), pb.tolist()
        valid = np.array(
            [
                x is not None and y is not None and len(x) == len(y)
                for x, y in zip(va_list, vb_list)
            ],
            dtype=bool,
        )
        dims = np.array([len(x) if v else -1 for x, v in zip(va_list, valid)])
        if valid.any():
            modal = int(np.bincount(dims[dims >= 0]).argmax())
            valid &= dims == modal
        if not valid.any():
            return pd.Series([None] * len(pa), dtype="object")
        idx = np.nonzero(valid)[0]
        av = np.vstack([va_list[i] for i in idx]).astype(np.float64)
        bv = np.vstack([vb_list[i] for i in idx]).astype(np.float64)
        num = np.einsum("ij,ij->i", av, bv)
        den = np.sqrt(np.einsum("ij,ij->i", av, av)) * np.sqrt(
            np.einsum("ij,ij->i", bv, bv)
        )
        out = np.where(den > 0, num / np.where(den > 0, den, 1.0), 0.0)
        return _scatter(out, valid)

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
        m, valid = _stack_masked(v, dim=pm.shape[1])
        signs = m @ pm.T >= 0
        chars = np.where(signs, "1", "0")
        joined = ["".join(row) for row in chars]
        out = pd.Series([None] * len(v), dtype="object")
        out.iloc[np.nonzero(valid)[0]] = joined
        return out

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
        m, valid = _stack_masked(v, dim=cm.shape[1])
        vn = np.sqrt(np.einsum("ij,ij->i", m, m))
        den = np.outer(vn, cn)
        sims = np.where(den > 0, (m @ cm.T) / np.where(den > 0, den, 1.0), 0.0)
        sims = np.round(sims, 6)
        if n_probe == 1:
            # the ASSIGNMENT hot path (index build over the full
            # corpus): argmax is O(cells)/row where the general
            # argsort is O(cells log cells)/row -- measured 4x+ on a
            # sqrt(N)-cell build. Tie rule identical: argmax returns
            # the FIRST maximal index = stable argsort's lowest cell.
            order = np.argmax(sims, axis=1)[:, None]
        else:
            # order by (sim desc, cell asc): stable argsort of -sim
            # keeps equal-sim cells in ascending index order
            order = np.argsort(-sims, axis=1, kind="stable")
        cells = list(order[:, :n_probe].astype(np.int32))
        out = pd.Series([None] * len(v), dtype="object")
        out.iloc[np.nonzero(valid)[0]] = cells
        return out

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


def validate_embeddings(
    df: "DataFrame",
    dim: int,
    vec_col: str = "embedding",
    allow_zero: bool = False,
):
    """(valid, rejects) gate for an embedding column -- run it ONCE at
    ingest, before anything ANN-shaped. Every kernel downstream
    (cosine_pairs, nearest_cells, pq_encode) CONTAINS poison rows by
    emitting nulls, which is the right per-operator posture but the
    wrong corpus posture: silently null-scored vectors vanish from
    every index and search without a ledger entry. This gate makes
    the loss explicit, with the same (kept, rejects-with-reason)
    contract as the text quality filters and validation rejects.

    Reasons, first match wins: 'null', 'wrong_dim', 'non_finite'
    (NaN/Inf anywhere), 'zero' (zero norm -- cosine-undefined;
    admitted when ``allow_zero``). Pure JVM expressions, one narrow
    pass, no shuffle."""
    c = F.col(vec_col)
    has_non_finite = F.exists(
        c, lambda x: F.isnan(x) | (F.abs(x) > F.lit(1e308))
    )
    is_zero = F.aggregate(
        c, F.lit(0.0), lambda acc, x: acc + x * x
    ) == F.lit(0.0)
    reason = (
        F.when(c.isNull(), "null")
        .when(F.size(c) != dim, "wrong_dim")
        .when(has_non_finite, "non_finite")
    )
    if not allow_zero:
        reason = reason.when(is_zero, "zero")
    reason = reason.otherwise(F.lit(None).cast("string"))
    marked = df.withColumn("_vec_reject", reason)
    valid = marked.filter(F.col("_vec_reject").isNull()).drop("_vec_reject")
    rejects = marked.filter(F.col("_vec_reject").isNotNull()).withColumnRenamed(
        "_vec_reject", "reject_reason"
    )
    return valid, rejects
