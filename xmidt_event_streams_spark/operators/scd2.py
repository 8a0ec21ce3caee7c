"""Slowly-changing-dimension (SCD type-2) building and temporal joins.

A change log (key, ts, attrs...) becomes a versioned dimension with
validity intervals, and facts join to the version that was valid AT
THEIR OWN timestamp -- the "what did we know then" join that an
event pipeline needs for attribution, replayable feature
computation, and training-serving skew audits (a model trained on
today's dimension values for yesterday's events is leaking the
future; the temporal join is the fix).

Scale shapes:

  * ``scd2_build`` is one window shuffle on the key (lead() closes
    each version with the next change's timestamp); the optional
    ``collapse`` drops no-op changes (same attrs as the previous
    version) BEFORE interval assignment, so repeated heartbeats of
    an unchanged value produce one long version, not N slivers.
  * ``temporal_join`` is an EQUI join on the key with the interval
    predicate as a residual condition -- per key the version count
    is small (bounded by change frequency), so the residual scan per
    matched key is cheap and no interval binning is needed (contrast
    operators/rangejoin.py, which exists for the keyless case).
    Broadcast the dimension when it fits; otherwise both sides
    shuffle once on the uniform key.

Both are DuckDB-expressible (lead() window + interval join), so the
tests carry oracle twins like the rest of the relational operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_build(
    changes: DataFrame,
    key_col: str,
    ts_col: str,
    attr_cols: list[str],
    collapse: bool = True,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Change log -> versioned dimension:
    (key, attrs..., valid_from, valid_to, version) with half-open
    validity [valid_from, valid_to); the current version has
    valid_to NULL.

    ``collapse=True`` drops records whose attrs equal the previous
    record's attrs for the key (no-op changes). ``tiebreak_col``
    orders same-timestamp changes deterministically (last one wins
    the interval start; required if the log can carry ts ties --
    without it same-ts ordering is nondeterministic)."""
    order = [F.col(ts_col).asc()]
    if tiebreak_col:
        order.append(F.col(tiebreak_col).asc())
    w = Window.partitionBy(key_col).orderBy(*order)
    df = changes
    if collapse:
        same = F.lit(True)
        for a in attr_cols:
            prev = F.lag(a).over(w)
            same = same & (
                (F.col(a) == prev) | (F.col(a).isNull() & prev.isNull())
            )
        # explicit first-row marker: attr-based lag-NULL detection
        # would misfire when the attr itself is legitimately null
        first = F.lag(F.lit(1)).over(w).isNull()
        df = df.withColumn(
            "_noop", ~first & F.coalesce(same, F.lit(False))
        ).filter(~F.col("_noop")).drop("_noop")
    w2 = Window.partitionBy(key_col).orderBy(*order)
    return df.select(
        key_col,
        *attr_cols,
        F.col(ts_col).alias("valid_from"),
        F.lead(ts_col).over(w2).alias("valid_to"),
        F.row_number().over(w2).alias("version"),
    )


def temporal_join(
    facts: DataFrame,
    dim: DataFrame,
    key_col: str,
    fact_ts_col: str,
    broadcast_dim: bool = True,
    how: str = "inner",
) -> DataFrame:
    """Join each fact to the dimension version valid at the fact's
    own timestamp: equi on the key, residual
    ``valid_from <= ts AND (valid_to IS NULL OR ts < valid_to)``.
    Facts before the key's first version drop (inner) or survive
    with null attrs (``how='left'``). At most ONE version matches
    per fact by construction (intervals partition the timeline)."""
    if how not in ("inner", "left"):
        raise ValueError(f"how must be inner|left, got {how}")
    d = dim.alias("d")
    f_ = facts.alias("f")
    dk = F.col(f"d.{key_col}")
    cond = (
        (F.col(f"f.{key_col}") == dk)
        & (F.col("d.valid_from") <= F.col(f"f.{fact_ts_col}"))
        & (
            F.col("d.valid_to").isNull()
            | (F.col(f"f.{fact_ts_col}") < F.col("d.valid_to"))
        )
    )
    right = F.broadcast(d) if broadcast_dim else d
    dim_cols = [
        F.col(f"d.{c}")
        for c in dim.columns
        if c != key_col
    ]
    return f_.join(right, cond, how).select("f.*", *dim_cols)
