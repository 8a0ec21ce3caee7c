"""Declarative data-quality expectations with a quarantine ledger.

The pipeline's ingestion gates (WRP validation, embedding validation,
quality filters) are each bespoke; this module is the generic form a
warehouse needs at the table level: declare expectations, get back
the passing rows, the quarantined rows WITH their violation list,
and a per-check violation count report -- the same
split-don't-silently-drop posture as ``validate_rejects``.

Checks (a list of tuples, same declarative style as rollup measures):

  ("not_null", [cols...])
  ("unique", [key cols...])           -- duplicate keys (ALL copies
                                         flagged; resolution policy
                                         belongs to dedup operators)
  ("accepted_values", col, [values])  -- nulls pass (compose with
                                         not_null to also reject them)
  ("in_range", col, lo, hi)           -- inclusive bounds, nulls pass
  ("matches", col, regex)             -- nulls pass
  ("foreign_key", col, ref_df, ref_col) -- nulls pass (an FK that
                                         must exist composes with
                                         not_null)

Scale shapes: not_null / accepted_values / in_range / matches are
pure narrow JVM expressions (zero shuffle). unique adds ONE window
shuffle on the key. foreign_key adds one join per FK -- broadcast
when the reference is dimension-sized, else an equi shuffle on the
(uniform) key. The report is one aggregate over boolean sums; no
check ever collects data to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

VIOLATIONS_COL = "_violations"


def _name(check: tuple) -> str:
    kind = check[0]
    target = check[1]
    if isinstance(target, (list, tuple)):
        target = ",".join(target)
    return f"{kind}:{target}"


def with_violations(df: DataFrame, checks: list[tuple]) -> DataFrame:
    """Annotate every row with the names of the checks it violates
    (``_violations`` array<string>; empty = clean row)."""
    flags: list = []  # (name, violated Column)
    for check in checks:
        kind = check[0]
        name = _name(check)
        if kind == "not_null":
            cond = F.lit(False)
            for c in check[1]:
                cond = cond | F.col(c).isNull()
            flags.append((name, cond))
        elif kind == "unique":
            w = Window.partitionBy(*check[1])
            flags.append((name, F.count("*").over(w) > 1))
        elif kind == "accepted_values":
            _, col, values = check
            flags.append(
                (name, F.col(col).isNotNull() & ~F.col(col).isin(list(values)))
            )
        elif kind == "in_range":
            _, col, lo, hi = check
            flags.append(
                (
                    name,
                    F.col(col).isNotNull()
                    & ~F.col(col).between(F.lit(lo), F.lit(hi)),
                )
            )
        elif kind == "matches":
            _, col, regex = check
            flags.append(
                (
                    name,
                    F.col(col).isNotNull() & ~F.regexp_like(col, F.lit(regex)),
                )
            )
        elif kind == "foreign_key":
            _, col, ref_df, ref_col = check
            ref = F.broadcast(
                ref_df.select(F.col(ref_col).alias("_fk_ref")).distinct()
            )
            df = df.join(
                ref, F.col(col) == F.col("_fk_ref"), "left"
            ).withColumn(
                f"_fk_ok_{len(flags)}",
                F.col(col).isNull() | F.col("_fk_ref").isNotNull(),
            ).drop("_fk_ref")
            flags.append((name, ~F.col(f"_fk_ok_{len(flags)}")))
        else:
            raise ValueError(f"unknown expectation kind: {kind}")
    arr = F.array_compact(
        F.array(*[F.when(cond, F.lit(name)) for name, cond in flags])
    )
    out = df.withColumn(VIOLATIONS_COL, arr)
    return out.drop(*[c for c in out.columns if c.startswith("_fk_ok_")])


def enforce(
    df: DataFrame, checks: list[tuple]
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Split into (passed, quarantined, report).

    ``passed`` drops the violations column; ``quarantined`` keeps it
    (the per-row ledger); ``report`` is one row per check with its
    violation count (zero-count checks included, so a silently
    never-firing check is visible)."""
    ann = with_violations(df, checks)
    passed = ann.filter(F.size(VIOLATIONS_COL) == 0).drop(VIOLATIONS_COL)
    quarantined = ann.filter(F.size(VIOLATIONS_COL) > 0)
    names = [_name(c) for c in checks]
    report = ann.agg(
        *[
            F.sum(
                F.array_contains(VIOLATIONS_COL, n).cast("long")
            ).alias(n)
            for n in names
        ],
        F.count("*").alias("_rows"),
    ).select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(n).alias("check"),
                        F.coalesce(F.col(n), F.lit(0)).alias("n_violations"),
                        F.col("_rows").alias("n_rows"),
                    )
                    for n in names
                ]
            )
        ).alias("r")
    ).select("r.check", "r.n_violations", "r.n_rows")
    return passed, quarantined, report
