"""Distribution drift between two table snapshots: PSI per feature.

A training pipeline re-ingests continuously; silent upstream shifts
(a crawler change, a schema default, a bot wave) poison everything
downstream. Population Stability Index is the standard gate: bin the
REFERENCE snapshot by its own quantiles, count both snapshots into
those bins, and sum (cur% - ref%) * ln(cur% / ref%). Rule of thumb:
< 0.1 stable, 0.1-0.25 drifting, > 0.25 shifted (retrain/inspect).

Spark shape: one approxQuantile pass on the reference for the bin
edges (driver holds n_bins doubles), then ONE aggregate per snapshot
-- each is a narrow width-bucket projection plus a hash-agg of
n_bins rows. No joins of data-sized relations; the final PSI sum
joins two n_bins-row frames. Laplace-smoothed counts keep empty bins
finite (the standard epsilon treatment).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _bin_counts(df: DataFrame, col: str, edges: list[float]) -> DataFrame:
    """(bin, n) using half-open quantile bins; values past either
    edge clamp into the end bins (drift often IS out-of-range mass,
    it must be counted, not dropped). NULLs are EXCLUDED: the naive
    when(c >= e).otherwise(0) fold silently lands every null in bin 0
    (null comparisons take the otherwise branch), conflating a
    null-rate regression with low-end value drift -- approxQuantile
    ignores nulls when fitting the edges, so binning must too. The
    null rate is its own signal: psi_report surfaces it per column."""
    c = F.col(col).cast("double")
    arr = F.array(*[F.lit(float(e)) for e in edges])
    bin_ = F.aggregate(
        arr, F.lit(0), lambda acc, e: acc + F.when(c >= e, 1).otherwise(0)
    )
    return (
        df.filter(c.isNotNull())
        .select(bin_.alias("bin"))
        .groupBy("bin")
        .agg(F.count("*").alias("n"))
    )


def psi(
    reference: DataFrame,
    current: DataFrame,
    col: str,
    n_bins: int = 10,
    relative_error: float = 0.001,
    eps: float = 1e-6,
) -> float:
    """PSI of ``current`` against ``reference`` on ``col``. Returns a
    driver-side float (it is a gate metric, not a relation)."""
    qs = [i / n_bins for i in range(1, n_bins)]
    edges = reference.approxQuantile(col, qs, relative_error)
    ref = {r["bin"]: r["n"] for r in _bin_counts(reference, col, edges).collect()}
    cur = {r["bin"]: r["n"] for r in _bin_counts(current, col, edges).collect()}
    n_ref = sum(ref.values())
    n_cur = sum(cur.values())
    if n_ref == 0 or n_cur == 0:
        raise ValueError("both snapshots must be non-empty")
    import math

    total = 0.0
    for b in range(n_bins):
        p = max(ref.get(b, 0) / n_ref, eps)
        q = max(cur.get(b, 0) / n_cur, eps)
        total += (q - p) * math.log(q / p)
    return total


def psi_report(
    reference: DataFrame,
    current: DataFrame,
    cols: list[str],
    n_bins: int = 10,
) -> list[dict]:
    """PSI per column with the standard verdict labels -- the
    drop-ledger analog for distribution health: log it every
    ingestion cycle, alert on 'shifted'. Null rates ride along as
    their own fields (PSI bins exclude nulls, so a schema-default
    regression shows up as ``null_frac_cur`` jumping, not as fake
    bin-0 drift)."""
    n_ref = reference.count()
    n_cur = current.count()
    ref_nulls = reference.agg(
        *[F.sum(F.col(c).isNull().cast("long")).alias(c) for c in cols]
    ).collect()[0]
    cur_nulls = current.agg(
        *[F.sum(F.col(c).isNull().cast("long")).alias(c) for c in cols]
    ).collect()[0]
    out = []
    for c in cols:
        v = psi(reference, current, c, n_bins)
        verdict = "stable" if v < 0.1 else ("drifting" if v < 0.25 else "shifted")
        out.append(
            {
                "col": c,
                "psi": round(v, 6),
                "verdict": verdict,
                "null_frac_ref": round(ref_nulls[c] / n_ref, 6) if n_ref else None,
                "null_frac_cur": round(cur_nulls[c] / n_cur, 6) if n_cur else None,
            }
        )
    return out
