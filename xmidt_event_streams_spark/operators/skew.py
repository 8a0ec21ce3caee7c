"""Skew mitigation: salting for hot keys.

AQE's skew-join splitting (on in session.py) handles sort-merge skew
automatically at runtime; salting is the *manual* technique for the
cases AQE can't fix:

  * a join where the skewed side can't be split because a single key's
    rows must meet every matching row of the other side -> replicate
    the small side per salt instead (`salted_join`);
  * an aggregation whose per-key state doesn't reduce map-side (exact
    distinct over a hot group) -> partition the VALUE space by salt so
    per-salt results are disjoint and merge exactly
    (`salted_count_distinct`).

Salts are deterministic (xxhash64 of a data column, not rand()):
task retries and speculative execution see the same salt, so
exactly-once sinks stay idempotent.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, from_col: str | Column, n_salts: int,
              salt_col: str = "_salt") -> DataFrame:
    """Deterministic uniform salt in [0, n_salts): xxhash64 of a data
    column (use a unique-ish id for uniformity on skewed keys)."""
    c = F.col(from_col) if isinstance(from_col, str) else from_col
    return df.withColumn(salt_col, F.pmod(F.xxhash64(c), F.lit(n_salts)))


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    salt_from: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where ``big`` has hot keys and ``small`` is too large
    to broadcast: salt the big side from a unique column, replicate
    the small side once per salt value, join on keys + salt. A hot
    key's rows now spread over ``n_salts`` tasks; shuffle volume of
    the small side grows n_salts x (the price of the technique --
    size n_salts to the observed skew, or let AQE handle mild skew).

    Only joins that never emit an unmatched SMALL-side row are safe:
    with ``right``/``full``/``right_semi``/``right_anti`` an unmatched
    small row would surface once per salt replica (n_salts duplicate
    rows), silently corrupting results -- rejected here at plan time.
    """
    safe = {"inner", "left", "leftouter", "left_outer", "semi",
            "leftsemi", "left_semi", "anti", "leftanti", "left_anti"}
    if how.lower().replace(" ", "") not in safe:
        raise ValueError(
            f"salted_join(how={how!r}): unmatched small-side rows would "
            f"be replicated n_salts times; use one of {sorted(safe)}"
        )
    b = with_salt(big, salt_from, n_salts)
    s = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return b.join(s, on + ["_salt"], how).drop("_salt")


def salted_count_distinct(
    df: DataFrame,
    group_cols: list[str],
    distinct_col: str,
    n_salts: int = 16,
    out_col: str = "n_distinct",
) -> DataFrame:
    """Exact COUNT(DISTINCT distinct_col) GROUP BY group_cols via
    value-space salting: salt = hash(value) % n partitions the value
    domain, so per-(group, salt) distinct sets are disjoint and the
    final SUM over salts is exact. Turns one hot group's distinct
    state into n_salts independent partials -- the exact-distinct plan
    that survives a key owning 10% of 100 TB.
    """
    salted = with_salt(df, distinct_col, n_salts)
    partial = salted.groupBy(*group_cols, "_salt").agg(
        F.countDistinct(distinct_col).alias("_pc")
    )
    return partial.groupBy(*group_cols).agg(F.sum("_pc").alias(out_col))


def hot_keys(
    df: DataFrame,
    key_cols: list[str] | str,
    min_frac: float = 0.01,
    top_n: int = 100,
    sample_fraction: float | None = None,
) -> DataFrame:
    """Skew diagnosis: the join/agg keys owning at least ``min_frac``
    of the rows -- the keys that make a shuffle partition hot and the
    evidence for reaching for :func:`salted_join` (or AQE skew-join
    tuning) instead of guessing.

    Output: (key cols..., n_rows, frac), largest first, capped at
    ``top_n`` (heavy hitters are few by definition -- at most
    1/min_frac keys can exceed min_frac, so the driver-bound result
    is tiny by construction).

    ``sample_fraction`` estimates on a Bernoulli sample for the
    100 TB diagnosis pass: a key at min_frac=1% appears ~frac*N*s
    times in the sample, so even s=0.001 over 10^9 rows estimates
    frequencies to well under 1% relative error. One hash-agg
    shuffle on the key (map-side combined) either way.
    """
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    base = df.sample(fraction=sample_fraction, seed=7) if sample_fraction else df
    counted = base.groupBy(*keys).agg(F.count("*").alias("n_rows"))
    total = base.count()
    if total == 0:
        return counted.withColumn("frac", F.lit(0.0)).limit(0)
    return (
        counted.withColumn(
            "frac", F.round(F.col("n_rows") / F.lit(total), 6)
        )
        .filter(F.col("frac") >= min_frac)
        .orderBy(F.col("n_rows").desc(), *keys)
        .limit(top_n)
    )
