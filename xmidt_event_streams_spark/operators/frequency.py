"""Exact frequent items (heavy hitters) at corpus scale.

The vocabulary of a 100 TB corpus does not fit anywhere, but the
tokens that matter for curation decisions -- boilerplate markers,
stop-word inventories, candidate merge pairs for BPE, domain
signatures -- are the ones above a support threshold phi. A naive
``groupBy(token).count()`` shuffles EVERY distinct token (the long
tail is the bulk); the classic fix is candidate-then-verify over
bounded per-partition summaries:

  pass 1 (candidates): each partition folds its token stream into a
    Misra-Gries summary (Misra & Gries 1982, "Finding repeated
    elements"; merge rule from Agarwal et al. 2012, "Mergeable
    summaries" -- both published formulations) of ``s`` counters.
    Pigeonhole: a token with global frequency >= phi*N must have
    local frequency >= phi*N_p in at least one partition, and MG
    with s >= 2/phi keeps every such token. The union of partition
    summaries is therefore a guaranteed SUPERSET of the phi-frequent
    set -- s tokens per partition, regardless of corpus size.
  pass 2 (verify): exact counts for the candidate set only -- one
    hash-agg over tokens semi-joined against the broadcast candidate
    relation -- then the exact threshold filter. The verified output
    is EXACT (no estimates survive), which is what lets a DuckDB
    oracle check it row for row.

Scale shape: pass 1 is a narrow mapInPandas (state = s counters);
pass 2 shuffles only candidate-token rows (bounded by s x partitions
<< distinct tokens). Driver state: one scalar (N). Nothing collects.

Reference has no frequency surface (SURVEY.md §2.8) -- this is the
beyond-reference LLM-pipeline mandate (vocabulary/boilerplate
analysis for curation).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

from xmidt_event_streams_spark.functions.text import tokens


def _merge_mg(summary: dict, counts: pd.Series, s: int) -> dict:
    """Mergeable-summaries rule: add the batch's exact counts, then
    if over s counters subtract the (s+1)-th largest value from all
    and drop the non-positive -- the decrement step of Misra-Gries,
    applied in bulk. Error added per merge <= the subtracted value,
    preserving the undercount bound of <= N_p/(s+1) per partition."""
    for tok, c in counts.items():
        summary[tok] = summary.get(tok, 0) + int(c)
    if len(summary) > s:
        cut = sorted(summary.values(), reverse=True)[s]
        summary = {t: c - cut for t, c in summary.items() if c - cut > 0}
    return summary


def frequent_candidates(
    token_df: DataFrame, s: int, token_col: str = "tok"
) -> DataFrame:
    """Per-partition Misra-Gries candidate tokens (distinct union over
    partitions). Guaranteed superset of every token with global
    support > N/s; bounded at s rows per partition."""
    out_schema = StructType([StructField(token_col, StringType())])

    def mg(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        summary: dict = {}
        for pdf in batches:
            summary = _merge_mg(summary, pdf[token_col].value_counts(), s)
        yield pd.DataFrame({token_col: sorted(summary)})

    return token_df.select(token_col).mapInPandas(mg, out_schema).distinct()


def frequent_tokens_exact(
    df: DataFrame,
    phi: float = 0.001,
    text_col: str = "text",
    summary_size: int | None = None,
) -> DataFrame:
    """EXACT tokens with support >= phi (fraction of all token
    occurrences), as (token, cnt, total) -- candidate-then-verify,
    so the result carries true counts a SQL oracle reproduces
    exactly. ``summary_size`` defaults to ceil(2/phi) (the guarantee
    bound with 2x margin); one scalar action computes N."""
    import math

    if not 0 < phi <= 1:
        raise ValueError(f"phi must be in (0, 1], got {phi}")
    s = summary_size or math.ceil(2.0 / phi)
    toks = df.select(F.explode(tokens(text_col)).alias("tok"))
    cand = frequent_candidates(toks, s)
    total = toks.agg(F.count("*").alias("total"))
    return (
        toks.join(F.broadcast(cand), "tok")
        .groupBy("tok")
        .agg(F.count("*").alias("cnt"))
        .crossJoin(F.broadcast(total))
        .filter(F.col("cnt") >= F.lit(float(phi)) * F.col("total"))
        .select(F.col("tok").alias("token"), "cnt", "total")
    )


def frequent_ngrams_exact(
    df: DataFrame,
    n: int = 2,
    phi: float = 0.001,
    text_col: str = "text",
    summary_size: int | None = None,
) -> DataFrame:
    """The same exact heavy-hitter machinery over word n-grams --
    the boilerplate-phrase detector (repeated n-grams above support
    phi are the 'all rights reserved' inventory a line/span dedup
    pass should review). Identical guarantees; the token stream is
    just wider."""
    import math

    if not 0 < phi <= 1:
        raise ValueError(f"phi must be in (0, 1], got {phi}")
    s = summary_size or math.ceil(2.0 / phi)

    def grams(text: Column) -> Column:
        w = tokens(text)
        return F.when(
            F.size(w) < n, F.array().cast("array<string>")
        ).otherwise(
            F.transform(
                F.sequence(F.lit(0), F.size(w) - n),
                lambda i: F.concat_ws(" ", F.slice(w, i + 1, n)),
            )
        )

    toks = df.select(F.explode(grams(F.col(text_col))).alias("tok"))
    cand = frequent_candidates(toks, s)
    total = toks.agg(F.count("*").alias("total"))
    return (
        toks.join(F.broadcast(cand), "tok")
        .groupBy("tok")
        .agg(F.count("*").alias("cnt"))
        .crossJoin(F.broadcast(total))
        .filter(F.col("cnt") >= F.lit(float(phi)) * F.col("total"))
        .select(F.col("tok").alias("ngram"), "cnt", "total")
    )


# ---------------------------------------------------- frequency drift

_FREQ_META_FILE = "_xes_token_baseline_meta.json"

# PSI interpretation thresholds -- the standard population-stability
# bands (same convention as ivf.ivf_occupancy_drift)
_PSI_STABLE, _PSI_DRIFTING = 0.1, 0.25


def save_token_baseline(
    df: DataFrame,
    path: str,
    phi: float = 0.001,
    text_col: str = "text",
) -> dict:
    """Persist the exact heavy-hitter profile of a corpus as the
    frequency baseline: (token, cnt, total) parquet plus a sidecar
    stamping phi, so later drift checks rehash identically. Returns
    {n_tokens, total}."""
    from xmidt_event_streams_spark.fsutil import write_json_sidecar

    hh = frequent_tokens_exact(df, phi, text_col)
    hh.write.mode("overwrite").parquet(path)
    row = (
        df.sparkSession.read.parquet(path)
        .agg(F.count("*").alias("k"), F.max("total").alias("n"))
        .collect()[0]
    )
    write_json_sidecar(
        df.sparkSession, path, _FREQ_META_FILE, {"phi": phi, "text_col": text_col}
    )
    return {"n_tokens": int(row["k"] or 0), "total": int(row["n"] or 0)}


def token_drift(spark, baseline_path: str, corpus: DataFrame) -> dict:
    """Population-stability drift of the heavy-token profile vs a
    persisted baseline: PSI over the union of both heavy-hitter sets
    plus an OTHER bucket for the remaining mass (add-one smoothing,
    the ivf_occupancy_drift recipe applied to token space). A corpus
    whose boilerplate / vocabulary mix moved enough to matter for
    curation shows up here before any model does.

    Read-only; one exact heavy-hitter pass over the current corpus
    (driver state: the two bounded heavy sets). Verdict bands:
    psi < 0.1 stable, < 0.25 drifting, else shifted (re-baseline with
    save_token_baseline after investigating)."""
    import math

    from xmidt_event_streams_spark.fsutil import read_json_sidecar

    meta = read_json_sidecar(spark, baseline_path, _FREQ_META_FILE)
    if meta is None:
        raise ValueError(
            f"no frequency-baseline sidecar at {baseline_path}: build "
            "with save_token_baseline"
        )
    base_rows = spark.read.parquet(baseline_path).collect()
    base = {r["token"]: r["cnt"] for r in base_rows}
    n_base = base_rows[0]["total"] if base_rows else 0
    cur_rows = frequent_tokens_exact(
        corpus, float(meta["phi"]), meta["text_col"]
    ).collect()
    cur = {r["token"]: r["cnt"] for r in cur_rows}
    n_cur = cur_rows[0]["total"] if cur_rows else 0

    toks = sorted(set(base) | set(cur))
    cells = len(toks) + 1  # + OTHER
    nb = n_base + cells
    nc = n_cur + cells
    psi = 0.0
    for t in toks + [None]:  # None = OTHER (tail mass)
        if t is None:
            b_cnt = n_base - sum(base.values())
            c_cnt = n_cur - sum(cur.values())
        else:
            b_cnt, c_cnt = base.get(t, 0), cur.get(t, 0)
        bf = (b_cnt + 1) / nb
        cf = (c_cnt + 1) / nc
        psi += (cf - bf) * math.log(cf / bf)
    verdict = (
        "stable"
        if psi < _PSI_STABLE
        else "drifting" if psi < _PSI_DRIFTING else "shifted"
    )
    return {
        "psi": round(psi, 6),
        "verdict": verdict,
        "phi": float(meta["phi"]),
        "n_baseline_tokens": len(base),
        "n_current_tokens": len(cur),
        "baseline_total": n_base,
        "current_total": n_cur,
    }
