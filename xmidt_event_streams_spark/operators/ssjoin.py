"""Exact set-similarity join via prefix filtering (AllPairs / PPJoin).

The third candidate-generation family in the dedup stack, and the only
EXACT one that needs no caller-supplied blocking:

  * ``minhash_lsh_pairs`` — probabilistic banding (tunable recall,
    never exact);
  * ``ngram_jaccard_pairs`` — exact, but only within caller-chosen
    buckets capped by ``max_bucket_size`` (a lossy cap outside them);
  * this module — exact over the WHOLE corpus: every pair with
    Jaccard >= t is returned, no bucketing, no cap, no randomness.

Algorithm (public literature: Bayardo, Ma, Srikant, "Scaling Up All
Pairs Similarity Search", WWW 2007; Xiao et al., "Efficient Similarity
Joins for Near Duplicate Detection" [PPJoin], WWW 2008):

1.  Order every document's distinct shingle set by ASCENDING global
    document frequency (ties by token). Rare tokens first.
2.  Prefix filter: two sets with Jaccard >= t must share at least one
    token among the first ``p = |x| - ceil(t*|x|) + 1`` tokens of each
    (else the other set would need more than ``ceil(t*|x|)`` of x's
    remaining tokens — impossible by counting). Candidates = pairs
    sharing ANY prefix token.
3.  Length filter: ``min(|x|,|y|) >= t * max(|x|,|y|)`` (Jaccard
    <= min/max).
4.  Positional filter (PPJoin): because both sets are sorted in the
    SAME global order, the k-th common token of x is the k-th common
    token of y; at the FIRST shared prefix token (positions i, j,
    1-based) the achievable overlap is at most
    ``1 + min(|x|-i, |y|-j)``, which must reach
    ``alpha = ceil(t/(1+t) * (|x|+|y|))``.
5.  Exact verification: intersection / union over the full sets.

Why this scales where naive all-pairs cannot: the prefix holds each
document's RAREST tokens, so the per-token candidate buckets are small
by construction — the hot stop-word shingles that would drive the
blow-up sort to the END of every document and never enter a prefix at
realistic thresholds. Plan shape at 100 TB:

  * token-frequency relation: one explode + hash-agg on the shingle
    key (map-side partials absorb the Zipf head);
  * frequency-ordering join: (doc, token) x (token, freq), shuffled
    on token — AQE skew-split handles the Zipf head (each hot key
    matches exactly one 1-row build side);
  * candidate self-join: shuffled on PREFIX tokens only — the rarest
    |prefix| tokens per doc, each bucket small by the filter's own
    argument; never a cartesian, never a broadcast of the corpus;
  * verification: candidate-pair-bounded join back to the set
    relation (two shuffles on doc id).

The degenerate corpus (every doc near-identical, so even rare-token
buckets collapse into one) is guarded like every candidate generator
in this codebase: ``max_candidate_pairs`` measures the exact
pre-distinct candidate volume with one cheap agg BEFORE the self-join
and raises :class:`~xmidt_event_streams_spark.operators.similarity.
CandidatePairBudgetExceeded` instead of letting the join go quadratic.

Float-boundary discipline: every ceil()/threshold comparison that
gates candidate GENERATION is slackened by 1e-9 toward "keep" (e.g.
``t=0.55, |x|=20`` makes ``t*|x|`` land on 11.000000000000002 in
binary and an unslackened ceil() would shorten the prefix and drop
true pairs). Slack only ever ADDS candidates; the exact verification
step decides membership, and its division/compare is the same IEEE
double op DuckDB's oracle runs.

Reference has no similarity-join surface (SURVEY.md §2.8) — this is
part of the beyond-reference LLM-pipeline mandate (dedup tier).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from xmidt_event_streams_spark.functions.text import word_ngrams
from xmidt_event_streams_spark.operators.similarity import (
    CandidatePairBudgetExceeded,
)

# toward-keep slack for float ceil()/compare at candidate generation
_EPS = 1e-9


def jaccard_join_sets(
    df: DataFrame,
    threshold: float,
    set_col: str = "sh",
    id_col: str = "doc_id",
    positional: bool = True,
    max_candidate_pairs: int | None = 50_000_000,
) -> DataFrame:
    """Exact Jaccard similarity self-join over a set-valued column.

    Input: ``(id_col, set_col array<string>)`` — one row per document,
    ``set_col`` treated as a set (deduped internally). Output: every
    unordered pair with ``Jaccard >= threshold`` as
    ``(id_a, id_b, jaccard)`` with ``id_a < id_b`` and jaccard rounded
    to 6 places (matching ``ngram_jaccard_pairs``). Exact: no false
    positives, no false negatives; the prefix/length/positional
    filters only prune candidates, verification decides membership.

    ``threshold`` must be in (0, 1]: at t=0 the prefix is the whole
    set and the join is all-pairs by definition — use
    ``ngram_jaccard_pairs`` with explicit buckets for that.

    ``max_candidate_pairs``: measured candidate budget (sum over
    prefix tokens of C(n,2), one agg before the self-join); exceeded
    -> :class:`CandidatePairBudgetExceeded` with the measured counts.
    ``None`` disables the guard.
    """
    if not (0.0 < threshold <= 1.0):
        raise ValueError(f"threshold must be in (0, 1], got {threshold}")
    t = float(threshold)

    sets = (
        df.select(F.col(id_col), F.array_distinct(F.col(set_col)).alias("_sh"))
        .withColumn("_sz", F.size("_sh"))
        .filter(F.col("_sz") > 0)
    )

    # 1. global token order: ascending document frequency, ties by token
    tok = sets.select(F.col(id_col), F.explode("_sh").alias("_t"))
    freq = tok.groupBy("_t").agg(F.count(F.lit(1)).alias("_df"))

    # 2. re-sort each doc's set in that order; keep the ordered array
    #    for positional verification (array fns ignore order anyway).
    #    Eager localCheckpoint (the dup_cluster pattern,
    #    components.py:333): this subtree is consumed up to five times
    #    per action — the budget-guard agg, BOTH sides of the prefix
    #    self-join, and BOTH sides of verification — and without
    #    materialization the explode + frequency join + sort-agg
    #    recomputes each time (round-5 SCALE_AUDIT's most expensive
    #    query). Checkpoint blocks are GC'd with the plan, so the
    #    lazily-returned result stays valid with no unpersist hook.
    ordered = (
        tok.join(freq, "_t")
        .groupBy(id_col)
        .agg(
            F.transform(
                F.sort_array(F.collect_list(F.struct("_df", "_t"))),
                lambda s: s["_t"],
            ).alias("_sh")
        )
        .withColumn("_sz", F.size("_sh"))
        .localCheckpoint(eager=True)
    )

    # 3. prefix tokens with 1-based position:
    #    p = sz - ceil(t*sz) + 1   (slack toward longer prefix)
    prefix_len = F.col("_sz") - F.ceil(F.lit(t) * F.col("_sz") - F.lit(_EPS)) + 1
    pref = ordered.select(
        F.col(id_col),
        F.col("_sz"),
        F.posexplode(F.slice("_sh", 1, prefix_len.cast("int"))).alias(
            "_pos0", "_t"
        ),
    ).withColumn("_pos", F.col("_pos0") + 1).drop("_pos0")

    if max_candidate_pairs is not None:
        row = (
            pref.groupBy("_t")
            .agg(F.count(F.lit(1)).alias("n"))
            .agg(
                F.sum(F.col("n") * (F.col("n") - 1) / 2).alias("pairs"),
                F.max("n").alias("hottest"),
                F.sum("n").alias("rows"),
            )
            .collect()[0]
        )
        measured = int(row["pairs"] or 0)
        if measured > max_candidate_pairs:
            raise CandidatePairBudgetExceeded(
                candidate_pairs=measured,
                budget=max_candidate_pairs,
                hottest_cell_n=int(row["hottest"] or 0),
                n_rows=int(row["rows"] or 0),
            )

    a, b = pref.alias("a"), pref.alias("b")
    cond = (
        (F.col("a._t") == F.col("b._t"))
        & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        # length filter: min >= t*max  (slack toward keep)
        & (
            F.least(F.col("a._sz"), F.col("b._sz"))
            >= F.lit(t) * F.greatest(F.col("a._sz"), F.col("b._sz")) - F.lit(_EPS)
        )
    )
    cand = a.join(b, cond).select(
        F.col(f"a.{id_col}").alias("id_a"),
        F.col(f"b.{id_col}").alias("id_b"),
        F.col("a._sz").alias("_sza"),
        F.col("b._sz").alias("_szb"),
        F.col("a._pos").alias("_pa"),
        F.col("b._pos").alias("_pb"),
    )

    if positional:
        # first shared prefix token = the min-order common token in
        # BOTH orderings (same global order), so min(_pa) and min(_pb)
        # come from the same token; overlap before it is zero.
        first = cand.groupBy("id_a", "id_b").agg(
            F.min("_pa").alias("_ia"),
            F.min("_pb").alias("_jb"),
            F.first("_sza").alias("_sza"),
            F.first("_szb").alias("_szb"),
        )
        alpha = F.ceil(
            F.lit(t / (1.0 + t)) * (F.col("_sza") + F.col("_szb")) - F.lit(_EPS)
        )
        ubound = 1 + F.least(
            F.col("_sza") - F.col("_ia"), F.col("_szb") - F.col("_jb")
        )
        cand_ids = first.filter(ubound >= alpha).select("id_a", "id_b")
    else:
        cand_ids = cand.select("id_a", "id_b").distinct()

    # 4. exact verification against the full sets
    sa = ordered.select(
        F.col(id_col).alias("id_a"), F.col("_sh").alias("_sha")
    )
    sb = ordered.select(
        F.col(id_col).alias("id_b"), F.col("_sh").alias("_shb")
    )
    inter = F.size(F.array_intersect("_sha", "_shb"))
    union = F.size(F.array_union("_sha", "_shb"))
    jac = inter.cast("double") / union
    return (
        cand_ids.join(sa, "id_a")
        .join(sb, "id_b")
        .filter(jac >= F.lit(t))
        .select("id_a", "id_b", F.round(jac, 6).alias("jaccard"))
    )


def jaccard_join(
    df: DataFrame,
    threshold: float,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 2,
    positional: bool = True,
    max_candidate_pairs: int | None = 50_000_000,
) -> DataFrame:
    """Exact corpus-wide near-dup pairs: every document pair whose
    distinct word-``shingle_n``-gram sets have Jaccard >= threshold —
    no buckets, no caps, no randomness. Text wrapper over
    :func:`jaccard_join_sets`; shingling matches
    ``ngram_jaccard_pairs`` (``word_ngrams`` + distinct), so verdicts
    are directly comparable across the three candidate tiers."""
    sh = df.select(
        F.col(id_col), word_ngrams(text_col, shingle_n).alias("_sh0")
    )
    return jaccard_join_sets(
        sh,
        threshold,
        set_col="_sh0",
        id_col=id_col,
        positional=positional,
        max_candidate_pairs=max_candidate_pairs,
    )
