"""N-gram language-model perplexity scoring (the CCNet recipe).

CCNet (Wenzek et al., arXiv:1911.00359) filters web text by the
perplexity of a language model trained on a trusted corpus: documents
whose token distribution is far from the reference read as boilerplate,
gibberish, or the wrong register, and land in the discard/tail bucket.
This module is that recipe as two DataFrame passes — a bigram LM with
add-alpha smoothing, fit and scored entirely JVM-side:

  * :func:`ngram_lm_fit` — one explode of in-document bigrams and two
    hash-aggregations. Output relations are VOCABULARY-sized (bigram
    types + context types), not corpus-sized: at 100 TB of text the
    model is still a few GB, which is why the scoring join can
    broadcast.
  * :func:`lm_perplexity` — explode the candidate corpus's bigrams,
    left-join the (broadcast) model relations, per-doc average
    log-probability, ``ppl = exp(-avg_lp)``. Unseen bigrams/contexts
    fall through ``coalesce(count, 0)`` into the smoothing mass — no
    special-casing, no OOV token rewriting.

Smoothing: add-alpha (Laplace for alpha=1) over a vocabulary of V
train-side token types::

    P(w | c) = (count(c, w) + alpha) / (count(c) + alpha * V)

Two smoothing arms, both closed-form (every term a SQL oracle replays
exactly): add-alpha (the registry-oracled default) and stupid backoff
(``ngram_lm_fit(backoff=0.4)``) which scores unseen bigrams by the
word's own discounted unigram frequency — fixing add-alpha's
alien-vocabulary inversion; see :func:`ngram_lm_fit`. Kneser-Ney would
score better absolutely but brings non-closed-form discounting for no
additional FILTERING signal (the gate consumes a ranking).

Scale shape (the 100 TB contract):
  * fit: one scan + explode, two hash-aggs with map-side partials;
    output is vocab-bounded, never corpus-bounded.
  * score: one scan + explode; two joins against vocab-bounded sides
    (broadcast by default; ``broadcast_lm=False`` degrades to shuffled
    equi-joins on uniform token keys for pathologically large vocabs);
    one per-doc hash-agg. The corpus-sized side shuffles exactly once
    (the per-doc agg the semantics require).
  * the vocabulary size rides as a 1-row broadcast (the bm25 stats
    pattern, operators/relevance.py) — nothing is collected to the
    driver.

Floating point: per-doc avg log-prob is FP-order-dependent at the
1-ulp level across engines; the operator rounds avg_lp to 6 dp before
exponentiating and the perplexity to 4 dp (the relevance.py
discipline — drift is << the rounding quantum, signal is >>).

Reference has no text surface (SURVEY.md §2.8); this belongs to the
beyond-reference LLM-pipeline mandate.
"""

from __future__ import annotations

from typing import NamedTuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from xmidt_event_streams_spark.functions.text import let_bind, tokens


class NGramLM(NamedTuple):
    """A fitted bigram LM: vocabulary-bounded relations only.

    ``ngram_counts``  (c, w, cw_cnt)  — bigram type counts;
    ``context_counts`` (c, c_cnt)     — sum of cw_cnt per context;
    ``vocab``         1 row (vocab_size, total_tokens) — train token
                      types and train token count;
    ``alpha``         the smoothing constant the fit was declared with;
    ``unigrams``      (w, w_cnt) token counts — only when the fit was
                      declared with ``backoff`` (None otherwise);
    ``backoff``       the stupid-backoff discount (None = add-alpha).
    """

    ngram_counts: DataFrame
    context_counts: DataFrame
    vocab: DataFrame
    alpha: float
    unigrams: DataFrame | None = None
    backoff: float | None = None
    n: int = 2


def _bigrams(text_col) -> F.Column:
    """In-document bigram structs (c=token_i, w=token_{i+1}) of the
    normalized whitespace tokenization; docs with < 2 tokens yield an
    empty array. Pure array arithmetic (slice + zip_with) — no window,
    no shuffle, stays inside whole-stage codegen."""

    def body(toks: F.Column) -> F.Column:
        n = F.size(toks)
        pair = F.zip_with(
            F.slice(toks, 1, n - 1),
            F.slice(toks, 2, n - 1),
            lambda a, b: F.struct(a.alias("c"), b.alias("w")),
        )
        return F.when(n >= 2, pair).otherwise(
            F.array().cast("array<struct<c:string,w:string>>")
        )

    return let_bind(tokens(text_col), body)


def _ngrams(text_col, order: int) -> F.Column:
    """Order-n generalization of :func:`_bigrams`: structs with
    c = the space-joined (n-1)-token context, w = the continuation.
    Dispatches to the cheaper zip_with form for n=2 (bit-identical
    output, so the registry oracle is untouched); higher orders build
    windows with transform + slice — still pure array arithmetic
    inside codegen."""
    if order == 2:
        return _bigrams(text_col)

    def body(toks: F.Column) -> F.Column:
        sz = F.size(toks)
        grams = F.transform(
            F.sequence(F.lit(1), sz - (order - 1)),
            lambda i: F.struct(
                F.concat_ws(" ", F.slice(toks, i, order - 1)).alias("c"),
                F.element_at(toks, i + (order - 1)).alias("w"),
            ),
        )
        return F.when(sz >= order, grams).otherwise(
            F.array().cast("array<struct<c:string,w:string>>")
        )

    return let_bind(tokens(text_col), body)


def ngram_lm_fit(
    train_df: DataFrame,
    text_col: str = "text",
    alpha: float = 1.0,
    backoff: float | None = None,
    n: int = 2,
    min_count: int = 1,
) -> NGramLM:
    """Fit the bigram LM over the (trusted) training corpus.

    One explode + two hash-aggregations; every output relation is
    vocab-bounded. ``alpha`` is the add-alpha smoothing mass.

    ``min_count`` prunes n-gram types seen fewer times from the model
    (KenLM-style count pruning): on web-scale training corpora the
    singleton tail is most of the n-gram TYPE count while carrying
    almost no scoring mass, and it is exactly what decides whether the
    model still broadcasts. Pruned types score through the smoothing
    (add-alpha) or backoff (unigram) mass; context denominators keep
    the full unpruned mass so surviving probabilities stay honest.

    ``backoff`` (e.g. 0.4, Brants et al. stupid backoff,
    arXiv:cs/0702054-era W07) switches scoring to::

        S(w|c) = count(c,w) / count(c)            when seen
               = backoff * (count(w)+a)/(N+aV)    otherwise

    which fixes add-alpha's inversion: under add-alpha an ENTIRELY
    unseen context scores the flat 1/V mass — better than a seen
    context's unseen continuation — so alien-vocabulary text can
    out-score merely reordered text. Backoff scores unseen mass by the
    word's own training frequency, restoring the CCNet-expected
    ordering (in-distribution < reordered < alien; pytest-pinned).
    Still fully closed-form: one extra vocab-bounded unigram relation,
    every term a SQL oracle replays.

    ``n`` is the model order: contexts are (n-1)-token strings (n=3 ->
    trigram). Higher orders score in-distribution text more sharply
    but their contexts are sparser, so MORE of any slightly-off text
    routes through the backoff/smoothing mass; measured on the planted
    distributions (tests/test_lm.py), the trigram's reorder PENALTY is
    actually SOFTER than the bigram's under the single-level backoff
    here (unseen 3-token contexts fall through to reasonable unigram
    mass, while the bigram scores wrong transitions against large
    seen-context denominators). Pick the order for how sharply you
    want in-distribution modeled, not for a bigger OOD gap; the gap
    needs the full recursive backoff chain (n-1 relations), which this
    deliberately is not. ``backoff`` is the single-level fall-through
    to unigrams.
    """
    if n < 2:
        raise ValueError(f"model order n must be >= 2, got {n}")
    bg = train_df.select(F.explode(_ngrams(text_col, n)).alias("bg")).select(
        F.col("bg.c").alias("c"), F.col("bg.w").alias("w")
    )
    ngram_counts = bg.groupBy("c", "w").agg(F.count("*").alias("cw_cnt"))
    # context mass from the UNPRUNED counts: pruning removes rare
    # n-gram TYPES from the model (classic count pruning -- they fall
    # through to the smoothing/backoff mass at score time) but must
    # not shrink the denominators, or surviving probabilities would
    # silently inflate
    context_counts = ngram_counts.groupBy("c").agg(
        F.sum("cw_cnt").alias("c_cnt")
    )
    if min_count > 1:
        ngram_counts = ngram_counts.filter(
            F.col("cw_cnt") >= F.lit(min_count)
        )
    toks = train_df.select(F.explode(tokens(text_col)).alias("tok"))
    vocab = toks.agg(
        F.count_distinct("tok").alias("vocab_size"),
        F.count("*").alias("total_tokens"),
    )
    unigrams = None
    if backoff is not None:
        unigrams = toks.groupBy(F.col("tok").alias("w")).agg(
            F.count("*").alias("w_cnt")
        )
    return NGramLM(
        ngram_counts, context_counts, vocab, alpha, unigrams, backoff, n
    )


def lm_perplexity(
    df: DataFrame,
    lm: NGramLM,
    text_col: str = "text",
    id_col: str = "doc_id",
    broadcast_lm: bool = True,
) -> DataFrame:
    """Per-document perplexity under the fitted LM.

    Output: (id, n_bigrams, ppl) for EVERY input doc — docs with < 2
    tokens carry n_bigrams = 0 and a null ppl (no silent drops; the
    caller's filter policy decides their fate, same posture as
    validate_rejects).

    ``broadcast_lm=False`` switches the model joins to shuffled
    equi-joins on the (uniform) token keys — the escape hatch for a
    vocabulary too large to broadcast.
    """
    maybe_b = F.broadcast if broadcast_lm else (lambda d: d)
    ex = df.select(
        F.col(id_col), F.explode(_ngrams(text_col, lm.n)).alias("bg")
    ).select(id_col, F.col("bg.c").alias("c"), F.col("bg.w").alias("w"))

    joined = (
        ex.join(maybe_b(lm.ngram_counts), ["c", "w"], "left")
        .join(maybe_b(lm.context_counts), ["c"], "left")
        .crossJoin(F.broadcast(lm.vocab))
    )
    if lm.backoff is None:
        lp = F.log(
            (F.coalesce(F.col("cw_cnt"), F.lit(0)) + F.lit(lm.alpha))
            / (
                F.coalesce(F.col("c_cnt"), F.lit(0))
                + F.lit(lm.alpha) * F.col("vocab_size")
            )
        )
    else:
        joined = joined.join(maybe_b(lm.unigrams), ["w"], "left")
        seen = F.col("cw_cnt").isNotNull()
        lp = F.log(
            F.when(seen, F.col("cw_cnt") / F.col("c_cnt")).otherwise(
                F.lit(lm.backoff)
                * (F.coalesce(F.col("w_cnt"), F.lit(0)) + F.lit(lm.alpha))
                / (
                    F.col("total_tokens")
                    + F.lit(lm.alpha) * F.col("vocab_size")
                )
            )
        )
    scored = joined.select(F.col(id_col), lp.alias("lp"))
    per_doc = scored.groupBy(id_col).agg(
        F.count("*").alias("n_bigrams"),
        F.round(F.exp(-F.round(F.avg("lp"), 6)), 4).alias("ppl"),
    )
    return (
        df.select(id_col)
        .join(per_doc, [id_col], "left")
        .select(
            id_col,
            F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
            "ppl",
        )
    )


def perplexity_filter(
    df: DataFrame,
    lm: NGramLM,
    max_ppl: float,
    text_col: str = "text",
    id_col: str = "doc_id",
    broadcast_lm: bool = True,
) -> tuple[DataFrame, DataFrame]:
    """(kept, dropped) split at a perplexity ceiling — the CCNet gate.

    Docs too short to score (null ppl) are DROPPED with the ledger
    (they carry no distributional evidence either way; CCNet's head/
    middle/tail bucketing likewise refuses to place them). Both sides
    carry ``ppl`` so the caller's ledger can histogram the decision.
    """
    scored = df.join(
        lm_perplexity(df, lm, text_col, id_col, broadcast_lm),
        [id_col],
    )
    keep = scored.filter(F.col("ppl") <= F.lit(max_ppl))
    drop = scored.filter(
        F.col("ppl").isNull() | (F.col("ppl") > F.lit(max_ppl))
    )
    return keep, drop


def lm_quality_gate(
    lm: NGramLM,
    max_ppl: float,
    text_col: str = "text",
    id_col: str = "doc_id",
    broadcast_lm: bool = True,
):
    """The CCNet ceiling as a reusable GATE: ``batch -> (passing,
    failing)`` with ``reject_reason='lm_perplexity'`` on the failing
    side -- the protocol streaming/ingest_dedup.start_ingest_dedup
    and corpus.chain_gates consume. The model relations live in the
    closure and join each (batch-sized) input, so the broadcast-LM
    shape holds per micro-batch."""

    def gate(batch: DataFrame):
        # internal underscore-prefixed score column: the gate protocol
        # takes arbitrary batches, so one that already carries 'ppl'
        # or 'n_bigrams' must neither collide nor lose its own column
        # when the score is dropped after the split
        scored = batch.join(
            lm_perplexity(batch, lm, text_col, id_col, broadcast_lm).select(
                id_col, F.col("ppl").alias("_xes_ppl")
            ),
            [id_col],
        )
        keep = scored.filter(F.col("_xes_ppl") <= F.lit(max_ppl)).drop(
            "_xes_ppl"
        )
        drop = (
            scored.filter(
                F.col("_xes_ppl").isNull()
                | (F.col("_xes_ppl") > F.lit(max_ppl))
            )
            .drop("_xes_ppl")
            .withColumn("reject_reason", F.lit("lm_perplexity"))
        )
        return keep, drop

    return gate


_LM_META_FILE = "_xes_lm_meta.json"


def save_lm(lm: NGramLM, path: str) -> None:
    """Persist a fitted LM as a model ARTIFACT: the vocab-bounded
    relations as parquet under ``path`` plus a Hadoop-FS meta sidecar
    (alpha / backoff / n -- the parameters scoring is meaningless
    without, same guard discipline as the MinHash/IVF index sidecars).
    A saved model is what a long-lived deployment gates with: fit once
    on the trusted corpus, load in every batch/streaming process,
    refit on drift -- no per-process refits, no model relations
    pinned to the fitting session."""
    from xmidt_event_streams_spark.fsutil import write_json_sidecar

    base = path.rstrip("/")
    lm.ngram_counts.write.mode("overwrite").parquet(base + "/ngram_counts")
    lm.context_counts.write.mode("overwrite").parquet(base + "/context_counts")
    lm.vocab.write.mode("overwrite").parquet(base + "/vocab")
    if lm.unigrams is not None:
        lm.unigrams.write.mode("overwrite").parquet(base + "/unigrams")
    write_json_sidecar(
        lm.ngram_counts.sparkSession,
        base,
        _LM_META_FILE,
        {
            "alpha": lm.alpha,
            "backoff": lm.backoff,
            "n": lm.n,
            "has_unigrams": lm.unigrams is not None,
        },
    )


def load_lm(spark, path: str) -> NGramLM:
    """Load a :func:`save_lm` artifact; raises on a path without the
    meta sidecar (scoring under guessed smoothing parameters would be
    silently wrong, the exact failure the sidecar exists to stop)."""
    from xmidt_event_streams_spark.fsutil import read_json_sidecar

    base = path.rstrip("/")
    meta = read_json_sidecar(spark, base, _LM_META_FILE)
    if meta is None:
        raise ValueError(f"no LM meta sidecar at {path}: not a save_lm artifact")
    unigrams = (
        spark.read.parquet(base + "/unigrams")
        if meta.get("has_unigrams")
        else None
    )
    return NGramLM(
        spark.read.parquet(base + "/ngram_counts"),
        spark.read.parquet(base + "/context_counts"),
        spark.read.parquet(base + "/vocab"),
        float(meta["alpha"]),
        unigrams,
        meta["backoff"],
        int(meta.get("n", 2)),
    )
