"""Learned document-quality classifiers: the fasttext-filter shape.

Modern curation pipelines (DCLM arXiv:2406.11794, the phi series)
gate documents with a LEARNED classifier — a linear model over
bag-of-words features trained on "good corpus vs raw crawl" labels —
rather than hand-tuned heuristics alone. The two models here bracket
that design point, both trained and scored entirely as DataFrame
aggregations:

  * :func:`nb_fit` / :func:`nb_score` — multinomial Naive Bayes
    log-odds. CLOSED FORM: one token pass and two vocab-bounded
    aggregations fit it; there is no iteration, so a SQL oracle
    replays the whole fit+score bit-identically (the registry's
    ``nb_quality_scores`` query). This is the model fasttext's linear
    classifier approximates at alpha->0.
  * :func:`hashed_features` / :func:`logreg_fit` / :func:`logreg_score`
    — logistic regression over hashed bag-of-words features, fit by
    full-batch gradient descent. Iterative (driver holds the ``dim``
    -sized weight vector between rounds, the components.py convergence
    -loop pattern), so it is pytest-verified (loss monotone, planted
    separability, determinism) rather than oracle-replayed.

Scale shape at 100 TB:
  * NB fit: one explode + (doc, term) hash-agg, then a vocab-bounded
    term agg and a 1-row totals agg (broadcast, the bm25 stats
    pattern). Scoring: broadcast the vocab-bounded weights, one
    per-doc agg. The corpus shuffles once per pass.
  * LR fit: per iteration, one broadcast join of features against the
    (dim)-row weight relation, one per-doc margin agg, one per-index
    gradient agg, one dim-row collect — the driver state is dim
    doubles (bounded by declaration, NOT by data size), the loop's
    only scalar-per-round materialization. Feature hashing caps dim
    regardless of vocabulary growth, which is the point of the trick
    (Weinberger et al., arXiv:0902.2206).

Floating point: scores are rounded to 6 dp before leaving each
operator (relevance.py discipline).

Reference has no learned-model surface (SURVEY.md §2.8);
beyond-reference LLM-pipeline mandate.
"""

from __future__ import annotations

import math
from typing import NamedTuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from xmidt_event_streams_spark.functions.text import md5_bucket, tokens
from xmidt_event_streams_spark.operators.relevance import term_frequencies


class NaiveBayesModel(NamedTuple):
    """(term, weight) log-odds per seen term + a 1-row stats relation
    (prior, w_oov) — both broadcast-sized."""

    token_weights: DataFrame
    stats: DataFrame
    alpha: float


def nb_fit(
    train_df: DataFrame,
    label_col: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    alpha: float = 1.0,
) -> NaiveBayesModel:
    """Fit multinomial NB log-odds over a boolean label.

    weight(t) = ln((pos_t + a) / (POS + aV)) - ln((neg_t + a) / (NEG + aV))
    w_oov     = the same expression at pos_t = neg_t = 0
    prior     = ln(n_pos_docs / n_neg_docs)

    with POS/NEG the class token totals and V the seen-term count.
    Everything after the (doc, term) pass is vocab-bounded.
    """
    y = F.col(label_col).cast("boolean")
    tf = term_frequencies(train_df, text_col, id_col)
    labeled = tf.join(
        train_df.select(F.col(id_col), y.alias("_y")), [id_col]
    )
    per_term = labeled.groupBy("term").agg(
        F.sum(F.when(F.col("_y"), F.col("tf")).otherwise(0)).alias("pos_t"),
        F.sum(F.when(~F.col("_y"), F.col("tf")).otherwise(0)).alias("neg_t"),
    )
    totals = per_term.agg(
        F.sum("pos_t").alias("pos_tot"),
        F.sum("neg_t").alias("neg_tot"),
        F.count("*").alias("vocab_size"),
    )
    doc_counts = train_df.agg(
        F.sum(F.when(y, 1).otherwise(0)).alias("n_pos"),
        F.sum(F.when(~y, 1).otherwise(0)).alias("n_neg"),
    )
    a = F.lit(float(alpha))
    denom_pos = F.col("pos_tot") + a * F.col("vocab_size")
    denom_neg = F.col("neg_tot") + a * F.col("vocab_size")
    token_weights = (
        per_term.crossJoin(F.broadcast(totals))
        .select(
            "term",
            (
                F.log((F.col("pos_t") + a) / denom_pos)
                - F.log((F.col("neg_t") + a) / denom_neg)
            ).alias("weight"),
        )
    )
    stats = (
        totals.crossJoin(F.broadcast(doc_counts)).select(
            (F.log(a / denom_pos) - F.log(a / denom_neg)).alias("w_oov"),
            F.log(
                F.col("n_pos").cast("double") / F.col("n_neg")
            ).alias("prior"),
        )
    )
    return NaiveBayesModel(token_weights, stats, float(alpha))


def nb_score(
    df: DataFrame,
    model: NaiveBayesModel,
    text_col: str = "text",
    id_col: str = "doc_id",
    broadcast_model: bool = True,
) -> DataFrame:
    """Per-doc NB log-odds score and boolean prediction.

    Output: (id, n_terms, score, pred) for EVERY input doc; token-free
    docs score the bare prior. Unseen terms fall through the left join
    into ``w_oov``. ``pred`` is evaluated on the ROUNDED score so an
    oracle reproduces the same boolean at ties.
    """
    maybe_b = F.broadcast if broadcast_model else (lambda d: d)
    tf = term_frequencies(df, text_col, id_col)
    contrib = (
        tf.join(maybe_b(model.token_weights), ["term"], "left")
        .crossJoin(F.broadcast(model.stats))
        .select(
            F.col(id_col),
            F.col("tf"),
            (
                F.col("tf") * F.coalesce(F.col("weight"), F.col("w_oov"))
            ).alias("wsum"),
            F.col("prior"),
        )
    )
    per_doc = contrib.groupBy(id_col).agg(
        F.sum("tf").alias("n_terms"),
        F.round(F.first("prior") + F.sum("wsum"), 6).alias("score"),
    )
    return (
        df.select(id_col)
        .join(per_doc, [id_col], "left")
        .crossJoin(F.broadcast(model.stats.select("prior")))
        .select(
            id_col,
            F.coalesce("n_terms", F.lit(0)).alias("n_terms"),
            F.coalesce(F.col("score"), F.round(F.col("prior"), 6)).alias(
                "score"
            ),
        )
        .withColumn("pred", F.col("score") > 0)
    )


# ---------------------------------------------------------------------------
# hashed-feature logistic regression (iterative; pytest-verified)
# ---------------------------------------------------------------------------


def hashed_features(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    dim: int = 256,
) -> DataFrame:
    """(id, idx, x): L1-normalized hashed bag-of-words plus a bias
    feature at idx = dim (x = 1). The hash is the md5-bucket trick
    used across the dedup stack — deterministic, engine-portable, and
    uniform, so the per-idx gradient agg never skews."""
    tok = df.select(F.col(id_col), F.explode(tokens(text_col)).alias("tok"))
    idx = md5_bucket("tok", dim).alias("idx")
    counts = tok.select(F.col(id_col), idx).groupBy(id_col, "idx").agg(
        F.count("*").alias("cnt")
    )
    tot = counts.groupBy(id_col).agg(F.sum("cnt").alias("tot"))
    feats = counts.join(tot, [id_col]).select(
        id_col, "idx", (F.col("cnt") / F.col("tot")).alias("x")
    )
    bias = df.select(
        F.col(id_col), F.lit(dim).alias("idx"), F.lit(1.0).alias("x")
    )
    return feats.unionByName(bias)


def _sigmoid(c: F.Column) -> F.Column:
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-c))


def logreg_fit(
    features: DataFrame,
    labels: DataFrame,
    dim: int = 256,
    iters: int = 30,
    lr: float = 1.0,
    l2: float = 1e-4,
    id_col: str = "doc_id",
    label_col: str = "label",
) -> tuple[list[float], list[float]]:
    """Full-batch GD over (id, idx, x) features and boolean labels.

    Returns (weights, loss_history); weights has dim + 1 entries (bias
    last). Per iteration: margin agg -> residual join -> gradient agg
    -> (dim+2)-row collect. The input feature relation is reused every
    round — persist it at the call site for >2 iterations (the tests
    do); this function does not own caching policy.

    r11 (guide §5): one ACTION per iteration instead of two — the
    loss sum rides the gradient collect as a sentinel idx=-1 row
    (the margins subtree was otherwise recomputed per action). The
    per-round weight vector deliberately stays a broadcast RELATION,
    not a literal array: literals change every round, so a literal
    plan misses the whole-stage-codegen compile cache each iteration
    (measured: the literal variant was NOT faster even at dim=16).

    Driver state: dim+1 doubles and the loss scalar per round —
    bounded by the declared dim, independent of corpus size.
    """
    spark = features.sparkSession
    n_docs = labels.count()
    w = [0.0] * (dim + 1)
    losses: list[float] = []
    lbl = labels.select(
        F.col(id_col), F.col(label_col).cast("double").alias("_y")
    )
    for _ in range(iters):
        w_df = F.broadcast(
            spark.createDataFrame(
                [(i, wi) for i, wi in enumerate(w)], "idx int, w double"
            )
        )
        margins = (
            features.join(w_df, ["idx"])
            .groupBy(id_col)
            .agg(F.sum(F.col("x") * F.col("w")).alias("margin"))
            .join(lbl, [id_col])
            .select(
                F.col(id_col),
                (_sigmoid(F.col("margin")) - F.col("_y")).alias("resid"),
                # softplus form of the logistic loss:
                #   max(m, 0) - m*y + log1p(exp(-|m|))
                # The naive y*log(sigmoid) + (1-y)*log(1-sigmoid) hits
                # log(0) = NULL once |margin| > ~36 (sigmoid saturates
                # to exactly 1.0 in doubles); F.sum then silently skips
                # those rows and the loss history shrinks for the
                # wrong reason on separable data.
                (
                    F.greatest(F.col("margin"), F.lit(0.0))
                    - F.col("margin") * F.col("_y")
                    + F.log1p(F.exp(-F.abs(F.col("margin"))))
                ).alias("ll"),
            )
        )
        grad = (
            features.join(margins, [id_col])
            .groupBy("idx")
            .agg(F.sum(F.col("x") * F.col("resid")).alias("g"))
        )
        loss_row = margins.groupBy(F.lit(-1).alias("idx")).agg(
            F.sum("ll").alias("g")
        )
        rows = grad.unionAll(loss_row).collect()
        grad_rows = [r for r in rows if r["idx"] >= 0]
        loss = (
            next((r["g"] for r in rows if r["idx"] == -1), 0.0) or 0.0
        ) / n_docs
        losses.append(loss)
        g = [0.0] * (dim + 1)
        for r in grad_rows:
            g[r["idx"]] = r["g"] / n_docs
        # L2 decays the FEATURE weights only: shrinking the intercept
        # (idx = dim) toward 0 would bias predicted probabilities on
        # class-imbalanced training sets (the bias exists to absorb
        # the base rate, not to be regularized away).
        w = [
            wi - lr * (gi + (l2 * wi if i < dim else 0.0))
            for i, (wi, gi) in enumerate(zip(w, g))
        ]
    return w, losses


def logreg_score(
    features: DataFrame,
    weights: list[float],
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, prob): sigmoid margin under fitted weights (broadcast as a
    (dim+1)-row relation, same join shape as a fit round)."""
    spark = features.sparkSession
    w_df = F.broadcast(
        spark.createDataFrame(
            [(i, wi) for i, wi in enumerate(weights)], "idx int, w double"
        )
    )
    return (
        features.join(w_df, ["idx"])
        .groupBy(id_col)
        .agg(
            F.round(_sigmoid(F.sum(F.col("x") * F.col("w"))), 6).alias("prob")
        )
    )


def accuracy(scored: DataFrame, labels: DataFrame, id_col: str = "doc_id",
             label_col: str = "label", prob_col: str = "prob") -> float:
    """Fraction of docs where round(prob) matches the boolean label —
    the convergence assertion the tests pin."""
    joined = scored.join(labels, [id_col])
    n = joined.count()
    if n == 0:
        return math.nan
    hits = joined.filter(
        (F.col(prob_col) > 0.5) == F.col(label_col).cast("boolean")
    ).count()
    return hits / n


def nb_quality_gate(
    model: NaiveBayesModel,
    min_score: float = 0.0,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """The learned-classifier floor as a reusable GATE: ``batch ->
    (passing, failing)`` with ``reject_reason='classifier'`` -- same
    protocol as operators/lm.lm_quality_gate (see there)."""

    def gate(batch: DataFrame):
        scored = nb_score(batch, model, text_col, id_col).select(
            id_col, "score"
        )
        passing = batch.join(
            scored.filter(F.col("score") >= F.lit(min_score)).select(id_col),
            id_col,
        )
        failing = batch.join(
            scored.filter(F.col("score") < F.lit(min_score)).select(id_col),
            id_col,
        ).withColumn("reject_reason", F.lit("classifier"))
        return passing, failing

    return gate


# ---------------------------------------------------------------------------
# multiclass Naive Bayes (domain / language tagging)
# ---------------------------------------------------------------------------


class MulticlassNB(NamedTuple):
    """(term, class, ll) per seen (term, class) + per-class stats
    (class, prior_ll, oov_ll). Both relations are (vocab x k)-bounded."""

    token_ll: DataFrame
    class_stats: DataFrame
    alpha: float


def nb_multiclass_fit(
    train_df: DataFrame,
    label_col: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    alpha: float = 1.0,
) -> MulticlassNB:
    """Multinomial NB over an arbitrary categorical label (domain,
    language, source bucket) -- the closed-form domain tagger a
    mixture-weighted pipeline needs before `mixture_sample` can
    resample by domain on UNLABELED data.

    Per class c: prior_ll = ln(n_docs_c / n_docs);
    ll(t, c) = ln((count(t, c) + a) / (tokens_c + aV));
    oov_ll(c) = the same at count = 0. V = seen-term count over the
    whole training set (shared across classes, so scores are
    comparable). One (doc, term) pass; everything after is
    (vocab x k)-bounded. The binary :func:`nb_fit` is this model's
    k=2 log-odds collapse.
    """
    cls = F.col(label_col).cast("string").alias("_c")
    tf = term_frequencies(train_df, text_col, id_col)
    labeled = tf.join(train_df.select(F.col(id_col), cls), [id_col])
    per_tc = labeled.groupBy("term", "_c").agg(F.sum("tf").alias("n_tc"))
    per_c = per_tc.groupBy("_c").agg(F.sum("n_tc").alias("tok_c"))
    vocab = per_tc.select("term").distinct().agg(
        F.count("*").alias("vocab_size")
    )
    docs_c = train_df.groupBy(cls).agg(F.count("*").alias("n_docs_c"))
    n_docs = train_df.agg(F.count("*").alias("n_docs"))
    a = F.lit(float(alpha))
    token_ll = (
        per_tc.join(per_c, "_c")
        .crossJoin(F.broadcast(vocab))
        .select(
            "term",
            F.col("_c").alias("cls"),
            F.log(
                (F.col("n_tc") + a)
                / (F.col("tok_c") + a * F.col("vocab_size"))
            ).alias("ll"),
        )
    )
    class_stats = (
        per_c.join(docs_c, "_c")
        .crossJoin(F.broadcast(vocab))
        .crossJoin(F.broadcast(n_docs))
        .select(
            F.col("_c").alias("cls"),
            F.log(
                F.col("n_docs_c").cast("double") / F.col("n_docs")
            ).alias("prior_ll"),
            F.log(
                a / (F.col("tok_c") + a * F.col("vocab_size"))
            ).alias("oov_ll"),
        )
    )
    return MulticlassNB(token_ll, class_stats, float(alpha))


def nb_multiclass_score(
    df: DataFrame,
    model: MulticlassNB,
    text_col: str = "text",
    id_col: str = "doc_id",
    broadcast_model: bool = True,
) -> DataFrame:
    """Per-doc class posteriors and argmax prediction.

    Output: (id, pred, score) -- score = the winning class's total
    log-likelihood rounded 6 dp; ties break to the lexicographically
    smallest class (deterministic, engine-portable). Token-free docs
    predict the max-prior class. Shape: one (doc, term) pass, one
    join against the (vocab x k) model (broadcast by default), one
    per-(doc, class) agg, one per-doc max -- the corpus shuffles
    twice (by doc-term and doc), both uniform keys.
    """
    maybe_b = F.broadcast if broadcast_model else (lambda d: d)
    tf = term_frequencies(df, text_col, id_col)
    # every (doc-term, class) pair: seen terms take ll, unseen oov_ll
    per_dc = (
        tf.crossJoin(maybe_b(model.class_stats.select("cls")))
        .join(maybe_b(model.token_ll), ["term", "cls"], "left")
        .join(
            maybe_b(model.class_stats), ["cls"]
        )
        .groupBy(id_col, "cls")
        .agg(
            F.round(
                F.first("prior_ll")
                + F.sum(
                    F.col("tf") * F.coalesce(F.col("ll"), F.col("oov_ll"))
                ),
                6,
            ).alias("total_ll")
        )
    )
    # deterministic argmax: min over (-ll, cls) = highest ll, ties to
    # the lexicographically smallest class
    best = per_dc.groupBy(id_col).agg(
        F.min(
            F.struct(
                (-F.col("total_ll")).alias("neg"),
                F.col("cls"),
                F.col("total_ll"),
            )
        ).alias("_b")
    ).select(
        id_col,
        F.col("_b.cls").alias("pred"),
        F.col("_b.total_ll").alias("score"),
    )
    prior_pred = model.class_stats.orderBy(
        F.col("prior_ll").desc(), F.col("cls").asc()
    ).limit(1)
    return (
        df.select(id_col)
        .join(best, [id_col], "left")
        .crossJoin(
            F.broadcast(
                prior_pred.select(
                    F.col("cls").alias("_pp"),
                    F.round("prior_ll", 6).alias("_ps"),
                )
            )
        )
        .select(
            id_col,
            F.coalesce("pred", F.col("_pp")).alias("pred"),
            F.coalesce("score", F.col("_ps")).alias("score"),
        )
    )


def gate_report(
    gate,
    labeled: DataFrame,
    label_col: str = "label",
    id_col: str = "doc_id",
) -> dict:
    """Confusion report for ANY gate callable (the lm_quality_gate /
    nb_quality_gate / chain_gates protocol) against boolean labels
    (True = should keep): {"tp", "fp", "fn", "tn", "precision",
    "recall", "keep_rate"} -- the calibration numbers to read before
    pointing a gate at 100 TB. Two count aggregates; driver state is
    the report dict."""
    passing, failing = gate(labeled)
    y = F.col(label_col).cast("boolean")
    kept = passing.select(id_col).join(
        labeled.select(F.col(id_col), y.alias("_y")), [id_col]
    )
    tp = kept.filter("_y").count()
    fp = kept.filter("NOT _y").count()
    total = labeled.count()
    pos = labeled.filter(y).count()
    fn = pos - tp
    tn = (total - pos) - fp
    return {
        "tp": tp,
        "fp": fp,
        "fn": fn,
        "tn": tn,
        "precision": round(tp / (tp + fp), 6) if tp + fp else None,
        "recall": round(tp / pos, 6) if pos else None,
        "keep_rate": round((tp + fp) / total, 6) if total else None,
    }


_NB_META_FILE = "_xes_nb_meta.json"


def save_nb(model: NaiveBayesModel, path: str) -> None:
    """Persist a fitted NB model as an artifact (token_weights + stats
    parquet, alpha in a Hadoop-FS meta sidecar) -- the same fit-once /
    load-everywhere contract as operators/lm.save_lm."""
    from xmidt_event_streams_spark.fsutil import write_json_sidecar

    base = path.rstrip("/")
    model.token_weights.write.mode("overwrite").parquet(base + "/weights")
    model.stats.write.mode("overwrite").parquet(base + "/stats")
    write_json_sidecar(
        model.token_weights.sparkSession,
        base,
        _NB_META_FILE,
        {"alpha": model.alpha, "kind": "binary"},
    )


def load_nb(spark, path: str) -> NaiveBayesModel:
    """Load a :func:`save_nb` artifact; raises without the sidecar."""
    from xmidt_event_streams_spark.fsutil import read_json_sidecar

    base = path.rstrip("/")
    meta = read_json_sidecar(spark, base, _NB_META_FILE)
    if meta is None or meta.get("kind") != "binary":
        raise ValueError(f"no binary-NB meta sidecar at {path}")
    return NaiveBayesModel(
        spark.read.parquet(base + "/weights"),
        spark.read.parquet(base + "/stats"),
        float(meta["alpha"]),
    )


def save_nb_multiclass(model: MulticlassNB, path: str) -> None:
    """Persist a fitted multiclass NB (token_ll + class_stats parquet,
    alpha in the guarded sidecar; kind-tagged so binary/multiclass
    artifacts cannot be loaded as each other)."""
    from xmidt_event_streams_spark.fsutil import write_json_sidecar

    base = path.rstrip("/")
    model.token_ll.write.mode("overwrite").parquet(base + "/token_ll")
    model.class_stats.write.mode("overwrite").parquet(base + "/class_stats")
    write_json_sidecar(
        model.token_ll.sparkSession,
        base,
        _NB_META_FILE,
        {"alpha": model.alpha, "kind": "multiclass"},
    )


def load_nb_multiclass(spark, path: str) -> MulticlassNB:
    from xmidt_event_streams_spark.fsutil import read_json_sidecar

    base = path.rstrip("/")
    meta = read_json_sidecar(spark, base, _NB_META_FILE)
    if meta is None or meta.get("kind") != "multiclass":
        raise ValueError(f"no multiclass-NB meta sidecar at {path}")
    return MulticlassNB(
        spark.read.parquet(base + "/token_ll"),
        spark.read.parquet(base + "/class_stats"),
        float(meta["alpha"]),
    )
