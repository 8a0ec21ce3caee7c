"""DSIR: Data Selection via Importance Resampling (arXiv:2302.03169).

The published recipe for targeting a raw crawl at a trusted corpus
without training a classifier: model both corpora as bags of HASHED
n-grams (unigrams + bigrams -> ``dim`` buckets), and weight each raw
document by its log likelihood ratio

    log w(x) = sum_b  c_b(x) * ( ln p_target(b) - ln p_raw(b) )

with Laplace-smoothed bucket probabilities. Selection then samples
without replacement with probability proportional to ``w`` via the
Gumbel-top-k trick. Unlike the NB/LR quality gates (classifier.py),
DSIR needs NO labels on the raw side -- the raw corpus itself is the
background model -- which is why the paper positions it for "match
this 100 TB crawl to Wikipedia+books" style selection.

Everything is closed form, so a SQL oracle replays fit+score
bit-identically (the registry's ``dsir_weights`` query).

Scale shape at 100 TB:
  * fit: one explode over hashed grams per corpus + a ``dim``-bounded
    bucket agg each; the model is a (dim)-row relation + a 1-row
    default -- broadcast-sized BY DECLARATION, independent of corpus
    size (the hashing trick, same md5_bucket as classifier.py /
    tfidf_hashed_vectors so all hashed feature spaces move together).
  * score: one explode + (doc, bucket) hash-agg, broadcast join
    against the model, one per-doc agg. The corpus shuffles once.
  * sample: the Gumbel key is md5 arithmetic (a pure row function --
    reproducible, partition-layout-independent); ``k``-selection is
    a TakeOrderedAndProject (each task keeps k, driver merges k) --
    use the ``fraction`` arm for selections too big to hold k rows
    on the driver: it thresholds on an approx-quantile of the key
    (mergeable sketch, one pass) and filters -- nothing is collected.

Reference has no data-selection surface (SURVEY.md §2.8); this is the
beyond-reference LLM-pipeline mandate, composing with corpus.py's
gate chain.
"""

from __future__ import annotations

from typing import NamedTuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from xmidt_event_streams_spark.functions.text import (
    let_bind,
    md5_bucket,
    tokens,
)

_COIN_BUCKETS = 1 << 20


class DsirModel(NamedTuple):
    """(bucket, lw) log-likelihood-ratio weights per seen bucket
    (``dim``-bounded) + a 1-row stats relation (lw_default for buckets
    unseen in BOTH corpora) -- both broadcast-sized."""

    bucket_weights: DataFrame
    stats: DataFrame
    dim: int
    alpha: float


def hashed_ngram_buckets(text_col, dim: int) -> F.Column:
    """array<long> of md5 bucket ids for the doc's unigrams + bigrams.

    Pure array arithmetic (slice + zip_with + transform) inside
    whole-stage codegen -- no shuffle, and the tokenization runs once
    per row (let_bind). Docs with < 2 tokens contribute unigrams only.
    """

    def body(toks: F.Column) -> F.Column:
        n = F.size(toks)
        bigrams = F.when(
            n >= 2,
            F.zip_with(
                F.slice(toks, 1, n - 1),
                F.slice(toks, 2, n - 1),
                lambda a, b: F.concat(a, F.lit(" "), b),
            ),
        ).otherwise(F.array().cast("array<string>"))
        return F.transform(
            F.concat(toks, bigrams), lambda g: md5_bucket(g, dim)
        )

    return let_bind(tokens(text_col), body)


def _bucket_counts(
    df: DataFrame, text_col: str, dim: int, out: str
) -> DataFrame:
    """(bucket, <out>): total hashed-gram occurrences per bucket."""
    return (
        df.select(
            F.explode(hashed_ngram_buckets(text_col, dim)).alias("bucket")
        )
        .groupBy("bucket")
        .agg(F.count("*").alias(out))
    )


def dsir_fit(
    target_df: DataFrame,
    raw_df: DataFrame,
    text_col: str = "text",
    dim: int = 4096,
    alpha: float = 1.0,
) -> DsirModel:
    """Fit the hashed-ngram importance model target-vs-raw.

    lw(b)      = ln((t_b + a) / (T + a*dim)) - ln((r_b + a) / (R + a*dim))
    lw_default = the same expression at t_b = r_b = 0

    with T/R the corpora's total hashed-gram counts. Two corpus passes
    (one each), then everything is ``dim``-bounded.
    """
    t = _bucket_counts(target_df, text_col, dim, "t_cnt")
    r = _bucket_counts(raw_df, text_col, dim, "r_cnt")
    both = (
        t.join(r, ["bucket"], "full_outer")
        .select(
            "bucket",
            F.coalesce("t_cnt", F.lit(0)).alias("t_cnt"),
            F.coalesce("r_cnt", F.lit(0)).alias("r_cnt"),
        )
    )
    return _model_from_counts(both, dim, alpha)


def dsir_fit_labeled(
    df: DataFrame,
    label_col: str,
    text_col: str = "text",
    dim: int = 4096,
    alpha: float = 1.0,
) -> DsirModel:
    """:func:`dsir_fit` for the common special case target ⊆ raw
    with a boolean membership column: ONE gram pass with conditional
    sums (t = grams where label, r = all grams) instead of two
    corpus explodes -- identical weights by construction, half the
    fit cost. Use when targeting a trusted SLICE of the corpus
    itself; use dsir_fit when the target is a separate corpus."""
    y = F.col(label_col).cast("boolean")
    both = (
        df.select(y.alias("_y"), F.explode(
            hashed_ngram_buckets(text_col, dim)
        ).alias("bucket"))
        .groupBy("bucket")
        .agg(
            F.sum(F.when(F.col("_y"), 1).otherwise(0)).alias("t_cnt"),
            F.count("*").alias("r_cnt"),
        )
    )
    return _model_from_counts(both, dim, alpha)


def _model_from_counts(both: DataFrame, dim: int, alpha: float) -> DsirModel:
    totals = both.agg(
        F.sum("t_cnt").alias("t_tot"), F.sum("r_cnt").alias("r_tot")
    )
    a = F.lit(float(alpha))
    d = F.lit(float(dim))
    denom_t = F.col("t_tot") + a * d
    denom_r = F.col("r_tot") + a * d
    weights = both.crossJoin(F.broadcast(totals)).select(
        "bucket",
        (
            F.log((F.col("t_cnt") + a) / denom_t)
            - F.log((F.col("r_cnt") + a) / denom_r)
        ).alias("lw"),
    )
    stats = totals.select(
        (F.log(a / denom_t) - F.log(a / denom_r)).alias("lw_default")
    )
    return DsirModel(weights, stats, int(dim), float(alpha))


def dsir_log_weights(
    df: DataFrame,
    model: DsirModel,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-doc DSIR log importance weight.

    Output: (id, n_feats, log_w) for EVERY input doc; gram-free docs
    carry log_w = 0.0 (an empty product -- no evidence either way).
    Rounded to 6 dp before leaving (relevance.py discipline) so the
    oracle's sum order cannot flip the value.
    """
    per_bucket = (
        df.select(
            F.col(id_col),
            F.explode(hashed_ngram_buckets(text_col, model.dim)).alias(
                "bucket"
            ),
        )
        .groupBy(id_col, "bucket")
        .agg(F.count("*").alias("tf"))
    )
    per_doc = (
        per_bucket.join(F.broadcast(model.bucket_weights), ["bucket"], "left")
        .crossJoin(F.broadcast(model.stats))
        .groupBy(id_col)
        .agg(
            F.sum("tf").alias("n_feats"),
            F.round(
                F.sum(
                    F.col("tf") * F.coalesce("lw", F.col("lw_default"))
                ),
                6,
            ).alias("log_w"),
        )
    )
    return (
        df.select(id_col)
        .join(per_doc, [id_col], "left")
        .select(
            id_col,
            F.coalesce("n_feats", F.lit(0)).alias("n_feats"),
            F.coalesce("log_w", F.lit(0.0)).alias("log_w"),
        )
    )


def dsir_quality_gate(
    model: DsirModel,
    min_log_w: float,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """The importance-weight floor as a reusable GATE: ``batch ->
    (passing, failing)`` with ``reject_reason='dsir'`` -- the
    lm_quality_gate protocol, so it chains with the other learned
    gates (corpus.chain_gates) and drops into streaming ingest
    (start_ingest_dedup(quality=...)).

    A THRESHOLD, not a resample: streaming micro-batches cannot hold a
    corpus-wide quantile, so the caller picks min_log_w off a batch
    calibration run (gate_report / dsir_sample's quantile on a
    reference slice) and the gate applies it per row."""

    def gate(batch: DataFrame):
        scored = dsir_log_weights(batch, model, text_col, id_col).select(
            id_col, "log_w"
        )
        passing = batch.join(
            scored.filter(F.col("log_w") >= F.lit(min_log_w)).select(id_col),
            id_col,
        )
        failing = batch.join(
            scored.filter(F.col("log_w") < F.lit(min_log_w)).select(id_col),
            id_col,
        ).withColumn("reject_reason", F.lit("dsir"))
        return passing, failing

    return gate


_DSIR_META_FILE = "_xes_dsir_model_meta.json"


def save_dsir(model: DsirModel, path: str) -> None:
    """Persist a fitted DSIR model (bucket_weights + stats parquet,
    dim/alpha in a Hadoop-FS meta sidecar) -- fit once on the
    target-vs-raw pair, load everywhere (batch recipe, streaming
    gate), the save_nb/save_lm artifact contract. Object-store safe:
    all I/O goes through Spark/Hadoop, never local open()."""
    from xmidt_event_streams_spark.fsutil import write_json_sidecar

    base = path.rstrip("/")
    model.bucket_weights.write.mode("overwrite").parquet(base + "/weights")
    model.stats.write.mode("overwrite").parquet(base + "/stats")
    write_json_sidecar(
        model.bucket_weights.sparkSession,
        base,
        _DSIR_META_FILE,
        {"dim": model.dim, "alpha": model.alpha, "kind": "dsir"},
    )


def load_dsir(spark, path: str) -> DsirModel:
    """Load a :func:`save_dsir` artifact; raises without the sidecar
    (an unstamped directory could have been hashed under a different
    dim -- scoring against it would be silently meaningless)."""
    from xmidt_event_streams_spark.fsutil import read_json_sidecar

    base = path.rstrip("/")
    meta = read_json_sidecar(spark, base, _DSIR_META_FILE)
    if meta is None or meta.get("kind") != "dsir":
        raise ValueError(f"no DSIR meta sidecar at {path}")
    return DsirModel(
        spark.read.parquet(base + "/weights"),
        spark.read.parquet(base + "/stats"),
        int(meta["dim"]),
        float(meta["alpha"]),
    )


def _gumbel_key(
    weight_col: str, id_col: str, temperature: float, seed: str
) -> F.Column:
    """log w / temperature + Gumbel(0,1) noise, with the uniform drawn
    from md5(seed|id) arithmetic instead of an RNG: the draw is a pure
    row function (reproducible across runs and partitionings; a new
    ``seed`` is a fresh draw -- the global_shuffle contract). The
    +0.5 bucket-center offset keeps u strictly inside (0,1) so the
    double log never sees 0."""
    u = (
        md5_bucket(
            F.concat(F.lit(seed), F.lit("|"), F.col(id_col).cast("string")),
            _COIN_BUCKETS,
        )
        + F.lit(0.5)
    ) / F.lit(float(_COIN_BUCKETS))
    gumbel = -F.log(-F.log(u))
    return F.col(weight_col) / F.lit(float(temperature)) + gumbel


def dsir_sample(
    scored: DataFrame,
    k: int | None = None,
    fraction: float | None = None,
    weight_col: str = "log_w",
    id_col: str = "doc_id",
    temperature: float = 1.0,
    seed: str = "dsir-0",
    quantile_accuracy: int = 10_000,
) -> DataFrame:
    """Gumbel-top-k selection: sampling WITHOUT replacement with
    P(select) proportional to exp(log_w / temperature) is exactly
    "keep the k largest of log_w/temperature + Gumbel noise" (the
    Gumbel-top-k identity the DSIR paper uses). temperature -> 0
    approaches deterministic top-k by weight; larger temperature
    flattens toward uniform.

    Exactly one of ``k`` / ``fraction``:
      * ``k``: global top-k -- TakeOrderedAndProject (every task keeps
        its local k, the driver merges); fine while k rows fit on the
        driver, which is the contract for "select 1M docs".
      * ``fraction``: threshold at the (1 - fraction) approx-quantile
        of the key (mergeable sketch, one extra pass, nothing
        collected but one double) then filter -- the 100 TB arm;
        selects fraction +/- the sketch's rank error.

    Rows with NULL weight are dropped (no probability is defined for
    them -- soft_quality_sample contract).
    """
    if (k is None) == (fraction is None):
        raise ValueError("pass exactly one of k= / fraction=")
    if temperature <= 0:
        raise ValueError(f"temperature must be > 0 (got {temperature})")
    keyed = scored.filter(F.col(weight_col).isNotNull()).withColumn(
        "_dsir_key", _gumbel_key(weight_col, id_col, temperature, seed)
    )
    if k is not None:
        picked = keyed.orderBy(F.col("_dsir_key").desc()).limit(int(k))
    else:
        if not (0.0 < fraction <= 1.0):
            raise ValueError(f"fraction must be in (0, 1] (got {fraction})")
        thr = keyed.agg(
            F.percentile_approx(
                "_dsir_key", F.lit(1.0 - fraction), F.lit(quantile_accuracy)
            ).alias("thr")
        )
        picked = keyed.crossJoin(F.broadcast(thr)).filter(
            F.col("_dsir_key") >= F.col("thr")
        ).drop("thr")
    return picked.drop("_dsir_key")
