"""Document-quality operators: repetition detection, composite
quality filtering, PII scrubbing.

The filtering layer between raw crawl and training shards (the Gopher
/ C4 rule family -- Rae et al. 2021 arXiv:2112.11446 §A1, Raffel et
al. 2020 arXiv:1910.10683 §2.2, implemented from the published rule
descriptions). Everything is built-in-expression compositions
(JVM-side, codegen'd, narrow -- the documents scan stays a zero-
exchange projection); the DuckDB twins in tests/test_quality.py pin
engine portability.

Repetition detection is the signal exact/near dedup misses: a
document that duplicates ITSELF (boilerplate loops, scraper echo,
keyword stuffing) has low cross-doc similarity but poisons training
all the same.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from xmidt_event_streams_spark.functions.text import (
    let_bind,
    tokens,
    word_ngrams,
)


def dup_token_frac(col: Column | str) -> Column:
    """Fraction of tokens that repeat an earlier token:
    1 - distinct/total. 0 for empty docs."""

    def body(toks: Column) -> Column:
        n = F.size(toks)
        return F.when(
            n > 0,
            F.round(
                1.0 - F.size(F.array_distinct(toks)).cast("double") / n, 6
            ),
        ).otherwise(F.lit(0.0))

    return let_bind(tokens(col), body)


def dup_ngram_frac(col: Column | str, n: int = 2) -> Column:
    """Fraction of word n-grams that repeat: 1 - distinct/total.
    The Gopher duplicate-n-gram family's cheap member (set-based;
    :func:`top_ngram_frac` is the single-dominator variant)."""

    def body(ngrams: Column) -> Column:
        total = F.size(ngrams)
        return F.when(
            total > 0,
            F.round(
                1.0
                - F.size(F.array_distinct(ngrams)).cast("double") / total,
                6,
            ),
        ).otherwise(F.lit(0.0))

    return let_bind(word_ngrams(col, n), body)


def top_ngram_frac(col: Column | str, n: int = 2) -> Column:
    """Share of all word n-grams claimed by the single most frequent
    one (Gopher's top-n-gram rule: a dominant bigram marks template/
    stuffed text). Per-row nested HOF: for each distinct n-gram count
    its occurrences, take the max -- O(distinct * total) per row,
    fine for document-sized arrays and still narrow/codegen'd."""

    def body(ngrams: Column) -> Column:
        total = F.size(ngrams)
        top = F.array_max(
            F.transform(
                F.array_distinct(ngrams),
                lambda d: F.size(F.filter(ngrams, lambda x: x == d)),
            )
        )
        return F.when(
            total > 0, F.round(top.cast("double") / total, 6)
        ).otherwise(F.lit(0.0))

    return let_bind(word_ngrams(col, n), body)


# Gopher-inspired rule set (arXiv:2112.11446 §A1.1, adapted to this
# corpus's scale -- the published thresholds assume web documents).
GOPHER_RULES: dict[str, dict] = {
    "too_few_tokens": {"min_tokens": 10},
    "too_many_tokens": {"max_tokens": 100_000},
    "avg_token_len_out_of_range": {"min_avg": 2.0, "max_avg": 12.0},
    "excessive_token_repetition": {"max_dup_token_frac": 0.80},
    "excessive_bigram_repetition": {"max_dup_2gram_frac": 0.90},
    "dominant_bigram": {"max_top_2gram_frac": 0.18},
}


def gopher_quality_columns(col: Column | str) -> dict[str, Column]:
    """The rule inputs as named columns (also useful standalone)."""
    toks = tokens(col)
    n_tokens = F.size(toks)
    avg_len = F.when(
        n_tokens > 0,
        F.aggregate(toks, F.lit(0), lambda a, t: a + F.length(t))
        / n_tokens,
    ).otherwise(F.lit(0.0))
    return {
        "n_tokens": n_tokens,
        "avg_token_len": F.round(avg_len, 6),
        "dup_token_frac": dup_token_frac(col),
        "dup_2gram_frac": dup_ngram_frac(col, 2),
        "top_2gram_frac": top_ngram_frac(col, 2),
    }


def gopher_keep(col: Column | str) -> tuple[Column, Column]:
    """(keep, reason): keep = passes every rule; reason = the FIRST
    failing rule's name (rule order above), null when kept. The
    reason column is the drop ledger -- aggregate it instead of
    discarding rows silently."""
    c = gopher_quality_columns(col)
    r = GOPHER_RULES
    checks = [
        ("too_few_tokens",
         c["n_tokens"] < r["too_few_tokens"]["min_tokens"]),
        ("too_many_tokens",
         c["n_tokens"] > r["too_many_tokens"]["max_tokens"]),
        ("avg_token_len_out_of_range",
         (c["avg_token_len"] < r["avg_token_len_out_of_range"]["min_avg"])
         | (c["avg_token_len"] > r["avg_token_len_out_of_range"]["max_avg"])),
        ("excessive_token_repetition",
         c["dup_token_frac"]
         > r["excessive_token_repetition"]["max_dup_token_frac"]),
        ("excessive_bigram_repetition",
         c["dup_2gram_frac"]
         > r["excessive_bigram_repetition"]["max_dup_2gram_frac"]),
        ("dominant_bigram",
         c["top_2gram_frac"] > r["dominant_bigram"]["max_top_2gram_frac"]),
    ]
    reason = None
    for name, failed in checks:
        reason = (
            F.when(failed, name) if reason is None else reason.when(failed, name)
        )
    reason = reason.otherwise(F.lit(None).cast("string"))
    return reason.isNull(), reason


# ------------------------------------------------------- PII scrubbing

# Patterns restricted to the Java-regex ∩ RE2 common dialect (no
# backreferences, no lookaround; \b and [0-9] mean the same thing in
# both) so the DuckDB twin matches byte-for-byte. Order matters:
# emails before phones (an email's digits must not half-match a phone
# rule), IPs before phones (dotted quads look like digit runs).
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b([0-9]{1,3}\.){3}[0-9]{1,3}\b", "<IP>"),
    (
        "phone",
        r"\+[0-9][0-9 .()-]{6,14}[0-9]|\b[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}\b",
        "<PHONE>",
    ),
)


def scrub_pii(col: Column | str) -> Column:
    """Replace emails, IPv4 addresses, and phone numbers with typed
    placeholder tokens (one regexp_replace per class, chained in
    PII_PATTERNS order). Narrow, codegen'd, null-propagating."""
    out = F.col(col) if isinstance(col, str) else col
    for _, pattern, token in PII_PATTERNS:
        out = F.regexp_replace(out, pattern, token)
    return out


def pii_counts(col: Column | str) -> dict[str, Column]:
    """Per-class match counts (the scrub ledger): {class: count}."""
    c = F.col(col) if isinstance(col, str) else col
    return {
        name: F.regexp_count(c, F.lit(pattern))
        for name, pattern, _ in PII_PATTERNS
    }


# ---------------------------------------------------- C4 line cleaning

# Line/page rules from C4 (Raffel et al. 2020, arXiv:1910.10683 §2.2),
# expressed as pure Column ops in the Java-regex ∩ RE2 ∩ DuckDB common
# dialect so the pytest twin replays them byte-for-byte:
#   line kept iff: ends in terminal punctuation, has >= 3 words, does
#   not mention javascript, and has no curly brace (code);
#   page kept iff: no "lorem ipsum", no "{", and the CLEANED text
#   retains >= min_sentences sentence terminators.
C4_MIN_WORDS_PER_LINE = 3
C4_MIN_SENTENCES = 5
_TERMINAL_RE = r'[.!?"]$'


def c4_clean_lines(col: Column | str) -> Column:
    """The surviving lines of a document, rejoined with newlines
    (lines are trimmed; dropped lines vanish). Narrow higher-order
    functions -- no explode, no shuffle, codegen'd end-to-end."""
    c = F.col(col) if isinstance(col, str) else col

    def _keep(line: Column) -> Column:
        t = F.trim(line)
        return (
            t.rlike(_TERMINAL_RE)
            & (F.size(F.split(t, r"\s+")) >= C4_MIN_WORDS_PER_LINE)
            & ~F.lower(t).contains("javascript")
            & ~t.contains("{")
            & ~t.contains("}")
        )

    return F.array_join(
        F.transform(F.filter(F.split(c, "\n"), _keep), lambda x: F.trim(x)),
        "\n",
    )


def c4_keep(
    col: Column | str, min_sentences: int = C4_MIN_SENTENCES
) -> tuple[Column, Column]:
    """(keep, reason) page verdict after line cleaning -- same drop-
    ledger contract as :func:`gopher_keep` (reason = first failing
    rule, null when kept; aggregate it, never silently discard)."""
    c = F.col(col) if isinstance(col, str) else col
    low = F.lower(c)
    cleaned = c4_clean_lines(c)
    n_sentences = F.regexp_count(cleaned, F.lit(r"[.!?]"))
    checks = [
        ("lorem_ipsum", low.contains("lorem ipsum")),
        ("curly_brace", c.contains("{")),
        ("too_few_sentences", n_sentences < min_sentences),
    ]
    reason = None
    for name, failed in checks:
        reason = (
            F.when(failed, name) if reason is None else reason.when(failed, name)
        )
    reason = reason.otherwise(F.lit(None).cast("string"))
    return reason.isNull(), reason


def composite_quality_score(col: Column | str) -> Column:
    """One scalar quality score per document: English stopword ratio
    (fluency proxy) minus punctuation/digit density penalties plus a
    saturating length bonus (min(n_tokens,100)/200). Each component
    is rounded to 6 dp BEFORE combining so the score is bit-identical
    across engines (the DuckDB twin replays the same rounded
    arithmetic); the composite is rounded to 6 dp again. Narrow,
    JVM-side, zero-exchange."""
    from xmidt_event_streams_spark.functions.text import quality_features

    feats = quality_features(col)
    return F.round(
        F.round(feats["stopword_ratio_en"], 6)
        - F.round(feats["punct_ratio"], 6)
        - F.round(feats["digit_ratio"], 6)
        + F.least(feats["n_tokens"], F.lit(100)) / F.lit(200.0),
        6,
    )


def quality_quantile_threshold(
    scored, score_col: str = "score", p: float = 0.75, approx: bool = False
) -> "Column":
    """1-row DataFrame holding the global p-quantile of ``score_col``.

    ``approx=False`` uses exact interpolated ``percentile`` -- a full
    global aggregate, fine up to ~10^9 rows and what the oracle
    checks. ``approx=True`` is the 100 TB arm: ``approx_percentile``
    (GK sketch, mergeable, one partial-agg pass, driver holds only
    the sketch); tests pin |approx - exact| within the accuracy
    contract. Filter with a broadcast of this 1-row frame -- the big
    side never shuffles (same pattern as bm25's corpus stats)."""
    if approx:
        expr = F.approx_percentile(score_col, F.lit(p), F.lit(10_000))
    else:
        expr = F.percentile(score_col, F.lit(p))
    return scored.agg(F.round(expr, 6).alias("thr"))


def filter_by_quality_quantile(
    scored, score_col: str = "score", p: float = 0.75, approx: bool = False
):
    """Keep rows at or above the global p-quantile of ``score_col``:
    threshold-join via a broadcast 1-row relation (BroadcastNestedLoop
    on a single row -- not a data-sized cartesian)."""
    thr = quality_quantile_threshold(scored, score_col, p, approx)
    return scored.crossJoin(F.broadcast(thr)).filter(
        F.col(score_col) >= F.col("thr")
    )
