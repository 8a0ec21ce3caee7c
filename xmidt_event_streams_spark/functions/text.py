"""Text-analysis column functions: tokenization, n-grams, quality,
language-ID, fingerprinting.

All built-in-function compositions (JVM-side, codegen'd); nothing here
drops to Python per row. These back the documents-table operators
(dedup, quality filtering, lang-id) a training-data pipeline needs.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny per-language stopword lists for the n-gram/stopword heuristic
# language identifier. Deliberately small + deterministic so the DuckDB
# oracle can embed the same lists.
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "is", "in", "that", "it"),
    "es": ("el", "la", "de", "que", "y", "en", "los", "se"),
    "fr": ("le", "la", "de", "et", "les", "des", "en", "un"),
    "de": ("der", "die", "und", "das", "von", "zu", "mit", "den"),
    "zh": ("de5", "shi4", "le5", "zai4", "he2", "you3", "wo3", "ta1"),
}


def let_bind(value: Column, body) -> Column:
    """Evaluate ``value`` ONCE per row and pass it to ``body`` as a
    lambda variable.

    Spark has no let-binding in its expression language: a non-trivial
    expression referenced inside a higher-order-function lambda is
    re-evaluated PER ARRAY ELEMENT (the lambda body is evaluated per
    element, and only lambda variables are cheap references). E.g. the
    naive ``transform(sequence(1, n), i -> slice(tokens(text), i, 3))``
    re-tokenizes the document once per shingle position -- measured 8x
    slower at sf0.1. ``get(transform(array(value), v -> body(v)), 0)``
    wraps the value in a 1-element array so the inner lambda sees a
    bound variable; Catalyst evaluates ``value`` exactly once per row.
    """
    return F.get(F.transform(F.array(value), body), 0)


def sanitize_utf8(col: Column | str, from_binary: bool = False) -> Column:
    """F7 ``strings.ToValidUTF8`` (filter/filter_factory.go:52):
    replace invalid UTF-8 sequences with U+FFFD.

    Spark STRING columns are UTF-8 by construction from real sources,
    so the sanitizer matters at the binary->string boundary (raw
    payload bytes, ``from_binary=True``) and after a reinterpreting
    cast. ``make_valid_utf8`` is the JVM-side built-in with exactly
    the Go semantics (replacement, null-propagating); the strict
    alternative ``validate_utf8`` raises MALFORMED_CHARACTER_CODING
    instead — we sanitize, like the reference."""
    c = F.col(col) if isinstance(col, str) else col
    if from_binary:
        c = c.cast("string")  # reinterpret bytes, then repair
    return F.make_valid_utf8(c)


def normalize_text(col: Column | str) -> Column:
    """Lowercase + collapse whitespace + trim: canonical form for
    fingerprints and shingles.

    The whitespace class is spelled out instead of ``\\s`` because the
    shorthand is DIALECT-DEPENDENT: Java regex ``\\s`` includes
    vertical tab (0x0B), RE2 (DuckDB, Go -- the reference's dialect,
    SURVEY.md §7 'regex drift') does not. An explicit class means
    every engine computes the same fingerprints
    (tests/test_text_properties.py pins this property)."""
    col = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(F.lower(col), r"[ \t\n\x0B\f\r]+", " "))


def md5_bucket(col: Column | str, n_buckets: int) -> Column:
    """Uniform bucket in [0, n_buckets) from the column's md5: the
    engine-portable hashing-trick index shared by hashed classifier
    features and hashed TF-IDF vectors (ONE definition -- if the
    hash ever changes, both feature spaces move together instead of
    silently diverging). 60 bits of the digest, pmod n."""
    c = F.col(col) if isinstance(col, str) else col
    return F.pmod(
        F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long"),
        F.lit(n_buckets),
    )


def cased_tokens(col: Column | str) -> Column:
    """Whitespace tokenization WITHOUT case folding: same whitespace
    class as :func:`normalize_text`, so position i here is the cased
    form of position i in :func:`tokens` (lowercasing never changes
    token boundaries). For rebuilds that must preserve the original
    text's case while MATCHING on the normalized form (span excision
    inside a corpus build)."""
    c = F.col(col) if isinstance(col, str) else col
    collapsed = F.trim(F.regexp_replace(c, r"[ \t\n\x0B\f\r]+", " "))
    return F.filter(F.split(collapsed, " "), lambda t: t != "")


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization of normalized text -> array<string>.
    Empty text -> empty array (split of '' yields [''] -- filtered)."""
    norm = normalize_text(col)
    return F.filter(F.split(norm, " "), lambda t: t != "")


_PY_WS = re.compile(r"[ \t\n\x0b\f\r]+")


def py_tokens(s: str) -> list[str]:
    """Driver-side twin of :func:`tokens` (same whitespace class, same
    lowercase) for tokenizing driver-held strings -- takedown phrases,
    search phrases -- identically to the corpus."""
    return [t for t in _PY_WS.sub(" ", s.lower()).strip().split(" ") if t]


def token_count(col: Column | str) -> Column:
    return F.size(tokens(col))


def bpe_ish_token_count(col: Column | str) -> Column:
    """Token count under a BPE-ish segmentation: splits on word
    boundaries AND every ~4 chars within long words (approximates
    subword token counts for budget estimation)."""
    col = F.col(col) if isinstance(col, str) else col
    # each token contributes ceil(len/4) subword units
    return F.aggregate(
        tokens(col),
        F.lit(0),
        lambda acc, t: acc + F.ceil(F.length(t) / F.lit(4.0)).cast("int"),
    )


def char_ngrams(col: Column | str, n: int = 3) -> Column:
    """Character n-gram shingles of normalized text -> array<string>.

    Expressed with sequence+transform (no UDF): positions 1..len-n+1.
    The normalized string is let-bound so it is computed once per row,
    not once per character position.
    """
    def body(norm: Column) -> Column:
        cnt = F.length(norm) - F.lit(n - 1)
        # guard: sequence(1, 0) is DESCENDING [1,0] in Spark, not empty
        return F.when(cnt >= 1,
                      F.transform(F.sequence(F.lit(1), cnt),
                                  lambda i: norm.substr(i, F.lit(n)))
                      ).otherwise(F.array().cast("array<string>"))

    return let_bind(normalize_text(col), body)


def word_ngrams(col: Column | str, n: int = 3) -> Column:
    """Word n-gram shingles -> array<string> (space-joined).

    The token array is let-bound: tokenization runs once per row, not
    once per shingle position (8x at sf0.1, more on longer docs)."""
    def body(toks: Column) -> Column:
        cnt = F.size(toks) - F.lit(n - 1)
        # guard: sequence(1, 0) is DESCENDING [1,0] in Spark, not empty
        return F.when(cnt >= 1,
                      F.transform(F.sequence(F.lit(1), cnt),
                                  lambda i: F.concat_ws(" ", F.slice(toks, i, n)))
                      ).otherwise(F.array().cast("array<string>"))

    return let_bind(tokens(col), body)


def fingerprint(col: Column | str) -> Column:
    """Document fingerprint: md5 of normalized text (stable id for
    exact dedup)."""
    return F.md5(normalize_text(col))


ROLLING_HASH_BASE = 31
ROLLING_HASH_MOD = 1_000_000_007


def rolling_hash(col: Column | str) -> Column:
    """Polynomial rolling hash (Karp-Rabin) of normalized text:
    fold h = (h*31 + codepoint) mod 1e9+7. Engine-portable (pure
    int64 arithmetic, no overflow: h < 1e9, h*31+c < 2^63) --
    the cheap numeric fingerprint tier next to md5."""
    def body(norm: Column) -> Column:
        codes = F.transform(
            F.sequence(F.lit(1), F.length(norm)),
            lambda i: F.ascii(norm.substr(i, F.lit(1))).cast("long"),
        )
        folded = F.aggregate(
            codes,
            F.lit(0).cast("long"),
            lambda acc, c: (acc * ROLLING_HASH_BASE + c) % ROLLING_HASH_MOD,
        )
        return F.when(F.length(norm) > 0, folded).otherwise(F.lit(0).cast("long"))

    return let_bind(normalize_text(col), body)


def stopword_ratio(col: Column | str, stopwords: tuple[str, ...]) -> Column:
    sw = F.array(*[F.lit(s) for s in stopwords])

    def body(toks: Column) -> Column:
        hits = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
        return F.when(F.size(toks) > 0, hits / F.size(toks)).otherwise(F.lit(0.0))

    return let_bind(tokens(col), body)


def quality_features(col: Column | str) -> dict[str, Column]:
    """Quality-scoring features: length, token stats, punctuation and
    digit ratios, stopword ratio (en)."""
    col_ = F.col(col) if isinstance(col, str) else col
    toks = tokens(col)
    n_chars = F.length(col_)
    n_tokens = F.size(toks)
    return {
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        "avg_token_len": F.when(
            n_tokens > 0,
            F.aggregate(toks, F.lit(0), lambda a, t: a + F.length(t)) / n_tokens,
        ).otherwise(F.lit(0.0)),
        "punct_ratio": F.when(
            n_chars > 0,
            F.length(F.regexp_replace(col_, r"[^.,;:!?'\"()-]", "")) / n_chars,
        ).otherwise(F.lit(0.0)),
        "digit_ratio": F.when(
            n_chars > 0, F.length(F.regexp_replace(col_, r"[^0-9]", "")) / n_chars
        ).otherwise(F.lit(0.0)),
        "stopword_ratio_en": stopword_ratio(col, LANG_STOPWORDS["en"]),
    }


def lang_scores(col: Column | str) -> dict[str, Column]:
    """Per-language stopword-hit counts (the lang-ID signal)."""
    toks = tokens(col)
    out = {}
    for lang, words in LANG_STOPWORDS.items():
        sw = F.array(*[F.lit(s) for s in words])
        out[lang] = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    return out


def predict_lang(col: Column | str) -> Column:
    """Heuristic language-ID: argmax of stopword hits, ties broken by
    language code order, 'und' when all scores are zero.

    The token array is let-bound: one tokenization per row shared by
    all per-language scores (was once per language)."""
    ordered = sorted(LANG_STOPWORDS.items())  # lang code asc
    n = len(ordered)

    def body(toks: Column) -> Column:
        # max over (score, reversed-rank): earlier lang code wins ties.
        pairs = F.array(
            *[
                F.struct(
                    F.size(
                        F.filter(
                            toks,
                            lambda t: F.array_contains(
                                F.array(*[F.lit(s) for s in words]), t
                            ),
                        )
                    ).alias("score"),
                    F.lit(n - 1 - i).alias("rank"),
                    F.lit(lang).alias("lang"),
                )
                for i, (lang, words) in enumerate(ordered)
            ]
        )
        best = F.array_max(pairs)
        return F.when(best["score"] > 0, best["lang"]).otherwise(F.lit("und"))

    return let_bind(tokens(col), body)


def canonical_text(
    col: Column | str,
    form: str = "NFKC",
    casefold: bool = True,
    collapse_whitespace: bool = True,
) -> Column:
    """Unicode-canonical text for dedup keys: compatibility-normalize
    (NFKC folds fullwidth/ligature/compatibility variants -- 'ﬁle' and
    'file' must fingerprint identically or near-dup recall silently
    drops on any corpus with mixed encoders), optionally casefold
    (str.casefold, the Unicode-correct lower()) and collapse runs of
    whitespace. Arrow-batched UDF: the JVM expression set has no
    Unicode normalizer, and this runs ONCE per document at ingest --
    canonicalize, then fingerprint/shingle the canonical form
    everywhere downstream (exact_dedup, minhash, simhash), never the
    raw text.

    DuckDB twin for NFC parity testing: ``nfc_normalize()`` (DuckDB
    has no NFKC, so cross-engine tests pin form='NFC')."""
    import unicodedata


    if form not in ("NFC", "NFD", "NFKC", "NFKD"):
        raise ValueError(f"bad normalization form {form!r}")

    # explicit pandas_udf form: this module's future-annotations
    # import stringifies inline type hints, breaking signature
    # inference for the locally-imported pd
    def _canon(s):
        def one(t):
            if t is None:
                return None
            t = unicodedata.normalize(form, t)
            if casefold:
                t = t.casefold()
            if collapse_whitespace:
                t = " ".join(t.split())
            return t

        return s.map(one)

    udf = F.pandas_udf(_canon, "string").asNondeterministic()
    return udf(F.col(col) if isinstance(col, str) else col)


# -- HTML -> text extraction ------------------------------------------

# RE2 ∩ Java-regex safe (no backreferences/lookbehind): tags and
# comments are non-greedy char classes. script/style/head contents are
# removed WITH their elements; (?is) = case-insensitive + dotall so
# multi-line blocks match.
_HTML_STRIP_BLOCKS = (
    r"(?is)<(script|style|head|noscript|template)[^>]*>.*?</\1\s*>",
    r"(?s)<!--.*?-->",
)
_HTML_TAG = r"(?s)<[^>]+>"
_HTML_BLOCK_TAG_BREAK = (
    r"(?i)</?(p|div|br|li|ul|ol|tr|td|th|table|h[1-6]|section|article|"
    r"header|footer|blockquote|pre|form)[^>]*>"
)
_HTML_ENTITIES = (
    ("&nbsp;", " "),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&apos;", "'"),
    ("&amp;", "&"),  # LAST: otherwise &amp;lt; would double-decode
)


def html_to_text(col: Column | str) -> Column:
    """Boilerplate-light HTML -> plain text, as a pure JVM expression
    chain (the crawl-ingest normalizer: a 100 TB web corpus arrives as
    markup, and every text operator downstream assumes prose).

    Heuristic, regex-based (the trafilatura-class DOM walk needs a
    parser the hot path can't afford): (1) drop script/style/head/
    noscript/template ELEMENTS with their contents and comments;
    (2) block-level tags become newlines (paragraph structure survives
    for line_dedup/quality rules); (3) remaining tags vanish; (4) the
    six ubiquitous entities decode (&amp; last, so escaped escapes
    don't double-decode); (5) horizontal whitespace collapses per
    line, blank runs collapse to one blank line.

    One backreference exists in the block-strip pattern (\\1 on the
    closing tag) — Java regex supports it; this column is NOT part of
    any DuckDB-oracle query (RE2 lacks backreferences), which is why
    the parity evidence is a planted pytest, not a registry twin.
    """
    c = F.col(col) if isinstance(col, str) else col
    for pat in _HTML_STRIP_BLOCKS:
        c = F.regexp_replace(c, pat, " ")
    c = F.regexp_replace(c, _HTML_BLOCK_TAG_BREAK, "\n")
    c = F.regexp_replace(c, _HTML_TAG, " ")
    for ent, rep in _HTML_ENTITIES:
        c = F.replace(c, F.lit(ent), F.lit(rep))
    # collapse horizontal whitespace; trim line edges; squeeze blank
    # runs; strip the document edges (explicit class -- trim() only
    # removes spaces, and \n survives block-tag conversion)
    c = F.regexp_replace(c, r"[ \t\x0B\f\r]+", " ")
    c = F.regexp_replace(c, r" ?\n ?", "\n")
    c = F.regexp_replace(c, r"\n{2,}", "\n\n")
    return F.regexp_replace(c, r"^[\n ]+|[\n ]+$", "")
