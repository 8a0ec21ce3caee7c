"""Property-based cross-engine parity for the text canonicalization
path (hypothesis): every downstream dedup/text signature -- exact
fingerprints, MinHash shingles, token stats -- assumes Spark (Java
regex) and the DuckDB oracle (RE2) compute IDENTICAL normalized
forms. The shorthand classes differ between the dialects (Java ``\\s``
includes vertical tab 0x0B, RE2's does not), which is exactly why
normalize_text spells the class out; this test drives adversarial
whitespace/unicode through both engines and asserts byte-identical
results for normalize / tokens / fingerprint / word 3-grams.
"""

import duckdb
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from xmidt_event_streams_spark.functions.text import (
    fingerprint,
    normalize_text,
    tokens,
    word_ngrams,
)

# adversarial alphabet: every whitespace the two dialects disagree on,
# plus ascii and multi-byte unicode (case-mapping exercised by lower())
_ALPHABET = (
    " \t\n\x0b\f\r" + "abcXYZ012.,;:!?'\"()-_" + "éÉßñÑ" + "Ая" + "中日"
)

_NORM_SQL = (
    r"trim(regexp_replace(lower(t), '[ \t\n\x0B\f\r]+', ' ', 'g'))"
)


def _duck_text(rows):
    con = duckdb.connect()
    con.register("inp", pd.DataFrame({"i": range(len(rows)), "t": rows}))
    out = con.execute(f"""
        WITH n AS (SELECT i, {_NORM_SQL} AS norm FROM inp),
        w AS (SELECT i, norm,
                     list_filter(string_split(norm, ' '), x -> x <> '') AS toks
              FROM n)
        SELECT i, norm, md5(norm) AS fp, toks,
          list_transform(generate_series(1, greatest(len(toks) - 2, 0)),
                         j -> array_to_string(toks[j:j+2], ' ')) AS grams
        FROM w ORDER BY i
    """).fetchall()
    con.close()
    return out


@settings(max_examples=12, deadline=None)
@given(
    st.lists(
        st.text(alphabet=_ALPHABET, min_size=0, max_size=40),
        min_size=1,
        max_size=24,
    )
)
def test_normalize_tokens_fingerprint_grams_cross_engine(spark, texts):
    sdf = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "i: long, t: string"
    ).select(
        "i",
        normalize_text("t").alias("norm"),
        fingerprint("t").alias("fp"),
        tokens("t").alias("toks"),
        word_ngrams("t", 3).alias("grams"),
    )
    srows = {r["i"]: r for r in sdf.collect()}
    for i, norm, fp, toks, grams in _duck_text(texts):
        s = srows[i]
        assert s["norm"] == norm, (texts[i], s["norm"], norm)
        assert s["fp"] == fp
        assert list(s["toks"]) == list(toks)
        assert list(s["grams"]) == list(grams)


class TestCanonicalText:
    def test_nfc_parity_with_duckdb(self, spark):
        import duckdb

        from xmidt_event_streams_spark.functions.text import canonical_text

        rows = [
            (0, "école"),           # decomposed accent -> école
            (1, "café"),             # already composed
            (2, "Å"),               # Å decomposed
            (3, None),
        ]
        df = spark.createDataFrame(rows, "id long, t string")
        got = {
            r["id"]: r["c"]
            for r in df.select(
                "id",
                canonical_text(
                    "t", form="NFC", casefold=False, collapse_whitespace=False
                ).alias("c"),
            ).collect()
        }
        con = duckdb.connect()
        want = {
            i: (None if t is None else con.execute(
                "SELECT nfc_normalize(?)", [t]
            ).fetchone()[0])
            for i, t in rows
        }
        assert got == want

    def test_nfkc_casefold_unifies_dedup_keys(self, spark):
        """The dedup motivation: compatibility variants + case + runs
        of whitespace must fingerprint identically after
        canonicalization, and differently before."""
        from xmidt_event_streams_spark.functions.text import (
            canonical_text,
            fingerprint,
        )

        rows = [
            (0, "ﬁle  over\tthere"),   # 'ﬁle' ligature + messy ws
            (1, "FILE OVER THERE"),
            (2, "unrelated document"),
        ]
        df = spark.createDataFrame(rows, "id long, t string")
        raw = {r["id"]: r["f"] for r in df.select(
            "id", fingerprint("t").alias("f")).collect()}
        canon = {r["id"]: r["f"] for r in df.select(
            "id", fingerprint(canonical_text("t")).alias("f")).collect()}
        assert raw[0] != raw[1]
        assert canon[0] == canon[1]
        assert canon[0] != canon[2]

    def test_rejects_bad_form(self, spark):
        import pytest

        from xmidt_event_streams_spark.functions.text import canonical_text

        with pytest.raises(ValueError, match="bad normalization form"):
            canonical_text("t", form="NFX")
