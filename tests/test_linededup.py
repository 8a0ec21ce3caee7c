"""Corpus-wide exact line dedup (operators/linededup.py): semantics
on planted boilerplate + a DuckDB twin over the same frame (the
shared testdata docs are single-line, so the planted corpus is where
line structure exists to test)."""

from __future__ import annotations

import duckdb
import pandas as pd
from pyspark.sql import functions as F

from xmidt_event_streams_spark.operators.linededup import line_dedup

BANNER = "accept all cookies"
FOOTER = "copyright example corp"

DOCS = [
    (1, f"{BANNER}\nunique first body\n\n{FOOTER}"),
    (2, f"{BANNER}\nunique second body\n{FOOTER}"),
    (3, f"unique third body\n{BANNER}"),
    (4, f"{BANNER}\n{FOOTER}"),          # hollowed out entirely
    (5, ""),                              # empty doc
    (6, "unique first body"),             # dup of doc 1's line 2? no:
                                          # first occurrence is doc 1
]

_TWIN_SQL = """
WITH lines AS (
  SELECT doc_id, generate_subscripts(l, 1) AS pos, unnest(l) AS line
  FROM (SELECT doc_id, string_split(text, chr(10)) AS l FROM docs)
),
ded AS (SELECT * FROM lines WHERE len(trim(line)) >= 1),
first_doc AS (SELECT line, min(doc_id) AS md FROM ded GROUP BY line),
firsts AS (
  SELECT d.line, d.md, min(pos) AS mp
  FROM ded JOIN first_doc d ON ded.line = d.line AND ded.doc_id = d.md
  GROUP BY d.line, d.md
),
kept AS (
  SELECT ded.doc_id, ded.pos, ded.line
  FROM ded JOIN firsts
    ON ded.line = firsts.line
    AND ded.doc_id = firsts.md AND ded.pos = firsts.mp
  UNION ALL
  SELECT doc_id, pos, line FROM lines WHERE len(trim(line)) < 1
),
rebuilt AS (
  SELECT doc_id,
    string_agg(line, chr(10) ORDER BY pos) AS new_text,
    count(*) AS n_kept
  FROM kept GROUP BY doc_id
)
SELECT d.doc_id,
  coalesce(new_text, '') AS text,
  len(string_split(d.text, chr(10))) - coalesce(n_kept, 0)
    AS n_lines_removed
FROM docs d LEFT JOIN rebuilt USING (doc_id)
ORDER BY doc_id
"""


def test_line_dedup_semantics(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    out = {r["doc_id"]: r for r in line_dedup(df).collect()}
    assert len(out) == len(DOCS)  # every doc survives as a row
    # first occurrences keep the boilerplate, later ones lose it
    assert out[1]["text"] == f"{BANNER}\nunique first body\n\n{FOOTER}"
    assert out[1]["n_lines_removed"] == 0
    assert out[2]["text"] == "unique second body"
    assert out[2]["n_lines_removed"] == 2
    assert out[3]["text"] == "unique third body"
    # hollowed-out doc: empty text, full count -- visible, not deleted
    assert out[4]["text"] == "" and out[4]["n_lines_removed"] == 2
    # empty doc: single blank line, untouched
    assert out[5]["text"] == "" and out[5]["n_lines_removed"] == 0
    # cross-doc exact dup of a non-boilerplate line also dedups
    assert out[6]["text"] == "" and out[6]["n_lines_removed"] == 1


def test_line_dedup_matches_duckdb_twin(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = sorted(
        (r["doc_id"], r["text"], r["n_lines_removed"])
        for r in line_dedup(df).collect()
    )
    con = duckdb.connect()
    con.register("docs", pd.DataFrame(DOCS, columns=["doc_id", "text"]))
    want = [tuple(r) for r in con.execute(_TWIN_SQL).fetchall()]
    con.close()
    assert got == want


def test_line_dedup_idempotent_and_column_preserving(spark):
    df = spark.createDataFrame(
        [(i, t, f"s{i % 2}") for i, t in DOCS],
        "doc_id long, text string, source string",
    )
    once = line_dedup(df)
    assert set(once.columns) == {"doc_id", "text", "source", "n_lines_removed"}
    twice = line_dedup(once.drop("n_lines_removed"))
    a = sorted((r["doc_id"], r["text"]) for r in once.collect())
    b = sorted((r["doc_id"], r["text"]) for r in twice.collect())
    assert a == b  # a deduped corpus has nothing left to dedup


def test_line_dedup_composes_into_corpus_build(spark, tmp_path):
    """line_level_dedup=True strips corpus-wide boilerplate before the
    doc-level stages; the ledger counts lines, docs balance intact."""
    from xmidt_event_streams_spark.corpus import build_training_corpus

    df = spark.createDataFrame(
        [(i, f"{BANNER}\nbody text number {i}") for i in range(6)],
        "doc_id long, text string",
    )
    ledger = build_training_corpus(
        df,
        str(tmp_path / "out"),
        quality=None,
        dedup="exact",
        line_level_dedup=True,
        n_shards=2,
    )
    assert ledger["lines_removed"] == 5  # banner survives only in doc 0
    assert ledger["exact_dups_dropped"] == 0  # bodies all distinct
    assert ledger["written"] == 6
    back = spark.read.parquet(str(tmp_path / "out"))
    texts = {r["doc_id"]: r["text"] for r in back.collect()}
    assert texts[0].startswith(BANNER)
    assert all(not texts[i].startswith(BANNER) for i in range(1, 6))
