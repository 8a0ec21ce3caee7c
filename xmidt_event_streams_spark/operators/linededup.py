"""Corpus-wide exact LINE deduplication (the C4 / RefinedWeb pass).

Web corpora repeat boilerplate lines across millions of pages (cookie
banners, nav menus, license footers); document-level dedup never sees
them because the surrounding text differs. C4 (arXiv:1910.10683) and
RefinedWeb (arXiv:2306.01116) therefore dedup at LINE granularity:
every line that occurs more than once in the corpus keeps exactly its
first occurrence, and documents are reassembled from their surviving
lines. This complements the substring-span pass (winnowed spans catch
long near-verbatim overlap; this catches exact short boilerplate at
much lower cost).

Semantics:
  * a "line" is a ``\\n``-split segment, matched EXACTLY (no
    normalization -- reassembly must reproduce surviving text
    byte-identically);
  * lines whose trimmed length is < ``min_line_chars`` (default 1:
    blank lines) never participate -- deduping blank separators would
    mangle every document's layout for zero dedup value;
  * the survivor is the corpus-wide minimum (id, position) occurrence
    -- deterministic under any partitioning, the min-id convention of
    every dedup operator in the package;
  * documents reassemble in original line order; ``n_lines_removed``
    rides along so the caller can ledger/drop hollowed-out docs
    (``text`` becomes '' when every line was a duplicate -- visible,
    never silently deleted).

Scale shape at 100 TB: one posexplode pass, one hash-agg on the
(uniform, md5-keyed) line relation for the survivor set, one join of
the line relation back on that key (the survivor side reuses the agg
exchange), one per-doc reassembly agg. Every shuffle key is uniform
(md5 / doc id); no all-pairs shape, no driver materialization. The
line relation is ~rows x avg_lines wide -- the same amplification
class as the shingle explode in dedup.py, with the same mitigation
(it exists only inside the job).

Reference has no text surface (SURVEY.md §2.8); beyond-reference
LLM-pipeline mandate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def line_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_line_chars: int = 1,
) -> DataFrame:
    """Corpus-wide first-occurrence line dedup; returns the input
    relation with ``text_col`` rebuilt from surviving lines plus
    ``n_lines_removed``. Column set otherwise preserved."""
    lines = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), "\n", -1)).alias("pos", "line"),
    )
    dedupable = F.length(F.trim(F.col("line"))) >= min_line_chars
    occ = F.struct(F.col(id_col), F.col("pos"))
    ded = lines.filter(dedupable).withColumn("k", F.md5(F.col("line")))
    firsts = ded.groupBy("k").agg(F.min(occ).alias("first"))
    kept_ded = (
        ded.join(firsts, "k")
        .filter(occ == F.col("first"))
        .select(id_col, "pos", "line")
    )
    kept = kept_ded.unionByName(
        lines.filter(~dedupable).select(id_col, "pos", "line")
    )
    rebuilt = kept.groupBy(id_col).agg(
        F.concat_ws(
            "\n",
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "line"))),
                lambda s: s["line"],
            ),
        ).alias("_new_text"),
        F.count("*").alias("_n_kept"),
    )
    n_in = F.size(F.split(F.col(text_col), "\n", -1))
    # LEFT join: a doc whose every line was a duplicate has no kept
    # rows -- it survives with text = '' and a full removal count
    # (the caller's drop policy, not ours)
    return (
        df.withColumn("_n_in", n_in)
        .join(rebuilt, [id_col], "left")
        .withColumn(text_col, F.coalesce(F.col("_new_text"), F.lit("")))
        .withColumn(
            "n_lines_removed",
            F.col("_n_in") - F.coalesce(F.col("_n_kept"), F.lit(0)),
        )
        .drop("_new_text", "_n_in", "_n_kept")
    )
