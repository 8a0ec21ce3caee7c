"""Distributed BPE subword-vocabulary training and encoding.

BPE (Sennrich et al., arXiv:1508.07909) learns a subword vocabulary
by repeatedly merging the most frequent adjacent symbol pair. The
classic formulation operates on the WORD-FREQUENCY table, not the
corpus -- and that is what makes it tractable at 100 TB:

  * the corpus is touched ONCE (``word_counts``: tokenize + explode +
    one hash-agg shuffle on uniformly distributed words);
  * the merge loop runs over the distinct-word table, which is
    vocabulary-bounded (~10-100M rows for natural language) and stops
    growing once the corpus saturates the vocabulary, regardless of
    corpus size.

Driver-round economics: one merge per Spark round cannot reach a 32k
vocabulary (32k jobs). ``merges_per_round`` therefore selects the
top-K pairwise-DISJOINT pairs each round -- no symbol appears in two
selected merges, so applying them in one pass is order-independent
and each applied merge is exactly the merge the sequential algorithm
would eventually make while the selected pairs stay untouched by each
other. Rounds needed ~ vocab_size / K. With K=1 the algorithm is
bit-identical to the published sequential procedure
(tests/test_bpe.py pins this against a pure-Python reference).

Per round: one pair-count aggregation (explode adjacent pairs ->
hash-agg; the pair table is small -- |distinct words| x avg symbols)
+ one bounded ``limit(K x oversample).collect()`` (driver holds K
candidate rows, never the table) + one narrow Arrow re-segmentation
pass. Lineage is truncated with ``localCheckpoint`` every few rounds
so the plan does not deepen linearly with vocabulary size.

Encoding (``bpe_encode``) is a zero-shuffle Arrow-batched projection:
the learned merge ranks broadcast in the UDF closure, each batch
memoizes per distinct word.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from xmidt_event_streams_spark.functions.text import tokens

END = "</w>"  # word-boundary sentinel symbol

_WC_SCHEMA = StructType(
    [
        StructField("word", StringType()),
        StructField("n", LongType()),
        StructField("sym", ArrayType(StringType())),
    ]
)


def word_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """The one corpus pass: (word, n, sym) where sym is the initial
    character segmentation plus the end-of-word sentinel."""
    return (
        df.select(F.explode(tokens(text_col)).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("n"))
        .select(
            "word",
            "n",
            F.concat(F.split("word", ""), F.array(F.lit(END))).alias("sym"),
        )
    )


def _pair_counts(wc: DataFrame) -> DataFrame:
    """Adjacent-pair frequencies over the word table, weighted by
    word count. One hash-agg shuffle over the exploded pairs."""
    two = wc.filter(F.size("sym") >= 2).select(
        "n",
        F.slice("sym", F.lit(1), F.size("sym") - 1).alias("l"),
        F.expr("slice(sym, 2, size(sym) - 1)").alias("r"),
    )
    return (
        two.select("n", F.explode(F.arrays_zip("l", "r")).alias("p"))
        .groupBy(F.col("p.l").alias("a"), F.col("p.r").alias("b"))
        .agg(F.sum("n").alias("cnt"))
    )


def _select_disjoint(rows, k: int, min_pair_count: int) -> list[tuple[str, str]]:
    """Greedy top-K selection of pairwise symbol-disjoint merges from
    frequency-ordered candidates. Disjointness makes one-pass batch
    application order-independent AND guarantees each selected pair's
    frequency is unaffected by the other merges in the round."""
    chosen: list[tuple[str, str]] = []
    used: set[str] = set()
    for r in rows:
        if len(chosen) >= k:
            break
        if r["cnt"] < min_pair_count:
            break
        a, b = r["a"], r["b"]
        if a in used or b in used:
            continue
        chosen.append((a, b))
        used.update((a, b))
    return chosen


def _apply_merges_udf(merges: list[tuple[str, str]]):
    """mapInPandas body: re-segment every word under the round's
    (disjoint) merges, greedy left-to-right per pair."""
    pairs = list(merges)

    def apply_batch(it: Iterator) -> Iterator:
        for pdf in it:
            out = []
            for sym in pdf["sym"]:
                s = list(sym)
                for a, b in pairs:
                    i, merged = 0, []
                    while i < len(s):
                        if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                            merged.append(a + b)
                            i += 2
                        else:
                            merged.append(s[i])
                            i += 1
                    s = merged
                out.append(s)
            pdf = pdf.copy()
            pdf["sym"] = out
            yield pdf

    return apply_batch


def bpe_fit(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 100,
    merges_per_round: int = 1,
    min_pair_count: int = 2,
    oversample: int = 4,
    checkpoint_every: int = 5,
) -> list[tuple[str, str]]:
    """Learn up to ``n_merges`` BPE merges; returns them in rank
    order. ``merges_per_round=1`` is the published sequential
    algorithm; larger K batches disjoint merges per Spark round
    (rounds ~ n_merges / K). Stops early when no pair reaches
    ``min_pair_count``.

    ``oversample``: candidate rows collected per round
    (K x oversample) so the greedy disjoint filter has slack; raise
    it if rounds under-fill (the per-round candidate collect stays
    bounded either way).
    """
    wc = word_counts(df, text_col).persist()
    wc.count()
    merges: list[tuple[str, str]] = []
    rounds = 0
    try:
        while len(merges) < n_merges:
            k = min(merges_per_round, n_merges - len(merges))
            cand = (
                _pair_counts(wc)
                .orderBy(F.col("cnt").desc(), "a", "b")
                .limit(max(k * oversample, k + 8))
                .collect()
            )
            chosen = _select_disjoint(cand, k, min_pair_count)
            if not chosen:
                break
            merges.extend(chosen)
            rounds += 1
            new_wc = wc.mapInPandas(
                _apply_merges_udf(chosen), schema=_WC_SCHEMA
            )
            if rounds % checkpoint_every == 0:
                # truncate lineage: each round stacks an Arrow stage
                new_wc = new_wc.localCheckpoint(eager=True)
            new_wc = new_wc.persist()
            new_wc.count()
            wc.unpersist()
            wc = new_wc
    finally:
        wc.unpersist()
    return merges


def bpe_vocab(merges: list[tuple[str, str]]) -> list[str]:
    """The learned subword symbols (merge products, rank order)."""
    return [a + b for a, b in merges]


def _encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Classic BPE encode: repeatedly apply the lowest-rank merge
    present in the word until none applies."""
    s = list(word) + [END]
    while len(s) >= 2:
        best, best_rank = None, None
        for i in range(len(s) - 1):
            r = ranks.get((s[i], s[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best, best_rank = (s[i], s[i + 1]), r
        if best is None:
            break
        a, b = best
        i, merged = 0, []
        while i < len(s):
            if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                merged.append(a + b)
                i += 2
            else:
                merged.append(s[i])
                i += 1
        s = merged
    return s


def bpe_encode(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Tokenize documents under a learned merge list ->
    (id, bpe_tokens array<string>, n_bpe_tokens).

    Zero-shuffle narrow projection: the rank table rides the UDF
    closure (broadcast by task serialization -- ~vocab_size entries),
    each Arrow batch memoizes encodes per distinct word (Zipf makes
    the memo hit rate high)."""
    ranks = {m: i for i, m in enumerate(merges)}
    out_schema = StructType(
        [
            StructField(id_col, df.schema[id_col].dataType),
            StructField("bpe_tokens", ArrayType(StringType())),
            StructField("n_bpe_tokens", IntegerType()),
        ]
    )
    words_df = df.select(id_col, tokens(text_col).alias("_w"))

    def encode_batch(it: Iterator) -> Iterator:
        import pandas as pd

        memo: dict[str, list[str]] = {}
        for pdf in it:
            toks, counts = [], []
            for words in pdf["_w"]:
                doc: list[str] = []
                for w in words:
                    enc = memo.get(w)
                    if enc is None:
                        enc = _encode_word(w, ranks)
                        memo[w] = enc
                    doc.extend(enc)
                toks.append(doc)
                counts.append(len(doc))
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "bpe_tokens": toks,
                    "n_bpe_tokens": pd.array(counts, dtype="int32"),
                }
            )

    return words_df.mapInPandas(encode_batch, schema=out_schema)
