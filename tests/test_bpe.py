"""Distributed BPE (operators/bpe.py) against a pure-Python reference
implementation of the published algorithm (Sennrich et al.,
arXiv:1508.07909): sequential-mode parity, batched-round invariants,
encode parity, and the segmentation round-trip property.
"""

from __future__ import annotations

import re
from collections import Counter

import pytest

from xmidt_event_streams_spark.operators.bpe import (
    END,
    _select_disjoint,
    bpe_encode,
    bpe_fit,
    bpe_vocab,
    word_counts,
)

CORPUS = [
    "the lower the better the lowest",
    "lower and lower and lowest",
    "new newer newest the newest",
    "wider wide wider widest new",
    "low low low lower newer",
]


def _py_tokens(text: str) -> list[str]:
    return [t for t in re.sub(r"[ \t\n\x0B\f\r]+", " ", text.lower()).split(" ") if t]


def _py_word_counts(corpus) -> Counter:
    c: Counter = Counter()
    for doc in corpus:
        c.update(_py_tokens(doc))
    return c


def _py_bpe_fit(corpus, n_merges: int, min_pair_count: int = 2):
    """Reference sequential BPE on the word-frequency table."""
    wc = {
        tuple(list(w) + [END]): n for w, n in _py_word_counts(corpus).items()
    }
    merges = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for sym, n in wc.items():
            for i in range(len(sym) - 1):
                pairs[(sym[i], sym[i + 1])] += n
        if not pairs:
            break
        # deterministic tiebreak: count desc, then lexicographic
        (a, b), cnt = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        if cnt < min_pair_count:
            break
        merges.append((a, b))
        new_wc = {}
        for sym, n in wc.items():
            s, i, merged = list(sym), 0, []
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    merged.append(a + b)
                    i += 2
                else:
                    merged.append(s[i])
                    i += 1
            new_wc[tuple(merged)] = new_wc.get(tuple(merged), 0) + n
        wc = new_wc
    return merges


@pytest.fixture()
def docs(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS)], "doc_id long, text string"
    )


def test_word_counts_match_reference(spark, docs):
    got = {
        r["word"]: (r["n"], list(r["sym"]))
        for r in word_counts(docs).collect()
    }
    ref = _py_word_counts(CORPUS)
    assert {w: n for w, (n, _) in got.items()} == dict(ref)
    for w, (_, sym) in got.items():
        assert sym == list(w) + [END]


def test_sequential_parity_with_reference(spark, docs):
    """merges_per_round=1 must reproduce the published sequential
    algorithm's merge sequence exactly."""
    got = bpe_fit(docs, n_merges=12, merges_per_round=1)
    ref = _py_bpe_fit(CORPUS, n_merges=12)
    assert got == ref


def test_batched_rounds_select_disjoint_merges():
    rows = [
        {"a": "t", "b": "h", "cnt": 10},
        {"a": "h", "b": "e", "cnt": 9},  # shares 'h' -> skipped
        {"a": "l", "b": "o", "cnt": 8},
        {"a": "o", "b": "w", "cnt": 7},  # shares 'o' -> skipped
        {"a": "e", "b": "r", "cnt": 6},
        {"a": "x", "b": "y", "cnt": 1},  # below min_pair_count
    ]
    assert _select_disjoint(rows, k=4, min_pair_count=2) == [
        ("t", "h"),
        ("l", "o"),
        ("e", "r"),
    ]


def test_batched_fit_learns_valid_merges(spark, docs):
    """K>1 batching may reorder ranks vs sequential, but every merge
    must still be a pair that existed when applied, and the merge
    list must be usable: encoding under it round-trips every word."""
    merges = bpe_fit(docs, n_merges=12, merges_per_round=4)
    assert len(merges) > 0
    assert len(set(merges)) == len(merges)  # no duplicate merges
    enc = bpe_encode(docs, merges).collect()
    by_id = {r["doc_id"]: r for r in enc}
    for i, doc in enumerate(CORPUS):
        toks = by_id[i]["bpe_tokens"]
        assert by_id[i]["n_bpe_tokens"] == len(toks)
        # round-trip: concatenating tokens and stripping sentinels
        # reconstructs the normalized document
        joined = "".join(toks).replace(END, " ").strip()
        assert joined == " ".join(_py_tokens(doc))


def test_encode_matches_reference_segmentation(spark, docs):
    """Under sequentially-learned ranks, the distributed encoder
    segments exactly like applying the merges in rank order."""
    merges = bpe_fit(docs, n_merges=10, merges_per_round=1)
    ranks = {m: i for i, m in enumerate(merges)}

    def py_encode(word):
        s = list(word) + [END]
        while True:
            cand = [
                (ranks[(s[i], s[i + 1])], i)
                for i in range(len(s) - 1)
                if (s[i], s[i + 1]) in ranks
            ]
            if not cand:
                return s
            r, _ = min(cand)
            a, b = merges[r]
            i, merged = 0, []
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    merged.append(a + b)
                    i += 2
                else:
                    merged.append(s[i])
                    i += 1
            s = merged

    enc = {r["doc_id"]: r["bpe_tokens"] for r in bpe_encode(docs, merges).collect()}
    for i, doc in enumerate(CORPUS):
        expect = [t for w in _py_tokens(doc) for t in py_encode(w)]
        assert enc[i] == expect, i


def test_fit_is_deterministic(spark, docs):
    assert bpe_fit(docs, n_merges=8, merges_per_round=2) == bpe_fit(
        docs, n_merges=8, merges_per_round=2
    )


def test_min_pair_count_stops_early(spark):
    tiny = spark.createDataFrame(
        [(0, "ab cd ef")], "doc_id long, text string"
    )
    # every pair occurs once; min_pair_count=2 -> no merges at all
    assert bpe_fit(tiny, n_merges=5, min_pair_count=2) == []


def test_vocab_lists_merge_products():
    assert bpe_vocab([("t", "h"), ("th", "e")]) == ["th", "the"]


def test_fit_on_documents_table(spark, sf_dir):
    """End-to-end on the real documents table: checkpointed batched
    rounds, non-trivial vocabulary, encode runs shuffle-free."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").filter(
        "doc_id < 200"  # narrow cap (limit() would add its own Exchange)
    )
    merges = bpe_fit(
        docs, n_merges=24, merges_per_round=8, checkpoint_every=2
    )
    assert len(merges) >= 16
    enc = bpe_encode(docs, merges)
    plan = enc._sc._jvm.PythonSQLUtils.explainString(
        enc._jdf.queryExecution(), "formatted"
    )
    assert "Exchange" not in plan  # encoding is a narrow projection
    row = enc.limit(1).collect()[0]
    assert row["n_bpe_tokens"] == len(row["bpe_tokens"]) > 0
