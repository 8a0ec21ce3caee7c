"""Exact fixed-length sequence packing (traindata.pack_token_stream /
tokenize_and_pack): the concatenate-then-chunk step a trainer's data
loader reads. The invariants that matter:

  * the packed stream IS the concatenation of per-doc token arrays in
    shard order (byte-exact reconstruction, both directions);
  * every sequence is exactly seq_len except the single per-shard
    trailing partial (which drop_last removes);
  * doc_spans provenance tiles each sequence exactly and reassembles
    each document across sequence boundaries;
  * shards pack independently (packing a shard alone == its slice of
    the full run).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from xmidt_event_streams_spark.operators.traindata import (
    pack_token_stream,
    tokenize_and_pack,
)


def _corpus(spark):
    rows = [
        (1, 0, "a b c d e"),
        (2, 0, "f g"),
        (3, 1, ""),  # empty text -> eos-only contribution
        (4, 1, " ".join(f"t{i}" for i in range(23))),  # spans >2 sequences
        (5, 0, "h"),
        (6, 1, "x y z"),
    ]
    return spark.createDataFrame(rows, "doc_id int, shard int, text string")


def _expected_stream(rows, shard):
    toks = []
    for doc_id, sh, text in sorted(rows):
        if sh != shard:
            continue
        toks.extend(text.split() + ["</s>"])
    return toks


def test_stream_reconstruction_per_shard(spark):
    df = _corpus(spark)
    rows = [(r.doc_id, r.shard, r.text) for r in df.collect()]
    out = tokenize_and_pack(
        df, seq_len=8, shard_cols=["shard"], drop_last=False
    ).collect()
    for shard in (0, 1):
        seqs = sorted((r.seq_id, r.input_ids) for r in out if r.shard == shard)
        flat = [t for _, ids in seqs for t in ids]
        assert flat == _expected_stream(rows, shard)


def test_lengths_and_drop_last(spark):
    df = _corpus(spark)
    full = tokenize_and_pack(
        df, seq_len=8, shard_cols=["shard"], drop_last=False
    ).collect()
    for shard in (0, 1):
        seqs = sorted((r.seq_id, r.n_tokens) for r in full if r.shard == shard)
        # seq_ids are contiguous from 0
        assert [s for s, _ in seqs] == list(range(len(seqs)))
        # all full except possibly the last
        assert all(n == 8 for _, n in seqs[:-1])
        assert 0 < seqs[-1][1] <= 8
    dropped = tokenize_and_pack(
        df, seq_len=8, shard_cols=["shard"], drop_last=True
    ).collect()
    assert all(r.n_tokens == 8 for r in dropped)
    n_partials = sum(
        1
        for shard in (0, 1)
        for r in full
        if r.shard == shard and r.n_tokens < 8
    )
    assert len(full) - len(dropped) == n_partials


def test_doc_spans_tile_and_reassemble(spark):
    df = _corpus(spark)
    rows = {r.doc_id: (r.shard, r.text) for r in df.collect()}
    out = tokenize_and_pack(
        df, seq_len=8, shard_cols=["shard"], drop_last=False
    ).collect()
    per_doc: dict[int, list[str]] = {}
    for r in sorted(out, key=lambda r: (r.shard, r.seq_id)):
        # spans tile the sequence exactly, in order
        cursor = 0
        for s in r.doc_spans:
            assert s.offset == cursor
            frag = r.input_ids[s.offset : s.offset + s.length]
            assert len(frag) == s.length
            per_doc.setdefault(s.doc_id, []).extend(frag)
            cursor += s.length
        assert cursor == r.n_tokens
    for doc_id, (_, text) in rows.items():
        assert per_doc[doc_id] == text.split() + ["</s>"]


def test_shard_independence(spark):
    df = _corpus(spark)
    full = tokenize_and_pack(
        df, seq_len=8, shard_cols=["shard"], drop_last=False
    )
    alone = tokenize_and_pack(
        df.filter(F.col("shard") == 0),
        seq_len=8,
        shard_cols=["shard"],
        drop_last=False,
    )
    f0 = sorted(
        (r.seq_id, tuple(r.input_ids))
        for r in full.collect()
        if r.shard == 0
    )
    a0 = sorted((r.seq_id, tuple(r.input_ids)) for r in alone.collect())
    assert f0 == a0


def test_single_doc_longer_than_many_sequences(spark):
    df = spark.createDataFrame(
        [(1, " ".join(f"w{i}" for i in range(100)))],
        "doc_id int, text string",
    )
    out = sorted(
        tokenize_and_pack(df, seq_len=10, drop_last=False).collect(),
        key=lambda r: r.seq_id,
    )
    assert len(out) == 11  # 101 tokens (100 + eos) -> 10 full + 1 partial
    flat = [t for r in out for t in r.input_ids]
    assert flat == [f"w{i}" for i in range(100)] + ["</s>"]
    assert all(
        r.doc_spans[0].doc_id == 1 and len(r.doc_spans) == 1 for r in out
    )


def test_bpe_arm_round_trip(spark):
    from xmidt_event_streams_spark.operators.bpe import bpe_encode, bpe_fit

    rows = [(i, "the cat sat on the mat " * 3) for i in range(4)] + [
        (9, "a wholly different document here")
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    merges = bpe_fit(df, n_merges=20)
    packed = sorted(
        tokenize_and_pack(df, seq_len=16, merges=merges, drop_last=False)
        .collect(),
        key=lambda r: r.seq_id,
    )
    flat = [t for r in packed for t in r.input_ids]
    enc = {
        r.doc_id: list(r.bpe_tokens)
        for r in bpe_encode(df, merges).collect()
    }
    expect = []
    for i, _ in sorted(rows):
        expect.extend(enc[i] + ["</s>"])
    assert flat == expect


def test_seq_len_validation(spark):
    df = spark.createDataFrame([(1, ["a"])], "doc_id int, tk array<string>")
    with pytest.raises(ValueError):
        pack_token_stream(df, "tk", 0, "doc_id")


def test_pack_token_stream_nonunique_order_is_deterministic(spark):
    """With a non-unique order_col (a timestamp, say) the id_col
    tie-break makes the packed stream -- bytes AND doc_spans
    provenance -- identical across runs; reproducible training data
    requires a total order."""
    rows = [
        (f"d{i}", 0, [f"t{i}_{j}" for j in range(3)]) for i in range(20)
    ]
    df = spark.createDataFrame(
        rows, "doc_id string, ts int, tk array<string>"
    )

    def run():
        out = pack_token_stream(
            df.repartition(7), "tk", 4, order_col="ts"
        )
        return sorted(
            (r.seq_id, tuple(r.input_ids), tuple(s.doc_id for s in r.doc_spans))
            for r in out.collect()
        )

    a, b = run(), run()
    assert a == b
    # every interior sequence is exactly seq_len
    assert all(len(seq[1]) == 4 for seq in a)
