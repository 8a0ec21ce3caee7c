"""Incremental dedup vs from-scratch batch recompute: the index is an
execution strategy, not a semantics change. Probing batch B against
index(A) (+ B's self-pairs) must yield exactly the candidate pairs
touching B that minhash_lsh_candidates finds over A ∪ B."""

import pytest
from pyspark.sql import functions as F

from xmidt_event_streams_spark.operators.dedup import (
    minhash_lsh_candidates,
    minhash_signatures_df,
)
from xmidt_event_streams_spark.operators.incremental import (
    append_to_minhash_index,
    incremental_dedup_candidates,
    incremental_dedup_mark,
    write_minhash_index,
)


def _docs(spark, sf="/root/testdata/sf0.01"):
    return spark.read.parquet(f"{sf}/documents.parquet").select("doc_id", "text")


def _pairs_touching(pairs_df, ids):
    return {
        (r["id_a"], r["id_b"])
        for r in pairs_df.collect()
        if r["id_a"] in ids or r["id_b"] in ids
    }


def _norm(cand_rows):
    return {
        (min(r["new_id"], r["dup_id"]), max(r["new_id"], r["dup_id"]))
        for r in cand_rows
    }


def test_incremental_equals_batch_recompute(spark, tmp_path):
    docs = _docs(spark)
    corpus = docs.filter(F.col("doc_id") % 3 != 0)
    batch = docs.filter(F.col("doc_id") % 3 == 0)
    batch_ids = {r["doc_id"] for r in batch.select("doc_id").collect()}

    idx = str(tmp_path / "mh_index")
    write_minhash_index(corpus, idx)

    inc = incremental_dedup_candidates(spark, idx, batch).collect()
    got = _norm(inc)

    full = minhash_lsh_candidates(corpus.unionByName(batch))
    want = _pairs_touching(full, batch_ids)

    assert got == want, (
        f"incremental != batch: only-inc {sorted(got - want)[:5]}, "
        f"only-batch {sorted(want - got)[:5]}"
    )
    assert want, "fixture should contain near-dup candidates"

    # agreement is the component-equality Jaccard estimate -- verify
    # against signatures computed directly
    sig = minhash_signatures_df(docs).collect()
    by_id = {r["doc_id"]: [r[f"h{i}"] for i in range(8)] for r in sig}
    for r in inc:
        sa, sb = by_id[r["new_id"]], by_id[r["dup_id"]]
        expect = sum(x == y for x, y in zip(sa, sb)) / 8
        assert abs(r["agreement"] - expect) < 1e-9


def test_append_then_probe_next_batch(spark, tmp_path):
    """Day-2 shape: append yesterday's batch, probe today's -- still
    identical to a from-scratch run over the full union."""
    docs = _docs(spark)
    corpus = docs.filter(F.col("doc_id") % 3 == 1)
    day1 = docs.filter(F.col("doc_id") % 3 == 2)
    day2 = docs.filter(F.col("doc_id") % 3 == 0)
    day2_ids = {r["doc_id"] for r in day2.select("doc_id").collect()}

    idx = str(tmp_path / "mh_index")
    write_minhash_index(corpus, idx)
    append_to_minhash_index(day1, idx)

    got = _norm(incremental_dedup_candidates(spark, idx, day2).collect())
    full = minhash_lsh_candidates(docs)
    want = _pairs_touching(full, day2_ids)
    assert got == want


def test_mark_survivors_deterministic(spark, tmp_path):
    docs = _docs(spark)
    corpus = docs.filter(F.col("doc_id") % 3 != 0)
    batch = docs.filter(F.col("doc_id") % 3 == 0)
    idx = str(tmp_path / "mh_index")
    write_minhash_index(corpus, idx)

    marks = incremental_dedup_mark(spark, idx, batch, min_agreement=0.5)
    rows = {r["doc_id"]: (r["is_unique"], r["dup_of"]) for r in marks.collect()}
    assert len(rows) == batch.count()  # one verdict per batch doc
    cands = {
        (r["new_id"], r["dup_id"]): r["agreement"]
        for r in incremental_dedup_candidates(spark, idx, batch).collect()
        if r["agreement"] >= 0.5
    }
    for doc, (uniq, dup_of) in rows.items():
        mine = [d for (n, d) in cands if n == doc]
        if mine:
            assert not uniq and dup_of == min(mine)
        else:
            assert uniq and dup_of is None

    # determinism: a second run yields the identical verdict set
    again = {
        r["doc_id"]: (r["is_unique"], r["dup_of"])
        for r in incremental_dedup_mark(
            spark, idx, batch, min_agreement=0.5
        ).collect()
    }
    assert again == rows


def test_probe_rejects_mismatched_parameters(spark, tmp_path):
    docs = _docs(spark).limit(50)
    idx = str(tmp_path / "mh_index")
    write_minhash_index(docs, idx, num_hashes=8, bands=4)
    with pytest.raises(ValueError, match="was built with"):
        incremental_dedup_candidates(spark, idx, docs, num_hashes=8, bands=2)


def test_index_layout_prefix_partitioned(spark, tmp_path):
    import os

    docs = _docs(spark)
    idx = str(tmp_path / "mh_index")
    write_minhash_index(docs, idx)
    prefixes = [d for d in os.listdir(idx) if d.startswith("bp=")]
    assert len(prefixes) > 64  # md5 prefixes cover the space uniformly
    # each partition dir written by one task -> exactly one data file
    inside = os.listdir(os.path.join(idx, prefixes[0]))
    assert sum(1 for f in inside if f.endswith(".parquet")) == 1
