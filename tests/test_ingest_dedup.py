"""Dedup-on-ingest streaming composition: every micro-batch probes
the persistent MinHash index, uniques feed corpus + index, dups feed
the rejects sink. The cross-trigger case (a doc duplicating a
survivor from an EARLIER trigger) is the property in-memory
dropDuplicates state cannot give unboundedly."""

import json

from pyspark.sql import functions as F

from xmidt_event_streams_spark.operators.incremental import (
    write_minhash_index,
)
from xmidt_event_streams_spark.streaming.ingest_dedup import (
    start_ingest_dedup,
)


def _text(seed: str) -> str:
    # 8 distinct-ish tokens -> 6 word-3-grams; distinct seeds give
    # disjoint shingle sets (agreement ~0), identical seeds give 1.0
    return " ".join(f"{seed}w{i}" for i in range(8))


def test_ingest_dedup_stream(spark, tmp_path):
    corpus_seed = [(i, _text(f"corp{i}")) for i in range(10)]
    prior = spark.createDataFrame(corpus_seed, "doc_id: long, text: string")

    idx = str(tmp_path / "index")
    corpus_out = str(tmp_path / "corpus")
    rejects_out = str(tmp_path / "rejects")
    write_minhash_index(prior, idx)

    src = tmp_path / "in"
    src.mkdir()
    batch1 = [
        (100, _text("corp0")),   # dup of prior corpus doc 0
        (101, _text("new101")),  # unique
        (102, _text("new102")),  # unique
    ]
    batch2 = [
        (200, _text("new101")),  # dup of batch1 survivor -> cross-trigger
        (201, _text("corp5")),   # dup of prior corpus doc 5
        (202, _text("new202")),  # unique
    ]
    for fname, rows in (("b1.json", batch1), ("b2.json", batch2)):
        with open(src / fname, "w") as f:
            for doc_id, text in rows:
                f.write(json.dumps({"doc_id": doc_id, "text": text}) + "\n")

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    q = start_ingest_dedup(
        stream,
        idx,
        corpus_out,
        rejects_out,
        checkpoint_dir=str(tmp_path / "ckpt"),
        availableNow=True,
        query_name="ingest-dedup-test",
    )
    q.awaitTermination(300)

    kept = {
        r["doc_id"] for r in spark.read.parquet(corpus_out).collect()
    }
    rejects = {
        r["doc_id"]: r["dup_of"]
        for r in spark.read.parquet(rejects_out).collect()
    }
    assert kept == {101, 102, 202}
    assert rejects == {100: 0, 200: 101, 201: 5}

    # survivors joined the index: a follow-up batch sees them
    from xmidt_event_streams_spark.operators.incremental import (
        incremental_dedup_mark,
    )

    probe = spark.createDataFrame(
        [(300, _text("new202"))], "doc_id: long, text: string"
    )
    verdict = incremental_dedup_mark(spark, idx, probe).collect()[0]
    assert not verdict["is_unique"] and verdict["dup_of"] == 202
