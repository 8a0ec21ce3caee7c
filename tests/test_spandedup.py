"""Incremental window-hash index: batches excised against corpus
HISTORY (history wins), replay-safe probing, append folding,
compaction, and the fixpoint-vs-history stitch case."""
from tests.streamutil import await_stream

import pytest
from pyspark.sql import functions as F

from xmidt_event_streams_spark.operators.dedup import apply_clean_text
from xmidt_event_streams_spark.operators.spandedup import (
    append_to_window_index,
    compact_window_index,
    init_window_index,
    scrub_batch_against_index,
    write_window_index,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id: long, text: string")


HIST_SPAN = "h1 h2 h3 h4 h5 h6 h7"


@pytest.fixture()
def index(spark, tmp_path):
    path = str(tmp_path / "widx")
    hist = _df(
        spark,
        [
            (1, f"old doc one carries {HIST_SPAN} and more old words"),
            (2, "old doc two entirely different content here"),
        ],
    )
    write_window_index(hist, path, window=5)
    return path


def test_batch_scrubbed_against_history(spark, index):
    batch = _df(
        spark,
        [
            (10, f"new doc quoting {HIST_SPAN} in the middle"),
            (11, "completely novel content nothing shared at all"),
        ],
    )
    out = {
        r["doc_id"]: r
        for r in scrub_batch_against_index(spark, index, batch).collect()
    }
    # touched_only default: only doc 10 comes back
    assert set(out) == {10}
    assert out[10]["n_removed"] == 7
    assert "h1" not in out[10]["clean_text"]
    cleaned = {
        r["doc_id"]: r["text"]
        for r in apply_clean_text(batch, scrub_batch_against_index(
            spark, index, batch
        )).collect()
    }
    assert cleaned[10] == "new doc quoting in the middle"
    assert cleaned[11] == "completely novel content nothing shared at all"


def test_cold_start_and_append_fold(spark, tmp_path):
    path = str(tmp_path / "widx")
    init_window_index(spark, path, window=5)
    b1 = _df(spark, [(1, f"first batch has {HIST_SPAN} inside it")])
    # cold index: nothing to cut, everything novel
    out1 = scrub_batch_against_index(
        spark, path, b1, update_index=True, exclude_batch=1
    )
    assert out1.count() == 0  # touched_only, nothing touched
    # second batch quoting the first batch's span gets cut
    b2 = _df(spark, [(2, f"second batch repeats {HIST_SPAN} verbatim")])
    out2 = scrub_batch_against_index(
        spark, path, b2, update_index=True, exclude_batch=2
    ).collect()
    assert [r["doc_id"] for r in out2] == [2]
    assert out2[0]["n_removed"] == 7


def test_replay_is_idempotent(spark, tmp_path):
    """A replayed micro-batch must reach its FIRST-RUN verdict: with
    its own windows already appended, excluding its src_batch keeps
    it from excising itself into nothing."""
    path = str(tmp_path / "widx")
    init_window_index(spark, path, window=5)
    b1 = _df(spark, [(1, f"only batch with {HIST_SPAN} content")])
    first = scrub_batch_against_index(
        spark, path, b1, update_index=True, exclude_batch=7
    ).count()
    assert first == 0
    # replay: same batch id excluded -> same verdict, not self-excision
    replay = scrub_batch_against_index(
        spark, path, b1, update_index=True, exclude_batch=7
    ).count()
    assert replay == 0
    # a DIFFERENT batch with the same content IS cut
    other = scrub_batch_against_index(
        spark, path, _df(spark, [(2, f"other {HIST_SPAN} copy")]),
        exclude_batch=8,
    ).collect()
    assert other and other[0]["n_removed"] == 7


def test_fixpoint_reprobes_history(spark, tmp_path):
    """The review's stitch case, against HISTORY: excising the probe
    match stitches a window that exists in the index but not in the
    batch's original window set -- only a re-probe catches it."""
    path = str(tmp_path / "widx")
    # history holds the quoted phrase AND, separately, the text the
    # batch stitches into once the quote is cut
    hist = _df(
        spark,
        [(1, "a b c d e"), (2, "x y z w v")],
    )
    write_window_index(hist, path, window=5)
    batch = _df(spark, [(10, "x y a b c d e z w v")])
    single = scrub_batch_against_index(
        spark, path, batch, fixpoint=False
    ).collect()[0]
    fixed = scrub_batch_against_index(
        spark, path, batch, fixpoint=True
    ).collect()[0]
    # single pass cuts only [a b c d e] (pos 3..7), leaving
    # 'x y z w v' -- a history window that was NOT in the batch's
    # original window set; only the per-pass re-probe catches it
    assert single["n_removed"] == 5
    assert single["clean_text"] == "x y z w v"
    assert fixed["n_removed"] == 10 and fixed["clean_text"] == ""


def test_compaction_reclaims_replayed_appends(spark, tmp_path):
    path = str(tmp_path / "widx")
    b = _df(spark, [(1, f"some doc {HIST_SPAN} here")])
    write_window_index(b, path, window=5, src_batch=3)
    append_to_window_index(b, path, src_batch=3)  # replay residue
    report = compact_window_index(spark, path)
    assert report["rows_after"] < report["rows_before"]
    # probe verdicts preserved, replay exclusion still works
    cut = scrub_batch_against_index(
        spark, path, _df(spark, [(9, f"x {HIST_SPAN} y")])
    ).collect()
    assert cut and cut[0]["n_removed"] == 7
    self_probe = scrub_batch_against_index(
        spark, path, b, exclude_batch=3
    ).count()
    assert self_probe == 0


def test_mismatched_window_refused(spark, index):
    with pytest.raises(ValueError, match="window"):
        append_to_window_index(
            _df(spark, [(5, "a b c d e f")]), index, window=7
        )


def test_foreign_path_refused(spark, tmp_path):
    with pytest.raises(ValueError, match="not a window index"):
        scrub_batch_against_index(
            spark, str(tmp_path / "nope"), _df(spark, [(1, "a b c")])
        )


def test_streaming_scrub_on_ingest(spark, tmp_path):
    """The streaming composition: file source -> foreachBatch(scrub
    against history with the batch id excluded, fold windows in,
    write per-batch idempotent corpus) -- cross-batch spans excised,
    novel content untouched."""
    import json

    path = str(tmp_path / "widx")
    corpus_out = str(tmp_path / "corpus")
    init_window_index(spark, path, window=5)

    src = tmp_path / "in"
    src.mkdir()
    (src / "b1.json").write_text(
        json.dumps({"doc_id": 1, "text": f"first doc {HIST_SPAN} tail"})
        + "\n"
    )
    (src / "b2.json").write_text(
        json.dumps({"doc_id": 2, "text": f"later doc {HIST_SPAN} again"})
        + "\n"
        + json.dumps({"doc_id": 3, "text": "novel content only here"})
        + "\n"
    )

    def handle(batch, batch_id):
        scrubbed = scrub_batch_against_index(
            spark, path, batch,
            exclude_batch=batch_id, update_index=True,
        )
        out = apply_clean_text(batch, scrubbed)
        (
            out.withColumn("_b", F.lit(batch_id))
            .write.mode("append")
            .parquet(corpus_out)
        )

    q = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
        .writeStream.foreachBatch(handle)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    await_stream(q, 300)

    rows = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(corpus_out).collect()
    }
    assert HIST_SPAN in rows[1]            # first writer keeps it
    assert HIST_SPAN not in rows[2]        # later copy excised
    # 'doc' borders the span in both docs, so [doc h1 h2 h3 h4] is a
    # shared window and 'doc' is covered too
    assert rows[2] == "later again"
    assert rows[3] == "novel content only here"


class TestWinnowedIndex:
    """The 100 TB arm: winnowed fingerprints only (~(k+1)/2x fewer
    rows), exact-census probing keeps the t = w + k - 1 detection
    guarantee; excision covers span interiors with <= k-1 tokens
    surviving per boundary (k <= w)."""

    def test_index_is_smaller(self, spark, tmp_path):
        docs = spark.read.parquet(
            "/root/testdata/sf0.001/documents.parquet"
        ).select("doc_id", "text")
        exact = str(tmp_path / "exact")
        win = str(tmp_path / "winnowed")
        write_window_index(docs, exact, window=5)
        write_window_index(docs, win, window=5, winnow=4)
        n_exact = spark.read.parquet(exact).count()
        n_win = spark.read.parquet(win).count()
        assert 0 < n_win < 0.6 * n_exact, (n_win, n_exact)

    def test_long_span_detected_interior_excised(self, spark, tmp_path):
        w, k = 5, 4
        span_toks = [f"s{i}" for i in range(20)]  # >= w + k - 1
        span = " ".join(span_toks)
        path = str(tmp_path / "widx")
        write_window_index(
            _df(spark, [(1, f"history doc holds {span} entirely")]),
            path, window=w, winnow=k,
        )
        batch = _df(spark, [(10, f"u1 u2 {span} u3 u4")])
        out = scrub_batch_against_index(
            spark, path, batch, fixpoint=False
        ).collect()
        assert out, "guaranteed span not detected"
        r = out[0]
        # interior fully cut: at most k-1 span tokens survive per side
        surviving = [t for t in r["clean_text"].split() if t in span_toks]
        assert r["n_removed"] >= len(span_toks) - 2 * (k - 1)
        assert len(surviving) <= 2 * (k - 1)
        # the unique context tokens survive
        for t in ("u1", "u2", "u3", "u4"):
            assert t in r["clean_text"]

    def test_append_respects_stamped_winnow(self, spark, tmp_path):
        path = str(tmp_path / "widx")
        init_window_index(spark, path, window=5, winnow=4)
        docs = spark.read.parquet(
            "/root/testdata/sf0.001/documents.parquet"
        ).select("doc_id", "text").limit(20)
        append_to_window_index(docs, path)
        appended = spark.read.parquet(path).count()
        exact = str(tmp_path / "exact")
        write_window_index(docs, exact, window=5)
        assert appended < 0.6 * spark.read.parquet(exact).count()

    def test_bad_winnow_refused(self, spark, tmp_path):
        with pytest.raises(ValueError, match="winnow"):
            write_window_index(
                _df(spark, [(1, "a b c d e f")]),
                str(tmp_path / "w"), window=5, winnow=6,
            )


def test_returned_verdicts_pinned_before_append(spark, tmp_path):
    """update_index must not poison the RETURNED verdicts: the plan
    is materialized before the batch's own windows land in the index,
    so a later collect() sees the pre-append verdict even with
    fixpoint=False and no exclude_batch (r5 review finding)."""
    path = str(tmp_path / "widx")
    init_window_index(spark, path, window=5)
    batch = _df(spark, [(1, f"novel doc with {HIST_SPAN} content")])
    out = scrub_batch_against_index(
        spark, path, batch, fixpoint=False, update_index=True
    )
    # evaluate AFTER the append: index now holds this batch's windows
    assert out.count() == 0  # not self-excised
    cleaned = apply_clean_text(batch, out)
    assert cleaned.collect()[0]["text"].startswith("novel doc with h1")


def test_index_fixpoint_no_survival_property(spark, tmp_path):
    """Adversarial property for the INDEX path (per-pass re-probe):
    after a fixpoint scrub no window-gram stored in an exact index
    survives in any clean text -- random corpora on a 3-token
    alphabet, where stitching against history is common."""
    import random

    w = 3
    rng = random.Random(20260815)
    alphabet = ["a", "b", "c"]
    for trial in range(4):
        hist_toks = [rng.choice(alphabet) for _ in range(30)]
        path = str(tmp_path / f"widx{trial}")
        write_window_index(
            _df(spark, [(1, " ".join(hist_toks))]), path, window=w
        )
        hist_grams = {
            tuple(hist_toks[i : i + w])
            for i in range(len(hist_toks) - w + 1)
        }
        batch = _df(
            spark,
            [
                (d, " ".join(rng.choice(alphabet) for _ in range(rng.randint(8, 25))))
                for d in range(4)
            ],
        )
        out = scrub_batch_against_index(
            spark, path, batch, fixpoint=True, touched_only=False
        ).collect()
        assert len(out) == 4
        for r in out:
            clean = r["clean_text"].split() if r["clean_text"] else []
            assert len(clean) == r["n_tokens"] - r["n_removed"], (trial, r)
            grams = {
                tuple(clean[i : i + w]) for i in range(len(clean) - w + 1)
            }
            assert not (grams & hist_grams), (trial, r["doc_id"], clean)
