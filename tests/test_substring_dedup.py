"""Exact-substring duplication (repeated window spans): constructed
semantics plus a DuckDB twin over the real documents table (same
tokenization CTE as the MinHash oracle, same one-md5-per-window key)."""

from pyspark.sql import functions as F

from xmidt_event_streams_spark.operators.dedup import (
    duplicated_span_frac,
    repeated_window_spans,
)


def test_repeated_window_spans_constructed(spark):
    shared = "alpha beta gamma delta"  # 4 tokens -> one 4-window
    rows = [
        (1, f"{shared} unique one tail here"),
        (2, f"other head words {shared}"),
        (3, "completely different text with no overlap at all"),
        (4, "short"),  # under window -> no windows
    ]
    df = spark.createDataFrame(rows, "doc_id: long, text: string")
    spans = repeated_window_spans(df, window=4).collect()
    by_doc = {}
    for r in spans:
        by_doc.setdefault(r["doc_id"], []).append((r["pos"], r["n_occurrences"]))
    # the shared 4-token window starts at token 1 in doc 1, token 4 in doc 2
    assert by_doc[1] == [(1, 2)]
    assert by_doc[2] == [(4, 2)]
    assert 3 not in by_doc and 4 not in by_doc

    fr = {
        r["doc_id"]: (r["n_windows"], r["n_dup_windows"], r["dup_frac"])
        for r in duplicated_span_frac(df, window=4).collect()
    }
    assert fr[1] == (5, 1, 0.2)  # 8 tokens -> 5 windows, 1 duplicated
    assert fr[3][1] == 0 and fr[3][2] == 0.0
    assert fr[4] == (0, 0, 0.0)  # shorter than the window


def test_within_doc_repeats_flag(spark):
    text = "la la la la la la la la"  # every 4-window identical
    df = spark.createDataFrame(
        [(1, text), (2, "nothing shared here at all okay")],
        "doc_id: long, text: string",
    )
    cross = repeated_window_spans(df, window=4, cross_doc_only=True)
    assert cross.count() == 0  # repeats are all within one doc
    within = repeated_window_spans(df, window=4, cross_doc_only=False)
    assert within.filter("doc_id = 1").count() == 5  # all 5 positions
    assert within.filter("doc_id = 2").count() == 0


def test_repeated_window_spans_matches_duckdb(spark, sf_dir):
    from tests.test_oracle_parity import _rowset, duck_run
    from xmidt_event_streams_spark.catalog import _WORDS_CTE

    window = 5
    sdf = repeated_window_spans(
        spark.read.parquet(f"{sf_dir}/documents.parquet"),
        window=window,
        cross_doc_only=True,
    )
    cols, rows = duck_run(
        f"""WITH {_WORDS_CTE},
wins AS (
  SELECT doc_id, i AS pos,
         md5(array_to_string(w[i:i+{window - 1}], ' ')) AS whash
  FROM words, UNNEST(generate_series(1, greatest(len(w) - {window - 1}, 0))) AS t(i)
),
hot AS (
  SELECT whash, count(*) AS n_occurrences
  FROM wins GROUP BY whash
  HAVING count(DISTINCT doc_id) > 1
)
SELECT doc_id, pos, whash, n_occurrences
FROM wins JOIN hot USING (whash)""",
        sf_dir,
    )
    assert _rowset(sdf.columns, [tuple(r) for r in sdf.collect()]) == _rowset(
        cols, rows
    )


class TestChooseLshParams:
    def test_midpoints_near_targets(self):
        from xmidt_event_streams_spark.operators.dedup import choose_lsh_params

        for t in (0.2, 0.3, 0.5, 0.7, 0.8, 0.9):
            n, b, r = choose_lsh_params(t)
            mid = (1.0 / b) ** (1.0 / r)
            assert abs(mid - t) <= 0.02, (t, n, b, r, mid)
            assert n == b * r and n <= 64
            # no degenerate near-linear curves once a sharp config
            # exists in budget
            assert r >= 2

    def test_sharpness_grows_with_threshold(self):
        from xmidt_event_streams_spark.operators.dedup import choose_lsh_params

        _, _, r_low = choose_lsh_params(0.3)
        _, _, r_high = choose_lsh_params(0.9)
        assert r_high > r_low

    def test_feeds_minhash_config_contract(self, spark):
        """The chosen config must satisfy minhash_lsh_candidates'
        num_hashes % bands == 0 contract and actually run."""
        from xmidt_event_streams_spark.operators.dedup import (
            choose_lsh_params,
            minhash_lsh_candidates,
        )

        n, b, _ = choose_lsh_params(0.7, max_hashes=16)
        df = spark.createDataFrame(
            [(1, "a b c d e f"), (2, "a b c d e g"), (3, "x y z w q v")],
            "doc_id long, text string",
        )
        pairs = minhash_lsh_candidates(df, num_hashes=n, bands=b)
        got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
        assert (1, 2) in got and (1, 3) not in got

    def test_rejects_bad_threshold(self):
        import pytest

        from xmidt_event_streams_spark.operators.dedup import choose_lsh_params

        with pytest.raises(ValueError):
            choose_lsh_params(1.0)


class TestWinnowedSpans:
    """The winnow=k scale arm: content-defined fingerprint sampling
    (Schleimer et al. 2003) with the t = w + k - 1 detection
    guarantee, selected in the array domain (no added shuffle)."""

    @staticmethod
    def _py_winnow(hashes, k):
        """Reference: position p (1-based) selected iff its hash is
        minimal in AT LEAST ONE window of k consecutive positions
        containing p, all ties kept -- the rule the t = w + k - 1
        guarantee requires (Schleimer et al. 2003)."""
        n = len(hashes)
        out = []
        for p in range(1, n + 1):
            for q in range(max(1, p - k + 1), min(p, max(n - k + 1, 1)) + 1):
                win = hashes[q - 1 : q - 1 + min(k, n)]
                if hashes[p - 1] == min(win):
                    out.append((p, hashes[p - 1]))
                    break
        return out

    def test_counterexample_increasing_run(self, spark):
        """The r5 review's counterexample: hashes [0,5,9,8], k=3 --
        the trailing-frame rule selects only position 1 and misses
        the span; true winnowing must select position 2 (min of the
        window [5,9,8])."""
        assert (2, 5) in self._py_winnow([0, 5, 9, 8], 3)

    def test_selection_matches_reference(self, spark):
        import hashlib

        from xmidt_event_streams_spark.operators.dedup import (
            repeated_window_spans,
        )

        w, k = 3, 4
        text = "a b c d e f g h i j k l m n o p q r s t u v w x y z"
        toks = text.split()
        wins = [" ".join(toks[i : i + w]) for i in range(len(toks) - w + 1)]
        hashes = [hashlib.md5(x.encode()).hexdigest() for x in wins]
        expect = self._py_winnow(hashes, k)

        # two identical docs -> every selected window recurs, so the
        # full winnowed selection comes back from the cross-doc join
        df = spark.createDataFrame(
            [(1, text), (2, text)], "doc_id long, text string"
        )
        got = repeated_window_spans(df, window=w, winnow=k)
        rows = sorted(
            (r["pos"], r["whash"])
            for r in got.filter(F.col("doc_id") == 1).collect()
        )
        assert rows == sorted(expect)

    def test_detection_guarantee_long_shared_span(self, spark):
        """Docs sharing a span of >= window + k - 1 tokens MUST both
        report at least one common fingerprint in that span."""
        from xmidt_event_streams_spark.operators.dedup import (
            repeated_window_spans,
        )

        w, k = 4, 5
        shared = " ".join(f"s{i}" for i in range(w + k - 1))  # exactly t
        d1 = "alpha beta gamma " + shared + " delta"
        d2 = "one two " + shared + " three four five"
        df = spark.createDataFrame(
            [(1, d1), (2, d2)], "doc_id long, text string"
        )
        got = repeated_window_spans(df, window=w, winnow=k).collect()
        by_doc = {}
        for r in got:
            by_doc.setdefault(r["doc_id"], set()).add(r["whash"])
        common = by_doc.get(1, set()) & by_doc.get(2, set())
        assert common, "guaranteed span not detected"

    def test_sampling_reduction(self, spark, sf_dir):
        """Winnowing shrinks the shuffled relation by ~2/(k+1); at
        k=8 the selected fraction must drop below 40% of the exact
        census (expected ~22%)."""
        from xmidt_event_streams_spark.operators.dedup import (
            repeated_window_spans,
        )

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        exact = repeated_window_spans(
            docs, window=5, cross_doc_only=False
        ).count()
        winnowed = repeated_window_spans(
            docs, window=5, cross_doc_only=False, winnow=8
        ).count()
        assert 0 < winnowed < 0.4 * exact, (winnowed, exact)

    def test_winnowed_is_subset_of_exact(self, spark, sf_dir):
        from xmidt_event_streams_spark.operators.dedup import (
            repeated_window_spans,
        )

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet").filter(
            "doc_id < 50"
        )
        exact = {
            (r["doc_id"], r["pos"], r["whash"])
            for r in repeated_window_spans(docs, window=5).collect()
        }
        win = {
            (r["doc_id"], r["pos"], r["whash"])
            for r in repeated_window_spans(docs, window=5, winnow=6).collect()
        }
        assert win <= exact

    def test_bad_winnow_rejected(self, spark):
        import pytest

        from xmidt_event_streams_spark.operators.dedup import (
            repeated_window_spans,
        )

        df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
        with pytest.raises(ValueError, match="winnow"):
            repeated_window_spans(df, winnow=0)


class TestRemoveDuplicateSpans:
    """Span EXCISION (the ledger's consumer): keep-first semantics,
    interval merge, row-count preservation, token accounting."""

    def _run(self, spark, rows, **kw):
        df = spark.createDataFrame(rows, "doc_id: long, text: string")
        from xmidt_event_streams_spark.operators.dedup import (
            remove_duplicate_spans,
        )

        return {
            r["doc_id"]: r
            for r in remove_duplicate_spans(df, **kw).collect()
        }

    def test_keep_first_cut_second(self, spark):
        out = self._run(
            spark,
            [
                (1, "x a b c d e y"),
                (2, "q a b c d e r"),
                (3, "nothing shared with anyone here ok"),
            ],
            window=5,
        )
        assert out[1]["clean_text"] == "x a b c d e y"
        assert out[1]["n_removed"] == 0
        assert out[2]["clean_text"] == "q r"
        assert out[2]["n_removed"] == 5 and out[2]["n_tokens"] == 7
        assert out[3]["n_removed"] == 0

    def test_within_doc_repeat_collapses(self, spark):
        # every 4-window of 8x"la" is content-equal: keep pos 1's
        # window, cut 2..5 -> merged interval [2,8] -> one token left
        out = self._run(spark, [(1, "la la la la la la la la")], window=4)
        assert out[1]["clean_text"] == "la"
        assert (out[1]["n_tokens"], out[1]["n_removed"]) == (8, 7)

    def test_cross_doc_only_keeps_within_repeats(self, spark):
        out = self._run(
            spark,
            [(1, "la la la la la la la la"), (2, "all different here yes")],
            window=4,
            cross_doc_only=True,
        )
        assert out[1]["n_removed"] == 0
        assert out[1]["clean_text"] == "la la la la la la la la"

    def test_long_shared_region_merges_intervals(self, spark):
        shared = " ".join(f"s{i}" for i in range(12))
        out = self._run(
            spark,
            [(1, f"head {shared} tail"), (2, f"pre {shared} post end")],
            window=5,
        )
        # doc 2's whole 12-token region is one merged interval
        assert out[2]["clean_text"] == "pre post end"
        assert out[2]["n_removed"] == 12
        assert out[1]["n_removed"] == 0

    def test_full_duplicate_and_short_docs(self, spark):
        text = "alpha beta gamma delta epsilon zeta"
        out = self._run(
            spark,
            [(1, text), (2, text), (3, "tiny"), (4, "  ")],
            window=5,
        )
        assert out[1]["clean_text"] == text  # canonical copy intact
        assert out[2]["clean_text"] == "" and out[2]["n_removed"] == 6
        assert out[3]["clean_text"] == "tiny"  # under window: untouched
        assert out[4]["n_tokens"] == 0 and out[4]["clean_text"] == ""
        assert len(out) == 4  # row count preserved, always

    def test_token_accounting_invariant(self, spark, sf_dir):
        """kept + removed == total for every real document, and the
        clean text re-tokenizes to exactly n_tokens - n_removed."""
        from xmidt_event_streams_spark.functions.text import tokens
        from xmidt_event_streams_spark.operators.dedup import (
            remove_duplicate_spans,
        )

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        got = remove_duplicate_spans(docs, window=5)
        bad = got.filter(
            F.size(tokens("clean_text"))
            != F.col("n_tokens") - F.col("n_removed")
        )
        assert bad.count() == 0
        assert got.count() == docs.count()

    def test_rejects_degenerate_window(self, spark):
        import pytest

        from xmidt_event_streams_spark.operators.dedup import (
            remove_duplicate_spans,
        )

        df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
        with pytest.raises(ValueError, match="window"):
            remove_duplicate_spans(df, window=1)


class TestRemoveContaminatedSpans:
    """Benchmark n-gram scrub: every matching span cut (no
    keep-first), benchmark quoted mid-document, clean docs untouched."""

    def _run(self, spark, corpus, bench, **kw):
        from xmidt_event_streams_spark.operators.dedup import (
            remove_contaminated_spans,
        )

        cdf = spark.createDataFrame(corpus, "doc_id: long, text: string")
        bdf = spark.createDataFrame(bench, "doc_id: long, text: string")
        return {
            r["doc_id"]: r
            for r in remove_contaminated_spans(cdf, bdf, **kw).collect()
        }

    def test_quoted_benchmark_sentence_excised(self, spark):
        bench_sent = "the quick brown fox jumps over the lazy dog"
        out = self._run(
            spark,
            [
                (1, f"intro words {bench_sent} outro words"),
                (2, "totally unrelated content in this document here"),
            ],
            [(100, f"prompt: {bench_sent} answer: maybe")],
            window=5,
        )
        assert out[1]["clean_text"] == "intro words outro words"
        assert out[1]["n_removed"] == 9
        assert out[2]["n_removed"] == 0
        assert 100 not in out  # benchmark rows are not output

    def test_every_occurrence_cut_no_keep_first(self, spark):
        # the same benchmark span in TWO corpus docs: both cut
        # (contrast with remove_duplicate_spans' keep-first)
        span = "a b c d e"
        out = self._run(
            spark,
            [(1, f"x {span} y"), (2, f"p {span} q")],
            [(9, span)],
            window=5,
        )
        assert out[1]["clean_text"] == "x y"
        assert out[2]["clean_text"] == "p q"

    def test_no_window_no_cut(self, spark):
        # benchmark shorter than the window contributes no hashes
        out = self._run(
            spark,
            [(1, "one two three four five six seven")],
            [(9, "one two three")],
            window=5,
        )
        assert out[1]["n_removed"] == 0

    def test_shuffle_arm_matches_broadcast(self, spark):
        bench_sent = "w1 w2 w3 w4 w5 w6 w7"
        corpus = [(i, f"doc {i} prefix {bench_sent} suffix {i}") for i in range(6)]
        a = self._run(spark, corpus, [(9, bench_sent)], window=5)
        b = self._run(
            spark, corpus, [(9, bench_sent)], window=5,
            broadcast_benchmark=False,
        )
        assert a == b

    def test_benchmark_hashes_are_broadcast(self, spark):
        """The default plan must broadcast the benchmark hash relation
        (the corpus-never-shuffles-for-the-match claim)."""
        from xmidt_event_streams_spark.operators.dedup import (
            remove_contaminated_spans,
        )

        cdf = spark.createDataFrame(
            [(1, "a b c d e f g")], "doc_id: long, text: string"
        )
        bdf = spark.createDataFrame(
            [(9, "c d e f g")], "doc_id: long, text: string"
        )
        plan = remove_contaminated_spans(cdf, bdf, window=5)._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan and "LeftSemi" in plan


def test_preserve_case_rebuild(spark):
    """preserve_case: matching stays case-insensitive, surviving
    tokens keep their original case (the corpus-build setting)."""
    from xmidt_event_streams_spark.operators.dedup import (
        remove_contaminated_spans,
    )

    cdf = spark.createDataFrame(
        [(1, "Head Words A B C D E Tail Words")],
        "doc_id: long, text: string",
    )
    bdf = spark.createDataFrame(
        [(9, "a b c d e")], "doc_id: long, text: string"
    )
    out = remove_contaminated_spans(
        cdf, bdf, window=5, preserve_case=True
    ).collect()[0]
    assert out["clean_text"] == "Head Words Tail Words"
    assert out["n_removed"] == 5


class TestBoilerplateArm:
    """min_occurrences / keep_first generalize excision into a
    boilerplate scrubber."""

    def _run(self, spark, rows, **kw):
        from xmidt_event_streams_spark.operators.dedup import (
            remove_duplicate_spans,
        )

        df = spark.createDataFrame(rows, "doc_id: long, text: string")
        return {
            r["doc_id"]: r
            for r in remove_duplicate_spans(df, **kw).collect()
        }

    def test_threshold_spares_low_multiplicity(self, spark):
        banner = "accept all cookies to continue browsing"
        pair = "a rare shared phrase appears twice"
        # doc-UNIQUE context on both sides: windows spanning the
        # banner boundary contain a per-doc token and never recur
        rows = [(i, f"head{i} mid{i} {banner} tail{i} foot{i}") for i in range(4)]
        rows += [(10, f"x {pair} y"), (11, f"p {pair} q")]
        out = self._run(
            spark, rows, window=6, min_occurrences=4, keep_first=False
        )
        # banner (4 occurrences) cut EVERYWHERE, no canonical survivor
        for i in range(4):
            assert out[i]["clean_text"] == f"head{i} mid{i} tail{i} foot{i}"
        # the rare pair (2 < 4) survives in both docs
        assert out[10]["n_removed"] == 0 and out[11]["n_removed"] == 0

    def test_default_is_lee_et_al(self, spark):
        pair = "a b c d e"
        out = self._run(
            spark, [(1, f"x {pair} y"), (2, f"p {pair} q")], window=5
        )
        assert out[1]["n_removed"] == 0 and out[2]["n_removed"] == 5

    def test_min_occurrences_guard(self, spark):
        import pytest

        from xmidt_event_streams_spark.operators.dedup import (
            remove_duplicate_spans,
        )

        df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
        with pytest.raises(ValueError, match="min_occurrences"):
            remove_duplicate_spans(df, min_occurrences=1)


def test_keep_first_string_ids_struct_fallback(spark):
    """Non-integral ids can't use the packed-bigint keeper and fall
    back to the struct min (keyed sort-agg accepted): semantics must
    match the integral path."""
    from xmidt_event_streams_spark.operators.dedup import (
        remove_duplicate_spans,
    )

    df = spark.createDataFrame(
        [("docA", "x a b c d e y"), ("docB", "q a b c d e r")],
        "doc_id: string, text: string",
    )
    out = {
        r["doc_id"]: r
        for r in remove_duplicate_spans(df, window=5).collect()
    }
    assert out["docA"]["clean_text"] == "x a b c d e y"
    assert out["docB"]["clean_text"] == "q r"


class TestScrubFixpoint:
    """Excision is not idempotent: cutting a span can stitch the
    surviving neighbors into a fresh occurrence. fixpoint=True must
    leave NO matching window; the review's confirmed repro is the
    regression case."""

    def _scrub(self, spark, text, phrase, **kw):
        from xmidt_event_streams_spark.operators.dedup import (
            remove_contaminated_spans,
        )

        cdf = spark.createDataFrame([(1, text)], "doc_id: long, text: string")
        bdf = spark.createDataFrame([(9, phrase)], "doc_id: long, text: string")
        return remove_contaminated_spans(cdf, bdf, window=5, **kw).collect()

    def test_single_pass_stitches(self, spark):
        # documented limitation of the single pass: the repro from the
        # r5 review -- excising tokens 5..9 leaves exactly the phrase
        out = self._scrub(spark, "a b c d a b c d e e", "a b c d e")
        assert out[0]["clean_text"] == "a b c d e"

    def test_fixpoint_removes_everything(self, spark):
        out = self._scrub(
            spark, "a b c d a b c d e e", "a b c d e", fixpoint=True
        )
        assert out[0]["clean_text"] == ""
        assert out[0]["n_removed"] == 10 and out[0]["n_tokens"] == 10

    def test_fixpoint_full_output_keeps_untouched_docs(self, spark):
        from xmidt_event_streams_spark.operators.dedup import (
            remove_contaminated_spans,
        )

        cdf = spark.createDataFrame(
            [(1, "a b c d a b c d e e"), (2, "nothing to see here folks")],
            "doc_id: long, text: string",
        )
        bdf = spark.createDataFrame(
            [(9, "a b c d e")], "doc_id: long, text: string"
        )
        out = {
            r["doc_id"]: r
            for r in remove_contaminated_spans(
                cdf, bdf, window=5, fixpoint=True
            ).collect()
        }
        assert len(out) == 2
        assert out[1]["clean_text"] == ""
        assert out[2]["n_removed"] == 0
        touched = remove_contaminated_spans(
            cdf, bdf, window=5, fixpoint=True, touched_only=True
        ).collect()
        assert [r["doc_id"] for r in touched] == [1]

    def test_touched_only_single_pass(self, spark):
        from xmidt_event_streams_spark.operators.dedup import (
            remove_contaminated_spans,
        )

        cdf = spark.createDataFrame(
            [(1, "x a b c d e y"), (2, "unrelated words entirely here")],
            "doc_id: long, text: string",
        )
        bdf = spark.createDataFrame(
            [(9, "a b c d e")], "doc_id: long, text: string"
        )
        rows = remove_contaminated_spans(
            cdf, bdf, window=5, touched_only=True
        ).collect()
        assert [r["doc_id"] for r in rows] == [1]
        assert rows[0]["clean_text"] == "x y"


def test_packed_keeper_refuses_huge_ids(spark):
    """|doc_id| >= 2^41 would overflow the packed (id, pos) keeper;
    the guard must raise, never silently skip the dedup (review
    repro: ids 1 and 1+2^42 collided and nothing was excised)."""
    import pytest
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    from xmidt_event_streams_spark.operators.dedup import (
        remove_duplicate_spans,
    )

    big = (1 << 42) + 1
    df = spark.createDataFrame(
        [(1, "x a b c d e y"), (big, "q a b c d e r")],
        "doc_id: long, text: string",
    )
    with pytest.raises(SparkRuntimeException, match="packing would corrupt"):
        remove_duplicate_spans(df, window=5).collect()


def test_winnow_selection_density_bound(spark):
    """True winnowing: every k consecutive window positions contain
    >= 1 selection, so consecutive selected positions differ by <= k
    (the property the excision interval-merge relies on)."""
    from xmidt_event_streams_spark.operators.dedup import (
        repeated_window_spans,
    )

    w, k = 3, 4
    text = " ".join(f"t{i * 37 % 101}" for i in range(60))
    df = spark.createDataFrame(
        [(1, text), (2, text)], "doc_id long, text string"
    )
    pos = sorted(
        r["pos"]
        for r in repeated_window_spans(df, window=w, winnow=k)
        .filter("doc_id = 1")
        .collect()
    )
    assert pos, "identical docs must share selections"
    assert pos[0] <= k
    assert all(b - a <= k for a, b in zip(pos, pos[1:])), pos


def test_fixpoint_no_survival_property(spark):
    """Adversarial property: after a fixpoint scrub NO window-gram of
    the benchmark survives in any clean text -- driven over many
    random corpora on a 3-token alphabet, where excision stitching is
    the common case, not the corner case. One Spark job per corpus;
    token accounting holds throughout."""
    import random

    from xmidt_event_streams_spark.operators.dedup import (
        remove_contaminated_spans,
    )

    w = 3
    rng = random.Random(20260815)
    alphabet = ["a", "b", "c"]
    for trial in range(6):
        phrase = [rng.choice(alphabet) for _ in range(5)]
        bench_grams = {
            tuple(phrase[i : i + w]) for i in range(len(phrase) - w + 1)
        }
        docs = []
        for d in range(5):
            toks = [rng.choice(alphabet) for _ in range(rng.randint(8, 25))]
            if d % 2 == 0:  # splice the phrase in somewhere
                at = rng.randint(0, len(toks))
                toks = toks[:at] + phrase + toks[at:]
            docs.append((d, " ".join(toks)))
        cdf = spark.createDataFrame(docs, "doc_id: long, text: string")
        bdf = spark.createDataFrame(
            [(99, " ".join(phrase))], "doc_id: long, text: string"
        )
        out = remove_contaminated_spans(
            cdf, bdf, window=w, fixpoint=True
        ).collect()
        assert len(out) == len(docs)
        for r in out:
            clean = r["clean_text"].split() if r["clean_text"] else []
            assert len(clean) == r["n_tokens"] - r["n_removed"], (trial, r)
            grams = {
                tuple(clean[i : i + w]) for i in range(len(clean) - w + 1)
            }
            assert not (grams & bench_grams), (trial, r["doc_id"], clean)
