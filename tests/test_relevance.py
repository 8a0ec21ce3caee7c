"""Unit semantics for relevance (TF-IDF / BM25) and contamination
operators on hand-computable corpora. The catalog twins
(bm25_scores, contamination_check) cover DuckDB parity at sf scale;
these pin the formulas themselves.
"""

import math

from pyspark.sql import functions as F

from xmidt_event_streams_spark.operators.contamination import contamination
from xmidt_event_streams_spark.operators.relevance import bm25_scores, tfidf


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id: long, text: string")


class TestTfidf:
    def test_hand_computed(self, spark):
        df = _docs(spark, [(1, "a a b"), (2, "a c")])
        out = {
            (r["doc_id"], r["term"]): (r["tf"], r["tfidf"])
            for r in tfidf(df).collect()
        }
        # N=2; df(a)=2, df(b)=1, df(c)=1
        assert out[(1, "a")] == (2, round(2 * math.log(1 + 2 / 2), 6))
        assert out[(1, "b")] == (1, round(1 * math.log(1 + 2 / 1), 6))
        assert out[(2, "c")] == (1, round(1 * math.log(1 + 2 / 1), 6))
        assert len(out) == 4

    def test_empty_doc_absent(self, spark):
        df = _docs(spark, [(1, "x"), (2, "   ")])
        assert [r["doc_id"] for r in tfidf(df).collect()] == [1]


class TestBm25:
    def test_hand_computed_single_term(self, spark):
        # two docs, query {a}: doc 1 has tf=2/dl=4, doc 2 tf=1/dl=2
        df = _docs(spark, [(1, "a a b b"), (2, "a c")])
        out = {r["doc_id"]: r["bm25"] for r in bm25_scores(df, ["a"]).collect()}
        k1, b, avgdl, n, dfa = 1.2, 0.75, 3.0, 2, 2

        def score(tf, dl):
            idf = math.log(1 + (n - dfa + 0.5) / (dfa + 0.5))
            return round(idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl)), 6)

        assert out == {1: score(2, 4), 2: score(1, 2)}

    def test_doc_without_query_terms_absent(self, spark):
        df = _docs(spark, [(1, "a b"), (2, "c d")])
        assert [r["doc_id"] for r in bm25_scores(df, ["a"]).collect()] == [1]

    def test_case_insensitive_query(self, spark):
        df = _docs(spark, [(1, "Spark rocks")])
        assert bm25_scores(df, ["SPARK"]).count() == 1


class TestContamination:
    def test_known_overlap(self, spark):
        # bigrams of doc 1: {a b, b c}; benchmark holds {a b} only
        train = _docs(spark, [(1, "a b c"), (2, "x y z")])
        bench = _docs(spark, [(100, "a b")])
        out = {
            r["doc_id"]: (r["n_ngrams"], r["n_hit"], r["contamination"])
            for r in contamination(train, bench, ngram_n=2).collect()
        }
        assert out == {1: (2, 1, 0.5), 2: (2, 0, 0.0)}

    def test_short_docs_absent_and_no_broadcast_path(self, spark):
        train = _docs(spark, [(1, "only"), (2, "a b")])
        bench = _docs(spark, [(100, "a b")])
        out = contamination(
            train, bench, ngram_n=2, broadcast_benchmark=False
        ).collect()
        assert {r["doc_id"] for r in out} == {2}
        assert out[0]["contamination"] == 1.0


class TestHashedVectors:
    """tfidf_hashed_vectors: the text -> vector-stack bridge."""

    def _docs(self, spark):
        near_a = "spark shuffles data across the cluster for joins"
        near_b = "spark shuffles data across the cluster for big joins"
        far = "pelicans migrate over coastal wetlands every autumn"
        return spark.createDataFrame(
            [(1, near_a), (2, near_b), (3, far), (4, "")],
            "doc_id long, text string",
        )

    def test_unit_norm_and_zero_doc(self, spark):
        from xmidt_event_streams_spark.operators.relevance import (
            tfidf_hashed_vectors,
        )

        vecs = {
            r["doc_id"]: r["embedding"]
            for r in tfidf_hashed_vectors(self._docs(spark), dim=32).collect()
        }
        assert set(vecs) == {1, 2, 3, 4}
        for i in (1, 2, 3):
            assert abs(sum(v * v for v in vecs[i]) - 1.0) < 1e-9
            assert len(vecs[i]) == 32
        assert vecs[4] == [0.0] * 32  # token-free doc -> zero vector

    def test_lexical_cosine_ranks_near_dups(self, spark):
        from xmidt_event_streams_spark.operators.relevance import (
            tfidf_hashed_vectors,
        )

        vecs = {
            r["doc_id"]: r["embedding"]
            for r in tfidf_hashed_vectors(self._docs(spark), dim=64).collect()
        }

        def cos(a, b):
            return sum(x * y for x, y in zip(a, b))

        assert cos(vecs[1], vecs[2]) > 0.85    # near-dup pair (idf boosts the one differing term)
        assert cos(vecs[1], vecs[3]) < 0.3     # unrelated
        assert cos(vecs[1], vecs[2]) > cos(vecs[1], vecs[3])

    def test_feeds_the_ann_stack(self, spark):
        """The bridge output drives brute_force_topk unchanged: the
        near-dup is every doc's top-1 neighbor."""
        from xmidt_event_streams_spark.operators.relevance import (
            tfidf_hashed_vectors,
        )
        from xmidt_event_streams_spark.operators.similarity import (
            brute_force_topk,
        )

        corpus = tfidf_hashed_vectors(
            self._docs(spark).filter("doc_id < 4"), dim=64
        ).withColumnRenamed("doc_id", "vec_id")
        top = brute_force_topk(corpus, corpus.filter("vec_id = 1"), k=1)
        row = top.collect()[0]
        assert row["vec_id"] == 2 and row["cos_sim"] > 0.85


# -- KMV corpus-overlap sketch ----------------------------------------


class TestCorpusOverlap:
    def _mk(self, spark, texts, start=0):
        return spark.createDataFrame(
            [(start + i, t) for i, t in enumerate(texts)],
            "doc_id long, text string",
        )

    def test_bottom_k_matches_duckdb(self, spark):
        import duckdb

        from xmidt_event_streams_spark.operators.contamination import (
            kmv_bottom_k,
        )

        sf = "/root/testdata/sf0.01"
        docs = spark.read.parquet(f"{sf}/documents.parquet")
        got = kmv_bottom_k(docs, ngram_n=5, k=64)
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT * "
            f"FROM read_parquet('{sf}/documents.parquet')"
        )
        norm = r"trim(regexp_replace(lower(text), '[ \t\n\x0B\f\r]+', ' ', 'g'))"
        want = [
            r[0]
            for r in con.execute(
                f"""WITH w AS (SELECT doc_id,
                  list_filter(string_split({norm}, ' '), t -> t <> '') AS w
                  FROM documents),
                g AS (SELECT DISTINCT doc_id, unnest(
                  CASE WHEN len(w) >= 5 THEN list_transform(
                    generate_series(1, len(w) - 4),
                    i -> array_to_string(w[i:i+4], ' ')) ELSE [] END) AS g
                  FROM w)
                SELECT DISTINCT md5(g) AS h FROM g ORDER BY h LIMIT 64"""
            ).fetchall()
        ]
        assert got == want

    def test_exact_regime_jaccard(self, spark):
        from xmidt_event_streams_spark.operators.contamination import (
            corpus_overlap_report,
        )

        shared = "one two three four five six seven eight"
        only_a = "alpha beta gamma delta epsilon zeta eta theta"
        only_b = "red orange yellow green blue indigo violet ultra"
        a = self._mk(spark, [shared, only_a])
        b = self._mk(spark, [shared, only_b], start=10)
        rep = corpus_overlap_report(a, b, ngram_n=5, k=1024)
        # 4 distinct 5-grams per 8-token doc -> 8 per corpus, 4 shared
        assert rep["exact"] is True
        assert rep["distinct_a"] == rep["distinct_b"] == 8.0
        assert rep["distinct_union"] == 12.0
        assert rep["jaccard"] == round(4 / 12, 6)
        assert rep["containment_a"] == rep["containment_b"] == 0.5
        # self-overlap is identity
        self_rep = corpus_overlap_report(a, a, ngram_n=5, k=1024)
        assert self_rep["jaccard"] == 1.0

    def test_sketch_regime_estimates_within_tolerance(self, spark):
        from xmidt_event_streams_spark.operators.contamination import (
            corpus_overlap_report,
        )

        # numbered docs "a b c d e f g h{i}": 3 shared 5-grams plus
        # one unique gram per doc. A = 0..1999, B = 1000..2999 ->
        # |A| = |B| = 2003, |A∩B| = 1003, |A∪B| = 3003
        a = self._mk(spark, [f"a b c d e f g h{i}" for i in range(2000)])
        b = self._mk(
            spark,
            [f"a b c d e f g h{i}" for i in range(1000, 3000)],
            start=5000,
        )
        rep = corpus_overlap_report(a, b, ngram_n=5, k=256)
        assert rep["exact"] is False
        true_j = 1003 / 3003
        assert abs(rep["jaccard"] - true_j) < 0.1, rep
        assert abs(rep["distinct_a"] - 2003) / 2003 < 0.25, rep

    def test_k_contract(self, spark):
        import pytest

        from xmidt_event_streams_spark.operators.contamination import (
            kmv_bottom_k,
        )

        with pytest.raises(ValueError, match="positive"):
            kmv_bottom_k(self._mk(spark, ["a b c d e"]), k=0)

    def test_kmv_artifact_and_drift(self, spark, tmp_path):
        import pytest

        from xmidt_event_streams_spark.operators.contamination import (
            kmv_bottom_k,
            kmv_drift,
            load_kmv,
            save_kmv,
        )

        a = self._mk(spark, [f"w{i} x y z q r s t" for i in range(50)])
        sk = kmv_bottom_k(a, ngram_n=5, k=64)
        save_kmv(spark, sk, str(tmp_path / "base"), ngram_n=5, k=64)
        loaded, meta = load_kmv(spark, str(tmp_path / "base"))
        assert loaded == sk and meta["ngram_n"] == 5 and meta["k"] == 64
        # same corpus -> stable at jaccard 1.0
        rep = kmv_drift(spark, str(tmp_path / "base"), a)
        assert rep["verdict"] == "stable" and rep["jaccard"] == 1.0
        # disjoint corpus -> shifted
        b = self._mk(spark, [f"m{i} n o p q2 r2 s2 t2" for i in range(50)])
        rep2 = kmv_drift(spark, str(tmp_path / "base"), b)
        assert rep2["verdict"] == "shifted" and rep2["jaccard"] < 0.5
        with pytest.raises(ValueError, match="sidecar"):
            load_kmv(spark, str(tmp_path / "missing"))

    def test_kmv_drift_in_maintenance(self, spark, tmp_path):
        from xmidt_event_streams_spark.maintenance import run_maintenance
        from xmidt_event_streams_spark.operators.contamination import (
            kmv_bottom_k,
            save_kmv,
        )

        a = self._mk(spark, [f"w{i} x y z q r s t" for i in range(30)])
        a.write.parquet(str(tmp_path / "corpus"))
        sk = kmv_bottom_k(a, ngram_n=5, k=64)
        save_kmv(spark, sk, str(tmp_path / "base"), ngram_n=5, k=64)
        rep = run_maintenance(
            spark,
            kmv_baselines=((str(tmp_path / "base"), str(tmp_path / "corpus")),),
        )
        entry = rep[str(tmp_path / "base")]
        assert entry["kind"] == "kmv_drift"
        assert entry["verdict"] == "stable"
        # a broken baseline path is recorded, not raised
        rep2 = run_maintenance(
            spark,
            kmv_baselines=((str(tmp_path / "nope"), str(tmp_path / "corpus")),),
        )
        assert "error" in rep2[str(tmp_path / "nope")]
