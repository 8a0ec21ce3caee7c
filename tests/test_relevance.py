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
