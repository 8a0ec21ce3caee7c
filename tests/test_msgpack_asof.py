"""Msgpack edge decoder (V1/V2) and the as-of join operator."""

import datetime

import pytest
from pyspark.sql import Row

from xmidt_event_streams_spark.operators.asof import asof_join
from xmidt_event_streams_spark.sources.msgpack_wrp import (
    MsgpackError,
    decode_wrp_msgpack,
    msgpack_decode,
    msgpack_encode,
)


WRP = {
    "msg_type": 4,
    "source": "mac:112233445566",
    "dest": "event:device-status/mac:112233445566/online",
    "transaction_uuid": "txn-1",
    "content_type": "application/json",
    "session_id": "2mXioSTpZ9wKJSqDpVCRQ5cbd2P",
    "partner_ids": ["comcast"],
    "metadata": {"/hw-model": "m1", "/fw-name": "f1"},
    "payload": b'{"ts":"2024-01-01T00:00:00Z"}',
}


class TestMsgpackCodec:
    def test_roundtrip(self):
        assert msgpack_decode(msgpack_encode(WRP)) == WRP

    def test_scalars(self):
        for v in (None, True, False, 0, 1, 127, -1, -32, 255, 1 << 40, -(1 << 40),
                  "", "x" * 100, b"\x00\xff", [], [1, "a"], {}, {"k": [1, 2]}):
            assert msgpack_decode(msgpack_encode(v)) == v

    def test_truncated_rejected(self):
        with pytest.raises(MsgpackError):
            msgpack_decode(msgpack_encode(WRP)[:10])

    def test_trailing_bytes_rejected(self):
        with pytest.raises(MsgpackError):
            msgpack_decode(msgpack_encode(1) + b"\x01")


class TestDecodeWrpMsgpack:
    def test_decode_and_poison_containment(self, spark):
        rows = [
            Row(raw=msgpack_encode(WRP)),
            Row(raw=b"\xc1garbage"),  # 0xc1 is the never-used type byte
            Row(raw=msgpack_encode({**WRP, "msg_type": 3, "session_id": "other"})),
        ]
        out = decode_wrp_msgpack(spark.createDataFrame(rows)).collect()
        by_sess = {r["session_id"]: r for r in out}
        good = by_sess[WRP["session_id"]]
        assert good["msg_type"] == 4
        assert good["dest"] == WRP["dest"]
        assert good["metadata"]["/hw-model"] == "m1"
        assert bytes(good["payload"]) == WRP["payload"]
        assert good["decode_error"] is None
        bad = by_sess[None]
        assert bad["msg_type"] == -1 and "0xc1" in bad["decode_error"]


def _t(m):
    return datetime.datetime(2024, 1, 1, 0, m)


class TestAsofJoin:
    def test_basic_and_tie_semantics(self, spark):
        left = spark.createDataFrame(
            [Row(id=1, k="a", ts=_t(10)), Row(id=2, k="a", ts=_t(20)),
             Row(id=3, k="a", ts=_t(5)), Row(id=4, k="b", ts=_t(10))]
        )
        right = spark.createDataFrame(
            [Row(k="a", ts=_t(10), v="r10"), Row(k="a", ts=_t(15), v="r15"),
             Row(k="b", ts=_t(30), v="r30")]
        )
        out = {r["id"]: r["v"] for r in
               asof_join(left, right, "k", value_cols=("v",)).collect()}
        assert out[1] == "r10"   # equal ts included (>= semantics)
        assert out[2] == "r15"   # latest preceding
        assert out[3] is None    # nothing precedes
        assert out[4] is None    # right row is later

    def test_matches_duckdb_asof(self, spark, sf_dir):
        from xmidt_event_streams_spark.catalog import QUERIES
        import duckdb

        sdf = QUERIES["asof_last_click"].fn(spark, sf_dir)
        srows = sorted(tuple(str(x) for x in r) for r in sdf.collect())
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf_dir}/events.parquet')"
        )
        drows = sorted(
            tuple(str(x) for x in r)
            for r in con.execute(QUERIES["asof_last_click"].sql).fetchall()
        )
        assert srows == drows


class TestNgramBucketCap:
    def test_oversized_bucket_is_bounded(self, spark):
        """One 30-doc bucket at cap 10: pairing is restricted to the
        10 lowest-id survivors (45 pairs, never 435) and the drop
        ledger reports exactly the 20 excluded docs."""
        from pyspark.sql import Row

        from xmidt_event_streams_spark.operators.dedup import (
            bucket_cap_drops,
            ngram_jaccard_pairs,
        )

        rows = [
            Row(doc_id=i, lang="en", source="s", text=f"alpha beta w{i} gamma")
            for i in range(30)
        ]
        rows += [
            Row(doc_id=100 + i, lang="fr", source="s", text=f"un deux w{i}")
            for i in range(3)
        ]
        df = spark.createDataFrame(rows)
        pairs = ngram_jaccard_pairs(
            df, ("lang", "source"), max_bucket_size=10
        ).collect()
        en_pairs = [p for p in pairs if p["id_a"] < 100]
        assert len(en_pairs) == 45  # C(10,2), not C(30,2)=435
        assert max(max(p["id_a"], p["id_b"]) for p in en_pairs) == 9
        fr_pairs = [p for p in pairs if p["id_a"] >= 100]
        assert len(fr_pairs) == 3  # small bucket untouched

        drops = bucket_cap_drops(df, ("lang", "source"), 10).collect()
        assert [(r["lang"], r["n_docs"], r["n_dropped"]) for r in drops] == [
            ("en", 30, 20)
        ]

    def test_no_cap_matches_capped_when_under_cap(self, spark):
        from pyspark.sql import Row

        from xmidt_event_streams_spark.operators.dedup import ngram_jaccard_pairs

        rows = [
            Row(doc_id=i, lang="en", source="s", text=f"a b c w{i}")
            for i in range(5)
        ]
        df = spark.createDataFrame(rows)
        uncapped = sorted(map(tuple, ngram_jaccard_pairs(df, ("lang",)).collect()))
        capped = sorted(
            map(tuple, ngram_jaccard_pairs(df, ("lang",), max_bucket_size=50).collect())
        )
        assert uncapped == capped


class TestClusteredNearDup:
    def test_subset_of_bruteforce_and_no_nested_loop(self, spark, sf_dir):
        """The clustered plan's pairs are a subset of brute force at
        the same threshold (verify is exact; only candidate recall
        differs) and the physical plan has no nested-loop join."""
        from xmidt_event_streams_spark.catalog import q_embedding_near_dup

        approx = q_embedding_near_dup(spark, sf_dir)
        plan = approx._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastNestedLoop" not in plan
        assert "Cartesian" not in plan
        got = {(r["id_a"], r["id_b"]) for r in approx.collect()}
        exact = {
            (r["id_a"], r["id_b"])
            for r in q_embedding_near_dup(spark, sf_dir, exact=True).collect()
        }
        assert got <= exact
        # measured ~0.97 recall with the learned auto-sized centroids
        # (tests/test_components.py asserts >= 0.95 at sf0.01); the
        # loose floor here guards the sf0.001 fixture too
        assert len(got) >= 0.5 * len(exact)


class TestIvfKmeansQuery:
    def test_ivf_ann_kmeans_runs_with_learned_centroids(self, spark, sf_dir):
        """The learned-centroid IVF search (cut from the 50-entry
        driver registry; evidence lives here): stable schema, k rows
        per query id, deterministic across runs."""
        from xmidt_event_streams_spark.catalog import q_ivf_ann_kmeans

        out1 = q_ivf_ann_kmeans(spark, sf_dir).collect()
        assert {c for c in out1[0].asDict()} == {
            "query_id", "vec_id", "cos_sim", "rank"
        }
        by_q = {}
        for r in out1:
            by_q.setdefault(r["query_id"], []).append(r["rank"])
        assert all(sorted(v) == list(range(1, len(v) + 1)) for v in by_q.values())
        out2 = q_ivf_ann_kmeans(spark, sf_dir).collect()
        assert sorted(map(tuple, out1)) == sorted(map(tuple, out2))


class TestKMeans:
    def test_converges_to_planted_clusters_and_deterministic(self, spark):
        from pyspark.sql import Row

        from xmidt_event_streams_spark.operators.ivf import assign_cells, kmeans_fit

        # two tight planted clusters around orthogonal axes
        rows = []
        for i in range(10):
            rows.append(Row(vec_id=i, embedding=[10.0 + i * 0.1, float(i % 2)]))
        for i in range(10, 20):
            rows.append(Row(vec_id=i, embedding=[float(i % 2), 10.0 + i * 0.1]))
        df = spark.createDataFrame(rows)
        c1 = kmeans_fit(df, k=2, n_iters=4)
        c2 = kmeans_fit(df, k=2, n_iters=4)
        assert c1 == c2  # deterministic
        out = assign_cells(df, c1).collect()
        cells = {r["vec_id"]: r["cell"] for r in out}
        first = {cells[i] for i in range(10)}
        second = {cells[i] for i in range(10, 20)}
        assert len(first) == 1 and len(second) == 1 and first != second


class TestIvfIndex:
    def test_probe_equals_in_memory_and_prunes_partitions(self, spark, tmp_path, sf_dir):
        """write_ivf_index + probe_ivf_index: (a) results identical to
        the in-memory ivf_topk (same ties, same rounding), (b) the
        probe plan prunes the index scan to the probed cells (dynamic
        partition pruning from the broadcast query side), (c) layout =
        one directory per cell."""
        import os

        from pyspark.sql import functions as F

        from xmidt_event_streams_spark.operators.ivf import (
            ivf_topk,
            probe_ivf_index,
            write_ivf_index,
        )
        from xmidt_event_streams_spark.operators.similarity import (
            deterministic_planes,
        )

        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        cents = deterministic_planes(16, 64, seed="ivf-centroids")
        queries = emb.orderBy("vec_id").limit(5)

        idx = str(tmp_path / "ivf")
        write_ivf_index(emb, idx, cents)
        cells = [d for d in os.listdir(idx) if d.startswith("cell=")]
        assert 1 < len(cells) <= 16
        assert all(
            sum(f.endswith(".parquet") for f in os.listdir(os.path.join(idx, c))) == 1
            for c in cells
        )

        got = probe_ivf_index(spark, idx, queries, cents, k=3, n_probe=2)
        plan = got._jdf.queryExecution().executedPlan().toString()
        # the probed-cell IN-list reaches the index scan as a STATIC
        # partition filter (plan-time pruning; stronger than DPP)
        import re

        pf = re.search(r"PartitionFilters: \[([^\]]*cell[^\]]*)\]", plan)
        assert pf and " IN " in pf.group(1), plan[:1500]
        want = ivf_topk(emb, queries, cents, k=3, n_probe=2)
        assert sorted(map(tuple, got.collect())) == sorted(
            map(tuple, want.collect())
        )
