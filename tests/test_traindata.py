"""Training-data operators vs DuckDB twins (same md5-arithmetic
assignment formulas), plus determinism/partition-invariance checks."""

from pyspark.sql import functions as F

from tests.test_oracle_parity import _rowset, duck_run
from xmidt_event_streams_spark.operators.traindata import (
    assign_split,
    pack_sequences,
    stratified_sample,
)

_BUCKET_SQL = (
    "('0x' || substr(md5('{salt}|' || doc_id::VARCHAR), 1, 15))::BIGINT % 10000"
)


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def test_assign_split_matches_duckdb(spark, sf_dir):
    sdf = assign_split(
        _docs(spark, sf_dir), weights={"train": 0.9, "val": 0.05, "test": 0.05}
    ).select("doc_id", "split")
    b = _BUCKET_SQL.format(salt="split-v1")
    cols, rows = duck_run(
        f"""SELECT doc_id, CASE WHEN {b} < 9000 THEN 'train'
            WHEN {b} < 9500 THEN 'val' ELSE 'test' END AS split
            FROM documents""",
        sf_dir,
    )
    assert _rowset(sdf.columns, [tuple(r) for r in sdf.collect()]) == _rowset(
        cols, rows
    )


def test_assign_split_proportions_and_determinism(spark, sf_dir):
    df = assign_split(_docs(spark, sf_dir))
    counts = {r.split: r.n for r in df.groupBy("split").agg(F.count("*").alias("n")).collect()}
    total = sum(counts.values())
    assert 0.85 < counts["train"] / total < 0.95
    # partition-invariant: repartitioning does not move rows between splits
    again = assign_split(_docs(spark, sf_dir).repartition(7))
    assert (
        df.select("doc_id", "split")
        .exceptAll(again.select("doc_id", "split"))
        .count()
        == 0
    )


def test_stratified_sample_matches_duckdb(spark, sf_dir):
    sdf = stratified_sample(
        _docs(spark, sf_dir), "lang", {"en": 0.5, "es": 0.1}
    ).select("doc_id")
    b = _BUCKET_SQL.format(salt="sample-v1")
    cols, rows = duck_run(
        f"""SELECT doc_id FROM documents
            WHERE {b} < CASE lang WHEN 'en' THEN 5000
                        WHEN 'es' THEN 1000 ELSE 0 END""",
        sf_dir,
    )
    assert _rowset(sdf.columns, [tuple(r) for r in sdf.collect()]) == _rowset(
        cols, rows
    )


def test_stratified_sample_rates(spark, sf_dir):
    base = _docs(spark, sf_dir)
    en_total = base.filter("lang = 'en'").count()
    kept = stratified_sample(base, "lang", {"en": 0.5})
    en_kept = kept.filter("lang = 'en'").count()
    assert kept.filter("lang != 'en'").count() == 0  # default fraction 0
    assert 0.4 < en_kept / en_total < 0.6


def test_pack_sequences_matches_duckdb(spark, sf_dir):
    sdf = pack_sequences(
        _docs(spark, sf_dir).withColumn("tok", F.col("n_chars")),
        token_col="tok",
        order_col="doc_id",
        budget=50_000,
        shard_cols=["lang"],
    ).select("doc_id", "pack_id")
    cols, rows = duck_run(
        """SELECT doc_id,
             (COALESCE(SUM(n_chars) OVER (PARTITION BY lang ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              // 50000)::BIGINT AS pack_id
           FROM documents""",
        sf_dir,
    )
    assert _rowset(sdf.columns, [tuple(r) for r in sdf.collect()]) == _rowset(
        cols, rows
    )


def test_pack_sequences_budget_semantics(spark):
    """Packs fill greedily: overflow by at most one document; an
    oversized document sits alone in its own pack."""
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate([40, 40, 40, 250, 10, 90, 90])],
        "id long, tok long",
    )
    got = {
        r.id: r.pack_id
        for r in pack_sequences(df, "tok", "id", budget=100).collect()
    }
    # prefix sums: 0,40,80,120,370,380,470 -> floor/100
    assert got == {0: 0, 1: 0, 2: 0, 3: 1, 4: 3, 5: 3, 6: 4}


def test_write_training_shards_layout_and_readback(spark, sf_dir, tmp_path):
    """End-to-end assembly: split -> shard -> pack -> partitioned
    write. Read-back must show (a) partition pruning serving one
    split without the others, (b) every doc exactly once, (c) pack
    budgets respected within each (split, shard)."""
    from xmidt_event_streams_spark.operators.traindata import (
        write_training_shards,
    )

    docs = _docs(spark, sf_dir).withColumn("n_tokens", F.lit(50))
    out = str(tmp_path / "shards")
    write_training_shards(
        docs, out, token_col="n_tokens", n_shards=4, pack_budget=200
    )

    back = spark.read.parquet(out)
    assert back.count() == docs.count()
    assert back.select("doc_id").distinct().count() == docs.count()
    # layout: split=... / shard=... directories, prunable
    import os

    splits = sorted(
        d.split("=")[1] for d in os.listdir(out) if d.startswith("split=")
    )
    assert "train" in splits and len(splits) >= 2
    train_only = spark.read.parquet(out).filter(F.col("split") == "train")
    assert 0 < train_only.count() < back.count()
    # pack budget: 200/50 = 4 docs per pack (except the last pack per shard)
    sizes = (
        back.filter(F.col("split") == "train")
        .groupBy("shard", "pack_id")
        .count()
        .collect()
    )
    assert sizes and all(r["count"] <= 4 for r in sizes)
    # determinism: a rewrite yields the identical assignment
    out2 = str(tmp_path / "shards2")
    write_training_shards(
        docs, out2, token_col="n_tokens", n_shards=4, pack_budget=200
    )
    a = sorted(map(tuple, back.select("doc_id", "split", "shard").collect()))
    b = sorted(
        map(
            tuple,
            spark.read.parquet(out2).select("doc_id", "split", "shard").collect(),
        )
    )
    assert a == b


def test_write_training_shards_sf01_budgets_and_append_stability(spark, tmp_path):
    """The full write path at sf0.1 with REAL variable token counts:
    (a) partitioned layout present, (b) every (split, shard, pack)
    token sum stays under budget + its largest member (greedy
    contiguous fill never overflows by a whole document), (c) a
    second run over a GROWN corpus (append simulation) leaves every
    previously-assigned doc in its original (split, shard) -- the
    ingestion-stability contract that rand()/sampleBy-based
    assignment cannot give."""
    import os

    from xmidt_event_streams_spark.operators.traindata import (
        write_training_shards,
    )

    docs = (
        spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
        .select("doc_id", "text")
        .withColumn("n_tokens", F.size(F.split(F.col("text"), r"\s+")))
    )
    budget = 2048
    out = str(tmp_path / "shards_full")
    write_training_shards(
        docs, out, token_col="n_tokens", n_shards=8, pack_budget=budget
    )

    back = spark.read.parquet(out)
    assert back.count() == docs.count()
    splits = {d.split("=")[1] for d in os.listdir(out) if d.startswith("split=")}
    assert "train" in splits and len(splits) >= 2
    shard_dirs = [
        d
        for d in os.listdir(os.path.join(out, "split=train"))
        if d.startswith("shard=")
    ]
    assert len(shard_dirs) == 8

    # greedy-fill budget invariant, on real token counts
    packs = (
        back.groupBy("split", "shard", "pack_id")
        .agg(
            F.sum("n_tokens").alias("tok_sum"),
            F.max("n_tokens").alias("tok_max"),
        )
        .collect()
    )
    assert packs
    for r in packs:
        assert r["tok_sum"] < budget + r["tok_max"], (
            f"pack {r['split']}/{r['shard']}/{r['pack_id']} overflows: "
            f"{r['tok_sum']} vs budget {budget} + max {r['tok_max']}"
        )

    # append simulation: first run saw only half the corpus
    half = docs.filter(F.col("doc_id") % 2 == 0)
    out_half = str(tmp_path / "shards_half")
    write_training_shards(
        half, out_half, token_col="n_tokens", n_shards=8, pack_budget=budget
    )
    first = {
        r["doc_id"]: (r["split"], r["shard"])
        for r in spark.read.parquet(out_half)
        .select("doc_id", "split", "shard")
        .collect()
    }
    second = {
        r["doc_id"]: (r["split"], r["shard"])
        for r in back.select("doc_id", "split", "shard").collect()
    }
    moved = [d for d in first if first[d] != second[d]]
    assert not moved, f"{len(moved)} docs changed (split, shard) after growth"


def test_sample_k_per_group_matches_duckdb(spark, sf_dir):
    from xmidt_event_streams_spark.operators.traindata import (
        sample_k_per_group,
    )

    sdf = sample_k_per_group(
        _docs(spark, sf_dir), "lang", k=3, salt="kg-t"
    ).select("doc_id", "lang")
    cols, rows = duck_run(
        """SELECT doc_id, lang FROM (
             SELECT doc_id, lang, row_number() OVER (
               PARTITION BY lang
               ORDER BY md5('kg-t|' || doc_id::VARCHAR), doc_id
             ) AS rn FROM documents) WHERE rn <= 3""",
        sf_dir,
    )
    assert _rowset(sdf.columns, [tuple(r) for r in sdf.collect()]) == _rowset(
        cols, rows
    )


def test_sample_k_per_group_counts_and_plan(spark, sf_dir):
    import pytest

    from xmidt_event_streams_spark.operators.traindata import (
        sample_k_per_group,
    )

    docs = _docs(spark, sf_dir)
    got = sample_k_per_group(docs, "lang", k=3)
    sizes = {r["lang"]: r["n"] for r in got.groupBy("lang").agg(
        F.count("*").alias("n")).collect()}
    avail = {r["lang"]: r["n"] for r in docs.groupBy("lang").agg(
        F.count("*").alias("n")).collect()}
    assert sizes == {g: min(3, n) for g, n in avail.items()}
    # map-side partial top-k before the exchange
    assert "WindowGroupLimit" in got._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    # deterministic; fresh salt redraws
    a = {r["doc_id"] for r in got.select("doc_id").collect()}
    b = {r["doc_id"] for r in sample_k_per_group(
        docs, "lang", k=3).select("doc_id").collect()}
    assert a == b
    c = {r["doc_id"] for r in sample_k_per_group(
        docs, "lang", k=3, salt="other").select("doc_id").collect()}
    assert a != c
    with pytest.raises(ValueError, match="positive"):
        sample_k_per_group(docs, "lang", k=0)
    # nesting: larger k at the same salt is a superset (stable
    # holdout growth -- earlier picks never churn)
    k5 = {r["doc_id"] for r in sample_k_per_group(
        docs, "lang", k=5).select("doc_id").collect()}
    assert a <= k5


def test_mixture_sample_matches_duckdb(spark, sf_dir):
    """mixture_sample ≡ the same fraction computation + md5-bucket
    filter replayed in DuckDB (thresholds computed once in Python
    from mixture_fractions, so both engines filter on identical
    integer literals)."""
    from xmidt_event_streams_spark.operators.traindata import (
        mixture_fractions,
        mixture_sample,
    )

    docs = _docs(spark, sf_dir)
    weights = {"en": 0.5, "zh": 0.3, "es": 0.2}
    sdf = mixture_sample(docs, "lang", weights).select("doc_id", "lang")

    fr = mixture_fractions(docs, "lang", weights)
    b = _BUCKET_SQL.format(salt="mixture-v1")
    cases = " ".join(
        f"WHEN '{d}' THEN {int(round(f * 10000))}" for d, f in fr.items()
    )
    cols, rows = duck_run(
        f"""SELECT doc_id, lang FROM documents
            WHERE {b} < CASE lang {cases} ELSE 0 END""",
        sf_dir,
    )
    assert _rowset(sdf.columns, [tuple(r) for r in sdf.collect()]) == _rowset(
        cols, rows
    )


def test_mixture_sample_hits_target_proportions(spark):
    """Output proportions match the target mixture (within hash-
    granularity tolerance) and the binding domain keeps 100%."""
    from xmidt_event_streams_spark.operators.traindata import (
        mixture_fractions,
        mixture_sample,
    )

    sf = "/root/testdata/sf0.01"
    docs = _docs(spark, sf)
    raw = {r["lang"]: r["n"] for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    weights = {"en": 0.4, "zh": 0.3, "es": 0.3}
    fr = mixture_fractions(docs, "lang", weights)
    # binding domain (max w/n ratio) keeps everything
    binding = max(weights, key=lambda d: weights[d] / raw[d])
    assert fr[binding] == 1.0

    out = mixture_sample(docs, "lang", weights)
    got = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert set(got) == set(weights)  # untargeted domains dropped
    total = sum(got.values())
    for d, w in weights.items():
        # hash-bucket draw at these corpus sizes: generous tolerance
        assert abs(got[d] / total - w) < 0.1, (d, got, total)
    # all kept rows of the binding domain survived exactly
    assert got[binding] == raw[binding]


def test_mixture_sample_rejects_bad_weights(spark, sf_dir):
    import pytest

    from xmidt_event_streams_spark.operators.traindata import mixture_sample

    docs = _docs(spark, sf_dir)
    with pytest.raises(ValueError, match="non-empty"):
        mixture_sample(docs, "lang", {})
    with pytest.raises(ValueError, match="absent from corpus"):
        mixture_sample(docs, "lang", {"klingon": 1.0})


class TestWeightedSample:
    """Efraimidis-Spirakis weighted sampling without replacement:
    deterministic (hash-derived uniforms), engine-portable, weight-
    responsive."""

    def test_duckdb_parity_on_documents(self, spark):
        import duckdb

        from xmidt_event_streams_spark.operators.traindata import (
            weighted_sample,
        )

        sf = "/root/testdata/sf0.01"
        docs = spark.read.parquet(f"{sf}/documents.parquet").select(
            "doc_id", "n_chars"
        )
        got = sorted(
            r["doc_id"] for r in weighted_sample(docs, 80, "n_chars").collect()
        )
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')"
        )
        want = sorted(
            r[0]
            for r in con.execute(
                """
                SELECT doc_id FROM (
                  SELECT doc_id,
                    ln((CAST(('0x' || substr(md5('wsample-v1' ||
                        CAST(d.doc_id AS VARCHAR)), 1, 15))::UBIGINT AS DOUBLE)
                      + 1.0) / 16.0^15) / n_chars AS k
                  FROM documents d WHERE n_chars > 0
                  ORDER BY k DESC, doc_id LIMIT 80
                )
                """
            ).fetchall()
        )
        assert got == want

    def test_deterministic_and_salt_redraws(self, spark):
        from xmidt_event_streams_spark.operators.traindata import (
            weighted_sample,
        )

        df = spark.createDataFrame(
            [(i, float(1 + i % 5)) for i in range(500)], "doc_id long, w double"
        )
        a = sorted(r["doc_id"] for r in weighted_sample(df, 50, "w").collect())
        b = sorted(r["doc_id"] for r in weighted_sample(df, 50, "w").collect())
        c = sorted(
            r["doc_id"]
            for r in weighted_sample(df, 50, "w", salt="other").collect()
        )
        assert a == b
        assert a != c  # a different salt is a different draw

    def test_weight_responsiveness_and_guards(self, spark):
        import pytest

        from xmidt_event_streams_spark.operators.traindata import (
            weighted_sample,
        )

        df = spark.createDataFrame(
            [(i, 100.0 if i < 50 else 1.0) for i in range(1000)]
            + [(2000, 0.0), (2001, None)],
            "doc_id long, w double",
        )
        picked = [r["doc_id"] for r in weighted_sample(df, 100, "w").collect()]
        heavy_frac = sum(1 for p in picked if p < 50) / 50
        assert heavy_frac >= 0.9  # 100x weight: (nearly) all heavies in
        assert 2000 not in picked and 2001 not in picked
        with pytest.raises(ValueError, match="n must be positive"):
            weighted_sample(df, 0, "w")


class TestLeakageSafeSplit:
    """leakage_safe_split: near-dup clusters never straddle splits;
    singletons match plain assign_split exactly."""

    @staticmethod
    def _pairs(spark, edges):
        return spark.createDataFrame(edges, "id_a long, id_b long")

    def test_cluster_members_share_split(self, spark):
        from xmidt_event_streams_spark.operators.traindata import (
            leakage_safe_split,
        )

        docs = spark.createDataFrame(
            [(i, f"doc {i}") for i in range(200)], "doc_id long, text string"
        )
        # three clusters, one a 2-hop chain (transitivity matters)
        pairs = self._pairs(
            spark, [(1, 2), (2, 3), (10, 11), (50, 51), (51, 52), (52, 53)]
        )
        out = leakage_safe_split(docs, pairs)
        split = {r["doc_id"]: r["split"] for r in out.collect()}
        for cluster in ([1, 2, 3], [10, 11], [50, 51, 52, 53]):
            assert len({split[i] for i in cluster}) == 1, cluster

    def test_singletons_identical_to_plain_split(self, spark):
        from xmidt_event_streams_spark.operators.traindata import (
            assign_split,
            leakage_safe_split,
        )

        docs = spark.createDataFrame(
            [(i, f"doc {i}") for i in range(300)], "doc_id long, text string"
        )
        pairs = self._pairs(spark, [(5, 6)])
        safe = {
            r["doc_id"]: r["split"]
            for r in leakage_safe_split(docs, pairs).collect()
        }
        plain = {
            r["doc_id"]: r["split"] for r in assign_split(docs).collect()
        }
        for i in range(300):
            if i not in (5, 6):
                assert safe[i] == plain[i], i
        assert safe[5] == safe[6]

    def test_end_to_end_with_minhash_pairs(self, spark, sf_dir):
        """The real composition: LSH candidate pairs over documents
        -> components -> leak-free split, with sane proportions."""
        from xmidt_event_streams_spark.operators.dedup import (
            minhash_lsh_candidates,
        )
        from xmidt_event_streams_spark.operators.traindata import (
            leakage_safe_split,
        )

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        pairs = minhash_lsh_candidates(docs)
        out = leakage_safe_split(docs, pairs)
        split = {r["doc_id"]: r["split"] for r in out.collect()}
        # every candidate pair co-located
        for r in pairs.collect():
            assert split[r["id_a"]] == split[r["id_b"]], (r["id_a"], r["id_b"])
        # proportions in the right ballpark (hash split, 500 docs)
        from collections import Counter

        c = Counter(split.values())
        assert c["train"] > 0.8 * len(split)
        assert set(c) <= {"train", "val", "test"}


def test_jsonl_shard_export(spark, tmp_path):
    from xmidt_event_streams_spark.operators.traindata import (
        write_training_shards,
    )

    df = spark.createDataFrame(
        [(i, f"text {i}", 2) for i in range(40)],
        "doc_id long, text string, n_tokens int",
    )
    out = tmp_path / "jsonl"
    write_training_shards(
        df, str(out), token_col="n_tokens", n_shards=2,
        output_format="jsonl",
    )
    import glob
    import json as _json

    files = glob.glob(str(out / "split=train" / "shard=*" / "*.json"))
    assert files, "no jsonl files under split=train"
    with open(files[0]) as f:
        first = _json.loads(f.readline())
    assert {"doc_id", "text", "n_tokens"} <= set(first)
    back = spark.read.json(str(out))
    assert back.count() == 40
    import pytest as _pytest

    with _pytest.raises(ValueError):
        write_training_shards(
            df, str(out), token_col="n_tokens", output_format="csv"
        )


def test_pack_sequences_tiebreak_col_is_deterministic(spark):
    """Non-unique order_col (a timestamp, say) + tiebreak_col gives
    identical pack assignment across runs/partitionings; without the
    tie-break, pack membership under ties is partition-order
    dependent (reproducible training corpora need the total order)."""
    rows = [(f"d{i}", 0, 40) for i in range(50)]
    df = spark.createDataFrame(rows, "doc_id string, ts int, n int")

    def run():
        out = pack_sequences(
            df.repartition(7),
            token_col="n",
            order_col="ts",
            budget=100,
            tiebreak_col="doc_id",
        )
        return sorted((r.doc_id, r.pack_id) for r in out.collect())

    a, b = run(), run()
    assert a == b
    # greedy contiguous fill in (ts, doc_id) order: 2 docs and then
    # the 3rd straddling doc per 100-token pack (exclusive prefix sum)
    by_pack = {}
    for doc, pid in a:
        by_pack.setdefault(pid, []).append(doc)
    assert all(len(v) <= 3 for v in by_pack.values())
