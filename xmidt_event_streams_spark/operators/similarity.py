"""Similarity search over embedding columns (array<float>).

Two tiers:

  * brute-force cosine top-k -- the exact baseline: broadcast the
    query set, score every corpus vector (narrow), per-query top-k via
    window rank (single shuffle on query id). At 100 TB the corpus
    never shuffles; queries are tiny and broadcast.
  * LSH-bucketed ANN -- random-hyperplane sign buckets (cosine LSH):
    corpus vectors get a plan-time-constant bucket key (narrow);
    queries probe their own bucket, or with ``multi_probe=True`` also
    the n_planes Hamming-1 neighbor buckets (one sign bit flipped --
    the buckets a near-neighbor most likely straddled into; recall
    rises sharply for ~(n_planes+1)x the candidate volume, still
    ~(n_planes+1)/2^n_planes of the corpus). Either way the scan is
    an equi-join on bucket key; this is the scale path (bucket count
    ~ 2^planes; data bucketed/partitioned by key on write).

Pair scoring and bucket keys use the Arrow-batched numpy kernels from
functions.vectors (one BLAS op per batch; see that module for the
determinism story). Deterministic hyperplanes are derived from md5
(seeded), so plans are reproducible run-to-run without Math.random.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from xmidt_event_streams_spark.fsutil import (
    check_sidecar_params,
    write_json_sidecar,
)
from xmidt_event_streams_spark.functions.vectors import cosine_pairs, sign_bits

_LSH_META_FILE = "_xes_lsh_index_meta.json"


class CandidatePairBudgetExceeded(RuntimeError):
    """Raised when cluster-then-verify would generate more candidate
    pairs than the caller's declared budget — the bounded-error
    alternative to an executor OOM on a corpus without cosine
    structure (one hot cell holding most of the corpus makes the
    verify join quadratic). Carries the measured numbers so callers
    can ledger them or pick a different path (MinHash banding)."""

    def __init__(
        self,
        candidate_pairs: int,
        budget: int,
        hottest_cell_n: int,
        n_rows: int,
    ) -> None:
        self.candidate_pairs = candidate_pairs
        self.budget = budget
        self.hottest_cell_n = hottest_cell_n
        self.n_rows = n_rows
        frac = hottest_cell_n / n_rows if n_rows else 0.0
        super().__init__(
            f"cluster-then-verify would generate {candidate_pairs} candidate "
            f"pairs (budget {budget}); hottest cell holds {hottest_cell_n} of "
            f"{n_rows} assignments ({frac:.1%}) — the corpus lacks cosine "
            "structure for k-cell pruning. Use the MinHash band path "
            "(minhash_lsh_candidates) or raise max_candidate_pairs."
        )


class QueryRowBudgetExceeded(RuntimeError):
    """Raised when a 'queries are small by contract' driver collect
    (brute_force_topk / ivf_topk / probe_ivf_index query vectors)
    would materialize more rows than the declared budget -- the
    bounded-error alternative to a silent driver OOM when the
    contract is violated (r10 VERDICT #6; same posture as
    :class:`CandidatePairBudgetExceeded`)."""

    def __init__(self, budget: int) -> None:
        self.budget = budget
        super().__init__(
            f"query side exceeds the {budget}-row driver-materialization "
            "budget: the top-k kernels ship query vectors in the task "
            "closure and cannot hold a corpus-sized query set on the "
            "driver. Partition the query set, or raise max_query_rows "
            "if the driver genuinely has the memory."
        )


def collect_query_rows(queries: DataFrame, max_query_rows: int = 100_000):
    """Bounded driver-side materialization of a (small by contract)
    query relation: ``limit(budget+1).collect()`` so the driver never
    holds more than budget+1 rows, then a typed
    :class:`QueryRowBudgetExceeded` if the budget is exceeded. Row
    order is not guaranteed (callers feed joins/windows, which are
    order-insensitive)."""
    rows = queries.limit(max_query_rows + 1).collect()
    if len(rows) > max_query_rows:
        raise QueryRowBudgetExceeded(max_query_rows)
    return rows


def measure_candidate_pairs(cells: DataFrame) -> tuple[int, int, int]:
    """One cheap hash-agg over the (id, cell) assignment relation:
    returns (sum over cells of n*(n-1)/2, hottest-cell count, total
    assignments). The pair sum is exactly the verify join's pre-
    ``distinct`` candidate volume, so it is the number to budget —
    computed BEFORE the join ever runs, for the cost of one count-by-
    key agg (map-side partials, one scalar row to the driver)."""
    row = (
        cells.groupBy("cell")
        .count()
        .agg(
            F.sum(
                (F.col("count") * (F.col("count") - 1) / 2).cast("bigint")
            ).alias("pairs"),
            F.max("count").alias("hottest"),
            F.sum("count").alias("total"),
        )
        .collect()[0]
    )
    return int(row["pairs"] or 0), int(row["hottest"] or 0), int(row["total"] or 0)


def deterministic_planes(n_planes: int, dim: int, seed: str = "xes") -> list[list[float]]:
    """Pseudo-random hyperplanes from md5(seed|plane|chunk): uniform
    in [-1, 1), reproducible everywhere, no RNG state."""
    planes = []
    for p in range(n_planes):
        vals: list[float] = []
        chunk = 0
        while len(vals) < dim:
            h = hashlib.md5(f"{seed}|{p}|{chunk}".encode()).hexdigest()
            for i in range(0, 32, 8):
                if len(vals) >= dim:
                    break
                u = int(h[i : i + 8], 16) / 0xFFFFFFFF  # [0,1]
                vals.append(2.0 * u - 1.0)
            chunk += 1
        planes.append(vals)
    return planes


def _topk_by_query(scored: DataFrame, k: int, query_id_col: str, id_col: str) -> DataFrame:
    """Per-query top-k: shuffle only the scored pairs (query_id, id,
    sim) -- never the vectors -- then window rank."""
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cos_sim").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "cos_sim", "rank")
    )


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact cosine top-k per query. ``queries`` must be small (their
    vectors ride the kernel closure -- same contract as the index
    probes). Ties broken by corpus id (deterministic). Self-matches
    (same id) excluded. Scores rounded to 6dp for engine-portable
    comparison.

    Scale shape: one narrow mapInPandas over the corpus -- a BLAS
    matmul per Arrow batch against the query matrix, folding a
    PARTIAL top-k per query inside each partition (kept by the same
    (rounded score desc, id asc) order the final window uses, so
    boundary ties are preserved). The rank-window exchange then
    carries O(partitions x queries x k) rows; the previous
    join-then-window shape shuffled every scored (corpus x query)
    pair, which at 100 TB is a corpus-sized-times-queries shuffle.
    Null / dim-mismatched corpus vectors are excluded from results
    (they carry no comparable signal; same poison-row posture as the
    PQ scan's null codes)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    qrows = collect_query_rows(queries.select(F.col(id_col), F.col(vec_col)))
    qids = [int(r[0]) for r in qrows]
    qmat = np.asarray([list(r[1]) for r in qrows], dtype=np.float64)
    dim = qmat.shape[1] if len(qrows) else 0
    qnorm = np.sqrt((qmat * qmat).sum(axis=1))

    out_schema = StructType(
        [
            StructField(query_id_col, LongType()),
            StructField(id_col, LongType()),
            StructField("cos_sim", DoubleType()),
        ]
    )

    def _score(batches):
        best: dict = {}
        for pdf in batches:
            if len(pdf) == 0:
                continue
            vecs = pdf[vec_col].tolist()
            valid = np.array(
                [v is not None and len(v) == dim for v in vecs], dtype=bool
            )
            if not valid.any():
                continue
            idx = np.nonzero(valid)[0]
            mat = np.vstack([vecs[i] for i in idx]).astype(np.float64)
            ids = pdf[id_col].to_numpy()[idx]
            num = mat @ qmat.T
            den = np.sqrt((mat * mat).sum(axis=1))[:, None] * qnorm[None, :]
            sims = np.round(
                np.where(den > 0, num / np.where(den > 0, den, 1.0), 0.0), 6
            )
            for j, qid in enumerate(qids):
                mask = ids != qid
                s, i_ = sims[mask, j], ids[mask]
                if qid in best:
                    s = np.concatenate([best[qid][1], s])
                    i_ = np.concatenate([best[qid][0], i_])
                if len(s) > k:
                    keep = np.lexsort((i_, -s))[:k]
                    s, i_ = s[keep], i_[keep]
                best[qid] = (i_, s)
        for qid, (i_, s) in best.items():
            yield pd.DataFrame(
                {
                    query_id_col: np.full(len(i_), qid, dtype=np.int64),
                    id_col: i_,
                    "cos_sim": s,
                }
            )

    scored = corpus.select(id_col, vec_col).mapInPandas(_score, out_schema)
    return _topk_by_query(scored, k, query_id_col, id_col)


def lsh_bucket(
    df: DataFrame,
    n_planes: int = 8,
    dim: int = 64,
    vec_col: str = "embedding",
    bucket_col: str = "bucket",
    seed: str = "xes",
) -> DataFrame:
    """Attach the cosine-LSH sign-bucket key (narrow transformation)."""
    planes = deterministic_planes(n_planes, dim, seed)
    return df.withColumn(bucket_col, sign_bits(vec_col, planes))


def _sign_bits_driver(vecs, planes) -> list[str]:
    """Driver-side twin of functions.vectors.sign_bits (same >= 0
    sign rule) for the collected query set: bucket bitstrings used to
    compute the PLAN-TIME partition IN-list."""
    import numpy as np

    m = np.asarray(vecs, dtype=np.float64)
    pm = np.asarray(planes, dtype=np.float64)
    signs = m @ pm.T >= 0
    return ["".join("1" if b else "0" for b in row) for row in signs]


def _probe_buckets(bits, n_planes: int):
    """The query's probe set: its exact bucket plus the ``n_planes``
    Hamming-1 neighbors (each one sign bit flipped). A true near
    neighbor that landed one hyperplane-side away is in exactly one of
    these; each corpus vector lives in ONE bucket, so the exploded
    probe join produces no duplicate (query, id) pairs."""
    variants = [bits]
    for i in range(n_planes):
        flipped = F.when(
            F.substring(bits, i + 1, 1) == "0", F.lit("1")
        ).otherwise(F.lit("0"))
        variants.append(
            F.concat(
                F.substring(bits, 1, i),
                flipped,
                F.substring(bits, i + 2, n_planes - i - 1),
            )
        )
    return F.array(*variants)


def write_lsh_index(
    df: DataFrame,
    path: str,
    n_planes: int = 8,
    dim: int = 64,
    vec_col: str = "embedding",
    seed: str = "xes",
) -> None:
    """Materialize the ANN index: corpus written PARTITIONED BY its
    LSH sign bucket. This turns the docstring claim into a layout:
    probing a bucket becomes directory pruning at the scan (the plan
    carries ``PartitionFilters`` on ``bucket`` and touches only the
    probed directories), so a query reads ~1/2^n_planes of a 100 TB
    corpus with zero shuffle and zero full-scan.

    One shuffle at write time (repartition by bucket, one writer task
    per bucket -- no small-file explosion); the probe-side reader is
    :func:`probe_lsh_index`. The bucket key is stored as a BIGINT
    (binary value of the sign bits): partition-directory values are
    type-inferred on read, and an integer key survives that losslessly
    where a '01...' bitstring would drop leading zeros.
    """
    (
        lsh_bucket(df, n_planes, dim, vec_col, seed=seed)
        .withColumn("bucket", F.conv("bucket", 2, 10).cast("bigint"))
        .repartition(F.col("bucket"))
        .write.partitionBy("bucket")
        .mode("overwrite")
        .parquet(path)
    )
    # parameter sidecar (fsutil): a probe with a different plane
    # count/seed computes different bucket keys and silently finds
    # NOTHING -- stamp the hash parameters so it raises instead
    write_json_sidecar(
        df.sparkSession,
        path,
        _LSH_META_FILE,
        {"n_planes": n_planes, "dim": dim, "seed": seed},
    )
    # bucket -> data-files manifest (ivf.refresh_files_manifest, the
    # shared vector-index pattern): probes open the probed buckets'
    # files directly, so no directory listing -- and no listing Spark
    # job -- precedes the scan (at 2^n_planes = 256 bucket dirs the
    # root listing crossed the parallel-discovery threshold and ran
    # as a per-probe job)
    from xmidt_event_streams_spark.operators.ivf import (
        refresh_files_manifest,
    )

    refresh_files_manifest(df.sparkSession, path, part_col="bucket")


def probe_lsh_index(
    spark,
    path: str,
    queries: DataFrame,
    k: int = 10,
    n_planes: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    seed: str = "xes",
    multi_probe: bool = False,
) -> DataFrame:
    """ANN top-k against a materialized LSH index with PLAN-TIME
    partition pruning: the query set is small by contract (it is
    broadcast for scoring anyway), so its vectors are collected once
    and bucket keys computed driver-side -- the probed bucket set
    rides the scan as a static ``PartitionFilters`` IN-list
    (pytest-asserted), and only those directories are ever read or
    scored. Plan-time pruning is used because dynamic partition
    pruning does NOT trigger here (measured: the nondeterministic-
    marked Arrow bucket kernel on the probe side blocks the DPP
    subquery, leaving PartitionFilters = [isnotnull] -- a full-index
    scan). Same rationale as ivf.probe_ivf_index. ``multi_probe``
    widens each query to its Hamming-1 neighbor buckets --
    (n_planes+1) pruned directories instead of 1."""
    check_sidecar_params(
        spark,
        path,
        _LSH_META_FILE,
        {"n_planes": n_planes, "dim": dim, "seed": seed},
        "LSH index",
    )
    planes = deterministic_planes(n_planes, dim, seed)
    qvecs = [
        r[1]
        for r in queries.select(
            F.col(id_col), F.col(vec_col).cast("array<double>")
        ).collect()
    ]
    base_bits = _sign_bits_driver(qvecs, planes)
    probed_bits = set(base_bits)
    if multi_probe:
        for bits in base_bits:
            for i in range(n_planes):
                flipped = "1" if bits[i] == "0" else "0"
                probed_bits.add(bits[:i] + flipped + bits[i + 1 :])
    probed = sorted(int(b, 2) for b in probed_bits)
    # manifest read (ivf.read_probed_cells, part_col="bucket"): the
    # probed buckets' data files open directly -- the root read
    # previously LISTED all 2^n_planes bucket dirs before pruning, a
    # per-probe Spark job above the discovery threshold; foreign
    # (manifest-less) indexes fall back to probed-leaf-dir reads
    from xmidt_event_streams_spark.operators.ivf import (
        read_probed_cells,
    )

    corpus = read_probed_cells(
        spark, path, probed, part_col="bucket"
    ).filter(F.col("bucket").isin(probed))
    qb = lsh_bucket(
        queries.select(
            F.col(id_col).alias(query_id_col), F.col(vec_col).alias("_qvec")
        ),
        n_planes,
        dim,
        "_qvec",
        bucket_col="_qbucket",
        seed=seed,
    )
    if multi_probe:
        qb = qb.withColumn(
            "_qbucket", F.explode(_probe_buckets(F.col("_qbucket"), n_planes))
        )
    qb = qb.withColumn("_qbucket", F.conv("_qbucket", 2, 10).cast("bigint"))
    scored = corpus.join(
        F.broadcast(qb),
        (F.col("bucket") == F.col("_qbucket"))
        & (F.col(id_col) != F.col(query_id_col)),
    ).select(
        F.col(query_id_col),
        F.col(id_col),
        F.round(cosine_pairs(vec_col, "_qvec"), 6).alias("cos_sim"),
    )
    return _topk_by_query(scored, k, query_id_col, id_col)


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_planes: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    multi_probe: bool = False,
) -> DataFrame:
    """ANN top-k: score only corpus vectors in the query's bucket --
    plus, with ``multi_probe=True``, its Hamming-1 neighbor buckets
    (recall-lift assertion: tests/test_msgpack_asof.py).

    Recall < 1.0 by construction; raise recall with fewer planes or
    multi-probe. The join is an equi-join on bucket key -- at scale,
    bucket-partition the corpus on write and the probe is a pruned
    scan, no shuffle of the big side.
    """
    cb = lsh_bucket(corpus, n_planes, dim, vec_col)
    qb = lsh_bucket(
        queries.select(F.col(id_col).alias(query_id_col), F.col(vec_col).alias("_qvec")),
        n_planes,
        dim,
        "_qvec",
        bucket_col="_qbucket",
    )
    if multi_probe:
        qb = qb.withColumn(
            "_qbucket", F.explode(_probe_buckets(F.col("_qbucket"), n_planes))
        )
    scored = cb.join(
        F.broadcast(qb),
        (F.col("bucket") == F.col("_qbucket")) & (F.col(id_col) != F.col(query_id_col)),
    ).select(
        F.col(query_id_col),
        F.col(id_col),
        F.round(cosine_pairs(vec_col, "_qvec"), 6).alias("cos_sim"),
    )
    return _topk_by_query(scored, k, query_id_col, id_col)


def clustered_near_dup_pairs(
    df: DataFrame,
    centroids: list[list[float]],
    threshold: float,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_candidate_pairs: int | None = None,
) -> DataFrame:
    """Sub-quadratic near-duplicate pairs: cluster-then-verify
    (the SemDeDup shape -- Abbas et al. 2023, arXiv:2303.09540:
    k-means-cluster the corpus, compare only within clusters).

    Each vector multi-assigns to its ``n_probe`` nearest coarse cells
    (narrow Arrow matmul against the plan-time-constant centroid
    matrix -- functions.vectors.nearest_cells), candidates are pairs
    sharing >= 1 cell (shuffle-hash equi-join on cell; at 100 TB the
    corpus is written partitioned by primary cell and co-located), and
    each candidate is exact-verified with the cosine kernel. No
    nested-loop join anywhere; candidate volume is sum over cells of
    n_cell^2, bounded by growing ``len(centroids)`` ~ sqrt(n) and by
    AQE skew splitting for hot cells.

    Recall < 1 by construction (a pair straddling cell sets is
    missed); it rises with n_probe and centroid quality (use
    operators.ivf.kmeans_fit for learned cells). Exact results:
    brute-force via the ``exact`` arm of the catalog query.

    Output: (id_a, id_b, cos_sim) with id_a < id_b, cos_sim rounded
    to 6dp, >= threshold.

    ``max_candidate_pairs`` enforces the degeneracy guard: before the
    verify join, one cheap per-cell count agg measures the exact
    pre-distinct candidate volume; over budget raises
    :class:`CandidatePairBudgetExceeded` (with the measured numbers)
    instead of letting the join go quadratic and OOM an executor. The
    extra cost is one count-by-key agg over the assignment relation.
    """
    from xmidt_event_streams_spark.functions.vectors import nearest_cells

    cells = df.select(
        F.col(id_col),
        F.col(vec_col),
        F.explode(nearest_cells(vec_col, centroids, n_probe)).alias("cell"),
    )
    if max_candidate_pairs is not None:
        n_pairs, hottest, total = measure_candidate_pairs(
            cells.select(id_col, "cell")
        )
        if n_pairs > max_candidate_pairs:
            raise CandidatePairBudgetExceeded(
                n_pairs, max_candidate_pairs, hottest, total
            )
    a = cells.select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("_va"), "cell"
    )
    b = cells.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("_vb"), "cell"
    )
    return (
        a.hint("shuffle_hash")
        .join(b, "cell")
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.round(cosine_pairs("_va", "_vb"), 6).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
        .distinct()  # a pair may share several probed cells
    )


def centroids_by(
    df: DataFrame,
    group_col: str = "label",
    vec_col: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """Per-group centroid via posexplode + groupBy(group, dim) + avg +
    re-assemble. Two shuffles total (dim-expanded agg then collect per
    group); at scale prefer this over any driver-side loop.
    Output: (group, centroid array<double>)."""
    exploded = df.select(
        F.col(group_col), F.posexplode(F.col(vec_col).cast("array<double>"))
    )
    per_dim = exploded.groupBy(group_col, "pos").agg(F.avg("col").alias("v"))
    return (
        per_dim.groupBy(group_col)
        .agg(F.array_sort(F.collect_list(F.struct("pos", "v"))).alias("pv"))
        .select(
            F.col(group_col),
            F.transform("pv", lambda s: s["v"]).alias("centroid"),
        )
    )
