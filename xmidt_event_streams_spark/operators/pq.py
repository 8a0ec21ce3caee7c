"""Product quantization (PQ): compressed-domain ANN for 100 TB
embedding corpora.

Brute-force and IVF ANN (operators/similarity.py, operators/ivf.py)
still read full float vectors: a 1e11-row corpus of 64-dim float32 is
~25 TB of vector payload per scan. PQ (Jegou, Douze, Schmid,
"Product Quantization for Nearest Neighbor Search", TPAMI 2011 --
implemented from the published formulation) splits each vector into
``m`` subvectors, k-means-quantizes each subspace independently, and
stores only the ``m`` one-byte code indices: 64-dim float32 -> 8
bytes at m=8 (32x). Search runs in the compressed domain via ADC
(asymmetric distance computation): per query, an m x k lookup table
of exact subquery-to-centroid distances; a corpus row's approximate
distance is the sum of m table lookups -- no float vectors touched
at scan time.

Spark shapes (all corpus-scale steps stay on executors):
  * fit: per Lloyd round ONE narrow Arrow encode (all m subspaces in
    one kernel) + ONE (m x k x dsub)-bounded aggregate -- the same
    plan family as ivf.kmeans_fit; the driver holds only the
    codebooks (m*k*dsub floats).
  * encode: narrow Arrow projection -> ``array<int>`` codes column,
    written next to the id as the compact index.
  * search: queries are small-by-contract (same contract as
    ivf.probe_ivf_index) -- LUTs are computed driver-side from the
    raw query vectors and closure-broadcast; the corpus codes scan
    is embarrassingly parallel and never shuffles; top-k via the
    usual rank window.

At 100 TB, compose with IVF: coarse cells prune the scan, PQ codes
shrink what remains (IVF-ADC). The composition is a filter on the
cell column before pq_topk -- both operators already speak the same
(id, vec/codes) schema.

OPERATING-POINT CAVEAT (measured, r7-r8 bench): FLAT PQ at
aggressive compression (8 bytes/row) is a BASELINE, not a production
path. On a corpus with dense clusters (thousands of near neighbors
inside one subspace quantization step) absolute-code ADC cannot
separate true mates from cluster peers -- recall@10 measured 0.17 at
2M rows -- and the refine stage cannot fix it (rerank re-orders the
shortlist; it cannot recover neighbors the shortlist never
contained: 0.43 after rerank at C=96). Residual IVF-PQ
(operators/ivfpq.py) holds ~0.92 at the SAME bytes/row because its
codes spend their resolution inside the cell (Jegou et al. 2011
§IV). Use this module directly only on corpora known to be
near-uniform, or as the measured contrast motivating the
composition. When the miss is AXIS-ALIGNMENT rather than cluster
density (variance mixed/concentrated across the fixed subspace
blocks), the learned-rotation variant (operators/opq.py, Ge et al.
CVPR 2013) recovers it at the same bytes/row -- measured ~3x
recall@10 on a variance-mixed corpus (tests/test_opq.py).
"""

from __future__ import annotations

from typing import Iterator, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

from xmidt_event_streams_spark.functions.vectors import _stack_masked


def _as_codebooks(raw) -> np.ndarray:
    """(m, k, dsub) float64 array from nested lists."""
    cb = np.asarray(raw, dtype=np.float64)
    if cb.ndim != 3:
        raise ValueError(f"codebooks must be (m, k, dsub), got {cb.shape}")
    return cb


def _encode_block(mat: np.ndarray, cb: np.ndarray) -> np.ndarray:
    """(n, dim) -> (n, m) argmin-L2 codes. Ties break to the lowest
    code (np.argmin), mirroring nearest_cells' lowest-cell contract."""
    n = mat.shape[0]
    m, k, dsub = cb.shape
    sub = mat.reshape(n, m, dsub)
    # squared L2 per subspace: ||x||^2 - 2 x.c + ||c||^2 ; the x^2
    # term is constant per row and cannot change the argmin
    dots = np.einsum("nmd,mkd->nmk", sub, cb)
    c2 = np.einsum("mkd,mkd->mk", cb, cb)
    return np.argmin(c2[None, :, :] - 2.0 * dots, axis=2).astype(np.int32)


def pq_encode(
    df: DataFrame,
    codebooks: Sequence[Sequence[Sequence[float]]],
    vec_col: str = "embedding",
    codes_col: str = "codes",
) -> DataFrame:
    """Append the ``array<int>`` PQ codes column (narrow Arrow
    projection; null/ragged vectors yield null codes)."""
    cb = _as_codebooks(codebooks)
    dim = cb.shape[0] * cb.shape[2]

    @F.pandas_udf(ArrayType(IntegerType()))
    def _codes(v: pd.Series) -> pd.Series:
        if len(v) == 0:
            return pd.Series([], dtype="object")
        mat, valid = _stack_masked(v, dim)
        out = pd.Series([None] * len(v), dtype="object")
        if mat.shape[0]:
            out.iloc[np.nonzero(valid)[0]] = list(_encode_block(mat, cb))
        return out

    # see vectors.cosine_pairs: deterministic result, but blocks
    # Catalyst from duplicating the kernel under pushed-down filters
    return df.withColumn(
        codes_col,
        _codes.asNondeterministic()(F.col(vec_col).cast("array<double>")),
    )


def pq_fit(
    df: DataFrame,
    m: int = 8,
    k: int = 16,
    n_iters: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> list[list[list[float]]]:
    """Distributed L2 Lloyd fit of all ``m`` subspace codebooks in
    one pass per round. Init = subvectors of the first ``k`` rows by
    id (deterministic); a cell that loses all members keeps its
    previous centroid. Returns (m, k, dsub) nested lists.

    Per round: one narrow encode of every row (single Arrow kernel
    covers all m subspaces), then one aggregate keyed by (subspace,
    cell, dim-in-subspace) -- m*k*dsub output rows regardless of
    corpus size, so the driver never holds data-sized state. For a
    100 TB corpus fit on a sample (deterministic md5 bucket, as
    neardup_centroids does): the codebooks are k*m*dsub floats either
    way and assignment quality converges long before full-corpus
    coverage."""
    first = (
        df.orderBy(id_col)
        .limit(k)
        .select(F.col(vec_col).cast("array<double>"))
        .collect()
    )
    if len(first) < k:
        raise ValueError(f"need at least k={k} rows to initialize")
    dim = len(first[0][0])
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    dsub = dim // m
    init = np.asarray([r[0] for r in first], dtype=np.float64)
    cb = np.transpose(init.reshape(k, m, dsub), (1, 0, 2)).copy()

    # ragged/null vectors get null codes from the encode kernel, but
    # posexplode would still emit their values with a NULL cell --
    # and numpy interprets a None index as np.newaxis, silently
    # corrupting the codebook in the update loop. Fit only on
    # well-formed rows.
    vecs = df.select(
        F.col(vec_col).cast("array<double>").alias("_v")
    ).filter(F.size("_v") == dim)
    for _ in range(n_iters):
        coded = pq_encode(vecs, cb.tolist(), "_v", "_codes")
        per_dim = (
            coded.select(F.posexplode("_v").alias("pos", "val"), "_codes")
            .select(
                (F.col("pos") / dsub).cast("int").alias("sub"),
                (F.col("pos") % dsub).alias("dpos"),
                F.expr(f"_codes[CAST(pos / {dsub} AS INT)]").alias("cell"),
                "val",
            )
            .groupBy("sub", "cell", "dpos")
            .agg(F.avg("val").alias("mean"))
            .collect()
        )
        for row in per_dim:
            if row["cell"] is None:  # unreachable post-filter; guard
                continue             # against None-as-np.newaxis
            cb[row["sub"], row["cell"], row["dpos"]] = row["mean"]
    return cb.tolist()


# Above this many candidate-set floats (C * n_queries * dim) the
# refine switches from the driver-side numpy path to the distributed
# join path. 4M doubles = 32 MB -- the same order as a broadcast
# threshold, which is exactly the regime boundary it marks.
_DRIVER_REFINE_MAX_FLOATS = 4_000_000


def keep_top_by_dist_id(
    ids: np.ndarray, d: np.ndarray, n_short: int, return_index: bool = False
):
    """The EXACT top-``n_short`` by (distance, id) -- identical
    winners to a full ``lexsort((ids, d))[:n_short]``, at O(n)
    instead of O(n log n): argpartition selects by distance alone,
    then every row at the boundary distance is re-included so id
    tie-breaks cannot drop a winner, and only that small superset is
    lexsorted. This fold runs per (query, Arrow batch) in the ADC
    scans; the full lexsort was ~30% of scan kernel time at 64-query
    batches.

    ``return_index=True`` additionally returns the kept positions
    into the INPUT arrays (ids[idx] == kept ids, same order) -- the
    refine-payload fold gathers its side arrays (SQ8 bytes, affine
    bounds) with the same selection without re-deriving the tie
    logic."""
    if len(d) <= n_short:
        keep = np.arange(len(d))
        return (ids, d, keep) if return_index else (ids, d)
    nan = np.isnan(d)
    if nan.any():
        # a NaN dmax breaks the boundary test (d <= NaN selects
        # NOTHING — the fold would silently return zero candidates
        # where lexsort kept n_short). lexsort orders NaN distances
        # LAST, id-ascending among themselves (stable secondary key),
        # so: winners are the non-NaN rows first, NaN rows fill any
        # remainder in id order — reproduced here exactly.
        good = np.nonzero(~nan)[0]
        if len(good) >= n_short:
            kept_ids, kept_d, sub = keep_top_by_dist_id(
                ids[good], d[good], n_short, return_index=True
            )
            if return_index:
                return kept_ids, kept_d, good[sub]
            return kept_ids, kept_d
        bad = np.nonzero(nan)[0]
        fill = bad[np.argsort(ids[bad], kind="stable")][
            : n_short - len(good)
        ]
        keep = np.concatenate(
            [good[np.lexsort((ids[good], d[good]))], fill]
        )
        if return_index:
            return ids[keep], d[keep], keep
        return ids[keep], d[keep]
    part = np.argpartition(d, n_short - 1)[:n_short]
    dmax = d[part].max()
    sel = np.nonzero(d <= dmax)[0]
    keep = sel[np.lexsort((ids[sel], d[sel]))[:n_short]]
    if return_index:
        return ids[keep], d[keep], keep
    return ids[keep], d[keep]


def exact_rerank_l2(
    candidates: DataFrame,
    vectors: DataFrame,
    queries: list[tuple[int, list[float]]],
    k_neighbors: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """The refine stage (Jegou et al. TPAMI 2011 §V: re-rank the
    short-list with exact distances): given the ADC top-C candidate
    relation (query_id, id, adc_dist), fetch those C*n_queries exact
    vectors and re-score them with true squared L2, returning the
    exact-ranked top ``k_neighbors``. This is the standard, cheap fix
    for ADC's quantization error: recall@k becomes recall@C of the
    compressed scan (C >> k), at the cost of C*dim floats per query.

    Scale shape: the candidate relation is tiny by construction
    (C x n_queries rows -- queries are small-by-contract, like the
    rest of the probe family), so it is collected once and its id set
    drives ``fetch.fetch_by_ids``: gap-coalesced id RANGES pushed to
    the parquet scan (row-group pruning on id-sorted stores -- the
    write-side contract of this package's vector writers) plus a
    broadcast semi-join for exactness. The fetch reads ~C*n_queries
    rows of (id, vec), not the corpus, with an O(64)-node plan
    regardless of the candidate count (a literal IN list at C x
    n_queries = thousands of ids cost seconds of analysis and, past
    parquet's in-filter pushdown threshold, pruned NOTHING -- the
    r6-measured rerank-slower-than-brute failure). The corpus never
    shuffles.

    Two re-score paths, switched on candidate-set volume:

      * <= ~32 MB of candidate vectors (the common probe: tens of
        queries x C in the hundreds): the fetched vectors come back
        to the driver and the C*k re-score is one numpy pass -- the
        same posture as the LUTs, which are already driver-built.
        One Spark job total (the pruned fetch).
      * above that (bulk query batches): distributed -- broadcast the
        candidate relation against the pruned fetch, exact L2 as pure
        JVM zip_with/aggregate, one rank window on (query_id).

    Both paths return the same relation: query_id, id, adc_dist,
    exact_dist, rank (ascending exact_dist = nearest; ties to the
    lower id)."""
    spark = candidates.sparkSession
    dim = len(queries[0][1]) if queries else 0
    from xmidt_event_streams_spark.operators.fetch import (
        arrow_collect_pandas,
        fetch_by_ids,
        ranged_scan,
    )

    cand_rows = candidates.select("query_id", id_col, "adc_dist").collect()
    cand_ids = sorted({r[id_col] for r in cand_rows})

    def _sel(df):
        return df.select(
            F.col(id_col), F.col(vec_col).cast("array<double>").alias("_cvec")
        )

    if len(cand_rows) * dim <= _DRIVER_REFINE_MAX_FLOATS:
        # driver path: ONE pushed-range scan + Arrow collect when the
        # cover is tight (the id-keyed vmap ignores in-gap rows for
        # free, so the semi-join stage is skipped entirely); loose
        # covers fall back to the exact fetch
        ranged = ranged_scan(vectors, cand_ids, id_col=id_col)
        pdf = arrow_collect_pandas(
            _sel(
                ranged
                if ranged is not None
                else fetch_by_ids(vectors, cand_ids, id_col=id_col)
            )
        )
        pdf = pdf[pdf["_cvec"].notna()]
        vmap = {
            i: np.asarray(v, dtype=np.float64)
            for i, v in zip(pdf[id_col], pdf["_cvec"])
        }
        qmap = {
            int(qid): np.asarray(qv, dtype=np.float64) for qid, qv in queries
        }
        per_q: dict[int, list] = {}
        for r in cand_rows:
            v = vmap.get(r[id_col])
            if v is None:  # candidate without a stored vector: skip
                continue
            d = float(((v - qmap[int(r["query_id"])]) ** 2).sum())
            per_q.setdefault(int(r["query_id"]), []).append(
                (round(d, 6), int(r[id_col]), float(r["adc_dist"]))
            )
        out = []
        for qid in sorted(per_q):
            ranked = sorted(per_q[qid])[:k_neighbors]
            out.extend(
                (qid, cid, adc, d, rk + 1)
                for rk, (d, cid, adc) in enumerate(ranked)
            )
        return spark.createDataFrame(
            out,
            f"query_id long, {id_col} long, adc_dist double, "
            "exact_dist double, rank int",
        )

    cand = spark.createDataFrame(
        [(r["query_id"], r[id_col], r["adc_dist"]) for r in cand_rows],
        f"query_id long, {id_col} long, adc_dist double",
    )
    fetched = _sel(fetch_by_ids(vectors, cand_ids, id_col=id_col))
    exact = (
        fetched.join(F.broadcast(cand), id_col)
        .join(
            F.broadcast(
                spark.createDataFrame(
                    [(int(q), [float(x) for x in v]) for q, v in queries],
                    "query_id long, _qvec array<double>",
                )
            ),
            "query_id",
        )
        .select(
            "query_id",
            F.col(id_col),
            "adc_dist",
            F.round(
                F.aggregate(
                    F.zip_with("_cvec", "_qvec", lambda x, y: (x - y) * (x - y)),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                ),
                6,
            ).alias("exact_dist"),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(
        F.col("exact_dist").asc(), F.col(id_col).asc()
    )
    return (
        exact.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k_neighbors)
        .select("query_id", id_col, "adc_dist", "exact_dist", "rank")
    )


def pq_topk(
    corpus_codes: DataFrame,
    queries: list[tuple[int, list[float]]],
    codebooks: Sequence[Sequence[Sequence[float]]],
    k_neighbors: int = 10,
    id_col: str = "vec_id",
    codes_col: str = "codes",
    rerank: int | None = None,
    vectors: DataFrame | None = None,
    vec_col: str = "embedding",
) -> DataFrame:
    """ADC top-k in the compressed domain.

    ``queries`` is a small-by-contract driver-side list of
    (query_id, raw_vector) -- the same contract as
    ivf.probe_ivf_index. LUTs (one m x k exact subdistance table per
    query) are numpy-built here and closure-broadcast; the corpus
    codes scan emits (query_id, vec_id, approx_dist) without
    shuffling, then one rank window takes the top k per query.
    Output: query_id, vec_id, adc_dist (ascending = nearest).

    ``rerank=C`` adds the refine stage (exact_rerank_l2): the ADC
    scan short-lists C >> k candidates, which are exact-re-scored
    against ``vectors`` (the raw (id, vec) relation -- required) and
    the output gains an ``exact_dist`` column, ranked by it. Use when
    the codebook resolution alone leaves recall short."""
    cb = _as_codebooks(codebooks)
    m, kcb, dsub = cb.shape
    if not queries:  # an empty probe batch is an empty result
        extra = "" if rerank is None else " exact_dist double,"
        return corpus_codes.sparkSession.createDataFrame(
            [],
            f"query_id long, {id_col} long, adc_dist double,{extra} "
            "rank int",
        )
    qids = np.asarray([int(qid) for qid, _ in queries], dtype=np.int64)
    # LUT tensor (m, k, n_queries): one gather PER SUBSPACE scores the
    # whole batch of queries at once (T[j][codes[:, j]] -> (rows, nq));
    # the per-query loop it replaces did n_queries x m tiny gathers
    # per Arrow batch and dominated the scan at 64-query batches
    lut_t = np.stack(
        [
            ((cb - np.asarray(qv, dtype=np.float64).reshape(m, 1, dsub))
             ** 2).sum(axis=2)
            for _, qv in queries
        ],
        axis=2,
    )

    out_schema = StructType(
        [
            StructField("query_id", LongType()),
            StructField(id_col, LongType()),
            StructField("adc_dist", DoubleType()),
        ]
    )

    n_short = k_neighbors if rerank is None else max(rerank, k_neighbors)

    def _score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # map-side partial top-k (the WindowGroupLimit idea, applied
        # inside the kernel): each partition keeps only its n_short
        # best rows per query, so the rank-window exchange carries
        # O(partitions x queries x C) rows instead of every scored
        # (query, row) pair -- at 2M rows x 8 queries that is the
        # difference between ~10^3 and 16M shuffled rows.
        best: dict[int, tuple[np.ndarray, np.ndarray]] = {}
        for pdf in batches:
            if len(pdf) == 0:
                continue
            codes = np.stack(pdf[codes_col].to_numpy()).astype(np.int64)
            ids = pdf[id_col].to_numpy()
            # (rows, nq) accumulated over the m subspaces -- m gathers
            # total for the whole query batch
            dall = lut_t[0][codes[:, 0]]
            for j in range(1, m):
                dall = dall + lut_t[j][codes[:, j]]
            for qi in range(len(qids)):
                qid = int(qids[qi])
                d = dall[:, qi]
                if qid in best:
                    d = np.concatenate([best[qid][1], d])
                    cur_ids = np.concatenate([best[qid][0], ids])
                else:
                    cur_ids = ids
                # ties at the cut resolved later by the exact
                # (dist, id) rank window -- keep_top_by_dist_id
                # preserves exactly the window's winners
                cur_ids, d = keep_top_by_dist_id(cur_ids, d, n_short)
                best[qid] = (cur_ids, d)
        for qid, (ids_, d_) in best.items():
            yield pd.DataFrame(
                {
                    "query_id": np.full(len(ids_), qid, dtype=np.int64),
                    id_col: ids_,
                    "adc_dist": d_,
                }
            )

    # null codes are pq_encode's poison-row containment (null/ragged
    # vectors) -- they carry no searchable signal and a null cell
    # inside np.stack would kill the task, so they are excluded here,
    # not just at encode time
    scored = (
        corpus_codes.select(id_col, codes_col)
        .filter(F.col(codes_col).isNotNull())
        .mapInPandas(_score, out_schema)
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(
        F.col("adc_dist").asc(), F.col(id_col).asc()
    )
    adc_top = (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= n_short)
        .select("query_id", id_col, F.round("adc_dist", 6).alias("adc_dist"), "rank")
    )
    if rerank is None:
        return adc_top
    if vectors is None:
        raise ValueError(
            "rerank requires the raw-vector relation (vectors=) to re-score"
        )
    return exact_rerank_l2(
        adc_top, vectors, queries, k_neighbors, id_col=id_col, vec_col=vec_col
    )


_PQ_META_FILE = "_xes_pq_index_meta.json"


def write_pq_index(
    df: DataFrame,
    path: str,
    codebooks: Sequence[Sequence[Sequence[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Materialize the compressed index: (id, codes) parquet with the
    CODEBOOKS stamped in a JSON sidecar (fsutil, Hadoop FS --
    object-store safe, same contract as the LSH/IVF/MinHash indexes).
    Codes are meaningless under any other codebooks, so probes load
    the stamped set (or verify a supplied one) instead of silently
    computing garbage distances. The stored relation is m ints per
    row -- the 16-32x I/O shrink is what the 100 TB scan reads."""
    from xmidt_event_streams_spark.fsutil import write_json_sidecar

    cb = _as_codebooks(codebooks)
    pq_encode(df, codebooks, vec_col).select(id_col, "codes").write.mode(
        "overwrite"
    ).parquet(path)
    write_json_sidecar(
        df.sparkSession,
        path,
        _PQ_META_FILE,
        {
            "codebooks": cb.tolist(),
            "m": int(cb.shape[0]),
            "k": int(cb.shape[1]),
            "dsub": int(cb.shape[2]),
            "id_col": id_col,
        },
    )


def probe_pq_index(
    spark,
    path: str,
    queries: list[tuple[int, list[float]]],
    k_neighbors: int = 10,
    codebooks: Sequence[Sequence[Sequence[float]]] | None = None,
    rerank: int | None = None,
    vectors: DataFrame | None = None,
    vec_col: str = "embedding",
) -> DataFrame:
    """ADC top-k against a materialized PQ index. ``codebooks=None``
    loads the stamped set; a supplied set must match the sidecar
    (mismatch raises -- distances under foreign codebooks are
    garbage, loudly refused like every other index in this package).
    ``rerank=C`` adds the refine stage -- the index stores only codes,
    so the caller supplies the raw-vector relation via ``vectors``
    (see pq_topk / exact_rerank_l2)."""
    from xmidt_event_streams_spark.fsutil import read_json_sidecar

    meta = read_json_sidecar(spark, path, _PQ_META_FILE)
    if meta is None:
        raise ValueError(
            f"no codebook sidecar at {path} (foreign index?): build "
            "with write_pq_index"
        )
    if codebooks is None:
        codebooks = meta["codebooks"]
    elif _as_codebooks(codebooks).tolist() != meta["codebooks"]:
        raise ValueError(
            f"PQ index at {path} was built with different codebooks "
            f"(m={meta['m']}, k={meta['k']}) than the probe supplied"
        )
    return pq_topk(
        spark.read.parquet(path),
        queries,
        codebooks,
        k_neighbors,
        id_col=meta["id_col"],
        rerank=rerank,
        vectors=vectors,
        vec_col=vec_col,
    )
