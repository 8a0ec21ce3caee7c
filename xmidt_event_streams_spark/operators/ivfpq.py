"""IVF-PQ: coarse cell pruning composed with residual product
quantization -- the standard big-corpus ANN index (the FAISS
``IVFx,PQy`` shape, from the published formulations: Jegou et al.
2011, "Product Quantization for Nearest Neighbor Search").

Why the composition beats either half alone at 100 TB:

  * IVF alone prunes the scan to n_probe/n_cells of the corpus but
    still reads full vectors (dim floats/row) in the probed cells;
  * PQ alone reads m bytes/row but scans the WHOLE corpus;
  * IVF-PQ reads m ints/row in only the probed cells: both the scan
    fraction AND the bytes-per-row shrink multiply.

RESIDUAL encoding is what makes the composition accurate: vectors
inside one cell share the cell centroid's direction, so quantizing
``v - centroid(cell)`` spends the codebook's resolution on the part
that distinguishes neighbors instead of re-encoding the shared
offset. The probe builds one LUT per (query, probed cell) -- the
query's residual differs per cell -- n_queries x n_probe tables of
m x k exact subdistances, driver-built (tiny), closure-broadcast.

Semantics: ADC distances are L2 over residuals. On normalized
embeddings L2 and cosine rank identically (the ann_bench
equivalence), which is the intended regime -- same contract as the
PQ family.

Plan shape: write = ONE fused Arrow pass computing (cell, codes)
per row (_fused_encode -- the composed assign/residual/encode chain
paid three Arrow round trips of the full vector payload), then a
cell-partitioned, id-sorted write (one dir per cell, no small
files; the shuffle moves only ids + code bytes; the cell->files
manifest is restamped). Probe = the probed cells' data files opened
straight from the file manifest (no directory listing, no listing
Spark job -- pytest-asserted), a shuffle-free mapInPandas ADC scan
over int codes, and a driver-side top-k merge (distributed per-query
reduce above a partials bound). Fit = driver-side numpy Lloyd on a
bounded deterministic sample by default (see ivfpq_fit).
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

from xmidt_event_streams_spark.fsutil import (
    read_json_sidecar,
    write_json_sidecar,
)
from xmidt_event_streams_spark.operators.ivf import (
    _nearest_cells_driver,
    assign_cells,
    kmeans_fit,
    read_probed_cells,
    refresh_files_manifest,
)
from xmidt_event_streams_spark.operators.pq import (
    _as_codebooks,
    pq_encode,
    pq_fit,
)

_IVFPQ_META_FILE = "_xes_ivfpq_index_meta.json"


def residual_expr(
    vec_col: str, cell_col: str, centroids: list[list[float]]
) -> Column:
    """``v - centroid(cell)``. Small centroid tables ride the plan as
    a literal array-of-arrays (pure JVM zip_with — plan-time constant,
    same posture as nearest_cells). LARGE tables (> ~4k scalars, i.e.
    any sqrt(N)-sized coarse quantizer) switch to an Arrow gather —
    the literal expression embeds cells x dim individual Literal
    nodes, and at 1.4k cells x 64 dims (~90k nodes) analysis/codegen
    of that one expression measurably dominates the fit and build.
    Both paths are exact float64 subtraction; null vectors and null
    cells yield null residuals in each."""
    cm = np.asarray(centroids, dtype=np.float64)
    if cm.size <= 4096:
        cents = F.array(
            *[F.array(*[F.lit(float(x)) for x in c]) for c in centroids]
        )
        picked = F.element_at(cents, F.col(cell_col) + 1)  # 1-based
        return F.zip_with(
            F.col(vec_col).cast("array<double>"), picked, lambda x, y: x - y
        )

    import pandas as pd

    from xmidt_event_streams_spark.functions.vectors import _stack_masked

    dim = int(cm.shape[1])

    @F.pandas_udf("array<double>")
    def _res(v, c):
        if len(v) == 0:
            return pd.Series([], dtype="object")
        # _stack_masked returns the VALID rows' matrix plus the full-
        # length mask; rows whose cell is null are dropped by slicing
        # that matrix (no second stack — this kernel is the index
        # build's hot path)
        mat, valid = _stack_masked(v, dim=dim)
        cells = pd.to_numeric(c, errors="coerce").to_numpy(dtype="float64")
        vidx = np.nonzero(valid)[0]
        cell_ok = ~np.isnan(cells[vidx])
        idx = vidx[cell_ok]
        out = pd.Series([None] * len(v), dtype="object")
        if len(idx):
            res = mat[cell_ok] - cm[cells[idx].astype(np.int64)]
            out.iloc[idx] = list(res)
        return out

    return _res(
        F.col(vec_col).cast("array<double>"), F.col(cell_col).cast("long")
    )


# driver-side fit sample cap: 256k rows x 64 dims x 8 B = ~130 MB
# collected once -- comfortably driver-sized, and k-means quality
# saturates orders of magnitude below this for any realistic cell
# count (FAISS's own guideline is ~"39 x n_cells" training points)
FIT_SAMPLE_ROWS = 262_144


def _collect_fit_sample(
    df: DataFrame, vec_col: str, id_col: str, max_rows: int,
    n_rows: int | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """(ids, X) for a deterministic md5-bucket sample of at most
    ~``max_rows`` rows, driver-sorted by id (the init contract).
    The same sampling idiom as similarity.neardup_centroids: bucket
    membership is a pure function of the id, so re-fits see the same
    sample regardless of partitioning. Pass ``n_rows`` when the
    caller already counted ``df`` (auto cell sizing does) -- saves a
    second pass over derived/filtered fit frames."""
    n = df.count() if n_rows is None else n_rows
    sel = df.select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).cast("array<double>").alias("_v"),
    ).filter(F.col("_v").isNotNull())
    if n > max_rows:
        keep = max(1, int(65536 * max_rows / n))
        sel = sel.filter(
            F.conv(
                F.substring(F.md5(F.col("_id").cast("string")), 1, 4),
                16,
                10,
            ).cast("int")
            < keep
        )
    # Arrow transfer: a 256k x 64 sample is ~130 MB -- the row-based
    # collect spent tens of seconds deserializing what Arrow moves in
    # ~2 s (measured r7: fit 45.8 -> under the 30 s target)
    from xmidt_event_streams_spark.operators.fetch import (
        arrow_collect_pandas,
    )

    pdf = arrow_collect_pandas(sel)
    if len(pdf) == 0:
        return np.asarray([]), np.zeros((0, 0))
    # ragged vectors carry no searchable signal (pq_encode nulls
    # them); drop any row disagreeing with the modal dimension
    lens = pdf["_v"].map(len)
    dim = int(lens.mode().iloc[0])
    pdf = pdf[lens == dim]
    ids = pdf["_id"].to_numpy()
    X = np.stack(pdf["_v"].to_numpy()).astype(np.float64)
    order = np.argsort(ids, kind="stable")
    return ids[order], X[order]


def _lloyd_cosine(X: np.ndarray, k: int, n_iters: int) -> np.ndarray:
    """Spherical k-means on the driver, mirroring ivf.kmeans_fit's
    contracts: init = first k rows (caller pre-sorts by id), cosine
    assignment with ties to the LOWEST cell (np.argmax first-hit),
    un-normalized mean update, empty cells keep their centroid.
    Chunked matmul keeps the similarity block ~100 MB at any k."""
    C = X[:k].copy()
    chunk = max(1, (16 << 20) // max(k, 1))
    for _ in range(n_iters):
        Cn = C / np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-12)
        cells = np.empty(len(X), dtype=np.int64)
        for s in range(0, len(X), chunk):
            blk = X[s : s + chunk]
            bn = blk / np.maximum(
                np.linalg.norm(blk, axis=1, keepdims=True), 1e-12
            )
            cells[s : s + chunk] = np.argmax(bn @ Cn.T, axis=1)
        sums = np.zeros_like(C)
        np.add.at(sums, cells, X)
        counts = np.bincount(cells, minlength=k)
        live = counts > 0
        C[live] = sums[live] / counts[live, None]
    return C


def _lloyd_l2_subspaces(
    R: np.ndarray, m: int, k: int, n_iters: int
) -> np.ndarray:
    """PQ codebooks on the driver: independent L2 Lloyd per subspace,
    mirroring pq.pq_fit's contracts (init = first k rows' subvectors,
    argmin ties to the lowest code, empty codes keep their centroid).
    Returns (m, k, dsub)."""
    n, dim = R.shape
    dsub = dim // m
    sub = R.reshape(n, m, dsub)
    cb = np.transpose(sub[:k], (1, 0, 2)).copy()  # (m, k, dsub)
    for _ in range(n_iters):
        for j in range(m):
            x = sub[:, j, :]
            c = cb[j]
            # ||x-c||^2 = ||x||^2 - 2 x.c + ||c||^2 ; the x^2 term is
            # constant per row and cannot change the argmin (the same
            # expansion as pq._encode_block)
            d = (c**2).sum(axis=1)[None, :] - 2.0 * (x @ c.T)
            codes = np.argmin(d, axis=1)
            sums = np.zeros_like(c)
            np.add.at(sums, codes, x)
            counts = np.bincount(codes, minlength=k)
            live = counts > 0
            cb[j][live] = sums[live] / counts[live, None]
    return cb


def ivfpq_fit(
    df: DataFrame,
    n_cells: int | None = None,
    m: int = 8,
    k: int = 16,
    n_iters: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    corpus_rows: int | None = None,
    fit_sample_rows: int | None = FIT_SAMPLE_ROWS,
    opq: bool = False,
    opq_iters: int = 8,
):
    """Fit the two quantizers in sequence: coarse spherical k-means
    for the cells, then the PQ codebooks on the RESIDUALS under those
    cells.

    ``opq=True`` composes the learned-rotation preprocessing in front
    (the FAISS ``OPQd,IVFx,PQy`` shape; Ge et al. 2013 -- see
    operators/opq.py): an orthogonal rotation is fit on (a bounded
    subset of) the SAME sample, then both quantizers train in rotated
    space, and the return becomes the 3-tuple ``(centroids,
    codebooks, rotation)`` whose parts belong together -- pass all
    three to :func:`write_ivfpq_index` so the sidecar stamps them as
    one unit. Orthogonality preserves L2/cosine exactly, so cell
    membership and probe distances are the original space's; the
    rotation only re-blocks variance so the residual PQ spends its
    codes where the data is (measured r9: recall@10 0.948/0.991 vs
    plain residual's 0.944/0.973 at equal bytes). Requires the
    sample-based fit path (``fit_sample_rows`` not None).

    FIT IS SAMPLE-BASED BY DEFAULT (``fit_sample_rows``): one
    deterministic md5-bucket sample of at most ~256k rows is
    collected ONCE and both quantizers run as driver-side numpy Lloyd
    (_lloyd_cosine / _lloyd_l2_subspaces -- same init/tie/empty-cell
    contracts as the distributed kmeans_fit / pq_fit). Rationale:
    quantizer quality saturates at tens of training points per cell
    (FAISS's own guideline), so at sqrt(N) cells the distributed fit
    re-scans the corpus per Lloyd round to compute what a bounded
    sample answers in seconds -- the r6-measured 124.7 s fit at 2M
    rows is the failure this path removes; ASSIGNMENT of the full
    corpus (write_ivfpq_index) stays distributed and linear.
    ``fit_sample_rows=None`` keeps the distributed whole-frame fit
    (kmeans_fit / pq_fit) for callers that need it.

    ``n_cells=None`` (default) sizes the coarse quantizer as
    ``sqrt(N)`` of the CORPUS row count -- the standard IVF operating
    point (Jegou et al. 2011 §V; FAISS guidelines): per-cell
    occupancy and cell count then grow together as sqrt(N), so probe
    cost n_probe x N/n_cells stays sublinear instead of degrading as
    the corpus outgrows a frozen cell count (a 64-cell index at 2M
    rows scans 31k rows/cell -- measured recall@10 collapse from
    0.763 at 200k to 0.338 at 2M in this repo's round-5 bench).
    When fitting on a sample, pass ``corpus_rows`` (the FULL corpus
    size -- the quantity sqrt scales against); otherwise the sample's
    own count is used. Auto cell count is clamped to the fit frame's
    rows (k-means cannot place more cells than fit points) and to
    65_536 (the coarse-assign kernel broadcasts cells x dim doubles
    to every task)."""
    fit_rows = None
    if n_cells is None:
        fit_rows = df.count()
        base = corpus_rows if corpus_rows is not None else fit_rows
        n_cells = max(1, int(base**0.5))
        n_cells = min(n_cells, max(1, fit_rows), 65_536)
    if fit_sample_rows is None:
        if opq:
            raise ValueError(
                "opq=True requires the sample-based fit "
                "(fit_sample_rows must not be None): the rotation is "
                "a driver-numpy fit over the collected sample"
            )
        cents = kmeans_fit(df, n_cells, n_iters, vec_col, id_col)
        res = assign_cells(df, cents, vec_col).withColumn(
            "_res", residual_expr(vec_col, "cell", cents)
        )
        cbs = pq_fit(res, m, k, n_iters, vec_col="_res", id_col=id_col)
        return cents, cbs
    _, X = _collect_fit_sample(
        df, vec_col, id_col, fit_sample_rows, n_rows=fit_rows
    )
    R = None
    if opq:
        from xmidt_event_streams_spark.operators.opq import (
            OPQ_FIT_SAMPLE_ROWS,
            _opq_fit_array,
        )

        # rotation fit on a bounded PREFIX of the sample, sized at
        # ~1k training points per code (the FAISS saturation
        # guideline; the alternation re-runs ~17 codebook fits, so
        # its cost is linear in this row count -- measured 200-300 s
        # at the 64k cap on the bench corpus, roughly halved at the
        # per-code size). Codebooks discarded: the residual quantizer
        # below refits them in rotated space under the final cells.
        rot_rows = min(OPQ_FIT_SAMPLE_ROWS, max(4096, 1024 * k))
        # STRIDED subset, not a prefix: _collect_fit_sample returns
        # rows id-sorted, so a prefix would train the rotation on the
        # oldest slice of a time-ordered corpus while the quantizers
        # below train on all of it (r10 review finding) -- the stride
        # keeps the subset distribution-representative at equal cost
        stride = max(1, len(X) // rot_rows)
        R, _, _ = _opq_fit_array(
            X[::stride][:rot_rows], m, k, n_iters, opq_iters
        )
        X = X @ R
    if len(X) < max(n_cells, k):
        raise ValueError(
            f"fit sample holds {len(X)} rows < max(n_cells={n_cells}, "
            f"k={k}); supply more data or lower the quantizer sizes"
        )
    if X.shape[1] % m:
        raise ValueError(f"dim {X.shape[1]} not divisible by m={m}")
    C = _lloyd_cosine(X, n_cells, n_iters)
    # residuals under the FINAL cells (one more assignment pass)
    Cn = C / np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-12)
    chunk = max(1, (16 << 20) // max(n_cells, 1))
    cells = np.empty(len(X), dtype=np.int64)
    for s in range(0, len(X), chunk):
        blk = X[s : s + chunk]
        bn = blk / np.maximum(
            np.linalg.norm(blk, axis=1, keepdims=True), 1e-12
        )
        cells[s : s + chunk] = np.argmax(bn @ Cn.T, axis=1)
    cbs = _lloyd_l2_subspaces(X - C[cells], m, k, n_iters)
    if opq:
        return C.tolist(), cbs.tolist(), R.tolist()
    return C.tolist(), cbs.tolist()


def _fused_encode(
    df: DataFrame,
    centroids: list[list[float]],
    codebooks: Sequence[Sequence[Sequence[float]]],
    id_col: str,
    vec_col: str,
    refine: str | None = None,
    rotation: Sequence[Sequence[float]] | None = None,
) -> DataFrame:
    """(id, codes, cell) in ONE Arrow pass: cell assignment (argmax
    of 6dp-rounded cosine -- numerically identical to
    vectors.nearest_cells), residual subtraction, and PQ encoding
    (pq._encode_block) fused into a single mapInPandas kernel. The
    composed path (assign_cells -> residual_expr -> pq_encode) moved
    the full vector payload through THREE separate Arrow
    serialize/deserialize round trips; at index-build volume that
    transfer was most of the build cost. Null/ragged vectors yield
    (null cell, null codes), as in the composed path.

    ``refine='sq8'`` additionally emits the in-index refine payload
    (``sq8`` binary + per-row affine bounds, operators/sq.py) computed
    from the RAW vector in the same pass -- the refine approximates
    the original vector, not the residual, so rerank distances are
    directly comparable to exact L2. Null/ragged vectors yield null
    refine columns too.

    ``rotation`` (the OPQ composition): each vector is rotated
    FIRST, in the same Arrow pass, and everything downstream -- cell
    assignment, residual, codes, the sq8 refine payload -- lives in
    rotated space. Orthogonality makes that transparent to callers:
    cosine cell membership and L2 refine distances are numerically
    the original space's (probes rotate queries driver-side from the
    stamped sidecar)."""
    import pandas as pd

    from xmidt_event_streams_spark.functions.vectors import _stack_masked
    from xmidt_event_streams_spark.operators.pq import _encode_block
    from xmidt_event_streams_spark.operators.sq import sq8_encode_block

    if refine not in (None, "sq8"):
        raise ValueError(f"unsupported refine codec {refine!r}")
    cb = _as_codebooks(codebooks)
    cm = np.asarray(centroids, dtype=np.float64)
    cn = np.sqrt((cm * cm).sum(axis=1))
    dim = int(cm.shape[1])
    Rm = None
    if rotation is not None:
        Rm = np.asarray(rotation, dtype=np.float64)
        if Rm.shape != (dim, dim):
            raise ValueError(
                f"rotation is {Rm.shape}, centroids are {dim}-dim"
            )
    id_type = {
        f.name: f.dataType.simpleString() for f in df.schema.fields
    }[id_col]
    schema = f"`{id_col}` {id_type}, `codes` array<int>, `cell` int"
    if refine == "sq8":
        schema += ", `sq8` binary, `sq8_lo` double, `sq8_step` double"

    def _kernel(batches):
        for pdf in batches:
            n = len(pdf)
            codes_out = pd.Series([None] * n, dtype="object")
            cell_out = pd.Series([None] * n, dtype="object")
            cols = {id_col: pdf[id_col], "codes": codes_out, "cell": cell_out}
            if refine == "sq8":
                cols["sq8"] = pd.Series([None] * n, dtype="object")
                cols["sq8_lo"] = pd.Series([None] * n, dtype="object")
                cols["sq8_step"] = pd.Series([None] * n, dtype="object")
            if n:
                mat, valid = _stack_masked(pdf[vec_col], dim=dim)
                if Rm is not None and mat.shape[0]:
                    mat = mat @ Rm  # OPQ: everything downstream is rotated
                if mat.shape[0]:
                    vn = np.sqrt(np.einsum("ij,ij->i", mat, mat))
                    den = np.outer(vn, cn)
                    sims = np.where(
                        den > 0,
                        (mat @ cm.T) / np.where(den > 0, den, 1.0),
                        0.0,
                    )
                    cells = np.argmax(np.round(sims, 6), axis=1)
                    codes = _encode_block(mat - cm[cells], cb)
                    idx = np.nonzero(valid)[0]
                    codes_out.iloc[idx] = list(codes)
                    cell_out.iloc[idx] = [int(c) for c in cells]
                    if refine == "sq8":
                        raw, lo, step = sq8_encode_block(mat)
                        cols["sq8"].iloc[idx] = raw
                        cols["sq8_lo"].iloc[idx] = list(lo)
                        cols["sq8_step"].iloc[idx] = list(step)
            yield pd.DataFrame(cols)

    return df.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias(vec_col)
    ).mapInPandas(_kernel, schema)


def write_ivfpq_index(
    df: DataFrame,
    path: str,
    centroids: list[list[float]],
    codebooks: Sequence[Sequence[Sequence[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    refine: str | None = None,
    rotation: Sequence[Sequence[float]] | None = None,
) -> None:
    """Materialize (id, codes) partitioned by coarse cell, residual-
    encoded, with both quantizers stamped in the sidecar (cells and
    codes are meaningless under any other centroids/codebooks --
    probes verify or load, never silently mismatch). Encoding is the
    fused one-pass kernel (:func:`_fused_encode`); the shuffle to
    cell directories moves only (id, m ints, cell), never vectors.

    ``refine='sq8'`` stores the in-index refine payload next to the
    codes (SQ8 bytes + affine bounds, operators/sq.py): probes with
    ``rerank=C`` then re-rank the ADC shortlist from the SAME scan --
    no raw-vector relation, no point-fetch job, zero extra Spark
    actions. Cost: +dim+16 bytes/row in the cell files, read only by
    reranking probes (plain probes keep the codes-only ReadSchema).
    The codec is stamped in the sidecar; append/rebuild preserve it.

    ``rotation`` (the OPQ composition, fit via ``ivfpq_fit(...,
    opq=True)``): callers keep passing RAW vectors -- the rotation is
    applied inside the fused encode kernel and stamped in the sidecar
    next to the quantizers it was fit with, so the whole lifecycle
    (append, streaming ingest, CDC follow, compaction, probes) reads
    it from the index and stays rotation-transparent."""
    cb = _as_codebooks(codebooks)
    (
        _fused_encode(
            df, centroids, codebooks, id_col, vec_col, refine, rotation
        )
        .repartition(F.col("cell"))
        # id-sorted files: the point-fetch write contract
        # (operators/fetch.py; see ivf._sorted_by_id)
        .sortWithinPartitions("cell", id_col)
        .write.partitionBy("cell")
        .mode("overwrite")
        .parquet(path)
    )
    write_json_sidecar(
        df.sparkSession,
        path,
        _IVFPQ_META_FILE,
        {
            "centroids": [[float(x) for x in c] for c in centroids],
            "codebooks": cb.tolist(),
            "m": int(cb.shape[0]),
            "k": int(cb.shape[1]),
            "dsub": int(cb.shape[2]),
            "id_col": id_col,
            "refine": refine,
            "rotation": (
                None
                if rotation is None
                else [[float(x) for x in r] for r in rotation]
            ),
        },
    )
    # file manifest: probes open these files directly (no per-probe
    # directory listing -- see ivf._IVF_FILES_FILE)
    refresh_files_manifest(df.sparkSession, path)


# above this many (partitions x queries x n_short) partial rows the
# probe inserts one distributed per-query reduce before the driver
# merge -- 2M rows of (long, long, double) is ~50 MB collected, the
# same order as a broadcast threshold (the regime boundary it marks)
_DRIVER_MERGE_MAX_ROWS = 2_000_000


def _fold_into(
    best: dict, qid: int, cur_ids, d, n_short: int, extras: tuple = ()
) -> None:
    """Fold (ids, dists) into ``best[qid]`` keeping the n_short
    nearest (ties to the lower id) -- the shared partial-top-k kernel
    for the scan pass and the optional distributed merge pass.
    Selection via pq.keep_top_by_dist_id (argpartition + boundary-tie
    lexsort: exact winners, O(n)).

    ``extras`` is a tuple of side arrays aligned with ``cur_ids``
    (the in-index refine payload: SQ8 bytes + affine bounds); they are
    concatenated and gathered with the SAME selection indices, so
    ``best[qid]`` stays (ids, dists, *extras) row-aligned."""
    from xmidt_event_streams_spark.operators.pq import keep_top_by_dist_id

    if qid in best:
        prev = best[qid]
        d = np.concatenate([prev[1], d])
        cur_ids = np.concatenate([prev[0], cur_ids])
        extras = tuple(
            np.concatenate([p, e]) for p, e in zip(prev[2:], extras)
        )
    if not extras:
        best[qid] = keep_top_by_dist_id(cur_ids, d, n_short)
        return
    kept_ids, kept_d, idx = keep_top_by_dist_id(
        cur_ids, d, n_short, return_index=True
    )
    best[qid] = (kept_ids, kept_d, *(e[idx] for e in extras))


def append_to_ivfpq_index(
    df: DataFrame,
    path: str,
    vec_col: str = "embedding",
    batch_id: int | None = None,
) -> None:
    """Fold a new vector batch into an existing IVF-PQ index -- the
    lifecycle arm the production ANN path needs beyond build-once
    (mirrors ivf.append_to_ivf_index): the batch is fused-encoded
    under the STAMPED quantizers (never re-fit -- cells and codes are
    meaningless under any other centroids/codebooks, so they are read
    from the sidecar, not supplied) and appended to the cell
    directories; the file manifest is updated for the touched cells
    only.

    ``batch_id`` enables the streaming arm: rows sub-partition by the
    checkpoint-deterministic batch id and the write dynamically
    overwrites ONLY this batch's (cell, batch) partitions, so an
    at-least-once replay rewrites its own rows instead of duplicating
    ids in probe results. Plain and batched appends cannot mix under
    one root (conflicting partition schemes -- same contract as the
    IVF tier): a streaming-shaped index is seeded with
    ``write_ivfpq_index(df.limit(0), ...)`` and a pre-existing corpus
    folded as ``batch_id=-1``. Quantizer DRIFT is the operational caveat,
    exactly as for the IVF tier: stamped quantizers stay frozen while
    the corpus moves -- monitor occupancy and rebuild (write_ivfpq_
    index with a re-fit, an atomic swap under the sidecar contract)
    when it alarms."""
    spark = df.sparkSession
    meta = read_json_sidecar(spark, path, _IVFPQ_META_FILE)
    if meta is None:
        raise ValueError(
            f"no quantizer sidecar at {path}: initialize with "
            "write_ivfpq_index"
        )
    id_col = meta["id_col"]
    encoded = (
        _fused_encode(
            df,
            meta["centroids"],
            meta["codebooks"],
            id_col,
            vec_col,
            meta.get("refine"),
            meta.get("rotation"),  # OPQ: stamped with its quantizers
        )
        .repartition(F.col("cell"))
        # id-sorted files: the point-fetch write contract
        .sortWithinPartitions("cell", id_col)
        .persist()  # two actions: the write + the touched-cell collect
    )
    try:
        if batch_id is None:
            encoded.write.partitionBy("cell").mode("append").parquet(
                path
            )
        else:
            (
                encoded.withColumn("_ingest_batch_id", F.lit(batch_id))
                .write.option("partitionOverwriteMode", "dynamic")
                .partitionBy("cell", "_ingest_batch_id")
                .mode("overwrite")
                .parquet(path)
            )
        touched = [
            int(r[0])
            for r in encoded.select("cell").distinct().collect()
            if r[0] is not None
        ]
    finally:
        encoded.unpersist()
    refresh_files_manifest(spark, path, touched)


def rebuild_ivfpq_index(
    spark,
    path: str,
    corpus: DataFrame,
    vec_col: str = "embedding",
    n_cells: int | None = None,
    m: int | None = None,
    k: int | None = None,
    n_iters: int = 3,
    corpus_rows: int | None = None,
    opq: bool | None = None,
) -> dict:
    """RE-FIT both quantizers and rewrite the index atomically -- the
    drift-closure action for the compressed tier. Unlike the IVF
    rebuild, this one needs the RAW ``corpus`` relation: the index
    stores only codes, and codes cannot train their own replacement.
    ``m``/``k`` default to the stamped values; ``n_cells=None``
    re-sizes to sqrt(corpus) (pass ``corpus_rows`` when ``corpus`` is
    a sample). Layout preserved: a streaming-shaped index folds to
    ``_ingest_batch_id=-1`` (the compaction convention) so later
    batch appends keep working. Single-writer, like compaction.

    ``opq=None`` (default) preserves the stamped shape: an index
    built with a rotation RE-FITS the rotation on the drift-rebuild
    corpus too (a frozen rotation decays exactly like frozen
    codebooks); ``opq=True``/``False`` force-adds or force-drops the
    rotation -- the migration path between the plain and composed
    tiers.

    Returns {rows, n_cells_before, n_cells_after}."""
    from xmidt_event_streams_spark.fsutil import swap_into_place

    meta = read_json_sidecar(spark, path, _IVFPQ_META_FILE)
    if meta is None:
        raise ValueError(
            f"cannot rebuild a foreign IVF-PQ index (no "
            f"{_IVFPQ_META_FILE} at {path})"
        )
    id_col = meta["id_col"]
    refine = meta.get("refine")
    batched = "_ingest_batch_id" in spark.read.parquet(path).columns
    m = m if m is not None else meta["m"]
    k = k if k is not None else meta["k"]
    want_opq = (
        (meta.get("rotation") is not None) if opq is None else opq
    )
    if want_opq:
        cents, cbs, rot = ivfpq_fit(
            corpus,
            n_cells=n_cells,
            m=m,
            k=k,
            n_iters=n_iters,
            vec_col=vec_col,
            id_col=id_col,
            corpus_rows=corpus_rows,
            opq=True,
        )
    else:
        rot = None
        cents, cbs = ivfpq_fit(
            corpus,
            n_cells=n_cells,
            m=m,
            k=k,
            n_iters=n_iters,
            vec_col=vec_col,
            id_col=id_col,
            corpus_rows=corpus_rows,
        )
    cb = _as_codebooks(cbs)
    encoded = _fused_encode(
        corpus, cents, cbs, id_col, vec_col, refine, rot
    )
    part_cols = ["cell"]
    if batched:
        encoded = encoded.withColumn("_ingest_batch_id", F.lit(-1))
        part_cols.append("_ingest_batch_id")
    tmp = path.rstrip("/") + "__rebuild_tmp"
    (
        encoded.repartition(*[F.col(c) for c in part_cols])
        .sortWithinPartitions("cell", id_col)
        .write.partitionBy(*part_cols)
        .mode("overwrite")
        .parquet(tmp)
    )
    write_json_sidecar(
        spark,
        tmp,
        _IVFPQ_META_FILE,
        {
            "centroids": [[float(x) for x in c] for c in cents],
            "codebooks": cb.tolist(),
            "m": int(cb.shape[0]),
            "k": int(cb.shape[1]),
            "dsub": int(cb.shape[2]),
            "id_col": id_col,
            "refine": refine,
            "rotation": rot,
        },
    )
    refresh_files_manifest(spark, tmp)
    rows = spark.read.parquet(tmp).count()
    swap_into_place(spark, tmp, path)
    return {
        "rows": rows,
        "n_cells_before": len(meta["centroids"]),
        "n_cells_after": len(cents),
    }


def compact_ivfpq_index(
    spark,
    path: str,
    tombstones: DataFrame | list | None = None,
) -> dict:
    """Rewrite the IVF-PQ index in place, dropping duplicate ids
    (newest batch wins on the streaming layout, code-hash tiebreak)
    and tombstoned ids -- the CODES tier of a takedown: without it
    the removed documents' quantized vectors keep answering ADC
    probes from the index files. Shares ivf.compact_cell_index
    (same layout, same single-writer contract, same one-file-per-
    partition payoff); the quantizer sidecar is restamped as-is and
    the file manifest regenerated. Returns {rows_before, rows_after,
    files_before, files_after}."""
    from xmidt_event_streams_spark.operators.ivf import (
        compact_cell_index,
    )

    meta = read_json_sidecar(spark, path, _IVFPQ_META_FILE)
    if meta is None:
        raise ValueError(
            f"cannot compact a foreign IVF-PQ index (no "
            f"{_IVFPQ_META_FILE} at {path})"
        )
    return compact_cell_index(
        spark,
        path,
        meta=meta,
        meta_file=_IVFPQ_META_FILE,
        content_col="codes",
        id_col=meta["id_col"],
        tombstones=tombstones,
    )


def probed_codes_relation(
    spark, path: str, probed: list[int], id_col: str,
    extra_cols: tuple = (),
) -> DataFrame:
    """The ADC scan's exact input relation: (id, codes, cell) over the
    probed cells' manifest files, null-code poison rows excluded.
    Shared by :func:`probe_ivfpq_index` and the scale audit's
    index-path section (scale_audit._measure_index_paths), so the
    plan the audit measures IS the plan the probe executes -- a
    hand-copied twin would silently desynchronize on the next probe
    change. ``extra_cols`` widens the projection (the in-index refine
    payload) -- plain probes keep the codes-only ReadSchema so parquet
    never decodes refine bytes they will not use."""
    return (
        read_probed_cells(spark, path, probed)
        .filter(F.col("cell").isin(probed))
        .filter(F.col("codes").isNotNull())
        .select(id_col, "codes", "cell", *extra_cols)
    )


def probe_ivfpq_index(
    spark,
    path: str,
    queries: list[tuple[int, list[float]]],
    k_neighbors: int = 10,
    n_probe: int = 2,
    centroids: list[list[float]] | None = None,
    codebooks: Sequence[Sequence[Sequence[float]]] | None = None,
    rerank: int | None = None,
    vectors: DataFrame | None = None,
    vec_col: str = "embedding",
) -> DataFrame:
    """ADC top-k against a materialized IVF-PQ index.

    ``queries`` is the small-by-contract driver-side list of
    (query_id, raw_vector), as across the ANN family. Per query the
    n_probe nearest cells are computed driver-side (static partition
    pruning beats DPP here, same argument as probe_ivf_index); each
    (query, cell) pair gets its own residual LUT. The scan reads
    ONLY the probed cells' directories and scores each row against
    exactly the queries that probed its cell. Self-matches
    (vec_id == query_id) are excluded, matching the IVF family.
    Output: query_id, vec_id, adc_dist (ascending = nearest), rank.

    ``rerank=C`` adds the refine stage: the residual-ADC scan
    short-lists C candidates per query and re-scores them at full
    resolution. TWO refine sources, switched on the arguments:

      * IN-INDEX (``vectors=None`` on an index built with
        ``refine='sq8'``): the scan kernel already read the
        shortlist's SQ8 refine payload from the SAME cell files, so
        re-ranking is a driver-side numpy decode over C*n_queries
        rows -- NO second scan, NO point-fetch job, zero extra Spark
        actions. The output gains ``refine_dist`` (SQ8-reconstructed
        squared L2 -- error bound: half a quantization step per
        dimension, operators/sq.py) and re-ranks by it. This is the
        production path: its cost tracks the probe, not the corpus.
      * EXACT (``vectors=`` a raw-vector relation): pq.exact_rerank_l2
        fetches the C*n_queries exact vectors (gap-coalesced ranged
        scan + semi-join, operators/fetch.py) and the output gains
        ``exact_dist``. Use when exact distances must be reported or
        the index stores no refine payload.

    Both recover the recall that residual quantization costs (Jegou
    et al. TPAMI 2011 SS V's re-ranking stage); recall@k becomes
    ~recall@C of the compressed scan in each.
    """
    meta = read_json_sidecar(spark, path, _IVFPQ_META_FILE)
    if meta is None:
        raise ValueError(
            f"no quantizer sidecar at {path} (foreign index?): build "
            "with write_ivfpq_index"
        )
    if centroids is None:
        centroids = meta["centroids"]
    elif [[float(x) for x in c] for c in centroids] != meta["centroids"]:
        raise ValueError(
            f"IVF-PQ index at {path} was built with different centroids"
        )
    if codebooks is None:
        codebooks = meta["codebooks"]
    elif _as_codebooks(codebooks).tolist() != meta["codebooks"]:
        raise ValueError(
            f"IVF-PQ index at {path} was built with different codebooks"
        )
    cb = _as_codebooks(codebooks)
    m, _kcb, dsub = cb.shape
    id_col = meta["id_col"]

    # OPQ composition: the index lives in rotated space (cells,
    # residual codes AND the sq8 refine payload -- _fused_encode
    # rotates first), so queries rotate driver-side (dim x dim
    # matmul per query, nothing cluster-side changes). The RAW
    # queries are kept for the exact-rerank arm: exact_rerank_l2
    # re-scores against the ORIGINAL vectors relation, and L2 is
    # rotation-invariant so candidate ids line up either way.
    raw_queries = queries
    if meta.get("rotation") is not None:
        Rm = np.asarray(meta["rotation"], dtype=np.float64)
        queries = [
            (qid, list(np.asarray(qv, dtype=np.float64) @ Rm))
            for qid, qv in queries
        ]

    cells_per_q = _nearest_cells_driver(
        [v for _, v in queries], centroids, n_probe
    )
    cmat = np.asarray(centroids, dtype=np.float64)
    # cell -> (query ids, stacked residual LUTs (q_c, m, k)): grouping
    # by cell lets the scan kernel score ALL of a cell's queries with
    # one fancy-index gather instead of a Python-level loop per
    # (query, cell) pair -- the loop was the kernel bottleneck for
    # batch-query probes (64 queries x n_probe cells = hundreds of
    # tiny numpy calls per Arrow batch)
    luts_by_cell: dict[int, tuple[np.ndarray, np.ndarray]] = {}
    _acc: dict[int, list[tuple[int, np.ndarray]]] = {}
    for (qid, qv), cells in zip(queries, cells_per_q):
        q = np.asarray(qv, dtype=np.float64)
        for c in cells:
            qr = (q - cmat[c]).reshape(m, 1, dsub)
            _acc.setdefault(int(c), []).append(
                (int(qid), ((cb - qr) ** 2).sum(axis=2))
            )
    for c, pairs in _acc.items():
        luts_by_cell[c] = (
            np.asarray([qid for qid, _ in pairs], dtype=np.int64),
            np.stack([lut for _, lut in pairs]),
        )

    # in-index refine: the shortlist's SQ8 payload rides the SAME scan
    # (stored next to the codes by the writers) -- no second read
    in_index_refine = (
        rerank is not None
        and vectors is None
        and meta.get("refine") == "sq8"
    )
    if rerank is not None and vectors is None and not in_index_refine:
        raise ValueError(
            "rerank needs a refine source: pass vectors= (exact "
            "re-score) or build the index with refine='sq8' "
            "(in-index re-score)"
        )

    fields = [
        StructField("query_id", LongType()),
        StructField(id_col, LongType()),
        StructField("adc_dist", DoubleType()),
    ]
    if in_index_refine:
        from pyspark.sql.types import BinaryType

        fields += [
            StructField("sq8", BinaryType()),
            StructField("sq8_lo", DoubleType()),
            StructField("sq8_step", DoubleType()),
        ]
    out_schema = StructType(fields)

    n_short = k_neighbors if rerank is None else max(rerank, k_neighbors)

    def _score(batches):
        import pandas as pd

        # map-side partial top-k per query (see pq.pq_topk._score):
        # the rank-window exchange carries O(partitions x queries x C)
        # rows, not every scored (query, row) pair
        rng = np.arange(m)
        best: dict = {}

        for pdf in batches:
            if len(pdf) == 0:
                continue
            cells = pdf["cell"].to_numpy()
            ids = pdf[id_col].to_numpy()
            codes = np.stack(pdf["codes"].to_numpy()).astype(np.int64)
            if in_index_refine:
                sq8 = pdf["sq8"].to_numpy()
                lo = pdf["sq8_lo"].to_numpy(dtype="float64")
                step = pdf["sq8_step"].to_numpy(dtype="float64")
            for c, (qids, lut3) in luts_by_cell.items():
                mask = cells == c
                if not mask.any():
                    continue
                sub_ids = ids[mask]
                # (q_c, rows): one gather-sum scores every query that
                # probed this cell against all its rows in the batch
                dmat = lut3[:, rng[None, :], codes[mask]].sum(axis=2)
                if in_index_refine:
                    sub_extras = (sq8[mask], lo[mask], step[mask])
                for qi, qid in enumerate(qids):
                    keep = sub_ids != qid  # self-match excluded
                    extras = (
                        tuple(e[keep] for e in sub_extras)
                        if in_index_refine
                        else ()
                    )
                    _fold_into(
                        best,
                        int(qid),
                        sub_ids[keep],
                        dmat[qi][keep],
                        n_short,
                        extras,
                    )
        for qid, kept in best.items():
            cols = {
                "query_id": np.full(len(kept[0]), qid, dtype=np.int64),
                id_col: kept[0],
                "adc_dist": kept[1],
            }
            if in_index_refine:
                cols["sq8"] = pd.Series(kept[2], dtype="object")
                cols["sq8_lo"] = kept[3]
                cols["sq8_step"] = kept[4]
            yield pd.DataFrame(cols)

    probed = sorted({int(c) for cs in cells_per_q for c in cs})
    # manifest read, not directory listing: the probed cells' data
    # files come straight from the file manifest the writers maintain,
    # so NO listing Spark job precedes the scan (a leaf-dir read above
    # the discovery threshold was a 1-task-per-directory job, ~3 s at
    # 1.4k cells -- more than the pruned scan; see
    # ivf.read_probed_cells / ivf._IVF_FILES_FILE)
    base = probed_codes_relation(
        spark,
        path,
        probed,
        id_col,
        extra_cols=(
            ("sq8", "sq8_lo", "sq8_step") if in_index_refine else ()
        ),
    )
    scored = base.mapInPandas(_score, out_schema)
    # driver-side final merge, not a rank-window exchange: the scan
    # kernel already emits per-PARTITION top-n_short partials, so the
    # global answer is a merge of <= partitions x queries x n_short
    # rows -- driver-sized by construction (queries are a driver list
    # by contract). The window path added a full shuffle + sort stage
    # whose fixed cost dominated the pruned scan at bench scale.
    # GUARD: on a pre-compaction layout (thousands of small files per
    # probed cell) with a large query batch, partitions x queries x
    # n_short can exceed driver memory -- in that regime one
    # distributed hash-partition-by-query reduce folds the partials
    # to EXACTLY queries x n_short rows before the collect (the
    # shuffle moves only partials, not the corpus).
    n_scan_parts = base.rdd.getNumPartitions()
    # byte-aware guard: with in-index refine each partial row carries
    # dim SQ8 bytes + two doubles on top of the (id, dist) pair the
    # row constant was sized for (~24 B), so scale the cap down by
    # the per-row payload width -- a dim=512 refine collect would
    # otherwise be ~20x heavier than the guard assumed
    row_cap = _DRIVER_MERGE_MAX_ROWS
    if in_index_refine:
        dim = m * dsub
        row_cap = max(1, (_DRIVER_MERGE_MAX_ROWS * 24) // (dim + 24))
    if n_scan_parts * len(queries) * n_short > row_cap:

        def _merge_partials(batches):
            import pandas as pd

            best: dict = {}
            for pdf in batches:
                for qid, g in pdf.groupby("query_id"):
                    extras = (
                        (
                            g["sq8"].to_numpy(),
                            g["sq8_lo"].to_numpy(dtype="float64"),
                            g["sq8_step"].to_numpy(dtype="float64"),
                        )
                        if in_index_refine
                        else ()
                    )
                    _fold_into(
                        best,
                        int(qid),
                        g[id_col].to_numpy(),
                        g["adc_dist"].to_numpy(),
                        n_short,
                        extras,
                    )
            for qid, kept in best.items():
                cols = {
                    "query_id": np.full(len(kept[0]), qid, dtype=np.int64),
                    id_col: kept[0],
                    "adc_dist": kept[1],
                }
                if in_index_refine:
                    cols["sq8"] = pd.Series(kept[2], dtype="object")
                    cols["sq8_lo"] = kept[3]
                    cols["sq8_step"] = kept[4]
                yield pd.DataFrame(cols)

        scored = scored.repartition("query_id").mapInPandas(
            _merge_partials, out_schema
        )
    partials = scored.collect()
    merged: dict = {}
    for r in partials:
        payload = (
            (bytes(r["sq8"]), float(r["sq8_lo"]), float(r["sq8_step"]))
            if in_index_refine
            else ()
        )
        merged.setdefault(r["query_id"], []).append(
            (float(r["adc_dist"]), int(r[id_col]), *payload)
        )
    if in_index_refine:
        # refine on the driver: the shortlist is C x n_queries rows by
        # construction (the same driver-size contract as the LUTs);
        # decode is one vectorized pass per query
        from xmidt_event_streams_spark.operators.sq import (
            sq8_decode_block,
        )

        qmap = {
            int(qid): np.asarray(qv, dtype=np.float64)
            for qid, qv in queries
        }
        rows_out = []
        for qid, cand in merged.items():
            cand.sort()
            cand = cand[:n_short]
            dec = sq8_decode_block(
                [c[2] for c in cand],
                np.asarray([c[3] for c in cand]),
                np.asarray([c[4] for c in cand]),
            )
            # rank by the ROUNDED distance (ties to the lower id) --
            # the parity partners are sq8_topk and the DuckDB oracle,
            # which compute the SAME expanded form; exact_rerank_l2's
            # driver path uses ((v-q)**2).sum() (pq.py), which can
            # round differently on exact 6dp boundaries, so the two
            # refine sources are NOT bit-identical at the grain.
            # Expanded form (||d||^2 - 2 d.q + ||q||^2), NOT
            # (d-q)^2: the DuckDB oracle and sq8_topk both compute
            # this expansion, and distances that land exactly on a
            # 6dp rounding boundary must round the same way on both
            # sides of the parity check
            qv = qmap[int(qid)]
            rd = np.round(
                np.einsum("ij,ij->i", dec, dec)
                - 2.0 * (dec @ qv)
                + float(qv @ qv),
                6,
            )
            order = sorted(
                range(len(cand)), key=lambda i: (rd[i], cand[i][1])
            )[:k_neighbors]
            rows_out.extend(
                (
                    int(qid),
                    cand[i][1],
                    round(cand[i][0], 6),
                    float(rd[i]),
                    rank,
                )
                for rank, i in enumerate(order, start=1)
            )
        return spark.createDataFrame(
            rows_out,
            f"query_id long, {id_col} long, adc_dist double, "
            "refine_dist double, rank int",
        )
    rows_out = []
    for qid, cand in merged.items():
        cand.sort()
        for rank, (d, vid) in enumerate(cand[:n_short], start=1):
            rows_out.append((int(qid), vid, round(d, 6), rank))
    adc_top = spark.createDataFrame(
        rows_out, f"query_id long, {id_col} long, adc_dist double, rank int"
    )
    if rerank is None:
        return adc_top
    from xmidt_event_streams_spark.operators.pq import exact_rerank_l2

    return exact_rerank_l2(
        adc_top,
        vectors,
        raw_queries,  # original space: vectors= is the raw relation
        k_neighbors,
        id_col=id_col,
        vec_col=vec_col,
    )


def sync_ivfpq_with_snapshot(
    spark,
    table_path: str,
    index_path: str,
    checkpoint_dir: str,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    m: int = 8,
    k: int = 16,
    n_cells: int | None = None,
    n_iters: int = 3,
    refine: str | None = "sq8",
    max_polls: int = 1_000_000,
    opq: bool = False,
) -> dict:
    """Keep an IVF-PQ serving index caught up with a SNAPSHOT TABLE
    through the checkpointed change feed -- the compressed tier's
    membership in the sync family (``snapshots.sync_index_with_
    snapshot``; raw-tier twin: ``ivf.sync_ivf_with_snapshot``). With
    this, a takedown MERGE against the snapshot table propagates to
    the ADC serving tier at the next sync: deleted/updated ids
    compact out (their codes stop answering probes), insert/update
    after-images fused-encode in under the STAMPED quantizers.

    Bootstrap (fresh checkpoint, absent index): sample-fit both
    quantizers on the pinned-head read (``ivfpq_fit``) and build with
    the requested ``refine`` codec (default 'sq8' -- the production
    serving index should be able to rerank from its own payload).
    Redelivery-convergent per the shared applier's argument; quantizer
    drift pairs with ``rebuild_ivfpq_index`` in the maintenance
    window. ``opq=True`` bootstraps the composed OPQ x IVF-PQ shape
    (learned rotation stamped with the quantizers); the incremental
    appliers read the rotation from the sidecar, so the follow path
    is identical either way."""
    from xmidt_event_streams_spark.operators.snapshots import (
        compact_then_append_interval,
        snapshot_read,
        sync_index_with_snapshot,
    )

    def _exists() -> bool:
        return (
            read_json_sidecar(spark, index_path, _IVFPQ_META_FILE)
            is not None
        )

    def _bootstrap(version: int) -> int:
        from pyspark.sql import functions as SF

        base = snapshot_read(spark, table_path, version=version).select(
            SF.col(id_col), SF.col(vec_col)
        )
        n = base.count()
        rot = None
        if opq:
            cents, cbs, rot = ivfpq_fit(
                base,
                n_cells=n_cells,
                m=m,
                k=k,
                n_iters=n_iters,
                vec_col=vec_col,
                id_col=id_col,
                corpus_rows=n,
                opq=True,
            )
        else:
            cents, cbs = ivfpq_fit(
                base,
                n_cells=n_cells,
                m=m,
                k=k,
                n_iters=n_iters,
                vec_col=vec_col,
                id_col=id_col,
                corpus_rows=n,
            )
        write_ivfpq_index(
            base, index_path, cents, cbs, id_col, vec_col, refine,
            rotation=rot,
        )
        return n

    def _apply(ch):
        return compact_then_append_interval(
            ch,
            id_col,
            vec_col,
            compact_fn=lambda stale: compact_ivfpq_index(
                spark, index_path, tombstones=stale
            ),
            append_fn=lambda fresh: append_to_ivfpq_index(
                fresh, index_path, vec_col
            ),
        )

    return sync_index_with_snapshot(
        spark,
        table_path,
        checkpoint_dir,
        index_exists=_exists,
        bootstrap=_bootstrap,
        apply_interval=_apply,
        max_polls=max_polls,
    )
