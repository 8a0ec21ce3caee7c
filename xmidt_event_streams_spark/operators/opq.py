"""Optimized Product Quantization (OPQ): an orthogonal rotation
learned so the PQ subspaces carry balanced, independent variance --
from the published formulation (Ge, He, Ke, Sun, "Optimized Product
Quantization", CVPR 2013 / TPAMI 2014).

WHY: flat PQ quantizes fixed coordinate blocks ``[0:dsub], [dsub:2*
dsub], ...``. When the data's variance is concentrated or correlated
across those blocks (real embedding spaces almost always are --
anisotropic spectra, correlated dims), some subspaces waste their k
codes on noise while others drown. This package measured the failure:
flat PQ at 8 bytes/row collapses to recall@10 ~ 0.17 on the bench's
dense-cluster corpus (operators/pq.py OPERATING-POINT CAVEAT). An
ORTHOGONAL rotation R costs nothing at search time (L2 is rotation-
invariant, so ADC in the rotated space estimates true distances and
the query is rotated driver-side: dim x dim floats) and lets the
quantizer spend its resolution where the data is.

Fit = two published stages, both driver-side numpy on the same
bounded deterministic sample the IVF-PQ fit uses (quantizer quality
saturates at tens of points per code -- ivfpq._collect_fit_sample):

  1. INIT -- eigenvalue allocation (OPQ_P, Ge et al. SS 3.4): PCA the
     sample, then greedily deal eigenvectors to the subspace with the
     smallest current eigenvalue PRODUCT (balances the per-subspace
     variance products, the quantity PQ distortion is monotone in).
  2. REFINE -- non-parametric alternation (OPQ_NP, SS 3.3): repeat
     {fit codebooks on X@R; reconstruct; R <- Procrustes(X, recon)}
     where the Procrustes step is the SVD solution of
     min_R ||X R - recon||_F over orthogonal R.

Search-time surfaces mirror the PQ family exactly (write/probe with a
stamped sidecar, rerank via vectors= against the ORIGINAL relation --
candidate ids are rotation-independent); the only moving part is the
rotation applied at encode time (Arrow-batched matmul) and to each
query (driver-side).
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_OPQ_META_FILE = "_xes_opq_index_meta.json"

# OPQ's own fit-sample cap, deliberately SMALLER than the IVF-PQ
# fit's 256k: the alternation re-runs the full Lloyd + encode +
# Procrustes loop opq_iters times FROM TWO STARTS (~24 codebook fits
# where a plain PQ fit does one -- measured 152 s at 200k x 64), and
# codebook quality saturates around ~1k training points per code
# (FAISS's own guideline), so 64k rows at k<=64 is already generous.
OPQ_FIT_SAMPLE_ROWS = 65_536


def _as_rotation(raw, dim: int | None = None) -> np.ndarray:
    R = np.asarray(raw, dtype=np.float64)
    if R.ndim != 2 or R.shape[0] != R.shape[1]:
        raise ValueError(f"rotation must be square, got {R.shape}")
    if dim is not None and R.shape[0] != dim:
        raise ValueError(f"rotation is {R.shape[0]}-dim, data is {dim}")
    return R


def eigenvalue_allocation_init(X: np.ndarray, m: int) -> np.ndarray:
    """The OPQ_P init (Ge et al. SS 3.4): PCA, then deal eigenvectors
    (largest eigenvalue first) to the subspace with the smallest
    running eigenvalue product, capacity dsub each. Returns R whose
    COLUMN blocks [j*dsub:(j+1)*dsub] span subspace j's directions,
    so ``X @ R`` presents balanced-variance blocks to the quantizer."""
    n, dim = X.shape
    dsub = dim // m
    mu = X.mean(axis=0)
    cov = (X - mu).T @ (X - mu) / max(n - 1, 1)
    w, V = np.linalg.eigh(cov)  # ascending
    order = np.argsort(w)[::-1]
    w, V = w[order], V[:, order]
    # greedy balance of log-products (products underflow at tiny
    # eigenvalues; log keeps the argmin identical and stable)
    buckets: list[list[int]] = [[] for _ in range(m)]
    logsum = np.zeros(m)
    for i in range(dim):
        open_ = [j for j in range(m) if len(buckets[j]) < dsub]
        j = min(open_, key=lambda j: (logsum[j], j))
        buckets[j].append(i)
        logsum[j] += float(np.log(max(w[i], 1e-300)))
    perm = [i for b in buckets for i in b]
    return V[:, perm]


def _reconstruct(codes: np.ndarray, cb: np.ndarray) -> np.ndarray:
    """(n, m) codes -> (n, dim) decoded vectors under (m, k, dsub)."""
    n = codes.shape[0]
    m = cb.shape[0]
    parts = [cb[j][codes[:, j]] for j in range(m)]
    return np.concatenate(parts, axis=1).reshape(n, -1)


def opq_fit(
    df: DataFrame,
    m: int = 8,
    k: int = 16,
    n_iters: int = 3,
    opq_iters: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    fit_sample_rows: int | None = None,
) -> tuple[list[list[float]], list[list[list[float]]]]:
    """Fit (rotation, codebooks) on a bounded deterministic sample
    (ivfpq._collect_fit_sample; default cap OPQ_FIT_SAMPLE_ROWS --
    smaller than the IVF-PQ fit's, see the constant's note). Both
    OPQ stages run as driver numpy: the eigen-allocation init, then
    ``opq_iters`` alternations of codebook re-fit (the same Lloyd
    kernel as the IVF-PQ fit) and the SVD Procrustes rotation update.
    Deterministic end to end (eigh/svd on a deterministic sample; no
    random init). Returns (R as dim x dim nested lists, codebooks)."""
    from xmidt_event_streams_spark.operators.ivfpq import (
        _collect_fit_sample,
    )

    cap = (
        OPQ_FIT_SAMPLE_ROWS if fit_sample_rows is None else fit_sample_rows
    )
    _, X = _collect_fit_sample(df, vec_col, id_col, cap)
    R, cb, _ = _opq_fit_array(X, m, k, n_iters, opq_iters)
    return R.tolist(), cb.tolist()


def _opq_fit_array(
    X: np.ndarray, m: int, k: int, n_iters: int, opq_iters: int
) -> tuple[np.ndarray, np.ndarray, float]:
    """The driver-numpy OPQ fit kernel over an already-collected
    sample: returns (rotation, codebooks, sample distortion) from the
    three-candidate min described in :func:`opq_fit`. Split out so
    composed fits (ivfpq_fit(opq=True) -- the FAISS ``OPQd,IVFx,PQy``
    shape) can learn the rotation on the SAME sample their coarse/
    residual quantizers train on, without a second collection pass."""
    from xmidt_event_streams_spark.operators.ivfpq import (
        _lloyd_l2_subspaces,
    )
    from xmidt_event_streams_spark.operators.pq import _encode_block

    if len(X) < k:
        raise ValueError(f"fit sample holds {len(X)} rows < k={k}")
    dim = X.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")

    def _alternate(R):
        for _ in range(max(opq_iters, 1)):
            Y = X @ R
            cb = _lloyd_l2_subspaces(Y, m, k, n_iters)
            recon = _reconstruct(_encode_block(Y, cb), cb)
            # Procrustes: min_R ||X R - recon||_F s.t. R orthogonal
            U, _, Vt = np.linalg.svd(X.T @ recon)
            R = U @ Vt
        Y = X @ R
        cb = _lloyd_l2_subspaces(Y, m, k, n_iters)
        err = float(
            ((Y - _reconstruct(_encode_block(Y, cb), cb)) ** 2)
            .sum(axis=1)
            .mean()
        )
        return R, cb, err

    # THREE candidates, keep the lowest final distortion. The eigen-
    # allocation init wins when variance is concentrated/correlated
    # across the fixed blocks (the regime OPQ exists for), but on
    # corpora whose natural blocks are already balanced it can land
    # in a WORSE basin than the identity (measured on a normalized
    # random-mixed corpus: 0.235 vs 0.203 sample distortion, and the
    # alternation does not recover). The alternation is NOT strictly
    # monotone here -- each step refits codebooks from a fresh fixed
    # Lloyd init rather than warm-starting, so a step can regress --
    # which is why plain PQ (identity rotation, one codebook fit) is
    # its own explicit candidate: the min is what GUARANTEES the fit
    # never quantizes worse than PQ on the sample, empirically and by
    # construction, rather than by a monotonicity argument the code
    # does not satisfy.
    def _pq_only():
        cb = _lloyd_l2_subspaces(X, m, k, n_iters)
        err = float(
            ((X - _reconstruct(_encode_block(X, cb), cb)) ** 2)
            .sum(axis=1)
            .mean()
        )
        return np.eye(dim), cb, err

    cand = [
        _pq_only(),
        _alternate(np.eye(dim)),
        _alternate(eigenvalue_allocation_init(X, m)),
    ]
    R, cb, err = min(cand, key=lambda t: t[2])
    return np.asarray(R), np.asarray(cb), float(err)


def rotate_vectors(
    df: DataFrame,
    rotation: Sequence[Sequence[float]],
    vec_col: str = "embedding",
    out_col: str | None = None,
) -> DataFrame:
    """Append the rotated-vector column (Arrow-batched ``mat @ R``;
    null/ragged vectors yield null). The rotation is orthogonal, so
    L2/cosine structure is preserved exactly -- this is a coordinate
    change, not a projection."""
    import pandas as pd

    from xmidt_event_streams_spark.functions.vectors import _stack_masked

    R = _as_rotation(rotation)
    dim = R.shape[0]
    out = out_col or vec_col

    # no inline type hints: this module's `from __future__ import
    # annotations` stringifies them, breaking pandas_udf inference
    # for the locally-imported pd (same posture as bench._synth)
    @F.pandas_udf("array<double>")
    def _rot(v):
        if len(v) == 0:
            return pd.Series([], dtype="object")
        mat, valid = _stack_masked(v, dim=dim)
        res = pd.Series([None] * len(v), dtype="object")
        if mat.shape[0]:
            res.iloc[np.nonzero(valid)[0]] = list(mat @ R)
        return res

    # nondeterministic marking: same containment posture as pq_encode
    # (blocks Catalyst from double-evaluating under pushed filters)
    return df.withColumn(
        out, _rot.asNondeterministic()(F.col(vec_col).cast("array<double>"))
    )


def _rotate_queries(
    queries: list[tuple[int, list[float]]], R: np.ndarray
) -> list[tuple[int, list[float]]]:
    return [
        (qid, list(np.asarray(qv, dtype=np.float64) @ R))
        for qid, qv in queries
    ]


def opq_encode(
    df: DataFrame,
    rotation: Sequence[Sequence[float]],
    codebooks: Sequence[Sequence[Sequence[float]]],
    vec_col: str = "embedding",
    codes_col: str = "codes",
) -> DataFrame:
    """Rotate then PQ-encode (one extra narrow Arrow projection; the
    codes column is the same m-int shape as pq_encode's)."""
    from xmidt_event_streams_spark.operators.pq import pq_encode

    rotated = rotate_vectors(df, rotation, vec_col, out_col="_xes_rot")
    return pq_encode(rotated, codebooks, "_xes_rot", codes_col).drop(
        "_xes_rot"
    )


def opq_topk(
    corpus_codes: DataFrame,
    queries: list[tuple[int, list[float]]],
    rotation: Sequence[Sequence[float]],
    codebooks: Sequence[Sequence[Sequence[float]]],
    k_neighbors: int = 10,
    id_col: str = "vec_id",
    codes_col: str = "codes",
    rerank: int | None = None,
    vectors: DataFrame | None = None,
    vec_col: str = "embedding",
) -> DataFrame:
    """ADC top-k over OPQ codes: identical plan to pq_topk (the scan
    kernel never sees the rotation -- only the driver-built LUTs do),
    with queries rotated driver-side. ``rerank=C`` re-scores against
    the ORIGINAL ``vectors`` relation: candidate ids are rotation-
    independent and L2 is rotation-invariant, so exact distances in
    the original space are the right refine metric."""
    from xmidt_event_streams_spark.operators.pq import (
        exact_rerank_l2,
        pq_topk,
    )

    R = _as_rotation(rotation)
    rotated_q = _rotate_queries(queries, R)
    if rerank is None or not queries:
        # empty probe batches take pq_topk's empty-result early return
        # (the composed rerank path below would hand an empty
        # candidate set to the fetch machinery)
        return pq_topk(
            corpus_codes,
            rotated_q,
            codebooks,
            k_neighbors,
            id_col=id_col,
            codes_col=codes_col,
            rerank=rerank,
            vectors=vectors,
            vec_col=vec_col,
        )
    # shortlist under ROTATED queries, refine under the ORIGINALS:
    # pq_topk's fused rerank would hand rotated queries to the exact
    # stage too, mismatching the raw relation -- so the stages are
    # composed explicitly here
    if vectors is None:
        raise ValueError(
            "rerank requires the raw-vector relation (vectors=) to re-score"
        )
    shortlist = pq_topk(
        corpus_codes,
        rotated_q,
        codebooks,
        max(rerank, k_neighbors),
        id_col=id_col,
        codes_col=codes_col,
    )
    return exact_rerank_l2(
        shortlist, vectors, queries, k_neighbors,
        id_col=id_col, vec_col=vec_col,
    )


def write_opq_index(
    df: DataFrame,
    path: str,
    rotation: Sequence[Sequence[float]],
    codebooks: Sequence[Sequence[Sequence[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Materialize (id, codes) with BOTH the rotation and the
    codebooks stamped in the sidecar (codes are meaningless under any
    other pair -- same refusal contract as the whole index family)."""
    from xmidt_event_streams_spark.fsutil import write_json_sidecar
    from xmidt_event_streams_spark.operators.pq import _as_codebooks

    R = _as_rotation(rotation)
    cb = _as_codebooks(codebooks)
    opq_encode(df, rotation, codebooks, vec_col).select(
        id_col, "codes"
    ).write.mode("overwrite").parquet(path)
    write_json_sidecar(
        df.sparkSession,
        path,
        _OPQ_META_FILE,
        {
            "rotation": R.tolist(),
            "codebooks": cb.tolist(),
            "m": int(cb.shape[0]),
            "k": int(cb.shape[1]),
            "dsub": int(cb.shape[2]),
            "id_col": id_col,
        },
    )


def probe_opq_index(
    spark,
    path: str,
    queries: list[tuple[int, list[float]]],
    k_neighbors: int = 10,
    rerank: int | None = None,
    vectors: DataFrame | None = None,
    vec_col: str = "embedding",
) -> DataFrame:
    """ADC top-k against a materialized OPQ index under its stamped
    (rotation, codebooks). Missing sidecar raises, like every index
    in this package -- probing with foreign parameters computes
    garbage distances and is refused, never silent."""
    from xmidt_event_streams_spark.fsutil import read_json_sidecar

    meta = read_json_sidecar(spark, path, _OPQ_META_FILE)
    if meta is None:
        raise ValueError(
            f"no rotation/codebook sidecar at {path} (foreign index?): "
            "build with write_opq_index"
        )
    return opq_topk(
        spark.read.parquet(path),
        queries,
        meta["rotation"],
        meta["codebooks"],
        k_neighbors,
        id_col=meta["id_col"],
        rerank=rerank,
        vectors=vectors,
        vec_col=vec_col,
    )
