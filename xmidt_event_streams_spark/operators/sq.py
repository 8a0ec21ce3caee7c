"""Scalar quantization (SQ8): 1 byte per dimension, per-vector affine
bounds -- the refine-tier companion to PQ codes.

Where it sits in the ANN family: PQ codes (operators/pq.py,
operators/ivfpq.py) compress to ~1 bit/dim-class resolution and need
a refine stage to recover exact-ish ranking; SQ8 keeps 8 bits/dim
(64-dim float64 -> 64 bytes, 8x) with reconstruction error bounded by
half a quantization step per dimension -- small enough that re-ranking
a PQ shortlist by SQ8-reconstructed distance agrees with exact
re-ranking except on near-exact ties. That makes SQ8 the natural
IN-INDEX refine payload (the FAISS ``IVFPQ + RFlat/SQ`` refine
composition, from the published formulation: Jegou et al. TPAMI 2011
SS V's re-ranking stage with a compressed refine codec): store the
SQ8 bytes NEXT TO the PQ codes in the cell files, and the probe's own
scan returns the shortlist's refine vectors -- no second corpus scan,
no point-fetch job, zero extra Spark actions.

Encoding is per-vector affine (lo = min(v), step = (max(v)-lo)/255):
two float64 sidecar scalars per row instead of a trained per-dimension
codebook. Per-vector bounds are robust to distribution drift (nothing
to re-train on append) and cost 16 bytes/row -- the right trade for a
refine payload that is always read together with its row.

All kernels are numpy-vectorized over Arrow batches (no per-row Python
in the encode hot path beyond the final ``tobytes`` gather).

Beyond the refine payload, SQ8 is also a STANDALONE scan tier
(:func:`sq8_encode` + :func:`sq8_topk`): a brute-force top-k over the
compressed column reads 1/8th the bytes of the float64 scan at
near-exact recall -- the middle rung of the ANN byte ladder (raw 512
B/row exact, SQ8 64+16 B/row near-exact, PQ 8 B/row
quantization-limited). At 100 TB the scan is bandwidth-bound, so the
byte ratio IS the speedup for exhaustive (non-pruned) search.
"""

from __future__ import annotations

import numpy as np


def sq8_encode_block(
    mat: np.ndarray,
) -> tuple[list[bytes], np.ndarray, np.ndarray]:
    """(n, dim) float64 -> ([dim-byte strings], lo (n,), step (n,)).

    Constant vectors (max == min) take step = 1.0 and encode to all
    zeros -- decode returns the exact constant. Vectors containing
    non-finite values get step = 1.0 with non-finite bytes clipped
    into range; callers that must preserve NaN semantics should filter
    upstream (the ANN family's vector writers already null ragged/NaN
    rows)."""
    if mat.ndim != 2:
        raise ValueError(f"expected (n, dim), got shape {mat.shape}")
    lo = np.min(mat, axis=1)
    hi = np.max(mat, axis=1)
    ok = np.isfinite(lo) & np.isfinite(hi) & (hi > lo)
    lo = np.where(np.isfinite(lo), lo, 0.0)
    step = np.where(ok, (hi - lo) / 255.0, 1.0)
    # half-AWAY-from-zero rounding (floor(x+0.5) on the non-negative
    # quotient), matching SQL round() in DuckDB/ANSI -- np.rint's
    # half-to-even would flip the byte on exact half-step quotients
    # and break oracle parity one vector in ~2^53
    q = np.floor((mat - lo[:, None]) / step[:, None] + 0.5)
    q = np.clip(np.nan_to_num(q, nan=0.0, posinf=255.0, neginf=0.0), 0, 255)
    codes = q.astype(np.uint8)
    return [r.tobytes() for r in codes], lo, step


def sq8_decode_block(
    raw: list[bytes] | np.ndarray,
    lo: np.ndarray,
    step: np.ndarray,
) -> np.ndarray:
    """Inverse of :func:`sq8_encode_block`: -> (n, dim) float64 with
    ``lo + step * byte`` per dimension. Rows must share one dim (the
    write-side kernels enforce it)."""
    if len(raw) == 0:
        return np.zeros((0, 0))
    q = np.frombuffer(b"".join(raw), dtype=np.uint8).reshape(len(raw), -1)
    return (
        np.asarray(lo, dtype=np.float64)[:, None]
        + np.asarray(step, dtype=np.float64)[:, None] * q
    )


def sq8_max_abs_error(lo: np.ndarray, step: np.ndarray) -> np.ndarray:
    """Per-row bound on |v - decode(encode(v))| per dimension: half a
    step (round-to-nearest, half away from zero). Exposed for tests
    and for callers that want to reason about refine-vs-exact rank
    agreement."""
    return np.asarray(step, dtype=np.float64) / 2.0


def sq8_encode(df, vec_col: str = "embedding"):
    """Append the SQ8 columns (``sq8`` binary, ``sq8_lo``/``sq8_step``
    doubles) in one Arrow pass -- the standalone compressed-SCAN tier:
    where PQ codes buy ~64x byte reduction at quantization-limited
    recall and the raw scan is exact at full width, SQ8 sits between
    (8x at dim=64 float64, near-exact). Null/ragged vectors yield
    null columns, like pq_encode."""
    import pandas as pd
    from pyspark.sql import functions as F

    from xmidt_event_streams_spark.functions.vectors import _stack_masked

    first = df.select(
        F.col(vec_col).cast("array<double>").alias("_v")
    ).filter(F.col("_v").isNotNull()).limit(1).collect()
    if not first:
        raise ValueError(f"no non-null vectors in {vec_col}")
    dim = len(first[0][0])
    cols = [f.name for f in df.schema.fields]
    schema = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema.fields
    ) + ", `sq8` binary, `sq8_lo` double, `sq8_step` double"

    def _kernel(batches):
        for pdf in batches:
            n = len(pdf)
            sq = pd.Series([None] * n, dtype="object")
            lo_s = pd.Series([None] * n, dtype="object")
            st_s = pd.Series([None] * n, dtype="object")
            if n:
                mat, valid = _stack_masked(pdf[vec_col], dim=dim)
                if mat.shape[0]:
                    raw, lo, step = sq8_encode_block(mat)
                    idx = np.nonzero(valid)[0]
                    sq.iloc[idx] = raw
                    lo_s.iloc[idx] = list(lo)
                    st_s.iloc[idx] = list(step)
            out = {c: pdf[c] for c in cols}
            out["sq8"], out["sq8_lo"], out["sq8_step"] = sq, lo_s, st_s
            yield pd.DataFrame(out)

    return df.mapInPandas(_kernel, schema)


def sq8_topk(
    corpus_sq8,
    queries: list[tuple[int, list[float]]],
    k_neighbors: int = 10,
    id_col: str = "vec_id",
) -> "object":
    """Brute-force top-k in the SQ8 compressed domain: the scan
    decodes each Arrow batch (numpy affine, no Python per row) and
    ranks by squared L2 against the raw queries -- 1/8th the bytes of
    the float64 scan with reconstruction error bounded by half a step
    per dimension. Same shapes and contracts as pq_topk: queries are
    a small-by-contract driver list, the scan keeps map-side partial
    top-k per query (no full shuffle), ties to the lower id, rounded
    6dp distances, self-matches NOT excluded (the pq_topk contract).
    Output: query_id, {id_col}, sq8_dist, rank."""
    import pandas as pd
    from pyspark.sql import Window
    from pyspark.sql import functions as F
    from pyspark.sql.types import (
        DoubleType,
        IntegerType,
        LongType,
        StructField,
        StructType,
    )

    from xmidt_event_streams_spark.operators.pq import keep_top_by_dist_id

    spark = corpus_sq8.sparkSession
    if not queries:
        return spark.createDataFrame(
            [], f"query_id long, {id_col} long, sq8_dist double, rank int"
        )
    qids = np.asarray([int(q) for q, _ in queries], dtype=np.int64)
    Q = np.stack(
        [np.asarray(v, dtype=np.float64) for _, v in queries]
    )  # (nq, dim)
    q2 = np.einsum("ij,ij->i", Q, Q)

    out_schema = StructType(
        [
            StructField("query_id", LongType()),
            StructField(id_col, LongType()),
            StructField("sq8_dist", DoubleType()),
        ]
    )

    def _score(batches):
        best: dict = {}
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids = pdf[id_col].to_numpy()
            dec = sq8_decode_block(
                list(pdf["sq8"]),
                pdf["sq8_lo"].to_numpy(dtype="float64"),
                pdf["sq8_step"].to_numpy(dtype="float64"),
            )
            # ||d - q||^2 = ||d||^2 - 2 d.q + ||q||^2, one BLAS call
            # for the whole query batch (pq_topk's LUT-batch idea)
            d2 = np.einsum("ij,ij->i", dec, dec)
            dall = d2[:, None] - 2.0 * (dec @ Q.T) + q2[None, :]
            for qi in range(len(qids)):
                qid = int(qids[qi])
                d = dall[:, qi]
                cur_ids = ids
                if qid in best:
                    d = np.concatenate([best[qid][1], d])
                    cur_ids = np.concatenate([best[qid][0], cur_ids])
                best[qid] = keep_top_by_dist_id(cur_ids, d, k_neighbors)
        for qid, (ids_, d_) in best.items():
            yield pd.DataFrame(
                {
                    "query_id": np.full(len(ids_), qid, dtype=np.int64),
                    id_col: ids_,
                    "sq8_dist": d_,
                }
            )

    scored = (
        corpus_sq8.select(id_col, "sq8", "sq8_lo", "sq8_step")
        .filter(F.col("sq8").isNotNull())
        .mapInPandas(_score, out_schema)
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sq8_dist").asc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k_neighbors)
        .select(
            "query_id",
            id_col,
            F.round("sq8_dist", 6).alias("sq8_dist"),
            "rank",
        )
    )
