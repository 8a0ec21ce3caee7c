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
    q = np.rint((mat - lo[:, None]) / step[:, None])
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
    step (rint rounds to nearest). Exposed for tests and for callers
    that want to reason about refine-vs-exact rank agreement."""
    return np.asarray(step, dtype=np.float64) / 2.0
