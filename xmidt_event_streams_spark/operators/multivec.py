"""Late-interaction (multi-vector) similarity search: MaxSim top-k.

Single-vector search (similarity.py / ivf / pq) compresses a document
to ONE embedding; late-interaction retrieval keeps a small matrix of
per-token vectors per document and scores a query against a document
as the sum over query tokens of the best-matching document token:

    score(q, d) = sum_i  max_j  q_i . d_j

-- the MaxSim operator of the published late-interaction family
(Khattab & Zaharia, "ColBERT", SIGIR 2020; implemented here from the
formulation, with this package's plan discipline). For training-data
curation this is the retrieval shape used to mine hard
negatives/positives and to decontaminate against benchmark suites
whose hits single-vector cosine misses (a document matching a query
phrase-by-phrase but not holistically).

Spark shape, same contracts as the ANN family:

  * documents are rows of (id, array<array<double>> token vectors) --
    ragged row lengths allowed (token counts differ per doc);
  * queries are the small-by-contract driver-side list of
    (query_id, [token vectors]) -- their matrices ride the kernel
    closure like the PQ LUTs;
  * the scan is one shuffle-free mapInPandas pass: per Arrow batch,
    ALL document tokens are flattened into one (total_tokens, dim)
    matrix with doc offsets, scored against every query's token
    matrix in one BLAS call, and the per-document max over tokens is
    ONE ``np.maximum.reduceat`` over the doc boundaries -- no Python
    loop over documents;
  * map-side partial top-k per query (keep_top_by_dist_id over
    negated scores), then one rank window -- the exchange carries
    O(partitions x queries x k), never every (query, doc) pair.

Self-matches are NOT excluded (the pq_topk contract; callers filter
``doc_id != query_id`` when queries are corpus members). Scores are
rounded to 6 dp after ranking; ties rank to the LOWER doc id.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)


def maxsim_score_block(
    flat_tokens: np.ndarray,
    doc_starts: np.ndarray,
    Q: np.ndarray,
) -> np.ndarray:
    """(n_docs,) MaxSim scores for one query against a flattened
    document-token block: ``flat_tokens`` is (total_tokens, dim),
    ``doc_starts`` the first-token offset of each doc (ascending,
    starts[0] == 0), ``Q`` the query's (n_qtokens, dim) matrix.
    Exposed for tests (the kernel's exact arithmetic)."""
    if flat_tokens.shape[0] == 0 or Q.shape[0] == 0:
        return np.zeros(len(doc_starts))
    sims = flat_tokens @ Q.T  # (total_tokens, n_qtokens)
    per_doc_max = np.maximum.reduceat(sims, doc_starts, axis=0)
    return per_doc_max.sum(axis=1)


def maxsim_topk(
    docs: DataFrame,
    queries: list[tuple[int, list[list[float]]]],
    k_neighbors: int = 10,
    id_col: str = "doc_id",
    vecs_col: str = "token_vecs",
) -> DataFrame:
    """Late-interaction top-k: for each query (id, token matrix),
    the ``k_neighbors`` documents with the highest MaxSim score.
    Output: query_id, {id_col}, maxsim (descending = best), rank.
    Null/empty token lists score null-safe (the doc is skipped);
    ragged token DIMS within one document are the caller's bug and
    raise in the kernel (a wrong-dim token would silently zero-pad)."""
    import pandas as pd

    from xmidt_event_streams_spark.operators.pq import keep_top_by_dist_id

    spark = docs.sparkSession
    if not queries:
        return spark.createDataFrame(
            [], f"query_id long, {id_col} long, maxsim double, rank int"
        )
    qids = np.asarray([int(q) for q, _ in queries], dtype=np.int64)
    qmats = [np.asarray(m, dtype=np.float64) for _, m in queries]
    dim = qmats[0].shape[1]
    for qm in qmats:
        if qm.ndim != 2 or qm.shape[1] != dim:
            raise ValueError(
                f"query token matrices must share one dim; got "
                f"{[m.shape for m in qmats]}"
            )

    out_schema = StructType(
        [
            StructField("query_id", LongType()),
            StructField(id_col, LongType()),
            StructField("maxsim", DoubleType()),
        ]
    )

    def _score(batches):
        best: dict = {}
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids = []
            mats = []
            for i, toks in zip(pdf[id_col], pdf[vecs_col]):
                if toks is None or len(toks) == 0:
                    continue
                m = np.asarray(list(toks), dtype=np.float64)
                if m.ndim != 2 or m.shape[1] != dim:
                    raise ValueError(
                        f"doc {i}: token matrix shape {m.shape} does "
                        f"not match query dim {dim}"
                    )
                ids.append(int(i))
                mats.append(m)
            if not ids:
                continue
            flat = np.concatenate(mats, axis=0)
            lens = np.asarray([m.shape[0] for m in mats])
            starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
            ids_arr = np.asarray(ids, dtype=np.int64)
            for qi in range(len(qids)):
                scores = maxsim_score_block(flat, starts, qmats[qi])
                qid = int(qids[qi])
                # keep_top_by_dist_id keeps the SMALLEST: negate so
                # the best MaxSim wins, ties to the lower id. Round
                # to the 6dp grain BEFORE folding/ranking -- the
                # family convention (brute_force_topk, the refine
                # stages) and the DuckDB twin's ORDER BY, so boundary
                # ties resolve identically everywhere
                d = -np.round(scores, 6)
                cur_ids = ids_arr
                if qid in best:
                    d = np.concatenate([best[qid][1], d])
                    cur_ids = np.concatenate([best[qid][0], cur_ids])
                best[qid] = keep_top_by_dist_id(cur_ids, d, k_neighbors)
        for qid, (ids_, d_) in best.items():
            yield pd.DataFrame(
                {
                    "query_id": np.full(len(ids_), qid, dtype=np.int64),
                    id_col: ids_,
                    "maxsim": -d_,
                }
            )

    scored = (
        docs.select(id_col, vecs_col)
        .filter(F.col(vecs_col).isNotNull())
        .mapInPandas(_score, out_schema)
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("maxsim").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k_neighbors)
        .select(
            "query_id",
            id_col,
            F.round("maxsim", 6).alias("maxsim"),
            "rank",
        )
    )


def maxsim_rerank_topk(
    docs: DataFrame,
    queries: list[tuple[int, list[list[float]]]],
    k_neighbors: int = 10,
    prefilter_c: int = 100,
    id_col: str = "doc_id",
    vecs_col: str = "token_vecs",
    pooled_index_path: str | None = None,
    n_probe: int = 4,
) -> DataFrame:
    """The SCALE shape for late interaction (the published two-stage
    serving pattern: single-vector retrieve, multi-vector re-rank):

      1. RETRIEVE: each query's MEAN-pooled vector fetches a top-C
         shortlist from an IVF index over the documents' mean-pooled
         vectors (``pooled_index_path`` -- build once with
         ``ivf.write_ivf_index`` over ``pooled_tokens``); with no
         index, a brute pooled-cosine scan (correct, linear).
      2. RERANK: MaxSim scores ONLY the shortlist -- the candidate
         relation is C x n_queries rows fetched through the bounded-
         plan id machinery (fetch.fetch_by_ids), never a full
         multi-vector scan.

    At 100 TB stage 1 reads n_probe/n_cells of pooled vectors (dim
    floats/row) and stage 2 reads C*n_queries token MATRICES -- the
    expensive payload is only ever touched for candidates. Recall
    follows the pooled retriever's recall@C (MaxSim cannot recover a
    doc the shortlist never contained -- the same ceiling as the PQ
    refine stages, documented not hidden).

    Unlike :func:`maxsim_topk` (the pq_topk include-self contract),
    this operator EXCLUDES self-matches when query ids are corpus
    members: both retriever arms (brute_force_topk, probe_ivf_index)
    exclude them by their own contracts, so the shortlist never
    contains the query's own document -- the natural semantics for a
    retrieval stage.

    Output: query_id, {id_col}, maxsim, rank (per-query rank over the
    UNION of that query's shortlist)."""
    from xmidt_event_streams_spark.operators.fetch import fetch_by_ids

    spark = docs.sparkSession
    if not queries:
        return spark.createDataFrame(
            [], f"query_id long, {id_col} long, maxsim double, rank int"
        )
    pooled_q = [
        (qid, np.asarray(m, dtype=np.float64).mean(axis=0).tolist())
        for qid, m in queries
    ]
    if pooled_index_path is not None:
        from xmidt_event_streams_spark.operators.ivf import (
            probe_ivf_index,
        )

        qdf = spark.createDataFrame(
            [(int(q), v) for q, v in pooled_q],
            f"`{id_col}` long, `embedding` array<double>",
        )
        short = probe_ivf_index(
            spark,
            pooled_index_path,
            qdf,
            k=prefilter_c,
            n_probe=n_probe,
            id_col=id_col,
        ).select("query_id", id_col)
    else:
        from xmidt_event_streams_spark.operators.similarity import (
            brute_force_topk,
        )

        pooled_docs = pooled_tokens(docs, id_col, vecs_col)
        qdf = spark.createDataFrame(
            [(int(q), v) for q, v in pooled_q],
            f"`{id_col}` long, `embedding` array<double>",
        )
        short = brute_force_topk(
            pooled_docs, qdf, k=prefilter_c, id_col=id_col
        ).select("query_id", id_col)
    pairs = short.collect()  # C x n_queries by contract, driver-sized
    cand_ids = sorted({int(r[id_col]) for r in pairs})
    by_q: dict[int, set] = {}
    for r in pairs:
        by_q.setdefault(int(r["query_id"]), set()).add(int(r[id_col]))
    cand_docs = fetch_by_ids(docs, cand_ids, id_col=id_col).select(
        id_col, vecs_col
    )
    # score EVERY fetched candidate per query (k = the union size):
    # truncating to the union's top-C here could drop one query's
    # entire shortlist when another query's candidates outscore it --
    # the per-query membership join below is what narrows each query
    # to ITS shortlist, and the final window truncates to k
    scored = maxsim_topk(
        cand_docs,
        queries,
        k_neighbors=max(len(cand_ids), 1),
        id_col=id_col,
        vecs_col=vecs_col,
    )
    # restrict each query to ITS shortlist (the union fetch scored
    # every candidate against every query) and re-rank
    flat = [
        (q, sorted(ids)) for q, ids in sorted(by_q.items())
    ]
    memb = spark.createDataFrame(
        [(q, i) for q, ids in flat for i in ids],
        f"query_id long, `{id_col}` long",
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("maxsim").desc(), F.col(id_col).asc()
    )
    return (
        scored.join(F.broadcast(memb), ["query_id", id_col])
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k_neighbors)
        .select("query_id", id_col, "maxsim", "rank")
    )


def pooled_tokens(
    df: DataFrame,
    id_col: str = "doc_id",
    vecs_col: str = "token_vecs",
    out_col: str = "embedding",
) -> DataFrame:
    """Mean-pool the token matrix into one vector per document (pure
    JVM aggregate/transform -- no Python): the single-vector side of
    the two-stage serving pattern. Null/empty token lists pool to
    null."""
    v = F.col(vecs_col)
    n = F.size(v)
    summed = F.aggregate(
        v,
        F.expr(
            f"transform(element_at({vecs_col}, 1), x -> cast(0.0 as double))"
        ),
        lambda acc, t: F.zip_with(acc, t, lambda a, x: a + x),
    )
    pooled = F.when(
        v.isNotNull() & (n > 0),
        F.transform(summed, lambda x: x / n.cast("double")),
    )
    return df.select(F.col(id_col), pooled.alias(out_col))


def chunk_embedding_tokens(
    df: DataFrame,
    n_tokens: int,
    vec_col: str = "embedding",
    out_col: str = "token_vecs",
) -> DataFrame:
    """Derive a multi-vector column by slicing a single embedding into
    ``n_tokens`` contiguous sub-vectors -- pure JVM ``slice`` calls,
    no Python. Real pipelines store per-token encoder outputs; this
    deterministic derivation gives the MaxSim operator a testable,
    oracle-mirrorable input from the single-vector tables (DuckDB
    slices lists the same way)."""
    first = (
        df.select(F.size(F.col(vec_col).cast("array<double>")).alias("n"))
        .filter(F.col("n") > 0)
        .limit(1)
        .collect()
    )
    if not first:
        raise ValueError(f"no non-empty vectors in {vec_col}")
    dim = int(first[0]["n"])
    if dim % n_tokens:
        raise ValueError(f"dim {dim} not divisible by n_tokens={n_tokens}")
    sub = dim // n_tokens
    v = F.col(vec_col).cast("array<double>")
    return df.withColumn(
        out_col,
        F.array(
            *[F.slice(v, 1 + t * sub, sub) for t in range(n_tokens)]
        ),
    )


# ------------------------------------------------------------------
# In-index two-stage serving: the token matrices live IN the IVF
# cells (SQ8-quantized), so the multi-vector rerank reads ZERO bytes
# outside the probe's own scan -- the same pattern that made the
# single-vector rerank fetch-free (operators/ivfpq.py refine='sq8').
# ------------------------------------------------------------------

_MAXSIM_META_FILE = "_xes_maxsim_index_meta.json"


def _encode_tokens(
    docs,
    dim: int,
    id_col: str,
    vecs_col: str,
    centroids=None,
    max_cells: int | None = None,
):
    """(id, pooled embedding, SQ8 token payload) in one Arrow pass --
    the encode kernel write_maxsim_index and append_to_maxsim_index
    share. Poison rows (null/empty token lists, ragged dims) are
    skipped -- V9 containment, same posture as the vector writers.

    ``centroids`` switches on TOKEN-LEVEL cell assignment (the
    ColBERT/PLAID inverted-file shape, r10): the row gains a
    ``cells`` column holding the DISTINCT coarse cells of the doc's
    own tokens (6dp-rounded cosine argmax, the assign_cells
    contract), capped at the ``max_cells`` cells holding the MOST of
    the doc's tokens (ties to the lower cell id -- deterministic).
    The writer explodes on it, so the doc's payload rides in every
    cell any of its tokens points at: a query token probing that
    cell retrieves the doc even when its pooled mean lives elsewhere
    -- the recall past the pooled retriever's ceiling, paid for with
    a measured storage amplification of (mean distinct cells/doc)."""
    import pandas as pd

    from xmidt_event_streams_spark.operators.sq import sq8_encode_block

    enc_schema = (
        f"`{id_col}` long, `embedding` array<double>, `tok_sq8` binary, "
        "`tok_lo` array<double>, `tok_step` array<double>"
    )
    cmat = None
    if centroids is not None:
        cmat = np.asarray(centroids, dtype=np.float64)
        cn = np.maximum(np.sqrt((cmat * cmat).sum(axis=1)), 1e-300)
        enc_schema += ", `cells` array<int>"

    def _token_cells(m: np.ndarray) -> list[int]:
        tn = np.maximum(
            np.sqrt(np.einsum("ij,ij->i", m, m)), 1e-300
        )
        sims = np.round((m @ cmat.T) / np.outer(tn, cn), 6)
        owner = np.argmax(sims, axis=1)
        cells, counts = np.unique(owner, return_counts=True)
        if max_cells is not None and len(cells) > max_cells:
            # keep the cells holding the most tokens (ties -> lower
            # cell id): np.unique returns ascending cells, and a
            # stable sort on -counts preserves that tiebreak
            keep = np.argsort(-counts, kind="stable")[:max_cells]
            cells = cells[keep]
        return sorted(int(c) for c in cells)

    def _encode(batches):
        for pdf in batches:
            rows = {
                id_col: [], "embedding": [], "tok_sq8": [],
                "tok_lo": [], "tok_step": [],
            }
            if cmat is not None:
                rows["cells"] = []
            for i, toks in zip(pdf[id_col], pdf[vecs_col]):
                if toks is None or len(toks) == 0:
                    continue  # poison rows: no tokens -> not indexable
                try:
                    # intra-doc ragged token dims or null token entries
                    # make asarray itself raise (ValueError/TypeError on
                    # numpy>=1.24) BEFORE the shape check can run --
                    # catch here so one poison row can't kill the job
                    m = np.asarray(list(toks), dtype=np.float64)
                except (ValueError, TypeError):
                    continue  # ragged/null tokens: V9 containment, skip
                if m.ndim != 2 or m.shape[1] != dim:
                    continue  # ragged dim: V9 containment, skip
                raw, lo, step = sq8_encode_block(m)
                rows[id_col].append(int(i))
                rows["embedding"].append(m.mean(axis=0).tolist())
                rows["tok_sq8"].append(b"".join(raw))
                rows["tok_lo"].append([float(x) for x in lo])
                rows["tok_step"].append([float(x) for x in step])
                if cmat is not None:
                    rows["cells"].append(_token_cells(m))
            # explicit dtypes: an all-skipped batch would otherwise
            # default its empty list columns to float64 ndarrays,
            # which Arrow cannot convert to list<double>
            cols = {
                id_col: pd.Series(rows[id_col], dtype="int64"),
                "embedding": pd.Series(
                    rows["embedding"], dtype="object"
                ),
                "tok_sq8": pd.Series(rows["tok_sq8"], dtype="object"),
                "tok_lo": pd.Series(rows["tok_lo"], dtype="object"),
                "tok_step": pd.Series(
                    rows["tok_step"], dtype="object"
                ),
            }
            if cmat is not None:
                cols["cells"] = pd.Series(rows["cells"], dtype="object")
            yield pd.DataFrame(cols)

    return docs.select(id_col, vecs_col).mapInPandas(_encode, enc_schema)


def write_maxsim_index(
    docs: DataFrame,
    path: str,
    centroids: list[list[float]],
    id_col: str = "doc_id",
    vecs_col: str = "token_vecs",
    assign: str = "pooled",
    max_cells_per_doc: int = 4,
) -> None:
    """Materialize the late-interaction serving index: one IVF layout
    over the documents' MEAN-POOLED vectors, with each row carrying
    its token matrix as an SQ8 payload (``tok_sq8`` = the row-major
    token bytes, ``tok_lo``/``tok_step`` = per-TOKEN affine bounds --
    ragged token counts fine, ``size(tok_lo)`` is the count).

    Why in-index: :func:`maxsim_rerank_topk` pays a separate
    ``fetch_by_ids`` Spark job for the shortlist's token matrices --
    at 100 TB that is a second cluster round-trip per query batch.
    Here the probe's own cell scan returns the shortlist's tokens, so
    the two-stage search costs exactly the Spark jobs of a pooled-only
    probe (pytest pins the equality). Payload cost: dim bytes/token
    (8x smaller than float64) + 16 B/token bounds, read ONLY inside
    probed cells; pooled-only probes column-prune it away entirely.

    The layout is the package's standard cell-partitioned index
    (partitioned by ``cell``, id-sorted files, centroid sidecar, file
    manifest), so the shared machinery applies: manifest probes with
    zero listing jobs (ivf.read_probed_cells), compaction
    (ivf.compact_cell_index), takedown.

    ``assign='token'`` (r10, the ColBERT/PLAID inverted-file shape):
    instead of one row in the pooled mean's cell, the doc's payload
    is written into every DISTINCT cell its own tokens point at
    (capped at the ``max_cells_per_doc`` cells holding most of its
    tokens) -- so ``probe_maxsim_index(retrieval='token')`` retrieves
    a doc through any one strongly-matching token, past the pooled
    retriever's recall ceiling. Cost: storage amplification of
    (mean distinct cells/doc), stamped in the sidecar as
    ``row_amplification`` so the trade is visible; probes on this
    layout dedupe ids driver-side (exact scores make duplicates
    harmless) and widen their scan shortlists by the stamped cap so
    duplicates cannot crowd distinct docs out of a partition's
    partial top-k."""
    from xmidt_event_streams_spark.operators.ivf import (
        _sorted_by_id,
        assign_cells,
        refresh_files_manifest,
    )
    from xmidt_event_streams_spark.fsutil import write_json_sidecar

    first = (
        docs.select(
            F.size(F.element_at(F.col(vecs_col), 1)).alias("d")
        )
        .filter(F.col("d") > 0)
        .limit(1)
        .collect()
    )
    # cold-start seeding (the streaming-ingest contract shared with
    # write_ivf_index(df.limit(0), ...)): with zero rows the token
    # dim comes from the centroids -- pooled dim == token dim by
    # construction (pooling is a mean over tokens)
    dim = int(first[0]["d"]) if first else len(centroids[0])
    if assign not in ("pooled", "token"):
        raise ValueError(
            f"assign must be 'pooled' or 'token', got {assign!r}"
        )
    if assign == "token":
        encoded = _encode_tokens(
            docs, dim, id_col, vecs_col,
            centroids=centroids, max_cells=max_cells_per_doc,
        )
        assigned = encoded.select(
            *[c for c in encoded.columns if c != "cells"],
            F.explode("cells").alias("cell"),
        )
    else:
        encoded = _encode_tokens(docs, dim, id_col, vecs_col)
        assigned = assign_cells(encoded, centroids, "embedding")
    (
        _sorted_by_id(assigned.repartition(F.col("cell")), id_col)
        .write.partitionBy("cell")
        .mode("overwrite")
        .parquet(path)
    )
    # token-count stats from the WRITTEN index, not the source frame:
    # the probe's byte-aware driver-merge guard sizes carried payload
    # as mean_tokens x (dim + 16) bytes/row (a hardcoded constant
    # underestimates a ~100-token corpus ~25x), and counting the raw
    # docs would (a) include poison rows the encoder skipped and
    # (b) re-evaluate the whole source lineage for one agg (r10
    # review findings). One column-pruned scan of the fresh parquet;
    # cold-seed (zero files) stamps zeros.
    from xmidt_event_streams_spark.fsutil import count_data_files

    n_docs, mean_tokens, row_amp = 0, 0.0, None
    if count_data_files(docs.sparkSession, path):
        written = docs.sparkSession.read.parquet(path)
        stats_src = (
            written.dropDuplicates([id_col])
            if assign == "token"
            else written
        )
        st = stats_src.select(
            F.count(F.lit(1)).alias("n"),
            F.avg(F.size("tok_lo")).alias("mean_toks"),
        ).collect()[0]
        n_docs = int(st["n"] or 0)
        mean_tokens = float(st["mean_toks"] or 0.0)
        if assign == "token" and n_docs:
            # measured storage trade: index rows per source doc
            row_amp = round(written.count() / n_docs, 3)
    write_json_sidecar(
        docs.sparkSession,
        path,
        _MAXSIM_META_FILE,
        {
            "centroids": centroids,
            "id_col": id_col,
            "dim": dim,
            "n_docs": n_docs,
            "mean_tokens": mean_tokens,
            "assign": assign,
            "max_cells_per_doc": (
                max_cells_per_doc if assign == "token" else None
            ),
            "row_amplification": row_amp,
        },
    )
    refresh_files_manifest(docs.sparkSession, path)


def probe_maxsim_index(
    spark,
    path: str,
    queries: list[tuple[int, list[list[float]]]],
    k_neighbors: int = 10,
    n_probe: int = 4,
    prefilter_c: int = 100,
    pooled_only: bool = False,
    retrieval: str = "pooled",
) -> DataFrame:
    """Two-stage MaxSim search against a :func:`write_maxsim_index`
    layout, fetch-free:

      1. RETRIEVE: each query's mean-pooled vector probes its
         ``n_probe`` nearest cells (driver-side, static pruning; the
         probed cells' files come from the manifest -- no listing
         job) and the scan keeps a per-query top-``prefilter_c``
         shortlist by pooled cosine, CARRYING each candidate's SQ8
         token payload from the same scan.
      2. RERANK: driver-side numpy decodes the C x n_queries
         shortlist's token matrices and re-scores with exact MaxSim
         (sum over query tokens of the best-matching decoded doc
         token) -- zero additional Spark actions, the ivfpq
         refine='sq8' posture.

    ``pooled_only=True`` skips stage 2 and never selects the payload
    columns (the scan column-prunes them away): output
    (query_id, id, cos_sim, rank) -- the job-count twin the zero-
    extra-jobs pytest pin compares against.

    Self-matches (id == query_id) are excluded, the retrieval-stage
    contract shared with :func:`maxsim_rerank_topk`. Recall ceiling =
    the pooled retriever's recall@C (a doc the shortlist never held
    cannot be recovered), plus SQ8 reconstruction error on near-ties
    -- both documented, both measured in the bench sidecar.

    ``retrieval='token'`` (r10, the published ColBERT/PLAID
    candidate-generation shape re-expressed over this layout): stage
    1 probes the union of each QUERY TOKEN's ``n_probe`` nearest
    cells instead of the pooled vector's -- a doc whose pooled mean
    sits far from the query can still be retrieved through any one
    strongly-matching token -- and the scan scores candidates by
    EXACT MaxSim over the SQ8-decoded token payload it is already
    reading (``maxsim_score_block``, one segmented-max per cell
    batch). That lifts the pooled retriever's recall ceiling AND
    moves the rerank arithmetic into the executors: nothing but
    (query_id, id, score) rows ever reach the driver, so the carried-
    payload merge guard is moot on this arm. Cost: the scan decodes
    every probed row's tokens (vs one pooled dot), so wall grows with
    tokens/doc x query tokens -- the bench sidecar's frontier sweeps
    both arms; pick by the measured crossover.
    Output: query_id, {id_col}, maxsim, rank (maxsim descending)."""
    import pandas as pd

    from xmidt_event_streams_spark.fsutil import read_json_sidecar
    from xmidt_event_streams_spark.operators.ivf import (
        _nearest_cells_driver,
        read_probed_cells,
    )
    from xmidt_event_streams_spark.operators.ivfpq import (
        _DRIVER_MERGE_MAX_ROWS,
        _fold_into,
    )

    meta = read_json_sidecar(spark, path, _MAXSIM_META_FILE)
    if meta is None:
        raise ValueError(
            f"no maxsim sidecar at {path}: build with write_maxsim_index"
        )
    centroids = meta["centroids"]
    id_col = meta["id_col"]
    dim = int(meta["dim"])
    if not queries:
        out_cols = "cos_sim" if pooled_only else "maxsim"
        return spark.createDataFrame(
            [], f"query_id long, `{id_col}` long, {out_cols} double, rank int"
        )
    qmats = {
        int(qid): np.asarray(m, dtype=np.float64) for qid, m in queries
    }
    for qid, qm in qmats.items():
        if qm.ndim != 2 or qm.shape[1] != dim:
            raise ValueError(
                f"query {qid}: token matrix shape {qm.shape} does not "
                f"match index dim {dim}"
            )
    if retrieval not in ("pooled", "token"):
        raise ValueError(
            f"retrieval must be 'pooled' or 'token', got {retrieval!r}"
        )
    if retrieval == "token" and pooled_only:
        raise ValueError(
            "pooled_only=True contradicts retrieval='token' (the "
            "token arm's scan scores exact MaxSim, not pooled cosine)"
        )
    pooled = [(qid, qm.mean(axis=0)) for qid, qm in qmats.items()]
    if retrieval == "token":
        # one driver-side nearest-cells pass over ALL query tokens at
        # once (sum_q tokens_q rows x n_cells dots -- driver-sized by
        # the queries-are-a-driver-list contract), then a per-query
        # union of its tokens' probed cells
        qid_order = [qid for qid, _ in pooled]
        tok_counts = [qmats[qid].shape[0] for qid in qid_order]
        all_tok = np.concatenate([qmats[qid] for qid in qid_order])
        per_tok = _nearest_cells_driver(
            all_tok.tolist(), centroids, n_probe
        )
        cells_per_q = []
        at = 0
        for t in tok_counts:
            cells_per_q.append(
                sorted({int(c) for cs in per_tok[at : at + t] for c in cs})
            )
            at += t
    else:
        cells_per_q = _nearest_cells_driver(
            [v.tolist() for _, v in pooled], centroids, n_probe
        )
    # cell -> (query ids, stacked pooled unit vectors): one matmul
    # scores all of a cell's queries per batch (the LUT-batch idea)
    by_cell: dict[int, list[tuple[int, np.ndarray]]] = {}
    for (qid, qv), cells in zip(pooled, cells_per_q):
        nrm = np.linalg.norm(qv)
        unit = qv / nrm if nrm > 0 else qv
        for c in cells:
            by_cell.setdefault(int(c), []).append((qid, unit))
    qs_by_cell = {
        c: (
            np.asarray([q for q, _ in pairs], dtype=np.int64),
            np.stack([u for _, u in pairs]),
        )
        for c, pairs in by_cell.items()
    }

    token_mode = retrieval == "token"
    if token_mode:
        # cell -> (query ids, all their token matrices stacked, and
        # each query's [a, b) span in the stack): ONE flat @ Qcat.T
        # matmul + one segmented max scores every query that probed
        # the cell against all its rows in a batch
        tok_by_cell: dict[int, tuple] = {}
        _tacc: dict[int, list[tuple[int, np.ndarray]]] = {}
        for (qid, _qv), cells in zip(pooled, cells_per_q):
            for c in cells:
                _tacc.setdefault(int(c), []).append((qid, qmats[qid]))
        for c, pairs in _tacc.items():
            spans, at = [], 0
            for _qid, qm in pairs:
                spans.append((at, at + qm.shape[0]))
                at += qm.shape[0]
            tok_by_cell[c] = (
                np.asarray([q for q, _ in pairs], dtype=np.int64),
                np.concatenate([qm for _, qm in pairs]),
                spans,
            )

    # carry: the pooled arm hauls the shortlist's SQ8 payload to the
    # driver for stage-2 decode; the token arm's scan already scored
    # exact-over-SQ8 MaxSim, so only (query_id, id, score) ever moves
    carry = not pooled_only and not token_mode
    fields = [
        StructField("query_id", LongType()),
        StructField(id_col, LongType()),
        # holds pooled cosine on the pooled arm, exact-SQ8 MaxSim on
        # the token arm (one internal name keeps the merge kernels
        # shared); the OUTPUT column is renamed per arm below
        StructField("cos_sim", DoubleType()),
    ]
    if carry:
        from pyspark.sql.types import ArrayType, BinaryType

        fields += [
            StructField("tok_sq8", BinaryType()),
            StructField("tok_lo", ArrayType(DoubleType())),
            StructField("tok_step", ArrayType(DoubleType())),
        ]
    out_schema = StructType(fields)
    n_short = (
        k_neighbors
        if (pooled_only or token_mode)
        else max(prefilter_c, k_neighbors)
    )
    # token-ASSIGNED layout: one doc legitimately rides in up to
    # max_cells_per_doc cells, so a partition's partial top-k can
    # hold duplicates. Widening the fold by the stamped cap
    # guarantees >= n_short DISTINCT docs survive every partial
    # (duplicates carry identical exact scores); the driver merge
    # dedupes below. Pooled-assigned layouts keep width 1.
    dup_width = 1
    if meta.get("assign") == "token":
        dup_width = max(1, int(meta.get("max_cells_per_doc") or 1))
    n_short_kernel = n_short * dup_width

    def _score_token(batches):
        # exact-over-SQ8 MaxSim in the scan: decode each cell's rows
        # ONCE into a flat (total_tokens, dim) block, one matmul
        # against the cell's stacked query tokens, one segmented max
        # (np.maximum.reduceat -- the maxsim_score_block kernel shape,
        # widened to score all of a cell's queries per pass)
        best: dict = {}
        for pdf in batches:
            if len(pdf) == 0:
                continue
            cells = pdf["cell"].to_numpy()
            ids = pdf[id_col].to_numpy()
            sq8 = pdf["tok_sq8"].to_numpy()
            lo = pdf["tok_lo"].to_numpy()
            step = pdf["tok_step"].to_numpy()
            # iterate only the cells PRESENT in this batch: tasks are
            # per-cell (partitionBy layout), so looping the full
            # probed-cell map would run one all-False vectorized mask
            # per absent cell per batch -- O(probed_cells x rows)
            # wasted at wide probes (a token probe's union is
            # n_probe x total query tokens cells)
            for c in np.unique(cells):
                if int(c) not in tok_by_cell:
                    continue
                qids, Qcat, spans = tok_by_cell[int(c)]
                mask = cells == c
                sub_ids = ids[mask]
                sub_lo = lo[mask]
                lens = np.asarray([len(x) for x in sub_lo])
                starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
                q = np.frombuffer(
                    b"".join(bytes(b) for b in sq8[mask]), dtype=np.uint8
                ).reshape(int(lens.sum()), dim)
                lo_f = np.concatenate(
                    [np.asarray(x, dtype=np.float64) for x in sub_lo]
                )
                st_f = np.concatenate(
                    [np.asarray(x, dtype=np.float64) for x in step[mask]]
                )
                flat = lo_f[:, None] + st_f[:, None] * q
                sims = flat @ Qcat.T
                per_doc_max = np.maximum.reduceat(sims, starts, axis=0)
                for qi, qid in enumerate(qids):
                    a, b = spans[qi]
                    sc = np.round(
                        per_doc_max[:, a:b].sum(axis=1), 6
                    )
                    keep = sub_ids != qid  # retrieval contract
                    _fold_into(
                        best,
                        int(qid),
                        sub_ids[keep],
                        -sc[keep],  # fold keeps SMALLEST
                        n_short_kernel,
                    )
        for qid, kept in best.items():
            yield pd.DataFrame(
                {
                    "query_id": np.full(
                        len(kept[0]), qid, dtype=np.int64
                    ),
                    id_col: kept[0],
                    "cos_sim": -kept[1],
                }
            )

    def _score(batches):
        best: dict = {}
        for pdf in batches:
            if len(pdf) == 0:
                continue
            cells = pdf["cell"].to_numpy()
            ids = pdf[id_col].to_numpy()
            emb = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            nrm = np.linalg.norm(emb, axis=1)
            nrm[nrm == 0] = 1.0
            unit = emb / nrm[:, None]
            if carry:
                sq8 = pdf["tok_sq8"].to_numpy()
                lo = pdf["tok_lo"].to_numpy()
                step = pdf["tok_step"].to_numpy()
            for c, (qids, qunit) in qs_by_cell.items():
                mask = cells == c
                if not mask.any():
                    continue
                sub_ids = ids[mask]
                cmat = np.round(unit[mask] @ qunit.T, 6)  # (rows, q_c)
                if carry:
                    sub_extras = (sq8[mask], lo[mask], step[mask])
                for qi, qid in enumerate(qids):
                    keep = sub_ids != qid  # retrieval contract
                    extras = (
                        tuple(e[keep] for e in sub_extras) if carry else ()
                    )
                    _fold_into(
                        best,
                        int(qid),
                        sub_ids[keep],
                        -cmat[:, qi][keep],  # fold keeps SMALLEST
                        n_short_kernel,
                        extras,
                    )
        for qid, kept in best.items():
            cols = {
                "query_id": np.full(len(kept[0]), qid, dtype=np.int64),
                id_col: kept[0],
                "cos_sim": -kept[1],
            }
            if carry:
                cols["tok_sq8"] = pd.Series(kept[2], dtype="object")
                cols["tok_lo"] = pd.Series(list(kept[3]), dtype="object")
                cols["tok_step"] = pd.Series(list(kept[4]), dtype="object")
            yield pd.DataFrame(cols)

    probed = sorted({int(c) for cs in cells_per_q for c in cs})
    if token_mode:
        # the token arm never reads the pooled embedding column (its
        # scan scores from the payload alone) -- column-pruned away
        scan_cols = [id_col, "cell", "tok_sq8", "tok_lo", "tok_step"]
    else:
        scan_cols = [id_col, "cell", "embedding"]
        if carry:
            scan_cols += ["tok_sq8", "tok_lo", "tok_step"]
    base = (
        read_probed_cells(spark, path, probed)
        .filter(F.col("cell").isin(probed))
        .select(*scan_cols)
    )
    scored = base.mapInPandas(
        _score_token if token_mode else _score, out_schema
    )
    # driver merge guard, byte-aware like ivfpq's: a carried row is
    # ~(mean tokens x (dim + 16)) bytes, with mean tokens/doc read
    # from the sidecar stamped at write/append time (a hardcoded
    # constant underestimates a ~100-token late-interaction corpus by
    # ~25x); shortlist rows are bounded by C x queries x partitions
    n_scan_parts = base.rdd.getNumPartitions()
    row_cap = _DRIVER_MERGE_MAX_ROWS
    if carry:
        mean_toks = float(meta.get("mean_tokens") or 0.0) or 4.0
        row_bytes = max(1, int(mean_toks * (dim + 16)))
        row_cap = max(1, (_DRIVER_MERGE_MAX_ROWS * 24) // row_bytes)
    if n_scan_parts * len(queries) * n_short_kernel > row_cap:
        # fold partials to exactly queries x n_short rows BEFORE the
        # collect: the shuffle moves shortlist partials, not cells
        def _merge_partials(batches):
            best: dict = {}
            for pdf in batches:
                for qid, g in pdf.groupby("query_id"):
                    extras = (
                        (
                            g["tok_sq8"].to_numpy(),
                            g["tok_lo"].to_numpy(),
                            g["tok_step"].to_numpy(),
                        )
                        if carry
                        else ()
                    )
                    _fold_into(
                        best,
                        int(qid),
                        g[id_col].to_numpy(),
                        -g["cos_sim"].to_numpy(dtype="float64"),
                        n_short_kernel,
                        extras,
                    )
            for qid, kept in best.items():
                cols = {
                    "query_id": np.full(len(kept[0]), qid, dtype=np.int64),
                    id_col: kept[0],
                    "cos_sim": -kept[1],
                }
                if carry:
                    cols["tok_sq8"] = pd.Series(kept[2], dtype="object")
                    cols["tok_lo"] = pd.Series(list(kept[3]), dtype="object")
                    cols["tok_step"] = pd.Series(
                        list(kept[4]), dtype="object"
                    )
                yield pd.DataFrame(cols)

        scored = scored.repartition("query_id").mapInPandas(
            _merge_partials, out_schema
        )

    partials = scored.collect()
    merged: dict = {}
    for r in partials:
        payload = (
            (bytes(r["tok_sq8"]), list(r["tok_lo"]), list(r["tok_step"]))
            if carry
            else ()
        )
        merged.setdefault(int(r["query_id"]), []).append(
            (-float(r["cos_sim"]), int(r[id_col]), *payload)
        )
    if dup_width > 1:
        # token-assigned layout: the same id can arrive from several
        # probed cells with IDENTICAL exact scores -- keep one
        # (post-sort, so the kept entry is the ranking one)
        for qid, cand in merged.items():
            cand.sort()
            seen: set = set()
            merged[qid] = [
                c for c in cand
                if c[1] not in seen and not seen.add(c[1])
            ]

    if pooled_only or token_mode:
        # both arms are already finally-scored at the scan: pooled-
        # only by pooled cosine, the token arm by exact-SQ8 MaxSim
        out_col = "cos_sim" if pooled_only else "maxsim"
        rows_out = []
        for qid, cand in merged.items():
            cand.sort()
            rows_out.extend(
                (qid, cid, round(-negcos, 6), rank)
                for rank, (negcos, cid) in enumerate(
                    cand[:k_neighbors], start=1
                )
            )
        return spark.createDataFrame(
            rows_out,
            f"query_id long, `{id_col}` long, {out_col} double, rank int",
        )

    rows_out = []
    for qid, cand in merged.items():
        cand.sort()
        cand = cand[:n_short]
        # decode all candidates' tokens into one flat block and score
        # with the shared kernel -- one reduceat, no per-doc loop
        mats = []
        for _negcos, _cid, raw, lo, step in cand:
            t = len(lo)
            q = np.frombuffer(raw, dtype=np.uint8).reshape(t, dim)
            mats.append(
                np.asarray(lo)[:, None] + np.asarray(step)[:, None] * q
            )
        flat = np.concatenate(mats, axis=0)
        lens = np.asarray([m.shape[0] for m in mats])
        starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
        scores = np.round(
            maxsim_score_block(flat, starts, qmats[qid]), 6
        )
        order = sorted(
            range(len(cand)), key=lambda i: (-scores[i], cand[i][1])
        )[:k_neighbors]
        rows_out.extend(
            (qid, cand[i][1], float(scores[i]), rank)
            for rank, i in enumerate(order, start=1)
        )
    return spark.createDataFrame(
        rows_out, f"query_id long, `{id_col}` long, maxsim double, rank int"
    )


def compact_maxsim_index(
    spark, path: str, tombstones=None
) -> dict:
    """Compact/takedown for the MaxSim serving index via the shared
    cell-partitioned-index compactor (ivf.compact_cell_index): the
    layout is the family standard, so dedup-by-id, tombstone excision,
    one-file-per-cell rewrite, id-sort preservation, manifest
    regeneration and the atomic swap (with recover_swap crash
    recovery) all apply unchanged. ``tombstones`` = ids to remove
    (the right-to-be-forgotten path for indexed documents)."""
    from xmidt_event_streams_spark.fsutil import read_json_sidecar
    from xmidt_event_streams_spark.operators.ivf import (
        compact_cell_index,
    )

    meta = read_json_sidecar(spark, path, _MAXSIM_META_FILE)
    if meta is None:
        raise ValueError(
            f"no maxsim sidecar at {path}: not a write_maxsim_index "
            "layout"
        )
    token_assigned = meta.get("assign") == "token"
    stats = compact_cell_index(
        spark,
        path,
        meta,
        _MAXSIM_META_FILE,
        content_col="tok_sq8",
        id_col=meta["id_col"],
        tombstones=tombstones,
        # the inverted-file layout holds one row per (doc, token
        # cell) ON PURPOSE -- dedup on the pair, never id alone
        key_cols=(
            (meta["id_col"], "cell") if token_assigned else None
        ),
    )
    # restamp EXACT token-count stats from the compacted survivors
    # (append keeps a weighted running mean that can drift under
    # at-least-once replay; compaction is the natural resync point);
    # per-DOC stats, so the token-assigned layout drops its replicas
    from xmidt_event_streams_spark.fsutil import write_json_sidecar

    if stats["files_after"]:
        survivors = spark.read.parquet(path)
        if token_assigned:
            survivors = survivors.dropDuplicates([meta["id_col"]])
        exact = survivors.select(
            F.count(F.lit(1)).alias("n"),
            F.avg(F.size("tok_lo")).alias("mean_toks"),
        ).collect()[0]
        meta["n_docs"] = int(exact["n"] or 0)
        meta["mean_tokens"] = float(exact["mean_toks"] or 0.0)
    else:  # fully-tombstoned: a legitimate empty end state
        meta["n_docs"], meta["mean_tokens"] = 0, 0.0
    if token_assigned:
        # empty index -> None, never a stale pre-compaction value
        meta["row_amplification"] = (
            round(stats["rows_after"] / meta["n_docs"], 3)
            if meta["n_docs"]
            else None
        )
    write_json_sidecar(spark, path, _MAXSIM_META_FILE, meta)
    return stats


def append_to_maxsim_index(
    docs: DataFrame,
    path: str,
    id_col: str | None = None,
    vecs_col: str = "token_vecs",
    batch_id: int | None = None,
) -> None:
    """Fold a new document batch into an existing MaxSim index
    (append-only: existing cell files are never rewritten; cell
    assignment is a pure function of the STAMPED centroids, read from
    the sidecar and never supplied, so appended rows land in
    directories probes already prune to -- the IVF append contract).
    Batch-sized cost: one Arrow encode+assignment pass + per-cell
    appends; the index grows but is never rescanned. Centroid drift
    stays the documented caveat (rebuild via write_maxsim_index when
    occupancy drift alarms)."""
    from xmidt_event_streams_spark.fsutil import read_json_sidecar
    from xmidt_event_streams_spark.operators.ivf import (
        _sorted_by_id,
        assign_cells,
        refresh_files_manifest,
    )

    from xmidt_event_streams_spark.fsutil import write_json_sidecar

    spark = docs.sparkSession
    meta = read_json_sidecar(spark, path, _MAXSIM_META_FILE)
    if meta is None:
        raise ValueError(
            f"no maxsim sidecar at {path}: initialize with "
            "write_maxsim_index"
        )
    id_col = id_col or meta["id_col"]
    if id_col != meta["id_col"]:
        raise ValueError(
            f"index at {path} stores id_col={meta['id_col']!r}, "
            f"append supplied {id_col!r}"
        )
    if meta.get("assign") == "token":
        # token-assigned layout (see write_maxsim_index): the batch's
        # docs ride in every capped token cell, same as at build time
        encoded = _encode_tokens(
            docs, int(meta["dim"]), id_col, vecs_col,
            centroids=meta["centroids"],
            max_cells=meta.get("max_cells_per_doc"),
        )
        placed = encoded.select(
            *[c for c in encoded.columns if c != "cells"],
            F.explode("cells").alias("cell"),
        )
    else:
        encoded = _encode_tokens(
            docs, int(meta["dim"]), id_col, vecs_col
        )
        placed = assign_cells(encoded, meta["centroids"], "embedding")
    assigned = _sorted_by_id(
        placed.repartition(F.col("cell")),
        id_col,
    ).persist()  # two actions: the write + the touched-cell collect
    try:
        if batch_id is None:
            assigned.write.partitionBy("cell").mode("append").parquet(
                path
            )
        else:
            # streaming arm (the IVF append contract): sub-partition
            # by the checkpoint-deterministic batch id and dynamically
            # overwrite ONLY this batch's (cell, batch) partitions --
            # an at-least-once replay rewrites its own rows instead of
            # duplicating doc ids in search results
            (
                assigned.withColumn("_ingest_batch_id", F.lit(batch_id))
                .write.option("partitionOverwriteMode", "dynamic")
                .partitionBy("cell", "_ingest_batch_id")
                .mode("overwrite")
                .parquet(path)
            )
        touched = [
            int(r[0])
            for r in assigned.select("cell").distinct().collect()
            if r[0] is not None
        ]
        # per-DOC stats from the PERSISTED encoded batch (not the
        # source frame: that would re-evaluate the whole lineage for
        # one agg AND count poison rows the encoder skipped); the
        # token-assigned layout's replicas dedup on id first so they
        # cannot inflate n or bias the mean
        stats_src = assigned
        if meta.get("assign") == "token":
            stats_src = assigned.dropDuplicates([id_col])
        batch_stats = stats_src.select(
            F.count(F.lit(1)).alias("n"),
            F.avg(F.size("tok_lo")).alias("mean_toks"),
        ).collect()[0]
    finally:
        assigned.unpersist()
    # fold the batch into the stamped token-count stats (weighted
    # mean) so the probe's byte-aware merge guard tracks the corpus.
    # Under at-least-once streaming replay n_docs can over-count a
    # rewritten batch, but the MEAN -- the only field the guard uses
    # -- barely moves (the replayed batch has the same distribution);
    # compaction restamps exact counts.
    b_n = int(batch_stats["n"] or 0)
    if b_n > 0:
        old_n = int(meta.get("n_docs") or 0)
        old_mean = float(meta.get("mean_tokens") or 0.0)
        new_n = old_n + b_n
        meta["mean_tokens"] = (
            old_n * old_mean + b_n * float(batch_stats["mean_toks"])
        ) / new_n
        meta["n_docs"] = new_n
        write_json_sidecar(spark, path, _MAXSIM_META_FILE, meta)
    refresh_files_manifest(spark, path, touched)


def sync_maxsim_with_snapshot(
    spark,
    table_path: str,
    index_path: str,
    checkpoint_dir: str,
    vecs_col: str = "token_vecs",
    id_col: str = "doc_id",
    n_cells: int | None = None,
    n_iters: int = 3,
    max_polls: int = 1_000_000,
    assign: str = "pooled",
) -> dict:
    """Keep a MaxSim serving index caught up with a SNAPSHOT TABLE of
    multi-vector documents through the checkpointed change feed --
    the late-interaction tier joining the sync family (IVF, IVF-PQ,
    inverted index, MinHash). A document deleted from the snapshot
    table stops answering MaxSim probes at the next sync; an updated
    document's OLD token matrix compacts out before the new one folds
    in. Redelivery-convergent via the shared harness contract.

    Bootstrap (fresh checkpoint, absent index): fit sqrt(N) centroids
    on the pinned head's POOLED vectors and build. ``assign='token'``
    bootstraps the token-assigned (inverted-file) layout; the
    incremental appliers read the stamped assignment from the
    sidecar, so the follow path is identical either way (replica
    semantics handled by compact/append -- see write_maxsim_index)."""
    from xmidt_event_streams_spark.fsutil import read_json_sidecar
    from xmidt_event_streams_spark.operators.ivf import kmeans_fit
    from xmidt_event_streams_spark.operators.snapshots import (
        compact_then_append_interval,
        snapshot_read,
        sync_index_with_snapshot,
    )

    def _exists() -> bool:
        return (
            read_json_sidecar(spark, index_path, _MAXSIM_META_FILE)
            is not None
        )

    def _bootstrap(version: int) -> int:
        base = snapshot_read(spark, table_path, version=version).select(
            F.col(id_col), F.col(vecs_col)
        )
        n = base.count()
        cells = n_cells if n_cells is not None else max(1, int(n**0.5))
        pooled = pooled_tokens(base, id_col, vecs_col).filter(
            F.col("embedding").isNotNull()
        )
        cents = kmeans_fit(
            pooled, min(cells, max(n, 1)), n_iters, id_col=id_col
        )
        write_maxsim_index(
            base, index_path, cents, id_col, vecs_col, assign=assign
        )
        return n

    def _apply(ch):
        return compact_then_append_interval(
            ch,
            id_col,
            vecs_col,
            compact_fn=lambda stale: compact_maxsim_index(
                spark, index_path, tombstones=stale
            ),
            append_fn=lambda fresh: append_to_maxsim_index(
                fresh, index_path, id_col=id_col, vecs_col=vecs_col
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
