"""Distributed two-sided k-NN join: top-k neighbors in ``corpus``
for EVERY row of a large ``queries`` relation.

Every other retrieval path in the ANN stack (brute_force_topk, the
LSH/IVF/PQ index probes) assumes the query set is SMALL -- the query
vectors ride the kernel closure or a driver-side probe list. That is
the search regime. The *join* regime is different: building a kNN
graph over the whole corpus (SemDeDup-style semantic dedup, Abbas et
al. arXiv:2303.09540), mining hard negatives for millions of anchors
(RocketQA, arXiv:2010.08191), or linking two releases of an embedding
table -- both relations are corpus-sized and neither fits in a task
closure.

The shape here is the IVF-partitioned block join:

    fit coarse centroids (kmeans_fit_portable, k x dim on the driver)
      corpus  -> its 1 nearest cell        [narrow Arrow matmul]
      queries -> their n_probe nearest cells, exploded
      -> cogroup on (cell, salt): one BLAS matmul per group,
         PARTIAL top-k per query inside the group
      -> global per-query top-k over the n_probe x salt x k partials

Scale analysis (the 100 TB contract):
  * each side shuffles ONCE, keyed by cell -- queries carry an
    n_probe x salt replication factor (explicit cost lever), the
    corpus is never replicated and never broadcast;
  * the matmul is Arrow-batched numpy inside cogroup-applyInPandas;
    scored pairs NEVER hit a shuffle -- only the k-bounded partials
    (<= n_probe * cell_salt * k rows per query) reach the final rank
    window, the same partial-top-k discipline as brute_force_topk;
  * per-task memory is one cell's corpus slice + that cell's queries
    (~ rows_in_cell x dim x 8 bytes each side). Hot cells are the
    skew risk: ``cell_salt=s`` splits every cell s ways (corpus rows
    hash-salted, queries replicated to all s sub-cells), bounding the
    slice at ~|cell|/s rows for the salt-side relation;
  * recall: with ``n_probe = len(centroids)`` every (query, corpus)
    pair shares >= 1 group and the join is EXACT (the block-nested
    arm an oracle can replay); with n_probe < cells it is the usual
    IVF recall/cost trade, floor-pinned by test_knn_join.py.

No reference analog (the reference has no vector surface, SURVEY
§2.8) -- this is the LLM-data-pipeline mandate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from xmidt_event_streams_spark.operators.ivf import assign_cells, probe_cells
from xmidt_event_streams_spark.operators.similarity import _topk_by_query


def knn_join(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: list[list[float]],
    k: int = 10,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str | None = None,
    query_vec_col: str | None = None,
    cell_salt: int = 1,
    exclude_self: bool = False,
) -> DataFrame:
    """-> (query_id, <id_col>, cos_sim, rank), rank 1..<=k per query.

    ``query_id_col`` / ``query_vec_col`` name the id/vector columns IN
    ``queries`` (defaulting to ``id_col`` / ``vec_col``); the output
    query column is always ``query_id`` -- pass the corpus itself
    (with ``exclude_self=True``) to build the corpus kNN graph.
    Scores are cosine rounded to 6dp, ties broken by corpus id
    ascending -- identical to brute_force_topk, so the two arms are
    interchangeable downstream. Null / dim-mismatched vectors on
    either side produce no pairs (poison-row posture of the family).

    A query row can appear in fewer than ``k`` output rows only when
    its probed cells hold fewer than k corpus rows -- with
    ``n_probe = len(centroids)`` exactly when the corpus itself has
    fewer than k eligible rows.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if not 1 <= n_probe <= len(centroids):
        raise ValueError(
            f"n_probe must be in [1, {len(centroids)}], got {n_probe}"
        )
    if cell_salt < 1:
        raise ValueError(f"cell_salt must be >= 1, got {cell_salt}")
    if id_col == "query_id":
        raise ValueError("id_col may not be 'query_id' (output collision)")
    qid_in = query_id_col or id_col
    qv = query_vec_col or vec_col

    # corpus: one cell per row, plus a stable hash salt sub-cell
    c = assign_cells(
        corpus.select(
            F.col(id_col).alias("_cid"), F.col(vec_col).alias("_cv")
        ),
        centroids,
        vec_col="_cv",
        cell_col="_cell",
    ).withColumn("_salt", F.pmod(F.xxhash64(F.col("_cid")), F.lit(cell_salt)))

    # queries: exploded to n_probe cells x cell_salt sub-cells
    q = probe_cells(
        queries.select(
            F.col(qid_in).alias("_qid"), F.col(qv).alias("_qv")
        ),
        centroids,
        n_probe=n_probe,
        vec_col="_qv",
        cell_col="_cell",
    )
    if cell_salt > 1:
        q = q.withColumn(
            "_salt",
            F.explode(F.array([F.lit(s) for s in range(cell_salt)])),
        )
    else:
        q = q.withColumn("_salt", F.lit(0).cast("bigint"))

    import numpy as np
    import pandas as pd
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    out_schema = StructType(
        [
            StructField("query_id", LongType()),
            StructField(id_col, LongType()),
            StructField("cos_sim", DoubleType()),
        ]
    )
    kk = int(k)
    excl = bool(exclude_self)

    def _score_group(left: pd.DataFrame, right: pd.DataFrame):
        # left = queries probing this (cell, salt); right = corpus slice
        if len(left) == 0 or len(right) == 0:
            return pd.DataFrame(
                {"query_id": [], id_col: [], "cos_sim": []}
            ).astype({"query_id": "int64", id_col: "int64", "cos_sim": "float64"})
        cvecs = right["_cv"].tolist()
        dims = {len(v) for v in cvecs if v is not None}
        dim = max(dims) if dims else 0
        cvalid = np.array(
            [v is not None and len(v) == dim for v in cvecs], dtype=bool
        )
        qvecs = left["_qv"].tolist()
        qvalid = np.array(
            [v is not None and len(v) == dim for v in qvecs], dtype=bool
        )
        if dim == 0 or not cvalid.any() or not qvalid.any():
            return pd.DataFrame(
                {"query_id": [], id_col: [], "cos_sim": []}
            ).astype({"query_id": "int64", id_col: "int64", "cos_sim": "float64"})
        ci = np.nonzero(cvalid)[0]
        qi = np.nonzero(qvalid)[0]
        cmat = np.vstack([cvecs[i] for i in ci]).astype(np.float64)
        qmat = np.vstack([qvecs[i] for i in qi]).astype(np.float64)
        cids = right["_cid"].to_numpy()[ci]
        qids = left["_qid"].to_numpy()[qi]
        cn = np.sqrt(np.einsum("ij,ij->i", cmat, cmat))
        qn = np.sqrt(np.einsum("ij,ij->i", qmat, qmat))
        den = np.outer(qn, cn)
        sims = np.round(
            np.where(den > 0, (qmat @ cmat.T) / np.where(den > 0, den, 1.0), 0.0),
            6,
        )
        frames = []
        for j in range(len(qids)):
            s, i_ = sims[j], cids
            if excl:
                m = i_ != qids[j]
                s, i_ = s[m], i_[m]
            if len(s) > kk:
                keep = np.lexsort((i_, -s))[:kk]
                s, i_ = s[keep], i_[keep]
            frames.append(
                pd.DataFrame(
                    {
                        "query_id": np.full(len(i_), qids[j], dtype=np.int64),
                        id_col: i_.astype(np.int64),
                        "cos_sim": s,
                    }
                )
            )
        return pd.concat(frames, ignore_index=True)

    scored = (
        q.groupBy("_cell", "_salt")
        .cogroup(c.groupBy("_cell", "_salt"))
        .applyInPandas(lambda left, right: _score_group(left, right), out_schema)
    )
    # a query probing multiple cells may see the same corpus row only
    # once (corpus rows live in exactly one (cell, salt)), so the
    # partials are disjoint per query -- the global rank is a pure
    # merge of <= n_probe * cell_salt * k rows per query
    return _topk_by_query(scored, kk, "query_id", id_col)


def knn_graph_survivors(
    df: DataFrame,
    centroids: list[list[float]],
    threshold: float,
    k: int = 10,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cell_salt: int = 1,
    prefer_col: str | None = None,
) -> DataFrame:
    """Semantic dedup over the corpus kNN graph: self-knn_join ->
    keep edges with cos_sim >= threshold -> connected components ->
    one survivor per cluster (components.dup_cluster_survivors,
    min-id or ``prefer_col``-best). Returns (id, cluster_id,
    is_survivor) for every corpus row.

    This is the STRUCTURALLY BOUNDED alternative to the
    cluster-then-verify SemDeDup arms (semdedup_survivors /
    lexical_semdedup): candidate volume is <= n x k by construction
    -- a corpus with no cosine structure (every row in one hot
    k-means cell, the shape that degenerates cluster-then-verify
    toward all-pairs and trips its pair budget) still produces
    exactly n x k scored candidates here, because top-k truncation
    happens INSIDE the cogroup kernel before anything shuffles. The
    trade is recall at high duplicate multiplicity: a row with more
    than k above-threshold duplicates emits edges to only its k
    nearest, and the cluster is recovered only through transitive
    chains (usually, not provably). For takedown-grade exhaustive
    pair discovery use the verified cluster arms; for corpus curation
    at unknown dirtiness this arm cannot blow up.

    ``prefer_col`` keeps the highest-scoring cluster member instead
    of the min id (the RefinedWeb keep-best refinement) -- the column
    must exist on ``df``.
    """
    from xmidt_event_streams_spark.operators.components import (
        dup_cluster_survivors,
    )

    pairs = (
        knn_join(
            df,
            df,
            centroids,
            k=k,
            n_probe=n_probe,
            id_col=id_col,
            vec_col=vec_col,
            cell_salt=cell_salt,
            exclude_self=True,
        )
        .filter(F.col("cos_sim") >= threshold)
        .select(
            F.col("query_id").alias("id_a"), F.col(id_col).alias("id_b")
        )
    )
    return dup_cluster_survivors(
        df, pairs, id_col=id_col, prefer_col=prefer_col
    )
