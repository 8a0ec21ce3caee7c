"""Distributed connected components over duplicate-candidate pairs.

The missing last step of every dedup pipeline: LSH/verification tiers
emit PAIRS (a~b, b~c), but retention decisions need CLUSTERS ({a,b,c}
-> keep one canonical survivor). Transitivity is what makes this a
graph problem rather than another join.

Algorithm: min-label propagation (Pregel-style, expressed as DataFrame
joins). Every vertex starts labeled with its own id; each round every
vertex takes the min of its own and its neighbors' labels; fixpoint =
every vertex labeled with the min id of its component (that min id IS
the cluster id and the deterministic canonical survivor).

Scale shape (the part that matters at 100 TB):

  * per round: one equi-join (edges x labels, shuffle on vertex id)
    + one hash-agg (min label per vertex, map-side partials). No
    broadcast of anything unbounded, no driver materialization — the
    driver sees ONE scalar per round (the early-exit convergence
    probe).
  * rounds = component diameter. Near-dup graphs are the favorable
    case: LSH clusters are near-cliques (every member collides with
    most others in some band), so diameter is 1-3 and the loop runs
    2-4 rounds regardless of corpus size. The adversarial case (long
    chains) is bounded by ``max_rounds``; non-convergence raises
    rather than returning silently-partial clusters.
  * lineage per round is truncated by materializing each round's
    label relation (persist + the probe count); the loop carries no
    growing plan tree into the next round's optimizer pass.

Reference has no graph/dedup surface (SURVEY.md §2.8) — this is part
of the beyond-reference LLM-pipeline mandate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    out_id: str = "doc_id",
    out_label: str = "cluster_id",
    max_rounds: int = 25,
) -> DataFrame:
    """Label every vertex of the pair graph with the min vertex id of
    its connected component.

    Parameters
    ----------
    edges : undirected pair relation (``src``, ``dst``); parallel
        edges and self-loops are tolerated (deduped / no-ops).
    max_rounds : upper bound on propagation rounds (= max component
        diameter handled). Raises ``RuntimeError`` if the fixpoint is
        not reached — a silently partial clustering is worse than a
        loud failure.

    Returns (``out_id``, ``out_label``) for every vertex that appears
    in ``edges`` (singleton documents never enter the pair graph; the
    caller left-joins if it wants them labeled with themselves).
    """
    # Materialize the INPUT pair relation first, at the session's own
    # DOP: upstream of the edges is typically the expensive part (an
    # LSH candidate pipeline over the whole corpus) and must keep its
    # full parallelism. Everything after this point operates on the
    # pair graph, which is orders of magnitude smaller.
    pairs = edges.select(F.col(src).alias("u"), F.col(dst).alias("v")).persist()
    cached: list[DataFrame] = [pairs]  # everything persisted by this call
    keep: DataFrame | None = None  # the one relation the result needs

    def _label_sum(lab: DataFrame):
        # exact decimal sum: labels only ever DECREASE, so the sum is
        # strictly monotone while any vertex improves -- an unchanged
        # sum IS convergence. One single-row agg over the relation
        # being materialized anyway, vs. a new-vs-old join probe
        # (2 extra exchanges per round, measured ~2x round latency).
        return lab.agg(
            F.sum(F.col("lbl").cast("decimal(38,0)")).alias("s")
        ).collect()[0][0]

    try:
        n_edges = pairs.count()

        # Size the graph-machinery DOP from the MEASURED pair count: an
        # iterative loop pays the partition count as fixed scheduling
        # cost EVERY round (a 200-partition vanilla session spends
        # seconds of pure task scheduling per round on a 1k-row graph).
        # The DOP is applied per-operation via repartition(loop_dop, key)
        # -- never by mutating session conf, which would re-plan any
        # concurrent query on a shared session at the loop's tiny DOP.
        spark = edges.sparkSession
        session_dop = int(spark.conf.get("spark.sql.shuffle.partitions"))
        loop_dop = max(1, min(session_dop, n_edges // 500_000 + 1))

        # sym hash-partitioned on the join key u at loop_dop: every
        # round's edges-x-labels equi-join then needs no exchange on
        # the (persisted, larger) edge side.
        sym = (
            pairs.union(pairs.select(F.col("v"), F.col("u")))
            .filter(F.col("u") != F.col("v"))
            .distinct()
            .repartition(loop_dop, "u")
            .persist()
        )
        cached.append(sym)
        sym.count()
        pairs.unpersist()
        cached.remove(pairs)

        labels = (
            sym.select(F.col("u").alias("v"), F.col("u").alias("lbl"))
            .distinct()
            .repartition(loop_dop, "v")
            .persist()
        )
        cached.append(labels)
        prev_sum = _label_sum(labels)  # also materializes round-0 labels

        converged = False
        for _ in range(max_rounds):
            # propagate: u's label reaches each neighbor v; keep-own
            # via union
            nbr = sym.join(labels.withColumnRenamed("v", "u"), "u").select(
                "v", "lbl"
            )
            # one explicit exchange per round: co-locate on v at
            # loop_dop; the min-agg then runs exchange-free on the
            # already-clustered input.
            new_labels = (
                nbr.union(labels)
                .repartition(loop_dop, "v")
                .groupBy("v")
                .agg(F.min("lbl").alias("lbl"))
                .persist()
            )
            cached.append(new_labels)
            new_sum = _label_sum(new_labels)
            labels.unpersist()
            cached.remove(labels)
            labels = new_labels
            if new_sum == prev_sum:
                converged = True
                break
            prev_sum = new_sum

        if not converged:
            raise RuntimeError(
                f"connected_components did not converge in {max_rounds} rounds "
                "(component diameter exceeds max_rounds)"
            )
        # The final label relation stays persisted on success: it IS the
        # materialized result the returned DataFrame reads from (callers
        # unpersist via the session when done). Everything else -- and
        # everything, on any error -- is released in the finally.
        keep = labels
    finally:
        for df_ in cached:
            if df_ is not keep:
                df_.unpersist()
    return labels.select(
        F.col("v").alias(out_id), F.col("lbl").alias(out_label)
    )


def semdedup_survivors(
    df: DataFrame,
    centroids: list[list[float]],
    threshold: float,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_candidate_pairs: int | None = None,
) -> DataFrame:
    """Full SemDeDup retention pipeline (Abbas et al. 2023,
    arXiv:2303.09540) as one composition: cluster-then-verify
    near-duplicate pairs (similarity.clustered_near_dup_pairs; no
    nested-loop join) -> transitive closure (connected_components) ->
    one canonical survivor per semantic cluster.

    Returns (``id_col``, cluster_id, is_survivor) for every corpus
    row; downstream keeps ``is_survivor`` rows. Every stage is the
    documented 100 TB shape of its operator. ``max_candidate_pairs``
    enforces the pre-join degeneracy budget (raises
    ``CandidatePairBudgetExceeded`` with measured counts — see
    similarity.clustered_near_dup_pairs).
    """
    from xmidt_event_streams_spark.operators.similarity import (
        clustered_near_dup_pairs,
    )

    pairs = clustered_near_dup_pairs(
        df,
        centroids,
        threshold,
        n_probe,
        id_col,
        vec_col,
        max_candidate_pairs=max_candidate_pairs,
    )
    return dup_cluster_survivors(df, pairs, id_col=id_col)


def dup_cluster_survivors(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    prefer_col: str | None = None,
) -> DataFrame:
    """Retention verdict per document: its cluster id and whether it
    is the canonical survivor. One left join of the corpus against the
    (small) cluster relation — the shape you'd run right before
    writing the deduplicated corpus.

    ``prefer_col=None`` (default): survivor = the min-id member —
    free, because connected_components labels clusters BY their min
    id, so the verdict is a column comparison.

    ``prefer_col='score'``: survivor = the cluster member with the
    HIGHEST score, ties to the lowest id — the production refinement
    (RefinedWeb/FineWeb keep the longest/highest-quality copy of a
    duplicated page, not an arbitrary one). Costs one extra
    cluster-keyed window over only the CLUSTERED rows (singletons —
    the overwhelming majority — skip the window via the left join);
    deterministic under any partitioning. With a constant score it
    reduces exactly to the min-id rule (pytest-pinned).
    """
    clusters = connected_components(pairs, out_id=id_col)
    base = df.select(
        id_col, *([prefer_col] if prefer_col else [])
    ).join(clusters, id_col, "left")
    if prefer_col is None:
        return base.select(
            F.col(id_col),
            F.coalesce("cluster_id", F.col(id_col)).alias("cluster_id"),
            (F.coalesce("cluster_id", F.col(id_col)) == F.col(id_col)).alias(
                "is_survivor"
            ),
        )
    from pyspark.sql import Window

    w = Window.partitionBy("cluster_id").orderBy(
        F.col(prefer_col).desc_nulls_last(), F.col(id_col).asc()
    )
    clustered = (
        base.filter(F.col("cluster_id").isNotNull())
        .withColumn("_rk", F.row_number().over(w))
        .select(
            F.col(id_col),
            "cluster_id",
            (F.col("_rk") == 1).alias("is_survivor"),
        )
    )
    singletons = base.filter(F.col("cluster_id").isNull()).select(
        F.col(id_col),
        F.col(id_col).alias("cluster_id"),
        F.lit(True).alias("is_survivor"),
    )
    return clustered.unionByName(singletons)


def lexical_semdedup(
    df: DataFrame,
    threshold: float = 0.8,
    dim: int = 64,
    k: int | None = None,
    n_probe: int = 4,
    n_iters: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_candidate_pairs: int | None = 10_000_000,
    on_over_budget: str = "fallback",
    report: dict | None = None,
) -> DataFrame:
    """SemDeDup over LEXICAL vectors: the full semantic-dedup shape on
    a corpus that ships no embeddings column. Composition of three
    already-tested operators —

        tfidf_hashed_vectors (text -> L2 hashed TF-IDF, declared dim)
          -> kmeans_fit_portable (⌈√n⌉ cells by default — the
             registry's near-dup scale law)
          -> semdedup_survivors (cluster-verify pairs -> connected
             components -> min-id survivor)

    Returns (id, cluster_id, is_survivor) for every doc. Lexical
    cosine approximates n-gram Jaccard, so this is a cheaper, vector-
    stack-shaped alternative to MinHash clustering whose candidate
    cost follows the k-cell pruning law instead of band collisions;
    with real embeddings available, call semdedup_survivors directly.
    The ⌈√n⌉ default needs one count() (documented scalar); pass k
    to keep the plan action-free.

    DEGENERACY GUARD (enforced): the k-cell pruning law assumes the
    corpus has cosine structure to cluster. On a corpus where (nearly)
    EVERYTHING is pairwise similar -- one shared vocabulary,
    boilerplate-dominated text -- the hot cell holds most of the
    corpus and cluster-then-verify degenerates toward all-pairs (that
    is SemDeDup's contract, not this implementation's). Before the
    verify join ever runs, one cheap per-cell count agg measures the
    exact candidate volume against ``max_candidate_pairs``:

      * ``on_over_budget='fallback'`` (default): switch to the MinHash
        band path (`minhash_lsh_candidates` -> same survivor closure),
        whose candidate volume is bounded by BAND collisions (shared
        shingles, not mere vocabulary overlap). Same output schema.
      * ``on_over_budget='raise'``: propagate
        ``CandidatePairBudgetExceeded`` with the measured counts.

    Either way the decision is ledgered into ``report`` (pass a dict):
    ``{'path', 'candidate_pairs', 'budget', 'hottest_cell_n',
    'hottest_cell_frac'}`` -- the drop/fallback ledger, never a
    silent cap. ``max_candidate_pairs=None`` disables the guard
    (explicitly accepting the OOM risk this guard exists to prevent).
    """
    import math
    import warnings

    from xmidt_event_streams_spark.operators.ivf import kmeans_fit_portable
    from xmidt_event_streams_spark.operators.relevance import (
        tfidf_hashed_vectors,
    )
    from xmidt_event_streams_spark.operators.similarity import (
        CandidatePairBudgetExceeded,
    )

    if on_over_budget not in ("fallback", "raise"):
        raise ValueError(
            f"on_over_budget must be 'fallback' or 'raise', got {on_over_budget!r}"
        )

    # Eager localCheckpoint, not persist: the candidate stage self-joins
    # the vector relation with the k x dim centroid literals expanded on
    # BOTH sides, so a merely-cached plan still carries the full
    # tfidf -> assemble lineage into every downstream subtree --
    # observed to exhaust a default-sized (1g) local-mode driver at
    # 500 docs via plan/codegen volume alone. Checkpointing truncates
    # the lineage to a materialized relation (rows = ids + dim doubles,
    # tiny next to the text), so every downstream plan starts from a
    # leaf. Same per-node footprint story at cluster scale.
    vecs = tfidf_hashed_vectors(df, text_col, id_col, dim).localCheckpoint(
        eager=True
    )
    try:
        if k is None:
            k = max(2, math.ceil(math.sqrt(vecs.count())))
        cents = kmeans_fit_portable(
            vecs, k, n_iters=n_iters, vec_col="embedding", id_col=id_col
        )
        try:
            out = semdedup_survivors(
                vecs,
                cents,
                threshold,
                n_probe=n_probe,
                id_col=id_col,
                vec_col="embedding",
                max_candidate_pairs=max_candidate_pairs,
            ).persist()
            if report is not None:
                report.update({"path": "clustered", "budget": max_candidate_pairs})
        except CandidatePairBudgetExceeded as exc:
            ledger = {
                "path": "minhash_fallback",
                "candidate_pairs": exc.candidate_pairs,
                "budget": exc.budget,
                "hottest_cell_n": exc.hottest_cell_n,
                "hottest_cell_frac": (
                    exc.hottest_cell_n / exc.n_rows if exc.n_rows else 0.0
                ),
            }
            if report is not None:
                report.update(ledger)
            if on_over_budget == "raise":
                raise
            warnings.warn(
                f"lexical_semdedup: candidate budget exceeded ({exc.candidate_pairs}"
                f" > {exc.budget}); falling back to the MinHash band path. {ledger}",
                stacklevel=2,
            )
            from xmidt_event_streams_spark.functions.vectors import cosine_pairs
            from xmidt_event_streams_spark.operators.dedup import (
                minhash_lsh_candidates,
            )

            # Same threshold semantics, different candidate generator:
            # band-collision pairs (bounded by shared shingles) are
            # exact-verified against the SAME checkpointed tf-idf
            # vectors and cosine threshold, then closed transitively.
            cand = minhash_lsh_candidates(df, text_col=text_col, id_col=id_col)
            va = vecs.select(
                F.col(id_col).alias("id_a"), F.col("embedding").alias("_va")
            )
            vb = vecs.select(
                F.col(id_col).alias("id_b"), F.col("embedding").alias("_vb")
            )
            pairs = (
                cand.join(va, "id_a")
                .join(vb, "id_b")
                .select(
                    "id_a",
                    "id_b",
                    F.round(cosine_pairs("_va", "_vb"), 6).alias("cos_sim"),
                )
                .filter(F.col("cos_sim") >= threshold)
            )
            out = dup_cluster_survivors(df, pairs, id_col=id_col).persist()
        # materialize the verdict (id, cluster, bool -- corpus-ID-
        # sized) before releasing the checkpointed vectors; the caller
        # unpersists the result when done (the connected_components
        # labels contract)
        out.count()
        return out
    finally:
        vecs.unpersist()
