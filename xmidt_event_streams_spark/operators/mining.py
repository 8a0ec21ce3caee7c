"""Hard-negative mining for contrastive / embedding training data.

For each anchor, the hardest negatives are its nearest neighbors that
are NOT positives -- the pairs that carry the most gradient signal
(the in-batch-negatives literature's offline-mining variant, e.g.
RocketQA, arXiv:2010.08191). The operator is a composition over the
ANN stack:

    top-(k + overfetch) neighbors per anchor
      -> drop self-matches
      -> drop known positives (anchor, pos) pairs        [anti join]
      -> drop same-label rows when a label column exists [anti join]
      -> re-rank, keep k

Exclusions happen AFTER retrieval, so the retrieval layer stays
swappable: brute-force cosine here (exact, the default at corpus
sizes where it runs), or any materialized index probe producing
(query_id, vec_id, score) -- pass ``candidates`` to skip retrieval.

``overfetch`` bounds the miss risk: an anchor whose top-(k+overfetch)
is saturated by positives/same-label rows yields fewer than k
negatives; ``shortfall`` in the report makes that visible instead of
silent (no-silent-caps rule).

Scale shape: retrieval is the ANN family's cost (brute: broadcast
anchors, corpus never shuffles); the exclusion joins are left-anti
against broadcast-sized relations (positives: training-pair-sized;
labels ride the candidate rows via ONE join to the corpus
projection); one rank window keyed by anchor.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from xmidt_event_streams_spark.operators.similarity import brute_force_topk


def mine_hard_negatives(
    corpus: DataFrame,
    anchors: DataFrame,
    k: int = 10,
    positives: DataFrame | None = None,
    label_col: str | None = None,
    overfetch: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    candidates: DataFrame | None = None,
) -> DataFrame:
    """-> (anchor_id, neg_id, cos_sim, rank), rank 1..<=k per anchor.

    ``positives``: (anchor_id, pos_id) pairs to exclude (and their
    mirrored (pos, anchor) orientation is NOT assumed -- pass both
    orientations if your pair set is symmetric). ``label_col``: when
    set, negatives must carry a different label than the anchor
    (rows with NULL labels are never excluded by the label rule).
    ``candidates``: pre-computed (query_id, vec_id, cos_sim) from an
    index probe; otherwise exact brute-force retrieval runs."""
    if candidates is None:
        candidates = brute_force_topk(
            corpus, anchors, k=k + overfetch, id_col=id_col, vec_col=vec_col
        )
    cand = candidates.select(
        F.col("query_id").alias("anchor_id"),
        F.col(id_col).alias("neg_id"),
        "cos_sim",
    ).filter(F.col("anchor_id") != F.col("neg_id"))

    if positives is not None:
        pos = positives.select(
            F.col(positives.columns[0]).alias("anchor_id"),
            F.col(positives.columns[1]).alias("neg_id"),
        )
        cand = cand.join(F.broadcast(pos), ["anchor_id", "neg_id"], "left_anti")

    if label_col is not None:
        labels = corpus.select(
            F.col(id_col).alias("_lid"), F.col(label_col).alias("_lbl")
        )
        a_lbl = labels.select(
            F.col("_lid").alias("anchor_id"), F.col("_lbl").alias("_albl")
        )
        n_lbl = labels.select(
            F.col("_lid").alias("neg_id"), F.col("_lbl").alias("_nlbl")
        )
        cand = (
            cand.join(F.broadcast(a_lbl), "anchor_id", "left")
            .join(F.broadcast(n_lbl), "neg_id", "left")
            .filter(
                F.col("_albl").isNull()
                | F.col("_nlbl").isNull()
                | (F.col("_albl") != F.col("_nlbl"))
            )
            .drop("_albl", "_nlbl")
        )

    w = Window.partitionBy("anchor_id").orderBy(
        F.col("cos_sim").desc(), F.col("neg_id").asc()
    )
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("anchor_id", "neg_id", "cos_sim", "rank")
    )


def mining_report(mined: DataFrame, anchors: DataFrame, k: int,
                  id_col: str = "vec_id") -> DataFrame:
    """Shortfall ledger: one row per anchor with its mined negative
    count; anchors whose exclusions exhausted the overfetch (n < k)
    are the ones to re-mine with a larger overfetch."""
    per = mined.groupBy("anchor_id").agg(F.count("*").alias("n_negatives"))
    return (
        anchors.select(F.col(id_col).alias("anchor_id"))
        .join(per, "anchor_id", "left")
        .select(
            "anchor_id",
            F.coalesce("n_negatives", F.lit(0)).alias("n_negatives"),
            (F.coalesce("n_negatives", F.lit(0)) < k).alias("shortfall"),
        )
    )
