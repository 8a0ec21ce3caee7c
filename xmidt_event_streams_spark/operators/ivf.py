"""IVF (inverted-file) approximate nearest neighbor search.

The scale path for ANN over an embedding column when LSH recall is
too coarse: partition the corpus into ``n_cells`` Voronoi cells
around coarse centroids, then search only the ``n_probe`` cells
closest to each query.

Spark shape:
  * centroids are a tiny plan-time constant (here: deterministic --
    the first ``n_cells`` corpus vectors by id; in a real pipeline, a
    k-means fit). They are inlined as literal arrays, so...
  * ...cell assignment is a NARROW projection (argmax of cosine
    against each centroid, one pass, let-bound vector) -- at 100 TB
    the corpus is written partitioned/bucketed by ``cell`` and never
    reshuffled;
  * queries explode to their ``n_probe`` candidate cells and the
    probe is an equi-join on ``cell`` (broadcast: queries are small),
    followed by per-query top-k. Only ~n_probe/n_cells of the corpus
    is scored.

All similarity comparisons use cosine rounded to 6 dp before ranking
so ranking is engine-portable (same convention as brute_force_topk).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from xmidt_event_streams_spark.functions.text import let_bind
from xmidt_event_streams_spark.functions.vectors import as_double, cosine


def _cell_sim_structs(v: Column, centroids: list[list[float]]) -> Column:
    """array<struct<sim,rank,cell>> of rounded cosine vs each centroid;
    array_max picks highest sim, ties -> lowest cell id (rank)."""
    import math

    n = len(centroids)

    def dot_lit(vec: Column, c: list[float]) -> Column:
        return F.aggregate(
            F.zip_with(vec, F.array(*[F.lit(float(x)) for x in c]),
                       lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    def body(vec: Column) -> Column:
        vnorm = F.sqrt(
            F.aggregate(
                F.zip_with(vec, vec, lambda x, y: x * y),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
        )
        structs = []
        for i, c in enumerate(centroids):
            cnorm = math.sqrt(sum(x * x for x in c))
            d = vnorm * F.lit(cnorm)
            sim = F.when(d > 0, dot_lit(vec, c) / d).otherwise(F.lit(0.0))
            structs.append(
                F.struct(
                    F.round(sim, 6).alias("sim"),
                    F.lit(n - 1 - i).alias("rank"),
                    F.lit(i).alias("cell"),
                )
            )
        return F.array(*structs)

    return let_bind(as_double(v), body)


def assign_cells(
    df: DataFrame,
    centroids: list[list[float]],
    vec_col: str = "embedding",
    cell_col: str = "cell",
) -> DataFrame:
    """Narrow cell assignment: argmax cosine over the centroid list."""
    best = F.array_max(_cell_sim_structs(F.col(vec_col), centroids))
    return df.withColumn(cell_col, best["cell"])


def probe_cells(
    df: DataFrame,
    centroids: list[list[float]],
    n_probe: int,
    vec_col: str = "embedding",
    cell_col: str = "cell",
) -> DataFrame:
    """Explode each query row into its n_probe nearest cells."""
    sims = _cell_sim_structs(F.col(vec_col), centroids)
    top = F.slice(F.reverse(F.array_sort(sims)), 1, n_probe)
    return df.withColumn(cell_col, F.explode(F.transform(top, lambda s: s["cell"])))


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: list[list[float]],
    k: int = 5,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """ANN top-k searching only each query's n_probe nearest cells.

    Output: (query_id, vec_id, cos_sim, rank). Recall < 1 by
    construction (misses neighbors whose cell wasn't probed).
    """
    cb = assign_cells(corpus, centroids, vec_col)
    qb = probe_cells(
        queries.select(
            F.col(id_col).alias(query_id_col), F.col(vec_col).alias("_qvec")
        ),
        centroids,
        n_probe,
        "_qvec",
        cell_col="probe_cell",
    )
    scored = cb.join(
        F.broadcast(qb),
        (F.col("cell") == F.col("probe_cell"))
        & (F.col(id_col) != F.col(query_id_col)),
    ).select(
        F.col(query_id_col),
        F.col(id_col),
        F.round(cosine(vec_col, "_qvec"), 6).alias("cos_sim"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cos_sim").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "cos_sim", "rank")
    )
