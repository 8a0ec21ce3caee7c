"""IVF (inverted-file) approximate nearest neighbor search.

The scale path for ANN over an embedding column when LSH recall is
too coarse: partition the corpus into ``n_cells`` Voronoi cells
around coarse centroids, then search only the ``n_probe`` cells
closest to each query.

Spark shape:
  * centroids are a tiny plan-time constant (here: deterministic --
    the first ``n_cells`` corpus vectors by id; in a real pipeline, a
    k-means fit). They ride along in the Arrow kernel's closure (the
    moral equivalent of a broadcast variable), so...
  * ...cell assignment is a NARROW projection (one batch-matrix @
    centroid-matrix matmul per Arrow batch, argmax per row) -- at
    100 TB the corpus is written partitioned/bucketed by ``cell`` and
    never reshuffled;
  * queries explode to their ``n_probe`` candidate cells and the
    probe is an equi-join on ``cell`` (broadcast: queries are small),
    followed by per-query top-k. Only ~n_probe/n_cells of the corpus
    is scored.

All similarity comparisons use cosine rounded to 6 dp before ranking
so ranking is engine-portable (same convention as brute_force_topk;
ties -> lowest cell / lowest id).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from xmidt_event_streams_spark.fsutil import (
    count_data_files,
    hadoop_fs,
    read_json_sidecar,
    swap_into_place,
    write_json_sidecar,
)
from xmidt_event_streams_spark.functions.vectors import cosine_pairs, nearest_cells
from xmidt_event_streams_spark.operators.similarity import collect_query_rows

_IVF_META_FILE = "_xes_ivf_index_meta.json"

# cell -> [relative data file path, ...] manifest, maintained by every
# writer (build / append / compact) -- the snapshot table's manifest
# pattern (operators/snapshots.py) applied to the vector indexes: a
# probe opens EXACTLY the probed cells' files instead of listing
# directories. Why it matters: passing leaf DIRS to spark.read still
# lists each one, and above spark.sql.sources.
# parallelPartitionDiscovery.threshold (default 32) that listing is
# itself a Spark JOB (one task per directory, ~3 s of fixed cost per
# probe at sqrt(N) cell counts -- the cost that kept the rerank arms
# below 1x brute at bench scale); at 100 TB on an object store a
# per-probe LIST over hundreds of thousands of index files is a real
# latency/cost hit, while a manifest read is one GET.
_IVF_FILES_FILE = "_xes_index_files.json"


def _list_cell_files(
    spark,
    path: str,
    cells: list[int] | None = None,
    part_col: str = "cell",
) -> dict[str, list[str]]:
    """partition value -> sorted [root-relative data file path, ...]
    from ONE recursive filesystem listing of the given partitions'
    directories (all ``{part_col}=`` dirs when ``cells`` is None).
    Write-side cost, paid once per build/append/compact, so probes
    never list anything. Generic over the partition column: the IVF
    tiers partition by ``cell``, the LSH index by ``bucket``."""
    fs, _, jvm = hadoop_fs(spark, path)
    root = path.rstrip("/")
    qroot = fs.makeQualified(
        jvm.org.apache.hadoop.fs.Path(root)
    ).toString().rstrip("/")
    rp = jvm.org.apache.hadoop.fs.Path(root)
    prefix = f"{part_col}="
    if cells is None:
        if not fs.exists(rp):
            return {}
        dirs = [
            st.getPath()
            for st in fs.listStatus(rp)
            if st.isDirectory()
            and st.getPath().getName().startswith(prefix)
        ]
    else:
        dirs = []
        for c in cells:
            p = jvm.org.apache.hadoop.fs.Path(
                f"{root}/{prefix}{int(c)}"
            )
            if fs.exists(p):
                dirs.append(p)
    out: dict[str, list[str]] = {}
    for d in dirs:
        cell = d.getName().split("=", 1)[1]
        files = []
        it = fs.listFiles(d, True)
        while it.hasNext():
            fp = it.next().getPath().toString()
            if fp.endswith(".parquet"):
                files.append(
                    fp[len(qroot) + 1 :] if fp.startswith(qroot) else fp
                )
        if files:
            out[cell] = sorted(files)
    return out


def refresh_files_manifest(
    spark,
    path: str,
    cells: list[int] | None = None,
    part_col: str = "cell",
) -> None:
    """Bring the file manifest up to date with the filesystem:
    ``cells`` replaces just those cells' entries (the append shape --
    the listing touches only the appended-to directories), None
    rebuilds the whole manifest (build/compact, or migrating a
    pre-manifest index). Single-writer, like every index mutation in
    this package (appends are checkpoint-serialized, compaction runs
    in the maintenance window)."""
    if cells is None:
        by_cell = _list_cell_files(spark, path, part_col=part_col)
    else:
        man = read_json_sidecar(spark, path, _IVF_FILES_FILE)
        if man is None:  # pre-manifest index: one-time full migration
            by_cell = _list_cell_files(spark, path, part_col=part_col)
        else:
            by_cell = man["cells"]
            fresh = _list_cell_files(
                spark, path, cells, part_col=part_col
            )
            for c in cells:
                key = str(int(c))
                if key in fresh:
                    by_cell[key] = fresh[key]
                else:
                    by_cell.pop(key, None)
    write_json_sidecar(
        spark,
        path,
        _IVF_FILES_FILE,
        {"part_col": part_col, "cells": by_cell},
    )


def _read_files_direct(spark, root: str, files: list[str]):
    """Read an explicit data-file list with ``basePath`` (partition
    columns recovered from the paths) and the parallel-discovery
    threshold raised past the file count for this one resolution, so
    Spark stats the files driver-side instead of launching a listing
    JOB -- the whole point of the manifest is that no probe-time
    Spark job runs before the scan itself.

    The threshold is a session conf set around the (eager) file-index
    resolution and restored in ``finally`` -- the same posture as
    ``fetch.arrow_collect_pandas``. Probes are driver-orchestrated
    and serialized in this package's contracts; two sessions-sharing
    threads racing this window could interleave restores (one driver
    thread per probe stream is the supported shape)."""
    key = "spark.sql.sources.parallelPartitionDiscovery.threshold"
    prev = spark.conf.get(key, None)
    spark.conf.set(key, str(max(len(files) + 1, 64)))
    try:
        return spark.read.option("basePath", root).parquet(*files)
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)


def kmeans_fit(
    df: DataFrame,
    k: int,
    n_iters: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> list[list[float]]:
    """Distributed spherical k-means for IVF coarse centroids.

    Lloyd iterations, Spark-shaped: each round is one NARROW cell
    assignment (Arrow matmul against the current centroids) plus one
    aggregate of per-(cell, dim) means (posexplode -> groupBy -- the
    same k x dim-bounded shuffle as similarity.centroids_by). The
    driver only ever materializes k x dim floats per round; the corpus
    never leaves the executors, so the fit scales to any corpus size.

    Deterministic: init = first ``k`` vectors by id; assignment ties
    break to the lowest cell (nearest_cells). Cells that lose all
    members keep their previous centroid. Cosine assignment + mean
    update = spherical k-means (cosine is scale-invariant, so the
    un-normalized mean is an equivalent representative).
    """
    from pyspark.sql import functions as F  # local alias for clarity

    cents = [
        r[0]
        for r in df.orderBy(id_col)
        .limit(k)
        .select(F.col(vec_col).cast("array<double>"))
        .collect()
    ]
    for _ in range(n_iters):
        assigned = assign_cells(df, cents, vec_col)
        per_dim = (
            assigned.select(
                "cell", F.posexplode(F.col(vec_col).cast("array<double>"))
            )
            .groupBy("cell", "pos")
            .agg(F.avg("col").alias("v"))
            .collect()
        )
        new = {c: list(cents[c]) for c in range(k)}
        for row in per_dim:
            new[row["cell"]][row["pos"]] = row["v"]
        cents = [new[c] for c in range(k)]
    return cents


def kmeans_fit_portable(
    df: DataFrame,
    k: int,
    n_iters: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    grid_dp: int = 4,
) -> list[list[float]]:
    """Spherical k-means whose result is bit-reproducible across
    engines (the fit an exact SQL oracle can replay), unlike
    :func:`kmeans_fit`, whose float means depend on partition-level
    summation order.

    The trick is keeping every intermediate value on a decimal grid
    coarse enough that float noise cannot move it:

      * inputs are quantized to ``grid_dp`` decimals (round half-up:
        identical in any engine, since raw values never sit exactly on
        a half-grid boundary);
      * each centroid update is the per-dimension SUM of its members'
        quantized components, rounded back to ``grid_dp``. The true
        sum lies exactly on the grid, and double summation error
        (~1e-13) is far below half a grid step (5e-5), so the rounded
        sum is the exact decimal regardless of summation order. The
        un-normalized sum points the same direction as the mean, and
        cosine assignment is scale-invariant — so skipping the divide
        loses nothing and avoids decimal-division rule mismatches;
      * assignments rank cosine rounded to 6dp, ties to the lowest
        cell (nearest_cells' contract, same as SQL
        ``ORDER BY sim DESC, cell``).

    Same Spark shape as kmeans_fit: per round one narrow Arrow
    cell-assignment plus one k x dim-bounded aggregate; the driver
    holds k x dim floats. Init = first ``k`` quantized vectors by id;
    cells that lose all members keep their previous centroid.
    """
    q = df.select(
        F.col(id_col).alias("_id"),
        F.transform(
            F.col(vec_col).cast("array<double>"), lambda x: F.round(x, grid_dp)
        ).alias("_qv"),
    ).persist()
    try:
        cents = [
            list(r[0]) for r in q.orderBy("_id").limit(k).select("_qv").collect()
        ]
        for _ in range(n_iters):
            assigned = q.withColumn("_cell", nearest_cells("_qv", cents, 1)[0])
            per_dim = (
                assigned.select("_cell", F.posexplode("_qv"))
                .groupBy("_cell", "pos")
                .agg(F.round(F.sum("col"), grid_dp).alias("s"))
                .collect()
            )
            new = {c: list(cents[c]) for c in range(len(cents))}
            for row in per_dim:
                new[row["_cell"]][row["pos"]] = row["s"]
            cents = [new[c] for c in range(len(cents))]
    finally:
        q.unpersist()
    return cents


def assign_cells(
    df: DataFrame,
    centroids: list[list[float]],
    vec_col: str = "embedding",
    cell_col: str = "cell",
) -> DataFrame:
    """Narrow cell assignment: argmax cosine over the centroid list."""
    return df.withColumn(cell_col, nearest_cells(vec_col, centroids, 1)[0])


def probe_cells(
    df: DataFrame,
    centroids: list[list[float]],
    n_probe: int = 2,
    vec_col: str = "embedding",
    cell_col: str = "cell",
) -> DataFrame:
    """Explode each query row into its n_probe nearest cells."""
    return df.withColumn(
        cell_col, F.explode(nearest_cells(vec_col, centroids, n_probe))
    )


def _sorted_by_id(assigned: DataFrame, id_col: str = "vec_id") -> DataFrame:
    """Sort each writer task's rows by the id column when present:
    files whose row groups hold contiguous id runs make the
    point-fetch path's pushed-down id ranges prune at row-group grain
    (operators/fetch.py write contract) -- rerank candidate fetches
    and takedown probes become point scans instead of index scans. A
    per-partition sort, no extra shuffle."""
    if id_col not in assigned.columns:
        return assigned
    return assigned.sortWithinPartitions("cell", id_col)


def write_ivf_index(
    df: DataFrame,
    path: str,
    centroids: list[list[float]],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> None:
    """Materialize the IVF index: corpus written PARTITIONED BY its
    coarse cell (one directory per cell, one writer task per cell via
    the repartition -- no small-file explosion). This is the layout
    that makes the n_probe/n_cells cost claim physical: a probe reads
    only the probed cells' directories (partition pruning), the other
    (n_cells - n_probe)/n_cells of a 100 TB corpus is never scanned.
    Mirrors similarity.write_lsh_index. The CENTROIDS are stamped into
    a JSON sidecar (fsutil, Hadoop FS -- object-store safe): cell
    assignment is meaningless under any other centroid set, so the
    probe can load them (``centroids=None``) or verify the ones it
    was handed, instead of silently searching the wrong cells."""
    # persist around the two actions (write + occupancy agg): the
    # assignment kernel would otherwise run the full scan + argmax
    # twice, doubling index-build cost
    assigned = assign_cells(df, centroids, vec_col).persist()
    try:
        (
            _sorted_by_id(assigned.repartition(F.col("cell")), id_col)
            .write.partitionBy("cell")
            .mode("overwrite")
            .parquet(path)
        )
        # fit-time cell histogram, the ivf_occupancy_drift baseline.
        # Computed from the assignment plan (k-bounded collect);
        # assignment is a pure function of the stamped centroids, so
        # this equals the written layout -- and unlike a read-back it
        # works for the empty cold-start init (zero data files).
        occupancy = {
            str(r["cell"]): r["n"]
            for r in assigned.groupBy("cell")
            .agg(F.count("*").alias("n"))
            .collect()
        }
    finally:
        assigned.unpersist()
    write_json_sidecar(
        df.sparkSession,
        path,
        _IVF_META_FILE,
        {
            "centroids": centroids,
            "vec_col": vec_col,
            "occupancy": occupancy,
        },
    )
    # file manifest: probes open these files directly (no per-probe
    # directory listing -- see _IVF_FILES_FILE)
    refresh_files_manifest(df.sparkSession, path)


def read_probed_cells(
    spark, path: str, cells: list[int], part_col: str = "cell"
) -> DataFrame:
    """Read ONLY the probed cells' data of a cell-partitioned index,
    with ``basePath`` so ``cell`` (and any sub-partition columns,
    e.g. the streaming layout's ``_ingest_batch_id``) stay partition
    columns.

    MANIFESTED index (every index this package writes): the file
    manifest maps each probed cell to its exact data files, which are
    opened DIRECTLY -- no directory listing at all, and no listing
    Spark job (``_read_files_direct``; the job was ~3 s of fixed cost
    per probe at 1,414 cells, more than the pruned scan itself, and
    the reason the rerank arms measured below 1x brute at bench
    scale). Cells absent from the manifest hold no rows and cost
    nothing; an empty probed file set returns an empty relation with
    the index schema when the manifest lists any file, else raises.

    FOREIGN/legacy index (no file manifest): fall back to passing the
    probed cells' leaf directories -- still never the root (the root
    read must LIST every cell directory before pruning can happen;
    probed-dirs-only is O(n_probe) filesystem calls). Cells with no
    directory are skipped; an empty probe set returns an empty
    relation with the index schema when at least one cell dir exists,
    else raises (nothing to infer a schema from -- a cold index
    should be probed through its sidecar-stamped reader instead)."""
    root = path.rstrip("/")
    man = read_json_sidecar(spark, path, _IVF_FILES_FILE)
    if man is not None:
        by_cell = man["cells"]

        def _abs(rel: str) -> str:
            # entries are root-relative, EXCEPT when the lister could
            # not strip a differently-qualified URI (viewfs mounts,
            # authority normalization) and stored the absolute path --
            # re-prefixing those would double the root
            if "://" in rel or rel.startswith("/"):
                return rel
            return f"{root}/{rel}"

        files = [
            _abs(rel)
            for c in cells
            for rel in by_cell.get(str(int(c)), [])
        ]
        if files:
            return _read_files_direct(spark, root, files)
        any_rel = next((fl[0] for fl in by_cell.values() if fl), None)
        if any_rel is None:
            raise ValueError(
                f"IVF index at {path} holds no data files"
            )
        return _read_files_direct(
            spark, root, [_abs(any_rel)]
        ).limit(0)
    fs, _, jvm = hadoop_fs(spark, path)
    dirs = [f"{root}/{part_col}={int(c)}" for c in cells]
    if dirs:
        # optimistic read first: a per-dir exists() pre-check costs a
        # py4j round trip per cell (~1 s at 256 probed cells); a cell
        # with no rows under this centroid set (hence no directory)
        # is the rare case, handled by the fallback filter below
        try:
            return spark.read.option("basePath", root).parquet(*dirs)
        except Exception:
            dirs = [
                d
                for d in dirs
                if fs.exists(jvm.org.apache.hadoop.fs.Path(d))
            ]
    if not dirs:
        any_dir = [
            st.getPath().toString()
            for st in fs.listStatus(jvm.org.apache.hadoop.fs.Path(root))
            if st.isDirectory()
            and st.getPath().getName().startswith(f"{part_col}=")
        ][:1]
        if not any_dir:
            raise ValueError(
                f"index at {path} holds no {part_col}= directories"
            )
        return (
            spark.read.option("basePath", root)
            .parquet(*any_dir)
            .limit(0)
        )
    return spark.read.option("basePath", root).parquet(*dirs)


def _nearest_cells_driver(vecs, centroids, n_probe):
    """Driver-side twin of functions.vectors.nearest_cells (same 6dp
    rounding, same stable-argsort tie-to-lowest-cell rule) for the
    collected query set."""
    import numpy as np

    m = np.asarray(vecs, dtype=np.float64)
    cm = np.asarray(centroids, dtype=np.float64)
    cn = np.sqrt((cm * cm).sum(axis=1))
    vn = np.sqrt(np.einsum("ij,ij->i", m, m))
    den = np.outer(vn, cn)
    sims = np.where(den > 0, (m @ cm.T) / np.where(den > 0, den, 1.0), 0.0)
    order = np.argsort(-np.round(sims, 6), axis=1, kind="stable")
    return order[:, :n_probe].tolist()


def probe_ivf_index(
    spark,
    path: str,
    queries: DataFrame,
    centroids: list[list[float]] | None = None,
    k: int = 5,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """IVF ANN top-k against a materialized index with a STATIC
    partition filter: the query set is small by contract (it is
    broadcast for scoring anyway), so its vectors are collected once
    and probe cells computed driver-side -- the probed cell set then
    prunes the index scan at PLAN time (``PartitionFilters`` carries
    the IN-list; pytest asserts it). Plan-time pruning is strictly
    stronger than dynamic partition pruning here, which the
    nondeterministic-marked Arrow kernel on the probe side would
    block anyway. Only the probed cells' directories are read or
    scored. Same semantics and tie rules as :func:`ivf_topk` (pytest
    pins the equivalence).

    ``centroids=None`` loads the centroid set stamped by
    :func:`write_ivf_index`; passing centroids that differ from the
    stamped set raises (cell ids are meaningless under any other
    centroids -- the probe would silently search the wrong
    directories)."""
    meta = read_json_sidecar(spark, path, _IVF_META_FILE)
    if centroids is None:
        if meta is None:
            raise ValueError(
                f"no centroid sidecar at {path} (foreign index?): pass "
                "centroids explicitly"
            )
        centroids = meta["centroids"]
    elif meta is not None and meta["centroids"] != [
        [float(x) for x in c] for c in centroids
    ]:
        raise ValueError(
            f"IVF index at {path} was built with different centroids "
            f"(k={len(meta['centroids'])}) than the probe supplied "
            f"(k={len(centroids)})"
        )
    rows = collect_query_rows(
        queries.select(F.col(id_col), F.col(vec_col).cast("array<double>"))
    )
    cells_per_q = _nearest_cells_driver([r[1] for r in rows], centroids, n_probe)
    qb = spark.createDataFrame(
        [
            (r[0], r[1], int(c))
            for r, cs in zip(rows, cells_per_q)
            for c in cs
        ],
        f"{query_id_col} long, _qvec array<double>, probe_cell int",
    )
    probed = sorted({int(c) for cs in cells_per_q for c in cs})
    corpus = read_probed_cells(spark, path, probed).filter(
        F.col("cell").isin(probed)
    )
    scored = corpus.join(
        F.broadcast(qb),
        (F.col("cell") == F.col("probe_cell"))
        & (F.col(id_col) != F.col(query_id_col)),
    ).select(
        F.col(query_id_col),
        F.col(id_col),
        F.round(cosine_pairs(vec_col, "_qvec"), 6).alias("cos_sim"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cos_sim").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "cos_sim", "rank")
    )


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
    """IVF ANN search: corpus assigned to cells (narrow), queries
    probe their n_probe nearest cells, cosine top-k within the union.

    Output: (query_id, vec_id, cos_sim, rank). Recall < 1 by
    construction (misses neighbors whose cell wasn't probed).

    Physical shape (r10): ONE fused Arrow kernel over the corpus --
    per batch: centroid argmax (cell assignment), probe-set
    membership mask per query, cosine scores, and a PARTIAL top-k
    fold per query (kept by the final window's own (rounded score
    desc, id asc) order, so boundary ties are preserved) -- then the
    rank window over O(partitions x queries x k) rows. The previous
    shape ran THREE JVM->Python boundaries sequentially (corpus
    assignment kernel, query probe kernel materialized into a
    broadcast, pair-scoring kernel above the join) and shuffled every
    scored (corpus x query) pair into the window; the fused kernel
    pays the Python boundary once and the exchange carries only the
    partial winners -- same contract as brute_force_topk, of which
    this is the cell-masked variant. Queries are small by contract
    (their vectors ride the kernel closure, as they already did via
    the broadcast). Semantics unchanged and pinned by the oracle row:
    6dp-rounded cosine, ties to lowest id, self-match excluded,
    invalid vectors (null / dim mismatch) carry no cell and score
    nothing; probe cells use the same stable-argsort
    tie-to-lowest-cell rule as functions.vectors.nearest_cells.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import (
        DoubleType,
        IntegralType,
        LongType,
        StructField,
        StructType,
    )

    # The kernel's id arrays and output schema are int64: validate the
    # contract on the INPUT schema instead of failing opaquely inside
    # the Arrow conversion (r10 ADVICE -- string ids need the generic
    # probe path, probe_ivf_index/lsh, not this fused kernel).
    for side, rel in (("queries", queries), ("corpus", corpus)):
        id_type = rel.schema[id_col].dataType
        if not isinstance(id_type, IntegralType):
            raise TypeError(
                f"ivf_topk requires integral {id_col!r} ids "
                f"({side} side has {id_type.simpleString()})"
            )
    cmat = np.asarray(centroids, dtype=np.float64)
    cnorm = np.sqrt((cmat * cmat).sum(axis=1))
    # Invalid query rows (null vector / dimension mismatch with the
    # centroid space) carry no probe cells and score nothing -- the
    # masking behavior of the pre-fusion probe_cells/cosine_pairs
    # path (r10 ADVICE); filtered BEFORE the bounded driver collect.
    qrows = collect_query_rows(
        queries.select(F.col(id_col), F.col(vec_col)).filter(
            F.col(vec_col).isNotNull()
            & (F.size(vec_col) == cmat.shape[1])
        )
    )
    qids = [int(r[0]) for r in qrows]
    qmat = np.asarray([list(r[1]) for r in qrows], dtype=np.float64)
    dim = qmat.shape[1] if len(qrows) else 0
    qnorm = np.sqrt((qmat * qmat).sum(axis=1)) if len(qrows) else None
    probe_sets = [
        frozenset(int(c) for c in cs)
        for cs in _nearest_cells_driver(
            [list(r[1]) for r in qrows], centroids, n_probe
        )
    ] if qrows else []

    out_schema = StructType(
        [
            StructField(query_id_col, LongType()),
            StructField(id_col, LongType()),
            StructField("cos_sim", DoubleType()),
        ]
    )

    def _score(batches):
        best: dict = {}
        for pdf in batches:
            if len(pdf) == 0:
                continue
            vecs = pdf[vec_col].tolist()
            valid = np.array(
                [v is not None and len(v) == cmat.shape[1] for v in vecs],
                dtype=bool,
            )
            if not valid.any():
                continue
            idx = np.nonzero(valid)[0]
            mat = np.vstack([vecs[i] for i in idx]).astype(np.float64)
            ids = pdf[id_col].to_numpy()[idx]
            vn = np.sqrt(np.einsum("ij,ij->i", mat, mat))
            # cell assignment: argmax of the 6dp-rounded cosine
            # (np.argmax returns the FIRST maximal index = the
            # nearest_cells(n_probe=1) tie rule)
            cden = np.outer(vn, cnorm)
            csims = np.round(
                np.where(cden > 0, (mat @ cmat.T) / np.where(cden > 0, cden, 1.0), 0.0),
                6,
            )
            cells = np.argmax(csims, axis=1)
            if dim and cmat.shape[1] == dim:
                qden = vn[:, None] * qnorm[None, :]
                raw = np.where(
                    qden > 0, (mat @ qmat.T) / np.where(qden > 0, qden, 1.0), 0.0
                )
                # HALF_UP to 6dp, matching F.round on the probe path
                # whose equivalence the tests pin (r10 ADVICE:
                # np.round's half-to-even can diverge on scaled
                # half-points). Sign-aware: HALF_UP = half away from
                # zero for either sign.
                qsims = np.sign(raw) * np.floor(np.abs(raw) * 1e6 + 0.5) / 1e6
                for j, qid in enumerate(qids):
                    mask = np.isin(cells, list(probe_sets[j])) & (ids != qid)
                    s, i_ = qsims[mask, j], ids[mask]
                    if qid in best:
                        s = np.concatenate([best[qid][1], s])
                        i_ = np.concatenate([best[qid][0], i_])
                    if len(s) > k:
                        keep = np.lexsort((i_, -s))[:k]
                        s, i_ = s[keep], i_[keep]
                    best[qid] = (i_, s)
        for qid, (i_, s) in best.items():
            yield pd.DataFrame(
                {
                    query_id_col: np.full(len(i_), qid, dtype=np.int64),
                    id_col: i_,
                    "cos_sim": s,
                }
            )

    scored = corpus.select(id_col, vec_col).mapInPandas(_score, out_schema)
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cos_sim").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "cos_sim", "rank")
    )


def append_to_ivf_index(
    df: DataFrame,
    path: str,
    vec_col: str | None = None,
    batch_id: int | None = None,
    id_col: str = "vec_id",
) -> None:
    """Fold a new vector batch into an existing IVF index (append-only
    -- existing cell files are never rewritten; cell assignment is a
    pure function of the stamped centroids, so appended rows land in
    the same directories probes already prune to).

    The centroids are READ from the index sidecar, never supplied:
    assigning new vectors under any other centroid set would scatter
    them into directories probes won't search. Batch-sized cost (one
    narrow Arrow assignment + a per-cell append); the index grows but
    is never rescanned. Centroid DRIFT is the operational caveat: the
    stamped centroids stay frozen while the corpus distribution moves,
    degrading cell balance over months -- monitor with
    operators/drift.psi over the assignment histogram and rebuild
    (write_ivf_index with a re-fit) when it alarms; the probe-side
    contract (sidecar centroids) makes the rebuild an atomic swap."""
    meta = read_json_sidecar(df.sparkSession, path, _IVF_META_FILE)
    if meta is None:
        raise ValueError(
            f"no centroid sidecar at {path}: initialize with "
            "write_ivf_index"
        )
    vec_col = vec_col or meta["vec_col"]
    if vec_col != meta["vec_col"]:
        raise ValueError(
            f"index at {path} stores vec_col={meta['vec_col']!r}, "
            f"append supplied {vec_col!r}"
        )
    assigned = _sorted_by_id(
        assign_cells(df, meta["centroids"], vec_col).repartition(
            F.col("cell")
        ),
        id_col,
    ).persist()  # two actions: the write + the touched-cell collect
    try:
        if batch_id is None:
            assigned.write.partitionBy("cell").mode("append").parquet(
                path
            )
        else:
            # streaming arm: sub-partition by the checkpoint-
            # deterministic batch id and dynamically overwrite ONLY
            # this batch's (cell, batch) partitions -- an
            # at-least-once replay rewrites its own rows instead of
            # duplicating ids in search results. Cell-level partition
            # pruning at probe time is unaffected (cell stays the
            # leading partition key).
            (
                assigned.withColumn("_ingest_batch_id", F.lit(batch_id))
                .write.option("partitionOverwriteMode", "dynamic")
                .partitionBy("cell", "_ingest_batch_id")
                .mode("overwrite")
                .parquet(path)
            )
        # null cells (null/ragged vectors -- poison-row containment)
        # land in the default partition directory, which probes never
        # read; they have no manifest entry to update
        touched = [
            int(r[0])
            for r in assigned.select("cell").distinct().collect()
            if r[0] is not None
        ]
    finally:
        assigned.unpersist()
    # manifest update tracks the BATCH's touched cells, not the index
    # size (the append contract); a crash between the data write and
    # this stamp leaves the batch invisible to probes until the
    # at-least-once replay re-runs both (same honesty posture as the
    # ingest sinks)
    refresh_files_manifest(df.sparkSession, path, touched)


def ivf_occupancy_drift(spark, path: str) -> dict:
    """Centroid-drift alarm for a materialized IVF index: PSI of the
    CURRENT cell histogram against the fit-time histogram stamped by
    :func:`write_ivf_index`.

    The stamped centroids stay frozen while appends move the corpus
    distribution; the first observable symptom is cell-occupancy skew
    (probes read ever-fatter hot cells, recall decays in the cold
    ones). PSI over the k-bin cell histogram catches exactly that with
    one cell-column aggregate -- the scan reads only the partition
    column. Laplace (+1) smoothing keeps emptied/new-empty cells
    finite, matching operators/drift.py's convention.

    Returns {"psi", "verdict", "n_baseline", "n_current",
    "hottest_cell", "hottest_frac"}; verdict uses the standard PSI
    reading: < 0.1 stable, < 0.25 drifting, else shifted (rebuild:
    re-fit + write_ivf_index, an atomic swap under the sidecar
    contract).
    """
    import math

    meta = read_json_sidecar(spark, path, _IVF_META_FILE)
    if meta is None or "occupancy" not in meta:
        raise ValueError(
            f"no fit-time occupancy stamped at {path}: rebuild with "
            "write_ivf_index to enable drift monitoring"
        )
    base = {int(c): n for c, n in meta["occupancy"].items()}
    if sum(base.values()) == 0:
        # streaming-seeded index (write_ivf_index over an empty frame,
        # batches folded via append): there IS no fit-time histogram,
        # and PSI against the +1-smoothed uniform prior would read any
        # legitimately non-uniform corpus as "shifted". Explicit
        # no-baseline verdict instead of a false alarm; rebuild with
        # write_ivf_index over the live corpus to start monitoring.
        return {
            "psi": None,
            "verdict": "no_baseline",
            "n_baseline": 0,
            "n_current": None,
            "hottest_cell": None,
            "hottest_frac": None,
        }
    from xmidt_event_streams_spark.fsutil import has_data_files

    if not has_data_files(spark, path):
        # zero data files (stamped but never appended): nothing to
        # compare -- explicit verdict. ONLY this case is benign: any
        # other read failure (corrupt files, permissions, schema
        # drift) propagates into run_maintenance's per-target error
        # report instead of masquerading as 'no_baseline'.
        return {
            "psi": None,
            "verdict": "no_baseline",
            "n_baseline": sum(base.values()),
            "n_current": 0,
            "hottest_cell": None,
            "hottest_frac": None,
        }
    cur = {
        r["cell"]: r["n"]
        for r in spark.read.parquet(path)
        .groupBy("cell")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    cells = range(len(meta["centroids"]))
    nb = sum(base.values()) + len(meta["centroids"])
    nc = sum(cur.values()) + len(meta["centroids"])
    psi_val = 0.0
    hottest, hottest_frac = -1, -1.0
    for c in cells:
        bf = (base.get(c, 0) + 1) / nb
        cf = (cur.get(c, 0) + 1) / nc
        psi_val += (cf - bf) * math.log(cf / bf)
        if cf > hottest_frac:
            hottest, hottest_frac = c, cf
    verdict = (
        "stable" if psi_val < 0.1 else "drifting" if psi_val < 0.25 else "shifted"
    )
    return {
        "psi": psi_val,
        "verdict": verdict,
        "n_baseline": sum(base.values()),
        "n_current": sum(cur.values()),
        "hottest_cell": hottest,
        "hottest_frac": hottest_frac,
    }


def compact_ivf_index(
    spark,
    path: str,
    tombstones: DataFrame | list | None = None,
    id_col: str = "vec_id",
) -> dict:
    """Rewrite the IVF index in place, dropping (a) duplicate ids --
    the residue of overlapping plain appends (streaming batch appends
    self-heal via dynamic partition overwrite, but bulk backfills can
    re-append; first row per id wins, matching the window-index
    compactor) -- and (b) tombstoned ids. This is the VECTOR tier of
    a takedown: without it the removed documents' embeddings keep
    answering similarity probes from the index files (the same
    honesty rule the MinHash and inverted-index compactors enforce by
    absence, not filtering).

    Layout preserved exactly: a streaming-shaped index (cell +
    ``_ingest_batch_id`` partitions) is rewritten with all rows under
    ``_ingest_batch_id=-1`` per cell -- the documented pre-existing-
    corpus convention -- so later streaming appends keep working and
    probes' cell pruning is untouched; a plain cell-partitioned index
    stays cell-partitioned. One file per written partition (the
    small-file payoff: months of 15 s triggers collapse into one file
    per cell). Single-writer: run in the maintenance window with
    appending streams stopped and their checkpoints committed -- a
    replay of a pre-compaction batch AFTER compaction would dynamic-
    overwrite a (cell, batch) partition that no longer exists and
    re-add its rows (the same contract as compact_ingest_sink).

    The sidecar is restamped as-is (centroids are untouched by
    construction; the fit-time occupancy baseline stays the drift
    reference). Returns {rows_before, rows_after, files_before,
    files_after}.
    """
    meta = read_json_sidecar(spark, path, _IVF_META_FILE)
    if meta is None:
        raise ValueError(
            f"cannot compact a foreign IVF index (no {_IVF_META_FILE} "
            f"at {path})"
        )
    return compact_cell_index(
        spark,
        path,
        meta=meta,
        meta_file=_IVF_META_FILE,
        content_col=meta["vec_col"],
        id_col=id_col,
        tombstones=tombstones,
    )


def rebuild_ivf_index(
    spark,
    path: str,
    n_cells: int | None = None,
    n_iters: int = 5,
    id_col: str = "vec_id",
) -> dict:
    """RE-FIT the coarse quantizer on the index's CURRENT contents and
    rewrite atomically -- the action :func:`ivf_occupancy_drift`'s
    ``shifted`` verdict calls for (the stamped centroids stay frozen
    while appends move the corpus; when occupancy skews, probes read
    ever-fatter hot cells and recall decays in the cold ones). The
    IVF index stores raw vectors, so the rebuild is self-contained:
    one read of the index, a fresh spherical k-means fit
    (``n_cells=None`` re-sizes to sqrt(current rows) -- growth since
    the original fit is usually WHY it drifted), reassignment, and an
    atomic swap that preserves the layout (a streaming-shaped index
    folds to ``_ingest_batch_id=-1``, the compaction convention, so
    later batch appends keep working). The new fit-time occupancy
    becomes the drift baseline. Single-writer, like compaction.

    Returns {rows, n_cells_before, n_cells_after}."""
    meta = read_json_sidecar(spark, path, _IVF_META_FILE)
    if meta is None:
        raise ValueError(
            f"cannot rebuild a foreign IVF index (no {_IVF_META_FILE} "
            f"at {path})"
        )
    vec_col = meta["vec_col"]
    idx = spark.read.parquet(path)
    batched = "_ingest_batch_id" in idx.columns
    rows = idx.select(
        *[
            c
            for c in idx.columns
            if c not in ("cell", "_ingest_batch_id")
        ]
    )
    n_rows = rows.count()
    if n_cells is None:
        n_cells = max(1, min(int(n_rows**0.5), n_rows, 65_536))
    cents = kmeans_fit(rows, n_cells, n_iters, vec_col, id_col)
    base = assign_cells(rows, cents, vec_col).persist()
    try:
        assigned = base
        part_cols = ["cell"]
        if batched:
            assigned = assigned.withColumn(
                "_ingest_batch_id", F.lit(-1)
            )
            part_cols.append("_ingest_batch_id")
        tmp = path.rstrip("/") + "__rebuild_tmp"
        (
            _sorted_by_id(
                assigned.repartition(*[F.col(c) for c in part_cols]),
                id_col,
            )
            .write.partitionBy(*part_cols)
            .mode("overwrite")
            .parquet(tmp)
        )
        occupancy = {
            str(r["cell"]): r["n"]
            for r in base.groupBy("cell")
            .agg(F.count("*").alias("n"))
            .collect()
        }
    finally:
        base.unpersist()
    write_json_sidecar(
        spark,
        tmp,
        _IVF_META_FILE,
        {
            "centroids": cents,
            "vec_col": vec_col,
            "occupancy": occupancy,
        },
    )
    refresh_files_manifest(spark, tmp)
    swap_into_place(spark, tmp, path)
    return {
        "rows": n_rows,
        "n_cells_before": len(meta["centroids"]),
        "n_cells_after": n_cells,
    }


def compact_cell_index(
    spark,
    path: str,
    meta: dict,
    meta_file: str,
    content_col: str,
    id_col: str,
    tombstones: DataFrame | list | None = None,
    key_cols: tuple[str, ...] | None = None,
) -> dict:
    """The shared cell-partitioned-index compactor (IVF stores raw
    vectors, IVF-PQ stores codes -- same layout, same lifecycle):
    deduplicate ids, excise tombstones, rewrite one file per
    partition, restamp ``meta_file``, regenerate the file manifest,
    atomic swap. See :func:`compact_ivf_index` for the full contract
    (single-writer window, streaming-layout preservation,
    deterministic duplicate resolution).

    ``key_cols`` overrides the duplicate-resolution key (default
    ``(id_col,)``): a token-ASSIGNED MaxSim layout legitimately holds
    one row per (doc, token cell), so its compactor dedups on
    ``(id, cell)`` -- a global id-dedup would silently collapse the
    inverted-file replication. Tombstones still excise by id alone
    (a takedown removes every replica)."""
    idx = spark.read.parquet(path)
    batched = "_ingest_batch_id" in idx.columns

    rows_before = idx.count()
    files_before = count_data_files(spark, path)

    # deterministic duplicate resolution (dropDuplicates keeps an
    # ARBITRARY row, so a re-appended corrected embedding would
    # survive nondeterministically): the newest batch wins on the
    # streaming layout — a backfill's corrected vector beats the
    # original — with a content-hash tiebreak; the plain layout has
    # no order column, so the hash alone gives a stable (if
    # arbitrary) winner. Mirrors compact_window_index's
    # deterministic-keep rule.
    order = (
        [F.col("_ingest_batch_id").desc()] if batched else []
    ) + [F.hash(F.col(content_col)).asc()]
    if key_cols:
        # replicated layout (token-assigned MaxSim: one row per
        # (id, cell) ON PURPOSE, replicas of one version sharing one
        # payload). Convergence needs TWO rules, not one: first the
        # id's WINNING VERSION is chosen by the family's deterministic
        # order and every row of a losing version is dropped -- a
        # re-appended corrected document's OLD replicas would
        # otherwise survive forever in the cells the new version no
        # longer occupies, with no (id, cell) duplicate to evict them
        # (r10 review finding); then exact duplicate replicas of the
        # winning version dedup on the full key.
        wid = Window.partitionBy(id_col).orderBy(*order)
        idx = (
            idx.withColumn(
                "_xes_win",
                F.first(F.hash(F.col(content_col))).over(wid),
            )
            .filter(F.hash(F.col(content_col)) == F.col("_xes_win"))
            .drop("_xes_win")
        )
    w = Window.partitionBy(*(key_cols or (id_col,))).orderBy(*order)
    compacted = (
        idx.withColumn("_xes_rn", F.row_number().over(w))
        .filter(F.col("_xes_rn") == 1)
        .drop("_xes_rn")
    )
    if tombstones is not None:
        if isinstance(tombstones, DataFrame):
            tomb = tombstones.select(
                F.col(tombstones.columns[0]).alias(id_col)
            )
        else:
            tomb = spark.createDataFrame(
                [(t,) for t in tombstones], f"`{id_col}` long"
            )
        compacted = compacted.join(F.broadcast(tomb), id_col, "left_anti")
    part_cols = ["cell"]
    if batched:
        compacted = compacted.withColumn("_ingest_batch_id", F.lit(-1))
        part_cols.append("_ingest_batch_id")

    tmp = path.rstrip("/") + "__compact_tmp"
    (
        # id-sorted files: every BUILDER honors the point-fetch write
        # contract (row-group pruning on id ranges, operators/fetch);
        # the compactor must not be the one writer that silently
        # degrades it back to full-file scans
        _sorted_by_id(
            compacted.repartition(*[F.col(c) for c in part_cols]), id_col
        )
        .write.partitionBy(*part_cols)
        .mode("overwrite")
        .parquet(tmp)
    )
    write_json_sidecar(spark, tmp, meta_file, meta)
    # file manifest regenerated from the compacted layout (relative
    # paths survive the swap); a compaction also heals any manifest
    # staleness a crashed append left behind
    refresh_files_manifest(spark, tmp)
    files_after = count_data_files(spark, tmp)
    # a fully-tombstoned index (reachable via the snapshot-sync
    # takedown path: an interval deleting every remaining id) writes
    # ZERO data files -- reading the dir back would throw 'unable to
    # infer schema' mid-compaction and strand the tmp. The empty
    # index is a legitimate end state: sidecar + empty manifest stay,
    # so later appends refill it under the stamped parameters.
    rows_after = (
        spark.read.parquet(tmp).count() if files_after else 0
    )

    swap_into_place(spark, tmp, path)
    return {
        "rows_before": rows_before,
        "rows_after": rows_after,
        "files_before": files_before,
        "files_after": files_after,
    }


def sync_ivf_with_snapshot(
    spark,
    table_path: str,
    index_path: str,
    checkpoint_dir: str,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_cells: int | None = None,
    n_iters: int = 3,
    max_polls: int = 1_000_000,
) -> dict:
    """Keep an IVF vector index caught up with a SNAPSHOT TABLE
    through the checkpointed change feed -- the vector tier joining
    the sync family (inverted index, MinHash, replica; see
    ``snapshots.sync_index_with_snapshot``). This closes the takedown
    loop end to end: a row deleted from the snapshot table propagates
    to the serving index at the next sync, with no separate
    tombstone bookkeeping.

    Per interval: delete+update ids compact OUT of the index
    (``compact_ivf_index(tombstones=...)`` -- removed vectors must
    stop answering probes), then insert+update after-images append
    under the STAMPED centroids. Redelivery-convergent, same argument
    as the inverted-index sync. Bootstrap (fresh checkpoint, absent
    index): fit sqrt(N) centroids on the pinned-head read and build.
    Centroid DRIFT stays the appends' documented caveat -- pair with
    ``run_maintenance(ivf_rebuild_on_shift=True)``."""
    from xmidt_event_streams_spark.operators.snapshots import (
        compact_then_append_interval,
        snapshot_read,
        sync_index_with_snapshot,
    )

    def _exists() -> bool:
        return (
            read_json_sidecar(spark, index_path, _IVF_META_FILE)
            is not None
        )

    def _bootstrap(version: int) -> int:
        base = snapshot_read(spark, table_path, version=version).select(
            F.col(id_col), F.col(vec_col)
        )
        n = base.count()
        cells = n_cells if n_cells is not None else max(1, int(n**0.5))
        cents = kmeans_fit(
            base, min(cells, max(n, 1)), n_iters, vec_col, id_col
        )
        write_ivf_index(base, index_path, cents, vec_col, id_col)
        return n

    def _apply(ch):
        return compact_then_append_interval(
            ch,
            id_col,
            vec_col,
            compact_fn=lambda stale: compact_ivf_index(
                spark, index_path, tombstones=stale, id_col=id_col
            ),
            append_fn=lambda fresh: append_to_ivf_index(
                fresh, index_path, vec_col, id_col=id_col
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
