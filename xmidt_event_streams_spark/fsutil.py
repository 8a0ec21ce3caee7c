"""Hadoop-FileSystem-backed JSON sidecars for materialized indexes.

Every materialized index in this package (MinHash bands, LSH buckets,
IVF cells) is only probe-able with the EXACT parameters it was built
with -- a probe with mismatched banding/planes/centroids silently
finds nothing (or the wrong cells), which is the worst failure mode:
no error, empty results. Each writer therefore stamps its parameters
into a JSON sidecar inside the index directory, and each prober
re-checks them, raising on mismatch.

The sidecar goes through Hadoop's FileSystem API -- NOT local
``open()``/``os.path`` -- so the guard works identically on
``file:``, ``hdfs:`` and ``s3a:`` paths (the 100 TB deployment keeps
indexes on an object store, where local-FS I/O would silently degrade
to an unchecked probe). Sidecar names start with ``_`` so Spark's
data-file listing ignores them.
"""

from __future__ import annotations

import json

from pyspark.sql import SparkSession


def hadoop_fs(spark: SparkSession, path_str: str):
    """(FileSystem, Path, jvm) for ``path_str`` under the session's
    Hadoop configuration -- resolves the scheme (file:/hdfs:/s3a:)."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path_str)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, hpath, jvm


def write_json_sidecar(
    spark: SparkSession, dir_path: str, filename: str, obj: dict
) -> None:
    fs, _, jvm = hadoop_fs(spark, dir_path)
    target = jvm.org.apache.hadoop.fs.Path(
        dir_path.rstrip("/") + "/" + filename
    )
    out = fs.create(target, True)
    try:
        out.write(bytearray(json.dumps(obj).encode("utf-8")))
    finally:
        out.close()


def read_json_sidecar(
    spark: SparkSession, dir_path: str, filename: str
) -> dict | None:
    """The sidecar's content, or None when absent (a foreign index:
    the caller owns parameter agreement)."""
    fs, _, jvm = hadoop_fs(spark, dir_path)
    target = jvm.org.apache.hadoop.fs.Path(
        dir_path.rstrip("/") + "/" + filename
    )
    if not fs.exists(target):
        return None
    ins = fs.open(target)
    try:
        text = jvm.org.apache.commons.io.IOUtils.toString(ins, "UTF-8")
    finally:
        ins.close()
    return json.loads(text)


def check_sidecar_params(
    spark: SparkSession,
    dir_path: str,
    filename: str,
    want: dict,
    what: str,
) -> dict | None:
    """Compare probe parameters against the stamped sidecar; returns
    the full sidecar dict (None for foreign indexes). Only keys
    present in ``want`` are compared, so sidecars may carry extra
    payload (schemas, centroids) beyond the guarded parameters."""
    meta = read_json_sidecar(spark, dir_path, filename)
    if meta is None:
        return None
    got = {k: meta.get(k) for k in want}
    if got != want:
        raise ValueError(
            f"{what} at {dir_path} was built with {got}, probe asked {want}"
        )
    return meta


def has_data_files(
    spark: SparkSession, path_str: str, suffix: str = ".parquet"
) -> bool:
    """True when at least one ``suffix`` data file exists under
    ``path_str`` (recursive -- partitioned layouts count). Used by
    read-only checks to distinguish 'nothing written yet' (a benign,
    explicit verdict) from real read failures (corrupt files, denied
    permissions), which must propagate."""
    fs, hpath, _ = hadoop_fs(spark, path_str)
    if not fs.exists(hpath):
        return False
    it = fs.listFiles(hpath, True)
    while it.hasNext():
        if it.next().getPath().getName().endswith(suffix):
            return True
    return False


def latest_file_mtime_ms(spark: SparkSession, dir_path: str) -> int | None:
    """Newest modification time (epoch ms) of any file directly under
    ``dir_path``, or None when the directory is absent/empty. Flat
    listing -- the intended targets are structured-streaming
    checkpoint subdirs (``offsets/``, ``commits/``), which are flat
    by construction."""
    fs, hpath, _ = hadoop_fs(spark, dir_path)
    if not fs.exists(hpath):
        return None
    newest = None
    for st in fs.listStatus(hpath):
        if st.isFile():
            t = st.getModificationTime()
            newest = t if newest is None else max(newest, t)
    return newest


def latest_mtime_recursive_ms(
    spark: SparkSession, dir_path: str
) -> int | None:
    """Newest modification time (epoch ms) of any file anywhere under
    ``dir_path``, or None when absent/empty -- the freshness probe for
    partitioned/bucketed table layouts, where the flat variant above
    sees only directories."""
    fs, hpath, _ = hadoop_fs(spark, dir_path)
    if not fs.exists(hpath):
        return None
    it = fs.listFiles(hpath, True)
    newest = None
    while it.hasNext():
        t = it.next().getModificationTime()
        newest = t if newest is None else max(newest, t)
    return newest


def delete_path(spark: SparkSession, path_str: str) -> bool:
    """Recursive delete through the Hadoop FileSystem API (works on
    file:/hdfs:/s3a: -- the same portability contract as the
    sidecars). Returns False when the path did not exist."""
    fs, hpath, _ = hadoop_fs(spark, path_str)
    if not fs.exists(hpath):
        return False
    return fs.delete(hpath, True)


def count_data_files(
    spark: SparkSession, path_str: str, suffix: str = ".parquet"
) -> int:
    """Recursive ``suffix`` data-file count under ``path_str`` (0 for
    an absent path) — the before/after metric every index compactor
    reports."""
    fs, hpath, _ = hadoop_fs(spark, path_str)
    if not fs.exists(hpath):
        return 0
    it = fs.listFiles(hpath, True)
    n = 0
    while it.hasNext():
        if it.next().getPath().getName().endswith(suffix):
            n += 1
    return n


def swap_into_place(spark: SparkSession, tmp: str, dst: str) -> None:
    """The compactor swap: delete ``dst``, rename ``tmp`` into its
    place, refresh Spark's file-listing cache for the path (a raw FS
    swap bypasses it — cached plans over the old file list would fail
    with FAILED_READ_FILE otherwise). Atomic on HDFS/local rename; on
    object stores rename is copy+delete, so schedule compactions in a
    maintenance window there. Raises IOError when the rename fails —
    tmp is left in place so the data is recoverable by hand."""
    fs, hdst, jvm = hadoop_fs(spark, dst)
    fs.delete(hdst, True)
    if not fs.rename(jvm.org.apache.hadoop.fs.Path(tmp), hdst):
        raise IOError(f"compaction swap failed: rename({tmp} -> {dst})")
    spark.catalog.refreshByPath(dst)


# the two tmp-dir suffixes every compactor/rebuilder in this package
# writes before swap_into_place (ingest sink, MinHash, inverted,
# window, IVF, IVF-PQ): recover_swap keys crash recovery off them
SWAP_TMP_SUFFIXES = ("__compact_tmp", "__rebuild_tmp")


def recover_swap(spark: SparkSession, path: str) -> dict:
    """Crash recovery for the compactor swap -- run at the START of a
    maintenance window (single-writer contract: never concurrently
    with a live compaction on ``path``).

    ``swap_into_place`` has one non-atomic window: dst is deleted,
    then tmp renamed into its place. A crash leaves one of three
    states, each recovered here:

      * tmp exists, dst MISSING (crashed between delete and rename):
        the tmp dir IS the complete replacement -- finish the rename.
        Completeness = the write committer's own ``_SUCCESS`` marker
        at the tmp root (r9; the old any-parquet sniff accepted a
        crashed PARTIAL write whose first data file had landed, and
        rejected a legitimately empty committed compaction). A tmp
        without the marker is NOT renamed; that state is unreachable
        from this package's writers and gets a loud error instead of
        garbage-in-place. When BOTH suffixes hold complete tmps, the
        one whose ``_SUCCESS`` marker has the newest mtime wins (it is
        the later maintenance attempt) -- never suffix order, and
        never the directory mtime (synthetic/zero on object stores).
      * tmp exists, dst exists (crashed before the swap started, or
        mid-tmp-write): dst is live and authoritative -- the stale
        tmp is deleted.
      * no tmp: clean; nothing to do.

    Returns {"path", "completed": [tmp...], "removed": [tmp...]}."""
    fs, hdst, jvm = hadoop_fs(spark, path)
    out: dict = {"path": path, "completed": [], "removed": []}
    present = []
    for suf in SWAP_TMP_SUFFIXES:
        tname = path.rstrip("/") + suf
        tpath = jvm.org.apache.hadoop.fs.Path(tname)
        if fs.exists(tpath):
            spath = jvm.org.apache.hadoop.fs.Path(tname + "/_SUCCESS")
            complete = fs.exists(spath)
            # recency = the _SUCCESS FILE's mtime, not the directory's:
            # object-store filesystems (S3A) synthesize directory
            # mtimes (often 0), which would make the both-complete
            # tiebreak arbitrary there; the marker is a real file
            # written at commit time on every filesystem
            mtime = fs.getFileStatus(
                spath if complete else tpath
            ).getModificationTime()
            present.append((tname, tpath, complete, mtime))
    # PHASE 1 -- complete a crashed swap first: with dst missing, the
    # NEWEST complete tmp is renamed into place. Doing this before any
    # stale-tmp handling means an unrelated incomplete tmp (e.g. a
    # long-dead __compact_tmp) cannot block healing a completable
    # __rebuild_tmp -- and once dst is restored, every other tmp
    # (complete or not) is just stale and is deleted in phase 2
    # instead of raising.
    if not fs.exists(hdst):
        candidates = sorted(
            (p for p in present if p[2]),
            key=lambda p: p[3],
            reverse=True,
        )
        for tname, tpath, _complete, _mtime in candidates[:1]:
            if not fs.rename(tpath, hdst):
                raise IOError(
                    f"crash recovery rename failed: {tname} -> {path}"
                )
            spark.catalog.refreshByPath(path)
            out["completed"].append(tname)
    # PHASE 2 -- with dst live (pre-existing or just restored), every
    # remaining tmp is stale and deleted; if dst is STILL missing,
    # only incomplete tmps remain and that is a hand-recovery state.
    for tname, tpath, _complete, _mtime in present:
        if tname in out["completed"]:
            continue
        if fs.exists(hdst):
            fs.delete(tpath, True)
            out["removed"].append(tname)
        else:
            raise IOError(
                f"crash recovery at {path}: {tname} exists, the index "
                "is missing, and no tmp carries the committer's "
                "_SUCCESS marker -- refusing to rename an incomplete "
                "replacement into place; recover by hand"
            )
    return out
