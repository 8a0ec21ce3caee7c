"""Snapshot-isolated keyed table: a commit-log manifest layer over
immutable parquet files (the published Iceberg/Delta core shape,
implemented minimally over the Hadoop FileSystem API).

Why the in-place keyed table (operators/upsert.py) is not enough at
100 TB: ``merge_upsert`` dynamically OVERWRITES touched bucket
partitions, so any reader whose scan races a merge sees a torn table
(old files in some buckets, new in others, or FileNotFound on the
swapped ones) — acceptable for single-tenant maintenance windows,
not for a corpus that trainers, audits, and diff jobs read
continuously. This module makes writes never mutate: data files are
immutable once written, and a COMMIT is one atomic manifest rename.

Layout::

    table/
      _commits/v00000001.json   <- manifest: bucket -> [data file, ...]
      _commits/v00000002.json      + parent version, stats, params
      data/c00000001/_kbucket=ab/part-*.parquet   (immutable)
      data/c00000002/_kbucket=ab/part-*.parquet   (merge deltas)

A manifest lists, for every bucket, the EXACT files that make up that
bucket at that version; a merge writes NEW files for touched buckets
under its own commit directory and re-points only those buckets,
inheriting untouched buckets' file lists verbatim from the parent
manifest. Readers resolve a manifest once and scan its file list —
they are pinned to that snapshot for the lifetime of the plan no
matter how many merges land meanwhile (the files they reference are
never rewritten). Time travel is the same mechanism pointed at an
older manifest; ``corpus_diff`` over two ``snapshot_read``\\ s gives
release-to-release verdicts for free.

Concurrency contract: MANY readers, ONE winning writer. Writers are
optimistic — both build their candidate commit, but a per-version
CLAIM file admits exactly one (``os.open(O_CREAT|O_EXCL)`` on
``file:`` paths — POSIX-atomic; ``fs.create(overwrite=False)`` on
HDFS — namenode-atomic; object stores need their conditional-put
equivalent and are NOT safe with this module as-is); only the claim
winner renames its manifest into place, so readers still see
manifests appear atomically (never torn). The loser gets
:class:`SnapshotConflict` and retries against the new head instead
of corrupting anything. A bare ``fs.rename`` was NOT a safe arbiter:
Hadoop's LocalFileSystem rename falls through to POSIX rename(2),
which silently overwrites an existing destination. Scale shape: a manifest is
O(total data files) JSON — file counts are governed by bucket count
and merge cadence, and ``snapshot_expire`` both GCs unreferenced
files and bounds manifest history; rewriting a bucket COMPACTS it
(the merge reads parent files for the bucket and writes one
replacement set), so file counts do not grow with merge count for
touched buckets.

Right-to-be-forgotten honesty: a tombstone merge removes a key from
the NEW snapshot only — older snapshots still reference the files
holding the old row (that persistence is the feature). A takedown is
complete only after ``snapshot_expire`` drops every version that
still references the data; the takedown test pins exactly this.

Reference analog: none (SURVEY.md §2.8) — beyond-reference
LLM-pipeline mandate (corpus ops tier). Public-knowledge design:
Iceberg spec (snapshots + manifests), Delta Lake paper (VLDB 2020,
optimistic concurrency via atomic log append).
"""

from __future__ import annotations

import json
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from xmidt_event_streams_spark.fsutil import hadoop_fs

_BUCKET = "_kbucket"
DELETED_COL = "_deleted"
_COMMITS = "_commits"
_DATA = "data"


class SnapshotConflict(RuntimeError):
    """Another writer committed this version first. Re-read the head
    and retry the merge against it (optimistic concurrency: the
    losing writer's data files are orphans the next expire GCs)."""


def _bucket_expr(key_col: str, bucket_hex: int):
    return F.substring(F.md5(F.col(key_col).cast("string")), 1, bucket_hex)


def _manifest_path(path: str, version: int) -> str:
    return f"{path.rstrip('/')}/{_COMMITS}/v{version:08d}.json"


def _list_versions(spark: SparkSession, path: str) -> list[int]:
    fs, _, jvm = hadoop_fs(spark, path)
    cdir = jvm.org.apache.hadoop.fs.Path(f"{path.rstrip('/')}/{_COMMITS}")
    if not fs.exists(cdir):
        return []
    out = []
    for st in fs.listStatus(cdir):
        name = st.getPath().getName()
        if name.startswith("v") and name.endswith(".json"):
            out.append(int(name[1:-5]))
    return sorted(out)


def _read_manifest(spark: SparkSession, path: str, version: int) -> dict:
    fs, _, jvm = hadoop_fs(spark, path)
    mp = jvm.org.apache.hadoop.fs.Path(_manifest_path(path, version))
    if not fs.exists(mp):
        raise ValueError(
            f"snapshot version {version} does not exist at {path} "
            "(expired or never committed)"
        )
    ins = fs.open(mp)
    try:
        text = jvm.org.apache.commons.io.IOUtils.toString(ins, "UTF-8")
    finally:
        ins.close()
    return json.loads(text)


def _claim_path(path: str, version: int) -> str:
    return f"{path.rstrip('/')}/{_COMMITS}/.claim_v{version:08d}"


def _df_schema_fields(df: DataFrame) -> list[list[str]]:
    """[[name, ddl_type], ...] for the TABLE columns of ``df`` (the
    internal bucket and tombstone columns are layout, not schema)."""
    return [
        [f.name, f.dataType.simpleString()]
        for f in df.schema.fields
        if f.name not in (_BUCKET, DELETED_COL)
    ]


def _schema_ddl(m: dict) -> str | None:
    """The manifest's pinned schema as a Spark DDL string, or None
    for pre-schema-evolution manifests (read falls back to whatever
    the files merge to — the legacy behavior)."""
    sch = m.get("schema")
    if not sch:
        return None
    return ", ".join(f"`{n}` {t}" for n, t in sch)


def _read_with_manifest_schema(
    spark: SparkSession, m: dict, files: list[str]
) -> DataFrame:
    """Scan ``files`` under the manifest's pinned schema: Spark's
    parquet reader clips by name, so files written before a column
    was added return null for it — mixed-schema file sets reconcile
    to ONE deterministic schema per snapshot (time travel to an old
    version pins that version's narrower schema). Legacy manifests
    (no schema stamp) read schemaless, as before."""
    ddl = _schema_ddl(m)
    if ddl is None:
        return spark.read.parquet(*files)
    return spark.read.schema(ddl).parquet(*files)


# a claim is held only for the tmp->dst rename window (the manifest
# is fully written BEFORE claiming), i.e. milliseconds on any healthy
# writer. A claim older than this with no published manifest is a
# crashed claimant; the next writer breaks it rather than wedging the
# version forever (the liveness hole a pure claim protocol has).
CLAIM_GRACE_SEC = 600


def _local_path(p: str) -> str:
    """Strip a ``file:``/``file://`` prefix down to a POSIX path."""
    p = p[7:] if p.startswith("file://") else p
    return p[5:] if p.startswith("file:") else p


def _is_already_exists_error(exc: Exception) -> bool:
    """True when a Py4J/Hadoop exception means 'destination already
    exists' (the LOST-THE-RACE signal) rather than a transport/
    permission failure that must propagate. Matched by Java class
    name so transient IO errors are never misreported as a lost
    claim (which would misdirect the caller's retry)."""
    names = []
    je = getattr(exc, "java_exception", None)
    while je is not None:
        try:
            names.append(je.getClass().getName())
            je = je.getCause()
        except Exception:
            break
    blob = " ".join(names) or str(exc)
    return (
        "FileAlreadyExistsException" in blob
        or "AlreadyBeingCreatedException" in blob
    )


def _read_claim_token(fs, jvm, cpath) -> str | None:
    """Content of the claim file (the owner's token), or None when
    the claim is absent/unreadable."""
    try:
        ins = fs.open(cpath)
        try:
            return jvm.org.apache.commons.io.IOUtils.toString(ins, "UTF-8")
        finally:
            ins.close()
    except Exception:
        return None


def _claim_version(
    spark: SparkSession, path: str, version: int, token: str
) -> bool:
    """Atomically claim the right to publish ``version``, stamping
    ``token`` (a per-attempt uuid) as the claim's content. Returns
    True for the single winner, False for every loser. On ``file:``
    paths this is ``os.open(O_CREAT|O_EXCL)`` — POSIX-atomic (Hadoop's
    LocalFileSystem ``create(overwrite=False)`` is an exists-check
    then open, a TOCTOU window, and its ``rename`` silently
    overwrites). On other schemes ``fs.create(overwrite=False)``,
    which is namenode-atomic on HDFS; object stores without a
    conditional-put semantic are not safe arbiters. Non-
    already-exists errors from ``fs.create`` PROPAGATE — a transient
    IO/permission failure is not 'lost the claim'.

    STALE-CLAIM RECOVERY: a writer that crashed between claiming and
    renaming would otherwise wedge the version permanently (head
    never advances, every retry loses the claim). If the claim file
    is older than :data:`CLAIM_GRACE_SEC` and the version's manifest
    was never published, the claimant is presumed dead: the claim is
    broken and re-taken. Two breakers racing the same stale claim
    cannot delete each other's freshly re-taken claim: the breaker
    re-stats the claim immediately before deleting and backs off if
    the mtime moved since the age check (someone else already broke
    and re-took it); the publish path additionally re-reads the
    claim's token right before the manifest rename and aborts on
    mismatch, so a claim stolen in the residual stat->delete window
    still cannot yield two winners. The grace is ~10^5 x the healthy
    hold window, so a live-but-slow winner losing its claim requires
    a multi-minute stall between two adjacent filesystem calls."""
    claim = _claim_path(path, version)
    fs, _, jvm = hadoop_fs(spark, path)
    cpath = jvm.org.apache.hadoop.fs.Path(claim)

    def _try_claim() -> bool:
        uri = fs.getUri().getScheme()
        if uri in (None, "file"):
            import os as _os

            try:
                fd = _os.open(
                    _local_path(claim),
                    _os.O_CREAT | _os.O_EXCL | _os.O_WRONLY,
                )
                try:
                    _os.write(fd, token.encode("utf-8"))
                finally:
                    _os.close(fd)
                return True
            except FileExistsError:
                return False
        try:
            out = fs.create(cpath, False)
            try:
                out.write(bytearray(token.encode("utf-8")))
            finally:
                out.close()
            return True
        except Exception as e:
            if _is_already_exists_error(e):
                return False
            raise

    if _try_claim():
        return True
    # lost: stale-claim recovery (crashed claimant)
    try:
        observed_mtime = fs.getFileStatus(cpath).getModificationTime()
    except Exception:  # claim vanished between the attempts: re-race
        return _try_claim()
    age_ms = int(time.time() * 1000) - observed_mtime
    dst = jvm.org.apache.hadoop.fs.Path(_manifest_path(path, version))
    if age_ms > CLAIM_GRACE_SEC * 1000 and not fs.exists(dst):
        # re-stat right before the break: if the mtime moved, another
        # breaker already deleted + re-took this claim — backing off
        # keeps us from deleting ITS live claim (the two-loser race).
        try:
            if (
                fs.getFileStatus(cpath).getModificationTime()
                != observed_mtime
            ):
                return False
        except Exception:  # broken by someone who then crashed/lost
            return _try_claim()
        fs.delete(cpath, False)
        return _try_claim()
    return False


def _commit_manifest(
    spark: SparkSession, path: str, version: int, manifest: dict
) -> None:
    """Atomic publish: write the full manifest to a temp name, win
    the per-version claim, rename into place. The claim admits
    exactly one writer per version (the loser raises
    SnapshotConflict); the rename keeps reads atomic — a reader
    that lists the version never sees a half-written manifest,
    because only the single claim winner ever renames to ``dst``."""
    fs, _, jvm = hadoop_fs(spark, path)
    cdir = f"{path.rstrip('/')}/{_COMMITS}"
    fs.mkdirs(jvm.org.apache.hadoop.fs.Path(cdir))
    tmp = jvm.org.apache.hadoop.fs.Path(
        f"{cdir}/_tmp_v{version:08d}_{int(time.time() * 1000)}.json"
    )
    out = fs.create(tmp, True)
    try:
        out.write(bytearray(json.dumps(manifest).encode("utf-8")))
    finally:
        out.close()
    dst = jvm.org.apache.hadoop.fs.Path(_manifest_path(path, version))
    import uuid as _uuid

    token = _uuid.uuid4().hex
    if not _claim_version(spark, path, version, token):
        fs.delete(tmp, False)
        raise SnapshotConflict(
            f"version {version} at {path} was committed by another "
            "writer; re-read the head and retry"
        )
    # ownership re-verify immediately before the rename: a stale-claim
    # breaker that (wrongly) stole our claim during a long stall would
    # have replaced the token — abort WITHOUT touching the claim (it
    # is not ours any more) rather than racing its publish. A
    # TRANSIENT read failure must not masquerade as a stolen claim
    # (aborting leaves our own live claim wedging the version for the
    # whole grace window), so unreadable-but-present retries briefly
    # before the verdict.
    cpath = jvm.org.apache.hadoop.fs.Path(_claim_path(path, version))
    observed = _read_claim_token(fs, jvm, cpath)
    for _ in range(3):
        if observed is not None or not fs.exists(cpath):
            break
        time.sleep(0.2)  # present but unreadable: transient IO
        observed = _read_claim_token(fs, jvm, cpath)
    if observed != token:
        fs.delete(tmp, False)
        raise SnapshotConflict(
            f"claim for version {version} at {path} was broken by "
            "another writer (stalled past the claim grace window); "
            "re-read the head and retry"
        )
    # fs.exists(dst) after winning the claim is not a race: no other
    # claim-protocol writer can be mid-publish on this version, so an
    # existing dst means an out-of-band commit (or a pre-claim-era
    # writer) — refuse rather than clobber. On either failure we
    # RELEASE the claim (safe: we hold it, so nobody else is
    # mid-publish) — otherwise a transient rename failure would leave
    # the version permanently unpublishable. On ``file:`` the publish
    # itself is ``os.link`` — POSIX-atomic AND no-overwrite (rename(2)
    # silently clobbers; link(2) fails with EEXIST), so even a claim
    # stolen in the verify->publish window cannot yield two winners;
    # HDFS rename already refuses an existing destination.
    if fs.getUri().getScheme() in (None, "file"):
        import os as _os

        ltmp = _local_path(tmp.toString())
        # the hardlink-unsupported fallback is scoped to os.link ONLY:
        # cleanup of the consumed tmp happens outside this try, because
        # a cleanup OSError after a SUCCESSFUL link must not read as
        # 'not published' (the manifest IS live; the generic fallback
        # would see dst existing, report failure, and the retrying
        # caller would re-merge the same updates as a spurious extra
        # version)
        try:
            _os.link(ltmp, _local_path(_manifest_path(path, version)))
            published = True
        except FileExistsError:
            published = False
        except OSError:
            # filesystem without hardlink support (some NFS/FUSE/
            # overlay mounts): fall back to exists+rename -- the
            # claim token already verified ownership just above, so
            # the unguarded-overwrite window is claim-protected
            published = not fs.exists(dst) and fs.rename(tmp, dst)
        if published:
            # drop the consumed tmp and its ChecksumFileSystem .crc
            # sidecar (or _commits/ accrues one junk file per commit;
            # expire GCs manifests and claims, not these). Both are
            # best-effort: the manifest is already published.
            head_dir, name = ltmp.rsplit("/", 1)
            for junk in (ltmp, f"{head_dir}/.{name}.crc"):
                try:
                    _os.remove(junk)
                except OSError:
                    pass
    else:
        published = not fs.exists(dst) and fs.rename(tmp, dst)
    if not published:
        fs.delete(tmp, False)
        fs.delete(cpath, False)
        raise SnapshotConflict(
            f"version {version} at {path} exists or could not be "
            "published; re-read the head and retry"
        )


def _write_commit_files(
    df: DataFrame, path: str, version: int
) -> dict[str, list[str]]:
    """Write ``df`` (with ``_kbucket``) under this ATTEMPT's immutable
    directory; return bucket -> [absolute file path, ...]. The
    directory name carries an attempt timestamp so two writers racing
    the same version never collide on data paths — the manifest
    rename is the only arbiter, and the loser's files are orphans the
    next expire GCs."""
    spark = df.sparkSession
    cdir = (
        f"{path.rstrip('/')}/{_DATA}/"
        f"c{version:08d}-{int(time.time() * 1000)}"
    )
    (
        df.repartition(F.col(_BUCKET))
        .write.mode("errorifexists")
        .partitionBy(_BUCKET)
        .parquet(cdir)
    )
    fs, _, jvm = hadoop_fs(spark, cdir)
    by_bucket: dict[str, list[str]] = {}
    for st in fs.listStatus(jvm.org.apache.hadoop.fs.Path(cdir)):
        name = st.getPath().getName()
        if not name.startswith(f"{_BUCKET}="):
            continue
        b = name.split("=", 1)[1]
        files = [
            f.getPath().toString()
            for f in fs.listStatus(st.getPath())
            if f.getPath().getName().endswith(".parquet")
        ]
        if files:
            by_bucket[b] = sorted(files)
    return by_bucket


def snapshot_create(
    df: DataFrame, path: str, key_col: str, bucket_hex: int = 2
) -> int:
    """Initialize a snapshot table at version 1 with the full
    contents of ``df`` (must be key-unique). Returns the version."""
    if df.groupBy(key_col).count().filter("count > 1").limit(1).count():
        raise ValueError(f"table rows must be unique on {key_col}")
    spark = df.sparkSession
    if _list_versions(spark, path):
        raise ValueError(
            f"{path} already holds a snapshot table; use snapshot_merge"
        )
    version = 1
    buckets = _write_commit_files(
        df.withColumn(_BUCKET, _bucket_expr(key_col, bucket_hex)),
        path,
        version,
    )
    _commit_manifest(
        spark,
        path,
        version,
        {
            "version": version,
            "parent": None,
            "key_col": key_col,
            "bucket_hex": bucket_hex,
            "schema": _df_schema_fields(df),
            "buckets": buckets,
            "stats": {"upserts": df.count(), "deletes": 0},
        },
    )
    return version


def snapshot_head(spark: SparkSession, path: str) -> int:
    versions = _list_versions(spark, path)
    if not versions:
        raise ValueError(f"{path} is not a snapshot table (no commits)")
    return versions[-1]


def snapshot_versions(spark: SparkSession, path: str) -> list[dict]:
    """Commit log, oldest first: [{version, parent, stats}, ...]."""
    return [
        {
            k: m.get(k)
            for k in ("version", "parent", "stats", "key_col", "bucket_hex")
        }
        for m in (
            _read_manifest(spark, path, v)
            for v in _list_versions(spark, path)
        )
    ]


def snapshot_read(
    spark: SparkSession, path: str, version: int | None = None
) -> DataFrame:
    """Read the table AS OF ``version`` (default: head). The returned
    plan references that manifest's exact file list; merges landing
    after this call do not change what it scans (snapshot isolation —
    the files are immutable)."""
    m = _read_manifest(
        spark, path, version if version is not None else snapshot_head(spark, path)
    )
    files = [f for fl in m["buckets"].values() for f in fl]
    if not files:
        raise ValueError(
            f"snapshot v{m['version']} at {path} holds no data files "
            "(fully tombstoned)"
        )
    # leaf-file read: no basePath, so Spark does NOT infer the
    # _kbucket partition column -- the data files never contained it
    return _read_with_manifest_schema(spark, m, files)


def snapshot_read_keys(
    spark: SparkSession,
    path: str,
    keys: list,
    version: int | None = None,
) -> DataFrame:
    """Point-lookup read AS OF ``version`` (default head): rows whose
    key is in ``keys``, scanning ONLY the keys' buckets' files — the
    manifest is the file-skipping index (the Iceberg shape). Bucket
    assignment is the same md5 prefix the writer used, computed
    driver-side, so a k-key lookup against a 100 TB table reads
    ~k/n_buckets of it no matter how many files the manifest lists;
    the key equality additionally pushes into the parquet scan.
    Rows for absent keys are simply absent (tombstoned-at-this-
    version included)."""
    import hashlib

    m = _read_manifest(
        spark,
        path,
        version if version is not None else snapshot_head(spark, path),
    )
    key_col, bucket_hex = m["key_col"], m["bucket_hex"]
    # driver twin of _bucket_expr: md5 of the key's string form.
    # Python str(k) equals Spark's cast-to-string ONLY for int and
    # string keys (str(True)='True' vs 'true'; str(1e-7)='1e-07' vs
    # '1.0E-7'; decimals depend on scale) — for any other key type
    # the string forms are computed by Spark itself on a tiny local
    # relation (one sub-ms job), so the bucket choice always matches
    # the writer's instead of silently returning zero rows.
    if all(
        isinstance(k, (int, str)) and not isinstance(k, bool)
        for k in keys
    ):
        want = {
            hashlib.md5(str(k).encode()).hexdigest()[:bucket_hex]
            for k in keys
        }
    else:
        key_type = dict(
            (n, t) for n, t in m.get("schema") or []
        ).get(key_col)
        kdf = (
            spark.createDataFrame(
                [(k,) for k in keys], f"`{key_col}` {key_type}"
            )
            if key_type
            else spark.createDataFrame([(k,) for k in keys], [key_col])
        )
        want = {
            r[0]
            for r in kdf.select(
                _bucket_expr(key_col, bucket_hex)
            ).collect()
        }
    files = [
        f
        for b, fl in m["buckets"].items()
        if b in want
        for f in fl
    ]
    if not files:
        # zero rows, not an error — even when THIS version is fully
        # tombstoned (a takedown-verification probe's success case):
        # the manifest's pinned schema answers directly; legacy
        # manifests derive it from any file of this or an older
        # manifest; only a table whose entire history holds no data
        # files is unreadable.
        ddl = _schema_ddl(m)
        if ddl is not None:
            return spark.createDataFrame([], ddl)
        for v in (m["version"], *reversed(_list_versions(spark, path))):
            any_files = [
                f
                for fl in _read_manifest(spark, path, v)["buckets"].values()
                for f in fl
            ]
            if any_files:
                return (
                    spark.read.parquet(any_files[0])
                    .limit(0)
                    .filter(F.lit(False))
                )
        raise ValueError(
            f"snapshot table at {path} holds no data files in any "
            "retained version (nothing to derive a schema from)"
        )
    base = _read_with_manifest_schema(spark, m, files)
    # residual exact-key filter over the pruned buckets: a literal IN
    # is fine for small sets, but a 10k-key lookup would build a
    # 10k-literal expression tree — the exact plan-size hazard
    # operators/fetch.py exists to eliminate (its module docstring
    # names this failure). Above the small-set threshold the key set
    # becomes a broadcast semi-join (plus pushed id ranges when the
    # keys are integers and cluster tightly), typed from the
    # manifest's pinned schema so the join never miscoerces.
    from xmidt_event_streams_spark.operators.fetch import (
        SMALL_FETCH_IDS,
        fetch_by_ids,
    )

    if len(set(keys)) <= SMALL_FETCH_IDS:
        return base.filter(F.col(key_col).isin(keys))
    key_type = dict(
        (n, t) for n, t in m.get("schema") or []
    ).get(key_col)
    return fetch_by_ids(base, keys, id_col=key_col, id_type=key_type)


def snapshot_changes(
    spark: SparkSession,
    path: str,
    from_version: int,
    to_version: int | None = None,
) -> DataFrame:
    """Change-data-feed between two snapshots, MANIFEST-BOUNDED: only
    buckets whose file lists differ between the versions are read, so
    the cost tracks what the intervening merges touched, not the
    table size (``corpus_diff`` over two ``snapshot_read``\\ s scans
    both full tables; this reads the delta). Output: the table's
    columns plus ``_change`` in ``insert | update | delete`` —
    after-image rows for insert/update, before-image for delete.
    Rows rewritten byte-identically by a bucket compaction are NOT
    emitted (a merge rewrites whole buckets; identical rows are
    movement, not change).

    The versions must belong to this table's retained history
    (expired manifests raise, as in :func:`snapshot_read`).
    """
    to_version = (
        to_version if to_version is not None else snapshot_head(spark, path)
    )
    if from_version >= to_version:
        raise ValueError(
            f"from_version must precede to_version "
            f"({from_version} >= {to_version})"
        )
    m_from = _read_manifest(spark, path, from_version)
    m_to = _read_manifest(spark, path, to_version)
    key_col = m_to["key_col"]
    buckets = set(m_from["buckets"]) | set(m_to["buckets"])
    changed = [
        b
        for b in buckets
        if m_from["buckets"].get(b) != m_to["buckets"].get(b)
    ]
    old_files = [f for b in changed for f in m_from["buckets"].get(b, [])]
    new_files = [f for b in changed for f in m_to["buckets"].get(b, [])]

    def _side(files, alias):
        if not files:
            return None
        # both sides read under the TO-version's pinned schema, so
        # change images carry the evolved column set (null for
        # columns the old files predate)
        df = _read_with_manifest_schema(spark, m_to, files)
        cols = [c for c in df.columns if c != key_col]
        return df.select(
            F.col(key_col),
            F.struct(*[F.col(c) for c in cols]).alias(alias),
        ), cols

    old = _side(old_files, "_xes_before")
    new = _side(new_files, "_xes_after")
    if old is None and new is None:
        # a legitimately EMPTY change feed (identical file lists, or
        # changed buckets holding no data on either side) is an empty
        # DataFrame with the table schema + _change, not an exception
        # — composable CDC consumers poll this in a loop.
        ddl = _schema_ddl(m_to)
        if ddl is not None:
            base = spark.createDataFrame([], ddl)
        else:
            any_files = [
                f for fl in m_to["buckets"].values() for f in fl
            ] or [f for fl in m_from["buckets"].values() for f in fl]
            if not any_files:
                raise ValueError(
                    f"snapshot table at {path} holds no data files in "
                    f"v{from_version} or v{to_version} (nothing to "
                    "derive a change-feed schema from)"
                )
            base = spark.read.parquet(any_files[0]).filter(F.lit(False))
        return base.withColumn(
            "_change", F.lit(None).cast("string")
        ).filter(F.lit(False))
    if old is None:
        df, cols = new
        return df.select(
            key_col,
            *[F.col(f"_xes_after.{c}").alias(c) for c in cols],
            F.lit("insert").alias("_change"),
        )
    if new is None:
        df, cols = old
        return df.select(
            key_col,
            *[F.col(f"_xes_before.{c}").alias(c) for c in cols],
            F.lit("delete").alias("_change"),
        )
    (odf, cols), (ndf, _) = old, new
    j = odf.join(ndf, key_col, "full_outer")
    change = (
        F.when(F.col("_xes_before").isNull(), "insert")
        .when(F.col("_xes_after").isNull(), "delete")
        .when(
            ~F.col("_xes_before").eqNullSafe(F.col("_xes_after")), "update"
        )
        .otherwise(F.lit(None))  # byte-identical rewrite: not a change
    )
    image = F.coalesce(F.col("_xes_after"), F.col("_xes_before"))
    return (
        j.withColumn("_change", change)
        .filter(F.col("_change").isNotNull())
        .select(
            key_col,
            *[image.getField(c).alias(c) for c in cols],
            "_change",
        )
    )


def snapshot_merge(
    spark: SparkSession, path: str, updates: DataFrame
) -> dict:
    """MERGE ``updates`` (inserts + replacements + ``_deleted``
    tombstones, key-unique) as a NEW snapshot. Reads the head
    manifest, rewrites ONLY touched buckets into this commit's
    immutable directory, inherits every other bucket's file list, and
    publishes with one atomic manifest rename. Returns
    {version, touched_buckets, upserts, deletes}.

    Raises :class:`SnapshotConflict` if another writer commits the
    same version first (retry against the new head; this attempt's
    data files are orphans the next expire GCs). Cost: |updates| x
    (table_size / n_buckets) read+write — the same bounded-merge
    shape as merge_upsert, plus per-bucket compaction for free (a
    touched bucket's parent files are folded into one fresh set)."""
    head = snapshot_head(spark, path)
    m = _read_manifest(spark, path, head)
    key_col, bucket_hex = m["key_col"], m["bucket_hex"]
    version = head + 1

    if updates.groupBy(key_col).count().filter("count > 1").limit(1).count():
        raise ValueError(f"update set must be unique on {key_col}")
    # SCHEMA EVOLUTION (add-column only): the committed schema is the
    # parent's columns (pinned order) plus any NEW columns the update
    # set introduces; existing rows read null for added columns (the
    # pinned-schema read clips by name). Type changes and column
    # drops are refused — on a 100 TB corpus either means rewrite-
    # the-world or undefined mixed-schema reads, the exact failure
    # this manifest stamp exists to prevent. Updates must carry every
    # existing column (a MERGE row is a full replacement; silently
    # nulling a column the caller merely forgot is data loss).
    up_fields = _df_schema_fields(updates)
    parent_schema = m.get("schema")
    if parent_schema is not None:
        parent_map = {n: t for n, t in parent_schema}
        up_map = dict(up_fields)
        conflicts = [
            (n, parent_map[n], t)
            for n, t in up_fields
            if n in parent_map and parent_map[n] != t
        ]
        if conflicts:
            raise ValueError(
                "schema evolution supports ADDING columns only; type "
                f"changes refused: {conflicts}"
            )
        missing = [n for n in parent_map if n not in up_map]
        if missing:
            raise ValueError(
                f"update set is missing table columns {missing}; a "
                "merge row replaces the whole row — carry every "
                "existing column (null explicitly to clear a value)"
            )
        evolved_schema = [list(x) for x in parent_schema] + [
            [n, t] for n, t in up_fields if n not in parent_map
        ]
    else:
        # legacy table (pre-schema manifests): reconstruct the parent
        # column set from a data file so the missing-column guard
        # still applies -- silently adopting the update's narrower
        # schema would DROP columns table-wide (pre-evolution code
        # failed loudly here via the strict unionByName)
        any_files = [f for fl in m["buckets"].values() for f in fl]
        if any_files:
            parent_fields = [
                [f.name, f.dataType.simpleString()]
                for f in spark.read.parquet(any_files[0]).schema.fields
                if f.name not in (_BUCKET, DELETED_COL)
            ]
            parent_map = {n: t for n, t in parent_fields}
            up_map = dict(up_fields)
            conflicts = [
                (n, parent_map[n], t)
                for n, t in up_fields
                if n in parent_map and parent_map[n] != t
            ]
            if conflicts:
                raise ValueError(
                    "schema evolution supports ADDING columns only; "
                    f"type changes refused: {conflicts}"
                )
            missing = [n for n in parent_map if n not in up_map]
            if missing:
                raise ValueError(
                    f"update set is missing table columns {missing}; "
                    "a merge row replaces the whole row — carry every "
                    "existing column (null explicitly to clear a value)"
                )
            evolved_schema = parent_fields + [
                [n, t] for n, t in up_fields if n not in parent_map
            ]
        else:  # empty legacy table: adopt the update's schema
            evolved_schema = [list(x) for x in up_fields]
    up = updates
    if DELETED_COL not in updates.columns:
        up = up.withColumn(DELETED_COL, F.lit(False))
    up = up.persist()
    try:
        touched = sorted(
            r[0]
            for r in up.select(
                _bucket_expr(key_col, bucket_hex).alias(_BUCKET)
            )
            .distinct()
            .collect()
        )
        n_del = up.filter(F.col(DELETED_COL)).count()
        n_ups = up.count() - n_del

        parent_files = [
            f for b in touched for f in m["buckets"].get(b, [])
        ]
        keys = up.select(key_col)
        live_up = up.filter(~F.col(DELETED_COL)).drop(DELETED_COL)
        if parent_files:
            # data files never contain _kbucket (written partitionBy);
            # parent files read under the PARENT's pinned schema, so
            # kept rows take null for columns this merge adds
            current = _read_with_manifest_schema(spark, m, parent_files)
            keep = current.join(F.broadcast(keys), key_col, "left_anti")
            merged = keep.unionByName(live_up, allowMissingColumns=True)
        else:
            merged = live_up
        merged = merged.select(*[n for n, _ in evolved_schema])

        new_buckets = _write_commit_files(
            merged.withColumn(_BUCKET, _bucket_expr(key_col, bucket_hex)),
            path,
            version,
        )
        buckets = {
            b: fl for b, fl in m["buckets"].items() if b not in touched
        }
        buckets.update(new_buckets)  # absent = fully tombstoned
        _commit_manifest(
            spark,
            path,
            version,
            {
                "version": version,
                "parent": head,
                "key_col": key_col,
                "bucket_hex": bucket_hex,
                "schema": evolved_schema,
                "buckets": buckets,
                "stats": {"upserts": n_ups, "deletes": n_del},
            },
        )
        return {
            "version": version,
            "touched_buckets": touched,
            "upserts": n_ups,
            "deletes": n_del,
        }
    finally:
        up.unpersist()


def snapshot_rebucket(
    spark: SparkSession, path: str, new_bucket_hex: int
) -> dict:
    """LAYOUT evolution: re-commit the table under a new bucket count
    (``new_bucket_hex`` md5-prefix hex chars -> 16**n buckets).

    Why it exists: ``bucket_hex`` is pinned at :func:`snapshot_create`
    and every merge rewrites WHOLE touched buckets — a table created
    at 16 buckets that grows to 100 TB has 6 TB buckets, so each
    merge rewrites terabytes to change kilobytes. Rebucketing is the
    matching layout fix schema evolution got in r7: one full-table
    rewrite commit (the honest cost — that IS the operation), after
    which merges touch 16x smaller buckets.

    Mechanics: reads the head under its pinned schema, writes every
    row into this commit's immutable directory bucketed by the NEW
    expression, and publishes under the claim protocol like any merge
    (a racing writer gets :class:`SnapshotConflict`). The bucket
    GENERATION is per-manifest — ``bucket_hex`` is already stamped on
    every manifest — so readers, point lookups, and CDC each use the
    generation of the version they address: time travel across the
    boundary just works, and :func:`snapshot_changes` across it emits
    NOTHING (rows rewritten byte-identically are movement, not
    change — the row-level suppression already handles cross-
    generation bucket keys, at full-table-diff cost for that one
    interval). :func:`snapshot_expire` GCs the old generation's files
    once no retained manifest references them.

    Returns {version, bucket_hex, buckets}; a no-op (same hex)
    returns the current head without committing."""
    if not 1 <= int(new_bucket_hex) <= 8:
        raise ValueError(
            f"new_bucket_hex must be in [1, 8] (16..16^8 buckets), "
            f"got {new_bucket_hex}"
        )
    head = snapshot_head(spark, path)
    m = _read_manifest(spark, path, head)
    key_col, old_hex = m["key_col"], m["bucket_hex"]
    if int(new_bucket_hex) == int(old_hex):
        return {
            "version": head,
            "bucket_hex": old_hex,
            "buckets": len(m["buckets"]),
        }
    version = head + 1
    files = [f for fl in m["buckets"].values() for f in fl]
    if files:
        df = _read_with_manifest_schema(spark, m, files)
        new_buckets = _write_commit_files(
            df.withColumn(
                _BUCKET, _bucket_expr(key_col, int(new_bucket_hex))
            ),
            path,
            version,
        )
    else:  # fully-tombstoned head: the new generation starts empty
        new_buckets = {}
    _commit_manifest(
        spark,
        path,
        version,
        {
            "version": version,
            "parent": head,
            "key_col": key_col,
            "bucket_hex": int(new_bucket_hex),
            "schema": m.get("schema"),
            "buckets": new_buckets,
            "stats": {
                "upserts": 0,
                "deletes": 0,
                "rebucket": [int(old_hex), int(new_bucket_hex)],
            },
        },
    )
    return {
        "version": version,
        "bucket_hex": int(new_bucket_hex),
        "buckets": len(new_buckets),
    }


def snapshot_expire(
    spark: SparkSession,
    path: str,
    keep_last: int = 2,
    orphan_grace_hours: float = 24.0,
) -> dict:
    """Drop all but the newest ``keep_last`` manifests and GC data
    files in TWO distinct tiers (the Iceberg split between
    expire-snapshots and orphan cleanup):

    * **expired-snapshot files** — referenced by an expired manifest
      and by no surviving one: deleted immediately. These were
      committed history; expiring the manifest is the explicit
      decision to drop them. This is what completes a takedown: until
      the last manifest referencing a tombstoned row's files expires,
      time travel can still read it.
    * **orphans** — referenced by NO manifest at all (conflict-losing
      writers, crashed merges, and — crucially — merges still IN
      FLIGHT, whose data files land before their manifest rename):
      deleted only when their mtime is older than
      ``orphan_grace_hours``. An immediate orphan sweep would race a
      concurrent ``snapshot_merge`` and delete the files its about-
      to-commit manifest references, leaving the new head unreadable;
      the age threshold makes that impossible for any merge younger
      than the grace window. Pass ``orphan_grace_hours=0`` only when
      no writer can be in flight (single-tenant maintenance).

    Returns {expired_versions, deleted_files, deleted_orphans,
    kept_versions}."""
    if keep_last < 1:
        raise ValueError("keep_last must be >= 1")
    versions = _list_versions(spark, path)
    if not versions:
        raise ValueError(f"{path} is not a snapshot table (no commits)")
    kept, expired = versions[-keep_last:], versions[:-keep_last]
    live: set[str] = set()
    for v in kept:
        for fl in _read_manifest(spark, path, v)["buckets"].values():
            live.update(fl)
    expired_refs: set[str] = set()
    for v in expired:
        for fl in _read_manifest(spark, path, v)["buckets"].values():
            expired_refs.update(fl)
    fs, _, jvm = hadoop_fs(spark, path)
    now_ms = int(time.time() * 1000)
    grace_ms = int(orphan_grace_hours * 3600 * 1000)
    deleted = orphans = 0
    ddir = jvm.org.apache.hadoop.fs.Path(f"{path.rstrip('/')}/{_DATA}")
    if fs.exists(ddir):
        for cdir in fs.listStatus(ddir):
            for bdir in fs.listStatus(cdir.getPath()):
                if not bdir.isDirectory():
                    continue
                for f in fs.listStatus(bdir.getPath()):
                    p = f.getPath().toString()
                    if not p.endswith(".parquet") or p in live:
                        continue
                    if p in expired_refs:
                        fs.delete(f.getPath(), False)
                        deleted += 1
                    elif now_ms - f.getModificationTime() > grace_ms:
                        fs.delete(f.getPath(), False)
                        orphans += 1
    for v in expired:
        fs.delete(
            jvm.org.apache.hadoop.fs.Path(_manifest_path(path, v)), False
        )
        fs.delete(
            jvm.org.apache.hadoop.fs.Path(_claim_path(path, v)), False
        )
    return {
        "expired_versions": expired,
        "deleted_files": deleted,
        "deleted_orphans": orphans,
        "kept_versions": kept,
    }


# ---------------------------------------------------------------------------
# checkpointed CDC follow: the snapshot twin of the ingest-sink
# cursor patterns (streaming/ingest_dedup.read_sink_as_of) -- a
# downstream incremental consumer (index maintainer, derived-table
# builder, replication) polls the table and receives each change
# interval EXACTLY once per acknowledged cursor advance, surviving
# crashes without hand-rolled version bookkeeping.
# ---------------------------------------------------------------------------

_CURSOR_FILE = "cursor.json"


def _read_follow_cursor(spark: SparkSession, checkpoint_dir: str):
    from xmidt_event_streams_spark.fsutil import read_json_sidecar

    return read_json_sidecar(spark, checkpoint_dir, _CURSOR_FILE)


def _write_follow_cursor(
    spark: SparkSession, checkpoint_dir: str, table_path: str, version: int
) -> None:
    """Atomic cursor advance: write to a tmp name, then OVERWRITE-
    rename onto the cursor in one filesystem operation -- a crash at
    ANY point leaves either the old or the new cursor, never a torn
    file and never NO file. (A delete-then-rename pair would have a
    crash window that deletes the cursor outright; a vanished cursor
    reads as a FRESH checkpoint, silently skipping the un-acked
    interval -- the exact loss this protocol exists to prevent.) On
    ``file:`` the overwrite-rename is ``os.replace`` (POSIX-atomic);
    elsewhere ``FileContext.rename(..., OVERWRITE)`` (atomic on
    HDFS)."""
    fs, _, jvm = hadoop_fs(spark, checkpoint_dir)
    base = checkpoint_dir.rstrip("/")
    fs.mkdirs(jvm.org.apache.hadoop.fs.Path(base))
    tmp = jvm.org.apache.hadoop.fs.Path(f"{base}/.{_CURSOR_FILE}.tmp")
    dst = jvm.org.apache.hadoop.fs.Path(f"{base}/{_CURSOR_FILE}")
    out = fs.create(tmp, True)
    try:
        out.write(
            bytearray(
                json.dumps(
                    {"table": table_path, "version": version}
                ).encode("utf-8")
            )
        )
    finally:
        out.close()
    if fs.getUri().getScheme() in (None, "file"):
        import os as _os

        _os.replace(
            _local_path(tmp.toString()), _local_path(dst.toString())
        )
        # drop the ChecksumFileSystem sidecar of the replaced tmp so
        # checkpoints don't accumulate stale .crc files
        crc = f"{base}/.{tmp.getName()}.crc"
        try:
            _os.remove(_local_path(crc))
        except OSError:
            pass
        return
    fc = jvm.org.apache.hadoop.fs.FileContext.getFileContext(
        dst.toUri(), spark.sparkContext._jsc.hadoopConfiguration()
    )
    # varargs via an explicit Java array (py4j does not auto-wrap)
    gw = spark.sparkContext._gateway
    opts = gw.new_array(jvm.org.apache.hadoop.fs.Options.Rename, 1)
    opts[0] = jvm.org.apache.hadoop.fs.Options.Rename.OVERWRITE
    fc.rename(tmp, dst, opts)


def follow_snapshot_changes(
    spark: SparkSession, path: str, checkpoint_dir: str
) -> dict | None:
    """One poll of the table's change feed against a durable cursor.

    Returns ``None`` when the cursor is already at the head
    (nothing new), else::

        {"changes": DataFrame,   # snapshot_changes(from, to)
         "from_version": int,    # exclusive (the acked cursor)
         "to_version": int,      # inclusive (head at poll time)
         "ack": callable}        # durably advance the cursor

    Delivery contract (at-least-once, the same posture as the
    streaming sinks): the interval is NOT consumed until ``ack()``
    runs -- a consumer that crashes mid-interval re-polls and
    receives the SAME interval again; after ``ack()`` it is never
    redelivered. Acked intervals tile the version history with no
    gaps and no overlaps, so the union of acked change batches
    equals ``snapshot_changes(first_cursor, last_head)`` row for
    row. ``ack()`` is rename-atomic (crash mid-ack leaves the old
    cursor; re-delivery, never loss).

    A FRESH checkpoint initializes the cursor at the head WITHOUT
    delivering history (the "changes from now on" contract --
    mirrors a stream starting at latest): the first poll returns
    None and records head as the cursor; consumers wanting the
    existing content bootstrap with ``snapshot_read(spark, path,
    version=cursor)`` at the version the first poll pinned. To
    follow from an older retained version instead, seed the
    checkpoint by calling ``ack`` semantics yourself: the cursor
    file is ``{"table": path, "version": N}``.

    The cursor version must stay within retained history: if
    ``snapshot_expire`` dropped the cursor's manifest before the
    consumer caught up, the poll raises (the consumer has LOST the
    ability to compute exact changes and must re-bootstrap from a
    full read -- silently skipping the gap would be data loss).
    Operational rule: expire with ``keep_last`` generous enough to
    cover the slowest follower's lag.
    """
    head = snapshot_head(spark, path)
    cur = _read_follow_cursor(spark, checkpoint_dir)
    if cur is None:
        _write_follow_cursor(spark, checkpoint_dir, path, head)
        return None
    if cur.get("table") != path:
        raise ValueError(
            f"checkpoint at {checkpoint_dir} follows "
            f"{cur.get('table')!r}, not {path!r}"
        )
    from_v = int(cur["version"])
    if from_v >= head:
        return None
    retained = _list_versions(spark, path)
    if from_v not in retained:
        raise ValueError(
            f"CDC cursor v{from_v} was expired from {path} (retained: "
            f"{retained}); exact changes are unrecoverable -- "
            "re-bootstrap from snapshot_read at a retained version "
            "and reset the checkpoint"
        )
    changes = snapshot_changes(spark, path, from_v, head)

    def ack() -> None:
        _write_follow_cursor(spark, checkpoint_dir, path, head)

    return {
        "changes": changes,
        "from_version": from_v,
        "to_version": head,
        "ack": ack,
    }


def replicate_snapshot(
    spark: SparkSession,
    src_path: str,
    dst_path: str,
    checkpoint_dir: str,
    max_polls: int = 1_000_000,
) -> dict:
    """Catch a REPLICA snapshot table up with a source table through
    the checkpointed change feed -- :func:`sync_index_with_snapshot`
    specialized to a full replica (cross-region copy, staging->prod
    promotion, a derived table that tracks the corpus). Call it from
    a scheduler at any cadence (or via ``run_maintenance(
    replications=...)``); each call drains every pending interval and
    returns ``{intervals, rows_applied, src_version}``.

    Mechanics per interval: delete-images become ``_deleted``
    tombstone rows, insert/update images upsert -- one
    :func:`snapshot_merge` per interval, so the replica's write cost
    tracks the CHANGE volume, never the table size (the 100 TB
    argument: a replica is maintained for the price of the diffs).
    The cursor is acked only AFTER the merge commits; a crash between
    merge and ack replays the interval, and the replay re-merges the
    same images onto the same keys -- idempotent by the keyed-upsert
    algebra (tombstoning an absent key / replacing a row with
    identical bytes are both no-ops), so the replica never forks.
    Bootstrap, fork refusal (pre-existing replica under a fresh
    checkpoint) and crashed-bootstrap recovery are the harness's.

    The replica is a real snapshot table (its own history, time
    travel, expire) -- its version numbers are its OWN commit
    sequence, not the source's; ``src_version`` is the source-side
    high-water mark the cursor carries.
    """

    def _exists() -> bool:
        # ANY retained manifest means the replica exists — probing
        # version 1 specifically wedges replication permanently once
        # the replica's own snapshot_expire drops v00000001.json (the
        # cursor still exists, so the harness would take the crashed-
        # bootstrap branch and snapshot_create onto a live table)
        return bool(_list_versions(spark, dst_path))

    def _bootstrap(version: int) -> int:
        base = snapshot_read(spark, src_path, version=version)
        m = _read_manifest(spark, src_path, version)
        snapshot_create(
            base, dst_path, m["key_col"], bucket_hex=m.get("bucket_hex", 2)
        )
        return base.count()

    def _apply(ch: DataFrame) -> tuple[int, int]:
        data_cols = [c for c in ch.columns if c != "_change"]
        updates = ch.select(
            *data_cols,
            (F.col("_change") == "delete").alias(DELETED_COL),
        )
        if updates.limit(1).count():
            stats = snapshot_merge(spark, dst_path, updates)
            return stats["upserts"] + stats["deletes"], 0
        return 0, 0

    out = sync_index_with_snapshot(
        spark, src_path, checkpoint_dir, _exists, _bootstrap, _apply,
        max_polls=max_polls,
    )
    return {
        "intervals": out["intervals"],
        "rows_applied": out["appended"],
        "src_version": out["src_version"],
    }




def sync_index_with_snapshot(
    spark: SparkSession,
    table_path: str,
    checkpoint_dir: str,
    index_exists,
    bootstrap,
    apply_interval,
    max_polls: int = 1_000_000,
) -> dict:
    """The generic 'derived artifact follows the table' harness every
    index tier shares (inverted index, MinHash — and
    :func:`replicate_snapshot` is the same loop specialized to a
    snapshot replica): bootstrap from a full read at the pinned head,
    then drain change intervals through the durable cursor, acking
    each only after its effects landed.

    Callbacks: ``index_exists() -> bool`` (fork refusal under a fresh
    checkpoint); ``bootstrap(pinned_version) -> n_rows`` (build the
    artifact from ``snapshot_read`` at that version — also re-invoked
    to finish a bootstrap whose first attempt crashed after pinning
    the cursor); ``apply_interval(changes_df) -> (appended, removed)``
    (apply one interval's insert/update/delete images; MUST converge
    under redelivery — the cursor is acked only after it returns).

    Returns {intervals, appended, removed, src_version}.
    """
    polls = appended = removed = 0
    if _read_follow_cursor(spark, checkpoint_dir) is None:
        if index_exists():
            raise ValueError(
                f"derived artifact exists but the checkpoint at "
                f"{checkpoint_dir} is fresh; applying a from-now-on "
                "change feed onto unknown content would fork it -- "
                "re-bootstrap into an empty destination"
            )
        batch = follow_snapshot_changes(spark, table_path, checkpoint_dir)
        assert batch is None  # fresh checkpoint pins head
        cur = _read_follow_cursor(spark, checkpoint_dir)
        appended += int(bootstrap(int(cur["version"])) or 0)
    elif not index_exists():
        # crash between cursor pin and bootstrap: finish from the
        # pinned version (still retained: the cursor hasn't moved)
        cur = _read_follow_cursor(spark, checkpoint_dir)
        if cur.get("table") != table_path:
            raise ValueError(
                f"checkpoint at {checkpoint_dir} follows "
                f"{cur.get('table')!r}, not {table_path!r}"
            )
        appended += int(bootstrap(int(cur["version"])) or 0)
    while polls < max_polls:
        batch = follow_snapshot_changes(spark, table_path, checkpoint_dir)
        if batch is None:
            break
        polls += 1
        a, r = apply_interval(batch["changes"])
        appended += int(a)
        removed += int(r)
        batch["ack"]()
    cur = _read_follow_cursor(spark, checkpoint_dir)
    return {
        "intervals": polls,
        "appended": appended,
        "removed": removed,
        "src_version": int(cur["version"]),
    }


def compact_then_append_interval(
    ch: DataFrame,
    id_col: str,
    text_col: str,
    compact_fn,
    append_fn,
) -> tuple[int, int]:
    """The per-interval applier the content-index syncs share
    (inverted index, MinHash): remove the STALE entries first
    (``compact_fn(stale_ids_df)`` over delete+update ids -- an
    updated doc's old entry must stop answering probes; append-only
    entries cannot express replacement), then fold the new images in
    (``append_fn(fresh_df)`` over insert+update after-images).
    Returns (appended, removed). Converges under redelivery: a
    replayed interval re-removes the same ids (including entries a
    first attempt already appended for updated docs) and re-appends
    them; replay-duplicated insert entries persist only until the
    tier's next compaction (their documented at-least-once
    posture)."""
    ch = ch.select(id_col, text_col, "_change").persist()
    try:
        stale = ch.filter(
            F.col("_change").isin("delete", "update")
        ).select(id_col)
        n_stale = stale.count()
        if n_stale:
            compact_fn(stale)
        fresh = ch.filter(
            F.col("_change").isin("insert", "update")
        ).select(id_col, text_col)
        n_fresh = fresh.count()
        if n_fresh:
            append_fn(fresh)
    finally:
        ch.unpersist()
    return n_fresh, n_stale
