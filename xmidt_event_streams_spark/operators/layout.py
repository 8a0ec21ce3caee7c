"""Z-order (Morton) clustered layout: multi-dimensional file skipping.

Parquet scans skip a file when the predicate falls outside the file's
column min/max footer stats. A layout sorted on ONE column gives
perfect skipping on that column and none on any other; at 100 TB the
events table is queried by time AND by user/device, and a time-sorted
layout makes every user-targeted scan read everything.

Z-ordering interleaves the bits of the (quantile-bucketed) dimensions
into one Morton key and range-partitions + sorts the write on it, so
every file covers a small hyper-rectangle of the combined space --
each dimension's per-file min/max range shrinks to roughly
N_files^(-1/d) of its domain, and point/range predicates on ANY
z-dimension skip most files. (Same layout idea Delta's OPTIMIZE
ZORDER applies; implemented here from the classical Morton-code
construction, plain Spark expressions, no table format required.)

Spark shape: quantile boundaries come from one approxQuantile pass
(driver holds 2 x 2^bits doubles); bucketing + bit interleave are
narrow JVM expressions; the only wide step is the repartitionByRange
on the z-key -- exactly one range shuffle, the same cost as any
sorted write. ``file_skipping_stats`` reads the parquet footers back
(pyarrow) so the clustering claim is measured, not asserted.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

Z_BITS_DEFAULT = 8  # 256 buckets per dimension


def _bucketize(col: Column, boundaries: list[float]) -> Column:
    """0-based quantile-bucket index: #boundaries <= value. A fold
    over the literal boundary array (2^bits elements) -- O(2^bits)
    per row, JVM-side, no shuffle."""
    arr = F.array(*[F.lit(float(b)) for b in boundaries])
    return F.aggregate(
        arr,
        F.lit(0),
        lambda acc, b: acc + F.when(col >= b, 1).otherwise(0),
    )


def _interleave(keys: list[Column], bits: int) -> Column:
    """Morton interleave of d ``bits``-wide bucket indices, bit i of
    key j landing at position i*d + j; fits a long for d*bits <= 63.

    The bucket indices are LET-BOUND (functions/text.let_bind) before
    the bit extraction: each index feeds ``bits`` bit-extraction
    terms, and since each index is itself a 2^bits-element fold,
    naive substitution would inline d * bits copies of the fold --
    measured to blow past whole-stage codegen's method-size limit and
    fall back to interpreted evaluation. Binding evaluates each fold
    once per row; the d*bits OR terms reference cheap lambda-variable
    element accesses."""
    from xmidt_event_streams_spark.functions.text import let_bind

    d = len(keys)
    if d * bits > 63:
        raise ValueError(f"{d} dims x {bits} bits overflows a long")

    def _body(a: Column) -> Column:
        z = F.lit(0).cast("long")
        for j in range(d):
            k = F.get(a, j)
            for i in range(bits):
                bit = F.shiftright(k, i).bitwiseAND(F.lit(1))
                z = z.bitwiseOR(F.shiftleft(bit, i * d + j))
        return z

    return let_bind(F.array(*[k.cast("long") for k in keys]), _body)


def zorder_key(
    df: DataFrame,
    cols: tuple[str, ...],
    bits: int = Z_BITS_DEFAULT,
    relative_error: float = 0.01,
) -> Column:
    """Morton key over 2+ numeric/timestamp columns. Buckets are
    QUANTILE-based (approxQuantile boundaries, one pass, driver holds
    d x 2^bits doubles), so skew in any dimension cannot collapse the
    key space the way linear min/max scaling would. Per-file range
    shrinks ~ n_files^(-1/d) per dimension -- more dims spread the
    budget thinner, so cluster on the 2-3 columns predicates actually
    hit."""
    if len(cols) < 2:
        raise ValueError("zorder needs >= 2 columns")
    if len(cols) * bits > 63:
        raise ValueError(
            f"{len(cols)} dims x {bits} bits overflows a long"
        )
    n_buckets = 1 << bits
    qs = [i / n_buckets for i in range(1, n_buckets)]
    names = [f"__zq_{c}" for c in cols]
    # ONE multi-column approxQuantile job (a per-column loop would
    # launch d full-table scans for sketches Spark computes together)
    all_bounds = df.select(
        *[F.col(c).cast("double").alias(n) for c, n in zip(cols, names)]
    ).approxQuantile(names, qs, relative_error)
    keys = [
        _bucketize(F.col(c).cast("double"), boundaries)
        for c, boundaries in zip(cols, all_bounds)
    ]
    return _interleave(keys, bits)


def zorder_write(
    df: DataFrame,
    cols: tuple[str, ...],
    path: str,
    n_files: int = 16,
    bits: int = Z_BITS_DEFAULT,
) -> None:
    """Write ``df`` as ``n_files`` parquet files clustered on the
    Morton key of ``cols``: one range shuffle, sorted within files so
    row-group stats are tight too. The z column itself is dropped --
    the layout, not the data, carries the information."""
    z = zorder_key(df, cols, bits)
    (
        df.withColumn("__z", z)
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )


def file_skipping_stats(path: str, cols: list[str]) -> list[dict]:
    """Per-file column min/max from the parquet footers (pyarrow) --
    the exact stats a scan's file/row-group skipping consults. Rows:
    {file, col, min, max}. Audit tool + test oracle."""
    import glob
    import os

    import pyarrow.parquet as pq

    out = []
    for f in sorted(glob.glob(os.path.join(path, "*.parquet"))):
        md = pq.ParquetFile(f).metadata
        mins: dict = {}
        maxs: dict = {}
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                col = md.row_group(rg).column(ci)
                name = col.path_in_schema
                if name not in cols or col.statistics is None:
                    continue
                st = col.statistics
                if st.min is not None:
                    mins[name] = (
                        st.min if name not in mins else min(mins[name], st.min)
                    )
                if st.max is not None:
                    maxs[name] = (
                        st.max if name not in maxs else max(maxs[name], st.max)
                    )
        for c in cols:
            if c in mins:
                out.append(
                    {"file": os.path.basename(f), "col": c,
                     "min": mins[c], "max": maxs[c]}
                )
    return out


def pruning_fraction(
    stats: list[dict], col: str, point
) -> float:
    """Fraction of files a point-equality predicate on ``col`` can
    SKIP given footer stats (the scan reads only files whose
    [min, max] contains the point). A file with NO stats row for
    ``col`` (e.g. an all-null chunk) counts as read, not skipped --
    a real scan cannot skip what it has no bounds for."""
    files = {s["file"] for s in stats}
    if not files:
        raise ValueError("no footer stats: nothing to prune against")
    with_stats = {s["file"] for s in stats if s["col"] == col}
    hit = {
        s["file"]
        for s in stats
        if s["col"] == col and s["min"] <= point <= s["max"]
    } | (files - with_stats)
    return 1.0 - len(hit) / len(files)
