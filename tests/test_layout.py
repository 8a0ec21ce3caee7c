"""Z-order layout (operators/layout.py): the clustering claim is
MEASURED from the written parquet footers -- a time-sorted layout
skips nothing for user-targeted scans; the z-ordered layout must
skip most files for point predicates on BOTH dimensions."""

from __future__ import annotations

import statistics

import pytest
from pyspark.sql import functions as F

from xmidt_event_streams_spark.operators.layout import (
    file_skipping_stats,
    pruning_fraction,
    zorder_write,
)
from xmidt_event_streams_spark.session import load_tables

N_FILES = 16
COLS = ("user_id", "value")


@pytest.fixture(scope="module")
def layouts(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("layout")
    ev = load_tables(spark, "/root/testdata/sf0.01", ("events",))[
        "events"
    ].select("event_id", "user_id", "value")
    zpath, spath = str(base / "z"), str(base / "single")
    zorder_write(ev, COLS, zpath, n_files=N_FILES)
    # the single-dimension baseline: sorted by value only
    (
        ev.repartitionByRange(N_FILES, "value")
        .sortWithinPartitions("value")
        .write.mode("overwrite")
        .parquet(spath)
    )
    return ev, zpath, spath


def test_zorder_preserves_rows(spark, layouts):
    ev, zpath, _ = layouts
    got = spark.read.parquet(zpath)
    assert got.count() == ev.count()
    assert (
        got.agg(F.sum("event_id")).collect()[0][0]
        == ev.agg(F.sum("event_id")).collect()[0][0]
    )
    import glob

    assert len(glob.glob(f"{zpath}/*.parquet")) == N_FILES


def _mean_prune(stats, col, points):
    return statistics.mean(pruning_fraction(stats, col, p) for p in points)


def test_both_dimensions_prune(spark, layouts):
    """Point predicates on EITHER z-dimension must skip most files in
    the z layout; the value-sorted baseline prunes value but (by
    construction) almost nothing on user_id."""
    ev, zpath, spath = layouts
    zstats = file_skipping_stats(zpath, list(COLS))
    sstats = file_skipping_stats(spath, list(COLS))

    users = [r[0] for r in ev.select("user_id").distinct().limit(20).collect()]
    values = [
        r[0] for r in ev.select("value").orderBy("event_id").limit(20).collect()
    ]

    z_user = _mean_prune(zstats, "user_id", users)
    z_value = _mean_prune(zstats, "value", values)
    s_user = _mean_prune(sstats, "user_id", users)
    s_value = _mean_prune(sstats, "value", values)

    # the baseline: near-perfect on its sort column, near-zero on the
    # other -- this is the failure mode z-ordering exists to fix
    assert s_value >= 0.8
    assert s_user <= 0.2
    # z layout: meaningful pruning on BOTH dimensions (16 files in 2-D
    # -> each dim's per-file range ~ 1/4 of its domain -> ~75% skipped)
    assert z_user >= 0.5, (z_user, z_value)
    assert z_value >= 0.5, (z_user, z_value)


def test_footer_ranges_shrink_in_both_dims(spark, layouts):
    """Per-file [min, max] width for each z dimension must average
    well under the full domain (the footer-level form of the same
    claim, independent of probe choice)."""
    ev, zpath, _ = layouts
    lo_u, hi_u, lo_v, hi_v = ev.agg(
        F.min("user_id"), F.max("user_id"), F.min("value"), F.max("value")
    ).collect()[0]
    zstats = file_skipping_stats(zpath, list(COLS))
    widths = {"user_id": [], "value": []}
    for s in zstats:
        dom = (hi_u - lo_u) if s["col"] == "user_id" else (hi_v - lo_v)
        widths[s["col"]].append((s["max"] - s["min"]) / dom)
    assert statistics.mean(widths["user_id"]) <= 0.5
    assert statistics.mean(widths["value"]) <= 0.5


def test_three_dim_zorder(spark, tmp_path):
    """3-D Morton key: every dimension still prunes (ranges shrink
    ~ n_files^(-1/3) per dim -- looser per-dim than 2-D with the same
    file budget, but all three must beat no-clustering)."""
    ev = load_tables(spark, "/root/testdata/sf0.01", ("events",))[
        "events"
    ].select("event_id", "user_id", "value")
    path = str(tmp_path / "z3")
    cols3 = ("user_id", "value", "event_id")
    zorder_write(ev, cols3, path, n_files=27)
    stats = file_skipping_stats(path, list(cols3))
    lo, hi = {}, {}
    for c in cols3:
        row = ev.agg(F.min(c), F.max(c)).collect()[0]
        lo[c], hi[c] = row[0], row[1]
    for c in cols3:
        widths = [
            (s["max"] - s["min"]) / (hi[c] - lo[c])
            for s in stats
            if s["col"] == c
        ]
        assert statistics.mean(widths) <= 0.75, (c, statistics.mean(widths))


def test_zorder_guards(spark):
    from xmidt_event_streams_spark.operators.layout import zorder_key

    ev = load_tables(spark, "/root/testdata/sf0.001", ("events",))["events"]
    with pytest.raises(ValueError, match=">= 2 columns"):
        zorder_key(ev, ("value",))
    with pytest.raises(ValueError, match="overflows"):
        zorder_key(ev, ("value", "user_id"), bits=32)


def test_morton_key_is_bijective_on_bucket_grid(spark):
    """Every (a, b) bucket pair must map to a distinct Morton key
    (bits=4 -> the full 16x16 grid checked exhaustively): a collision
    would silently merge unrelated hyper-rectangles into one file."""
    from xmidt_event_streams_spark.operators.layout import _interleave

    grid = (
        spark.range(16)
        .withColumnRenamed("id", "a")
        .crossJoin(spark.range(16).withColumnRenamed("id", "b"))
    )
    out = grid.select(
        _interleave([F.col("a"), F.col("b")], 4).alias("z")
    )
    assert out.distinct().count() == 256
    lo, hi = out.agg(F.min("z"), F.max("z")).collect()[0]
    assert (lo, hi) == (0, 255)  # dense cover of the 8-bit key space
