"""The scale-audit harness (scale_audit.py) must keep measuring what
the plan docstrings claim: per-channel physical volumes from the
executed plan's SQL metrics, and growth exponents across a scale-factor
step that match each operator's contract.

These tests run the audit machinery over an sf0.001 -> sf0.01 step
(10x, same as the full artifact's 0.01 -> 0.1) so the contract
assertions stay cheap enough for the suite.
"""

from __future__ import annotations

import pytest

from scale_audit import audit_query, measure
from xmidt_event_streams_spark.catalog import QUERIES

SF_SMALL = "/root/testdata/sf0.001"
SF_BIG = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def audits(spark):
    """One audited query per contract class (warmed: volume metrics
    are run-invariant, only timings need steady state)."""
    out = {}
    for name in ("tpch_q1", "session_windows", "tpch_q3"):
        out[name] = audit_query(
            spark, QUERIES[name].fn, SF_SMALL, SF_BIG, 10.0
        )
    return out


def test_channels_populated(audits):
    """The plan walk actually finds the volume metrics (a Spark
    upgrade renaming metric keys must fail here, not silently zero
    the artifact)."""
    q1 = audits["tpch_q1"]["big"]
    assert q1["scan_bytes"] > 0
    assert q1["n_exchanges"] >= 1
    q3 = audits["tpch_q3"]["big"]
    assert q3["broadcast_bytes"] > 0 and q3["n_broadcasts"] >= 1
    assert q3["shuffle_bytes"] > 0


def test_scan_grows_linearly(audits):
    """Full-scan queries read ~10x the bytes at 10x the data."""
    for name in audits:
        e = audits[name]["exponents"]["scan_bytes"]
        assert e is not None and 0.8 <= e <= 1.2, (name, e)


def test_agg_shuffle_is_bounded(audits):
    """tpch_q1 aggregates to 6 groups: its shuffle volume is bounded
    by (partitions x groups), NOT by input size -- the map-side
    partial-agg contract. Exponent ~0 across the 10x step."""
    e = audits["tpch_q1"]["exponents"]["shuffle_bytes"]
    assert e is None or e < 0.3, e


def test_keyed_shuffle_is_linear(audits):
    """session_windows must shuffle every event once on user_id --
    linear by contract, and the audit should say so rather than
    hide it."""
    e = audits["session_windows"]["exponents"]["shuffle_bytes"]
    assert e is not None and e > 0.7, e


def test_no_spill(audits):
    """Nothing spills at test SFs; a spilling partition here is an
    OOM-risk partition at 100 TB."""
    for name in audits:
        assert audits[name]["big"]["spill_bytes"] == 0, name


def test_growing_broadcast_is_flagged(spark):
    """tpch_q3 broadcasts order/customer projections that grow with
    the data -- the audit must flag the threshold crossing (the plan
    silently re-shapes to a shuffle join past it). Measured at the
    artifact's own 0.01 -> 0.1 step: at smaller SFs the broadcast
    dataSize is dominated by fixed row overhead and the growth
    signal hasn't emerged yet."""
    r = audit_query(
        spark, QUERIES["tpch_q3"].fn, SF_BIG, "/root/testdata/sf0.1", 10.0
    )
    assert any("broadcast_grows" in f for f in r["flags"]), r


def test_measure_is_reusable(spark):
    """measure() leaves no session-level state behind (each call
    builds a fresh plan; a second call returns consistent volumes)."""
    a = measure(spark, QUERIES["tpch_q1"].fn, SF_SMALL)
    b = measure(spark, QUERIES["tpch_q1"].fn, SF_SMALL)
    assert a["scan_bytes"] == b["scan_bytes"]
    assert a["n_exchanges"] == b["n_exchanges"]


def test_checked_in_artifact_covers_current_registry():
    """The committed SCALE_AUDIT.json must be a FULL-registry snapshot
    of the registry as it exists now -- the same source-derived-gate
    trick as the rotation policy. A rotation that adds a query without
    re-running `SPARK_GRAFT_AUDIT_FULL=1 python scale_audit.py` fails
    here, so no registry query can claim at-scale plan shapes without
    measured volume evidence in the tree (the r4 verdict's stale-
    artifact finding, made structurally impossible)."""
    import json
    from pathlib import Path

    artifact = json.loads(
        (Path(__file__).resolve().parent.parent / "SCALE_AUDIT.json")
        .read_text()
    )
    assert artifact["full_registry"] is True, (
        "SCALE_AUDIT.json is a headline-only snapshot -- regenerate "
        "with SPARK_GRAFT_AUDIT_FULL=1 python scale_audit.py"
    )
    audited = set(artifact["queries"])
    registry = set(QUERIES)
    assert audited == registry, (
        f"scale audit is stale vs the registry: unaudited "
        f"{sorted(registry - audited)}, ghost entries "
        f"{sorted(audited - registry)} -- regenerate the artifact"
    )


def test_checked_in_artifact_audits_index_paths():
    """The committed artifact must also carry the INDEX-PATH section
    (probe + fetch channels across a 10x corpus step): the ANN probe
    and point fetch run outside the registry queries, so without this
    section the weakest plans in the engine would be the only ones
    with no measured growth evidence."""
    import json
    from pathlib import Path

    artifact = json.loads(
        (Path(__file__).resolve().parent.parent / "SCALE_AUDIT.json")
        .read_text()
    )
    ip = artifact.get("index_paths")
    assert ip, "regenerate SCALE_AUDIT.json: no index_paths section"
    assert ip["n_big"] >= 10 * ip["n_small"]
    for part in ("probe", "fetch", "refine_probe"):
        assert ip[part]["exponents"]["scan_bytes"] is not None
        # all paths must scan a bounded FRACTION that shrinks (probe:
        # n_probe/n_cells with sqrt(N) cells; fetch: ~|ids| rows of a
        # growing store) -- a frac that does not shrink across 10x
        # means pruning stopped working
        assert (
            ip[part]["big"]["rows_scanned_frac"]
            < ip[part]["small"]["rows_scanned_frac"]
        ), part
        # and never spill
        assert ip[part]["big"]["spill_bytes"] == 0, part
    # the in-index refine probe (r8b) must stay a pure pruned scan:
    # the refine payload rides the scan -- no fetch join, no exchange
    assert ip["refine_probe"]["big"]["shuffle_bytes"] == 0
    assert ip["refine_probe"]["big"]["n_broadcasts"] == 0
    # the token-level MaxSim probe (r10) rides the same machinery:
    # manifest-listed pruned scan over the probed-cell union, rerank
    # arithmetic IN the scan, driver merge carries only score rows --
    # so zero shuffles/broadcasts and a shrinking scanned fraction of
    # the (replicated) index
    tp = ip.get("maxsim_token_probe")
    assert tp, "regenerate SCALE_AUDIT.json: no maxsim_token_probe arm"
    assert tp["big"]["shuffle_bytes"] == 0
    assert tp["big"]["n_broadcasts"] == 0
    assert tp["big"]["spill_bytes"] == 0
    assert (
        tp["big"]["rows_scanned_frac"] < tp["small"]["rows_scanned_frac"]
    )


def test_superlinear_shuffle_is_flagged():
    """The flag rule itself (pure function): a shuffle exponent past
    the threshold is flagged; a documented-waiver query is flagged
    WITH its waiver text (visible, never silent -- the r6 finding);
    linear-by-contract shuffles stay unflagged."""
    from scale_audit import SHUFFLE_WAIVERS, compute_flags

    def vols(shuffle_small, shuffle_big):
        base = {
            "scan_bytes": 1,
            "broadcast_bytes": 0,
            "spill_bytes": 0,
        }
        small = dict(base, shuffle_bytes=shuffle_small)
        big = dict(base, shuffle_bytes=shuffle_big)
        exps = {
            "scan_bytes": 1.0,
            "broadcast_bytes": None,
            "shuffle_bytes": (
                None
                if not (shuffle_small and shuffle_big)
                else round(
                    __import__("math").log(shuffle_big / shuffle_small)
                    / __import__("math").log(10.0),
                    2,
                )
            ),
        }
        return small, big, exps

    # e = 2.42 (the jaccard case), unwaived query: flagged, no waiver
    s, b, e = vols(25_000, 25_000 * 10**2.42)
    flags = compute_flags("some_query", s, b, e, 10.0)
    assert any(
        f.startswith("shuffle_grows") and "WAIVED" not in f for f in flags
    ), flags
    # the waived exact-join: flagged WITH the waiver text
    assert "jaccard_join_prefix" in SHUFFLE_WAIVERS
    flags_w = compute_flags("jaccard_join_prefix", s, b, e, 10.0)
    assert any(
        f.startswith("shuffle_grows") and "WAIVED" in f for f in flags_w
    ), flags_w
    # linear shuffle (e ~ 1): not flagged
    s, b, e = vols(25_000, 250_000)
    assert not compute_flags("some_query", s, b, e, 10.0)


def test_constant_fetch_linear_scan_is_flagged():
    """r9 rule: a constant-output fetch whose scanned rows grow at
    e >= 0.9 across the store step must flag (pruning silently off is
    exactly the regression the audit exists to catch); the scattered
    arm's known geometry carries its waiver text, visibly."""
    from scale_audit import fetch_scan_flags

    small = {
        "rows_fetched": 643, "rows_scanned": 125_000,
        "rows_scanned_frac": 1.0,
    }
    big = {
        "rows_fetched": 643, "rows_scanned": 1_200_000,
        "rows_scanned_frac": 0.96,
    }
    exps = {"rows_scanned": 0.98}
    got = fetch_scan_flags("fetch_clustered", small, big, exps)
    assert got and "linear_scan_on_constant_fetch" in got[0]
    assert "WAIVED" not in got[0]  # the clustered arm has no waiver
    waived = fetch_scan_flags("fetch", small, big, exps)
    assert waived and "WAIVED" in waived[0]
    # an unpruned SMALL store flags even when the exponent is
    # sublinear (the r8 scattered arm's shape: frac 1.0 -> 0.54,
    # e=0.73 -- the audit must not stay silent on a full-store scan
    # for a constant fetch)
    got = fetch_scan_flags(
        "fetch_clustered",
        {"rows_fetched": 643, "rows_scanned": 125_000,
         "rows_scanned_frac": 1.0},
        {"rows_fetched": 643, "rows_scanned": 680_000,
         "rows_scanned_frac": 0.54},
        {"rows_scanned": 0.73},
    )
    assert got and "linear_scan_on_constant_fetch" in got[0]
    # growing output explains growing scan: no flag
    assert fetch_scan_flags(
        "fetch_clustered",
        {"rows_fetched": 100, "rows_scanned": 10_000,
         "rows_scanned_frac": 0.08},
        {"rows_fetched": 1_000, "rows_scanned": 100_000,
         "rows_scanned_frac": 0.08},
        {"rows_scanned": 1.0},
    ) == []
    # pruned and sublinear: no flag
    assert fetch_scan_flags(
        "fetch_clustered",
        {"rows_fetched": 643, "rows_scanned": 8_000,
         "rows_scanned_frac": 0.064},
        {"rows_fetched": 643, "rows_scanned": 38_000,
         "rows_scanned_frac": 0.03},
        {"rows_scanned": 0.68},
    ) == []


def test_checked_in_artifact_has_clustered_fetch_arm():
    """The committed artifact must carry the r9 clustered-fetch arm
    (the production shortlist geometry) proving row-group pruning
    engages: scanned fraction < 0.10 at BOTH store sizes -- and the
    scattered arm's linear scan must be flagged WITH its waiver, not
    silent (the r8 audit's blind spot)."""
    import json
    from pathlib import Path

    artifact = json.loads(
        (Path(__file__).resolve().parent.parent / "SCALE_AUDIT.json")
        .read_text()
    )
    ip = artifact["index_paths"]
    cl = ip.get("fetch_clustered")
    assert cl, "regenerate SCALE_AUDIT.json: no fetch_clustered arm"
    assert cl["small"]["rows_scanned_frac"] < 0.10, cl["small"]
    assert cl["big"]["rows_scanned_frac"] < 0.10, cl["big"]
    assert cl["small"]["rows_fetched"] == cl["big"]["rows_fetched"]
    assert not any(
        "linear_scan_on_constant_fetch" in f and "WAIVED" not in f
        for f in cl["flags"]
    ), cl["flags"]
    # the scattered arm's geometry-driven linear scan is flagged+waived
    assert any(
        "linear_scan_on_constant_fetch" in f and "WAIVED" in f
        for f in ip["fetch"]["flags"]
    ), ip["fetch"]["flags"]
