"""Prose-vs-artifact staleness gate (r10, VERDICT r9 #2).

r9's post-mortem: PLANS.md claimed the in-index MaxSim path ran at
"1.02x brute" while both the HEAD sidecar (0.76x) and the healthy
regen (0.79x) said otherwise -- prose drifted from the committed
artifact and nothing caught it. This gate makes that class of drift
mechanical, the same trick as test_scale_audit's registry-coverage
check: numeric claims in PLANS.md / USAGE.md that cite artifact keys
use an explicit machine-checkable citation format, and this test
re-derives every citation from the committed artifact.

Citation format (anywhere in PLANS.md or USAGE.md):

    `SIDECAR:ann.ivfpq_search_sec = 1.366`
    `SIDECAR:maxsim.speedup_in_index = 0.79` (tol 10%)
    `BENCH:total_sec = 9.454`

* ``SIDECAR:<dotted.path>`` resolves into BENCH_SIDECARS.json;
  ``BENCH:<key>`` into the newest committed BENCH_r*.json;
  ``AUDIT:<dotted.path>`` into SCALE_AUDIT.json.
* Default tolerance is 5% relative (wall-clock numbers wobble);
  ``(tol N%)`` after the closing backtick overrides per-claim.
* A claim explicitly marked stale -- ``(stale rN)`` after the
  backtick -- is skipped: the marker IS the honest disclosure the
  r9 verdict asked for.
* REQUIRED_CLAIMS pins the minimum set that must exist somewhere in
  the prose, so the gate cannot be emptied by deleting citations.
"""

from __future__ import annotations

import json
import re
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent

# the claims the round's prose MUST carry (fresh, not stale-marked):
# the ANN serving gate and the MaxSim serving ratio are exactly the
# two numbers whose prose drifted in r8/r9
REQUIRED_CLAIMS = (
    "SIDECAR:ann.ivfpq_search_sec",
    "SIDECAR:maxsim.speedup_in_index",
)

_CITE = re.compile(
    r"`(SIDECAR|BENCH|AUDIT):([A-Za-z0-9_.]+)\s*=\s*(-?[0-9.]+)`"
    r"(?:\s*\((?:tol\s*(\d+)%|(stale)\s*r?\d*)\))?"
)


def _artifact(kind: str) -> dict:
    if kind == "SIDECAR":
        return json.loads((REPO / "BENCH_SIDECARS.json").read_text())
    if kind == "AUDIT":
        return json.loads((REPO / "SCALE_AUDIT.json").read_text())
    # BENCH: the newest committed per-round bench artifact
    rounds = sorted(
        REPO.glob("BENCH_r*.json"),
        key=lambda p: int(re.search(r"r(\d+)", p.name).group(1)),
    )
    assert rounds, "no BENCH_r*.json committed"
    return json.loads(rounds[-1].read_text())


def _resolve(doc: dict, dotted: str):
    cur = doc
    for part in dotted.split("."):
        if isinstance(cur, list):
            cur = cur[int(part)]
        else:
            assert part in cur, f"artifact has no key {dotted!r}"
            cur = cur[part]
    return cur


def _claims():
    found = []
    for name in ("PLANS.md", "USAGE.md"):
        p = REPO / name
        if not p.exists():
            continue
        for m in _CITE.finditer(p.read_text()):
            kind, path, val, tol, stale = m.groups()
            found.append(
                {
                    "doc": name,
                    "kind": kind,
                    "path": path,
                    "value": float(val),
                    "tol": (float(tol) / 100.0) if tol else 0.05,
                    "stale": bool(stale),
                }
            )
    return found


def test_cited_numbers_match_committed_artifacts():
    claims = _claims()
    fresh = [c for c in claims if not c["stale"]]
    assert fresh, (
        "PLANS.md/USAGE.md carry no machine-checkable artifact "
        "citations -- the staleness gate has nothing to hold"
    )
    errs = []
    for c in fresh:
        actual = _resolve(_artifact(c["kind"]), c["path"])
        actual = float(actual)
        denom = max(abs(actual), 1e-9)
        if abs(actual - c["value"]) / denom > c["tol"]:
            errs.append(
                f"{c['doc']}: `{c['kind']}:{c['path']}` claims "
                f"{c['value']} but the committed artifact holds "
                f"{actual} (tol {c['tol']:.0%}) -- update the prose "
                f"or mark the claim (stale rN)"
            )
    assert not errs, "\n".join(errs)


def test_required_claims_present_and_fresh():
    have = {
        f"{c['kind']}:{c['path']}"
        for c in _claims()
        if not c["stale"]
    }
    missing = [k for k in REQUIRED_CLAIMS if k not in have]
    assert not missing, (
        f"prose must carry fresh citations for {missing} -- these are "
        "the exact numbers whose prose drifted in r8/r9"
    )


def test_ann_serving_gate_at_calibration_parity():
    """VERDICT r9 #3: the production ANN serving wall must meet the
    builder's own ``ivfpq_search_sec <= 1.5`` gate whenever the
    committed sidecar self-describes a HEALTHY host (the calibration
    channel exists precisely so this gate cannot be dodged by blaming
    the box without evidence). r10 closes it by choosing the
    operating point on RERANKED recall (the served path's recall):
    n_probe=2 meets the gate with rerank recall >= 0.9."""
    side = _artifact("SIDECAR")
    cal = side.get("calibration_end") or side.get("calibration_start")
    if cal is None or cal.get("host_degraded"):
        pytest.skip("sidecar self-describes a degraded host")
    # the sidecar arms run AFTER calibration_end (the headline's
    # closing bracket), so a co-tenant arriving mid-sidecars can
    # contaminate every arm while calibration_end still reads healthy
    # (observed r10 continuation: cal_end 1.044, maxsim brute 6.5x
    # its committed wall). Artifacts written since carry a closing
    # `calibration_after_sidecars` bracket -- require it healthy too,
    # and scale the wall bounds by the WORSE of the two ends.
    cal_after = side.get("calibration_after_sidecars")
    if cal_after is not None:
        if cal_after.get("host_degraded"):
            pytest.skip(
                "sidecar section's closing calibration is degraded "
                "(co-tenant arrived mid-sidecars)"
            )
        cal = max(cal, cal_after, key=lambda c: float(c.get("factor") or 1.0))
    # scale the wall bounds by the MEASURED host factor (>= 1.0): the
    # per-round regen runs on whatever box the driver has, and a
    # sub-threshold co-tenant (factor 1.0-1.2, flagged healthy)
    # inflates walls by exactly that factor -- the calibration
    # channel exists to adjudicate this, so the gate uses it instead
    # of flaking on it. A real code regression (2x) still fails at
    # any healthy factor.
    scale = max(1.0, float(cal.get("factor") or 1.0))
    ann = side["ann"]
    assert ann["ivfpq_search_sec"] <= 1.5 * scale, (
        f"ANN probe gate missed at calibration parity: "
        f"{ann['ivfpq_search_sec']} > 1.5 x {scale}"
    )
    # the SERVED path's wall is the rerank probe's (scan + in-index
    # payload carry + driver decode), strictly above the raw probe's
    # -- gate it too, at the probe gate + the measured in-index
    # decode overhead (<= 0.5 s across r9/r10 runs), so the 1.5 s
    # probe gate can't be "met" by a config whose actually-served
    # wall drifted (r10 review finding)
    assert ann["ivfpq_rerank_search_sec"] <= 2.0 * scale, (
        f"served-path (rerank) wall missed: "
        f"{ann['ivfpq_rerank_search_sec']} > 2.0 x {scale}"
    )
    chosen = [
        p
        for p in ann["ivfpq_n_probe_sweep"]
        if p["n_probe"] == ann["ivfpq_n_probe"]
    ]
    assert chosen, "chosen n_probe missing from its own sweep"
    # the gate must not be met by trading away served recall
    assert chosen[0].get(
        "rerank_recall_at_10", ann.get("ivfpq_rerank_recall_at_10", 0)
    ) >= 0.9
