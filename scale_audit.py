"""Scale audit: measured physical data volumes per headline query,
with empirical growth exponents.

"Would this plan survive a 100x scale-up?" should be measured, not
argued. This harness runs every headline catalog query at TWO scale
factors (default sf0.01 and sf0.1 -- a 10x data step), walks the
executed plan's SQL metrics, and aggregates the physical volume
channels that determine behavior on a real cluster:

  * scan_bytes        -- parquet bytes read (``filesSize`` on scans);
  * shuffle_bytes     -- bytes written through every Exchange;
  * broadcast_bytes   -- bytes materialized on the driver for every
                         BroadcastExchange (the channel that silently
                         stops working at scale: past
                         autoBroadcastJoinThreshold AQE falls back to
                         a shuffle join, changing the plan shape);
  * spill_bytes       -- HashAggregate/Sort spill (must stay 0: a
                         spilling partition at sf0.1 is an OOM-risk
                         partition at 100 TB).

For each channel the audit fits the empirical growth exponent
e = log(v_big / v_small) / log(sf_big / sf_small), so e ~ 1 means the
channel grows linearly with input and e ~ 0 means it is bounded by
something data-size-independent (group-by cardinality, partition
count, a constant dim table). The per-query verdict flags:

  * a shuffle channel growing linearly is FINE if it is the operator's
    contract (dedup must shuffle its keys once) -- it is reported, not
    judged;
  * a broadcast channel growing linearly IS flagged
    (``broadcast_grows``): that side will cross the broadcast
    threshold at some SF and the plan silently re-shapes -- each flag
    names the projected crossing point;
  * any nonzero spill is flagged (``spills``).

The artifact also carries an ``index_paths`` section (r8): the
IVF-PQ probe's scan relation and the point fetch measured across a
10x corpus step with the same channels and flag rules -- those jobs
run OUTSIDE the registry queries (driver-merged probes return local
relations), so the registry audit alone never saw the engine's
weakest plans.

Output: SCALE_AUDIT.json (one run artifact, keyed by query) plus a
one-line JSON summary on stdout. Caveats recorded in the artifact:
scalar-subquery subtrees are not walked (their volumes are 1-row by
construction in this catalog); ReusedExchange is a leaf, so reused
shuffles are counted once (matching what is physically written).
"""

from __future__ import annotations

import json
import math
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from xmidt_event_streams_spark.catalog import QUERIES  # noqa: E402
from xmidt_event_streams_spark.session import get_spark  # noqa: E402

# broadcast fallback threshold used for crossing-point projection
_BCAST_THRESHOLD_BYTES = 10 * 1024 * 1024  # Spark default 10 MB

# a shuffle channel growing SUPERLINEARLY (exponent past this) is the
# 100x-scale killer this audit exists to catch: at e=2 a 100x data
# step is a 10,000x shuffle. Linear-by-contract shuffles (e ~ 1) stay
# unflagged -- dedup must shuffle its keys once.
_SHUFFLE_EXP_FLAG = 1.3

# documented waivers: operators whose superlinear shuffle is INHERENT
# to their exact semantics and already guarded by a typed budget
# error. The audit flags them WITH the waiver text -- visible, never
# silent (the r6 finding: jaccard's e=2.42 sailed through unflagged
# while benign broadcasts got flags).
SHUFFLE_WAIVERS = {
    "jaccard_join_prefix": (
        "exact set-similarity join: candidate-pair growth is inherent "
        "to exactness (AllPairs/PPJoin prefix filtering bounds but "
        "cannot linearize it); guarded by the typed "
        "CandidatePairBudgetExceeded budget (operators/ssjoin.py) "
        "instead of degrading silently"
    ),
}


def _walk(node, acc: dict) -> None:
    """Accumulate volume metrics over the final physical plan,
    unwrapping AQE and query-stage wrappers."""
    name = node.nodeName()
    m = node.metrics()
    it = m.keysIterator()
    while it.hasNext():
        k = it.next()
        v = m.apply(k).value()
        if k == "filesSize":
            acc["scan_bytes"] += v
        elif k == "shuffleBytesWritten":
            acc["shuffle_bytes"] += v
        elif k == "shuffleRecordsWritten":
            acc["shuffle_records"] += v
        elif k == "dataSize" and name == "BroadcastExchange":
            acc["broadcast_bytes"] += v
        elif k == "spillSize":
            acc["spill_bytes"] += v
    if name == "Exchange":
        acc["n_exchanges"] += 1
    elif name == "BroadcastExchange":
        acc["n_broadcasts"] += 1
    if "AdaptiveSparkPlan" in name:
        _walk(node.finalPhysicalPlan(), acc)
        return
    if "QueryStage" in name:
        _walk(node.plan(), acc)
        return
    ch = node.children()
    for i in range(ch.size()):
        _walk(ch.apply(i), acc)


def measure(spark, fn, sf_dir: str) -> dict:
    """Run one query and return its wall time + volume channels."""
    df = fn(spark, sf_dir)
    t0 = time.perf_counter()
    df.collect()
    sec = round(time.perf_counter() - t0, 3)
    acc = {
        "scan_bytes": 0,
        "shuffle_bytes": 0,
        "shuffle_records": 0,
        "broadcast_bytes": 0,
        "spill_bytes": 0,
        "n_exchanges": 0,
        "n_broadcasts": 0,
    }
    _walk(df._jdf.queryExecution().executedPlan(), acc)
    acc["sec"] = sec
    return acc


def exponent(v_small: float, v_big: float, sf_ratio: float) -> float | None:
    """Empirical growth exponent across the SF step; None if either
    side is zero (channel absent)."""
    if v_small <= 0 or v_big <= 0:
        return None
    return round(math.log(v_big / v_small) / math.log(sf_ratio), 2)


def compute_flags(
    name: str | None,
    small: dict,
    big: dict,
    exps: dict,
    sf_ratio: float,
) -> list[str]:
    """The per-query verdict rules, pure so tests can pin them."""
    flags = []
    e_b = exps["broadcast_bytes"]
    if e_b is not None and e_b > 0.5 and big["broadcast_bytes"] > 0:
        # project the SF multiple (vs sf_big) where the broadcast side
        # crosses the default threshold and AQE re-shapes the join
        mult = (_BCAST_THRESHOLD_BYTES / big["broadcast_bytes"]) ** (1 / e_b)
        where = (
            f"already above it at this SF (x{mult:.2f})"
            if mult <= 1
            else f"crosses it at ~{mult:.0f}x this SF"
        )
        flags.append(
            f"broadcast_grows: e={e_b}, {_BCAST_THRESHOLD_BYTES >> 20} MB "
            f"default threshold -- {where} (AQE falls back to shuffle join)"
        )
    e_s = exps["shuffle_bytes"]
    if e_s is not None and e_s > _SHUFFLE_EXP_FLAG:
        note = (
            f"shuffle_grows: e={e_s}, "
            f"{small['shuffle_bytes']} -> {big['shuffle_bytes']} bytes "
            f"across the x{sf_ratio:g} step"
        )
        waiver = SHUFFLE_WAIVERS.get(name or "")
        if waiver:
            note += f" -- WAIVED: {waiver}"
        flags.append(note)
    if big["spill_bytes"] > 0:
        flags.append(f"spills: {big['spill_bytes']} bytes at sf_big")
    return flags


_FETCH_SCAN_EXP_FLAG = 0.9

# constant-output fetch arms whose linear scan growth is a property
# of the MEASUREMENT GEOMETRY, not a pruning regression -- flagged
# WITH the waiver text, never silently
FETCH_SCAN_WAIVERS = {
    "fetch": (
        "scattered candidate geometry: 64 uniform runs place one "
        "interval in essentially every row group, so row-group "
        "pruning cannot drop any at the small store (frac 1.0) and "
        "the fraction halves per 10x as group count outgrows run "
        "count; the production shortlist shape is the clustered arm "
        "(fetch_clustered), which prunes to <0.10 at both sizes"
    ),
}


def fetch_scan_flags(
    name: str, small: dict, big: dict, exps: dict
) -> list[str]:
    """r9 rule (the r8 audit's blind spot): a fetch whose OUTPUT is
    constant across the store-size step but whose scan shows pruning
    not engaging -- scanned rows growing ~linearly (e >= 0.9), OR the
    small store scanned essentially in full (frac >= 0.9) -- is
    exactly the regression class this audit exists to catch. Pure so
    tests pin it."""
    flags: list[str] = []
    e_rows = exps.get("rows_scanned")
    frac_small = small.get("rows_scanned_frac")
    linear = e_rows is not None and e_rows >= _FETCH_SCAN_EXP_FLAG
    unpruned = frac_small is not None and frac_small >= 0.9
    if small.get("rows_fetched") == big.get("rows_fetched") and (
        linear or unpruned
    ):
        note = (
            f"linear_scan_on_constant_fetch: rows_scanned e={e_rows}, "
            f"small-store frac={frac_small} "
            f"({small['rows_scanned']} -> {big['rows_scanned']}) for a "
            f"constant {big.get('rows_fetched')}-row fetch"
        )
        waiver = FETCH_SCAN_WAIVERS.get(name)
        if waiver:
            note += f" -- WAIVED: {waiver}"
        flags.append(note)
    return flags


def audit_query(
    spark,
    fn,
    sf_small: str,
    sf_big: str,
    sf_ratio: float,
    name: str | None = None,
) -> dict:
    small = measure(spark, fn, sf_small)
    big = measure(spark, fn, sf_big)
    exps = {
        ch: exponent(small[ch], big[ch], sf_ratio)
        for ch in ("scan_bytes", "shuffle_bytes", "broadcast_bytes")
    }
    return {
        "small": small,
        "big": big,
        "exponents": exps,
        "flags": compute_flags(name, small, big, exps, sf_ratio),
    }


# ---------------------------------------------------------------- #
# index-path audit: the ANN probe and point-fetch jobs live OUTSIDE
# the registry queries (driver-merged probes return local relations),
# so the registry audit never sees their plans -- yet they are the
# plans with the weakest prior evidence (VERDICT r7 #7). This section
# measures probe_ivfpq_index's scan relation and fetch_by_ids across
# a 10x corpus step with the same channels + flag rules.
# ---------------------------------------------------------------- #

_IDX_N_SMALL = 125_000
_IDX_N_BIG = 1_250_000
_IDX_DIM = 16
_IDX_QUERIES = 64
_IDX_N_PROBE = 4
_IDX_RERANK_C = 32


def _index_corpus(spark, n: int):
    """Deterministic (id, embedding) relation from JVM hash
    expressions (no Python in the generator): content quality is
    irrelevant here -- the audit measures I/O channels, not recall."""
    from pyspark.sql import functions as F

    cols = [
        (
            (
                F.pmod(
                    F.xxhash64(F.col("id") + F.lit(d * 1_000_003)),
                    F.lit(2000),
                )
                - F.lit(1000)
            ).cast("double")
            / 1000.0
        )
        for d in range(_IDX_DIM)
    ]
    return spark.range(n).select(
        F.col("id").alias("vec_id"), F.array(*cols).alias("embedding")
    )


def _measure_index_paths(spark, n: int, tmpdir: str) -> dict:
    from pyspark.sql import functions as F

    from xmidt_event_streams_spark.operators.fetch import (
        fetch_by_ids,
        scan_output_rows,
    )
    from xmidt_event_streams_spark.operators.ivf import (
        _nearest_cells_driver,
    )
    from xmidt_event_streams_spark.operators.ivfpq import (
        ivfpq_fit,
        probe_ivfpq_index,
        probed_codes_relation,
        write_ivfpq_index,
    )

    corpus_dir = f"{tmpdir}/corpus{n}"
    (
        _index_corpus(spark, n)
        .sortWithinPartitions("vec_id")  # the point-fetch write contract
        .write.option("parquet.block.size", 1 << 20)
        .parquet(corpus_dir)
    )
    corpus = spark.read.parquet(corpus_dir)
    cents, cbs = ivfpq_fit(corpus, m=8, k=16, n_iters=2, corpus_rows=n)
    ixdir = f"{tmpdir}/ix{n}"
    write_ivfpq_index(corpus, ixdir, cents, cbs)
    qrows = [
        (int(r["vec_id"]), [float(x) for x in r["embedding"]])
        for r in corpus.filter(
            F.col("vec_id") % (n // _IDX_QUERIES) == 17
        )
        .limit(_IDX_QUERIES)
        .collect()
    ]

    def _acc():
        return {
            "scan_bytes": 0,
            "shuffle_bytes": 0,
            "shuffle_records": 0,
            "broadcast_bytes": 0,
            "spill_bytes": 0,
            "n_exchanges": 0,
            "n_broadcasts": 0,
        }

    # probe wall time (warm min-of-2, the bench convention) ...
    def _probe():
        t0 = time.perf_counter()
        probe_ivfpq_index(
            spark, ixdir, qrows, 10, n_probe=_IDX_N_PROBE
        ).collect()
        return time.perf_counter() - t0

    _probe()
    probe_sec = round(min(_probe(), _probe()), 3)
    # ... and the probe's SCAN relation's channels: the probe merges
    # driver-side (its result is a local relation), so its executed
    # scan plan is reconstructed here exactly as probe_ivfpq_index
    # builds it (same probed-cell derivation, same manifest read)
    cells_per_q = _nearest_cells_driver(
        [v for _, v in qrows], cents, _IDX_N_PROBE
    )
    probed = sorted({int(c) for cs in cells_per_q for c in cs})
    # the probe's OWN input relation (shared constructor, so the
    # audited plan is the executed plan). collect() (not count()) so
    # the metrics land on THIS DataFrame's QueryExecution -- count()
    # builds its own plan, leaving the walked one unexecuted (zero
    # channels)
    base = probed_codes_relation(spark, ixdir, probed, "vec_id")
    scanned = len(base.collect())
    probe = _acc()
    _walk(base._jdf.queryExecution().executedPlan(), probe)
    probe["sec"] = probe_sec
    probe["rows_scanned"] = scanned
    probe["rows_scanned_frac"] = round(scanned / n, 4)
    probe["probed_cells"] = len(probed)
    probe["n_cells"] = len(cents)

    # point fetch: a rerank-shaped candidate set (clustered runs +
    # stragglers), size-invariant at ~650 ids so the measured growth
    # is the STORE's, not the query's
    ids = [
        i
        for g in range(_IDX_QUERIES)
        for i in range(g * (n // _IDX_QUERIES) + 17,
                       g * (n // _IDX_QUERIES) + 27)
    ] + [3, n // 2, n - 5]
    fdf = fetch_by_ids(corpus, ids, id_col="vec_id").select("vec_id")
    got = len(fdf.collect())  # executes fdf's own QueryExecution
    fetch = _acc()
    _walk(fdf._jdf.queryExecution().executedPlan(), fetch)
    t0 = time.perf_counter()
    fetch_by_ids(corpus, ids, id_col="vec_id").select(
        "vec_id"
    ).collect()
    fetch["sec"] = round(time.perf_counter() - t0, 3)
    fetch["ids_requested"] = len(set(ids))
    fetch["rows_fetched"] = got
    fetch["rows_scanned"] = scan_output_rows(fdf)
    fetch["rows_scanned_frac"] = round(fetch["rows_scanned"] / n, 4)

    # clustered fetch (r9): the PRODUCTION shortlist shape after the
    # id-sort compaction fix -- candidate ids arrive as a few dense
    # runs (gap-coalesced rerank shortlists, snapshot point lookups),
    # so the pushed range cover lands in a handful of row groups and
    # pruning drops the rest. The scattered arm above is the
    # adversarial geometry (one interval per row group, nothing
    # prunable at the small store); this arm is the evidence that the
    # store's pruning DOES engage when the id set is prunable. Same
    # constant output size at both store sizes.
    cl_ids = [
        i
        for start in (n // 7, (5 * n) // 9)
        for i in range(start, start + 100)
    ]
    cdf = fetch_by_ids(corpus, cl_ids, id_col="vec_id").select("vec_id")
    cgot = len(cdf.collect())
    fetch_cl = _acc()
    _walk(cdf._jdf.queryExecution().executedPlan(), fetch_cl)
    t0 = time.perf_counter()
    fetch_by_ids(corpus, cl_ids, id_col="vec_id").select(
        "vec_id"
    ).collect()
    fetch_cl["sec"] = round(time.perf_counter() - t0, 3)
    fetch_cl["ids_requested"] = len(set(cl_ids))
    fetch_cl["rows_fetched"] = cgot
    fetch_cl["rows_scanned"] = scan_output_rows(cdf)
    fetch_cl["rows_scanned_frac"] = round(fetch_cl["rows_scanned"] / n, 4)

    # in-index SQ8 refine probe (r8b): a SEPARATE refine-built index
    # so the plain probe's scan_bytes channel above stays comparable
    # across rounds (filesSize counts whole files; the refine payload
    # would inflate it even though plain probes column-prune it). The
    # refine probe should show the payload's byte cost and NOTHING
    # else growing -- no fetch job, no new exchanges.
    rixdir = f"{tmpdir}/rix{n}"
    write_ivfpq_index(corpus, rixdir, cents, cbs, refine="sq8")

    def _rprobe():
        t0 = time.perf_counter()
        probe_ivfpq_index(
            spark, rixdir, qrows, 10, n_probe=_IDX_N_PROBE,
            rerank=_IDX_RERANK_C,
        ).collect()
        return time.perf_counter() - t0

    _rprobe()
    rprobe_sec = round(min(_rprobe(), _rprobe()), 3)
    rbase = probed_codes_relation(
        spark, rixdir, probed, "vec_id",
        extra_cols=("sq8", "sq8_lo", "sq8_step"),
    )
    rscanned = len(rbase.collect())
    refine = _acc()
    _walk(rbase._jdf.queryExecution().executedPlan(), refine)
    refine["sec"] = rprobe_sec
    refine["rerank_c"] = _IDX_RERANK_C
    refine["rows_scanned"] = rscanned
    refine["rows_scanned_frac"] = round(rscanned / n, 4)
    refine["probed_cells"] = len(probed)
    refine["n_cells"] = len(cents)

    # token-level MaxSim probe (r10): the ColBERT/PLAID-shaped arm --
    # token-ASSIGNED index (docs replicated into their tokens' capped
    # cells), probed with the per-query-token cell union, exact
    # MaxSim scored IN the scan. The channels to pin: scan stays a
    # manifest-listed pruned read (scan_bytes sublinear across the
    # 10x step), ZERO shuffles/broadcasts (driver merge carries only
    # (query_id, id, score) partials), rows_scanned tracks the
    # probed-cell fraction TIMES the stamped row amplification.
    from xmidt_event_streams_spark.operators.ivf import (
        read_probed_cells,
    )
    from xmidt_event_streams_spark.operators.multivec import (
        chunk_embedding_tokens,
        probe_maxsim_index,
        write_maxsim_index,
    )
    from xmidt_event_streams_spark.operators.similarity import (
        deterministic_planes,
    )

    mv_tok, mv_sub = 4, _IDX_DIM // 4
    mvdocs = chunk_embedding_tokens(corpus, mv_tok).select(
        "vec_id", "token_vecs"
    )
    # sqrt(N) deterministic-plane centroids: cell count scales with
    # the corpus like the fitted tiers', with zero fit cost -- the
    # audit measures I/O channels, not recall (see _index_corpus).
    # The query batch is SMALL for this arm (8, n_probe=2/token): a
    # token probe's cell set is a UNION over query tokens, so the
    # registry's 64-query batch at n_probe=4 unions to every cell at
    # this cell count and the pruning channel reads as frac 1.0 --
    # geometry, not a pruning regression (measured r10 first cut).
    mv_cells = deterministic_planes(
        max(16, int(n**0.5)), mv_sub, seed="audit-maxsim"
    )
    mvdir = f"{tmpdir}/mvix{n}"
    write_maxsim_index(
        mvdocs, mvdir, mv_cells, id_col="vec_id", assign="token"
    )
    mv_n_probe = 2
    mv_queries = [
        (
            qid,
            [
                list(map(float, qv[t * mv_sub : (t + 1) * mv_sub]))
                for t in range(mv_tok)
            ],
        )
        for qid, qv in qrows[:8]
    ]

    def _tprobe():
        t0 = time.perf_counter()
        probe_maxsim_index(
            spark, mvdir, mv_queries, 10, n_probe=mv_n_probe,
            retrieval="token",
        ).collect()
        return time.perf_counter() - t0

    _tprobe()
    tprobe_sec = round(min(_tprobe(), _tprobe()), 3)
    # the probe's own scan relation, reconstructed exactly as
    # probe_maxsim_index builds it (same per-token cell derivation,
    # same manifest read, same payload projection)
    tok_cells_union = sorted(
        {
            int(c)
            for qid, qm in mv_queries
            for cs in _nearest_cells_driver(qm, mv_cells, mv_n_probe)
            for c in cs
        }
    )
    tbase = (
        read_probed_cells(spark, mvdir, tok_cells_union)
        .filter(F.col("cell").isin(tok_cells_union))
        .select("vec_id", "cell", "tok_sq8", "tok_lo", "tok_step")
    )
    tscanned = len(tbase.collect())
    tok_probe = _acc()
    _walk(tbase._jdf.queryExecution().executedPlan(), tok_probe)
    mv_rows = spark.read.parquet(mvdir).count()
    tok_probe["sec"] = tprobe_sec
    tok_probe["rows_scanned"] = tscanned
    tok_probe["rows_scanned_frac"] = round(tscanned / mv_rows, 4)
    tok_probe["index_rows"] = mv_rows
    tok_probe["probed_cells"] = len(tok_cells_union)
    tok_probe["n_cells"] = len(mv_cells)
    return {
        "probe": probe,
        "fetch": fetch,
        "fetch_clustered": fetch_cl,
        "refine_probe": refine,
        "maxsim_token_probe": tok_probe,
    }


def audit_index_paths(spark) -> dict:
    """probe + fetch channels at two corpus sizes with growth
    exponents and the registry flag rules applied."""
    import shutil
    import tempfile

    tmpdir = tempfile.mkdtemp(prefix="xes-index-audit-")
    try:
        small = _measure_index_paths(spark, _IDX_N_SMALL, tmpdir)
        big = _measure_index_paths(spark, _IDX_N_BIG, tmpdir)
    finally:
        shutil.rmtree(tmpdir, ignore_errors=True)
    ratio = _IDX_N_BIG / _IDX_N_SMALL
    out: dict = {"n_small": _IDX_N_SMALL, "n_big": _IDX_N_BIG}
    for part in (
        "probe",
        "fetch",
        "fetch_clustered",
        "refine_probe",
        "maxsim_token_probe",
    ):
        s, b = small[part], big[part]
        exps = {
            ch: exponent(s[ch], b[ch], ratio)
            for ch in ("scan_bytes", "shuffle_bytes", "broadcast_bytes")
        }
        exps["rows_scanned"] = exponent(
            s["rows_scanned"], b["rows_scanned"], ratio
        )
        flags = compute_flags(None, s, b, exps, ratio)
        if part.startswith("fetch"):
            flags += fetch_scan_flags(part, s, b, exps)
        out[part] = {
            "small": s,
            "big": b,
            "exponents": exps,
            "flags": flags,
        }
    return out


def main() -> None:
    sf_big = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf_small = os.environ.get("SPARK_GRAFT_SF_SMALL", "/root/testdata/sf0.01")

    def _sf(p: str) -> float:
        return float(Path(p).name.replace("sf", ""))

    sf_ratio = _sf(sf_big) / _sf(sf_small)
    spark = get_spark("xes-scale-audit")
    spark.sparkContext.setLogLevel("ERROR")

    full = os.environ.get("SPARK_GRAFT_AUDIT_FULL") == "1"
    names = [
        name
        for name, spec in QUERIES.items()
        if full or spec.headline
    ]
    out: dict = {}
    for name in names:
        fn = QUERIES[name].fn
        measure(spark, fn, sf_small)  # codegen warmup, volumes unaffected
        out[name] = audit_query(
            spark, fn, sf_small, sf_big, sf_ratio, name=name
        )

    index_paths = audit_index_paths(spark)

    flagged = {n: r["flags"] for n, r in out.items() if r["flags"]}
    for part in (
        "probe",
        "fetch",
        "fetch_clustered",
        "refine_probe",
        "maxsim_token_probe",
    ):
        if index_paths[part]["flags"]:
            flagged[f"index_paths.{part}"] = index_paths[part]["flags"]
    # calibration bracket (same contract as bench.py): the audit's
    # volume channels are load-invariant, but each arm's `sec` is
    # only interpretable next to the measured host speed + steal
    from xmidt_event_streams_spark.calibration import host_calibration

    artifact = {
        "full_registry": full,
        "sf_small": sf_small,
        "sf_big": sf_big,
        "sf_ratio": sf_ratio,
        "broadcast_threshold_bytes": _BCAST_THRESHOLD_BYTES,
        "index_paths": index_paths,
        "queries": out,
        "calibration_end": host_calibration(spark),
        "caveats": [
            "scalar-subquery subtrees not walked (1-row by construction)",
            "ReusedExchange is a leaf: reused shuffles counted once",
            "iterative ops (e.g. dup_clusters) run their loop in prior "
            "actions; only the returned plan's volumes are captured",
        ],
    }
    Path("SCALE_AUDIT.json").write_text(json.dumps(artifact, indent=1))
    print(
        json.dumps(
            {
                "metric": "scale_audit",
                "queries": len(out),
                "flagged": flagged,
                "spilling": [
                    n for n, r in out.items() if r["big"]["spill_bytes"] > 0
                ],
                "artifact": "SCALE_AUDIT.json",
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
