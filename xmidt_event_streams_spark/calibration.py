"""Measured host-speed calibration for benchmark artifacts.

Problem this solves (r8 post-mortem): the bench's idle gate was a
load-average threshold, and it certified ``noisy: false`` on a host
that was demonstrably ~25% degraded (every query inflated 13-29%,
including four untouched TPC-H rows; a brute BLAS scan swung
1.84 s -> 4.6 s at near-zero load average). Load average measures
runnable-queue length, not delivered CPU speed -- it is blind to
thermal throttling, noisy co-tenants on other cgroups, and memory-
bandwidth contention. The fix is to MEASURE delivered speed: run two
fixed reference kernels right before the benchmark, stamp their times
into the artifact, and compare against the best this repo has ever
recorded (``CALIBRATION.json``). A regressed headline on a run whose
calibration is 25% over best is the box; the same regression at
calibration parity is the code. The question becomes decidable from
the artifact alone.

Kernels (both deterministic, seconds-scale, input-free):

* ``numpy_ms`` -- single-threaded CPU ALU/cache speed: argsort of a
  seeded 2M-element float64 array plus a 256x256 matmul loop.
  ``np.argsort`` is single-threaded by construction, so the number is
  per-core speed regardless of BLAS threading config.
* ``spark_ms`` -- end-to-end Spark fixed job: ``range(20M) -> hash ->
  sum`` collected. Exercises scheduler latency, codegen, and
  multi-core throughput -- the component a bench query actually pays.

Both report the MIN over several repetitions (min filters scheduling
jitter; delivered-speed degradation shifts the min itself).

Start-of-run bias (r10 continuation post-mortem): measured on this
container class, a FRESH session's first kernel reps are inflated by
two warm-up effects that have nothing to do with co-tenant load --
the numpy kernel's first two reps ran ~9x its converged floor (CPU
frequency governor ramping up from an idle box) and the spark
kernel's min-over-3 landed ~2x its converged floor (codegen JIT
tiering settles over ~6-10 jobs, not 3). Both effects read as
``host_degraded`` at bench start and burn the retry budget on a
healthy host. The fix is in the kernels themselves: a short CPU
busy-warm before the numpy measurement (raises the governor while
measuring nothing) and converged-min repetition for the spark kernel
(keep repeating, capped, until the running min stops improving).
The recorded bests stay comparable: both changes only remove upward
bias from the measurement, they do not change the kernels' work.
"""

from __future__ import annotations

import json
import time
from pathlib import Path

# a calibration more than this factor above the recorded best means
# the host is NOT delivering the speed the best-known artifact was
# measured at; artifacts stamp host_degraded so a slower headline on
# such a run reads as "the box", not "the code"
DEGRADED_FACTOR = 1.2

CALIBRATION_FILE = Path(__file__).resolve().parent.parent / "CALIBRATION.json"


def _busy_warm(target_s: float = 1.0) -> None:
    """Spin the CPU briefly so an idle-governed core ramps to its
    delivered frequency BEFORE the measured reps start. Measures
    nothing; exists because the first reps on an idle box otherwise
    time the frequency ramp, not the host's speed."""
    import numpy as np

    mat = np.random.default_rng(7).random((256, 256))
    t0 = time.perf_counter()
    sink = 0.0
    while time.perf_counter() - t0 < target_s:
        # fresh product each pass: an accumulating product overflows
        sink += float((mat @ mat)[0, 0])
    assert sink == sink  # keep the loop live


def numpy_kernel_ms(reps: int = 5) -> float:
    """Min wall-clock (ms) of the fixed single-threaded numpy kernel."""
    import numpy as np

    _busy_warm()
    rng = np.random.default_rng(20260816)
    arr = rng.random(2_000_000)
    mat = rng.random((256, 256))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        order = np.argsort(arr, kind="stable")
        acc = mat
        for _ in range(8):
            acc = acc @ mat
        # fold both results so the work cannot be dead-code-eliminated
        sink = float(order[::100_000].sum()) + float(acc[0, 0])
        best = min(best, time.perf_counter() - t0)
    assert sink == sink  # not NaN; keeps `sink` live
    return round(best * 1000, 1)


def spark_kernel_ms(spark, reps: int = 3, max_reps: int = 12) -> float:
    """Converged min wall-clock (ms) of the fixed tiny Spark job.

    Runs at least ``reps`` repetitions, then keeps going (capped at
    ``max_reps``) while the running min is still improving by more
    than 3% within a 3-rep window -- a fresh session's JIT tiering
    settles over ~6-10 jobs, so a flat min-over-3 reads ~2x high and
    falsely flags a healthy host at bench start. A warmed session
    converges immediately and exits at ``reps``."""
    from pyspark.sql import functions as F

    best = float("inf")
    best_at = 0
    for i in range(max_reps):
        t0 = time.perf_counter()
        # shift the hash to 32 bits so the 20M-row sum stays inside a
        # long under ANSI arithmetic
        spark.range(20_000_000).select(
            F.sum(F.shiftrightunsigned(F.xxhash64("id"), 32)).alias("h")
        ).collect()
        elapsed = time.perf_counter() - t0
        if elapsed < best:
            if elapsed < best * 0.97:
                best_at = i  # a >3% improvement resets the window
            best = elapsed
        if i + 1 >= reps and i - best_at >= 2:
            break  # no >3% improvement in a 3-rep window: converged
    return round(best * 1000, 1)


def _cpu_ticks() -> list[int] | None:
    """First /proc/stat line as tick counters (Linux only)."""
    try:
        with open("/proc/stat") as f:
            return [int(v) for v in f.readline().split()[1:]]
    except (OSError, ValueError, IndexError):
        return None


def _steal_pct(t0: list[int] | None, t1: list[int] | None) -> float | None:
    """Hypervisor steal as a share of the window's COMPUTE time
    (user+nice+system+steal). Measured r10 continuation: a box with
    near-zero load average, zero cgroup CPU pressure and nominal
    frequency still delivered the spark kernel 3.5x slow -- /proc/
    stat showed 20.7% steal under full 32-core load. loadavg and PSI
    are blind to a co-tenant OUTSIDE the guest; steal is the direct
    signature, so the calibration stamps it next to the kernel
    times (sampled across the kernel runs, which load the box enough
    to make the share meaningful)."""
    if t0 is None or t1 is None:
        return None
    d = [b - a for a, b in zip(t0, t1)]
    # user, nice, system, idle, iowait, irq, softirq, steal
    busy = d[0] + d[1] + d[2] + (d[7] if len(d) > 7 else 0)
    if busy <= 0:
        return None
    return round(100.0 * d[7] / busy, 1) if len(d) > 7 else None


def load_best() -> dict | None:
    try:
        return json.loads(CALIBRATION_FILE.read_text())
    except (OSError, ValueError):
        return None


def record_best(cal: dict) -> None:
    """Fold a fresh calibration into the recorded best (per-kernel
    min). Committed alongside the bench artifacts so every future run
    compares against the fastest this container class has ever
    delivered."""
    best = load_best() or {}
    out = {
        k: min(
            cal.get(k, float("inf")), best.get(k, float("inf"))
        )
        for k in ("numpy_ms", "spark_ms")
        if k in cal or k in best
    }
    CALIBRATION_FILE.write_text(json.dumps(out, indent=1) + "\n")


def host_calibration(spark=None) -> dict:
    """Run both kernels; compare against the recorded best.

    Returns ``{numpy_ms, spark_ms, steal_pct, best, factor,
    host_degraded}`` (``steal_pct`` Linux-only: hypervisor steal
    share sampled across the kernel runs -- see :func:`_steal_pct`)
    where ``factor`` is the worst per-kernel ratio current/best
    (>1 = slower than best-known) and ``host_degraded`` is
    ``factor > DEGRADED_FACTOR``. With no recorded best yet, factor
    is 1.0 and the current numbers seed the record.
    """
    ticks0 = _cpu_ticks()
    cal = {"numpy_ms": numpy_kernel_ms()}
    if spark is not None:
        cal["spark_ms"] = spark_kernel_ms(spark)
    steal = _steal_pct(ticks0, _cpu_ticks())
    if steal is not None:
        cal["steal_pct"] = steal
    best = load_best()
    if best:
        ratios = [
            cal[k] / best[k]
            for k in ("numpy_ms", "spark_ms")
            if k in cal and best.get(k)
        ]
        factor = round(max(ratios), 3) if ratios else 1.0
    else:
        factor = 1.0
    cal["best"] = best or {k: v for k, v in cal.items()}
    cal["factor"] = factor
    cal["host_degraded"] = factor > DEGRADED_FACTOR
    return cal
