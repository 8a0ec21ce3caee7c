"""Shared streaming-test helper: await a query's terminal state, always stop it.

An unchecked ``q.awaitTermination(t)`` that times out leaves the query
RUNNING after the test returns: its foreachBatch keeps executing for the
rest of the suite, bleeding Spark jobs into every later test's
job-count window (this was the root cause of the r8
``test_in_index_refine_adds_zero_spark_jobs`` flake -- a leaked
``test_pipeline_e2e`` query's deliver loop was still running ~30 min
into the session). Every test that starts a streaming query goes
through :func:`await_stream`, which asserts the terminal state and
stops the query in a ``finally`` so even a failed assertion cannot
leak it.
"""

from __future__ import annotations


def await_stream(q, timeout_s: float) -> None:
    """Block until ``q`` terminates; assert it actually did; stop it.

    Safe for both shapes used in the suite:

    - ``trigger(availableNow=True)`` queries, which self-terminate once
      the backlog drains -- ``awaitTermination`` must return ``True``
      within ``timeout_s`` or the test fails loudly (instead of
      silently continuing with a live query);
    - ``q.stop(); await_stream(q, t)`` shutdown sequences, where the
      stop has already been issued and this just waits for it to take
      effect (``stop()`` on a terminated query is a no-op).

    A query that terminated *with* an exception also fails the test --
    a crashed stream that happens to leave the right files behind is
    not a pass.

    NOT for stateful operators with ``ProcessingTimeTimeout`` (e.g.
    ``hybrid_flush``): their ``shouldRunAnotherBatch`` is always true,
    so even availableNow spins state-cleanup batches forever and this
    helper would burn the whole timeout then fail. Use
    :func:`drain_and_stop` there.
    """
    try:
        terminated = q.awaitTermination(timeout_s)
        assert terminated, (
            f"streaming query {q.name or q.id} still running after "
            f"{timeout_s}s -- would leak into later tests"
        )
        exc = q.exception()
        assert exc is None, f"streaming query failed: {exc}"
    finally:
        q.stop()


def drain_and_stop(q, done, timeout_s: float, settle_s: float = 2.0) -> None:
    """For queries that CANNOT self-terminate (stateful operators with
    ``ProcessingTimeTimeout`` keep scheduling cleanup batches forever,
    even under availableNow): poll ``done()`` until it holds, wait for
    the current trigger to settle past a data-less state, then stop --
    and still assert the query didn't die with an exception.

    ``done`` is the test's own completion predicate (e.g. "the
    expected flush rows arrived"); the settle wait gives the batch
    that produced them time to COMMIT before the stop, so checkpointed
    state is preserved for restart tests.
    """
    import time

    try:
        deadline = time.time() + timeout_s
        while time.time() < deadline and not done():
            time.sleep(0.3)
        assert done(), (
            f"streaming query {q.name or q.id}: completion predicate "
            f"still false after {timeout_s}s"
        )
        # let the emitting batch commit: no data pending and the
        # trigger idle, or the settle budget elapses
        settle_deadline = time.time() + settle_s
        while time.time() < settle_deadline:
            st = q.status
            if not st["isDataAvailable"] and not st["isTriggerActive"]:
                break
            time.sleep(0.2)
        exc = q.exception()
        assert exc is None, f"streaming query failed: {exc}"
    finally:
        q.stop()
        q.awaitTermination(60)
