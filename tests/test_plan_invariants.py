"""Physical-plan invariants, self-enforced: the properties PLANS.md
audits by hand must hold for EVERY registry query, every round --
a regression here is a query that stops surviving 100 TB, caught at
plan time without executing anything."""

import pytest
from pyspark.sql import functions as F

from xmidt_event_streams_spark.catalog import QUERIES

SF = "/root/testdata/sf0.001"  # plan shape is SF-independent


def _plan(spark, name):
    if name in QUERIES:
        df = QUERIES[name].fn(spark, SF)
    else:  # off-registry catalog shape (rotation policy, README)
        import xmidt_event_streams_spark.catalog as cat

        df = getattr(cat, f"q_{name}")(spark, SF)
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


def _keyed_sort_aggregates(plan):
    """SortAggregate nodes that actually group (Keys non-empty). A
    KEYLESS SortAggregate is a streaming fold with no Sort child --
    Spark's only plan for min/max over var-width types (strings) in a
    global aggregate -- and is not a scale hazard; a keyed one sorts
    its whole input per group and is banned."""
    import re

    keyed = []
    for m in re.finditer(r"\((\d+)\) SortAggregate", plan):
        node_id = m.group(1)
        detail = plan[m.end():]
        keys = re.search(r"Keys(?: \[\d+\])?: \[(.*?)\]", detail)
        if keys and keys.group(1).strip():
            keyed.append(node_id)
    return keyed


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_no_scale_antipatterns(spark, name):
    """No CartesianProduct (unbounded pair blowup), no BatchEvalPython
    (row-at-a-time Python), no keyed SortAggregate (lost map-side
    partials / per-group sort) in any registry plan."""
    plan = _plan(spark, name)
    assert "CartesianProduct" not in plan, f"{name}: CartesianProduct"
    assert "BatchEvalPython" not in plan, f"{name}: row-Python UDF"
    assert not _keyed_sort_aggregates(plan), f"{name}: keyed SortAggregate"


def test_routing_hot_path_is_narrow(spark):
    """The reference's hot path (validate -> enrich -> serialize) must
    stay a narrow plan: no DATA-DEPENDENT exchange (hash/range -- a
    shuffle by key that would move the full stream at 100 TB). The
    only exchange permitted is the round-robin scan fan-out
    (session.scan_fanout, guide §2.5): it exists solely because the
    test files are single-row-group (unsplittable -> 1-task scans)
    and is a no-op on splittable production layouts, so the at-scale
    plan remains scan -> filter -> project."""
    import re

    for name in ("route_fanout", "fixwrp_enrich", "json_serialize"):
        plan = _plan(spark, name)
        n_exchange = len(re.findall(r"^\(\d+\) Exchange", plan, re.M))
        n_rr = plan.count("RoundRobinPartitioning")
        assert n_exchange == n_rr, (
            f"{name}: hot path grew a data-dependent shuffle "
            f"({n_exchange} Exchange nodes, {n_rr} round-robin)"
        )


def test_dimension_joins_broadcast(spark):
    """TPC-H dimension joins must broadcast the small side -- a
    SortMergeJoin here means the fact table started shuffling for a
    join the dims should absorb."""
    # q5ish rotated off-registry late-r4; its plan shape stays audited
    from xmidt_event_streams_spark.catalog import q_tpch_q5ish

    def _plan_of(df):
        return df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )

    for name, plan in (
        ("tpch_q3", _plan(spark, "tpch_q3")),
        ("tpch_q5ish", _plan_of(q_tpch_q5ish(spark, SF))),
    ):
        assert "BroadcastHashJoin" in plan, f"{name}: no broadcast join"
        assert "SortMergeJoin" not in plan, f"{name}: fact-side shuffle join"


def test_topk_windows_use_group_limit(spark):
    """Every rank-<=k window query must plan with WindowGroupLimit
    (Spark's map-side partial top-k): each partition keeps only k
    candidates per group BEFORE the shuffle, so the exchange carries
    O(groups x k), not the whole input. Losing this (e.g. by ranking
    on a non-supported function or filtering rank != pattern) would
    silently revert to full per-group sorts at 100 TB."""
    for name in ("top_users_per_type", "embedding_topk", "ivf_ann", "lsh_ann"):
        plan = _plan(spark, name)
        assert "WindowGroupLimit" in plan, f"{name}: no WindowGroupLimit"


def test_runtime_bloom_filter_arms_at_scale_thresholds(spark):
    """Spark's runtime bloom-filter join pruning (enabled by default,
    spark.sql.optimizer.runtime.bloomFilter.enabled) stays dormant at
    test SF because the application-side scan (~70 MB lineitem) is far
    below the 10 GB applicationSideScanSizeThreshold -- correct: the
    filter only pays when the probe side is huge. At 100 TB the
    threshold trips naturally and a selective dim-filtered fact-fact
    join gets a bloom semi-filter pushed into the big scan. This test
    emulates the at-scale size relationship by zeroing the threshold
    and pins that the machinery actually arms (a Spark upgrade that
    renames/disables it should fail here, not silently cost a full
    scan at scale)."""
    from xmidt_event_streams_spark.session import load_tables

    t = load_tables(spark, SF, ("lineitem", "orders"))
    saved = {
        k: spark.conf.get(k)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
        )
    }
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter."
            "applicationSideScanSizeThreshold",
            "0",
        )
        j = (
            t["lineitem"]
            .join(
                t["orders"].filter(F.col("o_orderpriority") == "1-URGENT"),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            .groupBy("o_orderpriority")
            .count()
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "might_contain" in plan, "runtime bloom filter did not arm"
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


def test_tpch_q3_degrades_to_shuffle_join_not_bnlj(spark):
    """The one standing scale-audit flag, pinned as BY-DESIGN: the
    filtered-customer broadcast side of tpch_q3 grows at e=0.77 and
    at ~100x SF exceeds any broadcast threshold. The INTENDED
    degradation is a shuffled equi-join (both sides genuinely large);
    the failure modes this test exists to catch are (a) a
    BroadcastNestedLoopJoin (the join condition losing its equi-key)
    and (b) the plan silently keeping a broadcast of an
    over-threshold side. Emulated by forcing the threshold to -1 --
    the same arm-under-at-scale-thresholds trick as the bloom test."""
    saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        plan = _plan(spark, "tpch_q3")
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BroadcastHashJoin" not in plan, (
        "join stayed broadcast despite the threshold -- the at-scale "
        "plan shape is untested"
    )
    import re

    # formatted explain lists each node once in the tree and once in
    # the details section; count unique node ids
    shuffle_joins = {
        m.group(1)
        for m in re.finditer(
            r"\((\d+)\) (?:SortMergeJoin|ShuffledHashJoin)", plan
        )
    }
    assert len(shuffle_joins) == 2, plan  # customer-orders, orders-lineitem
    # the degradation must not cost the pushed-down scan filters
    assert "PushedFilters" in plan and "BUILDING" in plan


def test_frequent_tokens_candidate_then_verify_shape(spark):
    """The heavy-hitter query's scale contract, pinned at plan level:
    the Misra-Gries candidate pass is NARROW (MapInPandas directly
    over the exploded scan, no exchange before it), the candidate set
    reaches the verify join as a BROADCAST build side (the corpus
    token stream never shuffles for the join), and the verify count
    aggregates with map-side partials."""
    plan = _plan(spark, "frequent_tokens")
    import re

    # MapInPandas consumes the Generate (explode) output directly --
    # the node listed immediately before it in the details section
    # must be a Generate, not an Exchange
    order = re.findall(r"\(\d+\) (\w+)", plan)
    mg_idx = order.index("MapInPandas")
    assert order[mg_idx - 1] == "Generate", order
    # candidate relation is broadcast into the verify join
    assert "BroadcastHashJoin" in plan
    # verify agg keeps map-side partials (partial_count before the
    # exchange on the token key)
    assert "partial_count" in plan


def test_span_excision_keep_first_is_rank_free(spark):
    """dup_span_removal's keep-first pick must stay a hash-agg
    min-struct, never a rank: a Window partitioned by whash sorts
    each partition, and partition size equals duplication
    multiplicity -- a billion-occurrence boilerplate window becomes
    one straggler task. The only Window nodes allowed are the per-doc
    gaps-and-islands merges (partition size <= tokens per doc)."""
    import re

    plan = _plan(spark, "dup_span_removal")
    for m in re.finditer(r"\(\d+\) Window", plan):
        detail = plan[m.end():]
        args = detail[: detail.find("\n(")] if "\n(" in detail else detail
        assert "whash" not in args, "keep-first regressed to a rank"
