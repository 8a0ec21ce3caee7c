"""Training-data assembly operators: deterministic splits, stratified
sampling, sequence packing.

The reference engine stops at delivery; a training-data pipeline at
100 TB additionally needs to carve the corpus into reproducible
train/val/test partitions, downsample strata, and pack documents into
fixed token budgets. All three are expressed so that

  * assignment is a PURE FUNCTION of the row (md5 arithmetic, no
    rand()): task retries, speculative execution, and re-runs agree,
    and any SQL engine reproduces the assignment bit-for-bit (the
    pytest oracle runs the same formula in DuckDB);
  * nothing shuffles unless the semantics demand it (split/sample are
    narrow projections; packing shuffles once on its shard key).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_BUCKETS = 10_000  # assignment resolution: 0.01% granularity


def _hash_bucket(id_col: Column, salt: str) -> Column:
    """Uniform bucket in [0, 10000) from md5(salt|id): 60 bits, mod
    buckets. Engine-portable (DuckDB: ('0x'||substr(md5(..),1,15))::
    BIGINT % 10000)."""
    return (
        F.conv(
            F.substring(F.md5(F.concat(F.lit(salt + "|"), id_col.cast("string"))), 1, 15),
            16,
            10,
        ).cast("bigint")
        % _BUCKETS
    )


def assign_split(
    df: DataFrame,
    id_col: str = "doc_id",
    weights: dict[str, float] | None = None,
    salt: str = "split-v1",
) -> DataFrame:
    """Add a ``split`` column ('train'/'val'/'test'/...) by
    deterministic hash bucket, proportional to ``weights``.

    Narrow (no shuffle, no state): the split of a row never depends on
    other rows, so it survives incremental ingestion — tomorrow's new
    documents don't reshuffle today's test set. Change ``salt`` to
    draw a fresh partition.
    """
    weights = weights or {"train": 0.9, "val": 0.05, "test": 0.05}
    total = sum(weights.values())
    bucket = _hash_bucket(F.col(id_col), salt)
    expr = None
    acc = 0.0
    names = list(weights)
    for name in names[:-1]:
        acc += weights[name] / total
        cond = bucket < int(round(acc * _BUCKETS))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    expr = (
        F.lit(names[0]) if expr is None else expr.otherwise(names[-1])
    )
    return df.withColumn("split", expr)


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict[str, float],
    id_col: str = "doc_id",
    default_fraction: float = 0.0,
    salt: str = "sample-v1",
) -> DataFrame:
    """Keep a deterministic ``fractions[stratum]`` share of each
    stratum (e.g. downsample dominant languages). Unlisted strata keep
    ``default_fraction``.

    Unlike ``df.sampleBy`` (per-partition RNG: the kept set depends on
    partitioning and retries), the hash draw is a row property —
    stable across runs, re-partitioning, and engines.
    """
    bucket = _hash_bucket(F.col(id_col), salt)
    thresh = None
    for stratum, frac in fractions.items():
        cond = F.col(strata_col) == stratum
        t = F.lit(int(round(frac * _BUCKETS)))
        thresh = F.when(cond, t) if thresh is None else thresh.when(cond, t)
    thresh = (
        F.lit(int(round(default_fraction * _BUCKETS)))
        if thresh is None
        else thresh.otherwise(int(round(default_fraction * _BUCKETS)))
    )
    return df.filter(bucket < thresh)


def write_training_shards(
    df: DataFrame,
    path: str,
    token_col: str,
    id_col: str = "doc_id",
    weights: dict[str, float] | None = None,
    shard_col: str | None = None,
    n_shards: int = 16,
    pack_budget: int | None = None,
    salt: str = "split-v1",
    output_format: str = "parquet",
) -> None:
    """Assemble and write the training corpus: deterministic split ->
    (optional) per-shard sequence packing -> parquet partitioned by
    (split, shard).

    ``output_format``: "parquet" (default) or "jsonl" -- many trainer
    data loaders (and most dataset-exchange pipelines) consume
    newline-delimited JSON shards; Spark's json writer IS jsonl (one
    object per line), same (split, shard) directory layout, same
    one-writer-per-partition discipline. Parquet stays the right
    at-rest format (columnar pruning, stats); jsonl is the export
    arm.

    The write layout IS the access pattern: a trainer reads
    ``split=train/shard=N/*`` as one sequential scan per worker, and
    partition pruning serves val/test without touching train files.

    Scale shape: split assignment and shard assignment are narrow md5
    projections (no shuffle); packing adds the one per-shard window
    shuffle documented on :func:`pack_sequences`. The writer
    repartitions by (split, shard) so each output partition is
    written by exactly one task -- no small-file explosion, no global
    sort. ``n_shards`` scales with the cluster at 100 TB; re-running
    after corpus growth appends new docs to stable shards (pure
    row-hash assignment, ingestion-stable like assign_split).
    """
    out = assign_split(df, id_col=id_col, weights=weights, salt=salt)
    if shard_col is None:
        shard_col = "shard"
        out = out.withColumn(
            shard_col, _hash_bucket(F.col(id_col), salt + "-shard") % n_shards
        )
    if pack_budget is not None:
        out = pack_sequences(
            out,
            token_col=token_col,
            order_col=id_col,
            budget=pack_budget,
            shard_cols=["split", shard_col],
        )
    if output_format not in ("parquet", "jsonl"):
        raise ValueError(f"output_format must be parquet|jsonl, got {output_format!r}")
    writer = (
        out.repartition(F.col("split"), F.col(shard_col))
        .write.partitionBy("split", shard_col)
        .mode("overwrite")
    )
    if output_format == "parquet":
        writer.parquet(path)
    else:
        writer.json(path)


def pack_sequences(
    df: DataFrame,
    token_col: str,
    order_col: str,
    budget: int,
    shard_cols: list[str] | None = None,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Assign each document a ``pack_id`` so consecutive documents
    (in ``order_col`` order, within each shard) fill ~``budget``
    tokens per pack — the sequence-packing step before writing
    training shards.

    Greedy contiguous fill: pack_id = floor(exclusive-prefix-sum /
    budget). Documents are never split; a pack may overflow by less
    than one document (and a single document longer than ``budget``
    occupies its pack alone). This is the streaming-friendly
    approximation of bin packing — one window over one shuffle.

    Scale: the window partitions by ``shard_cols`` (one shuffle on the
    shard key, packs computed independently per shard — the 100 TB
    path; shards are what you'd write anyway). With no shard_cols the
    window is global = a single-task sort: correct, but only for
    small corpora or final single-shard assembly.

    ``tiebreak_col``: pass a unique id column when ``order_col`` is
    not unique per shard (a timestamp, say) — otherwise pack
    membership is nondeterministic across runs and the training
    corpus is not reproducible.
    """
    order = [F.col(order_col)] + (
        [F.col(tiebreak_col)] if tiebreak_col else []
    )
    w = (
        Window.partitionBy(*[F.col(c) for c in shard_cols])
        if shard_cols
        else Window.partitionBy()
    ).orderBy(*order).rowsBetween(Window.unboundedPreceding, -1)
    prefix = F.coalesce(F.sum(F.col(token_col)).over(w), F.lit(0))
    # integer `div`, not floor(double/double): exact past 2^53 tokens
    return (
        df.withColumn("_prefix", prefix.cast("bigint"))
        .withColumn("pack_id", F.expr(f"_prefix div {int(budget)}"))
        .drop("_prefix")
    )


def pack_token_stream(
    df: DataFrame,
    tokens_col: str,
    seq_len: int,
    order_col: str,
    shard_cols: list[str] | None = None,
    id_col: str = "doc_id",
    drop_last: bool = True,
) -> DataFrame:
    """EXACT fixed-length sequence packing: concatenate every
    document's token array (in ``order_col`` order, independently per
    shard) into one logical token stream and slice it into
    ``seq_len``-token training sequences — the GPT-style
    concatenate-then-chunk step, where documents ARE split across
    sequence boundaries (contrast :func:`pack_sequences`, which
    assigns whole documents to packs).

    Output per sequence: ``(shard_cols..., seq_id, input_ids
    array<string>, n_tokens, doc_spans)`` where ``doc_spans`` is
    ``array<struct<doc_id, offset, length>>`` — which document each
    token range came from, in order, the metadata a trainer needs for
    attention-mask resets at document boundaries and for provenance /
    takedown back-references. ``drop_last=True`` drops the (single,
    per-shard) trailing partial sequence, the trainer convention;
    every interior sequence is exactly ``seq_len`` by construction.

    Distributed shape — NOT a driver-side concatenation:

      1. exclusive prefix sum of token counts over a per-shard window
         (one shuffle+sort on the shard key; a shard's stream offsets
         are a pure function of order within the shard);
      2. each document EXPLODES into the sequence slots it overlaps
         (``start div S .. (start+n-1) div S``) carrying the matching
         ``slice()`` of its tokens — narrow, fragment count =
         n_docs + total_tokens/seq_len;
      3. one hash-agg on (shard, seq_id) reassembles each sequence
         from its (start-sorted) fragments.

    At 100 TB: per-sequence state is seq_len tokens, per-shard window
    sort is the same discipline as :func:`pack_sequences`; shards are
    the parallelism unit, so ``shard_cols`` should be supplied for any
    real corpus (no shard_cols = one global single-task sort, correct
    only for small corpora or final single-shard assembly). Zero-token
    documents (and null token arrays) contribute nothing and are
    dropped from ``doc_spans``.
    """
    S = int(seq_len)
    if S <= 0:
        raise ValueError(f"seq_len must be positive, got {seq_len}")
    shard_cols = list(shard_cols or [])
    # id_col tie-break: with a non-unique order_col (a timestamp, say)
    # the per-shard document order — hence the packed bytes and the
    # doc_spans provenance — would differ run to run; reproducible
    # training data requires a total order.
    w = (
        Window.partitionBy(*[F.col(c) for c in shard_cols])
        if shard_cols
        else Window.partitionBy()
    ).orderBy(F.col(order_col), F.col(id_col)).rowsBetween(
        Window.unboundedPreceding, -1
    )

    d = (
        df.withColumn("_n", F.size(F.col(tokens_col)).cast("bigint"))
        .filter(F.col("_n") > 0)
        .withColumn(
            "_start",
            F.coalesce(F.sum("_n").over(w), F.lit(0).cast("bigint")),
        )
    )
    frag = d.select(
        *[F.col(c) for c in shard_cols],
        F.col(id_col),
        F.col("_start"),
        F.col("_n"),
        F.col(tokens_col).alias("_toks"),
        F.explode(
            F.sequence(
                F.expr(f"_start div {S}"),
                F.expr(f"(_start + _n - 1) div {S}"),
            )
        ).alias("_seq"),
    )
    fs = F.greatest(F.col("_seq") * S, F.col("_start"))
    fe = F.least((F.col("_seq") + 1) * S, F.col("_start") + F.col("_n"))
    frag = frag.select(
        *[F.col(c) for c in shard_cols],
        F.col("_seq"),
        F.struct(
            fs.alias("_fs"),
            F.slice(
                F.col("_toks"),
                (fs - F.col("_start") + 1).cast("int"),
                (fe - fs).cast("int"),
            ).alias("_frag"),
            F.col(id_col).alias("_doc"),
        ).alias("_f"),
    )
    packed = frag.groupBy(
        *[F.col(c) for c in shard_cols], F.col("_seq").alias("seq_id")
    ).agg(F.sort_array(F.collect_list("_f")).alias("_fl"))
    out = packed.select(
        *[F.col(c) for c in shard_cols],
        F.col("seq_id"),
        F.flatten(F.transform("_fl", lambda x: x["_frag"])).alias("input_ids"),
        F.transform(
            "_fl",
            lambda x: F.struct(
                x["_doc"].alias(id_col),
                (x["_fs"] - F.col("seq_id") * S).cast("int").alias("offset"),
                F.size(x["_frag"]).alias("length"),
            ),
        ).alias("doc_spans"),
    ).withColumn("n_tokens", F.size("input_ids"))
    if drop_last:
        out = out.filter(F.col("n_tokens") == S)
    return out


def tokenize_and_pack(
    df: DataFrame,
    seq_len: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    merges: list[tuple[str, str]] | None = None,
    eos_token: str = "</s>",
    shard_cols: list[str] | None = None,
    order_col: str | None = None,
    drop_last: bool = True,
) -> DataFrame:
    """Tokenize documents (whitespace words by default; a learned BPE
    merge list via ``merges=``) + append ``eos_token`` per document,
    then :func:`pack_token_stream` into fixed ``seq_len`` training
    sequences. The end of the tokenize-dedup-select pipeline: what
    this returns is what a trainer's data loader reads.

    The BPE arm runs :func:`~xmidt_event_streams_spark.operators.bpe.
    bpe_encode` (Arrow-batched, merge table in the UDF closure) and
    joins the token arrays back on ``id_col`` to recover shard
    columns — one extra id shuffle, still corpus-linear."""
    from xmidt_event_streams_spark.functions.text import tokens

    order_col = order_col or id_col
    shard_cols = list(shard_cols or [])
    carry = [id_col] + [
        c for c in dict.fromkeys(shard_cols + [order_col]) if c != id_col
    ]
    if merges is None:
        toked = df.select(
            *[F.col(c) for c in carry],
            F.concat(tokens(text_col), F.array(F.lit(eos_token))).alias("_tk"),
        )
    else:
        from xmidt_event_streams_spark.operators.bpe import bpe_encode

        enc = bpe_encode(df, merges, text_col=text_col, id_col=id_col)
        toked = (
            df.select(*[F.col(c) for c in carry])
            .join(enc, id_col)
            .select(
                *[F.col(c) for c in carry],
                F.concat(
                    F.col("bpe_tokens"), F.array(F.lit(eos_token))
                ).alias("_tk"),
            )
        )
    return pack_token_stream(
        toked,
        tokens_col="_tk",
        seq_len=seq_len,
        order_col=order_col,
        shard_cols=shard_cols,
        id_col=id_col,
        drop_last=drop_last,
    )


def mixture_fractions(
    df: DataFrame,
    domain_col: str,
    target_weights: dict[str, float],
) -> dict[str, float]:
    """Per-domain keep fractions that resample the corpus to the
    target mixture while keeping as much data as possible.

    Training recipes fix the PROPORTIONS of each domain (web/books/
    code, or per-language -- the Pile / DoReMi-style mixture), but the
    raw corpus arrives with whatever proportions crawling produced.
    The largest total T satisfying T*w_d <= n_d for every targeted
    domain is T = min_d(n_d / w_d); the binding domain keeps 100% of
    its rows and every other targeted domain keeps T*w_d / n_d.

    The groupBy-count collect is bounded by DOMAIN CARDINALITY (a few
    hundred at most -- languages, sources), never row count: safe at
    100 TB. Domains absent from ``target_weights`` get fraction 0.
    """
    if not target_weights or any(w < 0 for w in target_weights.values()):
        raise ValueError("target_weights must be non-empty and non-negative")
    counts = {
        r["d"]: r["n"]
        for r in df.groupBy(F.col(domain_col).alias("d"))
        .agg(F.count("*").alias("n"))
        .collect()
    }
    missing = [d for d, w in target_weights.items() if w > 0 and not counts.get(d)]
    if missing:
        raise ValueError(
            f"target domains absent from corpus: {sorted(missing)}"
        )
    total = min(
        counts[d] / w for d, w in target_weights.items() if w > 0
    )
    return {
        d: min(1.0, total * w / counts[d])
        for d, w in target_weights.items()
        if w > 0
    }


def mixture_sample(
    df: DataFrame,
    domain_col: str,
    target_weights: dict[str, float],
    id_col: str = "doc_id",
    salt: str = "mixture-v1",
) -> DataFrame:
    """Deterministically resample ``df`` to the target domain mixture:
    compute :func:`mixture_fractions`, then keep each row iff its
    md5 hash bucket falls under its domain's threshold (the same
    engine-portable draw as stratified_sample -- a row property, so
    the kept set survives re-partitioning, retries, and incremental
    re-runs; changing ``salt`` draws a fresh sample).

    Two tiny jobs: one domain-count agg (rows = domain cardinality),
    then a narrow filter over the corpus. Nothing else shuffles.
    """
    fractions = mixture_fractions(df, domain_col, target_weights)
    return stratified_sample(
        df,
        domain_col,
        fractions,
        id_col=id_col,
        default_fraction=0.0,
        salt=salt,
    )


def build_user_sequences(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    payload_cols: tuple[str, ...] = ("event_type",),
    max_len: int | None = None,
) -> DataFrame:
    """Ordered per-key event sequences -- the behavioral-model
    training shape (one row per user: their event history as an
    array, time-ascending, optionally truncated to the most RECENT
    ``max_len`` items).

    One hash-agg shuffle on the key: collect_list + array_sort on a
    (ts, payload...) struct gives deterministic event-time order
    without a sort exchange (struct comparison orders by ts first;
    ties break on the payload fields, so the output is stable across
    retries and partitionings). Truncation keeps the TAIL (most
    recent) via slice from the end. At 100 TB guard per-key blowup:
    a key with millions of events makes a giant array -- cap with
    ``max_len`` (applied post-sort, so it is 'most recent N', not
    'arbitrary N') and diagnose hot keys first (operators/skew.py:
    hot_keys).

    Output: key, n_events (pre-truncation count), seq (array of
    structs ts + payload_cols).
    """
    struct_cols = [F.col(ts_col).alias("ts")] + [
        F.col(c).alias(c) for c in payload_cols
    ]
    agg = events.groupBy(key_col).agg(
        F.count("*").alias("n_events"),
        F.array_sort(F.collect_list(F.struct(*struct_cols))).alias("seq"),
    )
    if max_len is not None:
        agg = agg.withColumn(
            "seq",
            F.when(
                F.size("seq") > max_len,
                F.slice("seq", F.size("seq") - max_len + 1, max_len),
            ).otherwise(F.col("seq")),
        )
    return agg


def chunk_documents(
    df: DataFrame,
    max_tokens: int,
    overlap: int = 0,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Split documents into overlapping token windows -- the chunking
    step before embedding/RAG indexing or fixed-context training.

    Output: one row per chunk with (id, chunk_id, n_chunks,
    chunk_start, chunk_n_tokens, chunk_text). chunk_id is 0-based in
    reading order; consecutive chunks share ``overlap`` tokens
    (stride = max_tokens - overlap). The final chunk may be short; a
    document shorter than ``max_tokens`` yields exactly one chunk;
    empty documents yield one empty chunk (provenance preserved -- a
    vanished doc_id is how chunking bugs hide).

    Pure expression composition: tokenize once (let-bound), explode a
    sequence of stride starts, slice + rejoin. Narrow until the
    explode; the explode's fan-out is size/stride per doc -- the same
    row-amplification as any shingle op, shuffled only by whatever
    consumes it. Token positions (chunk_start) index the NORMALIZED
    token stream (functions/text.tokens), which is what downstream
    token-budget math uses too."""
    if max_tokens <= 0:
        raise ValueError("max_tokens must be positive")
    if not 0 <= overlap < max_tokens:
        raise ValueError("overlap must satisfy 0 <= overlap < max_tokens")
    from xmidt_event_streams_spark.functions.text import tokens

    stride = max_tokens - overlap
    toks = tokens(text_col)
    n = F.size("_toks")
    # starts: 1, 1+stride, ... while start <= n (Spark arrays are
    # 1-indexed); empty doc -> single start at 1 (empty chunk)
    n_chunks = F.greatest(
        F.ceil((n - F.lit(overlap)) / F.lit(stride)).cast("int"), F.lit(1)
    )
    out = (
        df.withColumn("_toks", toks)
        .withColumn("_n_chunks", n_chunks)
        .select(
            F.col(id_col),
            "_toks",
            "_n_chunks",
            F.posexplode(
                F.sequence(
                    F.lit(1), (F.col("_n_chunks") - 1) * stride + 1, F.lit(stride)
                )
            ).alias("chunk_id", "chunk_start"),
        )
        .select(
            F.col(id_col),
            F.col("chunk_id"),
            F.col("_n_chunks").alias("n_chunks"),
            F.col("chunk_start"),
            F.size(F.slice("_toks", F.col("chunk_start"), F.lit(max_tokens))).alias(
                "chunk_n_tokens"
            ),
            F.concat_ws(
                " ", F.slice("_toks", F.col("chunk_start"), F.lit(max_tokens))
            ).alias("chunk_text"),
        )
    )
    return out


def weighted_sample(
    df: DataFrame,
    n: int,
    weight_col: str,
    id_col: str = "doc_id",
    salt: str = "wsample-v1",
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement: keep the
    ``n`` rows with the largest Efraimidis-Spirakis keys
    u^(1/w) -- equivalently rank by ln(u)/w -- where u is a uniform
    derived from md5(salt || id), not an RNG. (Efraimidis & Spirakis,
    "Weighted random sampling with a reservoir", IPL 2006 -- the
    standard one-pass distributed formulation; implemented from the
    published definition.) Inclusion probability is proportional-ish
    to weight, the draw is a pure row property (stable across runs,
    partitioning, retries, and engines -- the same contract as
    stratified_sample vs sampleBy), and changing ``salt`` redraws.

    Rows with weight <= 0 or null are excluded (they cannot win under
    the ES key and their ln/0 is undefined -- excluded loudly here
    rather than NaN-ranked). One global top-n (TakeOrderedAndProject:
    per-partition heaps of n, no full sort); for n large enough to
    strain the driver, rank with a threshold instead.
    """
    if n <= 0:
        raise ValueError("n must be positive")
    # 15 hex chars = 60 bits -> exact double arithmetic, u in (0, 1]
    u = (
        F.conv(F.substring(F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string"))), 1, 15), 16, 10)
        .cast("double")
        + F.lit(1.0)
    ) / F.lit(float(16**15))
    key = F.log(u) / F.col(weight_col)
    return (
        df.filter(F.col(weight_col) > 0)
        .withColumn("_es_key", key)
        .orderBy(F.col("_es_key").desc(), F.col(id_col))
        .limit(n)
        .drop("_es_key")
    )


def sample_k_per_group(
    df: DataFrame,
    group_col: str,
    k: int,
    id_col: str = "doc_id",
    salt: str = "kgroup-v1",
) -> DataFrame:
    """Deterministic EXACT-k-per-group sample -- the eval-holdout
    builder ("200 examples per domain/language"): rank each group's
    rows by md5(salt || id) and keep rank <= k. The order is a pure
    row property (stable across runs/partitioning/engines, new
    ``salt`` = fresh draw -- the stratified_sample contract, but with
    an exact count instead of an expected fraction; groups smaller
    than k keep everything). Samples NEST: the same salt at a larger
    k is a superset (the per-group order is fixed), so growing an
    eval set later keeps every earlier pick -- annotations don't
    churn.

    Plan shape: rank <= k over a window compiles to WindowGroupLimit
    -- each task keeps only k candidates per group BEFORE the
    exchange, so the shuffle carries O(groups x k), not the corpus
    (the test_plan_invariants property). One shuffle on the group
    key; no driver state.
    """
    if k <= 0:
        raise ValueError("k must be positive")
    from pyspark.sql import Window

    order = F.md5(
        F.concat(F.lit(salt), F.lit("|"), F.col(id_col).cast("string"))
    )
    rn = F.row_number().over(
        Window.partitionBy(group_col).orderBy(order.asc(), F.col(id_col))
    )
    return df.withColumn("_rn", rn).filter(F.col("_rn") <= k).drop("_rn")


def leakage_safe_split(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    weights: dict[str, float] | None = None,
    salt: str = "split-v1",
) -> DataFrame:
    """``assign_split`` with the near-duplicate leakage hole closed:
    every member of a duplicate cluster lands in the SAME split.

    A plain per-id hash split leaks through near-duplicates -- two
    ~identical documents can straddle train and test, and the model
    gets graded on (a paraphrase of) its own training data. Here the
    split key is the duplicate-CLUSTER representative: connected
    components over the candidate-pair graph (``pairs``: id_a/id_b
    from minhash_lsh_candidates, embedding_near_dup, image pairs --
    any near-dup relation, or a union of several), min-id label per
    component, and the split hash is taken on that representative.
    Documents in no pair keep their own id as representative, so for
    them the assignment is IDENTICAL to ``assign_split`` (same salt,
    same buckets) -- adding pair evidence later only ever moves
    cluster members, never the untouched singleton population.

    Scale: components cost the pair graph (small relative to the
    corpus -- candidate pairs, not all pairs); the representative
    join is one broadcast-or-shuffle equi join keyed by id; the split
    itself stays the narrow md5 arithmetic.

    Caveat (inherent to clustering): cluster membership depends on
    the pair relation, so re-running with a GROWN pair graph can move
    a whole cluster between splits (its representative may change).
    Pin the pair snapshot alongside the corpus snapshot for
    reproducible splits -- same posture as read_sink_as_of.
    """
    from xmidt_event_streams_spark.operators.components import (
        connected_components,
    )

    comps = connected_components(
        pairs, out_id=id_col, out_label="_rep"
    )
    rep = F.coalesce(F.col("_rep"), F.col(id_col))
    with_rep = df.join(comps, id_col, "left").withColumn("_split_key", rep)
    out = assign_split(with_rep, id_col="_split_key", weights=weights, salt=salt)
    return out.drop("_rep", "_split_key")


def global_shuffle(
    df: DataFrame,
    seed: str = "shuffle-0",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic corpus-wide shuffle for training-order
    randomization: order = md5(seed || id) — a pseudorandom but
    REPRODUCIBLE permutation (same seed -> byte-identical order on any
    cluster/partitioning, unlike orderBy(rand()) whose seed is
    per-partition and layout-dependent; new seed per epoch -> a fresh
    permutation).

    One range shuffle (Exchange rangepartitioning on the md5 key) —
    the cost floor for any total order. Write the result with
    ``sortWithinPartitions`` semantics preserved (orderBy guarantees
    both partition ranges and intra-partition order), so downstream
    sequential readers see the shuffled order file-by-file.
    """
    return (
        df.withColumn(
            "_shuffle_key",
            F.md5(F.concat(F.lit(seed), F.lit("|"), F.col(id_col).cast("string"))),
        )
        .orderBy("_shuffle_key")
        .drop("_shuffle_key")
    )


def soft_quality_sample(
    df: DataFrame,
    score_col: str,
    id_col: str = "doc_id",
    pivot: float = 0.0,
    temperature: float = 1.0,
    seed: str = "softq-0",
) -> DataFrame:
    """Soft (probabilistic) quality filtering: keep each doc with
    probability sigmoid((score - pivot) / temperature) -- the
    FineWeb-ablation refinement of a hard threshold, which keeps SOME
    borderline mass (hard cutoffs systematically delete entire
    borderline styles and skew the corpus distribution).

    The coin is md5(seed|id) arithmetic, not an RNG: the decision is
    a pure row function -- reproducible across runs/partitions, a new
    ``seed`` gives a fresh draw, and re-running over a grown corpus
    never flips earlier verdicts (ingestion stability, same contract
    as assign_split). temperature -> 0+ approaches the hard threshold
    at ``pivot`` (temperature must be > 0: at exactly 0 the expression
    is 0/0 -- pass any tiny positive value for a hard cut, or filter
    directly); larger temperature keeps more low-score mass. Rows
    with a NULL score are DROPPED (no probability is defined for
    them; score upstream or filter nulls first if they should
    survive). Narrow projection, zero shuffle.
    """
    if temperature <= 0:
        raise ValueError(
            f"temperature must be > 0 (got {temperature}); at the "
            "t->0 limit use a tiny positive value or a plain filter"
        )
    u = (_hash_bucket(F.col(id_col), seed) + 0.5) / F.lit(float(_BUCKETS))
    p_keep = F.lit(1.0) / (
        F.lit(1.0)
        + F.exp(-(F.col(score_col) - F.lit(pivot)) / F.lit(temperature))
    )
    return df.filter(F.col(score_col).isNotNull() & (u < p_keep))


def token_budget_sample(
    df: DataFrame,
    domain_col: str,
    token_col: str,
    budgets: dict[str, int],
    id_col: str = "doc_id",
    salt: str = "tokbudget-v1",
) -> DataFrame:
    """Deterministically sample each domain down to (approximately) a
    TOKEN budget -- the practical mixture knob: training recipes are
    specified in tokens per domain ("300B web, 50B code, ..."), not in
    document fractions, and domains with longer documents need fewer
    of them.

    Per domain d: rate_d = min(1, budget_d / total_tokens_d); keep a
    doc iff its md5 bucket falls under rate_d (the stratified_sample
    draw -- a pure row property, so the kept set is reproducible and
    ingestion-stable). Expected kept tokens per domain = budget_d
    (document sampling keeps the within-domain length distribution
    unbiased -- unlike truncating long docs, which skews it). Domains
    missing from ``budgets`` are DROPPED (explicit mixture contract);
    a domain under its budget keeps everything (rate 1, no
    upsampling -- replicate epochs upstream for that).

    Two tiny jobs: one per-domain token-sum agg (rows = domain
    cardinality), then one narrow filter. Nothing else shuffles.
    """
    totals = {
        r["d"]: r["t"]
        for r in df.groupBy(F.col(domain_col).alias("d"))
        .agg(F.sum(token_col).alias("t"))
        .collect()
    }
    fractions = {
        d: min(1.0, budgets[d] / totals[d]) if totals.get(d) else 0.0
        for d in budgets
    }
    return stratified_sample(
        df,
        domain_col,
        fractions,
        id_col=id_col,
        default_fraction=0.0,
        salt=salt,
    )
