"""Query catalog: every operator exposed as a named (Spark query,
DuckDB oracle SQL) pair over the driver's parquet tables.

This is the single registry behind ``__spark_entry__.py`` (driver
correctness gate), ``bench.py`` (performance gate), and
``tests/test_oracle_parity.py`` (local replica of the gate).

Conventions that make cross-engine value-hashing exact:
  * every computed column is aliased identically on both sides;
  * integer outputs are BIGINT on both sides;
  * doubles that pass through non-associative aggregation are either
    summed as DECIMAL (exact) and cast back, or rounded to >= 6 dp at
    a magnitude where cross-engine FP drift is << the rounding step;
  * all content hashing is md5 (identical in every engine);
  * regex stays in the Java-regex ∩ RE2 common dialect
    (SURVEY.md §7 'regex drift').
"""

from __future__ import annotations

from typing import Callable, NamedTuple

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from xmidt_event_streams_spark.config import DEFAULT_FILTERS
from xmidt_event_streams_spark.enrich import (
    classify_rejects,
    extract_event_type,
    fix_wrp,
)
from xmidt_event_streams_spark.functions.text import (
    LANG_STOPWORDS,
    bpe_ish_token_count,
    predict_lang,
    quality_features,
    token_count,
)
from xmidt_event_streams_spark.operators.aggregates import (
    SUBMIT_DURATION_BUCKETS_MS,
    duration_histogram,
    event_type_counts,
)
from xmidt_event_streams_spark.operators.batching import assign_batches
from xmidt_event_streams_spark.operators.classifier import nb_fit, nb_score
from xmidt_event_streams_spark.operators.lm import lm_perplexity, ngram_lm_fit
from xmidt_event_streams_spark.operators.components import connected_components
from xmidt_event_streams_spark.operators.contamination import contamination
from xmidt_event_streams_spark.operators.relevance import bm25_scores
from xmidt_event_streams_spark.operators.dedup import (
    exact_dedup,
    minhash_lsh_candidates,
    ngram_jaccard_pairs,
    simhash16_df,
)
from xmidt_event_streams_spark.operators.sessions import latest_per_key, sessionize
from xmidt_event_streams_spark.operators.similarity import (
    brute_force_topk,
    deterministic_planes,
    lsh_topk,
)
from xmidt_event_streams_spark.routing import route_union, routing_oracle_sql
from xmidt_event_streams_spark.schema import WRP_VIEW_SQL, wrp_view
from xmidt_event_streams_spark.session import load_tables, scan_fanout


class QuerySpec(NamedTuple):
    fn: Callable[[SparkSession, str], DataFrame]
    sql: str | None  # DuckDB oracle; None -> rows-only check
    headline: bool = False  # included in bench.py


def _ev(spark, sf_dir, fanout=False):
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    if fanout:
        # guide §2.5: single-row-group test files are unsplittable, so
        # the scan (and everything fused into it) is ONE task; recover
        # parallelism with a round-robin repartition that no-ops on
        # splittable production layouts. Opt-in per query: only the
        # paths whose scan-stage compute dominates (regex routing,
        # shingle md5s) win -- for cheap-downstream queries the extra
        # exchange costs more than it buys (measured r10).
        ev = scan_fanout(ev, f"{sf_dir}/events.parquet")
    return ev


def _wrp(spark, sf_dir, fanout=False):
    return wrp_view(_ev(spark, sf_dir, fanout))


def _docs(spark, sf_dir, fanout=False):
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    if fanout:
        docs = scan_fanout(docs, f"{sf_dir}/documents.parquet")
    return docs


def _emb(spark, sf_dir):
    return load_tables(spark, sf_dir, ("embeddings",))["embeddings"]


WRP_CTE = f"wrp AS ({WRP_VIEW_SQL})"

_EVT_SQL = (
    "CASE WHEN regexp_extract(dest, '^event:([^/]+)', 1) = '' THEN 'unknown' "
    "ELSE regexp_extract(dest, '^event:([^/]+)', 1) END"
)

# ---------------------------------------------------------------- routing

_ROUTED_SQL = routing_oracle_sql(
    DEFAULT_FILTERS, "wrp", "dest", "source", "event_id, dest, source, session_id"
)


def q_flagship_route_counts(spark, sf_dir):
    """R1-R4 + V8 + M1: fan-out routing then per-(stream, event type)
    counts -- the reference's hot path as one aggregate."""
    # extract the event type BEFORE the fan-out explode: per input
    # row instead of per (row, matching stream) pair -- the fan-out
    # multiplies rows (~2x at the default filter set), so computing
    # the regex on the pre-explode relation halves its evaluations
    # with identical groups (measured 0.81 -> 0.68 s at sf0.1)
    w = _wrp(spark, sf_dir, fanout=True).withColumn(
        "_evt", extract_event_type("dest")
    )
    routed = route_union(w, DEFAULT_FILTERS)
    return routed.groupBy(
        "stream_name", F.col("_evt").alias("event_type")
    ).agg(F.count("*").alias("n"))


SQL_FLAGSHIP = f"""
WITH {WRP_CTE}, routed AS ({_ROUTED_SQL})
SELECT stream_name, {_EVT_SQL} AS event_type, count(*) AS n
FROM routed GROUP BY 1, 2
"""


def q_route_fanout(spark, sf_dir):
    """R1/R2/R3: the (message, matching stream) pair set."""
    routed = route_union(_wrp(spark, sf_dir, fanout=True), DEFAULT_FILTERS)
    return routed.select("event_id", "stream_name")


SQL_ROUTE_FANOUT = f"""
WITH {WRP_CTE}, routed AS ({_ROUTED_SQL})
SELECT event_id, stream_name FROM routed
"""


def q_event_type_counts(spark, sf_dir):
    """M1: COUNT(*) GROUP BY extracted event type over the full stream."""
    return event_type_counts(_wrp(spark, sf_dir))


SQL_EVENT_TYPE_COUNTS = f"""
WITH {WRP_CTE}
SELECT {_EVT_SQL} AS event_type, count(*) AS n FROM wrp GROUP BY 1
"""


def q_validate_rejects(spark, sf_dir):
    """V3 + M2/M3: rows tagged with reject reason, counted per reason
    ('' = accepted)."""
    tagged = classify_rejects(_wrp(spark, sf_dir))
    return tagged.groupBy("reject_reason").agg(F.count("*").alias("n"))


SQL_VALIDATE_REJECTS = f"""
WITH {WRP_CTE}
SELECT CASE WHEN msg_type <> 4 THEN 'invalid_msg_type' ELSE '' END AS reject_reason,
       count(*) AS n
FROM wrp GROUP BY 1
"""


def q_fixwrp_enrich(spark, sf_dir):
    """V6 fixWrp: default empty content_type/transaction_uuid, tag the
    reason (deterministic md5-derived uuid so the oracle can match)."""
    fixed = fix_wrp(_wrp(spark, sf_dir), deterministic_uuid_from="event_id")
    return fixed.select("event_id", "content_type", "transaction_uuid", "fix_reason")


SQL_FIXWRP = f"""
WITH {WRP_CTE}, h AS (
  SELECT *, md5(CAST(event_id AS VARCHAR)) AS hh FROM wrp
)
SELECT event_id,
  CASE WHEN content_type IS NULL OR content_type = '' THEN 'application/json'
       ELSE content_type END AS content_type,
  CASE WHEN transaction_uuid IS NULL OR transaction_uuid = '' THEN
    substr(hh,1,8) || '-' || substr(hh,9,4) || '-' || substr(hh,13,4) || '-' ||
    substr(hh,17,4) || '-' || substr(hh,21,12)
  ELSE transaction_uuid END AS transaction_uuid,
  CASE
    WHEN (transaction_uuid IS NULL OR transaction_uuid = '')
     AND (content_type IS NULL OR content_type = '') THEN 'empty_uuid_and_content_type'
    WHEN transaction_uuid IS NULL OR transaction_uuid = '' THEN 'empty_uuid'
    WHEN content_type IS NULL OR content_type = '' THEN 'empty_content_type'
    ELSE '' END AS fix_reason
FROM h
"""

# ---------------------------------------------------- scalar / micro-batch


def q_time_functions(spark, sf_dir):
    """F1/F2/F5: canonical epoch-micros storage form and round-trip."""
    ev = _ev(spark, sf_dir)
    us = F.unix_micros("ts")
    return ev.select(
        "event_id",
        us.alias("us"),
        F.floor(us / 1_000_000).cast("long").alias("epoch_s"),
        F.timestamp_micros(us).alias("ts_roundtrip"),
        F.date_trunc("hour", F.col("ts")).alias("hour_start"),
    )


SQL_TIME_FUNCTIONS = """
SELECT event_id, epoch_us(ts) AS us,
  CAST(floor(epoch_us(ts) / 1000000.0) AS BIGINT) AS epoch_s,
  make_timestamp(epoch_us(ts)) AS ts_roundtrip,
  date_trunc('hour', ts) AS hour_start
FROM events
"""


def q_batch_chunks(spark, sf_dir):
    """B6/K6: 500-record delivery chunk assignment per stream-group
    (batch.GetBatches arithmetic as a window expression)."""
    return assign_batches(
        _ev(spark, sf_dir), "event_type", "event_id", 500
    ).select("event_id", "event_type", "batch_no")


SQL_BATCH_CHUNKS = """
SELECT event_id, event_type,
  CAST(floor((row_number() OVER (PARTITION BY event_type ORDER BY event_id) - 1) / 500.0) AS BIGINT) AS batch_no
FROM events
"""


def q_json_serialize(spark, sf_dir):
    """K1/F8: message -> JSON blob (to_json over a struct) and parse
    back out of the serialized text (get_json_object) -- the encode
    and extract halves of the JSON path in one projection, plus
    extraction from the stored JSON props payload (V2 analog)."""
    w = _wrp(spark, sf_dir)
    js = F.to_json(F.struct(F.col("event_id"), F.col("dest"), F.col("session_id")))
    return w.select(
        "event_id",
        js.alias("js"),
        F.get_json_object(js, "$.dest").alias("dest_rt"),
    )


SQL_JSON_SERIALIZE = f"""
WITH {WRP_CTE}
SELECT event_id,
  to_json(struct_pack(event_id := event_id, dest := dest, session_id := session_id)) AS js,
  json_extract_string(
    to_json(struct_pack(event_id := event_id, dest := dest, session_id := session_id)),
    '$.dest') AS dest_rt
FROM wrp
"""


def q_value_histogram(spark, sf_dir):
    """M7: histogram bucketing (queue_submit_duration buckets) applied
    to the events value column."""
    return duration_histogram(_ev(spark, sf_dir), "value")


def _hist_case() -> str:
    expr = "'inf'"
    for b in reversed(SUBMIT_DURATION_BUCKETS_MS):
        expr = f"CASE WHEN value <= {b} THEN '{b}' ELSE {expr} END"
    return expr


SQL_VALUE_HISTOGRAM = f"""
SELECT {_hist_case()} AS le_ms, count(*) AS n FROM events GROUP BY 1
"""

# ------------------------------------------------------------- sessions


def q_session_windows(spark, sf_dir):
    """Event-time session windows (30 min gap) per user -- Spark
    session_window vs the SQL gaps-and-islands construction."""
    return sessionize(_ev(spark, sf_dir), "user_id", "ts", 30)


SQL_SESSION_WINDOWS = """
WITH m AS (
  SELECT user_id, ts,
    CASE WHEN lag(ts) OVER w IS NULL
          OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_s
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), g AS (
  SELECT user_id, ts,
    sum(new_s) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid
  FROM m
)
SELECT user_id, min(ts) AS session_start,
       max(ts) + INTERVAL 30 MINUTE AS session_end,
       count(*) AS n_events
FROM g GROUP BY user_id, sid
"""


def q_latest_per_key(spark, sf_dir):
    """Per-key latest-row dedup (CDC compaction)."""
    return latest_per_key(
        _ev(spark, sf_dir), "user_id", "ts", tiebreak_col="event_id"
    ).select("user_id", "event_id", "ts")


SQL_LATEST_PER_KEY = """
SELECT user_id, event_id, ts FROM (
  SELECT user_id, event_id, ts,
    row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
) WHERE rn = 1
"""


def q_dedup_by_txn(spark, sf_dir):
    """Reference-upgrade dedup on the delivery key (SURVEY.md §2.8):
    min event per transaction_uuid."""
    w = _wrp(spark, sf_dir)
    return w.groupBy("transaction_uuid").agg(
        F.min("event_id").alias("event_id"), F.count("*").alias("n")
    )


SQL_DEDUP_BY_TXN = f"""
WITH {WRP_CTE}
SELECT transaction_uuid, min(event_id) AS event_id, count(*) AS n
FROM wrp GROUP BY 1
"""

# ------------------------------------------------------------ documents

# Shared DuckDB fragment: normalized word list per doc.
_WORDS_CTE = r"""
words AS (
  SELECT doc_id, lang, source, text,
    list_filter(
      string_split(trim(regexp_replace(lower(text), '[ \t\n\x0B\f\r]+', ' ', 'g')), ' '),
      t -> t <> ''
    ) AS w
  FROM documents
)
"""

# explicit whitespace class: Java \s includes \x0B, RE2 \s does not
_NORM_SQL = r"trim(regexp_replace(lower(text), '[ \t\n\x0B\f\r]+', ' ', 'g'))"


def q_dedup_exact(spark, sf_dir):
    """Exact dedup by md5 fingerprint of normalized text."""
    return exact_dedup(_docs(spark, sf_dir))


SQL_DEDUP_EXACT = f"""
SELECT md5({_NORM_SQL}) AS fingerprint, min(doc_id) AS doc_id, count(*) AS n_dups
FROM documents GROUP BY 1
"""


def q_minhash_lsh_pairs(spark, sf_dir):
    """MinHash(8) + LSH(4 bands x 2) candidate near-dup pairs over
    word-3-gram shingles."""
    return minhash_lsh_candidates(
        _docs(spark, sf_dir, fanout=True), num_hashes=8, bands=4, shingle_n=3
    )


def _minhash_ctes(num_hashes: int = 8, bands: int = 4, shingle_n: int = 3) -> str:
    """The shared CTE chain ending in ``ex`` (doc_id, band bucket) --
    reused by SQL_MINHASH and SQL_DUP_CLUSTERS."""
    from xmidt_event_streams_spark.operators.dedup import _MH_P, _mh_coeffs

    r = num_hashes // bands
    coeffs = _mh_coeffs(num_hashes)
    # shb: ONE md5 base draw per shingle (mirrors _minhash_base);
    # each signature slot is the universal-hash min (a*x+b) % P
    sig_items = ", ".join(
        f"list_min(list_transform(shb, x -> ({a} * x + {b}) % {_MH_P}))"
        for a, b in coeffs
    )
    key_items = ", ".join(
        f"md5('b{b}:' || array_to_string(sig[{b * r + 1}:{b * r + r}], '|'))"
        for b in range(bands)
    )
    return f"""{_WORDS_CTE},
sh AS (
  SELECT doc_id,
    list_transform(generate_series(1, greatest(len(w) - {shingle_n - 1}, 0)),
                   i -> array_to_string(w[i:i+{shingle_n - 1}], ' ')) AS sh
  FROM words
),
shb AS (
  SELECT doc_id,
    list_transform(sh, s -> ('0x' || substr(md5(s), 1, 15))::BIGINT % {_MH_P}) AS shb
  FROM sh WHERE len(sh) > 0
),
sig AS (
  SELECT doc_id, [{sig_items}] AS sig FROM shb
),
keys AS (SELECT doc_id, [{key_items}] AS ks FROM sig),
ex AS (SELECT doc_id, unnest(ks) AS bucket FROM keys)"""


_MINHASH_PAIRS_SELECT = """SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
FROM ex a JOIN ex b ON a.bucket = b.bucket AND a.doc_id < b.doc_id"""

SQL_MINHASH = f"WITH {_minhash_ctes()}\n{_MINHASH_PAIRS_SELECT}"


def q_dup_clusters(spark, sf_dir):
    """Near-dup CLUSTERS: the minhash_lsh_pairs candidate graph closed
    under transitivity (a~b, b~c => {a,b,c} one cluster) via
    distributed min-label propagation -- the retention-decision step
    of the dedup pipeline (operators/components.py). cluster_id = min
    doc_id of the component = the canonical survivor."""
    pairs = minhash_lsh_candidates(
        _docs(spark, sf_dir), num_hashes=8, bands=4, shingle_n=3
    )
    return connected_components(pairs)


# Oracle: same candidate-pair CTEs, then transitive closure as a
# recursive CTE (UNION dedups -> terminates); min reachable id per
# vertex = component label. Exponential-ish at large scale but exact
# at the sf0.01 gate; the Spark side is the log-diameter loop.
SQL_DUP_CLUSTERS = f"""
WITH RECURSIVE {_minhash_ctes()},
pairs AS ({_MINHASH_PAIRS_SELECT}),
edges AS (
  SELECT id_a AS u, id_b AS v FROM pairs
  UNION
  SELECT id_b AS u, id_a AS v FROM pairs
),
walk(u, lbl) AS (
  SELECT u, u FROM edges
  UNION
  SELECT e.u, w.lbl FROM edges e JOIN walk w ON e.v = w.u
)
SELECT u AS doc_id, min(lbl) AS cluster_id FROM walk GROUP BY u
"""


NGRAM_MAX_BUCKET = 200


def q_ngram_jaccard(spark, sf_dir):
    """Exact word-bigram Jaccard for all pairs within (lang, source)
    buckets, capped at NGRAM_MAX_BUCKET docs per bucket (deterministic
    lowest-id survivors) so one skewed bucket cannot go quadratic;
    operators/dedup.bucket_cap_drops is the drop ledger. The cap is a
    no-op at sf0.01 bucket sizes -- its bound is proven in
    tests/test_msgpack_asof.py with an oversized bucket."""
    return ngram_jaccard_pairs(
        _docs(spark, sf_dir), ("lang", "source"), shingle_n=2,
        max_bucket_size=NGRAM_MAX_BUCKET,
    )


SQL_NGRAM_JACCARD = f"""
WITH {_WORDS_CTE},
sh0 AS (
  SELECT doc_id, lang, source,
    list_distinct(list_transform(generate_series(1, greatest(len(w) - 1, 0)),
                                 i -> array_to_string(w[i:i+1], ' '))) AS sh
  FROM words
),
sh AS (
  SELECT doc_id, lang, source, sh FROM (
    SELECT *, row_number() OVER (PARTITION BY lang, source ORDER BY doc_id) AS rn
    FROM sh0
  ) WHERE rn <= {NGRAM_MAX_BUCKET}
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
  round(CASE WHEN len(list_distinct(list_concat(a.sh, b.sh))) > 0
    THEN CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
         / len(list_distinct(list_concat(a.sh, b.sh)))
    ELSE 0 END, 6) AS jaccard
FROM sh a JOIN sh b
  ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id
"""


def q_packed_sequences(spark, sf_dir):
    """Fixed-length training-sequence packing
    (operators/traindata.py:pack_token_stream): every document's
    whitespace tokens + a per-doc </s> sentinel, concatenated per
    shard (doc_id % 4, doc_id order) and sliced into exact 256-token
    sequences, trailing partials dropped -- the GPT-style
    concatenate-then-chunk step a trainer's loader reads. Documents
    ARE split across sequence boundaries; the operator also emits
    doc_spans provenance (dropped here: the oracle hashes the packed
    stream itself, which subsumes it). Distributed shape: per-shard
    prefix-sum window -> explode into overlapped sequence slots ->
    one (shard, seq_id) hash-agg; nothing collects."""
    from xmidt_event_streams_spark.operators.traindata import (
        tokenize_and_pack,
    )

    docs = _docs(spark, sf_dir).withColumn(
        "shard", F.pmod(F.col("doc_id"), F.lit(4))
    )
    out = tokenize_and_pack(
        docs, seq_len=256, shard_cols=["shard"], drop_last=True
    )
    return out.select(
        "shard",
        "seq_id",
        F.concat_ws(" ", F.col("input_ids")).alias("seq_text"),
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
    )


# Oracle: materialize the same per-shard token stream with a window
# row_number and slice it by integer division -- concatenate-then-chunk
# is pure SQL over the ordered stream, so the packed bytes themselves
# are hash-checked, not just sequence counts.
SQL_PACKED_SEQUENCES = f"""
WITH {_WORDS_CTE},
toks AS (
  SELECT doc_id, doc_id % 4 AS shard,
    unnest(list_transform(generate_series(1, len(we)),
                          i -> {{'tok': we[i], 'ord': i}})) AS u
  FROM (SELECT doc_id, list_append(w, '</s>') AS we FROM words)
),
stream AS (
  SELECT shard, u.tok AS tok,
    row_number() OVER (PARTITION BY shard ORDER BY doc_id, u.ord) - 1 AS rn
  FROM toks
)
SELECT shard, rn // 256 AS seq_id,
  array_to_string(list(tok ORDER BY rn), ' ') AS seq_text,
  count(*) AS n_tokens
FROM stream
GROUP BY shard, seq_id
HAVING count(*) = 256
"""


def q_jaccard_join_prefix(spark, sf_dir):
    """Exact corpus-wide near-dup pairs via prefix filtering
    (operators/ssjoin.py; AllPairs WWW'07 / PPJoin WWW'08): every
    document pair whose distinct word-TRIGRAM sets have Jaccard >= 0.5
    -- no buckets, no caps, no randomness. The third candidate tier
    next to MinHash banding (probabilistic, same trigram shingles) and
    bucketed ngram_jaccard (exact within caller blocks): candidates
    come from each doc's RAREST shingles only, so the hot shingles
    never drive the self-join (measured on this corpus: 1,613
    candidate occurrences vs 124,750 brute pairs at sf0.01). The
    oracle is the brute-force all-pairs join -- exactness means the
    lossless-filter claim is hash-checked, not argued."""
    from xmidt_event_streams_spark.operators.ssjoin import jaccard_join

    return jaccard_join(_docs(spark, sf_dir), threshold=0.5, shingle_n=3)


# Oracle: brute-force all pairs (the filters are lossless, so the
# candidate machinery must reproduce this exactly). Filter on the
# UNROUNDED ratio (both engines compare the same correctly-rounded
# int/int double), round only for display -- mirroring the Spark side.
SQL_JACCARD_JOIN_PREFIX = f"""
WITH {_WORDS_CTE},
sh AS (
  SELECT doc_id,
    list_distinct(list_transform(generate_series(1, greatest(len(w) - 2, 0)),
                                 i -> array_to_string(w[i:i+2], ' '))) AS sh
  FROM words
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
  round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
        / len(list_distinct(list_concat(a.sh, b.sh))), 6) AS jaccard
FROM sh a JOIN sh b ON a.doc_id < b.doc_id
WHERE len(list_distinct(list_concat(a.sh, b.sh))) > 0
  AND CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
      / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.5
"""


def q_simhash(spark, sf_dir):
    """16-bit SimHash signature per document."""
    return simhash16_df(_docs(spark, sf_dir))


def _simhash_sql() -> str:
    hexhi = "('8','9','a','b','c','d','e','f')"
    bits = " || ".join(
        f"(CASE WHEN coalesce(list_sum(list_transform(hs, "
        f"h -> CASE WHEN substr(h,{p},1) IN {hexhi} THEN 1 ELSE -1 END)), 0) >= 0 "
        f"THEN '1' ELSE '0' END)"
        for p in range(1, 17)
    )
    return f"""
WITH {_WORDS_CTE},
hh AS (SELECT doc_id, list_transform(w, t -> md5(t)) AS hs FROM words)
SELECT doc_id, {bits} AS simhash FROM hh
"""


SQL_SIMHASH = _simhash_sql()


def q_token_counts(spark, sf_dir):
    """Token counting: whitespace tokens + BPE-ish subword estimate."""
    d = _docs(spark, sf_dir)
    return d.select(
        "doc_id",
        token_count("text").cast("long").alias("n_tokens"),
        bpe_ish_token_count("text").cast("long").alias("n_bpe"),
    )


SQL_TOKEN_COUNTS = f"""
WITH {_WORDS_CTE}
SELECT doc_id, CAST(len(w) AS BIGINT) AS n_tokens,
  CAST(coalesce(list_sum(list_transform(w, t -> CAST(ceil(length(t)/4.0) AS INT))), 0) AS BIGINT) AS n_bpe
FROM words
"""


def q_text_quality(spark, sf_dir):
    """Quality-scoring features per document."""
    d = _docs(spark, sf_dir)
    feats = quality_features("text")
    return d.select(
        "doc_id",
        feats["n_chars"].cast("long").alias("n_chars"),
        feats["n_tokens"].cast("long").alias("n_tokens"),
        F.round(feats["avg_token_len"], 6).alias("avg_token_len"),
        F.round(feats["punct_ratio"], 6).alias("punct_ratio"),
        F.round(feats["digit_ratio"], 6).alias("digit_ratio"),
        F.round(feats["stopword_ratio_en"], 6).alias("stopword_ratio_en"),
    )


_EN_SW = "['" + "','".join(LANG_STOPWORDS["en"]) + "']"

SQL_TEXT_QUALITY = f"""
WITH {_WORDS_CTE}
SELECT doc_id,
  CAST(length(text) AS BIGINT) AS n_chars,
  CAST(len(w) AS BIGINT) AS n_tokens,
  round(CASE WHEN len(w) > 0
    THEN CAST(coalesce(list_sum(list_transform(w, t -> length(t))), 0) AS DOUBLE) / len(w)
    ELSE 0 END, 6) AS avg_token_len,
  round(CASE WHEN length(text) > 0
    THEN CAST(length(regexp_replace(text, '[^.,;:!?''"()-]', '', 'g')) AS DOUBLE) / length(text)
    ELSE 0 END, 6) AS punct_ratio,
  round(CASE WHEN length(text) > 0
    THEN CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS DOUBLE) / length(text)
    ELSE 0 END, 6) AS digit_ratio,
  round(CASE WHEN len(w) > 0
    THEN CAST(len(list_filter(w, t -> list_contains({_EN_SW}, t))) AS DOUBLE) / len(w)
    ELSE 0 END, 6) AS stopword_ratio_en
FROM words
"""


def q_repetition_stats(spark, sf_dir):
    """Per-document repetition detection (functions/quality.py): the
    self-duplication signal cross-doc dedup cannot see. Zero-exchange
    narrow projection (Gopher rule family, arXiv:2112.11446 §A1.1)."""
    from xmidt_event_streams_spark.functions.quality import (
        dup_ngram_frac,
        dup_token_frac,
        top_ngram_frac,
    )

    return _docs(spark, sf_dir).select(
        "doc_id",
        dup_token_frac("text").alias("dup_token_frac"),
        dup_ngram_frac("text", 2).alias("dup_2gram_frac"),
        top_ngram_frac("text", 2).alias("top_2gram_frac"),
    )


_BIGRAMS_SQL = (
    "CASE WHEN len(w) >= 2 THEN "
    "list_transform(generate_series(1, len(w) - 1), "
    "i -> w[i] || ' ' || w[i+1]) "
    "ELSE [] END"
)

SQL_REPETITION_STATS = f"""
WITH {_WORDS_CTE}, g AS (
  SELECT doc_id, w, {_BIGRAMS_SQL} AS bg FROM words
)
SELECT doc_id,
  CASE WHEN len(w) > 0 THEN
    round(1.0 - len(list_distinct(w))::DOUBLE / len(w), 6)
  ELSE 0.0 END AS dup_token_frac,
  CASE WHEN len(bg) > 0 THEN
    round(1.0 - len(list_distinct(bg))::DOUBLE / len(bg), 6)
  ELSE 0.0 END AS dup_2gram_frac,
  CASE WHEN len(bg) > 0 THEN
    round(list_max(list_transform(list_distinct(bg),
      d -> len(list_filter(bg, x -> x = d))))::DOUBLE / len(bg), 6)
  ELSE 0.0 END AS top_2gram_frac
FROM g
"""


def q_lang_id(spark, sf_dir):
    """Heuristic stopword-based language identification."""
    d = _docs(spark, sf_dir)
    return d.select("doc_id", predict_lang("text").alias("pred_lang"))


def _lang_id_sql() -> str:
    ordered = sorted(LANG_STOPWORDS.items())
    n = len(ordered)
    structs = ", ".join(
        f"struct_pack(score := len(list_filter(w, t -> list_contains("
        f"['" + "','".join(words) + f"'], t))), rnk := {n - 1 - i}, lang := '{lang}')"
        for i, (lang, words) in enumerate(ordered)
    )
    return f"""
WITH {_WORDS_CTE},
b AS (SELECT doc_id, list_max([{structs}]) AS best FROM words)
SELECT doc_id, CASE WHEN best.score > 0 THEN best.lang ELSE 'und' END AS pred_lang
FROM b
"""


SQL_LANG_ID = _lang_id_sql()


_BM25_TERMS = ("spark", "join", "window")
_BM25_K1, _BM25_B = 1.2, 0.75


def q_bm25_scores(spark, sf_dir):
    """Okapi BM25 relevance of every document against a fixed query
    vocabulary (operators/relevance.py): one token pass -> tf; dl/df/
    corpus stats derived from it; stats broadcast."""
    return bm25_scores(
        _docs(spark, sf_dir), list(_BM25_TERMS), k1=_BM25_K1, b=_BM25_B
    )


def _bm25_sql() -> str:
    terms = ", ".join(f"'{t}'" for t in _BM25_TERMS)
    k1, b = _BM25_K1, _BM25_B
    return f"""
WITH {_WORDS_CTE},
tok AS (SELECT doc_id, unnest(w) AS term FROM words),
tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM tok GROUP BY 1, 2),
dl AS (SELECT doc_id, sum(tf)::BIGINT AS dl FROM tf GROUP BY 1),
stats AS (SELECT avg(dl) AS avgdl, count(*)::BIGINT AS n_docs FROM dl),
dfreq AS (SELECT term, count(*)::BIGINT AS df FROM tf
          WHERE term IN ({terms}) GROUP BY 1)
SELECT tf.doc_id,
  round(sum(
    ln(1.0 + (n_docs - df + 0.5) / (df + 0.5))
    * tf * {k1 + 1.0!r} / (tf + {k1!r} * ({1.0 - b!r} + {b!r} * dl / avgdl))
  ), 6) AS bm25
FROM tf JOIN dl USING (doc_id) JOIN dfreq USING (term) CROSS JOIN stats
WHERE tf.term IN ({terms})
GROUP BY 1
"""


SQL_BM25 = _bm25_sql()


_BENCH_BUCKETS = 200  # 2% of the 10000-bucket hash space = benchmark set


def _bench_bucket_col():
    from xmidt_event_streams_spark.operators.traindata import _hash_bucket

    return _hash_bucket(F.col("doc_id"), "bench-v1")


def q_contamination(spark, sf_dir):
    """Benchmark-contamination check (operators/contamination.py):
    the corpus splits deterministically (md5 bucket, same formula as
    traindata.assign_split) into a ~2% benchmark set and the training
    rest; each training doc reports the fraction of its distinct word
    5-grams that occur anywhere in the benchmark set."""
    docs = _docs(spark, sf_dir)
    bkt = _bench_bucket_col()
    return contamination(
        docs.filter(bkt >= _BENCH_BUCKETS),
        docs.filter(bkt < _BENCH_BUCKETS),
        ngram_n=5,
    )


SQL_CONTAMINATION = f"""
WITH {_WORDS_CTE},
tagged AS (
  SELECT doc_id, w,
    ('0x' || substr(md5('bench-v1|' || doc_id::VARCHAR), 1, 15))::BIGINT
      % 10000 AS bkt
  FROM words
),
gr AS (
  SELECT doc_id, bkt,
    list_distinct(list_transform(
      generate_series(1, greatest(len(w) - 4, 0)),
      i -> md5(array_to_string(w[i:i+4], ' ')))) AS gs
  FROM tagged
),
tr AS (SELECT doc_id, unnest(gs) AS h FROM gr WHERE bkt >= {_BENCH_BUCKETS}),
bench AS (SELECT DISTINCT unnest(gs) AS h FROM gr WHERE bkt < {_BENCH_BUCKETS}),
totals AS (SELECT doc_id, count(*)::BIGINT AS n_ngrams FROM tr GROUP BY 1),
hits AS (
  SELECT doc_id, count(*)::BIGINT AS n_hit FROM tr
  WHERE h IN (SELECT h FROM bench) GROUP BY 1
)
SELECT t.doc_id, t.n_ngrams, coalesce(n_hit, 0) AS n_hit,
  round(coalesce(n_hit, 0) / t.n_ngrams::DOUBLE, 6) AS contamination
FROM totals t LEFT JOIN hits USING (doc_id)
"""

# ----------------------------------------------------------- embeddings


def q_embedding_topk(spark, sf_dir):
    """Brute-force cosine top-10 for query vectors vec_id < 5."""
    emb = _emb(spark, sf_dir)
    out = brute_force_topk(emb, emb.filter(F.col("vec_id") < 5), k=10)
    return out.withColumn("rank", F.col("rank").cast("long"))


SQL_EMBEDDING_TOPK = """
WITH q AS (
  SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id < 5
), c AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
), s AS (
  SELECT query_id, vec_id,
    round(CASE WHEN sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(qv, qv)) > 0
      THEN list_dot_product(v, qv)
           / (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(qv, qv)))
      ELSE 0 END, 6) AS cos_sim
  FROM c CROSS JOIN q WHERE vec_id <> query_id
)
SELECT query_id, vec_id, cos_sim, CAST(rnk AS BIGINT) AS rank FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, vec_id) AS rnk
  FROM s
) WHERE rnk <= 10
"""


def q_knn_join_exact(spark, sf_dir):
    """Two-sided distributed k-NN join (operators/knn.knn_join): the
    10%-anchor slice joined against the full embeddings relation via
    the IVF-partitioned cogroup — with n_probe = n_cells every
    (query, corpus) pair shares a group, so the output IS the exact
    cosine top-5 per anchor and DuckDB replays it row for row. This
    pins the whole composition: portable centroid fit -> cell
    assign/probe -> cogroup matmul with in-group partial top-k ->
    global rank merge (incl. the rounding and id tie-break contract
    shared with brute_force_topk). The pruned production regime
    (n_probe < cells, cell_salt for hot cells) is recall-floor- and
    invariance-pinned in tests/test_knn_join.py."""
    from xmidt_event_streams_spark.operators.ivf import kmeans_fit_portable
    from xmidt_event_streams_spark.operators.knn import knn_join

    emb = _emb(spark, sf_dir)
    cents = kmeans_fit_portable(emb, k=8, n_iters=3)
    out = knn_join(
        emb,
        emb.filter(F.col("vec_id") % 10 == 3),
        cents,
        k=5,
        n_probe=8,
        exclude_self=True,
    )
    return out.withColumn("rank", F.col("rank").cast("long"))


SQL_KNN_JOIN_EXACT = """
WITH q AS (
  SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv FROM embeddings
  WHERE vec_id % 10 = 3
), c AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
), s AS (
  SELECT query_id, vec_id,
    round(CASE WHEN sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(qv, qv)) > 0
      THEN list_dot_product(v, qv)
           / (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(qv, qv)))
      ELSE 0 END, 6) AS cos_sim
  FROM c CROSS JOIN q WHERE vec_id <> query_id
)
SELECT query_id, vec_id, cos_sim, CAST(rnk AS BIGINT) AS rank FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, vec_id) AS rnk
  FROM s
) WHERE rnk <= 5
"""


def q_embedding_centroids(spark, sf_dir):
    """Per-label centroid, one row per (label, dimension)."""
    emb = _emb(spark, sf_dir)
    ex = emb.select("label", F.posexplode(F.col("embedding").cast("array<double>")))
    return ex.groupBy("label", F.col("pos").cast("long").alias("pos")).agg(
        F.round(F.avg("col"), 6).alias("v")
    )


SQL_EMBEDDING_CENTROIDS = """
SELECT label, CAST(r.range AS BIGINT) AS pos,
  round(avg((embedding::DOUBLE[])[r.range + 1]), 6) AS v
FROM embeddings CROSS JOIN range(64) r
GROUP BY 1, 2
"""


def q_point_fetch(spark, sf_dir):
    """Bounded-plan point fetch (operators/fetch.py): read an
    id-addressed row set out of the embeddings store through the
    range-cover + broadcast-semi-join path (two tight id clusters +
    stragglers -- above the small-set isin threshold, so the full
    machinery engages), projecting (vec_id, dim, norm_6dp). Registry
    row since r8 (DuckDB semi-join twin): exactness of the fetch is
    the whole contract (the pruning side is pinned by
    tests/test_fetch.py's scanned-row assertions). Plan: pushed
    BETWEEN ranges on the scan + one broadcast semi-join; never a
    multi-thousand-literal IN."""
    from xmidt_event_streams_spark.operators.fetch import fetch_by_ids

    ids = (
        list(range(100, 160))
        + list(range(900, 950))
        + [7, 42, 4999]
    )
    emb = _emb(spark, sf_dir)
    return fetch_by_ids(emb, ids, id_col="vec_id").select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.round(
            F.sqrt(
                F.aggregate(
                    F.col("embedding").cast("array<double>"),
                    F.lit(0.0),
                    lambda acc, x: acc + x * x,
                )
            ),
            6,
        ).alias("norm_6dp"),
    )


SQL_POINT_FETCH = """WITH ids(vec_id) AS (
  SELECT UNNEST(ARRAY[7, 42, 4999])
  UNION ALL SELECT UNNEST(range(100, 160))
  UNION ALL SELECT UNNEST(range(900, 950))
)
SELECT e.vec_id,
       len(e.embedding) AS dim,
       round(sqrt(list_sum(list_transform(e.embedding, x -> x * x))),
             6) AS norm_6dp
FROM embeddings e SEMI JOIN ids USING (vec_id)
"""


def q_lsh_ann(spark, sf_dir):
    """LSH ANN end-to-end: queries (vec_id < 5) score only corpus
    vectors sharing their sign bucket; cosine top-10 within. Approx
    twin of embedding_topk (recall < 1 by construction); the bucket
    equi-join is the 100 TB path -- see operators/similarity.lsh_topk."""
    emb = _emb(spark, sf_dir)
    out = lsh_topk(emb, emb.filter(F.col("vec_id") < 5), k=10, n_planes=8, dim=64)
    return out.withColumn("rank", F.col("rank").cast("long"))


def _lsh_ann_sql() -> str:
    planes = deterministic_planes(8, 64)
    bits = " || ".join(
        "(CASE WHEN list_dot_product(embedding::DOUBLE[], ["
        + ", ".join(repr(x) for x in p)
        + "]::DOUBLE[]) >= 0 THEN '1' ELSE '0' END)"
        for p in planes
    )
    cos = (
        "round(CASE WHEN sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(q.v, q.v)) > 0 "
        "THEN list_dot_product(e.v, q.v) "
        "/ (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(q.v, q.v))) "
        "ELSE 0 END, 6)"
    )
    return f"""
WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS v, {bits} AS bucket FROM embeddings
), q AS (
  SELECT vec_id AS query_id, v, bucket FROM e WHERE vec_id < 5
), s AS (
  SELECT q.query_id, e.vec_id, {cos} AS cos_sim
  FROM e JOIN q ON e.bucket = q.bucket AND e.vec_id <> q.query_id
)
SELECT query_id, vec_id, cos_sim, CAST(rnk AS BIGINT) AS rank FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, vec_id) AS rnk
  FROM s
) WHERE rnk <= 10
"""


SQL_LSH_ANN = _lsh_ann_sql()


# ------------------------------------- late-interaction MaxSim search


MAXSIM_TOKENS = 4  # 64-dim embedding -> 4 x 16-dim "token" vectors


def q_maxsim_topk(spark, sf_dir):
    """Late-interaction MaxSim top-k (operators/multivec.py, from the
    published ColBERT formulation): documents as multi-vector rows
    (here: the deterministic 4-slice chunking of the embeddings
    table, which DuckDB mirrors with list slicing), queries as
    driver-side token matrices, score = sum over query tokens of the
    best-matching doc token. Self-matches included (the pq_topk
    contract; they rank first by construction). Off-registry parity
    row. Output: query_id, vec_id, maxsim, rank."""
    from xmidt_event_streams_spark.operators.multivec import (
        chunk_embedding_tokens,
        maxsim_topk,
    )

    emb = _emb(spark, sf_dir)
    docs = chunk_embedding_tokens(emb, MAXSIM_TOKENS).select(
        "vec_id", "token_vecs"
    )
    sub = 64 // MAXSIM_TOKENS
    queries = [
        (
            int(r["vec_id"]),
            [
                [float(x) for x in r["embedding"][t * sub : (t + 1) * sub]]
                for t in range(MAXSIM_TOKENS)
            ],
        )
        for r in emb.filter(F.col("vec_id") < 3).collect()
    ]
    return maxsim_topk(docs, queries, k_neighbors=10, id_col="vec_id")


def _maxsim_sql() -> str:
    sub = 64 // MAXSIM_TOKENS
    slices = [
        f"[{1 + t * sub}:{(t + 1) * sub}]" for t in range(MAXSIM_TOKENS)
    ]
    per_qtok = [
        "greatest("
        + ", ".join(
            f"list_dot_product(q.v{qs}, d.v{ds})" for ds in slices
        )
        + ")"
        for qs in slices
    ]
    score = "round(" + " + ".join(per_qtok) + ", 6)"
    return f"""
WITH d AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
), q AS (
  SELECT vec_id AS query_id, embedding::DOUBLE[] AS v FROM embeddings
  WHERE vec_id < 3
), s AS (
  SELECT q.query_id, d.vec_id, {score} AS maxsim
  FROM d CROSS JOIN q
)
SELECT query_id, vec_id, maxsim, CAST(rnk AS INT) AS rank FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY maxsim DESC, vec_id) AS rnk
  FROM s
) WHERE rnk <= 10
"""


SQL_MAXSIM_TOPK = _maxsim_sql()


def q_maxsim_inindex(spark, sf_dir):
    """The r9 in-index MaxSim two-stage, oracle-pinned END TO END
    (operators/multivec.py: write_maxsim_index + probe_maxsim_index):
    token matrices ride the IVF cells as an SQ8 payload next to the
    pooled vectors, so the rerank decodes from bytes the probe's own
    scan read -- no corpus fetch, zero extra Spark actions (the
    ivfpq refine='sq8' posture applied to multi-vector serving).

    With n_probe = n_cells and C >= corpus the shortlist is the whole
    corpus minus self-matches, so the output is exactly the top-10 by
    MaxSim over SQ8-RECONSTRUCTED doc tokens vs raw query tokens --
    deterministic arithmetic DuckDB re-derives in SQL (per-token
    affine codec: lo = min(t), step = (max-min)/255 or 1.0, byte =
    clip(round_half_away((x-lo)/step), 0, 255), decode = lo +
    step*byte; score = sum over query tokens of greatest-of-dots
    against the four decoded doc tokens). The whole pipeline --
    encode -> cell write -> manifest probe -> in-scan payload carry
    -> driver decode -> rerank -- must match row for row.
    Off-registry parity row. Output: query_id, vec_id, maxsim, rank."""
    import shutil
    import tempfile

    from xmidt_event_streams_spark.operators.multivec import (
        chunk_embedding_tokens,
        probe_maxsim_index,
        write_maxsim_index,
    )

    emb = _emb(spark, sf_dir)
    docs = chunk_embedding_tokens(emb, MAXSIM_TOKENS).select(
        "vec_id", "token_vecs"
    )
    sub = 64 // MAXSIM_TOKENS
    queries = [
        (
            int(r["vec_id"]),
            [
                [float(x) for x in r["embedding"][t * sub : (t + 1) * sub]]
                for t in range(MAXSIM_TOKENS)
            ],
        )
        for r in emb.filter(F.col("vec_id") < 3).collect()
    ]
    cents = deterministic_planes(4, sub, seed="maxsim-cells")
    tmp = tempfile.mkdtemp(prefix="xes-maxsim-row-") + "/ix"
    try:
        write_maxsim_index(docs, tmp, cents, id_col="vec_id")
        # the probe's result is a LOCAL relation (driver-merged), so
        # the index dir can be cleaned up before the caller collects
        return probe_maxsim_index(
            spark,
            tmp,
            queries,
            k_neighbors=10,
            n_probe=len(cents),
            prefilter_c=1_000_000_000,  # >= corpus: exact-recovery arm
        )
    finally:
        shutil.rmtree(tmp.rsplit("/", 1)[0], ignore_errors=True)


def _maxsim_inindex_sql() -> str:
    sub = 64 // MAXSIM_TOKENS
    ts = range(1, MAXSIM_TOKENS + 1)
    tok_cols = ", ".join(
        f"v[{1 + (t - 1) * sub}:{t * sub}] AS t{t}" for t in ts
    )
    bound_cols = ", ".join(
        f"list_min(t{t}) AS lo{t}, "
        f"CASE WHEN list_max(t{t}) > list_min(t{t}) "
        f"THEN (list_max(t{t}) - list_min(t{t})) / 255.0 ELSE 1.0 END "
        f"AS st{t}"
        for t in ts
    )
    dec_cols = ", ".join(
        f"list_transform(t{t}, x -> lo{t} + st{t} * "
        f"least(greatest(round((x - lo{t}) / st{t}), 0), 255)) AS d{t}"
        for t in ts
    )
    q_cols = ", ".join(
        f"v[{1 + (t - 1) * sub}:{t * sub}] AS q{t}" for t in ts
    )
    per_qtok = [
        "greatest("
        + ", ".join(f"list_dot_product(dec.d{dt}, q.q{qt})" for dt in ts)
        + ")"
        for qt in ts
    ]
    score = "round(" + " + ".join(per_qtok) + ", 6)"
    return f"""
WITH d AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
), toks AS (
  SELECT vec_id, {tok_cols} FROM d
), bounds AS (
  SELECT *, {bound_cols} FROM toks
), dec AS (
  SELECT vec_id, {dec_cols} FROM bounds
), q AS (
  SELECT vec_id AS query_id, {q_cols}
  FROM (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings WHERE vec_id < 3)
), s AS (
  SELECT q.query_id, dec.vec_id, {score} AS maxsim
  FROM dec CROSS JOIN q WHERE dec.vec_id <> q.query_id
)
SELECT query_id, vec_id, maxsim, CAST(rnk AS INT) AS rank FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY maxsim DESC, vec_id) AS rnk
  FROM s
) WHERE rnk <= 10
"""


SQL_MAXSIM_ININDEX = _maxsim_inindex_sql()


def q_maxsim_token(spark, sf_dir):
    """r10, the token-level serving arm end to end: token-ASSIGNED
    index (assign='token', each doc replicated into its tokens'
    capped cells -- the ColBERT/PLAID inverted-file shape) probed
    with retrieval='token' (per-query-token cell union, exact
    MaxSim over the SQ8 payload scored IN the scan, driver dedupe of
    replicas). At full probe width the output must be EXACTLY the
    top-k by MaxSim over SQ8-decoded tokens -- the same exact-
    recovery contract as q_maxsim_inindex, so the two arms share one
    DuckDB twin (SQL_MAXSIM_TOKEN = SQL_MAXSIM_ININDEX): one oracle
    pins assignment + replication + union probe + in-scan scoring +
    dedupe + rank against a full SQL re-derivation of the codec and
    the score. Off-registry parity row. Output: query_id, vec_id,
    maxsim, rank."""
    import shutil
    import tempfile

    from xmidt_event_streams_spark.operators.multivec import (
        chunk_embedding_tokens,
        probe_maxsim_index,
        write_maxsim_index,
    )

    emb = _emb(spark, sf_dir)
    docs = chunk_embedding_tokens(emb, MAXSIM_TOKENS).select(
        "vec_id", "token_vecs"
    )
    sub = 64 // MAXSIM_TOKENS
    queries = [
        (
            int(r["vec_id"]),
            [
                [float(x) for x in r["embedding"][t * sub : (t + 1) * sub]]
                for t in range(MAXSIM_TOKENS)
            ],
        )
        for r in emb.filter(F.col("vec_id") < 3).collect()
    ]
    cents = deterministic_planes(4, sub, seed="maxsim-cells")
    tmp = tempfile.mkdtemp(prefix="xes-maxsim-tok-") + "/ix"
    try:
        write_maxsim_index(
            docs, tmp, cents, id_col="vec_id", assign="token"
        )
        return probe_maxsim_index(
            spark,
            tmp,
            queries,
            k_neighbors=10,
            n_probe=len(cents),  # full width: exact-recovery arm
            retrieval="token",
        )
    finally:
        shutil.rmtree(tmp.rsplit("/", 1)[0], ignore_errors=True)


SQL_MAXSIM_TOKEN = SQL_MAXSIM_ININDEX

# ------------------------------------------------------ relational (TPC-H)


def _dec2(c: str) -> str:
    return f"CAST({c} AS DECIMAL(12,2))"


def _dec4(c: str) -> str:
    return f"CAST({c} AS DECIMAL(4,2))"


_ONE = "CAST(1 AS DECIMAL(4,2))"


def q_tpch_q1(spark, sf_dir):
    """Pricing summary: wide aggregation with exact money arithmetic
    in FIXED-POINT CENTS -- measured 1.35x faster than the
    straight-decimal formulation at sf0.1 (0.52 s vs 0.71 s agg time;
    scan floor 0.14 s) with bit-identical results against the decimal
    DuckDB oracle.

    Money values in this data are exact 2-decimal quantities (verified
    max |x*100 - round(x*100)| ~ 1e-10, pure representation error), so
    per-row products run on int64 cents (whole-stage-codegen long
    multiplies) instead of BigDecimal: disc = price_cents *
    (100 - disc_cents) at scale 1e4, charge = disc * (100 + tax_cents)
    at scale 1e6. Per-row longs cannot overflow (charge <= ~1e11).

    r10: the AGGREGATION BUFFERS are now pure int64 too -- the
    decimal(29,0) sums were the query's single biggest cost (measured
    0.86 -> 0.67 s at sf0.1; BigDecimal buffer updates vs codegen long
    adds). Overflow safety moves from decimal width to LIMB
    DECOMPOSITION: disc and charge are summed as (x div 1e6, x mod 1e6)
    long pairs and recombined exactly as decimal(38) on the k-row
    aggregate output (sum = 1e6 * sum_hi + sum_lo, exact integer
    identity -- bit-identical results, proven against the decimal
    formulation and the DuckDB oracle). Bounds: lo < 1e6 and
    hi <= 1e5 (charge <= ~1e11), so either limb sum wraps int64 only
    past ~9e12 rows PER GROUP ~ 1.3 PB of lineitem in one group --
    an order of magnitude past the 100 TB target (and the same bound
    class as sum_qty's existing long sum). _sp (price cents <= ~1e7)
    sums direct to long: wraps past ~9e11 max-price rows/group.
    The final rescale divides the exact sums by the scale factor and
    casts to double, which is the same nearest-double the oracle's
    decimal->double cast produces."""
    # SQL-text build (same expressions the Column composition
    # produced -- oracle-pinned; the composition cost ~0.25 s of py4j
    # round trips per query build, see minhash_signatures_df)
    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"]
    pc = "cast(round(l_extendedprice * 100) as bigint)"
    dc = "cast(round(l_discount * 100) as bigint)"
    tc = "cast(round(l_tax * 100) as bigint)"
    ql = "cast(round(l_quantity) as bigint)"  # quantities are integral
    disc_l = f"({pc} * (100 - {dc}))"  # scale 1e4
    charge_l = f"({disc_l} * (100 + {tc}))"  # scale 1e6
    limb = 1_000_000
    g = (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.expr(f"sum({ql}) as _sq"),
            F.expr(f"sum({pc}) as _sp"),
            F.expr(f"sum({disc_l} % {limb}) as _sd_lo"),
            F.expr(f"sum(cast({disc_l} / {limb} as bigint)) as _sd_hi"),
            F.expr(f"sum({charge_l} % {limb}) as _sc_lo"),
            F.expr(f"sum(cast({charge_l} / {limb} as bigint)) as _sc_hi"),
            F.expr(f"sum({dc}) as _sdc"),
            F.expr("count(*) as count_order"),
        )
    )
    dec38 = lambda c: f"cast({c} as decimal(38,0))"  # noqa: E731
    _sd = f"({dec38('_sd_hi')} * {limb} + {dec38('_sd_lo')})"
    _sc = f"({dec38('_sc_hi')} * {limb} + {dec38('_sc_lo')})"
    base_price = f"cast({dec38('_sp')} / 100 as double)"
    return g.selectExpr(
        "l_returnflag",
        "l_linestatus",
        "round(cast(_sq as double), 4) as sum_qty",
        f"round({base_price}, 4) as sum_base_price",
        f"round(cast({_sd} / 10000 as double), 4) as sum_disc_price",
        f"round(cast({_sc} / 1000000 as double), 4) as sum_charge",
        "round(cast(_sq as double) / count_order, 4) as avg_qty",
        f"round({base_price} / count_order, 4) as avg_price",
        "round(cast(cast(_sdc as decimal(27,0)) / 100 as double) "
        "/ count_order, 4) as avg_disc",
        "count_order",
    )


SQL_TPCH_Q1 = f"""
SELECT l_returnflag, l_linestatus,
  round(CAST(sum({_dec2('l_quantity')}) AS DOUBLE), 4) AS sum_qty,
  round(CAST(sum({_dec2('l_extendedprice')}) AS DOUBLE), 4) AS sum_base_price,
  round(CAST(sum({_dec2('l_extendedprice')} * ({_ONE} - {_dec4('l_discount')})) AS DOUBLE), 4) AS sum_disc_price,
  round(CAST(sum({_dec2('l_extendedprice')} * ({_ONE} - {_dec4('l_discount')}) * ({_ONE} + {_dec4('l_tax')})) AS DOUBLE), 4) AS sum_charge,
  round(CAST(sum({_dec2('l_quantity')}) AS DOUBLE) / count(*), 4) AS avg_qty,
  round(CAST(sum({_dec2('l_extendedprice')}) AS DOUBLE) / count(*), 4) AS avg_price,
  round(CAST(sum({_dec4('l_discount')}) AS DOUBLE) / count(*), 4) AS avg_disc,
  count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


def q_tpch_q3(spark, sf_dir):
    """Shipping-priority: 3-way join + agg + deterministic top-10."""
    t = load_tables(spark, sf_dir, ("customer", "orders", "lineitem"))
    rev = F.col("l_extendedprice").cast("decimal(12,2)") * (
        F.lit(1).cast("decimal(4,2)") - F.col("l_discount").cast("decimal(4,2)")
    )
    j = (
        t["customer"]
        .filter(F.col("c_mktsegment") == "BUILDING")
        .join(t["orders"], F.col("c_custkey") == F.col("o_custkey"))
        .filter(F.col("o_orderdate") < F.lit("1998-03-15"))
        .join(t["lineitem"], F.col("o_orderkey") == F.col("l_orderkey"))
        .filter(F.col("l_shipdate") > F.lit("1998-03-15"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.round(F.sum(rev).cast("double"), 4).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )
    return j


SQL_TPCH_Q3 = f"""
SELECT l_orderkey, o_orderdate, o_orderpriority,
  round(CAST(sum({_dec2('l_extendedprice')} * ({_ONE} - {_dec4('l_discount')})) AS DOUBLE), 4) AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
  AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


def q_tpch_q5ish(spark, sf_dir):
    """Local-supplier volume: 6-way star join, revenue per nation."""
    t = load_tables(
        spark, sf_dir, ("region", "nation", "customer", "supplier", "orders", "lineitem")
    )
    rev = F.col("l_extendedprice").cast("decimal(12,2)") * (
        F.lit(1).cast("decimal(4,2)") - F.col("l_discount").cast("decimal(4,2)")
    )
    j = (
        t["region"]
        .filter(F.col("r_name") == "ASIA")
        .join(t["nation"], F.col("n_regionkey") == F.col("r_regionkey"))
        .join(t["customer"], F.col("c_nationkey") == F.col("n_nationkey"))
        .join(t["orders"], F.col("o_custkey") == F.col("c_custkey"))
        .join(t["lineitem"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            t["supplier"],
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("s_nationkey") == F.col("c_nationkey")),
        )
        .groupBy("n_name")
        .agg(F.round(F.sum(rev).cast("double"), 4).alias("revenue"))
    )
    return j


SQL_TPCH_Q5ISH = f"""
SELECT n_name,
  round(CAST(sum({_dec2('l_extendedprice')} * ({_ONE} - {_dec4('l_discount')})) AS DOUBLE), 4) AS revenue
FROM region
JOIN nation ON n_regionkey = r_regionkey
JOIN customer ON c_nationkey = n_nationkey
JOIN orders ON o_custkey = c_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
WHERE r_name = 'ASIA'
GROUP BY n_name
"""


def q_events_windowed(spark, sf_dir):
    """Tumbling 1-hour event-time windows per event type."""
    ev = _ev(spark, sf_dir)
    return ev.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("window_start"),
        "event_type",
    ).agg(F.count("*").alias("n"))


SQL_EVENTS_WINDOWED = """
SELECT date_trunc('hour', ts) AS window_start, event_type, count(*) AS n
FROM events GROUP BY 1, 2
"""


def q_multimodal_meta(spark, sf_dir):
    """Multimodal plumbing: opaque binary payload + typed metadata
    (byte length, content hash). The decode stage is stubbed (see
    multimodal.py); the schema/partitioning path is real."""
    ev = _ev(spark, sf_dir)
    payload = F.encode(F.col("props"), "UTF-8")
    return ev.select(
        "event_id",
        F.octet_length(payload).cast("long").alias("payload_len"),
        F.md5(payload).alias("payload_md5"),
    )


def q_multimodal_features(spark, sf_dir):
    """Arrow-batched decode/feature-extract + resize over binary
    payloads (events props bytes standing in for media). The decode
    kernels are deterministic stubs (no codec libs in this container);
    BECAUSE they are deterministic byte arithmetic, every output
    column is SQL-expressible and the DuckDB twin replays them
    exactly (width/height from the byte-sum stub, feature_hash =
    md5(first 256 bytes), resized_len = the stub's truncation cap) --
    so this row gets a full value-hash check, while still pinning the
    mapInPandas schema, batch iteration, and poison-row containment
    on the Spark side."""
    from xmidt_event_streams_spark.multimodal import (
        extract_image_features,
        resize_images,
    )

    ev = _ev(spark, sf_dir)
    media = ev.select(
        F.col("event_id").cast("string").alias("media_id"),
        F.encode(F.col("props"), "UTF-8").alias("payload"),
    )
    # codec pinned to the stub: the DuckDB twin replays the stub's
    # byte arithmetic, which must not depend on executor codec libs
    feats = extract_image_features(media, codec="stub")
    resized = resize_images(media, 64, 64, codec="stub").select(
        "media_id", F.octet_length("resized").alias("resized_len")
    )
    return feats.join(resized, "media_id")


# DuckDB twin of the deterministic decode stubs (multimodal.py):
#   _decode_image_stub: h = sum(payload[:64]); width = 64 + h % 512,
#     height = 64 + (h // 7) % 512, channels = 3
#   extract_image_features: feature_hash = md5(payload[:256])
#   _resize_stub at 64x64: 16-byte md5 seed tiled to 64*64*3 then
#     truncated to 4096 -> resized_len is the constant cap 4096
# Empty/NULL payloads take the poison-row path -> all-NULL features.
# The twin works on VARCHAR (this DuckDB's md5 takes no BLOB): valid
# because props is pure ASCII in every generated table (verified
# max(octet_length - length) = 0), so char positions ARE byte offsets
# and ascii(c) IS the byte value. Non-ASCII payloads would mismatch
# loudly rather than silently pass.
SQL_MULTIMODAL_FEATURES = """
WITH s AS (
  SELECT CAST(event_id AS VARCHAR) AS media_id, props,
    coalesce(length(props), 0) AS blen,
    CASE WHEN coalesce(length(props), 0) > 0 THEN
      list_sum(list_transform(generate_series(1, least(64, length(props))),
                              i -> ascii(props[i])))
    ELSE NULL END AS hsum
  FROM events
)
SELECT media_id,
  CAST(CASE WHEN blen > 0 THEN 64 + hsum % 512 END AS INTEGER) AS width,
  CAST(CASE WHEN blen > 0 THEN 64 + (hsum // 7) % 512 END AS INTEGER) AS height,
  CAST(CASE WHEN blen > 0 THEN 3 END AS INTEGER) AS n_channels,
  CASE WHEN blen > 0 THEN md5(substr(props, 1, 256)) END AS feature_hash,
  CAST(CASE WHEN blen > 0 THEN 4096 END AS INTEGER) AS resized_len
FROM s
"""


SQL_MULTIMODAL_META = """
SELECT event_id, CAST(octet_length(props::BLOB) AS BIGINT) AS payload_len,
       md5(props) AS payload_md5
FROM events
"""

# ------------------------------------------- relational breadth + as-of


def q_partner_overlap(spark, sf_dir):
    """R6: partner-id set-intersection gate (arrays_overlap) -- the
    reference's vestigial `overlaps` helper (filter/filter.go:52-61)
    as a real predicate."""
    allowed = F.array(F.lit("partner-1"), F.lit("partner-3"))
    w = _wrp(spark, sf_dir)
    return w.filter(F.arrays_overlap("partner_ids", allowed)).select(
        "event_id",
        # joined (not raw array) so the oracle harness can sort/hash the
        # column: pandas canonicalization cannot factorize list cells.
        F.array_join("partner_ids", ",").alias("partner_ids"),
    )


SQL_PARTNER_OVERLAP = f"""
WITH {WRP_CTE}
SELECT event_id, array_to_string(partner_ids, ',') AS partner_ids FROM wrp
WHERE list_has_any(partner_ids, ['partner-1', 'partner-3'])
"""


def q_asof_last_click(spark, sf_dir):
    """As-of join: each purchase event joined to the user's most
    recent click at-or-before it (point-in-time correctness, the
    feature-store primitive). Both sides slice ONE relation, so this
    uses the single-scan specialization (one pass, one shuffle; the
    general two-relation asof_join stays for heterogeneous inputs --
    see operators/asof.py)."""
    from xmidt_event_streams_spark.operators.asof import (
        asof_last_value_single_relation,
    )

    ev = _ev(spark, sf_dir)
    return asof_last_value_single_relation(
        ev,
        key="user_id",
        ts_col="ts",
        left_pred=F.col("event_type") == "purchase",
        right_pred=F.col("event_type") == "click",
        value_col="event_id",
        out_value_col="click_id",
        left_cols=("event_id",),
    ).select("event_id", "user_id", "click_id")


SQL_ASOF_LAST_CLICK = """
WITH p AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
), c AS (
  SELECT user_id, ts, max(event_id) AS click_id
  FROM events WHERE event_type = 'click' GROUP BY 1, 2
)
SELECT p.event_id, p.user_id, c.click_id
FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts
"""


def q_events_pivot(spark, sf_dir):
    """Pivot: per-user event-type count matrix (fixed column set so
    the plan is a single pass of conditional aggregates)."""
    types = ["click", "view", "purchase", "signup", "error"]
    ev = _ev(spark, sf_dir)
    return (
        ev.groupBy("user_id")
        .pivot("event_type", types)
        .agg(F.count(F.lit(1)))
        .select(
            "user_id",
            *[F.coalesce(F.col(t), F.lit(0)).alias(f"n_{t}") for t in types],
        )
    )


SQL_EVENTS_PIVOT = """
SELECT user_id,
  count(*) FILTER (event_type = 'click') AS n_click,
  count(*) FILTER (event_type = 'view') AS n_view,
  count(*) FILTER (event_type = 'purchase') AS n_purchase,
  count(*) FILTER (event_type = 'signup') AS n_signup,
  count(*) FILTER (event_type = 'error') AS n_error
FROM events GROUP BY user_id
"""


def q_distinct_users_salted(spark, sf_dir):
    """Exact distinct via value-space salting (operators/skew.py):
    hash(user_id)%8 partitions the value domain, per-salt distincts
    are disjoint, SUM merges exactly. Same answer as the straight
    plan -- the shape that survives one event_type owning most of
    100 TB."""
    from xmidt_event_streams_spark.operators.skew import salted_count_distinct

    ev = _ev(spark, sf_dir)
    return salted_count_distinct(ev, ["event_type"], "user_id", 8, out_col="n_users")


SQL_DISTINCT_USERS_SALTED = """
SELECT event_type, count(DISTINCT user_id) AS n_users
FROM events GROUP BY event_type
"""


def q_top_users_per_type(spark, sf_dir):
    """Top-3 users by spend per event type: agg + ranked window, the
    canonical grouped top-k."""
    ev = _ev(spark, sf_dir)
    agg = ev.groupBy("event_type", "user_id").agg(
        F.round(
            F.sum(F.col("value").cast("decimal(12,2)")).cast("double"), 4
        ).alias("total_value")
    )
    from pyspark.sql import Window

    w = Window.partitionBy("event_type").orderBy(
        F.col("total_value").desc(), F.col("user_id")
    )
    return (
        agg.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= 3)
    )


SQL_TOP_USERS = """
SELECT event_type, user_id, total_value, CAST(rnk AS BIGINT) AS rank FROM (
  SELECT event_type, user_id,
    round(CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE), 4) AS total_value,
    row_number() OVER (
      PARTITION BY event_type
      ORDER BY round(CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE), 4) DESC, user_id
    ) AS rnk
  FROM events GROUP BY event_type, user_id
) WHERE rnk <= 3
"""


def q_clicked_not_purchased(spark, sf_dir):
    """Set difference: users who clicked but never purchased
    (EXCEPT == left-anti join; Spark plans the anti-join)."""
    ev = _ev(spark, sf_dir)
    clicked = ev.filter(F.col("event_type") == "click").select("user_id").distinct()
    purchased = ev.filter(F.col("event_type") == "purchase").select("user_id")
    return clicked.subtract(purchased)


SQL_CLICKED_NOT_PURCHASED = """
SELECT DISTINCT user_id FROM events WHERE event_type = 'click'
EXCEPT
SELECT user_id FROM events WHERE event_type = 'purchase'
"""


def q_doc_fingerprint_rolling(spark, sf_dir):
    """Rolling-hash (Karp-Rabin) document fingerprint -- the cheap
    numeric tier next to the md5 fingerprint."""
    from xmidt_event_streams_spark.functions.text import rolling_hash

    return _docs(spark, sf_dir).select(
        "doc_id", rolling_hash("text").alias("rhash")
    )


SQL_DOC_FINGERPRINT_ROLLING = f"""
WITH n AS (SELECT doc_id, {_NORM_SQL} AS t FROM documents)
SELECT doc_id,
  CASE WHEN length(t) > 0 THEN
    list_reduce(
      list_prepend(CAST(0 AS BIGINT),
        list_transform(generate_series(1, length(t)),
                       i -> CAST(ascii(t[i]) AS BIGINT))),
      (acc, c) -> (acc * 31 + c) % 1000000007)
  ELSE 0 END AS rhash
FROM n
"""


PHRASE_HITS_PHRASE = "table value"


def q_phrase_hits(spark, sf_dir):
    """Positional-inverted-index phrase search
    (operators/invindex.py): build the (term, doc, positions) index
    over documents, then find every doc containing the phrase as
    consecutive tokens -- overlap-counted match census with 0-based
    start positions. Probe filters to the phrase's terms (pushed
    predicate; bucket partition pruning on a materialized index,
    pinned in tests/test_invindex.py) and the adjacency check is a
    JVM higher-order intersection over per-doc position lists --
    corpus-size-independent work for rare phrases."""
    from xmidt_event_streams_spark.operators.invindex import (
        build_inverted_index,
        phrase_search,
    )

    ix = build_inverted_index(_docs(spark, sf_dir))
    return phrase_search(ix, PHRASE_HITS_PHRASE).select(
        "doc_id", "n_hits", "first_pos"
    )


SQL_PHRASE_HITS = f"""
WITH {{words_cte}},
h AS (
  SELECT doc_id, i FROM words,
    unnest(generate_series(1, len(w) - 1)) AS t(i)
  WHERE w[i] = 'table' AND w[i+1] = 'value'
)
SELECT doc_id, count(*)::BIGINT AS n_hits,
  CAST(min(i) - 1 AS BIGINT) AS first_pos
FROM h GROUP BY doc_id
""".format(words_cte=_WORDS_CTE)


# portable cosine for DuckDB twins (6dp rounding + zero-denominator
# guard match functions/vectors.py kernels)
_COS_SQL = (
    "round(CASE WHEN sqrt(list_dot_product({a}, {a})) * sqrt(list_dot_product({b}, {b})) > 0 "
    "THEN list_dot_product({a}, {b}) "
    "/ (sqrt(list_dot_product({a}, {a})) * sqrt(list_dot_product({b}, {b}))) "
    "ELSE 0 END, 6)"
)

NEARDUP_N_PROBE = 4
NEARDUP_THRESHOLD = 0.4
NEARDUP_KMEANS_ITERS = 5
NEARDUP_GRID_DP = 4
NEARDUP_DIM = 64


def neardup_k(n: int) -> int:
    """Auto-sized coarse cell count: k ~ sqrt(corpus size), the rule
    that keeps candidate volume sub-quadratic as the corpus grows
    (candidate fraction ~ n_probe^2 / k -> 16/sqrt(n), under 5% once
    n >= ~102k rows)."""
    import math

    return min(n, max(8, math.ceil(math.sqrt(n))))


def neardup_centroids(emb, fit_fraction: float | None = None) -> list[list[float]]:
    """Learned, auto-sized coarse centroids for the near-dup default:
    portable spherical k-means (operators.ivf.kmeans_fit_portable) at
    k = neardup_k(corpus size). Deterministic AND engine-replayable --
    the oracle twin replays the identical fit in SQL (grid-quantized
    sums; see kmeans_fit_portable's determinism contract).

    ``fit_fraction`` is the 100 TB path: the fit costs n_iters+1
    corpus passes, so fit on a deterministic md5-bucket sample (the
    same ingestion-stable draw as traindata.stratified_sample -- a
    pure row function any engine replays) while k stays sized by the
    FULL corpus count and assignment stays full-corpus. The registered
    sf0.01 query keeps the full fit (trivial at that scale; keeps the
    oracle simple)."""
    from xmidt_event_streams_spark.operators.ivf import kmeans_fit_portable

    n = emb.count()
    fit_df = emb
    if fit_fraction is not None:
        if not 0 < fit_fraction <= 1:
            raise ValueError(f"fit_fraction must be in (0, 1], got {fit_fraction}")
        bucket = (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit("neardup-fit|"), F.col("vec_id").cast("string"))),
                    1,
                    15,
                ),
                16,
                10,
            ).cast("bigint")
            % 10_000
        )
        fit_df = emb.filter(bucket < int(round(fit_fraction * 10_000)))
    return kmeans_fit_portable(
        fit_df, neardup_k(n), NEARDUP_KMEANS_ITERS, grid_dp=NEARDUP_GRID_DP
    )


def q_embedding_near_dup(spark, sf_dir, exact=False):
    """Embedding-cosine near-duplicate pairs (threshold 0.4; data has
    no planted dups so this is the high-similarity tail).

    Default plan: cluster-then-verify (SemDeDup shape,
    similarity.clustered_near_dup_pairs) with LEARNED, AUTO-SIZED
    coarse cells: portable spherical k-means centroids (k ~ sqrt(n),
    5 Lloyd rounds; ivf.kmeans_fit_portable), multi-probe cell
    assignment, equi-join on cell, exact cosine verify. Sub-quadratic
    with a scale rule, not constants: candidate fraction ~
    n_probe^2/k = 16/sqrt(n) (vanishes as the corpus grows). Measured
    at sf0.01 (near-isotropic synthetic embeddings -- the worst case
    for any clustering: tests/test_components.py asserts both
    numbers): recall 0.97 of the brute-force pair set (was 0.80 with
    the old 32 fixed md5 cells), candidates 55% of all pairs at
    n=500 -- small-n floor of the 16/sqrt(n) law, <=5% from ~102k
    rows. The oracle twin replays the full composition INCLUDING the
    k-means fit (grid-quantized arithmetic makes the fit bit-portable
    across engines), so the check is exact over the approximate
    operator.

    ``exact=True`` keeps the O(n^2) brute-force (bench/debug only).
    """
    emb = _emb(spark, sf_dir)
    from xmidt_event_streams_spark.functions.vectors import cosine_pairs
    from xmidt_event_streams_spark.operators.similarity import (
        clustered_near_dup_pairs,
    )

    if exact:
        a = emb.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("va"))
        b = emb.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("vb"))
        return (
            a.join(b, F.col("id_a") < F.col("id_b"))
            .select(
                "id_a", "id_b", F.round(cosine_pairs("va", "vb"), 6).alias("cos_sim")
            )
            .filter(F.col("cos_sim") >= NEARDUP_THRESHOLD)
        )
    return clustered_near_dup_pairs(
        emb,
        neardup_centroids(emb),
        threshold=NEARDUP_THRESHOLD,
        n_probe=NEARDUP_N_PROBE,
    )


def _neardup_sql() -> str:
    """DuckDB twin of q_embedding_near_dup, INCLUDING the k-means fit:
    NEARDUP_KMEANS_ITERS unrolled (assign -> summed-centroid) stages
    over 4dp-quantized vectors, then the multi-probe / candidate /
    exact-verify tail. Every arithmetic step matches
    kmeans_fit_portable's grid contract, so both engines derive
    bit-identical centroids and the comparison is exact."""
    cos_fit = _COS_SQL.format(a="c.qv", b="ct.cv")
    g = NEARDUP_GRID_DP
    parts = [
        f"""
WITH c AS (
  SELECT vec_id, embedding::DOUBLE[] AS v,
         list_transform(embedding::DOUBLE[], x -> round(x, {g})) AS qv
  FROM embeddings
), nn AS (
  SELECT CAST(greatest(8, ceil(sqrt(count(*)))) AS BIGINT) AS k FROM c
), cent0 AS (
  SELECT r.cell, r.qv AS cv
  FROM (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell, qv FROM c) r, nn
  WHERE r.cell < nn.k
)"""
    ]
    for i in range(1, NEARDUP_KMEANS_ITERS + 1):
        parts.append(
            f""", asg{i} AS (
  SELECT vec_id, cell FROM (
    SELECT c.vec_id, ct.cell,
      row_number() OVER (PARTITION BY c.vec_id ORDER BY {cos_fit} DESC, ct.cell) AS rn
    FROM c CROSS JOIN cent{i - 1} ct
  ) WHERE rn = 1
), sum{i} AS (
  SELECT a.cell, gs.pos, round(sum(c.qv[gs.pos]), {g}) AS s
  FROM asg{i} a JOIN c USING (vec_id), generate_series(1, {NEARDUP_DIM}) AS gs(pos)
  GROUP BY a.cell, gs.pos
), cent{i} AS (
  SELECT p.cell, coalesce(s.cv, p.cv) AS cv
  FROM cent{i - 1} p LEFT JOIN (
    SELECT cell, list(s ORDER BY pos) AS cv FROM sum{i} GROUP BY cell
  ) s USING (cell)
)"""
        )
    last = f"cent{NEARDUP_KMEANS_ITERS}"
    parts.append(
        f""", sims AS (
  SELECT c.vec_id, ct.cell, {_COS_SQL.format(a='c.v', b='ct.cv')} AS sim
  FROM c CROSS JOIN {last} ct
), assign AS (
  SELECT vec_id, cell FROM (
    SELECT vec_id, cell,
      row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, cell) AS rn
    FROM sims
  ) WHERE rn <= {NEARDUP_N_PROBE}
), cand AS (
  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
  FROM assign a JOIN assign b ON a.cell = b.cell AND a.vec_id < b.vec_id
)
SELECT cand.id_a, cand.id_b,
  {_COS_SQL.format(a='va.v', b='vb.v')} AS cos_sim
FROM cand
JOIN c va ON va.vec_id = cand.id_a
JOIN c vb ON vb.vec_id = cand.id_b
WHERE {_COS_SQL.format(a='va.v', b='vb.v')} >= {NEARDUP_THRESHOLD}
"""
    )
    return "".join(parts)


SQL_EMBEDDING_NEAR_DUP = _neardup_sql()


# ------------------------------------------- relational breadth, round 2


def q_tpch_q6(spark, sf_dir):
    """Forecast-revenue (TPC-H Q6 shape): tight filter + single sum.
    The pushdown showcase: all three predicates reach the parquet
    scan (PushedFilters), only 4 columns read."""
    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"]
    rev = F.col("l_extendedprice").cast("decimal(12,2)") * F.col("l_discount").cast(
        "decimal(4,2)"
    )
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01"))
            & (F.col("l_shipdate") < F.lit("1998-01-01"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(F.round(F.sum(rev).cast("double"), 4).alias("revenue"))
    )


SQL_TPCH_Q6 = f"""
SELECT round(CAST(sum({_dec2('l_extendedprice')} * {_dec4('l_discount')}) AS DOUBLE), 4) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


def q_tpch_q4_semi(spark, sf_dir):
    """Late-shipment orders (TPC-H Q4 shape): EXISTS == left-semi
    join with a non-equi conjunct (hash join on the equi key, range
    filter on top)."""
    t = load_tables(spark, sf_dir, ("orders", "lineitem"))
    late = (
        t["orders"]
        .filter(
            (F.col("o_orderdate") >= F.lit("1997-01-01"))
            & (F.col("o_orderdate") < F.lit("1997-04-01"))
        )
        .join(
            t["lineitem"],
            (F.col("o_orderkey") == F.col("l_orderkey"))
            & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")),
            "left_semi",
        )
    )
    return late.groupBy("o_orderpriority").agg(F.count("*").alias("order_count"))


SQL_TPCH_Q4_SEMI = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1997-04-01 00:00:00'
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate + INTERVAL 60 DAY
  )
GROUP BY o_orderpriority
"""


def q_substring_spans(spark, sf_dir):
    """Exact-substring duplication ledger (arXiv:2107.06499 shape):
    every 5-token sliding window recurring across documents, with its
    1-based token position -- the excision-grade alternative to
    whole-doc dedup. Plan: explode windows, one md5 per window,
    hash-agg on the uniform key, shuffle-hash self-join (see
    operators/dedup.py:repeated_window_spans for the scale notes)."""
    from xmidt_event_streams_spark.operators.dedup import (
        repeated_window_spans,
    )

    return repeated_window_spans(
        _docs(spark, sf_dir), window=5, cross_doc_only=True
    )


SQL_SUBSTRING_SPANS = f"""WITH {_WORDS_CTE},
wins AS (
  SELECT doc_id, i AS pos,
         md5(array_to_string(w[i:i+4], ' ')) AS whash
  FROM words, UNNEST(generate_series(1, greatest(len(w) - 4, 0))) AS t(i)
),
hot AS (
  SELECT whash, count(*) AS n_occurrences
  FROM wins GROUP BY whash
  HAVING count(DISTINCT doc_id) > 1
)
SELECT doc_id, pos, whash, n_occurrences
FROM wins JOIN hot USING (whash)
"""


def q_dup_span_removal(spark, sf_dir):
    """Exact-substring span EXCISION (arXiv:2107.06499 ExactSubstr):
    every duplicated 5-token window keeps its globally-first
    occurrence and is cut everywhere else; cut windows merge into
    maximal intervals and the covered tokens are removed. The
    consumer of the `substring_spans` ledger -- row count preserved,
    text shrinks. Plan: window hash-agg on uniform md5 keys, ONE
    keep-first window fn partitioned by whash (partition size =
    duplication multiplicity), per-doc gaps-and-islands merge,
    (doc_id, pos) equi anti-join for the cut (see
    operators/dedup.py:remove_duplicate_spans for the scale notes)."""
    from xmidt_event_streams_spark.operators.dedup import (
        remove_duplicate_spans,
    )

    return remove_duplicate_spans(_docs(spark, sf_dir), window=5)


SQL_DUP_SPAN_REMOVAL = f"""WITH {_WORDS_CTE},
wins AS (
  SELECT doc_id, i AS pos,
         md5(array_to_string(w[i:i+4], ' ')) AS whash
  FROM words, UNNEST(generate_series(1, greatest(len(w) - 4, 0))) AS t(i)
),
hot AS (
  SELECT whash FROM wins GROUP BY whash HAVING count(*) > 1
),
occ AS (
  SELECT doc_id, pos,
         row_number() OVER (PARTITION BY whash ORDER BY doc_id, pos) AS rn
  FROM wins JOIN hot USING (whash)
),
cut AS (SELECT doc_id, pos AS s, pos + 4 AS e FROM occ WHERE rn > 1),
isl AS (
  SELECT doc_id, s, e,
         CASE WHEN s > coalesce(max(e) OVER (
                PARTITION BY doc_id ORDER BY s
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
              ), -1) + 1
              THEN 1 ELSE 0 END AS ni
  FROM cut
),
isl2 AS (
  SELECT doc_id, s, e,
         sum(ni) OVER (PARTITION BY doc_id ORDER BY s
                       ROWS UNBOUNDED PRECEDING) AS iid
  FROM isl
),
merged AS (
  SELECT doc_id, min(s) AS s, max(e) AS e FROM isl2 GROUP BY doc_id, iid
),
cov AS (
  SELECT doc_id, UNNEST(generate_series(s, e)) AS pos FROM merged
),
toks AS (
  SELECT doc_id, i AS pos, w[i] AS tok
  FROM words, UNNEST(generate_series(1, len(w))) AS t(i)
),
kept AS (
  SELECT toks.doc_id, toks.pos, toks.tok
  FROM toks LEFT JOIN cov
    ON toks.doc_id = cov.doc_id AND toks.pos = cov.pos
  WHERE cov.doc_id IS NULL
),
agg AS (
  SELECT doc_id, count(*) AS n_kept,
         string_agg(tok, ' ' ORDER BY pos) AS clean_text
  FROM kept GROUP BY doc_id
),
nt AS (SELECT doc_id, len(w) AS n_tokens FROM words)
SELECT nt.doc_id, nt.n_tokens,
       nt.n_tokens - coalesce(agg.n_kept, 0) AS n_removed,
       coalesce(agg.clean_text, '') AS clean_text
FROM nt LEFT JOIN agg USING (doc_id)
"""


def q_corpus_diff(spark, sf_dir):
    """Release-to-release corpus diff (corpus.py:corpus_diff): two
    derived snapshots of the documents table (old = even ids, new =
    ids > 100 with doc 102's text rewritten) -> per-doc verdicts
    added|removed|changed|unchanged + token deltas. Presence is
    marker-based (null text still EXISTS); 'changed' is
    normalized-fingerprint-based. Plan: two narrow projections + ONE
    full-outer shuffle join on the id."""
    from xmidt_event_streams_spark.corpus import corpus_diff

    docs = _docs(spark, sf_dir)
    old = docs.filter(F.col("doc_id") % 2 == 0).select("doc_id", "text")
    new = (
        docs.filter(F.col("doc_id") > 100)
        .withColumn(
            "text",
            F.when(
                F.col("doc_id") == 102, F.lit("totally new text")
            ).otherwise(F.col("text")),
        )
        .select("doc_id", "text")
    )
    return corpus_diff(old, new)


def q_snapshot_timetravel(spark, sf_dir):
    """Snapshot-isolated keyed table driven end to end
    (operators/snapshots.py): CREATE v1 from the documents slice
    (doc_id <= 200), MERGE one commit of tombstones (ids % 7 == 0),
    rewrites (surviving ids % 10 == 0 -> 'rewritten <id>') and
    inserts (200 < id <= 220), then DIFF the head against the v1
    TIME-TRAVEL read -> (doc_id, status in tombstoned | rewritten |
    inserted | stable). The oracle mirrors the derivation rules over
    the raw table, so the row set checks snapshot_create +
    snapshot_merge + both snapshot_read arms at once. Plan: the
    manifest pins exact file lists (no partition discovery); the diff
    is one full-outer shuffle join on the key, same as corpus_diff.
    The table lives at a DETERMINISTIC per-(session, sf) temp path,
    rebuilt per call — repeated invocations (bench warm passes,
    parity sweeps) reuse one directory instead of leaking a fresh
    snapshot table into /tmp each time."""
    import hashlib
    import tempfile

    from xmidt_event_streams_spark.fsutil import delete_path
    from xmidt_event_streams_spark.operators.snapshots import (
        snapshot_create,
        snapshot_merge,
        snapshot_read,
    )

    docs = _docs(spark, sf_dir).select("doc_id", "text")
    base = docs.filter(F.col("doc_id") <= 200)
    tag = hashlib.md5(
        f"{sf_dir}|{spark.sparkContext.applicationId}".encode()
    ).hexdigest()[:12]
    path = f"{tempfile.gettempdir()}/xes-snaptt-{tag}/table"
    delete_path(spark, path)
    snapshot_create(base, path, "doc_id")
    tomb = base.filter(F.col("doc_id") % 7 == 0).withColumn(
        "_deleted", F.lit(True)
    )
    rewrite = (
        base.filter((F.col("doc_id") % 7 != 0) & (F.col("doc_id") % 10 == 0))
        .withColumn(
            "text", F.concat(F.lit("rewritten "), F.col("doc_id").cast("string"))
        )
        .withColumn("_deleted", F.lit(False))
    )
    inserts = docs.filter(
        (F.col("doc_id") > 200) & (F.col("doc_id") <= 220)
    ).withColumn("_deleted", F.lit(False))
    snapshot_merge(
        spark, path, tomb.unionByName(rewrite).unionByName(inserts)
    )
    v1 = snapshot_read(spark, path, version=1).select(
        "doc_id", F.col("text").alias("_t1")
    )
    head = snapshot_read(spark, path).select(
        "doc_id", F.col("text").alias("_t2")
    )
    present = F.lit(True)
    v1m = v1.withColumn("_p1", present)
    headm = head.withColumn("_p2", present)
    return (
        v1m.join(headm, "doc_id", "full_outer")
        .select(
            "doc_id",
            F.when(F.col("_p2").isNull(), "tombstoned")
            .when(F.col("_p1").isNull(), "inserted")
            .when(~F.col("_t1").eqNullSafe(F.col("_t2")), "rewritten")
            .otherwise("stable")
            .alias("status"),
        )
    )


def q_snapshot_cdc(spark, sf_dir):
    """Manifest-bounded change-data-feed (operators/snapshots.py
    ``snapshot_changes``): the SAME commit recipe as
    q_snapshot_timetravel (CREATE v1 from doc_id <= 200, then ONE
    merge of tombstones (ids % 7 == 0), rewrites (surviving ids % 10
    == 0) and inserts (200 < id <= 220)), read back as the v1 -> v2
    change feed -> (doc_id, text, _change in insert | update |
    delete); delete rows carry the BEFORE image, insert/update the
    AFTER image. CDC's suppression contract is what the oracle pins:
    stable rows compacted into the rewritten buckets are MOVEMENT,
    not change, and must not appear. Plan: only CHANGED buckets'
    files are read on either side (manifest-bounded -- cost tracks
    the merge's touch set, not the table) + one full-outer shuffle
    join on the key across the two file sets. Deterministic
    per-(session, sf) temp path, rebuilt per call, like the
    timetravel twin."""
    import hashlib
    import tempfile

    from xmidt_event_streams_spark.fsutil import delete_path
    from xmidt_event_streams_spark.operators.snapshots import (
        snapshot_changes,
        snapshot_create,
        snapshot_merge,
    )

    docs = _docs(spark, sf_dir).select("doc_id", "text")
    base = docs.filter(F.col("doc_id") <= 200)
    tag = hashlib.md5(
        f"{sf_dir}|{spark.sparkContext.applicationId}".encode()
    ).hexdigest()[:12]
    path = f"{tempfile.gettempdir()}/xes-snapcdc-{tag}/table"
    delete_path(spark, path)
    snapshot_create(base, path, "doc_id")
    tomb = base.filter(F.col("doc_id") % 7 == 0).withColumn(
        "_deleted", F.lit(True)
    )
    rewrite = (
        base.filter((F.col("doc_id") % 7 != 0) & (F.col("doc_id") % 10 == 0))
        .withColumn(
            "text", F.concat(F.lit("rewritten "), F.col("doc_id").cast("string"))
        )
        .withColumn("_deleted", F.lit(False))
    )
    inserts = docs.filter(
        (F.col("doc_id") > 200) & (F.col("doc_id") <= 220)
    ).withColumn("_deleted", F.lit(False))
    snapshot_merge(
        spark, path, tomb.unionByName(rewrite).unionByName(inserts)
    )
    return snapshot_changes(spark, path, 1, 2)


SQL_SNAPSHOT_CDC = """WITH base AS (
  SELECT doc_id, text FROM documents WHERE doc_id <= 200
)
SELECT doc_id, text, 'delete' AS _change
FROM base WHERE doc_id % 7 = 0
UNION ALL
SELECT doc_id, 'rewritten ' || CAST(doc_id AS VARCHAR) AS text,
       'update' AS _change
FROM base WHERE doc_id % 7 <> 0 AND doc_id % 10 = 0
UNION ALL
SELECT doc_id, text, 'insert' AS _change
FROM documents WHERE doc_id > 200 AND doc_id <= 220
"""


SQL_SNAPSHOT_TIMETRAVEL = """WITH base AS (
  SELECT doc_id, text FROM documents WHERE doc_id <= 200
), head AS (
  SELECT doc_id,
         CASE WHEN doc_id % 10 = 0
              THEN 'rewritten ' || CAST(doc_id AS VARCHAR)
              ELSE text END AS text
  FROM base WHERE doc_id % 7 <> 0
  UNION ALL
  SELECT doc_id, text FROM documents WHERE doc_id > 200 AND doc_id <= 220
)
SELECT coalesce(b.doc_id, h.doc_id) AS doc_id,
       CASE WHEN h.doc_id IS NULL THEN 'tombstoned'
            WHEN b.doc_id IS NULL THEN 'inserted'
            WHEN b.text IS NOT DISTINCT FROM h.text THEN 'stable'
            ELSE 'rewritten' END AS status
FROM base b FULL OUTER JOIN head h ON b.doc_id = h.doc_id
"""


SQL_CORPUS_DIFF = f"""WITH o AS (
  SELECT doc_id, md5({_NORM_SQL}) AS fp,
         len(list_filter(string_split({_NORM_SQL}, ' '), t -> t <> ''))
           AS tokens_before
  FROM documents WHERE doc_id % 2 = 0
), nn AS (
  SELECT doc_id,
         CASE WHEN doc_id = 102 THEN 'totally new text' ELSE text END AS text
  FROM documents WHERE doc_id > 100
), n AS (
  SELECT doc_id, md5({_NORM_SQL}) AS fp,
         len(list_filter(string_split({_NORM_SQL}, ' '), t -> t <> ''))
           AS tokens_after
  FROM nn
)
SELECT coalesce(o.doc_id, n.doc_id) AS doc_id,
       CASE WHEN o.doc_id IS NULL THEN 'added'
            WHEN n.doc_id IS NULL THEN 'removed'
            WHEN o.fp IS NOT DISTINCT FROM n.fp THEN 'unchanged'
            ELSE 'changed' END AS status,
       o.tokens_before, n.tokens_after
FROM o FULL OUTER JOIN n ON o.doc_id = n.doc_id
"""


def q_ngram_scrub(spark, sf_dir):
    """Benchmark n-gram scrub (GPT-3 appendix-C shape,
    arXiv:2005.14165 §4): every 5-token window of the corpus (sources
    other than src0) whose content appears anywhere in the benchmark
    set (source src0) is cut; spans merge and the covered tokens are
    excised -- span-level decontamination instead of whole-doc drops.
    Plan: benchmark reduces to its distinct window hashes and
    BROADCASTS (eval sets are small by nature), so the corpus never
    shuffles for the match (see
    operators/dedup.py:remove_contaminated_spans)."""
    from xmidt_event_streams_spark.operators.dedup import (
        remove_contaminated_spans,
    )

    docs = _docs(spark, sf_dir)
    return remove_contaminated_spans(
        docs.filter(F.col("source") != "src0"),
        docs.filter(F.col("source") == "src0"),
        window=5,
    )


SQL_NGRAM_SCRUB = f"""WITH {_WORDS_CTE},
cw AS (SELECT doc_id, w FROM words WHERE source <> 'src0'),
bw AS (
  SELECT DISTINCT md5(array_to_string(w[i:i+4], ' ')) AS whash
  FROM words, UNNEST(generate_series(1, greatest(len(w) - 4, 0))) AS t(i)
  WHERE source = 'src0'
),
wins AS (
  SELECT doc_id, i AS pos,
         md5(array_to_string(w[i:i+4], ' ')) AS whash
  FROM cw, UNNEST(generate_series(1, greatest(len(w) - 4, 0))) AS t(i)
),
cut AS (
  SELECT doc_id, pos AS s, pos + 4 AS e
  FROM wins JOIN bw USING (whash)
),
isl AS (
  SELECT doc_id, s, e,
         CASE WHEN s > coalesce(max(e) OVER (
                PARTITION BY doc_id ORDER BY s
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
              ), -1) + 1
              THEN 1 ELSE 0 END AS ni
  FROM cut
),
isl2 AS (
  SELECT doc_id, s, e,
         sum(ni) OVER (PARTITION BY doc_id ORDER BY s
                       ROWS UNBOUNDED PRECEDING) AS iid
  FROM isl
),
merged AS (
  SELECT doc_id, min(s) AS s, max(e) AS e FROM isl2 GROUP BY doc_id, iid
),
cov AS (
  SELECT doc_id, UNNEST(generate_series(s, e)) AS pos FROM merged
),
toks AS (
  SELECT doc_id, i AS pos, w[i] AS tok
  FROM cw, UNNEST(generate_series(1, len(w))) AS t(i)
),
kept AS (
  SELECT toks.doc_id, toks.pos, toks.tok
  FROM toks LEFT JOIN cov
    ON toks.doc_id = cov.doc_id AND toks.pos = cov.pos
  WHERE cov.doc_id IS NULL
),
agg AS (
  SELECT doc_id, count(*) AS n_kept,
         string_agg(tok, ' ' ORDER BY pos) AS clean_text
  FROM kept GROUP BY doc_id
),
nt AS (SELECT doc_id, len(w) AS n_tokens FROM cw)
SELECT nt.doc_id, nt.n_tokens,
       nt.n_tokens - coalesce(agg.n_kept, 0) AS n_removed,
       coalesce(agg.clean_text, '') AS clean_text
FROM nt LEFT JOIN agg USING (doc_id)
"""


def q_tpch_q10ish(spark, sf_dir):
    """Returned-item revenue per customer (TPC-H Q10 shape): 3-way
    join, agg, deterministic top-20."""
    t = load_tables(spark, sf_dir, ("customer", "orders", "lineitem"))
    rev = F.col("l_extendedprice").cast("decimal(12,2)") * (
        F.lit(1).cast("decimal(4,2)") - F.col("l_discount").cast("decimal(4,2)")
    )
    return (
        t["customer"]
        .join(t["orders"], F.col("c_custkey") == F.col("o_custkey"))
        .filter(
            (F.col("o_orderdate") >= F.lit("1997-01-01"))
            & (F.col("o_orderdate") < F.lit("1997-04-01"))
        )
        .join(t["lineitem"], F.col("o_orderkey") == F.col("l_orderkey"))
        .filter(F.col("l_returnflag") == "R")
        .groupBy("c_custkey", "c_name")
        .agg(F.round(F.sum(rev).cast("double"), 4).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


SQL_TPCH_Q10ISH = f"""
SELECT c_custkey, c_name,
  round(CAST(sum({_dec2('l_extendedprice')} * ({_ONE} - {_dec4('l_discount')})) AS DOUBLE), 4) AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1997-04-01 00:00:00'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


def q_tpch_q14ish(spark, sf_dir):
    """Promo-revenue share (TPC-H Q14 shape): join + conditional
    aggregate -> one row."""
    t = load_tables(spark, sf_dir, ("lineitem", "part"))
    rev = F.col("l_extendedprice").cast("decimal(12,2)") * (
        F.lit(1).cast("decimal(4,2)") - F.col("l_discount").cast("decimal(4,2)")
    )
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(
        F.lit(0).cast("decimal(12,2)")
    )
    j = (
        t["lineitem"]
        .filter(
            (F.col("l_shipdate") >= F.lit("1997-09-01"))
            & (F.col("l_shipdate") < F.lit("1997-10-01"))
        )
        .join(t["part"], F.col("l_partkey") == F.col("p_partkey"))
    )
    return j.agg(
        F.round(
            F.lit(100.0)
            * F.sum(promo).cast("double")
            / F.sum(rev).cast("double"),
            6,
        ).alias("promo_revenue_pct")
    )


SQL_TPCH_Q14ISH = f"""
SELECT round(
  100.0 * CAST(sum(CASE WHEN p_type = 'PROMO'
    THEN {_dec2('l_extendedprice')} * ({_ONE} - {_dec4('l_discount')})
    ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE)
  / CAST(sum({_dec2('l_extendedprice')} * ({_ONE} - {_dec4('l_discount')})) AS DOUBLE),
  6) AS promo_revenue_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-09-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-10-01 00:00:00'
"""


def q_tpch_q12ish(spark, sf_dir):
    """Shipping-priority classes (TPC-H Q12 shape, adapted: this
    lineitem has no shipmode/receiptdate, so classify by order
    priority over a shipdate year): join + conditional counts.
    Conditional agg stays map-side partial; the join broadcasts
    orders' 2 needed columns at this SF (AQE re-plans at scale)."""
    t = load_tables(spark, sf_dir, ("lineitem", "orders"))
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    j = (
        t["lineitem"]
        .filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01"))
            & (F.col("l_shipdate") < F.lit("1998-01-01"))
        )
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
    )
    return j.groupBy("l_returnflag").agg(
        F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
        F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
    )


SQL_TPCH_Q12ISH = """
SELECT l_returnflag,
  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
  CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
GROUP BY l_returnflag
"""


def q_tpch_q7ish(spark, sf_dir):
    """Volume shipping (TPC-H Q7 shape): revenue between two nation
    pairs by ship year -- the 6-relation join exercise (lineitem ⋈
    supplier ⋈ orders ⋈ customer ⋈ nation×2 with a symmetric
    nation-pair predicate).

    Plan shape at scale: lineitem (the fact) never shuffles for the
    joins -- supplier/orders/customer project to 2 columns each and
    broadcast (orders is the largest; AQE re-plans to shuffle join if
    it outgrows the threshold, keying on o_orderkey = the fact's
    sort order); the two nation sides are a 25-row broadcast each.
    One hash-agg shuffle on (supp_nation, cust_nation, year)."""
    t = load_tables(
        spark, sf_dir, ("lineitem", "supplier", "orders", "customer", "nation")
    )
    n1 = t["nation"].select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = t["nation"].select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
        | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    )
    rev = F.col("l_extendedprice").cast("decimal(12,2)") * (
        F.lit(1).cast("decimal(4,2)") - F.col("l_discount").cast("decimal(4,2)")
    )
    j = (
        t["lineitem"]
        .filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01"))
            & (F.col("l_shipdate") < F.lit("1998-01-01"))
        )
        .join(
            F.broadcast(t["supplier"].select("s_suppkey", "s_nationkey")),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .join(
            F.broadcast(t["orders"].select("o_orderkey", "o_custkey")),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(
            F.broadcast(t["customer"].select("c_custkey", "c_nationkey")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
        .filter(pair)
    )
    return (
        j.groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
        )
        .agg(F.round(F.sum(rev).cast("double"), 4).alias("revenue"))
    )


SQL_TPCH_Q7ISH = f"""
SELECT supp_nation, cust_nation, l_year,
  round(CAST(sum({_dec2('l_extendedprice')} * ({_ONE} - {_dec4('l_discount')})) AS DOUBLE), 4) AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         CAST(year(l_shipdate) AS INT) AS l_year,
         l_extendedprice, l_discount
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
    AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
      OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
) GROUP BY supp_nation, cust_nation, l_year
"""


def q_tpch_q19ish(spark, sf_dir):
    """Discounted revenue under OR-of-ANDs (TPC-H Q19 shape, adapted
    to available columns: brand/size/quantity bands). Exercises
    disjunctive predicate handling: the part-side conjuncts can't
    individually push to the scan, but the common join key does, and
    codegen short-circuits the disjunction per row."""
    t = load_tables(spark, sf_dir, ("lineitem", "part"))
    rev = F.col("l_extendedprice").cast("decimal(12,2)") * (
        F.lit(1).cast("decimal(4,2)") - F.col("l_discount").cast("decimal(4,2)")
    )
    band = (
        (F.col("p_brand") == "Brand#1")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(1, 20)
    ) | (
        (F.col("p_brand") == "Brand#2")
        & F.col("p_size").between(10, 30)
        & F.col("l_quantity").between(10, 40)
    ) | (
        (F.col("p_brand") == "Brand#3")
        & F.col("p_size").between(20, 50)
        & F.col("l_quantity").between(20, 50)
    )
    j = t["lineitem"].join(t["part"], F.col("l_partkey") == F.col("p_partkey"))
    return j.filter(band).agg(
        F.round(F.sum(rev).cast("double"), 4).alias("revenue")
    )


SQL_TPCH_Q19ISH = f"""
SELECT round(CAST(sum({_dec2('l_extendedprice')} * ({_ONE} - {_dec4('l_discount')})) AS DOUBLE), 4) AS revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 20)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30 AND l_quantity BETWEEN 10 AND 40)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50 AND l_quantity BETWEEN 20 AND 50)
"""


def q_tpch_q18ish(spark, sf_dir):
    """Large-volume orders (TPC-H Q18 shape): agg-HAVING subquery
    joined back to orders+customer, deterministic top-20."""
    t = load_tables(spark, sf_dir, ("customer", "orders", "lineitem"))
    big = (
        t["lineitem"]
        .groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(12,2)")).alias("_sq"))
        .filter(F.col("_sq") > 250)
        .select(
            F.col("l_orderkey"), F.round(F.col("_sq").cast("double"), 4).alias("sum_qty")
        )
    )
    return (
        big.join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .select("c_name", "o_orderkey", "o_orderdate", "sum_qty")
        .orderBy(F.col("sum_qty").desc(), F.col("o_orderkey"))
        .limit(20)
    )


SQL_TPCH_Q18ISH = f"""
SELECT c_name, o_orderkey, o_orderdate, sum_qty FROM (
  SELECT l_orderkey, round(CAST(sum({_dec2('l_quantity')}) AS DOUBLE), 4) AS sum_qty
  FROM lineitem GROUP BY l_orderkey
  HAVING sum({_dec2('l_quantity')}) > 250
) big
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY sum_qty DESC, o_orderkey
LIMIT 20
"""


def q_range_join_clicks(spark, sf_dir):
    """Interval join: clicks in the hour strictly before each
    purchase, per user (binned-bucket rewrite -> equi-join; see
    operators/rangejoin.py)."""
    from xmidt_event_streams_spark.operators.rangejoin import range_join

    ev = _ev(spark, sf_dir)
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("event_id").alias("click_id")
    )
    joined = range_join(
        purchases, clicks, key="user_id", window_seconds=3600, strict_before=True
    )
    return joined.groupBy("event_id").agg(F.count("*").alias("n_clicks"))


SQL_RANGE_JOIN_CLICKS = """
SELECT p.event_id, count(*) AS n_clicks
FROM events p
JOIN events c ON c.user_id = p.user_id
  AND c.event_type = 'click'
  AND c.ts >= p.ts - INTERVAL 1 HOUR
  AND c.ts < p.ts
WHERE p.event_type = 'purchase'
GROUP BY p.event_id
"""


def q_session_gaps(spark, sf_dir):
    """LAG window: per-user mean inter-event gap. Integer-µs sums
    keep the aggregate exact across engines; one division at the end."""
    from pyspark.sql import Window

    ev = _ev(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    g = ev.select("user_id", gap.alias("gap_us"))
    return g.groupBy("user_id").agg(
        F.round(
            (F.sum("gap_us").cast("double") / F.count("gap_us")) / 1e6, 6
        ).alias("avg_gap_s"),
        F.count("gap_us").alias("n_gaps"),
    )


SQL_SESSION_GAPS = """
WITH g AS (
  SELECT user_id,
    epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) AS gap_us
  FROM events
)
SELECT user_id,
  round((CAST(sum(gap_us) AS DOUBLE) / count(gap_us)) / 1e6, 6) AS avg_gap_s,
  count(gap_us) AS n_gaps
FROM g GROUP BY user_id
"""


def q_running_user_value(spark, sf_dir):
    """Cumulative window sum: per-user running spend in event order.
    Partitioned by user -> embarrassingly parallel (no global sort)."""
    from pyspark.sql import Window

    ev = _ev(spark, sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.round(
            F.sum(F.col("value").cast("decimal(12,2)")).over(w).cast("double"), 4
        ).alias("running_value"),
    )


SQL_RUNNING_USER_VALUE = """
SELECT event_id, user_id,
  round(CAST(sum(CAST(value AS DECIMAL(12,2))) OVER (
    PARTITION BY user_id ORDER BY ts, event_id
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE), 4) AS running_value
FROM events
"""


def q_value_percentiles(spark, sf_dir):
    """Exact interpolated percentiles (median/p90/p99) per event type
    -- Spark `percentile` == ANSI percentile_cont == DuckDB
    quantile_cont. At 100 TB swap for approx_percentile and relax the
    oracle to tolerance."""
    ev = _ev(spark, sf_dir)
    return ev.groupBy("event_type").agg(
        F.round(F.percentile("value", F.lit(0.5)), 6).alias("p50"),
        F.round(F.percentile("value", F.lit(0.9)), 6).alias("p90"),
        F.round(F.percentile("value", F.lit(0.99)), 6).alias("p99"),
    )


SQL_VALUE_PERCENTILES = """
SELECT event_type,
  round(quantile_cont(value, 0.5), 6) AS p50,
  round(quantile_cont(value, 0.9), 6) AS p90,
  round(quantile_cont(value, 0.99), 6) AS p99
FROM events GROUP BY event_type
"""


def q_events_cube(spark, sf_dir):
    """CUBE (month, event_type): all 4 grouping-set combinations in
    one pass (partial-agg friendly; NULL = subtotal rows). CUBE's
    grouping sets are a strict superset of ROLLUP's for these keys,
    so this one query evidences both hierarchical (rollup) and full
    cross-product subtotals; value sums exact via decimal."""
    ev = _ev(spark, sf_dir)
    month = F.date_trunc("month", F.col("ts")).alias("month")
    return ev.cube(month, "event_type").agg(
        F.count("*").alias("n"),
        F.round(F.sum(F.col("value").cast("decimal(12,2)")).cast("double"), 4).alias(
            "sum_value"
        ),
    )


SQL_EVENTS_CUBE = """
SELECT CAST(date_trunc('month', ts) AS TIMESTAMP) AS month, event_type, count(*) AS n,
  round(CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE), 4) AS sum_value
FROM events GROUP BY CUBE (month, event_type)
"""


def q_approx_distinct_users(spark, sf_dir):
    """HyperLogLog++ approximate distinct users per event type. The
    sketch estimate is engine-specific, so the oracle checks the
    *error bound* instead of the raw value: the query emits whether
    the HLL estimate (rsd=0.02) lands within 5% of the exact count --
    deterministic for a given dataset -- and the DuckDB twin emits
    the literal TRUE per group."""
    ev = _ev(spark, sf_dir)
    agg = ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", 0.02).alias("approx_users"),
        F.countDistinct("user_id").alias("exact_users"),
    )
    return agg.select(
        "event_type",
        (
            F.abs(F.col("approx_users") - F.col("exact_users"))
            <= F.col("exact_users") * F.lit(0.05)
        ).alias("within_5pct"),
    )


SQL_APPROX_DISTINCT_USERS = """
SELECT event_type, TRUE AS within_5pct FROM events GROUP BY event_type
"""


IVF_N_CELLS = 8
IVF_N_PROBE = 2
IVF_TOPK = 5


def _ivf_centroids() -> list[list[float]]:
    """Deterministic coarse centroids (seeded hyperplane generator,
    distinct seed from the LSH planes). Cosine assignment is
    scale-invariant so the vectors need not be normalized. Constants,
    not data-derived: building the query plan runs NO Spark job (the
    learned-centroid variant is ivf_ann_kmeans / operators/ivf
    kmeans_fit, exercised in pytest)."""
    return deterministic_planes(IVF_N_CELLS, 64, seed="ivf-centroids")


def q_ivf_ann(spark, sf_dir):
    """IVF ANN: deterministic coarse centroids, narrow cell
    assignment, queries (vec_id < 3) probe their 2 nearest cells,
    top-5 within probed cells. See operators/ivf.py."""
    from xmidt_event_streams_spark.operators.ivf import ivf_topk

    emb = _emb(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") < 3)
    return ivf_topk(emb, queries, _ivf_centroids(), k=IVF_TOPK, n_probe=IVF_N_PROBE)


def q_ivf_ann_kmeans(spark, sf_dir):
    """IVF ANN with LEARNED coarse centroids: distributed spherical
    k-means (operators/ivf.kmeans_fit -- corpus never leaves the
    executors; driver holds k x dim floats), then the same probed
    search as ivf_ann. Rows-only: the iterative fit is not
    SQL-expressible (oracle-checked twin with fixed centroids:
    ivf_ann)."""
    from xmidt_event_streams_spark.operators.ivf import ivf_topk, kmeans_fit

    emb = _emb(spark, sf_dir)
    centroids = kmeans_fit(emb, k=IVF_N_CELLS, n_iters=3)
    queries = emb.filter(F.col("vec_id") < 3)
    return ivf_topk(emb, queries, centroids, k=IVF_TOPK, n_probe=IVF_N_PROBE)


_IVF_CENT_VALUES = ", ".join(
    "(" + str(i) + ", [" + ", ".join(repr(x) for x in c) + "]::DOUBLE[])"
    for i, c in enumerate(_ivf_centroids())
)

SQL_IVF_ANN = f"""
WITH cent AS (
  SELECT * FROM (VALUES {_IVF_CENT_VALUES}) AS t(cell, cv)
), c AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
), sims AS (
  SELECT c.vec_id, cent.cell, {_COS_SQL.format(a='c.v', b='cent.cv')} AS sim
  FROM c CROSS JOIN cent
), assign AS (
  SELECT vec_id, cell FROM (
    SELECT vec_id, cell,
      row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, cell) AS rn
    FROM sims
  ) WHERE rn = 1
), qprobe AS (
  SELECT vec_id AS query_id, cell FROM (
    SELECT vec_id, cell,
      row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, cell) AS rn
    FROM sims WHERE vec_id < 3
  ) WHERE rn <= {IVF_N_PROBE}
), scored AS (
  SELECT q.query_id, a.vec_id, {_COS_SQL.format(a='cv2.v', b='qv.v')} AS cos_sim
  FROM qprobe q
  JOIN assign a ON a.cell = q.cell AND a.vec_id <> q.query_id
  JOIN c cv2 ON cv2.vec_id = a.vec_id
  JOIN c qv ON qv.vec_id = q.query_id
)
SELECT query_id, vec_id, cos_sim, CAST(rnk AS BIGINT) AS rank FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, vec_id) AS rnk
  FROM scored
) WHERE rnk <= {IVF_TOPK}
"""


# ------------------------------------------ PQ refine (exact rerank)


def _pq_codebooks() -> list[list[list[float]]]:
    """Deterministic (m=8, k=8, dsub=8) PQ codebooks from the seeded
    hyperplane generator -- constants, so building the query plan
    runs no Spark job (the LEARNED codebooks are pq_fit, exercised in
    tests/test_pq.py and the bench ann sidecar)."""
    flat = deterministic_planes(64, 8, seed="pq-codebooks")
    return [[flat[i * 8 + j] for j in range(8)] for i in range(8)]


def q_ann_rerank_exact(spark, sf_dir):
    """PQ compressed-domain search WITH the exact-rerank refine stage
    (operators/pq.exact_rerank_l2, Jegou et al. TPAMI 2011 §V),
    pinned by an exact oracle: with the short-list C >= corpus size
    the refined output IS the exact squared-L2 top-10 per query, so
    DuckDB can reproduce it row for row -- the end-to-end check that
    encode -> ADC scan -> candidate fetch -> exact re-score -> re-rank
    composes correctly. The production regime (C << n, recall@10 back
    to 1.0 at 2.8-3.6x brute speed) is pinned by the pytest recall
    floors and the bench ann sidecar. Self-matches rank 1 at distance
    0 by construction (no exclusion -- the oracle includes them too).
    Output: query_id, vec_id, exact_dist, rank."""
    from xmidt_event_streams_spark.operators.pq import pq_encode, pq_topk

    emb = _emb(spark, sf_dir)
    queries = [
        (int(r["vec_id"]), [float(x) for x in r["embedding"]])
        for r in emb.filter(F.col("vec_id") < 5).collect()
    ]
    coded = pq_encode(emb, _pq_codebooks()).select("vec_id", "codes")
    return pq_topk(
        coded,
        queries,
        _pq_codebooks(),
        10,
        rerank=1_000_000_000,  # >= any corpus: the exact-recovery arm
        vectors=emb,
    ).select("query_id", "vec_id", "exact_dist", "rank")


SQL_ANN_RERANK_EXACT = """
WITH q AS (
  SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id < 5
), c AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
), s AS (
  SELECT query_id, vec_id,
    round(list_dot_product(v, v) - 2 * list_dot_product(v, qv)
          + list_dot_product(qv, qv), 6) AS exact_dist
  FROM c CROSS JOIN q
)
SELECT query_id, vec_id, exact_dist, CAST(rnk AS INT) AS rank FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY exact_dist, vec_id) AS rnk
  FROM s
) WHERE rnk <= 10
"""


# ------------------------------------- IVF-PQ in-index SQ8 refine


def q_ann_refine_sq8(spark, sf_dir):
    """IVF-PQ probe with the IN-INDEX refine stage (operators/sq.py +
    ivfpq.probe_ivfpq_index(rerank=, vectors=None)): the index stores
    an SQ8 scalar-quantized copy of each vector next to the PQ codes,
    so the probe re-ranks its shortlist from payload its OWN scan
    read -- no corpus fetch, zero extra Spark actions (the production
    refine path; Jegou et al. TPAMI 2011 SS V's re-ranking stage with
    a compressed refine codec, the FAISS IVFPQ+refine shape).

    Oracle-pinned END TO END because the SQ8 codec is deterministic
    arithmetic DuckDB can reproduce: per vector lo = min(v), step =
    (max(v)-lo)/255 (1.0 when degenerate), byte = clip(round((x-lo)/
    step), 0, 255), decode = lo + step*byte. With n_probe = n_cells
    and C >= corpus the shortlist is the whole corpus minus
    self-matches, so the output is exactly the top-10 by
    SQ8-reconstructed squared L2 -- quantizer choice affects only the
    discarded ADC channel, and the oracle re-derives the codec in SQL
    and must match row for row (encode -> write -> manifest probe ->
    in-scan payload carry -> driver decode -> re-rank, all checked).
    Output: query_id, vec_id, refine_dist, rank."""
    import shutil
    import tempfile

    from xmidt_event_streams_spark.operators.ivfpq import (
        probe_ivfpq_index,
        write_ivfpq_index,
    )

    emb = _emb(spark, sf_dir)
    queries = [
        (int(r["vec_id"]), [float(x) for x in r["embedding"]])
        for r in emb.filter(F.col("vec_id") < 5).collect()
    ]
    cents = deterministic_planes(4, 64, seed="refine-cells")
    tmp = tempfile.mkdtemp(prefix="xes-refine-row-") + "/ix"
    try:
        write_ivfpq_index(
            emb, tmp, cents, _pq_codebooks(), refine="sq8"
        )
        # the probe's result is a LOCAL relation (driver-merged), so
        # the index dir can be cleaned up before the caller collects
        return probe_ivfpq_index(
            spark,
            tmp,
            queries,
            k_neighbors=10,
            n_probe=len(cents),
            rerank=1_000_000_000,  # >= corpus: exact-recovery arm
        ).select("query_id", "vec_id", "refine_dist", "rank")
    finally:
        shutil.rmtree(tmp.rsplit("/", 1)[0], ignore_errors=True)


SQL_ANN_REFINE_SQ8 = """
WITH q AS (
  SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id < 5
), c AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
), bounds AS (
  SELECT vec_id, v, list_min(v) AS lo,
    CASE WHEN list_max(v) > list_min(v)
         THEN (list_max(v) - list_min(v)) / 255.0 ELSE 1.0 END AS step
  FROM c
), dec AS (
  SELECT vec_id,
    list_transform(
      v, x -> lo + step * least(greatest(round((x - lo) / step), 0), 255)
    ) AS dv
  FROM bounds
), s AS (
  SELECT query_id, d.vec_id,
    round(list_dot_product(dv, dv) - 2 * list_dot_product(dv, qv)
          + list_dot_product(qv, qv), 6) AS refine_dist
  FROM dec d CROSS JOIN q WHERE d.vec_id <> q.query_id
)
SELECT query_id, vec_id, refine_dist, CAST(rnk AS INT) AS rank FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY refine_dist, vec_id) AS rnk
  FROM s
) WHERE rnk <= 10
"""


def q_sq8_topk(spark, sf_dir):
    """Standalone SQ8 compressed-scan top-k (operators/sq.py:
    sq8_encode + sq8_topk) -- the middle rung of the ANN byte ladder:
    brute-force squared-L2 ranking over the 1-byte-per-dimension
    column, 1/8th the scanned bytes of the float64 scan at near-exact
    recall (pytest pins recall@10 >= 0.95 vs brute).

    Oracle-pinned END TO END like ann_refine_sq8: the codec is
    deterministic arithmetic (lo = min(v), step = (max(v)-lo)/255,
    byte = clip(round_half_away((x-lo)/step), 0, 255), decode =
    lo + step*byte) and the scan ranks by the expanded squared L2
    (||d||^2 - 2 d.q + ||q||^2, the same form the SQL computes), so
    DuckDB re-derives encode -> decode -> rank and must match row for
    row. Self-matches are NOT excluded (the pq_topk contract).
    Output: query_id, vec_id, sq8_dist, rank."""
    from xmidt_event_streams_spark.operators.sq import (
        sq8_encode,
        sq8_topk,
    )

    emb = _emb(spark, sf_dir)
    queries = [
        (int(r["vec_id"]), [float(x) for x in r["embedding"]])
        for r in emb.filter(F.col("vec_id") < 5).collect()
    ]
    return sq8_topk(sq8_encode(emb), queries, k_neighbors=10)


SQL_SQ8_TOPK = """
WITH q AS (
  SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id < 5
), c AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
), bounds AS (
  SELECT vec_id, v, list_min(v) AS lo,
    CASE WHEN list_max(v) > list_min(v)
         THEN (list_max(v) - list_min(v)) / 255.0 ELSE 1.0 END AS step
  FROM c
), dec AS (
  SELECT vec_id,
    list_transform(
      v, x -> lo + step * least(greatest(round((x - lo) / step), 0), 255)
    ) AS dv
  FROM bounds
), s AS (
  SELECT query_id, d.vec_id,
    round(list_dot_product(dv, dv) - 2 * list_dot_product(dv, qv)
          + list_dot_product(qv, qv), 6) AS sq8_dist
  FROM dec d CROSS JOIN q
)
SELECT query_id, vec_id, sq8_dist, CAST(rnk AS INT) AS rank FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY sq8_dist, vec_id) AS rnk
  FROM s
) WHERE rnk <= 10
"""


# ------------------------------------------ exact frequent tokens


FREQ_PHI = 0.01


def q_frequent_tokens(spark, sf_dir):
    """Exact heavy hitters over the documents token stream
    (operators/frequency.py): per-partition Misra-Gries candidates
    (bounded state) -> exact verify counts -> support filter. The
    output carries TRUE counts, which is what lets the oracle check
    it exactly -- no estimate survives to the result."""
    from xmidt_event_streams_spark.operators.frequency import (
        frequent_tokens_exact,
    )

    return frequent_tokens_exact(_docs(spark, sf_dir), phi=FREQ_PHI)


SQL_FREQUENT_TOKENS = f"""
WITH {_WORDS_CTE},
tok AS (SELECT unnest(w) AS tok FROM words),
tot AS (SELECT count(*) AS total FROM tok)
SELECT tok AS token, count(*) AS cnt, (SELECT total FROM tot) AS total
FROM tok GROUP BY tok
HAVING count(*) >= {FREQ_PHI} * (SELECT total FROM tot)
"""


# ------------------------------------------ time-series resampling


RESAMPLE_INTERVAL_S = 6 * 3600


def q_resample_ffill(spark, sf_dir):
    """Fixed-grid resampling with forward fill (operators/resample.py):
    per-user 6 h buckets, last observation carried across gaps,
    n_events = 0 on gap rows. The regular-grid shape every
    time-series join/model consumes."""
    from xmidt_event_streams_spark.operators.resample import resample_ffill

    return resample_ffill(
        _ev(spark, sf_dir), interval_seconds=RESAMPLE_INTERVAL_S
    )


SQL_RESAMPLE_FFILL = f"""
WITH b AS (
  SELECT user_id,
    CAST(to_timestamp((epoch(ts)::BIGINT // {RESAMPLE_INTERVAL_S})
      * {RESAMPLE_INTERVAL_S}) AS TIMESTAMP) AS bkt,
    value, ts, event_id
  FROM events
), lastv AS (
  SELECT user_id, bkt, value AS lastv, n_events FROM (
    SELECT user_id, bkt, value,
      row_number() OVER (PARTITION BY user_id, bkt
                         ORDER BY ts DESC, event_id DESC) AS rn,
      count(*) OVER (PARTITION BY user_id, bkt) AS n_events
    FROM b
  ) WHERE rn = 1
), spans AS (
  SELECT user_id, min(bkt) AS lo, max(bkt) AS hi FROM lastv GROUP BY user_id
), grid AS (
  SELECT user_id,
    unnest(generate_series(lo, hi,
      INTERVAL {RESAMPLE_INTERVAL_S} SECONDS)) AS bucket_ts
  FROM spans
)
SELECT g.user_id, g.bucket_ts,
  round(last_value(l.lastv IGNORE NULLS) OVER (
    PARTITION BY g.user_id ORDER BY g.bucket_ts
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6) AS value_ffill,
  coalesce(l.n_events, 0) AS n_events
FROM grid g LEFT JOIN lastv l
  ON l.user_id = g.user_id AND l.bkt = g.bucket_ts
"""


# --------------------------------------------- robust outlier stats


def q_value_outliers(spark, sf_dir):
    """Robust per-group anomaly stats: median, MAD (median absolute
    deviation), and how many values sit beyond median +- 3*MAD --
    mean/stddev blow up under the very outliers being hunted; the
    median/MAD pair does not. Three stages, each one grouped agg plus
    a broadcast of the k-row stats back onto the fact (the fact never
    shuffles for the joins); at 100 TB swap percentile for
    approx_percentile -- same shape, sketch state."""
    ev = _ev(spark, sf_dir).select("event_type", "value")
    med = ev.groupBy("event_type").agg(
        F.percentile("value", F.lit(0.5)).alias("_med")
    )
    dev = ev.join(F.broadcast(med), "event_type").withColumn(
        "_adev", F.abs(F.col("value") - F.col("_med"))
    )
    mads = dev.groupBy("event_type").agg(
        F.min("_med").alias("_median"),
        F.percentile("_adev", F.lit(0.5)).alias("_mad"),
    )
    return (
        dev.join(F.broadcast(mads), "event_type")
        .groupBy("event_type")
        .agg(
            F.round(F.min("_median"), 6).alias("median"),
            F.round(F.min("_mad"), 6).alias("mad"),
            F.sum(
                (F.col("_adev") > F.lit(3.0) * F.col("_mad")).cast("long")
            ).alias("n_outliers"),
        )
    )


SQL_VALUE_OUTLIERS = """
WITH med AS (
  SELECT event_type, quantile_cont(value, 0.5) AS m
  FROM events GROUP BY event_type
), dev AS (
  SELECT e.event_type, abs(value - m) AS adev, m
  FROM events e JOIN med USING (event_type)
), mads AS (
  SELECT event_type, min(m) AS med, quantile_cont(adev, 0.5) AS mad
  FROM dev GROUP BY event_type
)
SELECT d.event_type,
  round(min(mads.med), 6) AS median,
  round(min(mads.mad), 6) AS mad,
  CAST(sum(CASE WHEN d.adev > 3.0 * mads.mad THEN 1 ELSE 0 END) AS BIGINT)
    AS n_outliers
FROM dev d JOIN mads USING (event_type)
GROUP BY d.event_type
"""


# ------------------------------------ semi-structured (JSON / VARIANT)


def q_props_json(spark, sf_dir):
    """Semi-structured querying over the events.props JSON column via
    the VARIANT type (Spark 4 parse_json/variant_get): parse once,
    extract a typed path, filter and aggregate on it -- the shredded
    access pattern an event pipeline needs for payload fields that
    never got promoted to columns. Narrow parse + one agg shuffle;
    at 100 TB prefer promoting hot paths to real columns at ingest
    (V2's from_json) and keep VARIANT for the long tail."""
    ev = _ev(spark, sf_dir)
    k = F.try_variant_get(F.parse_json("props"), "$.k", "bigint")
    return (
        ev.select("event_type", k.alias("k"))
        .filter(F.col("k") >= 50)
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_hot"),
            F.sum("k").alias("sum_k"),
        )
    )


SQL_PROPS_JSON = """
SELECT event_type, count(*) AS n_hot,
  sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS sum_k
FROM events
WHERE CAST(json_extract(props, '$.k') AS BIGINT) >= 50
GROUP BY event_type
"""


# ------------------------------------- decorrelation shapes (q21/q22)


def q_tpch_q21ish(spark, sf_dir):
    """Suppliers-who-kept-orders-waiting (TPC-H Q21 shape, adapted:
    this lineitem has no commit/receipt dates, so 'late' =
    l_returnflag = 'R'): the EXISTS / NOT EXISTS pair over lineitem
    self-joins becomes left-semi + left-anti joins, equi on orderkey
    with the suppkey inequality as a residual condition. At test SF
    every leg broadcasts; at 100 TB each leg shuffles on orderkey
    (uniform keys by construction -- no skew salt needed) and the
    column-pruned 3-column lineitem projection keeps those shuffles
    cheap. Supplier is broadcast."""
    t = load_tables(spark, sf_dir, ("lineitem", "orders", "supplier"))
    li = t["lineitem"].select("l_orderkey", "l_suppkey", "l_returnflag")
    l1 = (
        li.filter(F.col("l_returnflag") == "R")
        .join(
            t["orders"].filter(F.col("o_orderstatus") == "F"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .select("l_orderkey", "l_suppkey")
    )
    l2 = li.select(
        F.col("l_orderkey").alias("k2"), F.col("l_suppkey").alias("s2")
    )
    l3 = li.filter(F.col("l_returnflag") == "R").select(
        F.col("l_orderkey").alias("k3"), F.col("l_suppkey").alias("s3")
    )
    waited = (
        l1.join(
            l2,
            (F.col("l_orderkey") == F.col("k2"))
            & (F.col("l_suppkey") != F.col("s2")),
            "left_semi",
        ).join(
            l3,
            (F.col("l_orderkey") == F.col("k3"))
            & (F.col("l_suppkey") != F.col("s3")),
            "left_anti",
        )
    )
    return (
        waited.join(
            F.broadcast(t["supplier"]),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
    )


SQL_TPCH_Q21ISH = """
SELECT s_name, count(*) AS numwait
FROM supplier, lineitem l1, orders
WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
  AND o_orderstatus = 'F' AND l1.l_returnflag = 'R'
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_returnflag = 'R')
GROUP BY s_name
"""


def q_tpch_q22ish(spark, sf_dir):
    """Dormant high-balance customers (TPC-H Q22 shape, adapted:
    segment instead of country code, 'no urgent orders' instead of
    'no orders' -- every synthetic customer has orders): a scalar
    subquery (global avg of positive balances, 1-row broadcast) plus
    a NOT EXISTS decorrelated to a left-anti join on custkey.
    Balance sums exact via decimal."""
    t = load_tables(spark, sf_dir, ("customer", "orders"))
    cust = t["customer"]
    avg_bal = cust.filter(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("ab")
    )
    urgent = t["orders"].filter(
        F.col("o_orderpriority") == "1-URGENT"
    ).select("o_custkey")
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("ab"))
        .join(urgent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("numcust"),
            F.round(
                F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast(
                    "double"
                ),
                2,
            ).alias("totacctbal"),
        )
    )


SQL_TPCH_Q22ISH = """
WITH avg_bal AS (
  SELECT avg(c_acctbal) AS ab FROM customer WHERE c_acctbal > 0
)
SELECT c_mktsegment, count(*) AS numcust,
  round(CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE), 2) AS totacctbal
FROM customer, avg_bal
WHERE c_acctbal > ab
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderpriority = '1-URGENT')
GROUP BY c_mktsegment
"""


# ---------------------- remaining TPC-H family (Q2/Q8/Q9/Q11/Q13/Q15/
# Q16/Q17/Q20 shapes, adapted to the available columns -- there is no
# partsupp table, so the part-supplier cost/availability relation is
# derived from lineitem). Together with q1/q3/q4/q5/q6/q7/q10/q12/q14/
# q18/q19/q21/q22 above this closes the full 22-query shape family.


def q_tpch_q2ish(spark, sf_dir):
    """Min-cost supplier per part (TPC-H Q2 shape). cost(part, supp) =
    min observed l_extendedprice in lineitem (partsupp stand-in). The
    correlated scalar subquery of Q2 -- "the minimum cost any EUROPE
    supplier offers for this part" -- decorrelates into a groupBy-min
    + join-back on (partkey, cost), written explicitly so the plan is
    the one Catalyst would rewrite to anyway.

    Scale: the cost relation is one hash-agg shuffle of a 3-column
    lineitem projection on (partkey, suppkey); the per-part min is a
    second agg an order smaller (|parts| rows); the join-back is equi
    on (partkey, cost) against that small side, broadcast. Supplier/
    nation/region dims broadcast; ties on min cost surface all
    winners, exactly as Q2 does."""
    t = load_tables(
        spark, sf_dir, ("lineitem", "part", "supplier", "nation", "region")
    )
    eur = (
        t["supplier"]
        .join(
            F.broadcast(t["nation"]),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .join(
            F.broadcast(t["region"].filter(F.col("r_name") == "EUROPE")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    cost = (
        t["lineitem"]
        .select("l_partkey", "l_suppkey", "l_extendedprice")
        .join(
            F.broadcast(eur.select("s_suppkey")),
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left_semi",
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min("l_extendedprice").alias("cost"))
    )
    min_cost = cost.groupBy("l_partkey").agg(F.min("cost").alias("mc")).select(
        F.col("l_partkey").alias("mk"), "mc"
    )
    parts = t["part"].filter(
        (F.col("p_type") == "LARGE") & (F.col("p_size") <= 10)
    )
    return (
        cost.join(
            F.broadcast(min_cost),
            (F.col("l_partkey") == F.col("mk")) & (F.col("cost") == F.col("mc")),
        )
        .join(F.broadcast(parts), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(eur), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_name", "cost")
    )


SQL_TPCH_Q2ISH = """
WITH eur AS (
  SELECT s_suppkey, s_name, s_acctbal, n_name
  FROM supplier
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey AND r_name = 'EUROPE'
), ps AS (
  SELECT l_partkey, l_suppkey, min(l_extendedprice) AS cost
  FROM lineitem
  WHERE l_suppkey IN (SELECT s_suppkey FROM eur)
  GROUP BY 1, 2
)
SELECT s_acctbal, s_name, n_name, p_partkey, p_name, cost
FROM ps
JOIN part ON l_partkey = p_partkey
JOIN eur ON l_suppkey = s_suppkey
WHERE p_type = 'LARGE' AND p_size <= 10
  AND cost = (SELECT min(ps2.cost) FROM ps ps2
              WHERE ps2.l_partkey = ps.l_partkey)
"""


def q_tpch_q8ish(spark, sf_dir):
    """National market share (TPC-H Q8 shape): NATION_3's share of
    PROMO-part revenue sold to EUROPE customers, by order year. The
    conditional-aggregate ratio sum(CASE WHEN supp_nation = X THEN
    rev END) / sum(rev) folds in ONE aggregation pass -- no second
    scan, no self-join.

    Scale: lineitem never shuffles for the joins (part/orders/
    customer project to 2-3 columns and broadcast under AQE; nation/
    region are tiny); one hash-agg shuffle on the ~7 distinct years.
    Exact decimal sums; the ratio is evaluated once per group on the
    driver-representable aggregate."""
    t = load_tables(
        spark,
        sf_dir,
        ("lineitem", "part", "orders", "customer", "supplier", "nation", "region"),
    )
    rev = F.col("l_extendedprice").cast("decimal(12,2)") * (
        F.lit(1).cast("decimal(4,2)") - F.col("l_discount").cast("decimal(4,2)")
    )
    cust_eur = (
        t["customer"]
        .join(
            F.broadcast(t["nation"]),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .join(
            F.broadcast(t["region"].filter(F.col("r_name") == "EUROPE")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("c_custkey")
    )
    supp_nat = (
        t["supplier"]
        .join(
            F.broadcast(
                t["nation"].select(
                    F.col("n_nationkey").alias("sn_key"),
                    F.col("n_name").alias("supp_nation"),
                )
            ),
            F.col("s_nationkey") == F.col("sn_key"),
        )
        .select("s_suppkey", "supp_nation")
    )
    j = (
        t["lineitem"]
        .join(
            F.broadcast(
                t["part"].filter(F.col("p_type") == "PROMO").select("p_partkey")
            ),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(
            F.broadcast(t["orders"].select("o_orderkey", "o_custkey", "o_orderdate")),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(
            F.broadcast(cust_eur), F.col("o_custkey") == F.col("c_custkey"), "left_semi"
        )
        .join(F.broadcast(supp_nat), F.col("l_suppkey") == F.col("s_suppkey"))
    )
    nat_rev = F.sum(F.when(F.col("supp_nation") == "NATION_3", rev))
    return j.groupBy(
        F.year("o_orderdate").cast("int").alias("o_year")
    ).agg(
        F.round(
            nat_rev.cast("double") / F.sum(rev).cast("double"), 6
        ).alias("mkt_share")
    )


SQL_TPCH_Q8ISH = f"""
SELECT CAST(year(o_orderdate) AS INT) AS o_year,
  round(
    CAST(sum(CASE WHEN supp_nation = 'NATION_3'
             THEN {_dec2('l_extendedprice')} * ({_ONE} - {_dec4('l_discount')}) END)
         AS DOUBLE)
    / CAST(sum({_dec2('l_extendedprice')} * ({_ONE} - {_dec4('l_discount')}))
           AS DOUBLE),
    6) AS mkt_share
FROM (
  SELECT o_orderdate, l_extendedprice, l_discount, n2.n_name AS supp_nation
  FROM lineitem
  JOIN part ON l_partkey = p_partkey AND p_type = 'PROMO'
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n1 ON c_nationkey = n1.n_nationkey
  JOIN region ON n1.n_regionkey = r_regionkey AND r_name = 'EUROPE'
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation n2 ON s_nationkey = n2.n_nationkey
) GROUP BY o_year
"""


def q_tpch_q9ish(spark, sf_dir):
    """Product-type profit (TPC-H Q9 shape): profit = revenue minus a
    retail-price-based cost stand-in (no partsupp supplycost), by
    supplier nation and order year, for 'widget' parts.

    Scale: the fact keeps a 6-column projection; part filters by a
    LIKE that cannot push to the scan but prunes before the join
    (broadcast of the matching partkeys); orders broadcasts its
    2-column projection under AQE; one agg shuffle on (nation, year).
    All arithmetic in exact decimal until the final round."""
    t = load_tables(
        spark, sf_dir, ("lineitem", "part", "orders", "supplier", "nation")
    )
    amount = F.col("l_extendedprice").cast("decimal(12,2)") * (
        F.lit(1).cast("decimal(4,2)") - F.col("l_discount").cast("decimal(4,2)")
    ) - F.col("p_retailprice").cast("decimal(12,2)") * F.col("l_quantity").cast(
        "decimal(12,2)"
    )
    j = (
        t["lineitem"]
        .join(
            F.broadcast(
                t["part"]
                .filter(F.col("p_name").like("%widget%"))
                .select("p_partkey", "p_retailprice")
            ),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(
            F.broadcast(t["orders"].select("o_orderkey", "o_orderdate")),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(
            F.broadcast(t["supplier"].select("s_suppkey", "s_nationkey")),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .join(
            F.broadcast(t["nation"]),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
    )
    return (
        j.groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
        )
        .agg(F.round(F.sum(amount).cast("double"), 4).alias("sum_profit"))
    )


SQL_TPCH_Q9ISH = f"""
SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
  round(CAST(sum(
    {_dec2('l_extendedprice')} * ({_ONE} - {_dec4('l_discount')})
    - {_dec2('p_retailprice')} * {_dec2('l_quantity')}
  ) AS DOUBLE), 4) AS sum_profit
FROM lineitem
JOIN part ON l_partkey = p_partkey AND p_name LIKE '%widget%'
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
GROUP BY n_name, o_year
"""


def q_tpch_q11ish(spark, sf_dir):
    """Important inventory value (TPC-H Q11 shape): per-part traded
    value for EUROPE-region suppliers, keeping parts whose value
    exceeds 1.5x the mean part value -- the GROUP BY ... HAVING
    sum(...) > (scalar subquery) pattern. The threshold is
    mean-relative (Q11's fraction is SF-relative for the same
    reason), compared in exact decimal (2*val*n > 3*total) so no
    float epsilon can flip a row. The scalar (total, count) is a
    1-row broadcast crossJoin, so the threshold never forces a
    second shuffle of the grouped data.

    Scale: one agg shuffle on partkey for the grouped values; the
    global total folds OFF the grouped result (|parts| rows, not the
    fact); the comparison is a narrow filter."""
    t = load_tables(spark, sf_dir, ("lineitem", "supplier", "nation", "region"))
    nat_supp = (
        t["supplier"]
        .join(
            F.broadcast(t["nation"]),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .join(
            F.broadcast(t["region"].filter(F.col("r_name") == "EUROPE")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("s_suppkey")
    )
    grouped = (
        t["lineitem"]
        .select("l_partkey", "l_suppkey", "l_extendedprice")
        .join(
            F.broadcast(nat_supp),
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left_semi",
        )
        .groupBy("l_partkey")
        .agg(
            F.sum(F.col("l_extendedprice").cast("decimal(12,2)")).alias("val")
        )
    )
    total = grouped.agg(
        F.sum("val").alias("tot"), F.count("*").alias("np")
    )
    return (
        grouped.crossJoin(F.broadcast(total))
        .filter(F.col("val") * 2 * F.col("np") > F.col("tot") * 3)
        .select(
            "l_partkey", F.round(F.col("val").cast("double"), 2).alias("value")
        )
    )


SQL_TPCH_Q11ISH = f"""
WITH grouped AS (
  SELECT l_partkey, sum({_dec2('l_extendedprice')}) AS val
  FROM lineitem
  WHERE l_suppkey IN (
    SELECT s_suppkey FROM supplier
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'EUROPE')
  GROUP BY l_partkey
)
SELECT l_partkey, round(CAST(val AS DOUBLE), 2) AS value
FROM grouped
WHERE 2 * val * (SELECT count(*) FROM grouped)
    > 3 * (SELECT sum(val) FROM grouped)
"""


def q_tpch_q13ish(spark, sf_dir):
    """Customer order-count distribution (TPC-H Q13 shape): LEFT
    OUTER join customer-to-filtered-orders (customers with zero
    qualifying orders must appear with count 0 -- the outer join is
    load-bearing), count per customer, then the distribution of
    those counts. Two agg shuffles; the second is over |customers|
    rows, the third over ~50 distinct counts.

    Scale: orders projects to 2 columns and shuffles on custkey (or
    broadcasts under AQE at small SF); count(o_orderkey) not
    count(*) so NULL non-matches count as zero."""
    t = load_tables(spark, sf_dir, ("customer", "orders"))
    o = (
        t["orders"]
        .filter(F.col("o_orderpriority") != "1-URGENT")
        .select("o_custkey", "o_orderkey")
    )
    per_cust = (
        t["customer"]
        .select("c_custkey")
        .join(o, F.col("c_custkey") == F.col("o_custkey"), "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


SQL_TPCH_Q13ISH = """
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer
  LEFT OUTER JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
)
GROUP BY c_count
"""


def q_tpch_q15ish(spark, sf_dir):
    """Top supplier(s) by quarterly revenue (TPC-H Q15 shape): the
    revenue view is one agg; "revenue = max revenue" is a 1-row
    broadcast scalar compared in exact decimal, so ties surface all
    winners deterministically (no double-equality hazard).

    Scale: one agg shuffle on suppkey over the date-pruned fact; the
    max folds off the |suppliers|-row aggregate; supplier dim
    broadcasts for the name join."""
    t = load_tables(spark, sf_dir, ("lineitem", "supplier"))
    rev = F.col("l_extendedprice").cast("decimal(12,2)") * (
        F.lit(1).cast("decimal(4,2)") - F.col("l_discount").cast("decimal(4,2)")
    )
    revenue = (
        t["lineitem"]
        .filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01"))
            & (F.col("l_shipdate") < F.lit("1996-04-01"))
        )
        .groupBy("l_suppkey")
        .agg(F.sum(rev).alias("total_revenue"))
    )
    top = revenue.agg(F.max("total_revenue").alias("max_rev"))
    return (
        revenue.crossJoin(F.broadcast(top))
        .filter(F.col("total_revenue") == F.col("max_rev"))
        .join(
            F.broadcast(t["supplier"].select("s_suppkey", "s_name")),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .select(
            "s_suppkey",
            "s_name",
            F.round(F.col("total_revenue").cast("double"), 4).alias(
                "total_revenue"
            ),
        )
    )


SQL_TPCH_Q15ISH = f"""
WITH revenue AS (
  SELECT l_suppkey, sum({_dec2('l_extendedprice')} * ({_ONE} - {_dec4('l_discount')})) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, round(CAST(total_revenue AS DOUBLE), 4) AS total_revenue
FROM revenue JOIN supplier ON l_suppkey = s_suppkey
WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
"""


def q_tpch_q16ish(spark, sf_dir):
    """Supplier counts by part attributes (TPC-H Q16 shape): distinct
    suppliers per (brand, type, size) slice from the lineitem bridge,
    excluding one brand and excluding "complaint" suppliers (acctbal
    < 0 stand-in) -- the NOT IN subquery decorrelated to a left-anti
    join.

    Scale: the bridge projects lineitem to 2 columns; count(DISTINCT
    suppkey) runs as the standard two-phase expand-agg on uniform
    keys; the anti side is a broadcast of the tiny complaint list;
    part is broadcast."""
    t = load_tables(spark, sf_dir, ("lineitem", "part", "supplier"))
    complaints = t["supplier"].filter(F.col("s_acctbal") < 0).select("s_suppkey")
    parts = t["part"].filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_size").isin(1, 5, 10, 15, 20, 25, 30, 35, 40, 45))
    )
    return (
        t["lineitem"]
        .select("l_partkey", "l_suppkey")
        .join(
            F.broadcast(complaints),
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left_anti",
        )
        .join(
            F.broadcast(parts.select("p_partkey", "p_brand", "p_type", "p_size")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


SQL_TPCH_Q16ISH = """
SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#1'
  AND p_size IN (1, 5, 10, 15, 20, 25, 30, 35, 40, 45)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
"""


def q_tpch_q17ish(spark, sf_dir):
    """Small-quantity-order revenue (TPC-H Q17 shape): lineitems of
    one brand whose quantity is below 20% of that part's average
    quantity. The correlated avg decorrelates into a per-part
    (sum, count) aggregate joined back; the comparison is kept in
    integer-exact form (5 * qty * cnt < sum) so no float-division
    epsilon can flip a row between engines.

    Scale: the per-part stats are one agg shuffle of a 2-column
    projection; the join-back broadcasts |parts| rows; the final
    1-row global sum is map-side partial."""
    t = load_tables(spark, sf_dir, ("lineitem", "part"))
    stats = (
        t["lineitem"]
        .groupBy(F.col("l_partkey").alias("sp"))
        .agg(
            F.sum("l_quantity").alias("sq"),
            F.count("*").alias("cq"),
        )
    )
    return (
        t["lineitem"]
        .join(
            F.broadcast(
                t["part"].filter(F.col("p_brand") == "Brand#2").select("p_partkey")
            ),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(F.broadcast(stats), F.col("l_partkey") == F.col("sp"))
        .filter(F.col("l_quantity") * 5 * F.col("cq") < F.col("sq"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice").cast("decimal(12,2)")).cast(
                    "double"
                )
                / 7.0,
                2,
            ).alias("avg_yearly")
        )
    )


SQL_TPCH_Q17ISH = f"""
SELECT round(CAST(sum({_dec2('l_extendedprice')}) AS DOUBLE) / 7.0, 2) AS avg_yearly
FROM lineitem l1
JOIN part ON l_partkey = p_partkey
WHERE p_brand = 'Brand#2'
  AND l1.l_quantity * 5 *
      (SELECT count(*) FROM lineitem l2 WHERE l2.l_partkey = l1.l_partkey)
    < (SELECT sum(l3.l_quantity) FROM lineitem l3
       WHERE l3.l_partkey = l1.l_partkey)
"""


def q_tpch_q20ish(spark, sf_dir):
    """Suppliers with excess shipped volume (TPC-H Q20 shape): the
    nested IN-subquery chain (suppliers ∈ {who shipped > 2x the mean
    pair volume of some 'large' part in 1996}) becomes
    agg-then-left-semi joins -- each IN level is a semi join against
    a pre-aggregated, already small relation, never a fact-side
    distinct. The threshold is mean-relative (Q20's availqty bound is
    quantity-relative for the same reason) and compared in
    integer-exact arithmetic (sq * n_pairs > 2 * total; quantities
    are integral, and integers < 2^53 are exact doubles).

    Scale: the inner agg shuffles a 3-column date-pruned projection
    on (suppkey, partkey); the (total, count) scalar folds off that
    small aggregate; supplier semi-joins against the distinct
    qualifying suppkeys (broadcast)."""
    t = load_tables(spark, sf_dir, ("lineitem", "part", "supplier"))
    pairs = (
        t["lineitem"]
        .filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01"))
            & (F.col("l_shipdate") < F.lit("1997-01-01"))
        )
        .join(
            F.broadcast(
                t["part"]
                .filter(F.col("p_name").like("large%"))
                .select("p_partkey")
            ),
            F.col("l_partkey") == F.col("p_partkey"),
            "left_semi",
        )
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("sq"))
    )
    stats = pairs.agg(F.sum("sq").alias("tot"), F.count("*").alias("npair"))
    big = (
        pairs.crossJoin(F.broadcast(stats))
        .filter(F.col("sq") * F.col("npair") > F.col("tot") * 2)
        .select("l_suppkey")
        .distinct()
    )
    return (
        t["supplier"]
        .join(
            F.broadcast(big), F.col("s_suppkey") == F.col("l_suppkey"), "left_semi"
        )
        .select("s_name", "s_acctbal")
    )


SQL_TPCH_Q20ISH = """
WITH pairs AS (
  SELECT l_suppkey, l_partkey, sum(l_quantity) AS sq
  FROM lineitem
  WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'large%')
    AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
  GROUP BY l_suppkey, l_partkey
)
SELECT s_name, s_acctbal
FROM supplier
WHERE s_suppkey IN (
  SELECT l_suppkey FROM pairs
  WHERE sq * (SELECT count(*) FROM pairs) > 2 * (SELECT sum(sq) FROM pairs)
)
"""


# ------------------------------------------------- analytics: trends


_TREND_X_SQL = "date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))"


def q_user_value_trend(spark, sf_dir):
    """Per-user linear trend of event value over time: built-in
    regression aggregates (regr_slope/intercept/r2 -- JVM-side,
    partial-agg friendly, one shuffle on user_id, mergeable state of
    six moments per group so 100 TB costs the same plan shape). The
    x axis is epoch-day (small integers) so the covariance sums stay
    far from FP cancellation and 6-dp rounding absorbs cross-engine
    drift. Groups with a single distinct day have undefined slope ->
    NULL in both engines."""
    ev = _ev(spark, sf_dir)
    x = F.unix_date(F.col("ts").cast("date"))
    return ev.groupBy("user_id").agg(
        F.regr_count("value", x).alias("n_obs"),
        F.round(F.regr_slope("value", x), 6).alias("slope"),
        F.round(F.regr_intercept("value", x), 6).alias("intercept"),
        F.round(F.regr_r2("value", x), 6).alias("r2"),
    )


SQL_USER_VALUE_TREND = f"""
SELECT user_id,
  regr_count(value, {_TREND_X_SQL}) AS n_obs,
  round(regr_slope(value, {_TREND_X_SQL}), 6) AS slope,
  round(regr_intercept(value, {_TREND_X_SQL}), 6) AS intercept,
  round(regr_r2(value, {_TREND_X_SQL}), 6) AS r2
FROM events GROUP BY user_id
"""


# ------------------------------------------------ data profiling


_PROFILE_COLS: dict[str, str] = {
    "event_id": "long",
    "user_id": "long",
    "event_type": "string",
    "value": "double",
    "ts": "ts",
}


def _canon_stat(col: F.Column, typ: str) -> F.Column:
    """Canonical cross-engine string form of a min/max: timestamps as
    epoch-micros, doubles as fixed-scale decimals (both engines print
    decimal(18,6) identically; raw double->string formatting does
    not round-trip across engines)."""
    if typ == "ts":
        col = F.unix_micros(col)
    elif typ == "double":
        col = F.round(col, 6).cast("decimal(18,6)")
    return col.cast("string")


def q_table_profile(spark, sf_dir):
    """Data profiling: per column the null count, exact distinct
    count, and canonicalized min/max, unpivoted to a (col_name,
    stats) long format via stack(). Deliberately TWO column-pruned
    scans joined as 1-row frames: the null/distinct counts compile to
    an Expand + HashAggregate (all-bigint buffers, map-side partials),
    while string min/max cannot use a hash buffer -- folded in a
    separate KEYLESS SortAggregate (a zero-sort streaming fold;
    keeping it out of the Expand branch is what prevents a keyed
    SortAggregate sorting rows-x-n_cols expanded data). At 100 TB
    swap countDistinct for approx_count_distinct and the Expand
    factor disappears; the exact form is what the oracle checks."""
    ev = _ev(spark, sf_dir)
    cnt_aggs, mm_aggs = [], []
    for c, t in _PROFILE_COLS.items():
        cnt_aggs += [
            F.sum(F.col(c).isNull().cast("long")).alias(f"{c}__nn"),
            F.countDistinct(c).alias(f"{c}__nd"),
        ]
        mm_aggs += [
            _canon_stat(F.min(c), t).alias(f"{c}__min"),
            _canon_stat(F.max(c), t).alias(f"{c}__max"),
        ]
    one = ev.agg(*cnt_aggs).crossJoin(F.broadcast(ev.agg(*mm_aggs)))
    stack_args = ", ".join(
        f"'{c}', {c}__nn, {c}__nd, {c}__min, {c}__max" for c in _PROFILE_COLS
    )
    return one.select(
        F.expr(
            f"stack({len(_PROFILE_COLS)}, {stack_args}) "
            "as (col_name, n_null, n_distinct, min_str, max_str)"
        )
    )


def _profile_oracle_arm(c: str, typ: str) -> str:
    if typ == "ts":
        mn = f"CAST(min(epoch_us({c})) AS VARCHAR)"
        mx = f"CAST(max(epoch_us({c})) AS VARCHAR)"
    elif typ == "double":
        mn = f"CAST(CAST(round(min({c}), 6) AS DECIMAL(18,6)) AS VARCHAR)"
        mx = f"CAST(CAST(round(max({c}), 6) AS DECIMAL(18,6)) AS VARCHAR)"
    else:
        mn = f"CAST(min({c}) AS VARCHAR)"
        mx = f"CAST(max({c}) AS VARCHAR)"
    return (
        f"SELECT '{c}' AS col_name, count(*) - count({c}) AS n_null, "
        f"count(DISTINCT {c}) AS n_distinct, {mn} AS min_str, "
        f"{mx} AS max_str FROM events"
    )


SQL_TABLE_PROFILE = " UNION ALL ".join(
    _profile_oracle_arm(c, t) for c, t in _PROFILE_COLS.items()
)


# ------------------------------------- quantile-threshold filtering


def q_quality_quantile_filter(spark, sf_dir):
    """Corpus curation by global quantile: keep documents at or above
    the 75th percentile of the composite quality score. The threshold
    is a 1-row aggregate broadcast back over the corpus (the corpus
    never shuffles -- same shape as bm25's stats join). Exact
    percentile here for the oracle; functions/quality.py's
    approx=True arm (mergeable GK sketch) is the 100 TB path,
    accuracy-pinned in tests/test_quality.py."""
    from xmidt_event_streams_spark.functions.quality import (
        composite_quality_score,
        filter_by_quality_quantile,
    )

    scored = _docs(spark, sf_dir).select(
        "doc_id", composite_quality_score("text").alias("score")
    )
    return filter_by_quality_quantile(scored, "score", p=0.75).select(
        "doc_id", "score", "thr"
    )


SQL_QUALITY_QUANTILE_FILTER = f"""
WITH {_WORDS_CTE}, scored AS (
  SELECT doc_id, round(
    round(CASE WHEN len(w) > 0
      THEN CAST(len(list_filter(w, t -> list_contains({_EN_SW}, t))) AS DOUBLE) / len(w)
      ELSE 0 END, 6)
    - round(CASE WHEN length(text) > 0
      THEN CAST(length(regexp_replace(text, '[^.,;:!?''"()-]', '', 'g')) AS DOUBLE) / length(text)
      ELSE 0 END, 6)
    - round(CASE WHEN length(text) > 0
      THEN CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS DOUBLE) / length(text)
      ELSE 0 END, 6)
    + least(len(w), 100) / 200.0, 6) AS score
  FROM words
), q AS (SELECT round(quantile_cont(score, 0.75), 6) AS thr FROM scored)
SELECT doc_id, score, thr FROM scored, q WHERE score >= thr
"""


# --------------------------------------- learned quality gates (r4)


def q_lm_perplexity(spark, sf_dir):
    """CCNet-style gate (operators/lm.py, arXiv:1911.00359): fit a
    bigram LM on the trusted slice (lang='en'), score EVERY document's
    perplexity under it. Fit = two vocab-bounded hash-aggs; score =
    broadcast model joins + one per-doc agg."""
    d = _docs(spark, sf_dir)
    lm = ngram_lm_fit(d.filter(F.col("lang") == "en"))
    return lm_perplexity(d, lm)


SQL_LM_PERPLEXITY = f"""
WITH {_WORDS_CTE},
bg AS (
  SELECT doc_id, lang,
    unnest(w[1:len(w)-1]) AS c,
    unnest(w[2:len(w)]) AS t
  FROM words
),
cw AS (SELECT c, t, count(*) AS cw_cnt FROM bg WHERE lang = 'en' GROUP BY 1, 2),
ctx AS (SELECT c, sum(cw_cnt) AS c_cnt FROM cw GROUP BY 1),
v AS (
  SELECT count(DISTINCT tok) AS vocab_size
  FROM (SELECT unnest(w) AS tok FROM words WHERE lang = 'en')
),
sc AS (
  SELECT b.doc_id,
    ln((coalesce(cw_cnt, 0) + CAST(1.0 AS DOUBLE))
       / (coalesce(c_cnt, 0) + CAST(1.0 AS DOUBLE) * vocab_size)) AS lp
  FROM bg b
  LEFT JOIN cw ON b.c = cw.c AND b.t = cw.t
  LEFT JOIN ctx ON b.c = ctx.c
  CROSS JOIN v
),
agg AS (
  SELECT doc_id, count(*) AS nb, round(exp(-round(avg(lp), 6)), 4) AS ppl
  FROM sc GROUP BY 1
)
SELECT d.doc_id,
  CAST(coalesce(nb, 0) AS BIGINT) AS n_bigrams,
  ppl
FROM documents d LEFT JOIN agg ON d.doc_id = agg.doc_id
"""


def q_nb_quality_scores(spark, sf_dir):
    """DCLM-style learned gate, closed form (operators/classifier.py):
    multinomial Naive Bayes log-odds fit on label = (lang = 'en'),
    scored over every document. The full fit+score is two vocab-
    bounded aggs + broadcast joins, so the oracle replays it exactly."""
    d = _docs(spark, sf_dir)
    model = nb_fit(
        d.withColumn("is_en", F.col("lang") == "en"), label_col="is_en"
    )
    return nb_score(d, model)


SQL_NB_QUALITY_SCORES = f"""
WITH {_WORDS_CTE},
lbl AS (SELECT doc_id, (lang = 'en') AS y FROM documents),
tf AS (
  SELECT doc_id, term, count(*) AS tf
  FROM (SELECT doc_id, unnest(w) AS term FROM words)
  GROUP BY 1, 2
),
per_term AS (
  SELECT term,
    sum(CASE WHEN y THEN tf ELSE 0 END) AS pos_t,
    sum(CASE WHEN NOT y THEN tf ELSE 0 END) AS neg_t
  FROM tf JOIN lbl USING (doc_id)
  GROUP BY 1
),
tot AS (
  SELECT sum(pos_t) AS pos_tot, sum(neg_t) AS neg_tot,
    count(*) AS vocab_size
  FROM per_term
),
dc AS (
  SELECT sum(CASE WHEN y THEN 1 ELSE 0 END) AS n_pos,
    sum(CASE WHEN NOT y THEN 1 ELSE 0 END) AS n_neg
  FROM lbl
),
wts AS (
  SELECT term,
    ln((pos_t + CAST(1.0 AS DOUBLE)) / (pos_tot + CAST(1.0 AS DOUBLE) * vocab_size))
    - ln((neg_t + CAST(1.0 AS DOUBLE)) / (neg_tot + CAST(1.0 AS DOUBLE) * vocab_size))
      AS weight
  FROM per_term CROSS JOIN tot
),
st AS (
  SELECT
    ln(CAST(1.0 AS DOUBLE) / (pos_tot + CAST(1.0 AS DOUBLE) * vocab_size))
    - ln(CAST(1.0 AS DOUBLE) / (neg_tot + CAST(1.0 AS DOUBLE) * vocab_size))
      AS w_oov,
    ln(CAST(n_pos AS DOUBLE) / n_neg) AS prior
  FROM tot CROSS JOIN dc
),
per_doc AS (
  SELECT tf.doc_id,
    sum(tf) AS n_terms,
    round(any_value(prior) + sum(tf * coalesce(weight, w_oov)), 6) AS score
  FROM tf
  LEFT JOIN wts USING (term)
  CROSS JOIN st
  GROUP BY 1
)
SELECT d.doc_id,
  CAST(coalesce(n_terms, 0) AS BIGINT) AS n_terms,
  coalesce(score, (SELECT round(prior, 6) FROM st)) AS score,
  coalesce(score, (SELECT round(prior, 6) FROM st)) > 0 AS pred
FROM documents d LEFT JOIN per_doc ON d.doc_id = per_doc.doc_id
"""


def q_dsir_weights(spark, sf_dir):
    """DSIR importance weights (operators/dsir.py, arXiv:2302.03169):
    hashed unigram+bigram bag models fit on target = the trusted
    lang='en' slice vs raw = the whole corpus; every document scored
    with its log likelihood ratio. Closed form -- target is a slice
    of raw here, so the labeled single-pass fit applies (one gram
    explode with conditional sums), then one broadcast-join scoring
    pass."""
    from xmidt_event_streams_spark.operators.dsir import (
        dsir_fit_labeled,
        dsir_log_weights,
    )

    d = _docs(spark, sf_dir)
    model = dsir_fit_labeled(
        d.withColumn("_t", F.col("lang") == "en"), "_t", dim=1024
    )
    return dsir_log_weights(d, model)


_DSIR_DIM = 1024

SQL_DSIR_WEIGHTS = f"""
WITH {_WORDS_CTE},
uni AS (SELECT doc_id, lang, unnest(w) AS g FROM words),
bgp AS (
  SELECT doc_id, lang,
    unnest(w[1:len(w)-1]) AS c,
    unnest(w[2:len(w)]) AS t
  FROM words
),
grams AS (
  SELECT doc_id, lang, g FROM uni
  UNION ALL
  SELECT doc_id, lang, c || ' ' || t AS g FROM bgp
),
fb AS (
  SELECT doc_id, lang,
    ('0x' || substr(md5(g), 1, 15))::BIGINT % {_DSIR_DIM} AS b
  FROM grams
),
tc AS (SELECT b, count(*) AS t_cnt FROM fb WHERE lang = 'en' GROUP BY 1),
rc AS (SELECT b, count(*) AS r_cnt FROM fb GROUP BY 1),
tot AS (
  SELECT (SELECT count(*) FROM fb WHERE lang = 'en') AS t_tot,
    (SELECT count(*) FROM fb) AS r_tot
),
wts AS (
  SELECT rc.b,
    ln((coalesce(t_cnt, 0) + CAST(1.0 AS DOUBLE))
       / (t_tot + CAST(1.0 AS DOUBLE) * {_DSIR_DIM}))
    - ln((r_cnt + CAST(1.0 AS DOUBLE))
       / (r_tot + CAST(1.0 AS DOUBLE) * {_DSIR_DIM})) AS lw
  FROM rc LEFT JOIN tc USING (b) CROSS JOIN tot
),
st AS (
  SELECT
    ln(CAST(1.0 AS DOUBLE) / (t_tot + CAST(1.0 AS DOUBLE) * {_DSIR_DIM}))
    - ln(CAST(1.0 AS DOUBLE) / (r_tot + CAST(1.0 AS DOUBLE) * {_DSIR_DIM}))
      AS lw_default
  FROM tot
),
dtf AS (SELECT doc_id, b, count(*) AS tf FROM fb GROUP BY 1, 2),
pd AS (
  SELECT dtf.doc_id,
    sum(tf) AS n_feats,
    round(sum(tf * coalesce(lw, lw_default)), 6) AS log_w
  FROM dtf LEFT JOIN wts USING (b) CROSS JOIN st
  GROUP BY 1
)
SELECT d.doc_id,
  CAST(coalesce(n_feats, 0) AS BIGINT) AS n_feats,
  coalesce(log_w, 0.0) AS log_w
FROM documents d LEFT JOIN pd USING (doc_id)
"""


# off-registry alias so tests/test_components.py's SQL_{NAME} lookup
# resolves after the r4 rotation (top_users_per_type -> dsir_weights)
SQL_TOP_USERS_PER_TYPE = SQL_TOP_USERS


# ------------------------------------------------------------- registry

QUERIES: dict[str, QuerySpec] = {
    "flagship_route_counts": QuerySpec(q_flagship_route_counts, SQL_FLAGSHIP, True),
    "route_fanout": QuerySpec(q_route_fanout, SQL_ROUTE_FANOUT, True),
    "event_type_counts": QuerySpec(q_event_type_counts, SQL_EVENT_TYPE_COUNTS),
    "validate_rejects": QuerySpec(q_validate_rejects, SQL_VALIDATE_REJECTS),
    "fixwrp_enrich": QuerySpec(q_fixwrp_enrich, SQL_FIXWRP),
    "time_functions": QuerySpec(q_time_functions, SQL_TIME_FUNCTIONS),
    "batch_chunks": QuerySpec(q_batch_chunks, SQL_BATCH_CHUNKS),
    "json_serialize": QuerySpec(q_json_serialize, SQL_JSON_SERIALIZE),
    "value_histogram": QuerySpec(q_value_histogram, SQL_VALUE_HISTOGRAM),
    "session_windows": QuerySpec(q_session_windows, SQL_SESSION_WINDOWS, True),
    # latest_per_key rotated to the off-registry parity set in r5 to
    # admit corpus_diff (release-to-release diff verdicts); per-key
    # window-top-k evidence stays via session_gaps + the off-registry
    # twin.
    "corpus_diff": QuerySpec(q_corpus_diff, SQL_CORPUS_DIFF),
    # dedup_by_txn (min-per-delivery-key) rotated to the off-registry
    # parity set in r5 to admit packed_sequences -- keyed-min evidence
    # stays via dedup_exact (registry) + latest_per_key (off-registry).
    "packed_sequences": QuerySpec(q_packed_sequences, SQL_PACKED_SEQUENCES),
    "dedup_exact": QuerySpec(q_dedup_exact, SQL_DEDUP_EXACT, True),
    "minhash_lsh_pairs": QuerySpec(q_minhash_lsh_pairs, SQL_MINHASH, True),
    "dup_clusters": QuerySpec(q_dup_clusters, SQL_DUP_CLUSTERS),
    # ngram_jaccard (bucketed exact Jaccard) rotated to the
    # off-registry parity set in r5 to admit jaccard_join_prefix --
    # the corpus-wide EXACT tier subsumes the within-bucket check,
    # and the bucket-cap arm keeps its own pytest + off-registry twin.
    "jaccard_join_prefix": QuerySpec(
        q_jaccard_join_prefix, SQL_JACCARD_JOIN_PREFIX
    ),
    # simhash rotated to the off-registry parity set in r6 to admit
    # snapshot_timetravel (the snapshot storage layer's driver
    # CORRECTNESS row); hash-fingerprint near-dup evidence stays via
    # minhash_lsh_pairs (registry) + the off-registry simhash twin.
    "snapshot_timetravel": QuerySpec(
        q_snapshot_timetravel, SQL_SNAPSHOT_TIMETRAVEL
    ),
    "token_counts": QuerySpec(q_token_counts, SQL_TOKEN_COUNTS),
    "text_quality": QuerySpec(q_text_quality, SQL_TEXT_QUALITY),
    "lang_id": QuerySpec(q_lang_id, SQL_LANG_ID),
    "bm25_scores": QuerySpec(q_bm25_scores, SQL_BM25),
    "contamination_check": QuerySpec(q_contamination, SQL_CONTAMINATION),
    "embedding_topk": QuerySpec(q_embedding_topk, SQL_EMBEDDING_TOPK, True),
    # embedding_centroids rotated to the off-registry parity set in r8
    # to admit point_fetch (the scale-safe id fetch operator's driver
    # CORRECTNESS row, per the snapshot_timetravel/snapshot_cdc
    # precedent); grouped-centroid evidence stays via
    # embedding_near_dup (registry, same fit machinery) + the
    # off-registry DuckDB twin.
    "point_fetch": QuerySpec(q_point_fetch, SQL_POINT_FETCH),
    # lsh_ann rotated to the off-registry parity set in r8 to admit
    # ann_refine_sq8 (the in-index SQ8 refine tier's driver
    # CORRECTNESS row, per the point_fetch/snapshot_cdc precedent);
    # LSH-bucketed ANN evidence stays via the off-registry DuckDB
    # twin + tests/test_similarity_multiprobe.py (Hamming-1
    # multi-probe recall floors), and the ANN family keeps
    # embedding_topk / ivf_ann / ann_rerank_exact / knn_join_exact
    # driver rows.
    "ann_refine_sq8": QuerySpec(q_ann_refine_sq8, SQL_ANN_REFINE_SQ8),
    "tpch_q1": QuerySpec(q_tpch_q1, SQL_TPCH_Q1, True),
    "tpch_q3": QuerySpec(q_tpch_q3, SQL_TPCH_Q3, True),
    # events_windowed rotated to the off-registry parity set in r5 to
    # admit ngram_scrub (benchmark span decontamination); tumbling-
    # window evidence stays via session_windows + the off-registry twin.
    "ngram_scrub": QuerySpec(q_ngram_scrub, SQL_NGRAM_SCRUB),
    "multimodal_meta": QuerySpec(q_multimodal_meta, SQL_MULTIMODAL_META),
    "multimodal_features": QuerySpec(q_multimodal_features, SQL_MULTIMODAL_FEATURES),
    "partner_overlap": QuerySpec(q_partner_overlap, SQL_PARTNER_OVERLAP),
    "asof_last_click": QuerySpec(q_asof_last_click, SQL_ASOF_LAST_CLICK, True),
    "knn_join_exact": QuerySpec(q_knn_join_exact, SQL_KNN_JOIN_EXACT),
    "distinct_users_salted": QuerySpec(
        q_distinct_users_salted, SQL_DISTINCT_USERS_SALTED
    ),
    "dsir_weights": QuerySpec(q_dsir_weights, SQL_DSIR_WEIGHTS),
    "lm_perplexity": QuerySpec(q_lm_perplexity, SQL_LM_PERPLEXITY),
    "nb_quality_scores": QuerySpec(q_nb_quality_scores, SQL_NB_QUALITY_SCORES),
    "phrase_hits": QuerySpec(q_phrase_hits, SQL_PHRASE_HITS),
    "embedding_near_dup": QuerySpec(q_embedding_near_dup, SQL_EMBEDDING_NEAR_DUP),
    "tpch_q6": QuerySpec(q_tpch_q6, SQL_TPCH_Q6, True),
    "quality_quantile_filter": QuerySpec(
        q_quality_quantile_filter, SQL_QUALITY_QUANTILE_FILTER
    ),
    "substring_spans": QuerySpec(q_substring_spans, SQL_SUBSTRING_SPANS),
    "dup_span_removal": QuerySpec(q_dup_span_removal, SQL_DUP_SPAN_REMOVAL),
    "repetition_stats": QuerySpec(q_repetition_stats, SQL_REPETITION_STATS),
    "range_join_clicks": QuerySpec(q_range_join_clicks, SQL_RANGE_JOIN_CLICKS, True),
    # session_gaps rotated to the off-registry parity set in r7 to
    # admit snapshot_cdc (the change-data-feed's driver CORRECTNESS
    # row); gap/window evidence stays via session_windows (registry)
    # + the off-registry session_gaps twin.
    "snapshot_cdc": QuerySpec(q_snapshot_cdc, SQL_SNAPSHOT_CDC),
    # ann_rerank_exact rotated to the off-registry parity set in r9
    # to admit maxsim_topk: the corpus-fetch rerank was demoted to
    # an option in r8 (in-index SQ8 is the production refine, with
    # its own registry row ann_refine_sq8); the exact-rerank path
    # keeps its off-registry twin + tests/test_pq.py coverage.
    "frequent_tokens": QuerySpec(q_frequent_tokens, SQL_FREQUENT_TOKENS),
    # approx_distinct_users rotated to the off-registry parity set in
    # r9 to admit sq8_topk: the HLL shape is a generic built-in agg
    # whose exact twin distinct_users_salted keeps a registry row;
    # the sketch keeps its off-registry twin.
    "ivf_ann": QuerySpec(q_ivf_ann, SQL_IVF_ANN, True),
    # r9 rotation-ins: the two first-class ANN operators that landed
    # in r8 without driver rows (VERDICT r8 "What's missing" #1)
    "maxsim_topk": QuerySpec(q_maxsim_topk, SQL_MAXSIM_TOPK),
    "sq8_topk": QuerySpec(q_sq8_topk, SQL_SQ8_TOPK),
    # ivf_ann_kmeans (learned centroids) is exercised in pytest
    # (tests/test_msgpack_asof.py) -- the registry is capped at 50 so
    # every entry lands a driver CORRECTNESS row; the search path it
    # shares with ivf_ann is oracle-checked above.
}
