"""End-to-end training-corpus assembly: the one-call recipe chaining
the package's LLM-pipeline operators in their canonical order, with a
drop ledger at every stage (nothing is ever silently discarded --
the same posture as validation rejects and admission shedding).

    line-level boilerplate dedup (optional, RefinedWeb order)
      -> quality gate (gopher/C4, reasoned)
      -> learned gates (optional: CCNet LM-perplexity ceiling and/or
         NB classifier floor -- the heuristics-then-learned order the
         CCNet/DCLM recipes use: cheap narrow rules shed the bulk
         before the model joins run)
      -> exact dedup (md5 fingerprint, min-id survivor)
      -> near-dup clusters (MinHash LSH candidates -> connected
         components -> min-id survivor)
      -> deterministic split + token-budget packing + sharded write

Every stage is the already-tested operator (functions/quality.py,
operators/dedup.py, operators/components.py, operators/traindata.py);
this module only composes them and counts the drops. All assignment
stays a pure row function, so re-running over a grown corpus never
reshuffles previously-written shards (ingestion stability) -- and the
whole chain is the batch twin of the streaming
``start_ingest_dedup(quality=...)`` path.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from xmidt_event_streams_spark.functions.quality import c4_keep, gopher_keep
from xmidt_event_streams_spark.functions.text import fingerprint, token_count
from xmidt_event_streams_spark.operators.components import (
    dup_cluster_survivors,
)
from xmidt_event_streams_spark.operators.dedup import (
    minhash_lsh_candidates,
)
from xmidt_event_streams_spark.operators.traindata import (
    write_training_shards,
)


def build_training_corpus(
    df: DataFrame,
    output_path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    quality: str | None = "gopher+c4",
    dedup: str | None = "both",
    num_hashes: int = 8,
    bands: int = 4,
    shingle_n: int = 3,
    split_weights: dict[str, float] | None = None,
    n_shards: int = 16,
    pack_budget: int | None = None,
    canonicalize: bool = False,
    strip_html: bool = False,
    line_level_dedup: bool = False,
    lm_model=None,
    lm_max_ppl: float | None = None,
    nb_model=None,
    nb_min_score: float = 0.0,
    dsir_model=None,
    dsir_fraction: float | None = None,
    dsir_temperature: float = 1.0,
    dsir_seed: str = "dsir-0",
    near_prefer_col: str | None = None,
    decontaminate_against: DataFrame | None = None,
    decontaminate_min_agreement: float = 0.5,
    scrub_spans_against: DataFrame | None = None,
    scrub_window: int = 13,
    excise_duplicate_spans: bool = False,
    excise_window: int = 20,
    excise_min_occurrences: int = 2,
    excise_keep_first: bool = True,
) -> dict:
    """Run the full assembly and write the sharded corpus; returns the
    drop ledger:

        {"input", "lines_removed", "scrub_tokens_removed",
         "scrub_docs_touched", "excise_tokens_removed",
         "excise_docs_touched",
         "quality_dropped": {reason: n, ...},
         "lm_dropped", "classifier_dropped", "dsir_dropped",
         "decontaminated_dropped",
         "exact_dups_dropped", "near_dups_dropped", "written"}

    ``decontaminate_against`` (a reference/benchmark DataFrame with
    the same text/id columns) drops docs whose banded-MinHash
    agreement with any reference doc reaches
    ``decontaminate_min_agreement`` -- after the gates (don't
    signature shed docs), before dedup (a contaminated doc must not
    evict its clean near-twin as survivor).

    ``lines_removed`` counts LINES (not docs): line_level_dedup
    rewrites text in place, so the doc-count invariant
    written + drops == input is unaffected by it.

    Learned gates (both optional, both FIT BY THE CALLER on a trusted
    slice so this composition stays a pure consumer): ``lm_model`` (an
    operators/lm.NGramLM) with ``lm_max_ppl`` drops docs whose
    perplexity exceeds the ceiling -- including unscorable short docs,
    perplexity_filter's contract; ``nb_model`` (an
    operators/classifier.NaiveBayesModel) with ``nb_min_score`` drops
    docs whose log-odds fall below the floor. ``dsir_model`` (an
    operators/dsir.DsirModel) with ``dsir_fraction`` keeps the
    Gumbel-top-fraction by DSIR importance weight (ledger key
    "dsir_dropped"). It runs AFTER the hard gates (select from the
    clean pool) and BEFORE dedup -- note the order's cost: a
    heavily-duplicated target-like page can spend several selection
    slots before dedup collapses it to one survivor, so the written
    count lands somewhat UNDER fraction x gated-input on duplicate-
    heavy corpora (the ledger's near_dups_dropped makes the gap
    visible; pre-dedup the input yourself if the budget must be
    exact).

    ``quality``: None | "gopher" | "c4" | "gopher+c4" (reason = first
    failing rule, counted per reason). ``dedup``: None | "exact" |
    "near" | "both" -- near-dup survivors are the min-id member of
    each LSH/connected-components cluster, the same verdict the
    `dup_clusters` oracle checks; ``near_prefer_col`` switches the
    survivor rule to highest-value-of-that-column (ties min id) --
    keep the best copy, not an arbitrary one. Ledger counts are Spark aggregates
    (driver state is O(#reasons)), never collected row sets.

    Read the ledger before trusting the output: the C4 page rules
    assume natural prose -- a corpus without sentence punctuation
    (e.g. synthetic word-soup tables) drops ENTIRELY on
    too_few_sentences, which the ledger makes loud rather than
    silent.
    """
    if quality not in (None, "gopher", "c4", "gopher+c4"):
        raise ValueError(f"bad quality {quality!r}")
    if dedup not in (None, "exact", "near", "both"):
        raise ValueError(f"bad dedup {dedup!r}")

    if strip_html:
        # crawl-shaped inputs arrive as markup; extract prose FIRST so
        # canonicalization, line dedup, quality rules, and every dedup
        # tier all judge the text that will actually ship
        from xmidt_event_streams_spark.functions.text import html_to_text

        df = df.withColumn(text_col, html_to_text(text_col))

    if canonicalize:
        # Unicode-canonicalize AT ENTRY so quality rules, both dedup
        # tiers, and the written corpus all see the same form --
        # without this, compatibility variants ('file' vs the
        # fi-ligature) fingerprint differently and near-dup recall
        # silently drops on mixed-encoder corpora
        # (functions/text.canonical_text docstring)
        from xmidt_event_streams_spark.functions.text import canonical_text

        df = df.withColumn(text_col, canonical_text(text_col))

    ledger: dict = {"input": df.count()}
    kept = df
    _persisted = []
    # wall time per stage (each block ends on a materializing count,
    # so block wall time is that stage's cost). Recorded into the
    # returned ledger ONLY -- never the manifest, whose bit-identical-
    # re-run contract timings would break.
    stage_sec: dict = {}
    _t0 = time.perf_counter()

    def _stage(name):
        nonlocal _t0
        stage_sec[name] = round(time.perf_counter() - _t0, 3)
        _t0 = time.perf_counter()

    if line_level_dedup:
        # RefinedWeb order: boilerplate-line removal FIRST, so the
        # quality rules and both doc-level dedup tiers judge the text
        # that will actually ship. Hollowed-out docs (text -> '') are
        # not dropped here -- the quality gate (or the caller) owns
        # that policy; the ledger records the line count removed.
        from xmidt_event_streams_spark.operators.linededup import (
            line_dedup,
        )

        deduped = line_dedup(kept, text_col, id_col).persist()
        _persisted.append(deduped)
        ledger["lines_removed"] = (
            deduped.agg(F.sum("n_lines_removed").alias("s")).collect()[0]["s"]
            or 0
        )
        kept = deduped.drop("n_lines_removed")
        _stage("line_dedup")
    else:
        ledger["lines_removed"] = 0

    if scrub_spans_against is not None:
        # benchmark n-gram scrub EARLY (with the other text rewrite),
        # so the quality rules, learned gates, and both dedup tiers
        # judge the text that will actually ship. Case-insensitive
        # match, case-preserving rewrite, fixpoint (excision can
        # stitch neighbors into a fresh match -- a single pass may
        # ship benchmark content), touched-only (the corpus-sized
        # rebuild is skipped for clean docs; apply_clean_text keeps
        # untouched rows' exact bytes). PRECONDITION inherited from
        # the rebuild: ids unique at this point in the chain.
        # Token counts, not docs: the doc-count invariant
        # written + drops == input is unaffected.
        from xmidt_event_streams_spark.operators.dedup import (
            apply_clean_text,
            remove_contaminated_spans,
        )

        # localCheckpoint, not persist: the scrub's first-pass plan
        # spans the whole corpus (window relation + excise), and a
        # cached-but-not-truncated lineage re-enters every downstream
        # stage's plan. The touched relation is small by construction;
        # materialize it once and give downstream a leaf. (Measured:
        # persist left dsir/exact/near 3-8x slower at sf0.1.)
        scrubbed = remove_contaminated_spans(
            kept,
            scrub_spans_against,
            text_col=text_col,
            id_col=id_col,
            window=scrub_window,
            preserve_case=True,
            touched_only=True,
            fixpoint=True,
        ).localCheckpoint(eager=True)
        stats = scrubbed.agg(
            F.sum("n_removed").alias("toks"),
            F.count("*").alias("docs"),
        ).collect()[0]
        ledger["scrub_tokens_removed"] = int(stats["toks"] or 0)
        ledger["scrub_docs_touched"] = int(stats["docs"] or 0)
        kept = apply_clean_text(kept, scrubbed, text_col, id_col)
        _stage("ngram_scrub")
    else:
        ledger["scrub_tokens_removed"] = 0
        ledger["scrub_docs_touched"] = 0

    if quality is not None:
        reason = F.lit(None).cast("string")
        if "gopher" in quality:
            _, g = gopher_keep(text_col)
            reason = F.coalesce(reason, g)
        if "c4" in quality:
            _, c = c4_keep(text_col)
            reason = F.coalesce(reason, c)
        marked = kept.withColumn("_q_reason", reason).persist()
        _persisted.append(marked)
        ledger["quality_dropped"] = {
            r["_q_reason"]: r["n"]
            for r in marked.filter(F.col("_q_reason").isNotNull())
            .groupBy("_q_reason")
            .agg(F.count("*").alias("n"))
            .collect()
        }
        kept = marked.filter(F.col("_q_reason").isNull()).drop("_q_reason")
        _stage("quality")
    else:
        ledger["quality_dropped"] = {}

    if lm_model is not None:
        if lm_max_ppl is None:
            raise ValueError("lm_model requires lm_max_ppl")
        from xmidt_event_streams_spark.operators.lm import lm_perplexity

        before = kept.count()
        # semi-join on the passing ids (internal score relation, never
        # merged into the corpus schema): a corpus that carries its own
        # 'ppl'/'n_bigrams' columns passes through untouched
        passing_ids = (
            lm_perplexity(kept, lm_model, text_col, id_col)
            .filter(F.col("ppl") <= F.lit(lm_max_ppl))
            .select(id_col)
        )
        # each gate stage persists its survivors: the ledger's count
        # action populates the cache, so the NEXT stage (and the final
        # write) builds on materialized rows instead of re-executing
        # every prior gate's model joins per downstream action
        kept = kept.join(passing_ids, id_col).persist()
        _persisted.append(kept)
        ledger["lm_dropped"] = before - kept.count()
        _stage("lm_gate")
    else:
        ledger["lm_dropped"] = 0

    if nb_model is not None:
        from xmidt_event_streams_spark.operators.classifier import nb_score

        before = kept.count()
        passing = (
            nb_score(kept, nb_model, text_col, id_col)
            .filter(F.col("score") >= F.lit(nb_min_score))
            .select(id_col)
        )
        kept = kept.join(passing, id_col).persist()
        _persisted.append(kept)
        ledger["classifier_dropped"] = before - kept.count()
        _stage("nb_gate")
    else:
        ledger["classifier_dropped"] = 0

    if dsir_model is not None:
        if dsir_fraction is None:
            raise ValueError("dsir_model requires dsir_fraction")
        from xmidt_event_streams_spark.operators.dsir import (
            dsir_log_weights,
            dsir_sample,
        )

        before = kept.count()
        scored = dsir_log_weights(kept, dsir_model, text_col, id_col)
        picked = dsir_sample(
            scored,
            fraction=dsir_fraction,
            id_col=id_col,
            temperature=dsir_temperature,
            seed=dsir_seed,
        ).select(id_col)
        kept = kept.join(picked, id_col).persist()
        _persisted.append(kept)
        ledger["dsir_dropped"] = before - kept.count()
        _stage("dsir")
    else:
        ledger["dsir_dropped"] = 0

    if decontaminate_against is not None:
        # benchmark decontamination AFTER the quality/learned gates
        # (no reason to signature docs those gates already shed) and
        # BEFORE dedup (a contaminated doc must not become the
        # survivor that evicts its clean near-twin)
        from xmidt_event_streams_spark.operators.incremental import (
            decontaminate_near_dups,
        )

        before = kept.count()
        kept, _contaminated = decontaminate_near_dups(
            kept,
            decontaminate_against,
            min_agreement=decontaminate_min_agreement,
            text_col=text_col,
            id_col=id_col,
            num_hashes=num_hashes,
            bands=bands,
            shingle_n=shingle_n,
        )
        kept = kept.persist()
        _persisted.append(kept)
        ledger["decontaminated_dropped"] = before - kept.count()
        _stage("decontaminate")
    else:
        ledger["decontaminated_dropped"] = 0

    if dedup in ("exact", "both"):
        # min-id survivor per md5 fingerprint (exact_dedup's rule,
        # kept inline so full rows survive without a second join)
        from pyspark.sql import Window

        fp = kept.withColumn("_fp", fingerprint(text_col))
        survivor = F.min(id_col).over(Window.partitionBy("_fp"))
        before = (
            ledger["input"]
            - sum(ledger["quality_dropped"].values())
            - ledger["lm_dropped"]
            - ledger["classifier_dropped"]
            - ledger["dsir_dropped"]
            - ledger["decontaminated_dropped"]
        )
        kept = (
            fp.withColumn("_surv", survivor)
            .filter(F.col(id_col) == F.col("_surv"))
            .drop("_fp", "_surv")
        )
        after = kept.count()
        ledger["exact_dups_dropped"] = before - after
        _stage("exact_dedup")
    else:
        ledger["exact_dups_dropped"] = 0

    if dedup in ("near", "both"):
        # Truncate the gate lineage before the LSH self-join: the
        # candidate join embeds its input subtree on BOTH sides, and
        # after several model-join gates (LM + NB + DSIR each splice
        # vocab-relation joins into the plan) the doubled tree alone
        # can exhaust the driver during planning -- the same
        # plan-volume failure mode lexical_semdedup documents. The
        # rows are already materialized by the per-stage persists, so
        # the eager localCheckpoint re-serializes rows, not recompute,
        # and every downstream plan starts from a leaf.
        kept = kept.localCheckpoint(eager=True)
        before = kept.count()
        pairs = minhash_lsh_candidates(
            kept, text_col, id_col, num_hashes, bands, shingle_n
        )
        verdicts = dup_cluster_survivors(
            kept, pairs, id_col, prefer_col=near_prefer_col
        )
        kept = kept.join(
            verdicts.filter("is_survivor").select(id_col), id_col
        )
        # truncate AGAIN after the survivor join: downstream stages
        # (span excise scans twice, apply_clean_text joins, the token
        # count and shard write scan once more) would each re-run the
        # LSH-candidate + survivor join otherwise -- measured 14 s of
        # the 22 s span_excise stage at the 4.7k-doc bench was exactly
        # this recompute. The count below doubles as the checkpoint's
        # materialization.
        kept = kept.localCheckpoint(eager=False)
        after = kept.count()
        ledger["near_dups_dropped"] = before - after
        _stage("near_dedup")
    else:
        ledger["near_dups_dropped"] = 0

    if excise_duplicate_spans:
        # within-corpus span excision AFTER doc-level dedup (excise
        # among survivors only -- cutting spans from docs the dedup
        # tiers are about to drop is wasted work), BEFORE the token
        # count that prices the shards. Same replace-touched-only
        # discipline as the benchmark scrub: untouched rows keep
        # their exact bytes.
        from xmidt_event_streams_spark.operators.dedup import (
            apply_clean_text,
            remove_duplicate_spans,
        )

        # localCheckpoint for the same lineage-truncation reason as
        # the ngram_scrub stage above
        excised = remove_duplicate_spans(
            kept,
            text_col=text_col,
            id_col=id_col,
            window=excise_window,
            min_occurrences=excise_min_occurrences,
            keep_first=excise_keep_first,
            preserve_case=True,
            touched_only=True,
        ).localCheckpoint(eager=True)
        stats = excised.agg(
            F.sum("n_removed").alias("toks"),
            F.count("*").alias("docs"),
        ).collect()[0]
        ledger["excise_tokens_removed"] = int(stats["toks"] or 0)
        ledger["excise_docs_touched"] = int(stats["docs"] or 0)
        kept = apply_clean_text(kept, excised, text_col, id_col)
        _stage("span_excise")
    else:
        ledger["excise_tokens_removed"] = 0
        ledger["excise_docs_touched"] = 0

    try:
        staged = kept.withColumn("n_tokens", token_count(text_col))
        write_training_shards(
            staged,
            output_path,
            token_col="n_tokens",
            id_col=id_col,
            weights=split_weights,
            n_shards=n_shards,
            pack_budget=pack_budget,
        )
        ledger["written"] = staged.count()
        _stage("shard_write")
        # reproducibility manifest: the full recipe + ledger stamped
        # next to the shards (Hadoop FS sidecar -- object-store safe,
        # invisible to parquet readers). Re-running the same recipe on
        # the same input must produce this manifest bit-identically;
        # model gates are recorded by presence (the fit relations are
        # DataFrames -- callers version those corpora separately).
        from xmidt_event_streams_spark.fsutil import write_json_sidecar

        write_json_sidecar(
            df.sparkSession,
            output_path,
            "_xes_corpus_manifest.json",
            {
                "recipe": {
                    "quality": quality,
                    "dedup": dedup,
                    "num_hashes": num_hashes,
                    "bands": bands,
                    "shingle_n": shingle_n,
                    "split_weights": split_weights,
                    "n_shards": n_shards,
                    "pack_budget": pack_budget,
                    "canonicalize": canonicalize,
                    "strip_html": strip_html,
                    "line_level_dedup": line_level_dedup,
                    "lm_gate": lm_model is not None,
                    "lm_max_ppl": lm_max_ppl,
                    "nb_gate": nb_model is not None,
                    "nb_min_score": nb_min_score if nb_model is not None else None,
                    "dsir_gate": dsir_model is not None,
                    "dsir_fraction": (
                        dsir_fraction if dsir_model is not None else None
                    ),
                    "dsir_temperature": (
                        dsir_temperature if dsir_model is not None else None
                    ),
                    "dsir_seed": dsir_seed if dsir_model is not None else None,
                    "near_prefer_col": near_prefer_col,
                    "decontaminate": decontaminate_against is not None,
                    "decontaminate_min_agreement": (
                        decontaminate_min_agreement
                        if decontaminate_against is not None
                        else None
                    ),
                    "scrub_spans": scrub_spans_against is not None,
                    "scrub_window": (
                        scrub_window
                        if scrub_spans_against is not None
                        else None
                    ),
                    "excise_duplicate_spans": excise_duplicate_spans,
                    "excise_window": (
                        excise_window if excise_duplicate_spans else None
                    ),
                    "excise_min_occurrences": (
                        excise_min_occurrences
                        if excise_duplicate_spans
                        else None
                    ),
                    "excise_keep_first": (
                        excise_keep_first if excise_duplicate_spans else None
                    ),
                    "text_col": text_col,
                    "id_col": id_col,
                },
                "ledger": ledger,
            },
        )
    finally:
        for p in _persisted:
            p.unpersist()
    ledger["stage_sec"] = stage_sec
    return ledger


def refresh_corpus(
    spark,
    new_docs: DataFrame,
    corpus_path: str,
    index_path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    quality="gopher+c4",  # str rule-set, a gate callable, or None
    min_agreement: float = 0.5,
    num_hashes: int = 8,
    bands: int = 4,
    shingle_n: int = 3,
    drift_cols: tuple[str, ...] = (),
    compact_on_recrawl: bool = False,
    canonicalize: bool = False,
) -> dict:
    """One maintenance cycle of a LIVE corpus: the batch composition
    of the round's operational operators, with one ledger.

        quality gate (string rule-set OR a gate callable --
        lm_quality_gate / nb_quality_gate / chain_gates, the
        start_ingest_dedup protocol; failing reasons land in the
        quality_dropped ledger) -> incremental dedup vs the materialized MinHash
        index -> MERGE upsert of survivors into the keyed corpus
        table -> index append -> PSI drift report vs the pre-refresh
        corpus

    vs :func:`build_training_corpus` (one-shot, from-scratch): this
    never rescans the existing corpus -- dedup probes the
    prefix-partitioned index (cost tracks batch size), the upsert
    rewrites only touched buckets, and the drift gate is two
    bounded aggregates. The corpus at ``corpus_path`` must be a
    keyed table (operators/upsert.py); the index must exist
    (write_minhash_index / init_minhash_index).

    A new doc whose id ALREADY EXISTS in the corpus is a re-crawl:
    it replaces the stored row (upsert semantics) and is not a
    "duplicate" -- the index marks near-dups of OTHER ids only
    (``dup_of != id``). Each re-crawl leaves the OLD text's signature
    rows in the index (appends never rewrite); a later doc similar to
    the replaced text would false-drop against that stale signature.
    ``compact_on_recrawl=True`` closes the gap exactly: re-crawled
    ids are tombstoned out of the index (full prefix-partition
    rewrite -- compact_minhash_index) before the new signatures
    append. The default keeps cycles batch-sized and instead ledgers
    the exposure as ``stale_signatures`` (cumulative staleness ==
    the running sum) -- schedule a tombstone compaction when it
    grows. Returns the ledger:

        {"input", "quality_dropped": {reason: n}, "dup_dropped",
         "upserts", "touched_buckets", "recrawls",
         "stale_signatures", "drift": [psi_report rows]}
    """
    from xmidt_event_streams_spark.operators.incremental import (
        append_to_minhash_index,
        compact_minhash_index,
        incremental_dedup_mark,
    )
    from xmidt_event_streams_spark.operators.drift import psi_report
    from xmidt_event_streams_spark.operators.upsert import (
        merge_upsert,
        read_keyed_table,
    )

    if canonicalize:
        # same entry-point canonicalization as build_training_corpus;
        # the seed corpus and index must have been built canonical
        # too (signatures of raw vs canonical text do not match)
        from xmidt_event_streams_spark.functions.text import canonical_text

        new_docs = new_docs.withColumn(text_col, canonical_text(text_col))

    ledger: dict = {"input": new_docs.count()}
    _persisted = []
    try:
        kept = new_docs
        if callable(quality):
            # the gate protocol (lm_quality_gate / nb_quality_gate /
            # chain_gates): failing side -> reason counts, same ledger
            # key as the string-rule arm
            passing, failing = quality(kept)
            if failing is not None:
                ledger["quality_dropped"] = {
                    r["reject_reason"]: r["n"]
                    for r in failing.groupBy("reject_reason")
                    .agg(F.count("*").alias("n"))
                    .collect()
                }
            else:
                ledger["quality_dropped"] = {}
            kept = passing
        elif quality is not None:
            reason = F.lit(None).cast("string")
            if "gopher" in quality:
                _, g = gopher_keep(text_col)
                reason = F.coalesce(reason, g)
            if "c4" in quality:
                _, c = c4_keep(text_col)
                reason = F.coalesce(reason, c)
            marked = kept.withColumn("_q_reason", reason).persist()
            _persisted.append(marked)
            ledger["quality_dropped"] = {
                r["_q_reason"]: r["n"]
                for r in marked.filter(F.col("_q_reason").isNotNull())
                .groupBy("_q_reason")
                .agg(F.count("*").alias("n"))
                .collect()
            }
            kept = marked.filter(F.col("_q_reason").isNull()).drop("_q_reason")
        else:
            ledger["quality_dropped"] = {}

        verdicts = incremental_dedup_mark(
            spark,
            index_path,
            kept,
            min_agreement,
            text_col,
            id_col,
            num_hashes,
            bands,
            shingle_n,
        )
        # a re-crawl (same id, near-identical text) probes as a dup
        # OF ITS OWN stored row -- that is an update, not a
        # duplicate: keep it and let the upsert replace the stored
        # version
        survivors = kept.join(
            verdicts.filter(
                F.col("is_unique") | (F.col("dup_of") == F.col(id_col))
            ).select(id_col),
            id_col,
            "left_semi",
        ).persist()
        _persisted.append(survivors)
        n_surv = survivors.count()
        ledger["dup_dropped"] = ledger["input"] - sum(
            ledger["quality_dropped"].values()
        ) - n_surv

        if n_surv == 0:
            # an all-duplicate / all-rejected batch is a normal
            # live-corpus event, not a job failure: nothing to drift-
            # gate (psi requires a non-empty current), upsert, or
            # index
            ledger.update(
                {
                    "upserts": 0,
                    "touched_buckets": 0,
                    "recrawls": 0,
                    "stale_signatures": 0,
                    "drift": [],
                }
            )
            return ledger

        # re-crawled ids: survivors already present in the corpus
        # (bounded by batch size -- collected for the tombstone path)
        current = read_keyed_table(spark, corpus_path)
        recrawled = [
            r[0]
            for r in survivors.select(id_col)
            .join(current.select(id_col), id_col, "left_semi")
            .collect()
        ]
        ledger["recrawls"] = len(recrawled)

        # drift gate BEFORE mutating the corpus: new accepted docs vs
        # the current corpus
        if drift_cols:
            ledger["drift"] = psi_report(current, survivors, list(drift_cols))
        else:
            ledger["drift"] = []

        stats = merge_upsert(spark, corpus_path, survivors)
        ledger["upserts"] = stats["upserts"]
        ledger["touched_buckets"] = len(stats["touched_buckets"])

        if recrawled and compact_on_recrawl:
            # drop the replaced texts' stale signature rows BEFORE
            # appending the new ones (compact removes every row of a
            # tombstoned id; the re-crawls' fresh signatures go in
            # with the append below)
            compact_minhash_index(spark, index_path, tombstones=recrawled)
            ledger["stale_signatures"] = 0
        else:
            ledger["stale_signatures"] = len(recrawled)

        append_to_minhash_index(
            survivors, index_path, text_col, id_col, num_hashes, bands, shingle_n
        )
        return ledger
    finally:
        for df in _persisted:
            df.unpersist()


def chain_gates(*gates):
    """Compose gate callables (``batch -> (passing, failing_or_None)``)
    left to right: each gate sees only the previous gates' survivors;
    failing sides union (every doc keeps the FIRST reason that shed
    it, CCNet/DCLM short-circuit order). The result is itself a gate
    -- pass it to ``start_ingest_dedup(quality=...)`` or call it
    directly in batch."""

    def gate(batch: DataFrame):
        passing, failed = batch, None
        for g in gates:
            passing, f = g(passing)
            if f is not None:
                failed = f if failed is None else failed.unionByName(
                    f, allowMissingColumns=True
                )
        return passing, failed

    return gate


def span_scrub_gate(
    benchmark: DataFrame,
    window: int = 13,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Gate-protocol wrapper for the benchmark n-gram scrub
    (operators/dedup.remove_contaminated_spans): rewrites the batch's
    text case-preservingly, REJECTS NOTHING -- returns
    ``(rewritten, None)``. Compose with :func:`chain_gates` (put it
    FIRST so learned gates score the text that will actually ship) or
    pass straight to ``start_ingest_dedup(quality=...)`` for
    scrub-on-ingest: every micro-batch is cut against the benchmark
    before the dedup index sees it.

    The benchmark reduces to its distinct window hashes inside each
    batch plan -- eval-set-sized, broadcast by the operator's default,
    so the per-trigger cost tracks the batch, not the benchmark
    corpus product. Only touched docs get their text replaced;
    untouched rows keep their exact bytes.
    """
    from xmidt_event_streams_spark.operators.dedup import (
        apply_clean_text,
        remove_contaminated_spans,
    )

    def gate(batch: DataFrame):
        scrubbed = remove_contaminated_spans(
            batch,
            benchmark,
            text_col=text_col,
            id_col=id_col,
            window=window,
            preserve_case=True,
            touched_only=True,
            fixpoint=True,
        )
        return apply_clean_text(batch, scrubbed, text_col, id_col), None

    return gate


def corpus_diff(
    old: DataFrame,
    new: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Release-to-release diff verdict: what changed between two
    corpus snapshots, per document -- the first thing to run before
    shipping a refreshed dataset (and the companion to
    :func:`corpus_datasheet`'s per-snapshot card).

    Output: (doc_id, status in added|removed|changed|unchanged,
    tokens_before, tokens_after) -- nulls for the absent side.
    'changed' is fingerprint-based (md5 of normalized text), so
    whitespace-only edits don't count as changes.

    PRECONDITION: each snapshot is unique on ``id_col`` (a keyed
    corpus table's contract) -- duplicate ids multiply the outer
    join's verdict rows and inflate the aggregates.

    Plan: two narrow projections (fingerprint + token count per row)
    and ONE full-outer shuffle join on the id -- the minimum the
    question costs. Presence is tested with explicit marker columns,
    NOT fingerprint nullness: a row whose text is null still EXISTS
    in its snapshot (null-text on one side is 'changed', on both
    sides 'unchanged'). Aggregate the verdicts for the release note:
    ``diff.groupBy("status").count()`` and
    ``diff.agg(F.sum(F.coalesce("tokens_after", F.lit(0)) -
    F.coalesce("tokens_before", F.lit(0))))``.
    """
    o = old.select(
        F.col(id_col),
        F.lit(True).alias("_in_a"),
        fingerprint(text_col).alias("_fp_a"),
        token_count(text_col).alias("tokens_before"),
    )
    n = new.select(
        F.col(id_col),
        F.lit(True).alias("_in_b"),
        fingerprint(text_col).alias("_fp_b"),
        token_count(text_col).alias("tokens_after"),
    )
    return (
        o.join(n, id_col, "full_outer")
        .withColumn(
            "status",
            F.when(F.col("_in_a").isNull(), F.lit("added"))
            .when(F.col("_in_b").isNull(), F.lit("removed"))
            .when(
                F.col("_fp_a").eqNullSafe(F.col("_fp_b")),
                F.lit("unchanged"),
            )
            .otherwise(F.lit("changed")),
        )
        .select(id_col, "status", "tokens_before", "tokens_after")
    )


def corpus_datasheet(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> dict:
    """One-call corpus "data card": the summary a dataset release
    ships (Gebru et al., Datasheets for Datasets, arXiv:1803.09010)
    and the first thing to diff between two ingest snapshots.

    Returns::

        {"n_docs", "empty_docs",
         "token_stats": {"total", "p50", "p90", "p99", "max"},
         "char_stats":  {"total", "p50", "max"},
         "lang_mix":    {lang: n_docs, ...}        (heuristic lang-ID),
         "exact_dup_fraction",                      (1 - distinct/total)
         "quality_fail": {first_failing_rule: n}}   (gopher rules)

    Cost: one narrow projection (tokens/fingerprint/lang/quality are
    pure row functions) feeding one global aggregate, one lang-mix
    aggregate (bounded by the language list), one quality aggregate
    (bounded by the rule list). Driver state is the report dict --
    O(langs + rules) scalars. No joins; at 100 TB this is three
    scan-bound passes over one cached projection.
    """
    from xmidt_event_streams_spark.functions.quality import gopher_keep
    from xmidt_event_streams_spark.functions.text import (
        fingerprint,
        predict_lang,
    )

    _, reason = gopher_keep(text_col)
    proj = df.select(
        F.col(id_col),
        token_count(text_col).alias("_nt"),
        F.length(text_col).alias("_nc"),
        fingerprint(text_col).alias("_fp"),
        predict_lang(text_col).alias("_lang"),
        reason.alias("_qreason"),
    ).persist()
    try:
        g = proj.agg(
            F.count("*").alias("n_docs"),
            F.sum(F.when(F.col("_nt") == 0, 1).otherwise(0)).alias("empty"),
            F.sum("_nt").alias("tok_total"),
            F.percentile_approx("_nt", [0.5, 0.9, 0.99]).alias("tok_p"),
            F.max("_nt").alias("tok_max"),
            F.sum("_nc").alias("chr_total"),
            F.percentile_approx("_nc", 0.5).alias("chr_p50"),
            F.max("_nc").alias("chr_max"),
            F.count_distinct("_fp").alias("n_fp"),
        ).collect()[0]
        lang_mix = {
            r["_lang"]: r["n"]
            for r in proj.groupBy("_lang").agg(F.count("*").alias("n")).collect()
        }
        quality_fail = {
            r["_qreason"]: r["n"]
            for r in proj.filter(F.col("_qreason").isNotNull())
            .groupBy("_qreason")
            .agg(F.count("*").alias("n"))
            .collect()
        }
        n = g["n_docs"]
        return {
            "n_docs": n,
            "empty_docs": g["empty"],
            "token_stats": {
                "total": g["tok_total"],
                "p50": g["tok_p"][0],
                "p90": g["tok_p"][1],
                "p99": g["tok_p"][2],
                "max": g["tok_max"],
            },
            "char_stats": {
                "total": g["chr_total"],
                "p50": g["chr_p50"],
                "max": g["chr_max"],
            },
            "lang_mix": lang_mix,
            "exact_dup_fraction": (
                round(1.0 - g["n_fp"] / n, 6) if n else 0.0
            ),
            "quality_fail": quality_fail,
        }
    finally:
        proj.unpersist()
