"""Physical-plan quality gates (SURVEY §4 / §7 risk 6).

These tests pin the *plan shape*, not just results — the properties that
decide whether the same code survives a 100 TB input:

- filters and column projections reach the parquet scan (PushedFilters /
  ReadSchema pruning);
- the hot path contains no row-at-a-time Python (BatchEvalPython); only
  Arrow-vectorized exchange (ArrowEvalPython / mapInPandas) is allowed,
  and only in the operators documented to use it;
- single-pass routing produces ONE scan, not one per sink;
- the enrich join is a BroadcastHashJoin (no shuffle of the fact side).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_filter_pushdown_reaches_scan(spark):
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    q = ev.filter(F.col("event_type") == "error").select("event_id", "ts")
    plan = _plan(q)
    assert "PushedFilters: [IsNotNull(event_type), EqualTo(event_type,error)" in plan


def test_column_pruning_reaches_scan(spark):
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    q = ev.select("event_id", "event_type")
    plan = _plan(q)
    assert "ReadSchema: struct<event_id:bigint,event_type:string>" in plan


def test_flagship_has_no_rowwise_python(spark):
    from opentelemetry_collector_spark.plans.queries import q00_pipeline_e2e

    plan = _plan(q00_pipeline_e2e(spark, SF_DIR))
    assert "BatchEvalPython" not in plan  # row-at-a-time Python UDF
    assert "ArrowEvalPython" not in plan  # flagship is 100% JVM expressions
    assert "PythonMapInArrow" not in plan


def test_flagship_enrich_is_broadcast_join(spark):
    from opentelemetry_collector_spark.plans.queries import q00_pipeline_e2e

    plan = _plan(q00_pipeline_e2e(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_single_pass_routing_scans_once(spark):
    from opentelemetry_collector_spark.plans.queries import _routes
    from opentelemetry_collector_spark.plans.route import route_counts
    from opentelemetry_collector_spark.sources.transcripts import from_events

    plan = _plan(route_counts(from_events(spark, SF_DIR), _routes()))
    assert plan.count("FileScan parquet") == 1


def test_attribute_actions_single_projection_no_shuffle(spark, tiny):
    from opentelemetry_collector_spark.operators.attributes import Action, apply_actions

    q = apply_actions(
        tiny,
        [
            Action("env", "insert", value="prod"),
            Action("rc", "upsert", from_attribute="env"),
            Action("rc", "hash"),
        ],
    )
    plan = _plan(q)
    assert "Exchange" not in plan  # pure projection chain
    assert "BatchEvalPython" not in plan


def test_grok_pack_uses_arrow_not_rowwise(spark, tiny):
    from opentelemetry_collector_spark.operators.parse import grok_pack

    plan = _plan(grok_pack(tiny, "text", [r"error code=(?P<code>\d+)"]))
    assert "BatchEvalPython" not in plan
    # mapInPandas shows up as MapInPandas (Arrow-batched)
    assert "MapInPandas" in plan


def test_turn_counts_partial_aggregation(spark):
    from opentelemetry_collector_spark.operators.aggregate import turn_counts
    from opentelemetry_collector_spark.sources.transcripts import from_events

    plan = _plan(turn_counts(from_events(spark, SF_DIR)))
    # map-side partial agg before the exchange, final after (two HashAggregates)
    assert plan.count("HashAggregate") >= 2


def test_no_rowwise_udf_usage_in_source_tree():
    """Static gate: no `F.udf(`/`@udf` or rdd.map anywhere in the package
    (SURVEY §7 risk 6 — pandas_udf/mapInPandas only)."""
    import pathlib

    root = pathlib.Path(__file__).resolve().parent.parent / "opentelemetry_collector_spark"
    offenders = []
    for p in root.rglob("*.py"):
        src = p.read_text()
        if "F.udf(" in src or "@udf" in src or ".rdd.map" in src or "functions.udf(" in src:
            offenders.append(str(p))
    assert not offenders, f"row-wise Python found in: {offenders}"


def test_stratified_sample_rank_limit_pushdown(spark):
    """Exact-k stratified sampling must keep only k rows per stratum per
    map task BEFORE the exchange (Partial WindowGroupLimit), so the
    shuffle is O(k * strata * tasks), never the corpus."""
    from opentelemetry_collector_spark.operators.sample import stratified_sample

    df = spark.range(10000).select(
        (F.col("id") % 5).cast("string").alias("role"), F.col("id").cast("string").alias("sid")
    )
    plan = _plan(stratified_sample(df, ["role"], 7, "sid"))
    assert "WindowGroupLimit" in plan
    partial_pos = plan.find("row_number(), 7, Partial")
    exch_pos = plan.find("Exchange hashpartitioning(role")
    assert partial_pos != -1 and exch_pos != -1
    # plan prints top-down: the Partial limit appears BELOW (after) the
    # exchange line, i.e. upstream of it in dataflow
    assert partial_pos > exch_pos


def test_pii_redact_single_codegen_projection(spark, tiny):
    """All four count regexes + the replace chain must stay ONE JVM
    projection: no shuffle, no Python — redaction is a per-row rewrite of
    the corpus hot loop."""
    from opentelemetry_collector_spark.operators.pii import redact_pii

    plan = _plan(redact_pii(tiny))
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_repetition_metrics_partial_aggs_no_python(spark, small):
    """Bigram stats must be the explode -> two-level aggregate shape (every
    Exchange fed by a partial HashAggregate), never a per-doc quadratic
    HOF; word stats ride the same projection."""
    from opentelemetry_collector_spark.operators.text import repetition_metrics

    plan = _plan(repetition_metrics(small.withColumnRenamed("conv_id", "doc_id"), "doc_id"))
    assert "Generate explode" in plan
    assert plan.count("HashAggregate") >= 4  # partial+final at both levels
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_decontaminate_broadcasts_eval_grams(spark, small):
    """The eval gram set must broadcast: the corpus-side probe is a
    BroadcastHashJoin, so the training text is never shuffled to match."""
    from opentelemetry_collector_spark.operators.contamination import decontaminate

    docs = small.withColumnRenamed("conv_id", "doc_id")
    ev = docs.limit(5)
    plan = _plan(decontaminate(docs, ev, "doc_id", n=3))
    assert "BroadcastHashJoin" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_vocab_coverage_topk_heap_and_broadcast_probe(spark, small):
    """Top-k vocabulary must come from TakeOrderedAndProject (per-task
    heaps of k, never a global sort) and the coverage probe must broadcast
    the k-row vocab against the token postings."""
    from opentelemetry_collector_spark.operators.text import vocab_coverage

    plan = _plan(vocab_coverage(small.withColumnRenamed("conv_id", "doc_id"), "doc_id", top_k=10))
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastHashJoin" in plan
    assert "Exchange rangepartitioning" not in plan  # no global sort


def test_pack_sequences_arrow_grouping_and_partial_rollup(spark, small):
    """Packing is ONE corpus-carrying shuffle (groupBy conv_id into
    FlatMapGroupsInPandas, Arrow path, no row-wise Python). The chunk
    rollup's own exchange is partial-aggregated first, so it carries only
    per-chunk rows (FlatMapGroupsInPandas reports no output partitioning,
    so Catalyst cannot elide it — acceptable because partials compress it
    to |chunks|)."""
    from opentelemetry_collector_spark.operators.packing import chunk_stats, pack_sequences
    from opentelemetry_collector_spark.operators.text import token_count

    t = small.withColumn("tok", token_count(F.col("text")))
    plan = _plan(chunk_stats(pack_sequences(t, 120, "tok"), "tok"))
    assert "FlatMapGroupsInPandas" in plan
    assert "BatchEvalPython" not in plan
    assert plan.count("Exchange") == 2
    assert "partial_count" in plan and "partial_sum" in plan


def test_asof_enrich_no_join_single_window_exchange(spark, small):
    """The as-of enrich must never plan a join: union + ONE
    hashpartitioning(conv_id) window over the side-tagged sort."""
    from opentelemetry_collector_spark.operators.asof import asof_join

    left = small.filter(F.col("role") == "assistant").select("conv_id", "turn_idx")
    right = small.filter(F.col("role") == "user").select(
        "conv_id", "turn_idx",
        F.col("turn_idx").alias("prompt_idx"), F.col("text").alias("prompt_text"),
    )
    plan = _plan(asof_join(left, right, ["conv_id"], "turn_idx",
                           ["prompt_idx", "prompt_text"]))
    assert "Join" not in plan
    assert plan.count("Exchange") == 1
    assert "hashpartitioning(conv_id" in plan


def test_rollup_single_scan_expand_partial_agg(spark, small):
    """All rollup levels in one pass: one Expand feeding a partial
    HashAggregate before the single exchange — never one job per level."""
    from opentelemetry_collector_spark.plans.queries import _routes
    from opentelemetry_collector_spark.plans.route import route_tagged

    tagged = route_tagged(small, _routes())
    plan = _plan(
        tagged.rollup("sink", "role").agg(F.count(F.lit(1)).alias("n_turns"))
    )
    assert "Expand" in plan
    assert plan.count("Exchange") == 1
    assert "partial_count" in plan


def test_tfidf_rank_limit_pushdown_and_broadcast_docfreq(spark):
    """q68: each map task keeps only k terms per source BEFORE the exchange
    (Partial WindowGroupLimit), and the corpus-global doc_freq side attaches
    as a broadcast join — postings are never shuffled for the ranking."""
    from opentelemetry_collector_spark.operators.text import tfidf_top_terms

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    plan = _plan(tfidf_top_terms(docs, "source", "doc_id", top_k=5))
    assert "WindowGroupLimit" in plan and "Partial" in plan
    assert "BroadcastHashJoin" in plan
    assert "BatchEvalPython" not in plan
    # the corpus scan+explode runs ONCE: both tf and doc_freq branches read
    # the persisted postings aggregate, not the parquet scan
    assert "InMemoryTableScan" in plan


def test_linear_score_broadcast_vocab_partial_agg(spark, small):
    """Classifier inference must probe the vocab via BroadcastHashJoin
    (never shuffle the corpus to meet the vocabulary) and partial-aggregate
    the per-doc sum before its single exchange — the shuffle carries one
    row per doc, independent of token count."""
    from opentelemetry_collector_spark.operators.classify import linear_score

    w = spark.createDataFrame([("the", 10), ("a", -5)], "term string, weight_pm bigint")
    plan = _plan(linear_score(small.withColumnRenamed("conv_id", "doc_id"), w, "doc_id"))
    assert "BroadcastHashJoin" in plan and "SortMergeJoin" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    partial = plan.find("HashAggregate(keys=[doc_id")
    exch = plan.find("Exchange hashpartitioning(doc_id")
    assert partial != -1 and exch != -1
    # top-down print: the partial agg appears below (upstream of) the exchange
    assert plan.find("HashAggregate", exch) != -1


def test_unicode_normalize_single_arrow_stage_no_exchange(spark, tiny):
    """NFC normalization is the sanctioned Arrow path: exactly ONE
    ArrowEvalPython over the scan, never row-wise BatchEvalPython, and no
    shuffle — the encoding pass rides the scan."""
    from opentelemetry_collector_spark.operators.text import encoding_metrics, unicode_normalize

    q = tiny.select(
        unicode_normalize(F.col("text")).alias("nt"),
        encoding_metrics(F.col("text")).alias("m"),
    )
    plan = _plan(q)
    assert plan.count("ArrowEvalPython") == 1
    assert "BatchEvalPython" not in plan
    assert "Exchange" not in plan


def test_corpus_build_single_scan_no_self_join(spark):
    """q85 must not self-join the corpus against its own gate decisions:
    one parquet scan, zero SortMergeJoin — the Gopher gate is an inline
    projection filter (keep_input=True) and the classifier consumes the
    gated rows directly."""
    from opentelemetry_collector_spark.plans.queries import QUERIES

    plan = _plan(QUERIES["q85_corpus_build"](spark, SF_DIR))
    assert plan.count("Scan parquet") == 1
    assert "SortMergeJoin" not in plan
    assert plan.count("BroadcastHashJoin") == 1  # the vocab probe only


def test_relabel_chain_is_pure_projection(spark):
    """The whole relabel_configs chain must compile to Projects/Filters —
    zero Exchanges introduced by label machinery (relabeling at 100 TB
    rides the scan)."""
    from opentelemetry_collector_spark.sources.prometheus import (
        RelabelConfig,
        apply_relabel_configs,
        merge_target_labels,
    )

    df = spark.createDataFrame(
        [("m", {"a": "1"}, 1.0)], "metric string, labels map<string,string>, value double"
    )
    out = apply_relabel_configs(
        merge_target_labels(df, {"job": "j"}, honor_labels=False),
        [
            RelabelConfig(action="keep", source_labels=["a"], regex=".*"),
            RelabelConfig(action="replace", source_labels=["a"], target_label="b"),
            RelabelConfig(action="hashmod", source_labels=["a"], target_label="s", modulus=4),
            RelabelConfig(action="labelmap", regex="(a)", replacement="x_$1"),
            RelabelConfig(action="labeldrop", regex="a"),
        ],
    )
    assert "Exchange" not in _plan(out)


def test_staleness_markers_single_anti_join(spark):
    """The two-generation diff is ONE left-anti hash join on the series
    key — bounded by distinct series per scrape pair, never a nested loop
    and never more than one anti-join pass."""
    from opentelemetry_collector_spark.sources.prometheus import staleness_markers

    df = spark.createDataFrame(
        [(1, "m", {"s": "A"}, 1.0), (2, "m", {"s": "B"}, 1.0)],
        "scrape_idx int, metric string, labels map<string,string>, value double",
    )
    plan = _plan(staleness_markers(df))
    assert plan.count("LeftAnti") == 1, plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_media_decode_is_shuffle_free(spark):
    """Synthesize + decode are chained Arrow stages over one scan: binary
    payloads must never shuffle BY KEY. (spread()'s round-robin widen of
    the narrow local fixture scan is allowed — it is a no-op at scale by
    contract; a hash/range exchange would mean the decode introduced a
    data-dependent shuffle.)"""
    from opentelemetry_collector_spark.plans.queries import q179_media_decode

    plan = _plan(q179_media_decode(spark, SF_DIR))
    assert "hashpartitioning" not in plan, plan
    assert "rangepartitioning" not in plan, plan
    assert "BatchEvalPython" not in plan


def test_otlp_json_flat_parse_stays_jvm_nested_mode_one_arrow_stage(spark):
    """parse_otlp_json: the default (flat) unmarshal is pure JVM — the
    flagship ingest path must never pay a Python exchange; the opt-in
    nested-AnyValue mode adds exactly ONE ArrowEvalPython stage (all three
    composite transcodes extracted together), never row-wise Python."""
    from opentelemetry_collector_spark.sources.codecs import parse_otlp_json, to_otlp_json
    from opentelemetry_collector_spark.plans.queries import from_events

    wire = to_otlp_json(from_events(spark, SF_DIR))
    flat_plan = _plan(parse_otlp_json(wire))
    assert "BatchEvalPython" not in flat_plan
    assert "ArrowEvalPython" not in flat_plan

    nested_plan = _plan(parse_otlp_json(wire, nested=True))
    assert "BatchEvalPython" not in nested_plan
    assert nested_plan.count("ArrowEvalPython") == 1


# --- round-4 continuation queries: the preference / tokenizer / trace shapes


def test_q202_preference_partial_structs_no_join(spark):
    from opentelemetry_collector_spark.plans.queries import q202_preference_pairs

    plan = _plan(q202_preference_pairs(spark, SF_DIR))
    assert "Join" not in plan
    assert "partial_max" in plan and "partial_min" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_q203_best_of_n_window_group_limit(spark):
    from opentelemetry_collector_spark.plans.queries import q203_best_of_n

    plan = _plan(q203_best_of_n(spark, SF_DIR))
    assert "WindowGroupLimit" in plan
    assert "Join" not in plan


def test_q205_bpe_apply_stays_jvm(spark):
    from opentelemetry_collector_spark.plans.queries import q205_bpe_encode

    plan = _plan(q205_bpe_encode(spark, SF_DIR))
    # the apply projection: no Python anywhere, no exchange introduced by
    # tokenization itself (the only aggregates belong to q95 training,
    # which runs eagerly before this plan is built)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Exchange" not in plan


def test_q206_selftime_equi_join_partial_aggs(spark):
    from opentelemetry_collector_spark.plans.queries import q206_span_selftime

    plan = _plan(q206_span_selftime(spark, SF_DIR))
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan
    assert "partial_sum" in plan


def test_q207_incremental_merge_carries_state_not_candidates(spark):
    from opentelemetry_collector_spark.plans.queries import (
        q207_incremental_preferences,
    )

    plan = _plan(q207_incremental_preferences(spark, SF_DIR))
    assert "Join" not in plan
    # both increment aggregates AND the merge aggregate run partial-first
    assert plan.count("partial_max") >= 2


def test_q208_split_assignment_is_projection(spark):
    from opentelemetry_collector_spark.operators.sample import leakage_safe_split

    df = spark.createDataFrame([(1, 7)], "doc_id bigint, component_id bigint")
    plan = _plan(leakage_safe_split(df, "component_id"))
    assert "Exchange" not in plan and "Python" not in plan


def test_q210_render_single_gather_no_python(spark):
    from opentelemetry_collector_spark.plans.queries import q210_chat_render

    plan = _plan(q210_chat_render(spark, SF_DIR))
    # one conv-keyed gather on top of the transcripts derivation's window
    # exchange; template application is pure JVM expression work
    assert "ObjectHashAggregate" in plan
    assert "Python" not in plan and "Join" not in plan
    assert plan.count("Exchange") <= 2, plan


def test_q211_spans_one_window_never_materializes_text(spark):
    from opentelemetry_collector_spark.plans.queries import q211_loss_mask_spans

    plan = _plan(q211_loss_mask_spans(spark, SF_DIR))
    assert "Python" not in plan and "Join" not in plan
    # no collect_list / rendered-string aggregate anywhere — spans come
    # from per-turn length prefix sums alone
    assert "collect_list" not in plan and "ObjectHashAggregate" not in plan


def test_q212_trim_groupby_reuses_window_partitioning(spark):
    from opentelemetry_collector_spark.plans.queries import q212_context_trim

    plan = _plan(q212_context_trim(spark, SF_DIR))
    assert "Python" not in plan and "Join" not in plan
    # transcript-derivation window (user_id) + ONE conv_id exchange shared
    # by the trim window and its groupBy — never a third
    assert plan.count("Exchange") <= 2, plan
