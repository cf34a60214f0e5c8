"""Write PLANS.md: the `.explain("formatted")` output of the headline
queries plus the plan properties each one is required to exhibit.

This is the reviewable evidence for the scale claims: predicate pushdown and
column pruning at the scan, broadcast (not shuffle) enrich joins, partial
aggregation before every shuffle, whole-stage codegen on the hot path, and
no row-at-a-time Python anywhere. Regenerate after plan-affecting changes:

    PYTHONPATH=/root/repo python tools/dump_plans.py
"""

from __future__ import annotations

import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

SF_DIR = "/root/testdata/sf0.01"

# query -> (what the plan must show, why it matters at 100 TB)
COMMENTARY = {
    "q179_media_decode": (
        "Two chained ArrowEvalPython/MapInPandas stages (synthesize, decode) "
        "over one scan — zero Exchanges; every decoded field is a per-row "
        "projection.",
        "Binary decode is embarrassingly parallel: payloads never shuffle, "
        "each Arrow batch decodes locally, and the pure-Python codecs keep "
        "the per-batch work in numpy buffers.",
    ),
    "q180_prom_relabel": (
        "The relabel chain (keep/replace/hashmod/labelmap/labeldrop) and the "
        "target-label merge compile into Projects/Filters over the parsed "
        "sample frame — the only Exchange is the upstream count aggregate "
        "that built the exposition lines.",
        "Relabeling at 100 TB must ride the scan: every action is a map-"
        "column rewrite, so a billion samples relabel at scan speed with "
        "no shuffle introduced by the label machinery.",
    ),
    "q181_prom_staleness": (
        "One window over the tiny distinct-scrape frame plus ONE left-anti "
        "hash join on the canonical series key; live rows union markers.",
        "The staleness store's two-generation diff needs no driver state: "
        "the anti-join shuffle is bounded by distinct series per scrape "
        "pair, never by samples.",
    ),
    "q00_pipeline_e2e": (
        "BroadcastHashJoin (enrich side broadcast, fact side never shuffled for the join); "
        "partial HashAggregate before the single Exchange; one FileScan.",
        "The enrich dimension is small (conversations metadata) — broadcasting it means the "
        "100 TB fact table is joined map-side with zero shuffle; the only shuffle left is the "
        "final few-group aggregate, whose partial side compresses each task to sink*role rows.",
    ),
    "q01_parse_extract": (
        "The parse itself is a Project over the scan — regexp_extract is a JVM expression "
        "inside WholeStageCodegen, no Python. (The one Window+Exchange in this sandbox plan "
        "belongs to the test-fixture derivation of turn_idx from the events table, not to "
        "the parse: a real transcripts table stores turn_idx, and the window disappears.)",
        "Parsing is the per-row hot loop; keeping it in codegen means it scales linearly with "
        "input splits and never serializes to Python.",
    ),
    "q05_enrich_broadcast": (
        "BroadcastHashJoin LeftOuter; ReadSchema pruned to the joined/projected columns.",
        "Resource-level enrichment (the resource processor analog) must not shuffle the fact "
        "side: broadcast keeps it embarrassingly parallel.",
    ),
    "q06_route_counts": (
        "ONE FileScan feeding all three sink predicates (single-pass tagged routing), "
        "partial count aggregation before the exchange.",
        "Fan-out to N sinks must not become N scans of 100 TB — the explode-tags plan reads "
        "once and routes in the same pass.",
    ),
    "q07_turn_counts": (
        "HashAggregate(partial) -> Exchange hashpartitioning(conv_id, role) -> "
        "HashAggregate(final); no sort.",
        "Map-side partial aggregation bounds the shuffle to |groups| per task regardless of "
        "input size; AQE coalesces the post-shuffle partitions.",
    ),
    "q16_ann_topk": (
        "BroadcastNestedLoopJoin against the tiny query set; cosine entirely in JVM "
        "higher-order functions (zip_with/aggregate).",
        "Brute-force ANN is the exact baseline: corpus-side parallel, query side broadcast. "
        "The scale paths (q21 LSH, q30 IVF) replace the cross product with bucketed joins.",
    ),
    "q30_ann_ivf": (
        "ArrowEvalPython ONLY for the centroid matmul (one numpy matmul per Arrow batch); "
        "the candidate join is a broadcast hash join on list_id.",
        "IVF prunes the candidate set to nprobe/nlist of the corpus; corpus list assignment "
        "is computed once and would be written partitioned-by-list at real scale.",
    ),
    "q25_ngram_jaccard": (
        "Inverted-index self-join on n-gram tokens (Exchange on token, not on document "
        "pairs); partial aggregation of co-occurrence counts.",
        "The naive all-pairs O(N^2) join is replaced by |shared-token| pairs only — the "
        "standard scalable set-similarity join shape.",
    ),
    "q19_minhash_lsh": (
        "MapInPandas for the shingle+signature kernel; codegen'd hash self-join on "
        "(band, bucket) for candidates; verify is a second MapInPandas over the bare "
        "(a_id, b_id) pairs against the broadcast shingle map (auto strategy — the "
        "array-carrying attach joins only appear when the map outgrows the broadcast "
        "limit, the same size switch AQE applies to joins).",
        "Every per-element hot loop (shingling, 32 minhash passes, exact intersect) runs as "
        "C kernels over Arrow batches; the only shuffles are the uniform bucket join and "
        "candidate dedup — no interpreted Catalyst HOF survives on the 100 TB path, and "
        "the at-scale shuffle-verify variant is parity-tested against this one.",
    ),
    "q34_memory_limiter": (
        "Single hashpartitioning(conv_id) Exchange shared by the batch-bytes window and the "
        "admission aggregate; byte estimate is a map-side JVM expression.",
        "Admission control must not add its own shuffle: the per-batch sum rides the same "
        "conv_id partitioning the downstream per-conversation aggregate already needs.",
    ),
    "q42_pack_sequences": (
        "ONE corpus-carrying Exchange on conv_id feeding FlatMapGroupsInPandas (the "
        "sequential packing walk); the rollup's exchange is partial-aggregated first so "
        "it carries only per-chunk rows.",
        "Packing is per-conversation state: grouping once on conv_id makes every task "
        "independent; the rollup shuffle compresses to |chunks| via map-side partials.",
    ),
    "q44_pii_redact": (
        "ONE Project over the scan: all four category counts (regexp_extract_all/size) and "
        "the nested regexp_replace chain are JVM expressions in a single WholeStageCodegen; "
        "no Exchange, no Python.",
        "Redaction is a per-row rewrite of the corpus hot loop — any shuffle or Python "
        "worker here would be a per-byte tax on 100 TB; a codegen projection scales with "
        "input splits only.",
    ),
    "q45_repetition": (
        "Word-level stats are per-row array expressions; the bigram stats are explode -> "
        "HashAggregate(partial) on (doc, gram) -> Exchange -> final -> partial per-doc "
        "rollup — every Exchange is preceded by a partial aggregate.",
        "The naive per-doc HOF formulation is O(len^2) per document; the explode/agg shape "
        "shuffles only distinct (doc, gram) counts and stays skew-free because grams are "
        "already doc-scoped keys.",
    ),
    "q46_decontaminate": (
        "The eval-set gram list is aggregated then BROADCAST; the postings-side probe is a "
        "BroadcastHashJoin on gram — the training corpus is never shuffled for the match.",
        "The benchmark side is tiny by construction (eval suites are MBs, the corpus is "
        "100 TB); broadcasting its distinct grams makes decontamination a map-side "
        "semi-join over corpus splits.",
    ),
    "q47_vocab_coverage": (
        "Top-k vocabulary via TakeOrderedAndProject (never a full global sort); the "
        "coverage probe is a BroadcastHashJoin of the k-row vocab against the token "
        "postings, then a partial-aggregated per-doc count.",
        "A total sort of the global term-frequency table would shuffle |vocabulary| rows; "
        "TakeOrderedAndProject keeps per-task heaps of k and merges k-row results, and the "
        "broadcast probe adds zero corpus shuffle.",
    ),
    "q50_exact_substring": (
        "ONE MapInPandas (the numpy rolling-window anchor kernel) emits hashed bigint "
        "L-gram postings (never text); the duplicated-gram test is a count window over "
        "the gram key so the kernel output is computed and shuffled once; the interval "
        "union is ONE per-doc Window after a single hashpartitioning(doc_id) exchange.",
        "Exact-substring dedup's linear anchor blow-up is inherent — what must not happen "
        "is per-anchor interpreted work (the Catalyst HOF form was quadratic per doc via "
        "UTF8String.substring), shuffling raw text, or recomputing the anchor pass for a "
        "join probe; the C kernel + count-window keep the hot loop single-pass and the "
        "shuffles bounded by |anchors| and |hits|.",
    ),
    "q43_stratified_sample": (
        "Partial WindowGroupLimit BEFORE the Exchange (rank-limit pushdown): each map task "
        "keeps only k rows per stratum, so the shuffle carries O(k x strata x tasks).",
        "Exact-k sampling over 100 TB must not shuffle the corpus: the partial group-limit "
        "turns a global sort-rank into a tiny top-k merge.",
    ),
    "q51_asof_enrich": (
        "NO Join operator anywhere: the as-of enrich is union + ONE "
        "hashpartitioning(conv_id) Window (last(payload, ignorenulls) over the side-tagged "
        "sort).",
        "A range-condition join Catalyst can only plan as BroadcastNestedLoop explodes to "
        "O(|L| x |R|) comparisons per key; the union+window form is linear in rows and "
        "pays exactly one key shuffle regardless of how many right rows precede each left "
        "row.",
    ),
    "q52_route_rollup": (
        "ONE FileScan feeding a single Expand -> HashAggregate(partial) -> Exchange -> "
        "final: all three rollup levels (sink x role, sink, total) computed in one pass.",
        "Hierarchical totals as separate jobs would rescan 100 TB per level; grouping sets "
        "expand each row to its grouping combinations map-side, so the shuffle still "
        "carries only |groups| partial rows per task.",
    ),
    "q58_token_budget_rate": (
        "Two passes, zero corpus sort: HashAggregate(partial) -> Exchange(|strata| rows) "
        "for the token totals, then the keep-rate map comes back as a BroadcastHashJoin "
        "and the md5-prefix fraction filter is a codegen projection — no Window, no "
        "SortMergeJoin.",
        "Domain mixing at 100 TB cannot afford the exact variant's per-stratum cumulative "
        "sort (whole strata on single tasks); the rate form touches the corpus twice as "
        "embarrassingly-parallel scans and shuffles only per-stratum totals.",
    ),
    "q62_selection_pipeline": (
        "The whole selection chain is one DAG: gram-count aggregates partial-aggregate "
        "before their exchanges, the score join runs gram-to-gram, the per-source top-k "
        "carries a partial WindowGroupLimit BEFORE its exchange, and chunking is a "
        "Generate with no shuffle of its own.",
        "A corpus build that materializes intermediate tables between score/select/chunk "
        "rescans the data once per stage; the composed plan reads the corpus a bounded "
        "number of times and every shuffle it pays is either |grams| partials or k-per-"
        "stratum rows.",
    ),
    "q67_gopher_filter": (
        "ONE Project over the scan — every rule bound (word count, mean word length, "
        "stopword hits, alpha share, dup-word share) is a JVM array/regex expression in a "
        "single WholeStageCodegen; no Exchange, no Python.",
        "The keep/drop decision is evaluated once per document of the corpus — as a pure "
        "map stage it rides the scan at 100 TB, and Catalyst pushes a downstream keep=1 "
        "predicate straight into this projection so dropped docs never leave the task.",
    ),
    "q68_tfidf_top_terms": (
        "ONE corpus scan+explode into a persisted (term, doc, group) postings aggregate "
        "(both tf and doc_freq branches read the InMemoryTableScan, never the corpus "
        "again); partial WindowGroupLimit BEFORE the Exchange on source (rank-limit "
        "pushdown: each map task keeps only k terms per source); doc_freq side comes back "
        "as a BroadcastHashJoin on term; every aggregate partial-aggregates before its "
        "exchange; the score multiply is try_multiply (overflow -> NULL ranks last, never "
        "an ANSI job kill).",
        "tf-idf over a 100 TB corpus pays the scan+explode once and shuffles only "
        "vocabulary-bounded aggregates — never postings — and the per-source ranking "
        "ships k rows per task instead of the whole per-source term table; integer "
        "per-mille idf keeps the ranking engine-exact wherever it fits int64.",
    ),
    "q74_c4_clean": (
        "ONE Project over the scan — line splitting, the per-line terminal-punct/"
        "min-words/javascript filters, the page-level curly/lorem-ipsum/min-sentences "
        "rules, and the clean-text reassembly are all JVM array/regex expressions in a "
        "single WholeStageCodegen; no Exchange, no Python.",
        "C4 cleaning is the first pass of every web-corpus build: as a pure map stage it "
        "rides the 100 TB scan for free, and a downstream keep=1 predicate is pushed "
        "into the projection so rejected pages never leave the task.",
    ),
    "q75_boilerplate_lines": (
        "Line table explodes once; the repeated-line detector is a partial-aggregated "
        "count-distinct on 16-byte md5 keys (text never rides that shuffle); the "
        "boilerplate set comes back as a LEFT ANTI join (AQE-broadcastable — it only "
        "holds repeated lines); reassembly is ONE grouped collect_list, no Window over "
        "the corpus.",
        "Cross-corpus boilerplate removal at 100 TB lives or dies on what the shuffles "
        "carry: hashing lines to fixed-width keys bounds the counting exchange at "
        "16 B/line, and the anti-join's build side is the tiny repeated-line set, so the "
        "corpus-sized line table is never shuffled twice.",
    ),
    "q76_cluster_balance": (
        "Centroid side is a BroadcastNestedLoopJoin build (8 rows); the per-vector "
        "cosine argmax is min(struct(-cos, cid)) — a grouped PARTIAL aggregate before "
        "the single exchange on vec id — and the cluster rollup partial-aggregates "
        "again; no Window anywhere.",
        "Cluster assignment over 10^9 embeddings is a map-side scan when the centroid "
        "frame broadcasts: each task scores k cosines per row and ships one "
        "(vec, best) pair; a row_number-over-vec formulation would shuffle the "
        "corpus x k scored rows instead.",
    ),
    "q80_linear_classifier": (
        "Vocab side is a BroadcastHashJoin build (never a SortMergeJoin of the corpus "
        "against the vocabulary); the per-doc signed sum partial-aggregates before the "
        "single exchange on doc id; token explode and the threshold decision stay in "
        "WholeStageCodegen.",
        "Classifier inference over 100 TB is a map-side pass when the vocab broadcasts "
        "(a fastText vocab is megabytes): each task ships one (doc, sum) pair per "
        "document, so the shuffle is |docs|, independent of token count.",
    ),
    "q81_unicode_normalize": (
        "Exactly ONE ArrowEvalPython (the sanctioned pandas_udf normalization stage) "
        "over the scan — never BatchEvalPython; the mojibake counters and md5 are JVM "
        "expressions in the surrounding projections; no Exchange at all.",
        "Encoding cleanup is a pure per-row map: as an Arrow-batched stage it rides the "
        "scan with zero shuffle, and everything around the one unavoidable Python hop "
        "stays in codegen so the hop's cost is the normalization itself, not "
        "serialization of extra columns.",
    ),
    "q82_substring_removal": (
        "The occurrence-count window and the first-occurrence rank window share ONE "
        "Exchange hashpartitioning(g) (two Window nodes, same partitioning); the span "
        "merge + splice side is doc-keyed; raw text rides only the final doc join — "
        "the gram shuffle carries hashed bigints.",
        "Destructive dedup at 100 TB hinges on the gram exchange carrying fixed-width "
        "keys (16 B/position, never text) and on not paying a second shuffle for the "
        "keep-first policy: rank and count ride the same partitioning, so the "
        "destructive form costs exactly what the audit form does.",
    ),
    "q83_shuffle_shards": (
        "Shard assignment is a pure Project over the scan (no Exchange, no Sort, no "
        "Python); the manifest is ONE partial-aggregated exchange of |shards| rows.",
        "A global pseudo-random training order over 10^12 rows cannot afford a sort: "
        "the md5 order key + prefix-shift shard make the permutation a property of "
        "the WRITE layout (partitionBy shard, sortWithinPartitions order_key), so "
        "the only data movement is the write itself.",
    ),
    "q85_corpus_build": (
        "ONE parquet scan, ZERO SortMergeJoin: the Gopher gate is an inline projection "
        "filter over the scan (gopher_filter keep_input=True), the classifier probes "
        "its vocab as the only BroadcastHashJoin, and the per-doc sum + per-shard "
        "manifest are the only narrow exchanges.",
        "A corpus build that self-joined the corpus against its own gate decisions "
        "would pay two full-corpus exchanges at 100 TB; composing the gates as "
        "projection -> gated explode keeps the whole build scan-bound, which is what "
        "a selection pipeline must be.",
    ),
    "q87_counter_adjust": (
        "ALL windows (lag, running max of reset timestamps) share ONE Exchange "
        "hashpartitioning(event_type, instance) + one Sort; no Python.",
        "Counter adjustment touches every sample of every series: sharing the series "
        "partitioning across the reset flag, the epoch start, and the delta means the "
        "10^12-point metrics history shuffles once, and each series sorts within one task "
        "bounded by its own scrape count.",
    ),
    "q88_slo_burn": (
        "Partial HashAggregate over the raw scan before the (tenant, hour) exchange; the "
        "day window re-shuffles ONLY the aggregated hourly frame (|tenants| x |hours| rows).",
        "Burn-rate alerting reads the whole error stream but its state is tiny: map-side "
        "combine compresses each task to its distinct (tenant, hour) pairs, so the long "
        "window costs a shuffle of thousands of rows, not 10^12.",
    ),
    "q89_zipkinv1_roundtrip": (
        "The whole v1 wire build + parse is Projects over the scan (to_json/from_json + "
        "higher-order array functions in WholeStageCodegen) — no Python, no extra "
        "Exchange beyond the fixture's turn_idx window.",
        "The legacy-wire translator runs per record on the hot ingest path; staying in "
        "codegen keeps v1 parse at scan speed exactly like the v2/jaeger/OC codecs.",
    ),
    "q90_log_templates": (
        "Digest-keyed groupBy with map-side partial aggregation (partial_min/partial_count "
        "upstream of the exchange; SortAggregate because min-of-struct isn't hash-aggregable); "
        "no Window over the raw stream; shuffle keys carry the md5(template) digest, never "
        "raw text alone.",
        "Template mining reads every line of the corpus: partial aggregation collapses each "
        "task to its distinct templates before the shuffle, so a 10^12-line corpus with a few "
        "thousand templates ships thousands of rows per task, not the corpus.",
    ),
    "q91_delta_to_cumulative": (
        "One Exchange hashpartitioning(series) + one Sort feeding the running-sum Window — "
        "the same shape as q87's adjustment, in the opposite temporality direction.",
        "Delta-to-cumulative is per-series sequential by definition; partitioning by series "
        "makes it embarrassingly parallel across the label-set cardinality while each "
        "series' sort stays bounded by its own point count.",
    ),
    "q92_split_metrics": (
        "Single unpartitioned-window rank (the global batch sequence the reference's one "
        "splitMetrics loop implies) followed by partial+final HashAggregate on "
        "(batch_id, metric, kind).",
        "Datapoint-granularity rebatching is golden-parity machinery: the contract is the "
        "cut positions, pinned by TestSplitMetricsUneven; at scale batching-for-transport "
        "is maxRecordsPerFile on the write, which needs no global sequence at all.",
    ),
    "q93_otlp_text_traces": (
        "The rendering itself is a stack of Projects inside WholeStageCodegen — label "
        "padding, enum names, sorted attribute lines are all JVM expressions, no Python. "
        "(The one Window+Exchange below is the test fixture deriving turn_idx from the "
        "events table, same caveat as q01: a real transcripts table stores turn_idx and "
        "the dump is a pure projection, as test_traces_dump_is_pure_projection asserts "
        "on the span frame directly.)",
        "A debug dump enabled on a wide pipeline must not tax it: rendering at scan speed "
        "means the logging exporter analog costs one extra projection, not a shuffle.",
    ),
    "q94_otlp_text_metrics": (
        "Partial+final HashAggregate on (metric, kind) collecting the sorted point structs; "
        "the Metric # index window runs over the post-aggregation frame (one row per "
        "distinct metric), never the datapoints.",
        "The block-per-metric shape forces a grouped collect, but partial aggregation means "
        "each task ships its per-metric point lists once; the only full-frame pass is the "
        "scan itself.",
    ),
    "q53_latency_quantiles": (
        "Exact percentiles ride the SAME plan shape as any grouped agg: lead() window on "
        "hashpartitioning(conv_id), broadcast meta join, then partial+final HashAggregate "
        "on tenant.",
        "Exact grouped percentiles need the group's values together but NOT globally "
        "sorted: the percentile buffer aggregates within each tenant partition, so the "
        "shuffle is |pairs|, never a global sort; dyadic probabilities keep the "
        "interpolation bit-exact across engines.",
    ),
    "q95_bpe_train": (
        "The returned frame is the learned ARTIFACT (the merge table, driver-built, "
        "Scan ExistingRDD — correctly trivial). The training plan it summarizes: ONE "
        "corpus scan into a cached vocab-sized (word,freq) table, then each round a "
        "partial+final HashAggregate pair count over that cache with k codegen'd "
        "replaces — asserted in test_bpe (segmentation replay is Exchange-free, "
        "Python-free).",
        "BPE's serial dependency is between ROUNDS, not rows: per-round work is a "
        "full-parallel agg over |vocab| (~100k rows at any corpus size), so 100 TB "
        "costs one corpus scan + n_merges vocab-table aggs, never n_merges scans.",
    ),
    "q96_zipkin_span_events": (
        "Marshal -> unmarshal -> explode is a stack of Projects + one Generate over "
        "the scan: to_json/from_json and every event transform are JVM higher-order "
        "functions inside WholeStageCodegen, no Python, no shuffle beyond the test "
        "fixture's turn_idx window (same caveat as q01 — a real transcripts table "
        "stores turn_idx and the Window/Exchange disappears).",
        "Codec roundtrips sit on every ingest/egress path; at 100 TB they must ride "
        "the scan as projections — a codec that shuffles or hits Python serializes "
        "the whole pipeline.",
    ),
    "q97_zipkin_span_links": (
        "Same shape as q96: Projects + one Generate (explode links), all link tag "
        "emission/consumption in JVM array/map functions; the only Exchange is the "
        "fixture's turn_idx derivation.",
        "The consecutive-prefix link-tag walk (otlp.link.N) is per-row array logic — "
        "expressed as transform/filter it stays in codegen and scales with splits.",
    ),
    "q98_jaeger_span_events": (
        "Identical skeleton to q96 on the Jaeger wire: the message-field name "
        "transport and field split are transform/filter expressions in one Project "
        "stack; one Generate for the explode; no Python, no extra Exchange.",
        "Same ingest-path argument as q96 — wire translation must cost one "
        "projection, and the lossy members (dropped) must vanish in the expression, "
        "not in a Python loop.",
    ),
    "q99_jaeger_span_links": (
        "Identical skeleton to q97 on the Jaeger wire: reference construction "
        "(parent-first CHILD_OF + FOLLOWS_FROM links) and the two-condition parse "
        "skip are array expressions in the Project stack; one Generate; fixture "
        "window only.",
        "Reference/link reconstruction is pure per-row work; keeping the skip rule "
        "as a filter() lambda in codegen preserves scan-speed translation at any "
        "scale.",
    ),
    "q100_bloom_dedup": (
        "The bloom probe is a pure projection (k get() lookups into a literal "
        "bitset — no join, no explode, no Exchange on the probe branch); only the "
        "maybe_seen survivors reach the exact-verification BroadcastHashJoin.",
        "An incremental-dedup pre-filter only pays off if the cleared rows never "
        "shuffle: the bloom's no-false-negatives guarantee plus the projection-only "
        "probe means the (overwhelming) unseen majority of a 100 TB batch is passed "
        "at scan speed, and the exact join's input shrinks to the bloom's hit set.",
    ),
    "q101_cm_heavy_hitters": (
        "The sketch build's Exchange carries at most depth*width cells (partial "
        "HashAggregate collapses each task to the sketch size before the shuffle); "
        "the estimate itself is a zero-shuffle projection against the collected "
        "sketch.",
        "Heavy-hitter detection feeds the salting decision, so it must be cheaper "
        "than the skewed groupBy it protects: a shuffle bounded by 1024 cells "
        "regardless of input size is the fixed-cost scale path.",
    ),
    "q102_latency_hist_quantiles": (
        "The sketch build's Exchange carries at most |tenants| x 15 cells (partial "
        "HashAggregate before it); the quantile stage's Window + groupBy run over "
        "that cells frame, never the input; the tenant enrich is a "
        "BroadcastHashJoin.",
        "q53's exact percentiles must shuffle every measurement to its key's "
        "reducer — at 100 TB the histogram sketch replaces that with a fixed-size "
        "cell shuffle while keeping an integer-exact, oracle-checkable rank rule.",
    ),
    "q103_role_pivot": (
        "One partial-aggregated HashAggregate pair around a single Exchange — the "
        "pivot with EXPLICIT values compiles to the same plan as a long-format "
        "count (no extra distinct-scan pass to discover pivot columns); the tenant "
        "enrich is a BroadcastHashJoin.",
        "Spark's pivot without a value list runs a full extra scan just to find "
        "the columns; pinning them keeps the wide matrix at one scan + one "
        "sketch-sized shuffle at any input size.",
    ),
    "q104_incident_window_join": (
        "The range join is a binned EQUI-join (SortMergeJoin/HashJoin on _bin "
        "with the exact range predicate as the join condition's post-filter) — "
        "no BroadcastNestedLoopJoin anywhere; the window side carries the only "
        "Generate.",
        "A bare ts-BETWEEN join is O(events x windows) comparisons under "
        "BroadcastNestedLoopJoin — unusable at 100 TB. Binning turns it into a "
        "shuffle AQE can size, skew-handle, and broadcast like any equi-join.",
    ),
    "q105_service_graph": (
        "The parent/child self-join is an EQUI-join keyed (trace_id, span id) — "
        "never a nested loop — feeding one partial-aggregated HashAggregate over "
        "the edge labels.",
        "A topology over 10^12 spans is a self-join of the biggest table in the "
        "system with itself; keyed on (trace, span) both sides hash-partition "
        "identically, AQE can skew-split a hot trace, and the groupBy shuffle "
        "carries only (service, service) pairs.",
    ),
    "q106_surprisal": (
        "The vocab probe is a BroadcastHashJoin on the token key (the postings "
        "are never shuffled against the vocabulary); vocab derivation ends in "
        "TakeOrderedAndProject, bounding driver transfer at vocab_limit rows.",
        "Scoring is per-token work on the corpus hot path — it must ride the "
        "scan. Only the per-doc partial aggregate and the doc-spine join touch "
        "a shuffle, both keyed and sized by documents, not tokens.",
    ),
    "q107_robust_anomalies": (
        "Exactly ONE Exchange hashpartitioning(role) for the operator: the "
        "median window and the MAD window stack on the same partitioning, and "
        "there is no join back. (The earlier hashpartitioning(user_id) window "
        "is the test fixture's turn_idx derivation, q01's note — a real "
        "transcripts table stores turn_idx and it disappears.)",
        "Robust stats usually cost two self-joins (value vs median, deviation "
        "vs MAD-median); stacking whole-partition windows on one exchange makes "
        "the operator cost a single shuffle of the series, same as a plain "
        "groupBy.",
    ),
    "q108_snapshot_diff": (
        "Each side reduces to (key, md5 digest) BEFORE the join (column-pruned "
        "Project under the SortMergeJoin FullOuter); the join is keyed, never a "
        "nested loop.",
        "Diffing two 100 TB snapshots must not shuffle payloads: the digest "
        "projection narrows each side to key+16 bytes, so the full-outer shuffle "
        "moves a fingerprint, not the table.",
    ),
    "q109_role_transitions": (
        "The lag Window runs on hashpartitioning(conv_id) — the ordering "
        "invariant's own partitioning — and the pair groupBy is partial-"
        "aggregated, so the second shuffle carries only label pairs.",
        "Transition mining is a sequence scan: one shuffle to co-locate each "
        "conversation, map-side partial counts after, and the matrix that "
        "reaches the driver is |labels|^2 regardless of corpus size.",
    ),
    "q111_sparse_cosine_pairs": (
        "The posting self-join is keyed on the term (equi, never a nested "
        "loop); the df filter (max_df) sits UNDER the join so pruned terms "
        "never enter it; the pair aggregate is partial-aggregated.",
        "All-pairs similarity costs sum_t df_t^2 — one stopword-frequency "
        "term emits df^2 candidates. Pruning before the join (measured 64x "
        "in BENCH/ALLPAIRS.md) is the operator's scale contract; what is "
        "left is an ordinary keyed shuffle AQE can size.",
    ),
    "q113_pricing_summary": (
        "One FileScan with PushedFilters on l_shipdate; one partial "
        "HashAggregate before the single 6-group Exchange; no join, no "
        "Python.",
        "The classic full-table aggregate must be scan-bound: pushdown skips "
        "row groups past the cutoff, and the map-side partial compresses "
        "each task to |flag x status| rows before the shuffle.",
    ),
    "q114_shipping_priority": (
        "The filtered customer dimension is a BroadcastExchange; the top-10 "
        "ends in TakeOrderedAndProject, never a global Sort.",
        "Top-k over a 100 TB join must not sort the join output: each task "
        "keeps 10 rows, the driver merges task heads — constant memory at "
        "any scale.",
    ),
    "q115_local_supplier_volume": (
        "Every dimension (region->nation->supplier, customer nation) is a "
        "BroadcastExchange; the only hashpartitioning Exchange pair is "
        "lineitem x orders.",
        "A 6-table star join collapses to ONE big shuffle when the "
        "dimension chain broadcasts — the difference between 1 and 5 "
        "shuffles of the fact table at 100 TB.",
    ),
    "q112_context_windows": (
        "One Exchange hashpartitioning(conv_id) under a single Window node "
        "computing a bounded ROWS frame (k rows); no join, no Python.",
        "Context featurization must ride the conversation partitioning the "
        "pipeline already uses: the frame is k rows regardless of "
        "conversation length, so a hot conversation is O(len x k).",
    ),
    "q117_weighted_sample": (
        "The stratified form plans a Partial WindowGroupLimit under the "
        "rank window — each task forwards at most k rows per stratum.",
        "Weighted selection over 100 TB must not shuffle the corpus: the "
        "rank-limit pushdown caps the shuffle at k x strata x tasks rows.",
    ),
    "q119_event_funnel": (
        "Every aggregate and join in the step chain is keyed on user_id; "
        "each step's HashAggregate is partial-aggregated and the frames "
        "shrink monotonically.",
        "Funnels are usually written as windows over the whole event "
        "stream; the keyed min-join chain instead costs one partial min "
        "per step and never materializes per-user event arrays.",
    ),
    "q120_retention_cohorts": (
        "Two user-keyed groupBys (first-activity min, distinct user-weeks) "
        "then a matrix aggregate over user-week rows.",
        "The retention triangle's heavy lifting is the distinct; after it "
        "the data is users x weeks, small at any corpus size.",
    ),
    "q122_order_priority": (
        "EXISTS runs as a LeftSemi BroadcastHashJoin/SortMergeJoin with the "
        "non-equi shipdate residual as the join condition; orders rows are "
        "never widened or duplicated.",
        "A semi join emits each order at most once regardless of matching "
        "lineitems — the inner-join-then-distinct formulation would shuffle "
        "the multiplied fact table first.",
    ),
    "q123_returned_items": (
        "Customer and nation dimensions enter as BroadcastHashJoin; the "
        "top-20 is a TakeOrderedAndProject, never a global Sort.",
        "Only the lineitem x orders join shuffles; the ranking ships 20 "
        "rows per task to the driver instead of sorting the joined fact.",
    ),
    "q124_customer_orders_dist": (
        "LEFT OUTER join keyed on custkey, then two HashAggregates — the "
        "second one over the per-customer frame (one row per customer).",
        "The zero bucket (customers with no qualifying orders) only exists "
        "under the outer join; the histogram aggregate runs on a frame "
        "already reduced to |customers| rows.",
    ),
    "q125_large_volume_orders": (
        "The HAVING aggregate runs FIRST: partial HashAggregate shrinks "
        "lineitem to one row per order before any join; the customer "
        "dimension broadcasts.",
        "Filtering on the aggregate before joining means the join input is "
        "the few qualifying orders, not the full fact table.",
    ),
    "q126_rollup_totals": (
        "One Expand node feeding a single partial-aggregated HashAggregate "
        "— all three rollup levels computed in ONE shuffle over one scan.",
        "The naive alternative is one job per level (3 corpus passes); "
        "Expand replicates rows map-side so every level shares the same "
        "partial aggregation.",
    ),
    "q127_pagerank_nav": (
        "The corpus-sized pass is the edge aggregation (window lag + one "
        "groupBy); every PageRank iteration joins the node-sized rank frame "
        "(BroadcastHashJoin here — the hint is SIZE-GATED by a node-count "
        "probe, so above the threshold the same code plans a shuffled "
        "hash-join instead of forcing an unbounded driver broadcast).",
        "Iterations cost O(edges), never O(events) — and the integer "
        "micro-unit arithmetic makes the result bit-identical under any "
        "partitioning, so AQE/skew re-plans cannot change the answer.",
    ),
    "q128_audience_overlap": (
        "INTERSECT/EXCEPT plan as distinct aggregates + joins on already-"
        "distinct user frames; each segment leg is a single count.",
        "Set ops over user universes reduce to |users|-sized frames before "
        "any comparison — the raw event stream is scanned once per side.",
    ),
    "q129_corr_moments": (
        "One partial-aggregated HashAggregate computes all six moments in "
        "a single pass; the r2 derivation is a Project over the "
        "per-key frame.",
        "Correlation distributes as mergeable integer moments (add to "
        "merge) — one corpus pass, and the float math runs once per key "
        "on exact integers, so the answer is partition-independent.",
    ),
    "q130_fuzzy_match": (
        "The self-join is an EQUI hash join on the 6-char block key — "
        "never BroadcastNestedLoopJoin; levenshtein evaluates post-join "
        "inside codegen.",
        "An un-blocked similarity join is |docs|^2; prefix blocking bounds "
        "candidates per block exactly like an LSH band bucket, and the "
        "equi join lets AQE size/skew-handle it.",
    ),
    "q131_activity_streaks": (
        "The only corpus-sized op is the (user, day) distinct (partial-"
        "aggregated); the streak window and island groupBy run on user-day "
        "rows.",
        "Gaps-and-islands via day_number - row_number needs no self-join "
        "and no per-user arrays; a years-long power user costs one "
        "partition sort of at most 'days' rows.",
    ),
    "q132_reachability": (
        "Each hop is a join of the reach frame onto the aggregated edge "
        "list + a distinct (set union); no operator touches raw events "
        "after the edge aggregation.",
        "Bounded transitive closure grows with the reach SET size, not "
        "corpus size — the distinct caps the frontier and cycles cost "
        "nothing.",
    ),
    "q133_json_props": (
        "get_json_object evaluates inside WholeStageCodegen feeding one "
        "partial-aggregated HashAggregate — no Python, no second pass for "
        "the multi-distinct (Expand).",
        "Semi-structured extraction at 100 TB must stay JVM-side; a "
        "json.loads UDF would serialize every row through Arrow for a "
        "field the JVM parser pulls in place.",
    ),
    "q134_state_intervals": (
        "One window keyed on user_id (single Exchange + per-partition "
        "sort); lead() closes intervals with no self-join.",
        "The SCD2 derivation is one shuffle of the change stream; the "
        "classic FULL OUTER self-join formulation doubles the corpus "
        "through two shuffles.",
    ),
    "q135_char_mass_median": (
        "Both running-sum windows share ONE (lang)-keyed Exchange and "
        "sort; the threshold filter + min-aggregate run on the windowed "
        "frame.",
        "Exact weighted quantiles need one sort per group, not a global "
        "one — and selection (min satisfying row) keeps the result "
        "integer-exact where interpolation would float-drift.",
    ),
    "q136_doc_skyline": (
        "The bucket prune (groupBy + broadcast of the bucket-max frame) "
        "drops dominated rows MAP-SIDE; only the frontier sliver reaches "
        "the global window sort.",
        "A skyline's exact windows are inherently single-partition — the "
        "prune bounds that partition by the bucket count, not the corpus, "
        "so 100 TB never funnels through one task.",
    ),
    "q137_nav_trigrams": (
        "Both lag columns come from ONE per-user window sort; the n-gram "
        "count is a single partial-aggregated groupBy.",
        "Sequence mining via lag never materializes per-user arrays — a "
        "hot user costs one partition sort, and the tuple aggregate "
        "compresses map-side.",
    ),
    "q110_unimax_allocation": (
        "One partial-aggregated HashAggregate reduces the corpus to per-stratum "
        "counts; every window after that — including the stratum count and "
        "the water level itself — runs on the STRATA frame (rows = number of "
        "languages), making the whole allocation ONE Spark job with zero "
        "driver round-trips (the r4 bench flag's root cause was the previous "
        "three-action form).",
        "The water-filling math must never touch the corpus: the only full-"
        "data pass is the count, and the level derivation costs windows over a "
        "frame the size of the language list.",
    ),
    "q152_ohlc_downsample": (
        "ONE Exchange on (series, bucket) with the PARTIAL SortAggregate before "
        "it (struct-ordered min_by/max_by is not hash-able, so the exact "
        "open/close tiebreak costs a per-task sort, not an extra shuffle).",
        "Downsampling is the first stage of every metrics-serving path: the "
        "shuffle must carry per-bucket partials, never raw datapoints — at "
        "100 TB the partial aggregate is the difference between shuffling "
        "buckets and shuffling the corpus.",
    ),
    "q156_tail_sampling": (
        "One partial-aggregated groupBy(trace_id) — the decision frame is "
        "trace-sized; the md5-prefix probabilistic fallback is a codegen "
        "projection (conv/substring), no Python anywhere.",
        "Tail sampling must see every span of a trace before deciding; the "
        "partial aggregate means each task pre-reduces its spans and the "
        "shuffle carries one row per (task, trace), not one per span.",
    ),
    "q157_span_red_metrics": (
        "ONE Exchange, partial + final HashAggregate: every le-bucket is a "
        "conditional sum inside the same aggregate, so the span corpus is "
        "scanned once.",
        "The spanmetrics derivation is a standing job over all spans — "
        "bucket-per-conditional-sum keeps it one scan + one shuffle of "
        "(service, operation) rows regardless of how many bounds the "
        "histogram has.",
    ),
    "q158_counter_rate": (
        "The reset-aware lag window shares adjust_cumulative's single "
        "hashpartitioning(series) Exchange; the window-bucket aggregate is a "
        "second, partial-aggregated shuffle of per-window rows.",
        "rate() over counters is the hottest recurring metrics query; series "
        "are sorted within one task each (bounded by points-per-series) and "
        "the only corpus-sized shuffle is the one the lag needs anyway.",
    ),
    "q159_sliding_burst": (
        "ONE hashpartitioning(user_id) Exchange; the Window node carries a "
        "RangeFrame (value-range over integer micros), not a RowFrame.",
        "Burst detection needs the trailing hour at EVERY event; the range "
        "frame computes it in one per-key sort with same-instant events as "
        "frame peers — a fixed-bucket quota would need self-joins to see "
        "across bucket boundaries.",
    ),
    "q160_span_self_time": (
        "Child sums partial-aggregate BEFORE their shuffle; the join back is "
        "an equi hash/sort-merge join on (trace_id, span_id) — never a "
        "NestedLoop; the final (service, operation) rollup is a second tiny "
        "aggregate.",
        "Self-time is a full-corpus self-join shape: pre-reducing children "
        "to per-parent sums means the join carries one row per parented "
        "span, and trace-local keys shard evenly at any scale.",
    ),
    "q161_triangles": (
        "Every join is an equi hash/SMJ join on node ids — no NestedLoop, no "
        "CartesianProduct; the wedge self-join keys on the pivot node with "
        "the (degree, node) rank comparison as a residual filter.",
        "Degree-ordered orientation bounds wedge fan-out by O(sqrt(m)) per "
        "node, so the candidate frame is O(m^1.5) worst-case instead of "
        "sum(deg^2) — a hub page costing deg^2 wedges is the classic "
        "triangle-count blowup at web scale.",
    ),
    "q163_cusum_drift": (
        "ONE Exchange hashpartitioning(event_type); the running sum and "
        "running min ride the same sorted frame; no Join, no Python.",
        "CUSUM looks inherently sequential (C = max(0, C + x - k)) but the "
        "windowed closed form S - min(0, running-min S) makes the whole "
        "changepoint detector cost exactly one per-series sort — the same "
        "bound as any keyed window at 10^12 rows.",
    ),
    "q167_winsorize": (
        "ONE Exchange hashpartitioning(event_type) shared by the rank, "
        "count, and bound-lift windows; no Join anywhere in the plan.",
        "Percentile clipping usually plans as agg + join-back (two corpus "
        "passes); lifting the ceil(p*n) bound candidates with partition-"
        "window mins keeps it to one pass, one sort, zero joins.",
    ),
    "q170_hysteresis_alerts": (
        "ONE Exchange hashpartitioning(event_type); last(IGNORE NULLS) and "
        "the edge lag share the sorted frame; no Join, no Python.",
        "Alert-state recurrences are the canonical 'needs a driver loop' "
        "trap; expressing carry-last-crossing as an IGNORE NULLS window "
        "keeps flapping suppression fully distributed and engine-exact.",
    ),
    "q171_hot_keys": (
        "Top-k plans as TakeOrderedAndProject (each task forwards its local "
        "k) over partial-aggregated counts; the one-row totals frame joins "
        "back as a BroadcastNestedLoopJoin over exactly 1 row.",
        "The skew report must never itself be the skew victim: the "
        "distinct-key frame is neither globally sorted nor collected, and "
        "HHI's 128-bit DECIMAL div keeps concentration exact at any count.",
    ),
    "q162_trending_templates": (
        "ONE Exchange on the (role, template-digest) group key with "
        "partial aggregation before it; both period counts are conditional "
        "partial sums in the SAME aggregate — no second scan, no self-join, "
        "no Window.",
        "The naive drift query scans twice (one aggregate per period) and "
        "joins; riding both counts on one digest-keyed aggregate means a "
        "10^6-line surge still ships one partial row per task.",
    ),
    "q169_attr_cardinality": (
        "Two Exchanges: the corpus-sized one carries (key, value) partial "
        "counts (duplicate values collapse map-side), the second is the "
        "tiny per-key rollup with min(struct) dominant-value transport.",
        "A cardinality audit that shuffled raw rows would itself be the "
        "cardinality bomb; pre-aggregating per (key, value) bounds the "
        "shuffle by distinct pairs per task, never records.",
    ),
    "q173_embedding_pool": (
        "posexplode then ONE partial-aggregated Exchange keyed (label, "
        "pos) — each label spreads over dim reduce groups — then a small "
        "per-label sorted-struct array rebuild; no Python, no Window.",
        "Centroids via float means are partitioning-dependent; quantized "
        "integer sums are associative, and keying the shuffle by (key, "
        "pos) removes the hot reducer a dominant cluster would otherwise "
        "create.",
    ),
    "q202_preference_pairs": (
        "ONE Exchange beyond the pairing window's conv_id shuffle: the "
        "prompt-keyed aggregate with partial_max/partial_min of the ranked "
        "struct BEFORE the exchange; no Join, no Window over candidates.",
        "A hot prompt (the boilerplate question asked 10^9 times) collapses "
        "map-side to one struct per task — the shuffle carries per-task "
        "partials, never the candidate mass, and BENCH/PREFERENCE.md "
        "measures the formulation skew-flat where the rank-window "
        "alternative degrades 3x.",
    ),
    "q203_best_of_n": (
        "WindowGroupLimit (per-task top-n before the shuffle) on the md5 "
        "sampling rank; the argmax groupBy reuses the window's "
        "hashpartitioning(prompt_text) — one Exchange for the operator.",
        "Positional sampling needs a window, but the group limit bounds "
        "every task's sort input to n rows per prompt seen — the hot "
        "prompt contributes O(tasks x n) rows, not its full mass.",
    ),
    "q205_bpe_encode": (
        "The apply side is a Project inside WholeStageCodegen over one "
        "scan — the trained merges are literal replace chains, no Python, "
        "no broadcast, no Exchange introduced by tokenization.",
        "Tokenizing 10^12 turns must ride the scan; the merge chain "
        "compiles into the projection, and the measured Arrow-kernel "
        "alternative (BENCH/BPE_APPLY.md) trades Python workers for a "
        "4.3x win only when tokenization is the terminal job.",
    ),
    "q206_span_selftime": (
        "Partial-aggregated child-sum groupBy (one row per parent span "
        "through its Exchange), one equi-join keyed (trace, span) — "
        "never a nested loop — then a label groupBy with partial agg; "
        "the share window sorts only the label-sized frame.",
        "Self-time attribution touches every span once; the child-sum "
        "shuffle is bounded by parent spans per task and the join is "
        "AQE-sizable like any skewed equi-join (a hot trace is an "
        "ordinary hot key).",
    ),
    "q207_incremental_preferences": (
        "Two per-increment aggregates (partial max/min structs) feeding a "
        "prompt-cardinality merge aggregate — the merge's Exchange "
        "carries state rows, never candidates; no Join anywhere.",
        "The daily-build pattern: yesterday's corpus is never rescanned; "
        "the (sum, max, min) algebra makes the merged state bit-equal to "
        "a full rebuild, which the oracle (the full-corpus q202 SQL) "
        "proves on every run.",
    ),
    "q208_leakage_safe_split": (
        "The split assignment is a Project (52-bit md5 bucket arithmetic) "
        "on the cluster frame — zero Exchange added on top of the "
        "clustering it consumes.",
        "Group-atomic splitting must not cost a shuffle at 10^12 rows: "
        "the bucket is a pure expression of the component id, so split "
        "assignment rides whatever scan or join produced the clusters.",
    ),
    "q210_chat_render": (
        "ONE Exchange (hashpartitioning conv_id) into an ObjectHashAggregate "
        "carrying collect_list; template application is transform/array_join "
        "projection work after the gather — no Python, no Join, no Window.",
        "Rendering is one conversation-keyed gather: memory is bounded by "
        "the longest conversation (the pairing stages' existing bound) and "
        "a hot conversation is one group, never a reducer-wide skew.",
    ),
    "q212_context_trim": (
        "Suffix sums in one Window and a groupBy REUSING the window's "
        "conv_id hashpartitioning — plan shows exactly ONE Exchange past "
        "the transcript derivation; nothing rendered, no Python, no Join.",
        "Context trimming at 10^12 turns is a per-conversation suffix "
        "decision: closed-form prefix arithmetic makes it one linear "
        "window pass, and budget units equal the renderer's chars so the "
        "trim->render pipeline composes without a reconciliation step.",
    ),
    "q211_loss_mask_spans": (
        "ONE Exchange into a single Window node (prefix sums + row_number "
        "on the same conv_id/turn_idx sort); span arithmetic is pure "
        "projection — the rendered text is never materialized.",
        "Loss-mask offsets at 10^12 turns must not require holding a "
        "conversation's full text in one string: closed-form prefix sums "
        "give byte-exact spans from per-turn lengths alone.",
    ),
}


def main() -> int:
    from opentelemetry_collector_spark.plans.queries import QUERIES
    from opentelemetry_collector_spark.session import build_session

    spark = build_session(master="local[8]", app_name="dump-plans")
    out = [
        "# PLANS — physical-plan evidence for the scale claims",
        "",
        f"Generated by `tools/dump_plans.py` at sf_dir={SF_DIR}. Each section shows",
        "the required plan properties (asserted in `tests/test_plan_quality.py`),",
        "why they matter at 100 TB, and the actual `explain(\"formatted\")` output.",
        "",
    ]
    for name, (must, why) in COMMENTARY.items():
        df = QUERIES[name](spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
        # keep the operator tree + scan details; drop the long per-node field dumps
        tree = plan.split("\n\n")[0]
        details = "\n".join(
            line
            for line in plan.splitlines()
            if re.search(r"PushedFilters|ReadSchema|Arguments: \[?conv|hashpartitioning", line)
        )
        out += [
            f"## {name}",
            "",
            f"**Required:** {must}",
            "",
            f"**Why at scale:** {why}",
            "",
            "```",
            tree.strip(),
            "```",
            "",
        ]
        if details.strip():
            out += ["Key scan/exchange details:", "", "```", details.strip(), "```", ""]
    spark.stop()
    with open(os.path.join(REPO, "PLANS.md"), "w") as f:
        f.write("\n".join(out))
    print(f"wrote PLANS.md ({len(out)} lines)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
