"""Randomized cross-engine differential testing: seeded random event
tables — NULL-riddled, tie-heavy, extreme-valued — run through BOTH the
Spark query and its DuckDB oracle, compared exactly.

This is the driver's correctness gate turned adversarial: the fixed sf
fixtures exercise one data distribution; these tables are built to hit
the cross-engine traps (ordering ties, NULL grouping, float->cents
boundaries, empty groups) that a benign distribution never trips. Only
queries whose oracle reads the `events` table alone participate.
"""

from __future__ import annotations

import datetime as dt
import os

import duckdb
import numpy as np
import pandas as pd
import pytest

from opentelemetry_collector_spark.plans.queries import ORACLES, QUERIES

# queries whose oracles read only the `events` (+ `customer` dim) tables
FUZZ_QUERIES = [
    "q158_counter_rate",
    "q163_cusum_drift",
    "q167_winsorize",
    "q170_hysteresis_alerts",
    "q172_equi_depth_bins",
    "q175_volume_trend",
    "q177_seasonal_deviation",
    "q178_rank_normalize",
    # transcripts pipeline (events -> transcripts derivation + conv_meta dim)
    "q00_pipeline_e2e",
    "q01_parse_extract",
    "q02_filter_strict",
    "q05_enrich_broadcast",
    "q06_route_counts",
    "q07_turn_counts",
    "q54_sessionize",
    "q69_integrity_audit",
    "q90_log_templates",
    "q107_robust_anomalies",
    "q162_trending_templates",
    "q165_k_anonymity",
    "q166_qi_suppression",
    "q168_vocab_growth",
    "q169_attr_cardinality",
    "q171_hot_keys",
    "q44_pii_redact",
    # round-2 oracles: portable HLL registers + prometheus scrape semantics
    "q66_sketch_rollup",
    "q180_prom_relabel",
    "q181_prom_staleness",
    # round-4 dialogue pairing family (windows + recursive-CTE pack replay;
    # the NULL-ts / tie-heavy tables hit the latency-NULL and fence paths)
    "q198_sft_pairs",
    "q199_tool_roundtrips",
    "q200_sft_pack",
    # round-4 preference family (argmax/argmin structs vs row_number
    # windows; NULL-riddled tables hit the candidate-disqualification paths)
    "q202_preference_pairs",
    "q203_best_of_n",
    "q204_channel_winrates",
    # round-5 chat-template rendering family (string_agg vs collect_list
    # ordering; NULL text/role keep their slots so spans stay aligned)
    "q210_chat_render",
    "q211_loss_mask_spans",
    "q212_context_trim",
    "q207_incremental_preferences",
    # round-4: flame-graph self-time (clamp + NULL-duration paths under fuzz)
    "q206_span_selftime",
]

SEEDS = [11, 23, 47, 89, 131]


def _random_events(seed: int) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    n = 400
    base = dt.datetime(2024, 1, 1)
    # tie-heavy timestamps: few distinct instants, many collisions
    ts_off = rng.integers(0, 40, n) * 3600 + rng.integers(0, 3, n)
    ts = [base + dt.timedelta(seconds=int(s)) for s in ts_off]
    # values: mixture of normal, exact float traps, extremes, zeros
    vals = np.round(rng.uniform(0, 100, n), 2)
    vals[rng.random(n) < 0.05] = 0.0
    vals[rng.random(n) < 0.03] = 19.15          # the floor(x*100) trap value
    big = rng.random(n) < 0.02
    vals[big] = 8.9e15                           # extreme but in-range
    df = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype="int64"),
            "ts": pd.to_datetime(ts),
            "user_id": rng.integers(0, 25, n).astype("int64"),
            "event_type": rng.choice(
                ["view", "click", "error", "purchase", "signup"], n
            ),
            "value": vals.astype("float64"),
            "props": ['{"k":1}'] * n,
        }
    )
    # junk injection: NULL ts / value / event_type rows
    for col, frac in [("ts", 0.04), ("value", 0.05), ("event_type", 0.02)]:
        mask = rng.random(n) < frac
        df.loc[mask, col] = None
    return df


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]")
        elif df[c].dtype == object:
            df[c] = df[c].astype("string")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def _random_customers(seed: int) -> pd.DataFrame:
    rng = np.random.default_rng(seed + 1000)
    # keys overlap the event user_ids 0..24 partially: missing dims exercise
    # the left-join NULL path; extra dims exercise unmatched rows
    keys = rng.choice(np.arange(0, 35, dtype="int64"), size=28, replace=False)
    return pd.DataFrame(
        {
            "c_custkey": keys,
            "c_name": [f"cust{k}" for k in keys],
            "c_mktsegment": rng.choice(
                ["BUILDING", "MACHINERY", "AUTOMOBILE", None], size=keys.size
            ),
        }
    )


@pytest.fixture(scope="module", params=SEEDS)
def fuzz_dir(request, spark, tmp_path_factory):
    seed = request.param
    d = tmp_path_factory.mktemp(f"fuzz_{seed}")
    pdf = _random_events(seed)
    spark.createDataFrame(
        pdf,
        "event_id bigint, ts timestamp, user_id bigint, event_type string,"
        " value double, props string",
    ).coalesce(1).write.parquet(str(d / "events.parquet"))
    spark.createDataFrame(
        _random_customers(seed),
        "c_custkey bigint, c_name string, c_mktsegment string",
    ).coalesce(1).write.parquet(str(d / "customer.parquet"))
    return str(d)


@pytest.mark.parametrize("name", FUZZ_QUERIES)
def test_differential_random_events(spark, fuzz_dir, name):
    got = QUERIES[name](spark, fuzz_dir).toPandas()
    con = duckdb.connect()
    for t in ("events", "customer"):
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{os.path.join(fuzz_dir, f'{t}.parquet')}/*.parquet'"
        )
    want = con.sql(ORACLES[name]).df()
    a, b = _normalize(got), _normalize(want)
    assert list(a.columns) == list(b.columns)
    assert len(a) == len(b), f"{name}: {len(a)} vs {len(b)} rows"
    pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=True)


# ---------------------------------------------------------------------------
# documents-table fuzzing (corpus-quality ops: regex dialects, tokenization,
# unicode — where Java regex / RE2 / DuckDB disagree first)
# ---------------------------------------------------------------------------

DOC_FUZZ_QUERIES = [
    "q12_dedup_exact",
    "q13_text_quality",
    "q14_lang_id",
    "q15_token_count",
    "q25_ngram_jaccard",
    "q45_repetition",
    "q46_decontaminate",
    "q47_vocab_coverage",
    "q60_chunk_documents",
    "q67_gopher_filter",
    "q74_c4_clean",
    "q75_boilerplate_lines",
    "q80_linear_classifier",
    "q83_shuffle_shards",
    "q86_epoch_expand",
    "q106_surprisal",
    "q117_weighted_sample",
    # round-2 generated-oracle replays: the FNV+splitmix64 hash pipelines
    # and the fixed-point GD trainer must agree on adversarial unicode/
    # whitespace/NULL/duplicate-heavy corpora, not just the fixtures
    "q19_minhash_lsh",
    "q20_simhash_neardup",
    "q84_classifier_train",
    # round-4: trained-BPE apply — merges retrained per corpus in both
    # engines, then the replace-chain application must agree per doc
    "q205_bpe_encode",
    # round-4: cluster-atomic splitting (closure + bucket arithmetic on
    # adversarial duplicate-heavy corpora)
    "q208_leakage_safe_split",
]

_WORDS = [
    "the", "of", "and", "data", "spark", "query", "fast", "slow", "très",
    "naïve", "Ω", "日本語", "x+y", "a.b", "(paren", "bracket]", "tab\tsep",
    "e@mail.com", "10.0.0.1", "12-345-678-9012", "caps", "CAPS", "MiXeD",
]


def _random_documents(seed: int) -> pd.DataFrame:
    rng = np.random.default_rng(seed + 2000)
    n = 200
    texts = []
    for i in range(n):
        k = int(rng.integers(0, 40))
        toks = list(rng.choice(_WORDS, size=k)) if k else []
        sep = rng.choice([" ", "  ", "\n"])
        t = str(sep).join(toks)
        if rng.random() < 0.05:
            t = ""                      # empty doc
        if rng.random() < 0.05:
            t = t + "."                 # terminal punctuation (C4 rule)
        texts.append(t)
    df = pd.DataFrame(
        {
            "doc_id": np.arange(n, dtype="int64"),
            "text": texts,
            "lang": rng.choice(["en", "fr", "de", None], size=n),
            "source": rng.choice(["src0", "src1", "src2"], size=n),
            "n_chars": [len(t) for t in texts],
        }
    )
    df.loc[rng.random(n) < 0.03, "text"] = None     # NULL docs
    # exact duplicates: dedup/ngram paths need real collisions
    dup = rng.choice(n, size=20, replace=False)
    half = len(dup) // 2
    df.loc[dup[:half], "text"] = df.loc[dup[half : 2 * half], "text"].to_numpy()
    return df


@pytest.fixture(scope="module", params=SEEDS)
def doc_fuzz_dir(request, spark, tmp_path_factory):
    seed = request.param
    d = tmp_path_factory.mktemp(f"docfuzz_{seed}")
    spark.createDataFrame(
        _random_documents(seed),
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    ).coalesce(1).write.parquet(str(d / "documents.parquet"))
    return str(d)


@pytest.mark.parametrize("name", DOC_FUZZ_QUERIES)
def test_differential_random_documents(spark, doc_fuzz_dir, name):
    got = QUERIES[name](spark, doc_fuzz_dir).toPandas()
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM '{os.path.join(doc_fuzz_dir, 'documents.parquet')}/*.parquet'"
    )
    want = con.sql(ORACLES[name]).df()
    a, b = _normalize(got), _normalize(want)
    assert list(a.columns) == list(b.columns)
    assert len(a) == len(b), f"{name}: {len(a)} vs {len(b)} rows"
    pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=True)


def test_bpe_kernel_matches_jvm_on_fuzz_corpora(spark, doc_fuzz_dir):
    """The memoized Arrow BPE kernel vs the JVM replace chain, row-for-row
    on the adversarial corpora (unicode words, mixed casing, tab/newline
    separators): lower() + [a-z]+ + the merge chain must agree between
    Python-str and UTF8String semantics on every doc."""
    from pyspark.sql import functions as F

    from opentelemetry_collector_spark.operators.bpe import (
        bpe_token_count_trained,
        bpe_token_counts_kernel,
        bpe_train,
    )

    docs = spark.read.parquet(os.path.join(doc_fuzz_dir, "documents.parquet"))
    merges = bpe_train(docs, n_merges=6)
    both = bpe_token_counts_kernel(docs, merges).select(
        "doc_id",
        "bpe_tokens",
        bpe_token_count_trained(F.col("text"), merges).alias("jvm"),
    )
    bad = both.filter(~F.col("bpe_tokens").eqNullSafe(F.col("jvm"))).count()
    assert bad == 0


# ---------------------------------------------------------------------------
# embeddings-table fuzzing (ANN / similarity: integer-quantized cosine paths)
# ---------------------------------------------------------------------------

EMB_FUZZ_QUERIES = [
    # round-2: integer hyperplane buckets and the integer-exact PQ serving
    # modes (q63/q64 persist their trained codebooks per run; the oracle
    # replays THIS run's artifacts, so random training inputs are fair game)
    "q21_ann_lsh",
    "q63_ann_pq",
    "q64_ann_ivf_pq",
    "q16_ann_topk",
    "q17_embedding_dedup",
    "q30_ann_ivf",
    "q55_ann_ivf_trained",
    "q65_semantic_dedup",
    "q76_cluster_balance",
    "q173_embedding_pool",
    # round-4: negative mining (exact cosine + md5 picks; the planted
    # exact/near duplicates exercise the dup-bar exclusion)
    "q201_contrastive_negatives",
]


def _random_embeddings(seed: int) -> pd.DataFrame:
    rng = np.random.default_rng(seed + 3000)
    n, dim = 150, 64   # dim 64: the IVF queries' centroid-probe contract
    # sixteenths: exactly representable in float32 AND float64, so the
    # integer-quantized cosine paths see identical bits in both engines
    vecs = (rng.integers(-32, 33, size=(n, dim)) / 16.0).astype("float32")
    # planted exact duplicates and near-duplicates for the dedup paths
    vecs[10] = vecs[20]
    vecs[30] = vecs[40]
    vecs[31] = vecs[40] * np.float32(1.0)  # another exact copy
    # zero vectors (no cosine) and a NULL vector row
    vecs[5] = 0.0
    emb = [None if i == 7 else [float(x) for x in v] for i, v in enumerate(vecs)]
    return pd.DataFrame(
        {
            "vec_id": np.arange(n, dtype="int64"),
            "embedding": emb,
            "label": rng.integers(0, 5, n).astype("int32"),
        }
    )


@pytest.fixture(scope="module", params=SEEDS)
def emb_fuzz_dir(request, spark, tmp_path_factory):
    seed = request.param
    d = tmp_path_factory.mktemp(f"embfuzz_{seed}")
    spark.createDataFrame(
        _random_embeddings(seed), "vec_id bigint, embedding array<float>, label int"
    ).coalesce(1).write.parquet(str(d / "embeddings.parquet"))
    return str(d)


@pytest.mark.parametrize("name", EMB_FUZZ_QUERIES)
def test_differential_random_embeddings(spark, emb_fuzz_dir, name):
    got = QUERIES[name](spark, emb_fuzz_dir).toPandas()
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW embeddings AS SELECT * FROM '{os.path.join(emb_fuzz_dir, 'embeddings.parquet')}/*.parquet'"
    )
    want = con.sql(ORACLES[name]).df()
    a, b = _normalize(got), _normalize(want)
    assert list(a.columns) == list(b.columns)
    assert len(a) == len(b), f"{name}: {len(a)} vs {len(b)} rows"
    pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=True)


# ---------------------------------------------------------------------------
# star-schema fuzzing (TPC-H-shaped analytics: cents arithmetic, date
# filters, outer joins, tie-breaks — with orphan keys and NULL measures)
# ---------------------------------------------------------------------------

STAR_FUZZ_QUERIES = [
    "q113_pricing_summary",
    "q114_shipping_priority",
    "q115_local_supplier_volume",
    "q116_promo_revenue",
    "q118_table_profile",
    "q121_referential_audit",
    "q122_order_priority",
    "q123_returned_items",
    "q124_customer_orders_dist",
    "q125_large_volume_orders",
    "q138_forecast_revenue",
    "q139_volume_shipping",
    "q140_market_share",
    "q141_product_profit",
    "q142_important_parts",
    "q143_line_priority",
    "q144_top_supplier",
    "q145_part_supplier_counts",
    "q146_small_qty_revenue",
    "q147_promo_suppliers",
    "q148_waiting_suppliers",
    "q149_sales_opportunity",
    "q150_min_cost_supplier",
    "q151_disjunctive_revenue",
    "q44_pii_redact",
]


def _random_star(seed: int) -> dict[str, pd.DataFrame]:
    rng = np.random.default_rng(seed + 4000)

    def money(n, lo, hi):
        return np.round(rng.uniform(lo, hi, n), 2)

    def date(n, start_year=1992, years=7):
        days = rng.integers(0, years * 365, n)
        return pd.to_datetime("%d-01-01" % start_year) + pd.to_timedelta(days, unit="D")

    region = pd.DataFrame({
        "r_regionkey": np.arange(5, dtype="int32"),
        "r_name": ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"],
    })
    nation = pd.DataFrame({
        "n_nationkey": np.arange(12, dtype="int32"),
        "n_name": [f"NATION{i}" for i in range(12)],
        # regionkey 5 is an orphan region reference
        "n_regionkey": rng.integers(0, 6, 12).astype("int32"),
    })
    nc, ns, npart, no, nl = 40, 15, 30, 120, 400
    customer = pd.DataFrame({
        "c_custkey": np.arange(1, nc + 1, dtype="int64"),
        "c_name": [f"Customer#{i:09d}" for i in range(1, nc + 1)],
        "c_nationkey": rng.integers(0, 14, nc).astype("int32"),  # some orphans
        "c_acctbal": money(nc, -999, 9999),
        "c_mktsegment": rng.choice(
            ["BUILDING", "AUTOMOBILE", "MACHINERY", "HOUSEHOLD", "FURNITURE"], nc
        ),
    })
    supplier = pd.DataFrame({
        "s_suppkey": np.arange(1, ns + 1, dtype="int64"),
        "s_name": [f"Supplier#{i:09d}" for i in range(1, ns + 1)],
        "s_nationkey": rng.integers(0, 14, ns).astype("int32"),
        "s_acctbal": money(ns, -999, 9999),
    })
    part = pd.DataFrame({
        "p_partkey": np.arange(1, npart + 1, dtype="int64"),
        "p_name": [f"part {i} colored widget" for i in range(1, npart + 1)],
        "p_brand": rng.choice([f"Brand#{i}{j}" for i in range(1, 4) for j in range(1, 4)], npart),
        "p_type": rng.choice(
            ["PROMO BURNISHED COPPER", "PROMO PLATED TIN", "ECONOMY ANODIZED STEEL",
             "STANDARD POLISHED BRASS", "SMALL BRUSHED NICKEL"], npart
        ),
        "p_size": rng.integers(1, 51, npart).astype("int32"),
        "p_retailprice": money(npart, 900, 2000),
    })
    orders = pd.DataFrame({
        "o_orderkey": np.arange(1, no + 1, dtype="int64"),
        # custkey up to nc+4: orphan orders exercise the audit/outer joins
        "o_custkey": rng.integers(1, nc + 5, no).astype("int64"),
        "o_orderstatus": rng.choice(["F", "O", "P"], no),
        "o_totalprice": money(no, 1000, 400000),
        "o_orderdate": date(no),
        "o_orderpriority": rng.choice(
            ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"], no
        ),
    })
    lineitem = pd.DataFrame({
        "l_orderkey": rng.integers(1, no + 8, nl).astype("int64"),  # some orphans
        "l_partkey": rng.integers(1, npart + 1, nl).astype("int64"),
        "l_suppkey": rng.integers(1, ns + 1, nl).astype("int64"),
        "l_linenumber": rng.integers(1, 8, nl).astype("int32"),
        "l_quantity": rng.integers(1, 51, nl).astype("float64"),
        "l_extendedprice": money(nl, 900, 100000),
        "l_discount": np.round(rng.integers(0, 11, nl) / 100.0, 2),
        "l_tax": np.round(rng.integers(0, 9, nl) / 100.0, 2),
        "l_returnflag": rng.choice(["R", "A", "N"], nl),
        "l_linestatus": rng.choice(["O", "F"], nl),
        "l_shipdate": date(nl),
    })
    # sprinkle NULLs on measures and dates (never on the key columns — a
    # NULL join key is the referential audit's own tested concern)
    for df, cols, frac in [
        (lineitem, ["l_extendedprice", "l_discount", "l_shipdate"], 0.02),
        (orders, ["o_totalprice", "o_orderdate"], 0.02),
        (customer, ["c_acctbal", "c_mktsegment"], 0.03),
    ]:
        for c in cols:
            df.loc[rng.random(len(df)) < frac, c] = None
    return {
        "region": region, "nation": nation, "customer": customer,
        "supplier": supplier, "part": part, "orders": orders,
        "lineitem": lineitem,
    }


_STAR_SCHEMAS = {
    "region": "r_regionkey int, r_name string",
    "nation": "n_nationkey int, n_name string, n_regionkey int",
    "customer": "c_custkey bigint, c_name string, c_nationkey int, c_acctbal double, c_mktsegment string",
    "supplier": "s_suppkey bigint, s_name string, s_nationkey int, s_acctbal double",
    "part": "p_partkey bigint, p_name string, p_brand string, p_type string, p_size int, p_retailprice double",
    "orders": "o_orderkey bigint, o_custkey bigint, o_orderstatus string, o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    "lineitem": ("l_orderkey bigint, l_partkey bigint, l_suppkey bigint, l_linenumber int,"
                 " l_quantity double, l_extendedprice double, l_discount double, l_tax double,"
                 " l_returnflag string, l_linestatus string, l_shipdate timestamp"),
}


@pytest.fixture(scope="module", params=SEEDS)
def star_fuzz_dir(request, spark, tmp_path_factory):
    seed = request.param
    d = tmp_path_factory.mktemp(f"starfuzz_{seed}")
    for t, pdf in _random_star(seed).items():
        spark.createDataFrame(pdf, _STAR_SCHEMAS[t]).coalesce(1).write.parquet(
            str(d / f"{t}.parquet")
        )
    return str(d)


@pytest.mark.parametrize("name", STAR_FUZZ_QUERIES)
def test_differential_random_star(spark, star_fuzz_dir, name):
    got = QUERIES[name](spark, star_fuzz_dir).toPandas()
    con = duckdb.connect()
    for t in _STAR_SCHEMAS:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{os.path.join(star_fuzz_dir, f'{t}.parquet')}/*.parquet'"
        )
    want = con.sql(ORACLES[name]).df()
    a, b = _normalize(got), _normalize(want)
    assert list(a.columns) == list(b.columns)
    assert len(a) == len(b), f"{name}: {len(a)} vs {len(b)} rows"
    pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=True)


# ---------------------------------------------------------------------------
# ASCII documents fuzzing: the byte-level oracles (q22 features, q179 media
# decode) replay Spark's UTF-8 byte math from DuckDB code points, which
# coincide exactly on ASCII — the fixture corpus's contract. Fuzz them with
# adversarial ASCII (empty/NULL docs, control-ish chars, long runs) rather
# than the unicode corpus above.
# ---------------------------------------------------------------------------

ASCII_DOC_FUZZ_QUERIES = ["q22_media_features", "q179_media_decode"]


def _random_ascii_documents(seed: int) -> pd.DataFrame:
    rng = np.random.default_rng(seed + 5000)
    n = 150
    alphabet = list("abcdefghijklmnop QRSTUV0123456789.,;:!?#@[]{}|~^")
    texts = []
    for _ in range(n):
        k = int(rng.integers(0, 300))
        t = "".join(rng.choice(alphabet, size=k)) if k else ""
        if rng.random() < 0.05:
            t = "x" * int(rng.integers(1, 4))     # tiny docs (< one pixel row)
        texts.append(t)
    df = pd.DataFrame(
        {
            "doc_id": np.arange(n, dtype="int64"),
            "text": texts,
            "lang": ["en"] * n,
            "source": ["src0"] * n,
            "n_chars": [len(t) for t in texts],
        }
    )
    df.loc[rng.random(n) < 0.04, "text"] = None
    return df


@pytest.fixture(scope="module", params=SEEDS)
def ascii_doc_fuzz_dir(request, spark, tmp_path_factory):
    seed = request.param
    d = tmp_path_factory.mktemp(f"asciifuzz_{seed}")
    spark.createDataFrame(
        _random_ascii_documents(seed),
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    ).coalesce(1).write.parquet(str(d / "documents.parquet"))
    return str(d)


@pytest.mark.parametrize("name", ASCII_DOC_FUZZ_QUERIES)
def test_differential_random_ascii_documents(spark, ascii_doc_fuzz_dir, name):
    got = QUERIES[name](spark, ascii_doc_fuzz_dir).toPandas()
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM '{os.path.join(ascii_doc_fuzz_dir, 'documents.parquet')}/*.parquet'"
    )
    want = con.sql(ORACLES[name]).df()
    a, b = _normalize(got), _normalize(want)
    assert list(a.columns) == list(b.columns)
    assert len(a) == len(b), f"{name}: {len(a)} vs {len(b)} rows"
    pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=True)
