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
]

SEEDS = [11, 23, 47]


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


# ---------------------------------------------------------------------------
# embeddings-table fuzzing (ANN / similarity: integer-quantized cosine paths)
# ---------------------------------------------------------------------------

EMB_FUZZ_QUERIES = [
    "q16_ann_topk",
    "q17_embedding_dedup",
    "q30_ann_ivf",
    "q55_ann_ivf_trained",
    "q65_semantic_dedup",
    "q76_cluster_balance",
    "q173_embedding_pool",
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
