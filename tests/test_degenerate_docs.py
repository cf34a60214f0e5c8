"""Degenerate-content sweep over the documents-family queries: NULL text,
empty, whitespace-only, single char, exact-boundary lengths, unicode, and a
pathological repeat — the per-row edge cases every text kernel must absorb
without crashing (assertions are no-crash + row accounting; value semantics
for each op are pinned by its own golden tests)."""

from __future__ import annotations

import pytest

from opentelemetry_collector_spark.plans.queries import QUERIES

DOC_QUERIES = [
    "q12_dedup_exact",
    "q13_text_quality",
    "q14_lang_id",
    "q15_token_count",
    "q18_multimodal_stats",
    "q19_minhash_lsh",
    "q20_simhash_neardup",
    "q25_ngram_jaccard",
    "q35_media_histogram",
    "q36_trainprep",
    "q39_dedup_clusters",
    "q44_pii_redact",
    "q45_repetition",
    "q46_decontaminate",
    "q47_vocab_coverage",
    "q50_exact_substring",
    "q56_language_balanced_sample",
    # q57/q58: no budget covers source "weird" -> must drop-all, not crash;
    # q59: every fixture doc_id is a multiple of 50 -> all-target/empty-raw
    "q57_token_budget_mix",
    "q58_token_budget_rate",
    "q59_importance_mass",
    "q60_chunk_documents",
    "q61_incremental_dedup",
    "q62_selection_pipeline",
    "q67_gopher_filter",
    "q68_tfidf_top_terms",
    "q74_c4_clean",
    "q75_boilerplate_lines",
    "q80_linear_classifier",
    "q81_unicode_normalize",
    "q82_substring_removal",
    "q83_shuffle_shards",
    "q84_classifier_train",
    "q85_corpus_build",
    "q86_epoch_expand",
    "q95_bpe_train",
]

WEIRD_TEXTS = [
    None,
    "",
    "   ",
    "a",
    "é" * 39,  # one short of the q50 anchor length
    "é" * 40,  # exactly the anchor length, non-ASCII
    "word " * 300,  # pathological repetition
    "日本語テキスト 中文 한국어 🚀 emoji",
    "the and of is " * 10,  # pure stopwords (lang-ID saturation)
    "tab\tnewline\nmixed   spacing",
]


@pytest.fixture(scope="module")
def weird_sf_dir(spark, tmp_path_factory):
    src = "/root/testdata/sf0.001"
    dst = tmp_path_factory.mktemp("sf_weird")
    rows = [
        (50 * i, t, "en", "weird", len(t) if t else 0)
        for i, t in enumerate(WEIRD_TEXTS)
    ]
    spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    ).coalesce(1).write.parquet(str(dst / "documents.parquet"))
    for name in ["events", "customer", "embeddings"]:
        spark.read.parquet(f"{src}/{name}.parquet").coalesce(1).write.parquet(
            str(dst / f"{name}.parquet")
        )
    return str(dst)


@pytest.mark.parametrize("name", DOC_QUERIES)
def test_doc_query_survives_degenerate_text(spark, weird_sf_dir, name):
    out = QUERIES[name](spark, weird_sf_dir)
    n = out.count()
    assert n >= 0
    # per-doc ops must not silently drop the degenerate rows
    if name in {"q13_text_quality", "q14_lang_id", "q15_token_count",
                "q44_pii_redact", "q45_repetition", "q47_vocab_coverage",
                "q50_exact_substring", "q67_gopher_filter",
                "q80_linear_classifier", "q81_unicode_normalize"}:
        assert n >= len(WEIRD_TEXTS)
