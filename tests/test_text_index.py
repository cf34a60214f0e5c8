"""Inverted text index (operators/search.py): build/serve split, static
bucket pruning at probe time, integer scoring parity with a brute force."""

from __future__ import annotations

from collections import Counter

import pytest

from opentelemetry_collector_spark.operators.search import (
    search_text_index,
    write_text_index,
)

DOCS = {
    "d1": "spark shuffles the wide rows",
    "d2": "spark broadcasts the small rows",
    "d3": "ducks quack loudly",
    "d4": "spark spark spark tuning",
    "d5": "",
}


def _brute(query: str, require_all=False):
    tfs = {d: Counter(t.split()) for d, t in DOCS.items() if t.strip()}
    n = len(DOCS)
    maxb = n.bit_length()
    dfreq = Counter(t for tf in tfs.values() for t in tf)
    q = sorted(set(query.split()))
    out = {}
    for d, tf in tfs.items():
        hits = [t for t in q if t in tf]
        if not hits or (require_all and len(hits) < len(q)):
            continue
        score = sum(tf[t] * (maxb - dfreq[t].bit_length() + 1) for t in hits)
        out[d] = (len(hits), score)
    return out


@pytest.fixture(scope="module")
def index(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("tidx"))
    df = spark.createDataFrame(list(DOCS.items()), "doc_id string, text string")
    stats = write_text_index(df, "doc_id", path, n_buckets=8)
    assert stats["n_docs"] == 5 and stats["n_buckets"] == 8
    return path


def test_search_matches_brute_force_scoring(spark, index):
    for query, req in (("spark rows", False), ("spark rows", True), ("quack", False)):
        got = {
            r["doc_id"]: (r["n_hit"], r["score"])
            for r in search_text_index(spark, index, query, k=10, require_all=req).collect()
        }
        assert got == _brute(query, req), (query, req)


def test_search_topk_order_and_empty_query(spark, index):
    top = search_text_index(spark, index, "spark", k=2).collect()
    # d4 has tf=3 -> highest score; then d1/d2 tie -> doc_id ascending
    assert [r["doc_id"] for r in top] == ["d4", "d1"]
    assert search_text_index(spark, index, "   ", k=5).count() == 0
    assert search_text_index(spark, index, "zzz_unseen", k=5).count() == 0
    with pytest.raises(ValueError, match="k must"):
        search_text_index(spark, index, "spark", k=0)


def test_search_probe_prunes_buckets(spark, index):
    import re

    df = search_text_index(spark, index, "quack", k=5)
    plan = spark._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    # the single-term probe carries a literal bucket equality into the scan
    m = re.search(r"PartitionFilters: \[isnotnull\(_bucket#\d+\), \(_bucket#\d+ = \d+\)\]", plan)
    assert m, plan[:2000]
