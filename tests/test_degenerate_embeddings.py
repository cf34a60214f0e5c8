"""Degenerate-vector sweep over the ANN/similarity queries: the zero
vector (undefined cosine), tiny/huge magnitudes, negatives, and a
duplicate pair — no-crash + row-accounting assertions (value semantics are
pinned by the operators' own tests)."""

from __future__ import annotations

import numpy as np
import pytest

from opentelemetry_collector_spark.plans.queries import QUERIES

ANN_QUERIES = [
    "q16_ann_topk",
    "q17_embedding_dedup",
    "q21_ann_lsh",
    "q30_ann_ivf",
    "q55_ann_ivf_trained",
    "q63_ann_pq",
    "q64_ann_ivf_pq",
    "q76_cluster_balance",
]


@pytest.fixture(scope="module")
def weird_emb_dir(spark, tmp_path_factory):
    src = "/root/testdata/sf0.001"
    dst = tmp_path_factory.mktemp("sf_weird_emb")
    dim = 64
    rng = np.random.default_rng(4)
    rows = []
    for i in range(40):
        v = rng.standard_normal(dim)
        rows.append((i, [float(x) for x in v], i % 4))
    rows.append((100, [0.0] * dim, 0))                      # zero vector
    rows.append((101, [1e-30] * dim, 1))                    # denormal-ish
    rows.append((102, [1e30, -1e30] * (dim // 2), 2))       # huge mixed signs
    rows.append((103, rows[0][1], 3))                       # exact duplicate of 0
    rows.append((104, None, 0))                             # NULL embedding (junk row)
    spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int").coalesce(
        1
    ).write.parquet(str(dst / "embeddings.parquet"))
    for name in ["events", "customer", "documents"]:
        spark.read.parquet(f"{src}/{name}.parquet").coalesce(1).write.parquet(
            str(dst / f"{name}.parquet")
        )
    return str(dst)


@pytest.mark.parametrize("name", ANN_QUERIES)
def test_ann_query_survives_degenerate_vectors(spark, weird_emb_dir, name):
    out = QUERIES[name](spark, weird_emb_dir)
    # collect() IS the no-crash check; rank density below is the value check
    rows = out.collect()
    assert out.columns, name
    if name in ("q16_ann_topk", "q30_ann_ivf", "q55_ann_ivf_trained", "q63_ann_pq"):
        # the duplicate pair must surface as some query's top hit set member
        # and ranks must stay dense per query
        by_q = {}
        for r in rows:
            by_q.setdefault(r.query_id, []).append(r.rank)
        for ranks in by_q.values():
            assert sorted(ranks) == list(range(1, len(ranks) + 1))


def test_codebook_artifacts_have_no_platform_cast_sentinels(spark, weird_emb_dir):
    """The q63/q64 oracle artifacts are replayed by DuckDB on whatever
    platform runs the gate; a NaN/inf that reaches the int64 cast would
    write the platform-defined sentinel (INT64_MIN on x86). After the
    degenerate-corpus runs, every written codebook/centroid cell must be
    a real (small) quantized value."""
    import pyarrow.parquet as pq

    from opentelemetry_collector_spark.plans.queries import _ORACLE_ARTIFACTS

    QUERIES["q63_ann_pq"](spark, weird_emb_dir).collect()
    QUERIES["q64_ann_ivf_pq"](spark, weird_emb_dir).collect()
    checked = 0
    for name in ("q63_books.parquet", "q64_books.parquet", "q64_cents.parquet"):
        path = f"{_ORACLE_ARTIFACTS}/{name}"
        try:
            w = pq.read_table(path).column("w").to_numpy()
        except FileNotFoundError:
            continue
        assert (w != np.iinfo(np.int64).min).all(), name
        assert np.abs(w).max() <= 2**62, name  # the quantizer's clip bound
        checked += 1
    assert checked >= 2
