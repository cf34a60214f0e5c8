"""Sequence packing + deterministic stratified sampling (training-data ops)."""

from __future__ import annotations

from pyspark.sql import functions as F

from opentelemetry_collector_spark.operators.packing import chunk_stats, pack_sequences
from opentelemetry_collector_spark.operators.sample import stratified_sample


def _turns(spark, toks, conv="c"):
    return spark.createDataFrame(
        [(conv, i, int(t)) for i, t in enumerate(toks)], "conv_id string, turn_idx int, tok long"
    )


def test_greedy_boundaries_golden(spark):
    df = _turns(spark, [50, 50, 30, 120, 10])
    got = {r.turn_idx: r.chunk_id for r in pack_sequences(df, 100, "tok").collect()}
    # 50+50 fills chunk 0; 30 opens 1; oversized 120 gets its own chunk; 10 opens 3
    assert got == {0: 0, 1: 0, 2: 1, 3: 2, 4: 3}


def test_oversized_first_turn_keeps_chunk_zero(spark):
    df = _turns(spark, [500, 1])
    got = {r.turn_idx: r.chunk_id for r in pack_sequences(df, 100, "tok").collect()}
    assert got == {0: 0, 1: 1}


def test_packing_preserves_rows_and_respects_budget(spark, small):
    from opentelemetry_collector_spark.operators.text import token_count

    t = small.withColumn("tok", token_count(F.col("text")))
    packed = pack_sequences(t, 120, "tok")
    assert packed.count() == t.count()
    a = {(r.conv_id, r.turn_idx, r.text) for r in t.collect()}
    b = {(r.conv_id, r.turn_idx, r.text) for r in packed.collect()}
    assert a == b  # grouping changed, content and order keys did not
    stats = chunk_stats(packed, "tok").collect()
    # multi-turn chunks never exceed the budget (singleton chunks may)
    for r in stats:
        assert r.n_turns == 1 or r.chunk_tokens <= 120
    # chunk ids are dense from 0 per conversation
    per_conv = {}
    for r in stats:
        per_conv.setdefault(r.conv_id, []).append(r.chunk_id)
    for ids in per_conv.values():
        assert sorted(ids) == list(range(len(ids)))


def test_stratified_sample_exact_counts_and_determinism(spark, small):
    df = small.withColumn(
        "_sid", F.concat(F.col("conv_id"), F.lit(":"), F.col("turn_idx").cast("string"))
    )
    out1 = stratified_sample(df, ["role"], 7, "_sid")
    counts = {r.role: r.n for r in out1.groupBy("role").agg(F.count("*").alias("n")).collect()}
    avail = {r.role: r.n for r in df.groupBy("role").agg(F.count("*").alias("n")).collect()}
    for role, n in counts.items():
        assert n == min(7, avail[role])
    k1 = {(r.conv_id, r.turn_idx) for r in out1.collect()}
    k2 = {(r.conv_id, r.turn_idx) for r in stratified_sample(df, ["role"], 7, "_sid").collect()}
    assert k1 == k2  # seed-free determinism
    assert k1 <= {(r.conv_id, r.turn_idx) for r in df.collect()}


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, source string, tok long")


def test_token_budget_sample_hard_cap_and_dropped_strata(spark):
    from opentelemetry_collector_spark.operators.sample import token_budget_sample

    rows = [(i, "a", 10) for i in range(10)] + [(100 + i, "b", 10) for i in range(4)]
    rows += [(200, "c", 5)]  # stratum without a budget -> dropped
    df = _docs(spark, rows)
    out = token_budget_sample(df, "source", {"a": 35, "b": 1000}, "doc_id", "tok")
    got = out.groupBy("source").agg(F.count("*").alias("n"), F.sum("tok").alias("t")).collect()
    d = {r.source: (r.n, r.t) for r in got}
    # hard cap: 3 docs of 10 tokens fit in 35, the 4th would cross
    assert d["a"] == (3, 30)
    assert d["b"] == (4, 40)  # over-provisioned budget keeps everything
    assert "c" not in d


def test_token_budget_sample_deterministic_and_prefix_stable(spark):
    from opentelemetry_collector_spark.operators.sample import token_budget_sample

    rows = [(i, "a", 7) for i in range(30)]
    df = _docs(spark, rows)
    small = {r.doc_id for r in token_budget_sample(df, "source", {"a": 70}, "doc_id", "tok").collect()}
    big = {r.doc_id for r in token_budget_sample(df, "source", {"a": 140}, "doc_id", "tok").collect()}
    assert len(small) == 10 and len(big) == 20
    # growing a budget only ADDS documents (md5 order is a fixed permutation)
    assert small < big


def test_token_budget_rate_sample_caps_drops_and_scales(spark):
    from opentelemetry_collector_spark.operators.sample import token_budget_rate_sample

    rows = [(i, "a", 10) for i in range(40)] + [(100 + i, "b", 10) for i in range(5)]
    rows += [(300, "z", 99)]
    df = _docs(spark, rows)
    out = token_budget_rate_sample(
        df, "source", {"a": 200, "b": 10_000}, "doc_id", "tok"
    ).collect()
    by = {}
    for r in out:
        by.setdefault(r.source, set()).add(r.doc_id)
    # rate cap: over-provisioned stratum keeps ALL docs (rate clamped to 1)
    assert by["b"] == {100 + i for i in range(5)}
    assert "z" not in by  # no budget -> dropped, never rate-1 leaked
    # a's keep-rate is 0.5 in expectation; exact count is hash-determined
    n_a = len(by["a"])
    assert 0 < n_a < 40
    again = token_budget_rate_sample(df, "source", {"a": 200, "b": 10_000}, "doc_id", "tok")
    assert {r.doc_id for r in again.collect() if r.source == "a"} == by["a"]


def test_token_budget_rate_plan_is_broadcast_no_corpus_sort(spark):
    from opentelemetry_collector_spark.operators.sample import token_budget_rate_sample

    df = _docs(spark, [(i, f"s{i % 3}", 10) for i in range(60)])
    out = token_budget_rate_sample(df, "source", {"s0": 100, "s1": 100}, "doc_id", "tok")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "Window" not in plan and "SortMergeJoin" not in plan


def test_chunk_documents_boundaries_and_overlap(spark):
    from opentelemetry_collector_spark.operators.packing import chunk_documents

    docs = spark.createDataFrame(
        [
            (1, "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10"),
            (2, "a b"),
            (3, ""),
            (4, None),
            (5, "u1 u2 u3 u4 u5 u6 u7 u8 u9 u10 u11"),
        ],
        "doc_id long, text string",
    )
    out = chunk_documents(docs, window=4, overlap=1)
    got = {(r.doc_id, r.chunk_idx): (r.chunk_text, r.n_tokens) for r in out.collect()}
    # starts advance by window-overlap=3, stopping at the first chunk that
    # reaches the document end: 1,4,7 for a 10-token doc (a start at 10
    # would re-emit only t10, which chunk 2 already carries)
    assert got[(1, 0)] == ("t1 t2 t3 t4", 4)
    assert got[(1, 1)] == ("t4 t5 t6 t7", 4)
    assert got[(1, 2)] == ("t7 t8 t9 t10", 4)
    assert (1, 3) not in got  # fully-contained tail is NOT duplicated
    assert got[(2, 0)] == ("a b", 2)  # sub-window doc -> one chunk
    # an 11-token doc DOES need the 4th chunk: it carries the new token u11
    assert got[(5, 3)] == ("u10 u11", 2)
    # empty / null docs yield no chunks
    assert all(k[0] not in (3, 4) for k in got)


def test_chunk_documents_rejects_bad_overlap(spark):
    import pytest

    from opentelemetry_collector_spark.operators.packing import chunk_documents

    docs = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError):
        chunk_documents(docs, window=4, overlap=4)
    with pytest.raises(ValueError):
        chunk_documents(docs, window=4, overlap=-1)


def test_chunk_documents_plan_is_single_generate_no_shuffle(spark):
    from opentelemetry_collector_spark.operators.packing import chunk_documents

    docs = spark.createDataFrame([(1, "a b c d e")], "doc_id long, text string")
    plan = chunk_documents(docs, 3, 1)._jdf.queryExecution().executedPlan().toString()
    assert "Generate" in plan
    assert "Exchange" not in plan and "Python" not in plan


def test_token_budget_rate_keeps_zero_token_stratum_whole(spark):
    from opentelemetry_collector_spark.operators.sample import token_budget_rate_sample

    df = spark.createDataFrame(
        [(1, "a", 0), (2, "a", 0), (3, "b", 10)],
        "doc_id long, source string, tok long",
    )
    # an all-empty budgeted stratum must survive whole (rate 1), matching
    # the exact variant's hard cap — and must not divide by zero
    out = token_budget_rate_sample(df, "source", {"a": 100, "b": 100}, "doc_id", "tok")
    kept = {r.doc_id for r in out.collect()}
    assert {1, 2} <= kept


def test_pack_sequences_null_token_count_packs_at_zero_cost(spark):
    from opentelemetry_collector_spark.operators.packing import pack_sequences

    df = spark.createDataFrame(
        [("c1", 0, 5), ("c1", 1, None), ("c1", 2, 5)],
        "conv_id string, turn_idx int, tok int",
    )
    out = {r.turn_idx: r.chunk_id for r in pack_sequences(df, budget=10, token_col="tok").collect()}
    # the NULL row costs 0: all three turns fit the 10-token budget
    assert out == {0: 0, 1: 0, 2: 0}


def test_probabilistic_sample_null_id_drops_row_not_job(spark):
    from opentelemetry_collector_spark.operators.sample import probabilistic_sample

    df = spark.createDataFrame(
        [("a",), (None,), ("b",), ("c",)], "conv_id string"
    )
    kept = probabilistic_sample(df, 100.0).collect()
    # 100% sampling keeps every IDENTIFIED row; the NULL id has no hash
    # decision and is dropped per-row (not a job kill)
    assert sorted(r.conv_id for r in kept) == ["a", "b", "c"]


def test_token_budget_sample_null_tokens_deterministic_zero_cost(spark):
    from opentelemetry_collector_spark.operators.sample import token_budget_sample

    df = spark.createDataFrame(
        [(1, "s", None), (2, "s", 6), (3, "s", None), (4, "s", 6)],
        "doc_id long, source string, tok int",
    )
    out = token_budget_sample(df, "source", {"s": 10}, "doc_id", "tok")
    kept = {r.doc_id for r in out.collect()}
    # NULL tokens cost 0 and no longer poison the running sum (pre-fix, a
    # leading NULL nulled every later row's cumsum). md5 order here is
    # 1(null,cum 0), 4(cum 6), 2(cum 12: over), 3(null but budget already
    # crossed): the hard-cap rule applies uniformly, so the keep-set is
    # deterministic — not hash-position-dependent NULL propagation
    assert kept == {1, 4}
    # determinism: identical keep-set on re-evaluation
    assert {r.doc_id for r in out.collect()} == kept


# ---------------------------------------------------------------------------
# training-order shuffle + sharding (sample.shuffle_shards)
# ---------------------------------------------------------------------------


def test_shuffle_shards_deterministic_and_in_range(spark):
    import hashlib

    from opentelemetry_collector_spark.operators.sample import shuffle_shards

    df = spark.range(500).withColumnRenamed("id", "doc_id")
    out = {r["doc_id"]: r for r in shuffle_shards(df, "doc_id", 8).collect()}
    assert len(out) == 500
    for i in (0, 123, 499):
        md5 = hashlib.md5(str(i).encode()).hexdigest()
        assert out[i]["order_key"] == md5
        assert out[i]["shard"] == (int(md5[:13], 16) * 8) >> 52
    shards = {r["shard"] for r in out.values()}
    assert shards <= set(range(8))
    # 52-bit-uniform prefix: each of 8 shards gets SOMETHING at n=500
    assert len(shards) == 8


def test_shuffle_shards_null_id_and_bad_n(spark):
    import pytest as _pytest

    from opentelemetry_collector_spark.operators.sample import shuffle_shards

    df = spark.createDataFrame([(1,), (None,)], "doc_id bigint")
    got = {r["doc_id"]: r for r in shuffle_shards(df, "doc_id", 4).collect()}
    assert got[None]["shard"] is None  # junk stays visible, never shard 0
    assert got[1]["shard"] is not None
    for bad in (0, 4096):
        with _pytest.raises(ValueError):
            shuffle_shards(df, "doc_id", bad)


def test_shuffle_shards_assignment_is_pure_projection(spark):
    from opentelemetry_collector_spark.operators.sample import shuffle_shards

    df = spark.range(100).withColumnRenamed("id", "doc_id")
    plan = shuffle_shards(df, "doc_id", 16)._jdf.queryExecution().executedPlan().toString()
    # zero shuffle, zero sort, zero Python: assignment rides the scan
    assert "Exchange" not in plan and "Sort" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_shard_manifest_counts_and_ranges(spark):
    from pyspark.sql import functions as F

    from opentelemetry_collector_spark.operators.sample import shard_manifest, shuffle_shards

    df = spark.range(1000).withColumnRenamed("id", "doc_id")
    a = shuffle_shards(df, "doc_id", 4).withColumn("w", F.lit(2))
    m = shard_manifest(a, "w").collect()
    assert sum(r["n_rows"] for r in m) == 1000
    assert all(r["sum_w"] == 2 * r["n_rows"] for r in m)
    assert all(r["first_key"] <= r["last_key"] for r in m)
    # key ranges of distinct shards never interleave (shard = key prefix)
    spans = sorted((r["shard"], r["first_key"], r["last_key"]) for r in m)
    for (_, _, prev_last), (_, nxt_first, _) in zip(spans, spans[1:]):
        assert prev_last < nxt_first


def test_epoch_expand_copies_and_fractions(spark):
    import hashlib

    from opentelemetry_collector_spark.operators.sample import epoch_expand

    df = spark.createDataFrame(
        [(i, "web" if i < 100 else "drop") for i in range(120)],
        "doc_id bigint, stratum string",
    )
    out = epoch_expand(df, "stratum", {"web": 2.5, "drop": 0.0}, "doc_id").collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r["epoch"])
    # dropped stratum emits nothing
    assert all(d < 100 for d in by_doc)
    for d, epochs in by_doc.items():
        frac = int(hashlib.md5(str(d).encode()).hexdigest()[:13], 16) / float(16**13)
        want = 2 + (1 if frac < 0.5 else 0)
        assert sorted(epochs) == list(range(1, want + 1)), d
    # every undropped doc appears (factor >= 1)
    assert len(by_doc) == 100
    # ~half get the extra copy; exact set decided by the hash
    extra = sum(1 for e in by_doc.values() if len(e) == 3)
    assert 0 < extra < 100


def test_epoch_expand_default_factor_and_validation(spark):
    import pytest as _pytest

    from opentelemetry_collector_spark.operators.sample import epoch_expand

    df = spark.createDataFrame([(1, "x")], "doc_id bigint, stratum string")
    out = epoch_expand(df, "stratum", {}, "doc_id").collect()
    assert [r["epoch"] for r in out] == [1]  # default factor 1.0
    with _pytest.raises(ValueError):
        epoch_expand(df, "stratum", {"x": -1.0}, "doc_id")


def test_epoch_expand_is_projection_only(spark):
    from opentelemetry_collector_spark.operators.sample import epoch_expand

    df = spark.range(100).withColumnRenamed("id", "doc_id").withColumn(
        "stratum", (F.col("doc_id") % 3).cast("string")
    )
    plan = epoch_expand(df, "stratum", {"1": 2.5}, "doc_id")._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Generate" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_epoch_expand_null_id_keeps_floor_copies(spark):
    """A NULL id has no hash fraction: no extra copy, but the floor copies
    still emit (the oracle's CASE WHEN NULL<x -> 0 shape; junk stays
    visible like shuffle_shards)."""
    from opentelemetry_collector_spark.operators.sample import epoch_expand

    df = spark.createDataFrame([(None, "web"), (1, "web")], "doc_id bigint, stratum string")
    out = epoch_expand(df, "stratum", {"web": 2.5}, "doc_id").collect()
    null_epochs = sorted(r["epoch"] for r in out if r["doc_id"] is None)
    assert null_epochs == [1, 2]  # floor(2.5) copies, no fractional extra


def _unimax_brute(caps: dict, budget: int) -> dict:
    """Reference water-filling: largest integer level t with
    sum(min(cap, t)) <= budget."""
    lo, hi = 0, max(caps.values() or [0]) + budget
    while lo < hi:
        mid = (lo + hi + 1) // 2
        if sum(min(c, mid) for c in caps.values()) <= budget:
            lo = mid
        else:
            hi = mid - 1
    return {k: min(c, lo) for k, c in caps.items()}


def test_unimax_allocation_matches_brute_force(spark):
    from opentelemetry_collector_spark.operators.sample import unimax_allocation

    rows = []
    sizes = {"en": 50, "de": 12, "fr": 12, "sw": 3, "yo": 1}
    for lang, n in sizes.items():
        rows += [(f"{lang}{i}", lang) for i in range(n)]
    df = spark.createDataFrame(rows, "doc_id string, lang string")

    for budget in (0, 1, 4, 17, 30, 78, 200):
        got = {
            r["stratum"]: r["alloc"]
            for r in unimax_allocation(df, "lang", budget).collect()
        }
        want = _unimax_brute(sizes, budget)
        assert got == want, f"budget={budget}: {got} != {want}"
        assert sum(got.values()) <= budget or budget >= sum(sizes.values())


def test_unimax_cap_epochs_allows_upsampling(spark):
    from opentelemetry_collector_spark.operators.sample import unimax_allocation

    df = spark.createDataFrame(
        [("a", "big")] * 40 + [("b", "tiny")] * 2, "doc_id string, lang string"
    )
    # without epochs cap the tiny language is starved at its 2 docs
    got1 = {r["stratum"]: r["alloc"] for r in unimax_allocation(df, "lang", 20).collect()}
    assert got1 == {"big": 18, "tiny": 2}
    # with 4 epochs it may repeat up to 8 times
    got4 = {
        r["stratum"]: r["alloc"]
        for r in unimax_allocation(df, "lang", 20, cap_epochs=4).collect()
    }
    assert got4 == {"big": 12, "tiny": 8}

    import pytest

    with pytest.raises(ValueError, match="budget"):
        unimax_allocation(df, "lang", -1)
    with pytest.raises(ValueError, match="cap_epochs"):
        unimax_allocation(df, "lang", 10, cap_epochs=0)


def test_turn_context_windows_goldens(spark):
    from opentelemetry_collector_spark.operators.packing import turn_context_windows

    rows = [
        ("c1", 0, "a"), ("c1", 1, "b"), ("c1", 2, "c"), ("c1", 3, "d"),
        ("c2", 0, "x"), ("c2", 1, "y"),          # too short for k=3
        ("c3", 0, "p"), ("c3", 1, None), ("c3", 2, "q"), ("c3", 3, "r"), ("c3", 4, "s"),
    ]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, text string")
    got = {
        (r["conv_id"], r["end_idx"]): r["context"]
        for r in turn_context_windows(df, k=3).collect()
    }
    # c1: full windows end at 2 and 3; c2 none; c3: windows touching the
    # NULL turn (ends 1,2,3) drop — only end 4 survives
    assert got == {
        ("c1", 2): "a\nb\nc",
        ("c1", 3): "b\nc\nd",
        ("c3", 4): "q\nr\ns",
    }

    import pytest

    with pytest.raises(ValueError, match="k must"):
        turn_context_windows(df, k=0)

    plan = (
        turn_context_windows(df, k=3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1


def _priority(doc_id: str, w: int) -> float:
    import hashlib

    u = int(hashlib.md5(doc_id.encode()).hexdigest()[:13], 16) / float(16**13)
    return w / max(u, 2.0**-52)


def test_weighted_sample_matches_python_priority_replay(spark):
    from opentelemetry_collector_spark.operators.sample import weighted_sample

    rows = [(f"d{i}", "s1" if i % 2 else "s2", (i % 7) + 1) for i in range(60)]
    rows += [("junk1", "s1", 0), ("junk2", "s2", None), ("junk3", "s1", -5)]
    df = spark.createDataFrame(rows, "doc_id string, stratum string, w int")

    # global top-k
    got = {r["doc_id"] for r in weighted_sample(df, "doc_id", "w", 10).collect()}
    pop = [(d, w) for d, s, w in rows if w and w > 0]
    want = {
        d for d, _ in sorted(pop, key=lambda x: (-_priority(x[0], x[1]), x[0]))[:10]
    }
    assert got == want

    # stratified top-k per group
    gots = {
        (r["stratum"], r["doc_id"])
        for r in weighted_sample(df, "doc_id", "w", 5, stratum_col="stratum").collect()
    }
    wants = set()
    for s in ("s1", "s2"):
        grp = [(d, w) for d, st, w in rows if st == s and w and w > 0]
        wants |= {
            (s, d)
            for d, _ in sorted(grp, key=lambda x: (-_priority(x[0], x[1]), x[0]))[:5]
        }
    assert gots == wants

    import pytest

    with pytest.raises(ValueError, match="k must"):
        weighted_sample(df, "doc_id", "w", 0)


def test_weighted_sample_plans(spark):
    from opentelemetry_collector_spark.operators.sample import weighted_sample

    df = spark.createDataFrame(
        [("a", "s", 1), ("b", "s", 2)], "doc_id string, stratum string, w int"
    )
    glob = weighted_sample(df, "doc_id", "w", 5)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in glob  # never a global Sort
    strat = (
        weighted_sample(df, "doc_id", "w", 5, stratum_col="stratum")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "WindowGroupLimit" in strat  # rank-limit pushdown per stratum
