"""Property-based tests (hypothesis) for the value-preserving surfaces.

Batched: each example generates a whole table and makes ONE Spark round
trip, keeping runtimes sane while still exploring the input space
(unicode, regex metacharacters, empty strings, extreme timestamps).
"""

from __future__ import annotations

import hashlib

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

SETTINGS = dict(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

# printable-ish text incl. unicode + regex metachars, no surrogates/control
text_st = st.text(
    alphabet=st.characters(blacklist_categories=("Cs", "Cc")),
    max_size=80,
)


@given(
    rows=st.lists(
        st.tuples(
            st.integers(0, 99),  # turn_idx
            st.sampled_from(["user", "assistant", "tool", "system"]),
            text_st,
            st.one_of(st.none(), st.sampled_from(["search", "python", "calc"])),
            st.datetimes(
                min_value=__import__("datetime").datetime(1971, 1, 1),
                max_value=__import__("datetime").datetime(2200, 1, 1),
            ),
        ),
        min_size=1,
        max_size=20,
        unique_by=lambda r: r[0],
    )
)
@settings(**SETTINGS)
def test_json_codec_roundtrip_property(spark, rows):
    from opentelemetry_collector_spark.sources.codecs import parse_turn_json, to_turn_json

    data = [("c", t, role, txt, tool, ts.replace(microsecond=ts.microsecond)) for t, role, txt, tool, ts in rows]
    df = spark.createDataFrame(
        data, "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
    )
    back = parse_turn_json(to_turn_json(df))
    want = {tuple(r) for r in df.collect()}
    got = {tuple(r) for r in back.collect()}
    assert got == want


@given(values=st.lists(text_st, min_size=1, max_size=20))
@settings(**SETTINGS)
def test_sha1_string_matches_hashlib_property(spark, values):
    from opentelemetry_collector_spark.functions.hashing import sha1_typed

    df = spark.createDataFrame([(v,) for v in values], "s string")
    got = [r.h for r in df.select(sha1_typed(F.col("s"), "string").alias("h")).collect()]
    want = [hashlib.sha1(v.encode("utf-8")).hexdigest() for v in values]
    assert sorted(got) == sorted(want)


@given(
    ints=st.lists(st.integers(-(2**63), 2**63 - 1), min_size=1, max_size=20),
)
@settings(**SETTINGS)
def test_sha1_int64_le_layout_property(spark, ints):
    import struct

    from opentelemetry_collector_spark.functions.hashing import sha1_typed

    df = spark.createDataFrame([(v,) for v in ints], "i long")
    got = sorted(r.h for r in df.select(sha1_typed(F.col("i"), "int").alias("h")).collect())
    want = sorted(hashlib.sha1(struct.pack("<q", v)).hexdigest() for v in ints)
    assert got == want


@given(
    keys=st.lists(st.text(alphabet="abcdefgh", min_size=1, max_size=4), min_size=1, max_size=5, unique=True),
    value=text_st,
)
@settings(**SETTINGS)
def test_attribute_insert_idempotent_property(spark, keys, value):
    """insert is only-if-absent: applying the same ordered action list twice
    equals once (attraction.go:225-229)."""
    from opentelemetry_collector_spark.operators.attributes import Action, apply_actions

    df = spark.createDataFrame([({},)], "attrs map<string,string>")
    actions = [Action(k, "insert", value=value or "x") for k in keys]
    once = apply_actions(df, actions).collect()[0].attrs
    twice = apply_actions(apply_actions(df, actions), actions).collect()[0].attrs
    assert dict(once) == dict(twice)


@given(texts=st.lists(text_st, min_size=1, max_size=25))
@settings(**SETTINGS)
def test_hashed_shingle_path_matches_catalyst_semantics(spark, texts):
    """functions/shingle_hash (numpy rolling hash) must agree with the
    Catalyst string-shingle reference path on hash-agnostic observables:
    per-doc distinct-shingle count and pairwise exact Jaccard — across
    unicode, whitespace runs, empties, and short (<k) docs."""
    from opentelemetry_collector_spark.functions.shingle_hash import shingle_hash_table
    from opentelemetry_collector_spark.operators.dedup import (
        jaccard,
        normalize_text,
        shingles_of_normalized,
    )

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id int, text string"
    )
    cat = (
        df.withColumn("_norm", normalize_text(F.col("text")))
        .select(F.col("doc_id").alias("_id"), shingles_of_normalized(F.col("_norm"), 5).alias("_sh"))
    )
    fast = shingle_hash_table(df, "doc_id", "text", k=5, with_sig=False)

    n_cat = {r._id: r.n for r in cat.select("_id", F.size("_sh").alias("n")).collect()}
    n_fast = {r._id: r.n for r in fast.select("_id", F.size("_sh").alias("n")).collect()}
    assert n_fast == n_cat

    a_c, b_c = cat.alias("a"), cat.alias("b")
    j_cat = {
        (r.a, r.b): r.j
        for r in a_c.join(b_c, F.col("a._id") < F.col("b._id"))
        .select(
            F.col("a._id").alias("a"),
            F.col("b._id").alias("b"),
            F.floor(jaccard(F.col("a._sh"), F.col("b._sh")) * 1000).alias("j"),
        )
        .collect()
    }
    a_f, b_f = fast.alias("a"), fast.alias("b")
    j_fast = {
        (r.a, r.b): r.j
        for r in a_f.join(b_f, F.col("a._id") < F.col("b._id"))
        .select(
            F.col("a._id").alias("a"),
            F.col("b._id").alias("b"),
            F.floor(jaccard(F.col("a._sh"), F.col("b._sh")) * 1000).alias("j"),
        )
        .collect()
    }
    assert j_fast == j_cat


@given(
    toks=st.lists(st.integers(0, 50), min_size=0, max_size=60),
    window=st.integers(2, 12),
    overlap_frac=st.integers(0, 100),
)
@settings(**SETTINGS)
def test_chunk_documents_reconstructs_original_property(spark, toks, window, overlap_frac):
    """Dropping each later chunk's first `overlap` tokens and concatenating
    must reproduce the document's token stream exactly."""
    from opentelemetry_collector_spark.operators.packing import chunk_documents

    overlap = (window - 1) * overlap_frac // 100
    words = [f"w{t}" for t in toks]
    df = spark.createDataFrame([(1, " ".join(words))], "doc_id long, text string")
    chunks = sorted(
        (r.chunk_idx, r.chunk_text, r.n_tokens)
        for r in chunk_documents(df, window, overlap).collect()
    )
    rebuilt: list[str] = []
    for idx, text, n in chunks:
        part = text.split(" ") if text else []
        assert len(part) == n <= window
        rebuilt += part if idx == 0 else part[overlap:]
    assert rebuilt == words


@given(
    rows=st.lists(
        st.tuples(st.sampled_from(["a", "b", "c"]), st.integers(0, 30)),
        min_size=1,
        max_size=30,
    ),
    budget=st.integers(0, 200),
)
@settings(**SETTINGS)
def test_token_budget_sample_is_maximal_prefix_property(spark, rows, budget):
    """Per stratum: kept tokens never exceed the budget, and the keep-set is
    the MAXIMAL md5-ordered prefix (the first dropped doc would overflow)."""
    from opentelemetry_collector_spark.operators.sample import token_budget_sample

    data = [(i, src, tok) for i, (src, tok) in enumerate(rows)]
    df = spark.createDataFrame(data, "doc_id long, source string, tok long")
    budgets = {"a": budget, "b": budget}
    kept = {r.doc_id for r in token_budget_sample(df, "source", budgets, "doc_id", "tok").collect()}
    for src in ("a", "b", "c"):
        order = sorted(
            (r for r in data if r[1] == src),
            key=lambda r: hashlib.md5(str(r[0]).encode()).hexdigest(),
        )
        cum, expect = 0, set()
        for doc_id, _, tok in order:
            cum += tok
            if src not in budgets or cum > budgets[src]:
                break
            expect.add(doc_id)
        assert {d for d in kept if data[d][1] == src} == expect


@given(texts=st.lists(text_st, min_size=1, max_size=15))
@settings(**SETTINGS)
def test_importance_mass_invariants_property(spark, texts):
    """raw_mass >= n_grams (every gram occurs at least once in the raw
    corpus — itself), tgt_mass <= raw_mass * |target dups| bound via
    score <= 1e6 * max target count, and empty docs report zeros."""
    from opentelemetry_collector_spark.operators.contamination import importance_mass

    raw = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    tgt = spark.createDataFrame([(100, texts[0])], "doc_id long, text string")
    out = importance_mass(raw, tgt, "doc_id", n=2).collect()
    assert {r.doc_id for r in out} == set(range(len(texts)))
    for r in out:
        assert r.raw_mass >= r.n_grams
        assert r.tgt_mass >= 0
        if r.n_grams == 0:
            assert (r.tgt_mass, r.raw_mass, r.score_ppm) == (0, 0, 0)
        if r.raw_mass > 0:
            assert r.score_ppm == r.tgt_mass * 1_000_000 // r.raw_mass


@given(texts=st.lists(text_st, min_size=1, max_size=12))
@settings(**SETTINGS)
def test_unicode_normalize_idempotent_and_matches_python_property(spark, texts):
    """NFC is idempotent, and the Arrow path must agree with Python's own
    unicodedata on arbitrary unicode (the DuckDB oracle pins a third
    implementation at the query level)."""
    import unicodedata

    from opentelemetry_collector_spark.operators.text import unicode_normalize

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string"
    )
    out = df.select(
        "doc_id",
        unicode_normalize(F.col("text")).alias("n1"),
        unicode_normalize(unicode_normalize(F.col("text"))).alias("n2"),
    )
    for r in out.collect():
        want = unicodedata.normalize("NFC", texts[r["doc_id"]])
        assert r["n1"] == want
        assert r["n2"] == r["n1"]  # idempotence


@given(
    texts=st.lists(
        st.text(alphabet=st.sampled_from("ab "), max_size=60), min_size=1, max_size=10
    ),
    weights=st.dictionaries(
        st.sampled_from(["a", "b", "ab", "ba", "aab"]),
        st.integers(-1000, 1000),
        max_size=5,
    ),
    bias=st.integers(-100, 100),
)
@settings(**SETTINGS)
def test_linear_score_matches_pure_python_property(spark, texts, weights, bias):
    from opentelemetry_collector_spark.operators.classify import linear_score

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string"
    )
    wdf = spark.createDataFrame(
        list(weights.items()) or [("_none_", 0)], "term string, weight_pm bigint"
    )
    out = {r["doc_id"]: r for r in linear_score(df, wdf, "doc_id", bias_pm=bias).collect()}
    for i, t in enumerate(texts):
        toks = t.strip().split() if t.strip() else []
        want = bias + sum(weights.get(tok, 0) for tok in toks)
        assert out[i]["score_pm"] == want, (t, toks)
        assert out[i]["n_tokens"] == len(toks)
        assert out[i]["keep"] == (want >= 0)


@given(
    texts=st.lists(
        st.text(alphabet=st.sampled_from("xyz"), min_size=0, max_size=30),
        min_size=1,
        max_size=8,
    ),
    min_len=st.integers(3, 6),
)
@settings(**SETTINGS)
def test_substring_removal_invariants_property(spark, texts, min_len):
    """Removal bookkeeping must be self-consistent and bounded by the
    marking pass: len(cleaned) == n_chars - removed_chars, and a document
    never loses more than duplicated_spans says it contains."""
    from opentelemetry_collector_spark.operators.substring import (
        duplicated_spans,
        remove_duplicated_spans,
    )

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string"
    )
    cut = {r["doc_id"]: r for r in remove_duplicated_spans(df, "doc_id", min_len=min_len).collect()}
    marked = {r["doc_id"]: r for r in duplicated_spans(df, "doc_id", min_len=min_len).collect()}
    total_marked = sum(r["dup_chars"] for r in marked.values())
    total_removed = sum(r["removed_chars"] for r in cut.values())
    assert total_removed <= total_marked  # first occurrences survive
    for i, t in enumerate(texts):
        r = cut[i]
        assert len(r["cleaned"]) == r["n_chars"] - r["removed_chars"]
        assert r["removed_chars"] <= marked[i]["dup_chars"]
        if marked[i]["dup_chars"] == 0:
            assert r["cleaned"] == t


_series_st = st.lists(
    st.tuples(
        st.integers(0, 500_000),          # seconds offset
        st.floats(0.0, 500.0, allow_nan=False, allow_infinity=False),
    ),
    min_size=1,
    max_size=25,
)


def _series_df(spark, pts, series="s"):
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    rows = [(series, base + dt.timedelta(seconds=s), round(v, 2)) for s, v in pts]
    return spark.createDataFrame(rows, "series string, ts timestamp, value double")


@given(pts=_series_st, step=st.sampled_from([60, 3600, 21600]))
@settings(**SETTINGS)
def test_ohlc_invariants_property(spark, pts, step):
    """low <= open/close <= high; n_obs and sum match a python replay;
    buckets are exactly the observed set."""
    import math

    from opentelemetry_collector_spark.operators.timeseries import ohlc_downsample

    out = {r["bucket"]: r for r in ohlc_downsample(
        _series_df(spark, pts), ["series"], step_seconds=step
    ).collect()}
    base_us = 1704067200000000  # 2024-01-01 UTC in micros
    by_bucket = {}
    for s, v in pts:
        vc = math.floor(round(v, 2) * 100)
        by_bucket.setdefault((base_us + s * 1_000_000) // (step * 1_000_000), []).append(vc)
    assert set(out) == set(by_bucket)
    for b, vals in by_bucket.items():
        r = out[b]
        assert r["low_cents"] == min(vals) and r["high_cents"] == max(vals)
        assert r["low_cents"] <= r["open_cents"] <= r["high_cents"]
        assert r["low_cents"] <= r["close_cents"] <= r["high_cents"]
        assert (r["n_obs"], r["sum_cents"]) == (len(vals), sum(vals))


@given(pts=_series_st, step=st.sampled_from([3600, 21600]))
@settings(**SETTINGS)
def test_gapfill_locf_property(spark, pts, step):
    """Grid is the contiguous [first, last] bucket range; every value is
    the last observed per-bucket value at or before that bucket; filled
    flags exactly the empty buckets."""
    import math

    from opentelemetry_collector_spark.operators.timeseries import gapfill_locf

    rows = sorted(
        (r["bucket"], r["value_cents"], r["filled"], r["n_obs"])
        for r in gapfill_locf(_series_df(spark, pts), ["series"], step_seconds=step).collect()
    )
    base_us = 1704067200000000
    per_bucket = {}
    for s, v in pts:
        us = base_us + s * 1_000_000
        vc = math.floor(round(v, 2) * 100)
        b = us // (step * 1_000_000)
        per_bucket.setdefault(b, []).append((us, vc))
    # per-bucket representative: last observation, value tiebreak max
    rep = {b: max(obs)[1] for b, obs in per_bucket.items()}
    lo, hi = min(per_bucket), max(per_bucket)
    assert [b for b, *_ in rows] == list(range(lo, hi + 1))
    carried = None
    for b, vc, filled, n_obs in rows:
        if b in per_bucket:
            carried = rep[b]
            assert (filled, n_obs) == (0, len(per_bucket[b]))
        else:
            assert (filled, n_obs) == (1, 0)
        assert vc == carried


@given(
    pts=_series_st,
    alpha=st.sampled_from([0.5, 0.25, 0.125, 0.3, 0.7]),
)
@settings(**SETTINGS)
def test_ewma_property_matches_python(spark, pts, alpha):
    """EWMA equals the plain double recurrence over the (ts, value)-sorted
    series for dyadic AND non-dyadic alphas."""
    import math

    from opentelemetry_collector_spark.operators.timeseries import ewma

    out = sorted(
        ((r["ts_us"], r["value_cents"]), r["ewma_centi"])
        for r in ewma(_series_df(spark, pts), ["series"], alpha=alpha).collect()
    )
    base_us = 1704067200000000
    seq = sorted(
        (base_us + s * 1_000_000, math.floor(round(v, 2) * 100)) for s, v in pts
    )
    acc = None
    expect = []
    for _, vc in seq:
        acc = float(vc) if acc is None else (1.0 - alpha) * acc + alpha * float(vc)
        expect.append(math.floor(acc * 10_000.0))
    assert [e for _, e in out] == expect


@given(
    pts=st.lists(
        st.tuples(st.integers(0, 100_000), st.integers(0, 10_000)),
        min_size=1,
        max_size=25,
        unique_by=lambda p: p[0],
    ),
    window=st.sampled_from([3600, 21600]),
)
@settings(**SETTINGS)
def test_counter_rate_property_matches_python(spark, pts, window):
    """Bucketed increases equal a python replay of the reset-restart rule,
    and total increase is order-independent of bucketing."""
    import datetime as dt

    from opentelemetry_collector_spark.operators.aggregate import counter_rate

    base = dt.datetime(2024, 1, 1)
    rows = [
        ("s", i, base + dt.timedelta(seconds=s), v) for i, (s, v) in enumerate(pts)
    ]
    df = spark.createDataFrame(rows, "series string, id int, ts timestamp, v long")
    got = {
        r["bucket"]: (r["increase"], r["n_deltas"])
        for r in counter_rate(
            df, ["series"], value_col="v", window_seconds=window, tiebreak=["v", "id"]
        ).collect()
    }
    base_us = 1704067200000000
    seq = sorted((base_us + s * 1_000_000, v, i) for i, (s, v) in enumerate(pts))
    expect: dict[int, list[int]] = {}
    prev = None
    for us, v, _ in seq:
        b = us // (window * 1_000_000)
        expect.setdefault(b, [])
        if prev is not None:
            expect[b].append(v if v < prev else v - prev)
        prev = v
    assert set(got) == set(expect)
    for b, incs in expect.items():
        want = (sum(incs) if incs else None, len(incs))
        assert got[b] == want


@given(
    spans=st.lists(
        st.tuples(
            st.sampled_from(["t1", "t2", "t3"]),
            st.integers(0, 10_000),       # start offset s
            st.integers(1, 5_000_000),    # duration us
            st.sampled_from([0, 0, 0, 2]),
        ),
        min_size=1,
        max_size=20,
    ),
    latency_ms=st.sampled_from([None, 1_000, 3_000]),
    rate_pm=st.sampled_from([0, 250, 1000]),
)
@settings(**SETTINGS)
def test_tail_sampling_property_matches_python(spark, spans, latency_ms, rate_pm):
    """Decisions equal a pure-python replay of the policy order, including
    the md5-prefix probabilistic rule."""
    import datetime as dt

    from opentelemetry_collector_spark.operators.sample import tail_sample_decisions

    base = dt.datetime(2024, 1, 1)
    rows = [
        (t, f"s{i}", sc, base + dt.timedelta(seconds=s), dur)
        for i, (t, s, dur, sc) in enumerate(spans)
    ]
    df = spark.createDataFrame(
        rows, "trace_id string, span_id string, status_code int, ts timestamp, duration_us long"
    )
    got = {
        r["trace_id"]: (r["n_spans"], r["trace_duration_us"], r["reason"], r["keep"])
        for r in tail_sample_decisions(df, latency_ms=latency_ms, rate_pm=rate_pm).collect()
    }
    base_us = 1704067200000000
    per = {}
    for t, s, dur, sc in spans:
        e = per.setdefault(t, {"n": 0, "err": False, "lo": None, "hi": None})
        start = base_us + s * 1_000_000
        e["n"] += 1
        e["err"] |= sc == 2
        e["lo"] = start if e["lo"] is None else min(e["lo"], start)
        e["hi"] = start + dur if e["hi"] is None else max(e["hi"], start + dur)
    expect = {}
    for t, e in per.items():
        trace_us = e["hi"] - e["lo"]
        reason = None
        if e["err"]:
            reason = "status_code"
        elif latency_ms is not None and trace_us >= latency_ms * 1000:
            reason = "latency"
        elif int(hashlib.md5(t.encode()).hexdigest()[:13], 16) * 1000 < rate_pm * 16**13:
            reason = "probabilistic"
        expect[t] = (e["n"], trace_us, reason, 1 if reason else 0)
    assert got == expect


@given(
    evs=st.lists(
        st.tuples(st.sampled_from(["u", "v"]), st.integers(0, 50_000)),
        min_size=1,
        max_size=25,
    ),
    range_s=st.sampled_from([60, 3600]),
)
@settings(**SETTINGS)
def test_sliding_window_counts_property(spark, evs, range_s):
    """n_trailing equals the brute-force count of same-key events in the
    inclusive trailing range, for every event including duplicates."""
    import datetime as dt

    from opentelemetry_collector_spark.operators.hygiene import sliding_window_counts

    base = dt.datetime(2024, 1, 1)
    rows = [(k, i, base + dt.timedelta(seconds=s)) for i, (k, s) in enumerate(evs)]
    df = spark.createDataFrame(rows, "user string, id int, ts timestamp")
    got = {
        r["id"]: r["n_trailing"]
        for r in sliding_window_counts(df, ["user"], range_seconds=range_s).collect()
    }
    for i, (k, s) in enumerate(evs):
        want = sum(
            1 for k2, s2 in evs if k2 == k and s - range_s <= s2 <= s
        )
        assert got[i] == want


@given(pts=_series_st, step=st.sampled_from([3600, 21600]))
@settings(**SETTINGS)
def test_interpolate_bounded_by_neighbors_property(spark, pts, step):
    """Every interpolated bucket lies within [min, max] of its two anchor
    neighbors; observed buckets keep their own anchor; grid is contiguous."""
    import math

    from opentelemetry_collector_spark.operators.timeseries import interpolate_linear

    rows = sorted(
        (r["bucket"], r["value_cents"], r["filled"])
        for r in interpolate_linear(
            _series_df(spark, pts), ["series"], step_seconds=step
        ).collect()
    )
    base_us = 1704067200000000
    per_bucket = {}
    for s, v in pts:
        us = base_us + s * 1_000_000
        vc = math.floor(round(v, 2) * 100)
        per_bucket.setdefault(us // (step * 1_000_000), []).append((us, vc))
    rep = {b: max(obs)[1] for b, obs in per_bucket.items()}
    lo, hi = min(per_bucket), max(per_bucket)
    assert [b for b, *_ in rows] == list(range(lo, hi + 1))
    anchors = sorted(rep)
    for b, vc, filled in rows:
        if b in rep:
            assert (vc, filled) == (rep[b], 0)
        else:
            prev = max(a for a in anchors if a < b)
            nxt = min(a for a in anchors if a > b)
            assert min(rep[prev], rep[nxt]) <= vc <= max(rep[prev], rep[nxt])
            assert filled == 1


@given(
    pts=st.lists(
        st.tuples(st.integers(0, 50_000), st.integers(-2000, 2000)),  # (sec offset, cents)
        min_size=1,
        max_size=25,
    ),
    target=st.integers(-500, 500),
    slack=st.integers(0, 200),
)
@settings(**SETTINGS)
def test_cusum_property_matches_python(spark, pts, target, slack):
    """Windowed closed form == the sequential recurrence, on arbitrary
    series incl. duplicate timestamps (unique id tiebreak)."""
    import datetime as dt

    from opentelemetry_collector_spark.operators.timeseries import cusum_drift

    base = dt.datetime(2024, 1, 1)
    rows = [("s", i, base + dt.timedelta(seconds=sec), c / 100.0)
            for i, (sec, c) in enumerate(pts)]
    df = spark.createDataFrame(rows, "series string, id int, ts timestamp, value double")
    got = {r["id"]: r["cusum_cents"]
           for r in cusum_drift(df, ["series"], target_cents=target,
                                slack_cents=slack, threshold_cents=1,
                                tiebreak=["id"]).collect()}
    # replay sequentially in the SAME total order (ts, value, id), with the
    # operator's own cents conversion (floor of the DOUBLE product — e.g.
    # 19.15 * 100 == 1914.999..., so floor gives 1914, not 1915)
    import math

    cents = [math.floor((c / 100.0) * 100) for _, c in pts]
    order = sorted(range(len(pts)),
                   key=lambda i: (pts[i][0], cents[i], i))
    c = 0
    for i in order:
        c = max(0, c + cents[i] - target - slack)
        assert got[i] == c


@given(
    pts=st.lists(st.integers(-5000, 5000), min_size=1, max_size=30),
    hi=st.integers(-1000, 1000),
)
@settings(**SETTINGS)
def test_hysteresis_property_matches_python(spark, pts, hi):
    import datetime as dt

    from opentelemetry_collector_spark.operators.timeseries import threshold_hysteresis

    lo = hi - 700
    base = dt.datetime(2024, 1, 1)
    rows = [("s", i, base + dt.timedelta(seconds=i), c / 100.0)
            for i, c in enumerate(pts)]
    df = spark.createDataFrame(rows, "series string, id int, ts timestamp, value double")
    got = {r["id"]: (r["alert"], r["is_edge"])
           for r in threshold_hysteresis(df, ["series"], hi_cents=hi, lo_cents=lo,
                                         tiebreak=["id"]).collect()}
    import math

    state, prev = False, False
    for i, c in enumerate(pts):
        cc = math.floor((c / 100.0) * 100)   # the operator's cents conversion
        if cc > hi:
            state = True
        elif cc < lo:
            state = False
        assert got[i] == (state, state != prev)
        prev = state


@given(
    vals=st.lists(st.one_of(st.none(), st.integers(-10000, 10000)),
                  min_size=1, max_size=40),
    low=st.integers(0, 499),
    span=st.integers(1, 500),
    bins=st.integers(2, 12),
)
@settings(**SETTINGS)
def test_winsorize_and_bins_properties(spark, vals, low, span, bins):
    """Winsorized values stay inside observed bounds; bins are monotone in
    value with every row labelled 1..k; NULLs isolate in both ops."""
    from opentelemetry_collector_spark.operators.aggregate import (
        equi_depth_bins,
        winsorize,
    )

    high = low + span + 500 if low + span + 500 <= 1000 else 1000
    rows = [("k", i, None if c is None else c / 100.0) for i, c in enumerate(vals)]
    df = spark.createDataFrame(rows, "k string, id int, value double")

    import math

    cents = {i: None if c is None else math.floor((c / 100.0) * 100)
             for i, c in enumerate(vals)}
    wz = {r["id"]: r for r in winsorize(df, ["k"], "value", low_pm=low,
                                        high_pm=high).collect()}
    nn = sorted(c for c in cents.values() if c is not None)
    for i, c in cents.items():
        r = wz[i]
        if c is None:
            assert r["winsorized_cents"] is None
        else:
            assert r["lo_cents"] in nn and r["hi_cents"] in nn
            assert r["lo_cents"] <= r["winsorized_cents"] <= r["hi_cents"]

    if nn:
        bz = {r["id"]: r["bin"] for r in
              equi_depth_bins(df, ["k"], "value", n_bins=bins,
                              tiebreak=["id"]).collect()}
        labelled = [(cents[i], i, bz[i]) for i in cents if cents[i] is not None]
        assert all(1 <= b <= bins for _, _, b in labelled)
        # monotone in the operator's own (value_cents, id) total order
        labelled.sort()
        assert all(labelled[j][2] <= labelled[j + 1][2]
                   for j in range(len(labelled) - 1))
        assert all(bz[i] is None for i in cents if cents[i] is None)
