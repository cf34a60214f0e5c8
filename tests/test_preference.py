"""Preference-learning data prep (operators/preference.py): implicit
(chosen, rejected) pair mining, best-of-n rejection sampling, and the
pairwise win-rate ladder — hand-written goldens covering tie-break
determinism, the uninformative-prompt drops, NULL candidate policy, the
md5 sampling order, and plan assertions pinning the partial-agg no-join
shapes."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from opentelemetry_collector_spark.operators.preference import (
    best_of_n,
    preference_pairs,
    response_reward,
    win_rates,
)

# pair_turns output shape (the columns preference._candidates consumes)
PAIRS_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("prompt_idx", T.IntegerType()),
        T.StructField("prompt_text", T.StringType()),
        T.StructField("answered", T.BooleanType()),
        T.StructField("resp_idx", T.IntegerType()),
        T.StructField("resp_text", T.StringType()),
    ]
)


@pytest.fixture(scope="module")
def pairs(spark):
    rows = [
        # "p1": three candidates with distinct rewards.
        #   "alpha beta gamma" -> 3 tok, all alpha (ignoring spaces 14/16
        #   chars alpha -> 875pm) reward 3875
        #   "ok"               -> 1 tok, 1000pm          reward 2000
        #   "12345"            -> 1 tok, 0pm             reward 1000
        ("c1", 0, "p1", True, 1, "alpha beta gamma"),
        ("c2", 0, "p1", True, 1, "ok"),
        ("c3", 0, "p1", True, 1, "12345"),
        # "p2": two candidates with EQUAL rewards -> uninformative, dropped
        # by preference_pairs; best_of_n still picks the (conv_id desc) max.
        ("c1", 2, "p2", True, 3, "same"),
        ("c2", 2, "p2", True, 3, "same"),
        # "p3": single candidate -> dropped by preference_pairs.
        ("c3", 2, "p3", True, 3, "only one here"),
        # junk: unanswered, NULL response, NULL prompt -> never candidates.
        ("c4", 0, "p1", False, None, None),
        ("c4", 2, "p1", True, 3, None),
        ("c4", 4, None, True, 5, "orphan prompt"),
    ]
    return spark.createDataFrame(rows, PAIRS_SCHEMA).cache()


def test_reward_golden(spark):
    df = spark.createDataFrame(
        [("alpha beta gamma",), ("ok",), ("12345",), ("",), ("  ",)], "t: string"
    ).select(response_reward(F.col("t")).alias("r"))
    assert [r["r"] for r in df.collect()] == [3875, 2000, 1000, 0, 0]


def test_preference_pairs_golden(pairs):
    out = {r["prompt_text"]: r.asDict() for r in preference_pairs(pairs).collect()}
    assert set(out) == {"p1"}  # p2 zero-margin, p3 single-candidate: dropped
    p1 = out["p1"]
    assert p1["n_cands"] == 3
    assert (p1["chosen_conv"], p1["chosen_text"], p1["chosen_reward"]) == (
        "c1",
        "alpha beta gamma",
        3875,
    )
    assert (p1["rejected_conv"], p1["rejected_text"], p1["rejected_reward"]) == (
        "c3",
        "12345",
        1000,
    )
    assert p1["margin"] == 2875
    assert p1["chosen_resp_idx"] == 1 and p1["rejected_resp_idx"] == 1


def test_tie_breaks_are_deterministic(spark):
    # equal rewards everywhere: chosen = max (conv_id, prompt_idx),
    # rejected = min — but margin 0 means the pair is dropped; assert via
    # best_of_n (which keeps the argmax regardless of margin).
    rows = [
        ("a", 0, "p", True, 1, "same"),
        ("b", 0, "p", True, 1, "same"),
        ("b", 2, "p", True, 3, "same"),
    ]
    df = spark.createDataFrame(rows, PAIRS_SCHEMA)
    assert preference_pairs(df).count() == 0
    best = best_of_n(df, 3).collect()[0]
    assert (best["best_conv"], best["best_idx"]) == ("b", 2)


def _md5_rank(prompt: str, cands: list[tuple[str, int]]) -> list[tuple[str, int]]:
    """The operator's documented sampling order, recomputed independently."""
    return sorted(
        cands,
        key=lambda c: (
            hashlib.md5(f"{prompt}:{c[0]}:{c[1]}".encode()).hexdigest(),
            c[0],
            c[1],
        ),
    )


def test_best_of_n_md5_sampling(pairs):
    # n=2 over p1's three candidates: the sampled pool is the first two in
    # md5 order (blind to reward), the winner the best-rewarded of THOSE.
    sampled = _md5_rank("p1", [("c1", 0), ("c2", 0), ("c3", 0)])[:2]
    rewards = {("c1", 0): 3875, ("c2", 0): 2000, ("c3", 0): 1000}
    expect_best = max(sampled, key=lambda c: (rewards[c], c))
    out = {r["prompt_text"]: r.asDict() for r in best_of_n(pairs, 2).collect()}
    p1 = out["p1"]
    assert p1["n_sampled"] == 2
    assert (p1["best_conv"], p1["best_idx"]) == expect_best
    assert p1["reward_sum"] == sum(rewards[c] for c in sampled)
    # n >= pool keeps everything and the global argmax wins
    all_out = {r["prompt_text"]: r.asDict() for r in best_of_n(pairs, 10).collect()}
    assert all_out["p1"]["n_sampled"] == 3
    assert all_out["p1"]["best_conv"] == "c1"
    assert all_out["p1"]["reward_sum"] == 6875
    assert set(all_out) == {"p1", "p2", "p3"}  # zero-margin prompts still yield


def test_best_of_n_rejects_bad_n(pairs):
    with pytest.raises(ValueError):
        best_of_n(pairs, 0)


@pytest.fixture(scope="module")
def dim(spark):
    rows = [("c1", "web"), ("c2", "api"), ("c3", "web"), ("c5", "mobile")]
    return spark.createDataFrame(rows, "conv_id: string, channel: string")


def test_win_rates_golden(spark, dim):
    prefs = spark.createDataFrame(
        [
            ("c1", "c2"),  # web beats api
            ("c2", "c3"),  # api beats web
            ("c1", "c3"),  # web vs web: same competitor, dropped
            ("c1", "c9"),  # rejected side not in dim: dropped
            ("c5", "c1"),  # mobile beats web
        ],
        "chosen_conv: string, rejected_conv: string",
    )
    out = {r["competitor"]: r.asDict() for r in win_rates(prefs, dim).collect()}
    assert out["mobile"] == {
        "competitor": "mobile", "wins": 1, "losses": 0, "bouts": 1,
        "win_rate_ppm": 1000000, "rank": 1,
    }
    assert out["api"]["wins"] == 1 and out["api"]["losses"] == 1
    assert out["api"]["win_rate_ppm"] == 500000 and out["api"]["rank"] == 2
    # web: 1 win (over api), 2 losses (api, mobile) -> floor(1e6/3)
    assert out["web"]["wins"] == 1 and out["web"]["losses"] == 2
    assert out["web"]["win_rate_ppm"] == 333333 and out["web"]["rank"] == 3


def test_win_rates_all_loss_competitor_appears(spark, dim):
    prefs = spark.createDataFrame(
        [("c1", "c5"), ("c2", "c5")], "chosen_conv: string, rejected_conv: string"
    )
    out = {r["competitor"]: r.asDict() for r in win_rates(prefs, dim).collect()}
    assert out["mobile"]["wins"] == 0 and out["mobile"]["losses"] == 2
    assert out["mobile"]["win_rate_ppm"] == 0


def test_plan_preference_pairs_partial_agg_no_join(pairs):
    plan = preference_pairs(pairs)._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert plan.count("Exchange") == 1
    # map-side combine: a partial max/min aggregate runs BEFORE the exchange
    pre = plan.split("Exchange")[1]
    assert "partial_max" in pre and "partial_min" in pre


def test_plan_best_of_n_one_exchange_group_limit(pairs):
    plan = best_of_n(pairs, 2)._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert "WindowGroupLimit" in plan
    # the argmax groupBy reuses the window's hashpartitioning(prompt_text)
    assert plan.count("Exchange") == 1


def test_composes_with_pair_turns(spark):
    """End-to-end over real pair_turns output (the q202 composition)."""
    from opentelemetry_collector_spark.operators.dialogue import pair_turns

    rows = [
        ("k1", 0, "user", "what is up", None, None),
        ("k1", 1, "assistant", "много words here", None, None),
        ("k2", 0, "user", "what is up", None, None),
        ("k2", 1, "assistant", "ok", None, None),
    ]
    schema = T.StructType(
        [
            T.StructField("conv_id", T.StringType()),
            T.StructField("turn_idx", T.IntegerType()),
            T.StructField("role", T.StringType()),
            T.StructField("text", T.StringType()),
            T.StructField("tool", T.StringType()),
            T.StructField("ts", T.TimestampNTZType()),
        ]
    )
    prefs = preference_pairs(pair_turns(spark.createDataFrame(rows, schema), "user", "assistant"))
    row = prefs.collect()[0]
    assert row["chosen_conv"] == "k1" and row["rejected_conv"] == "k2"
    assert row["margin"] > 0


def test_preference_stream_parity(spark, tmp_path):
    """Streaming twin (applyInPandasWithState, update mode): after the
    stream drains, the latest snapshot per prompt filtered to margin>0
    equals batch preference_pairs over the same candidate rows — across a
    micro-batch split that puts the eventual chosen and rejected rows in
    DIFFERENT batches (state must carry and the chosen must supersede)."""
    from opentelemetry_collector_spark.streaming.stream import preference_stream

    rows = [
        ("c1", 0, "p1", True, 1, "ok"),                  # batch 1: sole candidate
        ("c2", 0, "p1", True, 1, "alpha beta gamma"),    # batch 2: supersedes as chosen
        ("c3", 0, "p1", True, 1, "12345"),               # batch 2: becomes rejected
        ("c1", 2, "p2", True, 3, "same"),
        ("c2", 2, "p2", True, 3, "same"),                # p2 stays margin 0
        ("c4", 0, "p1", False, None, None),              # junk: never a candidate
    ]
    df = spark.createDataFrame(rows, PAIRS_SCHEMA)
    landing = str(tmp_path / "landing")
    df.filter(F.col("conv_id") == "c1").coalesce(1).write.mode("append").parquet(landing)
    df.filter(F.col("conv_id") != "c1").coalesce(1).write.mode("append").parquet(landing)

    stream = preference_stream(
        spark.readStream.schema(PAIRS_SCHEMA).option("maxFilesPerTrigger", 1).parquet(landing)
    )
    q = (
        stream.writeStream.outputMode("update")
        .format("memory")
        .queryName("pref_out")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    snaps = spark.sql("select * from pref_out").collect()
    # latest snapshot per prompt = the one with the highest n_cands
    latest = {}
    for r in snaps:
        if r["prompt_text"] not in latest or r["n_cands"] > latest[r["prompt_text"]]["n_cands"]:
            latest[r["prompt_text"]] = r.asDict()
    stream_pairs = {k: v for k, v in latest.items() if v["margin"] > 0}
    batch = {r["prompt_text"]: r.asDict() for r in preference_pairs(df).collect()}
    assert set(stream_pairs) == set(batch) == {"p1"}
    for col, want in batch["p1"].items():
        assert stream_pairs["p1"][col] == want, (col, stream_pairs["p1"][col], want)
    # the superseded-chosen history is visible: p1 was emitted more than once
    assert sum(1 for r in snaps if r["prompt_text"] == "p1") >= 2
    # p2 snapshots exist but stay uninformative
    assert latest["p2"]["margin"] == 0


# ---------------------------------------------------------------------------
# property test vs a pure-Python model
# ---------------------------------------------------------------------------

import re as _re

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_HSETTINGS = dict(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

# candidate rows: (conv_id, prompt_idx, prompt, answered, resp_text) with
# unique (conv_id, prompt_idx) identity; prompts from a tiny pool so groups
# collide; texts chosen to vary tokens and alpha share (incl. ties/NULLs)
_cand_st = st.lists(
    st.tuples(
        st.sampled_from(["ca", "cb", "cc"]),
        st.integers(0, 30),
        st.one_of(st.none(), st.sampled_from(["p1", "p2"])),
        st.booleans(),
        st.one_of(
            st.none(),
            st.sampled_from(
                [
                    "", "a", "one two", "x1", "same", "  pad  ",
                    # adversarial whitespace: Python strip()/split() idioms
                    # diverge from the JVM chain on these (ADVICE r4)
                    "\nlead", "trail\n", "a b", " thin",
                ]
            ),
        ),
    ),
    min_size=1,
    max_size=25,
    unique_by=lambda r: (r[0], r[1]),
)


def _ref_reward(text):
    # JVM-exact mirror of response_reward (Spark trim strips U+0020 only;
    # Java \s is ASCII; split limit -1 keeps edge empty tokens) — NOT the
    # Python strip()/split() near-miss, which the adversarial texts in the
    # strategy above would expose.
    s = text.strip(" ")
    tok = len(_re.split(r"\s+", s, flags=_re.ASCII)) if s else 0
    n = len(text)
    alpha = len(_re.sub("[^A-Za-z]", "", text))
    return tok * 1000 + ((alpha * 1000) // n if n > 0 else 0)


def _ref_prefs(rows):
    groups = {}
    for conv, idx, prompt, answered, resp in rows:
        if prompt is None or resp is None or not answered:
            continue
        groups.setdefault(prompt, []).append((_ref_reward(resp), conv, idx, resp))
    out = {}
    for prompt, cands in groups.items():
        ch = max(cands)
        rj = min(cands)
        if ch[0] > rj[0]:
            out[prompt] = (len(cands), ch[1], ch[2], ch[0], rj[1], rj[2], rj[0])
    return out


@given(rows=_cand_st)
@settings(**_HSETTINGS)
def test_preference_pairs_matches_python_model(spark, rows):
    df = spark.createDataFrame(
        [(c, i, p, a, 1 if a else None, r) for c, i, p, a, r in rows], PAIRS_SCHEMA
    )
    got = {
        r["prompt_text"]: (
            r["n_cands"], r["chosen_conv"], r["chosen_idx"], r["chosen_reward"],
            r["rejected_conv"], r["rejected_idx"], r["rejected_reward"],
        )
        for r in preference_pairs(df).collect()
    }
    assert got == _ref_prefs(rows)


def test_pref_reward_twin_matches_jvm_on_adversarial_whitespace(spark):
    """The streaming twin's _pref_reward must equal the JVM
    response_reward chain on texts where Python's strip()/split() idioms
    diverge from Spark trim (U+0020-only) + Java ASCII \\s split with
    limit -1 (edge empty tokens kept): leading/trailing newlines, tabs,
    NBSP/thin-space (NOT delimiters in Java's ASCII \\s), and mixed."""
    from opentelemetry_collector_spark.streaming.stream import _pref_reward

    texts = [
        "\nhello",            # leading newline -> Java split yields ["", "hello"]
        "hello\n",            # trailing newline -> trailing "" kept (limit -1)
        "\thello world\t",
        "a b",           # NBSP: one Java token, two Python-split tokens
        "x y",           # thin space: same class of divergence
        " ",             # NBSP-only: trim keeps it, \s doesn't split it
        "  spaced out  ",     # U+0020 edges: trim removes, twin must too
        " \n mixed ws\t here \n ",
        "",
        "plain ascii text",
        "\n\n",
        "ab  cd \n",
    ]
    df = spark.createDataFrame([(t,) for t in texts], "resp_text string")
    jvm = {
        r["resp_text"]: r["r"]
        for r in df.select(
            "resp_text", response_reward(F.col("resp_text")).alias("r")
        ).collect()
    }
    for t in texts:
        assert _pref_reward(t) == jvm[t], (repr(t), _pref_reward(t), jvm[t])
    assert _pref_reward(None) is None


def test_preference_stream_survives_null_identity_rows(spark, tmp_path):
    """Candidate rows with NULL conv_id / NULL prompt_idx must not kill
    the streaming query (they are valid candidates in the batch operator,
    ranked under Spark's null-aware struct comparison where NULL sorts
    below any value) — the stream snapshot must match batch
    preference_pairs on the same rows."""
    from opentelemetry_collector_spark.streaming.stream import preference_stream

    rows = [
        ("c1", 0, "p1", True, 1, "alpha beta gamma"),
        (None, 0, "p1", True, 1, "ok"),            # NULL conv_id candidate
        ("c2", None, "p1", True, 1, "12345"),      # NULL prompt_idx candidate
        (None, None, "p1", True, 1, "1234"),       # both NULL
        # tied rewards where only the NULL-aware tiebreak decides:
        (None, 5, "p2", True, 1, "same"),          # NULL conv_id loses max to c9
        ("c9", 5, "p2", True, 1, "same"),
        ("c9", 7, "p2", True, 1, "worse1"),
    ]
    df = spark.createDataFrame(rows, PAIRS_SCHEMA)
    landing = str(tmp_path / "landing")
    df.coalesce(1).write.mode("append").parquet(landing)
    q = (
        preference_stream(
            spark.readStream.schema(PAIRS_SCHEMA).parquet(landing)
        )
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("pref_null_out")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    snaps = spark.sql("select * from pref_null_out").collect()
    latest = {}
    for r in snaps:
        if r["prompt_text"] not in latest or r["n_cands"] > latest[r["prompt_text"]]["n_cands"]:
            latest[r["prompt_text"]] = r.asDict()
    stream_pairs = {k: v for k, v in latest.items() if v["margin"] > 0}
    batch = {r["prompt_text"]: r.asDict() for r in preference_pairs(df).collect()}
    assert set(stream_pairs) == set(batch)
    for prompt, want in batch.items():
        for col, v in want.items():
            assert stream_pairs[prompt][col] == v, (prompt, col, stream_pairs[prompt][col], v)


def test_state_merge_equals_full_build_any_split(spark, pairs, tmp_path):
    """The (sum, max, min) state algebra: merging states built from ANY
    disjoint split — including a parquet-persisted one (the daily-build
    artifact path) — finalizes identically to the full build."""
    from opentelemetry_collector_spark.operators.preference import (
        merge_preference_states,
        pairs_from_state,
        preference_state,
    )

    full = {r["prompt_text"]: r.asDict() for r in preference_pairs(pairs).collect()}
    # 3-way split by md5 of conv_id (arbitrary, not aligned with prompts)
    h = F.conv(F.substring(F.md5("conv_id"), 1, 4), 16, 10).cast("long") % 3
    parts = [preference_state(pairs.filter(h == i)) for i in range(3)]
    # persist one increment through parquet (struct columns roundtrip)
    p0 = str(tmp_path / "state0.parquet")
    parts[0].write.parquet(p0)
    parts[0] = spark.read.parquet(p0)
    for order in ([0, 1, 2], [2, 0, 1]):
        merged = merge_preference_states(*[parts[i] for i in order])
        got = {r["prompt_text"]: r.asDict() for r in pairs_from_state(merged).collect()}
        assert got == full
    # merging a state with itself double-counts n_cands but keeps argmax:
    # the algebra is NOT idempotent, callers must feed disjoint increments
    twice = merge_preference_states(parts[1], parts[1])
    n_once = {r["prompt_text"]: r["n_cands"] for r in parts[1].collect()}
    n_twice = {r["prompt_text"]: r["n_cands"] for r in twice.collect()}
    assert all(n_twice[k] == 2 * v for k, v in n_once.items())


def test_leakage_safe_split_group_atomicity(spark):
    """Every group lands entirely in ONE split; NULL groups get NULL;
    weights validated; assignment matches the documented 52-bit idiom."""
    import hashlib

    from opentelemetry_collector_spark.operators.sample import leakage_safe_split

    rows = [(i, f"g{i % 7}" if i % 11 else None) for i in range(200)]
    df = spark.createDataFrame(rows, "row_id bigint, grp string")
    out = leakage_safe_split(df, "grp").collect()
    by_grp = {}
    for r in out:
        if r["grp"] is None:
            assert r["split"] is None
        else:
            by_grp.setdefault(r["grp"], set()).add(r["split"])
    assert all(len(s) == 1 for s in by_grp.values())
    # independent recomputation of one group's bucket
    for g, s in by_grp.items():
        pm = (int(hashlib.md5(g.encode()).hexdigest()[:13], 16) * 1000) >> 52
        want = "train" if pm < 800 else ("val" if pm < 900 else "test")
        assert s == {want}, (g, pm, s)
    with pytest.raises(ValueError):
        leakage_safe_split(df, "grp", splits=(("a", 500), ("b", 400)))


def test_leakage_safe_split_is_projection(spark):
    from opentelemetry_collector_spark.operators.sample import leakage_safe_split

    df = spark.createDataFrame([(1, "g")], "row_id bigint, grp string")
    plan = leakage_safe_split(df, "grp")._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Python" not in plan
