"""Golden tests for the corpus-quality operators added for training-data
prep: PII redaction, repetition metrics, decontamination, vocab coverage.

Each golden value is hand-computed; the DuckDB oracle (q44-q47) covers the
cross-engine agreement, these pin the absolute semantics.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


# ---------------------------------------------------------------------------
# PII redaction
# ---------------------------------------------------------------------------


def test_redact_pii_all_categories(spark):
    from opentelemetry_collector_spark.operators.pii import redact_pii

    df = _docs(
        spark,
        [
            (1, "mail bob.smith+x@corp.example.org call 25-989-741-2988 ssn 123-45-6789 host 192.168.0.1"),
            (2, "nothing sensitive here"),
        ],
    )
    out = {r["doc_id"]: r for r in redact_pii(df).collect()}
    assert out[1]["redacted"] == "mail [EMAIL] call [PHONE] ssn [SSN] host [IP]"
    assert (out[1]["n_email"], out[1]["n_phone"], out[1]["n_ssn"], out[1]["n_ipv4"]) == (1, 1, 1, 1)
    assert out[2]["redacted"] == "nothing sensitive here"
    assert (out[2]["n_email"], out[2]["n_phone"], out[2]["n_ssn"], out[2]["n_ipv4"]) == (0, 0, 0, 0)


def test_redact_pii_counts_against_original_text(spark):
    # two emails; the placeholder itself must not be re-matched downstream
    from opentelemetry_collector_spark.operators.pii import redact_pii

    df = _docs(spark, [(1, "a@b.co and c@d.io")])
    r = redact_pii(df).collect()[0]
    assert r["n_email"] == 2
    assert r["redacted"] == "[EMAIL] and [EMAIL]"


# ---------------------------------------------------------------------------
# Repetition metrics
# ---------------------------------------------------------------------------


def test_repetition_metrics_golden(spark):
    from opentelemetry_collector_spark.operators.text import repetition_metrics

    df = _docs(
        spark,
        [
            (1, "a a a a"),          # 4 words, 1 distinct; bigrams: 3x "a a"
            (2, "w x y z"),           # all unique; 3 distinct bigrams
            (3, "solo"),              # 1 word, no bigrams
            (4, ""),                  # empty
        ],
    )
    out = {r["doc_id"]: r for r in repetition_metrics(df, "doc_id").collect()}
    assert (out[1]["n_words"], out[1]["dup_word_pm"]) == (4, 750)
    assert out[1]["top_bigram_pm"] == 1000
    assert out[1]["dup_bigram_pm"] == 666  # (3-1)*1000/3 floored
    assert (out[2]["dup_word_pm"], out[2]["top_bigram_pm"], out[2]["dup_bigram_pm"]) == (0, 333, 0)
    assert (out[3]["n_words"], out[3]["top_bigram_pm"]) == (1, 0)
    assert (out[4]["n_words"], out[4]["dup_word_pm"]) == (0, 0)


def test_repetition_keeps_every_doc(spark):
    from opentelemetry_collector_spark.operators.text import repetition_metrics

    df = _docs(spark, [(i, t) for i, t in enumerate(["", "x", "x y", "x x"])])
    assert repetition_metrics(df, "doc_id").count() == 4


# ---------------------------------------------------------------------------
# Decontamination
# ---------------------------------------------------------------------------


def test_word_ngrams_boundaries(spark):
    from opentelemetry_collector_spark.operators.contamination import word_ngrams

    df = _docs(spark, [(1, "a b c d e f"), (2, "a b c d"), (3, "")])
    out = {
        r["doc_id"]: r["g"]
        for r in df.select("doc_id", word_ngrams(F.col("text"), 5).alias("g")).collect()
    }
    assert out[1] == ["a b c d e", "b c d e f"]
    assert out[2] == []  # shorter than n
    assert out[3] == []


def test_decontaminate_flags_planted_overlap(spark):
    from opentelemetry_collector_spark.operators.contamination import decontaminate

    ev = _docs(spark, [(100, "the quick brown fox jumps over the lazy dog")])
    tr = _docs(
        spark,
        [
            (1, "prefix the quick brown fox jumps suffix words here"),  # leaks 1 gram
            (2, "completely unrelated training text with enough words"),
            (3, "too short"),
        ],
    )
    out = {r["doc_id"]: r for r in decontaminate(tr, ev, "doc_id", n=5).collect()}
    assert out[1]["matched_grams"] == 1 and out[1]["contaminated"] is True
    assert out[2]["matched_grams"] == 0 and out[2]["contaminated"] is False
    assert out[3]["n_grams"] == 0 and out[3]["contaminated"] is False


def test_decontaminate_counts_distinct_grams_only(spark):
    # the leaking 5-gram appears twice in the train doc but counts once
    from opentelemetry_collector_spark.operators.contamination import decontaminate

    ev = _docs(spark, [(100, "e1 e2 e3 e4 e5")])
    tr = _docs(spark, [(1, "e1 e2 e3 e4 e5 x e1 e2 e3 e4 e5")])
    r = decontaminate(tr, ev, "doc_id", n=5).collect()[0]
    assert r["matched_grams"] == 1


# ---------------------------------------------------------------------------
# Vocab coverage
# ---------------------------------------------------------------------------


def test_vocab_coverage_golden(spark):
    from opentelemetry_collector_spark.operators.text import vocab_coverage

    df = _docs(
        spark,
        [
            (1, "hot hot hot warm"),
            (2, "hot warm cold rare1 rare2 rare3"),
        ],
    )
    # top-2 vocab by (count desc, token asc): hot(4), warm(2)
    out = {r["doc_id"]: r for r in vocab_coverage(df, "doc_id", top_k=2).collect()}
    assert (out[1]["n_tokens"], out[1]["in_vocab"], out[1]["coverage_pm"]) == (4, 4, 1000)
    assert (out[2]["n_tokens"], out[2]["in_vocab"], out[2]["coverage_pm"]) == (6, 2, 333)


def test_vocab_tiebreak_is_deterministic(spark):
    from opentelemetry_collector_spark.operators.text import vocab_coverage

    # all counts equal -> vocab must be the lexicographically first top_k
    df = _docs(spark, [(1, "b a d c")])
    out = vocab_coverage(df, "doc_id", top_k=2).collect()[0]
    assert out["in_vocab"] == 2  # {a, b}


# ---------------------------------------------------------------------------
# DSIR-style importance mass
# ---------------------------------------------------------------------------


def test_importance_mass_hand_computed(spark):
    from opentelemetry_collector_spark.operators.contamination import importance_mass

    # bigrams — target: {"a b": 1, "b c": 1}; raw corpus grams:
    #   doc1 "a b c"   -> [a b, b c]
    #   doc2 "a b a b" -> [a b, b a, a b]
    #   doc3 "x y"     -> [x y]
    raw = _docs(spark, [(1, "a b c"), (2, "a b a b"), (3, "x y")])
    tgt = _docs(spark, [(100, "a b c")])
    out = {r.doc_id: r for r in importance_mass(raw, tgt, "doc_id", n=2).collect()}
    # raw gram counts: "a b"->3, "b c"->1, "b a"->1, "x y"->1
    assert (out[1].n_grams, out[1].tgt_mass, out[1].raw_mass) == (2, 2, 4)
    assert out[1].score_ppm == 2 * 1_000_000 // 4
    # multiset semantics: doc2's repeated "a b" counts twice in both masses
    assert (out[2].n_grams, out[2].tgt_mass, out[2].raw_mass) == (3, 2, 7)
    assert out[2].score_ppm == 2 * 1_000_000 // 7
    # target-disjoint doc scores 0 but keeps its raw mass
    assert (out[3].n_grams, out[3].tgt_mass, out[3].raw_mass) == (1, 0, 1)
    assert out[3].score_ppm == 0


def test_importance_mass_keeps_empty_and_short_docs(spark):
    from opentelemetry_collector_spark.operators.contamination import importance_mass

    raw = _docs(spark, [(1, ""), (2, "single"), (3, "a b")])
    tgt = _docs(spark, [(100, "a b")])
    out = {r.doc_id: r for r in importance_mass(raw, tgt, "doc_id", n=2).collect()}
    assert set(out) == {1, 2, 3}
    for d in (1, 2):  # zero bigrams -> all-zero evidence, not a dropped row
        assert (out[d].n_grams, out[d].tgt_mass, out[d].raw_mass, out[d].score_ppm) == (0, 0, 0, 0)
    assert out[3].score_ppm == 1_000_000  # its only gram is pure target mass


# ---------------------------------------------------------------------------
# Gopher filter decision
# ---------------------------------------------------------------------------


def test_gopher_filter_golden(spark):
    from opentelemetry_collector_spark.operators.text import GOPHER_REASONS, gopher_filter

    clean = "the and " + " ".join(f"wor{c}d" for c in "abcdefghijklmn")  # 16 words, all rules pass
    df = _docs(
        spark,
        [
            (1, clean),
            (2, "a b"),                                   # short + tiny words + 1 stopword + low alpha
            (3, " ".join(["alpha"] * 16) + " the and"),   # 18 words, 3 distinct -> dup rule only
        ],
    )
    out = {
        r["doc_id"]: r
        for r in gopher_filter(
            df, "doc_id",
            min_words=15, max_words=90,
            min_mean_word_len_pm=4000, max_mean_word_len_pm=5000,
            min_alpha_pm=810, max_dup_word_pm=600,
        ).collect()
    }
    assert (out[1]["reasons"], out[1]["keep"], out[1]["n_words"]) == (0, 1, 16)
    assert out[2]["reasons"] == (
        GOPHER_REASONS["word_count"]
        + GOPHER_REASONS["mean_word_len"]
        + GOPHER_REASONS["stopwords"]
        + GOPHER_REASONS["alpha"]
    )
    assert out[2]["keep"] == 0
    assert (out[3]["reasons"], out[3]["keep"]) == (GOPHER_REASONS["dup_words"], 0)


def test_gopher_filter_default_bounds_are_gopher_paper_bounds(spark):
    # Rae et al. 2021 §A1.1: 50-100k words, mean word length 3-10 chars.
    # A normal 60-word English-ish doc passes the DEFAULTS; a 30-word doc
    # fails only the word-count rule.
    from opentelemetry_collector_spark.operators.text import GOPHER_REASONS, gopher_filter

    suffix = lambda i: chr(97 + i // 26) + chr(97 + i % 26)  # noqa: E731 — all-alpha words
    body = "the and of it is " + " ".join(f"word{suffix(i)}" for i in range(55))  # 60 words
    short = "the and of it is " + " ".join(f"word{suffix(i)}" for i in range(25))  # 30 words
    df = _docs(spark, [(1, body), (2, short)])
    out = {r["doc_id"]: r for r in gopher_filter(df, "doc_id").collect()}
    assert (out[1]["reasons"], out[1]["keep"]) == (0, 1)
    assert (out[2]["reasons"], out[2]["keep"]) == (GOPHER_REASONS["word_count"], 0)


def test_gopher_filter_is_shuffle_free(spark):
    from opentelemetry_collector_spark.operators.text import gopher_filter

    df = _docs(spark, [(1, "x y z")])
    plan = gopher_filter(df, "doc_id")._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # pure map stage: the filter rides the scan


# ---------------------------------------------------------------------------
# tf-idf top terms per group
# ---------------------------------------------------------------------------


def test_tfidf_top_terms_golden(spark):
    from opentelemetry_collector_spark.operators.text import tfidf_top_terms

    df = spark.createDataFrame(
        [(1, "srcA", "x x y"), (2, "srcA", "x z"), (3, "srcB", "y y z"), (4, "srcB", "w")],
        "doc_id bigint, source string, text string",
    )
    out = tfidf_top_terms(df, "source", "doc_id", top_k=2).collect()
    got = {(r["source"], r["rank"]): (r["term"], r["tf"], r["doc_freq"], r["score"]) for r in out}
    # N=4; doc_freq x/y/z=2 (idf_pm 2000), w=1 (idf_pm 4000)
    assert got[("srcA", 1)] == ("x", 3, 2, 6000)
    assert got[("srcA", 2)] == ("y", 1, 2, 2000)  # y beats z on the term tiebreak
    assert got[("srcB", 1)] == ("w", 1, 1, 4000)  # w beats y on the tiebreak at 4000
    assert got[("srcB", 2)] == ("y", 2, 2, 4000)
    assert len(out) == 4


# ---------------------------------------------------------------------------
# C4-style page cleaning
# ---------------------------------------------------------------------------


def test_c4_clean_line_rules(spark):
    from opentelemetry_collector_spark.operators.text import c4_clean

    page = (
        "this line has five words here.\n"
        "short line.\n"                          # < 5 words -> dropped
        "this line has no terminal punct\n"      # no [.!?"] -> dropped
        "please enable JavaScript to view this.\n"  # javascript -> dropped
        "another good line with many words!\n"
        "a third good line also has words."
    )
    df = _docs(spark, [(1, page)])
    r = c4_clean(df, "doc_id").collect()[0]
    assert (r["n_lines"], r["n_kept_lines"], r["n_sentences"], r["keep"]) == (6, 3, 3, 1)
    assert r["clean_text"] == (
        "this line has five words here.\n"
        "another good line with many words!\n"
        "a third good line also has words."
    )


def test_c4_clean_page_rules(spark):
    from opentelemetry_collector_spark.operators.text import c4_clean

    good = "\n".join(["this perfectly fine line has words."] * 3)
    df = _docs(
        spark,
        [
            (1, good),
            (2, good + "\nconfig = { brace }"),       # curly brace -> page dropped
            (3, good + "\nLorem Ipsum dolor sit."),    # blocklist (case-folded) -> dropped
            (4, "only two good lines here today.\nand this is the second one."),  # < 3 sentences
            (5, None),                                 # junk degrades per row
        ],
    )
    out = {r["doc_id"]: r for r in c4_clean(df, "doc_id").collect()}
    assert out[1]["keep"] == 1
    assert out[2]["keep"] == 0 and out[2]["n_kept_lines"] == 3
    assert out[3]["keep"] == 0
    assert out[4]["keep"] == 0 and out[4]["n_sentences"] == 2
    assert out[5]["keep"] == 0 and out[5]["clean_text"] is None


def test_c4_clean_is_shuffle_free(spark):
    from opentelemetry_collector_spark.operators.text import c4_clean

    plan = c4_clean(_docs(spark, [(1, "x.")]), "doc_id")._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


# ---------------------------------------------------------------------------
# cross-corpus boilerplate line removal
# ---------------------------------------------------------------------------


def test_boilerplate_lines_removed_everywhere(spark):
    from opentelemetry_collector_spark.operators.text import remove_boilerplate_lines

    df = _docs(
        spark,
        [
            (1, "header line\nunique body one\nfooter line"),
            (2, "header line\nunique body two\nfooter line"),
            # case/whitespace variants collapse to the same normalized key
            (3, "  HEADER LINE \nunique body three"),
            # all-boilerplate doc survives with empty text, not a lost row
            (4, "header line\nfooter line"),
        ],
    )
    out = {r["doc_id"]: r for r in remove_boilerplate_lines(df, "doc_id", min_docs=2).collect()}
    assert out[1]["clean_text"] == "unique body one"
    assert out[2]["clean_text"] == "unique body two"
    assert out[3]["clean_text"] == "unique body three"
    assert (out[4]["n_lines"], out[4]["n_kept_lines"], out[4]["clean_text"]) == (2, 0, "")


def test_boilerplate_preserves_order_and_within_doc_repeats(spark):
    from opentelemetry_collector_spark.operators.text import remove_boilerplate_lines

    # "echo echo" repeats WITHIN doc 1 only -> 1 distinct doc -> kept twice;
    # "header line" spans both docs -> removed; order of survivors stable
    df = _docs(
        spark,
        [
            (1, "echo echo\nheader line\nmiddle body\necho echo"),
            (2, "header line\nother body"),
        ],
    )
    out = {r["doc_id"]: r for r in remove_boilerplate_lines(df, "doc_id", min_docs=2).collect()}
    assert out[1]["clean_text"] == "echo echo\nmiddle body\necho echo"
    assert out[2]["clean_text"] == "other body"


def test_boilerplate_no_window_over_corpus(spark):
    from opentelemetry_collector_spark.operators.text import remove_boilerplate_lines

    df = _docs(spark, [(1, "a\nb"), (2, "a\nc")])
    plan = (
        remove_boilerplate_lines(df, "doc_id")._jdf.queryExecution().executedPlan().toString()
    )
    # reassembly is a grouped collect_list, never a corpus-wide Window sort
    assert "Window" not in plan


# ---------------------------------------------------------------------------
# linear classifier inference (classify.linear_score)
# ---------------------------------------------------------------------------


def _weights(spark):
    rows = [("good", 100), ("bad", -300), ("the", 10)]
    return spark.createDataFrame(rows, "term string, weight_pm bigint")


def test_linear_score_multiset_and_oov(spark):
    from opentelemetry_collector_spark.operators.classify import linear_score

    df = _docs(
        spark,
        [
            (1, "good good the zzz"),  # 2*100 + 10 + 0 = 210
            (2, "bad"),  # -300
            (3, "unknown words only"),
            (4, ""),  # empty: bare bias
            (5, None),  # NULL text: bare bias
        ],
    )
    out = {
        r["doc_id"]: r
        for r in linear_score(
            df, _weights(spark), "doc_id", bias_pm=-5, threshold_pm=0
        ).collect()
    }
    assert (out[1]["n_tokens"], out[1]["hits"], out[1]["score_pm"], out[1]["keep"]) == (
        4, 3, 205, True,
    )
    assert (out[2]["score_pm"], out[2]["keep"]) == (-305, False)
    assert (out[3]["n_tokens"], out[3]["hits"], out[3]["score_pm"]) == (3, 0, -5)
    # empty and NULL text score the bare bias and STAY as rows
    assert (out[4]["n_tokens"], out[4]["score_pm"], out[4]["keep"]) == (0, -5, False)
    assert (out[5]["n_tokens"], out[5]["score_pm"]) == (0, -5)
    assert len(out) == 5


def test_linear_score_threshold_and_plan(spark):
    from opentelemetry_collector_spark.operators.classify import linear_score

    df = _docs(spark, [(1, "good"), (2, "the")])
    out = linear_score(df, _weights(spark), "doc_id", bias_pm=0, threshold_pm=50)
    got = {r["doc_id"]: r["keep"] for r in out.collect()}
    assert got == {1: True, 2: False}  # 100 >= 50, 10 < 50
    plan = out._jdf.queryExecution().executedPlan().toString()
    # vocab joins broadcast; no sort-merge of the corpus against the vocab
    assert "BroadcastHashJoin" in plan and "SortMergeJoin" not in plan


# ---------------------------------------------------------------------------
# unicode normalization + encoding metrics (text.unicode_normalize)
# ---------------------------------------------------------------------------


def test_unicode_normalize_nfc_golden(spark):
    from opentelemetry_collector_spark.operators.text import unicode_normalize

    decomposed = "café"  # e + COMBINING ACUTE
    precomposed = "café"
    df = _docs(spark, [(1, decomposed), (2, precomposed), (3, None)])
    out = {
        r["doc_id"]: r["n"]
        for r in df.select("doc_id", unicode_normalize(F.col("text")).alias("n")).collect()
    }
    assert out[1] == precomposed  # NFC folds the combining pair
    assert out[2] == precomposed  # already-NFC text is untouched
    assert out[3] is None  # NULL passes through


def test_unicode_normalize_nfd_and_bad_form(spark):
    import pytest as _pytest

    from opentelemetry_collector_spark.operators.text import unicode_normalize

    df = _docs(spark, [(1, "café")])
    out = df.select(unicode_normalize(F.col("text"), "NFD").alias("n")).collect()
    assert out[0]["n"] == "café"
    with _pytest.raises(ValueError):
        unicode_normalize(F.col("text"), "NFX")


def test_encoding_metrics_counts(spark):
    from opentelemetry_collector_spark.operators.text import encoding_metrics

    df = _docs(
        spark,
        [
            (1, "ok �� then Ã© and â€™ plus \x07"),
            (2, "clean text\twith tab\nand newline"),
        ],
    )
    out = {
        r["doc_id"]: r["m"]
        for r in df.select("doc_id", encoding_metrics(F.col("text")).alias("m")).collect()
    }
    assert (out[1]["repl_chars"], out[1]["mojibake_marks"], out[1]["ctrl"]) == (2, 2, 1)
    # tab/newline/CR are NOT control damage
    assert (out[2]["repl_chars"], out[2]["mojibake_marks"], out[2]["ctrl"]) == (0, 0, 0)


def test_linear_score_merges_duplicate_vocab_rows(spark):
    """A vocab built by unioning weight files may repeat a term; the join
    must stay 1:1 (duplicates merge by SUM), never inflate n_tokens."""
    from opentelemetry_collector_spark.operators.classify import linear_score

    df = _docs(spark, [(1, "data data")])
    w = spark.createDataFrame(
        [("data", 50), ("data", 60)], "term string, weight_pm bigint"
    )
    r = linear_score(df, w, "doc_id").collect()[0]
    assert r["n_tokens"] == 2 and r["hits"] == 2
    assert r["score_pm"] == 2 * (50 + 60)


def test_train_linear_recovers_planted_signal(spark):
    """Planted separable corpus: docs containing 'excellent' are positive,
    'terrible' negative. Training must put opposite-sign weights on the
    two markers and the trained model must classify held-out docs through
    the inference op end-to-end."""
    from opentelemetry_collector_spark.operators.classify import linear_score, train_linear

    rows = []
    for i in range(60):
        filler = f"doc {i % 7} common words here"
        if i % 2 == 0:
            rows.append((i, f"{filler} excellent prose", 1))
        else:
            rows.append((i, f"{filler} terrible junk", 0))
    df = spark.createDataFrame(rows, "doc_id bigint, text string, label int")
    weights, bias = train_linear(df, "label", max_iter=30)
    w = {r["term"]: r["weight_pm"] for r in weights.collect()}
    assert w.get("excellent", 0) > 0 > w.get("terrible", 0)
    # end-to-end: held-out docs route correctly through linear_score
    held = spark.createDataFrame(
        [(100, "some excellent prose"), (101, "junk terrible junk")],
        "doc_id bigint, text string",
    )
    got = {r["doc_id"]: r["keep"] for r in linear_score(held, weights, "doc_id", bias_pm=bias).collect()}
    assert got == {100: True, 101: False}


def test_train_linear_degenerate_seeds(spark):
    """Empty seed -> zero model; single-class seed -> the constant model
    (LBFGS would return an infinite intercept); NULL text/label rows are
    dropped before the fit instead of killing it."""
    from opentelemetry_collector_spark.operators.classify import train_linear

    empty = spark.createDataFrame([], "doc_id bigint, text string, label int")
    w, b = train_linear(empty, "label")
    assert w.count() == 0 and b == 0
    allpos = spark.createDataFrame(
        [(i, "some text here", 1) for i in range(20)], "doc_id bigint, text string, label int"
    )
    w, b = train_linear(allpos, "label")
    assert w.count() == 0 and b == 1000
    allneg = allpos.withColumn("label", F.lit(0))
    w, b = train_linear(allneg, "label")
    assert w.count() == 0 and b == -1000
    with_nulls = spark.createDataFrame(
        [(1, None, 1), (2, "good stuff", None), (3, "good stuff", 1), (4, "bad stuff", 0)]
        * 10,
        "doc_id bigint, text string, label int",
    )
    w, b = train_linear(with_nulls, "label", min_doc_freq=1, max_iter=10)
    got = {r["term"]: r["weight_pm"] for r in w.collect()}
    assert got.get("good", 0) > 0 > got.get("bad", 0)


def test_surprisal_bits_hand_computed(spark):
    """Corpus 'a a a a b b c .' (8 tokens, maxb=length(bin(8))=4):
    bits(a)=4-len(bin(4))=1, bits(b)=4-2=2, bits(c)=4-1=3, OOV=4."""
    from opentelemetry_collector_spark.operators.text import surprisal_bits

    docs = spark.createDataFrame(
        [
            ("d1", "a a a a"),
            ("d2", "b b c ."),
        ],
        "doc_id string, text string",
    )
    got = {
        r["doc_id"]: (r["n_tokens"], r["bits_total"], r["mbits_per_token"])
        for r in surprisal_bits(docs, "doc_id").collect()
    }
    # d1: 4 tokens x 1 bit = 4; d2: 2+2+3+3 = 10 -> 2500 mbits/token
    assert got == {"d1": (4, 4, 1000), "d2": (4, 10, 2500)}


def test_surprisal_bits_oov_empty_and_vocab_limit(spark):
    from opentelemetry_collector_spark.operators.text import surprisal_bits

    ref = spark.createDataFrame(
        [("r1", "x x x y")], "doc_id string, text string"
    )  # N=4, maxb=3: bits(x)=3-2=1, bits(y)=3-1=2
    docs = spark.createDataFrame(
        [("d1", "x zz"), ("d2", ""), ("d3", "   ")],
        "doc_id string, text string",
    )
    got = {
        r["doc_id"]: (r["n_tokens"], r["bits_total"], r["mbits_per_token"])
        for r in surprisal_bits(docs, "doc_id", reference=ref).collect()
    }
    # zz is OOV -> maxb=3 bits; empty/whitespace docs score 0
    assert got == {"d1": (2, 4, 2000), "d2": (0, 0, 0), "d3": (0, 0, 0)}

    # vocab_limit=1 keeps only x (count desc, token asc); y becomes OOV
    got1 = {
        r["doc_id"]: r["bits_total"]
        for r in surprisal_bits(
            spark.createDataFrame([("q", "y")], "doc_id string, text string"),
            "doc_id",
            reference=ref,
            vocab_limit=1,
        ).collect()
    }
    assert got1 == {"q": 3}

    # an empty reference carries zero information: every token scores 0
    zero = {
        r["doc_id"]: (r["bits_total"], r["mbits_per_token"])
        for r in surprisal_bits(
            docs, "doc_id", reference=docs.filter("doc_id = 'd2'")
        ).collect()
    }
    assert zero == {"d1": (0, 0), "d2": (0, 0), "d3": (0, 0)}


def test_surprisal_plan_is_broadcast_probe(spark):
    from opentelemetry_collector_spark.operators.text import surprisal_bits

    docs = spark.createDataFrame(
        [("d1", "a b c"), ("d2", "a a")], "doc_id string, text string"
    )
    plan = (
        surprisal_bits(docs, "doc_id")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the vocab probe joins on the token key and must be a broadcast, never
    # a shuffle of the postings against the tiny vocab (the doc-id spine
    # LEFT join may shuffle — it is keyed on doc_id, not _t)
    assert "BroadcastHashJoin [_t" in plan
    assert "SortMergeJoin [_t" not in plan


# ---------------------------------------------------------------------------
# k-anonymity audit + QI suppression
# ---------------------------------------------------------------------------


def test_k_anonymity_report_groups_and_nulls(spark):
    from opentelemetry_collector_spark.operators.pii import k_anonymity_report

    rows = [
        ("user", "web"), ("user", "web"), ("user", "web"),
        ("admin", "web"),
        (None, "api"), (None, "api"),
    ]
    df = spark.createDataFrame(rows, "role string, channel string")
    got = {
        (r["role"], r["channel"]): (r["n_rows"], r["at_risk"])
        for r in k_anonymity_report(df, ["role", "channel"], k=3).collect()
    }
    assert got[("user", "web")] == (3, False)
    assert got[("admin", "web")] == (1, True)
    # NULL is a QI value: the two NULL-role rows form ONE group of 2
    assert got[(None, "api")] == (2, True)

    import pytest as _pytest
    with _pytest.raises(ValueError, match="k must"):
        k_anonymity_report(df, ["role"], k=1)
    with _pytest.raises(ValueError, match="quasi-identifier"):
        k_anonymity_report(df, [], k=3)


def test_suppress_quasi_identifiers_masks_risky_incl_null_groups(spark):
    from opentelemetry_collector_spark.operators.pii import suppress_quasi_identifiers

    rows = [
        ("user", "web", "a"), ("user", "web", "b"), ("user", "web", "c"),
        ("admin", "web", "d"),
        (None, "api", "e"), (None, "api", "f"),
    ]
    df = spark.createDataFrame(rows, "role string, channel string, payload string")
    out = {r["payload"]: (r["role"], r["channel"]) for r in
           suppress_quasi_identifiers(df, ["role", "channel"], k=3).collect()}
    assert len(out) == 6                          # row count preserved
    for p in "abc":
        assert out[p] == ("user", "web")          # big group untouched
    assert out["d"] == (None, None)               # singleton suppressed
    # NULL-keyed risky group must ALSO suppress (null-safe join-back)
    assert out["e"] == (None, None) and out["f"] == (None, None)


def test_suppressed_output_satisfies_k_anonymity(spark):
    """Idempotence-style invariant: after suppression, every group either
    meets k or is the all-NULL suppressed bucket."""
    from opentelemetry_collector_spark.operators.pii import (
        k_anonymity_report,
        suppress_quasi_identifiers,
    )

    rows = [(f"r{i % 7}", f"c{i % 3}") for i in range(40)]
    df = spark.createDataFrame(rows, "role string, channel string")
    sup = suppress_quasi_identifiers(df, ["role", "channel"], k=3)
    rep = k_anonymity_report(sup, ["role", "channel"], k=3).collect()
    for r in rep:
        assert not r["at_risk"] or (r["role"] is None and r["channel"] is None)


# ---------------------------------------------------------------------------
# vocabulary growth curve
# ---------------------------------------------------------------------------


def test_vocab_growth_first_occurrence_and_cumsum(spark):
    import datetime as dt
    from opentelemetry_collector_spark.operators.text import vocab_growth

    d1 = dt.datetime(2024, 1, 1, 8, 0, 0)
    d2 = dt.datetime(2024, 1, 2, 9, 0, 0)
    d3 = dt.datetime(2024, 1, 3, 10, 0, 0)
    rows = [
        ("alpha beta", d1),
        ("beta gamma", d2),        # beta already seen on day 1
        ("alpha", d3),             # nothing new
        ("delta", d3),
        ("", d3),                  # empty text isolates
        ("epsilon", None),         # NULL ts isolates
    ]
    df = spark.createDataFrame(rows, "text string, ts timestamp")
    got = {r["bucket"].date().isoformat(): (r["n_new_terms"], r["vocab_size"])
           for r in vocab_growth(df).collect()}
    assert got == {
        "2024-01-01": (2, 2),      # alpha, beta
        "2024-01-02": (1, 3),      # gamma
        "2024-01-03": (1, 4),      # delta only
    }


def test_vocab_growth_token_keyed_partial_agg_plan(spark):
    """First-occurrence must be a token-keyed groupBy with map-side partial
    aggregation — never a corpus-wide window or dedup-then-join."""
    import datetime as dt
    from opentelemetry_collector_spark.operators.text import vocab_growth

    df = spark.createDataFrame(
        [("a b", dt.datetime(2024, 1, 1))], "text string, ts timestamp"
    )
    plan = vocab_growth(df)._jdf.queryExecution().executedPlan().toString()
    assert "partial_min" in plan
    assert "Join" not in plan


def test_train_linear_gd_recovers_rule_and_is_partition_invariant(spark):
    """The integer-GD trainer must (a) give the planted token the most
    positive weight, (b) produce BIT-IDENTICAL weights regardless of how
    the corpus is partitioned (integer gradient sums are associative —
    the property the LBFGS float path does not have), and (c) match a
    plain-Python replay of the same fixed-point arithmetic."""
    from opentelemetry_collector_spark.operators.classify import train_linear_gd

    rows = []
    for i in range(60):
        good = i % 3 == 0
        body = "quick brown fox jumps high" if i % 2 else "lazy dogs sleep all day"
        rows.append((i, ("magic " if good else "") + body, 1 if good else 0))
    df = spark.createDataFrame(rows, "doc_id long, text string, label int")
    w1, b1 = train_linear_gd(df, "doc_id", "label", vocab_size=12, iters=3)
    got = {r.term: r.weight_micro for r in w1.collect()}
    assert max(got, key=got.get) == "magic"
    w2, b2 = train_linear_gd(df.repartition(16, "text"), "doc_id", "label", vocab_size=12, iters=3)
    assert {r.term: r.weight_micro for r in w2.collect()} == got and b2 == b1

    # plain-Python replay of the fixed-point loop
    def trunc(a, d):
        return a // d if a >= 0 else -((-a) // d)

    posts, labels = {}, {}
    for i, text, y in rows:
        labels[i] = y
        for t in text.split():
            posts.setdefault(i, {})[t] = posts.get(i, {}).get(t, 0) + 1
    dfreq = {}
    for cnts in posts.values():
        for t in cnts:
            dfreq[t] = dfreq.get(t, 0) + 1
    vocab = sorted((t for t, c in dfreq.items() if c >= 2), key=lambda t: (-dfreq[t], t))[:12]
    w = dict.fromkeys(vocab, 0)
    b = 0
    n = len(rows)
    for _ in range(3):
        err = {
            i: b + sum(posts[i].get(t, 0) * w[t] for t in vocab) - labels[i] * 1_000_000
            for i in posts
        }
        g = {t: sum(posts[i].get(t, 0) * err[i] for i in posts) for t in vocab}
        gb = sum(err.values())
        for t in vocab:
            w[t] -= trunc(g[t], n * 64)
        b -= trunc(gb, n * 64)
    assert got == w and b1 == b


def test_train_linear_gd_filters_empty_tokens_from_split_artifacts(spark):
    """text.tokens keeps Spark split(limit=-1) artifacts — tokens('abc\\n')
    is ['abc',''] because F.trim strips spaces only — but the trainer's
    contract (and the q84 oracle's list_filter) drops empty tokens, so a
    corpus of tab/newline-terminated documents must train identically to
    the same corpus with the terminators stripped (ADVICE r2: the two
    sides previously disagreed on exactly these inputs)."""
    from pyspark.sql import functions as F

    from opentelemetry_collector_spark.operators.classify import train_linear_gd
    from opentelemetry_collector_spark.operators.text import tokens

    # pin the underlying artifact the contract exists for
    toks = spark.range(1).select(tokens(F.lit("abc\n")).alias("t")).first().t
    assert toks == ["abc", ""]

    rows = []
    for i in range(40):
        good = i % 4 == 0
        body = ("magic quick brown fox" if good else "lazy dogs sleep day")
        rows.append((i, body, 1 if good else 0))
    clean = spark.createDataFrame(rows, "doc_id long, text string, label int")
    dirty = clean.withColumn(
        "text", F.concat(F.col("text"), F.when(F.col("doc_id") % 2 == 0, "\n").otherwise("\t"))
    )
    wc, bc = train_linear_gd(clean, "doc_id", "label", vocab_size=8, iters=2)
    wd, bd = train_linear_gd(dirty, "doc_id", "label", vocab_size=8, iters=2)
    as_map = lambda w: {r.term: r.weight_micro for r in w.collect()}  # noqa: E731
    wc_map = as_map(wc)
    assert wc_map == as_map(wd) and bc == bd
    assert "" not in wc_map
