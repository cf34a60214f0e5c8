"""Linear text-classifier inference: quality scoring with a broadcast vocab.

The fastText-shaped op (Joulin et al. 2016, "Bag of Tricks for Efficient
Text Classification", arXiv:1607.01759): a trained quality classifier is,
at inference time, a bag-of-words dot product against a weight vector plus
a bias — exactly the shape large-scale corpus pipelines run over every
document to gate pretraining data (e.g. the CCNet/LLaMA "looks like a
reference page" filter). Training happens offline; this operator is the
100 TB-scale inference pass.

Reference relative: the expr-language filter (`internal/processor/
filterexpr/matcher.go:24-62`) is a per-record boolean VM over attribute
lookups; this generalizes the lookup table to a learned vocabulary and the
boolean to a signed score, but keeps the same execution shape — a
broadcast map applied per record, then a threshold.

Weights are INTEGER per-mille (weight_pm) so every engine reproduces every
score bit-for-bit — float dot products are order-dependent, integer sums
are not. A deliberate non-feature: no mean/length normalization inside the
operator. Integral division of SIGNED sums truncates toward zero in Spark
(`div`) but floors in DuckDB (`//`), so a mean-normalized score cannot be
engine-exact without picking a side; callers who want length control put
n_tokens in the decision rule instead (keep iff score_pm >= thr * n_tokens
stays in exact integers).

Scale shape: the vocabulary broadcasts by construction (a fastText-style
vocab is ~10^5-10^6 rows — megabytes); the corpus side is one explode ->
broadcast-hash join -> per-doc partial-aggregated sum. Raw text never
shuffles; only (id, weight) pairs reach the agg, and the per-doc groupBy
partial-aggregates map-side. Identical to the decontaminate/importance_mass
topology, so everything measured about those plans carries over.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from opentelemetry_collector_spark.operators.text import tokens

__all__ = ["linear_score"]


def linear_score(
    df: DataFrame,
    weights_df: DataFrame,
    id_col: str,
    text_col: str = "text",
    bias_pm: int = 0,
    threshold_pm: int = 0,
) -> DataFrame:
    """Score each document with a linear bag-of-words classifier.

    ``weights_df`` is ``(term string, weight_pm bigint)`` — one row per
    vocabulary term, integer per-mille weight, broadcast to every task.
    Out-of-vocabulary tokens contribute 0. Token MULTISET semantics:
    a term appearing k times contributes k * weight_pm (the BoW count
    features of the paper, not set membership).

    Returns one row per input row: ``(id_col, n_tokens bigint, hits
    bigint, score_pm bigint, keep boolean)`` with
    ``score_pm = bias_pm + sum(weight_pm over token occurrences)`` and
    ``keep = score_pm >= threshold_pm``. Empty/NULL-text docs score the
    bare bias (n_tokens 0) — they are rows, not dropped, so the keep flag
    is a complete routing decision for the fan-out writer.
    """
    posted = df.select(
        F.col(id_col),
        F.explode_outer(tokens(F.col(text_col))).alias("term"),
    )
    # duplicate vocab rows would fan the join out and silently inflate
    # n_tokens/hits/score; merge them by SUM (the linear-model semantics of
    # a feature appearing in two weight files) so the join stays 1:1
    weights = weights_df.groupBy("term").agg(F.sum("weight_pm").alias("weight_pm"))
    joined = posted.join(F.broadcast(weights), "term", "left")
    rolled = joined.groupBy(id_col).agg(
        F.count("term").alias("_n"),
        F.count("weight_pm").alias("_hits"),
        F.sum(F.coalesce(F.col("weight_pm"), F.lit(0))).alias("_w"),
    )
    score = F.coalesce(F.col("_w"), F.lit(0)) + F.lit(bias_pm)
    return rolled.select(
        F.col(id_col),
        F.col("_n").cast("bigint").alias("n_tokens"),
        F.col("_hits").cast("bigint").alias("hits"),
        score.cast("bigint").alias("score_pm"),
        (score >= F.lit(threshold_pm)).alias("keep"),
    )


def train_linear(
    df: DataFrame,
    label_col: str,
    text_col: str = "text",
    vocab_size: int = 32768,
    min_doc_freq: int = 2,
    max_iter: int = 50,
    reg_param: float = 0.01,
) -> tuple[DataFrame, int]:
    """Train the quality classifier :func:`linear_score` serves.

    The fastText training loop distilled to its Spark-idiomatic core:
    bag-of-words count features over a bounded vocabulary
    (``CountVectorizer`` — the distributed vocab build is itself one
    grouped count + top-k) into L2-regularized logistic regression
    (``pyspark.ml`` LBFGS — each iteration is one treeAggregate pass over
    the featurized corpus, embarrassingly parallel per partition).
    Training runs on a small LABELED seed set; the returned weights then
    score the full 100 TB corpus through ``linear_score``'s broadcast
    join, which is the fastText deployment split exactly (train small,
    infer everywhere).

    Returns ``(weights_df, bias_pm)``: a ``(term string, weight_pm
    bigint)`` frame (coefficients scaled to integer per-mille — the
    engine-exact currency of the inference op) and the matching intercept.
    ``linear_score(corpus, weights_df, id, bias_pm=bias_pm)`` then yields
    ``score_pm ~= 1000 * logit``; keep at ``score_pm >= 0`` is the 0.5
    probability threshold.

    Note: LBFGS float reductions are order-dependent across partitions, so
    coefficients are deterministic only up to partitioning — train once
    and PERSIST the weights frame; the inference pass stays bit-exact.
    """
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import CountVectorizer

    def _no_weights() -> DataFrame:
        return df.sparkSession.createDataFrame([], "term string, weight_pm bigint")

    toks = df.select(
        F.col(label_col).cast("double").alias("label"),
        tokens(F.col(text_col)).alias("toks"),
    ).filter(F.col("label").isNotNull() & F.col("toks").isNotNull())
    # degenerate seed sets cannot fit and are routine at 100 TB (an empty
    # labeled slice, or a slice where the rule never/always fires):
    # empty -> the zero model; single-class -> the constant model for the
    # observed class (LBFGS would return an infinite intercept here)
    labs = [r["label"] for r in toks.select("label").distinct().limit(2).collect()]
    if len(labs) == 0:
        return _no_weights(), 0
    if len(labs) == 1:
        return _no_weights(), 1000 if labs[0] == 1.0 else -1000
    cv = CountVectorizer(
        inputCol="toks", outputCol="features", vocabSize=vocab_size, minDF=float(min_doc_freq)
    )
    cv_model = cv.fit(toks)
    feats = cv_model.transform(toks)
    lr = LogisticRegression(
        maxIter=max_iter, regParam=reg_param, standardization=False, family="binomial"
    )
    model = lr.fit(feats)
    import math

    def _pm(x: float) -> int:
        # clamp non-finite coefficients (separable data drives LBFGS to
        # +/-inf) into the integer currency instead of OverflowError
        if not math.isfinite(x):
            return 1_000_000 if x > 0 else -1_000_000
        return int(round(x * 1000))

    coefs = model.coefficients.toArray()
    rows = [
        (term, _pm(float(coefs[i])))
        for i, term in enumerate(cv_model.vocabulary)
        if _pm(float(coefs[i])) != 0
    ]
    if not rows:
        return _no_weights(), _pm(float(model.intercept))
    weights = df.sparkSession.createDataFrame(rows, "term string, weight_pm bigint")
    return weights, _pm(float(model.intercept))


def train_linear_gd(
    df: DataFrame,
    id_col: str,
    label_col: str,
    text_col: str = "text",
    vocab_size: int = 32,
    min_doc_freq: int = 2,
    iters: int = 3,
    lr_div: int = 64,
    scale: int = 1_000_000,
) -> tuple[DataFrame, int]:
    """Fixed-point integer batch gradient descent for a linear (squared-
    loss) bag-of-words model — the ENGINE-EXACT trainer.

    :func:`train_linear`'s LBFGS path is the production fit, but its float
    treeAggregate reductions are order-dependent, so its coefficients can
    never be value-checked across engines. This trainer trades optimizer
    sophistication for bit-exact replayability: weights live in integer
    micro-units, every gradient is an integer sum (associative in any
    partitioning), and the learning-rate division truncates toward zero on
    BOTH engines (Python trunc here == the CASE-emulated ``//`` in the q84
    oracle — DuckDB's ``//`` floors, Spark's ``div`` truncates, so neither
    raw operator is portable on signed values).

    Per iteration (classic full-batch GD on 1/2·Σ(pred−y·scale)²):

        pred_d = b + Σ_j cnt_dj·w_j          (exact micro units)
        grad_j = Σ_d cnt_dj·(pred_d − y_d·scale)
        w_j   -= trunc(grad_j / (n_docs·lr_div))

    The corpus work is distributed (two partial-aggregated shuffles per
    iteration over the bounded-vocab postings); only the V+1 weight cells
    round-trip the driver per iteration — the same driver-round shape as
    the BPE merge loop, bounded by vocab_size, never by corpus size.

    Vocabulary: top ``vocab_size`` terms by (doc_freq DESC, term ASC) with
    doc_freq >= min_doc_freq — a deterministic total order.

    Returns ``(weights_df, bias_micro)`` with weights_df =
    (term string, weight_micro bigint), one row per vocab term.
    """

    def _trunc_div(a: int, d: int) -> int:
        return a // d if a >= 0 else -((-a) // d)

    # Contract: empty tokens are FILTERED before counting. text.tokens keeps
    # Spark split(limit=-1) artifacts ('' for leading/trailing separators,
    # e.g. tokens('abc\n') == ['abc','']); a bag-of-words model must not see
    # a '' term in its vocabulary/doc-freqs, and the q84 oracle states the
    # same list_filter(x <> '') contract (plans/oracle_gen.py).
    labeled = df.select(
        F.col(id_col).alias("_id"),
        F.col(label_col).cast("int").alias("_y"),
        F.filter(tokens(F.col(text_col)), lambda t: t != F.lit("")).alias("_ts"),
    ).filter(F.col("_y").isNotNull() & F.col("_ts").isNotNull())
    posts = (
        labeled.select("_id", F.explode("_ts").alias("term"))
        .groupBy("_id", "term")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    dfreq = posts.groupBy("term").agg(F.count(F.lit(1)).alias("_df"))
    vocab = [
        r["term"]
        for r in dfreq.filter(F.col("_df") >= min_doc_freq)
        .orderBy(F.col("_df").desc(), F.col("term").asc())
        .limit(vocab_size)
        .collect()
    ]
    docs = labeled.select("_id", "_y").persist()
    n_docs = docs.count()
    spark = df.sparkSession
    if n_docs == 0 or not vocab:
        docs.unpersist()
        return spark.createDataFrame([], "term string, weight_micro bigint"), 0
    pv = posts.join(
        F.broadcast(spark.createDataFrame([(t,) for t in vocab], "term string")), "term"
    ).persist()
    pv.count()
    w = dict.fromkeys(vocab, 0)
    b = 0
    d = n_docs * lr_div
    for _ in range(iters):
        wdf = spark.createDataFrame(list(w.items()), "term string, w long")
        pred = (
            pv.join(F.broadcast(wdf), "term")
            .groupBy("_id")
            .agg(F.sum(F.col("cnt") * F.col("w")).alias("_s"))
        )
        errs = docs.join(pred, "_id", "left").select(
            "_id",
            (F.coalesce(F.col("_s"), F.lit(0)) + F.lit(b) - F.col("_y") * F.lit(scale)).alias(
                "_e"
            ),
        )
        grads = {
            r["term"]: r["g"]
            for r in pv.join(errs, "_id")
            .groupBy("term")
            .agg(F.sum(F.col("cnt") * F.col("_e")).alias("g"))
            .collect()
        }
        gb = errs.agg(F.sum("_e").alias("g")).first()["g"] or 0
        for t in vocab:
            w[t] -= _trunc_div(int(grads.get(t, 0)), d)
        b -= _trunc_div(int(gb), d)
    docs.unpersist()
    pv.unpersist()
    out = spark.createDataFrame(
        [(t, w[t]) for t in vocab], "term string, weight_micro bigint"
    )
    return out, b
