"""Distributed supervised training — batch gradient descent as DataFrame
aggregations (SURVEY.md §2 ext family: the "train a model ON the corpus"
capability that completes the k-means / BPE trio with a classifier).

The reference delegates all analytics to PostgreSQL and trains nothing;
an LLM-data pipeline at 100 TB trains quality classifiers over document
features constantly (fastText-style filters: label a slice, fit a linear
model, score the corpus). The Spark-first shape is exactly the pagerank /
exact-Lloyd discipline applied to gradient descent:

- one narrow pass computes per-row gradient contributions (pure IEEE
  column expressions — bit-identical in any engine);
- contributions quantize to integer micro-units with the tie-free
  ``floor(x*1e6 + 0.5)`` rule and SUM EXACTLY (order-free — the only
  aggregation in the loop, one map-side-combined shuffle per iteration);
- the weight update is one double division per coefficient.

The link function is the FAST SIGMOID ``p = 0.5 + z / (2*(1+|z|))``
(Georgiou's rational squashing, the classic cheap logistic substitute) —
chosen here not only for speed but because it is RATIONAL: unlike
``1/(1+exp(-z))`` there is no transcendental whose last-ulp libm-vs-JVM
divergence could leak into the weights, so the ENTIRE training loop is
bit-exact across engines and a SQL oracle can replay every iteration
(plans/registry_ext.py ext_lr_train).
"""

from __future__ import annotations

import pyspark.sql.functions as F

from ltss_spark.localrel import local_frame
from pyspark.sql import Column, DataFrame, Window


def _fast_sigmoid(z: Column) -> Column:
    """p = 0.5 + z / (2*(1+|z|)) — monotone, (0,1)-bounded, p(0)=0.5,
    and pure IEEE arithmetic (no exp): bit-identical in Spark and DuckDB
    when written with this exact operation order."""
    return F.lit(0.5) + z / (F.lit(2.0) * (F.lit(1.0) + F.abs(z)))


def logreg_train(
    docs: DataFrame,
    n_iters: int = 3,
    lr: float = 4.0,
    text_col: str = "text",
    label_col: str = "lang",
    pos_label: str = "en",
) -> DataFrame:
    """Train a 3-coefficient linear classifier (bias, chars/1000,
    tokens/100 -> is the document ``pos_label``?) by full-batch gradient
    descent and return the per-iteration trace
    (step, w0, w1, w2, train_acc).

    Per iteration: z = (w0*x0 + w1*x1) + w2*x2 per row (fixed
    association order — the cross-engine exactness contract), p =
    fast_sigmoid(z), per-coefficient gradient g_j = Σ floor((y-p)*x_j*1e6
    + 0.5) summed as exact LONGs, then w_j += lr * g_j / (N*1e6) — ONE
    shuffle (the 1-row aggregate) per iteration, weights fetched to the
    driver as three bounded scalars (the BPE-argmax adaptive-fetch
    exception) and re-broadcast as literals. Training accuracy is
    evaluated with the UPDATED weights ((p >= 0.5) == y, exact
    comparisons, one exact division) and FUSED into the next step's
    gradient aggregate — step k's accuracy uses w_k, the very weights
    step k+1 scores with, so one scan serves both and the whole fit is
    n_iters+1 actions (VERDICT r10 item 2; see _fit).

    At 100 TB: the feature pass is map-only; the gradient aggregate is
    map-side combined (32 partial rows per executor, 3 longs each); the
    loop is n_iters sequential 1-row shuffles — the same cost model as
    distributed LBFGS/SGD drivers, with none of the nondeterminism.
    """
    trace, _, _ = _fit(docs, n_iters, lr, text_col, label_col, pos_label)
    # local_frame: LocalTableScan, not a pickled-RDD scan (r12)
    return local_frame(
        docs.sparkSession,
        trace,
        "step int, w0 double, w1 double, w2 double, train_acc double",
    )


def _features(
    docs: DataFrame,
    text_col: str,
    label_col: str,
    pos_label: str,
    id_col: str | None = None,
) -> DataFrame:
    """The shared feature pass: y (is pos_label), bias, chars/1000,
    tokens/100 — pure column expressions, identical in the oracle."""
    from ltss_spark.operators.text import tokens

    cols = [F.col(id_col)] if id_col else []
    return docs.select(
        *cols,
        F.when(F.col(label_col) == pos_label, F.lit(1.0))
        .otherwise(F.lit(0.0))
        .alias("y"),
        F.lit(1.0).alias("x0"),
        (F.length(F.col(text_col)) / F.lit(1000.0)).alias("x1"),
        (F.size(tokens(F.col(text_col))) / F.lit(100.0)).alias("x2"),
    )


def _fit(
    docs: DataFrame,
    n_iters: int,
    lr: float,
    text_col: str,
    label_col: str,
    pos_label: str,
) -> tuple[list[tuple], list[float], DataFrame]:
    feats = _features(docs, text_col, label_col, pos_label).localCheckpoint(
        eager=False
    )

    def _p(w: list[float]):
        z = (
            F.lit(w[0]) * F.col("x0") + F.lit(w[1]) * F.col("x1")
        ) + F.lit(w[2]) * F.col("x2")
        return _fast_sigmoid(z)

    def _acc(p):
        return F.sum(
            F.when(
                (p >= F.lit(0.5)).cast("int") == F.col("y").cast("int"),
                F.lit(1),
            ).otherwise(F.lit(0))
        ).alias("acc")

    # Fused accuracy (VERDICT r10 item 2): step k's training accuracy is
    # evaluated with the UPDATED weights w_k — which are exactly the
    # weights step k+1's gradient pass scores with, over the same frame
    # and the same sigmoid expression. So the accuracy sum RIDES step
    # k+1's gradient aggregate (one scan, one 1-row shuffle serving
    # both), and only the final step needs a closing accuracy-only
    # aggregate: n_iters+1 actions total instead of 2*n_iters. The
    # accuracy is an exact integer count, so which action computes it
    # cannot change its value — the trace is bit-identical to the
    # unfused form (asserted via _FIT_ACTIONS in tests).
    global _FIT_ACTIONS
    _FIT_ACTIONS = 0
    w = [0.0, 0.0, 0.0]
    trace: list[tuple] = []
    pending: tuple[int, list[float]] | None = None
    n = 0
    for step in range(1, n_iters + 1):
        p = _p(w)
        q = [
            F.floor((F.col("y") - p) * F.col(f"x{j}") * F.lit(1e6) + F.lit(0.5))
            for j in range(3)
        ]
        aggs = [F.sum(q[j]).alias(f"g{j}") for j in range(3)] + [
            F.count(F.lit(1)).alias("n")
        ]
        if pending is not None:
            aggs.append(_acc(p))
        row = feats.agg(*aggs).collect()[0]  # bounded: <=5 scalars/iter
        _FIT_ACTIONS += 1
        n = row["n"]
        if n == 0:  # loud failure beats an opaque None-gradient TypeError
            raise ValueError("logreg: cannot train on an empty corpus")
        if pending is not None:
            ps, pw = pending
            trace.append((ps, pw[0], pw[1], pw[2], float(row["acc"]) / n))
        w = [
            w[j] + lr * float(row[f"g{j}"]) / (n * 1e6) for j in range(3)
        ]
        pending = (step, w)
    if pending is not None:
        # closing aggregate: the last step's accuracy with the final
        # weights (the one accuracy no later gradient pass can host)
        row = feats.agg(_acc(_p(w))).collect()[0]
        _FIT_ACTIONS += 1
        ps, pw = pending
        trace.append((ps, pw[0], pw[1], pw[2], float(row["acc"]) / n))
    return trace, w, feats


#: action count of the most recent _fit call — the job-count receipt for
#: the fused accuracy pass (n_iters + 1, not 2*n_iters); test-only.
_FIT_ACTIONS = 0


def logreg_score(
    docs: DataFrame,
    n_iters: int = 3,
    lr: float = 4.0,
    text_col: str = "text",
    id_col: str = "doc_id",
    label_col: str = "lang",
    pos_label: str = "en",
) -> DataFrame:
    """The APPLY half of :func:`logreg_train`: fit the same classifier,
    then score EVERY document with the final weights — (doc_id, score,
    keep), the fastText-style quality-filter pass a pipeline runs over
    the whole corpus. Scoring is one map-only expression pass (z in the
    pinned association order, rational fast-sigmoid); ``score`` is the
    raw exact double (no rounding needed — every input op is IEEE-
    deterministic), ``keep`` = score >= 0.5."""
    _, w, _ = _fit(docs, n_iters, lr, text_col, label_col, pos_label)
    f = _features(docs, text_col, label_col, pos_label, id_col=id_col)
    z = (
        F.lit(w[0]) * F.col("x0") + F.lit(w[1]) * F.col("x1")
    ) + F.lit(w[2]) * F.col("x2")
    p = _fast_sigmoid(z)
    return f.select(
        F.col(id_col),
        p.alias("score"),
        (p >= F.lit(0.5)).alias("keep"),
    )


def nb_train(
    docs: DataFrame,
    text_col: str = "text",
    label_col: str = "lang",
) -> DataFrame:
    """Train a multinomial Naive Bayes token model over the corpus —
    the COUNTING complement to :func:`logreg_train`'s gradient descent
    (fastText-style language/quality classifiers are usually NB or
    linear; a pipeline wants both). Returns the full model table
    ``(label, token, c, llq)`` where ``llq`` is the add-one-smoothed
    token log-likelihood ln((c+1)/(t_label+V)) quantized to tie-free
    integer micro-units (``floor(x*1e6 + 0.5)`` — the Lloyd/pagerank
    discipline), so every downstream score is an EXACT BIGINT sum.

    Composition: one token explode -> one (label, token) hash aggregate
    (the only O(|tokens|) shuffle) -> per-label totals and the vocab
    size derive from the count table itself (checkpointed once) and
    join back as broadcasts. At 100 TB the model table is O(V x C) —
    bounded by vocabulary x label count, not corpus size.
    """
    from ltss_spark.operators.text import tokens

    toks = docs.select(
        F.col(label_col).alias("label"),
        F.explode(tokens(F.col(text_col))).alias("token"),
    ).filter(F.col("token") != "")
    ct = (
        toks.groupBy("label", "token")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint(eager=False)  # feeds totals, vocab, AND the output
    )
    totals = ct.groupBy("label").agg(F.sum("c").alias("t"))
    vocab = ct.select("token").distinct().agg(F.count(F.lit(1)).alias("v"))
    llq = F.floor(
        F.log(
            (F.col("c") + F.lit(1)).cast("double") / (F.col("t") + F.col("v"))
        )
        * F.lit(1e6)
        + F.lit(0.5)
    ).cast("long")
    return (
        ct.join(F.broadcast(totals), "label")
        .crossJoin(F.broadcast(vocab))
        .select("label", "token", "c", llq.alias("llq"))
    )


def _nb_scored(
    docs: DataFrame,
    text_col: str,
    label_col: str,
    id_col: str,
    broadcast_model: bool = True,
) -> DataFrame:
    """Shared NB scoring pass: ``(doc_id, true_label, pred, score_micro)``.

    Every document scores against EVERY class: score(d, k) = prior_q(k)
    + Σ_matched llq(k, token) + (n_tokens − n_matched) · unseen_llq(k),
    where ``unseen_llq(k)`` = ln(1/(t_k+V)) is the add-one mass for a
    token class k never saw. The unseen term is ARITHMETIC, not a left
    join: one inner token→model match (fan-out ≤ C rows per occurrence)
    plus a per-(doc, class) count is exactly equivalent to left-joining
    every (occurrence × class) pair — and |matched| rows instead of
    |occurrences| × C flow through the shuffle. Every leaf quantizes to
    tie-free integer micro-units (``floor(x*1e6 + 0.5)``), so scores are
    exact BIGINT sums, order-free across engines. ``pred`` is the argmax
    class with ascending-label tie-break (one row_number window per
    doc).

    Scale shape: model and per-class constants are O(V x C)-bounded
    broadcasts; scoring is one map-side match, one (doc, class) hash
    aggregate, one per-doc window. ``broadcast_model=False`` routes the
    Zipf-keyed token match through
    :func:`~ltss_spark.operators.skew.hot_key_guarded_join` instead —
    the 100 TB posture when V x C outgrows the broadcast threshold
    (value-identical; a pytest pins both paths equal).

    Conventions (mirrored exactly by the oracle): token-less documents
    produce NO row — the same length-floor convention as the LM scorers
    (bigram_logprob) — and a class whose training text is entirely
    empty never becomes a candidate (it has no totals row, hence no
    prior/unseen constants).
    """
    from ltss_spark.operators.text import tokens

    model = nb_train(docs, text_col, label_col).localCheckpoint(eager=False)
    totals = model.groupBy("label").agg(F.sum("c").alias("t"))
    vocab = model.select("token").distinct().agg(F.count(F.lit(1)).alias("v"))
    nd = docs.groupBy(F.col(label_col).alias("label")).agg(
        F.count(F.lit(1)).alias("n_label")
    )
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    # one row per class: prior log + unseen-token log mass, micro-units
    classes = (
        nd.join(totals, "label")
        .crossJoin(F.broadcast(vocab))
        .crossJoin(F.broadcast(n_docs))
        .select(
            "label",
            F.floor(
                F.log(F.col("n_label").cast("double") / F.col("n_docs"))
                * F.lit(1e6)
                + F.lit(0.5)
            )
            .cast("long")
            .alias("prior_q"),
            F.floor(
                F.log(F.lit(1.0) / (F.col("t") + F.col("v")))
                * F.lit(1e6)
                + F.lit(0.5)
            )
            .cast("long")
            .alias("unseen_llq"),
        )
    )
    toks = docs.select(
        F.col(id_col),
        F.col(label_col).alias("true_label"),
        F.explode(tokens(F.col(text_col))).alias("token"),
    ).filter(F.col("token") != "").localCheckpoint(eager=False)
    n_toks = toks.groupBy(id_col, "true_label").agg(
        F.count(F.lit(1)).alias("n_tokens")
    )
    if broadcast_model:
        matched = toks.join(F.broadcast(model), "token")
    else:
        from ltss_spark.operators.skew import hot_key_guarded_join

        token_counts = model.groupBy("token").agg(F.sum("c").alias("c"))
        matched = hot_key_guarded_join(
            toks,
            model,
            ["token"],
            salt_src=F.col(id_col),
            count_col="c",
            stats_of=token_counts,
            cache_key_frame=docs,
            cache_tag=f"nb.model:{text_col}:{label_col}:{id_col}",
        )
    ms = matched.groupBy(id_col, "label").agg(
        F.sum("llq").alias("ms"), F.count(F.lit(1)).alias("mc")
    )
    # merge hint: BOTH sides of the (doc, class) join are corpus-sized,
    # and ms derives from checkpointed RDDs whose static size estimate is
    # a width-ratio guess — the same estimate class that mis-broadcast the
    # OCCURRENCE frame in the token match above (16x probe: 16.5 s and an
    # OOM at default driver memory; fixed by the guard's measured pin).
    # A corpus-sized frame must never be a build side at 100 TB; SMJ here
    # is one linear co-shuffle on (doc, class).
    per_class = (
        n_toks.crossJoin(F.broadcast(classes))
        .join(ms.hint("merge"), [id_col, "label"], "left")
        .select(
            F.col(id_col),
            "true_label",
            "label",
            (
                F.col("prior_q")
                + F.coalesce(F.col("ms"), F.lit(0))
                + (F.col("n_tokens") - F.coalesce(F.col("mc"), F.lit(0)))
                * F.col("unseen_llq")
            ).alias("score_micro"),
        )
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("score_micro").desc(), F.col("label").asc()
    )
    return (
        per_class.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            F.col(id_col),
            "true_label",
            F.col("label").alias("pred"),
            "score_micro",
        )
    )


def nb_score(
    docs: DataFrame,
    text_col: str = "text",
    label_col: str = "lang",
    id_col: str = "doc_id",
    broadcast_model: bool = True,
) -> DataFrame:
    """The APPLY half of :func:`nb_train`: classify every document —
    ``(doc_id, pred, score_micro)`` where ``score_micro`` is the winning
    class's exact integer log-score (micro-units). See
    :func:`_nb_scored` for the determinism and scale contract."""
    return _nb_scored(docs, text_col, label_col, id_col, broadcast_model).select(
        id_col, "pred", "score_micro"
    )


def nb_confusion(
    docs: DataFrame,
    text_col: str = "text",
    label_col: str = "lang",
    id_col: str = "doc_id",
) -> DataFrame:
    """Training-set confusion matrix for the NB classifier —
    ``(true_label, pred, n)``: the evaluation a pipeline runs before
    trusting a language/quality filter. The true label rides through
    the scoring pass (no extra join back to the corpus); the matrix is
    one C x C-bounded hash aggregate over the per-doc argmax."""
    return (
        _nb_scored(docs, text_col, label_col, id_col)
        .groupBy("true_label", "pred")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def logreg_calibration(
    docs: DataFrame,
    n_iters: int = 3,
    lr: float = 4.0,
    n_bins: int = 10,
    text_col: str = "text",
    label_col: str = "lang",
    pos_label: str = "en",
) -> DataFrame:
    """Reliability diagram for the trained classifier — the third piece
    of the train/score/calibrate story a production quality filter
    needs before anyone trusts its threshold: scores bin into
    ``n_bins`` equal-width buckets and each bucket reports its size,
    mean predicted score, and empirical positive rate.

    One aggregation over the scored corpus. Determinism: the bin index
    is floor(score * n_bins) capped at n_bins-1 (score is an exact
    IEEE double, multiply+floor exact in both engines); the mean score
    quantizes each score to tie-free integer micro-units and divides
    the exact sum ONCE; the positive rate is an exact integer ratio."""
    _, w, _ = _fit(docs, n_iters, lr, text_col, label_col, pos_label)
    f = _features(docs, text_col, label_col, pos_label)
    z = (
        F.lit(w[0]) * F.col("x0") + F.lit(w[1]) * F.col("x1")
    ) + F.lit(w[2]) * F.col("x2")
    p = _fast_sigmoid(z)
    binc = F.least(
        F.floor(p * F.lit(float(n_bins))), F.lit(n_bins - 1).cast("bigint")
    ).cast("int")
    q = F.floor(p * F.lit(1e6) + F.lit(0.5))  # tie-free micro-units
    return (
        f.select(binc.alias("bin"), q.alias("q"), F.col("y"))
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            (F.sum("q").cast("double") / (F.count(F.lit(1)) * F.lit(1e6))).alias(
                "mean_score"
            ),
            (F.sum("y").cast("double") / F.count(F.lit(1))).alias("pos_rate"),
        )
    )
