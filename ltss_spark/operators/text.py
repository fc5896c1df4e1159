"""Text-analysis operators for training-data pipelines (driver-mandated
extensions, BASELINE.json north_star; SURVEY.md §2.C ext_text_stats).

All pure column expressions (whole-stage codegen, no Python in the path).
Token model: whitespace split (the corpus is synthetic space-separated
words); a BPE-ish regex token count is provided alongside.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from ltss_spark.localrel import local_frame
from pyspark.sql import Column, DataFrame, Window

from ltss_spark.functions.numeric import davg
from ltss_spark.operators.dedup import normalize_text
from ltss_spark.operators.skew import hot_key_guarded_join

#: tiny English stopword list for quality scoring (public/ubiquitous)
STOPWORDS = ("the", "a", "an", "and", "or", "of", "to", "in", "is", "it")


def tokens(col: Column) -> Column:
    return F.split(normalize_text(col), " ")


def token_count(col: Column) -> Column:
    return F.size(tokens(col))


def bpe_ish_token_count(col: Column) -> Column:
    """Approximate subword count: split on word boundaries and digits —
    a deterministic stand-in for a BPE tokenizer (no tokenizer lib in the
    container)."""
    return F.size(
        F.filter(F.split(col, r"[^A-Za-z0-9]+|(?<=[a-z])(?=[A-Z])"), lambda t: t != "")
    )


def stopword_ratio(col: Column) -> Column:
    toks = tokens(col)
    n_stop = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS)))
    return F.round(n_stop / F.size(toks), 6)


def quality_score(col: Column) -> Column:
    """Heuristic document quality in [0,1]: rewards mid-length docs and
    normal word lengths, penalizes stopword-free (keyword-spam-like) text.
    Deterministic arithmetic only — oracle-expressible."""
    n_tok = token_count(col)
    # subtract the n_tok-1 separator spaces: length/n_tok would be the true
    # average word length + ~1, silently shifting the documented 3-10 band
    avg_word = (F.length(normalize_text(col)) - (n_tok - 1)).cast("double") / n_tok
    len_score = F.least(n_tok / F.lit(100.0), F.lit(1.0))
    word_score = F.when((avg_word >= 3) & (avg_word <= 10), F.lit(1.0)).otherwise(F.lit(0.5))
    stop_score = F.least(stopword_ratio(col) * 5, F.lit(1.0))
    return F.round((len_score + word_score + stop_score) / 3, 6)


def language_guess(col: Column) -> Column:
    """N-gram-free language-ID heuristic: marker-word votes. (The corpus
    carries a ground-truth ``lang`` column; this exercises the classify-
    by-content pattern and is validated against that column in tests.)"""
    toks = tokens(col)
    votes = {
        "en": ("the", "and", "of"),
        "de": ("der", "die", "und"),
        "es": ("el", "la", "que"),
        "fr": ("le", "la", "et"),
    }
    counts = [
        (F.size(F.filter(toks, lambda t: t.isin(*words))), lang)
        for lang, words in votes.items()
    ]
    expr = F.lit("unknown")
    best = F.lit(0)
    for cnt, lang in counts:
        expr = F.when(cnt > best, F.lit(lang)).otherwise(expr)
        best = F.greatest(best, cnt)
    return expr


def fingerprint(col: Column) -> Column:
    """Content fingerprint: md5 of the normalized text (portable across
    engines; used for exact dedup and multimodal payload identity)."""
    return F.md5(normalize_text(col))


def text_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-language corpus statistics over `documents`."""
    t = F.col(text_col)
    return (
        docs.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.length(t)).alias("total_chars"),
            davg(token_count(t).cast("double"), scale=2).alias("avg_tokens"),
            F.countDistinct("source").alias("n_sources"),
            F.min(F.length(t)).alias("min_chars"),
            F.max(F.length(t)).alias("max_chars"),
        )
    )


#: PII patterns, deliberately RE2-safe (no backrefs/lookaround) so the SAME
#: pattern strings run in Spark (java.util.regex) and DuckDB (RE2) — the
#: redaction is oracle-checkable. Order matters: emails contain dots that
#: the IP pattern must not see first.
PII_PATTERNS = (
    ("EMAIL", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    # country code OPTIONAL: the mandatory 1-2 digit prefix left plain
    # 3-3-4 numbers ("555-123-4567", the most common US written form)
    # unredacted (r12 self-review); non-capturing so extract_all keeps
    # returning whole matches in both engines
    ("PHONE", r"(?:\+?[0-9]{1,2}[- ])?[0-9]{3}[- ][0-9]{3}[- ][0-9]{4}"),
    ("IP", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"),
)


def pii_redact(col: Column) -> Column:
    """Replace emails, phone numbers, and IPv4 addresses with typed
    placeholder tokens ([EMAIL], [PHONE], [IP]) — the standard scrub
    applied to web text before training. Pure regexp_replace chain: JVM
    codegen, shuffle-free, linear in text size at any scale."""
    out = col
    for tag, pat in PII_PATTERNS:
        out = F.regexp_replace(out, pat, f"[{tag}]")
    return out


def pii_counts(col: Column) -> dict[str, Column]:
    """Per-type PII match counts (audit signal for the scrub)."""
    return {
        f"n_{tag.lower()}": F.regexp_count(col, F.lit(pat))
        for tag, pat in PII_PATTERNS
    }


def tfidf_topk(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    min_hot_rows: int = 2_000_000,
    skew_decision: dict | None = None,
) -> DataFrame:
    """Top-k characteristic terms per document by TF-IDF — the classic
    keyword/feature extraction pass of a corpus pipeline.

    Composition: explode tokens -> per-(doc, token) count (TF) -> token
    document frequency from the SAME aggregate (one row per doc-token
    pair, so COUNT(*) over token == DF) -> idf = ln((N+1)/(df+1))
    (smoothed) -> per-doc top-k window over the counted (already small)
    side. Two hash aggregations + one window; shuffle volume is bounded by
    |doc-token pairs|, with map-side combine collapsing repeated tokens
    inside a document before the wire. The corpus size N joins in as a
    broadcast 1-row aggregate, never a driver round trip.

    Scores are rounded to 6 decimals BEFORE ranking so the rank order is
    engine-independent (ln is transcendental; libm vs StrictMath may
    differ in the last ulp), with the token string as the tie-break.

    Skew guard (VERDICT r8 item 5): the score join's key is the token —
    Zipf-distributed, so at corpus scale the hottest token's rows exceed
    any single reduce task. The join routes through
    :func:`~ltss_spark.operators.skew.hot_key_guarded_join`: the
    already-computed df aggregate doubles as the heavy-hitter pre-flight
    (one 1-row agg, no extra scan), and above the threshold the join
    salts automatically — value-identical either way.
    """
    toks = docs.select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("token")
    ).filter(F.col("token") != "")
    # lazy localCheckpoint: the tf aggregate feeds BOTH the score join and
    # the document-frequency aggregate, and Catalyst does not reuse the
    # subplan — without this the tokenize+explode+agg (the dominant cost)
    # runs twice per action
    tf = (
        toks.groupBy(id_col, "token")
        .agg(F.count(F.lit(1)).alias("tf"))
        .localCheckpoint(eager=False)
    )
    df_counts = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    n_docs = docs.agg(F.countDistinct(id_col).alias("n_docs"))
    scored = (
        hot_key_guarded_join(
            tf,
            df_counts,
            ["token"],
            salt_src=F.col(id_col),
            count_col="df",
            min_hot_rows=min_hot_rows,
            decision=skew_decision,
            cache_key_frame=docs,
            # fold the params that shape df_counts into the tag (ADVICE
            # r9): same docs frame + different text/id column must miss
            cache_tag=f"tfidf.df:{text_col}:{id_col}",
        )
        .crossJoin(F.broadcast(n_docs))
        .select(
            id_col,
            "token",
            "tf",
            "df",
            F.round(
                F.col("tf")
                * F.log((F.col("n_docs") + 1.0) / (F.col("df") + 1.0)),
                6,
            ).alias("score"),
        )
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("score").desc(), F.col("token").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
    )


def unigram_logprob(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_hot_rows: int = 2_000_000,
    skew_decision: dict | None = None,
) -> DataFrame:
    """Per-document average token log-probability under the CORPUS unigram
    language model — the cheap perplexity-style quality signal every
    training-data pipeline runs (low avg logprob = gibberish / rare-token
    soup; suspiciously high = boilerplate).

    Composition: token explode -> corpus unigram counts (one hash agg) ->
    join token occurrences back to their counts -> per-doc exact-decimal
    sum of per-token logprobs / token count. The corpus total joins as a
    broadcast 1-row aggregate. Shuffle volume: |token occurrences| once
    for the count, once for the scoring join — both linear, and the count
    join key (token) is Zipf-skewed: the scoring join routes through
    :func:`~ltss_spark.operators.skew.hot_key_guarded_join` (VERDICT r8
    item 5) — the per-token count frame doubles as the heavy-hitter
    pre-flight and the join salts automatically above the threshold,
    value-identical either way (below it, AQE's skew split still applies).

    Determinism: ln() is transcendental, so each PER-TOKEN logprob is
    rounded to 6 decimals first, then summed exactly (DECIMAL), then the
    single final division — order-insensitive across engines.
    """
    toks = docs.select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("token")
    ).filter(F.col("token") != "").localCheckpoint(eager=False)
    # tokenize ONCE: toks feeds the count aggregate and the scoring join,
    # and the corpus total derives from the counts (sum of c) instead of a
    # third pass over the exploded tokens
    counts = toks.groupBy("token").agg(F.count(F.lit(1)).alias("c"))
    total = counts.agg(F.sum("c").alias("t"))
    lp = F.round(F.log(F.col("c") / F.col("t")), 6)
    scored = (
        hot_key_guarded_join(
            toks,
            counts,
            ["token"],
            salt_src=F.col(id_col),
            count_col="c",
            min_hot_rows=min_hot_rows,
            decision=skew_decision,
            cache_key_frame=docs,
            # params shaping `counts` belong in the tag (ADVICE r9)
            cache_tag=f"unigram.c:{text_col}:{id_col}",
        )
        .crossJoin(F.broadcast(total))
        .select(F.col(id_col), lp.alias("lp"))
    )
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.round(
            F.sum(F.col("lp").cast("decimal(38,6)")).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("avg_logprob"),
    )


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    corpus_stats: tuple[int, float] | None = None,
) -> DataFrame:
    """BM25 document ranking for a bag-of-words query — the keyword
    retrieval baseline that sits beside the vector ANN operators in any
    training-data / RAG pipeline (Lucene's ranking function; the +1 idf
    variant so scores stay positive).

    Composition (all linear, term filter BEFORE the shuffle):
    explode tokens -> keep only query terms -> per-(doc, term) TF (one
    hash agg with map-side combine) -> per-term DF from the same frame ->
    corpus stats (N, avgdl as exact-decimal avg) as a broadcast 1-row
    aggregate -> per-pair score -> exact-decimal sum per doc -> top-k.
    Shuffle volume is |docs x query terms| at most, NOT |doc-token pairs|.

    Determinism for the oracle: idf (transcendental ln) is rounded to 8
    BEFORE use; each term contribution is rounded to 9 and summed as
    DECIMAL (order-free); the final score rounds to 6 with doc_id as the
    rank tie-break.

    Corpus stats (N, avgdl) need EVERY document, so by default they cost
    a second tokenize pass over the text column (pipelined, shuffle-free,
    1-row output — cheaper than materializing the tokenized corpus, which
    is the only single-pass alternative). A caller issuing many queries
    against one corpus should compute them once and pass
    ``corpus_stats=(n_docs, avgdl)`` — they are query-independent.
    """
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    toks = tokens(F.col(text_col))
    base = docs.select(
        F.col(id_col), F.size(toks).alias("dl"), F.explode(toks).alias("term")
    ).filter(F.col("term").isin(*query_terms))
    tf = (
        base.groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"), F.min("dl").alias("dl"))
        .localCheckpoint(eager=False)  # feeds both DF agg and score join
    )
    df_counts = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    if corpus_stats is not None:
        n_docs, avgdl = corpus_stats
        stats = docs.sparkSession.range(0, 1, 1, 1).select(
            F.lit(int(n_docs)).alias("n_docs"),
            F.lit(float(avgdl)).alias("avgdl"),
        )
    else:
        stats = docs.select(F.size(tokens(F.col(text_col))).alias("dl")).agg(
            F.count(F.lit(1)).alias("n_docs"),
            (
                F.sum(F.col("dl").cast("decimal(38,6)")).cast("double")
                / F.count(F.lit(1)).cast("double")
            ).alias("avgdl"),
        )
    idf = F.round(
        F.log(
            (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
        ),
        8,
    )
    contrib = F.round(
        idf
        * (
            F.col("tf")
            * (k1 + 1.0)
            / (F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl")))
        ),
        9,
    )
    scored = (
        tf.join(F.broadcast(df_counts), "term")
        .crossJoin(F.broadcast(stats))
        .groupBy(id_col)
        .agg(
            F.round(
                F.sum(contrib.cast("decimal(38,9)")).cast("double"), 6
            ).alias("score"),
            F.count(F.lit(1)).cast("int").alias("n_terms_matched"),
        )
    )
    # global top-k via orderBy().limit(k): Spark plans TakeOrdered —
    # per-partition partial top-k, then a k-row merge on the driver. A
    # row_number() window here would funnel EVERY matched doc through one
    # task; the rank window below runs over the k survivors only.
    top = scored.orderBy(F.col("score").desc(), F.col(id_col).asc()).limit(k)
    w = Window.orderBy(F.col("score").desc(), F.col(id_col).asc())
    return top.withColumn("rank", F.row_number().over(w).cast("int")).select(
        id_col, "score", "n_terms_matched", "rank"
    )


def token_topk_sketch(
    docs: DataFrame,
    k: int = 10,
    capacity: int = 100_000,
    text_col: str = "text",
) -> DataFrame:
    """Corpus-wide heavy-hitter tokens via the ``approx_top_k`` sketch —
    the 100 TB path beside the exact window rank: the sketch is a
    bounded-memory aggregate with a map-side partial phase, so the
    shuffle moves ONE ``capacity``-bounded sketch per partition instead
    of the |vocab| count rows the exact top-k groupBy shuffles (and it
    never materializes the tail of the token distribution at all).

    ``capacity`` is the exactness knob: with capacity >= |distinct
    tokens| the sketch degenerates to exact counts — which is how the
    registry entry stays hash-checkable against plain SQL — while a
    production run over an open vocabulary lowers it and accepts the
    sketch's approximation on the boundary ranks. The sketch's own
    ordering is undefined on count ties, so the result OVER-FETCHES 2k
    items and re-ranks deterministically (count DESC, token ASC) before
    cutting to k. KNOWN LIMIT (r12 self-review): the over-fetch makes
    boundary ties deterministic only while the tie group at rank k fits
    inside the 2k candidates — a tie group straddling the over-fetch
    boundary gets an engine-undefined membership (the sketch decides
    which tied tokens are returned at all). The registered entry's
    Zipfian fixture has no such straddle (its oracle has been hash-green
    every check); an open-vocabulary caller needing a hard determinism
    guarantee should use the exact ``token_topk`` instead."""
    sk = (
        docs.select(F.explode(tokens(F.col(text_col))).alias("token"))
        .filter(F.col("token") != "")
        .agg(
            F.expr(f"approx_top_k(token, {2 * k}, {capacity})").alias("tk")
        )
    )
    return (
        sk.select(F.explode("tk").alias("e"))
        .select(
            F.col("e.item").alias("token"),
            F.col("e.count").cast("long").alias("n"),
        )
        .orderBy(F.col("n").desc(), F.col("token").asc())
        .limit(k)
    )


def bigram_logprob(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    alpha: float = 0.5,
    min_hot_rows: int = 2_000_000,
    skew_decision: dict | None = None,
) -> DataFrame:
    """Per-document average bigram log-probability and perplexity under
    an add-``alpha`` smoothed CORPUS bigram LM — the CCNet-style
    perplexity quality filter, one modeling step up from
    :func:`unigram_logprob` (it penalizes improbable token SEQUENCES,
    not just rare tokens): p(w2|w1) = (c(w1,w2) + a) / (c(w1) + a*V),
    with V = number of distinct bigram prefixes.

    Composition, all linear in token occurrences: one tokenize pass ->
    zip_with adjacent-token structs -> explode to bigram occurrences
    (checkpointed once: the frame feeds the two count aggregates AND the
    scoring join) -> hash-agg bigram and prefix counts -> join
    occurrences back to both counts -> per-doc exact-decimal sum. V
    joins as a broadcast 1-row aggregate. The PREFIX join (single-token
    key, the more Zipf-skewed of the two) routes through
    :func:`~ltss_spark.operators.skew.hot_key_guarded_join` (VERDICT r8
    item 5): the prefix-count frame doubles as the heavy-hitter
    pre-flight and the join salts automatically above the threshold —
    value-identical either way; the bigram-key join's skew is quadratic-
    ally milder and stays with AQE. Documents with fewer than two tokens
    have no bigrams and drop out — score presence itself is a
    length-floor signal.

    Determinism: ln() is transcendental, so each per-bigram logprob is
    rounded to 6 BEFORE the exact DECIMAL sum (order-insensitive across
    engines); perplexity is exp(-avg) of the already-rounded average.
    """
    toks = docs.select(F.col(id_col), tokens(F.col(text_col)).alias("t"))
    pairs = F.zip_with(
        F.slice(F.col("t"), 1, F.size("t") - 1),
        F.slice(F.col("t"), 2, F.size("t") - 1),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )
    bg = (
        toks.select(F.col(id_col), F.explode(pairs).alias("p"))
        .select(F.col(id_col), F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
        .filter((F.col("w1") != "") & (F.col("w2") != ""))
        .localCheckpoint(eager=False)
    )
    c2 = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c2"))
    c1 = bg.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    v = c1.agg(F.count(F.lit(1)).alias("v"))
    lp = F.round(
        F.log((F.col("c2") + F.lit(alpha)) / (F.col("c1") + F.lit(alpha) * F.col("v"))),
        6,
    )
    scored = (
        hot_key_guarded_join(
            bg.join(c2, ["w1", "w2"]),
            c1,
            ["w1"],
            salt_src=F.col(id_col),
            count_col="c1",
            min_hot_rows=min_hot_rows,
            decision=skew_decision,
            cache_key_frame=docs,
            # params shaping `c1` belong in the tag (ADVICE r9)
            cache_tag=f"bigram.c1:{text_col}:{id_col}",
        )
        .crossJoin(F.broadcast(v))
        .select(F.col(id_col), lp.alias("lp"))
    )
    agg = scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.round(
            F.sum(F.col("lp").cast("decimal(38,6)")).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("avg_logprob"),
    )
    return agg.select(
        id_col,
        "n_bigrams",
        "avg_logprob",
        F.round(F.exp(-F.col("avg_logprob")), 4).alias("ppl"),
    )


def pmi_collocations(
    docs: DataFrame,
    text_col: str = "text",
    min_count: int = 5,
    k: int = 100,
) -> DataFrame:
    """Top-``k`` bigram collocations by pointwise mutual information —
    the corpus-analytics pass that surfaces multiword expressions
    ("new york", boilerplate phrases) for tokenizer vocab decisions and
    template detection in a training-data pipeline.

    PMI = ln(p(xy) / (p(x)·p(y))); ln is monotone, so the RANKING only
    needs the ratio c_xy·N / (c_x·c_y) — and that is computed ENTIRELY
    in integer arithmetic: score_micro = ((c_xy·10^6) div c_x · N) div
    c_y, two BIGINT floor-divisions pinned in this order in both
    engines (no ln, no doubles, no rounding hazard anywhere). Since
    c_xy ≤ c_x the first quotient is ≤ 10^6, so the widest
    intermediate is 10^6·N — overflow-safe to N ≈ 9·10^12 tokens;
    beyond that (the 100 TB regime) drop the multiplier to 10^3 or
    lift to decimal(38,0), same plan shape.

    Composition: one tokenize pass -> adjacent-pair explode (the
    bigram_logprob extraction) -> two hash aggregates (bigram counts,
    unigram counts) -> the ``min_count`` floor prunes the bigram table
    BEFORE its two vocabulary joins -> global top-k
    (TakeOrderedAndProject — per-partition heaps, never a full sort).
    Ties break on (w1, w2) ascending so the cut is engine-independent.

    The corpus total N and the vocabulary size come back as TWO bounded
    driver scalars from one aggregate over the unigram table (the
    BPE-argmax adaptive-fetch exception), and the vocab size picks the
    join strategy with the same measured cut as
    :func:`~ltss_spark.operators.skew.hot_key_guarded_join`: small
    vocabulary -> explicit broadcast of the count table; large ->
    explicit sort-merge (at 100 TB the unigram side outgrows any
    broadcast, and an unhinted join would leave the choice to static
    estimates that a checkpointed frame does not have).
    """
    from ltss_spark.operators.skew import (
        SMALL_COUNTS_BYTES,
        SMALL_COUNTS_ROWS,
        _est_row_bytes,
    )

    # tokenize ONCE behind a lazy checkpoint: the bigram explode and the
    # unigram explode both feed off `toks` — previously each re-ran the
    # normalize+split pipeline (the dominant scan cost) on its own scan
    # (r12 self-review; bigram_logprob set the pattern)
    toks = docs.select(tokens(F.col(text_col)).alias("t")).localCheckpoint(
        eager=False
    )
    pairs = F.zip_with(
        F.slice(F.col("t"), 1, F.size("t") - 1),
        F.slice(F.col("t"), 2, F.size("t") - 1),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )
    occ = toks.select(F.explode(F.col("t")).alias("token")).filter(
        F.col("token") != ""
    )
    c1 = occ.groupBy("token").agg(F.count(F.lit(1)).alias("c")).localCheckpoint(
        eager=False
    )  # feeds both word joins; N and |vocab| derive from it below
    stats = c1.agg(
        F.sum("c").alias("n"), F.count(F.lit(1)).alias("v")
    ).first()  # bounded: two scalars; materializes the checkpoint once
    n_tokens = int(stats["n"]) if stats and stats["n"] is not None else 0
    v_rows = int(stats["v"]) if stats else 0
    small = (
        v_rows <= SMALL_COUNTS_ROWS
        and v_rows * _est_row_bytes(c1.schema) <= SMALL_COUNTS_BYTES
    )

    def side(col_alias: str, cnt_alias: str):
        s = c1.select(
            F.col("token").alias(col_alias), F.col("c").alias(cnt_alias)
        )
        return F.broadcast(s) if small else s.hint("merge")

    c2 = (
        toks.select(F.explode(pairs).alias("p"))
        .select(F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
        .filter((F.col("w1") != "") & (F.col("w2") != ""))
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c2"))
        .filter(F.col("c2") >= min_count)
    )
    scored = (
        c2.join(side("w1", "cx"), "w1")
        .join(side("w2", "cy"), "w2")
        .select(
            "w1",
            "w2",
            "c2",
            F.expr(
                f"(c2 * 1000000L div cx) * {n_tokens}L div cy"
            ).alias("pmi_micro"),
        )
    )
    return scored.orderBy(
        F.col("pmi_micro").desc(), F.col("w1").asc(), F.col("w2").asc()
    ).limit(k)


def hybrid_rrf(
    lexical: DataFrame,
    dense: DataFrame,
    k: int = 10,
    c: int = 60,
    id_col: str = "doc_id",
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack/Clarke/Buettcher 2009) of a lexical
    ranking (BM25) and a dense ranking (embedding cosine) — the standard
    hybrid-retrieval merge in RAG / training-data curation: rrf(d) =
    Σ_lists 1/(c + rank_list(d)), robust to the two scorers' incomparable
    scales because only RANKS enter the sum.

    Inputs are two already-ranked frames each carrying (``id_col``,
    ``rank``); a doc missing from one list contributes 0 for it. Both
    rank sources are top-k bounded, so the fusion input is AT MOST
    |lex_k| + |dense_k| rows regardless of corpus size — every join/window
    here runs on a constant-sized frame; the corpus-scale work lives
    inside the two upstream retrievers, which are separately scale-shaped
    (bm25_topk: term-filtered TakeOrdered; cosine_topk: broadcast probe).

    Determinism: the two reciprocal terms are added in a FIXED expression
    order and rounded to 6 before ranking with id tie-break (same oracle
    contract as every scorer in this module).
    """
    lex = lexical.select(F.col(id_col), F.col("rank").alias("lex_rank"))
    den = dense.select(F.col(id_col), F.col("rank").alias("dense_rank"))
    fused = lex.join(den, id_col, "full")
    rrf = F.round(
        F.coalesce(
            F.lit(1.0) / (F.lit(c) + F.col("lex_rank")), F.lit(0.0)
        )
        + F.coalesce(
            F.lit(1.0) / (F.lit(c) + F.col("dense_rank")), F.lit(0.0)
        ),
        6,
    )
    scored = fused.select(
        id_col, "lex_rank", "dense_rank", rrf.alias("rrf_score")
    )
    top = scored.orderBy(F.col("rrf_score").desc(), F.col(id_col).asc()).limit(k)
    w = Window.orderBy(F.col("rrf_score").desc(), F.col(id_col).asc())
    return top.withColumn("rank", F.row_number().over(w).cast("int"))


def perplexity_buckets(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 3,
    keep_below: int = 2,
) -> DataFrame:
    """CCNet-style perplexity bucketing (Wenzek et al. 2020, "CCNet:
    Extracting High Quality Monolingual Datasets from Web Crawl Data"):
    score every document with the corpus bigram LM
    (:func:`bigram_logprob`), rank the corpus by perplexity ascending,
    and split into ``n_buckets`` equal rank slices — CCNet's
    head/middle/tail, where head = lowest perplexity = most fluent.
    Returns (doc_id, ppl, bucket, keep): bucket 0..n_buckets-1, keep =
    bucket < ``keep_below`` (CCNet trains on head+middle and drops tail).

    Bucket boundary is RANK-based, not value-based: floor((rank-1) *
    n_buckets / N) — deterministic under ties (rank breaks them by
    doc_id), engine-portable (no percentile interpolation to chase), and
    the buckets are equal-size by construction, which is the CCNet
    design (equal thirds per language).

    Scale shape: scoring is bigram_logprob's linear pipeline; the global
    rank is :func:`ltss_spark.operators.rank.distributed_row_number` —
    two-pass range partitioning above its measured threshold, so no
    corpus-sized single-reducer window; the total count joins as a
    broadcast 1-row aggregate. Docs with <2 tokens have no bigrams, no
    score, and no row (the same contract as bigram_logprob)."""
    from ltss_spark.operators.rank import distributed_row_number

    scored = bigram_logprob(docs, text_col, id_col).select(id_col, "ppl")
    ranked = distributed_row_number(
        scored, [F.col("ppl").asc(), F.col(id_col).asc()], out_col="__rn"
    )
    n = ranked.agg(F.count(F.lit(1)).alias("__n"))
    return (
        ranked.crossJoin(F.broadcast(n))
        .select(
            id_col,
            "ppl",
            F.floor(
                (F.col("__rn") - 1) * n_buckets / F.col("__n")
            ).cast("int").alias("bucket"),
        )
        .withColumn("keep", F.col("bucket") < keep_below)
    )


#: Below this many DISTINCT training words the merge loop replays
#: driver-side over the collected dictionary instead of running
#: n_merges argmax jobs (the operators/graph.py SMALL_GRAPH_EDGES
#: adaptive pattern). Rationale: each distributed iteration costs two
#: stages of fixed scheduling latency no matter how small the
#: dictionary (~0.25 s x 8 merges at sf0.1 over a FEW-ROW dictionary,
#: measured in BENCH_HISTORY), while 100k (word, n, sym) rows collect
#: in ~0.1 s and a few MB. The replay is the same integer argmax
#: (count desc, pair asc) and the same greedy left-to-right fold —
#: bit-identical by construction, pinned by
#: tests/test_operators.py::test_bpe_driver_path_bit_equal. At 100 TB
#: the dictionary is millions of distinct words and the provably
#: per-merge-bounded distributed loop runs unchanged.
SMALL_DICT_ROWS = 100_000


def _driver_bpe_fold(
    rows, n_merges: int
) -> tuple[list[tuple[int, str, str, int]], list[tuple[str, int, str]]]:
    """Exact BPE replay for a small dictionary: ``rows`` are collected
    (word, n, sym) records (bounded by SMALL_DICT_ROWS — vocabulary
    metadata, not a corpus collect). Same argmax and same greedy merge
    as the distributed loop, in plain Python integers/strings."""
    dic: list[tuple[str, int, list[str]]] = [
        (r["word"], int(r["n"]), r["sym"].split(" ")) for r in rows
    ]
    merges: list[tuple[int, str, str, int]] = []
    for step in range(1, n_merges + 1):
        counts: dict = {}
        for _, n, syms in dic:
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + n
        if not counts:
            break
        (a, b), c = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((step, a, b, int(c)))
        nxt = []
        for word, n, syms in dic:
            acc = syms[:1]
            for x in syms[1:]:
                if x == b and acc[-1] == a:
                    acc[-1] = a + b
                else:
                    acc.append(x)
            nxt.append((word, n, acc))
        dic = nxt
    return merges, [(w, n, " ".join(s)) for w, n, s in dic]


def bpe_train_merges(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_merges: int = 8,
    small_dict_rows: int = SMALL_DICT_ROWS,
    stats: dict | None = None,
) -> DataFrame:
    """Distributed BPE merge training (Sennrich et al. 2016, "Neural
    Machine Translation of Rare Words with Subword Units") — the
    tokenizer-training step of an LLM data pipeline, run the way
    production BPE trainers actually run: over the WORD-FREQUENCY
    DICTIONARY, never the raw corpus. One corpus scan builds
    (word, count); every merge iteration then works on the dictionary
    only — at 100 TB the corpus is petabytes but the dictionary is
    millions of rows, so per-merge cost is one explode + one hash
    aggregation over the vocabulary, independent of corpus size.

    Per iteration: adjacent symbol pairs (zip_with over the split symbol
    string, weighted by word count) -> hash-agg pair totals -> the
    argmax pair (count desc, then lexicographic — deterministic under
    ties) -> greedy left-to-right merge applied to every word via ONE
    string fold (``aggregate`` HOF: merge the pair wherever the
    accumulator's last symbol is ``lhs`` and the next symbol is ``rhs``
    — the standard BPE replace semantics, including the overlapping
    "a b a b" -> "ab ab" case a single-pass regex gets wrong). The
    argmax is a bounded 1-row driver fetch per iteration (the adaptive
    fetch exception: an inherently sequential training decision); the
    dictionary localCheckpoints per round so expression depth stays
    constant across iterations.

    Training words are restricted to ``^[a-z]+$`` after the module's
    shared normalization — symbols then never contain spaces, quotes,
    or LIKE/regex metacharacters, which keeps the fold expression and
    the cross-engine oracle replay exact. Returns the learned merge
    table (step, lhs, rhs, pair_count) — the artifact a tokenizer ships.

    Adaptive execution (the connected_components pattern): below
    ``small_dict_rows`` distinct training words the collected dictionary
    replays the SAME argmax+merge loop driver-side
    (:func:`_driver_bpe_fold`, bit-identical by construction) instead of
    paying ``n_merges`` rounds of fixed stage latency; pass
    ``small_dict_rows=0`` to force the distributed loop.
    """
    merges, _ = _bpe_train_fold(docs, text_col, n_merges, small_dict_rows, stats)
    # local_frame: LocalTableScan instead of a pickled-RDD scan (r12 —
    # every action on the merge table re-paid a Python-worker unpickle)
    return local_frame(
        docs.sparkSession, merges, "step int, lhs string, rhs string, pair_count long"
    )


def _bpe_train_fold(
    docs: DataFrame,
    text_col: str,
    n_merges: int,
    small_dict_rows: int = SMALL_DICT_ROWS,
    stats: dict | None = None,
) -> tuple[list[tuple[int, str, str, int]], DataFrame]:
    """Shared BPE fold: builds the [a-z]+ word-frequency dictionary, runs
    ``n_merges`` argmax+merge iterations, and returns BOTH artifacts —
    the merge list (what :func:`bpe_train_merges` ships) and the final
    dictionary frame (word, n, sym) whose ``sym`` is each word's
    space-joined subword segmentation (what :func:`bpe_encode_stats`
    joins back to the corpus)."""
    spark = docs.sparkSession
    words = (
        docs.select(F.explode(tokens(F.col(text_col))).alias("word"))
        .filter(F.col("word").rlike("^[a-z]+$"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    d = words.select(
        "word",
        "n",
        F.expr(
            "array_join(transform(sequence(1, length(word)), "
            "i -> substring(word, i, 1)), ' ')"
        ).alias("sym"),
    ).localCheckpoint(eager=False)
    if small_dict_rows:
        probe = d.limit(small_dict_rows + 1).collect()
        if len(probe) <= small_dict_rows:
            if stats is not None:
                stats["path"] = "driver-fold"
            merges, seg = _driver_bpe_fold(probe, n_merges)
            return merges, local_frame(
                spark, seg, "word string, n long, sym string"
            )
    if stats is not None:
        stats["path"] = "distributed"
    merges: list[tuple[int, str, str, int]] = []
    arr = F.col("__arr")
    for step in range(1, n_merges + 1):
        # hoist split(sym,' ') into ONE materialized array column per
        # step (VERDICT r10 item 4, the gram_windows CSE rule): Catalyst
        # does NOT CSE the repeated split here — the un-hoisted
        # physical plan carries 3 split() evaluations per row, the
        # hoisted one exactly 1 (CollapseProject declines to inline a
        # non-cheap expression referenced more than once; probed, see
        # docs/PLANS.md r11 BPE-CSE receipt)
        pairs = d.select("n", F.split(F.col("sym"), " ").alias("__arr")).select(
            "n",
            F.explode(
                F.zip_with(
                    F.slice(arr, 1, F.size(arr) - 1),
                    F.slice(arr, 2, F.size(arr) - 1),
                    lambda a, b: F.struct(a.alias("a"), b.alias("b")),
                )
            ).alias("p"),
        )
        top = (
            pairs.groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
            .agg(F.sum("n").alias("c"))
            .orderBy(F.col("c").desc(), F.col("a").asc(), F.col("b").asc())
            .limit(1)
            .collect()  # bounded: the 1-row argmax training decision
        )
        if not top:
            break
        a, b, c = top[0]["a"], top[0]["b"], top[0]["c"]
        merges.append((step, a, b, int(c)))
        # greedy left-to-right merge: fold the symbol list into a
        # space-joined string, merging wherever last==lhs and next==rhs.
        # Symbols are [a-z]+ so literal injection is quote/wildcard-safe.
        d = (
            d.select("word", "n", F.split(F.col("sym"), " ").alias("__arr"))
            .select(
                "word",
                "n",
                F.expr(
                    "aggregate("
                    "  slice(__arr, 2, size(__arr) - 1),"
                    "  element_at(__arr, 1),"
                    f"  (acc, x) -> CASE WHEN x = '{b}' AND"
                    f"    (acc = '{a}' OR acc LIKE '% {a}')"
                    f"    THEN concat(substring(acc, 1, length(acc) - {len(a)}),"
                    f"                '{a + b}')"
                    "    ELSE concat(acc, ' ', x) END"
                    ")"
                ).alias("sym"),
            )
            .localCheckpoint(eager=False)
        )
    return merges, d


def bpe_encode_stats(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_merges: int = 8,
    small_dict_rows: int = SMALL_DICT_ROWS,
    stats: dict | None = None,
) -> DataFrame:
    """The ENCODE half of the BPE pair: train ``n_merges`` merges on the
    corpus (shared fold with :func:`bpe_train_merges`), then tokenize
    every document against the learned segmentation — per doc,
    (n_tokens, n_subwords). This is the real token-budget measurement a
    training-data pipeline runs (bpe_ish_token_count is the cheap
    heuristic stand-in; this one uses an actual trained vocabulary).

    Scale shape: the trained dictionary carries each word's final
    segmentation, so encoding is ONE broadcast-or-shuffle equi-join of
    token occurrences against the dictionary (|occurrences| linear, key
    = word — Zipf-skewed, but the dictionary side is one row per word,
    so AQE's skew split suffices; no per-document iteration anywhere).
    Words outside the trained [a-z]+ alphabet count as one subword each
    (the single-token fallback). Training inherits
    :func:`bpe_train_merges`'s adaptive small-dictionary replay; the
    encode join is unchanged either way (the driver-path segmentation
    comes back as a local-relation dictionary frame, which Spark
    broadcasts outright)."""
    _, d = _bpe_train_fold(docs, text_col, n_merges, small_dict_rows, stats)
    seg = d.select(
        "word", F.size(F.split(F.col("sym"), " ")).cast("long").alias("n_sub")
    )
    toks = docs.select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("word")
    ).filter(F.col("word") != "")
    return (
        toks.join(seg, "word", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.sum(F.coalesce(F.col("n_sub"), F.lit(1)))
            .cast("long")
            .alias("n_subwords"),
        )
    )


def skipgram_counts(
    docs: DataFrame,
    text_col: str = "text",
    window: int = 3,
    min_weight: int = 5,
    k: int = 100,
) -> DataFrame:
    """Windowed skip-gram co-occurrence counts with linear distance decay
    — the word2vec/GloVe preprocessing pass (Mikolov et al. 2013): for
    every ordered token pair (w1, w2) with w2 at most ``window``
    positions to the right of w1, accumulate weight ``window + 1 - d``
    (distance d: adjacent pairs weigh ``window``, the farthest weigh 1).
    The embedding-training co-occurrence matrix, and — next to
    :func:`pmi_collocations`, which sees only ADJACENT pairs — the wider
    -context collocation surface.

    Plan shape: pair generation is a PER-ROW array expression (nested
    ``transform`` over the empty-compacted token array, the
    gram_windows/repetition_stats rule — no self-join on position, which
    would shuffle the exploded token table on doc_id twice), then ONE
    explode feeding ONE hash aggregate (map-side partial combine does
    the heavy lifting: the distinct-pair space is far smaller than the
    pair stream), the ``min_weight`` floor, and a global top-k via
    TakeOrderedAndProject (per-partition heaps, never a full sort).
    Exactly one shuffle — on the (w1, w2) key — at any scale.

    Determinism: weights are all-integer (no distance kernels in
    doubles), ties at the top-k cut break on (w1, w2) ascending.

    Empty tokens (double-space artifacts) are compacted OUT of the array
    BEFORE windowing, so a run of spaces does not widen the effective
    distance between surviving tokens — document this when comparing
    against the adjacent-bigram ops, which instead DROP pairs touching
    an empty slot.
    """
    t = F.filter(tokens(F.col(text_col)), lambda x: x != "")
    pairs = F.expr(
        f"""
        flatten(transform(tc, (x, i) ->
          transform(slice(tc, i + 2, {window}), (y, d) ->
            struct(x AS w1, y AS w2, CAST({window} - d AS BIGINT) AS wt))))
        """
    )
    return (
        docs.select(t.alias("tc"))
        .select(F.explode(pairs).alias("p"))
        .select("p.w1", "p.w2", "p.wt")
        .groupBy("w1", "w2")
        .agg(F.sum("wt").alias("weight"))
        .filter(F.col("weight") >= min_weight)
        .orderBy(F.col("weight").desc(), F.col("w1").asc(), F.col("w2").asc())
        .limit(k)
    )
