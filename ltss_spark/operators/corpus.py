"""Corpus-management operators for training-data pipelines: benchmark
contamination checks, deterministic dataset splits, stratified sampling,
and intra-document repetition scoring.

Design for 100 TB:
- contamination is an inverted-index SEMI-join on the shingle key (one hash
  shuffle each side), never a doc x doc comparison; Spark can additionally
  inject a bloom-filter pushdown on the build side at runtime (AQE);
- splits and buckets are pure md5 expressions — no shuffle, no state, stable
  under re-runs and across engines (the split of a doc never depends on
  which other docs are present);
- stratified sampling is one window per stratum keyed by an md5 order — a
  single shuffle on the stratum key, deterministic survivors (no RNG whose
  result depends on partitioning);
- repetition stats are per-row array expressions — embarrassingly parallel,
  whole-stage codegen, zero shuffle.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from ltss_spark.operators.dedup import gram_windows, normalize_text, shingles


def _tokens(text_col):
    return F.split(normalize_text(text_col), " ")


def contamination(
    train: DataFrame,
    eval_docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
) -> DataFrame:
    """Per eval document: how much of it appears verbatim (k-gram level) in
    the training corpus — the standard benchmark-contamination test run
    before training. Returns (doc_id, n_shingles, n_contaminated,
    containment) where containment = contaminated / total shingles.

    Plan: distinct train shingles SEMI-join eval shingles on the shingle
    key, then one per-doc aggregation. Cost scales with |shingles|, not
    |train| x |eval|.
    """
    tr = shingles(train, text_col, id_col, k).select("shingle").distinct()
    ev = shingles(eval_docs, text_col, id_col, k)
    totals = ev.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_shingles"))
    hits = (
        ev.join(tr, "shingle", "left_semi")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_contaminated"))
    )
    return (
        totals.join(hits, "doc_id", "left")
        .select(
            "doc_id",
            "n_shingles",
            F.coalesce("n_contaminated", F.lit(0)).alias("n_contaminated"),
            F.round(
                F.coalesce("n_contaminated", F.lit(0)) / F.col("n_shingles"), 6
            ).alias("containment"),
        )
    )


def hash_split(
    docs: DataFrame,
    id_col: str = "doc_id",
    train_pct: int = 90,
    val_pct: int = 5,
) -> DataFrame:
    """Deterministic train/validation/test assignment by content-free id
    hash: bucket = first 4 hex chars of md5(id) mod 100. Pure expression —
    no shuffle, stable under re-runs, independent of corpus composition
    (adding documents never reassigns existing ones)."""
    bucket = (
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 4), 16, 10)
        .cast("long")
        % 100
    )
    split = (
        F.when(F.col("bucket") < train_pct, F.lit("train"))
        .when(F.col("bucket") < train_pct + val_pct, F.lit("validation"))
        .otherwise(F.lit("test"))
    )
    return docs.select(F.col(id_col), bucket.alias("bucket")).select(
        id_col, "bucket", split.alias("split")
    )


def stratified_sample(
    docs: DataFrame,
    stratum_col: str = "lang",
    id_col: str = "doc_id",
    fraction: float = 0.2,
) -> DataFrame:
    """Deterministic per-stratum sample: within each stratum, order rows by
    md5(id) (a stable pseudo-random order) and keep ceil(n * fraction).
    Exactly reproducible across engines and cluster layouts — unlike
    ``df.sample``, whose output depends on partitioning. One shuffle (the
    stratum window)."""
    w = Window.partitionBy(stratum_col).orderBy(
        F.md5(F.col(id_col).cast("string")), F.col(id_col)
    )
    n = F.count(F.lit(1)).over(Window.partitionBy(stratum_col))
    return (
        docs.select(
            F.col(id_col),
            F.col(stratum_col),
            F.row_number().over(w).alias("sample_rank"),
            F.ceil(n * F.lit(fraction)).cast("long").alias("quota"),
        )
        .filter(F.col("sample_rank") <= F.col("quota"))
        .select(id_col, stratum_col, "sample_rank")
    )


def repetition_stats(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
) -> DataFrame:
    """Intra-document repetition (the Gopher/RefinedWeb quality signal):
    fraction of duplicate k-grams inside each document. Returns (doc_id,
    n_grams, n_distinct, rep_ratio). Per-row array expressions only — no
    shuffle, no explode. Tokens are materialized in a first projection so
    the shared gram builder reads them in place (dedup.gram_windows)."""
    return docs.select(
        F.col(id_col).alias("doc_id"), _tokens(F.col(text_col)).alias("__toks")
    ).select("doc_id", gram_windows("__toks", k).alias("__g")).select(
        "doc_id",
        F.size("__g").alias("n_grams"),
        F.size(F.array_distinct("__g")).alias("n_distinct"),
        F.round(
            1 - F.size(F.array_distinct("__g")) / F.size("__g"), 6
        ).alias("rep_ratio"),
    ).filter(F.col("n_grams") > 0)


def incremental_dedup(
    new_docs: DataFrame,
    seen_fps: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Dedup a NEW batch against an existing corpus index — the production
    operating mode at 100 TB: the historical corpus is represented only by
    its fingerprint set (one md5 per doc, maintained incrementally), never
    re-scanned. Two steps, each one shuffle:
    1. intra-batch: keep the min-id doc per fingerprint within the batch;
    2. cross-corpus: anti-join batch fingerprints against the seen set.
    Returns surviving (doc_id, fp) — the rows to append to both the corpus
    and the fingerprint index."""
    from ltss_spark.operators.dedup import normalize_text

    fp = F.md5(normalize_text(F.col(text_col)))
    batch = new_docs.select(F.col(id_col).alias("doc_id"), fp.alias("fp"))
    intra = batch.groupBy("fp").agg(F.min("doc_id").alias("doc_id"))
    return intra.join(
        seen_fps.select("fp"), "fp", "left_anti"
    ).select("doc_id", "fp")


def quality_filter(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_tokens: int = 50,
    max_rep_ratio: float = 0.2,
    min_stopword_ratio: float = 0.01,
) -> DataFrame:
    """Composed keep/drop decision with an explicit reject reason — the
    C4/RefinedWeb-style filter chain as ONE projection pass (no shuffle):
    too-short, too-repetitive (duplicate 3-grams), or stopword-free
    (gibberish signal). First failing rule names the reason; survivors get
    reason 'kept'. Every signal is a column expression on the same row, so
    the filter costs one scan regardless of how many rules stack; tokens
    and the gram array are materialized in staged projections so neither is
    rebuilt per reference (dedup.gram_windows)."""
    from ltss_spark.operators.text import stopword_ratio, token_count

    t = F.col(text_col)
    staged = docs.select(
        F.col(id_col).alias("doc_id"),
        token_count(t).alias("n_tokens"),
        F.round(stopword_ratio(t), 6).alias("stopword_ratio"),
        _tokens(t).alias("__toks"),
    ).select(
        "doc_id",
        "n_tokens",
        "stopword_ratio",
        gram_windows("__toks", 3).alias("__g"),
    )
    rep = F.round(
        F.when(
            F.size("__g") > 0,
            1 - F.size(F.array_distinct("__g")) / F.size("__g"),
        ).otherwise(F.lit(1.0)),
        6,
    )
    reason = (
        F.when(F.col("n_tokens") < min_tokens, F.lit("too_short"))
        .when(F.col("rep_ratio") > max_rep_ratio, F.lit("repetitive"))
        .when(F.col("stopword_ratio") < min_stopword_ratio, F.lit("no_stopwords"))
        .otherwise(F.lit("kept"))
    )
    return staged.select(
        "doc_id", "n_tokens", rep.alias("rep_ratio"), "stopword_ratio"
    ).select(
        "doc_id",
        "n_tokens",
        "rep_ratio",
        "stopword_ratio",
        reason.alias("reason"),
        (reason == "kept").alias("keep"),
    )


def pack_sequences(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    stratum_col: str = "lang",
    context_tokens: int = 2048,
) -> DataFrame:
    """Deterministic sequence packing: assign documents to fixed-size
    training bins of ``context_tokens`` by running-cumsum in a stable
    md5 pseudo-random order WITHIN each stratum. bin_id = floor(cumsum /
    context), offset = cumsum - n_tokens - bin start. One window per
    stratum (single shuffle on the stratum key) — no global sort; the
    greedy-sequential packer this approximates cannot scale past one node,
    while the cumsum formulation is a textbook parallel prefix. Documents
    longer than the context are flagged (would be split downstream)."""
    from ltss_spark.operators.text import token_count

    toks = token_count(F.col(text_col))
    w = (
        Window.partitionBy(stratum_col)
        .orderBy(F.md5(F.col(id_col).cast("string")), F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(stratum_col).alias("stratum"),
        toks.alias("n_tokens"),
        F.sum(toks).over(w).alias("cum"),
    )
    return base.select(
        "doc_id",
        "stratum",
        "n_tokens",
        F.floor((F.col("cum") - F.col("n_tokens")) / context_tokens).alias("bin_id"),
        ((F.col("cum") - F.col("n_tokens")) % context_tokens).alias("bin_offset"),
        (F.col("n_tokens") > context_tokens).alias("oversize"),
    )


def mixture_sample(
    docs: DataFrame,
    weights: dict[str, float],
    stratum_col: str = "lang",
    id_col: str = "doc_id",
    total: int = 1000,
) -> DataFrame:
    """Domain-mixture resampling: select ~``total`` documents so stratum s
    contributes ``floor(weights[s] * total)`` rows — the data-mixing step
    that turns a raw crawl into a training mix with pinned domain/language
    proportions (the Pile/Dolma-style mixture table). Strata absent from
    ``weights`` contribute nothing; a stratum with fewer rows than its
    quota contributes everything it has (the shortfall is NOT redistributed
    — redistribution would make every stratum's selection depend on every
    other's census, breaking the property that adding documents to one
    domain never changes another domain's sample).

    Selection within a stratum is the md5(id) order — deterministic,
    engine-portable, independent of partitioning, and stable under corpus
    growth (a new document only enters if it hashes below the incumbent
    boundary). One shuffle (the per-stratum window); the weights table is a
    plan literal, never a join side.
    """
    quota = F.coalesce(
        *[
            c
            for s, w in sorted(weights.items())
            for c in (
                F.when(
                    F.col(stratum_col) == s, F.lit(int(w * total)).cast("long")
                ),
            )
        ],
        F.lit(0).cast("long"),
    )
    w = Window.partitionBy(stratum_col).orderBy(
        F.md5(F.col(id_col).cast("string")), F.col(id_col)
    )
    return (
        docs.select(
            F.col(id_col),
            F.col(stratum_col),
            F.row_number().over(w).alias("sample_rank"),
            quota.alias("quota"),
        )
        .filter(F.col("sample_rank") <= F.col("quota"))
        .select(id_col, stratum_col, "sample_rank", "quota")
    )


def chunk_documents(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_tokens: int = 64,
    overlap: int = 16,
) -> DataFrame:
    """Split documents into fixed-size token windows with overlap — the
    context-window chunker every training/RAG pipeline runs before
    tokenizer packing (the sibling of :func:`pack_sequences`, which bins
    whole documents; this op splits the oversize ones).

    Chunk k covers tokens [k*stride, k*stride + chunk_tokens) with
    stride = chunk_tokens - overlap; the LAST chunk may be shorter but
    every token is covered exactly once by construction
    (n_chunks = ceil((n - chunk)/stride) + 1, so the final window always
    reaches the end — no trailing fragment already fully covered by its
    predecessor).

    Scale shape: tokenize once, ``sequence`` + ``explode`` fan out the
    chunk index JVM-side, ``slice`` re-materializes each window — a
    single narrow pipeline, no shuffle at all (the explode multiplies
    rows ~n/stride, the same linear factor the output inherently has).
    """
    if overlap >= chunk_tokens:
        raise ValueError(f"overlap {overlap} must be < chunk_tokens {chunk_tokens}")
    from ltss_spark.operators.text import tokens

    stride = chunk_tokens - overlap
    toks = tokens(F.col(text_col))
    n = F.size(toks)
    n_chunks = F.when(n <= chunk_tokens, F.lit(1)).otherwise(
        F.ceil((n - F.lit(chunk_tokens)) / F.lit(stride)).cast("int") + 1
    )
    base = docs.select(
        F.col(id_col).alias("doc_id"), toks.alias("toks"), n.alias("n_tok"),
        n_chunks.alias("n_chunks"),
    ).filter(F.col("n_tok") >= 1)
    k = F.col("chunk_id")
    start = k * stride
    chunk = F.slice(F.col("toks"), start + 1, chunk_tokens)
    return base.select(
        "doc_id",
        "n_tok",
        F.explode(F.sequence(F.lit(0), F.col("n_chunks") - 1)).alias("chunk_id"),
        "toks",
    ).select(
        "doc_id",
        F.col("chunk_id").cast("int").alias("chunk_id"),
        start.cast("int").alias("start_tok"),
        F.size(chunk).cast("int").alias("chunk_len"),
        F.array_join(chunk, " ").alias("chunk_text"),
    )


def shuffle_shard(
    docs: DataFrame,
    id_col: str = "doc_id",
    n_shards: int = 8,
    seed: str = "ltss",
) -> DataFrame:
    """Deterministic global shuffle + sharding — the final step before
    training: break source-order correlations (a corpus arrives grouped
    by crawl/domain/time, and a model fed megabatches of one domain
    drifts) and emit stable shard/position assignments any worker can
    reproduce.

    The permutation key is md5(seed || id): uniform, engine-portable, and
    a pure function of the id — re-running on the same corpus gives the
    same assignment (no RNG state, no Spark-partition dependence); a
    different ``seed`` gives an independent permutation (epoch
    reshuffles). Shard = first md5 bytes mod n_shards (balanced to
    binomial fluctuation — how real training shards are split); position
    = rank of the key WITHIN the shard.

    Scale shape: ONE shuffle (the shard-partitioned window); no global
    total order anywhere — a single-reducer ``row_number() OVER (ORDER BY
    hash)`` would serialize the corpus through one task, which is exactly
    the plan-audit anti-pattern this form avoids. Output (id, shard, pos)
    is a metadata assignment; consumers writing shard-partitioned keep
    the join back to payloads shard-local.
    """
    key = F.md5(F.concat(F.lit(seed), F.lit("|"), F.col(id_col).cast("string")))
    shard = F.pmod(
        F.conv(F.substring(F.col("__k"), 1, 8), 16, 10).cast("long"),
        F.lit(n_shards),
    ).cast("int")
    w = Window.partitionBy("shard").orderBy(F.col("__k").asc(), F.col("id").asc())
    return (
        docs.select(F.col(id_col).alias("id"), key.alias("__k"))
        .withColumn("shard", shard)
        .withColumn("pos_in_shard", F.row_number().over(w))
        .select("id", "shard", "pos_in_shard")
    )


def importance_resample(
    docs: DataFrame,
    target_pred,
    text_col: str = "text",
    id_col: str = "doc_id",
    alpha: float = 0.5,
    quota_frac: float = 0.25,
) -> DataFrame:
    """DSIR-shaped importance resampling (Xie et al. 2023, "Data Selection
    for Language Models via Importance Resampling"): score every RAW
    document by how target-domain-like its token distribution is —
    the average token log-ratio ln(p_target / p_raw) under additively
    smoothed unigram models — and keep the top ``quota_frac`` of the raw
    pool by score. ``target_pred`` is a boolean Column marking the
    in-domain exemplars (they define p_target and are excluded from the
    output: the operator selects raw look-alikes, not the exemplars).

    Spark shape (one tokenize, two hash aggs, no UDFs):
    - the is-target flag rides THROUGH the token explode, so one
      aggregation yields both c_raw and c_target per token
      (``count_if`` — no second pass over the corpus);
    - model constants (token totals, vocabulary size, raw-pool size)
      are 1-row broadcast aggregates;
    - per-token log-ratios round to 6 decimals BEFORE the exact-decimal
      per-doc sum (the transcendental-determinism rule), one final
      division for the length-normalized score;
    - selection is an exact global rank over doc-level scores, computed
      DISTRIBUTED (operators/rank.distributed_row_number: range
      repartition -> per-partition row_number -> broadcast offset add) —
      no single-reducer window anywhere; at 100 TB the ~10^9 score rows
      rank through one range exchange + one partitioned window, all
      parallel. Exact rank keeps the selection frontier deterministic
      and oracle-checkable (an approx-quantile threshold would trade
      that for a ±epsilon quota).

    DSIR's Gumbel-noise resampling step is replaced by the deterministic
    top-quota rule (ties on doc_id): same selection pressure,
    engine-reproducible output — the same trade every sampler in this
    module makes.
    """
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        target_pred.cast("boolean").alias("is_target"),
        F.col(text_col).alias("__text"),
    )
    toks = (
        base.select(
            "doc_id", "is_target", F.explode(_tokens(F.col("__text"))).alias("token")
        )
        .filter(F.col("token") != "")
        .localCheckpoint(eager=False)
    )
    counts = toks.groupBy("token").agg(
        F.count(F.lit(1)).alias("c_raw"),
        F.count_if(F.col("is_target")).alias("c_t"),
    )
    consts = counts.agg(
        F.sum("c_raw").alias("t_raw"),
        F.sum("c_t").alias("t_t"),
        F.count(F.lit(1)).alias("v"),
    )
    p_t = (F.col("c_t") + F.lit(alpha)) / (F.col("t_t") + F.lit(alpha) * F.col("v"))
    p_raw = (F.col("c_raw") + F.lit(alpha)) / (
        F.col("t_raw") + F.lit(alpha) * F.col("v")
    )
    lr = F.round(F.log(p_t / p_raw), 6)
    scored = (
        toks.filter(~F.col("is_target"))
        .join(counts, "token")
        .crossJoin(F.broadcast(consts))
        .select("doc_id", lr.alias("lr"))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(
                F.sum(F.col("lr").cast("decimal(38,6)")).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("dsir_score"),
        )
    )
    from ltss_spark.operators.rank import distributed_row_number

    ranked = distributed_row_number(
        scored,
        [F.col("dsir_score").desc(), F.col("doc_id").asc()],
        out_col="rank",
    )
    # ranked is materialized inside distributed_row_number, so this 1-row
    # pool count re-reads executor blocks, not the whole score pipeline
    return (
        ranked.crossJoin(
            F.broadcast(ranked.agg(F.count(F.lit(1)).alias("__n_pool")))
        )
        .withColumn(
            "selected",
            F.col("rank") <= F.ceil(F.lit(quota_frac) * F.col("__n_pool")),
        )
        .select("doc_id", "n_tokens", "dsir_score", "rank", "selected")
    )


#: hash buckets for vocab_encode's two-level ranking pre-cut; the global
#: window sees at most _VOCAB_BUCKETS * vocab_size rows.
_VOCAB_BUCKETS = 64


def vocab_encode(
    docs: DataFrame,
    vocab_size: int = 1000,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Tokenize-to-ids — the step between cleaned text and a training
    shard: build a frequency-ranked vocabulary of the ``vocab_size`` most
    common tokens (ids 1..V by count DESC, token ASC; 0 = <unk>) and
    encode every document as its token-id sequence.

    Spark shape:
    - ONE tokenize; token counts come from one hash groupBy;
    - the vocabulary ranking is TWO-LEVEL so no stage ever sorts the open
      (corpus-sized) token set through one reducer: tokens first rank
      inside ``_VOCAB_BUCKETS`` hash buckets and only each bucket's top
      ``vocab_size`` survive — the global top-V is a subset of that union
      (every token above a winner globally is also above it inside its
      own bucket) — so the final global row_number orders at most
      BUCKETS*V rows, a constant, regardless of corpus size;
    - encoding is a BROADCAST left join of the exploded (doc, pos, token)
      frame against the vocabulary (KB-scale build side), OOV -> 0;
    - sequences reassemble ORDER-SAFELY by sorting each doc's collected
      (pos, id) structs — array order is part of the value, never left
      to shuffle arrival order (same rule as pack_sequences).

    At 100 TB the explode and re-collect are the honest costs (shuffle
    ∝ corpus tokens, the same volume any tokenizer pass moves); the
    vocabulary side stays bounded-by-constants and broadcast.
    """
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(_tokens(F.col(text_col))).alias("pos", "token"),
    ).filter(F.col("token") != "")
    counts = toks.groupBy("token").agg(F.count(F.lit(1)).alias("n"))
    bw = Window.partitionBy("__b").orderBy(
        F.col("n").desc(), F.col("token").asc()
    )
    cand = (
        counts.withColumn(
            "__b", F.pmod(F.hash("token"), F.lit(_VOCAB_BUCKETS))
        )
        .withColumn("__r", F.row_number().over(bw))
        .filter(F.col("__r") <= vocab_size)
        .drop("__b", "__r")
    )
    w = Window.orderBy(F.col("n").desc(), F.col("token").asc())
    vocab = (
        cand.select("token", F.row_number().over(w).alias("token_id"))
        .filter(F.col("token_id") <= vocab_size)
    )
    return (
        toks.join(F.broadcast(vocab), "token", "left")
        .select(
            "doc_id",
            "pos",
            F.coalesce(F.col("token_id"), F.lit(0)).cast("int").alias("tid"),
        )
        .groupBy("doc_id")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "tid"))),
                lambda s: s["tid"],
            ).alias("token_ids")
        )
        .select(
            "doc_id",
            "token_ids",
            F.size("token_ids").alias("n_tokens"),
            dsum_int("token_ids").alias("id_checksum"),
        )
    )


def token_budget_mix(
    docs: DataFrame,
    budget_tokens: int = 100_000,
    alpha: float = 0.5,
    source_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Temperature-scaled source mixing — the data-mixing step between a
    multi-source corpus and a training run (the Pile/LLaMA recipe): each
    source s gets a token quota ∝ t_s^alpha (alpha < 1 UPweights small
    sources relative to proportional sampling), and documents fill their
    source's quota in a deterministic pseudo-random order (md5(id) — the
    same stable-order rule as mixture_sample / sample_stratified, so the
    selection never depends on partitioning or RNG state).

    Returns every doc with (n_tokens, cum_tokens, quota_tokens, selected)
    so the mix is auditable, not just materialized.

    Spark shape (scale-safe at 100 TB):
    - per-doc token counts are a pure projection (size of the split — no
      explode: the token VOLUME never shuffles, only one long per doc);
    - per-source totals are one hash agg over |sources| groups; the
      quota frame is KB-scale and broadcast back;
    - the only window is PARTITIONED by source (the cumulative fill) —
      no global ordering anywhere. Skew note: a source holding most of
      the corpus makes its cumsum window the long pole; if that bites,
      range-split the source on the md5 order and prefix-offset the
      splits (the distributed_row_number pattern).
    - quota arithmetic rounds the weight to 6 decimals and multiplies
      under DECIMAL so engine-side float ulps cannot flip a floor()
      (the transcendental-determinism rule).
    """
    per_doc = docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(source_col).alias("source"),
        F.size(_tokens(F.col(text_col))).cast("bigint").alias("n_tokens"),
    )
    totals = per_doc.groupBy("source").agg(F.sum("n_tokens").alias("t_s"))
    z = totals.agg(F.sum(F.pow("t_s", F.lit(alpha))).alias("z"))
    quotas = (
        totals.crossJoin(F.broadcast(z))
        .select(
            "source",
            F.floor(
                F.round(F.pow("t_s", F.lit(alpha)) / F.col("z"), 6).cast(
                    "decimal(18,6)"
                )
                * F.lit(budget_tokens)
            )
            .cast("bigint")
            .alias("quota_tokens"),
        )
    )
    w = (
        Window.partitionBy("source")
        .orderBy(F.md5(F.col("doc_id").cast("string")), F.col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        per_doc.join(F.broadcast(quotas), "source")
        .withColumn("cum_tokens", F.sum("n_tokens").over(w))
        .select(
            "doc_id",
            "source",
            "n_tokens",
            "cum_tokens",
            "quota_tokens",
            (F.col("cum_tokens") <= F.col("quota_tokens")).alias("selected"),
        )
    )


def dsum_int(arr_col: str):
    """BIGINT sum of an int-array column (aggregate over the array, not
    the rows — deterministic, oracle-friendly)."""
    return F.aggregate(
        F.col(arr_col) if isinstance(arr_col, str) else arr_col,
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def corpus_drift(
    train: DataFrame,
    eval_docs: DataFrame,
    text_col: str = "text",
    k: int = 100,
) -> DataFrame:
    """Token-distribution drift between two corpus splits — the mixture
    -validation / train-eval-shift check run before training: are the
    eval split's token frequencies the train split's, and if not, WHICH
    tokens carry the gap (a new boilerplate template, a language slice
    missing from one side, a crawl-date topic shift).

    Per token: both raw counts, both micro-quantized frequencies
    (``p_micro = (c * 10^6) div N`` — the split's distribution on a
    fixed 10^-6 grid), the total-variation contribution
    ``|p_micro - q_micro|`` and the chi-square contribution
    ``(p-q)^2 div (p+q)`` (both of the QUANTIZED distributions — sums
    over the full result are the corpus-level TVD x 2e6 / chi-square
    x 1e6 up to per-token truncation < 1 micro-unit). Top ``k`` tokens
    by TVD contribution, ties on token ascending.

    Why these two divergences and not KL/JSD: they are RATIONAL in the
    counts — the whole pipeline is BIGINT arithmetic with floor
    divisions pinned in one order, so there is no ln() whose last-ulp
    disagreement between engines could flip a rank (the PMI rule). KL's
    ln adds nothing for drift TRIAGE: the per-token ordering of "who
    moved most" is what feeds the curation decision.

    Plan shape: the two splits are UNION'd under a 0/1 split tag so the
    whole comparison is ONE tokenize pass and ONE hash aggregate on the
    token key (conditional sums produce both per-split counts in the
    same operator — a token missing from one split gets its 0 there, so
    no full-outer vocab join exists at all; map-side partial combine
    absorbs zipfian hot tokens before the single exchange). The
    vocab-sized count frame is checkpointed so the bounded 1-row totals
    aggregate does not rescan the corpus; totals broadcast in, then
    TakeOrderedAndProject. One corpus scan, one token-key exchange,
    vocab-sized state from there on — at 100 TB the scan dominates and
    nothing else grows.
    """
    zero = F.lit(0).cast("long")
    tagged = train.select(
        F.col(text_col).alias("__text"), F.lit(0).alias("__split")
    ).unionAll(
        eval_docs.select(
            F.col(text_col).alias("__text"), F.lit(1).alias("__split")
        )
    )
    counts = (
        tagged.select(
            F.explode(_tokens(F.col("__text"))).alias("token"), "__split"
        )
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(
            F.sum(F.when(F.col("__split") == 0, 1).otherwise(0))
            .cast("long")
            .alias("c_train"),
            F.sum(F.when(F.col("__split") == 1, 1).otherwise(0))
            .cast("long")
            .alias("c_eval"),
        )
        .localCheckpoint(eager=False)  # feeds the quantization AND totals
    )
    totals = counts.agg(
        F.coalesce(F.sum("c_train"), zero).alias("n1"),
        F.coalesce(F.sum("c_eval"), zero).alias("n2"),
    )
    quant = (
        counts.crossJoin(F.broadcast(totals))
        .select(
            "token",
            "c_train",
            "c_eval",
            F.expr(
                "CASE WHEN n1 > 0 THEN (c_train * 1000000L) div n1 ELSE 0L END"
            ).alias("p_micro"),
            F.expr(
                "CASE WHEN n2 > 0 THEN (c_eval * 1000000L) div n2 ELSE 0L END"
            ).alias("q_micro"),
        )
    )
    return (
        quant.select(
            "token",
            "c_train",
            "c_eval",
            "p_micro",
            "q_micro",
            F.abs(F.col("p_micro") - F.col("q_micro")).alias("drift_micro"),
            F.expr(
                "CASE WHEN p_micro + q_micro > 0 THEN"
                " ((p_micro - q_micro) * (p_micro - q_micro))"
                " div (p_micro + q_micro) ELSE 0L END"
            ).alias("chi2_micro"),
        )
        .orderBy(F.col("drift_micro").desc(), F.col("token").asc())
        .limit(k)
    )
