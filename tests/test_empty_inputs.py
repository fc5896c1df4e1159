"""Empty-input robustness: a 100 TB pipeline constantly meets empty
partitions, empty filters, and empty tables — composite operators must
return empty results, not crash (NULL bounds, empty sequences, empty
windows are the usual traps)."""

import pyspark.sql.functions as F


def _empty_states(spark):
    return spark.createDataFrame(
        [], "time timestamp, entity_id string, state string, attributes string, event_id long"
    )


def test_gapfill_empty(spark):
    from ltss_spark.functions.numeric import dsum
    from ltss_spark.operators.gapfill import time_bucket_gapfill, time_bucket_interpolate

    e = spark.createDataFrame([], "k string, ts timestamp, v double")
    assert time_bucket_gapfill(e, "ts", ["k"], dsum("v", 2), "1 day").count() == 0
    assert time_bucket_interpolate(e, "ts", ["k"], dsum("v", 2), "1 day").count() == 0


def test_asof_empty_sides(spark):
    from ltss_spark.operators.asof import asof_join, asof_join_forward

    probes = spark.createDataFrame([], "key string, ts timestamp, pid long")
    events = spark.createDataFrame([], "key string, ts timestamp, val double")
    assert asof_join(probes, events, on="ts", by="key", value_cols=["val"]).count() == 0
    assert (
        asof_join_forward(probes, events, on="ts", by="key", value_cols=["val"]).count()
        == 0
    )
    # empty right side only: probes survive with NULL values
    p2 = spark.createDataFrame(
        [("a", __import__("datetime").datetime(2024, 1, 1), 1)],
        "key string, ts timestamp, pid long",
    )
    out = asof_join(p2, events, on="ts", by="key", value_cols=["val"]).collect()
    assert len(out) == 1 and out[0].val is None


def test_dedup_and_similarity_empty(spark):
    from ltss_spark.operators.dedup import minhash_lsh_pairs, simhash_pairs
    from ltss_spark.operators.similarity import cosine_topk, embedding_dup_pairs

    docs = spark.createDataFrame([], "doc_id long, text string")
    assert minhash_lsh_pairs(docs).count() == 0
    assert simhash_pairs(docs).count() == 0
    emb = spark.createDataFrame([], "vec_id long, embedding array<float>")
    assert cosine_topk(emb, emb, k=5).count() == 0
    assert embedding_dup_pairs(emb).count() == 0


def test_latest_state_and_timeinstate_empty(spark):
    from ltss_spark.operators.timeseries import latest_state, time_in_state

    s = _empty_states(spark)
    assert latest_state(s).count() == 0
    assert time_in_state(s).count() == 0


def test_ingest_transform_empty(spark):
    from ltss_spark.ingest import dedup_primary_key, events_to_states, split_dead_letter

    ev = spark.createDataFrame(
        [], "time_fired timestamp, entity_id string, state string, attributes string"
    )
    assert events_to_states(ev).count() == 0
    s = _empty_states(spark)
    assert dedup_primary_key(s, tie_breaker="event_id").count() == 0
    valid, dead = split_dead_letter(s)
    assert valid.count() == 0 and dead.count() == 0


def test_corpus_ops_empty(spark):
    from ltss_spark.operators.corpus import (
        contamination,
        hash_split,
        repetition_stats,
        stratified_sample,
    )

    e = spark.createDataFrame([], "doc_id long, text string, lang string")
    assert contamination(e, e).count() == 0
    assert hash_split(e).count() == 0
    assert stratified_sample(e).count() == 0
    assert repetition_stats(e).count() == 0
    # empty train side with non-empty eval: zero containment, not a crash
    ev = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon", "en")],
        "doc_id long, text string, lang string",
    )
    row = contamination(e, ev).collect()[0]
    assert row["containment"] == 0.0


def _vec(seed, d=8):
    return [float((seed * 31 + i * 7) % 10) - 4.5 for i in range(d)]


def test_lsh_null_and_ragged_embeddings_ignored(spark):
    """NULL or wrong-length vectors must fall out of the LSH candidate set
    (empty signature list), not crash the Arrow kernel's np.stack."""
    from ltss_spark.operators.similarity import cosine_topk_lsh, embedding_dup_pairs

    rows = [(1, _vec(1)), (2, _vec(1)), (3, None), (4, _vec(2)[:5])]
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = cosine_topk_lsh(
        corpus, corpus.filter("vec_id = 1"), k=3, tables=4, bits=2, dim=8
    ).collect()
    ids = {r["candidate_id"] for r in out}
    assert 2 in ids and 3 not in ids and 4 not in ids
    pairs = embedding_dup_pairs(
        corpus, threshold=0.9, method="lsh", tables=4, bits=2, dim=8
    ).collect()
    assert {(p["id_a"], p["id_b"]) for p in pairs} == {(1, 2)}


def test_pq_empty_queries_and_invalid_vectors(spark):
    from ltss_spark.operators.similarity import cosine_topk_pq

    rows = [(i, _vec(i)) for i in range(1, 9)] + [(9, None)]
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    empty_q = corpus.filter("vec_id < 0")
    out = cosine_topk_pq(corpus, empty_q, k=3, m=4, kc=4, dim=8)
    assert out.count() == 0
    assert out.columns == ["query_id", "candidate_id", "cosine", "rank"]
    # null-embedding candidate is excluded, query still gets its top-k
    got = cosine_topk_pq(
        corpus, corpus.filter("vec_id = 1"), k=3, m=4, kc=4, dim=8, rerank=8
    ).collect()
    assert len(got) == 3 and all(r["candidate_id"] != 9 for r in got)


def test_dup_pairs_method_validation(spark):
    import pytest

    from ltss_spark.operators.similarity import embedding_dup_pairs

    corpus = spark.createDataFrame([(1, _vec(1))], "vec_id long, embedding array<double>")
    with pytest.raises(ValueError):
        embedding_dup_pairs(corpus, method="fuzzy")


def test_round3_operators_empty(spark, tmp_path):
    """sessionize / bbox join / tfidf / unigram LM / salted join / cagg on
    empty inputs: empty out, no crash (empty windows, empty explodes,
    empty fingerprint sidecars)."""
    from ltss_spark.operators.cagg import read_rollup, refresh_rollup
    from ltss_spark.operators.geo import bbox_spatial_join
    from ltss_spark.operators.skew import salted_join
    from ltss_spark.operators.text import tfidf_topk, unigram_logprob
    from ltss_spark.operators.timeseries import sessionize

    ev = spark.createDataFrame([], "user_id long, ts timestamp, event_id long")
    assert sessionize(ev, time_col="ts", key_cols=("user_id",)).count() == 0

    pts = spark.createDataFrame([], "pid long, lon double, lat double")
    boxes = spark.createDataFrame(
        [(1, 0.0, 0.0, 10.0, 10.0)],
        "box_id long, west double, south double, east double, north double",
    )
    assert bbox_spatial_join(pts, boxes).count() == 0
    noboxes = spark.createDataFrame(
        [], "box_id long, west double, south double, east double, north double"
    )
    pts1 = spark.createDataFrame([(1, 5.0, 5.0)], "pid long, lon double, lat double")
    assert bbox_spatial_join(pts1, noboxes).count() == 0

    docs = spark.createDataFrame([], "doc_id long, text string")
    assert tfidf_topk(docs).count() == 0
    assert unigram_logprob(docs).count() == 0

    big = spark.createDataFrame([], "k string, v double")
    dim = spark.createDataFrame([("a", 1.0)], "k string, m double")
    assert salted_join(big, dim, on=["k"], salt_src=F.col("v")).count() == 0

    def agg(src):
        return src.groupBy("bucket", "k").agg(F.count(F.lit(1)).alias("n"))

    empty = spark.createDataFrame([], "ts timestamp, k string")
    base = str(tmp_path / "cagg_empty")
    assert refresh_rollup(spark, empty, base, agg, time_col="ts", unit="day") == []


def test_round5_operators_empty(spark, tmp_path):
    import pytest

    from ltss_spark.operators.cdc import cdc_apply, cdc_read
    from ltss_spark.operators.corpus import vocab_encode
    from ltss_spark.operators.skew import key_skew_profile
    from ltss_spark.operators.snapshot import commit, read_changes, read_version

    # CDC: an empty change batch must be a no-op, not a crash or a wipe
    changes = spark.createDataFrame(
        [(1, 10, 1.0, "U")], "k long, version long, v double, op string"
    )
    tgt = str(tmp_path / "cdc")
    cdc_apply(spark, tgt, changes, pk=("k",), n_buckets=4)
    assert cdc_apply(spark, tgt, changes.limit(0), pk=("k",), n_buckets=4) == []
    assert cdc_read(spark, tgt).count() == 1

    # snapshot: committing an empty frame is a legal (schema-bearing) version
    snap = str(tmp_path / "snap")
    docs = spark.createDataFrame([], "doc_id long, text string")
    commit(docs, snap)
    assert read_version(spark, snap).count() == 0
    assert read_changes(spark, snap, 1, 1).count() == 0

    # vocab over an empty corpus: empty result, full schema
    out = vocab_encode(docs)
    assert out.count() == 0
    assert out.columns == ["doc_id", "token_ids", "n_tokens", "id_checksum"]

    # skew profile over an empty frame: no keys, no rows
    e = spark.createDataFrame([], "k string, v double")
    assert key_skew_profile(e, ["k"]).count() == 0

    # importance resample with an empty raw pool (everything is target)
    from ltss_spark.operators.corpus import importance_resample

    one = spark.createDataFrame([(1, "a b c", True)], "doc_id long, text string, t boolean")
    assert importance_resample(one, F.col("t")).count() == 0


def test_round7_operators_empty(spark):
    from ltss_spark.operators.corpus import token_budget_mix
    from ltss_spark.operators.rank import distributed_row_number
    from ltss_spark.operators.similarity import cluster_balance, semantic_dedup
    from ltss_spark.operators.text import hybrid_rrf

    docs = spark.createDataFrame([], "doc_id long, source string, text string")
    out = token_budget_mix(docs)
    assert out.count() == 0
    assert out.columns == [
        "doc_id", "source", "n_tokens", "cum_tokens", "quota_tokens", "selected",
    ]

    emb = spark.createDataFrame([], "vec_id long, embedding array<double>")
    assert cluster_balance(emb).count() == 0
    sd = semantic_dedup(emb)
    assert sd.count() == 0
    assert sd.columns == ["vec_id", "centroid_id", "is_dup", "dup_of"]

    ranked = spark.createDataFrame([], "doc_id long, rank int")
    assert hybrid_rrf(ranked, ranked).count() == 0

    # distributed rank over an empty frame: no partitions, no offsets
    e = spark.createDataFrame([], "id long, score double")
    assert (
        distributed_row_number(e, [F.col("score").desc(), F.col("id")]).count()
        == 0
    )


def test_round8_operators_empty(spark):
    from ltss_spark.operators.similarity import semantic_dedup_kmeans
    from ltss_spark.operators.text import perplexity_buckets
    from ltss_spark.operators.timeseries import cusum_changepoints
    from ltss_spark.streaming.ingest import (
        encode_kafka_events,
        parse_kafka_events,
    )

    docs = spark.createDataFrame([], "doc_id long, text string")
    pb = perplexity_buckets(docs)
    assert pb.count() == 0
    assert pb.columns == ["doc_id", "ppl", "bucket", "keep"]

    emb = spark.createDataFrame([], "vec_id long, embedding array<double>")
    sk = semantic_dedup_kmeans(emb)
    assert sk.count() == 0
    assert sk.columns == ["vec_id", "centroid_id", "is_dup", "dup_of"]

    ev = spark.createDataFrame(
        [], "event_id long, user_id long, ts timestamp, value double"
    )
    cc = cusum_changepoints(ev)
    assert cc.count() == 0
    assert cc.columns == ["event_id", "user_id", "x", "s_pos", "s_neg", "is_change"]

    events = spark.createDataFrame(
        [],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    wire = encode_kafka_events(events).select(
        "topic", "key", "value",
        F.lit(0).alias("partition"),
        F.lit(0).cast("long").alias("offset"),
        F.current_timestamp().alias("timestamp"),
    )
    assert parse_kafka_events(wire).count() == 0


def test_agg_median_exact_empty_matches_oracle_semantics(spark, tmp_path):
    """agg_median_exact on an empty events table must return exactly what
    the DuckDB oracle returns — (median_value NULL, n 0), NOT n NULL: the
    oracle's CAST(COUNT(value) AS BIGINT) is 0 over zero rows while a max
    over an empty frame is NULL (ADVICE r8)."""
    import ltss_spark.plans.registry_agg  # noqa: F401 — registers the entry
    from ltss_spark.plans.registry import REGISTRY

    spark.createDataFrame(
        [],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.parquet(str(tmp_path / "events.parquet"))
    q = next(q for q in REGISTRY if q.name == "agg_median_exact")
    rows = q.build(spark, str(tmp_path)).collect()
    assert len(rows) == 1
    assert rows[0]["median_value"] is None
    assert rows[0]["n"] == 0


def test_round10_operators_empty(spark):
    """The round-10 family on the empty corpus: NB train/score/confusion,
    PMI, and BPE all return empty frames (empty aggregates, NULL corpus
    totals, and the empty argmax window are the traps); classifier
    TRAINING on an empty corpus is a programming error and must fail
    loudly, not with an opaque None-gradient TypeError."""
    import pytest

    from ltss_spark.operators.ml import (
        logreg_train,
        nb_confusion,
        nb_score,
        nb_train,
    )
    from ltss_spark.operators.text import bpe_train_merges, pmi_collocations

    docs = spark.createDataFrame([], "doc_id long, text string, lang string")
    assert nb_train(docs).count() == 0
    assert nb_score(docs).count() == 0
    assert nb_score(docs, broadcast_model=False).count() == 0
    assert nb_confusion(docs).count() == 0
    assert pmi_collocations(docs).count() == 0
    assert bpe_train_merges(docs.select("doc_id", "text"), n_merges=2).count() == 0
    with pytest.raises(ValueError, match="empty corpus"):
        logreg_train(docs)
