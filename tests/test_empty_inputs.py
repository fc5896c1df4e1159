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
