"""Structured Streaming parity: the streaming ingest path must land exactly
what the batch transform produces (the reference's write path has a single
code path; ours shares the column expressions, this proves it)."""

import tempfile
import uuid

import pyspark.sql.functions as F

from tests.conftest import SF_SMOKE


def test_streaming_ingest_equals_batch(spark):
    from ltss_spark.ingest import states_from_events
    from ltss_spark.sources.batch import load_table
    from ltss_spark.streaming.ingest import run_ingest_availablenow

    base = f"{tempfile.gettempdir()}/ltss_test_{uuid.uuid4().hex}"
    run_ingest_availablenow(
        spark, SF_SMOKE, out_path=f"{base}/out", checkpoint=f"{base}/ckpt"
    )
    streamed = spark.read.parquet(f"{base}/out").select(
        "time", "entity_id", "state", "attributes"
    )
    batch = states_from_events(load_table(spark, SF_SMOKE, "events")).select(
        "time", "entity_id", "state", "attributes"
    )
    assert streamed.count() == batch.count()
    assert streamed.exceptAll(batch).count() == 0
    assert batch.exceptAll(streamed).count() == 0
    # partitioned layout: month=... directories exist (hypertable-chunk analogue)
    import os

    assert any(d.startswith("month=") for d in os.listdir(f"{base}/out"))


def test_streaming_window_counts_equal_batch(spark):
    from ltss_spark.sources.batch import load_table
    from ltss_spark.streaming.ingest import streaming_bucket_counts

    got = streaming_bucket_counts(spark, SF_SMOKE, bucket="1 hour")
    events = load_table(spark, SF_SMOKE, "events")
    want = (
        events.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("bucket_start"), "event_type", "n")
    )
    assert got.count() == want.count()
    assert got.exceptAll(want).count() == 0
