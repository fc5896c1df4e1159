from ltss_spark.streaming.ingest import run_ingest_availablenow  # noqa: F401
