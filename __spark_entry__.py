"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query (smoke, sf0.001).
``queries()`` — one entry per implemented operator from SURVEY.md §2
(registered in ltss_spark.plans).
``oracle_sql()`` — DuckDB-equivalent SQL for every SQL-expressible entry.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

import ltss_spark.plans as plans


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the ltss read pattern end-to-end on sf0.001 — canonical
    state table (ingest transform) -> hourly time-bucket aggregation joined
    with latest-state per entity (SURVEY.md §2.B B3+B4, the Grafana +
    SQL-sensor queries the reference exists to serve)."""
    from pyspark.sql import functions as F

    from ltss_spark.ingest import states_from_events
    from ltss_spark.operators.timeseries import latest_state, time_bucket_agg
    from ltss_spark.session import pin_session_for_oracle
    from ltss_spark.sources.batch import load_table

    pin_session_for_oracle(spark)
    states = states_from_events(load_table(spark, "/root/testdata/sf0.001", "events"))
    buckets = time_bucket_agg(states, "1 hour")
    latest = latest_state(states.select("time", "entity_id", "state"))
    return buckets.join(F.broadcast(latest), "entity_id").select(
        "bucket_start",
        "entity_id",
        "n_events",
        "avg_state",
        "min_state",
        "max_state",
        "last_state",
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return plans.queries()


def oracle_sql() -> dict[str, str]:
    return plans.oracle_sql()
