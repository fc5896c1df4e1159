"""Time-series read patterns the reference builds physical structure for but
delegates to PostgreSQL/TimescaleDB (SURVEY.md §2.B).

Each function is a DataFrame composition; Catalyst supplies pruning/pushdown
(the hypertable-chunk and btree-index roles, SURVEY §4).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window

from ltss_spark.functions.numeric import davg


def entity_range_scan(
    states: DataFrame,
    entity_id: str,
    start,
    end,
    newest_first: bool = True,
) -> DataFrame:
    """B2: per-entity time-range scan, newest first — the access path the
    reference's composite btree (entity_id, time DESC) exists for
    (/root/reference/custom_components/ltss/models.py:78-80).

    In the partitioned parquet layout the time predicate prunes month
    partitions and the entity predicate is pushed to parquet row-group
    stats (we sort within partitions by entity_id at write,
    ltss_spark.sources.batch.write_partitioned).
    """
    df = states.filter(
        (F.col("entity_id") == entity_id) & F.col("time").between(start, end)
    )
    return df.orderBy(F.col("time").desc() if newest_first else F.col("time"))


def latest_state(states: DataFrame, by: str = "entity_id") -> DataFrame:
    """B3: latest state per entity (the SQL-sensor pattern,
    /root/reference/README.md:23, served by the DESC index models.py:79).

    ``max_by`` (argmax) is a single hash aggregation — partial aggregation
    map-side, one shuffle on entity_id; no global sort, no window. At 100 TB
    this beats the row_number() formulation (which must sort every
    partition's history) by doing O(1) state per group.
    A deterministic tie-break on (time, tie) is built in.
    """
    tie = F.struct(F.col("time"), F.col("state"))
    return states.groupBy(by).agg(
        F.max(F.col("time")).alias("last_time"),
        F.max_by(F.col("state"), tie).alias("last_state"),
    )


def time_bucket_agg(
    states: DataFrame,
    bucket: str = "1 hour",
    value: Column | None = None,
) -> DataFrame:
    """B4: TimescaleDB ``time_bucket`` analogue (the Grafana time-series
    path, /root/reference/README.md:24-26): tumbling window + aggregates.

    ``window()`` buckets are computed map-side; the only shuffle is the
    groupBy hash exchange. States are stringly typed ('21.5') so the numeric
    aggregate goes through try_cast — NULL (excluded from avg) on non-numeric
    states, matching `state::float` failures the Postgres path would raise.
    """
    v = value if value is not None else F.col("state").try_cast("double")
    return (
        states.groupBy(
            F.window(F.col("time"), bucket).alias("w"), F.col("entity_id")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            davg(v).alias("avg_state"),
            F.min(v).alias("min_state"),
            F.max(v).alias("max_state"),
        )
        .select(
            F.col("w.start").alias("bucket_start"),
            F.col("entity_id"),
            "n_events",
            "avg_state",
            "min_state",
            "max_state",
        )
    )


def time_in_state(states: DataFrame, tie_breaker: str | None = None) -> DataFrame:
    """Duration each (entity, state) row was current: the canonical derived
    query over a change-log table (SURVEY §2.C win_lag_lead). lead(time)
    over the per-entity timeline bounds each state's validity interval.

    ``tie_breaker``: extra ordering column for rows sharing a timestamp
    (keeps lead() deterministic).
    """
    order = ["time"] + ([tie_breaker] if tie_breaker else [])
    w = Window.partitionBy("entity_id").orderBy(*order)
    nxt = F.lead("time").over(w)
    return states.select(
        "entity_id",
        "time",
        "state",
        (F.unix_micros(nxt) - F.unix_micros(F.col("time"))).alias("micros_in_state"),
    )
