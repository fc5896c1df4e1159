"""Physical-plan assertions — the 100 TB posture checks (SURVEY.md §4):
filters and projections must reach the parquet scan, dimension joins must
broadcast, partition filters must prune. These are the Spark equivalents of
the reference's btree/GIN indexes and hypertable chunk exclusion, and they
are what keeps the plans viable at 1000 executors."""

import tempfile
import uuid

import pyspark.sql.functions as F

from tests.conftest import SF_SMOKE


def _explain(df, mode) -> str:
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def _plan(df) -> str:
    return _explain(df, "simple")


def _formatted(df) -> str:
    return _explain(df, "formatted")


def test_scan_pushdown_and_pruning(spark):
    """The time predicate must be pushed into the parquet scan and the
    ReadSchema must contain only the projected columns."""
    import ltss_spark.plans as plans

    df = plans.queries()["scan_parquet"](spark, SF_SMOKE)
    s = _formatted(df)
    assert "PushedFilters: [IsNotNull(l_shipdate), GreaterThanOrEqual(l_shipdate" in s
    read = s.split("ReadSchema:")[1].splitlines()[0]
    assert "l_extendedprice" not in read  # column pruning held
    assert "l_quantity" in read


def test_dim_join_broadcasts(spark):
    import ltss_spark.plans as plans

    df = plans.queries()["join_broadcast"](spark, SF_SMOKE)
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan  # no shuffle of the fact side


def test_partition_pruning_on_month(spark):
    """Month-partitioned layout: a month predicate must prune at listing
    time (PartitionFilters), the hypertable chunk-exclusion analogue."""
    out = f"{tempfile.gettempdir()}/ltss_prune_{uuid.uuid4().hex}"
    from ltss_spark.sources.batch import load_table

    events = load_table(spark, SF_SMOKE, "events").withColumn(
        "month", F.date_format("ts", "yyyy-MM")
    )
    events.write.mode("overwrite").partitionBy("month").parquet(out)
    df = spark.read.parquet(out).filter(F.col("month") == "2024-01")
    s = _formatted(df)
    assert "PartitionFilters" in s and "month" in s.split("PartitionFilters:")[1].splitlines()[0]


def test_latest_state_is_single_aggregate(spark):
    """B3 latest-state must be ONE hash aggregation (max_by), not a window
    sort — the difference between O(1) state per group and a full per-entity
    sort at 100 TB."""
    from ltss_spark.ingest import states_from_events
    from ltss_spark.operators.timeseries import latest_state
    from ltss_spark.sources.batch import load_table

    states = states_from_events(load_table(spark, SF_SMOKE, "events"))
    plan = _plan(latest_state(states))
    assert "max_by" in plan or "HashAggregate" in plan
    assert "Window" not in plan


def test_agg_is_partial_then_final(spark):
    """groupBy aggregations must do map-side partial aggregation (two
    HashAggregate levels around the exchange)."""
    import ltss_spark.plans as plans

    df = plans.queries()["agg_basic"](spark, SF_SMOKE)
    plan = _plan(df)
    assert plan.count("HashAggregate") >= 2
