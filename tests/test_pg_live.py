"""Opt-in LIVE Postgres smoke (VERDICT r4 item 3).

The regular test container has no Postgres, so the dialect is verified at
SQL-text level (test_pg_dialect.py golden tests) and at JDBC wire level
via embedded Derby (test_streaming.py) — but the GENERATED Postgres
DDL/upsert text itself is never executed by a real server there. This
module closes that gap in any environment that has one:

    make pg-live          # one command: compose up -> test matrix -> down
    # (docker/pg-live/docker-compose.yml runs the reference's container
    #  matrix: timescale/timescaledb:latest-pg14 and
    #  timescale/timescaledb-postgis:latest-pg12 — see
    #  reference tests/pytest/test_databases.py:70-95)

    # or against any server you already have:
    export LTSS_PG_URL='jdbc:postgresql://host:5432/db'
    export LTSS_PG_USER=... LTSS_PG_PASSWORD=...      # if required
    # postgres JDBC driver on the Spark classpath, e.g.
    #   --packages org.postgresql:postgresql:42.7.3
    pytest tests/test_pg_live.py

Unset, every test here skips (documented in FIXTURES.md). The flow mirrors
the reference end-to-end: capability probe (pg_available_extensions,
reference __init__.py:276-278) -> plan_setup_ddl executed verbatim
(:316-344) -> staged ON CONFLICT upsert (models.py:31-32) -> read-back.
"""

import os
import uuid

import pytest

PG_URL = os.environ.get("LTSS_PG_URL")

pytestmark = pytest.mark.skipif(
    not PG_URL, reason="LTSS_PG_URL not set — no live Postgres available"
)


def _opts() -> dict:
    opts = {}
    if os.environ.get("LTSS_PG_USER"):
        opts["user"] = os.environ["LTSS_PG_USER"]
    if os.environ.get("LTSS_PG_PASSWORD"):
        opts["password"] = os.environ["LTSS_PG_PASSWORD"]
    return opts


def _read_table(spark, table):
    reader = spark.read.format("jdbc").option("url", PG_URL).option(
        "dbtable", table
    )
    for k, v in _opts().items():
        reader = reader.option(k, v)
    return reader.load()


def test_pg_live_ddl_and_upsert_roundtrip(spark):
    """Execute the planned DDL verbatim against the live server, then run
    the staged upsert twice — first insert, then a redelivery carrying an
    updated state for one PK — and assert PK uniqueness plus
    last-write-wins, exactly the reference's conflict semantics."""
    import datetime as dt

    from ltss_spark.sources import pg_dialect as P
    from ltss_spark.streaming.ingest import (
        _run_jdbc_statements,
        make_pg_upsert_sink,
    )

    table = f"ltss_smoke_{uuid.uuid4().hex[:8]}"
    staging = f"{table}_staging"

    # 1. capability probe, exactly the reference's query
    probe = spark.read.format("jdbc").option("url", PG_URL).option(
        "query", P.CAPABILITY_PROBE_SQL
    )
    for k, v in _opts().items():
        probe = probe.option(k, v)
    available = {
        r["name"]: r["installed_version"] for r in probe.load().collect()
    }

    # 2. the planned DDL runs VERBATIM — this is the statement sequence the
    # golden tests pin, now executed by a real server
    ddl = P.plan_setup_ddl(available, table=table)
    try:
        _run_jdbc_statements(spark, PG_URL, ddl, _opts())

        t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
        cols = "time timestamp, entity_id string, state string, attributes string"
        first = spark.createDataFrame(
            [
                (t0, "sensor.a", "on", "{}"),
                (t0, "sensor.b", "21.5", '{"unit":"C"}'),
            ],
            cols,
        )
        redelivery = spark.createDataFrame(
            [
                (t0, "sensor.a", "off", "{}"),  # same PK, new state
                (t0, "sensor.c", "open", "{}"),
            ],
            cols,
        )
        sink = make_pg_upsert_sink(
            PG_URL,
            table=table,
            staging=staging,
            jdbc_options=_opts(),
        )
        sink(first, epoch_id=0)
        sink(redelivery, epoch_id=1)

        rows = {
            r["entity_id"]: r["state"]
            for r in _read_table(spark, table).collect()
        }
        assert rows == {"sensor.a": "off", "sensor.b": "21.5", "sensor.c": "open"}
        n = _read_table(spark, table).groupBy("time", "entity_id").count()
        assert n.filter("count > 1").count() == 0, "PK violated"
    finally:
        _run_jdbc_statements(
            spark,
            PG_URL,
            [
                f"DROP TABLE IF EXISTS {staging}",
                f"DROP TABLE IF EXISTS {table} CASCADE",
            ],
            _opts(),
        )


def test_pg_live_nul_state_lands_sanitized(spark):
    """A NUL in a raw HA state must land as U+FFFD, not error: Postgres
    TEXT rejects \\x00, so this is the live proof of the ingest-time
    sanitization (reference models.py:67)."""
    import datetime as dt

    from ltss_spark.ingest import events_from_ha
    from ltss_spark.sources import pg_dialect as P
    from ltss_spark.streaming.ingest import (
        _run_jdbc_statements,
        make_pg_upsert_sink,
    )

    table = f"ltss_smoke_{uuid.uuid4().hex[:8]}"
    ddl = P.plan_setup_ddl({}, table=table)
    try:
        _run_jdbc_statements(spark, PG_URL, ddl, _opts())
        batch = events_from_ha(
            spark,
            [
                {
                    "entity_id": "sensor.nul",
                    "time_fired": dt.datetime(2024, 1, 1, 12, 0, 0),
                    "new_state": {"state": "a\x00b", "attributes": {}},
                }
            ],
        ).withColumnRenamed("time_fired", "time")
        sink = make_pg_upsert_sink(PG_URL, table=table, jdbc_options=_opts())
        sink(batch, epoch_id=0)
        (row,) = _read_table(spark, table).collect()
        assert row["state"] == "a�b"
    finally:
        _run_jdbc_statements(
            spark,
            PG_URL,
            [
                f"DROP TABLE IF EXISTS {table}_staging",
                f"DROP TABLE IF EXISTS {table} CASCADE",
            ],
            _opts(),
        )
