"""Postgres/TimescaleDB dialect — SQL-text golden tests (VERDICT r3
item 5). The container has no Postgres, so the dialect is pinned at the
SQL-text level: type mapping, capability-probe-driven DDL planning, the
ON CONFLICT upsert forms, and the foreachBatch staging sequence. The
wire-level JDBC path stays covered by the embedded-Derby round-trip in
tests/test_streaming.py."""

import pyspark.sql.functions as F
from pyspark.sql import types as T

from ltss_spark.sources import pg_dialect as P


def _ltss_schema() -> T.StructType:
    return T.StructType(
        [
            T.StructField("time", T.TimestampType()),
            T.StructField("entity_id", T.StringType()),
            T.StructField("state", T.StringType()),
            T.StructField("attributes", T.StringType()),
        ]
    )


def test_dialect_for_url():
    assert P.dialect_for_url("jdbc:postgresql://db:5432/ha") == "postgresql"
    assert P.dialect_for_url("jdbc:derby:/tmp/x;create=true") == "derby"
    assert P.dialect_for_url("jdbc:mysql://x/y") == "generic"


def test_type_mapping_reference_divergences():
    """The two mappings Spark's built-in PostgresDialect gets wrong for
    the reference schema: instants must be TIMESTAMPTZ (models.py:30) and
    complex attribute payloads JSONB (models.py:33)."""
    assert P.spark_type_to_pg(T.TimestampType()) == "TIMESTAMPTZ"
    assert P.spark_type_to_pg(T.TimestampNTZType()) == "TIMESTAMP"
    assert P.spark_type_to_pg(T.MapType(T.StringType(), T.StringType())) == "JSONB"
    assert (
        P.spark_type_to_pg(T.StructType([T.StructField("a", T.LongType())]))
        == "JSONB"
    )
    assert P.spark_type_to_pg(T.ArrayType(T.DoubleType())) == "JSONB"
    assert P.spark_type_to_pg(T.DoubleType()) == "DOUBLE PRECISION"
    assert P.spark_type_to_pg(T.DecimalType(38, 6)) == "NUMERIC(38,6)"
    assert P.spark_type_to_pg(T.BinaryType()) == "BYTEA"


def test_ltss_column_types_golden():
    assert P.ltss_column_types(_ltss_schema()) == (
        "time TIMESTAMPTZ, entity_id VARCHAR(255), "
        "state VARCHAR(255), attributes JSONB"
    )


def test_writer_options_allow_server_side_json_cast():
    opts = P.pg_writer_options(_ltss_schema())
    assert opts["stringtype"] == "unspecified"
    assert "attributes JSONB" in opts["createTableColumnTypes"]


def test_plan_setup_ddl_full_stack_golden():
    """Probe says postgis+timescaledb installed -> the reference's full
    _create_table sequence (__init__.py:316-344): both extensions, the
    location column, hypertable + chunk interval, all three indexes."""
    ddl = P.plan_setup_ddl(
        {"postgis": "3.4", "timescaledb": "2.14", "plpgsql": "1.0"}
    )
    assert ddl[0] == "CREATE EXTENSION IF NOT EXISTS postgis CASCADE"
    assert ddl[1] == "CREATE EXTENSION IF NOT EXISTS timescaledb CASCADE"
    assert ddl[2] == (
        "CREATE TABLE IF NOT EXISTS ltss (time TIMESTAMPTZ NOT NULL, "
        "entity_id VARCHAR(255) NOT NULL, state VARCHAR(255), "
        "attributes JSONB, location geometry(POINT,4326), "
        "PRIMARY KEY (time, entity_id))"
    )
    assert ddl[3] == (
        "SELECT create_hypertable('ltss', 'time', if_not_exists => TRUE)"
    )
    assert ddl[4] == "SELECT set_chunk_time_interval('ltss', 2592000000000)"
    assert ddl[5] == "CREATE INDEX IF NOT EXISTS ix_ltss_state ON ltss (state)"
    assert ddl[6] == (
        "CREATE INDEX IF NOT EXISTS ltss_attributes_idx "
        "ON ltss USING gin (attributes)"
    )
    assert ddl[7] == (
        "CREATE INDEX IF NOT EXISTS ltss_entityid_time_composite_idx "
        "ON ltss (entity_id, time DESC)"
    )


def test_plan_setup_ddl_vanilla_postgres():
    """No extensions -> plain table, no location column, no hypertable —
    the reference's vanilla-Postgres branch."""
    ddl = P.plan_setup_ddl({"plpgsql": "1.0"})
    assert not any("EXTENSION" in s for s in ddl)
    assert not any("hypertable" in s for s in ddl)
    assert not any("location" in s for s in ddl)
    assert any(s.startswith("CREATE TABLE IF NOT EXISTS ltss") for s in ddl)


def test_upsert_sql_row_form_golden():
    sql = P.upsert_sql("ltss", ["time", "entity_id", "state", "attributes"])
    assert sql == (
        "INSERT INTO ltss (time, entity_id, state, attributes) "
        "VALUES (%s, %s, %s, %s) "
        "ON CONFLICT (time, entity_id) "
        "DO UPDATE SET state = EXCLUDED.state, "
        "attributes = EXCLUDED.attributes"
    )


def test_upsert_sql_pk_only_is_do_nothing():
    sql = P.upsert_sql("t", ["time", "entity_id"])
    assert sql.endswith("ON CONFLICT (time, entity_id) DO NOTHING")


def test_upsert_sql_staging_form_dedupes_batch():
    """The set-based merge must DISTINCT ON the PK — ON CONFLICT rejects
    touching one target row twice in a single statement, and a micro-batch
    can legitimately carry the same PK twice."""
    sql = P.upsert_sql(
        "ltss", ["time", "entity_id", "state"], staging="ltss_staging"
    )
    assert sql == (
        "INSERT INTO ltss (time, entity_id, state) "
        "SELECT DISTINCT ON (time, entity_id) time, entity_id, state "
        "FROM ltss_staging ORDER BY time, entity_id "
        "ON CONFLICT (time, entity_id) DO UPDATE SET state = EXCLUDED.state"
    )


def test_staging_ddl_is_unlogged_and_truncated():
    pre = P.staging_table_ddl("ltss", "ltss_staging")
    assert pre[0] == (
        "CREATE UNLOGGED TABLE IF NOT EXISTS ltss_staging "
        "(LIKE ltss INCLUDING DEFAULTS)"
    )
    assert pre[1] == "TRUNCATE ltss_staging"


def test_pg_upsert_sink_statement_sequence(monkeypatch, spark):
    """make_pg_upsert_sink with both seams replaced (no Postgres in this
    container): the statement executor records SQL, the staging append
    records its (url, table, mode). Asserts the exact pre -> append ->
    merge -> truncate ordering and that the merge targets the real table
    with the PK conflict clause."""
    from ltss_spark.streaming import ingest as I

    events: list = []

    def fake_run(spark_, url, statements, options):
        assert url == "jdbc:postgresql://db/ha"
        assert options.get("user") == "ltss"  # creds reach the stmt conn too
        events.extend(("sql", s) for s in statements)

    def fake_write(batch, url, table, mode, options):
        events.append(("append", url, table, mode))

    monkeypatch.setattr(I, "_write_jdbc", fake_write)
    sink = I.make_pg_upsert_sink(
        "jdbc:postgresql://db/ha",
        table="ltss",
        run_statements=fake_run,
        jdbc_options={"user": "ltss", "password": "secret"},
        tie_breaker="event_id",
    )
    batch = spark.createDataFrame(
        [("sensor.a", "on"), ("sensor.b", "off")], "entity_id string, state string"
    )
    sink(batch, epoch_id=7)
    kinds = [e[0] for e in events]
    assert kinds == ["sql", "sql", "append", "sql", "sql"]
    assert events[0][1].startswith(
        "CREATE UNLOGGED TABLE IF NOT EXISTS ltss_staging"
    )
    assert events[1][1] == "TRUNCATE ltss_staging"
    assert events[2][1:] == ("jdbc:postgresql://db/ha", "ltss_staging", "append")
    assert events[3][1].startswith("INSERT INTO ltss (")
    assert "ON CONFLICT (time, entity_id)" in events[3][1]
    assert "ORDER BY time, entity_id, event_id DESC" in events[3][1]
    assert events[4][1] == "TRUNCATE ltss_staging"


def test_pg_upsert_sink_dedupes_without_tie_breaker(monkeypatch, spark):
    """With tie_breaker=None the default sink must PK-dedup the batch
    Spark-side before the staging append — otherwise the merge's DISTINCT
    ON has no ORDER BY tie-break and the surviving duplicate would be
    Postgres-plan-dependent."""
    import datetime as dt

    from ltss_spark.streaming import ingest as I

    appended: list = []

    def fake_run(spark_, url, statements, options):
        pass

    def fake_write(batch, url, table, mode, options):
        appended.extend(batch.collect())

    monkeypatch.setattr(I, "_write_jdbc", fake_write)
    sink = I.make_pg_upsert_sink(
        "jdbc:postgresql://db/ha", table="ltss", run_statements=fake_run
    )
    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    batch = spark.createDataFrame(
        [(t0, "sensor.a", "on"), (t0, "sensor.a", "off"), (t0, "sensor.b", "on")],
        "time timestamp, entity_id string, state string",
    )
    sink(batch, epoch_id=1)
    pks = sorted((r["time"], r["entity_id"]) for r in appended)
    assert len(appended) == 2, "intra-batch PK duplicate must not reach staging"
    assert pks == [(t0, "sensor.a"), (t0, "sensor.b")]


def test_write_jdbc_seeds_pg_options(monkeypatch, spark):
    """_write_jdbc against a jdbc:postgresql URL must inject the dialect
    options (createTableColumnTypes, stringtype) while caller options win."""
    from ltss_spark.streaming import ingest as I

    captured = {}

    class FakeWriter:
        def __init__(self):
            self.opts = {}

        def mode(self, m):
            captured["mode"] = m
            return self

        def option(self, k, v):
            self.opts[k] = v
            return self

        def jdbc(self, url, table):
            captured["url"] = url
            captured["table"] = table
            captured["opts"] = dict(self.opts)

    batch = spark.createDataFrame(
        [("a",)], "entity_id string"
    ).select(
        F.col("entity_id"),
        F.current_timestamp().alias("time"),
        F.lit("on").alias("state"),
        F.lit("{}").alias("attributes"),
    )

    fake = FakeWriter()

    class FakeDF:
        schema = batch.schema
        write = fake

    I._write_jdbc(
        FakeDF(), "jdbc:postgresql://db/ha", "ltss", "append",
        {"stringtype": "caller-wins"},
    )
    assert captured["opts"]["stringtype"] == "caller-wins"
    assert "attributes JSONB" in captured["opts"]["createTableColumnTypes"]
    assert "time TIMESTAMPTZ" in captured["opts"]["createTableColumnTypes"]

    # non-pg URL: no injection
    fake2 = FakeWriter()

    class FakeDF2:
        schema = batch.schema
        write = fake2

    I._write_jdbc(FakeDF2(), "jdbc:derby:/tmp/x", "t", "append", {})
    assert "createTableColumnTypes" not in captured["opts"]
    assert "stringtype" not in captured["opts"]


def test_plan_setup_ddl_timescale_without_postgis():
    """The reference's test_timescaledb configuration (tests/pytest/
    test_databases.py:70-91): TimescaleDB image without PostGIS -> the
    table IS a hypertable but has NO location column and no postgis
    extension."""
    ddl = P.plan_setup_ddl({"timescaledb": "2.14", "plpgsql": "1.0"})
    assert ddl[0] == "CREATE EXTENSION IF NOT EXISTS timescaledb CASCADE"
    assert not any("postgis" in s for s in ddl)
    assert not any("location" in s for s in ddl)
    assert any("create_hypertable('ltss'" in s for s in ddl)
    # and the forced-location variant still requires postgis to be there
    ddl2 = P.plan_setup_ddl({"timescaledb": "2.14"}, with_location=True)
    assert not any("location" in s for s in ddl2), (
        "location column without postgis would fail at CREATE TABLE"
    )


def test_pg_upsert_sink_retry_is_idempotent(monkeypatch, spark):
    """A sink failure AFTER the staging append but BEFORE the merge must
    not duplicate rows on retry: the retry re-runs the pre-DDL, whose
    TRUNCATE clears the partial staging append before the next one. Pin
    the exact replayed statement stream."""
    from ltss_spark.streaming import ingest as I

    events: list = []
    fail_once = {"armed": True}

    def fake_run(spark_, url, statements, options):
        events.extend(("sql", s) for s in statements)
        if fail_once["armed"] and any(s.startswith("INSERT") for s in statements):
            fail_once["armed"] = False
            raise RuntimeError("connection reset mid-merge")

    def fake_write(batch, url, table, mode, options):
        events.append(("append", table))

    monkeypatch.setattr(I, "_write_jdbc", fake_write)
    sink = I.make_pg_upsert_sink(
        "jdbc:postgresql://db/ha",
        table="ltss",
        run_statements=fake_run,
        backoff_s=0.0,
    )
    batch = spark.createDataFrame([("a", "on")], "entity_id string, state string")
    sink(batch, epoch_id=1)  # succeeds on the second attempt

    truncates = [i for i, e in enumerate(events) if e == ("sql", "TRUNCATE ltss_staging")]
    appends = [i for i, e in enumerate(events) if e[0] == "append"]
    merges = [i for i, e in enumerate(events) if e[0] == "sql" and e[1].startswith("INSERT")]
    assert len(appends) == 2 and len(merges) == 2  # attempt 1 (failed) + attempt 2
    # every append is preceded by a TRUNCATE later than the previous append
    assert truncates[0] < appends[0] < merges[0]
    second_truncate_before_append2 = [t for t in truncates if appends[0] < t < appends[1]]
    assert second_truncate_before_append2, (
        "retry did not truncate staging before re-appending — duplicate rows"
    )


def test_upsert_sql_staging_tie_breaker_golden():
    sql = P.upsert_sql(
        "ltss", ["time", "entity_id", "state", "event_id"],
        staging="ltss_staging", tie_breaker="event_id",
    )
    assert "ORDER BY time, entity_id, event_id DESC" in sql


def test_bm25_precomputed_stats_skip_corpus_pass(spark):
    """With corpus_stats supplied the plan must contain exactly ONE scan
    of the documents relation (the TF path), not two."""
    import contextlib
    import io

    from ltss_spark.operators.text import bm25_topk

    docs = spark.createDataFrame(
        [(1, "hash join"), (2, "vector scan")], "doc_id long, text string"
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        bm25_topk(docs, ["hash"], corpus_stats=(2, 2.0)).explain("simple")
    plan = buf.getvalue()
    assert plan.count("LocalTableScan") + plan.count("Scan ExistingRDD") <= 2
