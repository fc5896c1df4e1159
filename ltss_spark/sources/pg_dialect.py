"""PostgreSQL / TimescaleDB dialect for the JDBC sink.

The reference's storage protocol is Postgres: it probes
``pg_available_extensions`` and adapts the schema to what it finds
(/root/reference/custom_components/ltss/__init__.py:271-278 probe,
281-295 table create + hypertable interval, 316-344 _create_table with
PostGIS/TimescaleDB branches), and its model pins the column types
(models.py:30-35: time TIMESTAMPTZ PK, entity_id VARCHAR(255) PK,
state VARCHAR(255) indexed, attributes JSONB; models.py:76-81: GIN
index on attributes and a composite (entity_id, time DESC) index).

Spark's built-in PostgresDialect maps TimestampType to ``timestamp``
(without time zone) and has no JSONB mapping, so a plain
``df.write.jdbc`` against Postgres would diverge from the reference's
schema. This module owns that gap as PURE SQL-text builders:

- type mapping (``createTableColumnTypes`` for the Spark writer),
- capability probe + DDL planning (extensions, hypertable, indexes),
- the upsert statement (``INSERT ... ON CONFLICT (time, entity_id)``),
  executed via the staging-table pattern — the only way to get
  statement-level conflict handling through plain JDBC at scale.

Everything here is testable without a live database (SQL-text golden
tests in tests/test_pg_dialect.py); the container has no Postgres, so
the wire-level path is exercised against embedded Derby exactly as
before (tests/test_streaming.py) with the dialect hooks a no-op, the
in-process analogue of the reference's live-database matrix
(/root/reference/tests/pytest/test_databases.py:20-45).
"""

from __future__ import annotations

from pyspark.sql import types as T

#: the canonical ltss table schema, reference models.py:27-35. Keys are
#: our canonical state-row columns; values the reference's pg types.
LTSS_PG_COLUMNS: dict[str, str] = {
    "time": "TIMESTAMPTZ",
    "entity_id": "VARCHAR(255)",
    "state": "VARCHAR(255)",
    "attributes": "JSONB",
}

#: primary key, reference models.py:30-32 (also the upsert conflict
#: target — the PK is what makes at-least-once redelivery idempotent)
LTSS_PK: tuple[str, ...] = ("time", "entity_id")


def dialect_for_url(url: str) -> str:
    """'postgresql' | 'derby' | 'generic' from a JDBC URL prefix."""
    if url.startswith("jdbc:postgresql:"):
        return "postgresql"
    if url.startswith("jdbc:derby:"):
        return "derby"
    return "generic"


# ---------------------------------------------------------------------------
# Type mapping
# ---------------------------------------------------------------------------

def spark_type_to_pg(dt: T.DataType) -> str:
    """Spark SQL type -> Postgres column type, overriding the two places
    Spark's built-in PostgresDialect diverges from the reference schema:
    TimestampType lands TIMESTAMPTZ (not ``timestamp``; the reference
    stores instants, models.py:30), and Map/Struct/Array land JSONB (the
    reference's attributes column, models.py:33) instead of failing or
    flattening to text."""
    if isinstance(dt, T.TimestampType):
        return "TIMESTAMPTZ"
    if isinstance(dt, T.TimestampNTZType):
        return "TIMESTAMP"
    if isinstance(dt, (T.MapType, T.StructType, T.ArrayType)):
        return "JSONB"
    if isinstance(dt, T.StringType):
        return "TEXT"
    if isinstance(dt, T.BooleanType):
        return "BOOLEAN"
    if isinstance(dt, T.ByteType):
        return "SMALLINT"
    if isinstance(dt, T.ShortType):
        return "SMALLINT"
    if isinstance(dt, T.IntegerType):
        return "INTEGER"
    if isinstance(dt, T.LongType):
        return "BIGINT"
    if isinstance(dt, T.FloatType):
        return "REAL"
    if isinstance(dt, T.DoubleType):
        return "DOUBLE PRECISION"
    if isinstance(dt, T.DecimalType):
        return f"NUMERIC({dt.precision},{dt.scale})"
    if isinstance(dt, T.DateType):
        return "DATE"
    if isinstance(dt, T.BinaryType):
        return "BYTEA"
    return "TEXT"


def create_table_column_types(
    schema: T.StructType, overrides: dict[str, str] | None = None
) -> str:
    """The ``createTableColumnTypes`` option string for ``df.write.jdbc``:
    lets the Spark writer create the table with reference-faithful types
    without us owning the CREATE TABLE. ``overrides`` wins per column
    (e.g. entity_id VARCHAR(255) where the generic mapping says TEXT)."""
    overrides = overrides or {}
    parts = [
        f"{f.name} {overrides.get(f.name, spark_type_to_pg(f.dataType))}"
        for f in schema.fields
    ]
    return ", ".join(parts)


def ltss_column_types(schema: T.StructType) -> str:
    """createTableColumnTypes for a canonical state-row frame: generic
    mapping + the reference's exact ltss column pins (models.py:30-35)."""
    return create_table_column_types(schema, overrides=dict(LTSS_PG_COLUMNS))


# ---------------------------------------------------------------------------
# Capability probe -> DDL plan (reference __init__.py:271-344)
# ---------------------------------------------------------------------------

#: reference __init__.py:276-278 — run against the server, feed the
#: result (name -> installed_version) to plan_setup_ddl
CAPABILITY_PROBE_SQL = (
    "SELECT name, installed_version FROM pg_available_extensions"
)


def plan_setup_ddl(
    available_extensions: dict[str, str | None],
    table: str = "ltss",
    chunk_time_interval_us: int = 2_592_000_000_000,
    with_location: bool | None = None,
) -> list[str]:
    """The DDL statement sequence the reference's _create_table +
    hypertable setup performs (__init__.py:316-344), as pure SQL text:

    - PostGIS available (or ``with_location=True``): CREATE EXTENSION,
      add the ``location geometry(POINT,4326)`` column
      (models.py:44: ``Geometry("POINT", srid=4326)``).
    - TimescaleDB available: CREATE EXTENSION + create_hypertable on
      ``time`` + set_chunk_time_interval (default 30 days in µs —
      the reference's own default).
    - Always: the table itself, the state btree index (models.py:32),
      the attributes GIN index and the (entity_id, time DESC) composite
      (models.py:76-81).

    Idempotent by construction (IF NOT EXISTS / if_not_exists => TRUE)
    like the reference's inspector-guarded path.
    """
    has_postgis = "postgis" in available_extensions
    has_tsdb = "timescaledb" in available_extensions
    # the geometry column exists only where PostGIS does — exactly the
    # reference's rule (location activation happens inside the
    # postgis-available branch, __init__.py:320-328); a with_location=True
    # request on a non-PostGIS server must not emit a column whose type
    # does not exist there
    location = has_postgis and (with_location is None or with_location)

    ddl: list[str] = []
    if location:
        ddl.append("CREATE EXTENSION IF NOT EXISTS postgis CASCADE")
    if has_tsdb:
        ddl.append("CREATE EXTENSION IF NOT EXISTS timescaledb CASCADE")

    cols = [f"{c} {t} NOT NULL" if c in LTSS_PK else f"{c} {t}"
            for c, t in LTSS_PG_COLUMNS.items()]
    if location:
        cols.append("location geometry(POINT,4326)")
    pk = ", ".join(LTSS_PK)
    ddl.append(
        f"CREATE TABLE IF NOT EXISTS {table} ({', '.join(cols)}, "
        f"PRIMARY KEY ({pk}))"
    )
    if has_tsdb:
        ddl.append(
            f"SELECT create_hypertable('{table}', 'time', "
            f"if_not_exists => TRUE)"
        )
        ddl.append(
            f"SELECT set_chunk_time_interval('{table}', "
            f"{chunk_time_interval_us})"
        )
    ddl.append(
        f"CREATE INDEX IF NOT EXISTS ix_{table}_state ON {table} (state)"
    )
    ddl.append(
        f"CREATE INDEX IF NOT EXISTS {table}_attributes_idx "
        f"ON {table} USING gin (attributes)"
    )
    ddl.append(
        f"CREATE INDEX IF NOT EXISTS {table}_entityid_time_composite_idx "
        f"ON {table} (entity_id, time DESC)"
    )
    return ddl


# ---------------------------------------------------------------------------
# Upsert (INSERT ... ON CONFLICT) via the staging-table pattern
# ---------------------------------------------------------------------------

def upsert_sql(
    table: str,
    columns: list[str],
    conflict_cols: tuple[str, ...] = LTSS_PK,
    staging: str | None = None,
    tie_breaker: str | None = None,
) -> str:
    """``INSERT ... ON CONFLICT (time, entity_id) DO UPDATE`` — the
    Postgres form of the reference's PK conflict semantics
    (models.py:31-32: redelivered rows replace, never duplicate).

    ``staging=None`` yields the single-row parameterized form (%s
    placeholders, DBAPI executemany). With ``staging`` it yields the
    set-based form ``INSERT INTO t SELECT ... FROM staging ON CONFLICT
    ...`` — the scale path: Spark's plain JDBC writer appends the
    micro-batch into an UNLOGGED staging table in parallel, then ONE
    statement merges it (no per-row round trips, conflict handling
    entirely server-side)."""
    non_pk = [c for c in columns if c not in conflict_cols]
    if not non_pk:
        action = "DO NOTHING"
    else:
        sets = ", ".join(f"{c} = EXCLUDED.{c}" for c in non_pk)
        action = f"DO UPDATE SET {sets}"
    collist = ", ".join(columns)
    conflict = ", ".join(conflict_cols)
    if staging is None:
        params = ", ".join(["%s"] * len(columns))
        return (
            f"INSERT INTO {table} ({collist}) VALUES ({params}) "
            f"ON CONFLICT ({conflict}) {action}"
        )
    # DISTINCT ON dedupes within the staging batch itself — a micro-batch
    # can carry the same PK twice and ON CONFLICT forbids touching one
    # target row twice in a single statement. With a ``tie_breaker`` the
    # survivor is the row with the highest tie-breaker value (Postgres
    # DISTINCT ON keeps the first row per group in ORDER BY order);
    # WITHOUT one, which duplicate survives is plan-dependent — callers
    # either pass a monotonic column (event_id) or PK-dedup the batch
    # upstream (dedup_primary_key) before the append.
    order = ", ".join(conflict_cols)
    if tie_breaker:
        order = f"{order}, {tie_breaker} DESC"
    return (
        f"INSERT INTO {table} ({collist}) "
        f"SELECT DISTINCT ON ({conflict}) {collist} FROM {staging} "
        f"ORDER BY {order} "
        f"ON CONFLICT ({conflict}) {action}"
    )


def staging_table_ddl(table: str, staging: str) -> list[str]:
    """UNLOGGED staging table matching the target's shape (LIKE copies
    column types; unlogged skips WAL — it holds one micro-batch and is
    truncated after the merge)."""
    return [
        f"CREATE UNLOGGED TABLE IF NOT EXISTS {staging} "
        f"(LIKE {table} INCLUDING DEFAULTS)",
        f"TRUNCATE {staging}",
    ]


def upsert_batch_statements(
    table: str,
    columns: list[str],
    staging: str,
    tie_breaker: str | None = None,
) -> dict[str, list[str] | str]:
    """The full micro-batch upsert recipe for ``foreachBatch``:

    1. ``pre``  — run via one JDBC connection (DDL + truncate),
    2. the Spark writer appends the batch into ``staging`` (parallel),
    3. ``merge`` — one set-based INSERT..ON CONFLICT,
    4. ``post`` — truncate for the next epoch.

    Returned as SQL text so the executor seam (and the golden tests)
    stay free of any driver/connection dependency."""
    return {
        "pre": staging_table_ddl(table, staging),
        "merge": upsert_sql(
            table, columns, staging=staging, tie_breaker=tie_breaker
        ),
        "post": [f"TRUNCATE {staging}"],
    }


# ---------------------------------------------------------------------------
# Writer options
# ---------------------------------------------------------------------------

def pg_writer_options(schema: T.StructType, ltss_shape: bool = True) -> dict:
    """Options for ``df.write.jdbc`` against Postgres:

    - ``createTableColumnTypes``: reference-faithful column types,
    - ``stringtype=unspecified``: lets Postgres cast string parameters
      into JSONB/geometry columns server-side (the standard JDBC
      workaround for driver-side type rigidity) — without it, a JSON
      string INSERT into a JSONB column fails the parameter type check.
    """
    types = ltss_column_types(schema) if ltss_shape else create_table_column_types(schema)
    return {
        "createTableColumnTypes": types,
        "stringtype": "unspecified",
    }
