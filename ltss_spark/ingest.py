"""Ingest dataflow — Spark-native rebuild of the reference's write path.

Reference pipeline (SURVEY.md §2.A / §3.2): HA ``state_changed`` event ->
null/unknown filter (/root/reference/custom_components/ltss/__init__.py:250-253)
-> include/exclude entity filter (__init__.py:254, schema __init__.py:55-67)
-> ``LTSS.from_event`` row projection (models.py:46-72) with NUL
sanitization (models.py:67) and lat/lon extraction (models.py:54-62) ->
single-row INSERT (__init__.py:207-211).

Here each step is a *column expression* (JVM-side, whole-stage-codegen'd, no
Python in the hot path), composed into ``events_to_states`` /
``states_from_events``; the same transform is reused verbatim by the
Structured Streaming path (ltss_spark.streaming.ingest), which is how the
queue/writer-thread machinery of the reference (at-most-once, serial)
becomes parallel micro-batches with PK dedup.
"""

from __future__ import annotations

import fnmatch
import json
from dataclasses import dataclass, field

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

#: canonical fact-table columns (reference models.py:30-35; location
#: flattened to lon/lat doubles — Spark has no geometry type, SURVEY §1.1 B7)
LTSS_COLUMNS = ("time", "entity_id", "state", "attributes", "loc_lon", "loc_lat")

#: the location-less schema variant (reference models.py:35,42-44: without
#: activate_location_extraction the table has NO location column and
#: from_event never pops lat/lon out of attributes — mirrored by the
#: reference's test_lite fixture, tests/pytest/test_databases.py:57-68)
LTSS_COLUMNS_LITE = ("time", "entity_id", "state", "attributes")


# ---------------------------------------------------------------------------
# A3: include/exclude entity filter
# ---------------------------------------------------------------------------

def glob_to_regex(pattern: str) -> str:
    """HA entity globs (documented at /root/reference/README.md:84-101) are
    compiled with ``fnmatch.translate`` upstream, so ``*`` -> ``.*``, ``?``
    -> ``.`` and ``[seq]``/``[!seq]`` are character classes. We reuse
    ``fnmatch.translate`` directly; its output (``(?s:...)\\Z`` plus a
    leading ``^`` anchor added here, since ``rlike`` is a find, not a match)
    is valid in both Python and Java regex engines."""
    return "^" + fnmatch.translate(pattern)


@dataclass(frozen=True)
class EntityFilter:
    """Declarative include/exclude filter (reference config schema
    __init__.py:55-67; applied __init__.py:254). Compiles to ONE boolean
    Column, so Catalyst can push it into the parquet scan."""

    include_domains: tuple[str, ...] = field(default=())
    include_entities: tuple[str, ...] = field(default=())
    include_globs: tuple[str, ...] = field(default=())
    exclude_domains: tuple[str, ...] = field(default=())
    exclude_entities: tuple[str, ...] = field(default=())
    exclude_globs: tuple[str, ...] = field(default=())

    def expr(self, entity_col: Column | str = "entity_id") -> Column:
        """Boolean column implementing Home Assistant's
        ``convert_include_exclude_filter`` precedence (public HA helper the
        reference imports at __init__.py:76):

        - neither side configured -> keep everything;
        - include only -> keep iff in include entities/domains/globs;
        - exclude only -> keep unless in exclude entities/domains/globs;
        - both, include domains/globs present (HA case 4a) -> listed include
          *entities* always win; otherwise a row must match an include
          domain/glob and not the exclude entities/globs;
        - both, but include has ONLY entities while exclude has
          domains/globs (HA case 4b) -> the include list only rescues
          entities caught by an exclude domain/glob; anything not excluded
          is kept;
        - both sides entity-lists only (HA case 4c) -> keep iff in
          include entities (excludes ignored).
        """
        e = F.col(entity_col) if isinstance(entity_col, str) else entity_col
        domain = F.split(e, r"\.").getItem(0)

        def _match(domains, entities, globs) -> Column | None:
            parts = []
            if domains:
                parts.append(domain.isin(*domains))
            if entities:
                parts.append(e.isin(*entities))
            if globs:
                rx = "|".join(glob_to_regex(g) for g in globs)
                parts.append(e.rlike(rx))
            if not parts:
                return None
            out = parts[0]
            for p in parts[1:]:
                out = out | p
            return out

        inc = _match(self.include_domains, self.include_entities, self.include_globs)
        exc = _match(self.exclude_domains, self.exclude_entities, self.exclude_globs)
        if inc is None and exc is None:
            return F.lit(True)
        if exc is None:
            return inc
        if inc is None:
            return ~exc
        listed = e.isin(*self.include_entities) if self.include_entities else F.lit(False)
        if self.include_domains or self.include_globs:
            # 4a: listed entities win; else must match an include domain/glob
            # and evade the exclude entities/globs
            inc_dom_glob = _match(self.include_domains, (), self.include_globs)
            exc_ent_glob = _match((), self.exclude_entities, self.exclude_globs)
            if exc_ent_glob is None:
                exc_ent_glob = F.lit(False)
            return listed | (inc_dom_glob & ~exc_ent_glob)
        if self.exclude_domains or self.exclude_globs:
            # 4b: include entities only rescue rows caught by an exclude
            # domain/glob; everything not excluded passes
            exc_dom_glob = _match(self.exclude_domains, (), self.exclude_globs)
            exc_ent = (
                e.isin(*self.exclude_entities)
                if self.exclude_entities
                else F.lit(False)
            )
            return F.when(exc_dom_glob, listed).otherwise(~exc_ent)
        # 4c: both sides are plain entity lists — include list wins outright
        return listed


# ---------------------------------------------------------------------------
# A2 / A5-A8: per-event transforms as column expressions
# ---------------------------------------------------------------------------

def valid_event_expr(entity_col: str = "entity_id", state_col: str = "state") -> Column:
    """A2 null/unknown filter (reference __init__.py:250-253): drop events
    with no entity, no state, or state == 'unknown'."""
    return (
        F.col(entity_col).isNotNull()
        & F.col(state_col).isNotNull()
        & (F.col(state_col) != "unknown")
    )


def sanitize_state(col: Column | str = "state") -> Column:
    """A6 NUL sanitization (models.py:67): Postgres text cannot hold \\x00;
    the reference replaces it with U+FFFD. We keep identical behavior."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(c, "\x00", "�")


def extract_location(attrs_col: Column | str = "attributes") -> tuple[Column, Column]:
    """A7 geo extraction (models.py:54-62): emit (lon, lat) doubles only when
    BOTH coordinates are present in the attribute JSON, else NULLs.

    Deliberate divergence from the reference: its ``if lon and lat``
    (models.py:62) uses Python truthiness, so a 0.0 coordinate (equator /
    prime meridian — a valid place) yields no location there. We use
    IS NOT NULL, which keeps 0.0 coordinates."""
    c = F.col(attrs_col) if isinstance(attrs_col, str) else attrs_col
    # try_cast, NOT cast: under Spark 4's default ANSI mode a plain cast
    # throws on a non-numeric attribute ("latitude": "unknown" — real HA
    # data), killing the whole batch/micro-batch; the contract here is
    # NULL for anything unparseable
    lat = F.get_json_object(c, "$.latitude").try_cast("double")
    lon = F.get_json_object(c, "$.longitude").try_cast("double")
    both = lat.isNotNull() & lon.isNotNull()
    return F.when(both, lon), F.when(both, lat)


#: one JSON object member named latitude/longitude with a *scalar* value
#: (string with escapes, or number/true/false/null). Inside valid JSON a
#: quote within a string value is always escaped (\\"), so the quoted key
#: cannot false-match inside a string payload.
_LOC_MEMBER = (
    r'"(?:latitude|longitude)"\s*:\s*'
    r'(?:"(?:[^"\\]|\\.)*"|[^,}\]\[{"]+)'
)


def strip_location_keys(attrs_col: Column | str = "attributes") -> Column:
    """A7's attribute-key removal (models.py:58-61 ``attrs.pop``): drop the
    latitude/longitude members from the JSON payload once extracted, as a
    pure text rewrite — every other member keeps its exact original
    rendering (numbers stay numbers, nested objects/arrays untouched), so
    ``get_json_object`` paths on the remaining attributes keep working.

    Three global regex passes (member-with-trailing-comma, then
    comma-then-member for a last member, then a lone member) keep the result
    well-formed JSON. Limitation (documented divergence): the rewrite is
    depth-blind, so a latitude/longitude key inside a *nested* object is
    removed too; HA location coordinates are top-level floats, and a
    nested-object *value* for these keys is not supported."""
    c = F.col(attrs_col) if isinstance(attrs_col, str) else attrs_col
    out = F.regexp_replace(c, _LOC_MEMBER + r"\s*,\s*", "")
    out = F.regexp_replace(out, r",\s*" + _LOC_MEMBER, "")
    out = F.regexp_replace(out, _LOC_MEMBER, "")
    return F.when(c.isNotNull(), out)


def dedup_primary_key(df: DataFrame, tie_breaker: str | None = None) -> DataFrame:
    """B9 PK(time, entity_id) uniqueness (models.py:31-32,
    migrations.py:87-103). Postgres would reject a duplicate PK; we keep
    exactly one row. With ``tie_breaker`` the survivor is the row with the
    highest tie-breaker value (deterministic); without, an arbitrary one
    (matches 'first insert wins' only as far as Spark task order goes).

    Scale note: this is a shuffle on the PK. In the partitioned layout the
    PK's ``time`` component means duplicates land in the same month
    partition, so at 100 TB the dedup runs per-partition after AQE coalesces.
    """
    if tie_breaker is None:
        return df.dropDuplicates(["time", "entity_id"])
    # ONE hash aggregation (max_by over the packed row) instead of a
    # row_number window: no per-group sort, O(1) state per PK — the shape
    # that survives 100 TB of mostly-unique keys
    others = [c for c in df.columns if c not in ("time", "entity_id")]
    packed = df.groupBy("time", "entity_id").agg(
        F.max_by(F.struct(*others), F.col(tie_breaker)).alias("__row")
    )
    return packed.select(
        "time", "entity_id", *[F.col(f"__row.{c}").alias(c) for c in others]
    )


def upgrade_legacy_states(
    legacy: DataFrame,
    id_col: str = "id",
    attr_keys: dict[str, str] | None = None,
) -> DataFrame:
    """Old-layout -> new-layout TABLE UPGRADE — the data analogue of the
    reference's in-place migration of a previously written table
    (/root/reference/custom_components/ltss/migrations.py: attributes
    TEXT->JSONB :57-66, drop the surrogate id and re-key to
    PK(time, entity_id) :87-103; exercised by its released-version->HEAD
    upgrade test, tests/bats/test_integration.bats:150-193).

    A legacy table carries a surrogate BIGSERIAL ``id`` and may therefore
    hold several inserts of the same (time, entity_id). The upgrade:

    1. re-keys to PK(time, entity_id), keeping the LATEST insert per key
       (max id — the row the new PK would have retained) via the same
       single hash aggregation as :func:`dedup_primary_key`;
    2. drops the surrogate id column;
    3. makes the attributes text QUERYABLE as JSON by materializing the
       hot key(s) as typed columns (:func:`materialize_attrs`) — the
       engine's JSONB/GIN analogue: parquet stats + pushdown on the typed
       column instead of a JSON-blob index.

    Pure DataFrame ops — one PK shuffle, no driver loop — so the upgrade
    of a 100 TB table runs as an ordinary distributed rewrite job.

    ``attr_keys`` names the hot attribute keys to materialize (key ->
    Spark type). It is TABLE-SPECIFIC by nature — defaulting to the
    fixture's ``{"k": "int"}`` would hand any real table a silently
    all-NULL ``attr_k`` column (ADVICE r3). The ``ddl_upgrade`` registry
    entry passes the fixture's map explicitly; ``None`` skips
    materialization entirely (the caller can run
    :func:`materialize_attrs` later with the right keys).
    """
    upgraded = dedup_primary_key(
        legacy, tie_breaker=id_col
    ).drop(id_col)
    if not attr_keys:
        return upgraded
    return materialize_attrs(upgraded, attr_keys)


# ---------------------------------------------------------------------------
# The full event -> canonical-state transform
# ---------------------------------------------------------------------------

class AttributeEncoder(json.JSONEncoder):
    """HA ``JSONEncoder`` parity for raw attribute dicts (the reference
    serializes attributes with it as the engine's json_serializer,
    __init__.py:263-267): datetime/date/time -> ISO-8601 string, set ->
    list, objects exposing ``as_dict()`` -> their dict. Anything else
    non-serializable still raises TypeError — callers map that to the
    drop/dead-letter policy."""

    def default(self, o):
        import datetime as _dt

        if isinstance(o, (_dt.datetime, _dt.date, _dt.time)):
            return o.isoformat()
        if isinstance(o, (set, frozenset)):
            return sorted(o, key=repr)  # deterministic, HA emits list(o)
        as_dict = getattr(o, "as_dict", None)
        if callable(as_dict):
            return as_dict()
        return super().default(o)


def encode_attributes(attrs) -> str | None:
    """Attribute dict -> the canonical JSON string column, or None when the
    dict is not JSON-serializable — the reference drops such events with a
    warning (__init__.py:212-216); a None here flows into the dead-letter
    divert (split_dead_letter) instead of vanishing. Runs producer-side
    (event adapters feeding createDataFrame / a Kafka producer), not in the
    Spark hot path — inside the engine attributes are already strings."""
    try:
        return json.dumps(attrs, cls=AttributeEncoder, separators=(",", ":"))
    except (TypeError, ValueError):
        return None


def events_from_ha(spark, raw_events: list[dict]) -> DataFrame:
    """Producer-side event adapter (A1): raw HA ``state_changed`` payloads
    (``{"entity_id", "new_state": {"state", "attributes"}, "time_fired"}``,
    the shape the reference's listener receives, __init__.py:245-254 /
    from_event models.py:46-72) -> an events DataFrame in the canonical
    pre-ingest shape (time_fired, entity_id, state, attributes-as-JSON).

    Attribute serialization happens HERE, with :class:`AttributeEncoder`
    (HA JSONEncoder parity: datetime/date/time -> ISO-8601, set -> list,
    ``as_dict()`` objects -> dict, reference __init__.py:263-267). A dict
    the encoder cannot serialize yields attributes=NULL — the reference
    DROPS that event with a warning (__init__.py:212-216); here the NULL
    flows into :func:`split_dead_letter`'s ``unserializable_attributes``
    reason so nothing is silently lost. Bounded driver-side work: this
    adapter shapes the entry batch (a test fixture, a Kafka producer
    callback), never a 100 TB table — inside the engine attributes are
    already strings."""
    import datetime as _dt

    rows = []
    for ev in raw_events:
        ns = ev.get("new_state") or {}
        tf = ev.get("time_fired")
        if isinstance(tf, str):
            tf = _dt.datetime.fromisoformat(tf)
        # HA state objects always carry an attributes dict (possibly
        # empty — from_event does dict(state.attributes), models.py:52),
        # so a missing key means {} and a NULL in the output column means
        # exactly one thing: the encoder could not serialize the payload
        attrs = ns.get("attributes") or {}
        # NUL sanitization at event construction, like the reference's
        # LTSS.from_event (models.py:67) — Postgres TEXT rejects \x00, and
        # this frame can feed make_pg_upsert_sink directly without passing
        # through events_to_states' sanitize_state column.
        state = ns.get("state")
        if isinstance(state, str):
            state = state.replace("\x00", "�")
        rows.append(
            (
                tf,
                ev.get("entity_id"),
                state,
                encode_attributes(attrs),
            )
        )
    return spark.createDataFrame(
        rows,
        "time_fired timestamp, entity_id string, state string, attributes string",
    )


def split_dead_letter(
    df: DataFrame,
    entity_col: str = "entity_id",
    state_col: str = "state",
    attrs_col: str | None = None,
) -> tuple[DataFrame, DataFrame]:
    """A10 error policy (reference __init__.py:212-216, 229-235) as data:
    the reference *drops* bad events with a log line; we divert them to a
    dead-letter DataFrame with a machine-readable reason — same pipeline,
    nothing silently lost, and the dead-letter side can be re-driven after
    a fix. Returns (valid, dead); ``dead`` carries a ``reject_reason``.

    One pass, two filters over the same scan: Spark caches nothing here —
    at scale, write both sides from one ``foreachBatch`` body instead of
    re-scanning.
    """
    reason = (
        F.when(F.col(entity_col).isNull(), F.lit("null_entity_id"))
        .when(F.col(state_col).isNull(), F.lit("null_state"))
        .when(F.col(state_col) == "unknown", F.lit("unknown_state"))
    )
    valid_expr = valid_event_expr(entity_col, state_col)
    if attrs_col is not None:
        # opt-in A10 reason for adapter-fed frames (events_from_ha): a
        # NULL attributes column there means the HA JSONEncoder could not
        # serialize the payload — the reference's drop-with-warning case
        # (__init__.py:212-216), diverted instead of dropped
        reason = reason.when(
            F.col(attrs_col).isNull(), F.lit("unserializable_attributes")
        )
        valid_expr = valid_expr & F.col(attrs_col).isNotNull()
    dead = df.withColumn("reject_reason", reason).filter(
        F.col("reject_reason").isNotNull()
    )
    valid = df.filter(valid_expr)
    return valid, dead


def events_to_states(
    events: DataFrame,
    entity_filter: EntityFilter | None = None,
    with_location: bool = True,
) -> DataFrame:
    """A1->A3->A5-A8 pipeline over a DataFrame already shaped like HA events
    (columns: time_fired, entity_id, state, attributes). Used by both batch
    tests (FIXTURES.md F1) and the streaming path.

    ``with_location=False`` is the reference's non-activated schema
    (models.py:35,42-44 — irreversible opt-in in Postgres, a plain flag
    here): the 4-column LTSS_COLUMNS_LITE shape, with lat/lon left inside
    attributes exactly as they arrived (from_event only pops them when the
    location column exists).
    """
    df = events.filter(valid_event_expr())
    if entity_filter is not None:
        df = df.filter(entity_filter.expr())
    if not with_location:
        return df.select(
            F.col("time_fired").alias("time"),
            F.col("entity_id"),
            sanitize_state().alias("state"),
            F.col("attributes"),
        )
    lon, lat = extract_location()
    return df.select(
        F.col("time_fired").alias("time"),
        F.col("entity_id"),
        sanitize_state().alias("state"),
        strip_location_keys().alias("attributes"),
        lon.alias("loc_lon"),
        lat.alias("loc_lat"),
    )


def states_from_events(events: DataFrame) -> DataFrame:
    """Adapt the driver's ``events`` table (event_id, ts, user_id, event_type,
    value, props — TESTDATA.md) into the canonical ltss shape (FIXTURES.md
    F3): entity_id := '<event_type>.u<user_id>' (domain = event_type), state
    := value printf'd '%.2f' (HA states are stringly typed, SURVEY §1.4),
    attributes := props JSON.

    ``printf('%.2f')`` rather than CAST keeps the string rendering of
    doubles identical between Spark and the DuckDB oracle.
    """
    return events.select(
        F.col("ts").alias("time"),
        F.concat(F.col("event_type"), F.lit(".u"), F.col("user_id")).alias("entity_id"),
        F.format_string("%.2f", F.col("value")).alias("state"),
        F.col("props").alias("attributes"),
        F.col("event_id"),
    )


#: oracle-side mirror of states_from_events (shared by several queries)
STATES_FROM_EVENTS_SQL = """
SELECT ts AS time,
       event_type || '.u' || CAST(user_id AS VARCHAR) AS entity_id,
       printf('%.2f', value) AS state,
       props AS attributes,
       event_id
FROM events
"""


def materialize_attrs(
    df: DataFrame,
    keys: dict[str, str],
    attrs_col: str = "attributes",
) -> DataFrame:
    """Materialize hot JSON attribute keys as typed columns (`keys` maps
    attribute name -> Spark type). This is the engine's answer to the
    reference's GIN index (models.py:75-77): instead of indexing the JSON
    blob, promote the fields queries actually touch so predicates reach
    parquet stats/pushdown, and keep the blob lossless alongside. Columns
    are named ``attr_<key>``; try-cast semantics (NULL on type mismatch)
    match TRY_CAST in the oracle."""
    c = F.col(attrs_col)
    out = df
    for k, t in keys.items():
        out = out.withColumn(
            f"attr_{k}", F.get_json_object(c, f"$.{k}").try_cast(t)
        )
    return out
