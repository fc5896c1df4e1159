"""Behavioral ingest tests — the reference's observable write-path semantics
(FIXTURES.md F4; reference cites in each test):

- null/unknown filtering        (__init__.py:250-253)
- include/exclude precedence    (__init__.py:55-67, README.md:71-101)
- NUL sanitization              (models.py:67)
- geo extraction rules          (models.py:54-62)
- PK dedup                      (models.py:31-32)
"""

import datetime as dt

import pyspark.sql.functions as F
import pytest

from ltss_spark.ingest import (
    EntityFilter,
    dedup_primary_key,
    events_to_states,
    extract_location,
    sanitize_state,
    strip_location_keys,
    valid_event_expr,
)

T0 = dt.datetime(2024, 1, 1, 12, 0, 0)


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "time_fired timestamp, entity_id string, state string, attributes string"
    )


def test_null_unknown_filter(spark):
    """A2: drop events with no entity_id, no state, or state == 'unknown'."""
    df = _events(
        spark,
        [
            (T0, "sensor.a", "21.5", "{}"),
            (T0, None, "21.5", "{}"),
            (T0, "sensor.b", None, "{}"),
            (T0, "sensor.c", "unknown", "{}"),
        ],
    )
    kept = df.filter(valid_event_expr()).select("entity_id").collect()
    assert [r.entity_id for r in kept] == ["sensor.a"]


def test_nul_sanitization(spark):
    """A6: NUL byte becomes U+FFFD (Postgres text cannot store \\x00)."""
    df = _events(spark, [(T0, "sensor.a", "bad\x00state", "{}")])
    out = df.select(sanitize_state().alias("s")).first()
    assert out.s == "bad�state"


def test_geo_extraction_both_coords(spark):
    """A7: lat+lon both present -> extracted; keys removed from attributes."""
    attrs = '{"latitude": 57.7, "longitude": 11.97, "name": "gbg"}'
    df = _events(spark, [(T0, "person.x", "home", attrs)])
    lon, lat = extract_location()
    row = df.select(
        lon.alias("lon"), lat.alias("lat"), strip_location_keys().alias("attrs")
    ).first()
    assert row.lon == pytest.approx(11.97)
    assert row.lat == pytest.approx(57.7)
    assert "latitude" not in row.attrs and "longitude" not in row.attrs
    assert "gbg" in row.attrs


def test_geo_extraction_single_coord_is_null(spark):
    """A7: either coordinate missing -> location NULL (models.py:62),
    but the present key is still stripped (models.py:58-61 pops both)."""
    df = _events(spark, [(T0, "person.x", "home", '{"latitude": 57.7}')])
    lon, lat = extract_location()
    row = df.select(
        lon.alias("lon"), lat.alias("lat"), strip_location_keys().alias("attrs")
    ).first()
    assert row.lon is None and row.lat is None
    assert "latitude" not in row.attrs


def test_strip_location_is_lossless_for_other_members(spark):
    """A7 attribute strip must not retype the surviving payload: numbers
    stay numbers, booleans stay booleans, nested objects/arrays survive
    verbatim (reference stores lossless JSONB, models.py:58-61), so
    get_json_object paths keep working downstream."""
    import json

    attrs = (
        '{"latitude": 57.7, "n": 42, "ok": true, '
        '"nested": {"a": [1, 2], "b": "x"}, "longitude": 11.97}'
    )
    df = _events(spark, [(T0, "person.x", "home", attrs)])
    row = df.select(
        strip_location_keys().alias("attrs"),
        F.get_json_object(strip_location_keys(), "$.nested.a[1]").alias("deep"),
    ).first()
    parsed = json.loads(row.attrs)
    assert parsed == {"n": 42, "ok": True, "nested": {"a": [1, 2], "b": "x"}}
    assert row.deep == "2"


def test_strip_location_edge_shapes(spark):
    """Strip stays well-formed JSON when the keys are first, last, lone,
    or absent; string coordinates (device trackers send these) also go."""
    cases = [
        ('{"latitude": 1, "a": 2}', {"a": 2}),
        ('{"a": 2, "longitude": 1}', {"a": 2}),
        ('{"latitude": 1, "longitude": 2}', {}),
        ('{"latitude": "57.7", "a": "x, y"}', {"a": "x, y"}),
        ('{"a": 2}', {"a": 2}),
        ("{}", {}),
    ]
    import json

    df = _events(
        spark, [(T0, f"e.{i}", "s", attrs) for i, (attrs, _) in enumerate(cases)]
    )
    got = {
        r.entity_id: json.loads(r.attrs)
        for r in df.select("entity_id", strip_location_keys().alias("attrs")).collect()
    }
    for i, (_, want) in enumerate(cases):
        assert got[f"e.{i}"] == want, f"case {i}"


def test_pk_dedup_deterministic(spark):
    """B9: PK(time, entity_id) uniqueness with highest tie-breaker winning."""
    df = spark.createDataFrame(
        [
            (T0, "sensor.a", "first", 1),
            (T0, "sensor.a", "second", 2),
            (T0, "sensor.b", "only", 3),
        ],
        "time timestamp, entity_id string, state string, event_id long",
    )
    out = {r.entity_id: r.state for r in dedup_primary_key(df, "event_id").collect()}
    assert out == {"sensor.a": "second", "sensor.b": "only"}


def test_events_to_states_pipeline(spark):
    """A1->A8 composed: filter + sanitize + geo + attr-strip in one pass."""
    df = _events(
        spark,
        [
            (T0, "sensor.temp", "21.5\x00", '{"latitude": 1.0, "longitude": 2.0}'),
            (T0, "sensor.skip", "unknown", "{}"),
            (T0, "light.on", "on", '{"brightness": 5}'),
        ],
    )
    out = {r.entity_id: r for r in events_to_states(df).collect()}
    assert set(out) == {"sensor.temp", "light.on"}
    assert out["sensor.temp"].state == "21.5�"
    assert out["sensor.temp"].loc_lon == pytest.approx(2.0)
    assert "latitude" not in out["sensor.temp"].attributes
    assert out["light.on"].loc_lat is None


# ---------------------------------------------------------------------------
# Include/exclude filter semantics (HA convert_include_exclude_filter)
# ---------------------------------------------------------------------------

ENTITIES = [
    "sensor.temp_kitchen",
    "sensor.temp_attic",
    "sensor.weather_wind",
    "light.kitchen",
    "person.john",
]


def _apply(spark, flt: EntityFilter) -> set[str]:
    df = spark.createDataFrame([(e,) for e in ENTITIES], "entity_id string")
    return {r.entity_id for r in df.filter(flt.expr()).collect()}


def test_filter_empty_keeps_all(spark):
    assert _apply(spark, EntityFilter()) == set(ENTITIES)


def test_filter_include_only(spark):
    flt = EntityFilter(include_domains=("light",), include_entities=("person.john",))
    assert _apply(spark, flt) == {"light.kitchen", "person.john"}


def test_filter_include_glob(spark):
    flt = EntityFilter(include_globs=("sensor.temp_*",))
    assert _apply(spark, flt) == {"sensor.temp_kitchen", "sensor.temp_attic"}


def test_filter_exclude_only(spark):
    flt = EntityFilter(exclude_domains=("sensor",))
    assert _apply(spark, flt) == {"light.kitchen", "person.john"}


def test_filter_both_listed_include_wins(spark):
    """Listed include entities always pass, even matching an exclude glob."""
    flt = EntityFilter(
        include_domains=("light",),
        include_entities=("sensor.weather_wind",),
        exclude_globs=("sensor.*",),
    )
    assert _apply(spark, flt) == {"light.kitchen", "sensor.weather_wind"}


def test_filter_both_exclude_refines_include_domain(spark):
    flt = EntityFilter(
        include_domains=("sensor",),
        exclude_entities=("sensor.temp_attic",),
    )
    assert _apply(spark, flt) == {"sensor.temp_kitchen", "sensor.weather_wind"}


def test_glob_to_regex_matches_fnmatch_property():
    """Property: our glob compiler agrees with Python's fnmatch (the exact
    model HA compiles entity globs with) on randomized patterns and
    candidates — including regex metacharacters and [seq]/[!seq]
    character classes."""
    import fnmatch
    import random
    import re

    from ltss_spark.ingest import glob_to_regex

    rng = random.Random(31)
    alphabet = "ab._*?+[]()d!"
    for _ in range(500):
        pat = "".join(rng.choice(alphabet) for _ in range(rng.randrange(1, 8)))
        cand = "".join(rng.choice("ab._d!") for _ in range(rng.randrange(0, 8)))
        got = re.search(glob_to_regex(pat), cand) is not None
        want = fnmatch.fnmatchcase(cand, pat)
        assert got == want, f"pattern={pat!r} candidate={cand!r} got={got} want={want}"


def test_filter_glob_bracket_class(spark):
    """fnmatch [seq] classes work through Spark's Java-regex rlike too."""
    flt = EntityFilter(include_globs=("sensor.temp_[ak]*",))
    assert _apply(spark, flt) == {"sensor.temp_kitchen", "sensor.temp_attic"}
    flt = EntityFilter(include_globs=("sensor.temp_[!a]*",))
    assert _apply(spark, flt) == {"sensor.temp_kitchen"}


def test_filter_4b_exclude_domains_with_include_entities(spark):
    """HA case 4b: include has ONLY entities while exclude has domains —
    the include list rescues entities caught by the exclude domain, and
    every entity not excluded at all is kept (not dropped)."""
    flt = EntityFilter(
        include_entities=("sensor.temp_attic",),
        exclude_domains=("sensor",),
    )
    # sensor.* excluded except the rescued one; light/person untouched
    assert _apply(spark, flt) == {
        "sensor.temp_attic",
        "light.kitchen",
        "person.john",
    }


def test_filter_4b_exclude_entities_also_apply(spark):
    """HA case 4b: rows not matching an exclude domain/glob still drop if
    in exclude_entities."""
    flt = EntityFilter(
        include_entities=("sensor.temp_attic",),
        exclude_globs=("sensor.temp_*",),
        exclude_entities=("light.kitchen",),
    )
    assert _apply(spark, flt) == {
        "sensor.temp_attic",
        "sensor.weather_wind",
        "person.john",
    }


def test_filter_4c_entity_lists_only(spark):
    """HA case 4c: both sides plain entity lists — include list wins
    outright, excludes ignored."""
    flt = EntityFilter(
        include_entities=("sensor.temp_attic", "light.kitchen"),
        exclude_entities=("light.kitchen",),
    )
    assert _apply(spark, flt) == {"sensor.temp_attic", "light.kitchen"}


def test_dedup_primary_key_invariants(spark):
    """Property on random data: exactly one row per (time, entity_id), and
    with a tie-breaker the survivor is the max-tie-breaker row."""
    import datetime as dt
    import random

    from ltss_spark.ingest import dedup_primary_key

    rng = random.Random(13)
    base = dt.datetime(2024, 1, 1)
    rows = [
        (
            base + dt.timedelta(seconds=rng.randrange(5)),
            f"e{rng.randrange(3)}",
            f"s{i}",
            i,
        )
        for i in range(200)
    ]
    df = spark.createDataFrame(rows, "time timestamp, entity_id string, state string, event_id long")
    out = dedup_primary_key(df, tie_breaker="event_id").collect()
    seen = {}
    for r in out:
        key = (r.time, r.entity_id)
        assert key not in seen, f"duplicate PK {key}"
        seen[key] = r.event_id
    # survivor check against a python-side model
    want = {}
    for t, e, _s, i in rows:
        key = (t, e)
        want[key] = max(want.get(key, -1), i)
    assert {k: v for k, v in seen.items()} == want


def test_split_dead_letter_partition(spark):
    """valid + dead partition the input exactly; reasons follow the
    first-failing-rule order."""
    import datetime as dt

    from ltss_spark.ingest import split_dead_letter

    rows = [
        (dt.datetime(2024, 1, 1), "a.x", "1.0"),
        (dt.datetime(2024, 1, 1), None, "2.0"),
        (dt.datetime(2024, 1, 1), "b.y", None),
        (dt.datetime(2024, 1, 1), "c.z", "unknown"),
        (dt.datetime(2024, 1, 1), None, "unknown"),  # first rule wins
    ]
    df = spark.createDataFrame(rows, "time timestamp, entity_id string, state string")
    valid, dead = split_dead_letter(df)
    assert valid.count() + dead.count() == df.count()
    reasons = {
        (r.entity_id, r.state): r.reject_reason for r in dead.collect()
    }
    assert reasons[(None, "2.0")] == "null_entity_id"
    assert reasons[("b.y", None)] == "null_state"
    assert reasons[("c.z", "unknown")] == "unknown_state"
    assert reasons[(None, "unknown")] == "null_entity_id"
    assert valid.collect()[0].entity_id == "a.x"


def test_encode_attributes_ha_special_types(spark):
    """HA JSONEncoder parity (reference __init__.py:263-267): datetime ->
    isoformat, set -> list, as_dict() objects -> dict; a non-serializable
    dict encodes to None (the reference drops it with a warning,
    __init__.py:212-216 — here None feeds the dead-letter divert). The
    encoded string stays queryable with get_json_object downstream."""
    import datetime as dt

    from ltss_spark.ingest import encode_attributes

    class Zone:
        def as_dict(self):
            return {"name": "home", "radius": 100}

    s = encode_attributes(
        {
            "last_seen": dt.datetime(2024, 1, 2, 3, 4, 5),
            "on_days": {"mon"},
            "zone": Zone(),
            "nested": {"a": [1, 2.5, None]},
        }
    )
    assert '"last_seen":"2024-01-02T03:04:05"' in s
    assert '"on_days":["mon"]' in s
    assert '"zone":{"name":"home","radius":100}' in s

    assert encode_attributes({"bad": object()}) is None

    # downstream: typed access over the encoded string, JVM-side
    df = spark.createDataFrame([(s,)], "attributes string")
    row = df.select(
        F.get_json_object("attributes", "$.last_seen").alias("seen"),
        F.get_json_object("attributes", "$.zone.radius").cast("int").alias("radius"),
        F.get_json_object("attributes", "$.nested.a[1]").cast("double").alias("a1"),
    ).first()
    assert row.seen == "2024-01-02T03:04:05"
    assert row.radius == 100
    assert row.a1 == 2.5


def test_extract_location_non_numeric_is_null_not_ansi_crash(spark):
    """ANSI mode: a malformed coordinate attribute must yield NULL location,
    not throw CAST_INVALID_INPUT and kill the batch."""
    from ltss_spark.ingest import extract_location

    df = spark.createDataFrame(
        [
            ('{"latitude": "unknown", "longitude": "1.0"}',),
            ('{"latitude": {"nested": 1}, "longitude": "2.0"}',),
            ('{"latitude": "3.5", "longitude": "4.5"}',),
        ],
        "attributes string",
    )
    lon, lat = extract_location("attributes")
    rows = df.select(lon.alias("lon"), lat.alias("lat")).collect()
    assert rows[0].lon is None and rows[0].lat is None
    assert rows[1].lon is None and rows[1].lat is None
    assert rows[2].lon == 4.5 and rows[2].lat == 3.5


def test_events_from_ha_serialize_or_deadletter(spark):
    """End-to-end HA JSONEncoder parity corner (VERDICT r3 item 6,
    reference __init__.py:263-267 + 212-216): raw state_changed payloads
    whose attributes carry datetime/set/as_dict/nested values serialize
    into the canonical JSON column; a payload the encoder cannot
    serialize flows into split_dead_letter's unserializable_attributes
    reason instead of vanishing — the reference logs-and-drops, we
    divert."""
    import datetime as dt

    from ltss_spark.ingest import events_from_ha, events_to_states, split_dead_letter

    class Zone:
        def as_dict(self):
            return {"name": "home", "radius": 100}

    raw = [
        {
            "entity_id": "sensor.temp",
            "time_fired": dt.datetime(2024, 3, 1, 10, 0, 0),
            "new_state": {
                "state": "21.5",
                "attributes": {
                    "last_seen": dt.datetime(2024, 3, 1, 9, 59),
                    "on_days": {"mon", "fri"},
                    "zone": Zone(),
                    "nested": {"a": [1, 2.5, None]},
                },
            },
        },
        {
            "entity_id": "sensor.bad",
            "time_fired": dt.datetime(2024, 3, 1, 10, 1, 0),
            "new_state": {
                "state": "on",
                "attributes": {"handle": object()},  # not serializable
            },
        },
        {
            "entity_id": "sensor.empty",
            "time_fired": dt.datetime(2024, 3, 1, 10, 2, 0),
            "new_state": {"state": "off"},  # no attributes -> {} like HA
        },
        {
            "entity_id": "sensor.unknown",
            "time_fired": dt.datetime(2024, 3, 1, 10, 3, 0),
            "new_state": {"state": "unknown", "attributes": {}},
        },
    ]
    events = events_from_ha(spark, raw)
    valid, dead = split_dead_letter(events, attrs_col="attributes")

    reasons = {r.entity_id: r.reject_reason for r in dead.collect()}
    assert reasons == {
        "sensor.bad": "unserializable_attributes",
        "sensor.unknown": "unknown_state",
    }

    rows = {r.entity_id: r for r in valid.collect()}
    assert set(rows) == {"sensor.temp", "sensor.empty"}
    assert rows["sensor.empty"].attributes == "{}"
    got = rows["sensor.temp"].attributes
    assert '"last_seen":"2024-03-01T09:59:00"' in got
    assert '"on_days":["fri","mon"]' in got  # set -> sorted list, stable
    assert '"zone":{"name":"home","radius":100}' in got

    # and the valid side flows into the canonical transform unchanged
    states = events_to_states(valid, with_location=False)
    st = {r.entity_id: r.state for r in states.collect()}
    assert st == {"sensor.temp": "21.5", "sensor.empty": "off"}


def test_events_from_ha_sanitizes_nul_state(spark):
    """NUL sanitization at event construction, like the reference's
    LTSS.from_event (models.py:67): a \\x00 in the raw state must become
    U+FFFD in the frame itself, so a direct events_from_ha ->
    make_pg_upsert_sink wiring never ships \\x00 to a Postgres TEXT
    column."""
    import datetime as dt

    from ltss_spark.ingest import events_from_ha

    raw = [
        {
            "entity_id": "sensor.nul",
            "time_fired": dt.datetime(2024, 3, 1, 10, 0, 0),
            "new_state": {"state": "a\x00b", "attributes": {}},
        }
    ]
    (row,) = events_from_ha(spark, raw).collect()
    assert row.state == "a�b"


def test_filter_precedence_property_vs_python_reference(spark):
    """Property test: the compiled Column must implement HA's
    convert_include_exclude_filter precedence (cases 1-4c in the
    EntityFilter docstring) for EVERY config shape. The oracle is a pure
    Python restatement evaluated with fnmatch — an independent execution
    path (the Column goes through glob_to_regex -> Java regex -> Catalyst
    boolean algebra), so regex translation or precedence bugs diverge."""
    import fnmatch as fn
    import itertools

    from ltss_spark.ingest import EntityFilter

    DOMAINS = ("light", "sensor", "person")
    NAMES = ("a", "b", "temp_x", "temp_y")
    ENTITIES = [f"{d}.{n}" for d in DOMAINS for n in NAMES]
    GLOBS = ("sensor.temp_*", "*.a", "light.?", "person.*")

    def py_keep(entity, f: EntityFilter) -> bool:
        domain = entity.split(".")[0]

        def match(ds, es, gs):
            return (
                domain in ds
                or entity in es
                or any(fn.fnmatch(entity, g) for g in gs)
            )

        has_inc = bool(
            f.include_domains or f.include_entities or f.include_globs
        )
        has_exc = bool(
            f.exclude_domains or f.exclude_entities or f.exclude_globs
        )
        if not has_inc and not has_exc:
            return True
        if not has_exc:
            return match(f.include_domains, f.include_entities, f.include_globs)
        if not has_inc:
            return not match(
                f.exclude_domains, f.exclude_entities, f.exclude_globs
            )
        listed = entity in f.include_entities
        if f.include_domains or f.include_globs:
            return listed or (
                match(f.include_domains, (), f.include_globs)
                and not match((), f.exclude_entities, f.exclude_globs)
            )
        if f.exclude_domains or f.exclude_globs:
            if match(f.exclude_domains, (), f.exclude_globs):
                return listed
            return entity not in f.exclude_entities
        return listed

    df = spark.createDataFrame([(e,) for e in ENTITIES], "entity_id string")

    # seeded sweep over the config lattice: every combination of
    # (domains x entities x globs) presence on both sides, with two value
    # choices per present slot — 200+ configs covering all 4a/4b/4c arms
    import random

    rng = random.Random(42)
    cases = []
    for inc_d, inc_e, inc_g, exc_d, exc_e, exc_g in itertools.product(
        (0, 1), repeat=6
    ):
        for _ in range(4):
            cases.append(
                EntityFilter(
                    include_domains=tuple(rng.sample(DOMAINS, inc_d and rng.randint(1, 2))),
                    include_entities=tuple(rng.sample(ENTITIES, inc_e and rng.randint(1, 3))),
                    include_globs=tuple(rng.sample(GLOBS, inc_g and rng.randint(1, 2))),
                    exclude_domains=tuple(rng.sample(DOMAINS, exc_d and rng.randint(1, 2))),
                    exclude_entities=tuple(rng.sample(ENTITIES, exc_e and rng.randint(1, 3))),
                    exclude_globs=tuple(rng.sample(GLOBS, exc_g and rng.randint(1, 2))),
                )
            )
    # ONE action for all configs: every filter compiles to a boolean
    # Column, so evaluate them as parallel columns of a single select —
    # 256 Spark jobs collapse into one
    import pyspark.sql.functions as F

    wide = df.select(
        "entity_id", *[f.expr().alias(f"c{i}") for i, f in enumerate(cases)]
    ).collect()
    mismatches = []
    for i, f in enumerate(cases):
        want = {e for e in ENTITIES if py_keep(e, f)}
        got = {r.entity_id for r in wide if r[f"c{i}"]}
        if got != want:
            mismatches.append((f, sorted(got ^ want)))
    assert not mismatches, mismatches[:3]
