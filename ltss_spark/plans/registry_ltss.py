"""Registry part 3: the ltss reference-parity surface — ingest transform,
latest-state, time buckets, range scans, JSON attribute predicates, as-of
join, gap-fill, geo, partitioned sink, streaming ingest (SURVEY.md §2.A/§2.B
and §2.C join_asof, ts_gapfill, geo_distance, sink_partitioned,
stream_ingest)."""

from __future__ import annotations

import pyspark.sql.functions as F

from ltss_spark.functions.numeric import dsum, oracle_dsum
from ltss_spark.ingest import STATES_FROM_EVENTS_SQL, dedup_primary_key, states_from_events
from ltss_spark.operators.asof import asof_join
from ltss_spark.operators.gapfill import time_bucket_gapfill, time_bucket_interpolate
from ltss_spark.operators.geo import haversine_km, in_bbox
from ltss_spark.operators.timeseries import time_bucket_agg, time_in_state
from ltss_spark.plans.registry import _t, register, register_views
from ltss_spark.scratch import scratch_dir, session_tag

#: oracle CTE for the canonical state table (mirrors states_from_events)
_STATES_CTE = f"states AS ({STATES_FROM_EVENTS_SQL})"


@register(
    "ltss_states",
    f"""
    WITH {_STATES_CTE},
    deduped AS (
      SELECT *, row_number() OVER (PARTITION BY time, entity_id
                                   ORDER BY event_id DESC) AS rn
      FROM states
      WHERE entity_id IS NOT NULL AND state IS NOT NULL AND state <> 'unknown'
    )
    SELECT time, entity_id, state, attributes FROM deduped WHERE rn = 1
    """,
    survey="A2 A5 A6 A8 B9 stream_ingest(batch form) project",
)
def ltss_states(spark, sf_dir):
    """The reference's full write-path transform (SURVEY §3.2 steps 1-5) as
    one declarative plan: validity filter (A2), event->row projection (A5),
    PK dedup (B9, models.py:31-32) with deterministic survivor."""
    from ltss_spark.ingest import valid_event_expr

    states = states_from_events(_t(spark, sf_dir, "events")).filter(valid_event_expr())
    return dedup_primary_key(states, tie_breaker="event_id").select(
        "time", "entity_id", "state", "attributes"
    )


@register(
    "ltss_geo_wkt",
    """
    WITH geo AS (
      SELECT event_id,
             CAST(CAST(user_id % 360 AS DOUBLE) - 180.0 + 0.5 AS DOUBLE) AS loc_lon,
             CAST(CAST(user_id % 178 AS DOUBLE) - 89.0 + 0.25 AS DOUBLE) AS loc_lat
      FROM events
    )
    SELECT event_id,
           printf('POINT(%.6f %.6f)', loc_lon, loc_lat) AS wkt,
           loc_lon AS rt_lon,
           loc_lat AS rt_lat
    FROM geo
    """,
    survey="B7 geo_distance (WKT interop column: ST_AsText / ST_GeomFromText analogue)",
)
def ltss_geo_wkt(spark, sf_dir):
    """WKT interop (SURVEY §1.1: store lon/lat doubles PLUS a WKT string
    for tools that speak geometry text, the reference's POINT column via
    ST_AsText, models.py:44): serialize coordinates to POINT(x y) and parse
    them back — the oracle pins both the exact string format and the
    lossless round-trip."""
    from ltss_spark.operators.geo import from_wkt, to_wkt

    e = _t(spark, sf_dir, "events")
    lat = (F.col("user_id") % 178).cast("double") - 89.0 + 0.25
    lon = (F.col("user_id") % 360).cast("double") - 180.0 + 0.5
    rt_lon, rt_lat = from_wkt(F.col("wkt"))
    return e.select("event_id", to_wkt(lon, lat).alias("wkt")).select(
        "event_id", "wkt", rt_lon.alias("rt_lon"), rt_lat.alias("rt_lat")
    )


@register(
    "ltss_geo_ingest",
    """
    WITH geo AS (
      SELECT event_id,
             event_type || '.u' || CAST(user_id AS VARCHAR) AS entity_id,
             '{"latitude": ' || CAST(CAST(user_id % 178 AS DOUBLE) - 89.0 + 0.25 AS VARCHAR)
               || ', "longitude": ' || CAST(CAST(user_id % 360 AS DOUBLE) - 180.0 + 0.5 AS VARCHAR)
               || ', "k": ' || CAST(event_id % 100 AS VARCHAR) || '}' AS attributes
      FROM events
    )
    SELECT event_id, entity_id,
           CAST(CAST(user_id % 360 AS DOUBLE) - 180.0 + 0.5 AS DOUBLE) AS loc_lon,
           CAST(CAST(user_id % 178 AS DOUBLE) - 89.0 + 0.25 AS DOUBLE) AS loc_lat,
           '{"k": ' || CAST(event_id % 100 AS VARCHAR) || '}' AS attributes_stripped
    FROM geo JOIN events USING (event_id)
    """,
    survey="A7 B7 fn_json (geo extraction + attribute-key removal at ingest)",
)
def ltss_geo_ingest(spark, sf_dir):
    """The reference's location path (models.py:54-62): pop latitude/
    longitude out of the attribute JSON into typed columns, keep the rest of
    the payload. Coordinates synthesized into the JSON here (the driver's
    events have none), then extracted by the REAL ingest expressions."""
    from ltss_spark.ingest import extract_location, strip_location_keys

    e = _t(spark, sf_dir, "events")
    lat = (F.col("user_id") % 178).cast("double") - 89.0 + 0.25
    lon = (F.col("user_id") % 360).cast("double") - 180.0 + 0.5
    with_geo = e.select(
        "event_id",
        F.concat(F.col("event_type"), F.lit(".u"), F.col("user_id")).alias("entity_id"),
        F.concat(
            F.lit('{"latitude": '), lat.cast("string"),
            F.lit(', "longitude": '), lon.cast("string"),
            F.lit(', "k": '), (F.col("event_id") % 100).cast("string"), F.lit("}"),
        ).alias("attributes"),
    )
    lon_c, lat_c = extract_location()
    return with_geo.select(
        "event_id",
        "entity_id",
        lon_c.alias("loc_lon"),
        lat_c.alias("loc_lat"),
        strip_location_keys().alias("attributes_stripped"),
    )


@register(
    "ddl_migrate",
    f"""
    WITH {_STATES_CTE}
    SELECT time, entity_id, state,
           CAST(NULL AS DOUBLE) AS loc_lon
    FROM states WHERE day(time) <= 15
    UNION ALL
    SELECT time, entity_id, state,
           CAST(CAST(event_id % 360 AS DOUBLE) - 180.0 AS DOUBLE) AS loc_lon
    FROM states WHERE day(time) > 15
    """,
    survey="A11 A13 (DDL create + schema migration via parquet schema evolution)",
)
def ddl_migrate(spark, sf_dir):
    """The reference's migration path (migrations.py:10-103: add columns,
    re-key, all in-place DDL) re-expressed as parquet schema evolution:
    month partitions written BEFORE the location column existed coexist with
    later ones; ``mergeSchema`` unifies them, old rows surface NULL — no
    table rewrite, the 100 TB-safe migration."""
    out = scratch_dir("ltss_migrate")
    states = states_from_events(_t(spark, sf_dir, "events")).withColumn(
        "half", F.when(F.dayofmonth("time") <= 15, "h1").otherwise("h2")
    )
    v1 = states.filter(F.col("half") == "h1").select(
        "time", "entity_id", "state", "half"
    )
    v2 = states.filter(F.col("half") == "h2").select(
        "time",
        "entity_id",
        "state",
        ((F.col("event_id") % 360).cast("double") - 180.0).alias("loc_lon"),
        "half",
    )
    # rebalance-by-half (r12): each append is one partition value, so an
    # unhinted write leaves one file per map task; the mergeSchema read
    # below pays per-file footer merging, so file count is the read cost
    v1.hint("rebalance", "half").write.partitionBy("half").mode("append").parquet(out)
    v2.hint("rebalance", "half").write.partitionBy("half").mode("append").parquet(out)
    return (
        spark.read.option("mergeSchema", "true")
        .parquet(out)
        .select("time", "entity_id", "state", "loc_lon")
    )


@register(
    "ddl_upgrade",
    f"""
    WITH {_STATES_CTE},
    legacy AS (
      SELECT event_id AS id, time, entity_id, state, attributes FROM states
      UNION ALL
      SELECT event_id + 1000000000 AS id, time, entity_id, state, attributes
      FROM states WHERE event_id % 10 = 0
    ),
    rekeyed AS (
      SELECT *, row_number() OVER (PARTITION BY time, entity_id
                                   ORDER BY id DESC) AS rn
      FROM legacy
    )
    SELECT time, entity_id, state, attributes,
           TRY_CAST(json_extract_string(attributes, '$.k') AS INT) AS attr_k
    FROM rekeyed WHERE rn = 1
    """,
    survey="A11 A13 B9 (old-layout -> new-layout data upgrade over a previously written table)",
)
def ddl_upgrade(spark, sf_dir):
    """The reference's released-version->HEAD upgrade test
    (tests/bats/test_integration.bats:150-193) as a data job: WRITE a
    legacy-shaped table (surrogate BIGSERIAL id, attributes as plain text —
    the pre-migration schema of migrations.py:87-103), including duplicate
    (time, entity_id) inserts the surrogate key permitted, then run
    ingest.upgrade_legacy_states over the landed files and verify the
    re-keyed, id-free, JSON-materialized result against the oracle."""
    from ltss_spark.ingest import upgrade_legacy_states

    out = scratch_dir("ltss_upgrade")
    states = states_from_events(_t(spark, sf_dir, "events"))
    legacy = states.select(
        F.col("event_id").alias("id"), "time", "entity_id", "state", "attributes"
    )
    # the surrogate key allowed re-inserts of the same PK: simulate a
    # duplicated subset landing later (higher id)
    dupes = states.filter(F.col("event_id") % 10 == 0).select(
        (F.col("event_id") + 1_000_000_000).alias("id"),
        "time", "entity_id", "state", "attributes",
    )
    legacy.unionAll(dupes).write.mode("append").parquet(out)
    # attr_keys is explicit: 'k' is THIS fixture's hot attribute key
    # (ADVICE r3 — a baked-in default would NULL-pad any real table)
    return upgrade_legacy_states(
        spark.read.parquet(out), attr_keys={"k": "int"}
    ).select("time", "entity_id", "state", "attributes", "attr_k")


@register(
    "ltss_latest",
    f"""
    WITH {_STATES_CTE},
    ranked AS (
      SELECT entity_id, time, state, event_id,
             row_number() OVER (PARTITION BY entity_id
                                ORDER BY time DESC, event_id DESC) AS rn
      FROM states
    )
    SELECT entity_id, time AS last_time, state AS last_state
    FROM ranked WHERE rn = 1
    """,
    survey="B3 agg_minmax_by (latest state per entity - the SQL-sensor query)",
)
def ltss_latest(spark, sf_dir):
    from ltss_spark.operators.timeseries import latest_state

    states = states_from_events(_t(spark, sf_dir, "events"))
    return latest_state(states, tie_breaker="event_id")


@register(
    "ltss_snapshot",
    f"""
    WITH {_STATES_CTE},
    ranked AS (
      SELECT entity_id, time, state, event_id,
             row_number() OVER (PARTITION BY entity_id
                                ORDER BY time DESC, event_id DESC) AS rn
      FROM states
      WHERE time <= TIMESTAMP '2024-01-15 12:00:00'
    )
    SELECT entity_id, time AS as_of_time, state AS as_of_state
    FROM ranked WHERE rn = 1
    """,
    survey="B3 agg_minmax_by filter_basic (state-of-the-world snapshot at an instant)",
)
def ltss_snapshot(spark, sf_dir):
    """State of every entity as of a fixed instant (operators/timeseries.
    snapshot_at): the time predicate pushes into the scan (partition
    pruning on a month-partitioned table), then one max_by hash
    aggregation — the reference's 'world at time T' query without the
    per-entity DESC index walk."""
    from ltss_spark.operators.timeseries import snapshot_at

    states = states_from_events(_t(spark, sf_dir, "events"))
    return snapshot_at(states, "2024-01-15 12:00:00", tie_breaker="event_id")


@register(
    "ltss_bucket",
    f"""
    WITH {_STATES_CTE}
    SELECT date_trunc('hour', time) AS bucket_start,
           entity_id,
           COUNT(*) AS n_events,
           {oracle_dsum('TRY_CAST(state AS DOUBLE)', 2)}
             / CAST(COUNT(TRY_CAST(state AS DOUBLE)) AS DOUBLE) AS avg_state,
           MIN(TRY_CAST(state AS DOUBLE)) AS min_state,
           MAX(TRY_CAST(state AS DOUBLE)) AS max_state
    FROM states
    GROUP BY 1, 2
    """,
    survey="B4 stream_window_tumbling(batch form) fn_math (time_bucket analogue)",
)
def ltss_bucket(spark, sf_dir):
    states = states_from_events(_t(spark, sf_dir, "events"))
    return time_bucket_agg(states, "1 hour")


@register(
    "ltss_bucket_origin",
    f"""
    WITH {_STATES_CTE}
    SELECT time_bucket(INTERVAL '90 minutes', time,
                       TIMESTAMP '1970-01-01 00:15:00') AS bucket_start,
           entity_id,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM states GROUP BY 1, 2
    """,
    survey="B4 fn_date (time_bucket with custom width AND origin: 90-minute buckets aligned to :15 — the overload date_trunc cannot express)",
)
def ltss_bucket_origin(spark, sf_dir):
    """Origin-aligned arbitrary-width buckets (operators/timeseries.
    time_bucket_origin_agg): TimescaleDB's time_bucket(width, ts, origin)
    overload — 90-minute buckets whose boundaries sit at :15 past the
    grid. Spark's window(ts, w, w, startTime) is verified value-equal to
    DuckDB's origin overload (both place boundaries at epoch + offset
    modulo width); tumbling windows emit one bucket per row, so the whole
    query is one hash aggregation."""
    states = states_from_events(_t(spark, sf_dir, "events"))
    from ltss_spark.operators.timeseries import time_bucket_origin_agg

    return time_bucket_origin_agg(states)


@register(
    "ltss_entity_range",
    f"""
    WITH {_STATES_CTE}
    SELECT time, entity_id, state
    FROM states
    WHERE entity_id = 'purchase.u3'
      AND time BETWEEN TIMESTAMP '2024-01-05' AND TIMESTAMP '2024-01-20'
    """,
    survey="B2 B8 sort (per-entity range scan - the composite-index pattern)",
)
def ltss_entity_range(spark, sf_dir):
    from ltss_spark.operators.timeseries import entity_range_scan

    states = states_from_events(_t(spark, sf_dir, "events"))
    return entity_range_scan(
        states, "purchase.u3", "2024-01-05", "2024-01-20"
    ).select("time", "entity_id", "state")


@register(
    "ltss_json_attr",
    f"""
    WITH {_STATES_CTE}
    SELECT entity_id, time,
           TRY_CAST(json_extract_string(attributes, '$.k') AS INT) AS k_val
    FROM states
    WHERE TRY_CAST(json_extract_string(attributes, '$.k') AS INT) > 80
    """,
    survey="B5 fn_json (JSONB attribute predicate - the GIN-index pattern)",
)
def ltss_json_attr(spark, sf_dir):
    states = states_from_events(_t(spark, sf_dir, "events"))
    # try_cast on BOTH sides: a non-numeric attribute value would otherwise
    # throw under ANSI mode (Spark) / CAST error (DuckDB) instead of
    # filtering the row — same hardening as materialize_attrs
    k = F.get_json_object(F.col("attributes"), "$.k").try_cast("int")
    return (
        states.select("entity_id", "time", k.alias("k_val"))
        .filter(F.col("k_val") > 80)
    )


@register(
    "ltss_timeinstate",
    f"""
    WITH {_STATES_CTE}
    SELECT entity_id, time, state,
           CAST(epoch_us(lead(time) OVER (PARTITION BY entity_id
                                          ORDER BY time ASC, event_id ASC))
                - epoch_us(time) AS BIGINT) AS micros_in_state
    FROM states
    """,
    survey="win_lag_lead (time-in-state, the canonical change-log derivation)",
)
def ltss_timeinstate(spark, sf_dir):
    states = states_from_events(_t(spark, sf_dir, "events"))
    return time_in_state(states, tie_breaker="event_id")


@register(
    "join_asof",
    """
    WITH probes AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
    ),
    quotes AS (
      SELECT user_id, ts, MAX(value) AS signup_value
      FROM events WHERE event_type = 'signup' GROUP BY user_id, ts
    )
    SELECT p.event_id, p.user_id, p.ts,
           q.signup_value, q.ts AS ts_right
    FROM probes p
    ASOF LEFT JOIN quotes q
      ON p.user_id = q.user_id AND p.ts >= q.ts
    """,
    survey="join_asof B3 (state-at-time-t reconstruction)",
)
def join_asof_q(spark, sf_dir):
    """As-of join vs DuckDB's native ASOF JOIN: for each purchase, the most
    recent signup of the same user at or before it."""
    e = _t(spark, sf_dir, "events")
    probes = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    quotes = (
        e.filter(F.col("event_type") == "signup")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("signup_value"))
    )
    return asof_join(probes, quotes, on="ts", by="user_id", value_cols=["signup_value"])


@register(
    "ts_gapfill",
    f"""
    WITH agg AS (
      SELECT event_type,
             date_trunc('day', ts) AS bucket_ts,
             {oracle_dsum('value', 2)} AS agg_value
      FROM events GROUP BY 1, 2
    ),
    bounds AS (SELECT MIN(bucket_ts) AS mn, MAX(bucket_ts) AS mx FROM agg),
    days AS (
      SELECT unnest(generate_series(mn, mx, INTERVAL 1 DAY)) AS bucket_ts
      FROM bounds
    ),
    grid AS (
      SELECT t.event_type, d.bucket_ts
      FROM (SELECT DISTINCT event_type FROM agg) t CROSS JOIN days d
    ),
    joined AS (
      SELECT g.event_type, g.bucket_ts, a.agg_value
      FROM grid g LEFT JOIN agg a USING (event_type, bucket_ts)
    )
    SELECT event_type, bucket_ts, agg_value,
           last_value(agg_value IGNORE NULLS) OVER (
             PARTITION BY event_type ORDER BY bucket_ts
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_value,
           agg_value IS NULL AS is_gap
    FROM joined
    """,
    survey="ts_gapfill B4 (time_bucket_gapfill analogue, LOCF)",
)
def ts_gapfill_q(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    return time_bucket_gapfill(
        e, time_col="ts", key_cols=["event_type"], agg=dsum("value", 2), bucket="1 day"
    )


@register(
    "ts_interpolate",
    f"""
    WITH agg AS (
      SELECT event_type,
             date_trunc('day', ts) AS bucket_ts,
             {oracle_dsum('value', 2)} AS agg_value
      FROM events GROUP BY 1, 2
    ),
    bounds AS (SELECT MIN(bucket_ts) AS mn, MAX(bucket_ts) AS mx FROM agg),
    days AS (
      SELECT unnest(generate_series(mn, mx, INTERVAL 1 DAY)) AS bucket_ts
      FROM bounds
    ),
    grid AS (
      SELECT t.event_type, d.bucket_ts
      FROM (SELECT DISTINCT event_type FROM agg) t CROSS JOIN days d
    ),
    joined AS (
      SELECT g.event_type, g.bucket_ts, a.agg_value
      FROM grid g LEFT JOIN agg a USING (event_type, bucket_ts)
    ),
    br AS (
      SELECT event_type, bucket_ts, agg_value,
             last_value(agg_value IGNORE NULLS) OVER wb AS prev_v,
             last_value(CASE WHEN agg_value IS NOT NULL THEN bucket_ts END
                        IGNORE NULLS) OVER wb AS prev_t,
             first_value(agg_value IGNORE NULLS) OVER wa AS next_v,
             first_value(CASE WHEN agg_value IS NOT NULL THEN bucket_ts END
                         IGNORE NULLS) OVER wa AS next_t
      FROM joined
      WINDOW wb AS (PARTITION BY event_type ORDER BY bucket_ts
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             wa AS (PARTITION BY event_type ORDER BY bucket_ts
                    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT event_type, bucket_ts, agg_value,
           CASE WHEN agg_value IS NOT NULL THEN agg_value
                WHEN prev_v IS NOT NULL AND next_v IS NOT NULL
                THEN prev_v + (next_v - prev_v)
                     * ((epoch_us(bucket_ts) - epoch_us(prev_t))
                        / (epoch_us(next_t) - epoch_us(prev_t)))
           END AS interp_value,
           agg_value IS NULL AS is_gap
    FROM br
    """,
    survey="ts_gapfill B4 (TimescaleDB interpolate() analogue, linear)",
)
def ts_interpolate_q(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    return time_bucket_interpolate(
        e, time_col="ts", key_cols=["event_type"], agg=dsum("value", 2), bucket="1 day"
    )


@register(
    "geo_distance",
    """
    WITH pts AS (
      SELECT c_custkey,
             CAST(c_custkey % 360 AS DOUBLE) - 180.0 + 0.5 AS lon,
             CAST(c_custkey % 178 AS DOUBLE) - 89.0 + 0.25 AS lat
      FROM customer
    )
    SELECT c_custkey, lon, lat,
           round(2.0 * 6371.0 * asin(least(sqrt(
             pow(sin(radians(lat - 0.0) / 2), 2)
             + cos(radians(0.0)) * cos(radians(lat))
               * pow(sin(radians(lon - 0.0) / 2), 2)
           ), 1.0)), 3) AS dist_km
    FROM pts
    WHERE lon BETWEEN -90.0 AND 90.0 AND lat BETWEEN -45.0 AND 45.0
    """,
    survey="geo_distance B7 (haversine + bbox - the PostGIS surface)",
)
def geo_distance_q(spark, sf_dir):
    """PostGIS-position parity (reference models.py:35,44; README.md:18):
    bbox as pushdown-friendly range predicates + haversine distance.
    Coordinates synthesized deterministically from keys (the testdata has
    no geo columns; ingest-extracted lon/lat take this exact shape)."""
    c = _t(spark, sf_dir, "customer")
    lon = (F.col("c_custkey") % 360).cast("double") - 180.0 + 0.5
    lat = (F.col("c_custkey") % 178).cast("double") - 89.0 + 0.25
    pts = c.select("c_custkey", lon.alias("lon"), lat.alias("lat"))
    return pts.filter(in_bbox(F.col("lon"), F.col("lat"), -90.0, -45.0, 90.0, 45.0)).select(
        "c_custkey",
        "lon",
        "lat",
        F.round(
            haversine_km(F.col("lon"), F.col("lat"), F.lit(0.0), F.lit(0.0)), 3
        ).alias("dist_km"),
    )


@register(
    "sink_partitioned",
    """
    SELECT event_id, strftime(ts, '%Y-%m') AS month
    FROM events
    WHERE strftime(ts, '%Y-%m') = '2024-01'
    """,
    survey="sink_partitioned A12 B8 (hypertable-chunk write + partition pruning)",
)
def sink_partitioned_q(spark, sf_dir):
    """Round-trips events through a month-partitioned parquet table and reads
    back ONE partition — partition pruning is the hypertable chunk-exclusion
    analogue (reference __init__.py:336-344). The month filter prunes at
    file-listing time (no data read outside the partition)."""
    out = scratch_dir("ltss_sink")
    e = _t(spark, sf_dir, "events").withColumn(
        "month", F.date_format("ts", "yyyy-MM")
    )
    # rebalance-by-month (r12, guide §6): without it every map task wrote
    # a file into every month it held (32 x 76 KB files for ONE month at
    # sf0.1); the AQE rebalance makes file count track data size while
    # keeping write parallelism inside a big month. 32 -> 1 file, time
    # neutral, rows identical.
    e.hint("rebalance", "month").write.mode("overwrite").partitionBy(
        "month"
    ).parquet(out)
    return (
        spark.read.parquet(out)
        .filter(F.col("month") == "2024-01")
        .select("event_id", F.col("month").cast("string").alias("month"))
    )


@register(
    "sink_bucketed",
    f"""
    SELECT c_mktsegment,
           COUNT(*) AS n_orders,
           {oracle_dsum('o_totalprice', 2)} AS total_price
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    """,
    survey="sink_partitioned join_inner (bucket-by-key layout: shuffle-free co-located join)",
)
def sink_bucketed_q(spark, sf_dir):
    """Bucket-by-key layout (SURVEY §7 100 TB posture): orders and customer
    are written bucketed on custkey, then joined THROUGH the catalog tables
    — with matching bucket specs Spark plans the join with no shuffle
    exchange on either side (asserted in tests/test_plans.py). The oracle
    is the same join over the raw tables: the layout must never change the
    answer."""
    from ltss_spark.sources.batch import write_bucketed

    # session-stable tag: a re-run OVERWRITES its own catalog tables and
    # directory instead of leaking a new uuid-tagged pair per call
    tag = session_tag()
    base = scratch_dir("ltss_bucketed")
    o = _t(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    write_bucketed(o, f"orders_b_{tag}", "o_custkey", 8, path=f"{base}/o")
    write_bucketed(c, f"cust_b_{tag}", "c_custkey", 8, path=f"{base}/c")
    ob, cb = spark.table(f"orders_b_{tag}"), spark.table(f"cust_b_{tag}")
    return (
        ob.join(cb, ob["o_custkey"] == cb["c_custkey"])
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum("o_totalprice", 2).alias("total_price"),
        )
    )


@register(
    "stream_ingest",
    f"""
    WITH {_STATES_CTE},
    deduped AS (
      SELECT *, row_number() OVER (PARTITION BY time, entity_id
                                   ORDER BY event_id DESC) AS rn
      FROM states
    )
    SELECT time, entity_id, state, attributes FROM deduped WHERE rn = 1
    """,
    survey="stream_ingest stream_dedup stream_watermark A1 A9 (Structured Streaming pipeline)",
)
def stream_ingest_q(spark, sf_dir):
    """Runs the ACTUAL Structured Streaming ingest (readStream ->
    states_from_events -> watermark -> foreachBatch partitioned parquet
    sink, Trigger.AvailableNow) and returns the landed table with the
    deterministic PK dedup applied on the read side.

    The stream's own dropDuplicates keeps an ARBITRARY survivor per
    (time, entity_id) — fine operationally (any survivor satisfies the PK),
    but un-oracle-able: a hash gate needs the event_id-max survivor
    deterministically. So this entry streams WITHOUT the stream-side dedup
    and applies the deterministic dedup on the landed rows, mirroring the
    oracle exactly even if the driver ever ships duplicate keys; the
    stream-side watermark+dedup state machinery is exercised by
    ``stream_dedup`` (rows-only by design)."""
    from ltss_spark.ingest import dedup_primary_key
    from ltss_spark.streaming.ingest import run_ingest_availablenow

    base = scratch_dir("ltss_stream")
    run_ingest_availablenow(
        spark, sf_dir, out_path=f"{base}/out", checkpoint=f"{base}/ckpt", dedup=False
    )
    landed = spark.read.parquet(f"{base}/out").select(
        "time", "entity_id", "state", "attributes", "event_id"
    )
    return dedup_primary_key(landed, tie_breaker="event_id").select(
        "time", "entity_id", "state", "attributes"
    )


@register(
    "sql_select",
    f"""
    SELECT l_orderkey,
           {oracle_dsum('l_extendedprice * (1 - l_discount)', 6)} AS revenue,
           o_orderdate, o_orderpriority
    FROM customer, orders, lineitem
    WHERE c_mktsegment = 'BUILDING'
      AND c_custkey = o_custkey AND l_orderkey = o_orderkey
      AND o_orderdate < TIMESTAMP '1998-03-15'
      AND l_shipdate > TIMESTAMP '1998-03-15'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey ASC
    LIMIT 10
    """,
    survey="B1 (arbitrary SQL over registered views - TPC-H Q3 shape)",
)
def sql_select(spark, sf_dir):
    """B1: 'Fully SQL compatible' (reference README.md:23) — the engine's
    SQL entry point: register views, run ANSI SQL through Catalyst."""
    register_views(spark, sf_dir, "customer", "orders", "lineitem")
    return spark.sql(
        """
        SELECT l_orderkey,
               CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS revenue,
               o_orderdate, o_orderpriority
        FROM customer, orders, lineitem
        WHERE c_mktsegment = 'BUILDING'
          AND c_custkey = o_custkey AND l_orderkey = o_orderkey
          AND o_orderdate < TIMESTAMP '1998-03-15'
          AND l_shipdate > TIMESTAMP '1998-03-15'
        GROUP BY l_orderkey, o_orderdate, o_orderpriority
        ORDER BY revenue DESC, l_orderkey ASC
        LIMIT 10
        """
    )


@register(
    "sql_q10",
    f"""
    SELECT c_custkey, c_name,
           {oracle_dsum('l_extendedprice * (1 - l_discount)', 6)} AS revenue,
           c_acctbal, n_name
    FROM customer, orders, lineitem, nation
    WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      AND o_orderdate >= TIMESTAMP '1998-01-01'
      AND l_returnflag = 'R'
      AND c_nationkey = n_nationkey
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey ASC
    LIMIT 20
    """,
    survey="B1 join_inner join_broadcast agg_basic limit (TPC-H Q10 shape)",
)
def sql_q10(spark, sf_dir):
    """B1 depth check: 4-table star join + aggregate + deterministic top-20
    through the SQL entry point. Catalyst broadcasts nation automatically
    (AQE size estimate); the fact-side joins shuffle on their keys."""
    register_views(spark, sf_dir, "customer", "orders", "lineitem", "nation")
    return spark.sql(
        """
        SELECT c_custkey, c_name,
               CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS revenue,
               c_acctbal, n_name
        FROM customer, orders, lineitem, nation
        WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
          AND o_orderdate >= TIMESTAMP '1998-01-01'
          AND l_returnflag = 'R'
          AND c_nationkey = n_nationkey
        GROUP BY c_custkey, c_name, c_acctbal, n_name
        ORDER BY revenue DESC, c_custkey ASC
        LIMIT 20
        """
    )


@register(
    "ltss_deadletter",
    f"""
    WITH {_STATES_CTE},
    corrupted AS (
      SELECT time, event_id,
             CASE WHEN event_id % 11 = 0 THEN NULL ELSE entity_id END AS entity_id,
             CASE WHEN event_id % 7 = 0 THEN 'unknown' ELSE state END AS state
      FROM states
    )
    SELECT time, event_id, entity_id, state,
           CASE WHEN entity_id IS NULL THEN 'null_entity_id'
                WHEN state IS NULL THEN 'null_state'
                WHEN state = 'unknown' THEN 'unknown_state' END AS reject_reason
    FROM corrupted
    WHERE entity_id IS NULL OR state IS NULL OR state = 'unknown'
    """,
    survey="A2 A10 stream_late_drop(batch form) (dead-letter divert with reasons)",
)
def ltss_deadletter(spark, sf_dir):
    """The reference drops unserializable/invalid events with a log line
    (__init__.py:212-216); here they divert to a dead-letter table with a
    reject_reason. Invalid rows are synthesized deterministically (the
    driver's events are all clean), then split by the REAL policy."""
    from ltss_spark.ingest import split_dead_letter

    states = states_from_events(_t(spark, sf_dir, "events"))
    corrupted = states.select(
        "time",
        "event_id",
        F.when(F.col("event_id") % 11 == 0, F.lit(None)).otherwise(F.col("entity_id")).alias("entity_id"),
        F.when(F.col("event_id") % 7 == 0, F.lit("unknown")).otherwise(F.col("state")).alias("state"),
    )
    _valid, dead = split_dead_letter(corrupted)
    return dead.select("time", "event_id", "entity_id", "state", "reject_reason")


@register(
    "ltss_json_contains",
    f"""
    WITH {_STATES_CTE},
    enriched AS (
      SELECT entity_id, time,
             '{{"k": ' || CAST(event_id % 100 AS VARCHAR)
               || ', "src": "' || split_part(entity_id, '.', 1) || '"}}' AS attributes
      FROM states
    )
    SELECT entity_id, time, attributes
    FROM enriched
    WHERE json_extract_string(attributes, '$.k') = '42'
      AND json_extract_string(attributes, '$.src') = 'purchase'
    """,
    survey="B5 fn_json (JSONB containment @> as conjunctive key equality)",
)
def ltss_json_contains(spark, sf_dir):
    """Postgres ``attributes @> '{{"k": 42, "src": "purchase"}}'`` (the GIN
    containment probe) == conjunction of extracted-key equalities — the
    form Catalyst can push and parquet stats can skip on once hot keys are
    materialized as typed columns at ingest (ARCHITECTURE.md)."""
    states = states_from_events(_t(spark, sf_dir, "events"))
    enriched = states.select(
        "entity_id",
        "time",
        F.concat(
            F.lit('{"k": '), (F.col("event_id") % 100).cast("string"),
            F.lit(', "src": "'), F.split(F.col("entity_id"), r"\.").getItem(0),
            F.lit('"}'),
        ).alias("attributes"),
    )
    return enriched.filter(
        (F.get_json_object("attributes", "$.k") == "42")
        & (F.get_json_object("attributes", "$.src") == "purchase")
    )


@register(
    "join_asof_fwd",
    """
    WITH probes AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
    ),
    quotes AS (
      SELECT user_id, ts, MAX(value) AS next_error_value
      FROM events WHERE event_type = 'error' GROUP BY user_id, ts
    )
    SELECT p.event_id, p.user_id, p.ts,
           q.next_error_value, q.ts AS ts_right
    FROM probes p
    ASOF LEFT JOIN quotes q
      ON p.user_id = q.user_id AND p.ts <= q.ts
    """,
    survey="join_asof (forward direction: next-event attribution)",
)
def join_asof_fwd_q(spark, sf_dir):
    """Forward as-of vs DuckDB ASOF with reversed comparison: for each
    purchase, the user's EARLIEST error at or after it."""
    from ltss_spark.operators.asof import asof_join_forward

    e = _t(spark, sf_dir, "events")
    probes = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    quotes = (
        e.filter(F.col("event_type") == "error")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("next_error_value"))
    )
    return asof_join_forward(
        probes, quotes, on="ts", by="user_id", value_cols=["next_error_value"]
    )


@register(
    "sql_q5",
    f"""
    SELECT n_name,
           {oracle_dsum('l_extendedprice * (1 - l_discount)', 6)} AS revenue
    FROM customer, orders, lineitem, supplier, nation, region
    WHERE c_custkey = o_custkey
      AND l_orderkey = o_orderkey
      AND l_suppkey = s_suppkey
      AND c_nationkey = s_nationkey
      AND s_nationkey = n_nationkey
      AND n_regionkey = r_regionkey
      AND r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1997-01-01'
    GROUP BY n_name
    """,
    survey="B1 join_inner join_broadcast agg_basic (TPC-H Q5 shape, 6-table)",
)
def sql_q5(spark, sf_dir):
    """B1 depth: the 6-table local-supplier-volume join. The
    customer-supplier same-nation equality rides the join graph; nation and
    region broadcast; the two fact-side joins shuffle on their keys."""
    register_views(spark, sf_dir, "customer", "orders", "lineitem", "supplier", "nation", "region")
    return spark.sql(
        """
        SELECT n_name,
               CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS revenue
        FROM customer, orders, lineitem, supplier, nation, region
        WHERE c_custkey = o_custkey
          AND l_orderkey = o_orderkey
          AND l_suppkey = s_suppkey
          AND c_nationkey = s_nationkey
          AND s_nationkey = n_nationkey
          AND n_regionkey = r_regionkey
          AND r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1997-01-01'
        GROUP BY n_name
        """
    )


@register(
    "ltss_attr_materialize",
    """
    WITH e AS (
      SELECT event_id,
             event_type || '.u' || CAST(user_id AS VARCHAR) AS entity_id,
             props AS attributes
      FROM events
    )
    SELECT event_id, entity_id, attributes,
           TRY_CAST(json_extract_string(attributes, '$.k') AS INT) AS attr_k
    FROM e
    WHERE TRY_CAST(json_extract_string(attributes, '$.k') AS INT) >= 50
    """,
    survey="B5 fn_json (hot attribute keys materialized as typed columns - the GIN replacement)",
)
def ltss_attr_materialize(spark, sf_dir):
    """The engine's replacement for the reference's GIN index
    (models.py:75-77): promote queried JSON keys to typed columns at
    ingest via materialize_attrs; the predicate then runs on a plain INT
    column (stats, pushdown) while the blob stays lossless."""
    from ltss_spark.ingest import materialize_attrs

    e = _t(spark, sf_dir, "events").select(
        "event_id",
        F.concat(F.col("event_type"), F.lit(".u"), F.col("user_id")).alias("entity_id"),
        F.col("props").alias("attributes"),
    )
    return materialize_attrs(e, {"k": "int"}).filter(F.col("attr_k") >= 50)


@register(
    "ts_counter_delta",
    f"""
    WITH {_STATES_CTE},
    typed AS (
      SELECT entity_id, time, event_id, TRY_CAST(state AS DOUBLE) AS v
      FROM states
      WHERE TRY_CAST(state AS DOUBLE) IS NOT NULL
    ),
    lagged AS (
      SELECT entity_id, v,
             lag(v) OVER (PARTITION BY entity_id ORDER BY time, event_id) AS pv
      FROM typed
    ),
    per_row AS (
      SELECT entity_id,
             CASE WHEN pv IS NULL THEN NULL
                  WHEN v - pv >= 0 THEN v - pv
                  ELSE v END AS inc,
             CAST(v - pv < 0 AS INT) AS is_reset
      FROM lagged
    )
    SELECT entity_id,
           round(CAST(COALESCE(SUM(CAST(inc AS DECIMAL(38,6))),
                               CAST(0 AS DECIMAL(38,6))) AS DOUBLE), 6)
             AS total_increase,
           CAST(COALESCE(SUM(is_reset), 0) AS BIGINT) AS n_resets,
           COUNT(*) AS n_samples
    FROM per_row GROUP BY entity_id
    """,
    survey="win_lag_lead agg_basic (TimescaleDB counter_agg: monotonic delta with reset detection)",
)
def ts_counter_delta(spark, sf_dir):
    from ltss_spark.operators.timeseries import counter_delta

    states = states_from_events(_t(spark, sf_dir, "events"))
    return counter_delta(
        states, F.col("state").try_cast("double"), tie_breaker="event_id"
    )


@register(
    "ltss_uptime",
    f"""
    WITH {_STATES_CTE},
    iv AS (
      SELECT entity_id, state, time AS s,
             lead(time) OVER (PARTITION BY entity_id
                              ORDER BY time ASC, event_id ASC) AS e
      FROM states
    ),
    iv2 AS (SELECT * FROM iv WHERE e IS NOT NULL AND e > s),
    b AS (
      SELECT entity_id, state, s, e, g.bucket
      FROM iv2,
      UNNEST(generate_series(
        CAST(date_trunc('day', s) AS TIMESTAMP),
        CAST(date_trunc('day', e - INTERVAL 1 MICROSECOND) AS TIMESTAMP),
        INTERVAL 1 DAY)) AS g(bucket)
    )
    SELECT entity_id, bucket, state,
           CAST(SUM(epoch_us(least(e, bucket + INTERVAL 1 DAY))
                    - epoch_us(greatest(s, bucket))) AS BIGINT)
             AS micros_in_state
    FROM b GROUP BY 1, 2, 3
    """,
    survey="win_lag_lead B4 fn_date (state_agg/duration_in rollup: validity intervals split across time buckets — the daily-uptime dashboard)",
)
def ltss_uptime_q(spark, sf_dir):
    """Per-day time-in-state (operators/timeseries.time_in_state_bucketed):
    each state's validity interval [time, lead(time)) is SPLIT across day
    buckets (sequence+explode fan-out = the output's inherent size;
    exclusive-end handled via trunc(end - 1µs)) and micros sum per
    (entity, day, state) — TimescaleDB's state_agg/duration_in by
    time_bucket, i.e. 'how long was each entity in each state, per day'."""
    from ltss_spark.operators.timeseries import time_in_state_bucketed

    states = states_from_events(_t(spark, sf_dir, "events"))
    return time_in_state_bucketed(states, unit="day", tie_breaker="event_id")


@register(
    "ts_outliers",
    """
    WITH med AS (
      SELECT user_id, round(quantile_cont(value, 0.5), 6) AS med
      FROM events GROUP BY user_id
    ),
    mad AS (
      SELECT e.user_id,
             round(quantile_cont(abs(e.value - m.med), 0.5), 6) AS mad
      FROM events e JOIN med m USING (user_id)
      GROUP BY e.user_id
    )
    SELECT e.event_id, e.user_id, e.value, m.med, d.mad,
           CASE WHEN d.mad = 0.0 THEN e.value <> m.med
                ELSE abs(e.value - m.med) > 3.0 * 1.4826 * d.mad
           END AS is_outlier
    FROM events e JOIN med m USING (user_id) JOIN mad d USING (user_id)
    """,
    survey="agg_basic join_broadcast fn_math B3 (robust per-key outlier flags: median/MAD, the sensor-monitoring query)",
)
def ts_outliers_q(spark, sf_dir):
    """Per-key robust z-score outliers (operators/timeseries.
    robust_outliers): |v - median| > 3 * 1.4826 * MAD. Median/MAD are
    exact interpolated percentiles (Spark `percentile` == DuckDB
    `quantile_cont`, R-7), rounded to 6 before the threshold comparison
    so both engines flag identical rows; the per-key stats frames are
    |keys| rows and broadcast — the event scan never shuffles."""
    from ltss_spark.operators.timeseries import robust_outliers

    e = _t(spark, sf_dir, "events").select("event_id", "user_id", "value")
    return robust_outliers(e, value_col="value", key_cols=("user_id",)).select(
        "event_id", "user_id", "value", "med", "mad", "is_outlier"
    )


@register(
    "join_interval",
    f"""
    WITH {_STATES_CTE},
    iv AS (
      SELECT entity_id, time AS i_start,
             lead(time) OVER (PARTITION BY entity_id
                              ORDER BY time, event_id) AS i_end
      FROM states
    ),
    iv2 AS (
      SELECT entity_id, i_start, i_end FROM iv
      WHERE i_end IS NOT NULL AND i_end > i_start
    ),
    w AS (
      SELECT DISTINCT
             date_trunc('day', time) + INTERVAL 2 HOUR AS w_start,
             date_trunc('day', time) + INTERVAL 3 HOUR AS w_end
      FROM states
    )
    SELECT entity_id, i_start, i_end, w_start, w_end,
           CAST(epoch_us(least(i_end, w_end))
                - epoch_us(greatest(i_start, w_start)) AS BIGINT)
             AS overlap_micros
    FROM iv2 JOIN w ON i_start < w_end AND w_start < i_end
    """,
    survey="join_range join_theta fn_date B4 (interval OVERLAP join: time-grid bucket equi-join + exact post-filter — never a nested loop; 'which state intervals crossed each maintenance window')",
)
def join_interval_q(spark, sf_dir):
    """Interval overlap join (operators/timeseries.interval_overlap_join):
    state validity intervals x daily 02:00-03:00 maintenance windows,
    pairs where the ranges truly overlap plus the overlap duration. The
    plan is the 1-D grid trick — both interval sets fan out to the day
    buckets they touch and equi-join on the bucket (shuffle ∝
    interval-days), with the exact range predicate as a post-filter;
    Catalyst's only native strategy for the pure inequality join is a
    nested loop. The oracle runs that very theta join relationally —
    identical pairs and identical overlap micros prove the bucket
    rewrite sound."""
    from pyspark.sql import Window

    from ltss_spark.operators.timeseries import interval_overlap_join

    states = states_from_events(_t(spark, sf_dir, "events"))
    w = Window.partitionBy("entity_id").orderBy("time", "event_id")
    iv = (
        states.select(
            "entity_id",
            F.col("time").alias("i_start"),
            F.lead("time").over(w).alias("i_end"),
        )
        .filter(F.col("i_end").isNotNull() & (F.col("i_end") > F.col("i_start")))
    )
    windows = states.select(
        (F.date_trunc("day", "time") + F.expr("INTERVAL 2 HOUR")).alias(
            "w_start"
        ),
        (F.date_trunc("day", "time") + F.expr("INTERVAL 3 HOUR")).alias(
            "w_end"
        ),
    ).distinct()
    return interval_overlap_join(
        iv, windows, l_start="i_start", l_end="i_end"
    ).select(
        "entity_id", "i_start", "i_end", "w_start", "w_end", "overlap_micros"
    )


@register(
    "ts_seasonal_anomaly",
    """
    WITH base AS (
      SELECT user_id, CAST(hour(ts) AS INT) AS hod,
             CAST(COUNT(*) AS BIGINT) AS n,
             SUM(CAST(value AS DECIMAL(38,6))) AS s,
             SUM(CAST(value * value AS DECIMAL(38,6))) AS s2
      FROM events GROUP BY 1, 2
    ),
    stats AS (
      SELECT user_id, hod, n,
             round(CAST(s AS DOUBLE) / n, 6) AS mean,
             CASE WHEN n > 1 THEN
               round(sqrt(greatest(0.0,
                 (CAST(s2 AS DOUBLE)
                  - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n) / (n - 1))), 6)
             END AS sd
      FROM base
    ),
    scored AS (
      SELECT e.event_id, e.user_id, st.hod, e.value, st.n, st.mean, st.sd,
             CASE WHEN st.sd > 0.0
                  THEN round((e.value - st.mean) / st.sd, 6) END AS z
      FROM events e
      JOIN stats st ON e.user_id = st.user_id
                   AND CAST(hour(e.ts) AS INT) = st.hod
    )
    SELECT event_id, user_id, hod, value, n, mean, sd, z,
           CASE WHEN sd IS NULL THEN FALSE
                WHEN sd = 0.0 THEN value <> mean
                ELSE abs(z) > 3.0 END AS is_anomalous
    FROM scored
    """,
    survey="agg_basic join_broadcast fn_date fn_math B3 (seasonal-baseline anomaly flags: per (key, hour-of-day) mean/stddev z-scores — the 'normal at 14:00, anomalous at 03:00' monitoring query)",
)
def ts_seasonal_anomaly_q(spark, sf_dir):
    """Seasonal anomaly detection (operators/timeseries.seasonal_anomaly):
    every event z-scores against its own (user, hour-of-day) stratum's
    mean/stddev — the diurnal-cycle-aware complement to ts_outliers'
    global per-key median/MAD. Stratum sums are exact decimal aggregates,
    mean/sd derive in a fixed double expression rounded to 6, z rounds
    before the 3-sigma compare; the |keys| x 24 baseline broadcasts back
    so the event scan never shuffles. The oracle recomputes every stratum
    and every z exactly."""
    from ltss_spark.operators.timeseries import seasonal_anomaly

    e = _t(spark, sf_dir, "events").select("event_id", "user_id", "ts", "value")
    return seasonal_anomaly(e).select(
        "event_id", "user_id", "hod", "value", "n", "mean", "sd", "z",
        "is_anomalous",
    )


@register(
    "ts_histogram",
    f"""
    WITH {_STATES_CTE},
    typed AS (
      SELECT entity_id, TRY_CAST(state AS DOUBLE) AS v FROM states
    ),
    bucketed AS (
      SELECT entity_id,
             CAST(CASE WHEN v IS NULL THEN NULL
                       WHEN v < 0.0 THEN 0
                       WHEN v >= 100.0 THEN 11
                       ELSE floor((v - 0.0) / 10.0) + 1 END AS INT) AS bucket
      FROM typed
    )
    SELECT entity_id, bucket, COUNT(*) AS n
    FROM bucketed WHERE bucket IS NOT NULL
    GROUP BY entity_id, bucket
    """,
    survey="agg_basic fn_math (TimescaleDB histogram(): per-entity value distribution)",
)
def ts_histogram(spark, sf_dir):
    from ltss_spark.operators.timeseries import value_histogram

    states = states_from_events(_t(spark, sf_dir, "events"))
    return value_histogram(
        states, F.col("state").try_cast("double"), lo=0.0, hi=100.0, n_buckets=10
    )


@register(
    "ts_lttb",
    f"""
    WITH {_STATES_CTE},
    typed AS (
      SELECT entity_id, time, TRY_CAST(state AS DOUBLE) AS value
      FROM states WHERE TRY_CAST(state AS DOUBLE) IS NOT NULL
    )
    SELECT entity_id,
           CAST(LEAST(50, COUNT(*)) AS INT) AS n_points,
           MIN(time) AS first_time,
           MAX(time) AS last_time,
           TRUE AS subset_ok
    FROM typed GROUP BY entity_id
    """,
    survey="udaf ext_text_stats-adjacent (TimescaleDB lttb(): visual downsampling per series)",
)
def ts_lttb(spark, sf_dir):
    """LTTB downsample audit — the WHICH-points selection is algorithmic
    (not SQL-expressible), but its contract IS (VERDICT r2 item 2):
    exactly min(n_out, n) points per series, the first and last input
    timestamps always kept (the LTTB anchor rule), and every selected
    (time, value) a member of the input. The entry runs the real
    mapInPandas downsampler and emits those invariants per series; the
    oracle derives the expected values from the raw table. Point-selection
    quality (triangle areas) stays pinned in tests/test_operators.py."""
    from ltss_spark.operators.timeseries import lttb_downsample

    states = states_from_events(_t(spark, sf_dir, "events")).select(
        "entity_id",
        "time",
        F.col("state").try_cast("double").alias("value"),
    ).filter(F.col("value").isNotNull())
    sel = lttb_downsample(states, n_out=50)
    per = sel.groupBy("entity_id").agg(
        F.count(F.lit(1)).cast("int").alias("n_points"),
        F.min("time").alias("first_time"),
        F.max("time").alias("last_time"),
    )
    strays = (
        sel.join(states, ["entity_id", "time", "value"], "left_anti")
        .groupBy("entity_id")
        .agg(F.count(F.lit(1)).alias("n_stray"))
    )
    return per.join(strays, "entity_id", "left").select(
        "entity_id",
        "n_points",
        "first_time",
        "last_time",
        F.col("n_stray").isNull().alias("subset_ok"),
    )


@register(
    "ts_timeweight",
    f"""
    WITH {_STATES_CTE},
    typed AS (
      SELECT entity_id, time, event_id,
             TRY_CAST(state AS DECIMAL(38,2)) AS v
      FROM states
    ),
    segs AS (
      SELECT entity_id,
             lag(v) OVER w AS v_prev,
             epoch_us(time) - lag(epoch_us(time)) OVER w AS dt_us
      FROM typed
      WINDOW w AS (PARTITION BY entity_id ORDER BY time, event_id)
    )
    SELECT entity_id,
           round(CAST(SUM(v_prev * dt_us) AS DOUBLE)
                 / CAST(SUM(dt_us) AS DOUBLE), 6) AS twa,
           CAST(SUM(dt_us) AS BIGINT) AS total_us,
           COUNT(v_prev) AS n_segments
    FROM segs
    WHERE v_prev IS NOT NULL AND dt_us IS NOT NULL
    GROUP BY entity_id
    """,
    survey="win_lag_lead agg_basic fn_date (TimescaleDB time_weight: left-Riemann TWA)",
)
def ts_timeweight(spark, sf_dir):
    """Time-weighted average per entity (TimescaleDB ``time_weight``,
    LOCF/left-Riemann): each state's value weighted by how long it was
    current. All arithmetic exact (DECIMAL value x integer micros), so the
    parallel aggregation is order-insensitive."""
    from pyspark.sql import Window

    states = states_from_events(_t(spark, sf_dir, "events"))
    w = Window.partitionBy("entity_id").orderBy("time", "event_id")
    v = F.col("state").try_cast("decimal(38,2)")
    t_us = F.unix_micros(F.col("time"))
    segs = states.select(
        "entity_id",
        F.lag(v).over(w).alias("v_prev"),
        (t_us - F.lag(t_us).over(w)).alias("dt_us"),
    ).filter(F.col("v_prev").isNotNull() & F.col("dt_us").isNotNull())
    return segs.groupBy("entity_id").agg(
        F.round(
            F.sum(F.col("v_prev") * F.col("dt_us")).cast("double")
            / F.sum("dt_us").cast("double"),
            6,
        ).alias("twa"),
        F.sum("dt_us").cast("bigint").alias("total_us"),
        F.count("v_prev").alias("n_segments"),
    )


@register(
    "ts_trend",
    f"""
    WITH {_STATES_CTE},
    typed AS (
      SELECT entity_id,
             (epoch_us(time) - 1704067200000000) / 3600000000.0 AS x_hours,
             TRY_CAST(state AS DOUBLE) AS y
      FROM states
    )
    SELECT entity_id,
           round(regr_slope(y, x_hours), 4) AS slope_per_hour,
           round(regr_intercept(y, x_hours), 4) AS intercept,
           round(corr(y, x_hours), 4) AS r,
           CAST(COUNT(y) AS BIGINT) AS n
    FROM typed
    GROUP BY entity_id
    """,
    survey="agg_basic fn_math (TimescaleDB stats_agg: per-entity linear trend)",
)
def ts_trend(spark, sf_dir):
    """Per-entity linear trend (TimescaleDB ``stats_agg`` slope/intercept/
    corr): time normalized to HOURS since 2024-01-01 so the regression
    arithmetic stays well-conditioned (raw epoch-micros x-values would put
    1e18-scale numbers through the variance sums); rounded to 4 decimals —
    covariance accumulation order differs across engines."""
    states = states_from_events(_t(spark, sf_dir, "events"))
    x = (F.unix_micros(F.col("time")) - F.lit(1_704_067_200_000_000)) / 3.6e9
    y = F.col("state").try_cast("double")
    typed = states.select("entity_id", x.alias("x_hours"), y.alias("y"))
    return typed.groupBy("entity_id").agg(
        F.round(F.regr_slope("y", "x_hours"), 4).alias("slope_per_hour"),
        F.round(F.regr_intercept("y", "x_hours"), 4).alias("intercept"),
        F.round(F.corr("y", "x_hours"), 4).alias("r"),
        F.count("y").alias("n"),
    )


@register(
    "join_asof_near",
    """
    WITH probes AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
    ),
    quotes AS (
      SELECT user_id, ts, MAX(value) AS qv
      FROM events WHERE event_type = 'error' GROUP BY user_id, ts
    ),
    b AS (
      SELECT p.event_id, p.user_id, p.ts, q.qv AS qv_b, q.ts AS ts_b
      FROM probes p ASOF LEFT JOIN quotes q
        ON p.user_id = q.user_id AND p.ts >= q.ts
    ),
    f AS (
      SELECT p.event_id, q.qv AS qv_f, q.ts AS ts_f
      FROM probes p ASOF LEFT JOIN quotes q
        ON p.user_id = q.user_id AND p.ts <= q.ts
    )
    SELECT b.event_id, b.user_id, b.ts,
           CASE WHEN ts_f IS NULL THEN qv_b
                WHEN ts_b IS NULL THEN qv_f
                WHEN epoch_us(b.ts) - epoch_us(ts_b)
                     <= epoch_us(ts_f) - epoch_us(b.ts) THEN qv_b
                ELSE qv_f END AS qv,
           CASE WHEN ts_f IS NULL THEN ts_b
                WHEN ts_b IS NULL THEN ts_f
                WHEN epoch_us(b.ts) - epoch_us(ts_b)
                     <= epoch_us(ts_f) - epoch_us(b.ts) THEN ts_b
                ELSE ts_f END AS ts_right
    FROM b JOIN f USING (event_id)
    """,
    survey="join_asof (nearest direction, tie-backward)",
)
def join_asof_near_q(spark, sf_dir):
    """Nearest as-of vs a two-pass DuckDB construction (backward ASOF +
    forward ASOF + per-row pick — exactly how our composition works)."""
    from ltss_spark.operators.asof import asof_join_nearest

    e = _t(spark, sf_dir, "events")
    probes = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    quotes = (
        e.filter(F.col("event_type") == "error")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("qv"))
    )
    return asof_join_nearest(probes, quotes, on="ts", by="user_id", value_cols=["qv"])


@register(
    "sql_q18",
    f"""
    SELECT c_custkey, c_name, o_orderkey, o_totalprice,
           {oracle_dsum('l_quantity', 2)} AS total_qty
    FROM customer, orders, lineitem
    WHERE o_orderkey IN (
        SELECT l_orderkey FROM lineitem
        GROUP BY l_orderkey HAVING SUM(l_quantity) > 250
    )
      AND c_custkey = o_custkey AND o_orderkey = l_orderkey
    GROUP BY c_custkey, c_name, o_orderkey, o_totalprice
    ORDER BY o_totalprice DESC, o_orderkey ASC
    LIMIT 100
    """,
    survey="B1 join_semi agg_basic limit (TPC-H Q18 shape: HAVING subquery semi-join)",
)
def sql_q18(spark, sf_dir):
    """Large-volume-customer query. The IN-subquery form let Catalyst push
    the rewritten semi-join to BOTH sides of o_orderkey = l_orderkey, so
    the heavy per-orderkey lineitem aggregation was planned — and executed
    — TWICE (two scans, two 2-phase aggregates, two broadcasts; observed
    in the r12 formatted plan). The HAVING aggregate keys are unique
    (GROUP BY l_orderkey), so an inner join against the aggregate computed
    ONCE is row-for-row identical to the IN semi-join — one lineitem
    aggregation instead of two, oracle hash unchanged (the registered
    oracle keeps the IN form)."""
    register_views(spark, sf_dir, "customer", "orders", "lineitem")
    return spark.sql(
        """
        WITH big AS (
            SELECT l_orderkey AS big_orderkey FROM lineitem
            GROUP BY l_orderkey HAVING SUM(l_quantity) > 250
        )
        SELECT c_custkey, c_name, o_orderkey, o_totalprice,
               CAST(SUM(CAST(l_quantity AS DECIMAL(38,2))) AS DOUBLE) AS total_qty
        FROM customer, orders, lineitem, big
        WHERE o_orderkey = big_orderkey
          AND c_custkey = o_custkey AND o_orderkey = l_orderkey
        GROUP BY c_custkey, c_name, o_orderkey, o_totalprice
        ORDER BY o_totalprice DESC, o_orderkey ASC
        LIMIT 100
        """
    )


@register(
    "sql_q8",
    """
    WITH flat AS (
      SELECT CAST(year(o_orderdate) AS INT) AS o_year,
             CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6)) AS volume,
             n2.n_name AS supp_nation
      FROM lineitem, orders, customer, supplier, nation n1, nation n2, region
      WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
        AND l_suppkey = s_suppkey
        AND c_nationkey = n1.n_nationkey AND n1.n_regionkey = r_regionkey
        AND r_name = 'AMERICA'
        AND s_nationkey = n2.n_nationkey
    )
    SELECT o_year,
           round(CAST(SUM(CASE WHEN supp_nation = 'NATION_6' THEN volume
                               ELSE CAST(0 AS DECIMAL(38,6)) END) AS DOUBLE)
                 / CAST(SUM(volume) AS DOUBLE), 6) AS mkt_share
    FROM flat GROUP BY o_year
    """,
    survey="B1 join_inner join_broadcast agg_basic fn_date (TPC-H Q8 shape: market share)",
)
def sql_q8(spark, sf_dir):
    """National market share: 7-table join, conditional aggregation, exact
    decimal volume sums so the share ratio is order-insensitive."""
    register_views(spark, sf_dir, "lineitem", "orders", "customer", "supplier", "nation", "region")
    return spark.sql(
        """
        WITH flat AS (
          SELECT year(o_orderdate) AS o_year,
                 CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6)) AS volume,
                 n2.n_name AS supp_nation
          FROM lineitem, orders, customer, supplier, nation n1, nation n2, region
          WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
            AND l_suppkey = s_suppkey
            AND c_nationkey = n1.n_nationkey AND n1.n_regionkey = r_regionkey
            AND r_name = 'AMERICA'
            AND s_nationkey = n2.n_nationkey
        )
        SELECT o_year,
               round(CAST(SUM(CASE WHEN supp_nation = 'NATION_6' THEN volume
                                   ELSE CAST(0 AS DECIMAL(38,6)) END) AS DOUBLE)
                     / CAST(SUM(volume) AS DOUBLE), 6) AS mkt_share
        FROM flat GROUP BY o_year
        """
    )


@register(
    "sql_q21",
    """
    SELECT s_name, COUNT(*) AS numwait
    FROM supplier, lineitem l1, orders, nation
    WHERE s_suppkey = l1.l_suppkey
      AND o_orderkey = l1.l_orderkey
      AND o_orderstatus = 'F'
      AND l1.l_shipdate > TIMESTAMP '1998-06-01'
      AND EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (
        SELECT 1 FROM lineitem l3
        WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
          AND l3.l_shipdate > TIMESTAMP '1998-06-01')
      AND s_nationkey = n_nationkey AND n_name = 'NATION_4'
    GROUP BY s_name
    ORDER BY numwait DESC, s_name ASC
    LIMIT 100
    """,
    survey="B1 join_semi join_anti agg_basic (TPC-H Q21 shape: correlated EXISTS + NOT EXISTS)",
)
def sql_q21(spark, sf_dir):
    """Suppliers who were the sole late shipper on an order (Q21 adapted
    to the slim schema: 'late' = shipped after the cutoff; the fixture has
    no receipt/commit dates): the hardest TPC-H decorrelation
    shape — a correlated EXISTS and a correlated NOT EXISTS over the same
    fact table become one semi-join and one anti-join against shared
    aggregated subplans; no per-row re-execution."""
    register_views(spark, sf_dir, "supplier", "lineitem", "orders", "nation")
    return spark.sql(
        """
        SELECT s_name, COUNT(*) AS numwait
        FROM supplier, lineitem l1, orders, nation
        WHERE s_suppkey = l1.l_suppkey
          AND o_orderkey = l1.l_orderkey
          AND o_orderstatus = 'F'
          AND l1.l_shipdate > TIMESTAMP '1998-06-01'
          AND EXISTS (
            SELECT 1 FROM lineitem l2
            WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (
            SELECT 1 FROM lineitem l3
            WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
              AND l3.l_shipdate > TIMESTAMP '1998-06-01')
          AND s_nationkey = n_nationkey AND n_name = 'NATION_4'
        GROUP BY s_name
        ORDER BY numwait DESC, s_name ASC
        LIMIT 100
        """
    )


@register(
    "sink_zorder",
    "SELECT event_id, ts, user_id, value FROM events",
    survey="sink_partitioned sort (Z-order/Morton data layout: 2-D min-max file skipping, Delta OPTIMIZE ZORDER shape)",
)
def sink_zorder_q(spark, sf_dir):
    """Round-trips events through a Z-ORDERED parquet layout on (ts, value)
    (sources/batch.py zorder_write: sampled quantile buckets -> Morton
    interleave -> one range partition + in-partition sort). Contents are
    byte-identical to the input (the oracle checks that); the VALUE of the
    rewrite is per-file min/max tightness on BOTH dimensions — asserted in
    tests/test_zorder.py, where a 2-D range predicate skips files that a
    single-column sort must read."""
    from ltss_spark.sources.batch import zorder_write

    out = scratch_dir("ltss_zorder")
    e = _t(spark, sf_dir, "events").select("event_id", "ts", "user_id", "value")
    zorder_write(e, out, cols=("ts", "value"), bits=8, n_files=8)
    return spark.read.parquet(out).select("event_id", "ts", "user_id", "value")


@register(
    "ts_ohlc",
    f"""
    WITH keyed AS (
      SELECT event_type,
             CAST(date_trunc('day', ts) AS TIMESTAMP) AS bucket_start, value,
             strftime(ts, '%Y-%m-%d %H:%M:%S.%f') || '|'
               || lpad(CAST(event_id AS VARCHAR), 12, '0') AS k
      FROM events
    )
    SELECT event_type, bucket_start,
           arg_min(value, k) AS open,
           MAX(value) AS high,
           MIN(value) AS low,
           arg_max(value, k) AS close,
           {oracle_dsum('value', 2)} AS volume,
           COUNT(*) AS n_ticks
    FROM keyed GROUP BY 1, 2
    """,
    survey="agg_first_last agg_minmax_by fn_date (candlestick_agg analogue: OHLC + exact volume, one hash agg)",
)
def ts_ohlc_q(spark, sf_dir):
    """Daily OHLC candles per event type over the events stream
    (operators/timeseries.py ohlc). The DuckDB tiebreak key is a
    fixed-width (timestamp, id) string whose ordering equals Spark's
    struct comparison — equal-time ticks resolve identically."""
    from ltss_spark.operators.timeseries import ohlc

    return ohlc(_t(spark, sf_dir, "events"), bucket="day")


@register(
    "ts_heartbeat",
    """
    WITH o AS (
      SELECT user_id, ts, event_id,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR ts - lag(ts) OVER w > INTERVAL 15 MINUTE
                  THEN 1 ELSE 0 END AS new_iv
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    g AS (
      SELECT user_id, ts,
             SUM(new_iv) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS UNBOUNDED PRECEDING) AS iv
      FROM o
    ),
    ivs AS (
      SELECT user_id, iv, MIN(ts) AS iv_start, MAX(ts) AS iv_end
      FROM g GROUP BY user_id, iv
    )
    SELECT user_id,
           COUNT(*) AS n_live_intervals,
           CAST(SUM(CAST(epoch(iv_end) - epoch(iv_start) AS DECIMAL(38,6))) AS DOUBLE) AS uptime_sec,
           MAX(iv_end) AS last_seen
    FROM ivs GROUP BY user_id
    """,
    survey="win_cumulative agg_first_last fn_date (heartbeat_agg analogue: liveness intervals from heartbeats)",
)
def ts_heartbeat_q(spark, sf_dir):
    """TimescaleDB heartbeat_agg analogue: treat each user's events as
    heartbeats with a 15-minute liveness window; merge beats closer than
    the window into live intervals, report interval count, total uptime,
    and last_seen. Two windows + two hash aggs, all keyed by user —
    one shuffle at scale (the same plan shape as session windows)."""
    from pyspark.sql import Window as W

    e = _t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    # exact micros arithmetic: cast('long') would truncate to whole seconds
    # while the oracle's INTERVAL comparison is micros-exact, diverging on
    # gaps in (900, 901)s — and the driver's events carry micros precision
    new_iv = F.when(
        F.lag("ts").over(w).isNull()
        | (
            F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
            > 900 * 1_000_000
        ),
        1,
    ).otherwise(0)
    g = e.select("user_id", "ts", "event_id", new_iv.alias("new_iv")).select(
        "user_id",
        "ts",
        F.sum("new_iv").over(w.rowsBetween(W.unboundedPreceding, 0)).alias("iv"),
    )
    ivs = g.groupBy("user_id", "iv").agg(
        F.min("ts").alias("iv_start"), F.max("ts").alias("iv_end")
    )
    return ivs.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_live_intervals"),
        F.sum(
            (F.col("iv_end").cast("double") - F.col("iv_start").cast("double"))
            .cast("decimal(38,6)")
        ).cast("double").alias("uptime_sec"),
        F.max("iv_end").alias("last_seen"),
    )


@register(
    "ltss_retention",
    """
    SELECT event_id, ts, value, strftime(ts, '%Y-%m') AS month
    FROM events
    WHERE strftime(ts, '%Y-%m') >= '2024-01'
    """,
    survey="sink_partitioned filter_basic (drop_chunks retention analogue: partition-level TTL, no data rewrite)",
)
def ltss_retention_q(spark, sf_dir):
    """TimescaleDB drop_chunks / retention-policy analogue
    (sources/batch.drop_partitions): expire whole time partitions by
    deleting partition directories through the Hadoop FileSystem API
    (works unchanged on s3a/hdfs) — metadata work, never a
    scan-and-rewrite of surviving rows; the fingerprint sidecar, when
    present, is pruned in the same call. The oracle checks the surviving
    set equals a time-predicate filter; the unit test asserts the dropped
    partition's files are gone from disk. At 100 TB a month's retention
    is one directory unlink per partition, the same cost profile as
    drop_chunks."""
    from ltss_spark.sources.batch import drop_partitions

    out = scratch_dir("ltss_retain")
    e = _t(spark, sf_dir, "events").withColumn(
        "month", F.date_format("ts", "yyyy-MM")
    ).select("event_id", "ts", "value", "month")
    e.hint("rebalance", "month").write.mode("overwrite").partitionBy(
        "month"
    ).parquet(out)
    drop_partitions(spark, out, before="2024-01")
    return spark.read.parquet(out).select(
        "event_id", "ts", "value", F.col("month").cast("string").alias("month")
    )


@register(
    "ltss_state_periods",
    f"""
    WITH {_STATES_CTE},
    ordered AS (
      SELECT entity_id, state, time, event_id,
             lag(state) OVER (PARTITION BY entity_id ORDER BY time, event_id)
               AS prev_state
      FROM states
    ),
    changes AS (
      SELECT entity_id, state, time, event_id FROM ordered
      WHERE prev_state IS NULL OR state IS DISTINCT FROM prev_state
    )
    SELECT entity_id, state, time AS valid_from,
           lead(time) OVER w AS valid_to,
           (lead(time) OVER w IS NULL) AS is_current
    FROM changes
    WINDOW w AS (PARTITION BY entity_id ORDER BY time, event_id)
    """,
    survey="win_lag_lead B5 (SCD2 state history: validity intervals from the change stream, change-collapsed)",
)
def ltss_state_periods_q(spark, sf_dir):
    """SCD2-style state history: one row per state PERIOD per entity
    (valid_from/valid_to half-open intervals, open-ended for the current
    state), consecutive identical states collapsed — the interval form
    behind 'how long was the heater on' queries (generalizes
    ltss_timeinstate). One window per entity key = one shuffle.

    The lead runs AFTER collapsing, so each period ends exactly when the
    next DIFFERENT state begins — periods tile each entity's timeline with
    no gaps or overlaps (asserted in tests/test_operators.py)."""
    from pyspark.sql import Window as W

    states = states_from_events(_t(spark, sf_dir, "events"))
    w = W.partitionBy("entity_id").orderBy("time", "event_id")
    ordered = states.select(
        "entity_id", "state", "time", "event_id",
        F.lag("state").over(w).alias("prev_state"),
    )
    changed = ordered.filter(
        F.col("prev_state").isNull()
        | ~F.col("state").eqNullSafe(F.col("prev_state"))
    )
    return changed.select(
        "entity_id",
        "state",
        F.col("time").alias("valid_from"),
        F.lead("time").over(w).alias("valid_to"),
        F.lead("time").over(w).isNull().alias("is_current"),
    )


@register(
    "ltss_compress",
    f"""
    WITH {_STATES_CTE},
    deduped AS (
      SELECT *, row_number() OVER (PARTITION BY time, entity_id
                                   ORDER BY event_id DESC) AS rn
      FROM states
      WHERE entity_id IS NOT NULL AND state IS NOT NULL AND state <> 'unknown'
    )
    SELECT time, entity_id, state, attributes FROM deduped WHERE rn = 1
    """,
    survey="fn_array agg_collect (TimescaleDB native-compression analogue: segmentby/orderby columnar codec, hash-verified by exact round trip)",
)
def ltss_compress_q(spark, sf_dir):
    """Columnar segment compression round trip (operators/compress.py): the
    canonical state table packed into one row per (entity, month) segment —
    delta-encoded micros + per-column dictionaries, TimescaleDB's
    ``compress_segmentby => 'entity_id', compress_orderby => 'time'`` shape
    (the reference promotes its table to exactly such a hypertable,
    /root/reference/custom_components/ltss/__init__.py:336-344) — then
    decompressed. The oracle is the UNCOMPRESSED table, so the hash check
    proves the codec is lossless end-to-end. Compress: one shuffle (the
    segment groupBy). Decompress: posexplode + one bounded per-segment
    window."""
    from ltss_spark.ingest import valid_event_expr
    from ltss_spark.operators.compress import compress_states, decompress_states

    states = dedup_primary_key(
        states_from_events(_t(spark, sf_dir, "events")).filter(valid_event_expr()),
        tie_breaker="event_id",
    ).select("time", "entity_id", "state", "attributes")
    packed = compress_states(states, value_cols=("state", "attributes"))
    return decompress_states(packed, value_cols=("state", "attributes")).select(
        "time", "entity_id", "state", "attributes"
    )


@register(
    "ts_sessionize",
    """
    WITH ordered AS (
      SELECT user_id, ts, event_id,
             lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
      FROM events
    ),
    marked AS (
      SELECT user_id, ts, event_id,
             CASE WHEN prev_ts IS NULL
                   OR epoch_us(ts) - epoch_us(prev_ts) > 43200000000
                  THEN 1 ELSE 0 END AS is_new
      FROM ordered
    ),
    sess AS (
      SELECT user_id, ts,
             SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND CURRENT ROW) AS session_seq
      FROM marked
    )
    SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
           MIN(ts) AS session_start, MAX(ts) AS session_end,
           COUNT(*) AS n_events,
           epoch_us(MAX(ts)) - epoch_us(MIN(ts)) AS duration_us
    FROM sess GROUP BY user_id, session_seq
    """,
    survey="stream_window_session win_lag_lead win_cumulative agg_basic (batch sessionization: lag + cumsum)",
)
def ts_sessionize_q(spark, sf_dir):
    """Batch sessionization (the HA 'episode' detection of
    stream_window_session, run offline over history): 12-hour gap rule,
    lag+cumsum composition, exact-microsecond arithmetic — see
    operators/timeseries.sessionize for the scale notes."""
    from ltss_spark.operators.timeseries import sessionize

    return sessionize(
        _t(spark, sf_dir, "events"),
        time_col="ts",
        key_cols=("user_id",),
        gap_seconds=12 * 3600,
        tie_breaker="event_id",
    ).select(
        "user_id",
        F.col("session_seq").cast("bigint").alias("session_seq"),
        "session_start",
        "session_end",
        "n_events",
        "duration_us",
    )


@register(
    "geo_bbox_join",
    """
    WITH pts AS (
      SELECT c_custkey,
             CAST(c_custkey % 360 AS DOUBLE) - 180.0 + 0.5 AS lon,
             CAST(c_custkey % 178 AS DOUBLE) - 89.0 + 0.25 AS lat
      FROM customer
    ),
    boxes AS (
      SELECT n_nationkey AS box_id,
             CAST((n_nationkey * 29) % 300 AS DOUBLE) - 160.0 AS west,
             CAST((n_nationkey * 17) % 120 AS DOUBLE) - 70.0 AS south,
             CAST((n_nationkey * 29) % 300 AS DOUBLE) - 160.0 + 24.0 AS east,
             CAST((n_nationkey * 17) % 120 AS DOUBLE) - 70.0 + 18.0 AS north
      FROM nation
    )
    SELECT c_custkey, box_id, lon, lat
    FROM pts, boxes
    WHERE lon BETWEEN west AND east AND lat BETWEEN south AND north
    """,
    survey="B7 geo_distance join_theta (grid-bucketed spatial join: point-in-bbox without all-pairs)",
)
def geo_bbox_join_q(spark, sf_dir):
    """Point-in-bbox JOIN via grid bucketing (operators/geo.
    bbox_spatial_join): points key to one cell, boxes explode to their
    overlapped cells, equi-join + exact residual. The oracle is the
    brute-force theta join — identical rows, different asymptotics (the
    theta join is O(P x B); the grid join shuffles on cell keys and is the
    shape that survives 100 TB of points)."""
    from ltss_spark.operators.geo import bbox_spatial_join

    c = _t(spark, sf_dir, "customer")
    pts = c.select(
        "c_custkey",
        ((F.col("c_custkey") % 360).cast("double") - 180.0 + 0.5).alias("lon"),
        ((F.col("c_custkey") % 178).cast("double") - 89.0 + 0.25).alias("lat"),
    )
    n = _t(spark, sf_dir, "nation")
    west = ((F.col("n_nationkey") * 29) % 300).cast("double") - 160.0
    south = ((F.col("n_nationkey") * 17) % 120).cast("double") - 70.0
    boxes = n.select(
        F.col("n_nationkey").alias("box_id"),
        west.alias("west"),
        south.alias("south"),
        (west + 24.0).alias("east"),
        (south + 18.0).alias("north"),
    )
    return bbox_spatial_join(pts, boxes, cell_deg=8.0).select(
        "c_custkey", "box_id", "lon", "lat"
    )


@register(
    "ltss_cagg_refresh",
    f"""
    SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS bucket, event_type,
           COUNT(*) AS n_events,
           {oracle_dsum('value', 2)} AS sum_value,
           MIN(value) AS min_value,
           MAX(value) AS max_value
    FROM events
    GROUP BY 1, 2
    """,
    survey="B4 agg_basic sink_partitioned B8 (continuous-aggregate REFRESH: stale-bucket detection + partition-targeted recompute)",
)
def ltss_cagg_refresh_q(spark, sf_dir):
    """TimescaleDB ``refresh_continuous_aggregate`` analogue
    (operators/cagg.py): build the daily rollup from a PARTIAL source
    (last days and a scattered late-replay subset withheld), then land the
    full source and refresh — fingerprint comparison finds exactly the
    changed days, only those re-aggregate (dynamic partition overwrite),
    and the result must hash-match the direct GROUP BY over the complete
    table. Convergence of incremental maintenance, proven by oracle."""
    from ltss_spark.functions.numeric import dsum
    from ltss_spark.operators.cagg import read_rollup, refresh_rollup

    base = scratch_dir("ltss_cagg")
    e = _t(spark, sf_dir, "events")

    def agg(src):
        return src.groupBy("bucket", "event_type").agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum("value", 2).alias("sum_value"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )

    v1 = e.filter(
        (F.col("ts") < F.lit("2024-01-25").cast("timestamp"))
        & ~(
            (F.col("event_id") % 97 == 0)
            & (F.col("ts") < F.lit("2024-01-11").cast("timestamp"))
        )
    )
    refresh_rollup(spark, v1, base, agg, time_col="ts", unit="day",
                   sig_cols=["event_id", "value"])
    # late replay + new days arrive; refresh touches only the stale days
    refresh_rollup(spark, e, base, agg, time_col="ts", unit="day",
                   sig_cols=["event_id", "value"])
    return read_rollup(spark, base)


@register(
    "ltss_cagg_stats_refresh",
    f"""
    SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS bucket, event_type,
           COUNT(*) AS n_events,
           {oracle_dsum('value', 2)} AS sum_value,
           MIN(value) AS min_value,
           MAX(value) AS max_value
    FROM events
    GROUP BY 1, 2
    """,
    survey="B4 agg_basic sink_partitioned B8 (metadata-driven cagg refresh: write-time fingerprint sidecar, scan-free change detection)",
)
def ltss_cagg_stats_refresh_q(spark, sf_dir):
    """The petabyte form of ltss_cagg_refresh: change detection from the
    fingerprint sidecar RECORDED AT WRITE TIME (sources/batch.
    write_bucket_stats via write_partitioned/upsert_partitioned
    stats_unit) instead of re-scanning the source — refresh_rollup's
    source scan collapses to a |buckets|-row metadata read, and the upsert
    maintains the sidecar incrementally (touched months only). Flow:
    partial history lands WITH stats -> sidecar-driven build; the
    withheld late-replay slice upserts in (sidecar updated
    incrementally) -> sidecar-driven refresh touches only the changed
    days. The readback must hash-match the direct GROUP BY over the
    complete table — incremental-maintenance convergence with zero
    fingerprint scans, proven by oracle."""
    from ltss_spark.functions.numeric import dsum
    from ltss_spark.operators.cagg import read_rollup, refresh_rollup
    from ltss_spark.sources.batch import (
        read_bucket_stats,
        upsert_partitioned,
        write_partitioned,
    )

    base = scratch_dir("ltss_cagg_stats")
    table, rollup = f"{base}/table", f"{base}/rollup"
    e = _t(spark, sf_dir, "events")

    def agg(src):
        return src.groupBy("bucket", "event_type").agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum("value", 2).alias("sum_value"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )

    v1 = e.filter(
        (F.col("ts") < F.lit("2024-01-25").cast("timestamp"))
        & ~(
            (F.col("event_id") % 97 == 0)
            & (F.col("ts") < F.lit("2024-01-11").cast("timestamp"))
        )
    )
    sig = ["event_id", "value"]
    write_partitioned(v1, table, time_col="ts", stats_unit="day", stats_sig_cols=sig)
    refresh_rollup(
        spark,
        spark.read.parquet(table).drop("month"),
        rollup,
        agg,
        time_col="ts",
        unit="day",
        sig_cols=sig,
        source_stats=read_bucket_stats(spark, table),
    )
    late = e.join(v1.select("event_id"), "event_id", "left_anti")
    upsert_partitioned(
        spark, table, late, pk=("event_id",), time_col="ts",
        tie_breaker=None, stats_unit="day", stats_sig_cols=sig,
    )
    refresh_rollup(
        spark,
        spark.read.parquet(table).drop("month"),
        rollup,
        agg,
        time_col="ts",
        unit="day",
        sig_cols=sig,
        source_stats=read_bucket_stats(spark, table),
    )
    return read_rollup(spark, rollup)


@register(
    "sink_upsert",
    f"""
    WITH {_STATES_CTE},
    deduped AS (
      SELECT *, row_number() OVER (PARTITION BY time, entity_id
                                   ORDER BY event_id DESC) AS rn
      FROM states
      WHERE entity_id IS NOT NULL AND state IS NOT NULL AND state <> 'unknown'
    )
    SELECT time, entity_id, state, attributes FROM deduped WHERE rn = 1
    """,
    survey="sink_partitioned B9 B8 (PK upsert: ON CONFLICT DO UPDATE on parquet, touched-month rewrite)",
)
def sink_upsert_q(spark, sf_dir):
    """The reference's PK upsert (models.py:31-32) on immutable files:
    land a table where every 7th row carries a STALE state, then upsert
    the true rows — updates win per PK, only touched month partitions
    rewrite (sources/batch.upsert_partitioned). The oracle is the clean
    canonical table, so the hash proves the upsert repaired exactly the
    stale rows and disturbed nothing else."""
    from ltss_spark.ingest import valid_event_expr
    from ltss_spark.sources.batch import upsert_partitioned, write_partitioned

    base = scratch_dir("ltss_upsert")
    states = dedup_primary_key(
        states_from_events(_t(spark, sf_dir, "events")).filter(valid_event_expr()),
        tie_breaker="event_id",
    ).select("time", "entity_id", "state", "attributes", "event_id")
    stale = F.col("event_id") % 7 == 0
    v1 = states.withColumn(
        "state", F.when(stale, F.lit("STALE")).otherwise(F.col("state"))
    )
    write_partitioned(v1, base)
    upsert_partitioned(spark, base, states.filter(stale))
    return spark.read.parquet(base).select("time", "entity_id", "state", "attributes")


@register(
    "ltss_attr_keys",
    f"""
    WITH {_STATES_CTE},
    enriched AS (
      SELECT entity_id,
             '{{"k": ' || CAST(event_id % 100 AS VARCHAR)
               || ', "src": "' || split_part(entity_id, '.', 1) || '"'
               || CASE WHEN event_id % 3 = 0
                       THEN ', "battery": ' || CAST(event_id % 5 AS VARCHAR)
                       ELSE '' END
               || CASE WHEN event_id % 5 = 0 THEN ', "unit": "C"' ELSE '' END
               || '}}' AS attributes
      FROM states
    ),
    ks AS (
      SELECT entity_id, unnest(json_keys(attributes)) AS attr_key
      FROM enriched WHERE attributes IS NOT NULL
    )
    SELECT attr_key, COUNT(*) AS n_rows,
           CAST(COUNT(DISTINCT entity_id) AS BIGINT) AS n_entities
    FROM ks GROUP BY attr_key
    """,
    survey="B5 fn_json agg_distinct (dynamic-payload key census: which JSON attributes exist, how hot)",
)
def ltss_attr_keys_q(spark, sf_dir):
    """Schema discovery over the dynamic JSONB payload (the reference's
    attributes column is schemaless by design, SURVEY §1.3): a key census
    telling an operator WHICH attribute keys exist and how hot each is —
    the input to the materialize-hot-keys decision
    (ltss_attr_materialize). The fixture's payload is single-key, so the
    entry enriches it with deterministic conditional keys (battery on
    every 3rd event, unit on every 5th) the way real HA attributes vary
    per integration. json_object_keys + explode + one hash agg; linear,
    codegen'd, no Python."""
    states = states_from_events(_t(spark, sf_dir, "events"))
    attrs = F.concat(
        F.lit('{"k": '), (F.col("event_id") % 100).cast("string"),
        F.lit(', "src": "'), F.split(F.col("entity_id"), r"\.").getItem(0), F.lit('"'),
        F.when(
            F.col("event_id") % 3 == 0,
            F.concat(F.lit(', "battery": '), (F.col("event_id") % 5).cast("string")),
        ).otherwise(F.lit("")),
        F.when(F.col("event_id") % 5 == 0, F.lit(', "unit": "C"')).otherwise(F.lit("")),
        F.lit("}"),
    )
    enriched = states.select("entity_id", attrs.alias("attributes"))
    ks = enriched.filter(F.col("attributes").isNotNull()).select(
        "entity_id", F.explode(F.json_object_keys("attributes")).alias("attr_key")
    )
    return ks.groupBy("attr_key").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("entity_id").alias("n_entities"),
    )


@register(
    "stream_upsert",
    f"""
    WITH {_STATES_CTE},
    deduped AS (
      SELECT *, row_number() OVER (PARTITION BY time, entity_id
                                   ORDER BY event_id DESC) AS rn
      FROM states
    )
    SELECT time, entity_id, state, attributes FROM deduped WHERE rn = 1
    """,
    survey="stream_ingest sink_append B9 (streaming PK-upsert sink: full-replay idempotency, ON CONFLICT semantics)",
)
def stream_upsert_q(spark, sf_dir):
    """The ingest stream landed through the PK-UPSERT sink
    (streaming/ingest.make_upsert_sink -> sources/batch.upsert_partitioned)
    instead of the epoch-append sink, then the ENTIRE pipeline is re-run
    with a fresh checkpoint — a full at-least-once replay. The oracle is
    the canonical deduped table: the hash passing proves a replayed batch
    REPLACES its PKs (the reference's ON CONFLICT posture, models.py:31-32)
    rather than appending duplicates, with the event_id-max survivor
    deterministic."""
    from ltss_spark.streaming.ingest import run_ingest_availablenow

    base = scratch_dir("ltss_supsert")
    for ck in ("ckpt1", "ckpt2"):  # second pass = full replay, must be a no-op
        run_ingest_availablenow(
            spark, sf_dir, out_path=f"{base}/out", checkpoint=f"{base}/{ck}",
            dedup=False, upsert=True,
        )
    return spark.read.parquet(f"{base}/out").select(
        "time", "entity_id", "state", "attributes"
    )


@register(
    "sink_versioned",
    """
    SELECT event_id, user_id, event_type, value
    FROM events WHERE event_id % 3 IN (0, 1)
    """,
    survey="sink_append sink_partitioned A12 (manifest-versioned sink: snapshot isolation, time travel, O(1) rollback)",
)
def sink_versioned_q(spark, sf_dir):
    """Snapshot-versioned table lifecycle (operators/snapshot.py): v1
    appends the event_id%3==0 slice, v2 appends the ==1 slice, v3
    OVERWRITES the table with the ==2 slice, v4 rolls back to v2 — and
    the returned frame is the LATEST read, which must equal slices 0∪1:
    the overwrite is fully undone by a manifest pointer flip, no data
    rewritten. Readers plan from the manifest (never a directory
    listing), so v3's directory is invisible to this read even though it
    sits under data/ — the snapshot-isolation property that lets a 100 TB
    re-materialization land while yesterday's training job keeps reading
    its pinned version. Expire/GC and crash-visibility are pinned in
    tests/test_snapshot.py."""
    from ltss_spark.operators.snapshot import commit, read_version, rollback

    base = scratch_dir("ltss_versioned")
    e = _t(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    commit(e.filter(F.col("event_id") % 3 == 0), base, mode="append")
    v2 = commit(e.filter(F.col("event_id") % 3 == 1), base, mode="append")
    commit(e.filter(F.col("event_id") % 3 == 2), base, mode="overwrite")
    rollback(base, v2)
    return read_version(spark, base)


@register(
    "sink_optimize",
    """
    SELECT event_id, user_id, event_type, value FROM events
    """,
    survey="sink_append sink_compact A12 (OPTIMIZE: small-file compaction committed as a table version — content identical, layout collapsed, O(1) un-optimize via rollback)",
)
def sink_optimize_q(spark, sf_dir):
    """Small-file compaction on the versioned sink (operators/snapshot.
    optimize_table — the Delta OPTIMIZE analogue): three append commits
    accumulate many small files across three live directories, then the
    rewrite repartitions the whole table into one bin-packed directory
    committed as a NEW version (round 8: size-aware repartition replaced
    coalesce, which inherited upstream partition skew — equal output
    files regardless of input layout, pinned by the spread test in
    tests/test_snapshot.py). The returned latest read must hash-equal
    the full union — compaction may never change content — while
    snapshot isolation keeps every pre-OPTIMIZE version readable until
    expire(); the file-count collapse and rollback-undo are pinned in
    tests/test_snapshot.py."""
    from ltss_spark.operators.snapshot import commit, optimize_table, read_version

    base = scratch_dir("ltss_optimize")
    e = _t(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    for m in range(3):
        commit(e.filter(F.col("event_id") % 3 == m), base, mode="append")
    optimize_table(spark, base, target_files=1)
    return read_version(spark, base)


@register(
    "sink_version_diff",
    """
    SELECT event_id, user_id, value, 'insert' AS _change
    FROM events WHERE event_id % 3 = 2
    UNION ALL
    SELECT event_id, user_id, value, 'delete' AS _change
    FROM events WHERE event_id % 3 = 0
    """,
    survey="sink_append B9 (version change feed: manifest set-diff yields insert/delete rows between any two snapshots)",
)
def sink_version_diff_q(spark, sf_dir):
    """Incremental consumption off the versioned sink (operators/
    snapshot.read_changes — the Delta-CDF analogue): v1 appends slice
    %3==0, v2 appends %3==1, v3 OVERWRITES with %3==2; the feed
    changes(v1 -> v3) must be exactly {slice 2 as inserts, slice 0 as
    deletes} — slice 1, added in v2 and dropped by v3's overwrite,
    cancels because the diff compares ENDPOINT manifests, not the commit
    log. Planning is O(manifest) with zero data comparison (immutable
    directories make dir-identity a proof of row-identity), so a
    downstream incremental refresh at 100 TB reads only the changed
    slices, never the table."""
    from ltss_spark.operators.snapshot import commit, read_changes

    base = scratch_dir("ltss_vdiff")
    e = _t(spark, sf_dir, "events").select("event_id", "user_id", "value")
    v1 = commit(e.filter(F.col("event_id") % 3 == 0), base, mode="append")
    commit(e.filter(F.col("event_id") % 3 == 1), base, mode="append")
    v3 = commit(e.filter(F.col("event_id") % 3 == 2), base, mode="overwrite")
    return read_changes(spark, base, v1, v3)


_FUNNEL_ORACLE = """
    WITH s1 AS (
      SELECT user_id, MIN(ts) AS t1 FROM events
      WHERE event_type = 'signup' GROUP BY 1
    ),
    s2 AS (
      SELECT e.user_id, MIN(ts) AS t2 FROM events e JOIN s1 USING (user_id)
      WHERE event_type = 'view' AND ts > t1
        AND ts <= t1 + INTERVAL 7 DAY
      GROUP BY 1
    ),
    s3 AS (
      SELECT e.user_id, MIN(ts) AS t3 FROM events e JOIN s2 USING (user_id)
      WHERE event_type = 'purchase' AND ts > t2
        AND ts <= t2 + INTERVAL 7 DAY
      GROUP BY 1
    ),
    keys AS (
      SELECT DISTINCT user_id FROM events
      WHERE event_type IN ('signup', 'view', 'purchase')
    )
    SELECT k.user_id,
           CAST(CASE WHEN t3 IS NOT NULL THEN 3
                     WHEN t2 IS NOT NULL THEN 2
                     WHEN t1 IS NOT NULL THEN 1
                     ELSE 0 END AS INT) AS funnel_stage,
           t1 AS stage1_ts, t2 AS stage2_ts, t3 AS stage3_ts
    FROM keys k
    LEFT JOIN s1 USING (user_id)
    LEFT JOIN s2 USING (user_id)
    LEFT JOIN s3 USING (user_id)
"""


@register(
    "ts_funnel",
    _FUNNEL_ORACLE,
    survey="win_cumulative agg_first_last fn_array (ordered funnel: per-key staged conversion via one sorted fold, no self-joins)",
)
def ts_funnel(spark, sf_dir):
    """Ordered funnel signup -> view -> purchase, each stage within 7
    days of the previous (operators/timeseries.funnel): one row per user
    with the furthest stage reached and each stage's first qualifying
    timestamp, greedy first-occurrence semantics. The relational form is
    a chain of dependent aggregate+join passes — one scan PER STAGE (the
    oracle's CTE chain); the Spark plan folds the per-user sorted event
    list with F.aggregate instead: ONE shuffle total, the step logic in
    whole-stage codegen, per-key state bounded by that user's
    funnel-relevant events. The hash match against the CTE chain proves
    the fold implements exactly the greedy funnel semantics."""
    from ltss_spark.operators.timeseries import funnel

    return funnel(
        _t(spark, sf_dir, "events"),
        stages=["signup", "view", "purchase"],
        max_step="7 days",
    )


_COHORT_ORACLE = """
    WITH active AS (
      -- DuckDB date_trunc('week') yields DATE (Spark: TIMESTAMP) — pin it
      SELECT DISTINCT user_id,
             CAST(date_trunc('week', ts) AS TIMESTAMP) AS period
      FROM events
    ),
    firsts AS (
      SELECT user_id, MIN(period) AS cohort FROM active GROUP BY 1
    ),
    grid AS (
      SELECT cohort,
             CAST(datediff('day', cohort, period) / 7 AS INT) AS k,
             CAST(COUNT(DISTINCT a.user_id) AS BIGINT) AS n_active
      FROM active a JOIN firsts f USING (user_id)
      GROUP BY 1, 2
    )
    SELECT cohort, k, n_active,
           round(CAST(n_active AS DOUBLE) /
                 MAX(CASE WHEN k = 0 THEN n_active END)
                   OVER (PARTITION BY cohort), 6) AS retention_rate
    FROM grid
"""


@register(
    "ts_cohort",
    _COHORT_ORACLE,
    survey="agg_distinct win_frame fn_date (cohort retention triangle: first-activity cohorts x period offset, rates from the k=0 row)",
)
def ts_cohort(spark, sf_dir):
    """Weekly cohort retention over events (operators/timeseries.
    cohort_retention): users bucketed by first-active week, distinct
    actives counted at every week offset, rate vs the cohort's own k=0
    size (the fixture spans one month, so weeks give a real 5x5
    triangle). Two aggregations and one co-partitioned join on user_id —
    the rate window runs over the |cohorts| x |offsets| grid, which is
    bounded by the calendar, not the corpus. Week starts agree across
    engines (both truncate to Monday), and the day-difference of two
    week-truncated dates is an exact multiple of 7, so k is integral on
    both engines."""
    from ltss_spark.operators.timeseries import cohort_retention

    return cohort_retention(_t(spark, sf_dir, "events"), unit="week")


@register(
    "sink_pruned_read",
    """
    SELECT event_id, user_id, value FROM events
    WHERE event_id >= (SELECT 0.4 * (MAX(event_id) + 1) FROM events)
      AND event_id <  (SELECT 0.6 * (MAX(event_id) + 1) FROM events)
    """,
    survey="sink_partitioned filter_basic B8 (manifest zone maps: whole commit directories pruned by min/max before any parquet footer opens)",
)
def sink_pruned_read_q(spark, sf_dir):
    """Manifest-level data skipping (operators/snapshot.py): events land
    in FIVE commits of contiguous event_id ranges, each recording an
    event_id zone map in its manifest; the range read prunes to the
    directories whose [min,max] overlap [40000, 60000) AT THE MANIFEST —
    the excluded commits' parquet footers are never opened (pinned by
    tests/test_snapshot.py::test_zone_map_pruning via inputFiles). The
    residual row filter then runs inside the surviving directories, so
    the answer is identical with or without pruning — which is exactly
    what this oracle checks. At 100 TB with thousands of accumulated
    commits this is the difference between planning over the manifest
    and opening every footer; parquet min/max skipping still applies
    WITHIN the kept directories."""
    from ltss_spark.operators.snapshot import commit, read_version

    base = scratch_dir("ltss_pruned")
    e = _t(spark, sf_dir, "events").select("event_id", "user_id", "value")
    # fixture ids are dense 0..n-1 with n divisible by 10, so the 40/60%
    # bounds are exact integers at every scale factor (matches the
    # oracle's scalar-subquery fractions bit-for-bit)
    n = e.agg(F.max("event_id")).collect()[0][0] + 1
    step, lo, hi = n // 5, int(0.4 * n), int(0.6 * n)
    for i in range(5):
        commit(
            e.filter(
                (F.col("event_id") >= i * step)
                & (F.col("event_id") < (i + 1) * step)
            ),
            base,
            stats_cols=["event_id"],
        )
    return read_version(spark, base, prune=("event_id", lo, hi - 1)).filter(
        (F.col("event_id") >= lo) & (F.col("event_id") < hi)
    )


@register(
    "ts_ewma",
    """
    WITH base AS (
      SELECT event_id, user_id, CAST(value AS DOUBLE) AS x,
             array_agg(CAST(value AS DOUBLE)) OVER (
               PARTITION BY user_id ORDER BY ts ASC, event_id ASC
               ROWS BETWEEN 7 PRECEDING AND CURRENT ROW
             ) AS l
      FROM events WHERE value IS NOT NULL
    )
    SELECT event_id, user_id, x,
           round(
             CAST((SELECT SUM(CAST(round(l[g.i]
                     * (1.0 / CAST(1::BIGINT << (len(l) - g.i) AS DOUBLE))
                     * 1e6, 0) AS BIGINT))
                   FROM UNNEST(generate_series(1, len(l))) AS g(i)) AS DOUBLE)
             /
             CAST((SELECT SUM(CAST(round(
                     (1.0 / CAST(1::BIGINT << (len(l) - g.i) AS DOUBLE))
                     * 1e6, 0) AS BIGINT))
                   FROM UNNEST(generate_series(1, len(l))) AS g(i)) AS DOUBLE),
             6) AS ewma
    FROM base
    """,
    survey="win_frame fn_array B3 (exponential moving average: power-of-two decay over a bounded frame — the smoothing companion to ts_trend)",
)
def ts_ewma_q(spark, sf_dir):
    """Per-user EWMA over the event value series (operators/timeseries.
    ewma): decay 1/2 per step, truncated at 8 points. One window shuffle,
    no joins; weights are exact powers of two (integer shift + divide —
    never pow(), whose last-ulp differs between libm and the JVM), terms
    scale to micro-unit LONGs and sum exactly, one final rounded
    division — the hash-stable formulation of an otherwise
    order-sensitive recursive smoother."""
    from ltss_spark.operators.timeseries import ewma

    e = (
        _t(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select("event_id", "user_id", "ts", "value")
    )
    return ewma(e, tie_col="event_id").select("event_id", "user_id", "x", "ewma")


@register(
    "ltss_cagg_ivm",
    """
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(event_id) AS BIGINT) AS id_sum
    FROM events WHERE event_id % 3 IN (1, 2)
    GROUP BY event_type
    """,
    survey="stream_rollup agg_basic join_full B4 (delta IVM: the change feed folds into the rollup — inserts add, deletes subtract, base never re-read)",
)
def ltss_cagg_ivm(spark, sf_dir):
    """Delta-based view maintenance end to end (operators/cagg.ivm_apply
    over operators/snapshot.read_changes): the per-event_type rollup is
    built once from table version 1 (slices 0∪1 of events), the table is
    then OVERWRITTEN to slices 1∪2, and the rollup is brought current by
    folding ONLY the change feed. Because the overwrite replaced whole
    directories, the surviving slice 1 flows through BOTH sides of the
    feed (deleted with v1's directory, inserted with v2's) and cancels
    EXACTLY in the fold — integer arithmetic makes the redundancy
    harmless; an append-only history (the common case) produces a pure
    insert feed with no such churn. The oracle recomputes the final rollup from
    scratch over slices 1∪2: the hash match proves the folded rollup is
    indistinguishable from a full rebuild. Maintained aggregates stay in
    exact integer arithmetic (count + bigint id_sum) — the precondition
    that makes delta IVM drift-free."""
    from ltss_spark.operators.cagg import ivm_apply
    from ltss_spark.operators.snapshot import commit, read_changes, read_version

    base = scratch_dir("ltss_ivm")
    e = _t(spark, sf_dir, "events").select("event_id", "event_type")
    v1 = commit(e.filter(F.col("event_id") % 3 != 2), base)
    v2 = commit(e.filter(F.col("event_id") % 3 != 0), base, mode="overwrite")
    rollup_v1 = (
        read_version(spark, base, v1)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("event_id").alias("id_sum"),
        )
    )
    feed = read_changes(spark, base, v1, v2)
    return ivm_apply(
        rollup_v1, feed, ["event_type"], sum_cols={"id_sum": "event_id"}
    )


@register(
    "ltss_state_transitions",
    f"""
    WITH {_STATES_CTE},
    ordered AS (
      SELECT entity_id, state,
             lag(state) OVER (PARTITION BY entity_id ORDER BY time, event_id)
               AS prev_state
      FROM states
    )
    SELECT entity_id, prev_state AS from_state, state AS to_state,
           CAST(COUNT(*) AS BIGINT) AS n_transitions
    FROM ordered
    WHERE prev_state IS NOT NULL AND state IS DISTINCT FROM prev_state
    GROUP BY 1, 2, 3
    """,
    survey="win_lag_lead agg_basic B3 (state transition matrix: per-entity "
    "Markov counts over the collapsed change stream — the 'what does this "
    "sensor do after X' analytics companion to ltss_state_periods)",
)
def ltss_state_transitions_q(spark, sf_dir):
    """Per-entity state transition counts (from_state -> to_state): lag
    window over the entity timeline, keep only genuine changes (null-safe
    state inequality — HA state machines re-emit identical states on
    attribute updates), one hash agg. One window shuffle on the entity
    key + one agg shuffle; both series-parallel."""
    from pyspark.sql import Window as W

    states = states_from_events(_t(spark, sf_dir, "events"))
    w = W.partitionBy("entity_id").orderBy("time", "event_id")
    ordered = states.select(
        "entity_id", "state", F.lag("state").over(w).alias("prev_state")
    )
    return (
        ordered.filter(
            F.col("prev_state").isNotNull()
            & ~F.col("state").eqNullSafe(F.col("prev_state"))
        )
        .groupBy(
            "entity_id",
            F.col("prev_state").alias("from_state"),
            F.col("state").alias("to_state"),
        )
        .agg(F.count(F.lit(1)).alias("n_transitions"))
    )


@register(
    "ts_changepoint_cusum",
    """
    WITH base AS (
      SELECT event_id, user_id, ts, CAST(value AS DOUBLE) AS x
      FROM events WHERE value IS NOT NULL
    ),
    sums AS (
      SELECT user_id, COUNT(*) AS n,
             SUM(CAST(round(x, 6) AS DECIMAL(38,6))) AS sx,
             SUM(CAST(round(x * x, 6) AS DECIMAL(38,6))) AS sxx
      FROM base GROUP BY user_id
    ),
    stats AS (
      SELECT user_id,
             round(CAST(sx AS DOUBLE) / n, 6) AS mu,
             round(sqrt(greatest(
               CAST(sxx AS DOUBLE) / n
               - round(CAST(sx AS DOUBLE) / n, 6) * round(CAST(sx AS DOUBLE) / n, 6),
               0.0)), 6) AS sigma
      FROM sums
    ),
    cum AS (
      SELECT b.event_id, b.user_id, b.ts, b.x, s.sigma,
             SUM(CAST(round((b.x - s.mu - 0.5 * s.sigma) * 1e6, 0) AS BIGINT))
               OVER w AS cpos,
             SUM(CAST(round(-(b.x - s.mu + 0.5 * s.sigma) * 1e6, 0) AS BIGINT))
               OVER w AS cneg
      FROM base b JOIN stats s USING (user_id)
      WINDOW w AS (PARTITION BY b.user_id ORDER BY b.ts, b.event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ),
    ref AS (
      SELECT event_id, user_id, x, sigma,
             cpos - least(MIN(cpos) OVER w2, 0) AS sp,
             cneg - least(MIN(cneg) OVER w2, 0) AS sn
      FROM cum
      WINDOW w2 AS (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT event_id, user_id, x,
           round(sp / 1e6, 6) AS s_pos,
           round(sn / 1e6, 6) AS s_neg,
           (sp > CAST(round(4.0 * sigma * 1e6, 0) AS BIGINT)
            OR sn > CAST(round(4.0 * sigma * 1e6, 0) AS BIGINT)) AS is_change
    FROM ref
    """,
    survey="win_cumulative win_frame agg_basic fn_math B3 (two-sided CUSUM "
    "change-point detection: recursive reflected walk re-expressed as "
    "prefix-sum minus prefix-min — one window shuffle per series, the "
    "mean-shift companion to ts_seasonal_anomaly/ts_outliers)",
)
def ts_changepoint_cusum_q(spark, sf_dir):
    """Page's two-sided CUSUM per user series (operators/timeseries.
    cusum_changepoints): the recursive max(0, s+y) walk becomes
    prefix-sum(y) - min(0, prefix-min) (reflection identity), so the
    detector is plain windows — no recursion, no UDF. Per-series
    mean/sigma round to 6 before use; deviations scale to micro-unit
    LONGs (ts_ewma's determinism form — integer rounding agrees across
    engines where round(x, 6) mid-pipeline does not; measured 1e-6 flips
    vs DuckDB with the fractional form) and every prefix sum/min and
    threshold compare is exact BIGINT. Both windows — Spark and oracle —
    use the full (ts, event_id) total order."""
    from ltss_spark.operators.timeseries import cusum_changepoints

    return cusum_changepoints(_t(spark, sf_dir, "events"))


@register(
    "ts_m4",
    """
    WITH base AS (
      SELECT event_id, user_id, ts, CAST(value AS DOUBLE) AS v
      FROM events WHERE value IS NOT NULL
    ),
    ranked AS (
      SELECT date_trunc('hour', ts) AS bucket_start, user_id, v,
             row_number() OVER (PARTITION BY user_id, date_trunc('hour', ts)
                                ORDER BY ts ASC, event_id ASC) AS rf,
             row_number() OVER (PARTITION BY user_id, date_trunc('hour', ts)
                                ORDER BY ts DESC, event_id DESC) AS rl
      FROM base
    )
    SELECT bucket_start, user_id,
           MIN(v) AS v_min, MAX(v) AS v_max,
           MAX(CASE WHEN rf = 1 THEN v END) AS v_first,
           MAX(CASE WHEN rl = 1 THEN v END) AS v_last,
           CAST(COUNT(*) AS BIGINT) AS n_samples
    FROM ranked GROUP BY 1, 2
    """,
    survey="agg_minmax_by B4 fn_date (M4 visualization downsampling: "
    "min/max/first/last per pixel bucket — one hash agg, the scalable "
    "dashboard renderer beside ts_lttb's per-series sweep)",
)
def ts_m4_q(spark, sf_dir):
    """M4 per (user, hour) over the event value series (operators/
    timeseries.m4_downsample): min/max by value, first/last by
    (ts, event_id) — all five aggregates in ONE map-side-partial hash
    aggregation, a single shuffle on the (key, bucket) pair. The oracle
    replays first/last with asc/desc row_numbers."""
    from ltss_spark.operators.timeseries import m4_downsample

    return m4_downsample(_t(spark, sf_dir, "events"))
