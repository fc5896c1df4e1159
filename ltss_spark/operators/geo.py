"""Geospatial operators — the PostGIS surface of the reference rebuilt as
plain arithmetic (SURVEY.md §2.B B7: location POINT column,
/root/reference/custom_components/ltss/models.py:35,44; README.md:18 claims
'directly accessing geolocation data' as a feature).

Spark has no geometry type (and Sedona is not in the container), so the
engine stores lon/lat doubles (extracted at ingest — ltss_spark.ingest.
extract_location) and answers the two query shapes PostGIS would:
- bounding box => two range predicates (pushdown-friendly: these reach the
  parquet scan as min/max filters — better than a GiST probe at scale);
- distance => haversine expression (codegen'd, no UDF).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column

EARTH_RADIUS_KM = 6371.0


def haversine_km(lon1: Column, lat1: Column, lon2: Column, lat2: Column) -> Column:
    """Great-circle distance in km. Transcendental (sin/cos/asin) output —
    callers should round before oracle comparison (libm vs JVM StrictMath
    may differ in the last ulp)."""
    rlat1, rlat2 = F.radians(lat1), F.radians(lat2)
    dlat = F.radians(lat2 - lat1)
    dlon = F.radians(lon2 - lon1)
    a = (
        F.pow(F.sin(dlat / 2), 2)
        + F.cos(rlat1) * F.cos(rlat2) * F.pow(F.sin(dlon / 2), 2)
    )
    # clamp: fp error can push a to 1 + 1e-16, and asin(>1) is NaN
    return F.lit(2 * EARTH_RADIUS_KM) * F.asin(F.least(F.sqrt(a), F.lit(1.0)))


def in_bbox(lon: Column, lat: Column, west: float, south: float, east: float, north: float) -> Column:
    """Bounding-box predicate; plain range filters => full pushdown."""
    return lon.between(west, east) & lat.between(south, north)


def to_wkt(lon: Column, lat: Column, precision: int = 6) -> Column:
    """WKT interop string (SURVEY §1.1: lon/lat doubles PLUS a WKT string,
    the shape PostGIS ``ST_AsText(location)`` returns for the reference's
    POINT column, models.py:44). Fixed decimal precision so the string is
    engine-independent (%g/repr formatting differs between JVMs and DBs);
    NULL when either coordinate is NULL — mirroring the row having no
    location."""
    return F.when(
        lon.isNotNull() & lat.isNotNull(),
        F.format_string(f"POINT(%.{precision}f %.{precision}f)", lon, lat),
    )


def from_wkt(wkt: Column) -> tuple[Column, Column]:
    """(lon, lat) doubles parsed back out of a ``POINT(x y)`` WKT string —
    the inverse interop path (load a WKT export from PostGIS, get the
    engine's native double columns). Non-POINT / malformed input yields
    (NULL, NULL), matching the lenient ingest posture."""
    lon = F.regexp_extract(wkt, r"^POINT\(([-+0-9.eE]+) [-+0-9.eE]+\)$", 1)
    lat = F.regexp_extract(wkt, r"^POINT\([-+0-9.eE]+ ([-+0-9.eE]+)\)$", 1)
    # try_cast: the regex class admits strings like '1.2.3' that are not
    # numbers; under default ANSI mode a plain cast would throw instead of
    # honoring the documented (NULL, NULL) contract
    return (
        F.when(lon != "", lon).try_cast("double"),
        F.when(lat != "", lat).try_cast("double"),
    )


def bbox_spatial_join(
    points: DataFrame,
    boxes: DataFrame,
    cell_deg: float = 8.0,
    lon_col: str = "lon",
    lat_col: str = "lat",
) -> DataFrame:
    """Point-in-bbox spatial JOIN that scales — the PostGIS
    ``point && box`` join (the reference's location column probed against
    geofence rectangles) without the O(|points| x |boxes|) nested loop a
    theta join degenerates to.

    Grid-bucket composition: every point lands in exactly ONE cell of a
    ``cell_deg``-degree grid (floor division); every box EXPLODES to the
    cells it overlaps (bounded: span/cell_deg per axis). The join is then
    a plain equi-join on (cx, cy) — hash-partitionable, AQE-skew-safe —
    followed by the exact containment predicate as a residual filter.
    Because a point has a single cell, each (point, box) pair can match
    only once: no post-join dedup. At 100 TB this is the standard
    spatial-join shape: shuffle keyed by cell, candidate volume bounded by
    grid occupancy, never all-pairs.

    ``boxes`` columns: west/south/east/north (+ id cols), with west <=
    east and south <= north (an antimeridian-crossing box must be split
    into two by the caller; an inverted box yields no matches — the
    residual predicate rejects every candidate). Result: points columns +
    boxes' id columns, one row per containment."""
    cell = F.lit(cell_deg)
    pc = points.withColumn("cx", F.floor(F.col(lon_col) / cell)).withColumn(
        "cy", F.floor(F.col(lat_col) / cell)
    )
    bc = (
        boxes.withColumn(
            "cx",
            F.explode(
                F.sequence(
                    F.floor(F.col("west") / cell), F.floor(F.col("east") / cell)
                )
            ),
        )
        .withColumn(
            "cy",
            F.explode(
                F.sequence(
                    F.floor(F.col("south") / cell), F.floor(F.col("north") / cell)
                )
            ),
        )
    )
    joined = pc.join(bc, ["cx", "cy"]).filter(
        F.col(lon_col).between(F.col("west"), F.col("east"))
        & F.col(lat_col).between(F.col("south"), F.col("north"))
    )
    return joined.drop("cx", "cy")
