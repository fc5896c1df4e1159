"""Columnar segment compression — the TimescaleDB native-compression
analogue, re-expressed as DataFrame array expressions.

TimescaleDB compresses hypertable chunks into segments: rows are grouped by
a ``segmentby`` column, ordered by ``orderby``, and each column is packed
into a per-segment array with a type-appropriate codec (delta-of-delta for
timestamps, dictionary/RLE for text). The reference's table is exactly the
shape this targets — the docs it links recommend
``segmentby => 'entity_id', orderby => 'time'`` for ltss-style state
tables. Here the same layout is one hash aggregation producing one row per
(entity, chunk) segment:

- ``time``  -> first value + array of per-row deltas (micros, delta codec);
- strings   -> per-segment dictionary (first-occurrence order, so build is
  a pure array expression) + int index array.

``decompress_states`` inverts it with posexplode + one bounded window (the
cumulative-delta sum runs inside a segment, and segments are bounded by the
chunk column), so round-trip equality is machine-checkable against the
uncompressed table — the registry entry hash-verifies exactly that.

Scale posture: compress is ONE shuffle (the groupBy), emitting ~rows/100s
of segment rows; decompress is ONE shuffle (the per-segment window). Both
stay whole-stage-codegen'd array expressions — no Python. At 100 TB the
segment arrays are the unit of IO: scanning a month of one entity reads
that entity's segment rows only (partition pruning on chunk + min/max on
entity), the same pruning TimescaleDB gets from its compressed-chunk
metadata.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def _field(name: str):
    """Unary HOF lambda extracting a struct field. NOTE: this must be a
    closure, not a default-arg lambda — PySpark infers HOF arity from the
    lambda signature, so ``lambda r, name=name:`` would be treated as the
    BINARY (element, index) form and ``name`` would bind to the index
    variable."""
    return lambda r: r[name]


def _index_into(dict_col: str, name: str):
    """Unary HOF lambda: 1-based position of a row's field in the
    materialized per-segment dictionary column."""
    return lambda r: F.array_position(F.col(dict_col), r[name]).cast("int")


def _delta_array(times: Column) -> Column:
    """Per-element gaps of a micros array: [t1-t0, t2-t1, ...] (n-1 longs).
    Guarded for 1-element segments — sequence(2, 1) would DESCEND, not
    produce an empty array."""
    n = F.size(times)
    return F.when(
        n > 1,
        F.transform(
            F.sequence(F.lit(2), n),
            lambda i: F.element_at(times, i) - F.element_at(times, i - 1),
        ),
    ).otherwise(F.array().cast("array<bigint>"))


def compress_states(
    df: DataFrame,
    segment_col: str = "entity_id",
    time_col: str = "time",
    value_cols: tuple[str, ...] = ("state",),
    chunk_fmt: str = "yyyy-MM",
) -> DataFrame:
    """One segment row per (segment_col, time-chunk): ``t0`` + delta-encoded
    times, and per value column a first-occurrence dictionary + index array.

    Rows within a segment are ordered by (time, value columns) — the value
    tiebreak makes the packed layout deterministic even if the PK dedup
    upstream was skipped and (segment, time) repeats.
    """
    packed = F.struct(
        F.unix_micros(F.col(time_col)).alias("__t"),
        *[F.col(c).alias(c) for c in value_cols],
    )
    seg = df.groupBy(
        F.col(segment_col).alias("segment"),
        F.date_format(time_col, chunk_fmt).alias("chunk"),
    ).agg(F.sort_array(F.collect_list(packed)).alias("rows"))

    times = F.transform(F.col("rows"), lambda r: r["__t"])
    # two selects so each dictionary is computed ONCE per segment and the
    # index array references the materialized dict column — O(s*d) per
    # segment (d = dict size), not the O(s^2) a nested array_distinct per
    # element would cost on a hot entity's million-row month
    with_dicts = seg.select(
        "segment",
        "chunk",
        "rows",
        F.size("rows").alias("n"),
        F.timestamp_micros(F.element_at(times, 1)).alias("t0"),
        _delta_array(times).alias("delta_us"),
        *[
            F.array_distinct(F.transform(F.col("rows"), _field(name))).alias(
                f"{name}_dict"
            )
            for name in value_cols
        ],
    )
    return with_dicts.select(
        "segment",
        "chunk",
        "n",
        "t0",
        "delta_us",
        *[
            c
            for name in value_cols
            for c in (
                F.col(f"{name}_dict"),
                F.transform(
                    F.col("rows"), _index_into(f"{name}_dict", name)
                ).alias(f"{name}_idx"),
            )
        ],
    )


def decompress_states(
    compressed: DataFrame,
    segment_col: str = "entity_id",
    time_col: str = "time",
    value_cols: tuple[str, ...] = ("state",),
) -> DataFrame:
    """Inverse of :func:`compress_states`: (segment_col, time_col, *value_cols)
    rows. Times are rebuilt as t0 + running sum of deltas — a window inside
    each (segment, chunk), which AQE keeps co-partitioned with the explode."""
    from pyspark.sql import Window

    first_idx = f"{value_cols[0]}_idx"
    ex = compressed.select(
        "segment",
        "chunk",
        "t0",
        "delta_us",
        *[F.col(f"{c}_dict") for c in value_cols],
        F.posexplode(first_idx).alias("pos", f"__{value_cols[0]}_i"),
        *[
            F.col(f"{c}_idx") for c in value_cols[1:]
        ],  # same length; indexed by pos below
    )
    w = (
        Window.partitionBy("segment", "chunk")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum(
        F.when(F.col("pos") == 0, F.lit(0)).otherwise(
            F.element_at("delta_us", F.col("pos"))
        )
    ).over(w)
    return ex.select(
        F.col("segment").alias(segment_col),
        F.timestamp_micros(F.unix_micros("t0") + cum).alias(time_col),
        F.element_at(
            F.col(f"{value_cols[0]}_dict"), F.col(f"__{value_cols[0]}_i")
        ).alias(value_cols[0]),
        *[
            F.element_at(
                F.col(f"{c}_dict"),
                F.element_at(F.col(f"{c}_idx"), F.col("pos") + 1),
            ).alias(c)
            for c in value_cols[1:]
        ],
    )
