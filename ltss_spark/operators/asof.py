"""As-of join — 'state at time t' reconstruction, the canonical read over a
change-log table (SURVEY.md §2.C join_asof; the reference's (entity_id,
time DESC) index, models.py:78-80, exists to serve exactly this per-entity
latest-≤-t probe in Postgres).

Spark has no native ASOF JOIN, so we compose one: union the probe rows into
the event timeline, pack each event row into one struct, and backfill each
probe with the last non-null STRUCT over a per-key, time-ordered window —
the struct (not each value) is the "an event exists" marker, so a matched
event's NULL value stays NULL instead of falling back to an older row.

Scale analysis (vs the obvious alternatives):
- naive theta-join (l.key = r.key AND r.time <= l.time) + argmax explodes to
  |probes| x |matching history| intermediate rows — quadratic per key;
- per-key ``applyInPandas`` + ``pd.merge_asof`` moves the whole table
  through Python/Arrow;
- the union+window form shuffles each side ONCE on the key and does a
  linear scan per key — O(n log n) for the per-key sort, no Python. Skewed
  keys are handled by AQE; the window never crosses keys so there is no
  global sort.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window
from pyspark.sql import types as T


def _right_struct_type(right: DataFrame, on: str, value_cols: list[str]) -> T.StructType:
    """Type of the packed right-row struct (__t + value columns) — used to
    cast the probes' NULL placeholder so unionByName lines up."""
    return T.StructType(
        [T.StructField("__t", right.schema[on].dataType)]
        + [T.StructField(c, right.schema[c].dataType) for c in value_cols]
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str | list[str],
    value_cols: list[str] | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """For each left row, attach the most recent right row with
    ``right.on <= left.on`` within the same ``by`` group (backward as-of,
    matching DuckDB's ``ASOF JOIN`` which the oracle uses).

    ``left`` keeps all its columns; matched right ``value_cols`` are added
    (NULL when no earlier right row exists). Right-side timestamp is added
    as ``{on}{suffix}``.

    NULL handling (matches DuckDB ASOF exactly): right rows with a NULL
    timestamp never match (``right.on <= left.on`` is never true for
    NULL), and a matched row's NULL *value* stays NULL — the whole right
    row is packed into one struct before the window fill, so "no event
    yet" (struct NULL) is distinguishable from "event whose value is
    NULL". A per-column ignorenulls fill would skip back past the real
    match to an older non-null value and pair it with the newer row's
    timestamp.
    """
    by = [by] if isinstance(by, str) else list(by)
    value_cols = value_cols or [
        c for c in right.columns if c not in set(by) | {on}
    ]
    right = right.filter(F.col(on).isNotNull())

    # align schemas: probes carry a NULL right-struct, events carry NULL
    # left-extras; the struct carries the event's own timestamp, so every
    # output column of a match comes from the SAME right row
    left_extras = [c for c in left.columns if c not in set(by) | {on}]
    packed = F.struct(
        F.col(on).alias("__t"), *[F.col(c).alias(c) for c in value_cols]
    )
    l_full = left.select(
        *by,
        F.col(on),
        *[F.col(c) for c in left_extras],
        F.lit(None).cast(_right_struct_type(right, on, value_cols)).alias("__r"),
        F.lit(1).alias("__is_probe"),
    )
    r_full = right.select(
        *by,
        F.col(on),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_extras],
        packed.alias("__r"),
        F.lit(0).alias("__is_probe"),
    )
    unioned = l_full.unionByName(r_full)

    # events sort before probes at the same timestamp via __is_probe ASC,
    # so an exactly-coincident right row IS visible to the probe (<=, not <).
    w = (
        Window.partitionBy(*by)
        .orderBy(F.col(on).asc(), F.col("__is_probe").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    pick = F.last("__r", ignorenulls=True).over(w)
    filled = unioned.select(
        *by,
        F.col(on),
        *left_extras,
        "__is_probe",
        *[
            pick[c].alias(f"{c}{suffix}" if c in left.columns else c)
            for c in value_cols
        ],
        pick["__t"].alias(f"{on}{suffix}"),
    )
    return filled.filter(F.col("__is_probe") == 1).drop("__is_probe")


def asof_join_forward(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str | list[str],
    value_cols: list[str] | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """Forward as-of: for each left row, the EARLIEST right row with
    ``right.on >= left.on`` in the same group (next-event attribution —
    'which reading followed this probe'). Mirror of :func:`asof_join`:
    same union, ``first(ignorenulls)`` over the FOLLOWING window; probes
    sort before events at equal timestamps so coincident rows match (>=).
    Same scale shape: one shuffle per side on the key, linear per-key scan.
    """
    by = [by] if isinstance(by, str) else list(by)
    value_cols = value_cols or [
        c for c in right.columns if c not in set(by) | {on}
    ]
    right = right.filter(F.col(on).isNotNull())
    left_extras = [c for c in left.columns if c not in set(by) | {on}]
    l_full = left.select(
        *by,
        F.col(on),
        *[F.col(c) for c in left_extras],
        F.lit(None).cast(_right_struct_type(right, on, value_cols)).alias("__r"),
        F.lit(1).alias("__is_probe"),
    )
    r_full = right.select(
        *by,
        F.col(on),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_extras],
        F.struct(
            F.col(on).alias("__t"), *[F.col(c).alias(c) for c in value_cols]
        ).alias("__r"),
        F.lit(0).alias("__is_probe"),
    )
    unioned = l_full.unionByName(r_full)
    # probes sort BEFORE events at the same timestamp (__is_probe DESC) so a
    # coincident right row is inside the forward frame (>=, not >)
    w = (
        Window.partitionBy(*by)
        .orderBy(F.col(on).asc(), F.col("__is_probe").desc())
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    pick = F.first("__r", ignorenulls=True).over(w)
    filled = unioned.select(
        *by,
        F.col(on),
        *left_extras,
        "__is_probe",
        *[
            pick[c].alias(f"{c}{suffix}" if c in left.columns else c)
            for c in value_cols
        ],
        pick["__t"].alias(f"{on}{suffix}"),
    )
    return filled.filter(F.col("__is_probe") == 1).drop("__is_probe")


def asof_join_nearest(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str | list[str],
    value_cols: list[str] | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """Nearest as-of: for each left row, the right row minimizing
    |right.on - left.on| within the group (ties break backward — the
    earlier right row wins, matching pandas ``merge_asof
    (direction='nearest')``).

    One union + ONE per-key window shuffle: both directions are computed
    over the same partitioning/ordering with two RANGE frames
    (unboundedPreceding..0 for backward, 0..unboundedFollowing for
    forward — range frames include coincident-timestamp rows in both
    directions), then a per-row pick. No re-merge join, so duplicate left
    rows pass through 1:1 and left cardinality is always preserved; the
    second frame reuses the first's sort, so the plan is one exchange +
    one sort + two linear passes."""
    by_l = [by] if isinstance(by, str) else list(by)
    value_cols = value_cols or [
        c for c in right.columns if c not in set(by_l) | {on}
    ]
    right = right.filter(F.col(on).isNotNull())
    left_extras = [c for c in left.columns if c not in set(by_l) | {on}]
    l_full = left.select(
        *by_l,
        F.col(on),
        *[F.col(c) for c in left_extras],
        F.lit(None).cast(_right_struct_type(right, on, value_cols)).alias("__r"),
        F.lit(1).alias("__is_probe"),
    )
    r_full = right.select(
        *by_l,
        F.col(on),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_extras],
        F.struct(
            F.col(on).alias("__t"), *[F.col(c).alias(c) for c in value_cols]
        ).alias("__r"),
        F.lit(0).alias("__is_probe"),
    )
    # numeric ordering key for the range frames. Timestamps AND dates become
    # micros LONGS — exact; integral keys stay integral longs. An
    # epoch-seconds double (micros/1e6) would carry ~0.5µs representation
    # error at current epochs — enough to flip the documented backward
    # tie-break on near-equidistant neighbors — and a double also rounds
    # integral keys above 2^53. Doubles remain only for genuinely
    # fractional keys.
    dt = left.schema[on].dataType
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType, T.DateType)):
        _num = lambda c: F.unix_micros(c.cast("timestamp"))  # noqa: E731
    elif isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        _num = lambda c: c.cast("long")  # noqa: E731
    else:
        _num = lambda c: c.cast("double")  # noqa: E731
    unioned = l_full.unionByName(r_full).withColumn("__on_num", _num(F.col(on)))
    wb = (
        Window.partitionBy(*by_l)
        .orderBy("__on_num")
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy(*by_l)
        .orderBy("__on_num")
        .rangeBetween(Window.currentRow, Window.unboundedFollowing)
    )
    filled = unioned.select(
        *by_l,
        F.col(on),
        *left_extras,
        "__is_probe",
        F.last("__r", ignorenulls=True).over(wb).alias("__b"),
        F.first("__r", ignorenulls=True).over(wf).alias("__f"),
    )
    probes = filled.filter(F.col("__is_probe") == 1)
    t = F.col(on)
    bt, ft = F.col("__b")["__t"], F.col("__f")["__t"]
    d_b = F.when(bt.isNotNull(), _num(t) - _num(bt))
    d_f = F.when(ft.isNotNull(), _num(ft) - _num(t))
    use_back = (
        F.when(ft.isNull(), F.lit(True))
        .when(bt.isNull(), F.lit(False))
        .otherwise(d_b <= d_f)
    )
    picked = [
        F.when(use_back, F.col("__b")[c])
        .otherwise(F.col("__f")[c])
        .alias(f"{c}{suffix}" if c in left.columns else c)
        for c in value_cols
    ]
    return probes.select(
        *by_l,
        F.col(on),
        *left_extras,
        *picked,
        F.when(use_back, bt).otherwise(ft).alias(f"{on}{suffix}"),
    )
