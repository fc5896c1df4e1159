"""As-of join — 'state at time t' reconstruction, the canonical read over a
change-log table (SURVEY.md §2.C join_asof; the reference's (entity_id,
time DESC) index, models.py:78-80, exists to serve exactly this per-entity
latest-≤-t probe in Postgres).

Spark has no native ASOF JOIN, so we compose one: union the probe rows into
the event timeline, then backfill each probe with the last non-null event
value over a per-key, time-ordered window (``last(..., ignorenulls=True)``).

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
    """
    by = [by] if isinstance(by, str) else list(by)
    value_cols = value_cols or [
        c for c in right.columns if c not in set(by) | {on}
    ]

    l_marked = left.select(
        *[F.col(c) for c in left.columns],
        F.lit(1).alias("__is_probe"),
    )
    r_marked = right.select(
        *[F.col(c) for c in by],
        F.col(on),
        *[F.col(c) for c in value_cols],
        F.lit(0).alias("__is_probe"),
    )
    # align schemas: probes carry NULL right-values, events carry NULL left-extras
    left_extras = [c for c in left.columns if c not in set(by) | {on}]
    l_full = l_marked.select(
        *by,
        F.col(on),
        *[F.col(c) for c in left_extras],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}") for c in value_cols],
        "__is_probe",
    )
    r_full = r_marked.select(
        *by,
        F.col(on),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_extras],
        *[F.col(c).alias(f"__r_{c}") for c in value_cols],
        "__is_probe",
    )
    unioned = l_full.unionByName(r_full)

    # events sort before probes at the same timestamp via __is_probe ASC,
    # so an exactly-coincident right row IS visible to the probe (<=, not <).
    w = (
        Window.partitionBy(*by)
        .orderBy(F.col(on).asc(), F.col("__is_probe").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        *by,
        F.col(on),
        *left_extras,
        "__is_probe",
        *[
            F.last(F.col(f"__r_{c}"), ignorenulls=True).over(w).alias(f"{c}{suffix}" if c in left.columns else c)
            for c in value_cols
        ],
        F.last(F.when(F.col("__is_probe") == 0, F.col(on)), ignorenulls=True)
        .over(w)
        .alias(f"{on}{suffix}"),
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
    left_extras = [c for c in left.columns if c not in set(by) | {on}]
    l_full = left.select(
        *by,
        F.col(on),
        *[F.col(c) for c in left_extras],
        *[
            F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}")
            for c in value_cols
        ],
        F.lit(1).alias("__is_probe"),
    )
    r_full = right.select(
        *by,
        F.col(on),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_extras],
        *[F.col(c).alias(f"__r_{c}") for c in value_cols],
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
    filled = unioned.select(
        *by,
        F.col(on),
        *left_extras,
        "__is_probe",
        *[
            F.first(F.col(f"__r_{c}"), ignorenulls=True)
            .over(w)
            .alias(f"{c}{suffix}" if c in left.columns else c)
            for c in value_cols
        ],
        F.first(F.when(F.col("__is_probe") == 0, F.col(on)), ignorenulls=True)
        .over(w)
        .alias(f"{on}{suffix}"),
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
    left_extras = [c for c in left.columns if c not in set(by_l) | {on}]
    l_full = left.select(
        *by_l,
        F.col(on),
        *[F.col(c) for c in left_extras],
        *[
            F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}")
            for c in value_cols
        ],
        F.lit(1).alias("__is_probe"),
    )
    r_full = right.select(
        *by_l,
        F.col(on),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_extras],
        *[F.col(c).alias(f"__r_{c}") for c in value_cols],
        F.lit(0).alias("__is_probe"),
    )
    # numeric ordering key for the range frames. Timestamps become micros
    # LONGS — exact. An epoch-seconds double (micros/1e6) would carry ~0.5µs
    # representation error at current epochs: enough to flip the documented
    # backward tie-break on near-equidistant neighbors, and past epoch 2^32s
    # distinct micros would collide outright.
    is_ts = str(left.schema[on].dataType).startswith("Timestamp")
    _num = (
        (lambda c: F.unix_micros(c.cast("timestamp")))
        if is_ts
        else (lambda c: c.cast("double"))
    )
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
    ev_on = F.when(F.col("__is_probe") == 0, F.col(on))
    filled = unioned.select(
        *by_l,
        F.col(on),
        *left_extras,
        "__is_probe",
        *[
            F.last(F.col(f"__r_{c}"), ignorenulls=True).over(wb).alias(f"__b_{c}")
            for c in value_cols
        ],
        *[
            F.first(F.col(f"__r_{c}"), ignorenulls=True).over(wf).alias(f"__f_{c}")
            for c in value_cols
        ],
        F.last(ev_on, ignorenulls=True).over(wb).alias("__t_b"),
        F.first(ev_on, ignorenulls=True).over(wf).alias("__t_f"),
    )
    probes = filled.filter(F.col("__is_probe") == 1)
    t = F.col(on)
    bt, ft = F.col("__t_b"), F.col("__t_f")
    d_b = F.when(bt.isNotNull(), _num(t) - _num(bt))
    d_f = F.when(ft.isNotNull(), _num(ft) - _num(t))
    use_back = (
        F.when(ft.isNull(), F.lit(True))
        .when(bt.isNull(), F.lit(False))
        .otherwise(d_b <= d_f)
    )
    picked = [
        F.when(use_back, F.col(f"__b_{c}"))
        .otherwise(F.col(f"__f_{c}"))
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
