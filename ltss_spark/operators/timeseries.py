"""Time-series read patterns the reference builds physical structure for but
delegates to PostgreSQL/TimescaleDB (SURVEY.md §2.B).

Each function is a DataFrame composition; Catalyst supplies pruning/pushdown
(the hypertable-chunk and btree-index roles, SURVEY §4).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window

from ltss_spark.functions.numeric import davg


def entity_range_scan(
    states: DataFrame,
    entity_id: str,
    start,
    end,
    newest_first: bool = True,
) -> DataFrame:
    """B2: per-entity time-range scan, newest first — the access path the
    reference's composite btree (entity_id, time DESC) exists for
    (/root/reference/custom_components/ltss/models.py:78-80).

    In the partitioned parquet layout the time predicate prunes month
    partitions and the entity predicate is pushed to parquet row-group
    stats (we sort within partitions by entity_id at write,
    ltss_spark.sources.batch.write_partitioned).
    """
    df = states.filter(
        (F.col("entity_id") == entity_id) & F.col("time").between(start, end)
    )
    return df.orderBy(F.col("time").desc() if newest_first else F.col("time"))


def latest_state(
    states: DataFrame, by: str = "entity_id", tie_breaker: str = "state"
) -> DataFrame:
    """B3: latest state per entity (the SQL-sensor pattern,
    /root/reference/README.md:23, served by the DESC index models.py:79).

    ``max_by`` (argmax) is a single aggregation pass — partial aggregation
    map-side, one shuffle on entity_id; no window. Spark plans the
    struct-ordered argmax as SortAggregate (struct ordering keys have no
    mutable hash buffer), which still holds O(1) state per group across
    the exchange; at 100 TB this beats the row_number() formulation,
    which must materialize and rank EVERY row of every entity's history
    before discarding all but one.

    Ties at the max time break on ``tie_breaker`` DESC — pass the
    event/sequence id when the frame carries one (the registry's
    ``ltss_latest`` uses event_id, matching the oracle's ORDER BY event_id
    DESC); BOTH output columns take the winner by the same order, so they
    always come from the same row.
    """
    order = F.struct(F.col("time"), F.col(tie_breaker))
    return states.groupBy(by).agg(
        F.max_by(F.col("time"), order).alias("last_time"),
        F.max_by(F.col("state"), order).alias("last_state"),
    )


def snapshot_at(
    states: DataFrame,
    at,
    by: str = "entity_id",
    tie_breaker: str = "state",
) -> DataFrame:
    """State of the WORLD at time ``at``: for every entity, its last state
    at or before the instant — the reference's "what did the house look
    like at 3pm" Grafana/SQL-sensor pattern (README.md:23-26), i.e.
    :func:`latest_state` of the history filtered to ``time <= at``.

    Same 100 TB shape as latest_state: the time predicate pushes into the
    scan (parquet min/max stats skip row groups), then ONE max_by
    aggregation — no window sort. Entities whose first event is after
    ``at`` are absent, exactly like the reference's table.

    Partition pruning: a ``time <= T`` predicate alone does NOT prune a
    ``month=``-partitioned layout (Spark cannot infer the month bound
    from the time bound), so when the frame carries the layout's
    ``month`` column this adds the derived ``month <= yyyy-MM(T)``
    predicate explicitly — THAT reaches PartitionFilters and is the
    hypertable chunk-exclusion analogue.
    """
    at_col = F.lit(at).cast("timestamp") if not isinstance(at, Column) else at
    filtered = states.filter(F.col("time") <= at_col)
    if "month" in states.columns:
        filtered = filtered.filter(
            F.col("month") <= F.date_format(at_col, "yyyy-MM")
        )
    return latest_state(filtered, by=by, tie_breaker=tie_breaker).withColumnRenamed(
        "last_time", "as_of_time"
    ).withColumnRenamed("last_state", "as_of_state")


def time_bucket_agg(
    states: DataFrame,
    bucket: str = "1 hour",
    value: Column | None = None,
) -> DataFrame:
    """B4: TimescaleDB ``time_bucket`` analogue (the Grafana time-series
    path, /root/reference/README.md:24-26): tumbling window + aggregates.

    ``window()`` buckets are computed map-side; the only shuffle is the
    groupBy hash exchange. States are stringly typed ('21.5') so the numeric
    aggregate goes through try_cast — NULL (excluded from avg) on non-numeric
    states, matching `state::float` failures the Postgres path would raise.
    """
    v = value if value is not None else F.col("state").try_cast("double")
    return (
        states.groupBy(
            F.window(F.col("time"), bucket).alias("w"), F.col("entity_id")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            davg(v).alias("avg_state"),
            F.min(v).alias("min_state"),
            F.max(v).alias("max_state"),
        )
        .select(
            F.col("w.start").alias("bucket_start"),
            F.col("entity_id"),
            "n_events",
            "avg_state",
            "min_state",
            "max_state",
        )
    )


def time_in_state(states: DataFrame, tie_breaker: str | None = None) -> DataFrame:
    """Duration each (entity, state) row was current: the canonical derived
    query over a change-log table (SURVEY §2.C win_lag_lead). lead(time)
    over the per-entity timeline bounds each state's validity interval.

    ``tie_breaker``: extra ordering column for rows sharing a timestamp
    (keeps lead() deterministic).
    """
    order = ["time"] + ([tie_breaker] if tie_breaker else [])
    w = Window.partitionBy("entity_id").orderBy(*order)
    nxt = F.lead("time").over(w)
    return states.select(
        "entity_id",
        "time",
        "state",
        (F.unix_micros(nxt) - F.unix_micros(F.col("time"))).alias("micros_in_state"),
    )


def counter_delta(
    states: DataFrame,
    value: Column,
    tie_breaker: str | None = None,
) -> DataFrame:
    """TimescaleDB ``counter_agg``/``delta`` analogue: per-entity increase
    of a monotonic counter with RESET detection (a drop means the counter
    restarted; the post-reset value is the increase since the reset).
    Returns per-entity totals: total_increase, n_resets, n_samples.

    NULL samples are IGNORED, matching TimescaleDB counter_agg (which never
    sees NULL points): a 100 -> NULL -> 120 sequence contributes +20, not a
    broken lag chain that silently drops the increase. n_samples counts the
    non-NULL samples; entities with no numeric sample produce no row.
    total_increase is 0 (not NULL) for single-sample entities, consistent
    with n_resets.

    One per-entity window (lag) + one hash aggregation — linear per key,
    no self-join.
    """
    order = ["time"] + ([tie_breaker] if tie_breaker else [])
    w = Window.partitionBy("entity_id").orderBy(*order)
    valued = states.filter(value.isNotNull())
    prev = F.lag(value).over(w)
    delta = value - prev
    inc = (
        F.when(prev.isNull(), F.lit(None))          # first sample: no delta
        .when(delta >= 0, delta)                    # normal increase
        .otherwise(value)                           # reset: count from zero
    )
    per_row = valued.select(
        "entity_id",
        inc.alias("inc"),
        (delta < 0).cast("int").alias("is_reset"),
    )
    # the per-row delta (v - pv) is bit-identical cross-engine IEEE
    # arithmetic, but SUMMING doubles is accumulation-order-sensitive:
    # cast each delta to an exact decimal first so the aggregate is
    # order-insensitive (the registry's determinism rule for double aggs)
    return per_row.groupBy("entity_id").agg(
        F.round(
            F.coalesce(
                F.sum(F.col("inc").cast("decimal(38,6)")), F.lit(0).cast("decimal(38,6)")
            ).cast("double"),
            6,
        ).alias("total_increase"),
        F.coalesce(F.sum("is_reset"), F.lit(0)).cast("bigint").alias("n_resets"),
        F.count(F.lit(1)).alias("n_samples"),
    )


def value_histogram(
    states: DataFrame,
    value: Column,
    lo: float,
    hi: float,
    n_buckets: int,
) -> DataFrame:
    """TimescaleDB ``histogram()`` analogue: per-entity bucket counts over
    [lo, hi) with underflow bucket 0 and overflow bucket n+1. Bucket
    arithmetic is written out explicitly (identical IEEE expression in the
    DuckDB oracle — neither engine's built-in is used)."""
    step = (hi - lo) / n_buckets
    bucket = (
        F.when(value.isNull(), F.lit(None))
        .when(value < lo, F.lit(0))
        .when(value >= hi, F.lit(n_buckets + 1))
        .otherwise(F.floor((value - F.lit(lo)) / F.lit(step)) + 1)
    ).cast("int")
    return (
        states.select("entity_id", bucket.alias("bucket"))
        .filter(F.col("bucket").isNotNull())
        .groupBy("entity_id", "bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def lttb_downsample(
    states: DataFrame,
    n_out: int = 100,
    time_col: str = "time",
    value_col: str = "value",
    key_col: str = "entity_id",
) -> DataFrame:
    """Largest-Triangle-Three-Buckets downsampling — TimescaleDB's
    ``lttb()`` hyperfunction, the standard Grafana rendering reducer:
    pick the visually most important ``n_out`` points per series (first
    and last always kept; each middle bucket contributes the point with
    the largest triangle area against the previous pick and the next
    bucket's centroid).

    Inherently sequential per series — but per-KEY ``applyInPandas`` pays
    a Python round-trip per series (measured ~10s for 7.5k small series
    where the actual math is milliseconds). Instead: hash-repartition on
    the key, then ONE ``mapInPandas`` call per partition that concatenates
    the partition's Arrow batches and runs a pandas groupby inside — the
    Python-call count drops from |series| to |partitions|. Each series
    lives wholly in one partition (hash partitioning guarantees it);
    memory is bounded by partition size, tuned via shuffle partitions.
    Output: (key, time, value) of the selected points, a subset of the
    input.
    """
    import numpy as np
    import pandas as pd

    def lttb(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(time_col).reset_index(drop=True)
        n = len(pdf)
        if n <= n_out:
            return pdf[[key_col, time_col, value_col]]
        t = pdf[time_col].astype("int64").to_numpy(dtype=np.float64)
        v = pdf[value_col].to_numpy(dtype=np.float64)
        # bucket boundaries over the middle points (exclude first & last)
        bounds = np.linspace(1, n - 1, n_out - 1).astype(np.int64)
        picked = [0]
        a = 0
        for i in range(n_out - 2):
            lo, hi = bounds[i], bounds[i + 1]
            nlo, nhi = (bounds[i + 1], n) if i == n_out - 3 else (bounds[i + 1], bounds[i + 2])
            avg_t, avg_v = t[nlo:nhi].mean(), np.nanmean(v[nlo:nhi])
            area = np.abs(
                (t[a] - avg_t) * (v[lo:hi] - v[a]) - (t[a] - t[lo:hi]) * (avg_v - v[a])
            )
            # a bucket can be all-NaN (NULL values, or v[a] itself NaN):
            # np.nanargmax would raise 'All-NaN slice encountered' and kill
            # the task — fall back to the bucket's first point
            if np.all(np.isnan(area)):
                a = int(lo)
            else:
                a = lo + int(np.nanargmax(area))
            picked.append(a)
        picked.append(n - 1)
        return pdf.iloc[picked][[key_col, time_col, value_col]]

    def per_partition(batches):
        pdfs = [p for p in batches if len(p)]
        if not pdfs:
            return
        whole = pd.concat(pdfs, ignore_index=True)
        # one concatenated yield per partition: yielding per series would
        # send thousands of tiny Arrow batches back (measured 10x slower)
        out = [
            lttb(grp.reset_index(drop=True))
            for _k, grp in whole.groupby(key_col, sort=False)
        ]
        yield pd.concat(out, ignore_index=True)

    # key type comes from the input (a hardcoded 'string' would break any
    # numeric key and make unionByName merge mismatched types); value uses
    # try_cast so a non-numeric state yields NULL instead of an ANSI throw
    key_type = dict(states.dtypes)[key_col]
    out_schema = f"{key_col} {key_type}, {time_col} timestamp, {value_col} double"
    sel = states.select(
        key_col, time_col, F.col(value_col).try_cast("double").alias(value_col)
    )
    # route: series already at or under the target pass through JVM-only
    # (LTTB keeps every point); Python sees only series that actually
    # shrink. A dashboard query over raw data has few such series left
    # after its time filter — often none.
    long_keys = (
        sel.groupBy(key_col)
        .agg(F.count(F.lit(1)).alias("__n"))
        .filter(F.col("__n") > n_out)
        .select(key_col)
    )
    short = sel.join(F.broadcast(long_keys), key_col, "left_anti")
    long = (
        sel.join(F.broadcast(long_keys), key_col, "left_semi")
        .repartition(key_col)
        .mapInPandas(per_partition, schema=out_schema)
    )
    return short.unionByName(long)


def ohlc(
    df: DataFrame,
    time_col: str = "ts",
    value_col: str = "value",
    by: tuple[str, ...] = ("event_type",),
    bucket: str = "day",
    tiebreak: str = "event_id",
) -> DataFrame:
    """Candlestick rollup (TimescaleDB ``candlestick_agg`` analogue,
    docs.timescale.com hyperfunctions): open/high/low/close + exact-decimal
    volume per (group, time bucket).

    ONE hash aggregation — open/close are ``min_by``/``max_by`` over the
    (time, tiebreak) struct key, so there is no window/sort pass; partial
    aggregation (map-side combine) applies, which is what makes this cheap
    at 100 TB: the shuffle carries one partial candle per group per
    partition, not the raw ticks. The tiebreak column makes equal-timestamp
    ticks deterministic across engines and runs.
    """
    from ltss_spark.functions.numeric import dsum

    key = F.struct(F.col(time_col), F.col(tiebreak))
    v = F.col(value_col)
    return df.groupBy(
        *by, F.date_trunc(bucket, F.col(time_col)).alias("bucket_start")
    ).agg(
        F.min_by(v, key).alias("open"),
        F.max(v).alias("high"),
        F.min(v).alias("low"),
        F.max_by(v, key).alias("close"),
        dsum(v, 2).alias("volume"),
        F.count(F.lit(1)).alias("n_ticks"),
    )


def sessionize(
    df: DataFrame,
    time_col: str = "ts",
    key_cols: tuple[str, ...] = ("user_id",),
    gap_seconds: int = 12 * 3600,
    tie_breaker: str | None = None,
) -> DataFrame:
    """Batch sessionization — the offline analogue of
    ``session_window`` (stream_window_session): consecutive events of the
    same key belong to one session while the inter-event gap stays within
    ``gap_seconds``; a larger gap (or the first event) starts a new one.

    Classic lag+cumsum composition: mark session starts with a windowed
    ``lag``, number sessions with a cumulative sum over the same window,
    aggregate. Two window passes + one hash agg over a single per-key
    shuffle — at 100 TB the cost is one repartition by key; no self-join,
    no explode. Exact-integer microsecond arithmetic end to end, so the
    session boundaries are bit-identical across engines.

    Returns (*key_cols, session_seq, session_start, session_end, n_events,
    duration_us).
    """
    order = [F.col(time_col)] + ([F.col(tie_breaker)] if tie_breaker else [])
    w = Window.partitionBy(*key_cols).orderBy(*order)
    t_us = F.unix_micros(F.col(time_col))
    prev_us = F.lag(t_us).over(w)
    is_new = (
        prev_us.isNull() | (t_us - prev_us > gap_seconds * 1_000_000)
    ).cast("int")
    numbered = df.select(
        *key_cols,
        F.col(time_col),
        *( [F.col(tie_breaker)] if tie_breaker else [] ),
        F.sum(is_new)
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("session_seq"),
    )
    return numbered.groupBy(*key_cols, "session_seq").agg(
        F.min(time_col).alias("session_start"),
        F.max(time_col).alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
        (
            F.unix_micros(F.max(time_col)) - F.unix_micros(F.min(time_col))
        ).alias("duration_us"),
    )


def robust_outliers(
    df: DataFrame,
    value_col: str = "value",
    key_cols: tuple[str, ...] = ("user_id",),
    k: float = 3.0,
) -> DataFrame:
    """Per-key robust outlier flags: |value - median| > k * 1.4826 * MAD —
    the monitoring query a TimescaleDB deployment runs over sensor series
    (median/MAD instead of mean/stddev so the outliers themselves cannot
    drag the threshold; 1.4826 scales MAD to sigma under normality).

    Two grouped exact-percentile aggregations (median, then MAD of the
    residuals) + broadcast joins of the per-key statistics back onto the
    rows — the stats frames are |keys| rows, so the row scan is never
    shuffled; exact percentile sorts within each key group, fine for
    bounded key cardinality (unbounded keys: swap in percentile_approx,
    same shape). A key with MAD = 0 (constant series) flags any deviation
    from the median.

    Median/MAD round to 6 decimals so downstream comparisons are
    cross-engine deterministic (registry rule: interpolated percentiles
    are transcendental-class outputs).
    """
    keys = list(key_cols)
    med = df.groupBy(*keys).agg(
        F.round(F.percentile(F.col(value_col), F.lit(0.5)), 6).alias("med")
    )
    with_med = df.join(F.broadcast(med), keys)
    mad = (
        with_med.groupBy(*keys)
        .agg(
            F.round(
                F.percentile(F.abs(F.col(value_col) - F.col("med")), F.lit(0.5)), 6
            ).alias("mad")
        )
    )
    scale = F.lit(k) * F.lit(1.4826) * F.col("mad")
    dev = F.abs(F.col(value_col) - F.col("med"))
    return (
        with_med.join(F.broadcast(mad), keys)
        .withColumn(
            "is_outlier",
            F.when(F.col("mad") == 0.0, F.col(value_col) != F.col("med")).otherwise(
                dev > scale
            ),
        )
    )


def time_in_state_bucketed(
    states: DataFrame,
    unit: str = "day",
    tie_breaker: str | None = None,
) -> DataFrame:
    """Per-bucket time-in-state: each state's validity interval
    [time, lead(time)) SPLIT across ``unit`` buckets, micros summed per
    (entity, bucket, state) — TimescaleDB's ``state_agg``/``duration_in``
    rolled up by time_bucket, i.e. the daily-uptime-percent dashboard
    query ("how long was the heater on each day"). The last state of each
    entity has an open interval and contributes nothing (matching
    time_in_state's NULL duration — the observation window ends at the
    last event).

    Mechanism, all codegen: one per-entity window (lead) bounds the
    intervals; ``sequence(trunc(start), trunc(end-1us))`` + ``explode``
    fans each interval out to the buckets it overlaps; the per-bucket
    overlap is ``least(end, bucket+1) - greatest(start, bucket)``. The
    explode multiplies rows by the bucket span of each interval — exactly
    the output's inherent size (a 3-day interval owes 3 daily rows);
    intervals within one bucket stay single-row. One shuffle for the
    window, one for the final rollup.
    """
    order = ["time"] + ([tie_breaker] if tie_breaker else [])
    w = Window.partitionBy("entity_id").orderBy(*order)
    iv = states.select(
        "entity_id",
        "state",
        F.col("time").alias("start"),
        F.lead("time").over(w).alias("end"),
    ).filter(F.col("end").isNotNull() & (F.col("end") > F.col("start")))
    # one bucket row per overlapped unit; end is exclusive, so an interval
    # ending exactly on a boundary must not emit the next bucket — hence
    # trunc(end - 1 microsecond)
    bucket = F.explode(
        F.sequence(
            F.date_trunc(unit, F.col("start")),
            F.date_trunc(unit, F.col("end") - F.expr("INTERVAL 1 MICROSECOND")),
            F.expr(f"INTERVAL 1 {unit}"),
        )
    ).alias("bucket")
    with_b = iv.select("entity_id", "state", "start", "end", bucket)
    nxt_b = F.col("bucket") + F.expr(f"INTERVAL 1 {unit}")
    overlap = F.unix_micros(F.least(F.col("end"), nxt_b)) - F.unix_micros(
        F.greatest(F.col("start"), F.col("bucket"))
    )
    return (
        with_b.select("entity_id", "bucket", "state", overlap.alias("mic"))
        .groupBy("entity_id", "bucket", "state")
        .agg(F.sum("mic").alias("micros_in_state"))
    )


def funnel(
    events: DataFrame,
    stages: list[str],
    time_col: str = "ts",
    key_col: str = "user_id",
    type_col: str = "event_type",
    max_step: str | None = None,
) -> DataFrame:
    """Ordered-funnel analysis: for each key, how far through the
    ``stages`` sequence did its event history progress — each stage must
    occur strictly AFTER the previous stage's matching event (first
    qualifying occurrence wins), optionally within ``max_step`` (an
    INTERVAL literal like ``'7 days'``) of it. Returns one row per key:
    ``funnel_stage`` (0..len(stages)) plus each stage's timestamp.

    Spark shape — ONE shuffle, no self-joins: the per-key event list
    (only rows whose type is IN the funnel — the filter prunes the
    collect) is sorted and folded left with ``F.aggregate``, carrying
    (stage, last_ts) as the fold state; the conditional step logic stays
    entirely inside whole-stage codegen. The equivalent relational form
    is a chain of len(stages) dependent aggregate+join passes (the
    oracle's CTE chain) — the fold does it in one pass, and at 100 TB the
    per-key state is bounded by that key's funnel-relevant events, the
    usual funnel cardinality (a handful per user)."""
    zero = F.struct(
        F.lit(0).cast("int").alias("stage"),
        *[
            F.lit(None).cast("timestamp").alias(f"t{i}")
            for i in range(1, len(stages) + 1)
        ],
    )

    def step(acc, ev):
        out = acc
        # build innermost-first so earlier stages win the WHEN chain
        for i, stype in reversed(list(enumerate(stages, start=1))):
            prev_t = F.lit(None) if i == 1 else acc[f"t{i - 1}"]
            cond = (acc["stage"] == i - 1) & (ev["etype"] == stype)
            if i > 1:
                cond = cond & (ev["t"] > prev_t)
                if max_step is not None:
                    cond = cond & (
                        ev["t"] <= prev_t + F.expr(f"INTERVAL {max_step}")
                    )
            advanced = F.struct(
                F.lit(i).cast("int").alias("stage"),
                *[
                    (ev["t"] if j == i else acc[f"t{j}"]).alias(f"t{j}")
                    for j in range(1, len(stages) + 1)
                ],
            )
            out = F.when(cond, advanced).otherwise(out)
        return out

    folded = (
        events.filter(F.col(type_col).isin(stages))
        .select(
            F.col(key_col).alias("key"),
            F.struct(
                F.col(time_col).alias("t"), F.col(type_col).alias("etype")
            ).alias("ev"),
        )
        .groupBy("key")
        .agg(
            F.aggregate(
                F.array_sort(F.collect_list("ev")), zero, step
            ).alias("f")
        )
    )
    return folded.select(
        F.col("key").alias(key_col),
        F.col("f.stage").alias("funnel_stage"),
        *[
            F.col(f"f.t{i}").alias(f"stage{i}_ts")
            for i in range(1, len(stages) + 1)
        ],
    )


def cohort_retention(
    events: DataFrame,
    time_col: str = "ts",
    key_col: str = "user_id",
    unit: str = "month",
) -> DataFrame:
    """Cohort retention: keys grouped by their first-activity period
    (the cohort), and for each (cohort, period-offset k) the number of
    distinct keys still active k periods later plus the retention rate
    vs the cohort's size at k=0 — the standard engagement triangle.

    Spark shape: one aggregation derives each key's cohort (min period
    per key — map-side combinable), joined back onto the key's distinct
    activity periods (both sides hash-partitioned on the key: one
    co-located shuffle each), then a (cohort, k) count-distinct. Cohort
    sizes re-derive from the k=0 row via a window over the |cohorts| ×
    |offsets| result — a frame that is tiny by construction at any corpus
    size, so the rate costs no extra scan. Rates round to 6 decimals
    (cross-engine float discipline)."""
    period = F.date_trunc(unit, F.col(time_col))
    active = events.select(
        F.col(key_col).alias("key"), period.alias("period")
    ).distinct()
    firsts = active.groupBy("key").agg(F.min("period").alias("cohort"))
    if unit == "month":
        k = F.months_between(F.col("period"), F.col("cohort"))
    elif unit == "week":
        k = F.datediff(F.col("period"), F.col("cohort")) / 7
    else:
        k = F.datediff(F.col("period"), F.col("cohort"))
    grid = (
        active.join(firsts, "key")
        .select("key", "cohort", k.cast("int").alias("k"))
        .groupBy("cohort", "k")
        .agg(F.count_distinct("key").alias("n_active"))
    )
    w = Window.partitionBy("cohort")
    return grid.select(
        "cohort",
        "k",
        "n_active",
        F.round(
            F.col("n_active")
            / F.max(F.when(F.col("k") == 0, F.col("n_active"))).over(w),
            6,
        ).alias("retention_rate"),
    )


def ewma(
    series: DataFrame,
    key_col: str = "user_id",
    time_col: str = "ts",
    value_col: str = "value",
    window: int = 8,
    tie_col: str | None = None,
) -> DataFrame:
    """Exponential moving average over each key's ordered series, with
    decay 1/2 per step truncated to the last ``window`` points — the
    standard smoothing companion to the rolling-window ops (win_frame /
    ts_trend): out = sum(x_j * 2^-(n-1-j)) / sum(2^-(n-1-j)), j oldest ->
    current within the frame. One window shuffle on (key, time), no
    joins; at 100 TB the frame is bounded (``window`` rows), so state per
    partition stays constant and the op scales exactly like any other
    windowed aggregate.

    Determinism across engines (the repo's transcendental rule, minus
    the transcendental): the decay is EXACTLY representable — weights
    are powers of two built by integer shift + divide (never pow(),
    whose last-ulp behavior differs between libm and the JVM); each
    term is scaled to micro-units and rounded to a LONG, the longs sum
    exactly (order-free), and ONE final double division rounds to 6.
    Ties in ``time_col`` are broken by ``tie_col`` (pass the ROW ID so
    equal-timestamp rows pair with their frame deterministically), else
    by the value itself.
    """
    tie = F.col(tie_col or value_col).asc()
    w = (
        Window.partitionBy(key_col)
        .orderBy(F.col(time_col).asc(), tie)
        .rowsBetween(-(window - 1), 0)
    )
    xs = F.collect_list(F.col(value_col).cast("double")).over(w)
    n = F.size("__xs")
    # weight 2^-(n-1-i) looked up from a literal array of exact doubles
    # (1.0 / (1 << j) is an exact power of two computed in Python —
    # shiftleft() can't take a Column bit count, and pow() is banned by
    # the determinism rule); element_at is 1-based: index (n-1-i)+1
    wts = F.array(*[F.lit(1.0 / (1 << j)) for j in range(window)])
    weight = lambda i: F.element_at(wts, (n - i).cast("int"))  # noqa: E731
    num = F.aggregate(
        F.transform(
            F.col("__xs"),
            lambda x, i: F.round(x * weight(i) * F.lit(1e6), 0).cast("long"),
        ),
        F.lit(0).cast("long"),
        lambda acc, t: acc + t,
    )
    den = F.aggregate(
        F.transform(
            F.col("__xs"),
            lambda x, i: F.round(weight(i) * F.lit(1e6), 0).cast("long"),
        ),
        F.lit(0).cast("long"),
        lambda acc, t: acc + t,
    )
    lead = [tie_col] if tie_col else []
    return series.select(
        *lead, key_col, time_col, F.col(value_col).alias("x"), xs.alias("__xs")
    ).select(
        *lead,
        key_col,
        time_col,
        "x",
        F.round(num.cast("double") / den.cast("double"), 6).alias("ewma"),
    )


def seasonal_anomaly(
    events: DataFrame,
    time_col: str = "ts",
    key_cols: tuple[str, ...] = ("user_id",),
    value_col: str = "value",
    z_threshold: float = 3.0,
) -> DataFrame:
    """Seasonal-baseline anomaly detection — the sensor-monitoring query
    robust_outliers can't answer: a value normal at 14:00 may be anomalous
    at 03:00, so each point compares against the mean/stddev of ITS OWN
    (key, hour-of-day) stratum rather than the key's global distribution
    (the seasonal-naive baseline; hour-of-day is the dominant cycle for
    home/sensor telemetry).

    Determinism contract (oracle value-hashes every z): the stratum sums
    are EXACT decimal aggregates (order-free); mean/stddev derive from
    them in a fixed double expression rounded to 6; z rounds to 6 before
    the threshold compare. A zero/one-sample stratum can't score: sd=0
    falls back to 'anomalous iff v differs from the stratum mean' (the
    robust_outliers convention), n=1 strata flag nothing.

    Scale shape: one hash agg to a |keys| x 24 baseline frame (KB-scale,
    broadcast back onto the event scan — the events never shuffle), pure
    projection after the join.
    """
    hod = F.hour(F.col(time_col)).alias("hod")
    v = F.col(value_col)
    base = (
        events.groupBy(*key_cols, hod)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(v.cast("decimal(38,6)")).alias("s"),
            F.sum((v * v).cast("decimal(38,6)")).alias("s2"),
        )
        .select(
            *key_cols,
            "hod",
            "n",
            F.round(F.col("s").cast("double") / F.col("n"), 6).alias("mean"),
            F.when(
                F.col("n") > 1,
                F.round(
                    F.sqrt(
                        F.greatest(
                            F.lit(0.0),
                            (
                                F.col("s2").cast("double")
                                - F.col("s").cast("double")
                                * F.col("s").cast("double")
                                / F.col("n")
                            )
                            / (F.col("n") - 1),
                        )
                    ),
                    6,
                ),
            ).alias("sd"),
        )
    )
    z = F.when(
        F.col("sd") > 0.0, F.round((v - F.col("mean")) / F.col("sd"), 6)
    )
    flag = (
        F.when(F.col("sd").isNull(), F.lit(False))
        .when(F.col("sd") == 0.0, v != F.col("mean"))
        .otherwise(F.abs(z) > F.lit(z_threshold))
    )
    return (
        events.withColumn("hod", F.hour(F.col(time_col)))
        .join(F.broadcast(base), [*key_cols, "hod"])
        .withColumn("z", z)
        .withColumn("is_anomalous", flag)
    )


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    l_start: str = "start",
    l_end: str = "end",
    r_start: str = "w_start",
    r_end: str = "w_end",
    unit: str = "day",
) -> DataFrame:
    """Interval OVERLAP join — ``l.start < r.end AND r.start < l.end``
    (both ends exclusive) — executed as a time-grid bucket EQUI-join +
    exact post-filter, the 1-D analogue of geo_bbox_join's grid trick:
    every interval fans out to the ``unit`` buckets it touches, two
    overlapping intervals necessarily share at least one bucket, so the
    equi-join finds every true pair; the exact predicate removes
    same-bucket non-overlaps and ``distinct`` collapses pairs that share
    several buckets. Returns all columns of both inputs plus
    ``overlap_micros``.

    Why not the theta join: Catalyst can only execute an inequality-only
    join as BroadcastNestedLoop/cartesian — |L| x |R| comparisons. The
    bucket form shuffles both sides on the bucket key instead: work is
    ∝ Σ interval-days + true pairs, and skew follows LONG intervals
    (they fan out to many buckets) — at 100 TB pick ``unit`` near the
    median interval length, and split-or-cap degenerate open-ended
    intervals before joining (the same knob as the spatial grid cell
    size). Every column expression here is codegen; the only Python is
    plan construction.
    """
    lb = left.withColumn(
        "__b",
        F.explode(
            F.sequence(
                F.date_trunc(unit, F.col(l_start)),
                F.date_trunc(
                    unit, F.col(l_end) - F.expr("INTERVAL 1 MICROSECOND")
                ),
                F.expr(f"INTERVAL 1 {unit}"),
            )
        ),
    )
    rb = right.withColumn(
        "__b",
        F.explode(
            F.sequence(
                F.date_trunc(unit, F.col(r_start)),
                F.date_trunc(
                    unit, F.col(r_end) - F.expr("INTERVAL 1 MICROSECOND")
                ),
                F.expr(f"INTERVAL 1 {unit}"),
            )
        ),
    )
    overlap = F.unix_micros(
        F.least(F.col(l_end), F.col(r_end))
    ) - F.unix_micros(F.greatest(F.col(l_start), F.col(r_start)))
    return (
        lb.join(rb, "__b")
        .filter(
            (F.col(l_start) < F.col(r_end)) & (F.col(r_start) < F.col(l_end))
        )
        .drop("__b")
        .distinct()
        .withColumn("overlap_micros", overlap)
    )


def time_bucket_origin_agg(
    states: DataFrame,
    width: str = "90 minutes",
    origin_offset: str = "15 minutes",
    time_col: str = "time",
    key_col: str = "entity_id",
) -> DataFrame:
    """TimescaleDB's ``time_bucket(width, ts, origin)`` — ARBITRARY-width
    buckets aligned to a custom origin, the overload ``date_trunc`` cannot
    express (90-minute buckets; shift-schedule alignment at :15). Spark's
    ``window(ts, width, width, startTime)`` is the same function: bucket
    boundaries sit at epoch + origin_offset modulo width, verified
    value-equal to DuckDB's origin overload.

    One hash aggregation; the window expression is a pure projection
    (tumbling — slide == width — emits exactly one bucket per row, no
    fan-out), so cost is the groupBy shuffle and nothing else.
    """
    w = F.window(time_col, width, width, origin_offset)
    return (
        states.groupBy(w.alias("w"), key_col)
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("bucket_start"), key_col, "n_events"
        )
    )


def cusum_changepoints(
    events: DataFrame,
    value_col: str = "value",
    key_col: str = "user_id",
    time_col: str = "ts",
    tie_col: str = "event_id",
    k: float = 0.5,
    h: float = 4.0,
) -> DataFrame:
    """Two-sided CUSUM change-point detection per series (Page 1954) —
    the standard mean-shift detector a telemetry pipeline runs beside
    seasonal anomaly checks: a point is flagged when the cumulative
    evidence of an up- (or down-) shift exceeds ``h``·sigma, with drift
    allowance ``k``·sigma per step.

    The textbook form is RECURSIVE (s_i = max(0, s_{i-1} + y_i)) and so
    looks window-inexpressible; the reflection identity turns it into
    two plain windows: with c_i = prefix-sum(y), the reflected walk is
    exactly c_i - min(0, prefix-min(c)). So the whole detector is ONE
    window shuffle per series key, no joins, no recursion.

    The per-series mean/sigma are WHOLE-FRAME window aggregates over the
    SAME (key, time, tie) sort the cumulative windows need (r12, guide
    §2.4): the previous form computed them as a groupBy aggregate on a
    second scan of the input and broadcast-joined them back — one extra
    pass over the events plus a broadcast wave, when the rows are already
    partitioned and sorted per series for the prefix sums. The frame is
    unboundedPreceding..unboundedFollowing, so the values (count/sum of
    exact decimals) are order-insensitive and bit-identical to the
    aggregate form; key_col NULLs are filtered explicitly to preserve the
    old inner-join semantics (a JOIN USING(key) drops them).

    Determinism (the repo's transcendental rule, ts_ewma's micro-unit
    form): per-series mean and sigma round to 6 BEFORE use (sqrt is
    transcendental); each per-step deviation scales to MICRO-UNIT LONGs
    (round(dev * 1e6, 0) — integer rounding, where both engines round
    half away from zero) and every prefix sum/min/threshold compare is
    exact BIGINT arithmetic. Fractional-decimal rounding (round(x, 6))
    is deliberately avoided mid-pipeline: engines implement it via
    different float paths and disagree on near-tie values (measured: 1e-6
    flips vs DuckDB), while integer rounding agrees.

    Scale: the window is per-``key_col`` — series-parallel like every
    ts_* operator; a 100 TB deployment's series count (users/entities)
    dwarfs executor count, and the per-series scan is inherent to any
    ordered recursion (same posture as ts_ewma/ts_sessionize).
    """
    x = F.col("x")
    base = events.filter(
        F.col(value_col).isNotNull() & F.col(key_col).isNotNull()
    ).select(
        tie_col, key_col, time_col, F.col(value_col).cast("double").alias("x")
    )
    d6 = lambda c: F.round(c, 6).cast("decimal(38,6)")  # noqa: E731
    order = [F.col(time_col).asc(), F.col(tie_col).asc()]
    wstat = (
        Window.partitionBy(key_col)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    n = F.count(F.lit(1)).over(wstat)
    mu = F.round(F.sum(d6(x)).over(wstat).cast("double") / n, 6)
    with_stats = base.select(
        tie_col,
        key_col,
        time_col,
        "x",
        mu.alias("mu"),
        F.round(
            F.sqrt(
                F.greatest(
                    F.sum(d6(x * x)).over(wstat).cast("double") / n - mu * mu,
                    F.lit(0.0),
                )
            ),
            6,
        ).alias("sigma"),
    )
    micro = lambda c: F.round(c * 1e6, 0).cast("long")  # noqa: E731
    w = (
        Window.partitionBy(key_col)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = with_stats.select(
        tie_col,
        key_col,
        time_col,
        "x",
        "sigma",
        F.sum(micro(x - F.col("mu") - k * F.col("sigma"))).over(w).alias("cpos"),
        F.sum(micro(-(x - F.col("mu") + k * F.col("sigma")))).over(w).alias("cneg"),
    )
    # the reflection window reuses the SAME (time, tie) total order and
    # partition key, so Catalyst keeps it in the same sort/shuffle
    ref = cum.select(
        tie_col,
        key_col,
        "x",
        "sigma",
        (F.col("cpos") - F.least(F.min("cpos").over(w), F.lit(0))).alias("sp"),
        (F.col("cneg") - F.least(F.min("cneg").over(w), F.lit(0))).alias("sn"),
    )
    thr = micro(h * F.col("sigma"))
    return ref.select(
        tie_col,
        key_col,
        "x",
        F.round(F.col("sp") / 1e6, 6).alias("s_pos"),
        F.round(F.col("sn") / 1e6, 6).alias("s_neg"),
        ((F.col("sp") > thr) | (F.col("sn") > thr)).alias("is_change"),
    )


def m4_downsample(
    events: DataFrame,
    value_col: str = "value",
    key_col: str = "user_id",
    time_col: str = "ts",
    tie_col: str = "event_id",
    bucket: str = "1 hour",
) -> DataFrame:
    """M4 downsampling (Jugel et al., VLDB 2014 "M4: A Visualization-
    Oriented Time Series Data Aggregation") — the OTHER canonical
    dashboard downsampler beside LTTB (ts_lttb): per (series, pixel
    bucket) keep min, max, first, last of the value. M4 is what Grafana/
    TimescaleDB-style tooling renders with: those four points per pixel
    column reproduce the line chart's visible extremes EXACTLY at the
    target resolution, with error bounded by one pixel.

    vs LTTB: M4 is ONE hash aggregation (min/max + argmin/argmax by
    (time, tie) — map-side partial, a single shuffle on (key, bucket),
    no window sort, embarrassingly scalable), while LTTB is a per-series
    sequential sweep with better perceptual weighting. Dashboards at
    100 TB want M4 for the first zoomed-out render and LTTB for small
    result sets.

    NULL values are excluded (they draw nothing); buckets with no
    numeric sample emit no row."""
    v = F.col(value_col)
    base = events.filter(v.isNotNull())
    order = F.struct(F.col(time_col), F.col(tie_col))
    w = F.window(time_col, bucket)
    return (
        base.groupBy(w.alias("w"), key_col)
        .agg(
            F.min(v).alias("v_min"),
            F.max(v).alias("v_max"),
            F.min_by(v, order).alias("v_first"),
            F.max_by(v, order).alias("v_last"),
            F.count(F.lit(1)).alias("n_samples"),
        )
        .select(
            F.col("w.start").alias("bucket_start"),
            key_col,
            "v_min",
            "v_max",
            "v_first",
            "v_last",
            "n_samples",
        )
    )
