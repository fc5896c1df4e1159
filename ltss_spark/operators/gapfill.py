"""Gap-fill — TimescaleDB ``time_bucket_gapfill`` analogue (SURVEY.md §2.C
ts_gapfill; the Grafana dashboard path the reference documents at
/root/reference/README.md:24-26 relies on it for regular time series).

Composition: bucket + aggregate, then densify the time axis with
``sequence()``/``explode`` (a calendar dimension generated ON the cluster,
not collected to the driver), left-join the sparse aggregates onto the dense
grid, and fill with last-observation-carried-forward via
``last(ignorenulls)`` over a per-key ordered window.

Scale notes: the dense grid is |keys| x |buckets| rows — generated
distributed via explode, never materialized on the driver. The LOCF window
is per-key (no global sort). Bucket count is bounded by the query's time
range, so the grid stays proportional to the *output*, not the input. The
window must span the whole key timeline (carries state across month
partition boundaries — SURVEY §7 'hard parts').
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window


def time_bucket_gapfill(
    df: DataFrame,
    time_col: str,
    key_cols: list[str],
    agg: Column,
    bucket: str = "1 day",
    locf: bool = True,
) -> DataFrame:
    """Returns columns: *key_cols, bucket_ts, agg_value, filled_value, is_gap.

    ``agg`` is an aggregate Column (already aliased 'agg_value' by caller or
    aliased here). Buckets with no input rows appear with agg_value NULL and
    filled_value carried forward from the previous non-empty bucket.
    """
    # window().start is the epoch-aligned bucket floor for ANY interval —
    # the general time_bucket, not just date_trunc's calendar units
    bucket_start = F.window(F.col(time_col), bucket).getField("start")
    # lazy localCheckpoint: bounds, the key census, and the grid join all
    # consume this aggregation, and Catalyst does not reuse a subplan across
    # those three shapes (measured: 3 scans + 6 HashAggregates, zero
    # ReusedExchange) — materializing it once makes the raw-input groupBy,
    # the dominant cost at scale, run exactly once
    bucketed = (
        df.groupBy(*key_cols, bucket_start.alias("bucket_ts"))
        .agg(agg.alias("agg_value"))
        .localCheckpoint(eager=False)
    )
    bounds = bucketed.agg(
        F.min("bucket_ts").alias("mn"), F.max("bucket_ts").alias("mx")
    )
    keys = bucketed.select(*key_cols).distinct()
    # broadcast the 1-row bounds onto the (distributed) key census, then
    # generate each key's bucket axis with sequence()/explode — the grid is
    # built where the keys live, and the only broadcast is a single row.
    # (Broadcasting the key census itself would ship |keys| rows to every
    # executor: multi-GB at a 100M-entity fleet.)
    grid = keys.crossJoin(F.broadcast(bounds)).select(
        *key_cols,
        F.explode(
            F.sequence(F.col("mn"), F.col("mx"), F.expr(f"INTERVAL {bucket}"))
        ).alias("bucket_ts"),
    )
    joined = grid.join(bucketed, on=[*key_cols, "bucket_ts"], how="left")
    if not locf:
        return joined
    w = (
        Window.partitionBy(*key_cols)
        .orderBy("bucket_ts")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        *key_cols,
        "bucket_ts",
        "agg_value",
        F.last("agg_value", ignorenulls=True).over(w).alias("filled_value"),
        F.col("agg_value").isNull().alias("is_gap"),
    )


def time_bucket_interpolate(
    df: DataFrame,
    time_col: str,
    key_cols: list[str],
    agg: Column,
    bucket: str = "1 day",
) -> DataFrame:
    """Gap-fill with LINEAR interpolation — TimescaleDB's
    ``interpolate()`` companion to ``time_bucket_gapfill``. Gap buckets get
    prev + (next - prev) * elapsed_fraction; leading/trailing gaps (no
    bracket on one side) stay NULL.

    Same dense-grid construction as :func:`time_bucket_gapfill`; the
    bracketing values come from two per-key ordered windows
    (last-non-null-behind, first-non-null-ahead) — still linear per key,
    no self-join.
    """
    sparse = time_bucket_gapfill(df, time_col, key_cols, agg, bucket, locf=False)
    behind = (
        Window.partitionBy(*key_cols)
        .orderBy("bucket_ts")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ahead = (
        Window.partitionBy(*key_cols)
        .orderBy("bucket_ts")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    v = F.col("agg_value")
    marked_ts = F.when(v.isNotNull(), F.col("bucket_ts"))
    prev_v = F.last(v, ignorenulls=True).over(behind)
    prev_t = F.last(marked_ts, ignorenulls=True).over(behind)
    next_v = F.first(v, ignorenulls=True).over(ahead)
    next_t = F.first(marked_ts, ignorenulls=True).over(ahead)
    frac = (
        (F.unix_micros(F.col("bucket_ts")) - F.unix_micros(prev_t))
        / (F.unix_micros(next_t) - F.unix_micros(prev_t))
    )
    interp = (
        F.when(v.isNotNull(), v)
        .when(
            prev_v.isNotNull() & next_v.isNotNull(),
            prev_v + (next_v - prev_v) * frac,
        )
    )
    return sparse.select(
        *key_cols,
        "bucket_ts",
        "agg_value",
        interp.alias("interp_value"),
        v.isNull().alias("is_gap"),
    )
