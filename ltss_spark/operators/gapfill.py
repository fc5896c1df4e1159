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
    bucketed = (
        df.groupBy(*key_cols, F.date_trunc("day" if "day" in bucket else "hour", F.col(time_col)).alias("bucket_ts"))
        .agg(agg.alias("agg_value"))
    )
    bounds = bucketed.agg(
        F.min("bucket_ts").alias("mn"), F.max("bucket_ts").alias("mx")
    )
    step = "interval 1 day" if "day" in bucket else "interval 1 hour"
    grid_times = bounds.select(
        F.explode(F.sequence(F.col("mn"), F.col("mx"), F.expr(step))).alias("bucket_ts")
    )
    keys = bucketed.select(*key_cols).distinct()
    # both sides of this cross join are tiny (distinct keys x bucket count);
    # broadcast keeps it shuffle-free
    grid = F.broadcast(keys).crossJoin(grid_times)
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
