"""Distributed global ranking — row_number over a corpus-sized frame
without the single-reducer global window.

``Window.orderBy(...)`` with no partitionBy moves EVERY row through one
reducer (Spark even warns: "No Partition Defined for Window operation").
That is fine when the input is bounded by construction (a top-k slice, a
vocab pre-cut) — and is a driver-of-the-job bottleneck when the input is
the corpus itself, e.g. ranking every document by a quality score to take
the top quota (DSIR resampling).

``distributed_row_number`` is the classic two-pass alternative, the same
shape ``zipWithIndex`` uses underneath but expressed on DataFrames so it
stays inside Catalyst/Tungsten:

1. range-repartition on the full sort key (which must end in a unique
   tie-break so the order is TOTAL — partition i then holds keys strictly
   before partition i+1);
2. rank locally inside each partition (a partitioned window — parallel);
3. add each partition's starting offset, computed from the per-partition
   counts: a |partitions|-sized driver list, broadcast-joined back.

Total cost: one range exchange + one hash exchange + a count job — all
parallel, shuffle volume ∝ input, no stage ever serializes the corpus.
The result is bit-identical to the global-window row_number because the
order is total.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from ltss_spark.localrel import local_frame
from pyspark.sql import Column, DataFrame, Window

_PID = "__rank_pid"
_LRN = "__rank_local"
_OFF = "__rank_offset"


def _local_ranked(df: DataFrame, order: list[Column], parts: int) -> DataFrame:
    """Pass 1+2 of the two-pass rank (pre-materialization): range
    repartition on the total order, then a PARTITIONED window — the plan
    must show `rangepartitioning` and a window spec keyed on the partition
    id, never a partitionless (single-reducer) window (plan-tested)."""
    return (
        df.repartitionByRange(parts, *order)
        .withColumn(_PID, F.spark_partition_id())
        .withColumn(
            _LRN,
            F.row_number().over(Window.partitionBy(_PID).orderBy(*order)),
        )
    )


def distributed_row_number(
    df: DataFrame,
    order: list[Column],
    out_col: str = "rank",
    num_partitions: int | None = None,
    single_task_threshold: int = 1_000_000,
) -> DataFrame:
    """``df`` + an ``out_col`` holding the 1-based global row_number under
    ``order`` (a list of Column sort expressions, e.g.
    ``[F.col("score").desc(), F.col("id").asc()]``). ``order`` MUST be a
    total order (end it with a unique key): equal keys straddling a range
    boundary would otherwise make local ranks ambiguous.

    Adaptive, like a broadcast-join threshold: below
    ``single_task_threshold`` rows the plain global window is CHEAPER
    (the two-pass machinery is ~5 sequential jobs of fixed overhead) and
    perfectly safe — a bounded row set through one reducer is exactly
    the case the scale rule permits. Above it, the two-pass path takes
    over. Both paths produce bit-identical output (the order is total),
    so the switch is an execution decision, not a semantic one. The
    input is materialized either way — the count that drives the switch
    and (on the distributed path) the range-boundary sampling job must
    not re-evaluate an expensive upstream pipeline (measured: the DSIR
    score pipeline at 6.9 s when sampled uncached vs 2.0 s cached).
    """
    spark = df.sparkSession
    parts = num_partitions or spark.sparkContext.defaultParallelism
    df = df.localCheckpoint()
    if df.count() <= single_task_threshold:
        w = Window.orderBy(*order)
        return df.withColumn(
            out_col, F.row_number().over(w).cast("int")
        )
    local = _local_ranked(df, order, parts).localCheckpoint()
    counts = (
        local.groupBy(_PID)
        .agg(F.count(F.lit(1)).alias("__n"))
        .collect()
    )  # bounded: one row per partition
    offsets, acc = [], 0
    for r in sorted(counts, key=lambda r: r[_PID]):
        offsets.append((r[_PID], acc))
        acc += r["__n"]
    off_df = local_frame(spark, offsets, f"{_PID} int, {_OFF} long")
    return (
        local.join(F.broadcast(off_df), _PID)
        .withColumn(out_col, (F.col(_OFF) + F.col(_LRN)).cast("int"))
        .drop(_PID, _LRN, _OFF)
    )
