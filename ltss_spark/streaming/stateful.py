"""Custom stateful streaming — `applyInPandasWithState` (SURVEY.md §2.C
stream_stateful).

The reference's only stateful behavior is implicit: the single writer
thread sees events in order and the database accumulates them
(/root/reference/custom_components/ltss/__init__.py:193-244). At Spark
scale, arbitrary per-key accumulation (beyond what windowed aggregation
expresses) is `applyInPandasWithState`: the runtime shuffles rows to their
key's owner, hands each key's micro-batch slice to Python as Arrow batches,
and persists a typed state row between batches in the state store.

State here is fixed-width per key (three numbers), so state size is
O(#keys) regardless of stream length — the bounded-state discipline that
survives 100 TB. All accumulators are order-insensitive (count, integer
sum, max) so the result is deterministic under any partitioning.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator

import pandas as pd
import pyspark.sql.functions as F  # noqa: F401  (re-exported convenience)
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ltss_spark.streaming.windows import bounded_events_stream, run_to_memory

_OUT_SCHEMA = (
    "user_id bigint, n_events bigint, id_checksum bigint, max_value double"
)
_STATE_SCHEMA = "n bigint, checksum bigint, mx double"


def _accumulate(
    key: tuple[Any, ...],
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Fold this batch's rows for one user into the persisted (n, checksum,
    max) state; emit the updated running totals once per batch."""
    n, checksum, mx = state.get if state.exists else (0, 0, float("-inf"))
    for pdf in pdfs:
        n += int(len(pdf))
        checksum += int(pdf["event_id"].sum()) if len(pdf) else 0
        if len(pdf):
            mx = max(mx, float(pdf["value"].max()))
    state.update((n, checksum, mx))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "id_checksum": [checksum],
            "max_value": [mx],
        }
    )


def streaming_user_totals(spark: SparkSession, source_dir: str) -> DataFrame:
    """Running per-user totals via applyInPandasWithState over the bounded
    event stream. With one micro-batch the emission equals the batch GROUP
    BY; with several, later emissions supersede earlier ones (callers keep
    the max-n row per user — see tests)."""
    raw = bounded_events_stream(spark, source_dir)
    updates = raw.groupBy("user_id").applyInPandasWithState(
        _accumulate,
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    out = run_to_memory(updates, "update", "stream_stateful")
    # update-mode emissions accumulate in the memory sink; the final state
    # per user is the one with the largest n_events
    w_latest = (
        out.groupBy("user_id")
        .agg(
            F.max_by(
                F.struct("n_events", "id_checksum", "max_value"), F.col("n_events")
            ).alias("s")
        )
        .select(
            "user_id",
            F.col("s.n_events").alias("n_events"),
            F.col("s.id_checksum").alias("id_checksum"),
            F.col("s.max_value").alias("max_value"),
        )
    )
    return w_latest
