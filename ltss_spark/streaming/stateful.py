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


def tws_available() -> bool:
    """Capability probe for Spark 4's State API v2: the Python worker side
    imports google.protobuf at query start — absent in this container, so
    callers must check before building the query (the failure otherwise
    surfaces as an opaque 'driver worker crashed' stream error)."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def streaming_running_totals_tws(spark: SparkSession, source_dir: str) -> DataFrame:
    """Per-event running totals via ``transformWithStateInPandas`` — the
    Spark 4 arbitrary-state API (SPARK-49564 "State API v2") that
    supersedes applyInPandasWithState: typed state handles obtained in
    ``init`` from a StatefulProcessorHandle, per-key Arrow batches in
    ``handleInputRows``, RocksDB-backed state store.

    Each input event emits one output row carrying the key's cumulative
    (count, exact-decimal sum) AT that event — per-key prefix aggregation
    with O(1) state per key. Rows are processed in (ts, event_id) order
    within the batch, and the running sum lives in state as a DECIMAL
    STRING (fp accumulation would be order-sensitive; exact decimal makes
    every prefix deterministic — the same rule the batch registry applies
    to double aggregates). Bounded-run caveat: prefix semantics across
    micro-batches assume batches arrive in event-time order (true for the
    single-file AvailableNow source here); a production deployment orders
    by watermark + event-time timers before emitting.
    """
    if not tws_available():
        raise RuntimeError(
            "transformWithStateInPandas needs the google.protobuf package "
            "(the State API v2 Python bridge speaks protobuf to the JVM "
            "state server); it is not installed in this environment. The "
            "operator is fully wired — run it on a cluster image with "
            "protobuf to get State API v2 semantics; applyInPandasWithState "
            "(streaming_user_totals) covers the stateful surface here."
        )
    from decimal import Decimal

    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    class RunningTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._totals = handle.getValueState("totals", "n BIGINT, s STRING")

        def handleInputRows(self, key, rows, timerValues):
            pdfs = [p for p in rows if len(p)]
            if not pdfs:
                return
            pdf = pd.concat(pdfs).sort_values(["ts", "event_id"])
            if self._totals.exists():
                n, s = self._totals.get()
                run_sum = Decimal(s)
            else:
                n, run_sum = 0, Decimal(0)
            ns: list[int] = []
            sums: list[float] = []
            for v in pdf["value"]:
                n += 1
                # str(float) is the shortest exact repr; <=2 decimals in
                # the data makes this identical to CAST(v AS DECIMAL(38,2))
                run_sum += Decimal(str(v))
                ns.append(n)
                # one IEEE rounding per emission == CAST(dec AS DOUBLE)
                sums.append(float(run_sum))
            self._totals.update((n, str(run_sum)))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]] * len(pdf),
                    "ts": pdf["ts"].to_list(),
                    "event_id": pdf["event_id"].to_list(),
                    "run_n": ns,
                    "run_sum": sums,
                }
            )

        def close(self) -> None:
            pass

    raw = bounded_events_stream(spark, source_dir)
    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        updates = raw.groupBy("user_id").transformWithStateInPandas(
            statefulProcessor=RunningTotals(),
            outputStructType=(
                "user_id bigint, ts timestamp, event_id bigint, "
                "run_n bigint, run_sum double"
            ),
            outputMode="append",
            timeMode="none",
        )
        return run_to_memory(updates, "append", "stream_tws")
    finally:
        if prev is not None:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)
        else:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
