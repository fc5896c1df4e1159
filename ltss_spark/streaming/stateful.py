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


_CUSUM_OUT = (
    "event_id bigint, user_id bigint, x double, "
    "s_pos double, s_neg double, is_change boolean"
)
_CUSUM_STATE = "sp bigint, sn bigint"


def _make_cusum_fn(limits: dict):
    """Build the per-key CUSUM fold over broadcast control limits.

    ``limits``: {user_id: (mu, sigma, thr_micro)} — trained offline (the
    SPC posture: control limits come from a reference period, the monitor
    just folds). State per key is TWO LONGs (the reflected walk values in
    micro-units) — O(#series) total, the bounded-state discipline.

    Within a batch the rows sort by (ts, event_id) and the recursion runs
    via the same reflection identity as the batch operator: with the
    carried state s0 as the walk's starting level, s_i = c_i - min(0,
    prefix-min(c)) where c = s0 + cumsum(y). Vectorized numpy — no
    per-row Python loop."""
    import numpy as np

    def fold(key, pdfs, state):
        user = key[0]
        mu, sigma, thr = limits.get(user, (0.0, 0.0, 0))
        sp0, sn0 = state.get if state.exists else (0, 0)
        outs = []
        for pdf in pdfs:
            if not len(pdf):
                continue
            pdf = pdf.sort_values(["ts", "event_id"]).reset_index(drop=True)
            x = pdf["value"].to_numpy(dtype="float64")

            # HALF-AWAY-FROM-ZERO to match Spark/DuckDB round(x, 0) —
            # np.rint would round half-to-even and flip exact .5 ties
            def r0(v):
                return np.where(
                    v >= 0, np.floor(v + 0.5), np.ceil(v - 0.5)
                ).astype("int64")

            yp = r0((x - mu - 0.5 * sigma) * 1e6)
            yn = r0(-(x - mu + 0.5 * sigma) * 1e6)
            cp = sp0 + np.cumsum(yp)
            cn = sn0 + np.cumsum(yn)
            sp = cp - np.minimum(np.minimum.accumulate(cp), 0)
            sn = cn - np.minimum(np.minimum.accumulate(cn), 0)
            sp0, sn0 = int(sp[-1]), int(sn[-1])
            outs.append(
                pd.DataFrame(
                    {
                        "event_id": pdf["event_id"],
                        "user_id": user,
                        "x": x,
                        "s_pos": np.round(sp / 1e6, 6),
                        "s_neg": np.round(sn / 1e6, 6),
                        "is_change": (sp > thr) | (sn > thr),
                    }
                )
            )
        state.update((sp0, sn0))
        for o in outs:
            yield o

    return fold


def streaming_cusum(raw: DataFrame, limits: dict) -> DataFrame:
    """Per-event CUSUM monitoring as a STREAM: the batch operator's
    reflected-walk arithmetic (operators/timeseries.cusum_changepoints)
    carried across micro-batches in two longs of state per series.
    ``raw`` is a STREAMING frame with (event_id, user_id, ts, value); the
    caller supplies trained control limits (the SPC posture — limits come
    from a reference period, the monitor folds). With micro-batches
    arriving in event-time order per key (the registered entry splits the
    source into time-ordered files), the emitted rows are bit-equal to
    the batch computation — exactly what the entry's oracle checks."""
    raw = raw.filter(F.col("value").isNotNull())
    updates = raw.groupBy("user_id").applyInPandasWithState(
        _make_cusum_fn(limits),
        outputStructType=_CUSUM_OUT,
        stateStructType=_CUSUM_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    return run_to_memory(updates, "append", "stream_cusum")
