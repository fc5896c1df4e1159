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

from ltss_spark.streaming.windows import (
    bounded_events_stream,
    bounded_source_state_partitions,
    run_to_memory,
)

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
    out = run_to_memory(
        updates,
        "update",
        "stream_stateful",
        bounded_source_state_partitions(f"{source_dir}/events.parquet"),
    )
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


#: known vendored pure-Python protobuf locations on hosts without the pip
#: package — the Google Cloud SDK ships one (its own public distribution of
#: protobuf, BSD-licensed). Probed newest-capable-first.
_PROTOBUF_FALLBACK_DIRS = (
    "/usr/lib/google-cloud-sdk/platform/google_appengine",  # protobuf 6.x
    "/usr/lib/google-cloud-sdk/lib/third_party/cloudsdk",  # protobuf 4.x
)


#: per-process private root for protobuf shim dirs: created 0700 by
#: mkdtemp (no other local user can pre-create or swap the symlinks — a
#: fixed world-writable /tmp path was a symlink-TOCTOU code-injection
#: surface into every Python child, r12 self-review), removed at exit.
_SHIM_ROOT: str | None = None


def _shim_dir_for(d: str) -> str | None:
    """Build (or reuse, within this process) a shim directory exposing
    ONLY ``google/protobuf`` from the vendored tree ``d`` (ADVICE r9):
    the Cloud-SDK dirs vendor many top-level modules (api_server,
    dev_appserver, a whole ``lib/``) and ``google/`` siblings (appengine,
    auth, oauth2, pyglib) — putting the raw dir on sys.path/$PYTHONPATH
    would leak all of them into every Python child. The shim is
    ``<private mkdtemp root>/<md5(d)>/google/protobuf ->
    <d>/google/protobuf``: ``google`` stays a namespace package holding
    exactly one portion, so nothing else resolves; the root is
    owner-only (0700) and process-scoped, so no other local user can
    plant or swap the link. Returns None when the shim cannot be built
    (exotic tmp/filesystem) — the caller skips the candidate rather than
    falling back to the leaky whole-dir append."""
    import atexit
    import hashlib
    import os as _os
    import shutil
    import tempfile

    global _SHIM_ROOT
    target = _os.path.join(d, "google", "protobuf")
    try:
        if _SHIM_ROOT is None or not _os.path.isdir(_SHIM_ROOT):
            _SHIM_ROOT = tempfile.mkdtemp(prefix="ltss_pb_shim_")
            atexit.register(shutil.rmtree, _SHIM_ROOT, ignore_errors=True)
        shim = _os.path.join(
            _SHIM_ROOT, hashlib.md5(d.encode()).hexdigest()[:12]
        )
        link = _os.path.join(shim, "google", "protobuf")
        _os.makedirs(_os.path.join(shim, "google"), exist_ok=True)
        if _os.path.islink(link) and _os.readlink(link) != target:
            _os.unlink(link)  # stale shim from a different layout
        if not _os.path.islink(link):
            _os.symlink(target, link)
        return shim
    except OSError:
        return None


def enable_state_api_v2_runtime() -> bool:
    """Make ``google.protobuf`` importable for Spark 4's State API v2
    (``transformWithStateInPandas`` speaks protobuf between the Python
    worker and the JVM state server).

    Order of attempts:
    1. the real package (a normal cluster image) — nothing to do;
    2. a vendored pure-Python copy already ON THIS HOST (the Google Cloud
       SDK ships protobuf; this container has 6.32), exposed through a
       protobuf-only SHIM dir (:func:`_shim_dir_for` — never the raw
       vendored dir, which would leak its other vendored packages). The
       shim goes on ``sys.path`` AND ``$PYTHONPATH`` (Python workers are
       separate processes — they inherit the env, not our sys.path), and
       ``TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK`` is set: pyspark's
       gencode is 6.33 and protobuf's validator refuses a 6.32 runtime,
       but the wire format is stable across a minor version — protobuf's
       own documented escape hatch for exactly this skew.

    PROCESS-GLOBAL side effects, by design (documented per ADVICE r9):
    the version-check bypass env var and the $PYTHONPATH shim are seen by
    every child process, not just Spark workers — the shim keeps the
    blast radius to ``google.protobuf`` itself, and the bypass only
    matters to a process that both imports protobuf and hits a gencode/
    runtime minor-version skew. A candidate whose probe import fails is
    rolled back completely (sys.path, $PYTHONPATH, the env var, and any
    half-imported ``google`` modules) before the next is tried.

    MUST run before the JVM starts (ltss_spark.session.get_spark calls it
    first): local-mode Python workers inherit the JVM's environment,
    which is captured at JVM launch. Returns availability; mutates
    nothing when the real package exists or no fallback works."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        pass
    import importlib
    import os as _os
    import sys as _sys

    for d in _PROTOBUF_FALLBACK_DIRS:
        if not _os.path.isfile(
            _os.path.join(d, "google", "protobuf", "descriptor.py")
        ):
            continue
        shim = _shim_dir_for(d)
        if shim is None:
            continue
        added_sys = shim not in _sys.path
        if added_sys:
            _sys.path.append(shim)
        prev_pp = _os.environ.get("PYTHONPATH")
        added_pp = shim not in (prev_pp or "").split(_os.pathsep)
        if added_pp:
            _os.environ["PYTHONPATH"] = (
                f"{prev_pp}{_os.pathsep}{shim}" if prev_pp else shim
            )
        had_check = "TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK" in _os.environ
        _os.environ.setdefault(
            "TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK", "true"
        )
        importlib.invalidate_caches()
        # snapshot BEFORE the probe: the rollback may purge only modules
        # the probe itself pulled in — deleting a pre-existing
        # google.auth/google.cloud would split its module identity on the
        # next import (r12 self-review)
        pre_google = {
            m for m in _sys.modules if m == "google" or m.startswith("google.")
        }
        try:
            from google.protobuf import descriptor  # noqa: F401

            return True
        except ImportError:
            # roll back EVERY mutation this candidate made (ADVICE r9): a
            # failed probe must leave no trace on sys.path, the env, or
            # the import system before the next candidate (or the caller)
            if added_sys:
                _sys.path.remove(shim)
            if added_pp:
                if prev_pp is None:
                    _os.environ.pop("PYTHONPATH", None)
                else:
                    _os.environ["PYTHONPATH"] = prev_pp
            if not had_check:
                _os.environ.pop(
                    "TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK", None
                )
            for m in [
                m
                for m in _sys.modules
                if (m == "google" or m.startswith("google."))
                and m not in pre_google
            ]:
                del _sys.modules[m]
            continue
    return False


def tws_available() -> bool:
    """Capability probe for Spark 4's State API v2: the Python worker side
    imports google.protobuf at query start — callers must check before
    building the query (the failure otherwise surfaces as an opaque
    'driver worker crashed' stream error). Tries the host-level fallback
    runtime first (enable_state_api_v2_runtime), so on this container the
    TWS path is genuinely runnable, not dark."""
    return enable_state_api_v2_runtime()


def _require_worker_visible_protobuf(spark: SparkSession) -> None:
    """A fallback protobuf on the DRIVER's sys.path is not enough: Python
    workers are separate processes launched with the JVM's environment,
    captured at JVM start. If the runtime came from a fallback dir, the
    dir must be in the JVM's own $PYTHONPATH (i.e. the env was exported
    BEFORE the JVM launched — get_spark's contract); otherwise the query
    would die mid-stream with an opaque worker crash. Fail actionably
    instead."""
    import os as _os

    import google.protobuf as _pb

    root = _os.path.dirname(_os.path.dirname(_os.path.dirname(_pb.__file__)))
    # the runtime is a host-level fallback iff it resolved through one of
    # the known vendored dirs — either directly (legacy raw-dir append) or
    # via a protobuf-only shim whose symlink realpaths into one
    real_pkg = _os.path.realpath(_os.path.join(root, "google", "protobuf"))
    is_fallback = root in _PROTOBUF_FALLBACK_DIRS or any(
        real_pkg == _os.path.realpath(_os.path.join(d, "google", "protobuf"))
        for d in _PROTOBUF_FALLBACK_DIRS
    )
    if not is_fallback:
        return  # real pip package: visible to workers via site-packages
    jvm_pp = (
        spark._jvm.java.lang.System.getenv("PYTHONPATH") or ""  # noqa: SLF001
    )
    if root not in jvm_pp.split(_os.pathsep):
        raise RuntimeError(
            "State API v2 runtime is a host-level fallback protobuf "
            f"({root}) but this JVM started before it was exported to "
            "$PYTHONPATH, so Python WORKERS cannot import it. Build the "
            "session through ltss_spark.session.get_spark in a fresh "
            "process (it exports the runtime before the JVM launches)."
        )


def _require_tws(spark: SparkSession) -> None:
    """Shared capability gate for the State API v2 operators: protobuf
    runtime present AND worker-visible in this JVM's environment."""
    if not tws_available():
        raise RuntimeError(
            "transformWithStateInPandas needs the google.protobuf package "
            "(the State API v2 Python bridge speaks protobuf to the JVM "
            "state server); neither the pip package nor a host-level "
            "fallback runtime (enable_state_api_v2_runtime) was found. "
            "The operator is fully wired — run it on a cluster image with "
            "protobuf to get State API v2 semantics; applyInPandasWithState "
            "(streaming_user_totals) covers the stateful surface here."
        )
    _require_worker_visible_protobuf(spark)


def _run_totals_stream(
    spark: SparkSession, raw: DataFrame, state_partitions: int | None = None
) -> DataFrame:
    """Run the RunningTotals StatefulProcessor over ``raw`` (a STREAMING
    frame carrying user_id, ts, event_id, value) with a RocksDB state
    store — the shared core of :func:`streaming_running_totals_tws`
    (single-batch events source) and
    :func:`streaming_running_totals_tws_dir` (multi-micro-batch file
    source, the registered driver entry)."""
    import numpy as np

    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    class RunningTotals(StatefulProcessor):
        """Exact-decimal prefixes as VECTORIZED integer micro-units
        (retires the per-row Decimal loop VERDICT r9 noted): each value
        quantizes to round(v*1e6) int64 — guarded EXACT below — the
        prefix is one np.cumsum, and each emission is ONE IEEE division
        micro/1e6, which is the correctly-rounded double of the exact
        decimal prefix (division by the exactly-representable 1e6
        returns the nearest double of the true quotient) — bit-identical
        to CAST(SUM(DECIMAL(38,6)) AS DOUBLE) at every prefix."""

        def init(self, handle: StatefulProcessorHandle) -> None:
            self._totals = handle.getValueState(
                "totals", "n BIGINT, micro BIGINT"
            )

        def handleInputRows(self, key, rows, timerValues):
            pdfs = [p for p in rows if len(p)]
            if not pdfs:
                return
            pdf = pd.concat(pdfs).sort_values(["ts", "event_id"])
            vals = pdf["value"].to_numpy(dtype="float64")
            micros = np.round(vals * 1e6).astype("int64")
            # LOUD representability guard (the CUSUM order-guard
            # discipline): the micro-unit fold is exact ONLY for values
            # that ARE 6-decimal quantities; a wider value must fail,
            # not silently round
            if not np.array_equal(micros / 1e6, vals):
                bad = vals[micros / 1e6 != vals][:3]
                raise ValueError(
                    "streaming_running_totals_tws: value(s) not exactly "
                    f"representable at 6 decimals (e.g. {bad.tolist()}); "
                    "the exact micro-unit prefix state cannot represent "
                    "them. Widen the state scale or pre-round upstream."
                )
            prev = self._totals.get() if self._totals.exists() else None
            n0, m0 = (0, 0) if prev is None else (int(prev[0]), int(prev[1]))
            run_micro = m0 + np.cumsum(micros)
            self._totals.update((n0 + len(vals), int(run_micro[-1])))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]] * len(pdf),
                    "ts": pdf["ts"].to_list(),
                    "event_id": pdf["event_id"].to_list(),
                    "run_n": n0 + np.arange(1, len(vals) + 1, dtype="int64"),
                    "run_sum": run_micro / 1e6,
                }
            )

        def close(self) -> None:
            pass

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
        return run_to_memory(updates, "append", "stream_tws", state_partitions)
    finally:
        if prev is not None:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)
        else:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")


def streaming_running_totals_tws(spark: SparkSession, source_dir: str) -> DataFrame:
    """Per-event running totals via ``transformWithStateInPandas`` — the
    Spark 4 arbitrary-state API (SPARK-49564 "State API v2") that
    supersedes applyInPandasWithState: typed state handles obtained in
    ``init`` from a StatefulProcessorHandle, per-key Arrow batches in
    ``handleInputRows``, RocksDB-backed state store.

    Each input event emits one output row carrying the key's cumulative
    (count, exact-decimal sum) AT that event — per-key prefix aggregation
    with O(1) state per key. Rows are processed in (ts, event_id) order
    within the batch, and the running sum lives in state as an exact
    INTEGER MICRO-UNIT (fp accumulation would be order-sensitive; exact
    integer arithmetic makes every prefix deterministic — the same rule
    the batch registry applies to double aggregates), folded as one
    vectorized cumsum per batch with a loud guard on 6-decimal
    representability (no per-row Python). Bounded-run caveat: prefix semantics across
    micro-batches assume batches arrive in event-time order (true for the
    single-file AvailableNow source here, and for
    :func:`streaming_running_totals_tws_dir`'s global time-split files);
    a production deployment orders by watermark + event-time timers
    before emitting — exactly what
    :func:`streaming_running_totals_tws_ooo` (registered as
    ``stream_tws_ooo``) does over deliberately time-shuffled files.
    """
    _require_tws(spark)
    return _run_totals_stream(
        spark,
        bounded_events_stream(spark, source_dir),
        bounded_source_state_partitions(f"{source_dir}/events.parquet"),
    )


def streaming_running_totals_tws_dir(
    spark: SparkSession,
    src_path: str,
    schema: str = "event_id long, user_id long, ts timestamp, value double",
) -> DataFrame:
    """Multi-micro-batch form of :func:`streaming_running_totals_tws` for
    the registered ``stream_tws_totals`` entry (VERDICT r9 item 2):
    ``src_path`` is a directory of parquet files read with
    maxFilesPerTrigger=1 — each file is one REAL micro-batch, so the
    exact-decimal ValueState genuinely carries prefixes across batches
    (the single-file form exercises the API but folds everything in one
    batch). The caller must split files on GLOBAL event-time boundaries
    (the gap_close tercile recipe): that guarantees every key's batches
    arrive in event-time order, the documented prefix assumption."""
    _require_tws(spark)
    raw = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_path)
    )
    return _run_totals_stream(
        spark, raw, bounded_source_state_partitions(src_path)
    )


def running_totals_replay(events: DataFrame) -> DataFrame:
    """Batch replay of the RunningTotals prefix semantics — what the
    ``stream_tws_totals`` registry entry runs when the State API v2
    runtime is not worker-visible in its JVM (capability-gated, the
    stream_gap_close precedent), and what its DuckDB oracle replays.

    Exactness contract: the stream accumulates ``Decimal(str(value))``
    (shortest exact repr) and emits one IEEE rounding per prefix; for
    values whose repr carries <=6 decimals (the fixtures' domain,
    asserted against DECIMAL(38,6) here) that is bit-identical to a
    windowed exact-DECIMAL prefix sum CAST to double — deterministic
    under ANY partitioning, the property fp running sums lack."""
    from pyspark.sql import Window as W

    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return events.select(
        "user_id",
        "ts",
        "event_id",
        F.count(F.lit(1)).over(w).cast("long").alias("run_n"),
        F.sum(F.col("value").cast("decimal(38,6)"))
        .over(w)
        .cast("double")
        .alias("run_sum"),
    )


def streaming_running_totals_tws_ooo(
    spark: SparkSession,
    src_path: str,
    delay_ms: int,
    schema: str = "event_id long, user_id long, ts timestamp, value double",
) -> DataFrame:
    """OUT-OF-ORDER-tolerant running totals — the production composition
    :func:`streaming_running_totals_tws` documents but (before r11) did
    not register: its prefix exactness assumes event-time-ordered
    batches; here the source files are deliberately TIME-SHUFFLED and
    the processor buffers every event in LIST STATE until the watermark
    PROVES no earlier event can still arrive, then folds the proven
    prefix in event-time order. Output is identical to the ordered form
    (and to running_totals_replay) on any batch layout whose
    displacement the watermark delay covers — watermark + event-time
    timers, the exact fix named in the ordered entry's bounded-run
    caveat (VERDICT r10 item 3).

    Mechanics per key:
    - ``handleInputRows`` quantizes values to guarded-exact integer
      micro-units (the RunningTotals discipline) and APPENDS
      (ts_us, event_id, micro) to a RocksDB ListState buffer — no
      folding yet;
    - ``_drain`` (run on every input batch AND every fired timer) emits
      the buffered rows with ts < watermark — Spark guarantees every
      future surviving row has event time >= the current watermark, so
      that prefix is complete — sorted by (ts, event_id), folded onto
      the exact (n, micro) ValueState, one IEEE division per emission;
    - whatever stays buffered re-registers an event-time timer at
      (earliest buffered ms)+1 — the classic earliest-element timer, so
      the drain resumes as soon as the watermark crosses the oldest
      pending event, even if the key never receives input again.

    Rows with ``event_id < 0`` are WATERMARK PUNCTUATION, not data: a
    bounded out-of-order stream ends with up to ``delay_ms`` of events
    still unprovable (final watermark = stream max - delay), so the
    layout rides sentinel rows with far-future timestamps in the FINAL
    batch, pushing the closing watermark past every real event — Flink's
    end-of-bounded-input MAX_WATERMARK semantics, which Spark's
    availableNow finalization does not provide on its own. (r13: the
    sentinels previously shipped as their own extra micro-batch file;
    the watermark is computed AFTER a batch either way, so carrying them
    in the last data batch produces the identical drain one batch
    sooner.) Sentinels are dropped before buffering and never appear in
    the output.

    State per key is O(events within the delay window), not O(stream) —
    the buffer holds only rows the watermark has not yet proven, the
    same bound every watermarked stateful operator carries at 100 TB."""
    _require_tws(spark)
    import numpy as np

    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    class OooTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._h = handle
            self._buf = handle.getListState(
                "buf", "ts_us BIGINT, event_id BIGINT, micro BIGINT"
            )
            self._totals = handle.getValueState(
                "totals", "n BIGINT, micro BIGINT"
            )

        def _drain(self, key, wm_ms):
            if not self._buf.exists():
                return None
            rows = [tuple(r) for r in self._buf.get()]
            if not rows:
                return None
            cut_us = max(int(wm_ms or 0), 0) * 1000
            emit = sorted(r for r in rows if r[0] < cut_us)
            keep = [r for r in rows if r[0] >= cut_us]
            if keep:
                if emit:
                    self._buf.put(keep)
                # earliest-element timer: resume the moment the
                # watermark crosses the oldest pending event
                self._h.registerTimer(min(r[0] for r in keep) // 1000 + 1)
            elif emit:
                self._buf.clear()
            if not emit:
                return None
            prev = self._totals.get() if self._totals.exists() else None
            n0, m0 = (0, 0) if prev is None else (int(prev[0]), int(prev[1]))
            micros = np.array([r[2] for r in emit], dtype="int64")
            run_micro = m0 + np.cumsum(micros)
            self._totals.update((n0 + len(emit), int(run_micro[-1])))
            return pd.DataFrame(
                {
                    "user_id": [key[0]] * len(emit),
                    "ts": pd.to_datetime([r[0] for r in emit], unit="us"),
                    "event_id": [r[1] for r in emit],
                    "run_n": n0 + np.arange(1, len(emit) + 1, dtype="int64"),
                    "run_sum": run_micro / 1e6,
                }
            )

        def handleInputRows(self, key, rows, timerValues):
            pdfs = [p for p in rows if len(p)]
            if pdfs:
                pdf = pd.concat(pdfs)
                pdf = pdf[pdf["event_id"] >= 0]  # drop sentinel punctuation
                if len(pdf):
                    vals = pdf["value"].to_numpy(dtype="float64")
                    micros = np.round(vals * 1e6).astype("int64")
                    if not np.array_equal(micros / 1e6, vals):
                        bad = vals[micros / 1e6 != vals][:3]
                        raise ValueError(
                            "streaming_running_totals_tws_ooo: value(s) "
                            "not exactly representable at 6 decimals "
                            f"(e.g. {bad.tolist()}); widen the state "
                            "scale or pre-round upstream."
                        )
                    ts_us = (pdf["ts"].astype("int64") // 1000).to_list()
                    self._buf.appendList(
                        list(
                            zip(
                                ts_us,
                                pdf["event_id"].to_list(),
                                micros.tolist(),
                            )
                        )
                    )
            out = self._drain(key, timerValues.getCurrentWatermarkInMs())
            if out is not None:
                yield out

        def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
            # no stale-timer filter needed: _drain is idempotent (emits
            # only what the CURRENT watermark proves; a stale expiry just
            # drains nothing new)
            out = self._drain(key, timerValues.getCurrentWatermarkInMs())
            if out is not None:
                yield out

        def close(self) -> None:
            pass

    raw = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_path)
        .withWatermark("ts", f"{delay_ms} milliseconds")
    )
    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        updates = raw.groupBy("user_id").transformWithStateInPandas(
            statefulProcessor=OooTotals(),
            outputStructType=(
                "user_id bigint, ts timestamp, event_id bigint, "
                "run_n bigint, run_sum double"
            ),
            outputMode="append",
            timeMode="eventTime",
        )
        return run_to_memory(
            updates,
            "append",
            "stream_tws_ooo",
            bounded_source_state_partitions(src_path),
        )
    finally:
        if prev is not None:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)
        else:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")


def streaming_distinct_types_tws(
    spark: SparkSession,
    src_path: str,
    schema: str = "event_id long, user_id long, ts timestamp, event_type string",
) -> DataFrame:
    """Per-key exact DISTINCT tracking with State API v2 MAP STATE — the
    third TWS primitive after value state (streaming_running_totals_tws)
    and event-time timers (streaming_gap_close_tws): each key holds a
    RocksDB-backed map ``event_type -> count`` that is point-read and
    point-written per batch (``getValue``/``updateValue`` — never
    materializing the whole map to update one entry, which is MapState's
    reason to exist over a ValueState holding a dict), plus a ValueState
    row counter. After each batch the key emits its cumulative
    (n_types, n_events); with update-style emissions the final state per
    key is the max-n_events row (the streaming_user_totals convention).

    State per key is O(|distinct types seen|) — bounded by the type
    vocabulary, not the stream length; the batch-boundary iteration cost
    is one map scan per (key, batch) to count keys. NULL types are
    skipped (COUNT DISTINCT semantics); rows still count toward
    n_events. ``src_path``: directory of parquet files, one micro-batch
    each (maxFilesPerTrigger=1)."""
    _require_tws(spark)
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    class DistinctTypes(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._types = handle.getMapState("types", "t STRING", "c BIGINT")
            self._n = handle.getValueState("n", "n BIGINT")

        def handleInputRows(self, key, rows, timerValues):
            n_new = 0
            batch_counts: dict[str, int] = {}
            for pdf in rows:
                if not len(pdf):
                    continue
                n_new += int(len(pdf))
                # value_counts drops nulls: COUNT(DISTINCT) semantics
                for t, c in pdf["event_type"].value_counts().items():
                    batch_counts[t] = batch_counts.get(t, 0) + int(c)
            if not n_new:
                return
            for t, c in batch_counts.items():
                cur = self._types.getValue((t,))
                self._types.updateValue(
                    (t,), ((0 if cur is None else int(cur[0])) + c,)
                )
            prev = self._n.get()
            n = (0 if prev is None else int(prev[0])) + n_new
            self._n.update((n,))
            n_types = sum(1 for _ in self._types.keys())
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_types": [n_types],
                    "n_events": [n],
                }
            )

        def close(self) -> None:
            pass

    raw = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_path)
    )
    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        updates = raw.groupBy("user_id").transformWithStateInPandas(
            statefulProcessor=DistinctTypes(),
            outputStructType="user_id bigint, n_types bigint, n_events bigint",
            outputMode="append",
            timeMode="none",
        )
        out = run_to_memory(
            updates,
            "append",
            "stream_distinct_state",
            bounded_source_state_partitions(src_path),
        )
    finally:
        if prev is not None:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)
        else:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    # one emission per (key, batch); the cumulative counters make the
    # final state the max-n_events row per key (update-mode convention)
    return (
        out.groupBy("user_id")
        .agg(
            F.max_by(
                F.struct("n_types", "n_events"), F.col("n_events")
            ).alias("s")
        )
        .select(
            "user_id",
            F.col("s.n_types").alias("n_types"),
            F.col("s.n_events").alias("n_events"),
        )
    )


def streaming_recent_k_tws(
    spark: SparkSession,
    src_path: str,
    k: int = 5,
    schema: str = "event_id long, user_id long, ts timestamp, value double",
) -> DataFrame:
    """Per-key LAST-K buffer with State API v2 LIST STATE — the fourth and
    final TWS state primitive (after value state, event-time timers, and
    map state): each key keeps the ``k`` most recent (ts, event_id,
    value) rows in a RocksDB-backed list, TRIMMED on every write, and
    after each batch emits the exact-decimal sum over the buffer — the
    "recent activity" feature every monitoring/feature-store pipeline
    derives per series.

    The buffer is a max-k selection under the total order (ts,
    event_id), so the FINAL state is order-insensitive across
    micro-batches (merging then trimming commutes) — stronger than the
    prefix operators' ordered-batch assumption, and exactly what the
    batch oracle (last k rows per key) recomputes. State per key is
    O(k) regardless of stream length; values ride as shortest-repr
    strings so the decimal sum is exact. Emissions carry the key's total
    seen-row count so the final (max seen_events) row per key is
    selectable downstream (the update-mode convention)."""
    _require_tws(spark)
    from decimal import Decimal

    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    class RecentK(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._recent = handle.getListState(
                "recent", "ts_us BIGINT, eid BIGINT, v STRING"
            )
            self._n = handle.getValueState("n", "n BIGINT")

        def handleInputRows(self, key, rows, timerValues):
            # per-chunk top-k in pandas BEFORE crossing to Python tuples
            # (r12 self-review): only O(k) rows per chunk pay the
            # pandas->Python boundary, not the whole micro-batch — any
            # row in the global top-k is in its own chunk's top-k, so
            # nothing is lost
            fresh: list[tuple] = []
            n_new = 0
            for pdf in rows:
                if not len(pdf):
                    continue
                n_new += len(pdf)
                top = pdf.assign(
                    __ts_us=pdf["ts"].astype("int64") // 1000
                ).sort_values(
                    ["__ts_us", "event_id"], ascending=False
                ).head(k)
                for t, e, v in zip(
                    top["__ts_us"], top["event_id"], top["value"]
                ):
                    fresh.append((int(t), int(e), str(v)))
            if not fresh:
                return
            merged = list(self._recent.get()) + fresh
            merged.sort(key=lambda r: (int(r[0]), int(r[1])), reverse=True)
            kept = merged[:k]
            self._recent.put(kept)
            prev = self._n.get()
            n = (0 if prev is None else int(prev[0])) + n_new
            self._n.update((n,))
            s = sum((Decimal(r[2]) for r in kept), Decimal(0))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "seen_events": [n],
                    "n_recent": [len(kept)],
                    # one IEEE rounding of the exact decimal == the
                    # oracle's CAST(SUM(DECIMAL) AS DOUBLE)
                    "recent_sum": [float(s)],
                }
            )

        def close(self) -> None:
            pass

    raw = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_path)
    )
    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        updates = raw.groupBy("user_id").transformWithStateInPandas(
            statefulProcessor=RecentK(),
            outputStructType=(
                "user_id bigint, seen_events bigint, "
                "n_recent bigint, recent_sum double"
            ),
            outputMode="append",
            timeMode="none",
        )
        out = run_to_memory(
            updates,
            "append",
            "stream_list_state",
            bounded_source_state_partitions(src_path),
        )
    finally:
        if prev is not None:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)
        else:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    return (
        out.groupBy("user_id")
        .agg(
            F.max_by(
                F.struct("n_recent", "recent_sum"), F.col("seen_events")
            ).alias("s")
        )
        .select(
            "user_id",
            F.col("s.n_recent").alias("n_recent"),
            F.col("s.recent_sum").alias("recent_sum"),
        )
    )


def streaming_bootstrap_totals_tws(
    spark: SparkSession,
    src_path: str,
    init: DataFrame,
    schema: str = "event_id long, user_id long, ts timestamp, value double",
) -> DataFrame:
    """Warm-start streaming state from a BATCH table — State API v2's
    ``initialState`` hook, the production pattern the other TWS entries
    don't cover: migrating a monitor onto streaming infrastructure
    without replaying history (the reference's analogue: a fresh LTSS
    install pointed at a database that already holds years of states).

    ``init`` carries one row per key: (user_id, n BIGINT, s STRING) —
    the key's historical row count and EXACT-DECIMAL value sum as a
    string (the same representation the running-totals state uses, so
    batch-computed history and stream-folded increments are the same
    arithmetic). ``handleInitialState`` seeds each key's ValueState
    before its first input row; the stream then folds normally and each
    batch emits the key's cumulative (n_events, total). Keys present
    only in the initial state never receive input and therefore never
    emit — the caller's contract (and the oracle's WHERE clause) is
    "keys with at least one streamed row, totals over history + stream".

    At 100 TB the bootstrap is ONE batch aggregation shuffled by the
    same key as the stream — no history replay through the state
    store, state stays O(#keys)."""
    _require_tws(spark)
    from decimal import Decimal

    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    class BootstrapTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._totals = handle.getValueState("totals", "n BIGINT, s STRING")

        def handleInitialState(self, key, initialState, timerValues) -> None:
            # one initial-state row per key: (n, s) after the grouping key
            if hasattr(initialState, "iloc"):  # pandas row/frame form
                n = int(initialState["n"].iloc[0])
                s = str(initialState["s"].iloc[0])
            else:  # pyspark Row form
                n, s = int(initialState["n"]), str(initialState["s"])
            self._totals.update((n, s))

        def handleInputRows(self, key, rows, timerValues):
            import numpy as np

            pdfs = [p for p in rows if len(p)]
            if not pdfs:
                return
            pdf = pd.concat(pdfs)
            if self._totals.exists():
                n, s = self._totals.get()
                run_sum = Decimal(s)
            else:
                n, run_sum = 0, Decimal(0)
            n += int(len(pdf))
            # vectorized exact fold: quantize to int64 micro-units (guarded
            # exact — the RunningTotals discipline), ONE numpy sum, and a
            # single Decimal add against the carried state
            vals = pdf["value"].to_numpy(dtype="float64")
            micros = np.round(vals * 1e6).astype("int64")
            if not np.array_equal(micros / 1e6, vals):
                bad = vals[micros / 1e6 != vals][:3]
                raise ValueError(
                    "streaming_bootstrap_totals_tws: value(s) not exactly "
                    f"representable at 6 decimals (e.g. {bad.tolist()})"
                )
            run_sum += Decimal(int(micros.sum())) / Decimal(1_000_000)
            self._totals.update((n, str(run_sum)))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "total": [float(run_sum)],
                }
            )

        def close(self) -> None:
            pass

    raw = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_path)
    )
    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        updates = raw.groupBy("user_id").transformWithStateInPandas(
            statefulProcessor=BootstrapTotals(),
            outputStructType="user_id bigint, n_events bigint, total double",
            outputMode="append",
            timeMode="none",
            initialState=init.groupBy("user_id"),
        )
        out = run_to_memory(
            updates,
            "append",
            "stream_state_bootstrap",
            bounded_source_state_partitions(src_path),
        )
    finally:
        if prev is not None:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)
        else:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    return (
        out.groupBy("user_id")
        .agg(
            F.max_by(F.struct("n_events", "total"), F.col("n_events")).alias(
                "s"
            )
        )
        .select(
            "user_id",
            F.col("s.n_events").alias("n_events"),
            F.col("s.total").alias("total"),
        )
    )


def bootstrap_history_state(events: DataFrame) -> DataFrame:
    """The batch half of the bootstrap: per-key (n, exact-decimal sum as
    STRING) over the historical slice — the exact representation
    streaming_bootstrap_totals_tws seeds its ValueState with. The sum
    stays DECIMAL end-to-end (cast to string, never through a double),
    so history + stream is one exact decimal fold split in two."""
    return events.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col("value").cast("decimal(38,6)")).cast("string").alias("s"),
    )


def bootstrap_totals_replay(
    events: DataFrame, cut1_us: int
) -> DataFrame:
    """Batch replay of the bootstrap entry's final state: totals over ALL
    events for every key with at least one event at/after ``cut1_us``
    (keys whose activity ended inside the historical slice never stream
    a row, so they never emit)."""
    us = F.unix_micros(F.col("ts"))
    streamed_keys = (
        events.filter(us >= F.lit(cut1_us)).select("user_id").distinct()
    )
    return (
        events.join(streamed_keys, "user_id", "semi")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum(F.col("value").cast("decimal(38,6)"))
            .cast("double")
            .alias("total"),
        )
    )


def recent_k_replay(events: DataFrame, k: int = 5) -> DataFrame:
    """Batch replay of :func:`streaming_recent_k_tws`'s final state: the
    last ``k`` events per key under (ts, event_id) descending, summed
    exactly (DECIMAL) and cast to double once. The rank-filter window
    is per-key (WindowGroupLimit pre-truncates map-side) — the stream's
    O(k)-state advantage is that it never rescans history to refresh
    the feature."""
    from pyspark.sql import Window as W

    w = W.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        events.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_recent"),
            F.sum(F.col("value").cast("decimal(38,6)"))
            .cast("double")
            .alias("recent_sum"),
        )
    )


def distinct_types_replay(events: DataFrame) -> DataFrame:
    """Batch replay of :func:`streaming_distinct_types_tws`'s final state:
    exact per-key distinct-type and row counts. COUNT(DISTINCT) here is
    the two-phase skew-safe form is NOT needed — the driver fixture's
    type vocabulary is tiny — but the streaming operator's map state is
    precisely what makes the same computation incremental at 100 TB
    (the batch form rescans the corpus; the stream pays O(batch))."""
    return events.groupBy("user_id").agg(
        F.countDistinct("event_type").cast("long").alias("n_types"),
        F.count(F.lit(1)).cast("long").alias("n_events"),
    )


def streaming_gap_close_tws(
    spark: SparkSession,
    src_path: str,
    gap_ms: int,
    schema: str = "event_id long, user_id long, ts timestamp, value double",
) -> DataFrame:
    """Per-series SILENCE detection with State API v2 EVENT-TIME TIMERS —
    the reference's own domain need (a sensor that stops reporting): when
    no event for a series arrives within ``gap_ms`` of its last one (in
    event time, proven by the watermark), emit one
    (user_id, last_ms, closed_at_ms) row.

    This is the timer half of ``transformWithStateInPandas`` (the state
    half is :func:`streaming_running_totals_tws`): ``handleInputRows``
    advances a per-key last-seen ValueState and registers a timer at
    last+gap; ``handleExpiredTimer`` emits ONLY when the expiry still
    equals last+gap — a newer event processed before the timer fired
    (input is processed before timers within a batch) makes the old
    timer stale, and stale timers are filtered by that equality instead
    of bookkeeping deleteTimer calls.

    Emission contract (what the pytest pins): every emitted close is a
    TRUE gap (no event for the key inside (last, last+gap]), and every
    key whose FINAL event satisfies last+gap <= max event time across
    the stream is deterministically closed (the availableNow
    finalization batch advances the watermark to the stream max, firing
    those timers). Interior gaps additionally close when the watermark
    happens to cross them before the key's next event arrives — correct
    but batch-layout-dependent, hence pinned as a subset property.

    ``src_path`` is a directory of parquet files read with
    maxFilesPerTrigger=1 (each file = one micro-batch) and a 0-second
    watermark on ts."""
    _require_tws(spark)
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    class GapClose(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._h = handle
            self._last = handle.getValueState("last", "last_ms long")

        def handleInputRows(self, key, rows, timerValues):
            mx = None
            for pdf in rows:
                if len(pdf):
                    m = int(pdf["ts"].astype("int64").max() // 1_000_000)
                    mx = m if mx is None else max(mx, m)
            if mx is None:
                return iter([])
            prev = self._last.get()
            last = mx if prev is None else max(mx, int(prev[0]))
            self._last.update((last,))
            self._h.registerTimer(last + gap_ms)
            return iter([])

        def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
            exp = expiredTimerInfo.getExpiryTimeInMs()
            cur = self._last.get()
            # stale-timer filter: a newer event re-registered at a later
            # expiry; only the timer matching the live state may close
            if cur is not None and int(cur[0]) + gap_ms == exp:
                yield pd.DataFrame(
                    {
                        "user_id": [key[0]],
                        "last_ms": [int(cur[0])],
                        "closed_at_ms": [exp],
                    }
                )

        def close(self) -> None:
            pass

    raw = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_path)
        .withWatermark("ts", "0 seconds")
    )
    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        closes = raw.groupBy("user_id").transformWithStateInPandas(
            statefulProcessor=GapClose(),
            outputStructType="user_id bigint, last_ms bigint, closed_at_ms bigint",
            outputMode="append",
            timeMode="eventTime",
        )
        return run_to_memory(
            closes,
            "append",
            "stream_gap_close",
            bounded_source_state_partitions(src_path),
        )
    finally:
        if prev is not None:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)
        else:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")


def gap_close_replay(
    events: DataFrame, cut1_us: int, cut2_us: int, gap_ms: int
) -> DataFrame:
    """Batch replay of :func:`streaming_gap_close_tws`'s EXACT timer
    semantics for a 3-batch time-split stream — the empirically pinned
    rules (tests/test_streaming.py boundary probes):

    - one timer per (key, batch) at ``floor(max_us/1000) + gap_ms`` (the
      fold registers on the batch's cumulative per-key max);
    - the watermark before batch j is ``floor(global max_us through
      batch j-1 / 1000)`` (0-second delay, ms FLOOR — probed);
    - a timer fires in the first batch j with ``expiry <= watermark``
      (``<=`` — probed with an exact-equality case), where input is
      processed BEFORE timers, so it emits only if the key has no event
      in batches (b, j]; the availableNow finalization batch runs with
      the stream-max watermark and fires the final timers.

    Collapsed per candidate (u, b) with next-batch-of-u = m: emit iff
    m is NULL and global watermark >= expiry, else iff m >= b+2 and
    W(m-2) >= expiry. Pure DataFrame ops — this is what the registry
    oracle checks and what the driver runs when the State API v2 runtime
    is not worker-visible in its JVM (capability-gated, the Kafka-entry
    precedent); with the runtime available the REAL timer stream runs
    and a pytest pins stream == replay."""
    us = F.unix_micros(F.col("ts"))
    b = events.select(
        "user_id",
        us.alias("us"),
        F.when(us < F.lit(cut1_us), F.lit(0))
        .when(us < F.lit(cut2_us), F.lit(1))
        .otherwise(F.lit(2))
        .alias("batch"),
    )
    from pyspark.sql import Window as W

    # ms floors via integer DIV (double division could round a near-integer
    # quotient UP across the floor at 1e15-scale micros)
    bstat = (
        b.groupBy("batch")
        .agg(F.max("us").alias("__mx"))
        .select("batch", F.expr("__mx div 1000").alias("bmax_ms"))
        .select(
            "batch",
            F.max("bmax_ms")
            .over(W.orderBy("batch").rowsBetween(W.unboundedPreceding, 0))
            .alias("w"),
        )
    )
    cand = (
        b.groupBy("user_id", "batch")
        .agg(F.max("us").alias("__mx"))
        .select("user_id", "batch", F.expr("__mx div 1000").alias("last_ms"))
        .select(
            "user_id",
            "batch",
            "last_ms",
            F.lead("batch")
            .over(W.partitionBy("user_id").orderBy("batch"))
            .alias("m"),
        )
    )
    wmax = bstat.agg(F.max("w").alias("wmax"))
    fired = (
        cand.crossJoin(F.broadcast(wmax))
        .join(
            F.broadcast(bstat.select(F.col("batch").alias("__wb"), "w")),
            F.col("__wb") == F.col("m") - 2,
            "left",
        )
        .filter(
            F.when(
                F.col("m").isNull(),
                F.col("wmax") >= F.col("last_ms") + F.lit(gap_ms),
            ).otherwise(
                (F.col("m") >= F.col("batch") + 2)
                & (F.col("w") >= F.col("last_ms") + F.lit(gap_ms))
            )
        )
    )
    return fired.select(
        "user_id",
        "last_ms",
        (F.col("last_ms") + F.lit(gap_ms)).alias("closed_at_ms"),
    )


_CUSUM_OUT = (
    "event_id bigint, user_id bigint, x double, "
    "s_pos double, s_neg double, is_change boolean"
)
_CUSUM_STATE = "sp bigint, sn bigint, last_ns bigint, last_eid bigint"


def _make_cusum_fn(limits: dict):
    """Build the per-key CUSUM fold over broadcast control limits.

    ``limits``: {user_id: (mu, sigma, thr_micro)} — trained offline (the
    SPC posture: control limits come from a reference period, the monitor
    just folds). State per key is FOUR LONGs: the reflected walk values
    in micro-units plus the last-folded (ts-nanos, event_id) — O(#series)
    total, the bounded-state discipline.

    Within a batch the rows sort by (ts, event_id) and the recursion runs
    via the same reflection identity as the batch operator: with the
    carried state s0 as the walk's starting level, s_i = c_i - min(0,
    prefix-min(c)) where c = s0 + cumsum(y). Vectorized numpy — no
    per-row Python loop.

    ORDER GUARD (ADVICE r8): a CUSUM walk is a recursion over event-time
    order, so a micro-batch whose first row is at-or-before the
    last-folded (ts, event_id) would silently produce a wrong walk if
    folded. The state carries that high-water mark and the fold FAILS
    LOUDLY on regression — wrong monitoring values must never be emitted
    silently. Production deployments that cannot guarantee per-key
    ordered arrival (the registered entry's time-ordered file split
    does) should sort upstream by watermark + event-time timers."""
    import numpy as np

    _SENTINEL = -(1 << 62)  # below any real (ts-nanos, event_id)

    def fold(key, pdfs, state):
        user = key[0]
        if user not in limits:
            # fail LOUDLY (the same discipline as the order guard): a
            # series with no trained control limits folded with
            # (mu=0, sigma=0, thr=0) would flag essentially every event —
            # silently wrong SPC output (r12 self-review)
            raise ValueError(
                f"streaming_cusum: no trained control limits for series "
                f"{user!r}; train limits for every monitored series (or "
                "filter the stream to the trained set) — folding with "
                "zeros would emit garbage monitoring values."
            )
        mu, sigma, thr = limits[user]
        sp0, sn0, last_ns, last_eid = (
            state.get if state.exists else (0, 0, _SENTINEL, _SENTINEL)
        )
        # ONE concat+sort across ALL Arrow chunks: a key whose micro-batch
        # exceeds arrow.maxRecordsPerBatch arrives as several chunks in
        # arbitrary post-shuffle order, so sorting each chunk
        # independently would trip the order guard on perfectly valid
        # input (r12 self-review; RunningTotals set the pattern)
        frames = [p for p in pdfs if len(p)]
        if not frames:
            state.update((sp0, sn0, last_ns, last_eid))
            return
        pdf = (
            pd.concat(frames, ignore_index=True) if len(frames) > 1 else frames[0]
        )
        pdf = pdf.sort_values(["ts", "event_id"]).reset_index(drop=True)
        first_ns = int(pdf["ts"].astype("int64").iloc[0])
        first_eid = int(pdf["event_id"].iloc[0])
        if (first_ns, first_eid) <= (last_ns, last_eid):
            raise ValueError(
                f"streaming_cusum: out-of-order batch for key {user}: "
                f"first row (ts_ns={first_ns}, event_id={first_eid}) is "
                f"at-or-before the last folded row (ts_ns={last_ns}, "
                f"event_id={last_eid}); folding it would corrupt the "
                "walk. Deliver per-key batches in event-time order "
                "(sort upstream by watermark) or rebuild state."
            )
        last_ns = int(pdf["ts"].astype("int64").iloc[-1])
        last_eid = int(pdf["event_id"].iloc[-1])
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
        state.update((int(sp[-1]), int(sn[-1]), last_ns, last_eid))
        yield pd.DataFrame(
            {
                "event_id": pdf["event_id"],
                "user_id": user,
                "x": x,
                "s_pos": np.round(sp / 1e6, 6),
                "s_neg": np.round(sn / 1e6, 6),
                "is_change": (sp > thr) | (sn > thr),
            }
        )

    return fold


def streaming_cusum(
    raw: DataFrame, limits: dict, state_partitions: int | None = None
) -> DataFrame:
    """Per-event CUSUM monitoring as a STREAM: the batch operator's
    reflected-walk arithmetic (operators/timeseries.cusum_changepoints)
    carried across micro-batches in four longs of state per series (walk
    values + the last-folded (ts, event_id) high-water mark).
    ``raw`` is a STREAMING frame with (event_id, user_id, ts, value); the
    caller supplies trained control limits (the SPC posture — limits come
    from a reference period, the monitor folds). With micro-batches
    arriving in event-time order per key (the registered entry splits the
    source into time-ordered files), the emitted rows are bit-equal to
    the batch computation — exactly what the entry's oracle checks. A
    batch arriving BEHIND the per-key high-water mark fails the query
    loudly instead of silently folding a wrong walk (ADVICE r8)."""
    raw = raw.filter(F.col("value").isNotNull())
    updates = raw.groupBy("user_id").applyInPandasWithState(
        _make_cusum_fn(limits),
        outputStructType=_CUSUM_OUT,
        stateStructType=_CUSUM_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    return run_to_memory(updates, "append", "stream_cusum", state_partitions)
