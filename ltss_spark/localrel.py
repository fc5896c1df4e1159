"""Driver-rows -> DataFrame as a pure-JVM LocalTableScan.

``spark.createDataFrame(list_of_rows)`` plans as ``Scan ExistingRDD`` over
a pickled Python RDD: EVERY downstream action re-spawns Python workers to
unpickle the rows (~0.3 s per action at local[32], measured r12 — the
cagg schema-sidecar comment records the same cost independently). Routing
the same rows through a pandas frame with Arrow enabled plans as
``LocalTableScan``: the data lives in the JVM, actions touch no Python
worker, and joins against it see a LocalRelation with real stats.

Used by every adaptive driver-replay path (union-find components,
pagerank/LPA/BFS replays, the BPE driver fold, logreg traces, the
distributed-rank offset frame) — the frames those paths return are then
consumed by ordinary cluster-side plans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def local_frame(spark: SparkSession, rows, schema) -> DataFrame:
    """Build a DataFrame from driver-side ``rows`` (tuples or Rows) that
    plans as a LocalTableScan. ``schema`` is a StructType or DDL string.
    Values are carried through an object-dtype pandas frame so integers
    stay exact and None stays NULL; the Arrow conversion applies the
    explicit schema (verified value-identical to the list route, r12).
    Falls back to the classic list route only if Arrow conversion is
    unavailable (createDataFrame's own documented fallback)."""
    if isinstance(schema, str):
        schema = T.StructType.fromDDL(schema)
    rows = list(rows)
    if not rows:
        return spark.createDataFrame([], schema)
    # the LocalTableScan plan depends on the Arrow conversion path; a
    # session built outside ltss_spark.session (scripts, embedders) may
    # not have it enabled, silently regressing every driver-replay frame
    # to the pickled-RDD scan this module exists to avoid (ADVICE r12).
    # The conversion happens eagerly inside createDataFrame, so the conf
    # is SCOPED to this call and restored — a host that deliberately
    # disabled Arrow keeps its setting for its own frames (r13
    # self-review).
    import pandas as pd

    key = "spark.sql.execution.arrow.pyspark.enabled"
    prev = spark.conf.get(key, None)
    spark.conf.set(key, "true")
    try:
        pdf = pd.DataFrame(rows, columns=schema.fieldNames(), dtype=object)
        return spark.createDataFrame(pdf, schema)
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)
