"""Time EVERY registered operator at $SPARK_GRAFT_SF_DIR (default sf0.1),
Spark side only (no oracle) — the wide complement to bench.py's stable
headline set. Prints one JSON line: {"total_sec": ..., "ops": {...}}."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    # window evidence, sampled BEFORE Spark's 32 threads start AND again
    # at the end: the r11 sweeps showed a 1-min pre-load of 0.07 can hide
    # a 5-min average of 4+ and a mid-run noisy-neighbor burst — record
    # all three so a sweep number carries its own comparability caveat
    try:
        load1_pre, load5_pre, _ = (round(v, 2) for v in os.getloadavg())
    except OSError:
        load1_pre = load5_pre = -1.0
    import ltss_spark.plans as plans
    from ltss_spark.session import get_spark

    spark = get_spark("ltss-bench-all")
    plans.queries()["scan_parquet"](spark, sf_dir).count()  # JVM warm-up

    ops: dict[str, float] = {}
    for q in plans.REGISTRY:
        t0 = time.time()
        q.build(spark, sf_dir).write.format("noop").mode("overwrite").save()
        ops[q.name] = round(time.time() - t0, 3)
    print(
        json.dumps(
            {
                "total_sec": round(sum(ops.values()), 3),
                "n_ops": len(ops),
                "load_1m_pre": load1_pre,
                "load_5m_pre": load5_pre,
                "ops": ops,
            }
        )
    )


if __name__ == "__main__":
    main()
