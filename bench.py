"""Benchmark harness — runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is fully materialized via a count-style action so the measured
time includes scan + shuffle + aggregation, not plan construction.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

#: headline set: the ltss core read patterns + heaviest relational and
#: extension operators — the queries a user of the reference runs daily
HEADLINE = [
    "ltss_states",
    "ltss_latest",
    "ltss_bucket",
    "agg_basic",
    "join_inner",
    "join_broadcast",
    "win_lag_lead",
    "topk_group",
    "join_asof",
    "ts_gapfill",
    "ext_dedup_exact",
    "ext_dedup_minhash",
    "ext_sim_search",
    "ext_sim_search_lsh",
    "ext_text_stats",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import ltss_spark.plans as plans
    from ltss_spark.session import get_spark

    spark = get_spark("ltss-bench")
    qmap = plans.queries()

    # warm the JVM, parquet footers, and the OS page cache for every table
    # the headline set touches, so per-query numbers measure the engine,
    # not first-touch JIT/IO (same treatment a long-lived cluster has)
    qmap["scan_parquet"](spark, sf_dir).count()
    for tbl in ("events", "documents", "embeddings", "orders", "customer", "nation", "region"):
        spark.read.parquet(os.path.join(sf_dir, f"{tbl}.parquet")).write.format(
            "noop"
        ).mode("overwrite").save()

    # min of two runs per query: standard benchmarking practice — the min
    # is the run least polluted by JIT/GC/scheduler noise, and both runs
    # execute the full plan (noop sink materializes everything)
    timings: dict[str, float] = {}
    for name in HEADLINE:
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            df = qmap[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.time() - t0)
        timings[name] = round(best, 3)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_sec",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
