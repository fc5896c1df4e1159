"""Per-query profiling: split CONSTRUCTION time (driver-side actions:
pre-flights, checkpoint materialization, iterative rounds) from EXECUTION
time (the noop sink of the returned frame). Also prints a second exec run
(warm) so fixed plan/scheduling overhead is visible.

Usage: python scripts/profile_headline.py [query ...]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE  # noqa: E402


def main() -> None:
    names = sys.argv[1:] or HEADLINE
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import ltss_spark.plans as plans
    from ltss_spark.session import get_spark

    spark = get_spark("ltss-profile")
    qmap = plans.queries()
    # same warmup as bench.py (import its table list so they cannot drift)
    from bench import main as _  # noqa: F401  (module already imported)
    import bench as _bench
    import inspect

    qmap["scan_parquet"](spark, sf_dir).count()
    warm_tables = (
        "events", "documents", "embeddings", "orders", "customer",
        "nation", "region", "lineitem", "part", "supplier",
    )
    assert all(t in inspect.getsource(_bench.main) for t in warm_tables)
    for tbl in warm_tables:
        spark.read.parquet(os.path.join(sf_dir, f"{tbl}.parquet")).write.format(
            "noop").mode("overwrite").save()
    print(f"{'query':28s} {'build1':>7s} {'exec1':>7s} {'build2':>7s} "
          f"{'exec2':>7s} {'total2':>7s}")
    for name in names:
        rows = []
        for _ in range(2):
            t0 = time.time()
            spark.sparkContext.setJobDescription(f"{name}: build")
            df = qmap[name](spark, sf_dir)
            t1 = time.time()
            spark.sparkContext.setJobDescription(f"{name}: exec")
            df.write.format("noop").mode("overwrite").save()
            t2 = time.time()
            rows.append((t1 - t0, t2 - t1))
        spark.sparkContext.setJobDescription(None)
        (b1, e1), (b2, e2) = rows
        print(f"{name:28s} {b1:7.3f} {e1:7.3f} {b2:7.3f} {e2:7.3f} "
              f"{b2 + e2:7.3f}")


if __name__ == "__main__":
    main()
