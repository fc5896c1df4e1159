"""Time every stateful-streaming registry entry at a given SF (build+collect),
to find where the family's parity-sweep time goes. Usage:
    python scripts/profile_stream_family.py [sf_dir] [name ...]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FAMILY = [
    "stream_stateful",
    "stream_changepoint",
    "stream_gap_close",
    "stream_tws_totals",
    "stream_tws_ooo",
    "stream_distinct_state",
    "stream_list_state",
    "stream_state_bootstrap",
    "stream_window_tumbling",
    "stream_window_sliding",
    "stream_window_session",
    "stream_dedup",
    "stream_late_drop",
    "stream_join",
]


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = sys.argv[2:] or FAMILY

    import ltss_spark.plans as plans
    from ltss_spark.session import get_spark

    spark = get_spark("profile_stream", shuffle_partitions=8)
    byname = {q.name: q for q in plans.REGISTRY}
    total = 0.0
    for name in only:
        q = byname[name]
        t0 = time.time()
        df = q.build(spark, sf_dir)
        t1 = time.time()
        n = df.count()
        t2 = time.time()
        total += t2 - t0
        print(
            f"{name}: build={t1-t0:.2f}s collect={t2-t1:.2f}s "
            f"total={t2-t0:.2f}s rows={n}",
            flush=True,
        )
    print(f"FAMILY TOTAL {total:.2f}s")


if __name__ == "__main__":
    main()
