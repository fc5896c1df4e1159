"""Fast parity loop: run every registry query against the DuckDB oracle.

Usage: python scripts/check_parity.py [sf_dir] [name ...]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    import ltss_spark.plans as plans
    from ltss_spark.plans.parity import compare
    from ltss_spark.session import get_spark

    spark = get_spark("parity", shuffle_partitions=8)
    n_ok = n_bad = 0
    for q in plans.REGISTRY:
        if only and q.name not in only:
            continue
        t0 = time.time()
        try:
            df = q.build(spark, sf_dir)
            if q.oracle is None:
                n = df.count()
                print(f"  SKIP(rows-only) {q.name}: {n} rows [{time.time()-t0:.1f}s]")
                continue
            ok, msg = compare(df, q.oracle, sf_dir)
        except Exception as e:  # noqa: BLE001
            ok, msg = False, f"EXCEPTION {type(e).__name__}: {e}"
        status = "OK  " if ok else "FAIL"
        if ok:
            n_ok += 1
        else:
            n_bad += 1
        print(f"  {status} {q.name}: {msg} [{time.time()-t0:.1f}s]")
    print(f"\n{n_ok} ok, {n_bad} failed")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
