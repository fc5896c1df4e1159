"""Interleaved A/B: cosine_topk with the r12 nullif zero-norm guard vs
the pre-r12 raw sqrt norm (VERDICT r12 item 1 — receipt the ext_sim_search
0.76x regression). Run: python scripts/ab_simsearch_nullif.py [sf_dir]."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F

from ltss_spark.session import get_spark
from ltss_spark.sources.batch import load_table
import ltss_spark.operators.similarity as S


def _norm_raw(a):
    """The pre-775181a norm: sqrt of the squared fold, no nullif."""
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double"))
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("ab-simsearch-nullif")
    spark.sparkContext.setLogLevel("ERROR")
    emb = load_table(spark, sf_dir, "embeddings")
    print("embeddings rows:", emb.count())

    def run(tag: str) -> float:
        q = S.cosine_topk(emb, emb.filter(F.col("vec_id") < 3), k=5)
        spark.sparkContext.setJobDescription(f"simsearch {tag}")
        t0 = time.time()
        q.write.format("noop").mode("overwrite").save()
        return time.time() - t0

    # warm both paths once
    orig = S._norm
    for _ in range(1):
        run("warm-nullif")
        S._norm = _norm_raw
        run("warm-raw")
        S._norm = orig

    a_times, b_times = [], []
    for i in range(6):
        S._norm = orig
        a_times.append(run(f"A-nullif-{i}"))
        S._norm = _norm_raw
        b_times.append(run(f"B-raw-{i}"))
    S._norm = orig
    print("A (nullif) times:", [round(t, 3) for t in a_times], "min", round(min(a_times), 3))
    print("B (raw)    times:", [round(t, 3) for t in b_times], "min", round(min(b_times), 3))


if __name__ == "__main__":
    main()
