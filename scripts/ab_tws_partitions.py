"""Interleaved A/B: state/shuffle partition count for the TWS stream run.
Each micro-batch is ONE coalesced file; the stateful stage fans out to
spark.sql.shuffle.partitions tasks + that many RocksDB instances per batch.
Variants: 8 (sweep default), 4, 2, 1. Fresh checkpoint per run; results
compared with exceptAll."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 4

import pyspark.sql.functions as F  # noqa: E402

from ltss_spark.scratch import scratch_dir  # noqa: E402
from ltss_spark.session import get_spark  # noqa: E402
from ltss_spark.sources.batch import load_table  # noqa: E402
from ltss_spark.streaming.stateful import _require_tws, _run_totals_stream  # noqa: E402

spark = get_spark("ab_twsp", shuffle_partitions=8)
_require_tws(spark)

e = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts", "value")
us = F.unix_micros(F.col("ts"))
b = e.agg(F.min(us).alias("lo"), F.max(us).alias("hi")).collect()[0]
span = (b["hi"] - b["lo"]) // 3
cut1, cut2 = b["lo"] + span, b["lo"] + 2 * span

import glob as g  # noqa: E402
import shutil  # noqa: E402

base = scratch_dir("ab_twsp")
src = f"{base}/src"
os.makedirs(src, exist_ok=True)
parts = [
    e.filter(us < cut1),
    e.filter((us >= cut1) & (us < cut2)),
    e.filter(us >= cut2),
]
now = 1_700_000_000
for i, part in enumerate(parts):
    part.coalesce(1).write.parquet(f"{src}/__tmp")
    shutil.move(g.glob(f"{src}/__tmp/part-*.parquet")[0], f"{src}/b{i}.parquet")
    shutil.rmtree(f"{src}/__tmp")
    os.utime(f"{src}/b{i}.parquet", (now + 600 * i, now + 600 * i))


def run(nparts: int):
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(nparts))
    try:
        raw = (
            spark.readStream.schema(
                "event_id long, user_id long, ts timestamp, value double"
            )
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        t0 = time.time()
        out = _run_totals_stream(spark, raw)
        n = out.count()
        return time.time() - t0, n, out
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)


run(8)  # warmup
VARIANTS = [8, 4, 2, 1]
times = {v: [] for v in VARIANTS}
frames = {}
for rep in range(REPS):
    for v in VARIANTS:
        dt, n, out = run(v)
        times[v].append(dt)
        frames[v] = out
        print(f"rep{rep} p={v}: {dt:.2f}s rows={n}", flush=True)

print()
for v, ts in times.items():
    print(f"p={v}: min={min(ts):.2f}s avg={sum(ts)/len(ts):.2f}s")
ref = frames[8]
for v in (4, 2, 1):
    print(f"p={v} vs p=8: exceptAll {frames[v].exceptAll(ref).count()}/{ref.exceptAll(frames[v]).count()}")
