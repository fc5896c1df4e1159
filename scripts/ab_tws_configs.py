"""Interleaved A/B of state-store configs on the TWS running-totals stream.

Variants:
  base       — RocksDB provider as shipped
  changelog  — + rocksdb.changelogCheckpointing.enabled=true
  notrack    — + rocksdb.trackTotalNumberOfRows=false
  both       — both knobs
Each run: fresh checkpoint dir (memory sink), same 3-tercile fixture.
Prints min-of-N per variant and verifies identical results via exceptAll.
"""

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

spark = get_spark("ab_tws", shuffle_partitions=8)
_require_tws(spark)

e = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts", "value")
us = F.unix_micros(F.col("ts"))
b = e.agg(F.min(us).alias("lo"), F.max(us).alias("hi")).collect()[0]
span = (b["hi"] - b["lo"]) // 3
cut1, cut2 = b["lo"] + span, b["lo"] + 2 * span

import glob as g  # noqa: E402
import shutil  # noqa: E402

base = scratch_dir("ab_tws")
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

CL = "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled"
NT = "spark.sql.streaming.stateStore.rocksdb.trackTotalNumberOfRows"
VARIANTS = {
    "base": {},
    "changelog": {CL: "true"},
    "notrack": {NT: "false"},
    "both": {CL: "true", NT: "false"},
}


def run(conf: dict):
    prev = {}
    for k, v in conf.items():
        prev[k] = spark.conf.get(k, None)
        spark.conf.set(k, v)
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
        dt = time.time() - t0
        return dt, n, out
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


# warmup
run({})
times = {k: [] for k in VARIANTS}
frames = {}
for rep in range(REPS):
    for name, conf in VARIANTS.items():
        dt, n, out = run(conf)
        times[name].append(dt)
        frames[name] = out
        print(f"rep{rep} {name}: {dt:.2f}s rows={n}", flush=True)

print()
for name, ts in times.items():
    print(f"{name}: min={min(ts):.2f}s avg={sum(ts)/len(ts):.2f}s")

ref = frames["base"]
for name in ("changelog", "notrack", "both"):
    d1 = frames[name].exceptAll(ref).count()
    d2 = ref.exceptAll(frames[name]).count()
    print(f"{name} vs base: exceptAll {d1}/{d2}")
