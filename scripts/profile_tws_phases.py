"""Decompose stream_tws_totals into phases: bounds collect, tercile writes,
stream run; print per-micro-batch durations from the streaming progress."""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

import pyspark.sql.functions as F  # noqa: E402

from ltss_spark.session import get_spark  # noqa: E402
from ltss_spark.sources.batch import load_table  # noqa: E402

spark = get_spark("profile_tws", shuffle_partitions=8)

t0 = time.time()
e = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts", "value")
us = F.unix_micros(F.col("ts"))
bounds = e.agg(F.min(us).alias("lo"), F.max(us).alias("hi")).collect()[0]
lo, hi = bounds["lo"], bounds["hi"]
span = (hi - lo) // 3
cut1, cut2 = lo + span, lo + 2 * span
t1 = time.time()
print(f"bounds collect: {t1-t0:.2f}s")

import glob as g  # noqa: E402
import shutil  # noqa: E402

from ltss_spark.scratch import scratch_dir  # noqa: E402

base = scratch_dir("profile_tws")
src = f"{base}/src"
os.makedirs(src, exist_ok=True)
parts = [
    e.filter(us < cut1),
    e.filter((us >= cut1) & (us < cut2)),
    e.filter(us >= cut2),
]
now = 1_700_000_000
for i, part in enumerate(parts):
    ti = time.time()
    part.coalesce(1).write.parquet(f"{src}/__tmp")
    shutil.move(g.glob(f"{src}/__tmp/part-*.parquet")[0], f"{src}/b{i}.parquet")
    shutil.rmtree(f"{src}/__tmp")
    os.utime(f"{src}/b{i}.parquet", (now + 600 * i, now + 600 * i))
    print(f"  tercile write {i}: {time.time()-ti:.2f}s")
t2 = time.time()
print(f"tercile writes total: {t2-t1:.2f}s")

from ltss_spark.streaming.stateful import (  # noqa: E402
    _require_tws,
    _run_totals_stream,
)

_require_tws(spark)
raw = (
    spark.readStream.schema("event_id long, user_id long, ts timestamp, value double")
    .option("maxFilesPerTrigger", 1)
    .parquet(src)
)
out = _run_totals_stream(spark, raw)
t3 = time.time()
print(f"stream run: {t3-t2:.2f}s")
n = out.count()
t4 = time.time()
print(f"final count: {t4-t3:.2f}s rows={n}")
print(f"TOTAL {t4-t0:.2f}s")

# dig out the finished query's progress
for q in spark.streams.active:
    print("active:", q.name)
# run_to_memory awaits termination, so use the last progress from the logs:
# re-run the stream with a listener instead
from pyspark.sql.streaming import StreamingQueryListener  # noqa: E402


class L(StreamingQueryListener):
    def onQueryStarted(self, event):
        pass

    def onQueryProgress(self, event):
        p = json.loads(event.progress.json)
        print(
            f"  batch {p['batchId']}: rows={p.get('numInputRows')} "
            f"durationMs={p.get('durationMs')}",
            flush=True,
        )

    def onQueryIdle(self, event):
        pass

    def onQueryTerminated(self, event):
        pass


spark.streams.addListener(L())
t5 = time.time()
out2 = _run_totals_stream(spark, raw)
n2 = out2.count()
t6 = time.time()
time.sleep(2)  # let listener drain
print(f"second stream run (listener): {t6-t5:.2f}s rows={n2}")
