"""Per-micro-batch durations for selected streaming entries via a
StreamingQueryListener. Usage: profile_stream_batches.py [sf_dir] [name...]"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
names = sys.argv[2:] or ["stream_join", "stream_stateful", "stream_gap_close"]

import ltss_spark.plans as plans  # noqa: E402
from ltss_spark.session import get_spark  # noqa: E402

from pyspark.sql.streaming import StreamingQueryListener  # noqa: E402

spark = get_spark("profile_sb", shuffle_partitions=8)


class L(StreamingQueryListener):
    def onQueryStarted(self, event):
        print(f"    query started: {event.name} @{time.time():.1f}", flush=True)

    def onQueryProgress(self, event):
        p = json.loads(event.progress.json)
        print(
            f"    batch {p['batchId']}: rows={p.get('numInputRows')} "
            f"durationMs={p.get('durationMs')}",
            flush=True,
        )

    def onQueryIdle(self, event):
        pass

    def onQueryTerminated(self, event):
        print(f"    query terminated @{time.time():.1f}", flush=True)


spark.streams.addListener(L())
byname = {q.name: q for q in plans.REGISTRY}
# warm the session on a cheap entry
byname["stream_dedup"].build(spark, sf_dir).count()
for name in names:
    q = byname[name]
    t0 = time.time()
    df = q.build(spark, sf_dir)
    t1 = time.time()
    n = df.count()
    t2 = time.time()
    time.sleep(1)
    print(f"{name}: build={t1-t0:.2f}s count={t2-t1:.2f}s rows={n}", flush=True)
