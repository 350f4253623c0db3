"""Machine-health probe (OPTIMIZATION_r12.md §4).

Tiny-job round-trip latency (spark.range(1) noop x20 -> p50/p90) plus
the tpch_q1 canary (min of 3 timed runs after one warm run). Clean
epoch: tiny p50 < ~60 ms, canary < ~0.7 s.
"""
import json
import os
import statistics
import sys
import time

REPO = "/root/repo"
sys.path.insert(0, REPO)
os.environ.setdefault("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

from google_cloud_ecommerce_spark.session import get_spark
from google_cloud_ecommerce_spark.queries import all_queries

spark = get_spark()
sf_dir = os.environ["SPARK_GRAFT_SF_DIR"]

def noop(df):
    df.write.format("noop").mode("overwrite").save()

# tiny-job round trips
lat = []
for i in range(20):
    t0 = time.perf_counter()
    noop(spark.range(1))
    lat.append((time.perf_counter() - t0) * 1000)
lat.sort()
p50 = statistics.median(lat)
p90 = lat[int(0.9 * len(lat)) - 1]

# tpch_q1 canary
q = dict(all_queries())["tpch_q1_pricing_summary"]
df = q(spark, sf_dir)
noop(df)  # warm
times = []
for _ in range(3):
    t0 = time.perf_counter()
    noop(q(spark, sf_dir))
    times.append(time.perf_counter() - t0)

print(json.dumps({
    "tiny_job_ms_p50": round(p50, 1),
    "tiny_job_ms_p90": round(p90, 1),
    "canary_min": round(min(times), 3),
}))
spark.stop()
