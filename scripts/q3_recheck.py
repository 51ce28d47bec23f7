"""VERDICT r07 ask #2: adjudicate q3_top_orders (0.606 -> 1.324s r06->r07).

Two experiments in one process, same method as scripts/q1_recheck.py:

A. q3 alone — 1 warmup + 3 back-to-back 3-pass groups (median per
   group) on unchanged code. If the medians sit inside the r06 spread
   [0.591, 0.757], the plan is fine and the r07 reading was session
   state, not code.

B. session-interference probe — replay the r07 bench session shape
   (one untimed pass over the full 28-query headline set, which is what
   precedes q3's timed passes in bench.py only in the sense of JVM/GC/
   code-cache accumulation), then re-time q3 with 3 passes. A q3 median
   that degrades only AFTER the 28-query sweep pins the regression on
   accumulated JVM session state (code cache, GC pressure, broadcast
   cleanup backlog) rather than the q3 plan.
"""

import json
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession

import bench
from etl_ml_pipeline_spark.queries import all_queries

SF_DIR = "/root/testdata/sf0.1"
spark = (
    SparkSession.builder.master("local[32]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
queries = all_queries()
q3 = queries["q3_top_orders"]


def time_groups(n_groups: int = 3, n_passes: int = 3) -> list[dict]:
    groups = []
    for _ in range(n_groups):
        passes = []
        for _ in range(n_passes):
            t0 = time.time()
            q3(spark, SF_DIR).toPandas()
            passes.append(time.time() - t0)
        groups.append(
            {
                "median": round(statistics.median(passes), 3),
                "passes": [round(p, 3) for p in passes],
            }
        )
    return groups


# --- A: isolated ---
q3(spark, SF_DIR).toPandas()  # warmup
isolated = time_groups()

# --- B: after a full 28-query sweep (bench-session JVM state) ---
sweep_t0 = time.time()
for name in bench.HEADLINE:
    queries[name](spark, SF_DIR).toPandas()
sweep_sec = round(time.time() - sweep_t0, 1)
after_sweep = time_groups()

print(
    json.dumps(
        {
            "isolated_groups": isolated,
            "sweep_sec": sweep_sec,
            "after_sweep_groups": after_sweep,
            "r06_spread": [0.591, 0.757],
            "r07_spread": [0.812, 1.632],
        }
    )
)
