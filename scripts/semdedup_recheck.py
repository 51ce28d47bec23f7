"""VERDICT r08 ask #5: measure dedup_semantic_clusters after the
round-9 sub-split rework (driver-collect sizing -> in-plan broadcast
join on the oversized-cluster aggregate; chained-when -> O(1) plan).

Same method as scripts/q3_recheck.py: 1 warmup + 3 back-to-back
3-pass groups (median per group) in an otherwise idle session at
sf0.1 / local[32]. r08 steady-state read ~1.6s (recheck medians
2.17/1.76/1.60); target is back at ~1.4s or a documented reason.
Writes scripts/semdedup_recheck.json.
"""

import json
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession

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
q = all_queries()["dedup_semantic_clusters"]

# warmup
q(spark, SF_DIR).toPandas()

groups = []
for _ in range(3):
    passes = []
    for _ in range(3):
        t0 = time.time()
        q(spark, SF_DIR).toPandas()
        passes.append(time.time() - t0)
    groups.append(
        {
            "median": round(statistics.median(passes), 3),
            "passes": [round(p, 3) for p in passes],
        }
    )

out = {"sf": 0.1, "groups": groups}
print(json.dumps(out))
with open("/root/repo/scripts/semdedup_recheck.json", "w") as f:
    json.dump(out, f, indent=1)
