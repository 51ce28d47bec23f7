"""VERDICT r06 ask #3: pin down q1_pricing_summary at sf0.1.

Runs q1 in 3 back-to-back bench-shaped groups (3 timed passes each,
median per group) in ONE session on unchanged code, so host noise is
the only variable. r05 spread was [0.617, 0.805]s; r06 [0.685, 0.994].
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
q1 = all_queries()["q1_pricing_summary"]
# warmup (JVM/codegen/file listing)
q1(spark, SF_DIR).collect()
groups = []
for g in range(3):
    passes = []
    for _ in range(3):
        t0 = time.time()
        q1(spark, SF_DIR).collect()
        passes.append(time.time() - t0)
    groups.append({"median": round(statistics.median(passes), 3),
                   "passes": [round(p, 3) for p in passes]})
print(json.dumps({"groups": groups}))
