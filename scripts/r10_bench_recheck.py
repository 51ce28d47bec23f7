"""VERDICT r09 ask #2: adjudicate the two round-9 driver-bench movers on
round-10-start code — hybrid_search_rrf (driver 1.18 -> 1.53s, 1.30x)
and dedup_semantic_clusters (1.40 -> 1.69s, 1.20x) — in a session whose
cold total was itself +11% hot.

Method (same as scripts/q3_recheck.py): per query, 1 untimed warmup then
3 back-to-back 3-pass groups, median per group, on an idle machine.
Reading: medians inside the historical band => session noise; medians
at/above the driver's r09 value => code, investigate.

For hybrid_search_rrf the script also sweeps the EXECUTED plan (after a
full toPandas collect — limit(1) distorts plans) and records the
ReusedExchange count: the df/dl/BM25 branches share the tf subtree, and
round 9's lesson is that subtree identity is fragile.
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
queries = all_queries()

HISTORY = {
    # driver-bench readings per round (sf0.1)
    "hybrid_search_rrf": {"r07": 1.29, "r08": 1.18, "r09": 1.53},
    "dedup_semantic_clusters": {"r07": 1.31, "r08": 1.40, "r09": 1.69,
                                "r09_builder_clean": 1.31},
}

out = {}
for name in ("hybrid_search_rrf", "dedup_semantic_clusters"):
    fn = queries[name]
    df = fn(spark, SF_DIR)
    df.toPandas()  # warmup (full collect, real plan)
    groups = []
    for _ in range(3):
        passes = []
        for _ in range(3):
            t0 = time.time()
            fn(spark, SF_DIR).toPandas()
            passes.append(time.time() - t0)
        groups.append({"median": round(statistics.median(passes), 3),
                       "passes": [round(p, 3) for p in passes]})
    entry = {"groups": groups, "history": HISTORY[name]}
    if name == "hybrid_search_rrf":
        plan = df._jdf.queryExecution().executedPlan().toString()
        entry["reused_exchange_count"] = plan.count("ReusedExchange")
        entry["exchange_count"] = plan.count("Exchange ")
    out[name] = entry
    print(name, [g["median"] for g in groups], flush=True)

with open("/root/repo/scripts/r10_bench_recheck.json", "w") as f:
    json.dump(out, f, indent=1)
print(json.dumps({k: [g["median"] for g in v["groups"]] for k, v in out.items()}))
