"""Post-execution (AQE-final) plan-shape stats for catalog queries.

For each name: materialize via toPandas, then read the FINAL executed
plan and count load-bearing node types — scans, exchanges, reused
exchanges/subqueries, Python boundaries, windows, sort-merge joins.
AQE's reuse decisions only exist in the executed plan, so explain()
before running under-reports reuse.

Usage: SPARK_GRAFT_SF_DIR=... python scripts/r15_plan_stats.py NAME [NAME...]
"""

from __future__ import annotations

import os
import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from etl_ml_pipeline_spark.session import get_spark  # noqa: E402
from etl_ml_pipeline_spark.queries import all_queries  # noqa: E402

MARKS = [
    ("scan", r"Scan parquet"),
    ("exch", r"Exchange (hash|range|single|Single)"),
    ("reuseX", r"ReusedExchange"),
    ("reuseSq", r"ReusedSubquery"),
    ("bcastJ", r"BroadcastHashJoin"),
    ("smj", r"SortMergeJoin"),
    ("shj", r"ShuffledHashJoin"),
    ("window", r"\bWindow\b|WindowExec|RunningWindowFunction"),
    ("py", r"BatchEvalPython|ArrowEvalPython|MapInPandas|FlatMapGroupsInPandas|MapInArrow"),
    ("aqeRead", r"AQEShuffleRead"),
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(
        app_name="r15_plan_stats",
        master="local[32]",
        shuffle_partitions=32,
        extra_conf={"spark.driver.memory": "48g"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()
    for name in sys.argv[1:]:
        df = queries[name](spark, sf_dir)
        df.toPandas()
        plan = df._jdf.queryExecution().executedPlan().toString()
        counts = {
            label: len(re.findall(pat, plan)) for label, pat in MARKS
        }
        print(name, " ".join(f"{k}={v}" for k, v in counts.items() if v),
              flush=True)


if __name__ == "__main__":
    main()
