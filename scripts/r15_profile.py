"""Round-15 optimization profiling: per-query cost map over the FULL
catalog at sf0.1 (not just the headline set), separating driver-side
plan-build time from execution time.

For each query: one untimed warm pass (codegen/JIT absorption, same
rationale as bench.py), then N timed passes recording
  build_s  — time to call queries[name](spark, sf_dir) (Python plan
             construction, includes Catalyst analysis of subtrees that
             force .schema)
  exec_s   — time to materialize via toPandas()
The sum build+exec matches bench.py's timed quantity, so numbers are
comparable to the headline series. Median over passes.

Usage: SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_CPUS=32 python scripts/r15_profile.py [out.json] [name ...]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from etl_ml_pipeline_spark.session import get_spark  # noqa: E402
from etl_ml_pipeline_spark.queries import all_queries  # noqa: E402

N_PASSES = 3


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    out_path = sys.argv[1] if len(sys.argv) > 1 else "scripts/r15_profile.json"
    only = set(sys.argv[2:])

    spark = get_spark(
        app_name="r15_profile",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        extra_conf={"spark.driver.memory": os.environ.get("SPARK_DRIVER_MEMORY", "48g")},
    )
    queries = all_queries()
    names = [n for n in sorted(queries) if not only or n in only]

    spark.read.parquet(f"{sf_dir}/lineitem.parquet").limit(1).collect()

    results: dict[str, dict] = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"r15_profile:{name}")
        try:
            t0 = time.perf_counter()
            df = queries[name](spark, sf_dir)
            n_rows = len(df.toPandas())
            cold = time.perf_counter() - t0
            builds, execs = [], []
            for _ in range(N_PASSES):
                t0 = time.perf_counter()
                df = queries[name](spark, sf_dir)
                t1 = time.perf_counter()
                df.toPandas()
                t2 = time.perf_counter()
                builds.append(t1 - t0)
                execs.append(t2 - t1)
            results[name] = {
                "build_s": round(statistics.median(builds), 3),
                "exec_s": round(statistics.median(execs), 3),
                "total_s": round(
                    statistics.median(b + e for b, e in zip(builds, execs)), 3
                ),
                "cold_s": round(cold, 3),
                "rows": n_rows,
            }
            print(
                f"# {name}: total {results[name]['total_s']:.3f}s "
                f"(build {results[name]['build_s']:.3f} + exec {results[name]['exec_s']:.3f}), "
                f"cold {cold:.3f}s, {n_rows} rows",
                file=sys.stderr,
            )
        except Exception as e:  # noqa: BLE001 — profiling must survive one bad query
            results[name] = {"error": f"{type(e).__name__}: {e}"[:300]}
            print(f"# {name}: ERROR {e}", file=sys.stderr)
    grand = round(
        sum(r.get("total_s", 0.0) for r in results.values()), 3
    )
    rec = {
        "metric": "r15_full_catalog_profile",
        "sf_dir": sf_dir,
        "cpus": cpus,
        "n_queries": len(names),
        "grand_total_s": grand,
        "queries": results,
    }
    Path(out_path).write_text(json.dumps(rec, indent=1, sort_keys=True))
    print(json.dumps({"grand_total_s": grand, "n": len(names), "out": out_path}))


if __name__ == "__main__":
    main()
