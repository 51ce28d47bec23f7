"""Full-catalog oracle differential through the driver contract.

Usage: python scripts/r16_diff.py [SF_DIR] [--only name1,name2] [--out OUT.json]
Defaults to /root/testdata/sf0.01. Prints a summary line and exits 1 on
any failure.
"""
import argparse
import importlib.util
import json
import sys
import time

sys.path.insert(0, "/root/repo")

spec = importlib.util.spec_from_file_location(
    "__spark_entry__", "/root/repo/__spark_entry__.py"
)
mod = importlib.util.module_from_spec(spec)
spec.loader.exec_module(mod)

from pyspark.sql import SparkSession  # noqa: E402

from etl_ml_pipeline_spark.oracle import compare_one  # noqa: E402

ap = argparse.ArgumentParser()
ap.add_argument("sf_dir", nargs="?", default="/root/testdata/sf0.01")
ap.add_argument("--only", default=None)
ap.add_argument("--out", default=None)
cli = ap.parse_args()

spark = (
    SparkSession.builder.master("local[32]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.driver.memory", "48g")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

qs, os_ = mod.queries(), mod.oracle_sql()
if cli.only:
    only = [n.strip() for n in cli.only.split(",") if n.strip()]
    unknown = [n for n in only if n not in qs]
    if unknown:
        sys.exit(f"unknown query names: {unknown}")
    qs = {n: qs[n] for n in only}

out = {}
fails = []
t0 = time.time()
for name in sorted(qs):
    sql = os_.get(name)
    if sql is None:
        out[name] = {"ok": None, "note": "no_oracle"}
        continue
    try:
        r = compare_one(name, spark, cli.sf_dir, qs[name], sql)
        out[name] = {"ok": r.ok, "spark_rows": r.spark_rows,
                     "oracle_rows": r.oracle_rows}
        if not r.ok:
            fails.append(name)
            out[name]["detail"] = str(r.detail)[:500]
            print(f"FAIL {name}: {r.detail}", file=sys.stderr)
    except Exception as e:  # noqa: BLE001
        fails.append(name)
        out[name] = {"ok": False, "err": str(e)[:500]}
        print(f"ERR {name}: {e}", file=sys.stderr)

summary = {
    "sf_dir": cli.sf_dir,
    "n": len(qs),
    "n_fail": len(fails),
    "fails": fails,
    "wall_s": round(time.time() - t0, 1),
}
if cli.out:
    with open(cli.out, "w") as f:
        json.dump({"summary": summary, "results": out}, f, indent=1)
print(json.dumps(summary))
sys.exit(1 if fails else 0)
