"""Full-catalog oracle differential at the synthetic sf1 (10x sf0.1).

Tie/ulp cross-engine bugs are data-dependent: each 10x of rows is a
fresh draw at the rounding grid (the sf0.1 sweep caught q2's .xx50 tie
that sf0.01 missed). Writes scripts/sf1_diff.json.

``--only name1,name2`` runs just those queries and MERGES their rows
into the existing json (summary recomputed over the union), so a
catalog addition can close its sf1 gap in minutes instead of a full
206-query re-run. The pre-commit gate asserts the json's name set
covers the live catalog (VERDICT r08 ask #2).
"""
import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import importlib.util

spec = importlib.util.spec_from_file_location("__spark_entry__", "/root/repo/__spark_entry__.py")
mod = importlib.util.module_from_spec(spec)
spec.loader.exec_module(mod)

from pyspark.sql import SparkSession

from etl_ml_pipeline_spark.oracle import compare_one

SF_DIR = "/root/repo/.sf1"

spark = (
    SparkSession.builder.master("local[32]")
    .config("spark.sql.shuffle.partitions", "64")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.driver.memory", "48g")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

ap = argparse.ArgumentParser()
ap.add_argument("--only", default=None, help="comma-separated query names; merge into existing json")
cli = ap.parse_args()

qs, os_ = mod.queries(), mod.oracle_sql()
out = {}
if cli.only:
    only = [n.strip() for n in cli.only.split(",") if n.strip()]
    unknown = [n for n in only if n not in qs]
    if unknown:
        sys.exit(f"unknown query names: {unknown}")
    with open("/root/repo/scripts/sf1_diff.json") as f:
        out = json.load(f)["results"]
    qs = {n: qs[n] for n in only}
t0 = time.time()
for name in sorted(qs):
    sql = os_.get(name)
    if sql is None:
        out[name] = {"ok": None, "note": "no_oracle"}
        continue
    t1 = time.time()
    try:
        r = compare_one(name, spark, SF_DIR, qs[name], sql)
        out[name] = {"ok": r.ok, "sec": round(time.time() - t1, 2)}
        if not r.ok:
            out[name]["detail"] = str(r.detail)[:2000]
    except Exception as e:  # noqa: BLE001
        out[name] = {"ok": False, "sec": round(time.time() - t1, 2), "err": repr(e)[:2000]}
    print(name, out[name].get("ok"), out[name].get("sec"), flush=True)

fails = [n for n, v in out.items() if v["ok"] is False]
summary = {"total": len(out), "fails": fails, "wall_s": round(time.time() - t0, 1)}
print(json.dumps(summary))
with open("/root/repo/scripts/sf1_diff.json", "w") as f:
    json.dump({"summary": summary, "results": out}, f, indent=1)
