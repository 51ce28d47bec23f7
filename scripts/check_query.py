"""Spot-check one or more catalog queries against their DuckDB oracles.

Usage: python scripts/check_query.py NAME [NAME...] [--sf 0.001,0.01,0.1]
"""

from __future__ import annotations

import argparse
import sys

sys.path.insert(0, "/root/repo")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--sf", default="0.001,0.01")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from etl_ml_pipeline_spark.oracle import compare_one
    from etl_ml_pipeline_spark.queries import all_oracles, all_queries

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs, oracles = all_queries(), all_oracles()
    rc = 0
    for sf in args.sf.split(","):
        sf_dir = f"/root/testdata/sf{sf}" if not sf.startswith("/") else sf
        for name in args.names:
            if name not in oracles:
                print(f"{name}@{sf}: NO ORACLE (rows-only query)")
                continue
            r = compare_one(name, spark, sf_dir, qs[name], oracles[name])
            print(f"{name}@{sf}: {'OK' if r.ok else 'FAIL'} "
                  f"(spark={r.spark_rows} oracle={r.oracle_rows})")
            if not r.ok:
                rc = 1
                print(r.detail)
    spark.stop()
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
