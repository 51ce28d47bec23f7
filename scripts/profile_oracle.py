"""Profile the full driver-style correctness run at sf0.01.

Times each query's Spark side and DuckDB-oracle side separately so we can
see what blows the driver's wall-clock budget (r01 stopped at 50/83).
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from etl_ml_pipeline_spark.oracle import duckdb_connect, value_hash  # noqa: E402

SF_DIR = "/root/testdata/sf0.01"


def _vanilla_spark():
    """Mimic the correctness driver: a plain session with default confs
    (no AQE/debugging/shuffle tuning from our session factory)."""
    import os

    from pyspark.sql import SparkSession

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    return (
        SparkSession.builder.appName("profile_vanilla")
        .master(f"local[{cpus}]")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )


def main() -> None:
    import __spark_entry__ as e

    if "--vanilla" in sys.argv:
        spark = _vanilla_spark()
    else:
        from etl_ml_pipeline_spark.session import get_spark

        spark = get_spark()
    qs = e.queries()
    oracles = e.oracle_sql()
    print(f"{len(qs)} queries, {len(oracles)} oracles", flush=True)

    t_total = time.perf_counter()
    rows = []
    for name, fn in qs.items():
        t0 = time.perf_counter()
        try:
            spark_pdf = fn(spark, SF_DIR).toPandas()
            t_spark = time.perf_counter() - t0
            err = None
        except Exception as ex:  # noqa: BLE001
            t_spark = time.perf_counter() - t0
            err = f"spark: {ex}"
            spark_pdf = None
        t_oracle = 0.0
        hash_ok = None
        if err is None and name in oracles:
            t1 = time.perf_counter()
            try:
                with duckdb_connect(SF_DIR) as con:
                    oracle_pdf = con.sql(oracles[name]).df()
                t_oracle = time.perf_counter() - t1
                hash_ok = (
                    len(spark_pdf) == len(oracle_pdf)
                    and sorted(spark_pdf.columns) == sorted(oracle_pdf.columns)
                    and value_hash(spark_pdf) == value_hash(oracle_pdf)
                )
            except Exception as ex:  # noqa: BLE001
                t_oracle = time.perf_counter() - t1
                err = f"oracle: {ex}"
        rows.append(
            {
                "name": name,
                "spark_s": round(t_spark, 3),
                "oracle_s": round(t_oracle, 3),
                "ok": hash_ok,
                "err": err,
            }
        )
        print(
            f"{len(rows):3d} {name:40s} spark={t_spark:6.2f}s oracle={t_oracle:6.2f}s "
            f"ok={hash_ok} {('ERR: ' + err[:120]) if err else ''}",
            flush=True,
        )

    total = time.perf_counter() - t_total
    rows.sort(key=lambda r: -(r["spark_s"] + r["oracle_s"]))
    print(f"\nTOTAL {total:.1f}s; top 15 by combined time:")
    for r in rows[:15]:
        print(f"  {r['name']:40s} spark={r['spark_s']:6.2f} oracle={r['oracle_s']:6.2f}")
    Path("scripts/profile_oracle.json").write_text(json.dumps(rows, indent=1))
    bad = [r for r in rows if r["ok"] is False or r["err"]]
    print(f"failures: {[r['name'] for r in bad]}")


if __name__ == "__main__":
    main()
